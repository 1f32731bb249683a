"""dff.projection: PCA basis — variance ordering, orthonormality,
persistence, and recall of projected ANN vs full-dim exact search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dff.projection import Projector, fit_pca
from dff.similarity import brute_force_topk

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_variance_ordering_and_orthonormal_basis(spark):
    p = fit_pca(_emb(spark), "embedding", k=8)
    ev = p.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert sum(ev) <= 1.0 + 1e-9
    pc = p.model.pc.toArray()  # (64, 8)
    gram = pc.T @ pc
    assert np.allclose(gram, np.eye(8), atol=1e-9)
    with pytest.raises(ValueError):
        fit_pca(_emb(spark), "embedding", k=0)


def test_transform_matches_numpy_projection(spark):
    e = _emb(spark)
    p = fit_pca(e, "embedding", k=4)
    pc = p.model.pc.toArray()
    rows = e.limit(5).collect()
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in p.transform(e.limit(5), "proj").collect()
    }
    for r in rows:
        want = np.array(r["embedding"], dtype=np.float64) @ pc
        assert np.allclose(got[r["vec_id"]], want, atol=1e-9)


def test_projected_ann_recall_vs_full_dim(spark):
    # synthetic embeddings are ~isotropic (no low-rank structure), PCA's
    # worst case — halve the dims and demand recall far above the 2% chance
    # floor; on real low-rank embeddings the same halving loses far less
    e = _emb(spark)
    p = fit_pca(e, "embedding", k=32)
    proj = p.transform(e, "embedding")
    qids = [0, 100, 250, 400]
    q_full = e.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q_proj = proj.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        qid: {r["item_id"] for r in rows}
        for qid, rows in _topk_by_query(brute_force_topk(e, q_full, k=10))
    }
    approx = {
        qid: {r["item_id"] for r in rows}
        for qid, rows in _topk_by_query(brute_force_topk(proj, q_proj, k=10))
    }
    recalls = [
        len(truth[q] & approx[q]) / 10 for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def _topk_by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r)
    return out.items()


def test_save_load_roundtrip(spark, tmp_path):
    e = _emb(spark)
    p = fit_pca(e, "embedding", k=4)
    path = str(tmp_path / "pca")
    p.save(path)
    p2 = Projector.load(spark, path, "embedding")
    a = p.transform(e.limit(3), "proj").collect()
    b = p2.transform(e.limit(3), "proj").collect()
    got_a = {r["vec_id"]: r["proj"] for r in a}
    got_b = {r["vec_id"]: r["proj"] for r in b}
    for k_ in got_a:
        assert np.allclose(got_a[k_], got_b[k_], atol=1e-12)
