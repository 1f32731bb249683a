"""dff.vectorize: signed feature hashing — python parity, cosine
preservation, similarity-stack integration, zero-token docs."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from dff.vectorize import hashing_vectorize

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _py_vec(spark, text, dim):
    # replicate via Spark's own xxhash64 on a tiny frame (seedable parity)
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    tdf = spark.createDataFrame([(t,) for t in toks], "term string").select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int").alias("b"),
        F.when(F.pmod(F.xxhash64("term", F.lit(1)), F.lit(2)) == 0, 1.0)
        .otherwise(-1.0)
        .alias("s"),
    )
    v = np.zeros(dim)
    for r in tdf.collect():
        v[r["b"]] += r["s"]
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def test_vector_matches_reference_construction(spark):
    d = _docs(spark).limit(3)
    got = {r["doc_id"]: np.array(r["embedding"]) for r in
           hashing_vectorize(d, dim=32).collect()}
    for row in d.collect():
        want = _py_vec(spark, row["text"], 32)
        assert np.allclose(got[row["doc_id"]], want, atol=1e-12)


def test_cosine_approximates_token_cosine(spark):
    docs = _docs(spark).limit(40)
    vecs = {r["doc_id"]: np.array(r["embedding"]) for r in
            hashing_vectorize(docs, dim=512).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def token_cos(a, b):
        ca = Counter(t for t in re.split("[^a-z0-9]+", a.lower()) if t)
        cb = Counter(t for t in re.split("[^a-z0-9]+", b.lower()) if t)
        dot = sum(ca[t] * cb[t] for t in ca)
        na = math.sqrt(sum(v * v for v in ca.values()))
        nb = math.sqrt(sum(v * v for v in cb.values()))
        return dot / (na * nb)

    ids = sorted(vecs)[:12]
    errs = [
        abs(float(vecs[a] @ vecs[b]) - token_cos(texts[a], texts[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    ]
    assert max(errs) < 0.15 and sum(errs) / len(errs) < 0.06, (
        max(errs), sum(errs) / len(errs))


def test_feeds_similarity_stack_and_finds_planted_dup(spark):
    from dff.similarity import brute_force_topk

    d = _docs(spark).limit(50)
    planted = d.withColumn("doc_id", F.col("doc_id") + 100000)
    vecs = hashing_vectorize(d.unionByName(planted), dim=256).withColumnRenamed(
        "doc_id", "vec_id"
    )
    q = vecs.where(F.col("vec_id") == 100000 + d.first()["doc_id"]).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(vecs, q, k=2).collect()
    # nearest neighbors of a planted copy: itself + the original, cos ~ 1
    ids = {r["item_id"] for r in top}
    assert ids == {q.first()["query_id"], d.first()["doc_id"]}
    assert all(r["cosine"] > 0.999 for r in top)


def test_zero_token_docs_get_zero_vectors_and_dim_validation(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "!!!"), (3, None)], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r["embedding"] for r in
            hashing_vectorize(df, dim=16).collect()}
    assert len(rows) == 3
    assert all(v == 0.0 for v in rows[2]) and all(v == 0.0 for v in rows[3])
    assert abs(sum(v * v for v in rows[1]) - 1.0) < 1e-9
    with pytest.raises(ValueError):
        hashing_vectorize(df, dim=1)


def test_text_ivf_end_to_end_recall(spark):
    """The whole model-free text-similarity stack composed: feature-hash
    500 docs -> IVF index (8 cells) -> probe; recall@5 vs brute force over
    the SAME hashed vectors must be high at nprobe=4 and perfect at full
    probe (IVF is a partitioning of the same scored space)."""
    from dff.similarity import brute_force_topk, build_ivf_index

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    vecs = hashing_vectorize(docs, dim=128).withColumnRenamed(
        "doc_id", "vec_id"
    ).persist()
    vecs.count()
    qids = [0, 100, 200, 300, 400]
    qs = vecs.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {}
    for r in brute_force_topk(vecs, qs, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["item_id"])
    idx = build_ivf_index(vecs, n_centroids=8)
    full = {}
    for r in idx.query(qs, k=5, nprobe=8).collect():
        full.setdefault(r["query_id"], set()).add(r["item_id"])
    assert full == truth  # full probe == exact
    part = {}
    for r in idx.query(qs, k=5, nprobe=4).collect():
        part.setdefault(r["query_id"], set()).add(r["item_id"])
    recalls = [len(part.get(q, set()) & truth[q]) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    vecs.unpersist()
