from __future__ import annotations

from pyspark.sql import functions as F

from dff.similarity import brute_force_topk, ivf_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _queries(spark, n=5):
    emb = spark.read.parquet(EMB)
    return emb.orderBy("vec_id").limit(n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_brute_force_self_query_rank1(spark):
    """Querying with vectors from the corpus must return themselves at rank 1."""
    emb = spark.read.parquet(EMB)
    q = _queries(spark, 5)
    top = brute_force_topk(emb, q, k=3).collect()
    rank1 = {r["query_id"]: r["item_id"] for r in top if r["rank"] == 1}
    assert rank1 == {qid: qid for qid in rank1}
    for r in top:
        if r["rank"] == 1:
            assert r["cosine"] > 0.999999


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(EMB).cache()
    q = _queries(spark, 10)
    exact = brute_force_topk(emb, q, k=5)
    approx = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=8)
    e = {(r["query_id"], r["item_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["item_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # full probe == brute force
    full = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8)
    f = {(r["query_id"], r["item_id"]) for r in full.collect()}
    assert f == e
    emb.unpersist()


def test_topk_scores_map_side_no_shuffle_of_items(spark):
    """The query matrix is closed over the MapInPandas scorer (no join of
    any kind); items are scanned once, unshuffled."""
    emb = spark.read.parquet(EMB)
    q = _queries(spark, 2)
    plan = brute_force_topk(emb, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan
