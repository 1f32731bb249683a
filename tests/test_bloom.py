"""dff.bloom: expression Bloom filter — no false negatives, bounded false
positives, exact equality of the pre-filtered referential check, and the
definite-orphan map-side short-circuit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.bloom import bloom_maybe_contains, build_bloom, orphan_rows_bloom
from dff.referential import orphan_rows

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_and_bounded_fp(spark):
    dim = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = build_bloom(dim, ["k"], m_bits=1 << 15, k=5)
    probe = spark.range(0, 20000).select(F.col("id").alias("k")).select(
        "k", bloom_maybe_contains(words, ["k"], 5).alias("hit")
    )
    rows = {r["k"]: r["hit"] for r in probe.collect()}
    # every member hits
    assert all(rows[i] for i in range(2000))
    # fp rate among the 18000 non-members: theory ~ (1-e^(-kn/m))^k ≈ 0.5%
    # at n=2000, m=32768, k=5; allow 4x slack
    fp = sum(1 for i in range(2000, 20000) if rows[i]) / 18000
    assert fp < 0.02, fp


def test_orphan_rows_bloom_equals_exact(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    fact = e.where(F.col("event_type") == "purchase")
    dim = e.where(
        (F.col("event_type") == "signup") & (F.col("user_id") % 3 != 0)
    ).select("user_id")
    got = {
        r["event_id"]
        for r in orphan_rows_bloom(fact, dim, ["user_id"], m_bits=1 << 14).collect()
    }
    want = {r["event_id"] for r in orphan_rows(fact, dim, ["user_id"]).collect()}
    assert got == want and len(want) > 0


def test_null_keys_are_orphans_like_exact(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "event_id int, k int"
    )
    dim = spark.createDataFrame([(10,)], "k int")
    got = sorted(
        r["event_id"]
        for r in orphan_rows_bloom(fact, dim, ["k"], m_bits=1 << 10).collect()
    )
    want = sorted(r["event_id"] for r in orphan_rows(fact, dim, ["k"]).collect())
    assert got == want == [2, 3]


def test_build_validates_m_bits(spark):
    dim = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        build_bloom(dim, ["k"], m_bits=100)


def test_definite_orphans_never_join(spark):
    """The probe-fail branch must be a plain Filter over the scan — no join
    operator above it (map-side short-circuit)."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    dim = e.where(F.col("user_id") < 100).select("user_id")
    words = build_bloom(dim, ["user_id"], m_bits=1 << 14)
    definite = e.where(
        ~bloom_maybe_contains(words, ["user_id"]) & F.col("user_id").isNotNull()
    )
    plan = definite._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan
