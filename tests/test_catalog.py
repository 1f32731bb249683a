"""Managed-table sink / temp view / drop-table surface (SURVEY.md §2.1)."""

import pytest
from pyspark.sql import functions as F

from dff.catalog import drop_table, register_view, save_managed, table_exists
from dff.sources import synthetic_source_files


@pytest.fixture(scope="module")
def small(spark):
    return synthetic_source_files(spark, 2000, n_repos=50, seed=7).select(
        "repo", "path", "commit", "lang", "part_id"
    )


def test_save_read_drop_roundtrip(spark, small):
    save_managed(small, "t_roundtrip")
    assert table_exists(spark, "t_roundtrip")
    got = spark.table("t_roundtrip")
    assert got.count() == small.count()
    assert got.schema == small.schema
    drop_table(spark, "t_roundtrip")
    assert not table_exists(spark, "t_roundtrip")


def test_bucketed_table_agg_has_no_exchange(spark, small):
    """The point of bucketing: groupBy on the bucket key reads pre-shuffled
    buckets, so the executed plan has NO Exchange before the final agg."""
    save_managed(small, "t_bucketed", bucket_cols=["repo"], n_buckets=8)
    try:
        agg = spark.table("t_bucketed").groupBy("repo").agg(F.count(F.lit(1)))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(repo" not in plan
        # and it still computes the right answer
        assert agg.count() == small.select("repo").distinct().count()
    finally:
        drop_table(spark, "t_bucketed")


def test_temp_view_sql(spark, small):
    register_view(small, "v_small")
    n = spark.sql("SELECT count(*) AS n FROM v_small WHERE lang = 'python'").first()["n"]
    assert n == small.where(F.col("lang") == "python").count()


def test_create_or_replace_overwrites(spark, small):
    save_managed(small.limit(100), "t_replace")
    save_managed(small.limit(25), "t_replace")
    try:
        assert spark.table("t_replace").count() == 25
    finally:
        drop_table(spark, "t_replace")


def test_identifier_validation_rejects_injection(spark, small):
    for bad in ("t; DROP TABLE x", "t`x", "a.b; --", ""):
        with pytest.raises(ValueError, match="invalid table identifier"):
            save_managed(small.limit(1), bad)
        with pytest.raises(ValueError, match="invalid table identifier"):
            drop_table(spark, bad)


def test_failed_replace_keeps_existing_table(spark, small):
    """Staged replace (round-2 advisor): a write that fails mid-flight must
    leave the previous table contents readable, not dropped."""
    save_managed(small.limit(50), "t_staged")
    try:
        from pyspark.sql import types as T
        from pyspark.sql.functions import udf

        @udf(T.StringType())
        def boom(x):
            raise RuntimeError("injected write failure")

        failing = small.limit(10).withColumn("repo", boom("repo"))
        with pytest.raises(Exception, match="injected write failure"):
            save_managed(failing, "t_staged")
        assert spark.table("t_staged").count() == 50  # old contents intact
    finally:
        drop_table(spark, "t_staged")
        drop_table(spark, "t_staged__stg")


def test_bucketed_cobucketed_join_has_no_exchange(spark, small):
    """Two tables bucketed the same way on the join key join WITHOUT any
    Exchange — the co-located join that makes repeated fact-dim joins at
    100 TB shuffle-free (each side reads its buckets pre-partitioned)."""
    save_managed(small, "t_join_a", bucket_cols=["repo"], n_buckets=8)
    save_managed(
        small.groupBy("repo").agg(F.count(F.lit(1)).alias("n_files")),
        "t_join_b",
        bucket_cols=["repo"],
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the point is the co-located
        # shuffle-free SMJ/SHJ, not a small-table broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_join_a")
        b = spark.table("t_join_b")
        j = a.join(b, "repo").where(F.col("n_files") > 0)
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_table(spark, "t_join_a")
        drop_table(spark, "t_join_b")
