"""dff.hll: persisted HLL rollups — accuracy, merge==single-pass identity,
binary parquet roundtrip, sketch-not-values shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from dff.hll import estimate_distinct, hll_rollup, merge_rollup

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_estimate_within_tolerance(spark):
    e = _events(spark)
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate_distinct(
            hll_rollup(e, "user_id", ["event_type"])
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])


def test_daily_merge_equals_single_pass(spark):
    # HLL registers are max-per-bucket: building per-day then unioning must
    # give the SAME estimate as one sketch over everything
    e = _events(spark).withColumn("day", F.to_date("ts"))
    daily = hll_rollup(e, "user_id", ["event_type", "day"])
    merged = estimate_distinct(merge_rollup(daily, ["event_type"]))
    single = estimate_distinct(hll_rollup(e, "user_id", ["event_type"]))
    a = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    b = {r["event_type"]: r["approx_distinct"] for r in single.collect()}
    assert a == b


def test_parquet_roundtrip_and_incremental_union(spark, tmp_path):
    e = _events(spark).withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "sketches")
    hll_rollup(e, "user_id", ["day"]).write.parquet(path)
    # later job: answer a range query from stored kilobyte rows only
    stored = spark.read.parquet(path)
    est = estimate_distinct(merge_rollup(stored)).first()["approx_distinct"]
    exact = e.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05
    # global sketch (no group cols) also works straight from data
    g = estimate_distinct(merge_rollup(hll_rollup(e, "user_id", ["day"])))
    assert g.first()["approx_distinct"] == est


def test_shuffle_carries_sketches_not_values(spark):
    e = _events(spark)
    plan = (
        hll_rollup(e, "user_id", ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial sketch aggregation below the exchange => the shuffle rows are
    # (event_type, sketch), never raw user_ids
    assert "partial_hll_sketch_agg" in plan or "partial" in plan.lower(), plan
    before_exchange = plan.split("Exchange hashpartitioning")[-1]
    assert "hll_sketch_agg" in before_exchange, plan
