"""Misra-Gries heavy hitters: exactness, the frequency guarantee under
truncation, grouped operation, and the sketch-only shuffle shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dff.heavyhitters import heavy_hitters


def _zipf_items(n: int, n_items: int, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.4, size=n) % n_items
    return [f"item_{r:04d}" for r in ranks]


def test_exact_when_capacity_covers_distinct(spark):
    items = _zipf_items(20000, 40)
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(8)
    got = {
        r["item"]: r["est"]
        for r in heavy_hitters(df, "item", capacity=64).collect()
    }
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exact


def test_guarantee_under_truncation(spark):
    # heavy skew: a few hot items + a long tail that forces decrements
    rng = np.random.default_rng(3)
    hot = [f"hot_{i}" for i in range(3) for _ in range(4000)]
    tail = [f"tail_{i:05d}" for i in rng.integers(0, 30000, size=18000)]
    items = hot + tail
    rng.shuffle(items)
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(16)
    cap = 20
    out = heavy_hitters(df, "item", capacity=cap).collect()
    n = len(items)
    bound = n // (cap + 1)
    assert all(r["n_total"] == n and r["max_undercount"] == bound for r in out)
    est = {r["item"]: r["est"] for r in out}
    truth = {}
    for x in items:
        truth[x] = truth.get(x, 0) + 1
    # every sufficiently-frequent item survives; estimates are lower bounds
    # within the guaranteed undercount
    for item, t in truth.items():
        if t > bound:
            assert item in est, item
        if item in est:
            assert est[item] <= t
            assert t - est[item] <= bound
    # and the sketch stayed bounded
    assert len(out) <= cap


def test_grouped_and_null_items(spark):
    rows = [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "y")] * 5
    rows += [("a", None)] * 7  # ignored
    df = spark.createDataFrame(rows, "g string, item string").repartition(4)
    out = heavy_hitters(df, "item", capacity=8, key_col="g").collect()
    got = {(r["group_key"], r["item"]): (r["est"], r["n_total"]) for r in out}
    assert got == {
        ("a", "x"): (30, 40),
        ("a", "y"): (10, 40),
        ("b", "y"): (5, 5),
    }


def test_capacity_validation(spark):
    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "item", capacity=0)


def test_sketch_only_shuffle_plan(spark):
    """ONE Exchange, fed by the MapInPandas partials — the raw items never
    shuffle, only the bounded summary rows do."""
    df = spark.range(0, 50000).select(
        (F.col("id") % 100).cast("string").alias("item")
    )
    out = heavy_hitters(df, "item", capacity=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # stage order: the MapInPandas partial runs BELOW the Exchange
    assert plan.index("Exchange") < plan.index("MapInPandas"), plan
