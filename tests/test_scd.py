"""SCD-2 interval builder (dff/scd.py): change suppression, interval
close, open-interval flag, null-safe attr comparison, single Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.scd import scd2_intervals

ROWS = [
    # key, ts, plan, region
    ("u1", 1, "free", "eu"),
    ("u1", 3, "free", "eu"),      # unchanged -> suppressed
    ("u1", 5, "pro", "eu"),       # plan change
    ("u1", 9, "pro", "us"),       # region change
    ("u2", 2, "pro", None),       # NULL attr
    ("u2", 4, "pro", None),       # NULL -> NULL unchanged -> suppressed
    ("u2", 6, "pro", "eu"),       # NULL -> eu is a change
]


def _run(spark):
    df = spark.createDataFrame(ROWS, "k string, ts long, plan string, region string")
    return {
        tuple(r)
        for r in scd2_intervals(df, ["k"], "ts", ["plan", "region"]).collect()
    }


def test_intervals_and_suppression(spark):
    got = _run(spark)
    assert got == {
        ("u1", "free", "eu", 1, 5, False),
        ("u1", "pro", "eu", 5, 9, False),
        ("u1", "pro", "us", 9, None, True),
        ("u2", "pro", None, 2, 6, False),
        ("u2", "pro", "eu", 6, None, True),
    }


def test_exactly_one_open_interval_per_key(spark):
    df = spark.createDataFrame(ROWS, "k string, ts long, plan string, region string")
    out = scd2_intervals(df, ["k"], "ts", ["plan", "region"])
    cur = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open")
    )
    assert {(r.k, r.n_open) for r in cur.collect()} == {("u1", 1), ("u2", 1)}
    # intervals tile: every valid_to equals the next valid_from
    rows = sorted(
        [(r.k, r.valid_from, r.valid_to) for r in out.collect()]
    )
    for (k1, _, hi), (k2, lo, _) in zip(rows, rows[1:]):
        if k1 == k2:
            assert hi == lo


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(ROWS, "k string, ts long, plan string, region string")
    plan = (
        scd2_intervals(df, ["k"], "ts", ["plan", "region"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_validation(spark):
    df = spark.createDataFrame(ROWS, "k string, ts long, plan string, region string")
    with pytest.raises(ValueError):
        scd2_intervals(df, [], "ts", ["plan"])
    with pytest.raises(ValueError):
        scd2_intervals(df, ["k"], "ts", [])
