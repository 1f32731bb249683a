"""dff.outliers: z-score + IQR detectors vs a pandas oracle, approx-vs-exact
fence agreement, and the no-fact-shuffle plan claim."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dff.outliers import group_bounds_iqr, iqr_outliers, zscore_outliers

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_zscore_matches_pandas(spark):
    e = _events(spark)
    got = {
        r["event_id"]: r["zscore"]
        for r in zscore_outliers(e, "value", ["event_type"], 2.5).collect()
    }
    pdf = e.select("event_id", "event_type", "value").toPandas()
    g = pdf.groupby("event_type")["value"]
    z = (pdf["value"] - g.transform("mean")) / g.transform(lambda s: s.std(ddof=1))
    want = pdf[z.abs() > 2.5]
    assert set(got) == set(want["event_id"])
    for eid, zv in zip(want["event_id"], z[z.abs() > 2.5]):
        assert abs(got[eid] - zv) < 1e-9


def test_zscore_ungrouped_and_degenerate(spark):
    rows = [(1, 1.0), (2, 1.0), (3, 1.0), (4, 100.0)]
    df = spark.createDataFrame(rows, "id int, v double")
    out = zscore_outliers(df, "v", threshold=1.4)
    assert [r["id"] for r in out.collect()] == [4]
    # zero variance / single row: no outliers, no division error
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id int, v double")
    assert zscore_outliers(const, "v").count() == 0
    single = spark.createDataFrame([(1, 5.0)], "id int, v double")
    assert zscore_outliers(single, "v").count() == 0


def test_zscore_null_values_never_outliers(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.1), (3, None), (4, 50.0)], "id int, v double"
    )
    ids = {r["id"] for r in zscore_outliers(df, "v", threshold=1.0).collect()}
    assert 3 not in ids and 4 in ids


def test_iqr_matches_pandas(spark):
    e = _events(spark)
    got = {r["event_id"] for r in iqr_outliers(e, "value", ["event_type"]).collect()}
    pdf = e.select("event_id", "event_type", "value").toPandas()
    g = pdf.groupby("event_type")["value"]
    q1 = g.transform(lambda s: s.quantile(0.25))
    q3 = g.transform(lambda s: s.quantile(0.75))
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    want = set(pdf[(pdf["value"] < lo) | (pdf["value"] > hi)]["event_id"])
    assert got == want


def test_iqr_approx_fences_near_exact(spark):
    e = _events(spark)
    exact = {
        r["event_type"]: (r["__lo"], r["__hi"])
        for r in group_bounds_iqr(e, "value", ["event_type"]).collect()
    }
    approx = {
        r["event_type"]: (r["__lo"], r["__hi"])
        for r in group_bounds_iqr(
            e, "value", ["event_type"], exact=False
        ).collect()
    }
    assert set(exact) == set(approx)
    vals = np.array(
        [r["value"] for r in e.select("value").collect() if r["value"] is not None]
    )
    spread = float(vals.max() - vals.min())
    for k in exact:
        for a, b in zip(exact[k], approx[k]):
            # t-digest rank error ~delta; fences within a few % of spread
            assert abs(a - b) <= 0.05 * spread, (k, exact[k], approx[k])


def test_iqr_approx_group_key_type_roundtrip(spark):
    # int group column: the sketch stringifies keys; the join must cast back
    df = spark.createDataFrame(
        [(g, float(v)) for g in (1, 2) for v in range(100)] + [(1, 1e6)],
        "grp int, v double",
    )
    out = iqr_outliers(df, "v", ["grp"], exact=False)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["grp"] == 1 and rows[0]["v"] == 1e6


def test_outlier_plan_fact_side_never_shuffles(spark):
    e = _events(spark)
    plan = (
        zscore_outliers(e, "value", ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the only Exchange allowed is the 6-row bounds aggregation feeding the
    # BroadcastExchange; the streamed fact subtree (printed first) must be
    # shuffle-free
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in fact_side, plan
