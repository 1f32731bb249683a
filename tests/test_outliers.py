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


def test_winsorize_matches_pandas(spark):
    from dff.outliers import winsorize

    e = _events(spark)
    got = {
        r["event_id"]: r["value_winsorized"]
        for r in winsorize(e, "value", ["event_type"], 0.1, 0.9).collect()
    }
    pdf = e.select("event_id", "event_type", "value").toPandas()
    g = pdf.groupby("event_type")["value"]
    lo = g.transform(lambda s: s.quantile(0.1))
    hi = g.transform(lambda s: s.quantile(0.9))
    want = pdf["value"].clip(lo, hi)
    for eid, w in zip(pdf["event_id"], want):
        assert abs(got[eid] - w) < 1e-9, eid


def test_winsorize_nulls_and_validation(spark):
    import pytest
    from dff.outliers import winsorize

    df = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, None), (4, 100.0)], "id int, v double"
    )
    rows = {r["id"]: r["v_winsorized"] for r in winsorize(df, "v").collect()}
    assert rows[3] is None  # NULL passes through, never clips to the bound
    with pytest.raises(ValueError):
        winsorize(df, "v", p_lo=0.9, p_hi=0.1)


def test_winsorize_approx_bounds_have_small_rank_error(spark):
    """The t-digest path's clip bounds must sit within rank error 0.05 of
    the target quantiles (value-space distance is meaningless at the p99
    tail of a skewed group — rank is the sketch's actual guarantee)."""
    from dff.outliers import winsorize

    e = _events(spark)
    ap = winsorize(e, "value", ["event_type"], 0.05, 0.95, exact=False)
    # recover each group's effective clip bounds from the output
    pdf = ap.select("event_type", "value", "value_winsorized").toPandas()
    for etype, g in pdf.dropna().groupby("event_type"):
        lo, hi = g["value_winsorized"].min(), g["value_winsorized"].max()
        vals = g["value"].sort_values().to_numpy()
        rank_lo = (vals < lo).mean()
        rank_hi = (vals <= hi).mean()
        assert abs(rank_lo - 0.05) <= 0.05, (etype, rank_lo)
        assert abs(rank_hi - 0.95) <= 0.05, (etype, rank_hi)


def test_fences_as_rule_flags_same_rows_through_runner(spark):
    """Loop closed: data-derived fences -> ruleset predicate -> the main
    vectorized rule DAG flags exactly the rows iqr_outliers finds."""
    from dff.outliers import fences_as_rule
    from dff.ruleset import parse_json
    from dff.compiler import compile_ruleset

    e = _events(spark).withColumnRenamed("event_id", "eid")
    rule = fences_as_rule(e, "value", "event_type")
    rs = parse_json({"version": "fences-v1", "rules": [rule]})
    comp = compile_ruleset(rs, e)
    flagged = {
        r["eid"]
        for r in e.withColumn("v", comp.verdict)
        .where(F.col("v").isNotNull())
        .collect()
    }
    direct = {
        r["eid"] for r in iqr_outliers(e, "value", ["event_type"]).collect()
    }
    assert flagged == direct and len(flagged) > 0


def test_fences_as_rule_degenerate_inputs(spark):
    """Empty frame / all-NULL values raise; an individual all-NULL group
    is skipped with no-evidence-no-violation semantics (ADVICE r04)."""
    import pytest
    from pyspark.sql import types as T
    from dff.outliers import fences_as_rule

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="no non-NULL"):
        fences_as_rule(empty, "value")
    all_null = spark.createDataFrame([("a", None), ("b", None)], schema)
    with pytest.raises(ValueError, match="no non-NULL"):
        fences_as_rule(all_null, "value")
    with pytest.raises(ValueError, match="no group"):
        fences_as_rule(all_null, "value", "g")
    # group b has only NULLs -> skipped; the rule fires only on group a
    mixed = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("a", 100.0), ("b", None)],
        schema,
    )
    rule = fences_as_rule(mixed, "value", "g")
    assert "None" not in rule["name"] and "'b'" not in rule["name"]
    assert "'a'" in rule["name"]
