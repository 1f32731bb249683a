from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dff.sources import synthetic_source_files
from dff.stats import column_stats, grouped_stats, salted_grouped_stats
from tests.fixtures import txns_fixture


def test_column_stats_exact_vs_pandas(spark):
    pdf = txns_fixture(400)
    pdf.loc[pdf.index[:25], "AVG_DLY_AUTHZN_AMT"] = None  # plant nulls
    df = spark.createDataFrame(pdf)
    stats = {r["column"]: r.asDict() for r in column_stats(df).collect()}
    s = stats["AUTHZN_AMT"]
    assert s["rows"] == 400 and s["null_count"] == 0
    assert abs(s["mean"] - pdf["AUTHZN_AMT"].mean()) < 1e-9
    assert abs(s["stddev"] - pdf["AUTHZN_AMT"].std(ddof=1)) < 1e-9
    assert s["min"] == pdf["AUTHZN_AMT"].min()
    assert s["max"] == pdf["AUTHZN_AMT"].max()
    n = stats["AVG_DLY_AUTHZN_AMT"]
    assert n["null_count"] == 25 and abs(n["null_rate"] - 25 / 400) < 1e-12
    # approx distinct within documented rsd (5% default, generous bound)
    exact = pdf["AUTHZN_AMT"].nunique()
    assert abs(s["approx_distinct"] - exact) <= max(3, 0.15 * exact)
    # median within GK accuracy
    med = float(np.quantile(pdf["AUTHZN_AMT"], 0.5))
    q50 = s["quantiles"][2]
    assert abs(q50 - med) < 0.05 * (s["max"] - s["min"])


def test_column_stats_string_columns(spark):
    df = synthetic_source_files(spark, 1000, n_repos=50)
    stats = {r["column"]: r.asDict() for r in column_stats(df, ["lang", "content"]).collect()}
    assert stats["lang"]["null_count"] > 0
    assert stats["content"]["min"] == 0.0  # planted empty content
    assert stats["content"]["mean"] > 10


def test_column_stats_single_scan(spark):
    """All stats share ONE scan (multiple aggregates -> one Exchange)."""
    pdf = txns_fixture(64)
    df = spark.createDataFrame(pdf)
    from dff.stats import DEFAULT_QUANTILES, _is_numeric  # noqa: F401

    agg_df = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("AUTHZN_AMT").alias("m"),
        F.stddev_samp("AUTHZN_AMT").alias("s"),
        F.approx_count_distinct("AUTHZN_AMT").alias("d"),
        F.percentile_approx("AUTHZN_AMT", 0.5).alias("q"),
    )
    plan = agg_df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("Relation") == 1


def test_salted_equals_unsalted_on_skew(spark):
    df = synthetic_source_files(spark, 20000, n_repos=100, skew=True).withColumn(
        "content_length", F.length("content").cast("double")
    )
    plain = {
        r["lang"]: r.asDict()
        for r in grouped_stats(df, ["lang"], "content_length").collect()
        if r["lang"] is not None
    }
    salted = {
        r["lang"]: r.asDict()
        for r in salted_grouped_stats(df, ["lang"], "content_length", salt_buckets=8).collect()
        if r["lang"] is not None
    }
    assert set(plain) == set(salted)
    for lang in plain:
        p, s = plain[lang], salted[lang]
        assert p["rows"] == s["rows"]
        assert p["min"] == s["min"] and p["max"] == s["max"]
        assert abs(p["mean"] - s["mean"]) < 1e-6 * max(1.0, abs(p["mean"]))
        if p["rows"] > 1:
            assert abs(p["stddev"] - s["stddev"]) < 1e-5 * max(1.0, p["stddev"])
    # skew actually present: python dominates
    assert plain["python"]["rows"] > 10 * plain["java"]["rows"]
