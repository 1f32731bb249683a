"""Binned range join: inclusivity, multi-bucket intervals, no duplicates,
and the equi-join (never nested-loop) plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.rangejoin import interval_point_join

_P = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("pid", T.StringType()),
     T.StructField("v", T.DoubleType())]
)
_I = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("iid", T.StringType()),
     T.StructField("lo", T.DoubleType()), T.StructField("hi", T.DoubleType())]
)


def test_matches_boundaries_and_wide_intervals_once(spark):
    points = spark.createDataFrame(
        [(1, "p0", 0.0), (1, "p5", 5.0), (1, "p10", 10.0), (2, "q5", 5.0)], _P
    )
    intervals = spark.createDataFrame(
        [
            (1, "i_narrow", 4.0, 6.0),    # catches p5 only
            (1, "i_wide", 0.0, 10.0),     # spans many buckets; catches all 3
            (1, "i_edge", 10.0, 12.0),    # inclusive lower bound catches p10
            (2, "i_otherkey", 0.0, 10.0), # key 2 catches only q5
        ],
        _I,
    )
    out = interval_point_join(
        points, intervals, ["k"], "v", "lo", "hi", bucket_width=2.0
    )
    pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert pairs == sorted(
        [
            ("p5", "i_narrow"),
            ("p0", "i_wide"), ("p5", "i_wide"), ("p10", "i_wide"),
            ("p10", "i_edge"),
            ("q5", "i_otherkey"),
        ]
    )  # each pair exactly once despite i_wide overlapping 6 buckets


def test_negative_values_and_invalid_width(spark):
    points = spark.createDataFrame([(1, "pn", -3.5)], _P)
    intervals = spark.createDataFrame([(1, "in", -4.0, -3.0)], _I)
    out = interval_point_join(points, intervals, ["k"], "v", "lo", "hi", 1.0)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [("pn", "in")]
    with pytest.raises(ValueError, match="bucket_width"):
        interval_point_join(points, intervals, ["k"], "v", "lo", "hi", 0.0)


def test_plan_is_equi_join_not_nested_loop(spark):
    points = spark.createDataFrame(
        [(i % 7, f"p{i}", float(i)) for i in range(500)], _P
    )
    intervals = spark.createDataFrame(
        [(i % 7, f"i{i}", float(i), float(i + 3)) for i in range(500)], _I
    )
    plan = (
        interval_point_join(points, intervals, ["k"], "v", "lo", "hi", 4.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan

def test_interval_overlap_join_once_per_pair(spark):
    """Overlap pairs found exactly once via the canonical (overlap-start)
    bucket, including touching endpoints and multi-bucket overlaps."""
    from dff.rangejoin import interval_overlap_join

    L = spark.createDataFrame(
        [(1, "a", 0.0, 10.0), (1, "b", 12.0, 13.0), (2, "c", 0.0, 100.0)],
        ["k", "lid", "ls", "le"],
    )
    R = spark.createDataFrame(
        [
            (1, "x", 5.0, 20.0),    # overlaps a (5..10, spans buckets) and b
            (1, "y", 10.0, 11.0),   # touches a exactly at 10 (inclusive)
            (1, "z", 30.0, 40.0),   # overlaps nothing on key 1
            (2, "w", 99.0, 200.0),  # overlaps c at the tail
        ],
        ["k", "rid", "rs", "re"],
    )
    out = interval_overlap_join(L, R, ["k"], "ls", "le", "rs", "re", 4.0)
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == sorted(
        [("a", "x"), ("b", "x"), ("a", "y"), ("c", "w")]
    )  # each exactly once despite long shared bucket ranges


def test_left_join_keeps_unmatched_points_with_nulls(spark):
    """ADVICE r03 (medium): the BETWEEN predicate must live in the JOIN
    condition — a left point whose bucket matches an interval but which
    lies inside none must survive with null interval columns, and a point
    with no bucket match at all must too."""
    points = spark.createDataFrame(
        [
            (1, "p_in", 5.0),       # inside i1
            (1, "p_bucket", 7.9),   # i1's bucket range, but outside [4,6]
            (1, "p_nobucket", 50.0),  # no interval anywhere near
            (3, "p_nokey", 5.0),    # key with no intervals
        ],
        _P,
    )
    intervals = spark.createDataFrame([(1, "i1", 4.0, 6.0)], _I)
    out = interval_point_join(
        points, intervals, ["k"], "v", "lo", "hi", bucket_width=4.0,
        how="left",
    )
    got = {r["pid"]: r["iid"] for r in out.collect()}
    assert got == {
        "p_in": "i1", "p_bucket": None, "p_nobucket": None, "p_nokey": None
    }
    assert out.count() == 4  # exactly one row per point, matched or not
    # inner unchanged: only the true match survives
    inner = interval_point_join(
        points, intervals, ["k"], "v", "lo", "hi", bucket_width=4.0
    )
    assert [(r["pid"], r["iid"]) for r in inner.collect()] == [("p_in", "i1")]
    with pytest.raises(ValueError, match="how"):
        interval_point_join(
            points, intervals, ["k"], "v", "lo", "hi", 4.0, how="full"
        )
