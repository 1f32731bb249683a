"""As-of join semantics: backward inclusive, per-key, null on no-match,
deterministic tie-break among equal-timestamp right rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.asof import asof_join

_TS = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731

_L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lid", T.StringType()),
    ]
)
_R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("rid", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_backward_inclusive_and_no_match_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _TS(5), "a"),   # matches r@3
            (1, _TS(10), "b"),  # matches r@10 exactly (inclusive)
            (1, _TS(1), "c"),   # before any right row -> nulls
            (2, _TS(5), "d"),   # key 2 has no right rows at all -> nulls
        ],
        _L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _TS(3), "r3", 3.0), (1, _TS(10), "r10", 10.0), (1, _TS(20), "r20", 20.0)],
        _R_SCHEMA,
    )
    out = {
        r["lid"]: (r["rid_r"], r["v_r"])
        for r in asof_join(left, right, ["k"], "ts", ["rid", "v"]).collect()
    }
    assert out["a"] == ("r3", 3.0)
    assert out["b"] == ("r10", 10.0)   # equal ts matches (inclusive)
    assert out["c"] == (None, None)
    assert out["d"] == (None, None)


def test_equal_ts_right_rows_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, _TS(9), "x")], _L_SCHEMA)
    right = spark.createDataFrame(
        [(1, _TS(5), "rB", 2.0), (1, _TS(5), "rA", 1.0)], _R_SCHEMA
    )
    out = asof_join(
        left, right, ["k"], "ts", ["rid", "v"], right_order=["rid"]
    ).collect()[0]
    # last in (ts, rid) order wins -> rB
    assert out["rid_r"] == "rB"


def test_one_shuffle_on_key(spark):
    left = spark.createDataFrame([(1, _TS(5), "a")], _L_SCHEMA)
    right = spark.createDataFrame([(1, _TS(3), "r", 1.0)], _R_SCHEMA)
    plan = (
        asof_join(left, right, ["k"], "ts", ["rid", "v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + window: exactly one hash Exchange (on the key), no join node
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_null_timestamps_never_match_or_propagate(spark):
    """ADVICE r03: a right row with a NULL timestamp must not match any
    left row (Spark's nulls-first asc sort would otherwise propagate its
    payload to the whole key group); a left row with a NULL timestamp
    matches nothing."""
    left = spark.createDataFrame(
        [(1, _TS(5), "a"), (1, None, "l_null")], _L_SCHEMA
    )
    right = spark.createDataFrame(
        [(1, None, "r_null", 99.0), (1, _TS(3), "r3", 3.0)], _R_SCHEMA
    )
    out = {
        r["lid"]: (r["rid_r"], r["v_r"])
        for r in asof_join(left, right, ["k"], "ts", ["rid", "v"]).collect()
    }
    assert out["a"] == ("r3", 3.0)          # null-ts right row ignored
    assert out["l_null"] == (None, None)    # null-ts left row matches nothing
