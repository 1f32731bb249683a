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


def _skewed_fixture(spark):
    import random

    rng = random.Random(7)
    base = dt.datetime(2026, 1, 1)
    sec = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    right_rows = []
    # hot key 1: 2000 right rows over ~28h, incl. deliberate ts ties
    for i in range(2000):
        s = rng.randrange(0, 100_000)
        right_rows.append((1, sec(s), f"r{i:05d}", float(i)))
        if i % 97 == 0:
            right_rows.append((1, sec(s), f"t{i:05d}", float(i) + 0.5))
    # sparse key 2, and key 3 with right rows only in early buckets
    right_rows += [(2, sec(50), "r2a", 1.0), (2, sec(90_000), "r2b", 2.0)]
    right_rows += [(3, sec(10), "r3a", 1.0)]
    left_rows = []
    for i in range(600):
        left_rows.append((1, sec(rng.randrange(0, 110_000)), f"l{i:04d}"))
    left_rows += [
        (2, sec(10), "l_early"),          # before any key-2 right row
        (2, sec(95_000), "l_late"),
        (3, sec(99_999), "l_gap"),        # many empty buckets after r3a
        (4, sec(500), "l_nokey"),         # key with no right rows
    ]
    return (
        spark.createDataFrame(left_rows, _L_SCHEMA),
        spark.createDataFrame(right_rows, _R_SCHEMA),
    )


def test_skewed_asof_identical_to_plain_on_hot_key(spark):
    """VERDICT r03 #3: the coarse-time-bucket as-of must return EXACTLY
    what plain asof_join returns on a skewed fixture — hot key, ts ties,
    empty buckets between a right row and a much later left row, keys
    with no right rows."""
    from dff.asof import asof_join, asof_join_skewed

    left, right = _skewed_fixture(spark)
    kw = dict(on=["k"], ts_col="ts", right_cols=["rid", "v"],
              right_order=["rid"])
    plain = asof_join(left, right, **kw)
    skewed = asof_join_skewed(left, right, bucket_width=3600.0, **kw)
    key = lambda r: (r["k"], r["lid"])  # noqa: E731
    a = sorted(map(tuple, plain.collect()), key=lambda t: (t[0], t[2]))
    b = sorted(map(tuple, skewed.collect()), key=lambda t: (t[0], t[2]))
    assert a == b
    assert len(a) == left.count()


def test_skewed_asof_window_partitions_by_bucket(spark):
    """The in-bucket fill window must partition on (key, bucket) — that is
    the mechanism that splits a hot key across tasks."""
    from dff.asof import asof_join_skewed

    left, right = _skewed_fixture(spark)
    plan = (
        asof_join_skewed(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"],
            bucket_width=3600.0, right_order=["rid"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the fill window's partition spec carries __bkt alongside k
    assert "windowspecdefinition(k" in plan and "__bkt" in plan, plan
    import re

    specs = re.findall(r"windowspecdefinition\(k#\d+L?, __bkt#\d+", plan)
    assert specs, plan


def test_skewed_asof_handles_timestamp_ntz(spark):
    """Parquet timestamps read back as TIMESTAMP_NTZ, which cannot cast
    straight to double — the bucketing expression must hop through
    TIMESTAMP (found driving the real sf0.001 events table)."""
    from dff.asof import asof_join_skewed

    ntz = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("rid", T.StringType()),
        ]
    )
    left = spark.createDataFrame([(1, _TS(5), "a")], ntz)
    right = spark.createDataFrame([(1, _TS(3), "r3")], ntz)
    out = asof_join_skewed(
        left, right, on=["k"], ts_col="ts", right_cols=["rid"],
        bucket_width=60.0,
    ).collect()
    assert [(r["rid"], r["rid_r"]) for r in out] == [("a", "r3")]


def test_forward_inclusive_and_null_ts_left(spark):
    left = spark.createDataFrame(
        [
            (1, _TS(5), "a"),    # next right at/after 5 -> r10
            (1, _TS(10), "b"),   # exactly 10 -> r10 (inclusive)
            (1, _TS(25), "c"),   # after every right row -> nulls
            (1, None, "n"),      # NULL left ts must match nothing
        ],
        _L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _TS(3), "r3", 3.0), (1, _TS(10), "r10", 10.0), (1, _TS(20), "r20", 20.0)],
        _R_SCHEMA,
    )
    out = {
        r["lid"]: (r["rid_r"], r["v_r"])
        for r in asof_join(
            left, right, ["k"], "ts", ["rid", "v"], direction="forward"
        ).collect()
    }
    assert out["a"] == ("r10", 10.0)
    assert out["b"] == ("r10", 10.0)
    assert out["c"] == (None, None)
    assert out["n"] == (None, None)


def test_forward_tiebreak_smallest_right_order(spark):
    left = spark.createDataFrame([(1, _TS(5), "a")], _L_SCHEMA)
    right = spark.createDataFrame(
        [(1, _TS(8), "r8b", 2.0), (1, _TS(8), "r8a", 1.0)], _R_SCHEMA
    )
    out = asof_join(
        left, right, ["k"], "ts", ["rid", "v"],
        right_order=["rid"], direction="forward",
    ).first()
    assert out["rid_r"] == "r8a"  # forward keeps the SMALLEST tie-break


def test_nearest_picks_closer_and_ties_backward(spark):
    left = spark.createDataFrame(
        [
            (1, _TS(4), "a"),    # r3 at d=1 vs r10 at d=6 -> backward r3
            (1, _TS(8), "b"),    # r3 at d=5 vs r10 at d=2 -> forward r10
            (1, _TS(15), "c"),   # r10 d=5 vs r20 d=5 -> tie -> backward r10
            (2, _TS(5), "d"),    # no right rows -> nulls
        ],
        _L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _TS(3), "r3", 3.0), (1, _TS(10), "r10", 10.0), (1, _TS(20), "r20", 20.0)],
        _R_SCHEMA,
    )
    out = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            left, right, ["k"], "ts", ["rid", "v"], direction="nearest"
        ).collect()
    }
    assert out == {"a": "r3", "b": "r10", "c": "r10", "d": None}


def test_direction_validation(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, _TS(4), "a")], _L_SCHEMA)
    right = spark.createDataFrame([(1, _TS(3), "r", 1.0)], _R_SCHEMA)
    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "ts", ["rid"], direction="sideways")


def test_nearest_single_exchange(spark):
    """nearest computes two window specs but must plan exactly ONE
    Exchange (both windows share the key-hash partitioning)."""
    left = spark.createDataFrame([(1, _TS(4), "a")], _L_SCHEMA)
    right = spark.createDataFrame([(1, _TS(3), "r", 1.0)], _R_SCHEMA)
    plan = (
        asof_join(left, right, ["k"], "ts", ["rid"], direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
