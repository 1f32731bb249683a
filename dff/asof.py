"""As-of (backward) join — the canonical "operator Spark lacks" from the
task brief, realized as a composition of built-in DataFrame ops (no UDF).

Semantics (matching DuckDB/kdb/pandas ``merge_asof`` backward, inclusive):
for every left row, attach the right row with the LARGEST right timestamp
``<=`` the left timestamp within the same key group; left rows with no
prior right row keep NULLs (left-join flavor).

Realization — the union + ordered window fill:
  1. tag right rows side=0 carrying a struct of their payload, left rows
     side=1 carrying NULL payload;
  2. union, then one window per key ordered by (ts, side) with
     ``last(payload, ignorenulls=true)`` over UNBOUNDED PRECEDING..CURRENT:
     each left row picks up the most recent right payload, and a right row
     at exactly the left timestamp sorts FIRST (side 0 < 1) so the match is
     inclusive;
  3. keep the left rows.

Scale shape: ONE shuffle of (left + right) on the key columns and a
per-key sort — no range cross-product, no per-left-row probe, and the
window state is a single struct (the running last payload).  A key's whole
timeline lands in one partition (inherent to ordered semantics); for a
pathologically hot key, pre-bucket by coarse time range and as-of join
within buckets after seeding each bucket with the previous bucket's last
right row — the composition below is the building block for that too.

If several right rows share one (key, ts), the match among them is
tie-broken by the extra ``right_order`` columns (default: payload order is
unspecified — pass e.g. an id column for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    right_suffix: str = "_r",
    right_order: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (see module docstring); all three pandas ``merge_asof``
    directions, inclusive:

    - ``"backward"`` (default): largest right ts <= left ts;
    - ``"forward"``: smallest right ts >= left ts;
    - ``"nearest"``: whichever of the two is closer in time; an exact
      distance tie resolves to the backward match.

    All directions are the SAME single shuffle of (left + right) on the
    key columns; forward adds nothing, nearest adds one extra sort over
    the already-partitioned data (two window specs, one Exchange).
    Tie-break among right rows sharing a timestamp: backward keeps the
    LARGEST ``right_order`` (the latest), forward the SMALLEST (the
    earliest) — each deterministic, mirroring "most recent before" /
    "first after".

    Returns every ``left`` column plus ``{ts_col}{right_suffix}`` and each
    of ``right_cols`` suffixed — NULL where no right row qualifies.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    # A right row with a NULL timestamp can never be "the largest ts <="
    # anything (DuckDB ASOF / pandas merge_asof agree) — but Spark's asc
    # sort puts nulls FIRST, so an unfiltered null-ts right row would sort
    # before every left row and its payload would propagate via
    # last(ignorenulls) to the whole key group (ADVICE r03).  Filter it
    # out up front.  Left rows with a NULL ts need no special case: they
    # sort before every (non-null-ts) right row and so match NULL.
    right = right.where(F.col(ts_col).isNotNull())
    carry = list(dict.fromkeys([ts_col, *right_cols, *(right_order or [])]))
    rstruct = F.struct(*[F.col(c) for c in carry])
    r2 = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        rstruct.alias("__r"),
        F.lit(0).alias("__side"),
    )
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
        lstruct.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))
    u = l2.unionByName(r2)

    def back_match():
        # right rows at the left ts sort FIRST (side 0 < 1) -> inclusive;
        # among equal-ts right rows last() keeps the largest right_order
        order = [F.col("__ts").asc(), F.col("__side").asc()]
        for c in right_order or []:
            order.append(F.col("__r").getField(c).asc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__r", ignorenulls=True).over(w)

    def fwd_match():
        # left rows sort FIRST at equal ts (side desc: 1 before 0) ->
        # a right row at exactly the left ts is inside the following
        # frame (inclusive); first() keeps the smallest right_order
        order = [F.col("__ts").asc(), F.col("__side").desc()]
        for c in right_order or []:
            order.append(F.col("__r").getField(c).asc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        # a NULL-ts left row sorts FIRST (asc nulls first) and would see
        # every right row in its following frame — mask it to no-match,
        # mirroring the backward direction's natural behavior
        return F.when(
            F.col("__ts").isNotNull(), F.first("__r", ignorenulls=True).over(w)
        )

    if direction == "backward":
        filled = u.withColumn("__match", back_match())
    elif direction == "forward":
        filled = u.withColumn("__match", fwd_match())
    else:  # nearest: both windows share the ONE hash partitioning
        filled = u.withColumn("__b", back_match()).withColumn(
            "__f", fwd_match()
        )
        b_ts, f_ts = F.col(f"__b.{ts_col}"), F.col(f"__f.{ts_col}")
        # distance tie (or missing side) resolves to the backward match
        filled = filled.withColumn(
            "__match",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(
                F.col("__ts") - b_ts <= f_ts - F.col("__ts"), F.col("__b")
            )
            .otherwise(F.col("__f")),
        )
    filled = filled.where(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__match.{ts_col}").alias(f"{ts_col}{right_suffix}"))
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{right_suffix}") for c in right_cols
    ]
    return filled.select(*out_cols)


def asof_join_skewed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    bucket_width: float,
    right_suffix: str = "_r",
    right_order: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join for HOT keys — identical results to
    :func:`asof_join`, but a key's timeline is split across coarse time
    buckets of ``bucket_width`` (seconds for timestamp ``ts_col``, value
    units for numeric) so no single task ever sorts a whole hot key
    (VERDICT r03 #3 — plain as-of inherently lands one key in one task).

    Realization (all built-in ops, no UDF):

    1. bucket both sides by ``floor(ts / width)``;
    2. per (key, bucket) reduce the right side to its LAST row
       (``max_by`` over (ts, right_order) — a summary row per non-empty
       bucket, tiny);
    3. running ``last`` of those summaries per key across buckets, then
       ``lag`` by one bucket = each bucket's SEED: the newest right row
       strictly before the bucket, injected as an extra side-0 row (its
       ts is < the bucket start, so it sorts first and never outranks a
       real in-bucket right row);
    4. the same union + ordered window fill as :func:`asof_join`, but
       partitioned by (key, bucket) — a hot key now spreads over
       ``timeline span / width`` tasks.

    Extra cost vs plain as-of: one aggregation of the right side plus a
    kilobyte-scale summary shuffle; the main union shuffle is unchanged
    in volume, only finer-keyed.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    right = right.where(F.col(ts_col).isNotNull())
    w = F.lit(float(bucket_width))

    def bkt(df: DataFrame, c: str):
        # TIMESTAMP_NTZ (what parquet timestamps commonly read back as)
        # cannot cast straight to double; hop through TIMESTAMP first.
        # Any monotonic numeric mapping works for bucketing — the session
        # timezone offset an NTZ->TZ cast introduces is a constant shift.
        col = F.col(c)
        if df.schema[c].dataType.typeName().startswith("timestamp"):
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / w)

    carry = list(dict.fromkeys([ts_col, *right_cols, *(right_order or [])]))
    rstruct = F.struct(*[F.col(c) for c in carry])
    ordstruct = F.struct(
        F.col(ts_col), *[F.col(c) for c in (right_order or [])]
    )
    rb = right.withColumn("__bkt", bkt(right, ts_col))
    lb = left.withColumn("__bkt", bkt(left, ts_col))

    # (2) per-bucket last right row; (3) each summary SEEDS every bucket
    # up to (and including) the next non-empty right bucket: for a bucket
    # j with no earlier in-bucket right row, the newest right row strictly
    # before j is exactly the last row of the latest non-empty right
    # bucket b < j — so explode each summary over (b, next_b], capped at
    # the left side's global max bucket (no left row can need a seed
    # beyond it).  r6 rework: the old realization enumerated the DISTINCT
    # (key, bucket) set of BOTH sides (a union+distinct over every row)
    # and ran running-last + lag windows over it; the lead+explode over
    # the tiny summary set removes that full-size exchange and two window
    # passes — identical seed placement by construction.
    summaries = rb.groupBy(*on, "__bkt").agg(
        F.max_by(rstruct, ordstruct).alias("__r")
    )
    lmax = lb.agg(F.max("__bkt").alias("__gmax"))
    w_next = Window.partitionBy(*on).orderBy(F.col("__bkt").asc())
    seed_end = F.least(
        F.coalesce(F.lead("__bkt").over(w_next), F.col("__gmax")),
        F.col("__gmax"),
    )
    seeds = (
        summaries.crossJoin(F.broadcast(lmax))
        .withColumn("__end", seed_end)
        .where(F.col("__end") >= F.col("__bkt") + 1)
        .select(
            *on,
            F.explode(
                F.sequence(F.col("__bkt") + 1, F.col("__end"))
            ).alias("__bkt"),
            "__r",
        )
    )

    # (4) union + in-bucket ordered window fill (asof_join's core, keyed
    # by (on..., __bkt))
    r2 = rb.select(
        *on, "__bkt",
        F.col(ts_col).alias("__ts"), rstruct.alias("__r"),
        F.lit(0).alias("__side"),
    )
    s2 = seeds.select(
        *on, "__bkt",
        F.col("__r").getField(ts_col).alias("__ts"), F.col("__r"),
        F.lit(0).alias("__side"),
    )
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l2 = lb.select(
        *on, "__bkt",
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
        lstruct.alias("__l"),
    )
    null_l = F.lit(None).cast(l2.schema["__l"].dataType)
    u = l2.unionByName(r2.withColumn("__l", null_l)).unionByName(
        s2.withColumn("__l", null_l)
    )
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    for c in right_order or []:
        order.append(F.col("__r").getField(c).asc_nulls_first())
    wf = (
        Window.partitionBy(*on, "__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(wf)
    ).where(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__match.{ts_col}").alias(f"{ts_col}{right_suffix}"))
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{right_suffix}") for c in right_cols
    ]
    return filled.select(*out_cols)
