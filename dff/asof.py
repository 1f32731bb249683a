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
) -> DataFrame:
    """Backward inclusive as-of join (see module docstring).

    Returns every ``left`` column plus ``{ts_col}{right_suffix}`` and each
    of ``right_cols`` suffixed — NULL where no right row precedes.
    """
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
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    for c in right_order or []:
        order.append(F.col("__r").getField(c).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__match.{ts_col}").alias(f"{ts_col}{right_suffix}"))
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{right_suffix}") for c in right_cols
    ]
    return filled.select(*out_cols)
