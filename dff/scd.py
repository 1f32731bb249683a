"""Slowly-changing-dimension (SCD type 2) interval builder: collapse a
change log into validity intervals, the standard warehouse realization of
"what did this entity look like at time T?".

Reference analog: none direct (the reference scores point-in-time
records); this is the dimension-history op a lakehouse pipeline pairs
with :meth:`dff.tablefmt.Table.merge_upsert` — new change batches merge
into the open intervals, closed history is immutable.

Shape: ONE shuffle on the key columns; both window passes (change
suppression, then interval close) share the same partitioning, so
Catalyst plans a single Exchange with two in-partition sorts.  A key's
whole history sorts in one task — histories are short (per-entity change
counts), so unlike event timelines this needs no hot-key bucketing; for
a pathological key the :func:`dff.asof.asof_join_skewed` bucketing trick
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_intervals"]


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """SCD-2 history from a change log: per key, consecutive rows whose
    ``attr_cols`` are unchanged collapse into one interval; each change
    opens ``[valid_from, valid_to)`` where ``valid_to`` is the NEXT
    change's timestamp (NULL for the current/open interval,
    ``is_current = true``).

    Ordering within a key is ``(ts_col, *order_cols)`` — pass a unique
    tie-break (an event id) when timestamps can repeat, or the result is
    nondeterministic.  NULL attribute transitions count as changes only
    when the value actually differs (struct equality is null-safe).
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in (order_cols or []))]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # change suppression: keep the first row of every run of equal attrs.
    # <=> (struct equality) is null-safe, so NULL->NULL is "unchanged"
    changed = df.withColumn("__prev", F.lag(attrs).over(w)).where(
        F.col("__prev").isNull() | ~attrs.eqNullSafe(F.col("__prev"))
    )
    out = (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out.select(
        *key_cols, *attr_cols, "valid_from", "valid_to", "is_current"
    )
