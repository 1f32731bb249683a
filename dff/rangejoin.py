"""Range (point-in-interval) join — binned realization.

Spark has no native range join: expressing ``p.v BETWEEN i.lo AND i.hi``
directly yields a BroadcastNestedLoop (fine only when one side broadcasts)
or, with an equi key, an equi-join whose per-key groups still cross-product
against every interval.  The binned realization keeps it shuffle-bounded
when BOTH sides are large:

  1. pick ``bucket_width`` ≈ the typical interval length;
  2. a point maps to exactly ONE bucket (``floor(v / w)``);
  3. an interval explodes into every bucket it overlaps
     (``sequence(floor(lo/w), floor(hi/w))`` — ~len/w + 1 rows);
  4. equi-join on (keys…, bucket) + the exact BETWEEN filter.

A matching (point, interval) pair meets in exactly the point's bucket, so
the join produces NO duplicates — no dedup pass.  Shuffle volume is
points + exploded intervals (≈ intervals x (len/w + 1)); width tunes the
explosion-vs-selectivity trade-off, and AQE's skew-join handles hot
buckets.  The same composition with both sides exploded handles
interval-interval overlap joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with the same ``on`` keys and
    ``start_col <= point_col <= end_col`` (inclusive both ends).

    Column-name note: aside from ``on``, the two inputs must not share
    column names (alias before calling, as with any join).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(float(bucket_width))
    pb = points.withColumn("__b", F.floor(F.col(point_col) / w))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    return (
        pb.join(ib, [*on, "__b"], how)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: float,
) -> DataFrame:
    """All (left, right) interval pairs with the same keys that OVERLAP
    (``l_start <= r_end AND r_start <= l_end``, inclusive endpoints).

    Both sides explode into their overlapped buckets; an overlapping pair
    meets in every bucket both cover, so the join keeps only the CANONICAL
    bucket — the one containing the overlap's start ``max(l_start,
    r_start)``, which both intervals necessarily cover — making the output
    duplicate-free WITHOUT a dedup shuffle.  Shuffle volume is both sides
    exploded (≈ rows x (len/width + 1) each)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(float(bucket_width))

    def explode_buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__b",
            F.explode(F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))),
        )

    lb = explode_buckets(left, l_start, l_end)
    rb = explode_buckets(right, r_start, r_end)
    overlap_start = F.greatest(F.col(l_start), F.col(r_start))
    return (
        lb.join(rb, [*on, "__b"])
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__b") == F.floor(overlap_start / w))
        )
        .drop("__b")
    )
