"""Persisted HyperLogLog sketch rollups — incremental distinct counts.

The north rule's stats pass already reports approx-distinct per column
(``approx_count_distinct`` inside dff/stats.py).  That collapses the sketch
to a number; at 10^12 rows you want the SKETCH ITSELF as the persisted
artifact, because HLL sketches are mergeable: keep one per (partition key,
e.g. day), and the distinct count of ANY key range is a union over a
handful of kilobyte sketch rows — no rescan of the data, ever.  This is
how an incremental validation run answers "distinct users this month" from
30 stored rows instead of 30 days of events.

Built on Spark's Apache DataSketches integration (public API:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) — the
sketches are binary-portable, so a rollup written by one job is readable by
any later job or any DataSketches-compatible engine.

Plan shape: building is one groupBy over the data (map-side partial
sketches — the combine is a sketch union, so the shuffle carries sketches,
not values); merging reads only sketch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hll_rollup", "merge_rollup", "estimate_distinct"]

SKETCH_COL = "hll_sketch"


def hll_rollup(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per ``key_cols`` group over ``value_col``.

    ``lgk`` trades size for accuracy (2^lgk buckets; 12 -> ~1.6% rse).
    Output: key columns + a binary ``hll_sketch`` column — write it
    partitioned by the keys and it becomes the incremental artifact.
    """
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(SKETCH_COL)
    )


def merge_rollup(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union sketch rows down to ``group_cols`` (or one global sketch).

    Unioning N daily sketches costs N kilobyte-rows — independent of the
    original data size.  ``allowDifferentLgConfigK`` lets rollups built at
    different precisions merge (result takes the coarser).
    """
    agg = F.hll_union_agg(SKETCH_COL, F.lit(True)).alias(SKETCH_COL)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def estimate_distinct(sketches: DataFrame) -> DataFrame:
    """Replace the binary sketch with its distinct-count estimate."""
    other = [c for c in sketches.columns if c != SKETCH_COL]
    return sketches.select(
        *other, F.hll_sketch_estimate(SKETCH_COL).alias("approx_distinct")
    )
