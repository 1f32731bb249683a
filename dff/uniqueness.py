"""Uniqueness constraints: hash-partitioned duplicate detection (SURVEY.md §2.4).

``groupBy(keys).count().where(count > 1)`` shuffles once on the key hash —
exactly the "hash-partitioned dedup counts" of the north rule.  Map-side
partial aggregation compacts each partition before the shuffle, so the
shuffle volume is bounded by distinct keys per partition, not rows; at
10^12 rows the dominant cost is the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicate_key_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys occurring more than once, with their multiplicity."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def duplicate_rows(df: DataFrame, keys: list[str]) -> DataFrame:
    """All rows participating in a duplicate key group.

    Implemented as a self-semi-join against the dup-key set.  The dup-key
    side is usually tiny relative to the table; both sides shuffle on the
    same keys so AQE can convert to broadcast when the dup set is small.
    """
    dups = duplicate_key_counts(df, keys).select(*keys)
    return df.join(dups, keys, "left_semi")


def dedup_exact(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Deterministically keep ONE row per key (lowest ``order_by``).

    ``dropDuplicates`` keeps an arbitrary row (partitioning-dependent);
    validation needs reproducibility, so we use a window row_number.
    One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def uniqueness_violations(df: DataFrame, keys: list[str], constraint_id: str = "uniqueness") -> DataFrame:
    """Violation rows: every row beyond the first in each duplicate group,
    tagged with the constraint id (the first occurrence is considered the
    canonical row and passes)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in df.columns])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .drop("__rn")
        .withColumn("constraint_id", F.lit(constraint_id))
    )
