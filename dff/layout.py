"""Multi-dimensional data layout (Z-order) + file-level min/max skipping.

At 100 TB the fastest scan is the one that never reads most files: engines
skip a parquet file when its footer min/max excludes the predicate.  A
single-column sort gives skipping on that column only; interleaving the
bits of several columns (the Z-order / Morton curve used by Delta OPTIMIZE
ZORDER BY and Iceberg's sort orders) makes files selective on EVERY indexed
column at once.

Everything is Catalyst expressions:

- :func:`zvalue` builds the Morton code as a fixed tree of
  ``shiftleft``/``shiftright``/``&``/``|`` ops (compiled once, whole-stage
  codegen; no UDF).  Columns are first bucketed to ``bits``-bit integers —
  ``method="linear"`` min-max scales (one tiny agg, broadcast), or
  ``method="quantile"`` uses equi-depth boundaries (``width_bucket`` over
  approx-percentile cut points) so a skewed column still spreads across
  buckets.
- :func:`zorder_write` range-partitions by the z-value and sorts within
  partitions before writing — each output file covers a compact z-range,
  i.e. a small hyper-rectangle of the indexed space.
- :func:`file_stats` reads back per-file min/max/count from
  ``_metadata.file_path`` (the engine-side realization of the footer stats
  a table format keeps in its manifest).
- :func:`prunable_fraction` answers "what share of files can a predicate
  skip" straight from that stats table — the measurable benefit.

The quantile boundary collect is bounded (``<= 2^bits`` doubles per
column), the same deliberate driver-side footprint as the IVF centroid
sample (dff/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zvalue", "zorder_write", "file_stats", "prunable_fraction"]


def _bucket_linear(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Min-max scale each column to an integer in [0, 2^bits)."""
    hi = (1 << bits) - 1
    agg = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    )
    row = agg.first()
    out = []
    for c in cols:
        lo, span = row[f"__lo_{c}"], None
        if lo is not None:
            span = row[f"__hi_{c}"] - lo
        if not span:  # constant / all-null column: everything in bucket 0
            out.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
            float(hi)
        )
        out.append(
            F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(hi)).cast("long")
        )
    return out


def _bucket_quantile(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Equi-depth buckets (skew-proof — a hot value range cannot swallow
    the whole bucket space): bucket(v) = #{approx-percentile cut points
    <= v}, evaluated as one ``F.aggregate`` over a literal cut-point array
    (<= 2^bits - 1 comparisons per row, JVM-side)."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    agg = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10000).alias(c)
            for c in cols
        ]
    )
    row = agg.first()
    out = []
    for c in cols:
        cuts = row[c]
        uniq = sorted(set(cuts)) if cuts else []
        if not uniq:
            out.append(F.lit(0).cast("long"))
            continue
        arr = F.array(*[F.lit(float(x)) for x in uniq])
        v = F.col(c).cast("double")
        bucket = F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, cut: acc
            + F.when(v >= cut, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        out.append(F.coalesce(bucket, F.lit(0).cast("long")))
    return out


def zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    method: str = "linear",
) -> Column:
    """Morton (Z-order) code over ``cols`` as one Catalyst expression.

    ``bits`` per column defaults to the most that fits a signed 64-bit
    value (``63 // len(cols)``, capped at 16).  NULLs bucket to 0 (they
    cluster together — exactly what skipping wants).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits is None:
        bits = min(16, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    if method == "linear":
        buckets = _bucket_linear(df, cols, bits)
    elif method == "quantile":
        buckets = _bucket_quantile(df, cols, bits)
    else:
        raise ValueError(f"unknown method {method!r}")
    n = len(cols)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        b = F.coalesce(b, F.lit(0).cast("long"))
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int | None = None,
    method: str = "linear",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by Z-order.

    ``repartitionByRange`` gives each file a compact z-range (a small
    hyper-rectangle of the indexed space) and ``sortWithinPartitions``
    tightens per-rowgroup stats too.  The helper column never lands in the
    output schema.
    """
    z = zvalue(df, cols, bits, method)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max/count — what a table format's manifest would hold."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prunable_fraction(stats_df: DataFrame, col: str, lo, hi) -> float:
    """Share of files a ``col BETWEEN lo AND hi`` scan skips outright."""
    total = stats_df.count()
    if total == 0:
        return 0.0
    overlapping = stats_df.where(
        (F.col(f"{col}_max") >= F.lit(lo)) & (F.col(f"{col}_min") <= F.lit(hi))
    ).count()
    return 1.0 - overlapping / total
