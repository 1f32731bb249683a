"""One-pass, skew-aware per-column statistics (SURVEY.md §2.4).

The reference's only "stats" are a fitted StandardScaler (per-column
mean/std, /root/reference/01_dff_model.py:138-139,284-285) and a group-by
confusion matrix (01_dff_model.py:503-507).  The north rule extends this to
a full profile pass: count, null rate, min/max, mean/std, approximate
distinct (HyperLogLog) and approximate quantiles — all computed in ONE
``agg`` so the table is scanned once (multiple aggregates share one shuffle;
verified single-exchange in tests via ``explain``).

Skew handling: ``salted_grouped_stats`` implements the two-stage salted
aggregation demanded by the north rule for hot keys (Zipfian ``lang`` /
``repo``): stage 1 groups by ``(key, salt)`` computing algebraic partials
(count / sum / sum-of-squares / min / max / HLL sketch), stage 2 merges by
``key``.  Every partial is mergeable, so the result is exactly equal to the
unsalted aggregation (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_QUANTILES = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    rsd: float = 0.05,
    percentile_accuracy: int = 10000,
) -> DataFrame:
    """Profile columns in a single scan; one output row per column.

    Numeric columns get min/max/mean/std/quantiles; string columns get
    lexical min/max and mean length.  ``approx_distinct`` uses HyperLogLog++
    (``approx_count_distinct``), quantiles use Spark's Greenwald-Khanna
    ``percentile_approx`` (the t-digest substitution documented in
    SURVEY.md §7.3 — mergeable, error-bounded).
    """
    cols = cols or df.columns
    types = dict(df.dtypes)
    schema_types = {f.name: f.dataType for f in df.schema.fields}
    exprs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        exprs.append(F.count(c).alias(f"{c}__nonnull"))
        exprs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__adist"))
        if _is_numeric(schema_types[c]):
            exprs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__std"),
                F.percentile_approx(
                    c, list(quantiles), percentile_accuracy
                ).cast("array<double>").alias(f"{c}__q"),
            ]
        else:
            length = F.length(F.col(c))
            exprs += [
                F.min(length).cast("double").alias(f"{c}__min"),
                F.max(length).cast("double").alias(f"{c}__max"),
                F.avg(length).alias(f"{c}__mean"),
                F.stddev_samp(length).alias(f"{c}__std"),
                F.percentile_approx(
                    length, list(quantiles), percentile_accuracy
                ).cast("array<double>").alias(f"{c}__q"),
            ]
    row = df.agg(*exprs).first().asDict()
    total = row["__rows"]
    out_rows = []
    for c in cols:
        nonnull = row[f"{c}__nonnull"]
        out_rows.append(
            {
                "column": c,
                "dtype": types[c],
                "rows": total,
                "non_null": nonnull,
                "null_count": total - nonnull,
                "null_rate": (total - nonnull) / total if total else 0.0,
                "min": row[f"{c}__min"],
                "max": row[f"{c}__max"],
                "mean": row[f"{c}__mean"],
                "stddev": row[f"{c}__std"],
                "approx_distinct": row[f"{c}__adist"],
                "quantiles": row[f"{c}__q"],
            }
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("rows", T.LongType()),
            T.StructField("non_null", T.LongType()),
            T.StructField("null_count", T.LongType()),
            T.StructField("null_rate", T.DoubleType()),
            T.StructField("min", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("stddev", T.DoubleType()),
            T.StructField("approx_distinct", T.LongType()),
            T.StructField("quantiles", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


def grouped_stats(
    df: DataFrame,
    keys: list[str],
    value: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group profile of one numeric column (single shuffle on ``keys``).

    Spark's hash aggregate already does map-side partial aggregation, so for
    LOW-cardinality keys this is skew-immune; for skewed HIGH-cardinality
    keys use :func:`salted_grouped_stats`.
    """
    v = F.col(value)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("rows"),
        F.count(v).alias("non_null"),
        F.min(v).cast("double").alias("min"),
        F.max(v).cast("double").alias("max"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("stddev"),
        F.approx_count_distinct(value, rsd).alias("approx_distinct"),
    )


def salted_grouped_stats(
    df: DataFrame,
    keys: list[str],
    value: str,
    salt_buckets: int = 16,
    seed: int = 42,
    include_approx_distinct: bool = True,
) -> DataFrame:
    """Two-stage salted aggregation (north-rule skew handling).

    Stage 1 shards each hot key across ``salt_buckets`` reducers by grouping
    on ``(keys..., salt)`` where salt is hash-derived (deterministic);
    stage 2 merges the algebraic partials by ``keys``.  Result is EXACTLY
    the unsalted answer: count/sum/min/max merge trivially; mean/std are
    reconstructed from (count, sum, sum-of-squares); distinct uses HLL
    sketch union (``hll_sketch_agg`` -> ``hll_union_agg``), which is
    merge-exact by construction.
    """
    v = F.col(value).cast("double")
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.lit("salt"), F.lit(seed), F.rand(seed)),
        F.lit(salt_buckets),
    )
    # F.rand gives run-to-run determinism with a seed but varies per row,
    # spreading identical keys across buckets.
    partial_aggs = [
        F.count(F.lit(1)).alias("p_rows"),
        F.count(v).alias("p_nonnull"),
        F.sum(v).alias("p_sum"),
        F.sum(v * v).alias("p_sum2"),
        F.min(v).alias("p_min"),
        F.max(v).alias("p_max"),
    ]
    merge_aggs = [
        F.sum("p_rows").alias("rows"),
        F.sum("p_nonnull").alias("non_null"),
        F.sum("p_sum").alias("sum"),
        F.sum("p_sum2").alias("sum2"),
        F.min("p_min").alias("min"),
        F.max("p_max").alias("max"),
    ]
    if include_approx_distinct:
        partial_aggs.append(
            F.hll_sketch_agg(F.col(value).cast("string")).alias("p_hll")
        )
        merge_aggs.append(F.hll_union_agg("p_hll").alias("hll"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    merged = partial.groupBy(*keys).agg(*merge_aggs)
    n = F.col("non_null")
    mean = F.when(n > 0, F.col("sum") / n)
    var = F.when(
        n > 1, (F.col("sum2") - F.col("sum") * F.col("sum") / n) / (n - 1)
    )
    out_cols = [
        *keys,
        F.col("rows"),
        n.alias("non_null"),
        F.col("min"),
        F.col("max"),
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev"),
    ]
    if include_approx_distinct:
        out_cols.append(F.hll_sketch_estimate("hll").alias("approx_distinct"))
    return merged.select(*out_cols)
