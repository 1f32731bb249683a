"""Null repair: per-group imputation — the fix-forward half of validation.

The reference pipeline drops or zero-fills missing feature values before
scoring (/root/reference/01_dff_model.py model prep); a production
validation engine instead REPAIRS in place with data-derived fill values
and keeps an audit flag.  Strategies:

- ``mean``   — per-group average (one algebraic agg);
- ``median`` — per-group exact interpolated median (``F.percentile``; at
  10^12 rows swap the bounds source for :mod:`dff.tdigest` sketches — same
  broadcast-join plan, see dff/outliers.py for the worked pattern);
- ``constant`` — a caller-supplied literal.

Groups whose values are ALL null fall back to the global statistic (and to
the constant/NULL if the whole column is null).  Plan: fact scan ->
broadcast join of a one-row-per-group bounds table -> coalesce; the fact
table never shuffles, skewed groups cost what uniform ones do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["impute"]

_STRATS = ("mean", "median", "constant")


def _stat(strategy: str, col: str):
    if strategy == "mean":
        return F.avg(col)
    return F.percentile(col, F.lit(0.5))


def impute(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    strategy: str = "mean",
    fill_value: float | None = None,
    flag_col: str | None = "was_imputed",
) -> DataFrame:
    """Fill NULL ``value_col`` rows; adds ``flag_col`` marking repairs.

    The original column is REPLACED (audit trail lives in the flag), so
    downstream constraints see the repaired frame with its schema intact.
    """
    if strategy not in _STRATS:
        raise ValueError(f"strategy must be one of {_STRATS}, got {strategy!r}")
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("strategy='constant' requires fill_value")
        filled = F.coalesce(F.col(value_col), F.lit(float(fill_value)))
        out = df
    else:
        group_cols = group_cols or []
        g = df.groupBy(*group_cols) if group_cols else df.groupBy()
        bounds = g.agg(_stat(strategy, value_col).alias("__grp_fill"))
        glob = df.agg(_stat(strategy, value_col).alias("__glob_fill"))
        if group_cols:
            out = df.join(F.broadcast(bounds), on=group_cols, how="left")
        else:
            out = df.crossJoin(F.broadcast(bounds))
        out = out.crossJoin(F.broadcast(glob))
        filled = F.coalesce(
            F.col(value_col).cast("double"),
            F.col("__grp_fill"),
            F.col("__glob_fill"),
        )
    was_null = F.col(value_col).isNull()
    out = out.withColumn("__filled", filled)
    if flag_col:
        out = out.withColumn(flag_col, was_null & F.col("__filled").isNotNull())
    return (
        out.drop(value_col, "__grp_fill", "__glob_fill")
        .withColumnRenamed("__filled", value_col)
    )
