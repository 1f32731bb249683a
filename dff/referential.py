"""Referential-integrity constraints via broadcast anti/semi joins
(SURVEY.md §2.3 / north rule).

The reference's only join is a tiny inner equi-join
(/root/reference/01_dff_model.py:476-480); the north rule adds referential
checks: fact rows whose key is absent from a dimension are violations.
Dimensions (valid commits per repo, allowed language set) are small relative
to the 10^12-row fact table, so we broadcast them explicitly — the anti join
then runs map-side with ZERO shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_side(
    dim: DataFrame, on: list[str], broadcast: bool, dim_is_distinct: bool
) -> DataFrame:
    """Build the dimension side.  ``dim_is_distinct=True`` skips the
    ``distinct()`` shuffle for dims already unique on ``on`` (e.g. a
    commits dimension built from its natural key) — anti/semi join
    semantics are unaffected by duplicate build-side keys, so the only
    cost of a duplicated dim is broadcast size, not correctness."""
    d = dim.select(*on) if dim_is_distinct else dim.select(*on).distinct()
    return F.broadcast(d) if broadcast else d


def orphan_rows(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    broadcast: bool = True,
    constraint_id: str = "referential",
    dim_is_distinct: bool = False,
) -> DataFrame:
    """Rows whose key tuple does not exist in ``dim`` (violations)."""
    d = _dim_side(dim, on, broadcast, dim_is_distinct)
    return df.join(d, on, "left_anti").withColumn("constraint_id", F.lit(constraint_id))


def valid_rows(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    broadcast: bool = True,
    dim_is_distinct: bool = False,
) -> DataFrame:
    """Rows whose key tuple exists in ``dim`` (passes)."""
    d = _dim_side(dim, on, broadcast, dim_is_distinct)
    return df.join(d, on, "left_semi")


def allowed_values_violations(
    df: DataFrame,
    col: str,
    allowed: list,
    constraint_id: str = "allowed_values",
    include_null: bool = False,
) -> DataFrame:
    """Tiny-domain referential check as a literal IN-list — no join at all,
    pure map-side predicate (preferred over a broadcast join when the
    allowed set fits in the plan, e.g. the language whitelist)."""
    cond = ~F.col(col).isin(allowed)
    cond = cond | F.col(col).isNull() if include_null else cond & F.col(col).isNotNull()
    return df.where(cond).withColumn("constraint_id", F.lit(constraint_id))
