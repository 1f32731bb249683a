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


def orphan_rows(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    broadcast: bool = True,
    constraint_id: str = "referential",
) -> DataFrame:
    """Rows whose key tuple does not exist in ``dim`` (violations)."""
    d = F.broadcast(dim.select(*on).distinct()) if broadcast else dim.select(*on).distinct()
    return df.join(d, on, "left_anti").withColumn("constraint_id", F.lit(constraint_id))


def valid_rows(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    broadcast: bool = True,
) -> DataFrame:
    """Rows whose key tuple exists in ``dim`` (passes)."""
    d = F.broadcast(dim.select(*on).distinct()) if broadcast else dim.select(*on).distinct()
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
