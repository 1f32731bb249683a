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


def orphan_rows_big_dim(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    constraint_id: str = "referential",
) -> DataFrame:
    """Referential check for dimensions too large to broadcast (e.g. the
    full (repo, commit) universe at crawl scale): result is EXACTLY
    :func:`orphan_rows`, but the fact table itself never shuffles.

    The naive non-broadcast left-anti sort-merge-joins the ENTIRE fact
    table against the dim — at 10^12 fact rows that shuffle dominates the
    job.  Here the exchanges carry keys, not rows:

    1. ``distinct`` over the fact's key tuples — one exchange of DISTINCT
       keys (many files share one (repo, commit): orders of magnitude
       smaller than the fact);
    2. left-anti of those keys against the dim — keys vs dim, fact rows
       untouched;
    3. left-semi of the fact against the resulting orphan-key set.
       Violations are rare in steady state, so AQE broadcasts the orphan
       keys and the fact side stays map-only end to end.

    The final semi join is NULL-SAFE so rows with a NULL key component
    (orphans by definition — NULL never matches a dim row, mirroring the
    plain left-anti) are still reported.
    """
    fact_keys = df.select(*on).distinct()
    orphan_keys = fact_keys.join(dim.select(*on), on, "left_anti")
    ok = orphan_keys.alias("__ok")
    cond = None
    for c in on:
        clause = df[c].eqNullSafe(ok[c])
        cond = clause if cond is None else cond & clause
    return (
        df.join(ok, cond, "left_semi")
        .withColumn("constraint_id", F.lit(constraint_id))
    )


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
