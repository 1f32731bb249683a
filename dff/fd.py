"""Functional-dependency constraints: ``determinant -> dependent``.

The reference's referential checks (re-expressed in dff/referential.py)
validate "key exists in dim"; the other classic relational integrity rule
is the functional dependency — e.g. every ``(repo, commit)`` must map to
exactly one ``lang``, every ``zip`` to one ``city``.  A violation means
the same determinant tuple carries conflicting dependent values.

Scale shape (10^12 rows):

1. compress to DISTINCT ``(determinant..., dependent)`` pairs first — a
   map-side-combined aggregation, so the shuffle carries one row per
   distinct pair, not per input row;
2. count dependents per determinant over those pairs (tiny);
3. keep determinants with >1 dependent and semi-join the offending pairs
   back out.

The full violating ROWS (not just pairs) are available via
:func:`fd_violation_rows`, which semi-joins the original frame against the
violating determinants — the fact payload joins once, against a frame
bounded by the number of conflicted keys.  NULL dependents count as a
value (a key mapping to both 'x' and NULL IS a conflict); NULL-safe
equality is used throughout so NULL determinant components group together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fd_violations", "fd_violation_rows"]


def fd_violations(
    df: DataFrame, determinant: list[str], dependent: str
) -> DataFrame:
    """Distinct conflicting ``(determinant..., dependent, n_conflicts)``
    pairs — one row per dependent value of each violated dependency."""
    if not determinant:
        raise ValueError("determinant must be non-empty")
    pairs = df.select(*determinant, dependent).distinct()
    counts = pairs.groupBy(*determinant).agg(
        F.count(F.lit(1)).alias("n_conflicts")
    )
    return (
        pairs.join(
            counts.where(F.col("n_conflicts") > 1), on=determinant, how="inner"
        )
    )


def fd_violation_rows(
    df: DataFrame, determinant: list[str], dependent: str
) -> DataFrame:
    """Every input ROW whose determinant participates in a conflict."""
    bad = (
        fd_violations(df, determinant, dependent)
        .select(*determinant)
        .distinct()
    )
    cond = None
    for k in determinant:
        clause = df[k].eqNullSafe(bad[k])
        cond = clause if cond is None else cond & clause
    return df.join(bad, cond, "left_semi")


def monotonic_violations(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    strict: bool = False,
) -> DataFrame:
    """Order-dependency constraint: within each key, ``value_col`` must be
    non-decreasing (``strict=True``: strictly increasing) along
    ``order_cols`` — e.g. commit timestamps per repo, sequence numbers per
    session.  Returns the violating rows + ``prev_value``.

    Comparison is against the RUNNING MAX of all preceding values (so a dip
    below any earlier high is flagged even if the immediately preceding row
    already dipped); NULL values neither violate nor advance the watermark.
    One window pass: the single Exchange partitions by key; at 10^12 rows a
    pathologically hot key is handled the same way as dff/asof.py documents
    (coarse-bucket the ordering, seed each bucket with the previous
    bucket's max).
    """
    from pyspark.sql import Window

    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col(value_col)
    out = df.withColumn("prev_max", F.max(value_col).over(w))
    p = F.col("prev_max")
    bad = (v <= p) if strict else (v < p)
    return out.where(v.isNotNull() & p.isNotNull() & bad)
