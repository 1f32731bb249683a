"""Per-group statistical outlier detection — data-derived constraints.

The reference's rule DAG flags rows by STATIC thresholds baked into the DMN
ruleset (/root/reference/DFF_Ruleset.dmn predicate strings such as
``DISTANCE_FROM_HOME > 50``, re-expressed in dff/compiler.py).  A validation
engine at 10^12 rows also needs DATA-DERIVED thresholds: "flag rows whose
value is anomalous *for its group*" where the group's normal range is
computed from the data itself.  Two standard detectors:

- **z-score** (:func:`zscore_outliers`): per-group mean/std in ONE algebraic
  aggregation (map-side combine), the tiny bounds table broadcast-joins back
  onto the fact table — which therefore NEVER shuffles.  Exact.
- **IQR / Tukey fences** (:func:`iqr_outliers`): per-group Q1/Q3 either
  exact (``F.percentile`` — per-group sort, the small-data / oracle-gate
  path) or via the mergeable t-digest of :mod:`dff.tdigest` (sketch-only
  shuffle, rank error <= eps — the 100 TB path; at a trillion rows an exact
  per-group percentile is a full sort of every group, the digest is a
  map-side pass plus a kilobyte merge).

Both plans are ``fact scan -> broadcast hash join -> filter``: the only
exchange carries one row per group (or per partitionxgroup sketch), never
fact rows.  Skewed groups cost the same as uniform ones because the fact
side is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tdigest import DEFAULT_DELTA, tdigest_quantiles

__all__ = [
    "zscore_outliers",
    "iqr_outliers",
    "group_bounds_iqr",
    "winsorize",
    "fences_as_rule",
]


def _bounds_join(df: DataFrame, bounds: DataFrame, group_cols: list[str]) -> DataFrame:
    """Attach a per-group bounds row to every fact row without shuffling
    the fact side: broadcast inner join (ungrouped -> 1-row crossJoin)."""
    if group_cols:
        return df.join(F.broadcast(bounds), on=group_cols, how="inner")
    return df.crossJoin(F.broadcast(bounds))


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose ``value_col`` is more than ``threshold`` sample standard
    deviations from its group mean.

    Output: the input rows + a ``zscore`` column.  Groups with fewer than
    two rows or zero variance produce no outliers (z undefined).  NULL
    values are never outliers.
    """
    group_cols = group_cols or []
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    bounds = gb.agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    joined = _bounds_join(df, bounds, group_cols)
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        joined.where(
            F.col("__sigma").isNotNull()
            & (F.col("__sigma") > F.lit(0.0))
            & F.col(value_col).isNotNull()
            & (F.abs(z) > F.lit(float(threshold)))
        )
        .withColumn("zscore", z)
        .drop("__mu", "__sigma")
    )


def group_bounds_iqr(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
    exact: bool = True,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Per-group Tukey fences ``[q1 - k*iqr, q3 + k*iqr]``.

    ``exact=True`` uses Spark's exact interpolated ``percentile`` (a
    per-group sort — fine for bounded group counts / the oracle gate, and
    bit-compatible with DuckDB's ``quantile_cont``).  ``exact=False`` routes
    through :func:`dff.tdigest.tdigest_quantiles`: the fact table is scanned
    map-only and only kilobyte sketches shuffle — the path that survives
    10^12 rows with skewed groups.
    """
    group_cols = group_cols or []
    if exact:
        gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
        bounds = gb.agg(
            F.percentile(value_col, F.lit(0.25)).alias("__q1"),
            F.percentile(value_col, F.lit(0.75)).alias("__q3"),
        )
    else:
        if len(group_cols) > 1:
            raise ValueError("approx IQR supports at most one group column")
        key = group_cols[0] if group_cols else None
        qs = tdigest_quantiles(df, value_col, qs=(0.25, 0.75), key_col=key, delta=delta)
        bounds = qs.groupBy("group_key").pivot("q", [0.25, 0.75]).sum("value")
        bounds = bounds.select(
            *(
                # group_key is stringified in the sketch rows; cast back to
                # the fact column's type so the broadcast join is exact
                [
                    F.col("group_key")
                    .cast(df.schema[group_cols[0]].dataType)
                    .alias(group_cols[0])
                ]
                if group_cols
                else []
            ),
            F.col("`0.25`").alias("__q1"),
            F.col("`0.75`").alias("__q3"),
        )
    iqr = F.col("__q3") - F.col("__q1")
    return bounds.select(
        *group_cols,
        (F.col("__q1") - F.lit(float(k)) * iqr).alias("__lo"),
        (F.col("__q3") + F.lit(float(k)) * iqr).alias("__hi"),
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
    exact: bool = True,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Rows strictly outside their group's Tukey fences.

    Output: the input rows + ``fence_lo`` / ``fence_hi``.  Rows exactly ON
    a fence are inliers (strict comparison).  NULL values are never
    outliers.
    """
    group_cols = group_cols or []
    bounds = group_bounds_iqr(df, value_col, group_cols, k, exact, delta)
    joined = _bounds_join(df, bounds, group_cols)
    v = F.col(value_col)
    return (
        joined.where(v.isNotNull() & ((v < F.col("__lo")) | (v > F.col("__hi"))))
        .withColumn("fence_lo", F.col("__lo"))
        .withColumn("fence_hi", F.col("__hi"))
        .drop("__lo", "__hi")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    exact: bool = True,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [p_lo, p_hi] quantiles — the
    REPAIR twin of the detectors above (training pipelines usually clip
    tail values rather than drop rows).

    Adds ``{value_col}_winsorized``; NULLs pass through as NULL.  Plan
    shape is identical to the detectors: quantile bounds (exact
    ``percentile`` or t-digest sketches) broadcast back onto a map-only
    fact side.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got ({p_lo}, {p_hi})")
    group_cols = group_cols or []
    if exact:
        gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
        bounds = gb.agg(
            F.percentile(value_col, F.lit(p_lo)).alias("__lo"),
            F.percentile(value_col, F.lit(p_hi)).alias("__hi"),
        )
    else:
        if len(group_cols) > 1:
            raise ValueError("approx winsorize supports at most one group column")
        key = group_cols[0] if group_cols else None
        qs = tdigest_quantiles(df, value_col, qs=(p_lo, p_hi), key_col=key, delta=delta)
        bounds = qs.groupBy("group_key").pivot("q", [p_lo, p_hi]).sum("value")
        key_sel = (
            [
                F.col("group_key")
                .cast(df.schema[group_cols[0]].dataType)
                .alias(group_cols[0])
            ]
            if group_cols
            else []
        )
        bounds = bounds.select(
            *key_sel,
            F.col(f"`{p_lo}`").alias("__lo"),
            F.col(f"`{p_hi}`").alias("__hi"),
        )
    joined = _bounds_join(df, bounds, group_cols)
    v = F.col(value_col).cast("double")
    # greatest/least SKIP nulls (a NULL value would clip to the bound);
    # gate explicitly so NULL stays NULL
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return joined.withColumn(f"{value_col}_winsorized", clipped).drop(
        "__lo", "__hi"
    )


def fences_as_rule(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: float = 1.5,
    exact: bool = True,
    delta: int = DEFAULT_DELTA,
    rule_id: str = "IQR_OUTLIER",
    requires: tuple[str, ...] = (),
) -> dict:
    """Fold data-derived Tukey fences into a RULE-DAG rule dict — the
    bridge from this module to the engine's main pipeline: derive bounds
    on a training window, then validate every later snapshot through
    ``ValidationRunner`` with the fences as ordinary (vectorized,
    whole-stage-codegen) constraint predicates.

    Grouped fences compile to a ``CASE group WHEN ... END`` pair; rows in
    groups unseen at derivation time get NULL bounds and are NOT flagged
    (no evidence, no violation).  The bounds collect is one row per group.

    Degenerate inputs (ADVICE r04): an EMPTY derivation frame (or, when
    grouped, one where every group's values are all NULL) carries no
    evidence to derive fences from — that's a caller error, raised as
    ``ValueError`` rather than silently compiling a never/always-firing
    predicate.  Individual all-NULL groups in an otherwise usable frame
    are skipped, same no-evidence-no-violation semantics as unseen groups.
    """
    rows = group_bounds_iqr(df, value_col, [group_col] if group_col else [],
                            k, exact, delta).collect()

    def esc(v) -> str:
        return "'" + str(v).replace("'", "''") + "'"

    def usable(r) -> bool:
        return r["__lo"] is not None and r["__hi"] is not None

    if group_col is None:
        if not rows or not usable(rows[0]):
            raise ValueError(
                f"fences_as_rule: no non-NULL {value_col!r} values to "
                "derive fences from"
            )
        lo, hi = rows[0]["__lo"], rows[0]["__hi"]
        pred = f"{value_col} < {lo!r} or {value_col} > {hi!r}"
    else:
        arms = [r for r in rows if r[group_col] is not None and usable(r)]
        if not arms:
            raise ValueError(
                f"fences_as_rule: no group of {group_col!r} has non-NULL "
                f"{value_col!r} values to derive fences from"
            )
        lo_arms = " ".join(
            f"WHEN {esc(r[group_col])} THEN {r['__lo']!r}" for r in arms
        )
        hi_arms = " ".join(
            f"WHEN {esc(r[group_col])} THEN {r['__hi']!r}" for r in arms
        )
        pred = (
            f"{value_col} < (CASE {group_col} {lo_arms} END) "
            f"or {value_col} > (CASE {group_col} {hi_arms} END)"
        )
    return {"id": rule_id, "name": pred, "requires": list(requires)}
