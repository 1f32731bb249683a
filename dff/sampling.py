"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — repartition
the input (or rescale the cluster) and the sample changes, which breaks
reproducible dataset builds and cross-run joins.  These operators instead
hash the ROW KEY: a row is kept iff a uniform deterministic hash of its
key columns lands under the target fraction, so membership depends only
on row content — stable under repartitioning, shuffles, engine version,
and even across engines (the hash is ``md5``, available everywhere; the
oracle gate replays the identical predicate in DuckDB).

Scale shape:

- :func:`hash_sample` / :func:`stratified_sample` are PURE map-side
  predicates — no shuffle, no Python, whole-stage-codegen'd; at 100 TB
  they cost one scan and prune output size at the source.
- :func:`sample_n_per_group` needs exactly ONE shuffle (the group-key
  window); rows are ranked by the same content hash, so the chosen n are
  a uniform random subset per group, deterministic given the seed.

The uniform hash is the first 60 bits of ``md5(seed | key columns)``
divided by 2^60 — float error is one ulp around thresholds, and both
engines parse the same 15 hex chars, so the predicate agrees bit for bit.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def uniform_hash(key_cols: Iterable[str], seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from the row's key columns.

    ``concat_ws`` skips NULLs, so keys that differ only in NULL-vs-empty
    placement can collide; include a NOT NULL natural key (ids) for strict
    uniqueness.  DuckDB equivalent::

        CAST(('0x' || substr(md5(concat_ws('|', <seed>, cols...)), 1, 15))
             AS BIGINT) / 1152921504606846976.0
    """
    payload = F.concat_ws(
        "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
    )
    return (
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")
        / F.lit(_TWO60)
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash (map-only)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(uniform_hash(key_cols, seed) < fraction)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. downsample the majority language,
    keep all of the rare ones).  Still a pure map-side predicate: the
    per-stratum threshold folds into a CASE WHEN chain, so no join and no
    shuffle regardless of the number of strata."""
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    thr: Column = F.lit(float(default))
    for s, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == s, float(frac)).otherwise(thr)
    return df.where(uniform_hash(key_cols, seed) < thr)


def quota_sample(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, float],
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Domain mixing: cap each stratum at a target share of the CORPUS
    (e.g. ``{"en": 0.3}`` -> at most ~30% of the total row count comes
    from ``en``; strata without a quota pass through whole).  The
    Pile/RedPajama-style source-mixing step, expressed as per-stratum keep
    fractions ``min(1, quota * N_total / N_stratum)`` over the same
    deterministic content-hash uniform — so the result is still
    partition-invariant and engine-replayable GIVEN the same input.

    One counting aggregation collects per-stratum totals to the driver
    (bounded by the number of strata — sources/languages, not rows), then
    the keep predicate is a pure map-side CASE like
    :func:`stratified_sample`.  Two scans of ``df`` total."""
    for s, q in quotas.items():
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quota for stratum {s!r} must be in (0, 1]")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    fractions = {
        s: min(1.0, q * total / counts[s])
        for s, q in quotas.items()
        if s in counts and counts[s] > 0
    }
    return stratified_sample(
        df, stratum_col, fractions, key_cols, default=1.0, seed=seed
    )


def weighted_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
    weight_col: str,
    seed: int = 0,
) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: keep a row with
    probability ``min(1, rate * weight)`` — e.g. sample documents
    proportional to token count so the SAMPLE's token mass mirrors the
    corpus.  Same properties as :func:`hash_sample`: pure map-side
    predicate, membership a function of row content only.  Rows with NULL
    or non-positive weight are excluded (they have no defined inclusion
    probability)."""
    if rate < 0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    u = uniform_hash(key_cols, seed)
    w = F.col(weight_col)
    return df.where(
        w.isNotNull()
        & (w > 0)
        & (u < F.least(F.lit(1.0), F.lit(float(rate)) * w))
    )


def weighted_sample_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key_cols: list[str],
    weight_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(n, group
    size)`` rows per group: the Efraimidis–Spirakis exponential race
    (key ``E = -ln(u) / w``, keep the n smallest — equivalent to their
    ``u^(1/w)`` max-key form but numerically stable for tiny weights).
    Deterministic given the seed, one window shuffle like
    :func:`sample_n_per_group`.  NULL / non-positive weights are excluded.

    ``u`` is floored at 1e-18 before the log in BOTH engines (Spark and
    the DuckDB oracle) so a pathological zero hash cannot produce
    ``ln(0)``; ordering ties across engines are broken by the key columns,
    and a flip would need two race keys within 1 ulp — probability ~2^-50
    per group boundary."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = F.greatest(uniform_hash(key_cols, seed), F.lit(1e-18))
    race = -F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*group_cols).orderBy(
        race.asc(), *[F.col(c).asc() for c in key_cols]
    )
    wc = F.col(weight_col)
    return (
        df.where(wc.isNotNull() & (wc > 0))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def sample_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Exactly min(n, group size) rows per group, uniformly at random and
    deterministically: rank rows inside each group by the content hash
    (key columns break hash ties) and keep the first n.  One shuffle."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(*group_cols).orderBy(
        uniform_hash(key_cols, seed).asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def assign_splits(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive split assignment (train/val/test) by content
    hash: every row gets exactly one label, rows keep their label under
    any repartitioning or re-run, and adding a new split later only moves
    rows whose hash falls in the new band.

    Bands are cumulative over ``weights`` IN DICT ORDER (order is part of
    the assignment contract — reordering relabels rows).  Map-only: a
    CASE chain over the same 60-bit-md5 uniform as :func:`hash_sample`,
    so the assignment is exactly replayable in any engine with md5.
    Weights must be positive and sum to 1 (the last band absorbs the
    floating-point tail via ``otherwise``).
    """
    if not weights or len(weights) < 2:
        raise ValueError("need at least two splits")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("split weights must be positive")
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights.values())}")
    u = uniform_hash(key_cols, seed)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(names[-1]))
