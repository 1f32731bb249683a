"""Distributed mergeable heavy-hitters (Misra-Gries frequent items).

The Misra-Gries summary (Misra & Gries, "Finding repeated elements",
Sci. Comput. Program. 1982) keeps at most ``capacity`` counters; whenever
more distinct items arrive, every counter is decremented by the amount
that would evict the (capacity+1)-th largest, so each decrement round
removes >= capacity+1 units of total weight.  Hence across ANY sequence
of truncations the cumulative decrement ``D`` satisfies
``D <= N / (capacity + 1)`` (N = total processed weight), giving the
classic guarantee for every item x::

    true(x) - N/(capacity+1)  <=  est(x)  <=  true(x)

so every item with frequency above ``N/(capacity+1)`` is guaranteed to
survive, and the estimate is always a LOWER bound.  Summaries are
mergeable (Agarwal et al., "Mergeable Summaries", PODS 2012): add
counters item-wise, then truncate back to ``capacity`` — the decrement
argument above is topology-independent, so partition partials may merge
in one shot rather than pairwise.

Distributed shape (the point at 10^12 rows):

- stage 1 ``partition_summaries``: ONE ``mapInPandas`` pass folds each
  Arrow batch's exact ``value_counts`` (an error-free summary) into a
  bounded per-(partition, group) summary — NO shuffle, pure
  pandas/numpy, output <= capacity+1 tiny rows per partition and group;
- stage 2 ``merge_summaries``: ``applyInPandas`` groups the summary rows
  by key (n_partitions x (capacity+1) rows per key, kilobytes) and
  merges — the shuffle carries sketches, never data, so a skewed item
  distribution costs the same as a uniform one.

When ``capacity`` >= the true number of distinct items no truncation
ever fires and the output equals the exact group-by counts — the
oracle-checked gate query ``heavy_hitters_exact`` pins that; the
small-capacity guarantee is pinned by the ``heavy_hitters_violations``
invariant gate (expected empty).

``pyspark``'s built-ins cover the exact path (``groupBy(col).count()``,
one shuffle of DISTINCT items — fine until the distinct set itself is
huge); this module is for the sketch regime where even the distinct set
must stay bounded per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__GROUP = "__hh_group"

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField(__GROUP, T.StringType()),
        T.StructField("item", T.StringType()),  # NULL => weight marker row
        T.StructField("cnt", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("est", T.LongType()),  # guaranteed lower bound
        T.StructField("n_total", T.LongType()),
        T.StructField("max_undercount", T.LongType()),  # floor(N/(cap+1))
    ]
)


def _truncate(counts: pd.Series, capacity: int) -> pd.Series:
    """Misra-Gries truncation: subtract the (capacity+1)-th largest count
    from every counter and drop non-positives.  ``counts`` is indexed by
    item.  No-op when the summary already fits."""
    if len(counts) <= capacity:
        return counts
    d = counts.nlargest(capacity + 1).iloc[capacity]
    out = counts - d
    return out[out > 0]


def partition_summaries(
    df: DataFrame, col: str, capacity: int, key_col: str | None = None
) -> DataFrame:
    """Stage 1: bounded per-(input partition, group) MG summaries.

    Emits <= capacity counter rows plus ONE ``item IS NULL`` marker row
    carrying the partition's processed weight per group (needed to
    compute the global error bound at merge time without a second pass).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    src = df.select(
        (
            F.col(key_col).cast("string") if key_col else F.lit("__all__")
        ).alias(__GROUP),
        F.col(col).cast("string").alias("item"),
    ).where(F.col("item").isNotNull())

    def fold(batches):
        acc: dict[str, pd.Series] = {}
        nproc: dict[str, int] = {}
        for pdf in batches:
            for g, sub in pdf.groupby(__GROUP, sort=False):
                vc = sub["item"].value_counts()
                nproc[g] = nproc.get(g, 0) + int(vc.sum())
                if g in acc:
                    vc = acc[g].add(vc, fill_value=0).astype("int64")
                # amortize: only truncate once the working set is 4x over
                if len(vc) > 4 * capacity:
                    vc = _truncate(vc, capacity)
                acc[g] = vc
        rows = []
        for g, vc in acc.items():
            vc = _truncate(vc, capacity)
            rows.extend((g, item, int(c)) for item, c in vc.items())
            rows.append((g, None, nproc[g]))
        yield pd.DataFrame(rows, columns=[__GROUP, "item", "cnt"])

    return src.mapInPandas(fold, _SUMMARY_SCHEMA)


def merge_summaries(partials: DataFrame, capacity: int) -> DataFrame:
    """Stage 2: merge the tiny partials per group — item-wise counter sum,
    one final truncation, error bound from the summed weight markers."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[__GROUP].iloc[0]
        markers = pdf["item"].isna()
        n_total = int(pdf.loc[markers, "cnt"].sum())
        counts = pdf.loc[~markers].groupby("item")["cnt"].sum()
        counts = _truncate(counts, capacity)
        bound = n_total // (capacity + 1)
        return pd.DataFrame(
            {
                "group_key": g,
                "item": counts.index,
                "est": counts.to_numpy("int64"),
                "n_total": n_total,
                "max_undercount": bound,
            }
        )

    return partials.groupBy(__GROUP).applyInPandas(merge, _OUT_SCHEMA)


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 64, key_col: str | None = None
) -> DataFrame:
    """Frequent items of ``col`` (optionally per ``key_col`` group) via a
    two-stage mergeable Misra-Gries sketch.

    Returns (group_key, item, est, n_total, max_undercount): ``est`` is a
    guaranteed lower bound on the true count, off by at most
    ``max_undercount = floor(n_total / (capacity + 1))``; every item with
    true count above that bound is guaranteed present.  With ``capacity``
    >= the number of distinct items the result is exact.  ``group_key``
    is ``"__all__"`` when no ``key_col`` is given.  NULL items are
    ignored; items compare as strings.
    """
    return merge_summaries(
        partition_summaries(df, col, capacity, key_col), capacity
    )
