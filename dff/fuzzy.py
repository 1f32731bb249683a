"""Fuzzy (edit-distance) self-join for entity resolution — all row pairs
whose string column is within ``max_dist`` Levenshtein edits, WITHOUT the
O(n²) cross join a naive `levenshtein(a,b) <= k` predicate plans.

Reference analog: none directly (the reference matches entities by exact
keys); this is the data-cleaning join a training-data pipeline needs for
near-identical author/title/URL strings, same family as
:mod:`dff.dedup`'s document-level near-dup.

Realization — FastSS deletion neighborhoods (Bocek et al. 2007), pure
DataFrame ops:

1. every string explodes into its deletion neighborhood ``D_k(s)`` (all
   variants obtained by deleting ≤ k characters), generated JVM-side with
   array higher-order functions — no Python;
2. candidates = pairs sharing any variant (one equi-join on an 8-byte
   ``xxhash64`` of the variant);
3. exact ``levenshtein`` verifies every candidate.

Completeness: if ``ed(a,b) ≤ k`` then an optimal alignment's matched
positions form a common subsequence reachable by ≤ k deletions from each
side, so ``D_k(a) ∩ D_k(b) ≠ ∅`` — the candidate set is a superset of
the answer and step 3 makes it exact.  (The converse does not hold;
that's what the verify is for.)

Scale shape: variant rows are O(n·len^k) 8-byte hashes + ids — the same
banded-LSH shuffle pattern as :func:`dff.dedup.minhash_dedup_pairs`; the
join key is the hash, never the string.  Identical strings should be
exact-deduped FIRST (:func:`dff.dedup.dedup_exact`): a value repeated m
times forms an m²-pair clique that no blocking scheme can avoid.
Neighborhood size is len+1 for k=1 and O(len²) for k=2 — suited to
short identifier-like strings (names, titles, URLs); for long text use
:mod:`dff.dedup`'s shingle pipelines instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_neighborhood", "fuzzy_pairs"]


def deletion_neighborhood(col: Column | str, k: int) -> Column:
    """Array of all distinct strings reachable from ``col`` by deleting
    at most ``k`` characters (the string itself included).  Pure Catalyst
    array HOFs — evaluated JVM-side inside whole-stage codegen."""
    if k not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {k}")
    c = F.col(col) if isinstance(col, str) else col

    def del1(expr: Column) -> Column:
        # all single-char deletions: prefix [1..i-1] + suffix [i+1..]
        return F.transform(
            F.sequence(F.lit(1), F.length(expr)),
            lambda i: F.concat(
                expr.substr(F.lit(1), i - 1),
                expr.substr(i + 1, F.length(expr) - i),
            ),
        )

    d0 = F.array(c)
    d1 = del1(c)
    out = F.array_union(d0, d1)
    if k == 2:
        d2 = F.flatten(F.transform(d1, lambda v: del1(v)))
        out = F.array_union(out, F.array_distinct(d2))
    return out


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(s_a, s_b) <= max_dist``.  NULL strings never match
    (SQL comparison semantics).  Exact by construction: deletion-
    neighborhood blocking is a complete candidate generator and every
    candidate is verified with the exact distance."""
    base = (
        df.where(F.col(s_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(s_col).alias("__s"))
    )
    variants = base.select(
        "__id",
        "__s",
        F.explode(
            F.array_distinct(deletion_neighborhood(F.col("__s"), max_dist))
        ).alias("__v"),
    ).select("__id", "__s", F.xxhash64("__v").alias("__vh"))
    left = variants.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("__sa"), "__vh"
    )
    right = variants.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("__sb"), "__vh"
    )
    cands = (
        left.join(right, "__vh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return (
        cands.withColumn(
            "dist", F.levenshtein("__sa", "__sb").cast("bigint")
        )
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
