"""From-scratch Bloom filter over Catalyst expressions + a referential
pre-filter built on it.

Spark's optimizer can inject runtime bloom filters into shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), and ``DataFrame.stat
.bloomFilter`` builds one driver-side — but neither is available as a SQL
function in this build (``bloom_filter_agg`` is not registered; see
.claude/skills/verify round-4 notes), and neither lets a VALIDATION run
short-circuit definite verdicts map-side.  So the filter here is built from
public primitives only:

- **build** (:func:`build_bloom`): k bit positions per key row via
  ``xxhash64(keys..., i)`` (k JVM hashes, no Python), positions exploded to
  ``(word, bit)`` and OR-folded per 64-bit word in one aggregation; the
  packed words come back as ONE bounded driver array (m/64 longs — 128 KiB
  at m = 2^20, the same deliberate footprint class as the IVF centroid
  sample).
- **probe** (:func:`bloom_maybe_contains`): a pure whole-stage-codegen
  expression — the word array is a literal, each of the k probes is
  ``(element_at(words, pos div 64 + 1) >>> (pos mod 64)) & 1``.

Referential use (:func:`orphan_rows_bloom`), when the dim is too big to
broadcast whole but its Bloom image fits anywhere: fact keys that FAIL the
filter are DEFINITE orphans (Bloom has no false negatives) and are emitted
map-side without ever shuffling; only the rows that pass — true members
plus the fp fraction — enter the exact anti-join.  On orphan-heavy inputs
the join side shrinks toward the match set; on clean inputs nothing is
lost but the probe cost.  Result is exactly equal to
:func:`dff.referential.orphan_rows` (asserted in tests and the oracle
gate, which replays the plain ANTI JOIN in DuckDB).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["build_bloom", "bloom_maybe_contains", "orphan_rows_bloom"]


def _positions(cols: list[str], k: int, m_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def build_bloom(
    dim: DataFrame, cols: list[str], m_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """Packed ``int64[m_bits/64]`` Bloom image of ``dim``'s key tuples."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(cols, k, m_bits))).alias("pos")
    words = (
        dim.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # call_function: the shiftleft PYTHON wrapper insists on an int
            # literal shift amount; the SQL function itself takes columns
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["word"]] = r["mask"]
    return arr


def bloom_maybe_contains(
    words: np.ndarray, cols: list[str], k: int = 5
) -> Column:
    """Pure-expression membership probe against a built filter."""
    m_bits = len(words) * 64
    lit_words = F.array(*[F.lit(int(w)) for w in words])
    cond = F.lit(True)
    for p in _positions(cols, k, m_bits):
        word = F.element_at(lit_words, (p / 64).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftrightunsigned", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == 1)
    return cond


def orphan_rows_bloom(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Fact rows whose key tuple is absent from ``dim`` — Bloom-short-
    circuited: definite orphans never shuffle, the rest verify exactly.

    NULL key components hash like values but can never equal a dim row in
    the verify join; they are routed to the exact path so semantics match
    ``orphan_rows`` (anti-join keeps NULL-keyed rows as orphans).
    """
    words = build_bloom(dim.select(*on).distinct(), on, m_bits, k)
    probe = bloom_maybe_contains(words, on, k)
    has_null = None
    for c in on:
        n = F.col(c).isNull()
        has_null = n if has_null is None else has_null | n
    definite = fact.where(~probe & ~has_null)
    candidates = fact.where(probe | has_null)
    verified = candidates.join(dim.select(*on).distinct(), on=on, how="left_anti")
    return definite.unionByName(verified)
