"""Benchmark decontamination: corpus docs sharing n-grams with a test set.

Pre-training corpora must drop documents that overlap evaluation
benchmarks, or downstream scores are inflated (the GPT-3 appendix C /
PaLM-style n-gram decontamination — public methodology).  The operator
reports every corpus document sharing at least one word n-gram with any
benchmark document, with the shared-gram count as evidence.

Scale shape: the benchmark set is SMALL (thousands of eval documents vs
10^12 corpus rows), so its distinct gram hashes build one broadcast set;
the corpus side explodes its (already-distinct) grams MAP-SIDE and
semi-joins the broadcast before anything shuffles — the only exchange
carries (doc_id, gram-hash) pairs for CONTAMINATED docs, a vanishing
fraction of the corpus.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dff.dedup import word_ngrams


def contaminated_docs(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """``(id_col, n_shared)`` for every corpus doc sharing >= 1 word
    n-gram with any benchmark doc; ``n_shared`` = number of DISTINCT
    shared grams.  Callers exclude benchmark rows from ``corpus``
    themselves if self-matches are not wanted.

    Docs shorter than ``n`` words have no grams and can never be
    flagged — decontamination of micro-benchmarks needs a smaller ``n``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bcol = bench_text_col or text_col
    bench_grams = (
        bench.select(F.explode(word_ngrams(bcol, n)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("g")
    ).select(id_col, F.xxhash64("g").alias("gh"))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
