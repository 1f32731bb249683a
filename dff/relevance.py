"""TF-IDF / BM25 relevance scoring over a document corpus.

A training-data pipeline ranks and filters documents by lexical relevance
(query-anchored quality filtering, retrieval-based decontamination, corpus
search).  This module computes the classical statistics with Catalyst only:

- :func:`term_frequencies` — tokenize (JVM ``split``) + explode + count.
  The ONE unavoidable heavy shuffle, on ``(doc, term)`` with map-side
  combine; text itself never shuffles (only tokens do).
- :func:`doc_frequencies` — per-term document counts: an aggregation over
  the already-reduced tf rows, shuffling ``(term, 1)`` pairs.
- :func:`tfidf` — smoothed idf ``ln((N+1)/(df+1)) + 1`` (sklearn
  convention) joined back term-wise.  Vocabulary rows are tiny relative to
  the corpus; AQE picks broadcast when it fits.
- :func:`bm25_scores` — Okapi BM25 for a BOUNDED query-term set: the tf
  table is filtered to the query terms FIRST (an ``isin`` that prunes
  before any join), the per-term idf + corpus constants ride a literal map,
  so scoring is one filtered aggregation — no join against the full
  vocabulary, no second pass over text.

At 10^12 docs: tf is ~tokens rows but reduces map-side; df is |vocab|;
BM25's working set after the isin-filter is |query_terms| x |matching
docs|.  Nothing driver-side except the <=32-term query descriptor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["term_frequencies", "doc_frequencies", "tfidf", "bm25_scores"]

TOKEN_SPLIT = "[^a-z0-9]+"


def term_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_SPLIT,
) -> DataFrame:
    """``(id, term, tf)`` — one row per distinct term per document."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), pattern)).alias("term"),
    ).where(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(term, df)`` — number of documents containing each term."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_SPLIT,
) -> DataFrame:
    """``(id, term, tf, tfidf)`` with smoothed idf ``ln((N+1)/(df+1)) + 1``.

    N is folded in as a scalar subquery (one COUNT agg, broadcast by
    Catalyst) so the whole computation stays one lazy plan.

    Skew note: the tf-x-vocab join keys on ``term``, and stopword-grade
    terms are Zipf-hot.  The vocab side is one row per term, so AQE's
    skew-join split handles the tf side; when the vocabulary fits an
    executor (it usually does — vocab grows ~log corpus), AQE promotes the
    join to broadcast and the tf side never shuffles at all.  BM25 below
    avoids the issue entirely by pre-filtering to the query terms.
    """
    tf = term_frequencies(docs, id_col, text_col, pattern)
    df_ = doc_frequencies(tf, id_col)
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    joined = tf.join(df_, "term").crossJoin(F.broadcast(n_docs))
    idf = F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    return joined.select(
        id_col, "term", "tf", (F.col("tf") * idf).alias("tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    pattern: str = TOKEN_SPLIT,
) -> DataFrame:
    """Okapi BM25 score of every matching document for ``query_terms``.

    idf uses the standard ``ln(1 + (N - df + 0.5)/(df + 0.5))``.  Corpus
    constants (N, avgdl) come from ONE aggregation over per-doc lengths;
    per-query-term idf from the df rows of just those terms.  Both are
    tiny and broadcast; the only data-sized stage is the tf aggregation.
    Documents matching no query term are absent from the output.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    # r6 realization (guide §2.3/§2.4 — remove the shuffle outright): the
    # query-term set is BOUNDED, so per-doc term frequencies are plain
    # array expressions over the token array — ``size(filter(tokens,
    # t == term))`` per term — and the per-doc length is the token-array
    # size; nothing ever explodes and no (doc, term) exchange exists.
    # Corpus constants (N, avgdl) and per-term document frequencies ride
    # ONE bounded single-row aggregation that broadcasts via crossJoin.
    # The old explode -> groupBy(doc, term) -> three-way-join plan
    # shuffled every token of every document to score a 3-term query.
    from .dedup import widen_if_narrow

    toks = F.split(F.lower(F.col(text_col)), pattern)
    arr = F.filter(toks, lambda t: t != "")
    dl = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(arr)
    ).cast("long")
    tf_cols = [
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.filter(arr, lambda t: t == F.lit(term))))
        .cast("long")
        .alias(f"__tf_{i}")
        for i, term in enumerate(terms)
    ]
    base = widen_if_narrow(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), dl.alias("__dl"), *tf_cols
    )
    # one row: N (docs with >= 1 token), avgdl, df per query term
    stats = base.agg(
        F.count(F.when(F.col("__dl") > 0, F.lit(1))).alias("__n"),
        F.avg(F.when(F.col("__dl") > 0, F.col("__dl"))).alias("__avgdl"),
        *[
            F.count(F.when(F.col(f"__tf_{i}") > 0, F.lit(1))).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    parts = []
    matched = F.lit(0)
    for i in range(len(terms)):
        tf_i = F.col(f"__tf_{i}")
        df_i = F.col(f"__df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - df_i + F.lit(0.5)) / (df_i + F.lit(0.5))
        )
        tf_part = (tf_i * (k1 + 1.0)) / (
            tf_i
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
        parts.append(F.when(tf_i > 0, idf * tf_part).otherwise(F.lit(0.0)))
        matched = matched + F.when(tf_i > 0, 1).otherwise(0)
    bm25 = parts[0]
    for p in parts[1:]:
        bm25 = bm25 + p
    return (
        scored.where(matched > 0)
        .select(
            F.col(id_col),
            bm25.alias("bm25"),
            matched.cast("long").alias("matched_terms"),
        )
    )
