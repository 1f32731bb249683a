"""dff.relevance: TF-IDF / BM25 vs a hand-computed pandas oracle + the
tokens-not-text shuffle claim."""

from __future__ import annotations

import math
import re
from collections import Counter

from dff.relevance import bm25_scores, doc_frequencies, term_frequencies, tfidf

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _py_tf(rows):
    tf = {}
    for doc_id, text in rows:
        if text is None:
            continue
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        tf[doc_id] = Counter(toks)
    return tf


def test_term_frequencies_match_python(spark):
    d = _docs(spark)
    rows = [(r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()]
    want = _py_tf(rows)
    got = {}
    for r in term_frequencies(d).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    assert got == {k: dict(v) for k, v in want.items() if v}


def test_bm25_matches_python(spark):
    d = _docs(spark)
    rows = [(r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()]
    tf = _py_tf(rows)
    terms = ["spark", "join", "vector"]
    dl = {k: sum(v.values()) for k, v in tf.items() if v}
    n, avgdl = len(dl), sum(dl.values()) / len(dl)
    df = {t: sum(1 for v in tf.values() if t in v) for t in terms}
    k1, b = 1.2, 0.75
    want = {}
    for doc, cnt in tf.items():
        s, m = 0.0, 0
        for t in terms:
            if t not in cnt:
                continue
            m += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (cnt[t] * (k1 + 1)) / (
                cnt[t] + k1 * (1 - b + b * dl[doc] / avgdl)
            )
        if m:
            want[doc] = (s, m)
    got = {
        r["doc_id"]: (r["bm25"], r["matched_terms"])
        for r in bm25_scores(d, terms).collect()
    }
    assert set(got) == set(want)
    for doc in want:
        assert abs(got[doc][0] - want[doc][0]) < 1e-9
        assert got[doc][1] == want[doc][1]


def test_tfidf_smoothed_idf(spark):
    d = _docs(spark)
    n = d.count()
    out = tfidf(d)
    row = out.where("term = 'spark'").first()
    df_spark = doc_frequencies(term_frequencies(d)).where("term = 'spark'").first()[
        "df"
    ]
    want = row["tf"] * (math.log((n + 1.0) / (df_spark + 1.0)) + 1.0)
    assert abs(row["tfidf"] - want) < 1e-12


def test_bm25_empty_query_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        bm25_scores(_docs(spark), [])


def test_bm25_shuffles_tokens_never_text(spark):
    plan = (
        bm25_scores(_docs(spark), ["spark"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
