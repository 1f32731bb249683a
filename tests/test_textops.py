from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.textops import (
    doc_fingerprint,
    lang_id,
    min_shingle_fingerprint,
    quality_score,
    shingle_hashes,
    token_count,
    whitespace_token_count,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog, it is for the win"),
        (1, "der hund und die katze sind nicht ein team mit der maus"),
        (2, "le chat est dans la maison et il est pour les amis"),
        (3, "el perro es una mascota que vive con la familia del barrio"),
        (4, ""),
        (5, "xyzzy plugh qwerty"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = _docs(spark)
    got = {
        r["doc_id"]: (r["bpe"], r["ws"])
        for r in df.select(
            "doc_id",
            token_count("text").alias("bpe"),
            whitespace_token_count("text").alias("ws"),
        ).collect()
    }
    assert got[4] == (0, 0)
    assert got[5] == (3, 3)
    # doc 0: 13 words + 1 comma = 14 bpe tokens, 13 ws tokens
    assert got[0] == (14, 13)


def test_lang_id_heuristic(spark):
    df = _docs(spark)
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id("text").alias("lang")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[5] == "unknown"


def test_quality_and_fingerprints(spark):
    df = _docs(spark)
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            quality_score("text").alias("q"),
            doc_fingerprint("text").alias("fp"),
            min_shingle_fingerprint("text").alias("msf"),
            F.size(shingle_hashes("text")).alias("n_shingles"),
        ).collect()
    }
    assert 0.0 <= rows[0]["q"] <= 1.0
    assert rows[4]["q"] < rows[0]["q"]
    # fingerprint invariant under whitespace/case normalization
    df2 = spark.createDataFrame(
        [(0, "THE  quick   brown fox and the lazy dog, it is for the win")],
        "doc_id long, text string",
    )
    fp2 = df2.select(doc_fingerprint("text").alias("fp")).first()["fp"]
    assert fp2 == rows[0]["fp"]
    assert rows[0]["n_shingles"] == len("the quick brown fox and the lazy dog, it is for the win") - 8
    assert rows[4]["n_shingles"] == 0 and rows[4]["msf"] is None


def test_repetition_ratio_hand_computed(spark):
    from dff.textops import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 grams, 3 distinct -> 4/7
            (2, "one two"),            # < 3 words -> 0.0
            (3, "x x x x"),            # 2 grams, 1 distinct -> 0.5
            (4, "all words are unique here now"),  # 4 grams distinct -> 0.0
            (5, None),                 # NULL text -> 0.0
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["rr"]
        for r in df.select(
            "doc_id", F.round(repetition_ratio("text", 3), 4).alias("rr")
        ).collect()
    }
    assert got == {1: round(1 - 3 / 7, 4), 2: 0.0, 3: 0.5, 4: 0.0, 5: 0.0}


def test_chunk_documents_hand_computed(spark):
    from dff.textops import chunk_documents

    words10 = " ".join(f"w{i}" for i in range(1, 11))
    df = spark.createDataFrame(
        [(1, words10), (2, "a b c"), (3, None), (4, "   ")],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_words"])
        for r in chunk_documents(df, "doc_id", "text", size=5, overlap=2).collect()
    }
    # doc 1: starts 0,3,6; start 9 dropped (suffix fully inside prev tail)
    assert got == {
        (1, 0): ("w1 w2 w3 w4 w5", 5),
        (1, 1): ("w4 w5 w6 w7 w8", 5),
        (1, 2): ("w7 w8 w9 w10", 4),
        (2, 0): ("a b c", 3),
    }
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", size=5, overlap=5)


def test_chunk_documents_covers_every_word(spark):
    from dff.textops import chunk_documents
    from dff.sources import synthetic_documents

    docs = synthetic_documents(spark, 300)
    chunks = chunk_documents(docs, "doc_id", "text", size=12, overlap=3)
    # every word occurrence is covered: sum over chunks of (n_words -
    # overlap-with-previous) == doc word count
    totals = (
        chunks.groupBy("doc_id")
        .agg(
            (F.sum("n_words") - 3 * (F.count(F.lit(1)) - 1)).alias("covered")
        )
    )
    words = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("nw"),
    )
    mismatches = (
        totals.join(words, "doc_id").where(F.col("covered") != F.col("nw")).count()
    )
    assert mismatches == 0


def test_redact_pii_and_count(spark):
    from dff.textops import pii_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.user+x@sub.example.org and peer bob@ex.co end"),
            (2, "server at 192.168.0.1 talked to 10.0.0.255"),
            (3, "ssn 123-45-6789 but not 1234-56-789 or 12-345-6789"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["red"], r["n"])
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            pii_count("text").alias("n"),
        ).collect()
    }
    assert got[1] == ("mail <EMAIL> and peer <EMAIL> end", 2)
    assert got[2] == ("server at <IP> talked to <IP>", 2)
    assert got[3][1] == 1 and "<SSN>" in got[3][0] and "1234-56-789" in got[3][0]
    assert got[4] == ("clean text with no pii at all", 0)


def test_word_entropy_hand_computed(spark):
    import math

    from dff.textops import word_entropy

    df = spark.createDataFrame(
        [
            (1, "a a b b"),               # H = ln 2
            (2, "solo"),                  # one word -> 0
            (3, "a b c d"),               # uniform 4 -> ln 4
            (4, "x x   X  x"),            # normalized: x*4 -> 0
            (5, None),                    # NULL text -> dropped
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["entropy"])
        for r in word_entropy(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 4 and abs(got[1][1] - math.log(2)) < 1e-12
    assert got[2] == (1, 0.0)
    assert abs(got[3][1] - math.log(4)) < 1e-12
    assert got[4] == (4, 0.0)
