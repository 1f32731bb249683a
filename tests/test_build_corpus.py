"""End-to-end corpus build (jobs/build_corpus.py): quality gate -> exact
dedup -> decontamination -> mixture -> packing -> WAP publish, with the
published layout internally consistent and low-quality docs never packed."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
    ),
)

from dff.tablefmt import Table  # noqa: E402


@pytest.fixture()
def corpus_src(spark, tmp_path):
    # 400 docs over 4 sources; doc 7 is junk (too short), docs 20/21 are
    # exact duplicates, doc 30 replays the benchmark doc verbatim
    def text(i):
        if i == 7:
            return "tiny"
        if i == 21:
            i = 20
        return " ".join(f"tok{i}x{j}" for j in range(30))

    rows = [
        (i, text(i), f"s{i % 4}", len(text(i)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "n_chars"])
    src = str(tmp_path / "docs")
    df.write.parquet(src)
    bench = df.where(F.col("doc_id") == 30).select("doc_id", "text")
    bench_p = str(tmp_path / "bench")
    bench.write.parquet(bench_p)

    # embeddings: well-spread pseudo-random unit vectors per doc, with
    # docs 50/51 sharing a vector -> semantic dedup must drop 51
    import math

    def vec(i):
        if i == 51:
            i = 50
        raw = []
        for j in range(8):
            x = math.sin(i * 12.9898 + j * 78.233) * 43758.5453
            raw.append((x - math.floor(x)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in raw))
        return [x / n for x in raw]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(400)], ["vec_id", "embedding"]
    )
    emb_p = str(tmp_path / "emb")
    emb.write.parquet(emb_p)
    return src, bench_p, emb_p, str(tmp_path / "tbl")


def test_full_build_publishes_consistent_layout(spark, corpus_src):
    import build_corpus

    src, bench_p, emb_p, t_root = corpus_src
    out = build_corpus.main([
        "--src", src, "--out", t_root,
        "--budget-frac", "0.8", "--seq-len", "64", "--n-shards", "4",
        "--benchmark", bench_p, "--min-chars", "20",
        "--embeddings", emb_p, "--semantic-threshold", "0.999",
        "--semantic-centroids", "4",
        "--parallelism", "4", "--seed", "5",
    ])
    assert json.loads(json.dumps(out))  # one JSON-able summary
    assert out["published"] and out["version"] is not None
    assert out["rows_quality"] == 399          # doc 7 dropped by Q2
    assert out["rows_dedup"] == 398            # doc 21 collapsed into 20
    assert out["rows_semantic_dropped"] == 1   # doc 51 shares 50's vector
    assert out["rows_contaminated"] >= 1       # doc 30 replays the benchmark
    assert out["layout_violations"] == 0
    t = Table(t_root)
    packed = t.scan(spark)
    assert packed.count() == out["rows_packed"] > 0
    ids = {r["doc_id"] for r in packed.select("doc_id").distinct().collect()}
    assert 7 not in ids and 21 not in ids and 30 not in ids
    assert 51 not in ids and 50 in ids  # semantic: later twin out, earlier in
    # layout invariants hold on the PUBLISHED table, not just pre-commit
    bad = packed.where(
        (F.col("start_off") < 0)
        | (F.col("ctx_off") >= 64)
        | (F.col("n_ctx") < 1)
        | (F.col("epoch") < 0)
    )
    assert bad.count() == 0
    assert t.list_branches() == []


def test_everything_filtered_is_safe(spark, corpus_src):
    import build_corpus

    src, bench_p, emb_p, t_root = corpus_src
    out = build_corpus.main([
        "--src", src, "--out", t_root + "2",
        "--min-chars", "100000",  # quality gate drops every doc
        "--parallelism", "4",
    ])
    assert out["rows_quality"] == 0
    assert out["rows_packed"] == 0
    assert out["mixture"] == {}
