"""Capture .explain("formatted") for declared + bench-scale queries.

Usage: python tools/capture_plans.py <tag> [query ...]
Writes plans/r06/<name>_<tag>.txt for each query (tag = before/after).
Default query set: the round-6 optimization targets.

Bench-scale entries (minhash_near_dups_200k, text_ann_200k, ...) rebuild
the same DataFrames bench.py builds (same params, same .bench_data
fixtures) so the captured plan is the one the frozen bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r06")

DEFAULT = [
    "lang_id",
    "token_counts",
    "quality_scores",
    "word_entropy",
    "repetition_scores",
    "sha256",
    "training_corpus_pipeline",
    "minhash_near_dups",
    "bm25_scores",
    "source_profile",
    "window_topk_per_group",
    "minhash_near_dups_200k",
    "text_ann_200k",
    "training_corpus_200k",
    "bm25_200k",
    "mixture_pack_200k",
    "asof_skewed_hotkey_4m",
]


def bench_frames(spark):
    """Rebuild the bench.py engine-scale DataFrames (same code paths)."""
    from pyspark.sql import functions as F

    from dff.dedup import minhash_dedup_pairs
    from dff.mixing import mixture_plan, mixture_sample
    from dff.packing import pack_sequences
    from dff.similarity import brute_force_topk
    from dff.vectorize import hashing_vectorize

    bench_dir = os.path.join(REPO, ".bench_data")
    docs_df = spark.read.parquet(os.path.join(bench_dir, "docs_200k.parquet"))
    emb_df = spark.read.parquet(os.path.join(bench_dir, "emb_100k.parquet"))

    out = {}

    def _minhash():
        return minhash_dedup_pairs(
            docs_df, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        )

    out["minhash_near_dups_200k"] = _minhash

    def _text_ann():
        vecs = hashing_vectorize(docs_df, dim=128).withColumnRenamed(
            "doc_id", "vec_id"
        )
        qs = hashing_vectorize(
            docs_df.where(F.pmod(F.col("doc_id"), F.lit(10_000)) == 0), dim=128
        ).select(F.col("doc_id").alias("query_id"), "embedding")
        return brute_force_topk(vecs, qs, k=10)

    out["text_ann_200k"] = _text_ann

    def _corpus_200k():
        from dff.contamination import contaminated_docs as _cd
        from dff.dedup import dedup_exact as _de
        from dff.sampling import hash_sample as _hs
        from dff.textops import chunk_documents as _ch

        bench_docs = docs_df.where(F.pmod(F.col("doc_id"), F.lit(997)) == 0)
        corpus = docs_df.where(F.pmod(F.col("doc_id"), F.lit(997)) != 0)
        surv = _de(corpus, "text", "doc_id")
        bad = _cd(surv, bench_docs, "doc_id", "text", n=3).select("doc_id")
        clean = surv.join(bad, "doc_id", "left_anti")
        chunks = _ch(clean, "doc_id", "text", size=12, overlap=3)
        return _hs(chunks, ["doc_id", "chunk_id"], 0.5, seed=21)

    out["training_corpus_200k"] = _corpus_200k

    def _bm25():
        from dff.relevance import bm25_scores

        return bm25_scores(docs_df, ["spark", "join", "vector"])

    out["bm25_200k"] = _bm25

    def _mixture_pack():
        d = docs_df.select(
            "doc_id",
            "text",
            F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(8))).alias(
                "domain"
            ),
            F.length("text").cast("long").alias("n_chars"),
        )
        weights = {f"d{i}": (0.3 if i == 0 else 0.1) for i in range(8)}
        total = d.agg(F.sum("n_chars")).collect()[0][0]
        plan = mixture_plan(d, "domain", "n_chars", weights, (int(total) * 4) // 5)
        mixed = mixture_sample(d, "domain", ["doc_id"], plan, seed=13)
        return pack_sequences(
            mixed, "n_chars", 4096, ["doc_id", "epoch"], n_shards=256, seed=13
        ).select("doc_id", "epoch", "shard", "start_off", "ctx_id", "n_ctx")

    out["mixture_pack_200k"] = _mixture_pack

    def _semantic_dedup():
        from dff.semdedup import semantic_dedup

        return semantic_dedup(
            emb_df, "vec_id", "embedding", threshold=0.97, n_centroids=64
        )

    out["semantic_dedup_100k"] = _semantic_dedup

    def _asof(tag: str):
        from dff.asof import asof_join_skewed

        fx = os.path.join(bench_dir, f"asof_{tag}_4000000")
        lf = spark.read.parquet(os.path.join(fx, "left"))
        rf = spark.read.parquet(os.path.join(fx, "right"))
        return asof_join_skewed(
            lf, rf, on=["key"], ts_col="ts",
            right_cols=["rid", "price"], right_order=["rid"],
            bucket_width=4000000.0 / 80.0,
        )

    out["asof_skewed_uniform_4m"] = lambda: _asof("uniform")
    out["asof_skewed_hotkey_4m"] = lambda: _asof("hotkey")
    return out


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qdict = entry.queries()
    bench = bench_frames(spark)
    for name in names:
        if name in bench:
            df = bench[name]()
        elif name in qdict:
            df = qdict[name](spark, SF_DIR)
        else:
            print(f"SKIP unknown query {name}")
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
