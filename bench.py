"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is materialized through the noop sink so the full plan executes
(collect-only timings can under-measure when Catalyst prunes unobserved
columns).  A validation-pipeline entry benches the engine itself over a
synthetic source-code table cached under .bench_data/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from dff.checkpoint import CheckpointStore
from dff.drift import CategoricalBins, DriftSpec, NumericBins, snapshot
from dff.ruleset import parse_json
from dff.runner import ReferentialCheck, ValidationConfig, ValidationRunner
from dff.sources import ALLOWED_LANGS, commits_dim, synthetic_source_files

HEADLINE = [
    "rule_dag_verdict",
    "pricing_summary",
    "inner_join",
    "broadcast_join",
    "left_anti",
    "window_topk_per_group",
    "stats_onepass",
    "monthly_rollup",
    "sha256",
    "token_counts",
    "psi_drift",
    "lang_id",
    "ann_bruteforce",
    "minhash_near_dups",
    "salted_stats",
    "training_corpus_pipeline",
]

VALIDATION_ROWS = int(os.environ.get("SPARK_GRAFT_VALIDATION_ROWS", "500000"))


def _session(cpus: int) -> SparkSession:
    from dff.env import pick_local_dir

    mem = os.environ.get("DFF_DRIVER_MEM", "16g")
    b = SparkSession.builder.master(f"local[{cpus}]").appName("dff-bench")
    # tmpfs shuffle dir (capacity-gated; see dff/env.py): the sandbox disk
    # writes at ~15 MB/s (see jobs/validate.py) — local-SSD stand-in
    local_dir = pick_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    return (
        b.config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem)
        # fixed pre-touched heap: G1 heap uncommit/recommit page-faults are
        # ~100x slower on virtualized memory (see jobs/validate.py)
        .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
        # keep scan stages wide on highly-compressed content (see jobs/validate.py)
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_source_table(spark: SparkSession, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    df = synthetic_source_files(spark, n, n_repos=2000, n_parts=64, seed=42)
    df.repartition(64).write.mode("overwrite").parquet(path)


def bench_validation_pipeline(
    spark: SparkSession, src_path: str, tmp: str
) -> tuple[float, list[float]]:
    """Full engine pass: rules + uniqueness + referential + drift + checkpoint."""
    df = spark.read.parquet(src_path)
    dspec = DriftSpec(
        numeric=[
            NumericBins(
                "content_length",
                tuple(float(2**i) for i in range(4, 14)),
                expr="length(content)",
            )
        ],
        categorical=[CategoricalBins("lang", tuple(ALLOWED_LANGS))],
    )
    baseline = snapshot(df.sample(0.05, seed=1), dspec)
    cfg = ValidationConfig(
        ruleset=parse_json(
            {
                "version": "bench-v1",
                "sensitivity": 0.7,
                "rules": [
                    {"id": "C_null_lang", "name": "lang is null", "requires": []},
                    {"id": "C_empty", "name": "length(content) = 0", "requires": ["C_null_lang"]},
                    {"id": "C_huge", "name": "length(content) > 10485760", "requires": ["C_empty"]},
                ],
            }
        ),
        referential=[
            ReferentialCheck(
                commits_dim(spark, 2000), ["repo", "commit"],
                "C_ref_commit", dim_is_distinct=True,
            )
        ],
        drift_spec=dspec,
        drift_baseline=baseline,
        snapshot_id="bench",
    )
    runner = ValidationRunner(cfg)
    store = CheckpointStore(spark, os.path.join(tmp, "ckpt"))
    # warm the validation path itself (JIT, codegen, Python workers) at
    # FULL size — excluded from timing.  A 20k-slice warm leaves timed
    # run 1 paying the 500k source's page-cache fill + full-plan codegen
    # (measured: run 1 lands 2-4x over steady state and drags the median;
    # the per-query suite discards run 1 for exactly this reason), so the
    # warm pass now covers the same data the timed runs read and the
    # median reports engine steady state, not sandbox cache state.
    warm = runner.validate(df, persist_violations=False)
    _materialize(warm.violations)
    warm.partition_metrics.collect()
    warm.unpersist()
    # median of 3 passes: round 2 published a single-shot number that the
    # driver could not reproduce (75k claimed vs 37.6k recorded) — the
    # median absorbs host jitter so README and BENCH_r{N} agree
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        result = runner.validate(df)
        # one action fills base + violations caches in a single decode
        # pass; the remaining actions read warm caches (see jobs/validate.py)
        result.violations.count()
        _materialize(result.verdicts)
        _materialize(result.violations)
        store.append(runner.checkpoint_rows(result.partition_metrics, "bench-v1"))
        runs.append(time.perf_counter() - t0)
        result.unpersist()
    return sorted(runs)[1], [round(r, 3) for r in runs]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qdict = entrymod.queries()
    # warmup (JIT, codegen, parquet footer cache)
    _materialize(qdict["stats_onepass"](spark, sf_dir))
    # warm the Python worker pool: the FIRST Arrow/pandas-UDF stage forks
    # cpus workers which each import pandas+numpy — ~95s cold on this
    # sandbox's 15 MB/s disk, ~0s once the pool exists (workers are reused)
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    # no type hints: `from __future__ import annotations` turns them into
    # strings that pandas_udf can't resolve against a local pandas import
    _warm = pandas_udf(lambda v: v * 1.0, "double")

    _materialize(
        spark.range(cpus * 4)
        .repartition(cpus * 2)
        .select(_warm(F.col("id").cast("double")).alias("v"))
    )
    # compile the shingle/minhash codegen units on a small slice: the LSH
    # expression tree Janino-compiles in tens of seconds the FIRST time
    # (measured 35.9s -> 9.6s -> 3.4s across identical runs); the compiled
    # classes are cached by generated source, so a 300-doc warmup buys the
    # steady-state timing for the full corpus
    from dff.dedup import minhash_dedup_pairs

    for warm_docs in (300, 1000):  # pass 1 Janino-compiles, pass 2 tiers C2
        _materialize(
            minhash_dedup_pairs(
                spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
                .limit(warm_docs),
                "doc_id", "text", num_hashes=64, bands=16, threshold=0.5,
            )
        )
    # warm the lang_id regex codegen the same way (measured: the identical
    # expression runs 1.4-2.7s on its first compile, ~0.5s steady-state —
    # the round-2 "regression" was exactly this single-shot variance)
    from dff.textops import lang_id as _lang_id

    for _ in range(2):
        _materialize(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .limit(500)
            .groupBy(_lang_id("text").alias("lid"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    # steady-state protocol (VERDICT r03 #1: the min-of-2 numbers recorded
    # apparent 5.4x/2.4x "regressions" on Python-worker-heavy queries that
    # re-measurement refuted): run each query 3x, DISCARD the first run —
    # it pays codegen/Janino compilation, Arrow worker dispatch, and any
    # cold page-cache read — and take the min of the remaining two.  All
    # runs are reported for transparency.
    timings: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}

    def bench_callable(name: str, fn) -> None:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(fn())
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs[1:])
        query_runs[name] = runs

    for name in HEADLINE:
        bench_callable(name, lambda n=name: qdict[n](spark, sf_dir))

    # -- engine-scale dedup/ANN corpora (VERDICT r03 #1: the gate tables
    # top out at 5k docs / 500 vectors; these entries time the same
    # operators at 200k docs / 100k vectors, generated deterministically
    # into .bench_data, never touching the read-only sf tables) ----------
    from dff.dedup import minhash_dedup_pairs as _mdp
    from dff.similarity import brute_force_topk as _bft
    from dff.sources import synthetic_documents, synthetic_embeddings

    bench_dir_ = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_data"
    )
    os.makedirs(bench_dir_, exist_ok=True)
    docs_path = os.path.join(bench_dir_, "docs_200k.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        synthetic_documents(spark, 200_000).repartition(64).write.mode(
            "overwrite"
        ).parquet(docs_path)
    emb_path = os.path.join(bench_dir_, "emb_100k.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        synthetic_embeddings(spark, 100_000, dim=64).repartition(32).write.mode(
            "overwrite"
        ).parquet(emb_path)
    docs_df = spark.read.parquet(docs_path)
    emb_df = spark.read.parquet(emb_path)
    q20 = (
        emb_df.where(F.pmod(F.col("vec_id"), F.lit(5000)) == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    bench_callable(
        "minhash_near_dups_200k",
        lambda: _mdp(
            docs_df, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ),
    )
    bench_callable(
        "ann_bruteforce_100k", lambda: _bft(emb_df, q20, k=10)
    )

    # the corpus build at engine scale: 200k docs through exact dedup ->
    # 3-gram decontamination (every 997th doc plays the benchmark) ->
    # 12/3 chunking -> 50% content-hash sample, one composed plan
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

    bench_callable("training_corpus_200k", _corpus_200k)

    # lexical relevance at engine scale: Okapi BM25 over the 200k-doc
    # corpus (tokenize/explode is the data-sized stage; query-term stats
    # broadcast)
    def _bm25_200k():
        from dff.relevance import bm25_scores as _bm

        return _bm(docs_df, ["spark", "join", "vector"])

    bench_callable("bm25_200k", _bm25_200k)

    # model-free text similarity end-to-end at engine scale: feature-hash
    # 200k docs to 128-d vectors (pure Catalyst) and run the fused
    # map-side-top-k cosine search for 20 queries over them
    def _text_ann_200k():
        from dff.similarity import brute_force_topk as _bft2
        from dff.vectorize import hashing_vectorize as _hv

        vecs = _hv(docs_df, dim=128).withColumnRenamed("doc_id", "vec_id")
        # hashing is stateless: query vectors hash independently from just
        # the query docs (deriving them from `vecs` would re-vectorize the
        # whole corpus a second time inside the same plan)
        qs = _hv(
            docs_df.where(F.pmod(F.col("doc_id"), F.lit(10_000)) == 0),
            dim=128,
        ).select(F.col("doc_id").alias("query_id"), "embedding")
        return _bft2(vecs, qs, k=10)

    bench_callable("text_ann_200k", _text_ann_200k)

    # mixture -> packing at engine scale: split the 200k docs into 8
    # domains, give d0 a 30% share of an 80%-of-corpus char budget
    # (forces d0 to upsample via epochs while the rest downsample), then
    # lay the sampled multiset into 4096-char contexts across 256 shards.
    # One bounded plan agg + a map-only sample + ONE (key, n_chars)
    # window shuffle — text moves only on the initial scan.
    def _mixture_pack_200k():
        from dff.mixing import mixture_plan, mixture_sample
        from dff.packing import pack_sequences

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

    bench_callable("mixture_pack_200k", _mixture_pack_200k)

    # semantic dedup at engine scale: 100k 64-d vectors, 64 IVF cells
    # (~1.5k vectors/cell keeps the within-cell quadratic at ~75M cosine
    # evaluations total, spread across tasks; embeddings shuffle once)
    def _semantic_dedup_100k():
        from dff.semdedup import semantic_dedup

        return semantic_dedup(
            emb_df, "vec_id", "embedding", threshold=0.97, n_centroids=64
        )

    bench_callable("semantic_dedup_100k", _semantic_dedup_100k)

    import tempfile

    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data")
    os.makedirs(bench_dir, exist_ok=True)
    src_path = os.path.join(bench_dir, f"source_{VALIDATION_ROWS}.parquet")
    _ensure_source_table(spark, VALIDATION_ROWS, src_path)

    # -- table-format scan pruning (round 5): the same single-partition
    # filter, with and without manifest-level min/max file skipping.  The
    # table is ingested once, range-clustered on part_id so each file
    # covers ~2 partitions; the pruned scan opens only the overlapping
    # files — at 10^12 files this is the difference between listing a
    # lake and reading one day's directory.
    from dff.tablefmt import Table

    tbl_root = os.path.join(bench_dir, f"table_src_{VALIDATION_ROWS}")
    src_df = spark.read.parquet(src_path)
    if not Table.exists(tbl_root):
        t = Table.create(tbl_root, src_df.schema)
        t.append(
            src_df.repartitionByRange(32, "part_id")
            .sortWithinPartitions("part_id")
        )
    else:
        t = Table(tbl_root)
    part_filter = [("part_id", "=", 7)]
    bench_callable(
        "table_scan_filter_unpruned_500k",
        lambda: t.scan(spark).where(F.col("part_id") == 7),
    )
    bench_callable(
        "table_scan_pruned_500k", lambda: t.scan(spark, part_filter)
    )
    table_prune = {
        "files_total": t.scan_file_count(),
        "files_opened": t.scan_file_count(part_filter),
    }

    # -- skew-bucketed as-of join at engine scale (VERDICT r04 #6): the
    # gate query proves hash-parity at sf0.01; this measures the hot-key
    # split where it matters.  Same operator, two fixtures: uniform keys
    # (4M left rows over 10k keys) vs 90% of rows on ONE key.  Plain
    # as-of would sort the hot key's 3.6M-row timeline in one task; the
    # bucketed plan spreads it over ts_span/width ≈ 80 tasks, so the
    # per-row cost should stay within ~1.5x of uniform.
    from dff.asof import asof_join_skewed as _ajs

    ASOF_LEFT = int(os.environ.get("SPARK_GRAFT_ASOF_ROWS", "4000000"))
    TS_SPAN = float(ASOF_LEFT)

    def _asof_bench_fixture(skew: bool, path: str):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        n_right = ASOF_LEFT // 4
        if skew:
            key = F.when(
                F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 9, F.lit(0)
            ).otherwise(F.pmod(F.xxhash64("id", F.lit(11)), F.lit(10_000)))
        else:
            key = F.pmod(F.xxhash64("id"), F.lit(10_000))
        ts = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(int(TS_SPAN))).cast(
            "double"
        )
        left = spark.range(ASOF_LEFT).select(
            F.col("id").alias("event_id"), key.alias("key"), ts.alias("ts")
        )
        right = spark.range(n_right).select(
            (F.col("id") + ASOF_LEFT).alias("rid"),
            key.alias("key"),
            ts.alias("ts"),
            (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1000)))
            .cast("double")
            .alias("price"),
        )
        left.repartition(32).write.mode("overwrite").parquet(
            os.path.join(path, "left")
        )
        right.repartition(16).write.mode("overwrite").parquet(
            os.path.join(path, "right")
        )
        # fixture marker (the two sub-dirs have their own _SUCCESS)
        with open(os.path.join(path, "_SUCCESS"), "w"):
            pass

    asof_perrow: dict[str, float] = {}
    for tag, skew in (("uniform", False), ("hotkey", True)):
        fx = os.path.join(bench_dir, f"asof_{tag}_{ASOF_LEFT}")
        _asof_bench_fixture(skew, fx)
        lf = spark.read.parquet(os.path.join(fx, "left"))
        rf = spark.read.parquet(os.path.join(fx, "right"))
        name = f"asof_skewed_{tag}_4m"
        bench_callable(
            name,
            lambda lf=lf, rf=rf: _ajs(
                lf, rf, on=["key"], ts_col="ts",
                right_cols=["rid", "price"], right_order=["rid"],
                bucket_width=TS_SPAN / 80.0,
            ),
        )
        asof_perrow[tag] = timings[name] / ASOF_LEFT
    asof_skew = {
        "left_rows": ASOF_LEFT,
        "uniform_sec": timings["asof_skewed_uniform_4m"],
        "hotkey_sec": timings["asof_skewed_hotkey_4m"],
        "hotkey_over_uniform": round(
            asof_perrow["hotkey"] / asof_perrow["uniform"], 3
        ),
    }
    with tempfile.TemporaryDirectory() as tmp:
        vsec, vruns = bench_validation_pipeline(spark, src_path, tmp)
    timings["validation_pipeline"] = round(vsec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                # VERDICT r03 #1: the headline VALUE is the validation-
                # pipeline MEDIAN (the engine's own workload, median-of-3
                # absorbs host jitter); the per-query suite total rides
                # along as suite_total_sec
                "metric": (
                    "validation pipeline median wall sec "
                    f"({VALIDATION_ROWS} rows; suite details in queries)"
                ),
                "value": round(vsec, 3),
                "unit": "sec",
                "queries": timings,
                "suite_total_sec": total,
                "sf": sf,
                "cpus": cpus,
                "validation_rows": VALIDATION_ROWS,
                "validation_rows_per_sec": round(VALIDATION_ROWS / vsec),
                # all three runs, for transparency: run 1 pays the page-
                # cache fill of the source table on this sandbox's slow
                # disk; the median is the steady-state number
                "validation_runs_sec": vruns,
                # per-query: 3 runs each, run 1 (codegen/worker warm-up)
                # discarded, reported value = min(runs 2..3)
                "query_runs_sec": query_runs,
                # manifest-level file skipping for the part_id=7 scan
                "table_prune": table_prune,
                # hot-key split: per-row cost of the 90%-one-key fixture
                # vs uniform keys, same bucketed as-of plan
                "asof_skew": asof_skew,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
