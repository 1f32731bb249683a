"""Engine-scale incremental-dedup benchmark.

The entire point of :mod:`dff.incremental` is that probing a new batch
against an N-doc historical corpus costs O(batch), not O(N): the stored
signatures/bands are bucketed on their join keys, so the store side never
re-shuffles.  This job measures that claim directly:

  1. build a managed MinHash store from ``--store-docs`` documents;
  2. probe a ``--batch-docs`` batch against it (steady-state, min-of-N);
  3. run the one-shot :func:`dff.dedup.minhash_dedup_pairs` over the
     UNION (what a non-incremental engine would have to do per ingest)
     at the same parallelism.

Headline: ``probe_sec`` vs ``full_rerun_sec`` and the probe's shuffle
write volume (which must scale with the batch, not the store).

Usage: python jobs/bench_incremental.py [--store-docs 500000]
       [--batch-docs 10000] [--parallelism 8]
Appends a JSON line to BENCH/incremental_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4050


def build_session(parallelism: int):
    from pyspark.sql import SparkSession

    from dff.env import pick_local_dir

    mem = os.environ.get("DFF_DRIVER_MEM", "16g")
    b = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName("dff-bench-incremental")
    )
    local_dir = pick_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    return (
        b.config("spark.sql.shuffle.partitions", str(2 * parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def stage_shuffle_bytes(spark) -> dict[int, int]:
    app_id = spark.sparkContext.applicationId
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}


def measure(spark, fn, repeats: int) -> tuple[float, list[float], int]:
    """min-of-repeats wall sec + shuffle bytes of the LAST run."""
    runs = []
    before = stage_shuffle_bytes(spark)
    for _ in range(repeats):
        before = stage_shuffle_bytes(spark)
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    after = stage_shuffle_bytes(spark)
    new = {k: v for k, v in after.items() if k not in before}
    return min(runs), runs, sum(new.values())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store-docs", type=int, default=500_000)
    ap.add_argument("--batch-docs", type=int, default=10_000)
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = build_session(args.parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from dff.dedup import minhash_dedup_pairs
    from dff.incremental import MinHashStore
    from dff.sources import synthetic_documents

    total = args.store_docs + args.batch_docs
    data = os.path.join(REPO, ".bench_data", f"incr_docs_{total}.parquet")
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        synthetic_documents(spark, total).repartition(
            max(64, args.parallelism * 8)
        ).write.mode("overwrite").parquet(data)
    docs = spark.read.parquet(data)
    old = docs.where(F.col("doc_id") < args.store_docs)
    batch = docs.where(F.col("doc_id") >= args.store_docs)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: compile the shingle/minhash tree + fork the Arrow workers
    noop(
        minhash_dedup_pairs(
            docs.limit(1000), "doc_id", "text", num_hashes=64, bands=16,
            threshold=0.5,
        )
    )

    store = MinHashStore(spark, "bench_incr_store", managed=True)
    t0 = time.perf_counter()
    store.init(old, "doc_id", "text")
    init_sec = round(time.perf_counter() - t0, 3)

    try:
        probe_sec, probe_runs, probe_shuf = measure(
            spark,
            lambda: noop(
                store.probe(batch, "doc_id", "text", threshold=0.5)
            ),
            args.repeats,
        )
        n_pairs = store.probe(
            batch, "doc_id", "text", threshold=0.5
        ).count()

        full_sec, full_runs, full_shuf = measure(
            spark,
            lambda: noop(
                minhash_dedup_pairs(
                    docs, "doc_id", "text", num_hashes=64, bands=16,
                    threshold=0.5,
                )
            ),
            min(args.repeats, 2),
        )
    finally:
        store.drop()

    rec = {
        "metric": "incremental dedup bench",
        "store_docs": args.store_docs,
        "batch_docs": args.batch_docs,
        "parallelism": args.parallelism,
        "store_init_sec": init_sec,
        "probe_sec": probe_sec,
        "probe_runs": probe_runs,
        "probe_batch_docs_per_sec": round(args.batch_docs / probe_sec),
        "probe_shuffle_write_bytes": probe_shuf,
        "probe_pairs_found": n_pairs,
        "full_rerun_sec": full_sec,
        "full_rerun_runs": full_runs,
        "full_rerun_shuffle_write_bytes": full_shuf,
        "probe_speedup_vs_full_rerun": round(full_sec / probe_sec, 2),
    }
    print(json.dumps(rec))
    out = os.path.join(REPO, "BENCH", "incremental_results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
