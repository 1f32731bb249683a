"""Engine-scale table-format MERGE benchmark.

The point of :meth:`dff.tablefmt.Table.merge_upsert` is that upserting a
small delta into a big table costs O(overlapping files + delta), not
O(table): source key bounds prune the manifest, only stat-overlapping
files rewrite, everything else is carried by reference.  This job
measures that claim directly:

  1. ingest ``--rows`` synthetic source rows into a fresh table,
     range-clustered on ``row_id`` across ``--files`` files;
  2. MERGE a ``--delta-rows`` delta whose keys span ONE narrow row_id
     range (the daily-partition analog) — time it, record how many files
     rewrote;
  3. MERGE an equal-size delta via full overwrite (read + anti-join +
     union + overwrite — what an engine without file-level COW pays);
  4. scan correctness check: both paths must produce the same row count
     and updated-row count.

Each timed phase runs on a FRESH table copy (merges mutate), built once
from a cached parquet source; build cost is excluded from timing.

Usage: python jobs/bench_table.py [--rows 500000] [--files 32]
       [--delta-rows 10000] [--parallelism 8] [--repeats 3]
Appends a JSON line to BENCH/table_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session(parallelism: int):
    from pyspark.sql import SparkSession

    from dff.env import pick_local_dir

    mem = os.environ.get("DFF_DRIVER_MEM", "8g")
    b = SparkSession.builder.master(f"local[{parallelism}]").appName(
        "dff-bench-table"
    )
    local_dir = pick_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    return (
        b.config("spark.sql.shuffle.partitions", str(2 * parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--delta-rows", type=int, default=10_000)
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dff.sources import synthetic_source_files
    from dff.tablefmt import Table

    spark = build_session(args.parallelism)
    spark.sparkContext.setLogLevel("ERROR")

    bench_dir = os.path.join(REPO, ".bench_data")
    os.makedirs(bench_dir, exist_ok=True)
    src_path = os.path.join(bench_dir, f"table_merge_src_{args.rows}.parquet")
    if not os.path.exists(os.path.join(src_path, "_SUCCESS")):
        synthetic_source_files(
            spark, args.rows, n_repos=2000, n_parts=64, seed=42
        ).withColumn(
            "row_id", F.xxhash64("repo", "path", "commit")
        ).write.mode("overwrite").parquet(src_path)
    src = spark.read.parquet(src_path)
    n_src = src.count()

    # the delta: update every row inside ONE narrow row_id band (the
    # "today's partition" analog) — ~delta_rows of them, deterministic
    lo = src.selectExpr("min(row_id) AS lo").first()["lo"]
    hi = src.selectExpr("max(row_id) AS hi").first()["hi"]
    width = int((hi - lo) * (args.delta_rows / n_src))
    delta = (
        src.where(F.col("row_id").between(lo, lo + width))
        .withColumn("lang", F.lit("upserted"))
        .cache()
    )
    n_delta = delta.count()

    def fresh_table(tag: str) -> Table:
        root = tempfile.mkdtemp(prefix=f"dff-btbl-{tag}-") + "/t"
        t = Table.create(root, src.schema)
        t.append(
            src.repartitionByRange(args.files, "row_id").sortWithinPartitions(
                "row_id"
            )
        )
        return t

    results: dict = {
        "rows": n_src,
        "files": args.files,
        "delta_rows": n_delta,
        "parallelism": args.parallelism,
    }

    # -- (2) COW merge: prune by key bounds, rewrite overlapping files --
    merge_runs, rewritten = [], None
    for _ in range(args.repeats):
        t = fresh_table("merge")
        t0 = time.perf_counter()
        t.merge_upsert(spark, delta, ["row_id"], check_unique_keys=False)
        merge_runs.append(time.perf_counter() - t0)
        summ = t._snapshot()["summary"]
        rewritten = (summ["rewritten_files"], summ["carried_files"])
        assert t.scan(spark).count() == n_src
        assert (
            t.scan(spark).where(F.col("lang") == "upserted").count() == n_delta
        )
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
    results["merge_sec"] = round(min(merge_runs), 3)
    results["merge_runs_sec"] = [round(r, 3) for r in merge_runs]
    results["merge_rewritten_files"] = rewritten[0]
    results["merge_carried_files"] = rewritten[1]

    # -- (2b) MOR merge: tombstone + append, target never read ----------
    mor_runs, mor_scan, cow_scan, fold_runs, folded_scan = [], [], [], [], []
    for _ in range(args.repeats):
        t = fresh_table("mor")
        t0 = time.perf_counter()
        t.merge_upsert(spark, delta, ["row_id"], check_unique_keys=False,
                       mode="mor")
        mor_runs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        n = t.scan(spark).count()  # the read tax: tombstone anti-join
        mor_scan.append(time.perf_counter() - t0)
        assert n == n_src
        assert (
            t.scan(spark).where(F.col("lang") == "upserted").count() == n_delta
        )
        t0 = time.perf_counter()
        t.compact(spark, target_file_bytes=64 << 20)
        fold_runs.append(time.perf_counter() - t0)
        assert t.delete_entries() == []  # tombstones reclaimed
        t0 = time.perf_counter()
        assert t.scan(spark).count() == n_src
        folded_scan.append(time.perf_counter() - t0)
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
        # the COW-merged table's scan, for the read-tax comparison
        t = fresh_table("cowscan")
        t.merge_upsert(spark, delta, ["row_id"], check_unique_keys=False)
        t0 = time.perf_counter()
        assert t.scan(spark).count() == n_src
        cow_scan.append(time.perf_counter() - t0)
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
    results["mor_merge_sec"] = round(min(mor_runs), 3)
    results["mor_merge_runs_sec"] = [round(r, 3) for r in mor_runs]
    results["mor_scan_sec"] = round(min(mor_scan), 3)
    results["cow_scan_sec"] = round(min(cow_scan), 3)
    results["mor_compact_sec"] = round(min(fold_runs), 3)
    results["mor_scan_after_compact_sec"] = round(min(folded_scan), 3)

    # -- (2c) scattered delta: keys span EVERY file ----------------------
    # the structural MOR case — stats can't prune anything, so COW
    # rewrites the whole table while MOR still costs O(batch)
    scattered = (
        src.withColumn("__b", F.pmod(F.xxhash64("row_id"), F.lit(100)))
        .where(F.col("__b") == 0)
        .drop("__b")
        .withColumn("lang", F.lit("upserted"))
        .cache()
    )
    n_scattered = scattered.count()
    cow_sc, mor_sc, cow_sc_files = [], [], None
    for _ in range(args.repeats):
        t = fresh_table("cowsc")
        t0 = time.perf_counter()
        t.merge_upsert(spark, scattered, ["row_id"], check_unique_keys=False)
        cow_sc.append(time.perf_counter() - t0)
        cow_sc_files = t._snapshot()["summary"]["rewritten_files"]
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
        t = fresh_table("morsc")
        t0 = time.perf_counter()
        t.merge_upsert(spark, scattered, ["row_id"], check_unique_keys=False,
                       mode="mor")
        mor_sc.append(time.perf_counter() - t0)
        assert t.scan(spark).count() == n_src
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
    results["scattered_delta_rows"] = n_scattered
    results["cow_scattered_sec"] = round(min(cow_sc), 3)
    results["cow_scattered_rewritten_files"] = cow_sc_files
    results["mor_scattered_sec"] = round(min(mor_sc), 3)
    results["mor_scattered_speedup"] = round(
        min(cow_sc) / min(mor_sc), 2
    )

    # -- (3) full-table overwrite path (no file-level COW) --------------
    ow_runs = []
    for _ in range(args.repeats):
        t = fresh_table("ow")
        t0 = time.perf_counter()
        full = t.scan(spark)
        merged = full.join(
            delta.select("row_id"), "row_id", "left_anti"
        ).unionByName(delta)
        t.overwrite(merged, n_files=args.files)
        ow_runs.append(time.perf_counter() - t0)
        assert t.scan(spark).count() == n_src
        assert (
            t.scan(spark).where(F.col("lang") == "upserted").count() == n_delta
        )
        shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
    results["overwrite_sec"] = round(min(ow_runs), 3)
    results["overwrite_runs_sec"] = [round(r, 3) for r in ow_runs]
    results["merge_speedup"] = round(
        results["overwrite_sec"] / results["merge_sec"], 2
    )

    # -- (4) streaming tail: stream_from_table cost is O(batch), not
    # O(table) — a consumer caught up to the tip pays only the new
    # commit's files to drain it, however big the table is.  Contrast
    # with the non-incremental alternative (re-scan the whole table and
    # pick the new rows out yourself).
    from dff.streaming import stream_from_table

    t = fresh_table("tail")
    ck = tempfile.mkdtemp(prefix="dff-tailck-")
    stream_from_table(spark, t.root, ck, lambda df, b: None)  # catch up
    tail_runs, full_runs = [], []
    delivered = 0
    for i in range(args.repeats):
        batch = delta.withColumn(
            "row_id", F.col("row_id") + F.lit((i + 1) * 10 * n_src)
        )
        t.append(batch, n_files=1)
        got: list[int] = []
        t0 = time.perf_counter()
        stream_from_table(
            spark, t.root, ck,
            lambda df, b: got.append(df.count()),
        )
        tail_runs.append(time.perf_counter() - t0)
        delivered = sum(got)
        assert delivered == n_delta, (delivered, n_delta)
        t0 = time.perf_counter()
        t.scan(spark).where(
            F.col("row_id") >= (i + 1) * 10 * n_src
        ).count()
        full_runs.append(time.perf_counter() - t0)
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(os.path.dirname(t.root), ignore_errors=True)
    results["tail_batch_rows"] = n_delta
    results["tail_sec"] = round(min(tail_runs), 3)
    results["tail_runs_sec"] = [round(r, 3) for r in tail_runs]
    results["tail_vs_full_scan_sec"] = round(min(full_runs), 3)
    results["tail_speedup"] = round(min(full_runs) / min(tail_runs), 2)

    out = os.path.join(REPO, "BENCH", "table_results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(results) + "\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
