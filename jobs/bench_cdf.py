"""Engine-scale change-data-feed bench: MOR-delete pre-images with
manifest pruning vs a full prior-snapshot read, and CDC replication cost
for a small delta into a large replica.

The claim under test (dff/tablefmt.py:scan_changes): a daily delete's
pre-images read only the files whose stats overlap the tombstone's key
bounds — O(delta), not O(table).  Run:

    python jobs/bench_cdf.py [--rows 4000000] [--files 64] [--delta 10000]

Prints one JSON line with file counts and min-of-3 wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cpus: int = 8):
    from pyspark.sql import SparkSession

    from dff.env import pick_local_dir

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.local.dir", pick_local_dir())
        .config("spark.driver.memory", "12g")
        .config("spark.driver.extraJavaOptions",
                "-Xms12g -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--delta", type=int, default=10_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dff.cdc import apply_changes
    from dff.tablefmt import Table

    spark = _session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="dff-cdf-bench-")
    df = spark.range(args.rows).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    src = Table.create(base + "/src", df.schema, change_feed=True)
    v1 = src.append(
        df.repartitionByRange(args.files, "k").sortWithinPartitions("k")
    )
    # replica seeded with the initial snapshot (plain append: CDC then
    # only pays for the delta)
    dst = Table.create(base + "/dst", df.schema)
    dst.append(src.scan(spark))

    # clustered delete delta: one contiguous key range ~ 1 file
    lo = args.rows // 2
    hi = lo + args.delta - 1
    src.delete_matching_mor(
        spark,
        spark.range(lo, hi + 1).select(F.col("id").alias("k")),
        ["k"],
    )
    v2 = src._latest_version()

    # (a) pruned pre-image read (the shipped path)
    def timed(fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    # aggregate over the payload so BOTH paths materialize full pre-image
    # rows — a bare count() lets Catalyst prune every column and the
    # comparison degenerates to key-only scans
    def full_rows(df):
        r = df.agg(
            F.count("*").alias("n"), F.min("payload").alias("p")
        ).first()
        return r["n"]

    pruned_sec, n_del = timed(
        lambda: full_rows(src.scan_changes(spark, v1, v2))
    )

    # (b) the unpruned strawman: read EVERY prior-snapshot file and
    # semi-join (what a format without per-file stats must do)
    d = src.delete_entries(v2)[0]
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(src._snapshot(v2)["schema"])
    prev = src.entries(v1)

    def unpruned():
        rows = src._read_with_deletes(
            spark, prev, schema, [], snap=src._snapshot(v2)
        )
        keys = spark.read.parquet(os.path.join(src.root, d["path"]))
        return full_rows(rows.join(F.broadcast(keys), ["k"], "left_semi"))

    unpruned_sec, n_del2 = timed(unpruned)
    assert n_del == n_del2 == args.delta, (n_del, n_del2)

    # pruning evidence: files actually read by the pruned path
    st = d["stats"]["k"]
    filt = [("k", "between", (st["min"], st["max"]))]
    files_read = len(src._keep_under_filters(src._snapshot(v2), prev, filt,
                                             src.partition_specs(v2)))

    # (c) CDC replication of the delta into the big replica
    rep_sec, out = timed(
        lambda: apply_changes(spark, src, dst, ["k"], since_version=v1),
        n=1,  # idempotency keys make re-runs no-ops; time the real apply
    )
    match = dst.scan(spark).count() == src.scan(spark).count()

    print(json.dumps({
        "rows": args.rows,
        "files_total": len(prev),
        "delta_rows": args.delta,
        "preimage_files_read": files_read,
        "preimage_pruned_sec": round(pruned_sec, 3),
        "preimage_unpruned_sec": round(unpruned_sec, 3),
        "speedup": round(unpruned_sec / pruned_sec, 2),
        "cdc_apply_sec": round(rep_sec, 3),
        "replica_matches": bool(match),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
