"""spark-submit entry for continuous-ingest near-dup filtering.

Drives :func:`dff.incremental.ingest_dedup_stream`: documents parquet
files dropped into ``--src`` are consumed as micro-batches, probed
against the persisted MinHash store, survivors land in ``--out``
(per-batch dynamic partition overwrite -> exactly-once) and extend the
store so later batches dedup against everything kept so far.

Run with ``availableNow`` (default) to drain what's there and exit, or
``--follow SECONDS`` to keep polling.  Prints one JSON summary line.

Usage:
  python jobs/ingest.py --src DIR --store LOC --out DIR --checkpoint DIR
        [--id-col doc_id] [--text-col text] [--threshold 0.7]
        [--parallelism 8] [--managed] [--follow SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jobs.validate import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="directory of parquet batches")
    ap.add_argument("--store", required=True, help="MinHash store location")
    ap.add_argument("--out", required=True, help="survivor output directory")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-bucket-size", type=int, default=1000)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument(
        "--managed", action="store_true",
        help="bucketed-table store backend (shuffle-free probes)",
    )
    ap.add_argument(
        "--follow", type=int, default=None,
        help="poll every N seconds instead of drain-and-exit",
    )
    args = ap.parse_args()

    spark = build_session(args.parallelism, app="dff-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    from dff.incremental import MinHashStore, ingest_dedup_stream

    store = MinHashStore(spark, args.store, managed=args.managed)
    schema = spark.read.parquet(args.src).schema
    stream = spark.readStream.schema(schema).parquet(args.src)
    batches: list[tuple[int, int, int]] = []
    q = ingest_dedup_stream(
        stream, store, args.id_col, args.text_col, args.out,
        args.checkpoint, threshold=args.threshold,
        max_bucket_size=args.max_bucket_size,
        trigger_seconds=args.follow,
        on_batch=lambda b, n, k: batches.append((b, n, k)),
    )
    if args.follow:
        q.awaitTermination()
    else:
        q.awaitTermination(3600)
    n_in = sum(b[1] for b in batches)
    n_kept = sum(b[2] for b in batches)
    print(
        json.dumps(
            {
                "metric": "ingest dedup",
                "batches": len(batches),
                "rows_in": n_in,
                "rows_kept": n_kept,
                "dropped_as_dups": n_in - n_kept,
                "store_docs": store.load_sigs().count() if store.exists() else 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
