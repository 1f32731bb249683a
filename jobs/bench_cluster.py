"""Engine-scale connected-components benchmark (duplicate-cluster closure).

The gate queries exercise dff/cluster.py at 500 docs; this job times the
alternating large-star/small-star contraction at millions of edges, the
regime the operator exists for.  The synthetic graph is the adversarial
mix a dedup pair table actually produces:

  - ``n_nodes``-node cluster field: chains of 5 with one extra chord per
    cluster (dense small clusters = the common near-dup shape);
  - one 100k-long path (the diameter stress: label propagation would need
    100k rounds; the star contraction must stay logarithmic).

Correctness is asserted in-run (component count == expected), so a fast
wrong answer can't be recorded.  Shuffle volume per timed run comes from
the Spark UI REST API as in bench_dedup.

Usage: python jobs/bench_cluster.py [--nodes 4000000] [--parallelism 8]
Appends a JSON line to BENCH/cluster_results.json; record both
parallelism levels there for the scaling note in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def edge_table(spark, n_nodes: int, chain_len: int, parallelism: int):
    from pyspark.sql import functions as F

    base = spark.range(0, n_nodes, 1, max(16, parallelism * 4))
    # clusters of 5 consecutive ids: chain edges within each cluster...
    intra = base.where(F.col("id") % 5 != 0).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    # ...plus one chord (first -> third) per cluster for density
    chord = base.where(F.col("id") % 5 == 0).select(
        F.col("id").alias("id_a"), (F.col("id") + 2).alias("id_b")
    ).where(F.col("id_b") < n_nodes)
    # one long path appended after the cluster field
    chain = spark.range(
        n_nodes, n_nodes + chain_len - 1, 1, max(4, parallelism)
    ).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    return intra.union(chord).union(chain)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4_000_000)
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--chain", type=int, default=100_000,
        help="length of the adversarial path (rounds ~ log2(chain)); "
             "use ~1000 for a realistic near-dup graph diameter",
    )
    args = ap.parse_args()

    from jobs.bench_dedup import build_session, measure

    spark = build_session(args.parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from dff.cluster import connected_components

    data = os.path.join(
        REPO, ".bench_data", f"cc_edges_{args.nodes}_{args.chain}.parquet"
    )
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        edge_table(spark, args.nodes, args.chain, args.parallelism).write.mode(
            "overwrite"
        ).parquet(data)
    edges = spark.read.parquet(data)
    n_edges = edges.count()

    # expected components: ceil(nodes/5) clusters + the single long chain
    expected = (args.nodes + 4) // 5 + 1

    def run():
        cc = connected_components(edges, "id_a", "id_b")
        got = cc.agg(F.countDistinct("component").alias("c")).first()["c"]
        assert got == expected, (got, expected)

    run()  # warm-up (Janino, parquet footers) — excluded from timing
    sec, runs, shuf, peak = measure(spark, run, args.repeats)

    rec = {
        "metric": "connected-components engine-scale bench",
        "nodes": args.nodes,
        "edges": n_edges,
        "chain_len": args.chain,
        "parallelism": args.parallelism,
        "cc_sec": sec,
        "cc_edges_per_sec": round(n_edges / sec),
        "cc_runs": runs,
        "cc_shuffle_write_bytes": shuf,
        "cc_peak_stage_shuffle_bytes": peak,
        "components": expected,
    }
    print(json.dumps(rec))
    out = os.path.join(REPO, "BENCH", "cluster_results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
