"""Duplicate-cluster formation: distributed connected components + dedup.

Near-dup detection (``dff.dedup``) emits PAIRS, but a training-data
pipeline deletes CLUSTERS: similarity is not transitive, so A~B and B~C
must collapse into one cluster {A,B,C} with a single canonical survivor,
or the corpus keeps one duplicate per chain link.  The reference has no
graph operator at all (its dedup story ends at pandas ``drop_duplicates``);
this module supplies the missing closure step over any pair table the
dedup family produces (MinHash LSH, SimHash, n-gram Jaccard, embedding
near-dup, or exact sha groups).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014).  Each
round is two groupBy-shuffles over the CURRENT EDGE SET only; the edge
set contracts toward a star forest (every node pointing at its
component's minimum id) in O(log^2 n) rounds — O(log n) observed.  Label
propagation, the naive alternative, needs DIAMETER rounds (a 10^6-long
chain of shingled near-dups = 10^6 shuffles) and is not used.  No vertex
ever materializes its whole component; the hottest key in any shuffle is
the component root, whose group size is the component's edge count —
bounded by the dedup family's per-bucket caps upstream.

Scale shape per round: ``groupBy(u).min`` (map-side partial) + an
equi-join on the same key ``u`` (co-partitioned with the agg, so AQE
reuses one exchange), then ``distinct`` on the shrinking output.
Iteration state is cut with ``localCheckpoint`` so the plan does not grow
with rounds; on a real cluster point ``spark.sparkContext.setCheckpointDir``
at durable storage and swap in ``checkpoint`` for executor-loss recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct edges oriented large-endpoint -> small-endpoint (u > v),
    nulls and self-loops dropped.  Works for any orderable id type."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull() & (F.col(src) != F.col(dst))
    )
    return e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """For each node, link every LARGER neighbor to the minimum of the
    closed neighborhood.  Input and output oriented u > v.

    No ``distinct`` here: each input edge contributes exactly ONE output
    row (from its smaller endpoint's group), so the edge count cannot
    grow, and duplicate pairs don't perturb the ``min`` aggregations —
    the one dedup shuffle per round lives in :func:`_small_star`."""
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        # new edge (old v) -> m where m <= u < old v: stays u > v oriented
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node, link every SMALLER-or-equal neighbor (and itself) to
    the minimum of the closed neighborhood.  Input/output oriented u > v."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so m < u
    relink = e.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    keep = mins.select("u", F.col("m").alias("v"))
    return (
        relink.union(keep).where(F.col("u") != F.col("v")).distinct()
    )


def _checksum_exprs():
    return [
        F.count(F.lit(1)).alias("n"),
        # decimal sum: no silent 64-bit wrap on huge edge sets
        F.sum(F.xxhash64("u", "v").cast("decimal(27,0)")).alias("s"),
    ]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """``(node, component)`` for every node, where ``component`` is the
    MINIMUM node id in the node's connected component (deterministic —
    safe to join against across runs and engines).

    ``nodes`` (optional, with ``node_col``) adds isolated nodes that appear
    in no edge; they come back as their own singleton components.  Without
    it, only endpoint nodes are assigned.

    Raises ``RuntimeError`` if ``max_iter`` alternating rounds do not
    converge (the algorithm needs O(log^2 n); 50 covers any real graph —
    non-convergence means the input edge table is changing under us).
    """
    from pyspark.sql import Observation

    obs0 = Observation()
    e = _canonical_edges(edges, src, dst).observe(
        obs0, *_checksum_exprs()
    ).localCheckpoint()
    prev = (obs0.get["n"], obs0.get["s"])
    if prev[0] > 0:
        for _ in range(max_iter):
            # the convergence checksum piggybacks on the checkpoint
            # materialization via observe() — no extra job per round
            obs = Observation()
            e = (
                _small_star(_large_star(e))
                .observe(obs, *_checksum_exprs())
                .localCheckpoint()
            )
            cur = (obs.get["n"], obs.get["s"])
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    # converged edge set is a star forest: every edge is (member -> root)
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    out = members.union(roots)
    if nodes is not None:
        if node_col is None:
            raise ValueError("node_col is required when nodes is given")
        iso = (
            nodes.select(F.col(node_col).alias("node"))
            .where(F.col("node").isNotNull())
            .distinct()
            .join(out.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        out = out.union(iso)
    return out


def canonical_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """The deduplicated corpus: every row of ``df`` except non-canonical
    duplicate-cluster members (the cluster's minimum id survives).  Rows
    in no pair pass through untouched — only the loser set (size = number
    of removed duplicates) is joined, as a left-anti on the id; its join
    strategy is left to AQE (the loser set can be huge on duplicate-heavy
    crawls, so no forced broadcast)."""
    cc = connected_components(pairs, src, dst, max_iter=max_iter)
    losers = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def best_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Deduplicate keeping the BEST cluster member, not the smallest id.

    A training pipeline that collapses a near-dup cluster wants to keep
    its highest-quality member (longest, best quality score, newest crawl
    — whatever ``score_col`` encodes), with ties broken by minimum id so
    the result is deterministic.  Rows in no pair pass through untouched.

    Scale shape: the component table covers CLUSTERED nodes only (a small
    subset on real corpora), so the winner election — one window over
    (component) ordered by (score desc, id asc) — shuffles only cluster
    members and their 8-byte scores, never the corpus; the corpus is
    touched once, by the final loser anti-join (strategy left to AQE,
    same reasoning as :func:`canonical_survivors`).
    """
    from pyspark.sql import Window

    cc = connected_components(pairs, src, dst, max_iter=max_iter)
    members = cc.join(
        df.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("__score")
        ),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__score").desc(), F.col("node").asc()
    )
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
