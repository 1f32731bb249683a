"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The (small) query set is BROADCAST against the item table; similarity is
  JVM-side zip_with arithmetic; top-k is a window row_number per query.
  At 100 TB this is a single map-side pass over items + one shuffle of
  (n_queries x candidates) rows.
- ``ivf_topk``: the scale path — IVF-style coarse quantization.  Items are
  assigned once to their nearest centroid (Arrow-batched numpy matmul);
  a query probes only the ``nprobe`` nearest centroid lists, pruning the
  scanned fraction to ~nprobe/n_centroids.  Centroids here are a
  deterministic sample of the items (k-means init without iterations —
  good enough for pruning; swap in trained centroids at will).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .dedup import cosine_expr


def two_stage_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-k per query without a per-query single-reducer window.

    A ``row_number().over(Window.partitionBy(query_id))`` sends every
    scored (item x query) row to n_queries reducer partitions — one reducer
    sorts the full candidate set per query.  Grouping by (query_id,
    spark_partition_id) instead spreads the merge over n_parts x n_queries
    groups and replaces the global sort with per-group array sorts.

    HONEST LIMIT: the partial ``collect_list`` buffers still ship ALL
    candidate rows through the exchange (the slice to k happens after the
    final aggregate) — this fixes the reducer hotspot and the sort, not
    shuffle volume.  It is the right merge for PRE-PRUNED candidate sets
    (IVF probes); for brute force over the full item table use
    :func:`brute_force_topk`, whose map-side numpy stage prunes to k per
    partition BEFORE any shuffle.

    Top-k is a monotone selection, so pruning to k per partition is exact.
    Ordering: cosine DESC, item_id ASC (ties) — encoded as an ascending
    struct sort on (-cosine, item_id).
    """
    neg = F.struct(
        (-F.col("cosine")).alias("negcos"), F.col("item_id").alias("item_id")
    )
    partial = (
        scored.withColumn("__pid", F.spark_partition_id())
        .groupBy("query_id", "__pid")
        .agg(F.slice(F.array_sort(F.collect_list(neg)), 1, k).alias("cand"))
    )
    merged = partial.groupBy("query_id").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("cand"))), 1, k).alias("top")
    )
    return merged.select("query_id", F.posexplode("top").alias("pos", "c")).select(
        "query_id",
        F.col("c.item_id").alias("item_id"),
        # +0.0 normalizes IEEE -0.0 back to 0.0 after the sign flip
        (-F.col("c.negcos") + F.lit(0.0)).alias("cosine"),
        (F.col("pos") + 1).alias("rank"),
    )


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query, shuffle-free until the final merge.

    The query matrix (bounded — the same assumption any broadcast ANN
    makes) is collected once and closed over an Arrow-batched
    ``mapInPandas`` stage that, per input partition, scores items against
    ALL queries with one numpy matmul per batch and maintains a running
    top-k per query — so each partition emits at most n_queries x k rows
    and NOTHING ever shuffles except those partials.  The final exact merge
    is a plain window over n_partitions x n_queries x k rows (kilobytes).

    Zero-norm vectors score 0.0 and null embeddings are skipped, matching
    :func:`dff.dedup.cosine_expr` semantics; ties break on item_id ASC.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    q_rows = queries.select(
        F.col(query_id), F.col(emb).cast("array<double>")
    ).collect()
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("item_id", items.schema[item_id].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    src = items.select(
        F.col(item_id).alias("item_id"),
        F.col(emb).cast("array<double>").alias("emb"),
    )
    if not q_rows:
        return src.sparkSession.createDataFrame([], out_schema).withColumn(
            "rank", F.lit(1)
        ).limit(0)
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)  # (nq, dim)
    q_norm = np.linalg.norm(q_mat, axis=1)
    nq = len(q_ids)

    def score_partition(batches):
        run_cos = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        run_ids = [np.empty(0, dtype=object) for _ in range(nq)]
        for pdf in batches:
            pdf = pdf[pdf["emb"].notna()]
            if not len(pdf):
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)  # (b, dim)
            ids = pdf["item_id"].to_numpy()
            xn = np.linalg.norm(x, axis=1)
            denom = xn[:, None] * q_norm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom > 0, (x @ q_mat.T) / denom, 0.0)  # (b, nq)
            for j in range(nq):
                cos = np.concatenate([run_cos[j], sims[:, j]])
                iid = np.concatenate([run_ids[j], ids])
                if len(cos) > k:
                    # lexsort: last key is primary -> cosine DESC, id ASC
                    order = np.lexsort((iid, -cos))[:k]
                    cos, iid = cos[order], iid[order]
                run_cos[j], run_ids[j] = cos, iid
        out = {
            "query_id": [q_ids[j] for j in range(nq) for _ in run_ids[j]],
            "item_id": np.concatenate(run_ids) if nq else [],
            "cosine": np.concatenate(run_cos) if nq else [],
        }
        yield pd.DataFrame(out)

    pruned = src.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _spherical_kmeans(x: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Tiny driver-side spherical k-means (cosine) for IVF centroid
    training.  Deterministic: seeded init from the sample itself; empty
    clusters re-seeded from the least-covered points."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        sims = x @ c.T                      # (n, k)
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            else:  # re-seed empty cluster with the worst-covered point
                c[j] = x[np.argmin(np.max(sims, axis=1))]
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _nearest_centroid_udf(centroids: np.ndarray, nprobe: int = 1):
    """Arrow-batched assignment to the nprobe nearest centroids (cosine)."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def assign(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ c.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    return assign


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    emb: str = "embedding",
) -> DataFrame:
    """IVF-bucketed ANN: items live in one centroid list; queries probe
    ``nprobe`` lists.  Recall < 1 by design; larger nprobe -> closer to
    brute force (asserted within tests).

    Centroids are trained with a few spherical k-means iterations on a
    small DETERMINISTIC sample (hash-selected, partitioning-independent) —
    the sample and the iteration count are bounded, so driver work is O(
    sample x iters x dim) regardless of table size; only the final
    centroid matrix ships to executors inside the Arrow-batched
    assignment UDF.
    """
    sample_rows = (
        items.select(F.col(item_id).alias("_id"), F.col(emb).cast("array<double>").alias("_e"))
        .where(F.pmod(F.xxhash64(F.col("_id"), F.lit("ivf")), F.lit(997)) < F.lit(512))
        .limit(max(n_centroids * 64, 1024))
        .collect()
    )
    sample = np.array([r["_e"] for r in sample_rows], dtype=np.float64)
    if len(sample) < n_centroids:  # tiny tables: fall back to first-k rows
        cent_rows = (
            items.orderBy(F.col(item_id)).limit(n_centroids)
            .select(F.col(emb).cast("array<double>"))
            .collect()
        )
        centroids = np.array([r[0] for r in cent_rows], dtype=np.float64)
    else:
        centroids = _spherical_kmeans(sample, n_centroids, iters=8)

    assign1 = _nearest_centroid_udf(centroids, nprobe=1)
    assignp = _nearest_centroid_udf(centroids, nprobe=nprobe)

    i = items.select(
        F.col(item_id).alias("item_id"), F.col(emb).cast("array<double>").alias("i_emb")
    ).withColumn("cell", F.element_at(assign1(F.col("i_emb")), 1))
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(emb).cast("array<double>").alias("q_emb")
    ).withColumn("cell", F.explode(assignp(F.col("q_emb"))))

    scored = i.join(F.broadcast(q), "cell").select(
        "query_id",
        "item_id",
        cosine_expr(F.col("i_emb"), F.col("q_emb")).alias("cosine"),
    )
    return two_stage_topk(scored, k)
