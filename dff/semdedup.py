"""Semantic deduplication over embeddings (SemDeDup-style).

Pairwise near-dup mining (:func:`dff.dedup.embedding_near_dup_pairs`)
answers "which pairs are close"; corpus pruning needs the complement:
ONE canonical survivor per semantic neighborhood.  The published recipe
(SemDeDup, Abbas et al. 2023 — public paper) is: k-means-cluster the
embeddings, compute within-cluster cosines, and drop every point whose
similarity to any PRECEDING point in its cluster exceeds a threshold
(the upper-triangular rule — a dropped point still shields later
points, which is exactly what the reference implementation's
upper-triangular max computes).

Spark-first realization:

- Clustering reuses :func:`dff.similarity.build_ivf_index` — centroid
  training is a bounded deterministic sample on the driver, assignment
  is one Arrow-batched pass; the SAME index can also serve ANN queries.
- The within-cell upper-triangular test runs per cell inside ONE
  ``applyInPandas`` pass: rows sort by id, the gram matrix is computed
  in BLAS column blocks (memory bounded at ``cell × block``), and a doc
  drops iff its column max over PRECEDING rows reaches the threshold.
  A Catalyst per-pair cosine was measured as the wrong realization here
  — per-pair higher-order-function evaluation is ~100× slower than one
  matmul per cell (same lesson as the hashing-vectorizer shootout,
  dff/vectorize.py).  The quadratic is bounded by cell size (cells
  shrink as ``n_centroids`` grows with the corpus; SemDeDup used
  k ~ sqrt(n)).  Over-cap cells (degenerate embedding mass) are
  exempted conservatively: their docs are KEPT and flagged, never
  silently dropped (same convention as
  :func:`dff.dedup.drop_hot_buckets`).
- Output is the full assignment with a ``kept`` flag, so both the
  pruned corpus (``kept``) and the audit trail (``NOT kept``) are one
  filter away.

Scale shape (100 TB): embeddings shuffle exactly once (by cell); the
per-cell task does O(cell² · dim) BLAS flops with O(cell · block)
memory, and the hot-cell cap bounds the worst case.  At 10^9 docs with
k=32k centroids a cell holds ~30k docs — one ~2-second matmul task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.dedup import cosine_expr
from dff.similarity import build_ivf_index


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float = 0.95,
    n_centroids: int = 16,
    max_cell_size: int = 20000,
) -> DataFrame:
    """Assign every doc a cell and a ``kept`` verdict.

    Returns ``(id_col, cell, kept, cell_capped)``: ``kept`` is false iff
    some SAME-CELL doc with a smaller id has cosine >= ``threshold``
    (the SemDeDup upper-triangular rule, deterministic given the
    centroid training sample).  ``cell_capped`` marks docs in cells
    larger than ``max_cell_size`` — those are exempted from the
    quadratic test and kept conservatively.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    cells, idx = _assign_cells(df, id_col, emb_col, n_centroids)
    return _verdicts_from_cells(cells, id_col, threshold, max_cell_size)


#: persisted cell assignments from PRIOR semantic_dedup calls, released on
#: the next call (ADVICE r05: they used to accumulate for the session's
#: lifetime).  The returned verdicts are lazy, so the current call's cache
#: cannot be dropped inside the call itself; deferring the unpersist to
#: the next call bounds live assignment caches at ONE without adding an
#: eager materialization to the hot path.  (Single-threaded builder
#: assumption — concurrent semantic_dedup calls from different threads
#: should manage indexes explicitly via build_ivf_index.)
_stale_indexes: list = []


def _assign_cells(
    df: DataFrame, id_col: str, emb_col: str, n_centroids: int
) -> tuple[DataFrame, "object"]:
    """One cell assignment, PERSISTED: verdict derivation reads it at
    least three times (size agg, in-cell pass, final join) and the
    violations gate adds a self-join — without the persist each consumer
    re-runs the Arrow assignment UDF over the full scan.  Returns the
    assignment frame AND the index; the index is queued for deferred
    unpersist on the next call (see ``_stale_indexes``)."""
    while _stale_indexes:
        try:
            _stale_indexes.pop().unpersist()
        except Exception:
            pass
    idx = build_ivf_index(
        df, n_centroids, item_id=id_col, emb=emb_col, persist=True
    )
    _stale_indexes.append(idx)
    return idx.assigned.select(
        F.col("item_id").alias("__id"), F.col("i_emb").alias("__emb"), "cell"
    ), idx


def _verdicts_from_cells(
    cells: DataFrame, id_col: str, threshold: float, max_cell_size: int
) -> DataFrame:
    sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    cells = cells.join(F.broadcast(sizes), "cell").withColumn(
        "cell_capped", F.col("__n") > F.lit(int(max_cell_size))
    )
    small = cells.where(~F.col("cell_capped"))

    id_type = cells.schema["__id"].dataType
    out_schema = T.StructType([T.StructField("__id", id_type)])
    tau = float(threshold)

    def _dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        # one cell: sort by id, normalized gram matrix in column blocks,
        # drop column j iff max over rows i<j reaches tau
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pdf.iloc[0:0][["__id"]]
        E = np.stack(pdf["__emb"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cosine defined as 0
        E = E / norms[:, None]
        drop = np.zeros(n, dtype=bool)
        block = 1024
        rows = np.arange(n)
        for s in range(1, n, block):
            e = min(s + block, n)
            S = E[:e] @ E[s:e].T  # (e, e-s); memory bounded at n x block
            mask = rows[:e, None] < np.arange(s, e)[None, :]
            S = np.where(mask, S, -np.inf)
            drop[s:e] = S.max(axis=0) >= tau
        return pdf.loc[drop, ["__id"]]

    dropped = small.select("cell", "__id", "__emb").groupBy("cell").applyInPandas(
        _dropped, schema=out_schema
    )
    return (
        cells.join(dropped.withColumn("__dropped", F.lit(True)), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "cell",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
            "cell_capped",
        )
    )


def semantic_dedup_violations(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float = 0.95,
    n_centroids: int = 16,
    max_cell_size: int = 20000,
    eps: float = 1e-9,
) -> DataFrame:
    """Self-check gate: re-derive the verdicts from the SAME cell
    assignment (built exactly once — two independent builds could train
    on different LIMIT-ordered samples and disagree legitimately) via an
    INDEPENDENT realization — a Catalyst self-join with the per-pair
    cosine expression (fine at gate-table scale; the production path is
    the blocked BLAS pass) — and report every disagreement: (a) a kept
    doc whose max earlier same-cell cosine is CLEARLY above threshold,
    (b) a dropped doc whose max is CLEARLY below.  "Clearly" = outside
    ``±eps`` of the threshold: the two realizations (normalize-then-
    matmul vs fold dot/(na·nb)) can disagree in the last ulps exactly AT
    the boundary, so boundary pairs are indeterminate by construction,
    not violations.  Must be empty on any input; cross-engine the oracle
    is the empty set (cells are engine-internal — the invariant-twin
    pattern used for IVF/HLL gates)."""
    cells, idx = _assign_cells(df, id_col, emb_col, n_centroids)
    verdicts = _verdicts_from_cells(cells, id_col, threshold, max_cell_size)
    x, y = cells.alias("x"), cells.alias("y")
    max_earlier = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .groupBy(F.col("y.__id").alias("__id"))
        .agg(
            F.max(cosine_expr(F.col("x.__emb"), F.col("y.__emb"))).alias(
                "__maxc"
            )
        )
    )
    tau = float(threshold)
    joined = verdicts.select(
        F.col(id_col).alias("__id"), "kept", "cell_capped"
    ).join(max_earlier, "__id", "left")
    clearly_dup = F.col("__maxc") >= F.lit(tau + eps)
    clearly_unique = F.col("__maxc").isNull() | (
        F.col("__maxc") < F.lit(tau - eps)
    )
    bad_kept = F.col("kept") & ~F.col("cell_capped") & clearly_dup
    bad_dropped = ~F.col("kept") & clearly_unique
    out = joined.where(bad_kept | bad_dropped).select(
        F.col("__id").alias(id_col),
        "kept",
        F.col("__maxc").alias("max_earlier_cosine"),
    )
    # materialize (tiny — must be empty on any valid input), then release
    # the persisted embedding assignment (ADVICE r05 cache leak)
    out = out.localCheckpoint(eager=True)
    idx.unpersist()
    return out
