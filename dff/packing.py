"""Sequence packing: lay documents into fixed-length training contexts.

Pretraining consumes a corpus as a token STREAM chopped into fixed-size
contexts (e.g. 4096 tokens): documents are concatenated in a shuffled
order and the stream is split every ``seq_len`` tokens, so a document may
straddle context boundaries.  The pipeline question this module answers
is the layout: for every document, WHICH context does it start in, at
what offset, and how many contexts does it span — plus per-context fill
statistics (how much of each context is a single document vs. stitched).

Reference scope: beyond the reference engine (which validates rows, not
corpus layout); part of the training-data surface next to
:mod:`dff.mixing` and :mod:`dff.sampling`.

Determinism and scale (100 TB):

- The stream order is NOT a global sort.  Each row hashes to one of
  ``n_shards`` independent streams (a training run reads shards in
  parallel anyway), and within a shard rows are ordered by the same
  content hash — a deterministic shuffle, stable under repartitioning
  and replayable in any engine with ``md5``.
- Layout is ONE window aggregate per shard (running token sum), so the
  only shuffle moves (key, token_count) pairs; document text never
  moves.  Shards bound window-partition size: at 10^9 docs and 4096
  shards a shard holds ~250k rows — comfortably one task.
- Everything downstream (which context ids exist, fill fraction,
  boundary-crossing counts) is plain arithmetic on the running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dff.sampling import uniform_hash


def pack_sequences(
    df: DataFrame,
    token_col: str,
    seq_len: int,
    key_cols: list[str],
    n_shards: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Adds columns:

    - ``shard``       — which of the ``n_shards`` independent streams
    - ``start_off``   — token offset of the document within its shard's
      stream (exclusive running sum in deterministic-shuffle order)
    - ``ctx_id``      — index of the fixed-``seq_len`` context the
      document STARTS in (``start_off // seq_len``)
    - ``ctx_off``     — offset within that context
    - ``n_ctx``       — how many contexts the document spans (a short doc
      spans 1; a doc crossing a boundary spans 2+)

    Zero-token documents are dropped (they occupy no stream space).
    Rows with NULL ``token_col`` are dropped likewise — a layout cannot
    place a document of unknown length; count them upstream.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    # the dff/sampling.py md5 contract: same expression, same DuckDB replay
    h = uniform_hash(key_cols, seed)
    base = (
        df.where(F.col(token_col).cast("long") > 0)
        .withColumn("__h", h)
        .withColumn(
            "shard", F.floor(F.col("__h") * F.lit(float(n_shards))).cast("int")
        )
    )
    # deterministic within-shard order: the hash, key columns as tie-break
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h"), *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tokens = F.col(token_col).cast("long")
    cum = F.sum(tokens).over(w)
    return (
        base.withColumn("start_off", cum - tokens)
        .withColumn("ctx_id", F.floor(F.col("start_off") / F.lit(seq_len)))
        .withColumn("ctx_off", F.col("start_off") % F.lit(seq_len))
        .withColumn(
            "n_ctx",
            F.floor((F.col("start_off") + tokens - F.lit(1)) / F.lit(seq_len))
            - F.col("ctx_id")
            + F.lit(1),
        )
        .drop("__h")
    )


def context_fill(
    packed: DataFrame, token_col: str, seq_len: int
) -> DataFrame:
    """Per-context fill report from a :func:`pack_sequences` layout:
    for every (shard, ctx_id) that any document STARTS in, the number of
    documents starting there and the tokens they contribute to THIS
    context (clipped at the boundary).  The final partial context of a
    shard shows fill < seq_len; every other gap is carry-in from a
    boundary-crossing predecessor.  One groupBy over (shard, ctx_id) —
    aggregate rows only."""
    tokens = F.col(token_col).cast("long")
    in_this = F.least(tokens, F.lit(seq_len) - F.col("ctx_off"))
    return (
        packed.withColumn("__in_this", in_this)
        .groupBy("shard", "ctx_id")
        .agg(
            F.count(F.lit(1)).alias("docs_starting"),
            F.sum("__in_this").alias("tokens_started_here"),
        )
    )
