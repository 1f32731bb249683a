"""Feature-hashing document vectors (the "hashing trick").

A training-data pipeline often needs A vector per document before any
model exists — for near-dup blocking, diversity sampling, clustering, or
as the input to :mod:`dff.similarity`'s ANN.  Signed feature hashing
(Weinberger et al., ICML'09) gives one with zero vocabulary state: token
``t`` adds ``±1`` (sign from an independent hash bit) at index
``xxhash64(t) mod dim``, and inner products of the hashed vectors are
unbiased estimators of the token-count inner products.

Everything JVM-side: tokenize/explode -> one (doc, bucket) aggregation
(map-side combined, shuffle ∝ docs x min(tokens, dim)) -> dense array
assembly via ``map_from_entries`` + ``transform(sequence(...))`` (O(dim)
per doc, no Python).  The output column is ``array<double>`` — exactly
the shape ``dff.similarity.brute_force_topk`` / ``IvfIndex`` and
``dff.dedup.embedding_near_dup_pairs`` consume, so text similarity search
runs end-to-end without any external model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .relevance import TOKEN_SPLIT

__all__ = ["hashing_vectorize"]


def hashing_vectorize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 128,
    pattern: str = TOKEN_SPLIT,
    signed: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """``(id, embedding: array<double>)`` — one hashed vector per document.

    ``signed`` flips each token's contribution by an independent hash bit
    (kills the positive bias of collisions); ``normalize`` L2-normalizes so
    downstream cosine is a plain dot product.  Documents with no tokens
    get the zero vector (and stay un-normalized).
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), pattern)).alias("term"),
    ).where(F.col("term") != "")
    bucket = F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int")
    sign = (
        F.when(F.pmod(F.xxhash64("term", F.lit(1)), F.lit(2)) == 0, 1.0).otherwise(
            -1.0
        )
        if signed
        else F.lit(1.0)
    )
    cells = (
        toks.select(id_col, bucket.alias("bucket"), sign.alias("s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").alias("v"))
    )
    pairs = cells.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0.0)
        ),
    )
    out = pairs.withColumn("__vec", dense)
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.col("__vec"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        out = out.withColumn(
            "__vec",
            F.when(
                norm > 0,
                F.transform(F.col("__vec"), lambda x: x / norm),
            ).otherwise(F.col("__vec")),
        )
    # docs with zero tokens never reach `cells`; re-attach them as zeros
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0))
    empty = (
        docs.select(id_col)
        .join(pairs.select(id_col), id_col, "left_anti")
        .withColumn("__vec", zeros)
    )
    return (
        out.select(id_col, F.col("__vec").alias("embedding"))
        .unionByName(empty.select(id_col, F.col("__vec").alias("embedding")))
    )
