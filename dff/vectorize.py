"""Feature-hashing document vectors (the "hashing trick").

A training-data pipeline often needs A vector per document before any
model exists — for near-dup blocking, diversity sampling, clustering, or
as the input to :mod:`dff.similarity`'s ANN.  Signed feature hashing
(Weinberger et al., ICML'09) gives one with zero vocabulary state: token
``t`` adds ``±1`` (sign from an independent hash bit) at index
``xxhash64(t) mod dim``, and inner products of the hashed vectors are
unbiased estimators of the token-count inner products.

Hot path: tokenize/explode -> one (doc, bucket) aggregation (map-side
combined, shuffle ∝ docs x min(tokens, dim)) -> dense scatter via an
Arrow-batched pandas UDF (``np.zeros(dim); out[buckets] = values`` per
row).  The scatter is deliberately NOT Catalyst: a ``map_from_entries`` +
``transform(sequence(0, dim-1), i -> element_at(map, i))`` realization is
O(dim^2) per document because Spark maps are entry arrays with linear-
scan lookup — measured 4x slower end-to-end at 200k docs x dim=128 than
the numpy scatter.  The output column is ``array<double>`` — exactly the
shape ``dff.similarity.brute_force_topk`` / ``IvfIndex`` and
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
        F.collect_list(F.struct("bucket", "v")).alias("__e")
    ).select(
        id_col,
        F.col("__e.bucket").alias("__b"),
        F.col("__e.v").alias("__v"),
    )

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    do_norm = normalize

    # NOTE: no type annotations — `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inference rejects that
    @pandas_udf("array<double>")
    def _scatter(bs, vs):
        out = []
        for b, v in zip(bs, vs):
            a = np.zeros(dim, dtype=np.float64)
            if b is not None and len(b):
                a[np.asarray(b, dtype=np.int64)] = np.asarray(
                    v, dtype=np.float64
                )
                if do_norm:
                    n = np.linalg.norm(a)
                    if n > 0:
                        a /= n
            out.append(a)
        return pd.Series(out)

    out = pairs.withColumn("__vec", _scatter("__b", "__v")).drop("__b", "__v")
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
