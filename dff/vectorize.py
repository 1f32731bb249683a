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

    # r6 realization — MAP-ONLY, zero shuffles (guide §2.4): a document's
    # tokens live in its own row, so the whole vector is a per-row
    # computation.  Token bucket/sign hashing stays JVM-side (xxhash64 via
    # ``transform`` over the split array); the dense scatter is one numpy
    # ``bincount`` per row inside an Arrow-batched UDF.  The old plan
    # shuffled every (doc, bucket) cell through groupBy(doc, bucket) ->
    # groupBy(doc) -> anti-join for empty docs — two full exchanges plus a
    # scan-sized anti join, none of which the computation needs.  Summing
    # ±1.0 in float64 is exact, so the result is bit-identical.
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda t: t != ""
    )
    bucket_arr = F.transform(
        toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)).cast("int")
    )
    sign_arr = (
        F.transform(
            toks,
            lambda t: F.when(
                F.pmod(F.xxhash64(t, F.lit(1)), F.lit(2)) == 0, 1.0
            ).otherwise(-1.0),
        )
        if signed
        else F.transform(toks, lambda t: F.lit(1.0))
    )

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    do_norm = normalize

    # NOTE: no type annotations — `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inference rejects that
    @pandas_udf("array<double>")
    def _scatter(bs, vs):
        zeros = np.zeros(dim, dtype=np.float64)
        out = []
        for b, v in zip(bs, vs):
            if b is None or len(b) == 0:
                out.append(zeros)
                continue
            a = np.bincount(
                np.asarray(b, dtype=np.int64),
                weights=np.asarray(v, dtype=np.float64),
                minlength=dim,
            )
            if do_norm:
                n = np.linalg.norm(a)
                if n > 0:
                    a = a / n
            out.append(a)
        return pd.Series(out)

    # store the arrays, then double-reference them so the lambda-bearing
    # expressions stay OUT of the UDF argument (CollapseProject would
    # otherwise inline them — see dff/dedup.py minhash_dedup_pairs for the
    # Spark planner edge this avoids)
    return docs.select(
        F.col(id_col), bucket_arr.alias("__b"), sign_arr.alias("__s")
    ).select(
        id_col,
        F.when(
            # always-true guard (NULL-array size coalesced): its purpose is
            # the second reference to __b, not filtering
            F.coalesce(F.size("__b"), F.lit(-1)) >= F.lit(-1),
            _scatter("__b", "__s"),
        ).alias("embedding"),
    )
