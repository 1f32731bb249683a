"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode/feature plumbing.

The decode step itself is STUBBED (this container has no image/audio
libraries — see ``decode_image``); everything Spark-side is real and
tested: the schema, the ``mapInPandas`` batch shape, partitioning, and a
deterministic fake feature extractor so downstream operators (ANN over
features, dedup over perceptual hashes) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("media", T.BinaryType(), True),       # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payload = unhexed sha chunks."""
    kind = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.unhex(
        F.concat(
            *[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{seed}:{i}")), 256)
                for i in range(4)
            ]
        )
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("media"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit("w")), 1920) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit("h")), 1080) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit("d")), 60000) + 1).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def decode_image(data: bytes) -> np.ndarray:
    """Real image decode — requires an imaging library absent from this
    container.  The Spark plumbing around it is real; swap this body for
    PIL/cv2 in production."""
    raise NotImplementedError(
        "image decoding requires an imaging library (PIL/cv2) not present "
        "in this environment; use fake_features() for plumbing tests"
    )


def fake_features(data: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decode+embed step: sha256-seeded floats."""
    if data is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.sha256(data).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw / np.float64(2**32)).astype(np.float32)


def extract_features(
    df: DataFrame, dim: int = 16, batch_hook=None
) -> DataFrame:
    """``mapInPandas`` feature extraction over the binary column.

    Batches stream through Arrow; the per-batch work is vectorizable numpy
    (here the deterministic fake; in production the decoder).  ``batch_hook``
    lets tests observe batch shapes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_hook is not None:
                batch_hook(len(pdf))
            feats = [fake_features(b, dim) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["media"].map(lambda b: 0 if b is None else len(b)),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame
    timestamp (decode stubbed).  Expression-only — the expensive explode
    happens before any Python, so Spark sizes partitions on frames."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )
