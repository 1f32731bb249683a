"""Per-row invariant (BASELINE.json input_hint): the engine's
``F.sha2(content, 256)`` must equal hashlib sha256 for every row."""

from __future__ import annotations

from pyspark.sql import functions as F

from dff.sources import synthetic_source_files
from tests.oracle import oracle_sha256


def test_sha256_equality(spark):
    df = synthetic_source_files(spark, 1000, n_repos=50, seed=42)
    pdf = (
        df.select("row_id", "content", F.sha2("content", 256).alias("engine_sha"))
        .toPandas()
        .sort_values("row_id")
    )
    oracle = oracle_sha256(pdf, "content")
    assert (pdf["engine_sha"] == oracle).all()
