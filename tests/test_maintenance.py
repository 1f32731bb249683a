"""Small-file compaction: fewer files, identical data, crash-safe swap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dff.maintenance import compact_parquet_dir, data_file_count


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 64 fragments of ~300 rows each — the post-ingest shape
    spark.range(20000).select(
        "id", (F.col("id") % 97).alias("k")
    ).repartition(64).write.parquet(path)
    assert data_file_count(path) >= 64
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id").alias("s"), F.count("*").alias("n")).first()

    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 20)
    assert n < 8, n
    after = spark.read.parquet(path)
    after_sum = after.agg(F.sum("id").alias("s"), F.count("*").alias("n")).first()
    assert (before_sum["s"], before_sum["n"]) == (after_sum["s"], after_sum["n"])
    # no staging/backup leftovers
    leftovers = [
        d for d in os.listdir(tmp_path)
        if d.startswith(".compact-") or ".old-" in d
    ]
    assert leftovers == []


def test_compaction_sort_cols_and_validation(spark, tmp_path):
    path = str(tmp_path / "srt")
    spark.range(5000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("v")
    ).repartition(16).write.parquet(path)
    compact_parquet_dir(
        spark, path, target_file_bytes=64 << 20, sort_cols=["user_id"]
    )
    # single output file, sorted within it
    got = spark.read.parquet(path).select("user_id").collect()
    vals = [r["user_id"] for r in got]
    assert vals == sorted(vals)
    with pytest.raises(ValueError, match="positive"):
        compact_parquet_dir(spark, path, target_file_bytes=0)


def test_failed_swap_rolls_back_to_original(spark, tmp_path, monkeypatch):
    """If the staging->path rename fails, the original directory must be
    restored (ADVICE r04: the dataset may never vanish mid-swap)."""
    import dff.maintenance as m

    path = str(tmp_path / "ds")
    spark.range(1000).repartition(4).write.parquet(path)
    real_rename = os.rename

    def failing_rename(src, dst):
        if ".compact-" in src:  # the staging->path swap step
            raise OSError("simulated rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(m.os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated"):
        compact_parquet_dir(spark, path, target_file_bytes=64 << 20)
    monkeypatch.undo()
    # original dataset is back at path, intact
    assert spark.read.parquet(path).count() == 1000
