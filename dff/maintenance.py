"""Table maintenance: small-file compaction for parquet directories.

Streaming ingestion and per-partition checkpoint appends leave thousands
of kilobyte files; at crawl scale the NameNode/object-store listing and
per-file open costs dominate reads long before data volume does.  This
is the OPTIMIZE/rewrite-data-files maintenance pass (Iceberg/Delta call
it compaction) for the plain-parquet stand-in this sandbox uses.

The rewrite is staged-then-swapped with the same crash-safety contract as
``dff.checkpoint``: data lands in a hidden ``.compact-*`` staging dir
first and is only swapped into place after the write fully succeeds, so
a mid-compaction crash leaves the original directory untouched.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet") and not f.startswith("."))
    return n


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ``ceil(bytes / target_file_bytes)`` files
    (returns the new file count).  ``sort_cols`` additionally sorts
    within partitions so parquet row-group min/max stats prune reads on
    those columns afterwards.

    Local-FS staging/swap here; on a real lakehouse this maps to
    Iceberg's rewrite-data-files action, which swaps file sets in one
    snapshot commit instead of a directory rename.

    Swap-window contract (ADVICE r04): any failure BEFORE the first
    rename leaves the original untouched (staging is hidden).  The swap
    itself is two renames; if the second fails the first is rolled back
    (backup -> path), so callers always find the dataset at ``path``.
    The unrecoverable case is the process dying BETWEEN the renames —
    that window is two metadata ops wide and the data survives intact
    under the adjacent ``<path>.old-*`` name; a real table format closes
    even that window with an atomic pointer commit."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    n_files = max(1, -(-dir_bytes(path) // target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    parent = os.path.dirname(os.path.abspath(path))
    staging = os.path.join(parent, f".compact-{uuid.uuid4().hex}")
    out.write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + f".old-{uuid.uuid4().hex}"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(backup, path)  # roll the swap back: dataset never vanishes
        raise
    shutil.rmtree(backup)
    return data_file_count(path)
