"""Managed-table sink, temp views, and drop-table — the catalog surface.

The reference persists results as managed tables and registers temp views
for downstream SQL (/root/reference/01_dff_model.py:437,456,474,481-485:
``saveAsTable("silver_fraud_shap_values")``, ``createOrReplaceTempView``,
``drop table if exists``).  This module is the Spark-native twin, with two
scale choices the notebook doesn't need:

- results tables are written **bucketed** on the join key, so downstream
  equi-joins/aggs on that key are shuffle-free (bucket-pruned, co-located);
- replace is STAGED (write to ``__stg``, then drop + rename): a failed
  write never loses the existing table.  On a real lakehouse catalog the
  drop->rename pair collapses to Iceberg ``writeTo(...).createOrReplace()``
  (one atomic snapshot commit).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quote(name: str) -> str:
    """Validate + backtick-quote a (possibly dotted) table identifier so it
    can't smuggle SQL into the DROP/RENAME statements."""
    parts = name.split(".")
    if not all(_IDENT.match(p) for p in parts):
        raise ValueError(f"invalid table identifier: {name!r}")
    return ".".join(f"`{p}`" for p in parts)


def save_managed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | None = None,
    n_buckets: int = 16,
    partition_cols: list[str] | None = None,
) -> None:
    """``saveAsTable`` with optional bucketing/partitioning.

    Bucketing on the primary join/agg key means every later
    ``spark.table(name).groupBy(key)`` or self-join on the key reads
    pre-shuffled data: the Exchange disappears from those plans (asserted
    in tests/test_catalog.py).

    Staged replace: the data is written to ``{name}__stg`` FIRST, and only
    after the write succeeds is the target dropped and the staging table
    renamed in.  A failed write therefore leaves the existing table intact
    (the round-2 drop-then-write realization lost it).  The drop->rename
    window is two metastore calls — not atomic; a real lakehouse catalog
    collapses it to Iceberg/Delta ``createOrReplace`` (single snapshot
    commit), which this sandbox's Hive-less metastore cannot express.
    """
    spark = df.sparkSession
    target = _quote(name)
    staging_raw = f"{name}__stg"
    staging = _quote(staging_raw)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucket_cols:
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(staging_raw)
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")


def register_view(df: DataFrame, name: str) -> None:
    """Temp-view registration (01_dff_model.py:437,456) so rule authors can
    address intermediate results from plain SQL."""
    df.createOrReplaceTempView(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """``drop table if exists`` (01_dff_model.py:474)."""
    spark.sql(f"DROP TABLE IF EXISTS {_quote(name)}")


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)
