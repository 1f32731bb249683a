"""Managed-table sink, temp views, and drop-table — the catalog surface.

The reference persists results as managed tables and registers temp views
for downstream SQL (/root/reference/01_dff_model.py:437,456,474,481-485:
``saveAsTable("silver_fraud_shap_values")``, ``createOrReplaceTempView``,
``drop table if exists``).  This module is the Spark-native twin, with two
scale choices the notebook doesn't need:

- results tables are written **bucketed** on the join key, so downstream
  equi-joins/aggs on that key are shuffle-free (bucket-pruned, co-located);
- ``createOrReplace`` drops + recreates atomically-enough for a batch
  engine (Iceberg ``writeTo(...).createOrReplace()`` on a real catalog;
  the sandbox metastore realizes it as drop-if-exists + saveAsTable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucket_cols:
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(name)


def register_view(df: DataFrame, name: str) -> None:
    """Temp-view registration (01_dff_model.py:437,456) so rule authors can
    address intermediate results from plain SQL."""
    df.createOrReplaceTempView(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """``drop table if exists`` (01_dff_model.py:474)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)
