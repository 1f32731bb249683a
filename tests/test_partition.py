"""Hidden partitioning (Iceberg-style partition transforms) on the native
table format: writes cluster on transformed values, scans on the SOURCE
column prune whole files driver-side (dff/tablefmt.py)."""

from __future__ import annotations

import datetime
import zlib

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import Table, _transform_value


def _ids(spark, n=2000):
    return (
        spark.range(n)
        .withColumn("k", F.col("id").cast("string"))
        .withColumn("grp", F.concat(F.lit("g"), (F.col("id") % 7).cast("string")))
    )


def test_bucket_point_lookup_opens_one_file_in_n(spark, tmp_path):
    df = _ids(spark)
    t = Table.create(
        str(tmp_path / "b"), df.schema, partition_spec=[("k", "bucket", 8)]
    )
    t.append(df)
    assert t.scan_file_count() == 8  # one file per bucket
    flt = [("k", "=", "42")]
    assert t.scan_file_count(flt) == 1
    got = t.scan(spark, filters=flt).collect()
    assert [r["id"] for r in got] == [42]
    # the pruned bucket is the crc32 bucket of the value
    assert zlib.crc32(b"42") % 8 == zlib.crc32(b"42") % 8  # driver twin


def test_bucket_in_list_prunes_to_value_buckets(spark, tmp_path):
    df = _ids(spark)
    t = Table.create(
        str(tmp_path / "bi"), df.schema, partition_spec=[("k", "bucket", 8)]
    )
    t.append(df)
    vals = ["1", "2", "3"]
    buckets = {zlib.crc32(v.encode()) % 8 for v in vals}
    flt = [("k", "in", vals)]
    assert t.scan_file_count(flt) == len(buckets)
    assert sorted(r["id"] for r in t.scan(spark, filters=flt).collect()) == [1, 2, 3]


def test_day_partition_range_scan(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    df = spark.range(240).select(
        F.col("id"),
        (
            F.lit(base)
            + F.make_interval(hours=F.col("id").cast("int"))
        ).alias("ts"),
    )
    t = Table.create(
        str(tmp_path / "d"), df.schema, partition_spec=[("ts", "day")]
    )
    t.append(df)
    assert t.scan_file_count() == 10  # 240 hours = 10 days
    flt = [
        ("ts", ">=", datetime.datetime(2024, 1, 3)),
        ("ts", "<", datetime.datetime(2024, 1, 5)),
    ]
    assert t.scan_file_count(flt) == 2
    got = t.scan(spark, filters=flt)
    assert got.count() == 48
    assert got.agg(F.min("ts"), F.max("ts")).collect()[0] == (
        datetime.datetime(2024, 1, 3),
        datetime.datetime(2024, 1, 4, 23),
    )


def test_truncate_string_prefix_partition(spark, tmp_path):
    df = _ids(spark, 500).withColumn(
        "grp", F.concat(F.lit("team-"), (F.col("id") % 4).cast("string"))
    )
    t = Table.create(
        str(tmp_path / "tr"),
        df.schema,
        partition_spec=[("grp", "truncate", 6)],
    )
    t.append(df)
    flt = [("grp", "=", "team-2")]
    assert t.scan_file_count(flt) == 1
    assert t.scan(spark, filters=flt).count() == 125


def test_identity_partition_and_null_partition_prunes(spark, tmp_path):
    df = _ids(spark, 700).withColumn(
        "grp",
        F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("grp")),
    )
    t = Table.create(
        str(tmp_path / "i"), df.schema, partition_spec=[("grp", "identity")]
    )
    t.append(df)
    assert t.scan_file_count() == 7  # g1..g6 + null partition
    flt = [("grp", "=", "g3")]
    assert t.scan_file_count(flt) == 1  # null partition pruned too
    assert t.scan(spark, filters=flt).count() == 100


def test_rewrites_preserve_partitioning(spark, tmp_path):
    """COW delete and merge route through the partitioned writer, so the
    rewritten files keep their partition tuples and stay prunable."""
    df = _ids(spark)
    t = Table.create(
        str(tmp_path / "rw"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    t.delete_where(spark, [("id", "<", 100)])
    assert all("partition" in e for e in t.entries())
    assert t.scan_file_count([("k", "=", "500")]) == 1
    got = t.scan(spark, filters=[("k", "=", "500")]).collect()
    assert [r["id"] for r in got] == [500]
    assert t.scan(spark).count() == 1900


def test_transform_value_twins_match_spark(spark, tmp_path):
    """Driver-side _transform_value must agree with the Spark expression
    for every transform — pruning correctness rests on this."""
    df = spark.range(50).select(
        F.col("id"),
        F.col("id").cast("string").alias("s"),
        (
            F.lit(datetime.datetime(2024, 3, 1))
            + F.make_interval(hours=(F.col("id") * 7).cast("int"))
        ).alias("ts"),
    )
    specs = [
        {"col": "id", "transform": "truncate", "param": 10, "type": "bigint"},
        {"col": "s", "transform": "bucket", "param": 16, "type": "string"},
        {"col": "s", "transform": "truncate", "param": 1, "type": "string"},
        {"col": "ts", "transform": "day", "param": None, "type": "timestamp"},
        {"col": "ts", "transform": "month", "param": None, "type": "timestamp"},
        {"col": "ts", "transform": "hour", "param": None, "type": "timestamp"},
    ]
    from dff.tablefmt import _transform_expr

    rows = df.select(
        "id", "s", "ts", *[_transform_expr(s).alias(f"t{i}") for i, s in enumerate(specs)]
    ).collect()
    for r in rows:
        for i, s in enumerate(specs):
            assert r[f"t{i}"] == _transform_value(s, r[s["col"]]), (s, r)


def test_bad_specs_rejected(spark, tmp_path):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        Table.create(str(tmp_path / "x1"), df.schema, partition_spec=[("nope", "identity")])
    with pytest.raises(ValueError):
        Table.create(str(tmp_path / "x2"), df.schema, partition_spec=[("k", "bucket")])
    with pytest.raises(ValueError):
        Table.create(str(tmp_path / "x3"), df.schema, partition_spec=[("k", "day")])
    with pytest.raises(ValueError):
        Table.create(str(tmp_path / "x4"), df.schema, partition_spec=[("id", "frob", 2)])
