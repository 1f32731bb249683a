"""dff.layout: Z-order clustering — row preservation, multi-dimensional
file skipping vs a single-column sort, quantile bucketing under skew, and
Morton-code unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.layout import file_stats, prunable_fraction, zorder_write, zvalue

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_zvalue_interleaves_bits(spark):
    # bits=2, two cols: z = y1x1 y0x0 (col order = bit offset j)
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x int, y int"
    )
    # identity bucketing: values already span [0,3] => linear keeps order
    z = [
        r["z"]
        for r in df.select(zvalue(df, ["x", "y"], bits=2).alias("z"))
        .orderBy("z")
        .collect()
    ]
    # x=0,y=0 -> 0; x=3,y=3 -> 15; x=3,y=0 -> 0b0101=5; x=0,y=3 -> 0b1010=10
    # x=1,y=2 -> x bits (1,0) y bits (0,1) -> 0b1001=9
    assert sorted(z) == [0, 5, 9, 10, 15]


def test_zvalue_validations(spark):
    df = spark.createDataFrame([(1, 1.0)], "a int, b double")
    with pytest.raises(ValueError):
        zvalue(df, [])
    with pytest.raises(ValueError):
        zvalue(df, ["a", "b"], bits=40)
    with pytest.raises(ValueError):
        zvalue(df, ["a"], method="bogus")


def test_zorder_write_preserves_rows(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "z")
    zorder_write(e, ["user_id", "value"], path, n_files=8)
    z = spark.read.parquet(path)
    cols = e.columns
    assert sorted(z.columns) == sorted(cols)  # helper column dropped
    a = e.select(*cols).exceptAll(z.select(*cols)).count()
    b = z.select(*cols).exceptAll(e.select(*cols)).count()
    assert a == 0 and b == 0


def test_zorder_prunes_both_dims_sorted_prunes_one(spark, tmp_path):
    e = _events(spark)
    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(e, ["user_id", "value"], zp, n_files=16)
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sp)
    )
    zs = file_stats(spark, zp, ["user_id", "value"])
    ss = file_stats(spark, sp, ["user_id", "value"])
    # single-column sort: great on user_id, useless on value
    assert prunable_fraction(ss, "user_id", 10, 12) > 0.5
    assert prunable_fraction(ss, "value", 5.0, 6.0) == 0.0
    # z-order: good on BOTH
    assert prunable_fraction(zs, "user_id", 10, 12) > 0.4
    assert prunable_fraction(zs, "value", 5.0, 6.0) > 0.0


def test_quantile_buckets_spread_skew(spark):
    # 99% of mass at tiny values + a huge tail: linear bucketing collapses
    # the bulk into bucket 0; quantile bucketing spreads it
    rows = [(i, 0.001 * (i % 100)) for i in range(2000)] + [
        (9000 + i, 1e9 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    lin = df.select(zvalue(df, ["v"], bits=4, method="linear").alias("z"))
    qnt = df.select(zvalue(df, ["v"], bits=4, method="quantile").alias("z"))
    assert lin.distinct().count() <= 3  # bulk collapsed
    assert qnt.distinct().count() >= 10  # equi-depth spread


def test_file_stats_and_null_handling(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 1.0), (5, None), (3, 2.0)], "a int, v double"
    )
    path = str(tmp_path / "n")
    zorder_write(df, ["a", "v"], path, n_files=1)
    st = file_stats(spark, path, ["a", "v"]).collect()
    assert len(st) == 1 and st[0]["rows"] == 3
    assert st[0]["a_min"] == 3 and st[0]["a_max"] == 5
