"""Type safety at the append boundary (dff/tablefmt.py::_aligned): exact
safe widenings cast silently so every data file carries the table's
physical type; lossy or nonsensical mismatches raise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from dff.tablefmt import Table


def _tbl(spark, tmp_path, dtype):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("x", dtype)]
    )
    return Table.create(str(tmp_path / "t"), schema)


def test_safe_widening_casts_at_write(spark, tmp_path):
    t = _tbl(spark, tmp_path, T.DoubleType())
    t.append(
        spark.range(0, 5).withColumn("x", F.col("id").cast("int")), n_files=1
    )
    df = t.scan(spark)
    assert dict(df.dtypes)["x"] == "double"
    assert df.agg(F.sum("x")).first()[0] == 10.0
    # the FILE itself carries double, not int
    import pyarrow.parquet as pq
    import os

    e = t.entries()[0]
    phys = pq.ParquetFile(os.path.join(t.root, e["path"])).schema_arrow
    assert str(phys.field("x").type) == "double"


def test_lossy_narrowing_raises(spark, tmp_path):
    t = _tbl(spark, tmp_path, T.IntegerType())
    with pytest.raises(ValueError, match="safely widen"):
        t.append(spark.range(0, 5).withColumn("x", F.col("id")), n_files=1)


def test_precision_losing_promotion_raises(spark, tmp_path):
    # long -> double loses exactness past 2^53: refused, not silently cast
    t = _tbl(spark, tmp_path, T.DoubleType())
    with pytest.raises(ValueError, match="safely widen"):
        t.append(spark.range(0, 5).withColumn("x", F.col("id")), n_files=1)


def test_string_numeric_mismatch_raises(spark, tmp_path):
    t = _tbl(spark, tmp_path, T.LongType())
    with pytest.raises(ValueError, match="safely widen"):
        t.append(
            spark.range(0, 5).withColumn("x", F.lit("7")), n_files=1
        )
