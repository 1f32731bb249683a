"""CDC replication (dff/cdc.py::apply_changes): the target must equal
the source after replaying any mix of operations, re-runs must no-op,
and incremental catch-up must continue from a checkpointed version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.cdc import apply_changes
from dff.tablefmt import Table

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def pair(spark, tmp_path):
    src = Table.create(str(tmp_path / "src"), SCHEMA, change_feed=True)
    dst = Table.create(str(tmp_path / "dst"), SCHEMA)
    return src, dst


def rows(t, spark):
    return sorted(
        (r["k"], r["grp"], r["v"]) for r in t.scan(spark).collect()
    )


def test_replicates_mixed_operations(spark, pair):
    src, dst = pair
    src.append(frame(spark, 0, 50), n_files=2)
    src.delete_where(spark, [("k", "between", (5, 9))])
    src.update_where(spark, [("k", "=", 20)], {"v": "-1.0"})
    src.merge_upsert(
        spark,
        spark.range(48, 55).select(
            F.col("id").alias("k"),
            F.lit("m").alias("grp"),
            F.lit(7.0).alias("v"),
        ),
        ["k"],
    )
    src.delete_matching_mor(
        spark, spark.createDataFrame([(30,), (31,)], "k long"), ["k"]
    )
    out = apply_changes(spark, src, dst, ["k"], since_version=0)
    assert out["applied"] >= 4
    assert rows(dst, spark) == rows(src, spark)


def test_rerun_is_noop_and_incremental_catchup(spark, pair):
    src, dst = pair
    v1 = src.append(frame(spark, 0, 20), n_files=1)
    src.update_where(spark, [("k", "<", 3)], {"v": "0.0"})
    out1 = apply_changes(spark, src, dst, ["k"], since_version=0)
    assert rows(dst, spark) == rows(src, spark)
    dst_v = dst._latest_version()
    # replaying the same range: idempotency keys swallow the upserts
    out2 = apply_changes(spark, src, dst, ["k"], since_version=0)
    assert rows(dst, spark) == rows(src, spark)
    # the upsert commits were no-ops (only harmless re-tombstones land)
    assert dst.scan(spark).count() == src.scan(spark).count()
    # catch-up from the checkpointed last_version
    src.delete_where(spark, [("k", "=", 10)])
    out3 = apply_changes(
        spark, src, dst, ["k"], since_version=out1["last_version"]
    )
    assert out3["applied"] == 1
    assert rows(dst, spark) == rows(src, spark)


def test_overwrite_replicates(spark, pair):
    src, dst = pair
    src.append(frame(spark, 0, 10), n_files=1)
    apply_changes(spark, src, dst, ["k"], since_version=0)
    src.overwrite(frame(spark, 100, 105))
    apply_changes(spark, src, dst, ["k"], since_version=1)
    assert rows(dst, spark) == rows(src, spark)
    assert dst.scan(spark).count() == 5
