"""Per-file Bloom skipping (dff/tablefmt.py bloom_cols): point lookups on
a high-cardinality UNCLUSTERED column — where every file's min/max spans
the probe and stats prune nothing — open ~one file via the manifest
blooms; range operators and absent blooms never prune."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import Table


@pytest.fixture(scope="module")
def tbl(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom") / "t")
    # uid is hash-scattered: every file's [min,max] spans any probe
    df = spark.range(0, 20000).select(
        F.col("id"),
        F.xxhash64("id").alias("uid"),
    )
    t = Table.create(root, df.schema, bloom_cols=["uid"])
    for r in range(8):
        t.append(df.where(F.col("id") % 8 == r), n_files=1)
    return t


def _uid_of(spark, tbl, i):
    return (
        spark.range(i, i + 1).select(F.xxhash64("id").alias("u")).first().u
    )


def test_point_lookup_opens_few_files(spark, tbl):
    u = _uid_of(spark, tbl, 12345)
    n = tbl.scan_file_count(filters=[("uid", "=", u)])
    assert n <= 2  # 1 true file + <=1 false positive out of 8
    rows = tbl.scan(spark, filters=[("uid", "=", u)]).collect()
    assert len(rows) == 1 and rows[0].id == 12345


def test_absent_value_prunes_everything_or_fp(spark, tbl):
    # a value never written: only bloom false positives can keep files
    n = tbl.scan_file_count(filters=[("uid", "=", -12345)])
    assert n <= 1
    assert tbl.scan(spark, filters=[("uid", "=", -12345)]).count() == 0


def test_in_list_unions_blooms(spark, tbl):
    us = [_uid_of(spark, tbl, i) for i in (0, 1, 2)]  # 3 distinct files
    n = tbl.scan_file_count(filters=[("uid", "in", tuple(us))])
    assert 3 <= n <= 5
    got = tbl.scan(spark, filters=[("uid", "in", tuple(us))]).count()
    assert got == 3


def test_range_ops_ignore_blooms(spark, tbl):
    # blooms cannot answer ranges; stats can't prune scattered uid either
    assert tbl.scan_file_count(filters=[("uid", ">", 0)]) == 8


def test_distributed_planner_parity_with_blooms(spark, tbl):
    u = _uid_of(spark, tbl, 777)
    for filters in (
        [("uid", "=", u)],
        [("uid", "=", -1)],
        [("uid", "in", (u, -1))],
    ):
        driver = tbl.scan_file_count(filters=filters)
        dist = len(tbl.plan_files_distributed(spark, filters))
        assert dist == driver, filters


def test_rewrites_preserve_bloom_cols(spark, tbl):
    # COW delete rewrites files through _materialize: new entries carry
    # fresh blooms (inherited bloom_cols), so pruning survives rewrites
    t = tbl
    t.delete_where(spark, [("id", "=", 19999)])
    rewritten = [e for e in t.entries() if "blooms" in e]
    assert len(rewritten) == len(t.entries())
    u = _uid_of(spark, t, 12345)
    assert t.scan_file_count(filters=[("uid", "=", u)]) <= 2


def test_bloom_numeric_coercion(spark, tmp_path):
    """A probe of int 7 must find a stored double 7.0 — blooms may never
    be stricter than the coercing stats comparison."""
    from pyspark.sql import types as T

    from dff.tablefmt import Table

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 1.0).alias("x")
    )
    t = Table.create(str(tmp_path / "t"), df.schema, bloom_cols=["x"])
    t.append(df, n_files=1)
    assert t.scan_file_count(filters=[("x", "=", 7)]) == 1  # int probe
    assert t.scan(spark, filters=[("x", "=", 7)]).count() == 1
    assert t.scan(spark, filters=[("x", "=", 7.5)]).count() == 0
