"""Partition spec evolution (dff/tablefmt.py::evolve_partition_spec):
a metadata-only commit changes how FUTURE writes partition; every
existing file keeps pruning under the spec it was written with (entries
carry spec_id), so repartitioning a 100 TB table rewrites nothing."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import Table


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn(
        "k", (F.col("id") % 40).cast("long")
    )


def _bucket(v, n):
    return zlib.crc32(str(v).encode()) % n


def test_evolution_is_metadata_only(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    files = {e["path"] for e in t.entries()}
    t.evolve_partition_spec([("k", "bucket", 8)])
    assert {e["path"] for e in t.entries()} == files  # nothing rewritten
    assert t.partition_spec()[0]["param"] == 8
    assert [s[0]["param"] for s in t.partition_specs()] == [4, 8]


def test_each_era_prunes_under_its_own_spec(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)  # era 0: 4 bucket files
    t.evolve_partition_spec([("k", "bucket", 8)])
    t.append(_df(spark, 1000, 2000))  # era 1: 8 bucket files
    era0 = [e for e in t.entries() if e.get("spec_id", 0) == 0]
    era1 = [e for e in t.entries() if e["spec_id"] == 1]
    assert len(era0) == 4 and len(era1) == 8
    # a point lookup opens 1/4 of era-0 files and 1/8 of era-1 files
    n = t.scan_file_count(filters=[("k", "=", 7)])
    assert n == 2  # one bucket file from each era
    rows = t.scan(spark, filters=[("k", "=", 7)]).collect()
    assert len(rows) == 50 and all(r.k == 7 for r in rows)


def test_unpartitioned_history_survives_evolution(spark, tmp_path):
    df = _df(spark, 0, 500)
    t = Table.create(str(tmp_path / "t"), df.schema)  # no spec
    t.append(df, n_files=2)
    t.evolve_partition_spec([("k", "identity")])
    t.append(_df(spark, 500, 1000))
    # old unpartitioned files are kept for any k filter; new identity
    # files prune to exactly one partition value
    n = t.scan_file_count(filters=[("k", "=", 3)])
    assert n == 2 + 1
    assert t.scan(spark, filters=[("k", "=", 3)]).count() == 25


def test_evolve_to_none_stops_partitioning(spark, tmp_path):
    df = _df(spark, 0, 400)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    t.evolve_partition_spec(None)
    t.append(_df(spark, 400, 800), n_files=2)
    new = [e for e in t.entries() if "partition" not in e]
    assert len(new) == 2  # written unpartitioned
    assert t.scan(spark).count() == 800


def test_rewrite_after_evolution_uses_new_spec(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    t.evolve_partition_spec([("k", "bucket", 8)])
    # COW delete rewrites overlapping files THROUGH the current writer:
    # outputs land under the new spec and carry its spec_id
    t.delete_where(spark, [("id", ">=", 990)])
    rewritten = [e for e in t.entries() if e.get("spec_id", 0) == 1]
    assert rewritten and all("partition" in e for e in rewritten)
    assert t.scan(spark).count() == 990
    assert (
        t.scan(spark, filters=[("k", "=", 5)]).count()
        == t.scan(spark).where(F.col("k") == 5).count()
    )


def test_distributed_planner_parity_across_eras(spark, tmp_path):
    from dff.tablefmt import _may_match

    df = _df(spark, 0, 1000)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    t.evolve_partition_spec([("k", "bucket", 8)])
    t.append(_df(spark, 1000, 2000))
    for filters in ([("k", "=", 7)], [("k", "in", (1, 9))], None):
        specs = t.partition_specs()
        driver = {
            e["path"]
            for e in t.entries()
            if not filters
            or (
                _may_match(e, filters)
                and t._entry_partition_ok(e, filters, specs)
            )
        }
        dist = {e["path"] for e in t.plan_files_distributed(spark, filters)}
        assert dist == driver, filters


def test_time_travel_prunes_under_historical_specs(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(
        str(tmp_path / "t"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    v0 = t.append(df)
    t.evolve_partition_spec([("k", "bucket", 8)])
    t.append(_df(spark, 1000, 2000))
    assert t.scan_file_count(filters=[("k", "=", 7)], version=v0) == 1
    assert t.scan(spark, filters=[("k", "=", 7)], version=v0).count() == 25
