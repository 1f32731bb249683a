"""Merge-on-read deletes on the table format (dff/tablefmt.py):
equality-delete files, sequence-number applicability (strict <), scans
anti-joining tombstones, COW rewrites folding pending deletes instead of
resurrecting rows, compaction reclaiming dead tombstones, MOR merge
parity with COW merge, snapshot maintenance liveness, and the branch
publish rules around concurrent deletes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import CommitConflict, Table


def _df(spark, lo, hi, tag="a"):
    return (
        spark.range(lo, hi)
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(100)).cast("long"))
        .withColumn("tag", F.lit(tag))
    )


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


@pytest.fixture()
def tbl(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(str(tmp_path / "t"), df.schema)
    t.append(df, n_files=2)
    return t


def _ids(spark, t, version=None):
    return sorted(
        r.id for r in t.scan(spark, version=version).select("id").collect()
    )


def test_mor_delete_no_data_rewrite(spark, tbl):
    files_before = {e["path"] for e in tbl.entries()}
    tbl.delete_matching_mor(spark, _keys(spark, [3, 5, 7, 9999]), ["id"])
    assert {e["path"] for e in tbl.entries()} == files_before  # zero rewrite
    assert len(tbl.delete_entries()) == 1
    ids = _ids(spark, tbl)
    assert 3 not in ids and 5 not in ids and 7 not in ids
    assert len(ids) == 997


def test_mor_delete_then_append_same_keys_survives(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, [1, 2]), ["id"])
    tbl.append(_df(spark, 1, 3, tag="re"), n_files=1)  # re-insert ids 1,2
    rows = tbl.scan(spark).where(F.col("id").isin(1, 2)).collect()
    assert sorted(r.id for r in rows) == [1, 2]
    assert all(r.tag == "re" for r in rows)


def test_mor_delete_applies_to_older_appends_only(spark, tbl):
    tbl.append(_df(spark, 2000, 2010, tag="old"), n_files=1)
    tbl.delete_matching_mor(spark, _keys(spark, [2005]), ["id"])
    tbl.append(_df(spark, 2005, 2006, tag="new"), n_files=1)
    rows = tbl.scan(spark).where(F.col("id") == 2005).collect()
    assert [r.tag for r in rows] == ["new"]


def test_time_travel_before_mor_delete(spark, tbl):
    v0 = tbl._latest_version()
    tbl.delete_matching_mor(spark, _keys(spark, [0, 1]), ["id"])
    assert len(_ids(spark, tbl, version=v0)) == 1000
    assert len(_ids(spark, tbl)) == 998


def test_compact_folds_tombstones_and_reclaims(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, list(range(10))), ["id"])
    before = _ids(spark, tbl)
    tbl.compact(spark, target_file_bytes=1 << 30)
    assert tbl.delete_entries() == []  # tombstones folded in + reclaimed
    assert _ids(spark, tbl) == before
    # the folded rows are really gone from the data files themselves
    raw = spark.read.parquet(
        *[os.path.join(tbl.root, e["path"]) for e in tbl.entries()]
    )
    assert raw.where(F.col("id") < 10).count() == 0


def test_cow_rewrite_does_not_resurrect(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, [100, 101]), ["id"])
    # COW delete overlaps the same files the tombstone covers: the rewrite
    # must fold the pending tombstone into the new (higher-seq) files
    tbl.delete_where(spark, [("id", ">=", 900)])
    ids = _ids(spark, tbl)
    assert 100 not in ids and 101 not in ids and max(ids) == 899
    assert tbl.delete_entries() == []  # rewrite covered every data file


def test_mor_merge_matches_cow_merge(spark, tmp_path):
    base = _df(spark, 0, 500)
    src = _df(spark, 400, 600, tag="s")  # 100 updates + 100 inserts
    cow = Table.create(str(tmp_path / "cow"), base.schema)
    cow.append(base, n_files=2)
    mor = Table.create(str(tmp_path / "mor"), base.schema)
    mor.append(base, n_files=2)
    files_before = {e["path"] for e in mor.entries()}
    cow.merge_upsert(spark, src, ["id"])
    mor.merge_upsert(spark, src, ["id"], mode="mor")
    assert files_before <= {e["path"] for e in mor.entries()}  # no rewrite
    a = sorted(map(tuple, cow.scan(spark).collect()))
    b = sorted(map(tuple, mor.scan(spark).collect()))
    assert a == b and len(a) == 600


def test_mor_merge_null_keys_insert_never_match(spark, tmp_path):
    base = _df(spark, 0, 10)
    t = Table.create(str(tmp_path / "t"), base.schema)
    t.append(
        base.withColumn(
            "id", F.when(F.col("id") == 0, None).otherwise(F.col("id"))
        ),
        n_files=1,
    )
    src = _df(spark, 5, 6, tag="s").withColumn(
        "id", F.lit(None).cast("long")
    )
    t.merge_upsert(spark, src, ["id"], mode="mor")
    rows = t.scan(spark).where(F.col("id").isNull()).collect()
    assert len(rows) == 2  # old NULL row survives, new NULL row inserts


def test_mor_merge_duplicate_source_keys_raise(spark, tbl):
    dup = _df(spark, 0, 1).unionAll(_df(spark, 0, 1))
    with pytest.raises(ValueError, match="multiple rows"):
        tbl.merge_upsert(spark, dup, ["id"], mode="mor")


def test_sequential_mor_deletes_different_cols(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, [1]), ["id"])
    vals = spark.createDataFrame([(7,)], "v long")
    tbl.delete_matching_mor(spark, vals, ["v"])
    df = tbl.scan(spark)
    assert df.where(F.col("id") == 1).count() == 0
    assert df.where(F.col("v") == 7).count() == 0
    assert len(tbl.delete_entries()) == 2


def test_scan_filters_compose_with_deletes(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, [10, 20, 500]), ["id"])
    rows = tbl.scan(spark, filters=[("id", "<", 100)]).collect()
    ids = sorted(r.id for r in rows)
    assert len(ids) == 98 and 10 not in ids and 20 not in ids


def test_expire_keeps_live_tombstones(spark, tbl):
    tbl.delete_matching_mor(spark, _keys(spark, [1, 2, 3]), ["id"])
    before = _ids(spark, tbl)
    tbl.expire_snapshots(keep_last=1)
    assert _ids(spark, tbl) == before  # delete files survived the GC
    tbl.gc_orphans(grace_seconds=0.0)
    assert _ids(spark, tbl) == before


def test_rollback_restores_tombstone_set(spark, tbl):
    v_clean = tbl._latest_version()
    tbl.delete_matching_mor(spark, _keys(spark, [1]), ["id"])
    v_del = tbl._latest_version()
    tbl.rollback(v_clean)
    assert len(_ids(spark, tbl)) == 1000  # delete rolled back with files
    tbl.rollback(v_del)
    assert len(_ids(spark, tbl)) == 999  # and restored with them


def test_publish_conflicts_on_concurrent_deletes(spark, tbl):
    br = tbl.create_branch("ingest")
    br.append(_df(spark, 5000, 5100), n_files=1)
    tbl.delete_matching_mor(spark, _keys(spark, [1]), ["id"])  # main moved
    with pytest.raises(CommitConflict):
        tbl.publish_branch("ingest")
    tbl.drop_branch("ingest")
    # branch-side deletes also refuse to rebase over a moved main
    br2 = tbl.create_branch("fix")
    br2.delete_matching_mor(spark, _keys(spark, [2]), ["id"])
    tbl.append(_df(spark, 6000, 6010), n_files=1)
    with pytest.raises(CommitConflict):
        tbl.publish_branch("fix")


def test_publish_fast_forwards_branch_deletes(spark, tbl):
    br = tbl.create_branch("fix")
    br.delete_matching_mor(spark, _keys(spark, [1, 2]), ["id"])
    br.append(_df(spark, 1, 2, tag="re"), n_files=1)  # re-insert id 1
    tbl.publish_branch("fix")
    ids = _ids(spark, tbl)
    assert 2 not in ids and 1 in ids and len(ids) == 999
    # a post-publish delete outranks the branch-appended file
    tbl.delete_matching_mor(spark, _keys(spark, [1]), ["id"])
    assert 1 not in _ids(spark, tbl)


def test_stats_validation_refuses_pending_deletes(spark, tbl):
    from dff.statsvalidate import StatsRule, plan_stats_validation

    tbl.delete_matching_mor(spark, _keys(spark, [1]), ["id"])
    with pytest.raises(ValueError, match="pending MOR deletes"):
        plan_stats_validation(
            tbl, [StatsRule("c1", "id", "not_null")]
        )
