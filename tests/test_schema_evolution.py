"""Field-id schema evolution (dff/tablefmt.py): rename/drop/add as
metadata-only commits, physical-name mapping on read, pruning across
renames, dropped-column non-resurrection, MOR tombstones across renames,
rollback restoring old field ids, branch publish carrying stamps.

Reference analog: the reference evolves its Delta model tables by
rewriting (``/root/reference/01_dff_model.py:481-485``); Iceberg-style
field ids make the same evolutions O(1 commit) at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.tablefmt import Table

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)


def frame(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("v"),
        (F.col("id") * 1.0).alias("amt"),
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    return Table.create(str(tmp_path / "t"), SCHEMA)


def test_rename_is_metadata_only_and_reads_old_files(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=2)
    files_before = {e["path"] for e in tbl.entries()}
    tbl.rename_column("v", "label")
    assert {e["path"] for e in tbl.entries()} == files_before
    assert [f.name for f in tbl.schema().fields] == ["k", "label", "amt"]
    got = {r["k"]: r["label"] for r in tbl.scan(spark).collect()}
    assert got == {i: f"a{i}" for i in range(10)}


def test_append_after_rename_mixes_physical_names(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.rename_column("v", "label")
    new = spark.range(10, 15).select(
        F.col("id").alias("k"),
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("label"),
        (F.col("id") * 1.0).alias("amt"),
    )
    tbl.append(new, n_files=1)
    got = {r["k"]: r["label"] for r in tbl.scan(spark).collect()}
    assert got[0] == "a0" and got[12] == "b12" and len(got) == 15


def test_pruning_translates_filters_across_rename(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=2)
    tbl.rename_column("v", "label")
    tbl.append(
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.lit("zz").alias("label"),
            F.lit(0.0).alias("amt"),
        ),
        n_files=1,
    )
    # exact rows under the new name, old files' stats keyed by the old
    rows = tbl.scan(spark, filters=[("label", "=", "a3")]).collect()
    assert len(rows) == 1 and rows[0]["k"] == 3
    # stats pruning engages: 'zz' lives only in the post-rename file
    assert tbl.scan_file_count(filters=[("label", "=", "zz")]) == 1
    # distributed planner agrees with the driver loop
    assert len(
        tbl.plan_files_distributed(spark, filters=[("label", "=", "zz")])
    ) == 1


def test_drop_then_readd_never_resurrects(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.drop_column("amt")
    assert [f.name for f in tbl.schema().fields] == ["k", "v"]
    tbl.add_column("amt", T.DoubleType())
    assert all(r["amt"] is None for r in tbl.scan(spark).collect())
    tbl.append(
        spark.createDataFrame([(100, "c", 9.5)], SCHEMA), n_files=1
    )
    m = {r["k"]: r["amt"] for r in tbl.scan(spark).collect()}
    assert m[100] == 9.5 and m[3] is None
    # files predating the re-add physically LACK the new field id:
    # a filter on it prunes them without opening anything
    assert tbl.scan_file_count(filters=[("amt", ">=", 9.0)]) == 1
    assert [
        r["k"] for r in tbl.scan(spark, filters=[("amt", ">=", 9.0)]).collect()
    ] == [100]
    assert len(
        tbl.plan_files_distributed(spark, filters=[("amt", ">=", 9.0)])
    ) == 1


def test_add_column_metadata_only(spark, tbl):
    tbl.append(frame(spark, 0, 5), n_files=1)
    files_before = {e["path"] for e in tbl.entries()}
    tbl.add_column("score", T.DoubleType())
    assert {e["path"] for e in tbl.entries()} == files_before
    got = tbl.scan(spark)
    assert "score" in got.columns
    assert all(r["score"] is None for r in got.collect())


def test_mor_tombstone_written_before_rename_still_applies(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=2)
    tbl.delete_matching_mor(
        spark, spark.createDataFrame([(1,), (2,)], "k long"), ["k"]
    )
    tbl.rename_column("k", "key")
    ks = sorted(r["key"] for r in tbl.scan(spark).collect())
    assert ks == [0, 3, 4, 5, 6, 7, 8, 9]


def test_drop_refused_while_tombstone_keys_on_it(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.delete_matching_mor(
        spark, spark.createDataFrame([(1,)], "k long"), ["k"]
    )
    with pytest.raises(ValueError, match="tombstone"):
        tbl.drop_column("k")
    # folding the tombstones unblocks the drop
    tbl.compact(spark, target_file_bytes=1 << 30)
    tbl.drop_column("k")
    assert [f.name for f in tbl.schema().fields] == ["v", "amt"]


def test_drop_refused_for_partition_source(spark, tmp_path):
    t = Table.create(
        str(tmp_path / "p"), SCHEMA, partition_spec=[("v", "identity")]
    )
    t.append(frame(spark, 0, 8))
    with pytest.raises(ValueError, match="partition spec"):
        t.drop_column("v")
    t.evolve_partition_spec(None)
    t.drop_column("v")
    assert [f.name for f in t.schema().fields] == ["k", "amt"]


def test_rename_partition_source_keeps_pruning(spark, tmp_path):
    t = Table.create(
        str(tmp_path / "p"), SCHEMA, partition_spec=[("v", "identity")]
    )
    t.append(frame(spark, 0, 8))  # v in a0..a7, one file per value
    t.rename_column("v", "label")
    assert t.scan_file_count(filters=[("label", "=", "a3")]) == 1
    rows = t.scan(spark, filters=[("label", "=", "a3")]).collect()
    assert len(rows) == 1 and rows[0]["k"] == 3


def test_time_travel_sees_old_names_rollback_restores_ids(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.rename_column("v", "label")
    old = tbl.scan(spark, version=v1)
    assert "v" in old.columns and old.count() == 10
    tbl.rollback(v1)
    assert "v" in [f.name for f in tbl.schema().fields]
    got = {r["k"]: r["v"] for r in tbl.scan(spark).collect()}
    assert got[3] == "a3"
    # ids were restored, not re-minted: rename again still maps old files
    tbl.rename_column("v", "name2")
    assert {r["k"]: r["name2"] for r in tbl.scan(spark).collect()}[3] == "a3"


def test_branch_appends_survive_main_rename_on_publish(spark, tbl):
    tbl.append(frame(spark, 0, 5), n_files=1)
    br = tbl.create_branch("ingest")
    br.append(frame(spark, 5, 10, tag="b"), n_files=1)
    tbl.rename_column("v", "label")  # main evolves while branch holds files
    tbl.publish_branch("ingest")
    got = {r["k"]: r["label"] for r in tbl.scan(spark).collect()}
    assert got[2] == "a2" and got[7] == "b7" and len(got) == 10


def test_rename_validation(spark, tbl):
    tbl.append(frame(spark, 0, 3))
    with pytest.raises(ValueError, match="no column"):
        tbl.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        tbl.rename_column("v", "amt")
    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("amt", T.DoubleType())
    with pytest.raises(ValueError, match="last column"):
        t2 = Table.create(
            str(tbl.root) + "2",
            T.StructType([T.StructField("only", T.LongType())]),
        )
        t2.drop_column("only")


def test_cow_delete_and_compact_upgrade_physical_names(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=2)
    tbl.rename_column("v", "label")
    # COW delete rewrites hit files under CURRENT names
    tbl.delete_where(spark, [("k", "between", (2, 4))])
    assert sorted(r["k"] for r in tbl.scan(spark).collect()) == [
        0, 1, 5, 6, 7, 8, 9,
    ]
    tbl.compact(spark, target_file_bytes=1 << 30)
    got = {r["k"]: r["label"] for r in tbl.scan(spark).collect()}
    assert got[7] == "a7" and len(got) == 7
    # post-compaction files are stamped with the current schema id
    sids = {e.get("schema_id") for e in tbl.entries()}
    assert sids == {tbl._snapshot()["schema_id"]}


# ------------------------------------------------------------- widening
WSCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def wframe(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("a"), F.col("id").cast("string")).alias("v"),
    )


def test_widen_metadata_only_reads_both_eras(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    t.append(wframe(spark, 0, 10), n_files=2)
    files_before = {e["path"] for e in t.entries()}
    t.widen_column_type("k", T.LongType())
    assert {e["path"] for e in t.entries()} == files_before  # metadata-only
    assert t.schema()["k"].dataType == T.LongType()
    # post-widen append carries the wide type physically
    t.append(
        spark.range(10, 15).select(
            (F.col("id") + 2**40).alias("k"),
            F.lit("big").alias("v"),
        )
    )
    got = {r["k"] for r in t.scan(spark).collect()}
    assert 3 in got and (10 + 2**40) in got and len(got) == 15
    assert t.scan(spark).schema["k"].dataType == T.LongType()


def test_widen_rejects_lossy_and_noops_same_type(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    v = t.append(wframe(spark, 0, 5), n_files=1)
    with pytest.raises(ValueError, match="promotion"):
        t.widen_column_type("k", T.FloatType())  # int->float loses >2^24
    with pytest.raises(ValueError, match="no column"):
        t.widen_column_type("nope", T.LongType())
    assert t.widen_column_type("k", T.IntegerType()) == v  # no-op
    t.widen_column_type("k", T.LongType())
    with pytest.raises(ValueError, match="promotion"):
        t.widen_column_type("k", T.IntegerType())  # never narrow back


def test_widen_pruning_and_filters_across_eras(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    for b in range(4):
        t.append(wframe(spark, b * 100, (b + 1) * 100), n_files=1)
    t.widen_column_type("k", T.LongType())
    t.append(
        spark.range(400, 500).select(
            F.col("id").alias("k"), F.lit("n").alias("v")
        ),
        n_files=1,
    )
    # stats pruning engages across narrow and wide eras
    assert t.scan_file_count(filters=[("k", "between", (150, 160))]) == 1
    got = sorted(
        r["k"] for r in t.scan(spark, filters=[("k", ">=", 390)]).collect()
    )
    assert got == list(range(390, 500))


def test_widen_then_rename_compose(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    t.append(wframe(spark, 0, 10), n_files=1)
    t.widen_column_type("k", T.LongType())
    t.rename_column("k", "key")
    got = {r["v"]: r["key"] for r in t.scan(spark).collect()}
    assert got["a7"] == 7 and len(got) == 10
    assert t.scan(spark).schema["key"].dataType == T.LongType()


def test_cow_rewrite_upgrades_physical_type(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    t.append(wframe(spark, 0, 10), n_files=1)
    t.widen_column_type("k", T.LongType())
    t.delete_where(spark, [("k", "=", 3)])
    # the rewritten file postdates the widen: physically wide
    import pyarrow.parquet as pq
    import os as _os

    new = [e for e in t.entries()]
    assert len(new) == 1
    sch = pq.ParquetFile(_os.path.join(t.root, new[0]["path"])).schema_arrow
    assert str(sch.field("k").type) == "int64"
    assert sorted(r["k"] for r in t.scan(spark).collect()) == [
        i for i in range(10) if i != 3
    ]


def test_widen_time_travel_and_rollback(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    v1 = t.append(wframe(spark, 0, 10), n_files=1)
    t.widen_column_type("k", T.LongType())
    old = t.scan(spark, version=v1)
    assert old.schema["k"].dataType == T.IntegerType()
    assert old.count() == 10
    t.rollback(v1)
    assert t.schema()["k"].dataType == T.IntegerType()
    assert t._snapshot().get("widen_history") == []
    # widen again after rollback still reads the old files correctly
    t.widen_column_type("k", T.LongType())
    assert sorted(r["k"] for r in t.scan(spark).collect()) == list(range(10))


def test_widen_refused_with_open_branches(spark, tmp_path):
    t = Table.create(str(tmp_path / "w"), WSCHEMA)
    t.append(wframe(spark, 0, 5), n_files=1)
    t.create_branch("ingest")
    with pytest.raises(ValueError, match="branches"):
        t.widen_column_type("k", T.LongType())
    t.drop_branch("ingest")
    t.widen_column_type("k", T.LongType())
    assert t.schema()["k"].dataType == T.LongType()


def test_statsvalidate_across_rename_and_add(spark, tbl):
    from dff.statsvalidate import StatsRule, validate_table_stats, \
        plan_stats_validation

    tbl.append(frame(spark, 0, 400), n_files=2)
    tbl.rename_column("amt", "amount")
    tbl.add_column("score", T.DoubleType())
    tbl.append(
        spark.range(400, 500).select(
            F.col("id").alias("k"),
            F.lit("z").alias("v"),
            (F.col("id") * 1.0).alias("amount"),
            F.lit(5.0).alias("score"),
        ),
        n_files=1,
    )
    rules = [
        StatsRule("r_amount", "amount", ">=", lo=100.0),
        StatsRule("r_score", "score", "not_null"),
    ]
    got = {
        r["constraint_id"]: r["violations"]
        for r in validate_table_stats(spark, tbl, rules).collect()
    }
    # ground truth via full scan of the evolved table
    full = tbl.scan(spark)
    assert got["r_amount"] == full.where(
        F.col("amount").isNull() | (F.col("amount") < 100.0)
    ).count()
    assert got["r_score"] == 400  # every pre-add row reads NULL
    # the not_null rule on the added column is decided from metadata
    pl = plan_stats_validation(tbl, [rules[1]])
    assert pl.files_scanned == 0


def test_widen_bucket_partition_source_keeps_pruning(spark, tmp_path):
    """bucket() hashes crc32(str(v)) — width-invariant, so widening the
    partition-source column keeps both eras' files prunable."""
    t = Table.create(
        str(tmp_path / "wp"), WSCHEMA, partition_spec=[("k", "bucket", 8)]
    )
    t.append(wframe(spark, 0, 400))
    t.widen_column_type("k", T.LongType())
    t.append(
        spark.range(400, 800).select(
            F.col("id").alias("k"), F.lit("b").alias("v")
        )
    )
    total = len(t.entries())
    assert t.scan_file_count(filters=[("k", "=", 77)]) < total
    assert t.scan_file_count(filters=[("k", "=", 700)]) < total
    [r] = t.scan(spark, filters=[("k", "=", 77)]).collect()
    assert r["v"] == "a77"
    [r] = t.scan(spark, filters=[("k", "=", 700)]).collect()
    assert r["v"] == "b"
