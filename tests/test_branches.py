"""Write-Audit-Publish branches + clustered rewrite on the table format
(dff/tablefmt.py): branch isolation, fast-forward and append-only-rebase
publishes, conflict on concurrent rewrites, maintenance liveness across
branches, OPTIMIZE layout rewrites, and file-size capping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import CommitConflict, Table


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn(
        "v", F.pmod(F.xxhash64("id"), F.lit(100)).cast("long")
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    df = _df(spark, 0, 1000)
    t = Table.create(str(tmp_path / "t"), df.schema)
    t.append(df, n_files=2)
    return t


def test_branch_isolated_until_publish(spark, tbl):
    br = tbl.create_branch("audit")
    br.append(_df(spark, 1000, 1500), n_files=1)
    assert tbl.scan(spark).count() == 1000  # main unchanged
    assert br.scan(spark).count() == 1500
    tbl.publish_branch("audit")
    assert tbl.scan(spark).count() == 1500
    assert tbl.history()[-1]["operation"] == "publish"


def test_publish_rebases_append_only_branch(spark, tbl):
    br = tbl.create_branch("audit")
    br.append(_df(spark, 1000, 1200), n_files=1)
    tbl.append(_df(spark, 2000, 2300), n_files=1)  # main advances too
    tbl.publish_branch("audit")
    assert tbl.scan(spark).count() == 1500  # 1000 + 200 + 300


def test_publish_conflicts_when_branch_rewrote_and_main_moved(spark, tbl):
    br = tbl.create_branch("audit")
    br.delete_where(spark, [("id", "<", 100)])  # rewrites shared files
    tbl.append(_df(spark, 5000, 5100), n_files=1)
    with pytest.raises(CommitConflict):
        tbl.publish_branch("audit")
    # fast-forward of a rewriting branch is fine when main did NOT move
    t2root = tbl.root + "-2"
    t2 = Table.create(t2root, _df(spark, 0, 10).schema)
    t2.append(_df(spark, 0, 500), n_files=1)
    b2 = t2.create_branch("fix")
    b2.delete_where(spark, [("id", "<", 100)])
    t2.publish_branch("fix")
    assert t2.scan(spark).count() == 400


def test_wap_flow_blocks_bad_batch(spark, tbl):
    """The WAP contract end-to-end: audit the branch's ADDED rows with a
    constraint; violations -> drop the branch, main never sees the rows."""
    br = tbl.create_branch("wap")
    base_v = 0  # branch v0 references main's files
    bad = _df(spark, 1000, 1100).withColumn(
        "v", F.when(F.col("id") % 10 == 0, F.lit(-1)).otherwise(F.col("v"))
    )
    br.append(bad, n_files=1)
    added = br.scan_added(spark, since_version=base_v)
    n_viol = added.where(F.col("v") < 0).count()
    assert n_viol == 10
    tbl.drop_branch("wap")  # audit failed -> never published
    assert tbl.scan(spark).count() == 1000
    assert tbl.list_branches() == []


def test_branch_files_survive_main_maintenance(spark, tbl):
    br = tbl.create_branch("keep")
    br.append(_df(spark, 9000, 9100), n_files=1)
    tbl.overwrite(_df(spark, 0, 50), n_files=1)  # orphan main's old files
    tbl.expire_snapshots(keep_last=1)
    tbl.gc_orphans(grace_seconds=0)
    assert br.scan(spark).count() == 1100  # branch chain fully intact
    with pytest.raises(ValueError):
        br.expire_snapshots()  # maintenance only from main


def test_branch_inherits_partition_spec(spark, tmp_path):
    df = _df(spark, 0, 400)
    t = Table.create(
        str(tmp_path / "p"), df.schema, partition_spec=[("v", "bucket", 4)]
    )
    t.append(df)
    br = t.create_branch("b")
    br.append(_df(spark, 400, 800))
    assert br.partition_spec() == t.partition_spec()
    assert all("partition" in e for e in br.entries())


def test_rewrite_clustered_tightens_pruning(spark, tmp_path):
    df = _df(spark, 0, 20000)
    t = Table.create(str(tmp_path / "z"), df.schema)
    # ingest arrives unclustered: every file spans the whole id range
    t.append(df.repartition(8), n_files=8)
    flt = [("id", "between", (1000, 1999))]
    before = t.scan_file_count(flt)
    t.rewrite_clustered(spark, ["id"], n_files=8)
    after = t.scan_file_count(flt)
    assert before == 8 and after <= 2
    got = t.scan(spark, filters=flt)
    assert got.count() == 1000
    # rows bit-identical across the rewrite
    a = t.scan(spark, version=1).agg(F.sum("id"), F.sum("v")).collect()[0]
    b = t.scan(spark).agg(F.sum("id"), F.sum("v")).collect()[0]
    assert a == b


def test_rewrite_clustered_zorder_two_dims(spark, tmp_path):
    df = _df(spark, 0, 20000).withColumn("w", (F.col("id") * 37) % 20000)
    t = Table.create(str(tmp_path / "z2"), df.schema)
    t.append(df.repartition(8), n_files=8)
    t.rewrite_clustered(spark, ["id", "w"], n_files=16)
    # both dimensions prune after a Z-order rewrite
    assert t.scan_file_count([("id", "between", (0, 1250))]) <= 8
    assert t.scan_file_count([("w", "between", (0, 1250))]) <= 8


def test_max_rows_per_file_caps_hot_partition(spark, tmp_path):
    df = _df(spark, 0, 1000).withColumn(
        "g", F.when(F.col("id") < 900, F.lit("hot")).otherwise(F.lit("cold"))
    )
    t = Table.create(
        str(tmp_path / "h"), df.schema, partition_spec=[("g", "identity")]
    )
    t.append(df, max_rows_per_file=200)
    hot = [
        e for e in t.entries()
        if e["partition"]["0"] == "hot"
    ]
    assert len(hot) == 5  # 900 rows / 200 cap
    assert all(e["rows"] <= 200 for e in hot)
    assert t.scan(spark).count() == 1000
