"""Table format (dff/tablefmt.py): atomic snapshot commits, footer stats,
manifest-level pruning, COW delete, atomic compaction, time travel,
schema evolution, optimistic concurrency, snapshot expiry, orphan GC."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dff.tablefmt import CommitConflict, Table, _footer_stats, _may_match

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
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    return t


def test_append_scan_roundtrip(spark, tbl):
    tbl.append(frame(spark, 0, 100), n_files=2)
    tbl.append(frame(spark, 100, 250), n_files=3)
    got = tbl.scan(spark)
    assert got.count() == 250
    assert sorted(got.columns) == ["grp", "k", "v"]
    assert got.agg(F.sum("k")).first()[0] == sum(range(250))


def test_time_travel_and_history(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 10))
    v2 = tbl.append(frame(spark, 10, 30))
    assert tbl.scan(spark, version=v1).count() == 10
    assert tbl.scan(spark, version=v2).count() == 30
    ops = [h["operation"] for h in tbl.history()]
    assert ops == ["create", "append", "append"]


def test_footer_stats_match_data(spark, tbl):
    tbl.append(frame(spark, 5, 42), n_files=1)
    [e] = tbl.entries()
    assert e["rows"] == 37
    assert e["stats"]["k"] == {"min": 5, "max": 41, "nulls": 0}
    assert e["stats"]["grp"]["min"] == "g0"
    rows, nbytes, stats = _footer_stats(os.path.join(tbl.root, e["path"]))
    assert rows == 37 and nbytes == e["bytes"] and stats == e["stats"]


def test_scan_pruning_opens_fewer_files(spark, tbl):
    # each append covers a disjoint k-range -> its files are prunable
    for lo in range(0, 1000, 250):
        tbl.append(frame(spark, lo, lo + 250), n_files=2)
    total = tbl.scan_file_count()
    assert total == 8
    pruned = tbl.scan_file_count([("k", "between", (300, 320))])
    assert pruned <= 2
    got = tbl.scan(spark, [("k", "between", (300, 320))])
    assert got.count() == 21
    assert got.agg(F.min("k"), F.max("k")).first() == (300, 320)
    # equality + in + inequality prune too, and return exact rows
    assert tbl.scan_file_count([("k", "=", 999)]) <= 2
    assert tbl.scan(spark, [("k", "=", 999)]).count() == 1
    assert tbl.scan(spark, [("k", ">=", 990)]).count() == 10
    assert tbl.scan(spark, [("k", "in", (0, 999))]).count() == 2
    # conjunction: grp never prunes (all files carry g0..g3), k does
    both = tbl.scan(spark, [("k", "<", 100), ("grp", "=", "g1")])
    assert both.count() == 25


def test_may_match_all_null_column():
    e = {"rows": 10, "stats": {"x": {"min": None, "max": None, "nulls": 10}}}
    assert not _may_match(e, [("x", "=", 1)])
    e2 = {"rows": 10, "stats": {}}
    assert _may_match(e2, [("x", "=", 1)])  # no stats -> cannot prune


def test_cow_delete_rewrites_only_hit_files(spark, tbl):
    for lo in range(0, 400, 100):
        tbl.append(frame(spark, lo, lo + 100), n_files=1)
    before = {e["path"] for e in tbl.entries()}
    tbl.delete_where(spark, [("k", "between", (150, 249))])
    after = {e["path"] for e in tbl.entries()}
    # files for [0,100) and [300,400) carried by reference, not rewritten
    assert len(before & after) == 2
    got = tbl.scan(spark)
    assert got.count() == 300
    assert got.where(F.col("k").between(150, 249)).count() == 0
    # old snapshot still sees the deleted rows (time travel)
    assert tbl.scan(spark, version=4).count() == 400


def test_delete_nothing_is_noop(spark, tbl):
    v = tbl.append(frame(spark, 0, 50))
    assert tbl.delete_where(spark, [("k", ">", 10_000)]) == v


def test_compact_single_commit(spark, tbl):
    for lo in range(0, 500, 50):
        tbl.append(frame(spark, lo, lo + 50), n_files=1)
    assert tbl.scan_file_count() == 10
    old_tip = tbl._latest_version()
    tbl.compact(spark, target_file_bytes=1 << 30)
    assert tbl.scan_file_count() == 1
    got = tbl.scan(spark)
    assert got.count() == 500
    assert got.agg(F.sum("k")).first()[0] == sum(range(500))
    # pre-compaction snapshot intact: no swap window, old file set readable
    assert tbl.scan(spark, version=old_tip).count() == 500
    assert [h["operation"] for h in tbl.history()][-1] == "compact"


def test_crashed_writer_invisible_then_gc(spark, tbl):
    tbl.append(frame(spark, 0, 10))
    # simulate a writer dying after materializing data but before commit
    tbl._materialize(frame(spark, 10, 20))
    assert tbl.scan(spark).count() == 10  # orphans never observed
    assert tbl.gc_orphans(grace_seconds=0) >= 1
    assert tbl.scan(spark).count() == 10


def test_commit_conflict_and_append_rebase(spark, tbl):
    tbl.append(frame(spark, 0, 10))
    # a rewrite racing another committer must fail loudly...
    snap = tbl._snapshot()
    tbl._commit(
        {"operation": "append", "schema": snap["schema"],
         "manifests": snap["manifests"]},
        expected_parent=snap["version"],
    )
    with pytest.raises(CommitConflict):
        tbl._commit(
            {"operation": "delete", "schema": snap["schema"],
             "manifests": []},
            expected_parent=snap["version"],
        )
    # ...but append() rebases onto the new tip and lands
    v = tbl.append(frame(spark, 10, 20))
    assert v == tbl._latest_version()
    assert tbl.scan(spark).count() == 20


def test_schema_evolution(spark, tbl):
    tbl.append(frame(spark, 0, 10))
    widened = frame(spark, 10, 20).withColumn("note", F.lit("new"))
    with pytest.raises(ValueError):
        tbl.append(widened)
    tbl.append(widened, evolve=True)
    got = tbl.scan(spark)
    assert got.columns == ["k", "grp", "v", "note"]
    assert got.where(F.col("note").isNull()).count() == 10  # old files -> NULL
    # missing columns in a later append fill with NULL as well
    tbl.append(frame(spark, 20, 25))
    assert tbl.scan(spark).where(F.col("note").isNull()).count() == 15


def test_rollback(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 10))
    tbl.append(frame(spark, 10, 30))
    tbl.rollback(v1)
    assert tbl.scan(spark).count() == 10
    assert [h["operation"] for h in tbl.history()][-1] == "rollback"


def test_expire_snapshots_gc(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.overwrite(frame(spark, 10, 20), n_files=1)
    dropped = tbl.expire_snapshots(keep_last=1)
    assert dropped["snapshots"] >= 2 and dropped["data_files"] >= 1
    assert tbl.scan(spark).count() == 10
    assert tbl.scan(spark).agg(F.min("k")).first()[0] == 10
    with pytest.raises(FileNotFoundError):
        tbl._snapshot(0)


def test_version_hint_recovery(spark, tbl):
    tbl.append(frame(spark, 0, 10))
    os.remove(os.path.join(tbl.meta_dir, "_version_hint"))
    assert tbl._latest_version() == 1  # recovered by listing the log
    assert tbl.scan(spark).count() == 10


def test_snapshot_json_is_small(spark, tbl):
    """Tip metadata stays O(manifest names), not O(files): the commit a
    1000-executor cluster serializes per append is kilobytes."""
    for lo in range(0, 300, 100):
        tbl.append(frame(spark, lo, lo + 100), n_files=4)
    with open(tbl._snapshot_path(tbl._latest_version())) as f:
        snap = json.load(f)
    assert len(snap["manifests"]) == 3  # one fragment per commit
    assert len(json.dumps(snap)) < 2000


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """ANSI DELETE semantics: rows where the predicate is NULL are kept."""
    t = Table.create(str(tmp_path / "tn"), SCHEMA)
    df = frame(spark, 0, 20).withColumn(
        "grp", F.when(F.col("k") < 5, F.lit(None)).otherwise(F.col("grp"))
    )
    t.append(df, n_files=1)
    t.delete_where(spark, [("grp", "=", "g1")])
    got = t.scan(spark)
    assert got.where(F.col("grp").isNull()).count() == 5  # survived
    assert got.where(F.col("grp") == "g1").count() == 0


def test_scan_added_incremental_reads(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 100), n_files=2)
    v2 = tbl.append(frame(spark, 100, 150), n_files=1)
    v3 = tbl.append(frame(spark, 150, 400), n_files=2)
    inc = tbl.scan_added(spark, since_version=v1)
    assert inc.count() == 300
    assert inc.agg(F.min("k"), F.max("k")).first() == (100, 399)
    mid = tbl.scan_added(spark, since_version=v1, until_version=v2)
    assert mid.count() == 50
    assert tbl.scan_added(spark, since_version=v3).count() == 0
    # full history from the create snapshot == full scan
    assert tbl.scan_added(spark, 0).count() == tbl.scan(spark).count()


def test_merge_upsert_update_and_insert(spark, tbl):
    tbl.append(frame(spark, 0, 100), n_files=2)
    src = spark.range(90, 120).select(
        F.col("id").alias("k"),
        F.lit("merged").alias("grp"),
        F.lit(-1.0).alias("v"),
    )
    tbl.merge_upsert(spark, src, ["k"])
    got = tbl.scan(spark)
    assert got.count() == 120  # 10 updated in place, 20 inserted
    assert got.where(F.col("grp") == "merged").count() == 30
    # untouched rows keep their original values
    assert got.where((F.col("k") == 5) & (F.col("v") == 7.5)).count() == 1
    # updated row carries the source payload, not the old one
    assert got.where(F.col("k") == 95).first()["v"] == -1.0
    assert [h["operation"] for h in tbl.history()][-1] == "merge"


def test_merge_upsert_prunes_nonoverlapping_files(spark, tbl):
    for lo in range(0, 400, 100):
        tbl.append(frame(spark, lo, lo + 100), n_files=1)
    before = {e["path"] for e in tbl.entries()}
    src = frame(spark, 150, 160).withColumn("v", F.lit(-5.0))
    tbl.merge_upsert(spark, src, ["k"])
    after = {e["path"] for e in tbl.entries()}
    # only the [100,200) file overlaps the source key range: 3 carried
    assert len(before & after) == 3
    assert tbl._snapshot()["summary"] == {
        "rewritten_files": 1,
        "carried_files": 3,
    }
    got = tbl.scan(spark)
    assert got.count() == 400
    assert got.where(F.col("v") == -5.0).count() == 10
    # time travel still sees the pre-merge values
    assert tbl.scan(spark, version=4).where(F.col("v") == -5.0).count() == 0


def test_merge_upsert_null_keys_never_match(spark, tbl):
    base = spark.createDataFrame(
        [(None, "old", 1.0), (1, "old", 1.0)], schema=SCHEMA
    )
    tbl.append(base, n_files=1)
    src = spark.createDataFrame(
        [(None, "new", 2.0), (1, "new", 2.0)], schema=SCHEMA
    )
    tbl.merge_upsert(spark, src, ["k"])
    got = tbl.scan(spark)
    # NULL-keyed target row survives; NULL-keyed source row inserts
    assert got.count() == 3
    assert got.where(F.col("k").isNull()).count() == 2
    assert got.where((F.col("k") == 1) & (F.col("grp") == "new")).count() == 1


def test_merge_upsert_duplicate_source_keys_raise(spark, tbl):
    tbl.append(frame(spark, 0, 10))
    src = frame(spark, 5, 7).union(frame(spark, 5, 6))
    with pytest.raises(ValueError, match="multiple rows"):
        tbl.merge_upsert(spark, src, ["k"])


def test_merge_upsert_schema_evolution(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    src = frame(spark, 5, 15).withColumn("note", F.lit("n"))
    with pytest.raises(ValueError):
        tbl.merge_upsert(spark, src, ["k"])
    tbl.merge_upsert(spark, src, ["k"], evolve=True)
    got = tbl.scan(spark)
    assert got.columns == ["k", "grp", "v", "note"]
    assert got.count() == 15
    assert got.where(F.col("note").isNull()).count() == 5  # unmatched old


def test_merge_upsert_insert_only_fast_path(spark, tbl):
    tbl.append(frame(spark, 0, 100), n_files=2)
    before = {e["path"] for e in tbl.entries()}
    tbl.merge_upsert(spark, frame(spark, 500, 520), ["k"])
    after = {e["path"] for e in tbl.entries()}
    assert before <= after  # nothing rewritten: key ranges don't overlap
    assert tbl.scan(spark).count() == 120


def test_idempotent_append_redelivery_noop(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 50), idempotency_key="batch-0")
    v2 = tbl.append(frame(spark, 0, 50), idempotency_key="batch-0")
    assert v1 == v2  # redelivery returned the original commit, wrote nothing
    assert tbl.scan(spark).count() == 50
    v3 = tbl.append(frame(spark, 50, 80), idempotency_key="batch-1")
    assert v3 > v1
    assert tbl.scan(spark).count() == 80
    keys = [
        (h.get("summary") or {}).get("idempotency_key") for h in tbl.history()
    ]
    assert keys.count("batch-0") == 1
    assert tbl.committed_version_for("batch-0") == v1
    assert tbl.committed_version_for("nope") is None


def test_delete_matching_prunes_and_deletes(spark, tbl):
    for lo in range(0, 400, 100):
        tbl.append(frame(spark, lo, lo + 100), n_files=1)
    before = {e["path"] for e in tbl.entries()}
    keys = spark.range(120, 140).select(F.col("id").alias("k"))
    tbl.delete_matching(spark, keys, ["k"])
    after = {e["path"] for e in tbl.entries()}
    assert len(before & after) == 3  # only the [100,200) file rewrote
    got = tbl.scan(spark)
    assert got.count() == 380
    assert got.where(F.col("k").between(120, 139)).count() == 0
    # empty / all-null key frames are no-ops
    v = tbl._latest_version()
    assert tbl.delete_matching(spark, keys.where(F.lit(False)), ["k"]) == v
    nulls = spark.createDataFrame([(None,)], "k long")
    assert tbl.delete_matching(spark, nulls, ["k"]) == v


def test_apply_cdc_reconciles_to_target(spark, tbl):
    from dff.diff import apply_cdc

    old = frame(spark, 0, 200)
    tbl.append(old, n_files=2)
    # target: drop [0,50), change v for k%3==0, add [200,250)
    new = (
        frame(spark, 50, 250)
        .withColumn(
            "v",
            F.when(F.col("k") % 3 == 0, F.lit(-9.0)).otherwise(F.col("v")),
        )
    )
    apply_cdc(spark, tbl, new, ["k"], ["grp", "v"])
    got = tbl.scan(spark)
    assert got.count() == 200
    assert got.agg(F.min("k"), F.max("k")).first() == (50, 249)
    assert (
        got.where((F.col("k") % 3 == 0) & (F.col("v") != -9.0)).count() == 0
    )
    # idempotent: a second application is churn-free (two no-op commits)
    rows_before = {tuple(r) for r in got.collect()}
    apply_cdc(spark, tbl, new, ["k"], ["grp", "v"])
    assert {tuple(r) for r in tbl.scan(spark).collect()} == rows_before


def test_tags_pin_snapshots(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.tag("q3-train", v1)
    tbl.overwrite(frame(spark, 100, 120), n_files=1)
    # tag resolves everywhere a version number does
    assert tbl.scan(spark, version="q3-train").count() == 10
    assert tbl.tags() == {"q3-train": v1}
    # retention never eats a tagged snapshot
    dropped = tbl.expire_snapshots(keep_last=1)
    assert dropped["snapshots"] >= 1
    assert tbl.scan(spark, version="q3-train").count() == 10
    assert tbl.scan(spark).count() == 20
    # dropping the tag releases it for the next expiry
    tbl.drop_tag("q3-train")
    tbl.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        tbl._snapshot(v1)
    with pytest.raises(KeyError):
        tbl.scan(spark, version="q3-train")


def test_tag_validation_and_noop(spark, tbl):
    v1 = tbl.append(frame(spark, 0, 5), n_files=1)
    with pytest.raises(FileNotFoundError):
        tbl.tag("nope", 99)
    tbl.tag("t", v1)
    assert tbl.tag("t", v1) == tbl._latest_version()  # no-op re-tag
    with pytest.raises(KeyError):
        tbl.drop_tag("other")


def test_concurrent_appends_no_lost_commits(spark, tbl):
    """8 threads x 3 appends race on one table: optimistic rebase must
    land every commit exactly once (no lost rows, no double rows,
    strictly monotonic versions)."""
    import threading

    frames = {
        (w, i): frame(spark, (w * 3 + i) * 100, (w * 3 + i) * 100 + 100)
        for w in range(8)
        for i in range(3)
    }
    errs = []

    def worker(w):
        try:
            for i in range(3):
                tbl.append(frames[(w, i)], n_files=1, max_retries=40)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append((w, repr(e)))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = tbl.scan(spark)
    assert got.count() == 8 * 3 * 100
    assert got.select("k").distinct().count() == 8 * 3 * 100
    ops = [h["operation"] for h in tbl.history()]
    assert ops.count("append") == 24  # every commit landed exactly once


def test_concurrent_mor_merges_converge(spark, tbl):
    """4 threads race MOR merges on DISJOINT key ranges: merges are
    additive (rebase-and-retry), so all must land and the final state is
    the union of the last writes."""
    import threading

    tbl.append(frame(spark, 0, 400), n_files=2)
    errs = []

    def worker(w):
        try:
            src = frame(spark, w * 100, w * 100 + 100).withColumn(
                "grp", F.lit(f"w{w}")
            )
            tbl.merge_upsert(spark, src, ["k"], mode="mor")
        except Exception as e:  # pragma: no cover
            errs.append((w, repr(e)))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = {r["k"]: r["grp"] for r in tbl.scan(spark).collect()}
    assert len(got) == 400
    for w in range(4):
        assert got[w * 100 + 5] == f"w{w}"
