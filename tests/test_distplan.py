"""Distributed manifest planning (dff/tablefmt.py::plan_files_distributed):
the Catalyst-evaluated stat predicate must make the IDENTICAL keep-or-
prune decision as the driver loop (_may_match + _partition_may_match) on
every filter operator, including the awkward corners — all-NULL columns,
files with no stats, string bounds, partitioned tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import Table


@pytest.fixture(scope="module")
def tbl(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("distplan") / "t")
    df = (
        spark.range(0, 2000)
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("long"))
        .withColumn("s", F.concat(F.lit("k"), F.lpad(F.col("id") % 50, 4, "0")))
    )
    t = Table.create(root, df.schema)
    # range-clustered commits -> tight, prunable id bounds per file
    for r in range(4):
        t.append(
            df.where((F.col("id") >= 500 * r) & (F.col("id") < 500 * (r + 1))),
            n_files=2,
        )
    # a file whose v column is ALL NULL (prunes for any v predicate)
    t.append(
        df.where(F.col("id") < 10).withColumn("v", F.lit(None).cast("long")),
        n_files=1,
    )
    return t


FILTER_CASES = [
    [("id", "=", 750)],
    [("id", "<", 100)],
    [("id", "<=", 499)],
    [("id", ">", 1900)],
    [("id", ">=", 1500)],
    [("id", "between", (600, 800))],
    [("id", "in", (5, 1205, 1999))],
    [("v", ">=", 0)],                      # prunes the all-NULL-v file
    [("s", "between", ("k0010", "k0020"))],  # string bounds
    [("id", ">=", 400), ("id", "<", 600)],   # conjunction across files
    [("nosuchcol", "=", 1), ("id", "<", 50)],  # missing stats -> keep
    None,
]


@pytest.mark.parametrize("filters", FILTER_CASES)
def test_parity_with_driver_loop(spark, tbl, filters):
    from dff.tablefmt import _may_match

    driver = {
        e["path"]
        for e in tbl.entries()
        if not filters or _may_match(e, filters)
    }
    dist = {e["path"] for e in tbl.plan_files_distributed(spark, filters)}
    assert dist == driver


def test_parity_on_partitioned_table(spark, tmp_path):
    df = spark.range(0, 1000).withColumn(
        "k", (F.col("id") % 10).cast("long")
    )
    t = Table.create(
        str(tmp_path / "pt"), df.schema, partition_spec=[("k", "bucket", 4)]
    )
    t.append(df)
    from dff.tablefmt import _may_match, _partition_may_match

    spec = t.partition_spec()
    for filters in ([("k", "=", 3)], [("k", "in", (1, 7))], None):
        driver = {
            e["path"]
            for e in t.entries()
            if not filters
            or (
                _may_match(e, filters)
                and (not spec or _partition_may_match(e, filters, spec))
            )
        }
        dist = {e["path"] for e in t.plan_files_distributed(spark, filters)}
        assert dist == driver, filters


def test_distributed_plan_rows_match_scan(spark, tbl):
    filters = [("id", "between", (600, 800))]
    planned = tbl.plan_files_distributed(spark, filters)
    assert 0 < len(planned) < len(tbl.entries())
    got = (
        spark.read.schema(tbl.schema())
        .parquet(*[f"{tbl.root}/{e['path']}" for e in planned])
        .where(F.col("id").between(600, 800))
        .count()
    )
    assert got == tbl.scan(spark, filters=filters).count() == 201


def test_files_df_matches_entries(spark, tbl):
    rows = tbl.files_df(spark).select("path", "rows", "bytes").collect()
    assert {(r.path, r.rows, r.bytes) for r in rows} == {
        (e["path"], e["rows"], e["bytes"]) for e in tbl.entries()
    }
    # nested stats stay queryable: total rows via SQL over the metadata
    total = tbl.files_df(spark).agg(F.sum("rows")).first()[0]
    assert total == tbl.scan(spark).count()


def test_snapshots_df_reflects_history(spark, tbl):
    snaps = tbl.snapshots_df(spark).orderBy("version").collect()
    assert [s.operation for s in snaps] == [
        h["operation"] for h in tbl.history()
    ]
    assert snaps[0].operation == "create"


def test_rewrite_manifests_preserves_everything(spark, tmp_path):
    from dff.tablefmt import Table

    df = spark.range(0, 900).withColumn("v", F.col("id") % 7)
    t = Table.create(str(tmp_path / "rm"), df.schema)
    for r in range(9):  # 9 commits -> 9 manifest fragments
        t.append(df.where(F.col("id") % 9 == r), n_files=1)
    t.delete_matching_mor(
        spark, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    before = sorted(
        (e["path"], e["rows"], e.get("seq")) for e in t.entries()
    )
    n_manifests = len(t._snapshot()["manifests"])
    assert n_manifests == 9
    t.rewrite_manifests(target_entries=4)
    after = sorted((e["path"], e["rows"], e.get("seq")) for e in t.entries())
    assert after == before  # entries verbatim, order-insensitive
    assert len(t._snapshot()["manifests"]) == 3  # ceil(9/4)
    assert len(t.delete_entries()) == 1  # tombstones carried
    assert t.scan(spark).count() == 899  # MOR delete still applies
    # idempotent shape: re-running re-chunks 3 -> 3 (same target) and the
    # entry set stays identical
    t.rewrite_manifests(target_entries=4)
    assert sorted(
        (e["path"], e["rows"], e.get("seq")) for e in t.entries()
    ) == before


def test_auto_route_fires_above_threshold(spark, tbl, monkeypatch):
    """r6 (VERDICT r05 #2): scan/scan_file_count/_split_entries route
    through plan_files_distributed above the manifest-size threshold,
    with results identical to the driver loop."""
    import dff.tablefmt as tf

    filters = [("id", "between", (200, 900))]
    driver_rows = sorted(
        map(tuple, tbl.scan(spark, filters).select("id", "v", "s").collect())
    )
    driver_count = tbl.scan_file_count(filters)
    driver_hit, driver_keep = tbl._split_entries(filters, tbl._latest_version())

    calls = {"n": 0}
    orig = tf.Table.plan_files_distributed

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(tf.Table, "plan_files_distributed", counting)
    monkeypatch.setattr(tf, "_DISTPLAN_MIN_MANIFEST_BYTES", 0)

    auto_rows = sorted(
        map(tuple, tbl.scan(spark, filters).select("id", "v", "s").collect())
    )
    assert calls["n"] >= 1  # the switch fired
    assert auto_rows == driver_rows
    assert tbl.scan_file_count(filters) == driver_count
    hit, keep = tbl._split_entries(filters, tbl._latest_version())
    assert sorted(e["path"] for e in hit) == sorted(
        e["path"] for e in driver_hit
    )
    assert sorted(e["path"] for e in keep) == sorted(
        e["path"] for e in driver_keep
    )
    # below the threshold nothing routes distributed
    monkeypatch.setattr(tf, "_DISTPLAN_MIN_MANIFEST_BYTES", 10**12)
    calls["n"] = 0
    assert sorted(
        map(tuple, tbl.scan(spark, filters).select("id", "v", "s").collect())
    ) == driver_rows
    assert calls["n"] == 0
