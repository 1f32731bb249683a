"""UPDATE ... WHERE and conditional MERGE clauses (dff/tablefmt.py):
the remaining Delta-style write surface — COW update with stat-pruned
rewrites, and WHEN MATCHED [AND cond] THEN UPDATE / DELETE plus
WHEN NOT MATCHED [AND cond] THEN INSERT.

Reference analog: the reference refreshes its Delta scoring tables by
full overwrite (``/root/reference/01_dff_model.py:481-485``); these are
the surgical row-level verbs a 100 TB table needs instead.
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
    return Table.create(str(tmp_path / "t"), SCHEMA)


# ----------------------------------------------------------- update_where
def test_update_where_basic(spark, tbl):
    tbl.append(frame(spark, 0, 100), n_files=2)
    tbl.update_where(
        spark, [("k", "between", (10, 19))], {"v": "v * 10", "grp": "'hot'"}
    )
    got = {r["k"]: (r["grp"], r["v"]) for r in tbl.scan(spark).collect()}
    assert got[15] == ("hot", 15 * 1.5 * 10)
    assert got[5] == ("g1", 7.5)  # untouched
    assert len(got) == 100
    assert [h["operation"] for h in tbl.history()][-1] == "update"


def test_update_where_rewrites_only_overlapping_files(spark, tbl):
    # range-clustered commits -> tight per-file bounds
    for r in range(4):
        tbl.append(frame(spark, 100 * r, 100 * (r + 1)), n_files=1)
    before = {e["path"] for e in tbl.entries()}
    tbl.update_where(spark, [("k", "between", (150, 160))], {"v": "0.0"})
    after = {e["path"] for e in tbl.entries()}
    # three of the four original files carried by reference
    assert len(before & after) == 3
    # 11 updated rows plus k=0 whose v is naturally 0.0
    assert tbl.scan(spark).where(F.col("v") == 0.0).count() == 12


def test_update_where_null_predicate_rows_survive_unchanged(spark, tbl):
    rows = frame(spark, 0, 10).withColumn(
        "k", F.when(F.col("k") < 5, F.col("k"))
    )
    tbl.append(rows, n_files=1)
    tbl.update_where(spark, [("k", ">=", 0)], {"v": "-1.0"})
    got = tbl.scan(spark).collect()
    # NULL-k rows keep their original v (WHERE NULL is not TRUE)
    assert all(r["v"] != -1.0 for r in got if r["k"] is None)
    assert all(r["v"] == -1.0 for r in got if r["k"] is not None)


def test_update_where_casts_to_column_type_and_validates(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    with pytest.raises(ValueError, match="no such column"):
        tbl.update_where(spark, [("k", "=", 1)], {"nope": "1"})
    # integer-valued expression lands as the column's double type
    tbl.update_where(spark, [("k", "=", 1)], {"v": "7"})
    [r] = tbl.scan(spark).where(F.col("k") == 1).collect()
    assert r["v"] == 7.0 and isinstance(r["v"], float)


def test_update_where_no_match_is_noop_commit(spark, tbl):
    v = tbl.append(frame(spark, 0, 10), n_files=1)
    assert tbl.update_where(spark, [("k", ">", 10**9)], {"v": "0.0"}) == v


# ------------------------------------------------- conditional MERGE
def src_rows(spark, lo, hi, v=99.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit("src").alias("grp"),
        F.lit(v).alias("v"),
    )


def test_merge_matched_condition_gates_update(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    # only matched rows whose TARGET v exceeds 9 update
    tbl.merge_upsert(
        spark,
        src_rows(spark, 0, 20),
        ["k"],
        matched_condition="t.v > 9.0",
    )
    got = {r["k"]: (r["grp"], r["v"]) for r in tbl.scan(spark).collect()}
    assert len(got) == 20
    assert got[3] == ("g3", 4.5)  # matched, cond false -> target kept
    assert got[8] == ("src", 99.0)  # matched, t.v=12.0 > 9 -> updated
    assert got[15] == ("src", 99.0)  # unmatched -> inserted


def test_merge_matched_delete_condition(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.merge_upsert(
        spark,
        src_rows(spark, 0, 10),
        ["k"],
        matched_delete_condition="s.v > t.v",  # delete where source wins
        matched_condition="1 = 0",  # never update
    )
    got = sorted(r["k"] for r in tbl.scan(spark).collect())
    # source v=99 beats every target v (max 13.5): all matched rows
    # delete, and a matched source row never inserts
    assert got == []


def test_merge_delete_checked_before_update(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.merge_upsert(
        spark,
        src_rows(spark, 0, 5),
        ["k"],
        matched_delete_condition="t.k < 2",
        matched_condition="t.k >= 0",  # would match everything
    )
    got = {r["k"]: r["grp"] for r in tbl.scan(spark).collect()}
    assert 0 not in got and 1 not in got  # deleted, not updated
    assert got[3] == "src"  # updated
    assert got[7] == "g3"  # unmatched target survives


def test_merge_not_matched_condition_gates_insert(spark, tbl):
    tbl.append(frame(spark, 0, 10), n_files=1)
    tbl.merge_upsert(
        spark,
        src_rows(spark, 5, 20),
        ["k"],
        not_matched_condition="s.k % 2 = 0",
    )
    got = {r["k"]: r["grp"] for r in tbl.scan(spark).collect()}
    # matched rows update-all (no matched_condition)
    assert got[7] == "src"
    # unmatched: only even keys insert
    assert 12 in got and 13 not in got
    assert got[12] == "src"


def test_merge_null_condition_counts_as_false(spark, tbl):
    tbl.append(frame(spark, 0, 4), n_files=1)
    src = spark.createDataFrame(
        [(0, "src", None), (1, "src", 5.0)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("grp", T.StringType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    tbl.merge_upsert(
        spark, src, ["k"], matched_condition="s.v > t.v"
    )  # NULL s.v -> condition NULL -> target kept
    got = {r["k"]: r["grp"] for r in tbl.scan(spark).collect()}
    assert got[0] == "g0" and got[1] == "src"


def test_conditional_merge_refused_under_mor(spark, tbl):
    tbl.append(frame(spark, 0, 4), n_files=1)
    with pytest.raises(ValueError, match="mor"):
        tbl.merge_upsert(
            spark,
            src_rows(spark, 0, 4),
            ["k"],
            mode="mor",
            matched_condition="t.v > 1",
        )


def test_conditional_merge_with_evolution(spark, tbl):
    tbl.append(frame(spark, 0, 6), n_files=1)
    src = src_rows(spark, 3, 9).withColumn("w", F.lit(1.25))
    tbl.merge_upsert(
        spark, src, ["k"], evolve=True, matched_condition="t.k >= 4"
    )
    got = {r["k"]: (r["grp"], r["w"]) for r in tbl.scan(spark).collect()}
    assert got[3] == ("g3", None)  # matched, cond false -> old row, NULL w
    assert got[4] == ("src", 1.25)  # matched, updated, carries new column
    assert got[7] == ("src", 1.25)  # inserted
    assert len(got) == 9
