"""Stats-only validation fast path (dff/statsvalidate.py).

Ground truth is always the full-scan count of ``violation_expr`` — the
stats path must agree exactly while scanning only the files whose
manifest stats cannot decide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from dff.statsvalidate import (
    StatsRule,
    plan_stats_validation,
    validate_table_stats,
)
from dff.tablefmt import Table


def _mk_table(spark, tmp_path, n=4000):
    """Range-clustered table: 8 files of 500 ids each, plus a planted
    null column (id % 11) and a scattered (unclustered) value column."""
    df = (
        spark.range(n)
        .withColumn("val", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("long"))
        .withColumn(
            "maybe",
            F.when(F.col("id") % 11 == 0, F.lit(None)).otherwise(F.col("id")),
        )
    )
    t = Table.create(str(tmp_path / "t"), df.schema)
    for b in range(8):
        t.append(df.where((F.col("id") >= b * 500) & (F.col("id") < (b + 1) * 500)), n_files=1)
    return t, df


RULES = [
    StatsRule("c_id_ge", "id", ">=", lo=1200),          # clustered: 2 full-fail, 1 scan, 5 pass
    StatsRule("c_id_le", "id", "<=", hi=3300),          # clustered from the other side
    StatsRule("c_val_between", "val", "between", lo=100, hi=900),  # scattered: scans everywhere
    StatsRule("c_maybe_nn", "maybe", "not_null"),       # exact from null counts, zero scans
]


def _full_scan_counts(df, rules):
    aggs = [
        F.sum(r.violation_expr().cast("long")).alias(r.constraint_id) for r in rules
    ]
    row = df.agg(*aggs).collect()[0]
    return {r.constraint_id: row[r.constraint_id] for r in rules}


def test_stats_path_matches_full_scan(spark, tmp_path):
    t, df = _mk_table(spark, tmp_path)
    got = {
        r["constraint_id"]: r["violations"]
        for r in validate_table_stats(spark, t, RULES).collect()
    }
    assert got == _full_scan_counts(df, RULES)


def test_plan_prunes_decidable_files(spark, tmp_path):
    t, _ = _mk_table(spark, tmp_path)
    # id >= 1200: files [0,500) and [500,1000) all-fail (decided), file
    # [1000,1500) straddles (scan), the rest pass (decided)
    pl = plan_stats_validation(t, [RULES[0]])
    assert pl.files_total == 8
    assert pl.files_scanned == 1
    assert pl.decided_counts["c_id_ge"] == 1000  # the two all-fail files
    # not_null alone: decidable everywhere, zero files scanned
    pl_nn = plan_stats_validation(t, [RULES[3]])
    assert pl_nn.files_scanned == 0
    assert pl_nn.decided_counts["c_maybe_nn"] == sum(
        1 for i in range(4000) if i % 11 == 0
    )


def test_scan_count_only_accumulates_undecided_files(spark, tmp_path):
    """A rule decided for file A must not double-count A's rows when A is
    scanned for some OTHER undecided rule."""
    t, df = _mk_table(spark, tmp_path)
    rules = [RULES[0], RULES[2]]  # c_val_between forces scans of all files
    pl = plan_stats_validation(t, rules)
    assert pl.files_scanned == 8  # val is scattered -> every file scans
    got = {
        r["constraint_id"]: r["violations"]
        for r in validate_table_stats(spark, t, rules).collect()
    }
    assert got == _full_scan_counts(df, rules)


def test_all_null_file_decides_range_rules(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("x", T.LongType()),
        ]
    )
    df = spark.range(100).withColumn("x", F.lit(None).cast("long"))
    t = Table.create(str(tmp_path / "nulls"), schema)
    t.append(df, n_files=1)
    rule = StatsRule("c_x_ge", "x", ">=", lo=0)
    pl = plan_stats_validation(t, [rule])
    assert pl.files_scanned == 0
    assert pl.decided_counts["c_x_ge"] == 100


def test_string_bounds_supported(spark, tmp_path):
    df = spark.range(200).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, F.lit("python")).otherwise(F.lit("go"))
    )
    t = Table.create(str(tmp_path / "s"), df.schema)
    t.append(df.where(F.col("lang") == "go"), n_files=1)
    t.append(df.where(F.col("lang") == "python"), n_files=1)
    # lang >= 'k': the all-go file is decidably all-fail, python file passes
    rule = StatsRule("c_lang_ge", "lang", ">=", lo="k")
    pl = plan_stats_validation(t, [rule])
    assert pl.files_scanned == 0
    got = validate_table_stats(spark, t, [rule]).collect()[0]
    assert got["violations"] == 100


def test_bad_rule_rejected():
    with pytest.raises(ValueError):
        StatsRule("c", "x", "~")
    with pytest.raises(ValueError):
        StatsRule("c", "x", ">=")  # missing lo
