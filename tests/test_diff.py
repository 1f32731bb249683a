"""Snapshot diff: added/removed/changed classification + payload-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.diff import snapshot_diff


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, lang string"
    )


def test_classifies_added_removed_changed_and_drops_unchanged(spark):
    old = _frame(
        spark,
        [
            ("r1", "a.py", "x", "python"),
            ("r1", "b.py", "y", "python"),
            ("r1", "gone.py", "z", "python"),
            ("r2", None, "nullkey", "go"),  # NULL key must pair with itself
        ],
    )
    new = _frame(
        spark,
        [
            ("r1", "a.py", "x", "python"),        # unchanged -> absent
            ("r1", "b.py", "y2", "python"),       # changed
            ("r1", "fresh.py", "w", "python"),    # added
            ("r2", None, "nullkey", "rust"),      # changed (lang), not add+remove
        ],
    )
    got = {
        (r["repo"], r["path"], r["change"])
        for r in snapshot_diff(
            new, old, keys=["repo", "path"], compare_cols=["content", "lang"]
        ).collect()
    }
    assert got == {
        ("r1", "b.py", "changed"),
        ("r1", "fresh.py", "added"),
        ("r1", "gone.py", "removed"),
        ("r2", None, "changed"),
    }


def test_null_compare_values_participate(spark):
    old = _frame(spark, [("r", "p", None, "python")])
    new = _frame(spark, [("r", "p", None, "python")])
    assert (
        snapshot_diff(new, old, ["repo", "path"], ["content", "lang"]).count() == 0
    )
    new2 = _frame(spark, [("r", "p", "now-set", "python")])
    rows = snapshot_diff(new2, old, ["repo", "path"], ["content", "lang"]).collect()
    assert [r["change"] for r in rows] == ["changed"]


def test_validation(spark):
    df = _frame(spark, [("r", "p", "c", "l")])
    with pytest.raises(ValueError, match="keys"):
        snapshot_diff(df, df, [], ["content"])
    with pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(df, df, ["repo"], [])


def test_diff_shuffles_keys_and_sig_only(spark):
    from dff.sources import synthetic_source_files

    old = synthetic_source_files(spark, 2000, n_repos=40, seed=1)
    new = synthetic_source_files(spark, 2000, n_repos=40, seed=1).withColumn(
        "content", F.concat(F.col("content"), F.lit("x"))
    )
    plan = (
        snapshot_diff(new, old, ["repo", "path", "commit"], ["content", "lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "content" not in line and "lang" not in line, line


def test_schema_drift_detects_add_remove_retype(spark):
    from dff.diff import schema_drift

    old = spark.createDataFrame([(1, "a", 1.0)], "id int, name string, v double")
    new = spark.createDataFrame([(1, "a", 2)], "id int, name string, v int").withColumn(
        "extra", F.lit(True)
    )
    drift = {d["column"]: d for d in schema_drift(old, new)}
    assert drift["extra"]["change"] == "added"
    assert drift["v"]["change"] == "retyped"
    assert "double" in drift["v"]["old_type"] and "int" in drift["v"]["new_type"]
    assert schema_drift(old, old) == []
    gone = schema_drift(new, old)
    assert {d["change"] for d in gone if d["column"] == "extra"} == {"removed"}
