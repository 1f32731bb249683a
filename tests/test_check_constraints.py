"""Table CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT): write-time
enforcement of rule predicates at the table-format commit gate.

Reference analog: the accelerator's rules score records AFTER the fact
(/root/reference/02_dff_orchestration.py:230-250, per-record SQLite); a
CHECK constraint is the same predicate language applied as a write gate —
a violating batch never becomes a snapshot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.tablefmt import CheckConstraintViolation, CommitConflict, Table


def _tbl(spark, tmp_path, rows=((1, "py", 10), (2, "go", 20))):
    df = spark.createDataFrame(list(rows), "k long, lang string, n long")
    t = Table.create(str(tmp_path / "t"), df.schema)
    t.append(df)
    return t, df.schema


def test_add_is_metadata_only_and_validates_existing(spark, tmp_path):
    t, _ = _tbl(spark, tmp_path)
    before = t.entries()
    v = t.add_check_constraint(spark, "n_positive", "n > 0")
    assert t.entries(v) == before  # no data files touched
    assert t.check_constraints() == {"n_positive": "n > 0"}
    # an add whose predicate existing rows already violate must refuse
    with pytest.raises(CheckConstraintViolation) as e:
        t.add_check_constraint(spark, "n_big", "n > 15")
    assert e.value.violations == {"n_big": 1}
    assert "n_big" not in t.check_constraints()


def test_violating_append_commits_nothing(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    tip = t._snapshot()["version"]
    with pytest.raises(CheckConstraintViolation) as e:
        t.append(spark.createDataFrame([(3, "rs", -5), (4, "rs", -6)], schema))
    assert e.value.violations == {"n_positive": 2}
    assert t._snapshot()["version"] == tip
    assert t.scan(spark).count() == 2
    # the staged-but-unreferenced files are GC fodder, not table state
    t.gc_orphans(grace_seconds=0.0)
    assert t.scan(spark).count() == 2


def test_null_predicate_passes_sql_standard(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.append(spark.createDataFrame([(5, None, None)], schema))
    assert t.scan(spark).count() == 3
    # nullability is an explicit predicate away
    t2 = Table(t.root)
    with pytest.raises(CheckConstraintViolation):
        t2.add_check_constraint(spark, "n_nn", "n is not null")


def test_merge_and_update_paths_are_gated(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    bad = spark.createDataFrame([(1, "py", -1)], schema)
    for mode in ("cow", "mor"):
        tip = t._snapshot()["version"]
        with pytest.raises(CheckConstraintViolation):
            t.merge_upsert(spark, bad, ["k"], mode=mode)
        assert t._snapshot()["version"] == tip
    with pytest.raises(CheckConstraintViolation):
        t.update_where(spark, [("k", "=", 1)], {"n": "-n"})
    # clean variants of all three still work
    t.merge_upsert(spark, spark.createDataFrame([(1, "py", 99)], schema), ["k"])
    t.update_where(spark, [("k", "=", 2)], {"n": "n + 1"})
    assert sorted(
        (r["k"], r["n"]) for r in t.scan(spark).collect()
    ) == [(1, 99), (2, 21)]


def test_drop_constraint_reopens_the_gate(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.drop_check_constraint("n_positive")
    assert t.check_constraints() == {}
    t.append(spark.createDataFrame([(9, "cpp", -9)], schema))
    assert t.scan(spark).count() == 3
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_check_constraint("n_positive")


def test_schema_changes_refuse_referenced_columns(spark, tmp_path):
    t, _ = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    with pytest.raises(ValueError, match="referenced by check constraint"):
        t.rename_column("n", "m")
    with pytest.raises(ValueError, match="referenced by check constraint"):
        t.drop_column("n")
    # unreferenced columns stay evolvable
    t.rename_column("lang", "language")
    assert "language" in [f.name for f in t.schema().fields]


def test_rollback_restores_the_constraint_set(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    pre = t._snapshot()["version"]
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.rollback(pre)
    assert t.check_constraints() == {}
    t.append(spark.createDataFrame([(9, "cpp", -9)], schema))  # gate is gone
    t2 = Table(t.root)
    # re-adding now refuses (the violating row is in the table)
    with pytest.raises(CheckConstraintViolation):
        t2.add_check_constraint(spark, "n_positive", "n > 0")


def test_expression_whitelist_guards_add(spark, tmp_path):
    t, _ = _tbl(spark, tmp_path)
    with pytest.raises(ValueError, match="single expression"):
        t.add_check_constraint(spark, "evil", "n > 0; drop table x")
    with pytest.raises(ValueError, match="unknown identifiers"):
        t.add_check_constraint(spark, "unk", "nosuchcol > 0")
    with pytest.raises(ValueError, match="identifier"):
        t.add_check_constraint(spark, "bad name!", "n > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint(spark, "a", "n > 0")
        t.add_check_constraint(spark, "a", "n > 1")


def test_constraint_commits_are_row_neutral_for_streaming(spark, tmp_path):
    from dff.streaming import stream_from_table

    t, schema = _tbl(spark, tmp_path)
    ck = str(tmp_path / "ck")
    stream_from_table(spark, t.root, ck, lambda df, b: None)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.append(spark.createDataFrame([(3, "rs", 5)], schema))
    t.drop_check_constraint("n_positive")
    got: list = []
    n = stream_from_table(
        spark, t.root, ck, lambda df, b: got.extend(r["k"] for r in df.collect())
    )
    assert n == 1 and got == [3]


def test_branch_writes_inherit_constraints(spark, tmp_path):
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.create_branch("audit")
    br = Table(t.root, branch="audit")
    with pytest.raises(CheckConstraintViolation):
        br.append(spark.createDataFrame([(3, "rs", -5)], schema))
    br.append(spark.createDataFrame([(3, "rs", 5)], schema))
    t.publish_branch("audit")
    t.drop_branch("audit")
    assert t.scan(spark).count() == 3


def test_concurrent_constraint_add_defeats_rebase(spark, tmp_path, monkeypatch):
    # the race: a batch is validated (no constraints yet), then a
    # constraint lands BEFORE the batch's commit — the append's rebase
    # must refuse to smuggle the unchecked rows past the new gate
    t, schema = _tbl(spark, tmp_path)
    orig = Table._materialize

    state = {"fired": False}

    def hooked(self, df, *a, **k):
        entries = orig(self, df, *a, **k)
        if not state["fired"]:
            state["fired"] = True
            Table(self.root).add_check_constraint(
                spark, "n_positive", "n > 0"
            )
        return entries

    monkeypatch.setattr(Table, "_materialize", hooked)
    with pytest.raises(CommitConflict, match="constraints changed"):
        t.append(spark.createDataFrame([(3, "rs", -5)], schema))
    monkeypatch.setattr(Table, "_materialize", orig)
    assert t.scan(spark).count() == 2  # nothing smuggled in
    # the retry (caller-side) now faces the gate properly
    with pytest.raises(CheckConstraintViolation):
        t.append(spark.createDataFrame([(3, "rs", -5)], schema))
    # a concurrent DROP is the benign direction: the batch passed a
    # SUPERSET of the tip's constraints, so the rebase commits
    state2 = {"fired": False}

    def hooked_drop(self, df, *a, **k):
        entries = orig(self, df, *a, **k)
        if not state2["fired"]:
            state2["fired"] = True
            Table(self.root).drop_check_constraint("n_positive")
        return entries

    monkeypatch.setattr(Table, "_materialize", hooked_drop)
    t.append(spark.createDataFrame([(4, "go", 7)], schema))
    assert t.scan(spark).count() == 3


def test_publish_refuses_constraint_added_on_main_after_fork(spark, tmp_path):
    """r6 (ADVICE r05): a constraint added to main AFTER a branch fork was
    never enforced against branch-staged rows; publishing must refuse the
    rebase instead of smuggling a violating row past the active gate."""
    t, schema = _tbl(spark, tmp_path)
    t.create_branch("wap")
    t.add_check_constraint(spark, "n_positive", "n > 0")
    br = Table(t.root, branch="wap")
    # the branch's fork-time constraint set is empty, so this append passes
    br.append(spark.createDataFrame([(3, "rs", -5)], schema))
    with pytest.raises(CommitConflict, match="check constraint"):
        t.publish_branch("wap")
    # main is untouched and the gate still holds
    assert t.scan(spark).count() == 2
    assert t.check_constraints() == {"n_positive": "n > 0"}


def test_publish_ok_when_branch_enforced_the_tip_constraints(spark, tmp_path):
    """Control: main advancing WITHOUT new constraints still rebases, and a
    branch that enforced (inherited) the constraint keeps publishing."""
    t, schema = _tbl(spark, tmp_path)
    t.add_check_constraint(spark, "n_positive", "n > 0")
    t.create_branch("wap")
    br = Table(t.root, branch="wap")
    br.append(spark.createDataFrame([(3, "rs", 5)], schema))
    t.append(spark.createDataFrame([(4, "c", 7)], schema))  # main advances
    t.publish_branch("wap")
    assert t.scan(spark).count() == 4
