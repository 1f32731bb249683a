"""dff.repair (imputation) + dff.fd (functional dependencies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.fd import fd_violation_rows, fd_violations
from dff.repair import impute


def test_impute_mean_per_group_with_global_fallback(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None),
            ("b", 4, None), ("b", 5, None),  # all-null group -> global
        ],
        "grp string, id int, v double",
    )
    out = {r["id"]: (r["v"], r["was_imputed"]) for r in
           impute(df, "v", ["grp"], "mean").collect()}
    assert out[3] == (15.0, True)
    assert out[4] == (15.0, True)  # global mean of {10,20}
    assert out[1] == (10.0, False)


def test_impute_median_constant_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 9.0), (3, 100.0), (4, None)], "id int, v double"
    )
    med = {r["id"]: r["v"] for r in impute(df, "v", strategy="median").collect()}
    assert med[4] == 9.0
    const = {r["id"]: r["v"] for r in
             impute(df, "v", strategy="constant", fill_value=-1.0).collect()}
    assert const[4] == -1.0
    with pytest.raises(ValueError):
        impute(df, "v", strategy="mode")
    with pytest.raises(ValueError):
        impute(df, "v", strategy="constant")
    # all-null column: value stays NULL, flag stays False
    allnull = spark.createDataFrame([(1, None), (2, None)], "id int, v double")
    rows = {r["id"]: (r["v"], r["was_imputed"]) for r in
            impute(allnull, "v", strategy="mean").collect()}
    assert rows[1] == (None, False)


def test_impute_schema_and_flag_opt_out(spark):
    df = spark.createDataFrame([(1, None)], "id int, v double")
    out = impute(df, "v", strategy="constant", fill_value=0.0, flag_col=None)
    assert sorted(out.columns) == ["id", "v"]


def test_fd_violations_and_rows(spark):
    df = spark.createDataFrame(
        [
            ("r1", "c1", "py"), ("r1", "c1", "py"),      # consistent
            ("r1", "c2", "py"), ("r1", "c2", "go"),      # conflict
            ("r2", "c1", None), ("r2", "c1", "rs"),      # NULL vs value = conflict
            ("r3", None, "py"), ("r3", None, "py"),      # NULL det, consistent
        ],
        "repo string, commit string, lang string",
    )
    v = fd_violations(df, ["repo", "commit"], "lang")
    keys = {(r["repo"], r["commit"]) for r in v.collect()}
    assert keys == {("r1", "c2"), ("r2", "c1")}
    assert all(r["n_conflicts"] == 2 for r in v.collect())
    rows = fd_violation_rows(df, ["repo", "commit"], "lang")
    assert rows.count() == 4  # 2 conflicted keys x 2 rows each
    with pytest.raises(ValueError):
        fd_violations(df, [], "lang")


def test_fd_holds_on_real_join_key(spark):
    # orders: o_orderkey -> o_custkey is a true FD (primary key)
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert fd_violations(o, ["o_orderkey"], "o_custkey").count() == 0


def test_fd_shuffle_is_pair_compressed(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        fd_violations(e, ["user_id"], "event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the distinct-pairs aggregation must sit below the first exchange
    # (map-side combine => the shuffle carries distinct pairs, not rows)
    first_exchange = plan.split("Exchange hashpartitioning")[-1]
    assert "HashAggregate" in first_exchange, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "value#" not in line and "props#" not in line, line


def test_monotonic_violations(spark):
    from dff.fd import monotonic_violations

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 11.0),  # 3 violates
            ("a", 4, None), ("a", 5, 11.5),  # NULL skipped; 11.5 < 12 violates
            ("b", 1, 5.0), ("b", 2, 5.0),    # equal ok unless strict
        ],
        "k string, seq int, v double",
    )
    got = {(r["k"], r["seq"]): r["prev_max"] for r in
           monotonic_violations(df, ["k"], ["seq"], "v").collect()}
    # running-max semantics: the dip at seq 3 AND the still-below-high
    # 11.5 at seq 5 both violate (max so far = 12.0)
    assert got == {("a", 3): 12.0, ("a", 5): 12.0}
    strict = {(r["k"], r["seq"]) for r in
              monotonic_violations(df, ["k"], ["seq"], "v", strict=True).collect()}
    assert ("b", 2) in strict
    import pytest

    with pytest.raises(ValueError):
        monotonic_violations(df, [], ["seq"], "v")
