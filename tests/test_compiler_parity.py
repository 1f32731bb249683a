"""Verdict parity: the engine's single vectorized pass must reproduce the
pandas oracle's row-at-a-time reference semantics exactly
(/root/reference/02_dff_orchestration.py:215-250)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.compiler import compile_ruleset, validate_rule_sql
from dff.ruleset import parse_json
from tests.fixtures import RULESET_JSON, txns_fixture
from tests.oracle import oracle_verdicts


def spark_txn_scorer(df):
    return F.least(F.lit(1.0), F.col("DISTANCE_FROM_HOME") / 7000.0)


def oracle_txn_scorer(row):
    return min(1.0, row["DISTANCE_FROM_HOME"] / 7000.0)


def test_verdict_parity_full_dag(spark):
    pdf = txns_fixture(512)
    rs = parse_json(RULESET_JSON)
    df = spark.createDataFrame(pdf)
    compiled = compile_ruleset(rs, df, scorers={"score:txn_score": spark_txn_scorer})
    got = (
        df.withColumn("verdict", compiled.verdict)
        .select("AUTH_ID", "verdict")
        .toPandas()
        .set_index("AUTH_ID")["verdict"]
        .sort_index()
    )
    want = oracle_verdicts(
        pdf, RULESET_JSON["rules"], sensitivity=0.7,
        scorers={"score:txn_score": oracle_txn_scorer},
    )
    want.index = pdf["AUTH_ID"]
    want = want.sort_index()
    mismatches = [
        (i, g, w)
        for i, (g, w) in enumerate(zip(got.tolist(), want.tolist()))
        if (g or None) != (w or None)
    ]
    assert not mismatches, mismatches[:10]
    # every rule actually fires somewhere, and some rows pass
    assert got.isna().sum() > 0
    fired = set(got.dropna().unique())
    assert "LAST_ADR_CHNG_DUR < 300" in fired
    assert "AUTHZN_AMT > ACCT_AVL_CASH_BEFORE_AMT" in fired


def test_priority_not_gating(spark):
    """Edges define priority only: a child rule fires even when its parent
    did not (reference: every node compiled and evaluated,
    02_dff_orchestration.py:215-242)."""
    pdf = txns_fixture(16)
    # row 3 fixture: R1-R3 false, R4 true
    rs = parse_json(RULESET_JSON)
    df = spark.createDataFrame(pdf)
    compiled = compile_ruleset(rs, df, scorers={"score:txn_score": spark_txn_scorer})
    row3 = (
        df.withColumn("verdict", compiled.verdict)
        .where(F.col("AUTH_ID") == 3)
        .select("verdict")
        .first()[0]
    )
    assert row3 == "LAST_ADR_CHNG_DUR < 300"


def test_unregistered_scorer_degrades_to_zero(spark):
    """models:/ rule with no scorer never triggers (02_dff_orchestration.py:203-212)."""
    pdf = txns_fixture(64)
    spec = {
        "sensitivity": 0.7,
        "rules": [{"id": "M", "name": "models:/missing/production", "requires": []}],
    }
    rs = parse_json(spec)
    df = spark.createDataFrame(pdf)
    compiled = compile_ruleset(rs, df)
    assert compiled.degraded == ["M"]
    n_triggered = (
        df.withColumn("verdict", compiled.verdict)
        .where(F.col("verdict").isNotNull())
        .count()
    )
    assert n_triggered == 0


def test_threshold_is_gte(spark):
    """Trigger is score >= sensitivity, not > (02_dff_orchestration.py:239)."""
    pdf = txns_fixture(8)
    spec = {
        "sensitivity": 0.7,
        "rules": [{"id": "S", "name": "score:const", "requires": []}],
    }
    rs = parse_json(spec)
    df = spark.createDataFrame(pdf)
    compiled = compile_ruleset(rs, df, scorers={"score:const": lambda d: F.lit(0.7)})
    assert (
        df.withColumn("v", compiled.verdict).where(F.col("v").isNotNull()).count()
        == len(pdf)
    )


def test_sql_injection_rejected():
    with pytest.raises(ValueError):
        validate_rule_sql(
            "AUTHZN_AMT > 1; drop table users", ["AUTHZN_AMT"]
        )
    with pytest.raises(ValueError):
        validate_rule_sql("SECRET_COL > 1", ["AUTHZN_AMT"])
    validate_rule_sql("AUTHZN_AMT > 1 and AUTHZN_AMT < 5", ["AUTHZN_AMT"])
