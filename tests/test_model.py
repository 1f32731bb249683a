"""§2.8 model surface: distributed train / split / CV+AUC / scorer DAG
integration (the reference's XGBoost flow re-expressed on pyspark.ml)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dff.compiler import compile_ruleset
from dff.model import SCORE_COL, fit_scorer
from dff.ruleset import parse_json


@pytest.fixture(scope="module")
def labeled(spark):
    """Deterministic learnable data: label correlates with a linear blend
    of two features plus hash noise (seeded, partitioning-independent)."""
    df = spark.range(4000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id", F.lit("a")), 1000) / 1000.0).alias("f1"),
        (F.pmod(F.xxhash64("id", F.lit("b")), 1000) / 1000.0).alias("f2"),
        (F.pmod(F.xxhash64("id", F.lit("c")), 1000) / 1000.0).alias("f3"),
    )
    noise = F.pmod(F.xxhash64("id", F.lit("n")), 1000) / 1000.0
    signal = 0.6 * F.col("f1") + 0.4 * F.col("f2") - 0.2 * F.col("f3")
    return df.withColumn(
        "is_fraud", (signal + 0.25 * noise > 0.5).cast("int")
    ).cache()


@pytest.fixture(scope="module")
def scorer(labeled):
    return fit_scorer(
        labeled, ["f1", "f2", "f3"], "is_fraud", max_iter=10, cv_folds=2
    )


def test_cv_auc_and_heldout_auc(scorer):
    # learnable signal -> well above chance on BOTH CV and held-out splits
    assert scorer.auc_test > 0.85, scorer
    assert scorer.cv_avg_auc > 0.85, scorer
    assert scorer.best_max_depth in (2, 4)


def test_score_frame_is_probability_and_relational(labeled, scorer):
    scored = scorer.score_frame(labeled)
    # schema: original columns + one double score, no ML vector residue
    assert scored.columns == labeled.columns + [SCORE_COL]
    stats = scored.agg(
        F.min(SCORE_COL).alias("lo"), F.max(SCORE_COL).alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0
    # scores separate the classes in aggregate
    means = {
        r["is_fraud"]: r["m"]
        for r in scored.groupBy("is_fraud")
        .agg(F.avg(SCORE_COL).alias("m"))
        .collect()
    }
    assert means[1] > means[0] + 0.2


def test_scorer_thresholds_through_rule_dag(labeled, scorer):
    """The fitted model plugs into the compiled rule DAG exactly like the
    reference's pyfunc: score:<name> rule, thresholded at sensitivity."""
    scored = scorer.score_frame(labeled)
    rs = parse_json(
        {
            "version": "ml-v1",
            "sensitivity": 0.7,
            "rules": [{"id": "R_ml", "name": "score:gbt", "requires": []}],
        }
    )
    compiled = compile_ruleset(rs, scored, scorers={"score:gbt": scorer.as_scorer()})
    out = scored.select(SCORE_COL, compiled.verdict_id.alias("vid"))
    mismatches = out.where(
        (F.col(SCORE_COL) >= 0.7) != F.col("vid").isNotNull()
    ).count()
    assert mismatches == 0


def test_unscored_frame_degrades_like_reference_fallback(labeled, scorer):
    """Compiling against a frame that was never score_frame()d must follow
    the engine's scorer-failure semantics (reference parity,
    02_dff_orchestration.py:203-212): degrade to a never-triggering
    constant, flagged on compiled.degraded — not a hard crash."""
    rs = parse_json(
        {"rules": [{"id": "R_ml", "name": "score:gbt", "requires": []}]}
    )
    compiled = compile_ruleset(rs, labeled, scorers={"score:gbt": scorer.as_scorer()})
    assert compiled.degraded  # the missing-column ValueError was caught
    assert labeled.select(compiled.verdict_id.alias("v")).where(
        F.col("v").isNotNull()
    ).count() == 0


def test_score_frame_null_features_and_rescore(spark, labeled, scorer):
    """Code-review r03: null feature values must yield a NULL score (not a
    VectorAssembler crash), and re-scoring replaces the score column."""
    import pyspark.sql.functions as SF

    dirty = labeled.withColumn(
        "f1", SF.when(SF.col("id") % 10 == 0, None).otherwise(SF.col("f1"))
    )
    scored = scorer.score_frame(dirty)
    assert scored.count() == dirty.count()  # no rows lost
    nulls = scored.where(SF.col(SCORE_COL).isNull()).count()
    assert nulls == dirty.where(SF.col("f1").isNull()).count()
    # re-score: single (replaced) score column, no ambiguity
    rescored = scorer.score_frame(scored)
    assert rescored.columns.count(SCORE_COL) == 1
    assert rescored.where(SF.col(SCORE_COL).isNotNull()).count() == (
        dirty.count() - nulls
    )
