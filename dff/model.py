"""Model surface (SURVEY.md §2.8): train / split / CV+AUC / score — the
Spark-native twin of the reference's XGBoost flow.

The reference (01_dff_model.py:105-229) fits a StandardScaler + XGBClassifier
on driver-side pandas, cross-validates with sklearn (``cross_val_score``,
``roc_auc``), wraps the pair in an MLflow pyfunc, and the orchestrator
thresholds ``predict_proba[:, 1]`` at the ruleset sensitivity.  Re-expressed
Spark-first — every step distributed, no pandas round-trip:

- preprocessing: ``VectorAssembler`` + ``StandardScaler`` (the fitted-scaler
  semantics of 01_dff_model.py:138-139) inside one ``Pipeline``;
- split: ``DataFrame.randomSplit`` (01_dff_model.py:133 ``train_test_split``);
- model: ``pyspark.ml.classification.GBTClassifier`` — Spark's native
  gradient-boosted trees, the engine-appropriate stand-in for XGBoost
  (same model family; the booster trains ON the cluster instead of on a
  collected sample);
- CV + AUC: ``CrossValidator`` over a small grid scored by
  ``BinaryClassificationEvaluator(areaUnderROC)`` (01_dff_model.py:227,155-157);
- serving: ``score_frame`` appends a ``P(label=1)`` column via the fitted
  pipeline's ``transform``; ``as_scorer`` adapts it to the rule-DAG scorer
  registry so ``score:<name>`` rules threshold it at sensitivity, exactly
  like the reference's orchestrator (02_dff_orchestration.py:203-250).

At 10^12 rows: training runs on a SAMPLE (``fit_scorer(df.sample(...))``) —
boosted-tree fitting is iterative over the training set, so bounding the
sample bounds the iteration cost; SCORING is a map-only transform over the
full table (tree ensembles broadcast with the plan), which is the part that
must scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCORE_COL = "dff_score"


@dataclass
class FittedScorer:
    """A fitted scoring pipeline + its evaluation record."""

    pipeline_model: "pyspark.ml.PipelineModel"  # noqa: F821 (doc type)
    auc_test: float                # held-out AUC (reference: Model AUC is:)
    cv_avg_auc: float              # best grid point's mean CV AUC
    best_max_depth: int
    feature_cols: tuple[str, ...]

    def score_frame(self, df: DataFrame, score_col: str = SCORE_COL) -> DataFrame:
        """Append ``P(label=1)`` as ``score_col`` — a map-only distributed
        transform (the ensemble rides the broadcast plan); drops the ML
        vector intermediates so downstream plans stay relational.

        Dirty-data semantics (the engine's premise): rows with a NULL in
        any feature column get a NULL score instead of crashing the fitted
        ``VectorAssembler`` (its default ``handleInvalid='error'`` throws
        on the first null at scale); re-scoring a frame that already
        carries ``score_col`` replaces the column.
        """
        keep = [c for c in df.columns if c != score_col]
        base = df.select(*keep)
        feats_ok = None
        for c in self.feature_cols:
            cond = F.col(c).isNotNull()
            feats_ok = cond if feats_ok is None else (feats_ok & cond)
        ok = base.where(feats_ok) if feats_ok is not None else base
        scored = self.pipeline_model.transform(ok)
        p1 = _element1(F.col("probability"))
        out = scored.select(*keep, p1.alias(score_col))
        if feats_ok is None:
            return out
        skipped = base.where(~feats_ok).withColumn(
            score_col, F.lit(None).cast("double")
        )
        return out.unionByName(skipped)

    def as_scorer(self, score_col: str = SCORE_COL):
        """Adapter for :func:`dff.compiler.compile_ruleset`'s scorer
        registry: score the frame with :meth:`score_frame` FIRST, then a
        ``score:<name>`` rule reads the column and the compiler thresholds
        it at the ruleset sensitivity."""

        def scorer(df: DataFrame) -> Column:
            if score_col not in df.columns:
                raise ValueError(
                    f"score column {score_col!r} missing: call "
                    "score_frame(df) before compiling the ruleset"
                )
            return F.col(score_col)

        return scorer


def _element1(prob_col: Column) -> Column:
    """P(label=1) from an ML probability vector, JVM-side."""
    from pyspark.ml.functions import vector_to_array

    return F.element_at(vector_to_array(prob_col), 2).cast("double")


def fit_scorer(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    test_fraction: float = 0.3,
    seed: int = 2019,
    max_iter: int = 15,
    max_depth_grid: tuple[int, ...] = (2, 4),
    cv_folds: int = 2,
    step_size: float = 0.3,
) -> FittedScorer:
    """Train the reference-shaped fraud scorer, Spark-distributed.

    Defaults mirror the reference hyperparameters where they transfer
    (n_estimators=15 -> maxIter, lr=0.3 -> stepSize, test_size=0.30,
    random_state=2019 — 01_dff_model.py:133,219-229); ``max_depth`` is
    cross-validated instead of fixed (the reference CVs the whole model,
    01_dff_model.py:205-229).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("label"),
    ).na.drop()
    train, test = base.randomSplit([1.0 - test_fraction, test_fraction], seed=seed)

    assembler = VectorAssembler(inputCols=list(feature_cols), outputCol="__raw")
    scaler = StandardScaler(
        inputCol="__raw", outputCol="features", withMean=True, withStd=True
    )
    gbt = GBTClassifier(
        labelCol="label",
        featuresCol="features",
        maxIter=max_iter,
        stepSize=step_size,
        seed=seed,
    )
    pipe = Pipeline(stages=[assembler, scaler, gbt])
    grid = ParamGridBuilder().addGrid(gbt.maxDepth, list(max_depth_grid)).build()
    evaluator = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=cv_folds,
        seed=seed,
        parallelism=2,
    )
    cv_model = cv.fit(train)
    best = cv_model.bestModel
    best_depth = best.stages[-1].getMaxDepth()
    auc_test = float(evaluator.evaluate(best.transform(test)))
    cv_avg = float(max(cv_model.avgMetrics))
    return FittedScorer(
        pipeline_model=best,
        auc_test=auc_test,
        cv_avg_auc=cv_avg,
        best_max_depth=int(best_depth),
        feature_cols=tuple(feature_cols),
    )
