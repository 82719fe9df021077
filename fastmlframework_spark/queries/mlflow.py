"""Rows-only registry queries for the ML engine surface — model fits
are not SQL-expressible, so the driver records a rows-only check
(SURVEY.md §5); the strong invariants live in tests/test_cv_engine.py.

Kept deliberately small (filtered subsets, few iterations): these
demonstrate the engine end-to-end through the driver contract, not
training throughput.  Excluded from bench timing (bench=False)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.ml.cv import CVPredictor
from fastmlframework_spark.ml.wrappers import ModelWrapper
from fastmlframework_spark.queries.analytics import ml_train_table
from fastmlframework_spark.queries.registry import query

_FEATURES = ["o_totalprice", "c_acctbal", "order_year", "o_orderpriority"]


def _subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic ~1/3 subset keeps driver-side checks fast at sf0.01
    return ml_train_table(spark, sf_dir).filter(F.col("key") % 3 == 0)


@query("cv_oof_logreg", bench=False)
def cv_oof_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 end-to-end: stratified 3-fold CV, logistic regression,
    OOF probability table [key, target_oof, target] — one row per
    train key by construction (W5-by-union)."""
    predictor = CVPredictor(
        ModelWrapper(
            "logistic_regression", "classification", params={"maxIter": 25}
        ),
        metric="roc_auc_score",
        k=3,
        seeds=(27,),
        stratified=True,
        predict_probability=True,
        target_decimals=6,
    )
    res = predictor.run(_subset(spark, sf_dir), None, "key", "target", _FEATURES)
    return res.oof


@query("cv_feature_importance", bench=False)
def cv_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 artifact: mean fold importance per feature from a small GBT
    (FIXTURES.md §3 features_importance schema)."""
    predictor = CVPredictor(
        ModelWrapper(
            "gbt",
            "classification",
            params={"maxIter": 5, "maxDepth": 3},
        ),
        metric="roc_auc_score",
        k=2,
        seeds=(27,),
        stratified=True,
        predict_probability=True,
        target_decimals=6,
    )
    res = predictor.run(
        _subset(spark, sf_dir).filter(F.col("key") % 9 == 0),
        None,
        "key",
        "target",
        _FEATURES,
    )
    return res.feature_importance.select(
        "feature", F.round("importance", 6).alias("importance")
    )
