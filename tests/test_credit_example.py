"""Credit-scoring example parity (VERDICT r2 #8): binary target,
planted nulls, categoricals — the imputation→OHE→stratified-CV→
seed-bagging chain end-to-end through the solution pipeline, the
binary twin of test_iris_example.py."""

from __future__ import annotations

import os

from examples.credit.run_credit import preprocess, run, synth_applications
from fastmlframework_spark.sources import artifacts as art


def test_preprocess_removes_nulls_and_encodes(spark):
    raw = synth_applications(spark)
    # The synthetic table must actually exercise the chain.
    assert raw.filter(raw.income.isNull()).count() > 100
    assert raw.filter(raw.debt_ratio.isNull()).count() > 100
    assert raw.filter(raw.employment.isNull()).count() > 100

    pre = preprocess(raw).cache()
    assert pre.count() == raw.count()
    for c in ("income_f", "debt_ratio_f"):
        assert pre.filter(pre[c].isNull()).count() == 0
    # OHE indicators, including one for the 'missing' sentinel.
    assert "EMPLOYMENT_MISSING" in pre.columns
    assert "EMPLOYMENT_SALARIED" in pre.columns
    assert "HOUSING_RENT" in pre.columns
    # Raw categorical / un-imputed columns dropped.
    assert {"employment", "housing", "income", "debt_ratio"}.isdisjoint(
        pre.columns
    )
    pre.unpersist()


def test_credit_end_to_end(spark, tmp_path):
    project = str(tmp_path / "credit")
    report = run(project)

    # Signal flows through imputed + encoded features; broken
    # preprocessing collapses the held-out AUC toward 0.5.
    assert report["test_auc"] >= 0.75
    assert report["n_test"] > 400

    cv = report["cv_results"]
    assert [row["seed"] for row in cv] == [27, 99999, 2018]
    for row in cv:
        assert 0.7 < row["cv_mean_score"] <= 1.0
        assert len(row["cv_score_per_each_fold"]) == 4

    # Bagged OOF: one row per train key, probability columns per seed.
    oof = art.read_artifact(spark, os.path.join(report["out_dir"], "train_oof"))
    assert "app_id" in oof.columns and "target" in oof.columns
    seed_cols = [c for c in oof.columns if c.startswith("seed_")]
    assert len(seed_cols) == 3
    n = oof.count()
    assert oof.select("app_id").distinct().count() == n
    # predict_probability=true → float scores in [0, 1].
    assert all(dict(oof.dtypes)[c] == "double" for c in seed_cols)
    bounds = oof.selectExpr(
        *[f"min({c}) as mn_{i}" for i, c in enumerate(seed_cols)],
        *[f"max({c}) as mx_{i}" for i, c in enumerate(seed_cols)],
    ).first()
    for i in range(len(seed_cols)):
        assert 0.0 <= bounds[f"mn_{i}"] and bounds[f"mx_{i}"] <= 1.0

    # O8 memoization: a second run is a no-op.
    report2 = run(project)
    assert report2["tasks_run"] == []
