#!/usr/bin/env python
"""Iris end-to-end example — the rebuild's twin of the reference's
``run_cv_and_prediction_iris`` demo (modeling/prediction.py:850-969):
stratified 75/25 split (data_split_seed 789987), 3-fold stratified CV
with seed bagging, test prediction by per-key vote, and a final
held-out ``Test: ACCURACY_SCORE=...`` report.

    python examples/iris/run_iris.py --project /tmp/iris_demo

Input: the reference's bundled iris train.csv when present
(/root/reference/examples/classification/multiclass/iris/raw_data/
train.csv, 112 rows — FIXTURES.md §1); otherwise a deterministic
synthetic iris-alike (three seeded Gaussian clusters) so the example
is runnable standalone.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession, Window  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.ml.metrics import score  # noqa: E402
from fastmlframework_spark.pipeline.solution import (  # noqa: E402
    build_solution,
    solution_dir,
)
from fastmlframework_spark.sources import artifacts as art  # noqa: E402
from fastmlframework_spark.sources.config import load_config  # noqa: E402

REFERENCE_TRAIN = (
    "/root/reference/examples/classification/multiclass/iris/raw_data/train.csv"
)
DATA_SPLIT_SEED = 789987  # prediction.py:887 data_split_seed
FEATURES = ["sepal_length", "sepal_width", "petal_length", "petal_width"]


def load_iris_frame(spark: SparkSession):
    """Reference iris CSV (spaces/parens in names → snake_case, like the
    reference's own engineered feature set) or a synthetic fallback."""
    if os.path.exists(REFERENCE_TRAIN):
        df = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(REFERENCE_TRAIN)
        )
        renames = {
            "sepal length (cm)": "sepal_length",
            "sepal width (cm)": "sepal_width",
            "petal length (cm)": "petal_length",
            "petal width (cm)": "petal_width",
        }
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return df.select(*FEATURES, F.col("TARGET").cast("int").alias("TARGET"))
    # Synthetic: three Gaussian clusters, linearly separable enough for
    # a >0.8 held-out accuracy — deterministic via per-row hash noise.
    base = spark.range(150).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("TARGET")
    )
    centers = {  # loosely iris-like feature means per class
        0: (5.0, 3.4, 1.5, 0.25),
        1: (5.9, 2.8, 4.3, 1.3),
        2: (6.6, 3.0, 5.5, 2.0),
    }
    center_cols = []
    for j, f in enumerate(FEATURES):
        expr = F.lit(None).cast("double")
        for cls, c in centers.items():
            expr = F.when(F.col("TARGET") == cls, F.lit(c[j])).otherwise(expr)
        noise = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(j), F.lit(42)), F.lit(1000))
            / 1000.0
            - 0.5
        ) * 0.6
        center_cols.append((expr + noise).alias(f))
    return base.select(*center_cols, "TARGET")


def make_project_data(spark: SparkSession, project: str) -> str:
    """Mint iris_id, stratified 75/25 split, write raw_data/ CSVs (test
    WITHOUT the target, like the reference fixture) and the held-out
    label table used only for the final report."""
    df = load_iris_frame(spark)
    # Deterministic key: position in a full ordering of the (tiny) data.
    w_all = Window.orderBy(*FEATURES, "TARGET")
    keyed = df.withColumn("iris_id", F.row_number().over(w_all)).cache()
    # Stratified split: every 4th row per class (hash-shuffled by the
    # reference's data_split_seed) goes to test — 25%, per-class.
    pos = F.row_number().over(
        Window.partitionBy("TARGET").orderBy(
            F.xxhash64(F.col("iris_id"), F.lit(DATA_SPLIT_SEED))
        )
    )
    keyed = keyed.withColumn("__pos", pos)
    train = keyed.filter(F.col("__pos") % 4 != 0).drop("__pos")
    test = keyed.filter(F.col("__pos") % 4 == 0).drop("__pos")

    raw = os.path.join(project, "raw_data")
    os.makedirs(raw, exist_ok=True)
    train.select("iris_id", *FEATURES, "TARGET").coalesce(1).write.option(
        "header", True
    ).mode("overwrite").csv(os.path.join(raw, "train_dir"))
    test.select("iris_id", *FEATURES).coalesce(1).write.option(
        "header", True
    ).mode("overwrite").csv(os.path.join(raw, "test_dir"))
    for name in ("train", "test"):
        link = os.path.join(raw, f"{name}.csv")
        # Relative target: the OS resolves symlink targets against the
        # link's own directory, so an absolute-from-CWD target breaks
        # under a relative --project; lexists also catches a stale
        # broken link that exists() would follow and miss.
        if not os.path.lexists(link):
            os.symlink(f"{name}_dir", link)
    heldout = os.path.join(project, "heldout_labels")
    test.select("iris_id", "TARGET").write.mode("overwrite").parquet(heldout)
    keyed.unpersist()
    return heldout


def run(project: str, config_path: str | None = None) -> dict:
    spark = get_spark(app_name="fastml-iris")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(project, exist_ok=True)
    config_path = config_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "solution.conf"
    )
    heldout_path = make_project_data(spark, project)
    config = load_config(config_path)

    ran = build_solution(spark, config, project)

    out_dir = solution_dir(
        project, "logistic_regression", run_fs=False, run_hpo=False, bagged=True
    )
    manifest = art.read_json(os.path.join(out_dir, art.MANIFEST))
    test_pred = art.read_artifact(spark, os.path.join(out_dir, "test_pred"))
    # The prediction column carries the target's name (reference
    # sub_preds convention) — alias it before joining the true labels.
    pred_col = [c for c in test_pred.columns if c != "iris_id"][0]
    test_pred = test_pred.select("iris_id", F.col(pred_col).alias("__pred"))
    heldout = spark.read.parquet(heldout_path)
    joined = heldout.join(test_pred, on="iris_id")
    acc = round(
        score(joined, "accuracy_score", "TARGET", "__pred"),
        int(config["cv_defaults"]["metrics_decimals"]),
    )
    cv = manifest["cv_results"]
    report = {
        "tasks_run": ran,
        "cv_results": cv,
        "test_accuracy": acc,
        "n_test": joined.count(),
        "out_dir": out_dir,
    }
    for row in cv:
        print(
            f"seed {row['seed']}: CV accuracy {row['cv_mean_score']}"
            f" +/- {row['cv_std']}"
        )
    # The reference's closing line (prediction.py:967-969):
    print(f"\nTest: ACCURACY_SCORE={acc}\n")
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()
    run(args.project, args.config)


if __name__ == "__main__":
    main()
