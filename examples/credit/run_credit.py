#!/usr/bin/env python
"""Credit-scoring end-to-end example — the rebuild's twin of the
reference's binary-classification demo
(examples/classification/binary/credit_scoring/, whose config the
layout follows; its data blobs are missing upstream —
.MISSING_LARGE_BLOBS — so the input here is a deterministic synthetic
application table with the same *shape*: binary TARGET, numeric
features with nulls, categorical features).

Unlike the iris demo (clean numeric multiclass), this example
exercises the preprocessing chain the reference delegates to "outside
the pipeline" (credit_scoring/configs/solution.conf preprocessing
note): grouped mean imputation (J2) → global mean imputation (A4) →
one-hot encoding (preprocessing.py:84-86 equivalent) → stratified CV
with seed bagging → held-out ROC AUC report.

    python examples/credit/run_credit.py --project /tmp/credit_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.ml.metrics import score  # noqa: E402
from fastmlframework_spark.operators.imputation import (  # noqa: E402
    impute_by_group,
    impute_global,
)
from fastmlframework_spark.operators.transforms import (  # noqa: E402
    one_hot_columns,
)
from fastmlframework_spark.pipeline.solution import (  # noqa: E402
    build_solution,
    solution_dir,
)
from fastmlframework_spark.sources import artifacts as art  # noqa: E402
from fastmlframework_spark.sources.config import load_config  # noqa: E402

DATA_SPLIT_SEED = 789987
N_APPLICATIONS = 2400
EMPLOYMENT = ("salaried", "self_employed", "unemployed")
HOUSING = ("own", "rent", "mortgage")


def _u(col, *salts) -> F.Column:
    """Deterministic uniform in [0, 1) from a key column + salts."""
    return (
        F.pmod(F.xxhash64(col, *[F.lit(s) for s in salts]), F.lit(100000))
        / 100000.0
    )


def synth_applications(spark: SparkSession) -> DataFrame:
    """Credit-application table: numeric features with planted NULLs,
    two categoricals (one nullable), and a binary TARGET whose signal
    flows through exactly the features the pipeline must impute and
    encode — so a broken preprocessing step shows up as a near-0.5
    held-out AUC, not a subtle degradation."""
    base = spark.range(N_APPLICATIONS).select(
        F.col("id").alias("app_id"),
        F.element_at(
            F.array(*[F.lit(e) for e in EMPLOYMENT]),
            (F.pmod(F.xxhash64("id", F.lit("emp")), F.lit(3)) + 1).cast("int"),
        ).alias("employment"),
        F.element_at(
            F.array(*[F.lit(h) for h in HOUSING]),
            (F.pmod(F.xxhash64("id", F.lit("hou")), F.lit(3)) + 1).cast("int"),
        ).alias("housing"),
        (F.round(25 + _u(F.col("id"), "age") * 40, 1)).alias("age"),
        F.round(
            2000
            + _u(F.col("id"), "inc") * 6000
            + F.when(
                F.pmod(F.xxhash64("id", F.lit("emp")), F.lit(3)) == 0, 1500
            ).otherwise(0),
            2,
        ).alias("income"),
        F.round(500 + _u(F.col("id"), "loan") * 20000, 2).alias("loan_amount"),
        F.round(_u(F.col("id"), "debt") * 0.9, 4).alias("debt_ratio"),
    )
    # Signal: high debt ratio + high loan relative to income + being
    # unemployed push default probability up; noise keeps AUC < 1.
    risk = (
        F.col("debt_ratio") * 2.0
        + F.col("loan_amount") / (F.col("income") * 8)
        + F.when(F.col("employment") == "unemployed", 0.8).otherwise(0.0)
        + F.when(F.col("housing") == "rent", 0.25).otherwise(0.0)
        + (_u(F.col("app_id"), "noise") - 0.5) * 1.2
    )
    labeled = base.withColumn("TARGET", (risk > 1.55).cast("int"))
    # Planted missingness AFTER the label so imputation must recover
    # usable signal: ~15% of income, ~20% of debt_ratio, ~10% of
    # employment (a nullable categorical for the fill-then-OHE path).
    return labeled.select(
        "app_id",
        F.when(_u(F.col("app_id"), "m_emp") < 0.10, None)
        .otherwise(F.col("employment"))
        .alias("employment"),
        "housing",
        "age",
        F.when(_u(F.col("app_id"), "m_inc") < 0.15, None)
        .otherwise(F.col("income"))
        .alias("income"),
        "loan_amount",
        F.when(_u(F.col("app_id"), "m_debt") < 0.20, None)
        .otherwise(F.col("debt_ratio"))
        .alias("debt_ratio"),
        "TARGET",
    )


def preprocess(df: DataFrame) -> DataFrame:
    """The imputation→OHE chain (reference preprocessing.py semantics,
    Spark-first): employment-grouped mean income, global mean debt
    ratio, 'missing' sentinel for the nullable categorical, then
    one-hot indicators — all map-side joins + projections."""
    out = impute_by_group(
        df, "income", ["employment"], agg="mean", out_col="income_f"
    )
    out = impute_global(out, ["debt_ratio"], agg="mean", suffix="_f")
    out = out.fillna({"employment": "missing"})
    out = one_hot_columns(out, ["employment", "housing"])
    return out.drop("income", "debt_ratio", "employment", "housing")


def make_project_data(spark: SparkSession, project: str) -> str:
    df = preprocess(synth_applications(spark))
    pos = F.row_number().over(
        Window.partitionBy("TARGET").orderBy(
            F.xxhash64(F.col("app_id"), F.lit(DATA_SPLIT_SEED))
        )
    )
    keyed = df.withColumn("__pos", pos)
    train = keyed.filter(F.col("__pos") % 4 != 0).drop("__pos")
    test = keyed.filter(F.col("__pos") % 4 == 0).drop("__pos")

    feature_cols = [c for c in df.columns if c not in ("app_id", "TARGET")]
    raw = os.path.join(project, "raw_data")
    os.makedirs(raw, exist_ok=True)
    train.select("app_id", *feature_cols, "TARGET").coalesce(1).write.option(
        "header", True
    ).mode("overwrite").csv(os.path.join(raw, "train_dir"))
    test.select("app_id", *feature_cols).coalesce(1).write.option(
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
    test.select("app_id", "TARGET").write.mode("overwrite").parquet(heldout)
    return heldout


def run(project: str, config_path: str | None = None) -> dict:
    spark = get_spark(app_name="fastml-credit")
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
    pred_col = [c for c in test_pred.columns if c != "app_id"][0]
    test_pred = test_pred.select("app_id", F.col(pred_col).alias("__score"))
    heldout = spark.read.parquet(heldout_path)
    joined = heldout.join(test_pred, on="app_id")
    auc = round(
        score(joined, "roc_auc_score", "TARGET", "__score"),
        int(config["cv_defaults"]["metrics_decimals"]),
    )
    cv = manifest["cv_results"]
    report = {
        "tasks_run": ran,
        "cv_results": cv,
        "test_auc": auc,
        "n_test": joined.count(),
        "out_dir": out_dir,
    }
    for row in cv:
        print(
            f"seed {row['seed']}: CV roc_auc {row['cv_mean_score']}"
            f" +/- {row['cv_std']}"
        )
    print(f"\nTest: ROC_AUC_SCORE={auc}\n")
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()
    run(args.project, args.config)


if __name__ == "__main__":
    main()
