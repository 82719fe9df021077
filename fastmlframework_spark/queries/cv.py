"""Oracle-checked queries for the CV core: deterministic folds, label
permutation, and distributed metrics (SURVEY.md §2.8 C2/C3, §2.9 M9,
§2.4 A20).  Fold membership and the permutation are EXACTLY
reproduced by the DuckDB oracles (md5-based hashing is engine-
portable), which is stronger than the invariant-only checks promised
in SURVEY.md §5."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.ml import metrics
from fastmlframework_spark.ml.folds import permute_labels, with_fold_column
from fastmlframework_spark.queries.registry import query

# DuckDB twin of folds.fold_hash(key, seed)
def _hash_sql(key: str, seed: int) -> str:
    return (
        f"CAST(concat('0x', substring(md5(CAST({key} AS VARCHAR) || '|' || '{seed}'),"
        f" 1, 15)) AS BIGINT)"
    )


@query(
    "fold_assignment_hash",
    oracle=f"""
SELECT o_orderkey AS key, {_hash_sql('o_orderkey', 27)} % 5 AS fold
FROM orders
""",
)
def fold_assignment_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (scale path): fold = md5(key|seed) mod k — no shuffle, no
    sort, deterministic, engine-portable."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    )
    return with_fold_column(o, "key", k=5, seed=27, method="hash")


@query(
    "fold_assignment_stratified",
    oracle=f"""
SELECT o_orderkey AS key, o_orderstatus,
       NTILE(3) OVER (PARTITION BY o_orderstatus
                      ORDER BY {_hash_sql('o_orderkey', 27)}) - 1 AS fold
FROM orders
""",
)
def fold_assignment_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (StratifiedKFold statistics): ntile over a per-class window
    ordered by the key hash — per-class fold sizes within ±1."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_orderstatus"
    )
    return with_fold_column(
        o, "key", k=3, seed=27, stratify_col="o_orderstatus", method="ntile"
    )


@query(
    "label_permutation",
    oracle=f"""
WITH a AS (
  SELECT o_orderkey AS key,
         ROW_NUMBER() OVER (ORDER BY {_hash_sql('o_orderkey', 7)}) AS pos
  FROM orders
),
b AS (
  SELECT o_orderstatus,
         ROW_NUMBER() OVER (ORDER BY {_hash_sql('o_orderkey', 8)}) AS pos
  FROM orders
)
SELECT a.key, b.o_orderstatus
FROM a JOIN b USING (pos)
""",
)
def label_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: the null-importance target permutation — multiset-preserving
    random reassignment of labels to keys, deterministic in seed."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_orderstatus"
    )
    return permute_labels(o, "key", "o_orderstatus", seed=7)


# Deterministic synthetic scores: binary label vs a logistic score.
_PRED_BASE = """
SELECT o_orderkey AS key,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
       1.0 / (1.0 + EXP(-(o_totalprice / 100000.0 - 1.5))) AS score
FROM orders
"""


def _pred_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        (
            1.0
            / (1.0 + F.exp(-(F.col("o_totalprice") / 100000.0 - 1.5)))
        ).alias("score"),
    )


@query(
    "metric_summary",
    oracle=f"""
SELECT
  ROUND(AVG(CASE WHEN (score > 0.5) = (label = 1) THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
  ROUND(AVG(POWER(label - score, 2)), 6)                                      AS mse,
  ROUND(SQRT(AVG(POWER(label - score, 2))), 6)                                AS rmse,
  ROUND(AVG(ABS(label - score)), 6)                                           AS mae,
  ROUND(-AVG(label * LN(GREATEST(LEAST(score, 1 - 1e-15), 1e-15))
             + (1 - label) * LN(1 - GREATEST(LEAST(score, 1 - 1e-15), 1e-15))), 6) AS logloss
FROM ({_PRED_BASE}) t
""",
)
def metric_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20/M9: accuracy, MSE, RMSE, MAE, log-loss as ONE aggregate
    pass over a (label, score) table — no collect."""
    base = _pred_base(spark, sf_dir).withColumn(
        "pred_label", (F.col("score") > 0.5).cast("int")
    )
    return base.agg(
        F.round(metrics.accuracy_expr("label", "pred_label"), 6).alias("accuracy"),
        F.round(metrics.mse_expr("label", "score"), 6).alias("mse"),
        F.round(metrics.rmse_expr("label", "score"), 6).alias("rmse"),
        F.round(metrics.mae_expr("label", "score"), 6).alias("mae"),
        F.round(metrics.log_loss_expr("label", "score"), 6).alias("logloss"),
    )


@query(
    "metric_roc_auc",
    oracle=f"""
WITH d AS (SELECT score AS s, CAST(label AS DOUBLE) AS y FROM ({_PRED_BASE}) t),
per AS (SELECT s, COUNT(*) AS n, SUM(y) AS npos FROM d GROUP BY s),
c AS (
  SELECT s, n, npos,
         COALESCE(SUM(n) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM per
)
SELECT ROUND(
  (SUM(npos * (below + (n + 1) / 2.0)) - SUM(npos) * (SUM(npos) + 1) / 2.0)
  / (SUM(npos) * SUM(n - npos)), 6) AS auc
FROM c
""",
)
def metric_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: rank-statistic ROC AUC (sklearn tie handling) computed
    distributively over the distinct-score domain."""
    base = _pred_base(spark, sf_dir)
    return metrics.roc_auc_df(base, "label", "score").select(
        F.round("auc", 6).alias("auc")
    )
