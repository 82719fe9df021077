"""Distributed metric registry (SURVEY.md §2.9 M9, §2.4 A20/A21).

Reference behavior: metric functions resolved by name from
sklearn.metrics (generic_tools/utils.py:74-88) and applied to OOF
prediction arrays (modeling/prediction.py:398-405).

Here every metric is a DataFrame aggregate — one job, no driver
materialization of predictions — so scoring a 100 TB OOF table is a
grouped reduction, not a collect.  Expression builders (``*_expr``)
and the multi-step ``roc_auc_df`` return LAZY plans; the float API the
CV engine uses (``score``) just takes ``.first()`` of those.  A21
std-of-scores stays driver-side over k scalars, as in the reference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def accuracy_expr(label_col: str, pred_col: str) -> Column:
    return F.avg((F.col(label_col) == F.col(pred_col)).cast("double"))


def mse_expr(label_col: str, pred_col: str) -> Column:
    return F.avg(F.pow(F.col(label_col) - F.col(pred_col), 2))


def rmse_expr(label_col: str, pred_col: str) -> Column:
    return F.sqrt(mse_expr(label_col, pred_col))


def mae_expr(label_col: str, pred_col: str) -> Column:
    return F.avg(F.abs(F.col(label_col) - F.col(pred_col)))


def r2_expr(label_col: str, pred_col: str) -> Column:
    ss_res = F.sum(F.pow(F.col(label_col) - F.col(pred_col), 2))
    ss_tot = F.sum(F.pow(F.col(label_col), 2)) - F.pow(
        F.sum(label_col), 2
    ) / F.count(F.lit(1))
    return 1.0 - ss_res / ss_tot


def log_loss_expr(label_col: str, proba_col: str, eps: float = 1e-15) -> Column:
    """Binary log loss with sklearn's probability clipping."""
    p = F.least(F.greatest(F.col(proba_col), F.lit(eps)), F.lit(1 - eps))
    y = F.col(label_col).cast("double")
    return -F.avg(y * F.log(p) + (1 - y) * F.log(1 - p))


METRIC_EXPRS = {
    "accuracy_score": accuracy_expr,
    "mean_squared_error": mse_expr,
    "root_mean_squared_error": rmse_expr,
    "mean_absolute_error": mae_expr,
    "r2_score": r2_expr,
    "log_loss": log_loss_expr,
}

# Metrics where larger is better — drives HPO maximize/minimize and the
# reference's best-threshold ranking direction (feature_selection.py:326-333).
GREATER_IS_BETTER = {"accuracy_score", "r2_score", "roc_auc_score"}


def roc_auc_df(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """Rank-based AUC (Mann-Whitney U) with average ranks on ties —
    exactly sklearn's tie handling.  Ranks come from a cumulative
    window over the DISTINCT score domain (bounded cardinality), not
    over rows.  Returns a 1-row DataFrame with column ``auc``."""
    d = df.select(
        F.col(score_col).alias("__s"), F.col(label_col).cast("double").alias("__y")
    )
    per_score = d.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__npos")
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "__below", F.coalesce(F.sum("__n").over(w), F.lit(0))
    ).withColumn("__avg_rank", F.col("__below") + (F.col("__n") + 1) / 2.0)
    return ranked.agg(
        (
            (
                F.sum(F.col("__npos") * F.col("__avg_rank"))
                - F.sum("__npos") * (F.sum("__npos") + 1) / 2.0
            )
            / (F.sum("__npos") * F.sum(F.col("__n") - F.col("__npos")))
        ).alias("auc")
    )


def score(df: DataFrame, metric: str, label_col: str, pred_col: str) -> float:
    """M9/A20: resolve a metric by its sklearn name and evaluate it."""
    if metric == "roc_auc_score":
        val = roc_auc_df(df, label_col, pred_col).first()["auc"]
        if val is None:
            raise ValueError("roc_auc_score needs both classes present")
        return float(val)
    try:
        expr = METRIC_EXPRS[metric](label_col, pred_col)
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; one of "
            f"{sorted([*METRIC_EXPRS, 'roc_auc_score'])}"
        ) from None
    return float(df.agg(expr.alias("m")).first()["m"])
