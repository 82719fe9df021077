"""Feature selection by target permutation (SURVEY.md §2.8 C2/C5,
§2.4 A13/A14, §2.5 W1, §2.9 M10).

Reference pipeline (modeling/feature_selection.py):
* actual importance distribution — one fit on true labels, :171-180
* null importance distribution — nb_runs fits on permuted labels,
  :182-198 (runs tagged ``run=i``)
* feature scoring — :200-233; default score (:221):
  log(1e-10 + actual / (1 + percentile75(null)))
* null-vs-actual percentile score (A14, :594-595):
  100·mean(null < percentile25(actual))
* threshold sweep + rank-based best threshold (W1) — :264-340

Spark shape: importances are small per-feature tables; fits are Spark
jobs.  The null runs are INDEPENDENT, so they run concurrently on a
driver thread pool (C5) — each thread submits its own Spark job chain;
the cluster schedules them into free executor slots.  Scoring is a
groupBy(feature) aggregate over the unioned importance tables.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.ml.folds import permute_labels
from fastmlframework_spark.ml.wrappers import ModelWrapper


def _importance_frame(
    wrapper: ModelWrapper,
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    run: int,
) -> DataFrame:
    fitted = wrapper.fit(df, feature_cols, target_col)
    spark = df.sparkSession
    rows = [(f, float(v), run) for f, v in fitted.feature_importances()]
    return spark.createDataFrame(rows, ["feature", "importance", "run"])


def actual_importances(
    wrapper: ModelWrapper,
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
) -> DataFrame:
    """One fit on the TRUE labels → [feature, importance, run=-1]."""
    return _importance_frame(wrapper, df, feature_cols, target_col, run=-1)


def null_importances(
    wrapper: ModelWrapper,
    df: DataFrame,
    key_col: str,
    feature_cols: Sequence[str],
    target_col: str,
    n_runs: int = 20,
    seed: int = 27,
    max_parallel: int = 4,
) -> DataFrame:
    """C5: ``n_runs`` fits on permuted labels, run concurrently on a
    thread pool (independent Spark job chains)."""
    base = df.select(key_col, target_col, *feature_cols).cache()
    base.count()

    def one_run(i: int) -> DataFrame:
        permuted = permute_labels(base, key_col, target_col, seed=seed + i)
        return _importance_frame(wrapper, permuted, feature_cols, target_col, run=i)

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        frames = list(pool.map(one_run, range(n_runs)))
    out = reduce(lambda a, b: a.unionByName(b), frames)
    base.unpersist()
    return out


DEFAULT_SCORE_SQL = (
    "LOG(1e-10 + actual_importance / (1 + null_p75))"
)


def score_features(
    actual: DataFrame,
    null: DataFrame,
    score_expr: str | Callable[[F.Column, F.Column], F.Column] | None = None,
) -> DataFrame:
    """A13/A14/M10 → [feature, actual_importance, null_p75, score,
    pct_null_below].

    ``score_expr``: SQL string over columns ``actual_importance`` /
    ``null_p75`` (M10's pluggable scoring surface), or a 2-arg callable
    producing a Column; default reproduces feature_selection.py:221.
    ``pct_null_below`` is A14: % of null-run importances below the
    actual importance (the 25th-percentile variant of :594 collapses
    to the same shape with a single actual fit).
    """
    nulls = null.groupBy("feature").agg(
        F.expr("percentile(importance, 0.75)").alias("null_p75"),
        F.collect_list("importance").alias("__null_imps"),
    )
    joined = (
        actual.select("feature", F.col("importance").alias("actual_importance"))
        .join(nulls, on="feature", how="left")
        .withColumn(
            "pct_null_below",
            100.0
            * F.aggregate(
                "__null_imps",
                F.lit(0.0),
                lambda acc, x: acc
                + F.when(x < F.col("actual_importance"), 1.0).otherwise(0.0),
            )
            / F.greatest(F.size("__null_imps"), F.lit(1)),
        )
        .drop("__null_imps")
    )
    if score_expr is None:
        score_col = F.expr(DEFAULT_SCORE_SQL)
    elif isinstance(score_expr, str):
        score_col = F.expr(score_expr)
    elif callable(score_expr):
        score_col = score_expr(
            F.col("actual_importance"), F.col("null_p75")
        )
    else:
        raise TypeError("score_expr must be None, SQL string, or callable")
    return joined.withColumn("score", score_col)


def select_features(
    scores: DataFrame, threshold: float, score_col: str = "score"
) -> list[str]:
    """P7: features whose score clears the threshold."""
    return [
        r.feature
        for r in scores.filter(F.col(score_col) >= threshold)
        .select("feature")
        .collect()
    ]


def best_threshold(
    sweep: DataFrame,
    score_col: str = "cv_score",
    std_col: str = "cv_std",
    greater_is_better: bool = True,
) -> float:
    """W1 (feature_selection.py:314-340): rank thresholds by CV score
    (method='min' ≡ SQL RANK) and by -std; total rank argmax, ties →
    smallest threshold."""
    from pyspark.sql import Window

    score_order = (
        F.asc(score_col) if greater_is_better else F.desc(score_col)
    )  # higher rank number = better
    ranked = sweep.withColumn(
        "__r1", F.rank().over(Window.orderBy(score_order))
    ).withColumn("__r2", F.rank().over(Window.orderBy(F.desc(std_col))))
    best = (
        ranked.withColumn("__total", F.col("__r1") + F.col("__r2"))
        .orderBy(F.desc("__total"), F.asc("threshold"))
        .first()
    )
    return float(best["threshold"])


def threshold_sweep(
    scores: DataFrame,
    thresholds: Sequence[float],
    cv_runner: Callable[[list[str]], tuple[float, float]],
    score_col: str = "score",
) -> DataFrame:
    """feature_selection.py:264-312: for each threshold, run CV on the
    surviving features → [threshold, n_features, cv_score, cv_std]."""
    spark = scores.sparkSession
    rows = []
    for th in thresholds:
        feats = select_features(scores, th, score_col)
        if not feats:
            continue
        cv_score, cv_std = cv_runner(feats)
        rows.append((float(th), len(feats), float(cv_score), float(cv_std)))
    return spark.createDataFrame(
        rows, ["threshold", "n_features", "cv_score", "cv_std"]
    )
