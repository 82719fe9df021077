"""Oracle-checked queries for the profiling operators (§2.4)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.operators import profiling
from fastmlframework_spark.queries.registry import query

_LI_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _minmax_oracle() -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST(MIN({c}) AS DOUBLE) AS min_val,"
        f" CAST(MAX({c}) AS DOUBLE) AS max_val FROM lineitem"
        for c in _LI_NUM
    ]
    return " UNION ALL ".join(parts)


@query("profile_minmax", oracle=_minmax_oracle())
def profile_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-column min/max of the lineitem measures in one scan."""
    return profiling.column_minmax(load_table(spark, sf_dir, "lineitem"), _LI_NUM)


# Deterministically-derived nulls (the testdata itself is null-free):
# value is null on error events, props on every 7th user.
_EVENTS_NULLS = """
SELECT event_id,
       user_id,
       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
       CASE WHEN user_id % 7 = 0 THEN NULL ELSE props END      AS props
FROM events
"""


def _events_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("user_id") % 7 == 0, None)
        .otherwise(F.col("props"))
        .alias("props"),
    )


def _missing_oracle() -> str:
    cols = ["event_id", "user_id", "value", "props"]
    parts = [
        f"SELECT '{c}' AS \"column\","
        f" COUNT(*) FILTER ({c} IS NULL) AS n_missing,"
        f" ROUND(100.0 * COUNT(*) FILTER ({c} IS NULL) / COUNT(*), 4) AS pct_missing"
        f" FROM ({_EVENTS_NULLS}) t"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@query("profile_missing", oracle=_missing_oracle())
def profile_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-column null count/pct over a frame with derived nulls."""
    return profiling.missing_stats(_events_with_nulls(spark, sf_dir))


@query(
    "profile_value_counts",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n,
       ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM customer), 4) AS pct
FROM customer GROUP BY c_mktsegment
""",
)
def profile_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: normalized value_counts ×100 over customer segments."""
    return profiling.value_counts_pct(load_table(spark, sf_dir, "customer"), "c_mktsegment")


def _skew_kurt_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS "column",
  ROUND(AVG(POWER({c} - m, 3)) / POWER(AVG(POWER({c} - m, 2)), 1.5), 6) AS skewness,
  ROUND(AVG(POWER({c} - m, 4)) / POWER(AVG(POWER({c} - m, 2)), 2) - 3, 6) AS kurtosis
FROM lineitem, (SELECT AVG({c}) AS m FROM lineitem) mm"""
        for c in _LI_NUM
    ]
    return " UNION ALL ".join(parts)


@query("profile_skew_kurt", oracle=_skew_kurt_oracle())
def profile_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8: population skewness + excess kurtosis, all columns one pass.
    Oracle is written from explicit central moments because DuckDB's
    skewness/kurtosis are sample-corrected while Spark's (and scipy's
    bias=True, as the reference uses) are population statistics."""
    return profiling.skew_kurtosis(load_table(spark, sf_dir, "lineitem"), _LI_NUM)


@query(
    "profile_crosstab",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       ROUND(n / SUM(n) OVER (PARTITION BY o_orderstatus), 4) AS pct
FROM (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1, 2
) t
""",
)
def profile_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: row-normalized crosstab of order status × priority."""
    return profiling.crosstab_normalized(
        load_table(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


@query(
    "profile_histogram",
    oracle="""
SELECT CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0), 0), 9) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0), 0), 9) AS BIGINT) * 50000.0 AS bucket_lo,
       (CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0), 0), 9) AS BIGINT) + 1) * 50000.0 AS bucket_hi
FROM orders GROUP BY 1
""",
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: fixed-width left-closed histogram of order totals."""
    return profiling.histogram_fixed_width(
        load_table(spark, sf_dir, "orders"), "o_totalprice", 0.0, 50000.0, 10
    )


@query(
    "profile_correlation",
    oracle="""
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount', ROUND(CORR(l_quantity, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount', ROUND(CORR(l_extendedprice, l_discount), 6) FROM lineitem
""",
)
def profile_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: pairwise Pearson correlations in one aggregate pass."""
    return profiling.correlation_pairs(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@query(
    "profile_distinct",
    oracle="SELECT DISTINCT o_orderstatus FROM orders",
)
def profile_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: distinct label values (class-label discovery)."""
    return profiling.distinct_values(load_table(spark, sf_dir, "orders"), "o_orderstatus")


# ---------------- data_vis preps (visualization.py:30-183) ----------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _corr_heatmap_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    parts = [
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        f" ROUND(CORR({a}, {b}), 6) AS corr FROM lineitem"
        for a, b in pairs
    ] + [
        f"SELECT '{b}', '{a}', ROUND(CORR({a}, {b}), 6) FROM lineitem"
        for a, b in pairs
    ] + [f"SELECT '{c}', '{c}', 1.0" for c in _CORR_COLS]
    return " UNION ALL ".join(parts)


@query("vis_corr_heatmap", oracle=_corr_heatmap_oracle())
def vis_corr_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation-heatmap prep: full symmetric matrix (mirror + unit
    diagonal) in long form, all correlations from ONE scan."""
    from fastmlframework_spark.data_vis.plots import prepare_correlation_heatmap

    return prepare_correlation_heatmap(
        load_table(spark, sf_dir, "lineitem"), _CORR_COLS
    )


@query(
    "vis_feature_vs_target",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) * 50000.0 AS bin_start,
       (CAST(FLOOR(o_totalprice / 50000.0) AS INT) + 1) * 50000.0 AS bin_end,
       o_orderstatus AS target_value,
       COUNT(*) AS n
FROM orders
WHERE o_totalprice >= 0 AND o_totalprice < 500000
GROUP BY 1, 2, 3
""",
)
def vis_feature_vs_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned feature-vs-target prep (plot_numerical_feature_vs_target):
    left-closed pd.cut bins, out-of-range rows dropped, counts stacked
    per target class."""
    from fastmlframework_spark.data_vis.plots import prepare_feature_vs_target

    return prepare_feature_vs_target(
        load_table(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderstatus",
        val_min=0.0,
        val_max=500000.0,
        bin_size=50000.0,
    )


@query(
    "vis_missing_split",
    oracle=f"""
WITH base AS ({_EVENTS_NULLS}),
train AS (SELECT * FROM base WHERE value IS NOT NULL),
test AS (SELECT event_id, user_id, props FROM base WHERE value IS NULL),
stats AS (
  SELECT 'train' AS split, 'props' AS "column",
         COUNT(*) FILTER (props IS NULL) AS n_missing,
         ROUND(100.0 * COUNT(*) FILTER (props IS NULL) / COUNT(*), 4) AS pct_missing
  FROM train
  UNION ALL
  SELECT 'test', 'props',
         COUNT(*) FILTER (props IS NULL),
         ROUND(100.0 * COUNT(*) FILTER (props IS NULL) / COUNT(*), 4)
  FROM test
)
SELECT split, "column", n_missing, pct_missing FROM stats WHERE n_missing > 0
""",
)
def vis_missing_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-data plot prep (plot_missing_values_stats): the
    concatenated frame splits on target null-ness, per-split missing
    stats, features with missing values only."""
    from fastmlframework_spark.data_vis.plots import prepare_missing_values

    return prepare_missing_values(_events_with_nulls(spark, sf_dir), "value")
