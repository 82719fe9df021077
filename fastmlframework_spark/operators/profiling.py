"""Data-profiling operators (SURVEY.md §2.4).

Reference behaviors re-expressed (file:line cite /root/reference/):
* A1 per-column min/max — data_processing/preprocessing.py:27-28
* A2 null count/pct per column — preprocessing.py:57-74
* A5 normalized value_counts ×100 — preprocessing.py:201-202
* A7/A8 skewness/kurtosis — preprocessing.py:271,321-322
* A15 normalized crosstab — data_vis/visualization.py:188-189
* A17 binned histogram counts — visualization.py:105-112 (+ bin builder
  generic_tools/utils.py:103-119)
* A19 distinct values — modeling/prediction.py:151
* A22 correlation matrix — visualization.py:30-31

Where the reference loops per column on the driver
(preprocessing.py:24,:168,:270), these operators compute ALL columns
in ONE aggregate pass (single scan, map-side partial aggregation,
one tiny shuffle) and unpivot the 1-row result to long format — the
scan count stays O(1) in the number of columns, which is what makes
profiling viable on a 100 TB table.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _stack_long(agg_row: DataFrame, cols: Sequence[str], fields: Sequence[str]) -> DataFrame:
    """Unpivot a 1-row aggregate with columns ``{field}__{col}`` into
    long format ``(column, *fields)``."""
    stack_args = ", ".join(
        "'{c}', {vals}".format(c=c, vals=", ".join(f"`{f}__{c}`" for f in fields))
        for c in cols
    )
    out_fields = ", ".join(["column", *fields])
    return agg_row.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as ({out_fields})")
    )


def column_minmax(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A1: min/max for every column in one scan → (column, min_val, max_val)."""
    agg = df.agg(
        *[F.min(c).cast("double").alias(f"min_val__{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_val__{c}") for c in cols],
    )
    return _stack_long(agg, cols, ["min_val", "max_val"])


def missing_stats(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A2: per-column null count and percentage, sorted desc like the
    reference's missing-data table → (column, n_missing, pct_missing)."""
    cols = list(cols or df.columns)
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_missing__{c}")
            for c in cols
        ],
    )
    agg = agg.select(
        "*",
        *[
            F.round(100.0 * F.col(f"n_missing__{c}") / F.col("__total"), 4).alias(
                f"pct_missing__{c}"
            )
            for c in cols
        ],
    )
    return _stack_long(agg, cols, ["n_missing", "pct_missing"]).orderBy(
        F.desc("n_missing"), F.asc("column")
    )


def value_counts_pct(df: DataFrame, col: str, decimals: int = 4) -> DataFrame:
    """A5: per-category relative frequency ×100.

    Total row count is attached via a broadcast cross-join of the 1-row
    global count (never a single-partition window), so the plan scales
    to arbitrarily many categories.
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            col,
            "n",
            F.round(100.0 * F.col("n") / F.col("__total"), decimals).alias("pct"),
        )
    )


def skew_kurtosis(df: DataFrame, cols: Sequence[str], decimals: int = 6) -> DataFrame:
    """A7/A8: population skewness (g1) and excess kurtosis (g2) for all
    columns in one pass → (column, skewness, kurtosis).  Matches
    scipy's ``skew``/``kurtosis`` with ``bias=True, nan_policy='omit'``
    as used by the reference."""
    agg = df.agg(
        *[F.round(F.skewness(c), decimals).alias(f"skewness__{c}") for c in cols],
        *[F.round(F.kurtosis(c), decimals).alias(f"kurtosis__{c}") for c in cols],
    )
    return _stack_long(agg, cols, ["skewness", "kurtosis"])


def crosstab_normalized(
    df: DataFrame, row_col: str, col_col: str, decimals: int = 4
) -> DataFrame:
    """A15: ``pd.crosstab(..., normalize='index')`` in long format →
    (row value, col value, pct of row).  The normalizing window is
    partitioned by the row key, so it distributes."""
    counts = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(row_col)
    return counts.select(
        row_col,
        col_col,
        F.round(F.col("n") / F.sum("n").over(w), decimals).alias("pct"),
    )


def histogram_fixed_width(
    df: DataFrame,
    col: str,
    lo: float,
    width: float,
    nbuckets: int,
    by: str | None = None,
) -> DataFrame:
    """A17: histogram counts over fixed-width, left-closed bins
    (pandas ``pd.cut(right=False)`` convention), values clamped into
    the outer buckets.  Pure expression — no MLlib, no driver pass —
    so it is a plain grouped aggregate at any scale.  Optional ``by``
    adds a per-class breakdown like visualization.py:146-147."""
    bucket = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbuckets - 1),
    ).cast("long")
    keys = ["bucket"] if by is None else ["bucket", by]
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket_lo", (F.lit(lo) + F.col("bucket") * F.lit(width)))
        .withColumn("bucket_hi", (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)))
    )


def correlation_pairs(
    df: DataFrame, cols: Sequence[str], decimals: int = 6
) -> DataFrame:
    """A22: Pearson correlation for every column pair in ONE aggregate
    pass → (col_x, col_y, corr).  n(n-1)/2 `corr` aggregates share the
    single scan; no driver-side pairwise loop."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = df.agg(
        *[
            F.round(F.corr(a, b), decimals).alias(f"corr__{a}__{b}")
            for a, b in pairs
        ]
    )
    stack_args = ", ".join(f"'{a}', '{b}', `corr__{a}__{b}`" for a, b in pairs)
    return agg.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (col_x, col_y, corr)")
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A19: distinct values of a column (class labels)."""
    return df.select(col).distinct()
