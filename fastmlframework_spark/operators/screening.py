"""Column-screening operators (SURVEY.md §2.2 P5/P6, §2.4 A6, §2.7 F8/F9).

Reference behaviors (file:line cite /root/reference/):
* P6 binary-column detection (non-null domain ⊆ {0,1}) —
  data_processing/preprocessing.py:239
* A6 near-zero-variance screen on binary columns (VarianceThreshold
  p(1-p)) — preprocessing.py:242-246
* F8 integer-convertibility test — preprocessing.py:157-176 (the
  reference samples 100 rows; here the default checks the full column
  in the same single aggregate pass, with optional sampling)
* F9 train-vs-test category-share drift with np.isclose semantics —
  preprocessing.py:201-211

All screens are single-scan multi-column aggregates (no per-column
jobs), so cost is one pass over the table regardless of column count.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.operators.profiling import _stack_long, value_counts_pct


def binary_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P6 → (column, is_binary): true iff every non-null value ∈ {0,1}
    and the column has at least one non-null value."""
    agg = df.agg(
        *[
            (
                (
                    F.sum(
                        (F.col(c).isNotNull() & ~F.col(c).isin(0, 1)).cast("long")
                    )
                    == 0
                )
                & (F.count(F.col(c)) > 0)
            ).alias(f"is_binary__{c}")
            for c in cols
        ]
    )
    return _stack_long(agg, cols, ["is_binary"])


def near_zero_variance(
    df: DataFrame, cols: Sequence[str], p: float = 0.95, decimals: int = 6
) -> DataFrame:
    """A6 → (column, variance, is_near_zero): population variance of
    each (binary) column against the sklearn VarianceThreshold bound
    p·(1−p)."""
    thresh = p * (1.0 - p)
    agg = df.agg(
        *[
            F.round(F.var_pop(F.col(c).cast("double")), decimals).alias(
                f"variance__{c}"
            )
            for c in cols
        ]
    )
    agg = agg.select(
        "*",
        *[
            (F.col(f"variance__{c}") < F.lit(thresh)).alias(f"is_near_zero__{c}")
            for c in cols
        ],
    )
    return _stack_long(agg, cols, ["variance", "is_near_zero"])


def int_convertible(
    df: DataFrame,
    cols: Sequence[str],
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """F8 → (column, is_int_convertible): true iff every non-null value
    equals its floor.  ``sample_fraction`` reproduces the reference's
    sampled check; default is exact over the full column (same single
    scan, so sampling only saves IO when the caller asks for it)."""
    src = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    agg = src.agg(
        *[
            (
                F.sum(
                    (
                        F.col(c).isNotNull()
                        & (F.col(c).cast("double") != F.floor(F.col(c).cast("double")))
                    ).cast("long")
                )
                == 0
            ).alias(f"is_int_convertible__{c}")
            for c in cols
        ]
    )
    return _stack_long(agg, cols, ["is_int_convertible"])


def category_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    rtol: float = 0.1,
    atol: float = 0.0,
    decimals: int = 4,
) -> DataFrame:
    """F9: compare per-category share (×100) between two frames with
    np.isclose semantics |a−b| ≤ atol + rtol·|b| →
    (category, pct_a, pct_b, is_close).  Missing categories count as
    0%.  Two grouped aggregates + one join on the (small) category
    domain."""
    a = value_counts_pct(df_a, col, decimals).select(
        F.col(col).alias("category"), F.col("pct").alias("pct_a")
    )
    b = value_counts_pct(df_b, col, decimals).select(
        F.col(col).alias("category"), F.col("pct").alias("pct_b")
    )
    joined = a.join(b, on="category", how="full").na.fill(
        {"pct_a": 0.0, "pct_b": 0.0}
    )
    close = F.abs(F.col("pct_a") - F.col("pct_b")) <= (
        F.lit(atol) + F.lit(rtol) * F.abs(F.col("pct_b"))
    )
    return joined.withColumn("is_close", close)


def psi(
    df_expected: DataFrame,
    df_actual: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Population Stability Index (beyond-reference drift screen — the
    numeric counterpart of category_drift/F9) → one row
    [column, psi, n_bins].

    Fixed-width bins over the EXPECTED side's [min, max] (left-closed,
    matching A17's binning; actual-side outliers clamp into the edge
    bins), per-bin shares with ``eps`` smoothing so empty bins don't
    produce infinities, PSI = Σ (p−q)·ln(p/q).  Two aggregate passes +
    one tiny bin-level join — no data collected, any scale."""
    lo, hi = df_expected.agg(F.min(col), F.max(col)).first()
    if lo is None or lo == hi:
        raise ValueError(f"{col}: empty or constant on the expected side")
    width = (float(hi) - float(lo)) / n_bins

    def shares(df: DataFrame, name: str) -> DataFrame:
        binned = df.filter(F.col(col).isNotNull()).withColumn(
            "__bin",
            F.least(
                F.greatest(
                    F.floor((F.col(col) - F.lit(float(lo))) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).cast("int"),
        )
        counts = binned.groupBy("__bin").agg(F.count(F.lit(1)).alias("__n"))
        total = binned.count()
        return counts.withColumn(name, F.col("__n") / F.lit(total)).select(
            "__bin", name
        )

    p = shares(df_expected, "__p")
    q = shares(df_actual, "__q")
    joined = (
        p.join(q, on="__bin", how="full")
        .na.fill({"__p": 0.0, "__q": 0.0})
        .withColumn("__ps", F.col("__p") + eps)
        .withColumn("__qs", F.col("__q") + eps)
    )
    return joined.agg(
        F.lit(col).alias("column"),
        F.round(
            F.sum(
                (F.col("__ps") - F.col("__qs"))
                * F.log(F.col("__ps") / F.col("__qs"))
            ),
            6,
        ).alias("psi"),
        F.lit(n_bins).alias("n_bins"),
    )
