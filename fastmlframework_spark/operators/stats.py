"""Distribution-comparison / robust-statistics operators
(beyond-reference §7.5): two-sample Kolmogorov–Smirnov drift and
MAD-based outlier screening.  Complements the PSI drift check
(`queries/preprocessing.py::drift_psi`) with a binning-free statistic
and the z-score screen (`queries/events.py::events_value_outliers`)
with a median-based one that heavy tails cannot inflate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    quantize: int = 3,
) -> DataFrame:
    """Two-sample KS statistic → one row [ks_stat, n_a, n_b]:
    max |ECDF_a - ECDF_b| over the (quantized) value grid.

    ``quantize`` rounds values to that many decimals first, bounding
    the grid the ECDFs are compared on — this is what keeps the
    operator scale-safe: the per-value counts aggregate map-side to at
    most grid-size rows, and only that bounded grid passes through the
    single ordered window.  (An exact KS over raw doubles needs a
    total order over n distinct values — a global sort that a 100 TB
    table cannot justify for a 1-row answer; on the quantized grid the
    statistic is exact for the quantized distributions and within
    one grid cell's mass of the raw-value statistic.)

    NULL values are dropped (the standard KS definition ignores them);
    raises ``ValueError`` when either group contributes zero rows — a
    silent NULL statistic would otherwise mask an empty cohort."""
    v = F.round(F.col(value_col), quantize)
    counts = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .filter(F.col(value_col).isNotNull())
        .groupBy(v.alias("__v"))
        .agg(
            F.sum((F.col(group_col) == group_a).cast("long")).alias("__ca"),
            F.sum((F.col(group_col) == group_b).cast("long")).alias("__cb"),
        )
    )
    # The grid is bounded by construction, so materializing it once
    # (localCheckpoint) lets the zero-group guard and the final window
    # share a single scan of the underlying table.
    counts = counts.localCheckpoint()
    totals = counts.agg(F.sum("__ca"), F.sum("__cb")).first()
    n_a = totals[0] or 0
    n_b = totals[1] or 0
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"ks_statistic: empty group(s) — {group_a!r} has {n_a} rows, "
            f"{group_b!r} has {n_b} rows (after NULL filtering)"
        )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = counts.select(
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    return ecdf.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("__cuma") / F.lit(n_a)
                    - F.col("__cumb") / F.lit(n_b)
                )
            ),
            6,
        ).alias("ks_stat"),
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier screen → [group, n, med, mad,
    n_outliers]: median, median-absolute-deviation, and the count of
    values with |x - med| > k · 1.4826 · MAD (1.4826 scales MAD to σ
    under normality).

    Exact medians via ``percentile`` (interpolating, matching
    ``quantile_cont``).  Two grouped aggregates with the tiny per-group
    stats broadcast back between them — the full table is scanned
    twice but never shuffled on anything wider than the group key."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    with_med = df.join(F.broadcast(med), on=group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"),
    )
    screened = with_med.join(F.broadcast(mad), on=group_col)
    return (
        screened.groupBy(group_col)
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                (
                    F.abs(F.col(value_col) - F.col("med"))
                    > k * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )
