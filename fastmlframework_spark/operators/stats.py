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
    a group contributing zero rows raises at ACTION time via an
    in-plan ``raise_error`` guard — the operator stays fully lazy
    (explain/plan-audit callers pay nothing), and a silent NULL
    statistic can never mask an empty cohort."""
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
    totals = counts.agg(
        F.coalesce(F.sum("__ca"), F.lit(0)).cast("long").alias("__na"),
        F.coalesce(F.sum("__cb"), F.lit(0)).cast("long").alias("__nb"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = counts.select(
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    # Broadcast the 1-row totals onto the (bounded) grid for the ECDF
    # difference, then once more onto the 1-row aggregate so the guard
    # still sees the counts when the grid itself is empty.
    # try_divide: a zero group must reach the raise_error guard with
    # its own message, not die earlier on ANSI DIVIDE_BY_ZERO.
    kagg = (
        ecdf.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.abs(
                    F.try_divide(F.col("__cuma"), F.col("__na"))
                    - F.try_divide(F.col("__cumb"), F.col("__nb"))
                )
            ).alias("__ksraw")
        )
    )
    err = (
        "ks_statistic: empty group(s) — one of the two groups has zero "
        "rows after NULL filtering"
    )
    valid = (F.col("__na") > 0) & (F.col("__nb") > 0)
    return kagg.crossJoin(F.broadcast(totals)).select(
        F.when(valid, F.round(F.col("__ksraw"), 6))
        .otherwise(F.expr(f"cast(raise_error('{err}') as double)"))
        .alias("ks_stat"),
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
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
