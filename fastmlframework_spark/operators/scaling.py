"""Feature-scaling / discretization operators (beyond-reference
§7.5: the normalization passes a training-data pipeline runs before
model ingestion; the reference delegates this to "outside the
pipeline" per its credit_scoring config note).

All three operators follow the same 100 TB shape: ONE tiny aggregate
(global or per-group statistics) broadcast back over a single scan of
the fact table — no shuffle of the data itself, no global sort.  In
particular ``quantile_bin`` is edge-based (percentile edges + a
comparison cascade) rather than ``ntile``-based: ntile needs a total
order over all rows (single-partition window at scale), while edges
are a 1-row aggregate and assignment is a map-only projection.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] | None = None,
    suffix: str = "_z",
    ddof: int = 1,
) -> DataFrame:
    """Z-score scaling: (x - mean) / stddev per column, optionally
    within groups.  Constant columns (stddev 0 or undefined) yield
    NULL rather than ±inf — callers screen those with
    ``operators.screening.variance_screen`` first."""
    if not cols:
        raise ValueError("standardize: cols must be non-empty")
    if ddof not in (0, 1):
        raise ValueError(f"standardize: ddof must be 0 or 1, got {ddof}")
    std_fn = F.stddev_samp if ddof == 1 else F.stddev_pop
    aggs = []
    for c in cols:
        aggs.append(F.mean(c).alias(f"__mu_{c}"))
        aggs.append(std_fn(c).alias(f"__sd_{c}"))
    if group_cols:
        stats = df.groupBy(*group_cols).agg(*aggs)
        out = df.join(F.broadcast(stats), on=list(group_cols), how="left")
    else:
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    for c in cols:
        sd = F.col(f"__sd_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(sd > 0, (F.col(c) - F.col(f"__mu_{c}")) / sd),
        )
    return out.drop(
        *[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols]
    )


def minmax_scale(
    df: DataFrame,
    cols: Sequence[str],
    suffix: str = "_mm",
) -> DataFrame:
    """Min-max scaling to [0, 1]; constant columns yield NULL."""
    if not cols:
        raise ValueError("minmax_scale: cols must be non-empty")
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(hi > lo, (F.col(c) - lo) / (hi - lo)),
        )
    return out.drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: bin k = number of interior
    quantile edges strictly below x, so ties land deterministically in
    the lowest eligible bin (edge-based, engine-order-independent —
    ``ntile`` would split ties by row order AND need a global sort).

    Interior edges are the exact interpolating percentiles at
    i/n_bins (``percentile`` ≡ DuckDB ``quantile_cont``), one 1-row
    aggregate broadcast back over the scan.  NULL values stay NULL."""
    if n_bins < 2:
        raise ValueError("quantile_bin: n_bins must be >= 2")
    out_col = out_col or f"{col}_bin"
    fracs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    edges = df.agg(
        F.expr(f"percentile({col}, array({fracs}))").alias("__edges")
    )
    out = df.crossJoin(F.broadcast(edges))
    bin_expr = F.aggregate(
        F.col("__edges"),
        F.lit(0),
        lambda acc, e: acc + (F.col(col) > e).cast("int"),
    )
    return out.withColumn(
        out_col, F.when(F.col(col).isNotNull(), bin_expr).cast("int")
    ).drop("__edges")


def clip_quantiles(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization: clamp ``col`` into its [lower, upper] exact
    interpolating quantile range — the outlier-taming pass that runs
    before scaling/training.  Same 100 TB shape as the siblings: a
    1-row quantile aggregate broadcast over one scan, then a map-only
    LEAST/GREATEST projection.  NULLs pass through untouched."""
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"clip_quantiles: need 0 <= lower < upper <= 1, "
            f"got ({lower}, {upper})"
        )
    out_col = out_col or f"{col}_clipped"
    bounds = df.agg(
        F.expr(f"percentile({col}, {lower})").alias("__lo"),
        F.expr(f"percentile({col}, {upper})").alias("__hi"),
    )
    out = df.crossJoin(F.broadcast(bounds))
    # The isNotNull guard is load-bearing: Spark's greatest/least SKIP
    # null arguments (unlike SQL-standard LEAST/GREATEST), so a bare
    # greatest(col, lo) would clamp NULL inputs to the lower bound
    # instead of passing them through.
    return out.withColumn(
        out_col,
        F.when(
            F.col(col).isNotNull(),
            F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")),
        ),
    ).drop("__lo", "__hi")


def rank_transform(
    df: DataFrame,
    col: str,
    out_col: str = "pct_rank",
    n_buckets: int = 1024,
) -> DataFrame:
    """Percent-rank scaling (pandas ``rank(pct=True,
    method='average')``): every row gains ``out_col`` = its average
    rank over the whole column divided by the non-null row count —
    the monotone, outlier-immune normalization tabular pipelines use
    when minmax/z-score are distorted by heavy tails (and the first
    half of a rank-Gauss transform).  NULL values pass through with a
    NULL rank.

    The naive form — ``percent_rank()`` over an unpartitioned window
    — total-orders the corpus through ONE task at scale.  Here the
    rank is the same distributed value-bucketed prefix sum as
    ``ml.metrics.roc_auc_df`` (ranks depend only on per-VALUE counts,
    never row identity): distinct values pre-aggregate to counts, a
    1-row broadcast [min, max] agg buckets them uniformly, cumulation
    runs within each bucket and is shifted by per-bucket offsets whose
    own prefix covers ≤ ``n_buckets`` rows; the per-value rank table
    then joins back to the fact rows on the value.  All rank
    arithmetic is on exact integer counts, so bucketing cannot change
    any output.  Cost: two shuffles keyed on the value (distinct-agg
    + rank join-back) — both distribute across the full cluster; no
    single-task stage anywhere."""
    d = df.filter(F.col(col).isNotNull())
    per_val = d.groupBy(col).agg(F.count(F.lit(1)).alias("__n"))
    v = F.col(col).cast("double")
    rng = d.agg(
        F.min(v).alias("__lo"),
        F.max(v).alias("__hi"),
        F.count(F.lit(1)).alias("__nn"),
    )
    bucketed = per_val.crossJoin(F.broadcast(rng)).withColumn(
        "__bkt",
        F.least(
            F.floor(
                (v - F.col("__lo"))
                / F.greatest(F.col("__hi") - F.col("__lo"), F.lit(1e-300))
                * n_buckets
            ),
            F.lit(n_buckets - 1),
        ),
    )
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "__below", F.coalesce(F.sum("__n").over(w_local), F.lit(0))
    )
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.sum("__n").alias("__bn"))
        .withColumn("__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0)))
        .select("__bkt", "__off")
    )
    ranks = (
        local.join(F.broadcast(offsets), "__bkt")
        .select(
            col,
            (
                (F.col("__off") + F.col("__below") + (F.col("__n") + 1) / 2.0)
                / F.col("__nn")
            ).alias("__pr"),
        )
    )
    return df.join(ranks, on=col, how="left").withColumn(
        out_col, F.round("__pr", 6)
    ).drop("__pr")
