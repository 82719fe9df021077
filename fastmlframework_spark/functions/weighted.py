"""Weighted order statistics as pure DataFrame compositions (no UDF).

Weighted median/quantile is the aggregation a UDAF is usually reached
for; here the cumulative weight is a DISTRIBUTED prefix sum (the same
value-bucketed engine as ``ml.metrics.roc_auc_df``), so the typical
call shape — a HANDFUL of groups over a corpus-sized table — never
funnels whole groups through single-task sort windows.  The identical
window-cumsum formulation still runs on any SQL engine as the oracle
twin; bucketing only re-orders exact additions, never the result.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def weighted_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    q: float = 0.5,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-group weighted quantile → group_cols + [wq].

    Lower weighted quantile: the smallest value whose cumulative
    weight (in value order; cumulative weight at a value means ALL
    rows with that value) reaches ``q × total_weight``.

    The naive form is a sort window partitioned by the group key —
    which serializes an entire group through one task's sort exactly
    when groups are few and huge (a 3-value flag over lineitem).  Here
    the prefix sum distributes instead: weights pre-aggregate per
    (group, value); each group's numeric [min, max] range (a tiny
    broadcast agg) value-buckets the distinct values into
    ``n_buckets`` uniform slices; cumulation runs WITHIN each
    (group, bucket) partition (~distinct/n_buckets rows per task) and
    is shifted by per-bucket offsets whose own prefix runs over the
    small (group, bucket) weight table.  The qualifying filter + MIN
    then run map-side.  All cumulative weights are exact sums of the
    same addends as the window form, so bucketing cannot change the
    answer (float weights can see a different addition ORDER; with
    integer-valued weights — the intended contract — sums are exact
    and the ``>=`` boundary cannot flip).

    Scale notes: ``value_col`` must be numeric (bucket arithmetic);
    NULL values carry no weight and are dropped.  The offsets table is
    at most |groups| × n_buckets rows and is broadcast — this targets
    low-cardinality groups over arbitrarily many rows (the shape where
    sort windows die); for very high-cardinality groups each group is
    small and a plain per-group sort window is already fine."""
    pv = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.sum(weight_col).alias("__w"))
    )
    v = F.col(value_col).cast("double")
    rng = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    )
    gkeys = list(group_cols)
    joined = (
        pv.join(F.broadcast(rng), gkeys)
        if gkeys
        else pv.crossJoin(F.broadcast(rng))
    )
    bucketed = joined.withColumn(
        "__bkt",
        F.least(
            F.floor(
                (v - F.col("__lo"))
                / F.greatest(F.col("__hi") - F.col("__lo"), F.lit(1e-300))
                * n_buckets
            ),
            F.lit(n_buckets - 1),
        ),
    ).drop("__lo", "__hi")
    w_local = (
        Window.partitionBy(*gkeys, "__bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("__lcw", F.sum("__w").over(w_local))
    w_off = (
        Window.partitionBy(*gkeys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy(*gkeys, "__bkt")
        .agg(F.sum("__w").alias("__bw"))
        .withColumn("__off", F.coalesce(F.sum("__bw").over(w_off), F.lit(0.0)))
        .withColumn("__tw", F.sum("__bw").over(Window.partitionBy(*gkeys)))
        .select(*gkeys, "__bkt", "__off", "__tw")
    )
    return (
        local.join(F.broadcast(offsets), [*gkeys, "__bkt"])
        .filter(F.col("__off") + F.col("__lcw") >= q * F.col("__tw"))
        .groupBy(*gkeys)
        .agg(F.min(value_col).alias("wq"))
    )
