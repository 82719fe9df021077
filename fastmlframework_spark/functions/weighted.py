"""Weighted order statistics as pure DataFrame compositions (no UDF).

Weighted median/quantile is the aggregation a UDAF is usually reached
for; here it is a window cumsum — stays in whole-stage codegen, one
shuffle on the group key, and the identical formulation runs on any
SQL engine (the oracle twin).
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
) -> DataFrame:
    """Per-group weighted quantile → group_cols + [wq].

    Lower weighted quantile: the smallest value whose cumulative
    weight (in value order, ties broken by value only — cumulative
    weight at a value means ALL rows with that value) reaches
    ``q × total_weight``.  One shuffle: rows sort within groups by
    value, running and total weights come from two frames over the
    same partitioning, and the answer is the MIN qualifying value —
    no row_number, no second shuffle."""
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    with_cum = df.select(
        *group_cols,
        F.col(value_col),
        F.sum(weight_col).over(wcum).alias("__cw"),
        F.sum(weight_col).over(wall).alias("__tw"),
    )
    return (
        with_cum.filter(F.col("__cw") >= q * F.col("__tw"))
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias("wq"))
    )
