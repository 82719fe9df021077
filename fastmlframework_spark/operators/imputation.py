"""Missing-value imputation operators (SURVEY.md §2.3 J2, §2.4 A3/A4).

Reference behaviors (file:line cite /root/reference/):
* J2 grouped imputation — data_processing/preprocessing.py:90-112: the
  reference aggregates non-null rows per group (:106) then fills NaNs
  with an O(rows) per-row driver loop (:108-110).  Here the loop
  becomes a hash join: table LEFT JOIN (groupBy keys → agg) ON keys,
  then ``coalesce(col, group_agg[, global_agg])``.  At 100 TB this is
  one shuffle on the group keys (or a broadcast join when the grouped
  side is small — left to AQE's dynamic broadcast, since group
  cardinality is data-dependent).
* A4 global-statistic imputation — preprocessing.py:125-132: a 1-row
  aggregate broadcast-joined back; no shuffle of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_AGGS = {
    "mean": F.mean,
    "median": lambda c: F.expr(f"median({c})"),
    "min": F.min,
    "max": F.max,
}


def _agg_fn(agg: str, col: str) -> Column:
    try:
        return _AGGS[agg](col)
    except KeyError:
        raise ValueError(f"unsupported agg {agg!r}; one of {sorted(_AGGS)}") from None


def impute_by_group(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    agg: str = "mean",
    global_fallback: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """J2: fill nulls in ``col`` with the group's aggregate over
    non-null rows; optionally fall back to the global aggregate for
    groups that are entirely null."""
    out_col = out_col or f"{col}_imputed"
    nonnull = df.filter(F.col(col).isNotNull())
    grouped = nonnull.groupBy(*group_cols).agg(_agg_fn(agg, col).alias("__grp_agg"))
    out = df.join(grouped, on=list(group_cols), how="left")
    fill = [F.col(col), F.col("__grp_agg")]
    if global_fallback:
        glob = nonnull.agg(_agg_fn(agg, col).alias("__global_agg"))
        out = out.crossJoin(F.broadcast(glob))
        fill.append(F.col("__global_agg"))
    out = out.withColumn(out_col, F.coalesce(*fill))
    return out.drop("__grp_agg", "__global_agg")


def impute_global(
    df: DataFrame,
    cols: Sequence[str],
    agg: str = "mean",
    suffix: str = "_imputed",
) -> DataFrame:
    """A4: fill nulls in each column with its global aggregate; all
    aggregates computed in one pass and attached via one broadcast
    cross-join."""
    glob = df.agg(
        *[_agg_fn(agg, c).alias(f"__global__{c}") for c in cols]
    )
    out = df.crossJoin(F.broadcast(glob))
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.coalesce(F.col(c), F.col(f"__global__{c}")))
    return out.drop(*[f"__global__{c}" for c in cols])
