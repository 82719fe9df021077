"""Hive-style partitioned parquet IO: partition pruning for
time/categorical predicates.

Bucketing (`sources/bucketing.py`) kills the JOIN shuffle; directory
partitioning kills the SCAN.  At 100 TB a date-ranged query over an
unpartitioned table still lists and footers every file; written as
``.../p_date=2024-01-01/...`` the date predicate prunes whole
directories at PLANNING time — the scan never touches excluded
partitions (visible as ``PartitionFilters`` in the formatted plan,
with ``ReadFiles``/``partitions read`` dropping proportionally).

Guidance encoded here:

* Partition by LOW-cardinality, ALWAYS-filtered columns (event date,
  region).  A high-cardinality partition column (user_id) creates
  millions of tiny directories and kills the file listing instead.
* Combine with in-file sorting (``sortWithinPartitions``) so min/max
  row-group statistics prune WITHIN the surviving partitions too.
* The partition column is stored in the directory name, not the data
  files — it costs zero bytes per row.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet; optional within-file sort keys
    sharpen row-group min/max pruning for the surviving partitions."""
    out = df
    if sort_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols])
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_date_partition(
    df: DataFrame, ts_col: str, out_col: str = "p_date"
) -> DataFrame:
    """Derive the canonical daily partition column from an event
    timestamp (kept separate from the data column so the original
    timestamp precision survives)."""
    return df.withColumn(out_col, F.to_date(F.col(ts_col)))


def read_pruned(
    spark: SparkSession, path: str, predicate: Column | None = None
) -> DataFrame:
    """Read a partitioned dataset; a predicate on the partition
    column(s) prunes directories during planning (assert via
    ``PartitionFilters`` in ``explain("formatted")``)."""
    df = spark.read.parquet(path)
    return df.filter(predicate) if predicate is not None else df
