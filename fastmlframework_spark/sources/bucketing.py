"""Bucketed-table IO: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the join key.  Bucketing pre-partitions the data ON DISK by
``hash(key) % n_buckets``: two tables bucketed the same way join with
ZERO exchange — each task reads matching bucket files from both sides.
The reference never needs this (pandas, one memory space); for the
rebuild it is the standard answer to "this join shuffles 100 TB every
run" — pay the shuffle once at write time, amortize it over every
downstream join/aggregation on that key.

Implementation notes:

* Bucketed writes go through ``saveAsTable`` (bucket metadata lives in
  the catalog, not the parquet files); ``spark.sql.sources.bucketing``
  must be enabled (default).
* ``n_buckets`` should be sized so bucket files land in the
  100 MB-1 GB range at the target scale; both join sides MUST use the
  same bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
* Aggregations on the bucket key also skip their exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table.  Sorting within buckets additionally removes the sort step
    of downstream sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would LOSE it)."""
    return spark.table(table)
