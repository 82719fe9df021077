"""Partition pruning must happen at planning time: a date predicate
over hive-partitioned events reads only matching partitions
(PartitionFilters in the plan + files-read proportionality)."""

from __future__ import annotations

import contextlib
import io
import re

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.sources.partitioned import (
    read_pruned,
    with_date_partition,
    write_partitioned,
)


@pytest.fixture(scope="module")
def part_path(spark, sf_dir_small, tmp_path_factory):
    events = load_table(spark, sf_dir_small, "events")
    path = str(tmp_path_factory.mktemp("part") / "events_by_date")
    write_partitioned(
        with_date_partition(events, "ts"),
        path,
        ["p_date"],
        sort_cols=["user_id", "ts"],
    )
    return path


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_filter_in_plan(spark, part_path):
    df = read_pruned(
        spark, part_path, F.col("p_date") == F.lit("1996-02-01").cast("date")
    )
    plan = _plan(df)
    assert re.search(r"PartitionFilters: \[[^\]]*p_date[^\]]*\]", plan), plan


def test_pruned_scan_reads_fewer_partitions(spark, part_path):
    """The one-day read must scan strictly fewer files than the full
    read, and return exactly the batch-filtered rows."""
    full = spark.read.parquet(part_path)
    n_days = full.select("p_date").distinct().count()
    assert n_days > 1

    one_day = full.select("p_date").distinct().orderBy("p_date").first()[0]
    pruned = read_pruned(spark, part_path, F.col("p_date") == F.lit(one_day))

    expected = full.filter(F.col("p_date") == F.lit(one_day)).count()
    assert pruned.count() == expected

    # input_file_name() names the files the scan ACTUALLY read —
    # pruning must confine the read to the one partition directory.
    read_files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files and all(f"p_date={one_day}" in f for f in read_files)
    all_files = full.select(F.input_file_name()).distinct().count()
    assert len(read_files) < all_files


def test_partition_column_costs_no_bytes(spark, part_path):
    """p_date lives in directory names; the parquet files must not
    carry the column."""
    import pyarrow.parquet as pq

    f = [p for p in spark.read.parquet(part_path).inputFiles()][0]
    names = pq.read_schema(f.replace("file:", "")).names
    assert "p_date" not in names


def test_roundtrip_preserves_rows(spark, sf_dir_small, part_path):
    events = load_table(spark, sf_dir_small, "events")
    back = spark.read.parquet(part_path)
    assert back.count() == events.count()
    assert (
        back.select("event_id")
        .exceptAll(events.select("event_id"))
        .count()
        == 0
    )
