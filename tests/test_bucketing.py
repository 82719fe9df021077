"""Bucketed joins must be exchange-free (the pay-shuffle-once design)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir_small):
    orders = load_table(spark, sf_dir_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _final_plan(df) -> str:
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _no_broadcast(spark):
    """Tiny test tables would broadcast (bucketing 'disabled by query
    planner'); force the sort-merge path the pattern targets at scale,
    where both sides are far beyond any broadcast threshold."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_no_exchange(spark, sf_dir_small, bucketed_tables):
    t1, t2 = bucketed_tables
    with _no_broadcast(spark):
        joined = read_bucketed(spark, t1).join(
            read_bucketed(spark, t2), on="o_orderkey"
        )
        plan = _final_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the result matches the plain shuffled join
    orders = load_table(spark, sf_dir_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = (
        load_table(spark, sf_dir_small, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    assert joined.count() == orders.join(lineitem, on="o_orderkey").count()


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    with _no_broadcast(spark):
        agg = (
            read_bucketed(spark, t1)
            .groupBy("o_orderkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        plan = _final_plan(agg)
    assert "Exchange" not in plan, plan


def test_partitioned_artifact_prunes(spark, sf_dir_small, tmp_path):
    """Hive-partitioned artifacts: a filter on the partition column
    must show up as PartitionFilters (directory pruning), not a
    post-scan filter over all files."""
    from fastmlframework_spark.sources.artifacts import write_artifact

    events = load_table(spark, sf_dir_small, "events")
    out = str(tmp_path / "events_by_type")
    write_artifact(events, out, partition_by=["event_type"])

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "click" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0], plan
    # values survive the round-trip
    expected = events.filter(F.col("event_type") == "click").count()
    assert df.count() == expected
