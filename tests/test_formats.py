"""Format sink/scan round-trips (sources/formats.py): value-exact
parquet/ORC/CSV/JSON round-trips, ORC predicate pushdown + column
pruning at the scan, and the avro gate."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.sources.formats import read_table, write_table


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.fixture(scope="module")
def orders(spark, sf_dir_small):
    return load_table(spark, sf_dir_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip_exact(spark, orders, tmp_path, fmt):
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orders, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=orders.schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)


def test_orc_pushdown_and_pruning(spark, orders, tmp_path):
    path = str(tmp_path / "orders_orc")
    write_table(orders, path, fmt="orc")
    q = (
        read_table(spark, path, fmt="orc")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_orderpriority" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0]
    # Column pruning: the scan's ReadSchema carries only the needed
    # columns (projection + filter), not all four.
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_custkey" not in read_schema


def test_partitioned_orc_prunes_directories(spark, orders, tmp_path):
    path = str(tmp_path / "orders_orc_part")
    write_table(orders, path, fmt="orc", partition_by=["o_orderpriority"])
    q = read_table(spark, path, fmt="orc").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    part_line = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "o_orderpriority" in part_line
    n_urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert q.count() == n_urgent


def test_avro_gated(spark, orders, tmp_path):
    with pytest.raises(ValueError, match="spark-avro"):
        write_table(orders, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="unsupported"):
        write_table(orders, str(tmp_path / "x"), fmt="feather")
