"""Headline analytics queries — the reference's dataflow core exercised
on the TPC-H-ish testdata: scan → filter → project → join → group-by
aggregate → sort/limit (SURVEY.md §2.1-§2.5).

Reference parity notes (file:line cite /root/reference/):
* group-by aggregation with pluggable agg fn — data_processing/preprocessing.py:106 (A3)
* feature projection / column pruning — modeling/prediction.py:312-317 (P1)
* top-k by sort desc + head — modeling/prediction.py:640-643 (W2)

All joins here are equi-joins on integer keys: Catalyst broadcasts the
dimension sides (region/nation/customer at any realistic scale factor)
and sort-merge-joins the fact tables; AQE re-plans at runtime.  Floats
are rounded identically in Spark and the DuckDB oracle (registry
docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.queries.registry import query

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the canonical grouped-aggregate
    (A3/A12 family).  Filter reaches the parquet scan as a pushed
    predicate; sums combine map-side before one shuffle on the 6-value
    grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = """
SELECT
  o_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("q3_top_orders", oracle=_Q3_ORACLE)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority-style query: dimension filter + two equi-joins
    + grouped agg + top-k (J1-family equi-join, W2 top-k).

    ``customer`` filtered to one segment is small at every SF relative
    to the facts → explicit ``broadcast`` so lineitem never shuffles on
    custkey.  Top-k runs as TakeOrderedAndProject (no global sort).
    Ordering ties broken by o_orderkey for cross-engine determinism.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey")),
                    orders.o_custkey == cust.c_custkey,
                ).select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_region_revenue", oracle=_Q5_ORACLE)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume-style query: star-join of the fact table
    against a chain of broadcast dimensions (supplier→nation→region),
    then a 5-group aggregate.  The only shuffle is the final tiny
    group-by; every join is a broadcast hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_TRAIN_TABLE_ORACLE = """
SELECT
  o_orderkey AS key,
  ROUND(o_totalprice, 2) AS o_totalprice,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
  o_orderpriority,
  ROUND(c_acctbal, 2) AS c_acctbal,
  c_mktsegment,
  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@query("ml_train_table", oracle=_TRAIN_TABLE_ORACLE)
def ml_train_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ML-fixture mapping from FIXTURES.md §4: orders⋈customer as a
    supervised train table with an explicit key column (SURVEY.md §1.4 —
    the engine never aligns rows positionally; ``o_orderkey`` is the
    index_column equivalent) and a derived binary target."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("o_orderkey").alias("key"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        "o_orderpriority",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("target"),
    )


def flagship(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Driver smoke entry: q1 at sf0.001 unless overridden."""
    return q1_pricing_summary(spark, sf_dir or "/root/testdata/sf0.001")


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: group-by-HAVING derived key set semi-joined
    back into a multi-join aggregate, then top-k.  The HAVING set is a
    small aggregate — Catalyst broadcasts it as a semi-join filter on
    the fact scan instead of shuffling lineitem twice."""
    cust, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(big), on="l_orderkey", how="left_semi")
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_q AS (
  SELECT l_partkey, AVG(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_q ON avg_q.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * aq
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: the correlated per-group average subquery
    de-correlated into an aggregate + equi-join (what Catalyst's
    subquery rewrite produces); brand filter pushes to the part scan
    and the avg table broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    avg_q = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, on="l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )
