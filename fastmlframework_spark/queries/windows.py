"""Oracle-checked queries for window/rank/top-k/mode/set/horizontal
operators (SURVEY.md §2.5 W1-W3, §2.6 U2, §2.4 A9/A11, §2.9 M15/M16)."""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.functions.horizontal import (
    hard_vote_long,
    horizontal_mean,
    mode_agg,
    soft_vote,
)
from fastmlframework_spark.queries.registry import query


@query(
    "window_rank",
    oracle="""
SELECT s_suppkey, s_nationkey,
       ROUND(s_acctbal, 2) AS acctbal,
       RANK() OVER (PARTITION BY s_nationkey ORDER BY ROUND(s_acctbal, 2) DESC) AS rnk
FROM supplier
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank (pandas method='min' ties ≡ SQL RANK) of supplier
    balances within nation.  Ranking over the pre-rounded value so
    both engines see identical tie groups."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("acctbal"))
    return (
        supp.select(
            "s_suppkey", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
        )
        .withColumn("rnk", F.rank().over(w))
    )


@query(
    "window_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t WHERE rn <= 5
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (grouped form): top-5 parts by price per brand via a
    partitioned row_number — the scalable top-k (no global sort; each
    partition keeps a 5-row heap under AQE)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@query(
    "mode_per_customer",
    oracle="""
SELECT o_custkey, o_orderpriority FROM (
  SELECT o_custkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
  FROM orders GROUP BY o_custkey, o_orderpriority
) t WHERE rn = 1
""",
)
def mode_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: modal order priority per customer, scipy tie-break
    (smallest value on equal counts)."""
    return mode_agg(
        load_table(spark, sf_dir, "orders"), ["o_custkey"], "o_orderpriority"
    )


@query(
    "union_folds",
    oracle="""
SELECT fold, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM (
  SELECT 'early' AS fold, o_totalprice FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1997
  UNION ALL
  SELECT 'late' AS fold, o_totalprice FROM orders WHERE EXTRACT(year FROM o_orderdate) >= 2000
) t GROUP BY fold
""",
)
def union_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: unionByName of tagged sub-frames (per-fold accumulation
    pattern, prediction.py:388-392) then a grouped aggregate."""
    o = load_table(spark, sf_dir, "orders")
    frames = [
        o.filter(F.year("o_orderdate") <= 1997).withColumn("fold", F.lit("early")),
        o.filter(F.year("o_orderdate") >= 2000).withColumn("fold", F.lit("late")),
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), frames)
    return unioned.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "horizontal_mean_rows",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND((l_quantity + l_discount + l_tax) / 3, 6) AS row_mean
FROM lineitem
""",
)
def horizontal_mean_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: bagged-average shape — row-wise mean of 'per-seed' columns;
    pure projection, zero shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            horizontal_mean(["l_quantity", "l_discount", "l_tax"]), 6
        ).alias("row_mean"),
    )


@query(
    "soft_vote_blend",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(0.7 * l_discount + 0.3 * l_tax, 6) AS blend
FROM lineitem
""",
)
def soft_vote_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15: weighted soft vote of two 'model score' columns (weights
    normalized to Σ=1 per M18)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(soft_vote(["l_discount", "l_tax"], [0.7, 0.3]), 6).alias("blend"),
    )


@query(
    "hard_vote_labels",
    oracle="""
SELECT l_orderkey, l_linenumber, CAST(vote AS BIGINT) AS vote FROM (
  SELECT l_orderkey, l_linenumber, label AS vote,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                            ORDER BY w DESC, label ASC) AS rn
  FROM (
    SELECT l_orderkey, l_linenumber, label, SUM(wt) AS w FROM (
      SELECT l_orderkey, l_linenumber, l_partkey % 3 AS label, 5.0 AS wt FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_suppkey % 3, 3.0 FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) % 3, 2.0 FROM lineitem
    ) s GROUP BY 1, 2, 3
  ) g
) t WHERE rn = 1
""",
)
def hard_vote_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16: weighted hard voting across three 'model label' columns (integer weights: exact float sums) —
    long-format stack → weighted count → argmax with smallest-label
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 3).alias("m1"),
        (F.col("l_suppkey") % 3).alias("m2"),
        (F.col("l_quantity").cast("long") % 3).alias("m3"),
    )
    return hard_vote_long(
        li,
        ["l_orderkey", "l_linenumber"],
        ["m1", "m2", "m3"],
        [5, 3, 2],
    )


@query(
    "events_moving_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS mov_avg
FROM events WHERE value IS NOT NULL
""",
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-row moving average over event time — the rows-frame
    window family (distributes over users; deterministic (ts,
    event_id) ordering)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    )


@query(
    "rollup_revenue",
    oracle="""
SELECT COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderpriority)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (year → priority → grand total) in ONE pass —
    the multi-level aggregate the reference would need three separate
    groupbys for; partial aggregation applies per grouping set."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("string")
    )
    return (
        o.rollup("order_year", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("order_year", F.lit("ALL")).alias("order_year"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "revenue",
            "n",
        )
    )


@query(
    "cube_revenue",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass
    (rollup's lattice-complete sibling)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "revenue",
            "n",
        )
    )


@query(
    "intersect_customers",
    oracle="""
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
""",
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level INTERSECT (beyond-reference set op): customers active
    in both years — Catalyst plans a distinct semi-join aggregate."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@query(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot (A15's groupBy().pivot() mapping): status counts
    per priority; the pinned value list keeps the schema static (an
    unpinned pivot would need a distinct pre-pass at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


@query(
    "weighted_median_price",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, MIN(l_extendedprice) AS wq
FROM c WHERE cw >= 0.5 * tw
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — the
    weighted order statistic a UDAF is usually reached for, expressed
    as a window cumsum + MIN-qualifying-value (pure codegen, one
    shuffle; `functions/weighted.py`).  Integer-valued weights keep
    both engines' sums exact, so the >= boundary cannot flip."""
    from fastmlframework_spark.functions.weighted import weighted_quantile

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_quantile(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", q=0.5
    ).select(
        "l_returnflag", F.col("wq")
    ).orderBy("l_returnflag")
