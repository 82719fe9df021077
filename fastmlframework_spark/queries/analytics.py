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


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan→filter→aggregate, zero joins.  The
    whole WHERE clause is parquet-pushable (range + between + compare
    on plain columns), so at 100 TB this reads only row groups whose
    min/max stats overlap the window — the predicate-pushdown
    showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@query(
    "q4_priority_with_returns",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (EXISTS → LEFT SEMI join): orders in a window
    that have at least one returned line, counted per priority.  The
    semi-join deduplicates lineitem keys inside the join itself — no
    distinct pre-aggregation, one shuffle on orderkey, and the date
    filter pushes to the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(returned, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_revenue",
    oracle="""
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal,
       c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: lost-revenue-per-customer over returned items
    in a quarter, top 20.  Both filters push to their scans; the
    half-year orders slice broadcasts against lineitem, and the final
    customer attribution is one shuffle on custkey before a TakeOrdered
    top-k (no global sort)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
SELECT ROUND(
         100.0 * SUM(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
         / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional aggregation (CASE inside SUM) over
    a fact⋈dimension join → single scalar.  part broadcasts; the ratio
    is computed in one aggregate pass (numerator and denominator share
    the scan)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
""",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (lineitem stands in for partsupp — the testdata
    carries no partsupp table): distinct-supplier counts per part
    group, excluding a NOT-IN supplier set.  The exclusion set is a
    tiny aggregate → broadcast LEFT ANTI join (never a shuffle);
    COUNT(DISTINCT) runs as a two-phase partial/final expand."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad_supp), on="l_suppkey", how="left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR of three conjunctive brand/size/quantity
    clauses across both join sides.  The part-only disjuncts
    (brand+size) are pre-filtered onto the broadcast side so the join
    input shrinks before the cross-side residual predicate runs —
    Catalyst cannot split the OR itself; expressing the union of
    part-side domains explicitly keeps the fact scan lean."""
    part = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
WITH thresh AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
),
active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, thresh
WHERE c_acctbal > a
  AND c_custkey NOT IN (SELECT o_custkey FROM active)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: scalar-subquery threshold (global avg positive
    balance) + NOT-IN anti-join (customers with no recent orders),
    grouped per segment.  The 1-row threshold crosses in as a broadcast
    cross-join (never a collect in the plan); the recent-customer set
    anti-joins broadcast-side."""
    cust = load_table(spark, sf_dir, "customer")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(F.broadcast(recent), on="c_custkey", how="left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "skew_salted_revenue",
    oracle="""
WITH li AS (
  SELECT CASE WHEN l_orderkey % 10 < 6 THEN 1
              ELSE l_orderkey % 1000 END          AS cust_id,
         l_extendedprice * (1 - l_discount)       AS rev
  FROM lineitem
),
dim AS (
  SELECT CAST(range AS BIGINT) AS cust_id,
         CAST(range % 5 AS BIGINT) AS tier
  FROM range(0, 1000)
)
SELECT tier, ROUND(SUM(rev), 2) AS revenue, COUNT(*) AS n_rows
FROM li JOIN dim USING (cust_id)
GROUP BY tier
ORDER BY tier
""",
)
def skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join + two-stage aggregation, driver-verified
    (operators/skew.py): 60% of lineitem rows map to ONE hot customer
    key — the classic straggler shape at 100 TB.  ``salted_join``
    spreads the hot key over 8 salts (small side replicated),
    ``salted_groupby`` merges algebraic partials on the true key; the
    oracle is the PLAIN join/groupBy, proving exact equivalence of the
    salted plan."""
    from fastmlframework_spark.operators.skew import salted_groupby, salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 6, F.lit(1).cast("long"))
        .otherwise(F.col("l_orderkey") % 1000)
        .alias("cust_id"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("cust_id"), (F.col("id") % 5).alias("tier")
    )
    joined = salted_join(li, dim, on=["cust_id"], n_salts=8)
    out = salted_groupby(
        joined,
        keys=["tier"],
        aggs=[("rev", "sum", "revenue"), ("rev", "count", "n_rows")],
        n_salts=8,
    )
    return out.select(
        "tier", F.round("revenue", 2).alias("revenue"), "n_rows"
    ).orderBy("tier")
