"""Second wave of TPC-H-shape analytics queries (SURVEY.md §2.3-§2.5
join/aggregate breadth): nation-pair trade, market share, profit
attribution, argmin-per-group supplier choice, value-threshold
subquery, outer-join order distribution, and max-equality top
supplier.

The testdata carries no ``partsupp`` table and no
``l_shipmode``/``l_commitdate`` columns, so the Q2/Q9/Q11 shapes
substitute lineitem as the part↔supplier bridge and
``p_retailprice``-derived cost — the *plan shapes* (multi-dim star
joins, de-correlated aggregates, scalar-subquery thresholds, window
argmin, outer-join distributions) are the point, not the spec
constants.

Scale notes (100 TB): every dimension side (nation, region, part,
supplier, filtered customer) is explicitly broadcast; the only
fact-table shuffles are the final group-bys on low-cardinality keys.
Pre-aggregation runs BEFORE joins wherever the join is 1:N on the
aggregate key (q13 pre-counts orders per customer instead of
outer-joining raw orders; q15 pre-sums revenue per supplier), so the
shuffle carries aggregate-sized rows, not fact-sized rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.queries.registry import query


@query(
    "q7_nation_trade_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation legs pre-filter their dimension chains (supplier⋈nation,
    customer⋈nation shrink to two nations each) and broadcast; the OR of
    the two directions is a residual predicate on the joined row.  The
    fact table shuffles once, on orderkey, to meet orders."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of a part-type market inside
    one region, per year — conditional aggregation over a 7-table star.
    part is pre-filtered to the type (broadcast), the customer side is
    region-pruned through nation⋈region (broadcast), and numerator and
    denominator share a single aggregate pass."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0)
                )
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT nation, o_year,
       ROUND(CAST(SUM(CAST(amount AS DECIMAL(28, 4))) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit attribution per supplier-nation and year
    for one product family.  ``0.5 * p_retailprice * l_quantity`` stands
    in for the missing ``ps_supplycost`` term — same expression shape
    (join-carried dimension attribute times fact measure).  The LIKE
    filter prunes part before its broadcast; lineitem shuffles once on
    orderkey.

    The profit amount SUBTRACTS two comparable-magnitude products, so
    the double sum is summation-order-sensitive at the cent boundary;
    summing in DECIMAL(28,4) (exact, order-free) on both engines makes
    the rounded total deterministic."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nat = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(amount.cast("decimal(28,4)")).cast("double"), 2
            ).alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
ranked AS (
  SELECT o.l_partkey, o.l_suppkey, o.unit_price,
         ROW_NUMBER() OVER (
           PARTITION BY o.l_partkey
           ORDER BY o.unit_price, o.l_suppkey
         ) AS rn
  FROM offers o
  JOIN supplier ON s_suppkey = o.l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       p_partkey, p_brand, ROUND(unit_price, 4) AS unit_price
FROM ranked
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE rn = 1 AND p_size = 10
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: per-part argmin over supplier offers inside one
    region (the correlated MIN subquery), de-correlated into a window
    ``row_number`` with a deterministic ``(unit_price, suppkey)`` order.
    Lineitem stands in for partsupp: an "offer" is the per-(part,
    supplier) MIN unit price — MIN is summation-order-free, so the
    double is bit-identical cross-engine.  The offers aggregate (part ×
    supplier sized, far smaller than the fact table at any SF) is the
    only shuffle; every dimension broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey", "p_brand")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    return (
        offers.join(F.broadcast(eu_supp), offers.l_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_price", 4).alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_part_values",
    oracle="""
WITH vals AS (
  SELECT l_partkey, SUM(l_extendedprice) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
FROM vals
WHERE value > (SELECT SUM(value) * 0.005 FROM vals)
ORDER BY value DESC, p_partkey
""",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: per-part value inside one nation, kept only
    when above a fraction of the nation-wide total — a scalar aggregate
    over an aggregate, crossed back in as a broadcast (never a
    ``collect``).  The per-part aggregate is computed ONCE and reused
    for both the detail rows and the threshold (cache-free reuse: the
    threshold side is a 1-row reduction of the same frame, Catalyst
    reuses the shuffle via ReusedExchange)."""
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    vals = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    thresh = vals.agg((F.sum("value") * 0.005).alias("cutoff"))
    return (
        vals.crossJoin(F.broadcast(thresh))
        .filter(F.col("value") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers (the outer-join-then-count idiom).
    Scale plan: orders pre-aggregates to per-custkey counts BEFORE
    meeting customer, so the outer join carries one row per customer
    per side instead of one per order; zero-fill via coalesce.  The
    filtered-join-condition (non-urgent only) lives in the pre-agg
    filter — identical semantics to the oracle's ON-clause filter."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        cust.join(per_cust, on="c_custkey", how="left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: quarter revenue per supplier, keep the
    supplier(s) equal to the global max — the view + scalar-subquery
    equality.  The per-supplier aggregate is small (|supplier| rows) so
    the max crosses back in as a broadcast; comparing the ROUNDED
    revenue on both sides keeps the equality stable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q12_late_priority_counts",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: priority mix of LATE line items per category.
    The testdata has no ``l_shipmode``/``l_commitdate``/``l_receiptdate``,
    so ``l_returnflag`` stands in for the mode grouping and "late" is
    ship > order date + 60 days — the plan shape (fact⋈fact-dimension
    join with a cross-table predicate, then conditional counts) is the
    point.  The shipdate-window filter is pushed to the lineitem scan;
    the join predicate on two tables' columns evaluates post-join, and
    the group-by key has tiny cardinality so the final shuffle carries
    a handful of rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q20_dominant_widget_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
),
part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty
  FROM shipped
  GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT s.l_suppkey
  FROM shipped s
  JOIN part_total t ON s.l_partkey = t.l_partkey
  JOIN part ON p_partkey = s.l_partkey
  WHERE p_name LIKE '%widget%'
    AND s.qty > 0.3 * t.total_qty
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
""",
)
def q20_dominant_widget_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: suppliers qualified by a doubly-nested
    aggregate condition, consumed as a semi-join.  Without ``partsupp``
    the "excess availability" test becomes dominance: a supplier
    qualifies when its year-shipped quantity of some widget part
    exceeds 30% of that part's total shipped quantity.  Scale plan:
    both aggregation levels reuse ONE shuffle on (supp, part) — the
    part_total re-agg groups the already-shuffled frame by its prefix
    key; part is filter-pruned then broadcast; the qualifying supplier
    id set (≤ |supplier| rows) broadcasts into a left-semi join so the
    supplier table is never shuffled."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    widget = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    dominant = (
        shipped.join(part_total, on="l_partkey")
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supp,
         SUM(is_late) AS n_late
  FROM per_supp
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_supp
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order (EXISTS + NOT EXISTS self-joins on
    the fact table).  Without ``l_receiptdate``/``l_commitdate``,
    "late" is ship > order date + 60 days.  The correlated EXISTS pair
    de-correlates into ONE (orderkey, suppkey) aggregate followed by
    per-order WINDOW counts over the same rows — the fact table is
    scanned once and never self-joins (a groupBy-then-join-back
    formulation would duplicate the whole scan+agg subtree in the
    plan; the window expresses the per-order totals on the already
    aggregated, order-partitioned frame).  Supplier names arrive via
    broadcast at the end, after the aggregate has shrunk the frame to
    qualifying (order, supplier) pairs."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    per_supp = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
