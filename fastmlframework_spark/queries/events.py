"""Oracle-checked queries for time-window operators over events
(SURVEY.md §2.10 extension; streaming variants tested in
tests/test_streaming.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.operators.asof import asof_join, range_join
from fastmlframework_spark.queries.registry import query
from fastmlframework_spark.streaming.windows import (
    sessionize_batch,
    sliding_agg,
    tumbling_agg,
)


@query(
    "events_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total
FROM events GROUP BY 1, 2
""",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (F.window ≡ date_trunc
    for tumbling windows)."""
    return tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour")


@query(
    "events_sliding_30m",
    oracle="""
WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
w AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM e
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM e
)
SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
FROM w GROUP BY 1
""",
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    two windows (oracle = union of the two 30-minute grids)."""
    return sliding_agg(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@query(
    "events_sessionize",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
f AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '30 minutes'
              THEN 0 ELSE 1 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM f
)
SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start
FROM s GROUP BY 1, 2
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-minute inactivity gap) via lag +
    cumulative-sum windows partitioned by user."""
    return sessionize_batch(load_table(spark, sf_dir, "events"), "30 minutes")


@query(
    "json_props_extract",
    oracle="""
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON path extraction + typed aggregate
    (get_json_object stays JVM-side — the scan-plus-parse pattern for
    nested event payloads at scale; for repeated access a real
    pipeline would parse once with from_json into a struct column)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "asof_latest_order",
    oracle="""
WITH ordagg AS (
  SELECT o_custkey AS user_id, o_orderdate,
         MAX(o_totalprice) AS px, MAX(o_orderkey) AS ref_order
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       ROUND(o.px, 2) AS px_asof, o.ref_order AS ref_order_asof
FROM events e
ASOF LEFT JOIN ordagg o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
""",
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each event picks its user's most
    recent order at-or-before the event time — the feature-store
    lookup pattern.  Spark composition: union + last-non-null running
    window per key (operators/asof.py); oracle is DuckDB's native
    ASOF JOIN.  The right side is pre-aggregated to one row per
    (user, date) so tie-breaking is deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    ordagg = orders.groupBy(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    ).agg(
        F.max("o_totalprice").alias("px"),
        F.max("o_orderkey").alias("ref_order"),
    )
    out = asof_join(
        ev, ordagg, on=["user_id"], left_ts="ts", right_ts="o_orderdate"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("px_asof", 2).alias("px_asof"),
        "ref_order_asof",
    )


@query(
    "events_range_pairs",
    oracle="""
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch(CAST(b.ts AS TIMESTAMP)) - epoch(CAST(a.ts AS TIMESTAMP))
     BETWEEN 1 AND 1800
GROUP BY a.user_id
""",
)
def events_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per-user count of ordered event pairs within 30
    minutes — bucket-sharded interval join (operators/asof.py
    range_join), O(rows) shuffle instead of per-user cross products."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    pairs = range_join(
        ev,
        ev,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower=1,
        upper=1800,
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))
