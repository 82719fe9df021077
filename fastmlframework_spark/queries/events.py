"""Oracle-checked queries for time-window operators over events
(SURVEY.md §2.10 extension; streaming variants tested in
tests/test_streaming.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start
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
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
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


@query(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day FROM events e
)
SELECT f.cohort_day,
       CAST(day - cohort_day AS BIGINT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
WHERE day - cohort_day BETWEEN 0 AND 7
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    active users per (cohort, day-offset) for the first week.  Both
    aggregations shuffle on user_id (co-partitioned — the cohort join
    reuses the same hash partitioning, no extra exchange of the big
    side) and the final matrix is cohorts × 8, tiny at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, on="user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("long"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_funnel_order",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT 'view>click', COUNT(*) FROM c
UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
""",
)
def events_funnel_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase.  Each stage is a grouped MIN plus a theta-ish
    join expressed as equi-join on user_id + range predicate — the
    stage tables shrink monotonically, and every join key is the same
    user_id hash partitioning (one shuffle reused across stages)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def first_after(etype: str, prev: DataFrame | None) -> DataFrame:
        base = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            base = base.join(
                prev.select("user_id", F.col("t").alias("__prev_t")),
                on="user_id",
            ).filter(F.col("ts") > F.col("__prev_t"))
        return base.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    counts = [
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("stage"), "n_users"
        ),
        c.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click").alias("stage"), "n_users"
        ),
        p.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click>purchase").alias("stage"), "n_users"
        ),
    ]
    out = counts[0]
    for c_ in counts[1:]:
        out = out.unionByName(c_)
    return out


@query(
    "events_interarrival_gaps",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         EXTRACT(EPOCH FROM ts - LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_sec
  FROM events
)
SELECT event_type,
       COUNT(gap_sec) AS n_gaps,
       ROUND(AVG(gap_sec), 4) AS avg_gap_sec,
       ROUND(MAX(gap_sec), 4) AS max_gap_sec
FROM gaps
GROUP BY event_type
ORDER BY event_type
""",
)
def events_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-window inter-arrival analysis: per-user event stream sorted
    by time, gap to the previous event, aggregated per event type.
    One shuffle on user_id for the window (deterministic tie-break on
    event_id), then a tiny grouped aggregate — LAG/LEAD are the
    windowed primitives a sessionization/monitoring pipeline leans on."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_sec"),
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_sec").alias("n_gaps"),
            F.round(F.avg("gap_sec"), 4).alias("avg_gap_sec"),
            F.round(F.max("gap_sec"), 4).alias("max_gap_sec"),
        )
        .orderBy("event_type")
    )


@query(
    "events_gapfill_hourly",
    oracle="""
WITH per_hour AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, AVG(value) AS v
  FROM events WHERE user_id < 40
  GROUP BY user_id, date_trunc('hour', ts)
),
spans AS (
  SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM per_hour GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT g.user_id, g.bucket,
       ROUND(last_value(p.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled,
       p.v IS NULL AS is_gap
FROM grid g
LEFT JOIN per_hour p ON g.user_id = p.user_id AND g.bucket = p.bucket
""",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward fill over the event stream — the
    hypertable-style regularization that feeds feature stores: dense
    per-user hourly grid, in-hour mean, last value carried across
    empty hours (`operators/timeseries.py`; per-key span grids, one
    shuffle, never a global calendar cross join)."""
    from fastmlframework_spark.operators.timeseries import resample_gapfill

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    out = resample_gapfill(
        ev, key_col="user_id", ts_col="ts", value_col="value"
    )
    return out.select(
        "user_id",
        "bucket",
        F.round("filled", 4).alias("filled"),
        "is_gap",
    )


@query(
    "events_interpolate_hourly",
    oracle="""
WITH per_hour AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM events WHERE user_id < 40
  GROUP BY user_id, date_trunc('hour', ts)
),
spans AS (
  SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM per_hour GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
),
j AS (
  SELECT g.user_id, g.bucket, p.s, p.n,
         CAST(epoch(g.bucket) AS BIGINT) AS bl,
         last_value(p.s IGNORE NULLS) OVER wb AS ps,
         last_value(p.n IGNORE NULLS) OVER wb AS pn,
         first_value(p.s IGNORE NULLS) OVER wf AS ns,
         first_value(p.n IGNORE NULLS) OVER wf AS nn,
         CAST(epoch(last_value(CASE WHEN p.s IS NOT NULL THEN g.bucket END
                               IGNORE NULLS) OVER wb) AS BIGINT) AS pt,
         CAST(epoch(first_value(CASE WHEN p.s IS NOT NULL THEN g.bucket END
                                IGNORE NULLS) OVER wf) AS BIGINT) AS nt
  FROM grid g LEFT JOIN per_hour p USING (user_id, bucket)
  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.user_id ORDER BY g.bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket,
       CAST(CASE WHEN s IS NOT NULL THEN (s * 100) // n
            ELSE (((nt - bl) * ps * nn + (bl - pt) * ns * pn) * 100)
                 // (pn * nn * (nt - pt))
       END AS BIGINT) AS filled_scaled,
       s IS NULL AS is_gap
FROM j
""",
)
def events_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation across gaps — the
    time-weighted counterpart of `events_gapfill_hourly`.  Uses the
    integer-exact formulation (`resample_interpolate_exact`): floating
    blends structurally produce exact .5 rounding boundaries (frac =
    1/2 on odd gaps) where engines' round semantics diverge, so the
    cross-engine contract carries values as scaled BIGINTs and blends
    with pure integer multiply/divide — bit-identical by construction.
    Output `filled_scaled` is the value x 10000."""
    from fastmlframework_spark.operators.timeseries import (
        resample_interpolate_exact,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return resample_interpolate_exact(
        ev, key_col="user_id", ts_col="ts", value_col="value"
    )


@query(
    "events_value_outliers",
    oracle="""
WITH stats AS (
  SELECT event_type,
         AVG(value) AS mu,
         STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 4) AS value,
       ROUND((e.value - mu) / sigma, 4) AS zscore
FROM events e JOIN stats USING (event_type)
WHERE ABS((e.value - mu) / sigma) > 3
ORDER BY e.event_id
""",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flagging (|z| > 3): the basic anomaly
    screen over an event stream.  Per-type stats are aggregate-sized
    and broadcast back into a single fact scan — two passes total,
    no window over the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), on="event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@query(
    "events_last_touch_attribution",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT COALESCE(CASE WHEN touch_ts >= ts - INTERVAL 24 HOUR
                     THEN touch_type END, 'direct') AS channel,
       COUNT(*) AS n_purchases,
       ROUND(SUM(value), 2) AS attributed_value
FROM seq
WHERE event_type = 'purchase'
GROUP BY channel
ORDER BY channel
""",
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the most recent
    preceding non-purchase event within 24h (else 'direct') — the
    classic sessionless attribution model, as ONE running window over
    the user-partitioned stream (no self-join of purchases against
    touches; the carry costs a single shuffle on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nonpurch = F.col("event_type") != "purchase"
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(nonpurch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(nonpurch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    within = F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS")
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(within, F.col("touch_type")), F.lit("direct")
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@query(
    "events_seasonal_baseline",
    oracle="""
WITH b AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hour, value AS v
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, hour, AVG(v) AS m, stddev_samp(v) AS sd
  FROM b GROUP BY 1, 2
)
SELECT b.event_type,
       CAST(b.hour AS INT) AS hour,
       COUNT(*) AS n_events,
       ROUND(AVG(b.v), 6) AS mean_value,
       ROUND(COALESCE(stddev_samp(b.v), 0), 6) AS std_value,
       CAST(SUM(CASE WHEN s.sd IS NULL OR s.sd = 0 THEN 0
                     WHEN ABS(b.v - s.m) > 3.0 * s.sd THEN 1
                     ELSE 0 END) AS BIGINT) AS n_anomalies
FROM b JOIN s USING (event_type, hour)
GROUP BY 1, 2
""",
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day conditioned anomaly baseline per event type: each
    event compares against its own (type, hour) mean/std band — the
    seasonality-aware complement of the global z-score screen; both
    aggregates key x 24-bounded, stats broadcast back."""
    from fastmlframework_spark.operators.timeseries import seasonal_baseline

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    return seasonal_baseline(events)


@query(
    "events_seasonal_stats",
    oracle="""
SELECT event_type,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS mean_value,
       ROUND(COALESCE(stddev_samp(value), 0), 6) AS std_value
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
""",
)
def events_seasonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared batch/stream form of the seasonal baseline's stats
    pass (streaming/windows.seasonal_stats): one definition feeds both
    this batch oracle and the Structured-Streaming running aggregation
    (stream-vs-batch parity pinned in tests/test_streaming.py) —
    VERDICT r4 #8."""
    from fastmlframework_spark.streaming.windows import seasonal_stats

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    return seasonal_stats(events)


@query(
    "events_ewma_value",
    oracle="""
WITH f AS (
  SELECT user_id, ts, event_id, value,
         array_agg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             AS a
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, user_id,
       ROUND(
         list_reduce(list_transform(range(1, len(a) + 1),
                                    __k -> a[__k] * pow(0.7, len(a) - __k)),
                     (__s, __v) -> __s + __v)
         / list_reduce(list_transform(range(1, len(a) + 1),
                                      __k -> pow(0.7, __k - 1)),
                       (__s, __v) -> __s + __v), 6) AS ewma
FROM f
""",
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bounded-lag EWMA (alpha 0.3, 10 lags, adjust=True
    form) over event time — the exponentially weighted smoother of
    the time-series family; per-key bounded rows frame + HOF fold,
    left-to-right in both engines."""
    from fastmlframework_spark.operators.timeseries import ewma

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return ewma(
        ev, key_col="user_id", ts_col="ts", val_col="value",
        alpha=0.3, window=10, tiebreak_col="event_id",
    ).select("event_id", "user_id", "ewma")


@query(
    "events_cusum_alarms",
    bench=False,
    bench_reason="recursive-CTE oracle cross-check of the benched stream_cusum drain",
    oracle="""
WITH RECURSIVE base AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS rn
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_id, event_type, rn,
         GREATEST(value - 55.0, 0.0) AS s
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.event_id, b.event_type, b.rn,
         GREATEST(r.s + b.value - 55.0, 0.0)
  FROM base b JOIN r ON b.event_type = r.event_type AND b.rn = r.rn + 1
)
SELECT event_id, event_type, ROUND(s, 6) AS cusum, s > 200.0 AS alarm
FROM r
""",
)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type one-sided CUSUM drift detection (Page 1954) in its
    literal recursive form: each key's history runs the sequential
    applyInPandas loop, matched bit-for-bit by a recursive-CTE
    oracle.  Kept as the oracle cross-check for ``events_cusum_scan``
    (the benched, scale-safe prefix form) with ``bench=False`` —
    parallelism here equals the number of event types, so one hot key
    would serialize at 100×.  k=55 (mean+0.1σ of the synthetic
    values) so the statistic resets on typical runs, h=200 so alarms
    mark sustained high-value drift."""
    from fastmlframework_spark.operators.timeseries import cusum

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    return cusum(ev, k=55.0, h=200.0)


@query(
    "events_cusum_scan",
    bench=True,
    oracle="""
WITH RECURSIVE base AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS rn
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_id, event_type, rn,
         value - 55.0 AS cum,
         LEAST(value - 55.0, 0.0) AS rmin
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.event_id, b.event_type, b.rn,
         r.cum + (b.value - 55.0),
         LEAST(r.rmin, r.cum + (b.value - 55.0))
  FROM base b JOIN r ON b.event_type = r.event_type AND b.rn = r.rn + 1
)
SELECT event_id, event_type,
       ROUND(cum - LEAST(rmin, 0.0), 6) AS cusum,
       cum - LEAST(rmin, 0.0) > 200.0 AS alarm
FROM r
""",
)
def events_cusum_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe CUSUM: Page's recursion in its closed prefix
    form S_t = cum_t − min(0, running-min of cum), i.e. two per-key
    running windows — pure JVM whole-stage-codegen, no Python loop,
    so a key with billions of rows scans instead of serializing
    through Arrow (plan pinned Window-only in ``test_plans.py``).

    The oracle replays the SAME left-associated arithmetic in a
    recursive CTE (cum_t = cum_{t-1} + (x_t − k), rmin carried with
    LEAST), which is bit-identical to Spark's sequential
    UnboundedPreceding window accumulation — so the hash match is
    exact, not rounding-assisted.  Same k=55/h=200 as
    ``events_cusum_alarms``, which stays as the loop-form
    cross-check."""
    from fastmlframework_spark.operators.timeseries import cusum_scan

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    return cusum_scan(ev, k=55.0, h=200.0)


@query(
    "events_split_temporal",
    oracle="""
WITH e AS (
  SELECT event_type, user_id, value,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 1000000.0 AS t
  FROM events
),
b AS (SELECT MIN(t) AS t0, MAX(t) AS t1 FROM e),
lab AS (
  SELECT event_type, user_id, value,
         CASE WHEN t <= t0 + 0.7 * (t1 - t0) THEN 'train'
              WHEN t <= t0 + 0.75 * (t1 - t0) THEN 'embargo'
              ELSE 'test' END AS split
  FROM e CROSS JOIN b
)
SELECT split, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 4) AS total_value
FROM lab GROUP BY 1, 2
""",
)
def events_split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embargoed temporal train/test split (purged-CV shape): 70% of
    the time RANGE trains, the next 5% is discarded as the embargo
    gap, the rest tests — summarized per (split, event_type).  The
    cutoffs are one 1-row min/max aggregate broadcast over the scan
    (timestamp→double is micros/1e6 in both engines, so the boundary
    comparisons are bit-identical); assignment is a map-only
    comparison cascade."""
    from fastmlframework_spark.ml.folds import temporal_split

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value", "ts"
    )
    return (
        temporal_split(ev, train_frac=0.7, embargo_frac=0.05)
        .groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "events_transition_matrix",
    oracle="""
WITH tr AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_state
  FROM events
),
c AS (
  SELECT from_state, to_state, COUNT(*) AS n_transitions
  FROM tr WHERE to_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, n_transitions,
       ROUND(n_transitions * 1.0
             / SUM(n_transitions) OVER (PARTITION BY from_state),
             6) AS p_transition
FROM c
ORDER BY from_state, to_state
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: LEAD window on (user_id → ts, event_id), |states|²
    grouped aggregate, row-normalized conditional probabilities."""
    from fastmlframework_spark.operators.timeseries import transition_matrix

    return transition_matrix(load_table(spark, sf_dir, "events"))


@query(
    "events_holt_smoothing",
    oracle="""
WITH f AS (
  SELECT user_id, event_id, value,
         array_agg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             AS a
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_id, user_id,
         list_reduce(
           list_prepend([CAST(a[1] AS DOUBLE), 0.0::DOUBLE],
             list_transform(a[2:],
                            __v -> [CAST(__v AS DOUBLE), 0.0::DOUBLE])),
           (__acc, __x) -> [
             0.4::DOUBLE * __x[1]
                 + 0.6::DOUBLE * (__acc[1] + __acc[2]),
             0.3::DOUBLE * ((0.4::DOUBLE * __x[1]
                 + 0.6::DOUBLE * (__acc[1] + __acc[2])) - __acc[1])
                 + 0.7::DOUBLE * __acc[2]]
         ) AS st
  FROM f
)
SELECT event_id, user_id,
       ROUND(st[1], 6) AS level,
       ROUND(st[2], 6) AS trend,
       ROUND(st[1] + st[2], 6) AS forecast
FROM h
""",
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt level+trend smoothing (α 0.4, β 0.3, 10 lags)
    over event time — the struct-accumulator HOF fold; the DuckDB
    twin prepends the init struct and folds the identical arithmetic,
    so the hash match is exact."""
    from fastmlframework_spark.operators.timeseries import holt_smoothing

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return holt_smoothing(
        ev, key_col="user_id", ts_col="ts", val_col="value",
        alpha=0.4, beta=0.3, window=10, tiebreak_col="event_id",
    ).select("event_id", "user_id", "level", "trend", "forecast")


@query(
    "events_session_stats",
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
),
per AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         EXTRACT(EPOCH FROM MAX(ts) - MIN(ts)) AS dur
  FROM s GROUP BY 1, 2
)
SELECT COUNT(*) AS n_sessions,
       ROUND(AVG(n_events), 4) AS avg_events,
       CAST(MAX(n_events) AS BIGINT) AS max_events,
       ROUND(AVG(dur), 4) AS avg_duration_sec,
       ROUND(MAX(dur), 4) AS max_duration_sec
FROM per
""",
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level session-shape summary over the 30-minute-gap
    sessionization: how many sessions, how long, how many events —
    the engagement roll-up a product dashboard reads off the
    sessionizer.  Same lag+cumsum per-user windows as
    ``events_sessionize`` (distributes over users), then a
    session-keyed aggregate into ONE row; the averaged quantities are
    integer-valued (counts, whole-second epochs), so cross-engine
    summation order cannot move the rounded values."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = 30 * 60
    flagged = ev.withColumn(
        "__new",
        (
            F.coalesce(
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w),
                F.lit(gap_s + 1),
            )
            > gap_s
        ).cast("long"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("double"))
            - F.min(F.col("ts").cast("double"))
        ).alias("dur"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.avg("dur"), 4).alias("avg_duration_sec"),
        F.round(F.max("dur"), 4).alias("max_duration_sec"),
    )
