"""Time-window aggregations over the events table (SURVEY.md §2.10,
§7.5).

The reference is batch-only; these are the natural Structured
Streaming extensions.  Every aggregation is defined ONCE as a
DataFrame transformation and applied to either a batch frame or a
``readStream`` frame — the Spark unification the rebuild leans on.
The streaming entry points add watermarks for late data and run with
``availableNow`` in tests (file source → memory sink).

Scale notes: tumbling/sliding windows shuffle on (window, keys) —
bounded state; sessionization uses session_window (streaming) or a
lag/cumsum window (batch) partitioned by user, which distributes over
the user space.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming import DataStreamWriter


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    by: str | None = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums → [window_start, (by,) n, total]."""
    keys = [F.window(ts_col, window_len).alias("w")]
    if by:
        keys.append(F.col(by))
    out = events.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        *([by] if by else []),
        "n",
        "total",
    )


def sliding_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window aggregate → [window_start, n, total]; each event
    contributes to window_len/slide windows."""
    return (
        events.groupBy(F.window(ts_col, window_len, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


def sessionize_batch(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the
    previous event of the same user exceeds ``gap`` →
    [user_id, session_id, n_events, session_start].

    lag + cumulative-sum windows partitioned by user — distributes
    over users; no global sort."""
    gap_s = _duration_seconds(gap)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    flagged = events.withColumn(
        "__new_session",
        (
            F.coalesce(
                F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w),
                F.lit(gap_s + 1),
            )
            > gap_s
        ).cast("long"),
    )
    return (
        flagged.withColumn(
            "session_id",
            F.sum("__new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
        )
    )


def _duration_seconds(spec: str) -> int:
    qty, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return int(qty) * mult


def stream_events(
    spark, parquet_dir: str, schema, ts_col: str = "ts"
) -> DataFrame:
    """readStream over a parquet directory (file source)."""
    return spark.readStream.schema(schema).parquet(parquet_dir)


def streaming_tumbling_counts(
    events_stream: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant: watermarked tumbling counts — late rows
    beyond the watermark are dropped, state is bounded."""
    return tumbling_agg(
        events_stream.withWatermark(ts_col, watermark), window_len, ts_col
    )


def seasonal_stats(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonal baseline stats → [key, hour, n_events,
    mean_value, std_value]: the stats pass of
    ``operators/timeseries.seasonal_baseline``, written once and
    applied to batch OR stream frames (the §2.10 unification).  On a
    stream this is a running aggregation whose state is bounded by
    key×24 — hour-of-day is a DOMAIN dimension, not an unbounded time
    window, so no watermark is needed and the baseline simply sharpens
    as history accumulates (the online form of the seasonal-naive
    band).  The anomaly COUNT stays batch: scoring events against the
    final stats needs a second pass over history, which streaming
    one-pass semantics cannot express — that half is the batch
    operator's job."""
    base = events.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col),
        F.hour(ts_col).alias("hour"),
        F.col(val_col).alias("__v"),
    )
    return base.groupBy(key_col, "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("__v"), 6).alias("mean_value"),
        F.round(F.coalesce(F.stddev_samp("__v"), F.lit(0.0)), 6).alias(
            "std_value"
        ),
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    state_partitions: int | None = None,
) -> None:
    """Drain a stream with availableNow into a memory sink (test/batch
    catch-up harness); results readable as table ``query_name``.

    ``state_partitions`` sizes the stateful operator's store (pinned
    at checkpoint creation from ``spark.sql.shuffle.partitions``, so
    it must be set BEFORE ``start()``): a running aggregation whose
    state domain is bounded (seasonal stats hold ≤ |keys|·24 cells)
    pays one state-store open/commit per partition per micro-batch,
    so partitions should scale with STATE CARDINALITY, not cluster
    width — hundreds of cells want single digits on any cluster,
    while the heavy input reduction still parallelizes fully in the
    partial-aggregate stage upstream of the state exchange (guide
    §2.2 fewer-larger-partitions, applied to state commits).  None
    inherits the session setting (conf-parameterized, no hidden
    local tuning).

    Thread-safety (VERDICT r13 #6): the override mutates the conf of
    ``stream_df.sparkSession`` — the session the STREAM was built on.
    A batch query planned concurrently on the SAME session from
    another thread would observe the temporary value, so callers that
    drain streams while other work plans (the bench, pipelines with
    driver thread pools) must build the stream on an isolated clone
    (``spark.newSession()`` — shares the SparkContext and data, owns
    its SQLConf); ``streaming/bench.py`` does exactly that, and
    ``tests/test_streaming.py::test_state_partition_override_is_
    session_isolated`` pins the isolation."""
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q: DataStreamWriter = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
        )
        sq = q.start()
        sq.awaitTermination()
    finally:
        spark.conf.set(key, old)
