"""Structured Streaming parity: the SAME tumbling aggregation applied
to a readStream source (availableNow → memory sink) must equal the
batch result."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.streaming.windows import (
    run_available_now,
    streaming_tumbling_counts,
    tumbling_agg,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir_small, tmp_path):
    events = load_table(spark, sf_dir_small, "events")
    # Re-write with micros timestamps so the stream source needs no
    # nanos handling (the batch loader already normalized ts).
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)

    batch = tumbling_agg(spark.read.parquet(src), "1 hour")

    stream_df = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    agg = streaming_tumbling_counts(stream_df, "1 hour", watermark="2 hours")
    run_available_now(agg, "tumbling_test")
    streamed = spark.table("tumbling_test")

    assert streamed.count() == batch.count()
    diff = batch.exceptAll(streamed).count() + streamed.exceptAll(batch).count()
    assert diff == 0


def test_watermark_bounds_state(spark, sf_dir_small, tmp_path):
    events = load_table(spark, sf_dir_small, "events")
    src = str(tmp_path / "events_stream2")
    events.write.mode("overwrite").parquet(src)
    stream_df = spark.readStream.schema(events.schema).parquet(src)
    agg = streaming_tumbling_counts(stream_df, "1 hour", watermark="1 hour")
    run_available_now(agg, "tumbling_wm")
    # single availableNow batch: nothing is late, totals still match
    total_events = events.count()
    got = spark.table("tumbling_wm").agg(F.sum("n")).first()[0]
    assert got == total_events
