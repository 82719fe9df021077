"""Streaming throughput micro-benches (VERDICT r5 #7).

The streaming family has parity and soak tests but, until round 6, no
perf number — a regression in the foreachBatch index-probe path (say,
an accidental index shuffle) would not trip any gate.  These two
benches run real Structured Streaming queries end-to-end (file
source → micro-batches → foreachBatch / running aggregation → sink)
over the driver testdata and are timed by ``bench.py`` alongside the
batch queries, so the same 2×-vs-baseline gate covers them:

* ``stream_exact_dedup`` — the ``documents`` table split into 4
  micro-batch file groups plus a replay of the first group, drained
  through ``streaming_exact_dedup`` (persisted parquet digest index,
  broadcast batch probe, index append per trigger).
* ``stream_seasonal_stats`` — the ``events`` table as a file stream
  through the running hour-of-day seasonal aggregation (state bounded
  by key×24, no watermark) into a memory sink.

Each call builds its inputs under a fresh temp dir and removes it, so
repeated bench passes measure the same cold work.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F


def bench_stream_exact_dedup(spark, sf_dir: str) -> int:
    """Drain documents through the exact ingest-dedup stream; returns
    rows emitted (sanity: > 0).  Wall-clock is the bench's metric."""
    from fastmlframework_spark.streaming.dedup import (
        build_digest_index,
        streaming_exact_dedup,
    )

    work = tempfile.mkdtemp(prefix="fastml_stream_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        src = os.path.join(work, "incoming")
        n_batches = 4
        for i in range(n_batches):
            (
                docs.filter(F.col("doc_id") % n_batches == i)
                .coalesce(2)
                .write.mode("overwrite")
                .parquet(os.path.join(src, f"b{i}"))
            )
        # replay group 0 → cross-batch duplicates for the index probe
        (
            docs.filter(F.col("doc_id") % n_batches == 0)
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(os.path.join(src, "replay"))
        )
        index_dir = os.path.join(work, "index")
        build_digest_index(docs.limit(0), index_dir)
        q = streaming_exact_dedup(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/*"),
            index_dir,
            os.path.join(work, "out"),
            os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
        return spark.read.parquet(os.path.join(work, "out")).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_stream_seasonal_stats(spark, sf_dir: str) -> int:
    """Drain events through the running seasonal aggregation; returns
    the number of (key, hour) state cells."""
    from fastmlframework_spark.streaming.windows import (
        run_available_now,
        seasonal_stats,
    )

    work = tempfile.mkdtemp(prefix="fastml_stream_bench_")
    try:
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        src = os.path.join(work, "events_in")
        # 8 file groups → several micro-batches under availableNow
        ev.repartition(8).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        run_available_now(seasonal_stats(stream), "bench_seasonal")
        return spark.table("bench_seasonal").count()
    finally:
        shutil.rmtree(work, ignore_errors=True)





def bench_stream_cusum(spark, sf_dir: str) -> int:
    """Drain events through the stateful CUSUM drift detector with
    state carried across micro-batches; returns 1 on completion.
    Two batches, not more: the wall-clock is dominated by per-batch
    fixed cost (state-store commit across every shuffle partition +
    Arrow worker spin-up), so two batches exercise the cross-batch
    state path at the minimum suite cost."""
    from fastmlframework_spark.streaming.stateful import streaming_cusum

    work = tempfile.mkdtemp(prefix="fastml_stream_bench_")
    try:
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        src = os.path.join(work, "events_in")
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        q = (
            streaming_cusum(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_stream_near_dedup(spark, sf_dir: str) -> int:
    """Drain documents through the MinHash band-index near-dedup
    stream (VERDICT r6 #7): the index is seeded with half the corpus,
    the other half streams in over two micro-batches with a replayed
    slice of the indexed half, so every trigger exercises the corpus
    probe, the within-batch self-probe, and the novel-rows index
    append — the most expensive streaming path and the likeliest to
    regress (an accidental index-side shuffle lands here).  Returns
    rows emitted."""
    from fastmlframework_spark.extensions.dedup import minhash_band_index
    from fastmlframework_spark.streaming.dedup import streaming_near_dedup

    work = tempfile.mkdtemp(prefix="fastml_stream_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        # quarter-corpus slices: the bench gates the PLAN (broadcast
        # probes, no index shuffle), so per-trigger fixed cost + a
        # representative probe size suffice — full halves just triple
        # the suite cost for the same regression signal
        seeded = docs.filter(F.col("doc_id") % 4 == 0)
        index_dir = os.path.join(work, "bindex")
        minhash_band_index(seeded).coalesce(4).write.mode("overwrite").parquet(
            index_dir
        )
        # exactly TWO triggers (wall-clock is per-trigger fixed cost:
        # batch signature jobs + two parquet appends each): trigger 1
        # ingests novel docs, trigger 2 replays an indexed slice under
        # new ids → cross-batch corpus hits through the trigger-1
        # appends
        src = os.path.join(work, "incoming")
        for i in range(2):
            (
                docs.filter((F.col("doc_id") % 8) == 2 * i + 1)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(src, f"b{i}"))
            )
        (
            seeded.filter(F.col("doc_id") % 16 == 0)
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, "replay"))
        )
        q = streaming_near_dedup(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/*"),
            index_dir,
            os.path.join(work, "out"),
            os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
        return spark.read.parquet(os.path.join(work, "out")).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)




def bench_stream_quality_gate(spark, sf_dir: str) -> int:
    """Drain documents through the ingest-time Gopher gate (map-only
    battery + per-trigger stats row); returns rows admitted.  Exists
    so a regression that sneaks state or a shuffle into the gate's
    per-batch plan trips the 2× gate."""
    from fastmlframework_spark.streaming.quality import (
        streaming_quality_gate,
    )

    work = tempfile.mkdtemp(prefix="fastml_stream_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        src = os.path.join(work, "incoming")
        docs.repartition(4).write.mode("overwrite").parquet(src)
        q = streaming_quality_gate(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src),
            os.path.join(work, "out"),
            os.path.join(work, "stats"),
            os.path.join(work, "ckpt"),
        )
        q.awaitTermination()
        return spark.read.parquet(os.path.join(work, "out")).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAMING_BENCHES = {
    "stream_exact_dedup": bench_stream_exact_dedup,
    "stream_seasonal_stats": bench_stream_seasonal_stats,
    "stream_cusum": bench_stream_cusum,
    "stream_near_dedup": bench_stream_near_dedup,
    "stream_quality_gate": bench_stream_quality_gate,
}
