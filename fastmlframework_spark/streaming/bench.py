"""Streaming throughput micro-benches (VERDICT r5 #7, r7 #7).

The streaming family has parity and soak tests but, until round 6, no
perf number — a regression in the foreachBatch index-probe path (say,
an accidental index shuffle) would not trip any gate.  These benches
run real Structured Streaming queries end-to-end (file source →
micro-batches → foreachBatch / running aggregation → sink) over the
driver testdata and are timed by ``bench.py`` alongside the batch
queries, so the same 2×-vs-baseline gate covers them.

Shared prep root (r7 #7): ``bench.py`` times each drain best-of-3, and
until round 7 every pass re-wrote its input file groups (and the
near-dedup seeded band index) from scratch — ~2-3 s of batch parquet
writes counted against every streaming number.  Inputs are now built
ONCE per (bench, sf_dir) under a single process-lifetime work root and
reused across passes; only the run-scoped state (output dir,
checkpoint, and the digest/band index the stream APPENDS to) is fresh
per pass — the seeded band index is file-copied from a cached template
instead of recomputed, so repeat passes do identical streaming work
over identical inputs.  The min-of-3 therefore measures the DRAIN, not
the test harness's input writes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pyspark.sql.functions as F

_WORK_ROOT: str | None = None
_PREPPED: dict[tuple[str, str], dict] = {}

# Per-bench batch-level timing detail from the LAST drain (VERDICT
# r10 #4): the wall-clock number bench.py records is dominated by
# fixed stream setup (checkpoint init, source listing) at small SF,
# which hides the per-batch cost that actually scales.  Each bench
# stores the listener-reported trigger durations here; bench.py
# subtracts their sum from the wall time to report setup vs
# steady-state separately in BENCH_*.json's ``stream_detail``.
LAST_STREAM_DETAIL: dict[str, dict] = {}


def _capture_progress(name: str, q) -> None:
    """Record per-trigger execution times from the drained query's
    progress feed into ``LAST_STREAM_DETAIL[name]``.  availableNow
    drains emit one final empty progress event; only batches with
    rows count toward steady-state."""
    try:
        prog = [p for p in (q.recentProgress or []) if p]
        durs = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in prog
            if p.get("numInputRows", 0) > 0
            and "triggerExecution" in p.get("durationMs", {})
        ]
        if not durs:
            return
        durs.sort()
        mid = len(durs) // 2
        median = (
            durs[mid]
            if len(durs) % 2
            else (durs[mid - 1] + durs[mid]) / 2.0
        )
        LAST_STREAM_DETAIL[name] = {
            "n_batches": len(durs),
            "batch_total_sec": round(sum(durs), 4),
            "batch_median_sec": round(median, 4),
            "batch_max_sec": round(durs[-1], 4),
        }
    except Exception:  # detail is advisory — never fail the bench
        LAST_STREAM_DETAIL.pop(name, None)


def _work_root() -> str:
    global _WORK_ROOT
    if _WORK_ROOT is None or not os.path.isdir(_WORK_ROOT):
        _WORK_ROOT = tempfile.mkdtemp(prefix="fastml_stream_bench_")
        atexit.register(shutil.rmtree, _WORK_ROOT, ignore_errors=True)
    return _WORK_ROOT


def _prep(name: str, sf_dir: str, build) -> dict:
    """Build-once cache: ``build(prep_dir) -> ctx`` runs only the first
    time per (bench, sf_dir) and whenever its directory vanished."""
    key = (name, sf_dir)
    ctx = _PREPPED.get(key)
    if ctx is not None and os.path.isdir(ctx["dir"]):
        return ctx
    prep_dir = os.path.join(_work_root(), f"{name}_{abs(hash(sf_dir))}")
    shutil.rmtree(prep_dir, ignore_errors=True)
    os.makedirs(prep_dir)
    ctx = dict(build(prep_dir) or {})
    ctx["dir"] = prep_dir
    ctx["n_runs"] = 0
    _PREPPED[key] = ctx
    return ctx


def _run_dir(ctx: dict) -> str:
    """Fresh per-pass scratch (out/ckpt/index live here); the previous
    pass's scratch is removed so repeated passes don't accumulate."""
    ctx["n_runs"] += 1
    prev = os.path.join(ctx["dir"], f"run{ctx['n_runs'] - 1}")
    shutil.rmtree(prev, ignore_errors=True)
    d = os.path.join(ctx["dir"], f"run{ctx['n_runs']}")
    os.makedirs(d)
    return d


def bench_stream_exact_dedup(spark, sf_dir: str) -> int:
    """Drain documents through the exact ingest-dedup stream; returns
    rows emitted (sanity: > 0).  Wall-clock is the bench's metric."""
    from fastmlframework_spark.streaming.dedup import (
        build_digest_index,
        streaming_exact_dedup,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "incoming")
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
        return {"src": src}

    ctx = _prep("exact_dedup", sf_dir, build)
    rd = _run_dir(ctx)
    index_dir = os.path.join(rd, "index")
    build_digest_index(docs.limit(0), index_dir)
    q = streaming_exact_dedup(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ctx["src"] + "/*"),
        index_dir,
        os.path.join(rd, "out"),
        os.path.join(rd, "ckpt"),
    )
    q.awaitTermination()
    _capture_progress("stream_exact_dedup", q)
    return spark.read.parquet(os.path.join(rd, "out")).count()


def bench_stream_seasonal_stats(spark, sf_dir: str) -> int:
    """Drain events through the running seasonal aggregation; returns
    the number of (key, hour) state cells."""
    from fastmlframework_spark.streaming.windows import (
        run_available_now,
        seasonal_stats,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "events_in")
        # 8 file groups → several micro-batches under availableNow
        ev.repartition(8).write.mode("overwrite").parquet(src)
        return {"src": src}

    ctx = _prep("seasonal", sf_dir, build)
    _run_dir(ctx)  # keeps pass accounting symmetric; memory sink needs no dirs
    # Isolated session clone (VERDICT r13 #6): the state_partitions
    # override mutates the stream's session conf around start(), and
    # this session must not be the one concurrent batch work plans on.
    # newSession() shares the SparkContext (and the prepared files)
    # but owns its SQLConf, so the override cannot leak.
    iso = spark.newSession()
    stream = iso.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(ctx["src"])
    # state_partitions=8: the running aggregation's state is bounded
    # by |event_type|·24 cells (~hundreds of rows) and every state
    # partition pays an open/commit per micro-batch — partitions
    # follow state cardinality, not cluster width (measured 4.1 s →
    # 2.3 s at sf0.1; the input-side partial aggregate upstream of
    # the state exchange still uses every core).
    run_available_now(
        seasonal_stats(stream), "bench_seasonal", state_partitions=8
    )
    # memory-sink tables are session-scoped temp views: read via iso
    return iso.table("bench_seasonal").count()


def bench_stream_cusum(spark, sf_dir: str) -> int:
    """Drain events through the stateful CUSUM drift detector with
    state carried across micro-batches; returns 1 on completion.
    Two batches, not more: the wall-clock is dominated by per-batch
    fixed cost (state-store commit across every shuffle partition +
    Arrow worker spin-up), so two batches exercise the cross-batch
    state path at the minimum suite cost."""
    from fastmlframework_spark.streaming.stateful import streaming_cusum

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "events_in")
        ev.repartition(4).write.mode("overwrite").parquet(src)
        return {"src": src}

    ctx = _prep("cusum", sf_dir, build)
    rd = _run_dir(ctx)
    # Isolated session clone (VERDICT r13 #6): the shuffle-partition
    # override below lives and dies with this throwaway session, so
    # no concurrently-planned batch query can observe it and no
    # restore step is needed.
    iso = spark.newSession()
    stream = iso.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(ctx["src"])
    # State partitions sized to state cardinality (ONE double per
    # key, |event_type| keys), not cluster width — same rationale as
    # the seasonal bench (measured 2.25 s → 1.70 s); pinned at
    # checkpoint creation from the session conf before start().
    iso.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        streaming_cusum(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(rd, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _capture_progress("stream_cusum", q)
    return 1


def bench_stream_near_dedup(spark, sf_dir: str) -> int:
    """Drain documents through the MinHash band-index near-dedup
    stream (VERDICT r6 #7): the index is seeded with half the corpus,
    the other half streams in over two micro-batches with a replayed
    slice of the indexed half, so every trigger exercises the corpus
    probe, the within-batch self-probe, and the novel-rows index
    append — the most expensive streaming path and the likeliest to
    regress (an accidental index-side shuffle lands here).  Returns
    rows emitted.  The stream appends to its index, so each pass gets
    a file-copy of the seeded-index template, not a recompute."""
    from fastmlframework_spark.extensions.dedup import minhash_band_index
    from fastmlframework_spark.streaming.dedup import streaming_near_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(prep_dir: str) -> dict:
        # quarter-corpus slices: the bench gates the PLAN (broadcast
        # probes, no index shuffle), so per-trigger fixed cost + a
        # representative probe size suffice — full halves just triple
        # the suite cost for the same regression signal
        seeded = docs.filter(F.col("doc_id") % 4 == 0)
        tmpl = os.path.join(prep_dir, "bindex_template")
        minhash_band_index(seeded).coalesce(4).write.mode(
            "overwrite"
        ).parquet(tmpl)
        # exactly TWO triggers (wall-clock is per-trigger fixed cost:
        # batch signature jobs + two parquet appends each): trigger 1
        # ingests novel docs, trigger 2 replays an indexed slice under
        # new ids → cross-batch corpus hits through the trigger-1
        # appends
        src = os.path.join(prep_dir, "incoming")
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
        return {"src": src, "tmpl": tmpl}

    ctx = _prep("near_dedup", sf_dir, build)
    rd = _run_dir(ctx)
    index_dir = os.path.join(rd, "bindex")
    shutil.copytree(ctx["tmpl"], index_dir)
    q = streaming_near_dedup(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ctx["src"] + "/*"),
        index_dir,
        os.path.join(rd, "out"),
        os.path.join(rd, "ckpt"),
    )
    q.awaitTermination()
    _capture_progress("stream_near_dedup", q)
    return spark.read.parquet(os.path.join(rd, "out")).count()


def bench_stream_quality_gate(spark, sf_dir: str) -> int:
    """Drain documents through the ingest-time Gopher gate (map-only
    battery + per-trigger stats row); returns rows admitted.  Exists
    so a regression that sneaks state or a shuffle into the gate's
    per-batch plan trips the 2× gate."""
    from fastmlframework_spark.streaming.quality import (
        streaming_quality_gate,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "incoming")
        docs.repartition(4).write.mode("overwrite").parquet(src)
        return {"src": src}

    ctx = _prep("quality_gate", sf_dir, build)
    rd = _run_dir(ctx)
    q = streaming_quality_gate(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ctx["src"]),
        os.path.join(rd, "out"),
        os.path.join(rd, "stats"),
        os.path.join(rd, "ckpt"),
    )
    q.awaitTermination()
    _capture_progress("stream_quality_gate", q)
    return spark.read.parquet(os.path.join(rd, "out")).count()


def bench_stream_pii_scrub(spark, sf_dir: str) -> int:
    """Drain documents through the ingest-time PII scrub (map-only
    chained regexp mask + per-trigger stats row); returns rows
    written.  Exists so a regression that sneaks state or a shuffle
    into the scrub's per-batch plan trips the 2x gate."""
    from fastmlframework_spark.streaming.quality import (
        streaming_pii_scrub,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "incoming")
        docs.repartition(4).write.mode("overwrite").parquet(src)
        return {"src": src}

    ctx = _prep("pii_scrub", sf_dir, build)
    rd = _run_dir(ctx)
    q = streaming_pii_scrub(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ctx["src"]),
        os.path.join(rd, "out"),
        os.path.join(rd, "stats"),
        os.path.join(rd, "ckpt"),
    )
    q.awaitTermination()
    _capture_progress("stream_pii_scrub", q)
    return spark.read.parquet(os.path.join(rd, "out")).count()


def bench_stream_decontamination(spark, sf_dir: str) -> int:
    """Drain documents through the ingest-time Bloom decontamination
    gate (immutable collected filter, map-only per-batch probe, one
    fanned-in partitioned write + a 1-row observed-stats write per
    trigger); returns rows admitted.  Exists so a
    regression that sneaks a filter rebuild or a shuffle into the
    per-batch plan trips the 2× gate."""
    from fastmlframework_spark.extensions.curation import (
        ngram_bloom_filter,
    )
    from fastmlframework_spark.streaming.quality import (
        decontamination_admitted_dir,
        streaming_decontamination_gate,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def build(prep_dir: str) -> dict:
        src = os.path.join(prep_dir, "incoming")
        docs.repartition(4).write.mode("overwrite").parquet(src)
        return {"src": src}

    ctx = _prep("decontamination", sf_dir, build)
    rd = _run_dir(ctx)
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.expr(
            "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
            " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
        ).alias("text")
    )
    bloom = ngram_bloom_filter(evals, n=5, num_bits=None, num_hashes=5)
    q = streaming_decontamination_gate(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ctx["src"]),
        bloom,
        os.path.join(rd, "gate"),
        os.path.join(rd, "stats"),
        os.path.join(rd, "ckpt"),
        # 2 files/trigger = 2 input splits: without this, the pure-map
        # probe runs on 2 cores at every scale (see the gate docstring)
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    q.awaitTermination()
    _capture_progress("stream_decontamination", q)
    return spark.read.parquet(
        decontamination_admitted_dir(os.path.join(rd, "gate"))
    ).count()


STREAMING_BENCHES = {
    "stream_exact_dedup": bench_stream_exact_dedup,
    "stream_seasonal_stats": bench_stream_seasonal_stats,
    "stream_cusum": bench_stream_cusum,
    "stream_near_dedup": bench_stream_near_dedup,
    "stream_pii_scrub": bench_stream_pii_scrub,
    "stream_quality_gate": bench_stream_quality_gate,
    "stream_decontamination": bench_stream_decontamination,
}
