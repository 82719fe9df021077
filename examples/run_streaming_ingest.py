#!/usr/bin/env python
"""Continuous ingest with ingest-time deduplication — the streaming
half of the curation story as one runnable flow:

    corpus digest+band indexes  ←  built once from the seed corpus
    incoming parquet drops      →  micro-batches (availableNow here;
                                   a real deployment just drops the
                                   trigger and keeps the stream up)
    per batch: exact screen (digest index) → novel rows survive
               near screen (MinHash band index) → collision counts
               both indexes appended so later batches see this one
    plus the hour-of-day seasonal baseline as a running aggregation

    python examples/run_streaming_ingest.py
        [--sf-dir /root/testdata/sf0.001] [--out /tmp/stream_ingest]

Prints a one-line JSON summary; artifacts land under --out.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.extensions.dedup import minhash_band_index  # noqa: E402
from fastmlframework_spark.streaming.dedup import (  # noqa: E402
    build_digest_index,
    streaming_exact_dedup,
    streaming_near_dedup,
)
from fastmlframework_spark.streaming.windows import (  # noqa: E402
    run_available_now,
    seasonal_stats,
)


def run(spark, sf_dir: str, out: str) -> dict:
    if os.path.isdir(out):
        shutil.rmtree(out)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # seed corpus → persisted indexes (built once, shared by streams)
    exact_ix = os.path.join(out, "digest_index")
    band_ix = os.path.join(out, "band_index")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    build_digest_index(corpus, exact_ix)
    minhash_band_index(corpus).write.mode("overwrite").parquet(band_ix)

    # two incoming drops: half replays of corpus docs (exact dups),
    # half truncated copies (near dups), half genuinely new ids with
    # shuffled-but-identical text across drops (cross-batch dups)
    src = os.path.join(out, "incoming")
    drop1 = docs.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    drop2 = docs.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + 600_000).alias("doc_id"), "text"  # dup of drop1
    )
    drop1.coalesce(1).write.parquet(src + "/d1")
    drop2.coalesce(1).write.parquet(src + "/d2")

    schema = drop1.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming_exact_dedup(
        stream, exact_ix, os.path.join(out, "novel"),
        os.path.join(out, "ckpt_exact"),
    )
    q.awaitTermination()

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q2 = streaming_near_dedup(
        stream2, band_ix, os.path.join(out, "near_decisions"),
        os.path.join(out, "ckpt_near"),
    )
    q2.awaitTermination()

    # running seasonal baseline over the event stream
    events = load_table(spark, sf_dir, "events")
    esrc = os.path.join(out, "events_src")
    events.write.mode("overwrite").parquet(esrc)
    estream = spark.readStream.schema(events.schema).parquet(esrc)
    run_available_now(seasonal_stats(estream), "ingest_seasonal")
    seasonal = spark.table("ingest_seasonal")

    novel = spark.read.parquet(os.path.join(out, "novel"))
    near = spark.read.parquet(os.path.join(out, "near_decisions"))
    summary = {
        "corpus_docs": corpus.count(),
        "incoming_rows": drop1.count() + drop2.count(),
        "novel_emitted": novel.count(),
        "cross_batch_dups_dropped": int(
            drop2.count() - novel.filter(F.col("batch_id") == 1).count()
        ),
        "near_flagged": near.filter(F.col("n_corpus_matches") > 0).count(),
        "seasonal_cells": seasonal.count(),
    }
    with open(os.path.join(out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/stream_ingest")
    args = ap.parse_args()
    spark = get_spark(app_name="streaming-ingest-example",
                      master="local[8]", shuffle_partitions=8)
    print(json.dumps(run(spark, args.sf_dir, args.out)))


if __name__ == "__main__":
    main()
