"""Streaming joins and sinks (§2.10 beyond-reference breadth):
stream-static enrichment, watermarked stream-stream interval joins,
and an idempotent foreachBatch parquet sink.

Scale design:

* stream-static: the static dimension is broadcast per micro-batch —
  a map-side hash join with no stream-side shuffle; the dimension is
  re-resolved each batch, so slowly-changing dims pick up updates
  without restarting the query.
* stream-stream: BOTH sides carry watermarks and the join condition
  bounds event-time distance, so the state store retains only the
  watermark-window of rows per side — without the time bound, state
  grows without limit and a 100 TB/day stream OOMs its executors.
* foreachBatch sink: each micro-batch overwrites ONLY its own
  ``__batch_id`` partition (dynamic partition overwrite).  A retried
  batch rewrites the same partition with the same rows —
  write-idempotent end-to-end-exactly-once on top of at-least-once
  batch delivery, the standard Structured Streaming sink contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) dimension
    table.  The dim side is broadcast — per-batch map-side join, the
    stream never shuffles."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    lower_s: int = 0,
    upper_s: int = 1800,
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream join: pairs sharing ``on`` whose
    event times satisfy ``lower_s <= right_ts - left_ts <= upper_s``.

    The interval condition is REQUIRED, not an optimization: it is
    what lets the state store evict rows older than
    watermark + interval bound on each side."""
    l = left.withWatermark(left_ts, watermark)  # noqa: E741
    r = right.withWatermark(right_ts, watermark)
    r = r.select(
        F.col(on).alias("__rk"),
        *[
            F.col(c).alias(f"{c}{right_suffix}")
            for c in right.columns
            if c != on
        ],
    )
    rts = f"{right_ts}{right_suffix}"
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(rts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, on=cond).drop("__rk")


def overwrite_batch_partition(
    df: DataFrame, batch_id: int, path: str
) -> None:
    """The per-batch idempotent parquet write every foreachBatch sink
    in this package shares: the rows land in their own ``__batch_id=N``
    partition via DYNAMIC partition overwrite, so a batch replayed
    after a crash in the write/commit window REPLACES exactly its own
    prior (possibly partial) output instead of appending duplicates —
    at-least-once replays become exactly-once ROWS, provided the
    batch content is deterministic (checkpointed sources pin it).

    Consumers read ``path`` as ordinary parquet; ``__batch_id``
    surfaces as a partition column they can use (stats feeds key on
    it) or drop (data feeds).  Cost vs a plain append: same files and
    layout, plus one partition listing per trigger to find dynamic
    partitions to replace — measured ~0.1-0.2 s per micro-batch on
    the sf0.1 drains, a fixed per-trigger overhead that does not grow
    with corpus size (the listing is over this sink's own partitions,
    and a production retention policy compacts old ones)."""
    (
        df.withColumn("__batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def write_idempotent_parquet(
    stream: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain a stream (availableNow) into parquet with per-batch
    idempotence: every micro-batch lands in its own ``__batch_id``
    partition via DYNAMIC partition overwrite, so a replayed batch
    replaces exactly itself instead of appending duplicates.  The
    checkpoint makes a finished batch never replay at all — the
    partition overwrite covers the crash-mid-batch window."""

    def _write(df: DataFrame, batch_id: int) -> None:
        overwrite_batch_partition(df, batch_id, path)

    q = (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
