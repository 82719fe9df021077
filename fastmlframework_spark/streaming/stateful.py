"""Custom stateful streaming operators (SURVEY.md §7.5 /
BASELINE north-star: ``applyInPandasWithState`` for operators the
built-in windowed aggregations can't express).

The reference has no streaming at all (§2.10) — these are the
beyond-reference extensions a large-scale ingest pipeline needs:

* ``running_user_totals``: per-key running aggregates maintained
  across micro-batches in keyed state.  State is one small tuple per
  user — bounded by |keys|, partitioned by the grouping key, so it
  scales to any event volume.
* ``streaming_sessions``: built-in ``session_window`` gap-merge with a
  watermark (bounded state, late data dropped past the watermark).

Both run in tests via file-source → ``maxFilesPerTrigger=1`` (forcing
multiple micro-batches, so state genuinely crosses batch boundaries)
→ memory sink.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across micro-batches.

    Emits the UPDATED totals for every user seen in the current batch;
    state carries the accumulated totals forward.  No timeout: user
    state lives for the query lifetime (add ProcessingTimeTimeout
    eviction for unbounded key spaces)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessions(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Watermarked session_window aggregation: sessions close when no
    event arrives within ``gap``; watermark bounds state →
    [user_id, session_start, session_end, n_events]."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events_stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys``: keeps the first arrival of
    each key, dropping replays/duplicates that arrive within the
    watermark horizon.  State stores one entry per key and is EVICTED
    once the watermark passes — the bounded-state form of ingest-time
    dedup (plain ``dropDuplicates`` on a stream retains state
    forever).  The batch analogue is ``extensions.dedup.exact_dedup``.
    """
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


_CUSUM_STATE_SCHEMA = StructType([StructField("s", DoubleType())])


def _cusum_schema(in_schema: StructType, id_col: str, key_col: str) -> StructType:
    """Output schema named after the CALLER's columns (non-default
    key/id columns must not come back labeled event_id/event_type)."""
    return StructType(
        [
            StructField(id_col, in_schema[id_col].dataType),
            StructField(key_col, in_schema[key_col].dataType),
            StructField("cusum", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )


def streaming_cusum(
    events_stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.cusum``: Page's
    one-sided CUSUM S_t = max(0, S_{t-1} + x_t − k), alarm when
    S_t > h, with the per-key detector value carried ACROSS
    micro-batches in keyed state — drift alarms fire at ingest time
    instead of a nightly batch.  This fills the
    ``applyInPandasWithState`` "custom stateful operator" slot the
    batch docstring points at.

    State is ONE double per key (the current S), partitioned by the
    grouping key — bounded by |keys|, scale-free in event volume.
    Spark hands a key's micro-batch rows to ``update`` as ARBITRARY
    Arrow chunks in shuffle order (``arrow.maxRecordsPerBatch`` rows
    each), so the key's batch is materialized and sorted ONCE by
    (ts, id) before the recursion — chunk-local sorts would interleave
    chunks out of global time order and silently diverge from the
    batch operator for any key spanning >1 chunk.  The memory bound is
    one key's rows per micro-batch (trigger-sized, not stream-sized).
    The recursion is the same left-associated ``(s + x) − k`` float64
    loop as the batch operator, so when micro-batches arrive in
    timestamp order (the ingest premise) the emitted values equal the
    batch ``cusum`` over the concatenated stream bit-for-bit — pinned
    by the cross-batch parity test, including a forced multi-chunk
    run at ``maxRecordsPerBatch=7``.  NULL values are dropped up
    front (no evidence, no state change), matching the batch form."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (s,) = state.get if state.exists else (0.0,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            pdf = pdf.sort_values([ts_col, id_col])
            out = []
            for x in pdf[val_col].astype(float):
                s = s + x - k
                if s < 0.0:
                    s = 0.0
                out.append(s)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    key_col: [key[0]] * len(pdf),
                    "cusum": [round(v, 6) for v in out],
                    "alarm": [v > h for v in out],
                }
            )
        state.update((s,))

    return (
        events_stream.filter(F.col(val_col).isNotNull())
        .select(id_col, key_col, ts_col, val_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=_cusum_schema(
                events_stream.schema, id_col, key_col
            ),
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
