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
    DoubleType,
    LongType,
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
