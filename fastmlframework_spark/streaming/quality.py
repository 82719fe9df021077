"""Ingest-time quality gating (streaming twin of the Gopher battery).

Production corpora are filtered AT INGEST, not in a later batch pass —
every document admitted unfiltered is storage + downstream compute
wasted.  ``streaming_quality_gate`` runs the exact batch rule battery
(``extensions.filtering.gopher_rule_flags`` — one map-only projection,
no state, no shuffle) inside a foreachBatch sink that appends the
surviving rows AND a per-trigger admission-stats row, the monitoring
feed an ingest dashboard tails.

Scale shape: the gate itself is stateless per-row expression work that
whole-stage-codegens into the micro-batch scan; the only aggregation
is the 1-row per-batch stats count.  Nothing here grows with corpus
size — state is zero, so (unlike the dedup streams) there is no index
to probe and no watermark to manage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.extensions.filtering import gopher_rule_flags


def streaming_quality_gate(
    stream_df: DataFrame,
    out_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Start a foreachBatch stream that scores each micro-batch with
    the Gopher rule battery, appends PASSING rows (original columns)
    to ``out_dir``, and appends one [batch_id, n_in, n_pass] stats row
    to ``stats_dir``.  Returns the StreamingQuery (caller awaits/stops
    it; tests drain with availableNow).

    Batch parity contract (pytest-pinned): the union of all batch
    outputs equals ``gopher_rule_flags(corpus).filter(passes)`` over
    the concatenated input — the gate is stateless, so micro-batch
    boundaries cannot change any decision."""
    in_cols = stream_df.columns

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        flagged = gopher_rule_flags(batch_df, text_col).cache()
        try:
            (
                flagged.filter(F.col("passes"))
                .select(*in_cols)
                .write.mode("append")
                .parquet(out_dir)
            )
            (
                flagged.agg(
                    F.count(F.lit(1)).alias("n_in"),
                    F.sum(F.col("passes").cast("long")).alias("n_pass"),
                )
                .select(
                    F.lit(batch_id).alias("batch_id"), "n_in", "n_pass"
                )
                .write.mode("append")
                .parquet(stats_dir)
            )
        finally:
            flagged.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
