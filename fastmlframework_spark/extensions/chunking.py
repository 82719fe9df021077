"""Document chunking for training-data pipelines (SURVEY.md §7.5
extension family): split each document into overlapping token windows
— the standard pre-tokenization step before packing sequences for LLM
training.

Everything is JVM-side array/higher-order-function expressions
(``regexp_extract_all`` → ``sequence`` → ``slice``), no Python UDFs:
a 100 TB documents table chunks in one narrow scan with whole-stage
codegen and NO shuffle — chunking is embarrassingly parallel per
document, and the explode multiplies rows inside the same partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.extensions.text import TOKEN_PATTERN


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 40,
    overlap: int = 10,
) -> DataFrame:
    """Sliding token windows of ``chunk_size`` with ``overlap`` tokens
    shared between consecutive chunks (step = size - overlap).

    A window starts at every multiple of the step that is < n_tokens,
    so trailing partial chunks are kept (they carry the document tail).
    Empty documents yield exactly one empty chunk — deterministic and
    cross-engine stable, rather than silently dropping the row.

    Output adds ``chunk_idx`` (0-based), ``n_chunk_tokens``, and
    ``chunk_digest`` (md5 of the space-joined window — a compact,
    oracle-comparable identity for the chunk text).
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_size ({chunk_size})"
        )
    step = chunk_size - overlap
    tokens = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(tokens) - 1, F.lit(0)), F.lit(step)
    )
    chunk_tokens = F.slice(F.col("__tokens"), F.col("start") + 1, chunk_size)
    return (
        df.withColumn("__tokens", tokens)
        .select("*", F.explode(starts).alias("start"))
        .select(
            *[c for c in df.columns if c != text_col],
            (F.col("start") / step).cast("long").alias("chunk_idx"),
            F.size(chunk_tokens).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk_tokens, " ")).alias("chunk_digest"),
        )
    )
