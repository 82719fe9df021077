"""Ingestion: CSV scan + schema narrowing + key minting.

Reference parity (file:line in /root/reference):

* S1 CSV scan with optional debug row limit —
  solution_pipeline/create_solution.py:50-56.
* Downcast pass — data_processing/preprocessing.py:16-48: per-column
  min/max drives the narrowest integer width.  The reference also
  narrows floats to float16/float32; Spark has no float16 and float
  narrowing loses oracle-parity precision, so the default narrows
  integer widths only (SURVEY.md §4 "int widths only").
* Key minting — §1.4: the reference aligns tables by ROW POSITION
  (reset_index at create_solution.py:50-57); Spark DataFrames have no
  row order, so every ingested table gets an explicit key column:
  the configured ``index_column`` when defined, else a minted
  ``monotonically_increasing_id`` captured once at ingestion.

Scale notes: the min/max statistics are ONE aggregate pass over all
columns at once (not a per-column loop like preprocessing.py:24);
casts are metadata-only select expressions; ``spark.read.csv`` with an
explicit schema avoids the double-scan of schema inference at 100 TB
(inference only happens when no schema is supplied).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core import checkpoints
from pyspark.sql import types as T

# Ordered narrowest-first; (spark type, min, max).  Mirrors the
# int8/16/32/64 ladder at preprocessing.py:29-37.
_INT_LADDER = (
    (T.ByteType(), -(2**7), 2**7 - 1),
    (T.ShortType(), -(2**15), 2**15 - 1),
    (T.IntegerType(), -(2**31), 2**31 - 1),
    (T.LongType(), -(2**63), 2**63 - 1),
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass
class IngestReport:
    """What the narrowing pass decided (the downcaster's printout at
    preprocessing.py:22-23/45-47, as data instead of stdout)."""

    row_count: int
    narrowed: dict[str, str] = field(default_factory=dict)  # col -> new type
    key_col: str = "row_key"
    key_minted: bool = False


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    nrows: int | None = None,
) -> DataFrame:
    """S1: header CSV scan; ``nrows`` is the debug limit
    (create_solution.py:44-56 ``nrows=num_rows if debug``)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.option("inferSchema", True).csv(path)
    if nrows is not None:
        df = df.limit(nrows)
    return df


def narrow_schema(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """A1-driven downcast (preprocessing.py:16-48): one global agg of
    per-column min/max picks the narrowest integer type.  String,
    timestamp, float and non-integral columns pass through unchanged
    (strings/datetimes skipped at preprocessing.py:26; float widths
    intentionally kept — §1.2 float16 note)."""
    int_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _INTEGRAL)
    ]
    if not int_cols:
        return df, {}
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in int_cols],
        *[F.max(c).alias(f"max_{c}") for c in int_cols],
    ).collect()[0]
    narrowed: dict[str, str] = {}
    exprs = []
    for f in df.schema.fields:
        c = f.name
        if c not in int_cols:
            exprs.append(F.col(c))
            continue
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None:  # all-null column
            exprs.append(F.col(c))
            continue
        target = f.dataType
        for t, tmin, tmax in _INT_LADDER:
            if lo >= tmin and hi <= tmax:
                target = t
                break
        if target.simpleString() != f.dataType.simpleString():
            narrowed[c] = target.simpleString()
            exprs.append(F.col(c).cast(target).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs), narrowed


def mint_key(
    df: DataFrame,
    index_column: str | None = None,
    key_col: str = "row_key",
) -> tuple[DataFrame, bool]:
    """§1.4: thread an explicit row key.  Uses ``index_column`` when
    configured (solution.conf:15 / prediction.py:128-135 definedness
    check); otherwise mints ``monotonically_increasing_id`` — minted
    ONCE here and persisted with the artifact so downstream joins are
    stable (never re-derived)."""
    if index_column is not None:
        if index_column not in df.columns:
            raise KeyError(
                f"configured index_column {index_column!r} not in {df.columns}"
            )
        if index_column != key_col:
            df = df.withColumn(key_col, F.col(index_column))
        return df, False
    return df.withColumn(key_col, F.monotonically_increasing_id()), True


def ingest_csv(
    spark: SparkSession,
    path: str,
    *,
    index_column: str | None = None,
    key_col: str = "row_key",
    nrows: int | None = None,
    narrow: bool = True,
) -> tuple[DataFrame, IngestReport]:
    """O1 body: scan → narrow → mint key (create_solution.py:32-69).
    The returned frame is what TrainDataIngestion persists to Parquet."""
    df = read_csv(spark, path, nrows=nrows)
    narrowed: dict[str, str] = {}
    if narrow:
        df, narrowed = narrow_schema(df)
    df, minted = mint_key(df, index_column, key_col)
    if minted and nrows is not None:
        # `limit(n)` over a multi-split scan may pick different rows on
        # each re-evaluation, so a key minted on top of it would not be
        # a stable key→row mapping.  Materialize once (debug path only:
        # nrows-sized, tiny) so every downstream action sees the same
        # rows with the same minted keys.
        df = checkpoints.checkpoint(df, eager=True)
    report = IngestReport(
        row_count=df.count(),
        narrowed=narrowed,
        key_col=key_col,
        key_minted=minted,
    )
    return df, report
