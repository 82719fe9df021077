"""Time-series regularization: bucketed resample + gap-fill with
forward fill — the hypertable/feature-store step that turns an
irregular event stream into a dense per-key time grid.

Scale design: the grid is generated per key from that key's own
[min, max] span (``sequence`` + ``explode`` — bounded by span/step,
never a global calendar cross join); the forward fill is one
``last(ignoreNulls)`` running window over the same key partitioning,
so the whole operator costs one shuffle on the key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Dense per-key grid → [key, bucket, filled, is_gap].

    Buckets the stream to ``trunc_unit``, aggregates the in-bucket
    mean, expands each key's span into a dense grid at ``step``, and
    carries the last observed mean forward across empty buckets
    (``is_gap`` marks carried rows)."""
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    per_bucket = df.groupBy(
        F.col(key_col), bucket.alias("bucket")
    ).agg(F.avg(value_col).alias("__v"))
    spans = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(__lo, __hi, interval {step})")).alias(
            "bucket"
        ),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(per_bucket, on=[key_col, "bucket"], how="left").select(
        F.col(key_col),
        F.col("bucket"),
        F.last("__v", ignorenulls=True).over(w).alias("filled"),
        F.col("__v").isNull().alias("is_gap"),
    )
