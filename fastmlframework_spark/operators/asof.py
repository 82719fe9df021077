"""As-of (point-in-time) join — a custom operator Spark lacks
natively (SURVEY.md / build brief: compose from existing DataFrame
ops when semantics allow).

``asof_join(left, right, ...)``: each left row picks the single right
row with the LARGEST right_ts ≤ left_ts within the same key — the
point-in-time lookup of feature stores and market-data pipelines.

Implementation is the canonical distributed composition: tag and
union both sides, sort within each key by (ts, right-first), and
carry the last non-null right payload forward with an
``ignoreNulls`` running window.  One shuffle on the key, state is a
single row per partition scan — linear at any scale, no range
explosion.  Ties (right_ts == left_ts) match, like DuckDB/kdb asof.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join → all left columns + ``<right_col><suffix>``
    for each carried right column (null when no right row precedes)."""
    keys = list(on)
    right_cols = list(
        right_cols
        or [c for c in right.columns if c not in keys and c != right_ts]
    )
    # left_ts must NOT be in the payload: __ts is renamed back to
    # left_ts at the end, so carrying it twice would leave a duplicate,
    # ambiguous timestamp column in the output.
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
        *left_payload,
    )
    # Right rows sort BEFORE left rows at equal __ts → ties match.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).select(
        *keys,
        "__ts",
        "__is_right",
        *left_payload,
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("__is_right") == 0)
        .withColumnRenamed("__ts", left_ts)
        .drop("__is_right")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Range (interval) join: pairs where
    ``lower <= right_ts - left_ts <= upper`` (epoch seconds), sharing
    the equi-keys ``on``.

    A naive theta-join degenerates to per-key cross products; here the
    time axis is sharded into buckets of width (upper - lower + 1):
    the left side lands in one bucket, the right side EXPLODES into
    the (at most two) buckets its admissible window overlaps, and the
    pair space reduces to an equi-join on (keys, bucket) + the exact
    range predicate.  Shuffle volume is O(rows), never O(pairs).
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    width = max(upper - lower + 1, 1)
    keys = list(on)

    # Fractional epoch seconds (cast keeps sub-second precision;
    # unix_timestamp would TRUNCATE and silently shift range
    # boundaries for sub-second timestamps).
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")

    lren = [
        F.col(c).alias(f"{c}{suffixes[0]}")
        for c in left.columns
        if c not in keys
    ]
    rren = [
        F.col(c).alias(f"{c}{suffixes[1]}")
        for c in right.columns
        if c not in keys
    ]
    l = left.select(  # noqa: E741
        *keys, *lren, F.floor(lsec / width).alias("__bkt"),
        lsec.alias("__lsec"),
    )
    r = right.select(
        *keys,
        *rren,
        F.explode(
            F.sequence(
                F.floor((rsec - upper) / width),
                F.floor((rsec - lower) / width),
            )
        ).alias("__bkt"),
        rsec.alias("__rsec"),
    )
    delta = F.col("__rsec") - F.col("__lsec")
    return (
        l.join(r, on=keys + ["__bkt"])
        .filter((delta >= lower) & (delta <= upper))
        .drop("__bkt", "__lsec", "__rsec")
    )
