"""Scalar/column transforms (SURVEY.md §2.7 F1-F7).

Reference behaviors (file:line cite /root/reference/):
* F1 log/log1p with zero-aware branch — data_processing/preprocessing.py:374-378
* F2 power transforms x^k for left skew — preprocessing.py:297-299
* F3 root transforms — preprocessing.py:284-286.  NOTE: the reference
  has an operator-precedence bug (``x ** 1 / 2`` == x/2), making its
  "roots" scale-only no-ops for skew; per SURVEY.md §7.4(4) we
  implement the INTENDED ``x ** (1/k)``; ``faithful=True`` reproduces
  the buggy x/k.
* F4 abs flip for all-negative columns — preprocessing.py:361
* F5 round to target decimals / int-cast when decimals == 0 —
  modeling/prediction.py:230-234, :444-449
* F6/F7 column renames (upper, prefix/suffix) — preprocessing.py:147-148,
  ensembling/ensembler.py:85-91
* Transform selection by skew sign/threshold — preprocessing.py:326-387
  (the reference's swapped-branch bug, §7.4(4), is NOT replicated:
  right skew (g1 > thresh) gets the compressive log family, left skew
  the power family — the documented intent).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from fastmlframework_spark.operators.profiling import _stack_long


def log_transform(col: Column, zero_aware: bool = True) -> Column:
    """F1: natural log; log1p when the domain may contain zero."""
    return F.log1p(col) if zero_aware else F.log(col)


def power_transform(col: Column, k: int) -> Column:
    """F2: x^k (k ∈ {2,3,4}) for left-skewed distributions."""
    return F.pow(col, F.lit(k))


def root_transform(col: Column, k: int, faithful: bool = False) -> Column:
    """F3: intended x^(1/k); ``faithful`` reproduces the reference's
    precedence bug (x/k)."""
    return col / F.lit(k) if faithful else F.pow(col, F.lit(1.0) / F.lit(k))


def abs_flip(col: Column) -> Column:
    """F4: |x| for all-negative distributions."""
    return F.abs(col)


def round_predictions(df: DataFrame, cols: Sequence[str], decimals: int) -> DataFrame:
    """F5: round prediction columns to ``decimals``; int-cast when 0."""
    out = df
    for c in cols:
        rounded = F.round(F.col(c), decimals)
        out = out.withColumn(c, rounded.cast("long") if decimals == 0 else rounded)
    return out


def one_hot_columns(
    df: DataFrame,
    cols: Sequence[str],
    uppercase: bool = True,
    max_categories: int = 100,
) -> DataFrame:
    """``pd.get_dummies`` equivalent (preprocessing.py:84-86/:136-150):
    one 0/1 indicator column per observed category value.

    All category domains are collected in ONE aggregate job (a single
    ``collect_set`` per column — not a per-column ``distinct``
    round-trip), then encoding is a pure projection of equality flags:
    no shuffle of the main table, scale-independent.  Each
    ``collect_set`` is capped JVM-side at ``max_categories + 1``
    elements, so a runaway high-cardinality column is detected and
    raises without the full domain ever reaching the driver.  F6 note:
    the reference uppercases ALL column names after OHE (a documented
    over-reach, preprocessing.py:147-148 / SURVEY §7.4); here only the
    new indicator columns are uppercased."""
    import re

    if not cols:
        return df
    domains_row = df.agg(
        *[
            F.expr(
                f"slice(array_sort(collect_set(`{c}`)), 1, {max_categories + 1})"
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    out = df
    for c in cols:
        vals = sorted(v for v in (domains_row[c] or []) if v is not None)
        if len(vals) > max_categories:
            raise ValueError(
                f"{c}: more than max_categories={max_categories} "
                "categories (OHE on high-cardinality columns explodes "
                "the schema; use StringIndexer instead)"
            )
        for v in vals:
            name = re.sub(r"[^0-9a-zA-Z_]", "_", f"{c}_{v}")
            out = out.withColumn(
                name.upper() if uppercase else name,
                (F.col(c) == v).cast("int"),
            )
    return out


def rename_upper(df: DataFrame) -> DataFrame:
    """F6: uppercase every column name (reference does this to ALL
    columns after OHE, preprocessing.py:147-148)."""
    return df.toDF(*[c.upper() for c in df.columns])


def rename_with(df: DataFrame, prefix: str = "", suffix: str = "", strip_suffix: str = "") -> DataFrame:
    """F7: prefix/suffix renames (model-id prefixing, _OOF stripping)."""
    def _new(c: str) -> str:
        base = c[: -len(strip_suffix)] if strip_suffix and c.endswith(strip_suffix) else c
        return f"{prefix}{base}{suffix}"

    return df.toDF(*[_new(c) for c in df.columns])


def select_skew_transforms(
    df: DataFrame,
    cols: Sequence[str],
    skew_threshold: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Transform-selection plan: for each column compute skewness, min,
    and max in ONE pass and pick the transform the reference's
    normalize-distributions pass intends →
    (column, skewness, transform).

    Decision (preprocessing.py:326-387, corrected per §7.4(4)):
      all-negative → 'abs'; right skew beyond threshold → 'log1p' if
      0/negatives present else 'log'; left skew beyond threshold →
      'pow2'; else 'none'.
    """
    agg = df.agg(
        *[F.round(F.skewness(c), decimals).alias(f"skewness__{c}") for c in cols],
        *[F.min(F.col(c).cast("double")).alias(f"__min__{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max__{c}") for c in cols],
    )
    agg = agg.select(
        "*",
        *[
            F.when(F.col(f"__max__{c}") < 0, F.lit("abs"))
            .when(
                F.col(f"skewness__{c}") > skew_threshold,
                F.when(F.col(f"__min__{c}") <= 0, F.lit("log1p")).otherwise(
                    F.lit("log")
                ),
            )
            .when(F.col(f"skewness__{c}") < -skew_threshold, F.lit("pow2"))
            .otherwise(F.lit("none"))
            .alias(f"transform__{c}")
            for c in cols
        ],
    )
    return _stack_long(agg, cols, ["skewness", "transform"])
