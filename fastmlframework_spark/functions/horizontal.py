"""Horizontal (row-wise) combination functions and the mode aggregate
(SURVEY.md §2.4 A9/A11, §2.9 M15/M16).

Reference behaviors (file:line cite /root/reference/):
* A9 bagged average = row-mean across per-seed prediction columns —
  modeling/prediction.py:201-205
* M15 soft voting = np.average(oof, axis=1, weights) —
  ensembling/blending/blender.py:242-244
* M16 hard voting = per-row weighted bincount argmax —
  blender.py:242-243
* A11 mode over fold predictions with scipy tie-break (ties → smallest
  value) — modeling/prediction.py:414

The reference applies these along axis=1 of an in-memory matrix whose
rows are aligned BY POSITION.  Here the per-seed/per-model columns
already live on one keyed row (joined on the explicit key, §1.4), so
A9/M15 are pure projections — zero shuffle.  Hard voting and mode are
re-expressed as long-format grouped aggregates (stack → groupBy →
windowed argmax), which distribute over the key space instead of
applying a Python function per row.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def horizontal_mean(cols: Sequence[str]) -> Column:
    """A9: row-wise mean of the given columns (bagged-seed average)."""
    total = None
    for c in cols:
        col = F.col(c)
        total = col if total is None else total + col
    return total / F.lit(len(cols))


def soft_vote(cols: Sequence[str], weights: Sequence[float]) -> Column:
    """M15: weighted row-wise average; weights are normalized (M18:
    blender.py:187-200 asserts Σw = 1 — normalization makes it so by
    construction)."""
    if len(cols) != len(weights):
        raise ValueError("cols and weights must have the same length")
    wsum = float(sum(weights))
    expr = None
    for c, w in zip(cols, weights):
        term = F.col(c) * F.lit(w / wsum)
        expr = term if expr is None else expr + term
    return expr


def _argmax_by_count(
    long_df: DataFrame,
    key_cols: Sequence[str],
    label_col: str,
    weight_col: str,
) -> DataFrame:
    """Shared argmax: per key, the label with the highest (weighted)
    count; ties broken by SMALLEST label (scipy.stats.mode parity)."""
    counts = long_df.groupBy(*key_cols, label_col).agg(
        F.sum(weight_col).alias("__w")
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("__w"), F.asc(label_col)
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__w", "__rn")
    )


def hard_vote_long(
    df: DataFrame,
    key_cols: Sequence[str],
    label_cols: Sequence[str],
    weights: Sequence[float],
    out_col: str = "vote",
) -> DataFrame:
    """M16: weighted hard voting across per-model label columns.

    stack → per-(key,label) weight sum → windowed argmax.  The window
    partitions by the row key, so the plan scales with the key space;
    no per-row Python.
    """
    if len(label_cols) != len(weights):
        raise ValueError("label_cols and weights must have the same length")
    # No normalization: argmax is invariant under positive scaling, and
    # dividing by a float Σw would perturb exact ties (e.g. 5 vs 3+2)
    # that integer weights resolve deterministically.  M18's Σw=1
    # normalization lives in the blender, not here.
    stack_args = ", ".join(
        f"`{c}`, {float(w)!r}D" for c, w in zip(label_cols, weights)
    )
    long_df = df.select(
        *key_cols,
        F.expr(
            f"stack({len(label_cols)}, {stack_args}) as (__label, __weight)"
        ),
    )
    out = _argmax_by_count(long_df, key_cols, "__label", "__weight")
    return out.withColumnRenamed("__label", out_col)


def mode_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """A11: per-key mode with scipy tie-break (smallest value wins) —
    the label-case test aggregation across CV folds."""
    out = _argmax_by_count(
        df.select(*key_cols, value_col).withColumn("__one", F.lit(1)),
        key_cols,
        value_col,
        "__one",
    )
    return out.withColumnRenamed(value_col, out_col) if out_col else out
