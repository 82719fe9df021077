"""Categorical target encoding, leakage-safe (out-of-fold).

Naive target encoding (category → mean label) leaks the row's own
label into its feature; the OOF variant encodes each row with the
statistics of the OTHER folds only:

    enc(row in fold f, category c)
        = (S_c − s_cf + m·p) / (N_c − n_cf + m)

where S/N are the category's label sum/count, s/n the row's own
fold's contribution, p the global prior and m the smoothing weight
(categories with few rows shrink toward the prior).

Scale design: both aggregation levels are (category × fold)-sized —
tiny — and broadcast back into a single scan of the fact table; the
fold comes from the engine-portable md5 hash (`ml/folds.py`), so the
encoding is deterministic end-to-end with no RNG state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.ml.folds import fold_hash


def target_encode_oof(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    label_col: str,
    k: int = 5,
    seed: int = 27,
    prior_weight: float = 20.0,
    out_col: str = "enc",
    fold_col: str = "fold",
) -> DataFrame:
    """→ [key, fold, enc] with the smoothed out-of-fold encoding."""
    base = df.select(
        F.col(key_col),
        F.col(cat_col).alias("__cat"),
        F.col(label_col).cast("long").alias("__y"),
        (fold_hash(key_col, seed) % k).alias(fold_col),
    )
    cf = base.groupBy("__cat", fold_col).agg(
        F.sum("__y").alias("__sf"), F.count(F.lit(1)).alias("__nf")
    )
    c = cf.groupBy("__cat").agg(
        F.sum("__sf").alias("__stot"), F.sum("__nf").alias("__ntot")
    )
    g = base.agg(F.avg("__y").alias("__p"))
    enc = (
        F.col("__stot") - F.col("__sf") + prior_weight * F.col("__p")
    ) / (F.col("__ntot") - F.col("__nf") + prior_weight)
    return (
        base.join(F.broadcast(cf), on=["__cat", fold_col])
        .join(F.broadcast(c), on="__cat")
        .crossJoin(F.broadcast(g))
        .select(
            F.col(key_col),
            F.col(fold_col),
            F.round(enc, 6).alias(out_col),
        )
    )
