"""Deterministic CV fold assignment and label permutation
(SURVEY.md §2.8 C1-C3).

Reference behaviors (file:line cite /root/reference/):
* C3 KFold/StratifiedKFold(shuffle=True, seeded) drive every CV loop —
  modeling/prediction.py:329-336, ensembling/blending/blender.py:310-317
* C2 target permutation via pandas index-keeping sample —
  modeling/feature_selection.py:145-148

sklearn splitters enumerate in-memory index arrays; a Spark rebuild
needs fold membership as a COLUMN, derived deterministically from the
row key (§1.4) and a seed.  Per SURVEY.md §7.4(2) we reproduce the
*statistics* of sklearn folds (sizes ±1, stratification, determinism
per (key, seed, k)), not the exact membership.

Two strategies:

* ``method='hash'`` — fold = md5(key|seed) mod k.  Embarrassingly
  parallel, no shuffle, no sort; sizes are multinomial (±O(√n)), which
  at 100 TB is indistinguishable from exact.  This is the scale path.
* ``method='ntile'`` — ntile(k) over an order by md5(key|seed), within
  each stratum when stratified.  Exact ±1 sizes (and per-class ±1,
  like StratifiedKFold).  The unstratified variant uses ONE global
  window (single-partition sort) — acceptable for the OOF-table scale
  it exists for (sklearn parity on train tables that fit a sort);
  the stratified variant partitions the window by class and scales
  with per-class sort spill.

md5 (not xxhash64) so the assignment is reproducible in any engine —
the driver's DuckDB oracle computes the identical fold column.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def fold_hash(key_col: str | Column, seed: int) -> Column:
    """60-bit integer hash of (key, seed): first 15 hex digits of
    md5(key || '|' || seed) — portable across engines."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(seed)))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def with_fold_column(
    df: DataFrame,
    key_col: str,
    k: int,
    seed: int,
    stratify_col: str | None = None,
    method: str = "ntile",
    fold_col: str = "fold",
) -> DataFrame:
    """C3: add a deterministic ``fold`` column ∈ [0, k).

    ``stratify_col`` partitions the ntile ordering by class so each
    class splits ±1 across folds (StratifiedKFold statistics); with
    ``method='hash'`` stratification is implicit in expectation.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = fold_hash(key_col, seed)
    if method == "hash":
        return df.withColumn(fold_col, h % k)
    if method == "ntile":
        # NTILE(k) over the (per-stratum) hash order, computed with
        # distributed positions instead of a global / per-class window
        # (which pulls a whole class through one task at scale).
        # Exact NTILE semantics: the first (n mod k) tiles get
        # ceil(n/k) rows, contiguously — NOT floor((pos-1)k/n), which
        # spreads the larger tiles.  Bit-identical to ntile(k)-1
        # (tie-free total order + same piecewise tile formula).
        strata = [stratify_col] if stratify_col else []
        # counts_col: the per-stratum total rides the offsets broadcast
        # (a tiny window-sum over the ≤ n_buckets bucket rows) instead
        # of a THIRD scan of df + a second broadcast join — one join,
        # two scans, identical __pos/__n values (OPTIMIZATION r14,
        # VERDICT r13 #5 fold-table materialization).
        pos = global_positions(
            df, h, "__pos", partition_cols=strata, counts_col="__n"
        )
        n = F.col("__n")
        p0 = F.col("__pos") - 1  # 0-based position
        big = F.floor((n + k - 1) / k)  # ceil(n/k)
        small = F.greatest(F.floor(n / k), F.lit(1))
        r = n % k  # number of big tiles
        fold = F.when(
            F.col("__pos") <= r * big, F.floor(p0 / big)
        ).otherwise(r + F.floor((p0 - r * big) / small))
        return pos.withColumn(fold_col, fold.cast("int")).drop(
            "__pos", "__n"
        )
    raise ValueError(f"unknown method {method!r}; use 'hash' or 'ntile'")


def fold_split(
    df: DataFrame, fold_col: str, fold: int
) -> tuple[DataFrame, DataFrame]:
    """(train, validation) pair for one fold — the Spark form of the
    reference's index-slice (prediction.py:355-356): two filters on
    the fold column, both lazily pushed to the scan of the
    fold-annotated (cached) table."""
    return (
        df.filter(F.col(fold_col) != fold),
        df.filter(F.col(fold_col) == fold),
    )


def global_positions(
    df: DataFrame,
    order_col: Column,
    pos_col: str = "__pos",
    n_buckets: int | None = None,
    hash_bits: int = 60,
    partition_cols: "Sequence[str]" = (),
    counts_col: str | None = None,
) -> DataFrame:
    """Distributed global row_number over a UNIFORM HASH column
    (``fold_hash`` output): bucket rows by fixed arithmetic ranges of
    the hash value, rank within buckets, then add cumulative bucket
    offsets (a tiny broadcast of per-bucket counts).

    Equivalent to ``row_number().over(Window.orderBy(order_col))``
    WITHOUT the single-partition window that serializes the table
    through one task at scale.  Buckets come from the VALUE
    (``floor(hash / width)``), never from sampling or partition ids —
    ``repartitionByRange`` would re-sample per evaluation and give the
    offsets subquery different boundaries than the ranking pass.
    Uniform hashes make the fixed-width buckets balanced.

    ``counts_col``: when set, the broadcast offsets frame also carries
    the PER-STRATUM TOTAL row count under that name (a window-sum over
    the ≤ n_buckets bucket rows — tiny, exchange-free) so a caller
    that needs both positions and totals (the ntile fold assignment)
    pays one broadcast join instead of two and never scans ``df`` a
    third time for the count."""
    spark = df.sparkSession
    strata = list(partition_cols)
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism * 4
    width = (1 << hash_bits) // n_buckets + 1
    bucketed = df.withColumn("__ord", order_col).withColumn(
        "__bkt", F.floor(F.col("__ord") / F.lit(width))
    )
    local = bucketed.withColumn(
        "__ln",
        F.row_number().over(
            Window.partitionBy(*strata, "__bkt").orderBy("__ord")
        ),
    )
    offsets = (
        bucketed.groupBy(*strata, "__bkt")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__bn").over(
                    Window.partitionBy(*strata)
                    .orderBy("__bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    extra = []
    if counts_col:
        offsets = offsets.withColumn(
            counts_col, F.sum("__bn").over(Window.partitionBy(*strata))
        )
        extra = [counts_col]
    offsets = offsets.select(*strata, "__bkt", "__off", *extra)
    return (
        local.join(F.broadcast(offsets), on=strata + ["__bkt"])
        .withColumn(pos_col, F.col("__off") + F.col("__ln"))
        .drop("__bkt", "__ln", "__off", "__ord")
    )


def permute_labels(
    df: DataFrame,
    key_col: str,
    target_col: str,
    seed: int,
    out_col: str | None = None,
) -> DataFrame:
    """C2: reassign target values to rows uniformly at random
    (deterministic in (key, seed)) — the null-importance permutation.

    Two independent md5 orderings of the same key set are joined by
    row position: position i of ordering A receives the target at
    position i of ordering B.  The target multiset is exactly
    preserved.  Positions come from ``global_positions`` (range
    partition + local rank + offsets), so no single-partition window
    exists anywhere on the path — the permutation distributes at any
    scale.
    """
    out_col = out_col or target_col
    a = global_positions(
        df.select(F.col(key_col)), fold_hash(key_col, seed)
    )
    b = global_positions(
        df.select(F.col(key_col), F.col(target_col).alias("__permuted")),
        fold_hash(key_col, seed + 1),
    ).select("__permuted", "__pos")
    permuted = a.join(b, on="__pos").drop("__pos")
    base = df.drop(out_col) if out_col in df.columns else df
    return base.join(
        permuted.withColumnRenamed("__permuted", out_col), on=key_col
    )


def temporal_split(
    df: DataFrame,
    ts_col: str = "ts",
    train_frac: float = 0.7,
    embargo_frac: float = 0.05,
) -> DataFrame:
    """Embargoed temporal train/test split → ``df`` + ``split``
    column (``train`` / ``embargo`` / ``test``): rows up to
    ``train_frac`` of the observed time range train, the next
    ``embargo_frac`` is DISCARDED (the purge gap of de Prado's purged
    CV — labels computed over horizons leak across a naive boundary),
    and the remainder tests.  Beyond-reference operator: the
    reference's sklearn splitters are row-index based and cannot
    express a time embargo.

    Cutoffs derive from the global [min, max] timestamp — one 1-row
    aggregate broadcast back over the scan (no sort, no window, no
    quantile): assignment is a map-only comparison cascade at any
    scale.  Fractions apply to the TIME RANGE, not row counts, so the
    split is stable under resampling and identical across engines
    (pure float64 arithmetic on epoch seconds)."""
    if not (0 < train_frac and embargo_frac >= 0 and train_frac + embargo_frac < 1):
        raise ValueError(
            "need 0 < train_frac, embargo_frac >= 0, and "
            f"train_frac + embargo_frac < 1 (got {train_frac}/{embargo_frac})"
        )
    t = F.col(ts_col).cast("double")
    bounds = df.agg(
        F.min(t).alias("__t0"), F.max(t).alias("__t1")
    )
    span = F.col("__t1") - F.col("__t0")
    train_hi = F.col("__t0") + F.lit(train_frac) * span
    emb_hi = F.col("__t0") + F.lit(train_frac + embargo_frac) * span
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "split",
            F.when(t <= train_hi, F.lit("train"))
            .when(t <= emb_hi, F.lit("embargo"))
            .otherwise(F.lit("test")),
        )
        .drop("__t0", "__t1")
    )
