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


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
    mean_decimals: int | None = None,
) -> DataFrame:
    """Dense per-key grid with LINEAR interpolation →
    [key, bucket, filled, is_gap].

    Same grid construction as ``resample_gapfill``; empty buckets get
    the time-weighted blend of the nearest observed buckets on both
    sides (leading/trailing gaps degrade to nearest-value fill).  Two
    running windows (previous/next non-null value and bucket) over one
    key partitioning — still a single shuffle."""
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    # Rounding the in-bucket mean BEFORE interpolating pins the blend
    # arithmetic to reproducible inputs (summation order inside avg()
    # differs across engines/partitionings; the blend then amplifies
    # last-ulp noise across the rounding boundary of the final value).
    mean = F.avg(value_col)
    if mean_decimals is not None:
        mean = F.round(mean, mean_decimals)
    per_bucket = df.groupBy(
        F.col(key_col), bucket.alias("bucket")
    ).agg(mean.alias("__v"))
    spans = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(__lo, __hi, interval {step})")).alias(
            "bucket"
        ),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    joined = grid.join(per_bucket, on=[key_col, "bucket"], how="left")
    obs_bucket = F.when(F.col("__v").isNotNull(), F.col("bucket"))
    prev_v = F.last("__v", ignorenulls=True).over(wb)
    next_v = F.first("__v", ignorenulls=True).over(wf)
    prev_t = F.last(obs_bucket, ignorenulls=True).over(wb)
    next_t = F.first(obs_bucket, ignorenulls=True).over(wf)
    span = F.col("__nt").cast("double") - F.col("__pt").cast("double")
    frac = (
        F.col("bucket").cast("double") - F.col("__pt").cast("double")
    ) / span
    interp = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(F.col("__pv").isNull(), F.col("__nv"))  # leading gap
        .when(F.col("__nv").isNull(), F.col("__pv"))  # trailing gap
        .otherwise(F.col("__pv") + frac * (F.col("__nv") - F.col("__pv")))
    )
    return (
        joined.select(
            F.col(key_col),
            "bucket",
            "__v",
            prev_v.alias("__pv"),
            next_v.alias("__nv"),
            prev_t.alias("__pt"),
            next_t.alias("__nt"),
        )
        .select(
            F.col(key_col),
            "bucket",
            interp.alias("filled"),
            F.col("__v").isNull().alias("is_gap"),
        )
    )


def resample_interpolate_exact(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
    in_scale: int = 100,
    out_scale: int = 10_000,
) -> DataFrame:
    """Linear interpolation with EXACT integer arithmetic →
    [key, bucket, filled_scaled, is_gap] where ``filled_scaled`` is
    the value × ``out_scale`` as a BIGINT.

    Floating-point blends round differently across engines at exact
    .5 boundaries (which linear interpolation structurally produces:
    frac = 1/2 on odd gaps), so the cross-engine-checkable variant
    scales inputs to integers (``in_scale`` matching the data's
    decimal resolution), carries per-bucket means as exact rationals
    (sum, count), and blends with pure BIGINT multiply/divide —
    bit-identical on any engine.  Same grid/window plan shape as
    ``resample_interpolate``."""
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    vi = F.round(F.col(value_col) * in_scale).cast("long")
    per_bucket = df.groupBy(F.col(key_col), bucket.alias("bucket")).agg(
        F.sum(vi).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(__lo, __hi, interval {step})")).alias(
            "bucket"
        ),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    joined = grid.join(per_bucket, on=[key_col, "bucket"], how="left")
    obs_bucket = F.when(F.col("__s").isNotNull(), F.col("bucket"))
    staged = joined.select(
        F.col(key_col),
        "bucket",
        "__s",
        "__n",
        F.last("__s", ignorenulls=True).over(wb).alias("__ps"),
        F.last("__n", ignorenulls=True).over(wb).alias("__pn"),
        F.first("__s", ignorenulls=True).over(wf).alias("__ns"),
        F.first("__n", ignorenulls=True).over(wf).alias("__nn"),
        F.last(obs_bucket, ignorenulls=True).over(wb).cast("long").alias("__pt"),
        F.first(obs_bucket, ignorenulls=True).over(wf).cast("long").alias("__nt"),
    )
    mult = out_scale // in_scale
    b = F.col("bucket").cast("long")
    with_terms = staged.select(
        F.col(key_col),
        "bucket",
        "__s",
        "__n",
        (
            (
                (F.col("__nt") - b) * F.col("__ps") * F.col("__nn")
                + (b - F.col("__pt")) * F.col("__ns") * F.col("__pn")
            )
            * mult
        ).alias("__num"),
        (
            F.col("__pn")
            * F.col("__nn")
            * (F.col("__nt") - F.col("__pt"))
        ).alias("__den"),
    )
    # `div` is BIGINT division — no double ever enters the blend.
    return with_terms.select(
        F.col(key_col),
        "bucket",
        F.expr(
            f"CASE WHEN __s IS NOT NULL THEN (__s * {mult}) div __n "
            "ELSE __num div __den END"
        ).alias("filled_scaled"),
        F.col("__s").isNull().alias("is_gap"),
    )


def seasonal_baseline(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal (hour-of-day conditioned) anomaly baseline →
    [key, hour, n_events, mean_value, std_value, n_anomalies]:
    per-(key, hour) sample mean/std form the seasonal-naive expected
    band; events beyond ``z_threshold`` sample standard deviations
    count as anomalies.  The seasonality-aware complement of the
    global per-key z-score screen (``events_value_outliers``) — a
    diurnal metric flags correctly against its own hour's baseline
    instead of the 24h blend.

    Two passes over events, both key×24-bounded aggregates (map-side
    combined); the stats frame broadcasts back for the anomaly count.
    NULL values are excluded from both the baseline and the count;
    ``std`` is the sample deviation (``stddev_samp`` ≡ DuckDB
    ``stddev``), and single-event cells (std NULL/0) report zero
    anomalies rather than dividing by zero."""
    base = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col),
        F.hour(ts_col).alias("hour"),
        F.col(val_col).alias("__v"),
    )
    stats = base.groupBy(key_col, "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("__v").alias("__mean"),
        F.stddev_samp("__v").alias("__std"),
    )
    flagged = base.join(F.broadcast(stats), on=[key_col, "hour"]).withColumn(
        "__anom",
        F.when(
            F.col("__std").isNull() | (F.col("__std") == 0), F.lit(0)
        ).otherwise(
            (
                F.abs(F.col("__v") - F.col("__mean"))
                > z_threshold * F.col("__std")
            ).cast("int")
        ),
    )
    return flagged.groupBy(key_col, "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("__v"), 6).alias("mean_value"),
        F.round(F.coalesce(F.stddev_samp("__v"), F.lit(0.0)), 6).alias(
            "std_value"
        ),
        F.sum("__anom").cast("long").alias("n_anomalies"),
    )


def ewma(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
    window: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Bounded-lag exponentially weighted moving average per key →
    input columns + ``ewma`` — the adjust=True EWM form over the last
    ``window`` observations:

        ewma_t = Σ_{i<n} (1−α)^i · x_{t−i}  /  Σ_{i<n} (1−α)^i

    Truncating at ``window`` lags bounds both state and numerics: the
    untruncated recursion needs (1−α)^t factors that underflow, and
    at (1−α)=0.7, 20 lags already carry 99.9% of the weight mass.

    Plan: one per-key ordered window collecting the last ``window``
    values (collect_list over a bounded rows frame — the frame bound
    is what keeps per-row state O(window) at any history length),
    then a pure HOF fold, left-to-right in both engines so the DuckDB
    twin is bit-faithful.  NULL values drop out of the collected
    frame, compressing the weight sequence onto observed points —
    ``pandas ewm(ignore_na=True)`` semantics."""
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(F.col(val_col).cast("double")).over(w)
    # collect_list drops NULLs; to weight by POSITION we need the
    # frame's values with their offsets — collect over a struct of
    # (row offset surrogate = ts, value) would shuffle more; instead
    # note: dropped NULLs only compress the tail, which is exactly
    # pandas ignore_na=True semantics.  Document that choice.
    q = 1.0 - alpha
    num = (
        "aggregate(zip_with(__a, sequence(size(__a), 1),"
        f" (x, k) -> x * pow({q!r}D, k - 1)), 0.0D, (s, v) -> s + v)"
    )
    den = (
        f"aggregate(sequence(1, size(__a)), 0.0D,"
        f" (s, k) -> s + pow({q!r}D, k - 1))"
    )
    return (
        df.withColumn("__a", arr)
        .withColumn(
            "ewma",
            F.round(
                F.expr(f"CASE WHEN size(__a) > 0 THEN {num} / {den} END"), 6
            ),
        )
        .drop("__a")
    )


def cusum(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """One-sided CUSUM change detection per key → [id, key, cusum,
    alarm]: S_t = max(0, S_{t-1} + x_t − k), alarm when S_t > h (Page
    1954) — the classic drift detector complementing the seasonal
    baseline (level shifts vs hour-conditioned outliers) and ``ewma``
    (smoothing vs detection).

    The recursion is genuinely sequential per key — no window/HOF
    form exists — so this is the module's one ``applyInPandas``
    operator: keys distribute across the cluster, each group runs an
    O(n) float64 loop in Arrow batches (the "custom stateful
    operator" slot; the streaming twin would be
    ``applyInPandasWithState``).  Left-associated ``(s + x) − k``
    matches the recursive-CTE oracle bit-for-bit.  NULL values are
    dropped up front (no evidence, no state change).  Deterministic
    (ts, id) ordering."""
    import pandas as pd

    schema = (
        f"{id_col} long, {key_col} string, cusum double, alarm boolean"
    )

    def _one_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        s = 0.0
        out = []
        for x in pdf[val_col].astype(float):
            s = s + x - k
            if s < 0.0:
                s = 0.0
            out.append(s)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                key_col: pdf[key_col].values,
                "cusum": out,
                "alarm": [v > h for v in out],
            }
        )

    return (
        df.filter(F.col(val_col).isNotNull())
        .select(id_col, key_col, ts_col, val_col)
        .groupBy(key_col)
        .applyInPandas(_one_key, schema)
        .withColumn("cusum", F.round("cusum", 6))
    )


def cusum_scan(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """The 100×-scale form of ``cusum``: Page's recursion has the
    closed prefix form

        S_t = cum_t − min(0, min_{j≤t} cum_j),   cum_t = Σ_{i≤t}(x_i−k)

    (max(0, s+d) telescopes into "prefix sum minus its running
    minimum"), so the whole detector is two running windows — pure
    JVM whole-stage-codegen, no Python loop, same per-key partitioning
    as any cumulative window.  Numerically it reassociates the
    arithmetic, so values can differ from ``cusum`` in the last ulp
    (equality pinned to 1e-9 in tests).  This is the registered and
    benched form (``events_cusum_scan``, full recursive-CTE oracle in
    the same left-associated prefix arithmetic, plan pinned
    Window-only); the applyInPandas ``cusum`` stays as the
    loop-form cross-check."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = F.col(val_col) - F.lit(float(k))
    return (
        df.filter(F.col(val_col).isNotNull())
        .select(id_col, key_col, ts_col, val_col)
        .withColumn("__cum", F.sum(d).over(w))
        .withColumn("__rmin", F.min("__cum").over(w))
        .select(
            id_col,
            key_col,
            F.round(
                F.col("__cum") - F.least(F.col("__rmin"), F.lit(0.0)), 6
            ).alias("cusum"),
            (
                F.col("__cum") - F.least(F.col("__rmin"), F.lit(0.0))
                > F.lit(float(h))
            ).alias("alarm"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    streams → [from_state, to_state, n_transitions, p_transition]:
    for every consecutive pair of events within a key (ordered by
    time, deterministic tie-break on the id), count the
    state→next-state transition and normalize rows to conditional
    probabilities.  The journey-analysis primitive behind funnel
    discovery, session modeling, and next-event prediction baselines
    (the reference's pandas users would reach for a groupby-shift
    crosstab; cf. reference data_processing/preprocessing.py's
    grouped derived-feature shapes).

    Scale: one shuffle on ``key_col`` for the LEAD window (the same
    partitioning every per-key stream op here reuses), then the
    corpus collapses to a |states|² grouped aggregate — the row
    normalization windows over that TINY matrix, never the corpus."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    trans = df.select(
        F.col(state_col).alias("from_state"),
        F.lead(state_col).over(w).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    counts = trans.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_tot), 6
        ).alias("p_transition"),
    ).orderBy("from_state", "to_state")


def holt_smoothing(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.4,
    beta: float = 0.3,
    window: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing per key →
    input columns + ``level``/``trend``/``forecast`` — the coupled
    recursion

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized at l₁ = x₁, b₁ = 0 over the last ``window``
    observations (the bounded-lag discipline of :func:`ewma`: the
    weight mass beyond ~10 lags is negligible at these α/β and the
    per-row state stays O(window) at any history length).
    ``forecast`` is the one-step-ahead l_t + b_t — the anomaly
    baseline a trending metric needs where a flat EWMA lags every
    ramp.

    Plan: one per-key bounded rows frame collecting the trailing
    values, then a pure HOF ``aggregate`` whose ACCUMULATOR is a
    2-element [level, trend] ARRAY — the whole recursion runs inside
    whole-stage codegen, and the DuckDB twin folds the identical
    array arithmetic left-to-right (both engines seed the fold with
    the window's first value), so the oracle is bit-faithful.  An
    array, not a struct: DuckDB 1.0's list_reduce evaluates a struct
    result's later fields against the accumulator's ALREADY-UPDATED
    earlier fields (measured: ``b': x - acc.l`` reads the new level),
    so a struct accumulator cannot express a coupled recursion
    portably; array element expressions all see the old accumulator
    in both engines."""
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    a_s, b_s = repr(float(alpha)), repr(float(beta))
    oma, omb = repr(1.0 - float(alpha)), repr(1.0 - float(beta))
    lp = (
        f"{a_s}D * __x + {oma}D "
        "* (element_at(__acc, 1) + element_at(__acc, 2))"
    )
    fold = (
        "aggregate(slice(__a, 2, size(__a) - 1), "
        "array(CAST(element_at(__a, 1) AS DOUBLE), CAST(0.0 AS DOUBLE)), "
        f"(__acc, __x) -> array({lp}, "
        f"{b_s}D * (({lp}) - element_at(__acc, 1)) "
        f"+ {omb}D * element_at(__acc, 2)))"
    )
    lvl = F.expr("element_at(__st, 1)")
    trd = F.expr("element_at(__st, 2)")
    return (
        df.withColumn(
            "__a", F.collect_list(F.col(val_col).cast("double")).over(w)
        )
        .withColumn("__st", F.expr(fold))
        .select(
            *df.columns,
            F.round(lvl, 6).alias("level"),
            F.round(trd, 6).alias("trend"),
            F.round(lvl + trd, 6).alias("forecast"),
        )
    )
