"""Oracle-checked queries for imputation, screening, and transform
selection (§2.2/§2.3/§2.4/§2.7)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.operators import imputation, screening, transforms
from fastmlframework_spark.queries.profiling import _EVENTS_NULLS, _events_with_nulls
from fastmlframework_spark.queries.registry import query


@query(
    "impute_group_mean",
    oracle=f"""
WITH base AS ({_EVENTS_NULLS}),
g  AS (SELECT user_id, AVG(value) AS ga FROM base WHERE value IS NOT NULL GROUP BY user_id),
gl AS (SELECT AVG(value) AS global_mean FROM base WHERE value IS NOT NULL)
SELECT event_id, ROUND(COALESCE(value, ga, global_mean), 4) AS value_imputed
FROM base LEFT JOIN g USING (user_id), gl
""",
)
def impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the reference's groupby-then-row-loop imputation
    (preprocessing.py:90-112) as a hash join + coalesce."""
    base = _events_with_nulls(spark, sf_dir)
    out = imputation.impute_by_group(base, "value", ["user_id"], agg="mean")
    return out.select(
        "event_id", F.round("value_imputed", 4).alias("value_imputed")
    )


@query(
    "impute_global_mean",
    oracle=f"""
WITH base AS ({_EVENTS_NULLS}),
gl AS (SELECT AVG(value) AS global_mean FROM base WHERE value IS NOT NULL)
SELECT event_id, ROUND(COALESCE(value, global_mean), 4) AS value_imputed
FROM base, gl
""",
)
def impute_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: global-mean imputation via one broadcast 1-row aggregate."""
    base = _events_with_nulls(spark, sf_dir)
    out = imputation.impute_global(base, ["value"], agg="mean")
    return out.select(
        "event_id", F.round("value_imputed", 4).alias("value_imputed")
    )


# Derived feature frame over orders: two genuinely binary columns, two not.
_ORDERS_FEATS = """
SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END               AS is_f,
       CASE WHEN EXTRACT(year FROM o_orderdate) = 2000 THEN 1 ELSE 0 END AS year_2000,
       LENGTH(o_orderpriority)                                        AS priority_len,
       CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT)                 AS total_bucket
FROM orders
"""


def _orders_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
        F.when(F.year("o_orderdate") == 2000, 1).otherwise(0).alias("year_2000"),
        F.length("o_orderpriority").alias("priority_len"),
        F.floor(F.col("o_totalprice") / 100000.0).cast("long").alias("total_bucket"),
    )


_FEAT_COLS = ["is_f", "year_2000", "priority_len", "total_bucket"]


def _binary_oracle() -> str:
    parts = [
        f"SELECT '{c}' AS \"column\","
        f" (COUNT(*) FILTER ({c} IS NOT NULL AND {c} NOT IN (0, 1)) = 0"
        f"  AND COUNT({c}) > 0) AS is_binary"
        f" FROM ({_ORDERS_FEATS}) t"
        for c in _FEAT_COLS
    ]
    return " UNION ALL ".join(parts)


@query("screen_binary", oracle=_binary_oracle())
def screen_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: binary-domain detection across candidate columns, one pass."""
    return screening.binary_columns(_orders_feats(spark, sf_dir), _FEAT_COLS)


def _variance_oracle() -> str:
    thresh = 0.95 * 0.05
    parts = [
        f"SELECT '{c}' AS \"column\","
        f" ROUND(VAR_POP(CAST({c} AS DOUBLE)), 6) AS variance,"
        f" (VAR_POP(CAST({c} AS DOUBLE)) < {thresh!r}) AS is_near_zero"
        f" FROM ({_ORDERS_FEATS}) t"
        for c in ["is_f", "year_2000"]
    ]
    return " UNION ALL ".join(parts)


@query("screen_variance", oracle=_variance_oracle())
def screen_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: sklearn-VarianceThreshold(p(1-p)) screen on binary columns."""
    return screening.near_zero_variance(
        _orders_feats(spark, sf_dir), ["is_f", "year_2000"], p=0.95
    )


def _intconv_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    parts = [
        f"SELECT '{c}' AS \"column\","
        f" (COUNT(*) FILTER ({c} IS NOT NULL AND {c} <> FLOOR({c})) = 0)"
        f" AS is_int_convertible FROM lineitem"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@query("screen_int_convertible", oracle=_intconv_oracle())
def screen_int_convertible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: exact integer-convertibility over the full columns (the
    reference samples 100 rows; exact costs the same single scan)."""
    return screening.int_convertible(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


@query(
    "screen_category_drift",
    oracle="""
WITH a AS (
  SELECT o_orderpriority AS category,
         ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0), 4) AS pct_a
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
),
b AS (
  SELECT o_orderpriority AS category,
         ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1), 4) AS pct_b
  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
)
SELECT category,
       COALESCE(pct_a, 0.0) AS pct_a,
       COALESCE(pct_b, 0.0) AS pct_b,
       (ABS(COALESCE(pct_a, 0.0) - COALESCE(pct_b, 0.0))
          <= 0.0 + 0.05 * ABS(COALESCE(pct_b, 0.0))) AS is_close
FROM a FULL JOIN b USING (category)
""",
)
def screen_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+A5: train-vs-test category-share drift with np.isclose
    semantics, on an even/odd orderkey split."""
    o = load_table(spark, sf_dir, "orders")
    return screening.category_drift(
        o.filter(F.col("o_orderkey") % 2 == 0),
        o.filter(F.col("o_orderkey") % 2 == 1),
        "o_orderpriority",
        rtol=0.05,
    )


# Five columns engineered to land in each transform branch.
_SKEW_BASE = """
SELECT value,
       value - 1      AS shifted,
       -value         AS neg_value,
       500.0 - value  AS mirrored,
       CAST(user_id AS DOUBLE) AS uid
FROM events
"""

_SKEW_COLS = ["value", "shifted", "neg_value", "mirrored", "uid"]


def _transform_oracle() -> str:
    parts = []
    for c in _SKEW_COLS:
        parts.append(
            f"""SELECT '{c}' AS "column",
  ROUND(AVG(POWER({c} - mu, 3)) / POWER(AVG(POWER({c} - mu, 2)), 1.5), 6) AS skewness,
  CASE
    WHEN MAX({c}) < 0 THEN 'abs'
    WHEN ROUND(AVG(POWER({c} - mu, 3)) / POWER(AVG(POWER({c} - mu, 2)), 1.5), 6) > 0.5
      THEN CASE WHEN MIN({c}) <= 0 THEN 'log1p' ELSE 'log' END
    WHEN ROUND(AVG(POWER({c} - mu, 3)) / POWER(AVG(POWER({c} - mu, 2)), 1.5), 6) < -0.5
      THEN 'pow2'
    ELSE 'none'
  END AS transform
FROM ({_SKEW_BASE}) t, (SELECT AVG({c}) AS mu FROM ({_SKEW_BASE}) s) m"""
        )
    return " UNION ALL ".join(parts)


@query("transform_select", oracle=_transform_oracle())
def transform_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4 selection: per-column skewness drives the corrected
    normalize-distributions decision (abs / log / log1p / pow2 / none)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("value"),
        (F.col("value") - 1).alias("shifted"),
        (-F.col("value")).alias("neg_value"),
        (F.lit(500.0) - F.col("value")).alias("mirrored"),
        F.col("user_id").cast("double").alias("uid"),
    )
    return transforms.select_skew_transforms(base, _SKEW_COLS, skew_threshold=0.5)


# TPC-H market segments are a fixed 5-value domain (dbgen), so the
# oracle can enumerate the indicator columns statically.
_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "ohe_mktsegment",
    oracle="SELECT c_custkey, "
    + ", ".join(
        f"CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END"
        f" AS C_MKTSEGMENT_{s}"
        for s in _SEGMENTS
    )
    + " FROM customer",
)
def ohe_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHE (pd.get_dummies shape, preprocessing.py:136-150): indicator
    columns per category; the category domain is collected once
    (5 values) and the encoding is a pure projection — no shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return transforms.one_hot_columns(cust, ["c_mktsegment"]).drop(
        "c_mktsegment"
    )


@query(
    "percentile_quantity",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag
""",
)
def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: EXACT linear-interpolated percentiles per group
    (np.percentile semantics, feature_selection.py:221) — Spark
    ``percentile``, not ``percentile_approx``, for oracle parity."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
    )


@query(
    "sample_deterministic",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 1) = 'a'
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: seeded row sampling (preprocessing.py:170-171) made
    cross-engine reproducible: hash-mod on the row key (~1/16 rate)
    instead of an engine-private RNG stream.  Same shape Spark uses
    for df.sample, but deterministic under any partitioning — the
    property that matters for repeatable pipelines at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return li.filter(F.substring(F.md5(key), 1, 1) == "a").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "drift_psi",
    oracle="""
WITH ex AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
ac AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 1),
rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ex),
pb AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
         COUNT(*) * 1.0 / (SELECT COUNT(*) FROM ex) AS p
  FROM ex, rng GROUP BY 1
),
qb AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
         COUNT(*) * 1.0 / (SELECT COUNT(*) FROM ac) AS q
  FROM ac, rng GROUP BY 1
)
SELECT 'o_totalprice' AS "column",
       ROUND(SUM((COALESCE(p, 0) + 0.0001 - COALESCE(q, 0) - 0.0001)
                 * LN((COALESCE(p, 0) + 0.0001) / (COALESCE(q, 0) + 0.0001))), 6) AS psi,
       10 AS n_bins
FROM pb FULL JOIN qb USING (bin)
""",
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of orders — the
    numeric drift screen (beyond-reference; category drift is F9)."""
    o = load_table(spark, sf_dir, "orders")
    return screening.psi(
        o.filter(F.col("o_orderkey") % 2 == 0).select("o_totalprice"),
        o.filter(F.col("o_orderkey") % 2 == 1).select("o_totalprice"),
        "o_totalprice",
        n_bins=10,
    )


@query(
    "segment_price_regression",
    oracle="""
SELECT c_mktsegment,
       ROUND(regr_slope(o_totalprice, c_acctbal), 6) AS slope,
       ROUND(regr_intercept(o_totalprice, c_acctbal), 6) AS intercept,
       ROUND(regr_r2(o_totalprice, c_acctbal), 6) AS r2,
       regr_count(o_totalprice, c_acctbal) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def segment_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment closed-form OLS (order total on account balance)
    via the native regr_* aggregates — the "many small models" pattern
    without any model library: one grouped aggregate, map-side
    combinable, no applyInPandas.  Demonstrates that grouped linear
    fits belong in the aggregate layer at 100 TB (sums of x, y, xy,
    x² per group), not in a Python UDF."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.regr_slope("o_totalprice", "c_acctbal"), 6).alias("slope"),
            F.round(
                F.regr_intercept("o_totalprice", "c_acctbal"), 6
            ).alias("intercept"),
            F.round(F.regr_r2("o_totalprice", "c_acctbal"), 6).alias("r2"),
            F.regr_count("o_totalprice", "c_acctbal").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


# DuckDB twin of ml/folds.fold_hash(o_orderkey, 27)
_ENC_HASH = (
    "CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)"
    " || '|' || '27'), 1, 15)) AS BIGINT)"
)


@query(
    "target_encode_oof_priority",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey,
         o_orderpriority AS cat,
         CAST(o_orderstatus = 'F' AS INT) AS y,
         {_ENC_HASH} % 5 AS fold
  FROM orders
),
cf AS (
  SELECT cat, fold, SUM(y) AS s, COUNT(*) AS n
  FROM base GROUP BY cat, fold
),
c AS (SELECT cat, SUM(s) AS st, SUM(n) AS nt FROM cf GROUP BY cat),
g AS (SELECT AVG(y) AS p FROM base)
SELECT b.o_orderkey, b.fold,
       ROUND((st - s + 20.0 * p) / (nt - n + 20.0), 6) AS enc
FROM base b
JOIN cf USING (cat, fold)
JOIN c USING (cat), g
ORDER BY b.o_orderkey
""",
)
def target_encode_oof_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding of order priority against the
    finished-order label: each row is encoded with the OTHER folds'
    category statistics plus prior smoothing (m=20) — the standard
    trick for high-cardinality categoricals that naive mean-encoding
    leaks on.  Aggregates are (category × fold)-sized broadcasts over
    one fact scan (`operators/encoding.py`)."""
    from fastmlframework_spark.operators.encoding import target_encode_oof

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    base = o.withColumn(
        "__label", (F.col("o_orderstatus") == "F").cast("int")
    )
    return target_encode_oof(
        base,
        key_col="o_orderkey",
        cat_col="o_orderpriority",
        label_col="__label",
        k=5,
        seed=27,
        prior_weight=20.0,
    )


@query(
    "scale_standardize_acctbal",
    oracle="""
WITH s AS (
  SELECT c_mktsegment AS g, AVG(c_acctbal) AS mu,
         STDDEV_SAMP(c_acctbal) AS sd
  FROM customer GROUP BY 1
)
SELECT c_custkey, c_mktsegment,
       ROUND(CASE WHEN sd > 0 THEN (c_acctbal - mu) / sd END, 6)
         AS acctbal_z
FROM customer JOIN s ON c_mktsegment = s.g
""",
)
def scale_standardize_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score scaling — grouped stats broadcast back over
    one scan (`operators/scaling.py:standardize`); no data shuffle."""
    from fastmlframework_spark.operators.scaling import standardize

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return standardize(
        cust, ["c_acctbal"], group_cols=["c_mktsegment"]
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal_z", 6).alias("acctbal_z"),
    )


@query(
    "scale_minmax_retailprice",
    oracle="""
WITH s AS (
  SELECT MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi FROM part
)
SELECT p_partkey,
       ROUND(CASE WHEN hi > lo THEN (p_retailprice - lo) / (hi - lo) END, 6)
         AS retailprice_mm
FROM part, s
""",
)
def scale_minmax_retailprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling to [0, 1] — exact cross-engine parity (min/max
    and the division are bit-identical operands)."""
    from fastmlframework_spark.operators.scaling import minmax_scale

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    return minmax_scale(part, ["p_retailprice"]).select(
        "p_partkey",
        F.round("p_retailprice_mm", 6).alias("retailprice_mm"),
    )


@query(
    "bin_totalprice_deciles",
    oracle="""
WITH e AS (
  SELECT quantile_cont(o_totalprice,
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
  FROM orders
),
b AS (
  SELECT o_totalprice AS v,
         CAST(len(list_filter(edges, x -> v > x)) AS INT) AS bin
  FROM orders, e
)
SELECT bin, COUNT(*) AS n,
       ROUND(MIN(v), 2) AS mn, ROUND(MAX(v), 2) AS mx
FROM b GROUP BY bin
""",
)
def bin_totalprice_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order totals — edge-based
    (`operators/scaling.py:quantile_bin`: exact percentile edges
    broadcast + comparison cascade), never an ntile global sort; the
    per-bin count/min/max validates the full assignment compactly."""
    from fastmlframework_spark.operators.scaling import quantile_bin

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    binned = quantile_bin(orders, "o_totalprice", 10, out_col="bin")
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("mn"),
        F.round(F.max("o_totalprice"), 2).alias("mx"),
    )


@query(
    "clip_winsorize_acctbal",
    oracle="""
WITH b AS (
  SELECT quantile_cont(c_acctbal, 0.05) AS lo,
         quantile_cont(c_acctbal, 0.95) AS hi
  FROM customer
),
c AS (
  SELECT LEAST(GREATEST(c_acctbal, lo), hi) AS v,
         c_acctbal < lo AS is_lo, c_acctbal > hi AS is_hi
  FROM customer, b
)
SELECT COUNT(*) AS n,
       COUNT(*) FILTER (WHERE is_lo) AS n_clipped_lo,
       COUNT(*) FILTER (WHERE is_hi) AS n_clipped_hi,
       ROUND(MIN(v), 2) AS mn, ROUND(MAX(v), 2) AS mx,
       ROUND(AVG(v), 4) AS mean_clipped
FROM c
""",
)
def clip_winsorize_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize account balances at the exact p05/p95 quantiles
    (`operators/scaling.py:clip_quantiles`) — the clip report (clip
    counts + clamped min/max/mean) validates the full assignment."""
    from fastmlframework_spark.operators.scaling import clip_quantiles

    cust = load_table(spark, sf_dir, "customer").select("c_acctbal")
    clipped = clip_quantiles(cust, "c_acctbal", 0.05, 0.95, out_col="v")
    return clipped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("c_acctbal") < F.col("v")).cast("long")).alias(
            "n_clipped_lo"
        ),
        F.sum((F.col("c_acctbal") > F.col("v")).cast("long")).alias(
            "n_clipped_hi"
        ),
        F.round(F.min("v"), 2).alias("mn"),
        F.round(F.max("v"), 2).alias("mx"),
        F.round(F.avg("v"), 4).alias("mean_clipped"),
    )


@query(
    "scale_rank_acctbal",
    oracle="""
SELECT c_custkey, c_acctbal,
       ROUND((RANK() OVER (ORDER BY c_acctbal)
              + (COUNT(*) OVER (PARTITION BY c_acctbal) - 1) / 2.0)
             / COUNT(*) OVER (), 6) AS pct_rank
FROM customer
""",
)
def scale_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-rank scaling of customer balances (pandas
    rank(pct=True, method='average')) — the distributed value-
    bucketed prefix sum of ``operators/scaling.py:rank_transform``,
    never an unpartitioned percent_rank window (the oracle's window
    form is the semantics; the Spark plan is the scale-safe one —
    average rank = strictly-below + (ties+1)/2, both sides exact
    integer-count arithmetic)."""
    from fastmlframework_spark.operators.scaling import rank_transform

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    return rank_transform(cust, "c_acctbal").select(
        "c_custkey", "c_acctbal", "pct_rank"
    )
