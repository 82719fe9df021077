"""Driver-hash evidence for the bagged-tree-ensemble surface
(SURVEY.md §2.9 M4 ExtraTrees leg, §2.8 C4) — round 13.

`cv_oof_forest_bagged` runs the real `CVPredictor` loop with
`ForestClosedFormWrapper`: per fold, three depth-2 CARTs each fit on
a deterministic md5-hash row subsample over a rotating feature
subset, predictions averaged.  The oracle replays every member's
complete greedy fit (the same histogram/window/argmax SQL shape as
`cv_oof_tree_depth2`'s proven monolith, generated per member) plus
the bagged mean — the RF surrogate's bagging mechanics under the
exact-integer discipline.  Reference: modeling/model_wrappers.py:
242-323 (ExtraTrees leg), modeling/prediction.py:288-416 (CV loop),
:325-327 (per-iteration bagging mechanics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.queries.analytics import ml_train_table
from fastmlframework_spark.queries.mlflow import _key_hash_sql
from fastmlframework_spark.queries.registry import query

# the integer-ordinal feature triple of cv_oof_tree_depth2
_TREE_FEATS = ["order_year", "prio", "cent_digit"]
_TREE_FEATS_SQL = {
    "order_year": "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
    "prio": "CAST(substring(o_orderpriority, 1, 1) AS BIGINT)",
    "cent_digit": "CAST(ROUND(ROUND(o_totalprice, 2) * 100, 0) AS BIGINT) % 10",
}
_N_TREES = 3
_BAG_SEED = 1000
_ROW_MOD = 2

# the exact split criterion of ml.wrappers._cart_split_score — two
# exact int->double conversions + two divisions + one add
_SPLIT_SCORE = (
    "CAST(posl * posl + (nl - posl) * (nl - posl) AS DOUBLE) / nl"
    " + CAST((post - posl) * (post - posl)"
    " + ((nt - nl) - (post - posl)) * ((nt - nl) - (post - posl))"
    " AS DOUBLE) / (nt - nl)"
)


def _member_cols(b: int) -> list[str]:
    """Member b's rotating feature subset — MUST mirror
    `ForestClosedFormWrapper.member_features` (drop index b mod d)."""
    drop = b % len(_TREE_FEATS)
    return [c for i, c in enumerate(_TREE_FEATS) if i != drop]


def _cart_member_ctes(b: int) -> str:
    """One bagged member's depth-2 greedy CART as suffixed CTEs: row
    subsample, both split levels (histogram → cumulative counts →
    scored candidates → total-tie-break argmax), leaf counts, and
    validation routing ending in ``p{b}(key, p)``."""
    cols = _member_cols(b)
    B = f"t{b}"
    fsel = (
        f"CASE b.feat WHEN 1 THEN {{r}}.{cols[0]} ELSE {{r}}.{cols[1]} END"
    )
    bag = f"{_key_hash_sql(_BAG_SEED + b)} % {_ROW_MOD} = 0"
    return f"""
tr{B} AS (
  SELECT * FROM tr WHERE {bag}
),
u0{B} AS (
  SELECT fold, 1 AS feat, {cols[0]} AS val, target FROM tr{B}
  UNION ALL SELECT fold, 2, {cols[1]}, target FROM tr{B}
),
h0{B} AS (
  SELECT fold, feat, val, COUNT(*) AS n, SUM(target) AS pos
  FROM u0{B} GROUP BY fold, feat, val
),
c0{B} AS (
  SELECT fold, feat, val AS thr,
    SUM(n) OVER w AS nl, SUM(pos) OVER w AS posl,
    SUM(n) OVER (PARTITION BY fold, feat) AS nt,
    SUM(pos) OVER (PARTITION BY fold, feat) AS post,
    MAX(val) OVER (PARTITION BY fold, feat) AS vmax
  FROM h0{B}
  WINDOW w AS (PARTITION BY fold, feat ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s0{B} AS (
  SELECT fold, feat, thr, {_SPLIT_SCORE} AS score
  FROM c0{B} WHERE thr < vmax AND nl > 0 AND nt - nl > 0
),
b0{B} AS (
  SELECT fold, feat, thr FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY fold ORDER BY score DESC, feat, thr) AS rn
    FROM s0{B}) WHERE rn = 1
),
a1{B} AS (
  SELECT tr.*, CASE WHEN ({fsel.format(r='tr')}) <= b.thr
                    THEN 0 ELSE 1 END AS node
  FROM tr{B} tr JOIN b0{B} b USING (fold)
),
u1{B} AS (
  SELECT fold, node, 1 AS feat, {cols[0]} AS val, target FROM a1{B}
  UNION ALL SELECT fold, node, 2, {cols[1]}, target FROM a1{B}
),
h1{B} AS (
  SELECT fold, node, feat, val, COUNT(*) AS n, SUM(target) AS pos
  FROM u1{B} GROUP BY fold, node, feat, val
),
c1{B} AS (
  SELECT fold, node, feat, val AS thr,
    SUM(n) OVER w AS nl, SUM(pos) OVER w AS posl,
    SUM(n) OVER (PARTITION BY fold, node, feat) AS nt,
    SUM(pos) OVER (PARTITION BY fold, node, feat) AS post,
    MAX(val) OVER (PARTITION BY fold, node, feat) AS vmax
  FROM h1{B}
  WINDOW w AS (PARTITION BY fold, node, feat ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s1{B} AS (
  SELECT fold, node, feat, thr, {_SPLIT_SCORE} AS score
  FROM c1{B} WHERE thr < vmax AND nl > 0 AND nt - nl > 0
),
b1{B} AS (
  SELECT fold, node, feat, thr FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY fold, node ORDER BY score DESC, feat, thr) AS rn
    FROM s1{B}) WHERE rn = 1
),
a2{B} AS (
  SELECT a1.fold, a1.node,
    CASE WHEN b.fold IS NULL THEN -1
         WHEN ({fsel.format(r='a1')}) <= b.thr THEN 0
         ELSE 1 END AS sub,
    a1.target
  FROM a1{B} a1 LEFT JOIN b1{B} b
    ON a1.fold = b.fold AND a1.node = b.node
),
leaf{B} AS (
  SELECT fold, node, sub, COUNT(*) AS n, SUM(target) AS pos
  FROM a2{B} GROUP BY fold, node, sub
),
v1{B} AS (
  SELECT f.*, CASE WHEN ({fsel.format(r='f')}) <= b.thr
                   THEN 0 ELSE 1 END AS node
  FROM f JOIN b0{B} b ON f.fold = b.fold
),
v2{B} AS (
  SELECT v1.key, v1.target, v1.fold, v1.node,
    CASE WHEN b.fold IS NULL THEN -1
         WHEN ({fsel.format(r='v1')}) <= b.thr THEN 0
         ELSE 1 END AS sub
  FROM v1{B} v1 LEFT JOIN b1{B} b
    ON v1.fold = b.fold AND v1.node = b.node
),
p{b} AS (
  SELECT v2.key, v2.target, CAST(l.pos AS DOUBLE) / l.n AS p
  FROM v2{B} v2 JOIN leaf{B} l
    ON v2.fold = l.fold AND v2.node = l.node AND v2.sub = l.sub
)"""


def _forest_oracle() -> str:
    members = ",\n".join(
        _cart_member_ctes(b).strip() for b in range(_N_TREES)
    )
    mean = "p0.p"
    for b in range(1, _N_TREES):
        mean = f"({mean} + p{b}.p)"
    joins = "".join(
        f" JOIN p{b} ON p0.key = p{b}.key" for b in range(1, _N_TREES)
    )
    return f"""
WITH t AS (
SELECT
  o_orderkey AS key,
  {_TREE_FEATS_SQL['order_year']} AS order_year,
  {_TREE_FEATS_SQL['prio']} AS prio,
  {_TREE_FEATS_SQL['cent_digit']} AS cent_digit,
  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
FROM orders JOIN customer ON o_custkey = c_custkey
),
f AS (
  SELECT *, NTILE(3) OVER (ORDER BY {_key_hash_sql(27)}) - 1 AS fold FROM t
),
tr AS (
  SELECT tf.tf AS fold, f.key, f.order_year, f.prio, f.cent_digit, f.target
  FROM f JOIN (VALUES (0), (1), (2)) tf(tf) ON f.fold <> tf.tf
),
{members}
SELECT p0.key,
  ROUND({mean} / {float(_N_TREES)!r}, 6) AS target_oof,
  p0.target AS target
FROM p0{joins}
"""


@query("cv_oof_forest_bagged", bench=True, oracle=_forest_oracle())
def cv_oof_forest_bagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL BAGGED TREE ENSEMBLE, driver-hash-matched (VERDICT r12
    #6 — the RF/ExtraTrees surrogate's bagging mechanics): 3-fold CV
    through the real `CVPredictor.run` loop with
    `ForestClosedFormWrapper` — per fold, THREE depth-2 greedy CARTs,
    each trained on a deterministic md5-hash row subsample (~1/2 of
    the fold-train rows, engine-portable — the C4 bagging analogue)
    over a rotating 2-of-3 feature subset (derandomized feature
    bagging), predictions averaged left-associated.  Every member's
    split statistics are exact integer counts with the total
    tie-break, so the oracle replays all NINE tree fits (3 folds × 3
    members: histograms, both split levels, tie-breaks, leaf rates),
    the subsample membership, the feature rotation, and the bagged
    mean — the full ensemble trajectory under one value hash.
    Reference: modeling/model_wrappers.py:242-323 (ExtraTrees leg),
    modeling/prediction.py:288-416."""
    from fastmlframework_spark.ml.cv import CVPredictor
    from fastmlframework_spark.ml.wrappers import ForestClosedFormWrapper

    predictor = CVPredictor(
        ForestClosedFormWrapper(
            key_col="key",
            n_trees=_N_TREES,
            max_depth=2,
            row_mod=_ROW_MOD,
            bag_seed=_BAG_SEED,
        ),
        metric="roc_auc_score",
        k=3,
        seeds=(27,),
        stratified=False,
        predict_probability=True,
        target_decimals=6,
    )
    train = (
        ml_train_table(spark, sf_dir)
        .withColumn("prio", F.substring("o_orderpriority", 1, 1).cast("long"))
        .withColumn(
            "cent_digit",
            F.round(F.col("o_totalprice") * 100, 0).cast("long") % 10,
        )
    )
    res = predictor.run(
        train,
        None,
        "key",
        "target",
        list(_TREE_FEATS),
    )
    return res.oof
