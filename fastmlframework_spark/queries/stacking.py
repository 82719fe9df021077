"""Driver-hash evidence for the two-level ensembling surfaces and the
HPO loop (SURVEY.md §2.9 M13/M14, §2.11 O1-O8) — the round-13
capstone queries: `stacker_oof_ridge` (the real Stacker over real
closed-form OOF artifacts), `solution_chain_stacked` (the whole
`build_solution` O1-O8 task chain, final artifact hash-matched), and
`hpo_trajectory_newton` (the live GP-EI `maximize` history with every
evaluation oracle-replayed).

`stacker_oof_ridge` runs the REAL `Stacker` (ml/ensembling.py) over
REAL OOF artifacts produced by two closed-form base models through
the genuine artifact path: per-model `save_solution_artifacts` →
`load_oof_artifacts` (S3 scan, sources/artifacts.py) →
`assemble_oof_matrix` (_OOF rename + J1 key joins + J3 alignment) →
meta-model CV (the §3.2 engine re-entered with OOF columns as
features).  Reference: ensembling/stacking/stacker.py:13-33,
ensembling/ensembler.py:60-101, modeling/prediction.py:301-309.

Every stage is individually hash-matched already (cv_oof_ridge,
cv_oof_logistic_newton, blend_frozen_weights's S3→J1 path); this
module composes them into single oracles so the driver hash covers
the two-level fit end-to-end: both base trajectories, the 6-dp
artifact rounding contract, the scaled-integer re-encoding of the
prediction features, and the meta-solve.

Cross-engine determinism is inherited, not new: base OOF columns are
6-dp-rounded doubles (identical bits both engines), the meta features
re-enter `_ridge_int_feature` at scale 10^6 (a 6-dp double × 10^6 is
within 1e-9 of an integer — exact in both engines), and the meta
normal equations/Cramer solve run the proven integer-sum discipline.

Scale shape: two base CV passes (one map-side-combinable aggregate
per fold/iteration), parquet artifact round-trip, three 1:1 key
equi-joins, one meta CV pass — no per-row Python, no driver row
materialization anywhere.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.queries.analytics import ml_train_table
from fastmlframework_spark.queries.mlflow import (
    _key_hash_sql,
    _newton_iteration_sql,
    _NEWTON_ITERS,
    _NEWTON_LAM,
    _RIDGE_AFFINE_SQL,
    _RIDGE_LAM,
    _RIDGE_SOLVE_CTES,
)
from fastmlframework_spark.queries.registry import query

# the shared supervised fixture (FIXTURES.md §4) as oracle SQL — the
# same t CTE every mlflow.py oracle opens with
_TRAIN_SQL = """
SELECT
  o_orderkey AS key,
  CAST(ROUND(ROUND(c_acctbal, 2) * 100, 0) AS BIGINT) AS x1,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS x2,
  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
FROM orders JOIN customer ON o_custkey = c_custkey
"""

_BASE_SCALES = {"c_acctbal": 100, "order_year": 1}
_BASE_FEATURES = ["c_acctbal", "order_year"]
_META_SCALE = 1_000_000  # 6-dp artifact contract → exact integers


def _suffixed_ridge_cv_sql(
    suffix: str, src: str, seed: int, affine_round: bool
) -> str:
    """The full 3-fold closed-form-ridge CV pipeline as CTEs reading
    (key, x1, x2, target) from ``src``: fold assignment (NTILE over
    md5(key|seed)), per-fold complement normal equations, Cramer
    solve, affine OOF score — every CTE name suffixed so several
    pipelines compose in ONE oracle.  String-derived from the same
    solve template as `cv_oof_ridge` (queries/mlflow.py) so the
    arithmetic cannot drift from `_cramer3_solve`.  Ends in
    ``o{suffix}(key, target, p)`` (p unrounded unless
    ``affine_round``)."""
    ctes = _RIDGE_SOLVE_CTES.strip()
    for name in ("s", "tot", "c", "b", "f"):
        ctes = ctes.replace(f"{name} AS (", f"{name}{suffix} AS (")
        ctes = ctes.replace(f"FROM {name} ", f"FROM {name}{suffix} ")
        ctes = ctes.replace(f"FROM {name},", f"FROM {name}{suffix},")
        ctes = ctes.replace(f"FROM {name}\n", f"FROM {name}{suffix}\n")
        ctes = ctes.replace(f", {name}\n", f", {name}{suffix}\n")
        ctes = ctes.replace(f" {name}.", f" {name}{suffix}.")
        ctes = ctes.replace(f"({name}.", f"({name}{suffix}.")
    affine = _RIDGE_AFFINE_SQL.format(x1="f.x1", x2="f.x2")
    p = f"ROUND({affine}, 6)" if affine_round else affine
    return f"""
f{suffix} AS (
  SELECT *, NTILE(3) OVER (ORDER BY {_key_hash_sql(seed)}) - 1 AS fold
  FROM {src}
),
{ctes},
o{suffix} AS (
  SELECT f.key, f.target, {p} AS p
  FROM f{suffix} f JOIN b{suffix} b ON f.fold = b.fold
)"""


def _newton_cv_sql() -> str:
    """The 3-fold Newton-logistic CV pipeline as CTEs reading from
    ``t`` — fold table must be literally named ``f`` (the iteration
    template from queries/mlflow.py joins ``FROM f``).  Ends in
    ``onw(key, p)`` with p the UNROUNDED final sigmoid (the artifact
    rounding is applied by the consumer, mirroring the engine where
    `CVPredictor` rounds once at the end)."""
    d = 2
    zeros = ",\n    ".join(f"({k}, 0.0, 0.0, 0.0)" for k in range(3))
    iters = "".join(
        "," + _newton_iteration_sql(d, t, f"b{t - 1}" if t > 1 else "b0")
        for t in range(1, _NEWTON_ITERS + 1)
    )
    zf = "(b.c0 + b.c1 * CAST(f.x1 AS DOUBLE))"
    zf = f"({zf} + b.c2 * CAST(f.x2 AS DOUBLE))"
    return f"""
f AS (
  SELECT *, NTILE(3) OVER (ORDER BY {_key_hash_sql(27)}) - 1 AS fold
  FROM t
),
b0(fold, c0, c1, c2) AS (VALUES
    {zeros}
){iters},
onw AS (
  SELECT f.key, 1.0 / (1.0 + EXP(-{zf})) AS p
  FROM f JOIN b{_NEWTON_ITERS} b ON f.fold = b.fold
)"""


def _stacker_oracle() -> str:
    """Base ridge (suffix 27) + base Newton (plain names) + the OOF
    matrix under the 6-dp artifact contract + the meta-ridge CV
    (suffix m) over scaled-integer prediction features."""
    meta_enc = f"CAST(ROUND(ROUND({{p}}, 6) * {_META_SCALE}, 0) AS BIGINT)"
    return f"""
WITH t AS ({_TRAIN_SQL.strip()}
),
{_suffixed_ridge_cv_sql('27', 't', 27, affine_round=False).strip()},
{_newton_cv_sql().strip()},
mt AS (
  SELECT o.key,
    {meta_enc.format(p='o.p')} AS x1,
    {meta_enc.format(p='w.p')} AS x2,
    o.target AS target
  FROM o27 o JOIN onw w ON o.key = w.key
),
{_suffixed_ridge_cv_sql('m', 'mt', 27, affine_round=False).strip()}
SELECT key, ROUND(p, 6) AS target_oof, target
FROM om
"""


def _base_oof_artifacts(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Fit both base models through the real `CVPredictor.run` and
    persist their artifact bundles (S2 sink) — returns
    {model_name: solution_dir} for the S3 load."""
    from fastmlframework_spark.ml.cv import CVPredictor
    from fastmlframework_spark.ml.wrappers import (
        LogisticNewtonWrapper,
        RidgeClosedFormWrapper,
    )
    from fastmlframework_spark.sources.artifacts import (
        save_solution_artifacts,
    )

    train = ml_train_table(spark, sf_dir)
    runs = {
        "ridge": CVPredictor(
            RidgeClosedFormWrapper(scales=_BASE_SCALES, lam=_RIDGE_LAM),
            metric="mean_squared_error",
            k=3,
            seeds=(27,),
            stratified=False,
            predict_probability=False,
            target_decimals=6,
        ),
        "newton": CVPredictor(
            LogisticNewtonWrapper(
                scales=_BASE_SCALES, iters=_NEWTON_ITERS, lam=_NEWTON_LAM
            ),
            metric="roc_auc_score",
            k=3,
            seeds=(27,),
            stratified=False,
            predict_probability=True,
            target_decimals=6,
        ),
    }
    root = os.path.join(
        tempfile.gettempdir(),
        "fmlf_stacker_artifacts",
        os.path.basename(os.path.normpath(sf_dir)),
    )

    def _one(item: tuple[str, object]) -> tuple[str, str]:
        name, predictor = item
        res = predictor.run(
            train, None, "key", "target", list(_BASE_FEATURES)
        )
        out_dir = os.path.join(root, name)
        save_solution_artifacts(
            out_dir,
            model_name=name,
            key_col="key",
            target_col="target",
            oof=res.oof,
            cv_results=res.cv_results,
        )
        return name, out_dir

    # The two base fits are independent job chains: overlapping them
    # from a 2-thread pool lets each fit's aggregate back-fill the
    # executor slots the other's stragglers leave idle (guide §2.6).
    # Results are unchanged — separate output dirs, deterministic fits.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        return dict(pool.map(_one, runs.items()))


def _newton_pipeline_sql(suffix: str, iters: int, lam: float) -> str:
    """One Newton-logistic CV pipeline (suffixed CTEs) reading the
    SHARED unstratified fold table ``f`` — b{suffix}0 zero betas, the
    generalized iteration template from queries/mlflow.py per step,
    and ``o{suffix}(key, target, p)`` with p the UNROUNDED final
    sigmoid.  Two pipelines with distinct (iters, lam) compose in one
    oracle — the solution chain's two base models."""
    zeros = ",\n    ".join(f"({k}, 0.0, 0.0, 0.0)" for k in range(3))
    parts = [f"b{suffix}0(fold, c0, c1, c2) AS (VALUES\n    {zeros}\n)"]
    for t in range(1, iters + 1):
        parts.append(
            _newton_iteration_sql(
                2, t, f"b{suffix}{t - 1}", lam=lam, suffix=suffix
            ).strip()
        )
    zf = "(b.c0 + b.c1 * CAST(f.x1 AS DOUBLE))"
    zf = f"({zf} + b.c2 * CAST(f.x2 AS DOUBLE))"
    parts.append(
        f"""o{suffix} AS (
  SELECT f.key, f.target, f.fold, 1.0 / (1.0 + EXP(-{zf})) AS p
  FROM f JOIN b{suffix}{iters} b ON f.fold = b.fold
)"""
    )
    return ",\n".join(parts)


# the two base-model configurations of the solution chain — distinct
# damping and iteration counts make genuinely different trajectories
_CHAIN_NEWTON_A = {"iters": 2, "lam": 1.0}
_CHAIN_NEWTON_B = {"iters": 1, "lam": 4.0}


def _solution_chain_oracle() -> str:
    """The WHOLE BuildSolution dataflow in one SQL: shared fold table,
    both base Newton trajectories, the 6-dp artifact contract, the
    scaled-integer OOF matrix, and the meta-ridge CV."""
    meta_enc = f"CAST(ROUND(ROUND({{p}}, 6) * {_META_SCALE}, 0) AS BIGINT)"
    return f"""
WITH t AS ({_TRAIN_SQL.strip()}
),
f AS (
  SELECT *, NTILE(3) OVER (ORDER BY {_key_hash_sql(27)}) - 1 AS fold
  FROM t
),
{_newton_pipeline_sql('na', **_CHAIN_NEWTON_A)},
{_newton_pipeline_sql('nb', **_CHAIN_NEWTON_B)},
mt AS (
  SELECT a.key,
    {meta_enc.format(p='a.p')} AS x1,
    {meta_enc.format(p='w.p')} AS x2,
    a.target AS target
  FROM ona a JOIN onb w ON a.key = w.key
),
{_suffixed_ridge_cv_sql('m', 'mt', 27, affine_round=False).strip()}
SELECT key, ROUND(p, 6) AS target_oof, target
FROM om
"""


def _chain_config(raw_dir: str) -> dict:
    """The solution.conf-shaped dict driving the chain — closed-form
    estimator kinds selected per model slot via ``model_params``
    (get_wrapped_estimator's estimator_kind dispatch)."""
    scales = {"c_acctbal": 100, "order_year": 1}
    return {
        "index_column": "key",
        "target_column": "target",
        "train_file": os.path.join(raw_dir, "train"),
        "test_file": os.path.join(raw_dir, "test"),
        "modeling_settings": {
            "task": "classification",
            "metric": "roc_auc_score",
            "models": ["newton_a", "newton_b"],
            "model_seeds_list": [27],
            "cv_params": {"n_folds": 3, "stratified": False},
            "predict_probability": True,
            "class_label": 1,
            "target_decimals": 6,
            "run_fs": False,
            "run_hpo": False,
            "run_stacking": True,
            "run_blending": False,
        },
        "model_params": {
            "newton_a": {
                "estimator_kind": "logistic_newton",
                "scales": scales,
                **_CHAIN_NEWTON_A,
            },
            "newton_b": {
                "estimator_kind": "logistic_newton",
                "scales": scales,
                **_CHAIN_NEWTON_B,
            },
        },
        "stacking_settings": {
            "meta_model": "ridge_meta",
            "meta_model_params": {
                "estimator_kind": "ridge_closed_form",
                "scales": {
                    "newton_a_OOF": _META_SCALE,
                    "newton_b_OOF": _META_SCALE,
                },
                "lam": _RIDGE_LAM,
            },
        },
    }


@query("solution_chain_stacked", bench=True, oracle=_solution_chain_oracle())
def solution_chain_stacked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O8 END-TO-END, driver-hash-matched (VERDICT r12 #2 — the
    capstone): the real `build_solution` task chain executes from a
    cold project directory — O1 CSV ingest (scan → narrow → keyed
    Parquet), O4 fan-out over two configured base models (Newton
    logistic at distinct damping/iterations, selected through the
    config's model_params → get_wrapped_estimator estimator_kind
    dispatch), per-model §3.2 CV with artifact bundles (O3+S2), O5
    StackingTask (S3 artifact loads → _OOF rename → J1/J3 matrix →
    closed-form ridge meta-model CV), O6 BuildSolution manifest, O7
    lineage-named solution dirs, O8 target memoization — and the
    query returns the chain's FINAL stacked-OOF artifact read back
    from disk.  The oracle replays the entire dataflow in one SQL —
    shared fold assignment, both Newton trajectories (2-step lam=1
    and 1-step lam=4), the 6-dp artifact rounding, the 10^6 integer
    re-encoding, and the meta Cramer solve — so the driver hash
    covers the reference's whole `BuildSolution`
    (solution_pipeline/create_solution.py:800-824) reproduced on
    Spark.  The project dir is wiped first: every run executes every
    task (honest timing; memoization is separately pytest-proven)."""
    import shutil

    from fastmlframework_spark.pipeline.solution import build_solution
    from fastmlframework_spark.sources.artifacts import read_artifact

    root = os.path.join(
        tempfile.gettempdir(),
        "fmlf_solution_chain",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(root, ignore_errors=True)
    raw = os.path.join(root, "raw_data")
    base = ml_train_table(spark, sf_dir).select(
        "key", "c_acctbal", "order_year", "target"
    )
    base.write.option("header", True).mode("overwrite").csv(
        os.path.join(raw, "train")
    )
    base.filter(F.col("key") % 97 == 0).drop("target").write.option(
        "header", True
    ).mode("overwrite").csv(os.path.join(raw, "test"))

    # workers=2: the two base-model prediction tasks are the same
    # topological level of the task graph — the mini engine runs them
    # as overlapped Spark job chains (guide §2.6), results unchanged.
    build_solution(spark, _chain_config(raw), root, workers=2)
    final = read_artifact(
        spark, os.path.join(root, "results", "stacking", "train_oof")
    )
    return final.select("key", "target_oof", "target")


# ---------------------------------------------------------------------------
# M13 HPO trajectory evidence (VERDICT r12 #3)
# ---------------------------------------------------------------------------

_HPO_PBOUNDS = {"lam": (0.5, 8.0)}
_HPO_INIT, _HPO_N_ITER, _HPO_SEED = 2, 2, 27
_HPO_NEWTON_ITERS = 1

# The recorded sf0.01 trajectory: the GP-EI proposal sequence of
# `maximize` over the Newton-CV objective below is DETERMINISTIC
# (seeded rng + GP over deterministic Spark AUCs), so the proposals
# can enter the oracle as full-precision literals — the same
# recorded-history discipline as `blend_frozen_weights`.  The driver
# compares at sf0.01, where the live run reproduces exactly this
# sequence; any drift in the optimizer, the objective, or the metric
# flips the hash.  (At other scales the query still runs live and
# returns its own trajectory; only sf0.01 is oracle-compared.)
_HPO_RECORDED_LAMS: list[float] = [
    5.363729149841623,   # init probe 1 (seeded rng, data-independent)
    5.760271557265061,   # init probe 2
    4.065264284453732,   # GP-EI proposal 1 (depends on observed AUCs)
    0.5004683611724088,  # GP-EI proposal 2 → the incumbent
]


def _hpo_objective_predictor(lam: float):
    """The EXACT CVPredictor the HPO objective evaluates — shared by
    the live `maximize` run and the trajectory replay so they cannot
    drift."""
    from fastmlframework_spark.ml.cv import CVPredictor
    from fastmlframework_spark.ml.wrappers import LogisticNewtonWrapper

    return CVPredictor(
        LogisticNewtonWrapper(
            scales=dict(_BASE_SCALES), iters=_HPO_NEWTON_ITERS, lam=lam
        ),
        metric="roc_auc_score",
        k=3,
        seeds=(27,),
        stratified=False,
        predict_probability=True,
        target_decimals=6,
    )


def run_hpo_trajectory(spark: SparkSession, sf_dir: str):
    """The real M13 loop: `maximize` (GP-EI) over the Newton-CV
    roc_auc objective — returns the HPOResult whose history the
    trajectory query emits."""
    from fastmlframework_spark.ml.hpo import maximize

    train = ml_train_table(spark, sf_dir)

    def objective(lam: float) -> float:
        res = _hpo_objective_predictor(lam).run(
            train, None, "key", "target", list(_BASE_FEATURES)
        )
        return float(res.cv_results[0]["cv_mean_score"])

    return maximize(
        objective,
        _HPO_PBOUNDS,
        init_points=_HPO_INIT,
        n_iter=_HPO_N_ITER,
        seed=_HPO_SEED,
    )


def _hpo_trajectory_oracle() -> str:
    """Replay every EVALUATION of the recorded trajectory: for each
    proposed lam (full-precision literal) re-run the 1-step Newton
    fit per fold and the exact rank-AUC over that fold's validation
    slice, then the 3-fold mean — [step, lam, score] must hash-match
    the live optimizer's history."""
    steps = []
    for i, lam in enumerate(_HPO_RECORDED_LAMS):
        sfx = f"h{i}"
        pipeline = _newton_pipeline_sql(sfx, _HPO_NEWTON_ITERS, lam)
        steps.append(
            f"""{pipeline},
d{sfx} AS (
  SELECT fold, p AS s, CAST(target AS DOUBLE) AS y FROM o{sfx}
),
per{sfx} AS (
  SELECT fold, s, COUNT(*) AS n, SUM(y) AS npos
  FROM d{sfx} GROUP BY fold, s
),
c{sfx} AS (
  SELECT *, COALESCE(SUM(n) OVER (PARTITION BY fold ORDER BY s
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM per{sfx}
),
a{sfx} AS (
  SELECT fold,
    (SUM(npos * (below + (n + 1) / 2.0))
     - SUM(npos) * (SUM(npos) + 1) / 2.0)
    / (SUM(npos) * SUM(n - npos)) AS auc
  FROM c{sfx} GROUP BY fold
),
m{sfx} AS (
  SELECT {i} AS step, ROUND({lam!r}, 6) AS lam,
    ROUND((MAX(CASE WHEN fold = 0 THEN auc END)
         + MAX(CASE WHEN fold = 1 THEN auc END)
         + MAX(CASE WHEN fold = 2 THEN auc END)) / 3.0, 6) AS score
  FROM a{sfx}
)"""
        )
        # the recorded per-step OOF scoring table needs its own fold
        # join; folds are shared (seed 27, unstratified) via CTE f
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM m{'h%d' % i}" for i in range(len(_HPO_RECORDED_LAMS))
    )
    body = ",\n".join(steps)
    return f"""
WITH t AS ({_TRAIN_SQL.strip()}
),
f AS (
  SELECT *, NTILE(3) OVER (ORDER BY {_key_hash_sql(27)}) - 1 AS fold
  FROM t
),
{body}
{union}
"""


@query(
    "hpo_trajectory_newton",
    bench=False,
    bench_reason=(
        "4-evaluation trajectory audit of the BO loop; the Newton CV "
        "latency path is benched via cv_oof_logistic_newton"
    ),
    oracle=_hpo_trajectory_oracle(),
)
def hpo_trajectory_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 BAYESIAN-OPTIMIZATION TRAJECTORY, driver-hash-matched
    (VERDICT r12 #3): the real `maximize` GP-EI loop (2 seeded init
    probes + 2 GP proposals, ml/hpo.py) runs LIVE over a real
    objective — 3-fold CV of the 1-step Newton logistic fit scored by
    the exact distributed rank-AUC — exactly the reference's
    BayesianOptimization-over-cv_score loop
    (modeling/hyper_parameters_optimization.py:100-160,
    create_solution.py:257-298).  The query emits the full history
    [step, lam, score]; the oracle replays every EVALUATION from the
    recorded full-precision proposals (the `blend_frozen_weights`
    recorded-history discipline): per step, the complete 1-iteration
    Newton trajectory at that damping and the per-fold Mann-Whitney
    AUC with exact integer rank arithmetic, then the 3-fold mean.
    Both the proposal VALUES and the evaluation SCORES are
    hash-compared, so a drift in the optimizer's proposal sequence,
    the CV engine, the fit, or the metric all flip the hash.  Only
    the GP's internal linear algebra stays outside the oracle (its
    OUTPUT — the proposals — is checked)."""
    res = run_hpo_trajectory(spark, sf_dir)
    rows = [
        (i, float(h["params"]["lam"]), float(h["score"]))
        for i, h in enumerate(res.history)
    ]
    return (
        spark.createDataFrame(rows, "step int, lam double, score double")
        .select(
            "step",
            F.round("lam", 6).alias("lam"),
            F.round("score", 6).alias("score"),
        )
    )


@query("stacker_oof_ridge", bench=True, oracle=_stacker_oracle())
def stacker_oof_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14 STACKER, driver-hash-matched end-to-end (VERDICT r12 #1 —
    the last model operator without an oracle query): two REAL base
    fits (closed-form ridge + 2-step Newton logistic, each a full
    3-fold `CVPredictor.run`) persist genuine artifact bundles
    (`save_solution_artifacts`, S2), are loaded back through the S3
    scan (`load_oof_artifacts`), assembled into the OOF matrix by the
    real `assemble_oof_matrix` (_OOF rename, J1 1:1 key joins, J3
    alignment check), and the real `Stacker` re-enters the §3.2 CV
    engine with the prediction columns as meta-features of a
    closed-form ridge meta-model.  The oracle replays ALL of it in
    one SQL: both base trajectories (Cramer solve; both Newton
    iterations' quantized gradient/Hessian sums and damped solves),
    the 6-dp artifact rounding, the 10^6 scaled-integer re-encoding
    of the prediction features, the meta fold assignment, and the
    meta Cramer solve — so the value hash covers the whole two-level
    fit.  Reference: ensembling/stacking/stacker.py:13-33,
    ensembling/ensembler.py:60-101, modeling/prediction.py:301-309."""
    from fastmlframework_spark.ml.cv import CVPredictor
    from fastmlframework_spark.ml.ensembling import (
        Stacker,
        assemble_oof_matrix,
    )
    from fastmlframework_spark.ml.wrappers import RidgeClosedFormWrapper
    from fastmlframework_spark.sources.artifacts import load_oof_artifacts

    dirs = _base_oof_artifacts(spark, sf_dir)
    oofs = load_oof_artifacts(spark, dirs)
    matrix = assemble_oof_matrix(oofs)  # [key, ridge_OOF, target, newton_OOF]
    stacker = Stacker(
        RidgeClosedFormWrapper(
            scales={
                "ridge_OOF": _META_SCALE,
                "newton_OOF": _META_SCALE,
            },
            lam=_RIDGE_LAM,
        ),
        metric="mean_squared_error",
        k=3,
        seeds=(27,),
        stratified=False,
        predict_probability=False,
        target_decimals=6,
    )
    res = stacker.run(matrix, key_col="key", target_col="target")
    return res.oof.select("key", "target_oof", "target")
