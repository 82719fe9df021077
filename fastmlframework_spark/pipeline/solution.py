"""The reference's solution task chain, O1-O8 (SURVEY.md §2.11), on
the mini-Luigi engine in ``tasks.py``.

Reference parity (file:line in /root/reference):

* O1 TrainDataIngestion — create_solution.py:32-69: CSV scan +
  downcast + sink; here read→narrow→mint-key→Parquet.
* O2 FeatureSelection — create_solution.py:72-171: target-permutation
  null importances → scores → threshold → optimal features JSON.
* O3 RunSingleModelHPO / RunSingleModelPrediction —
  create_solution.py:257-298 / :301-377.  The reference hands a
  pickled Predictor between tasks (S5); sessions/models don't pickle
  that way in Spark, so each task reconstructs from config (SURVEY
  §2.1 S5 mapping).
* O4 fan-out over models — create_solution.py:386-390: one prediction
  task per configured model.
* O5/O6 stacking / blending / BuildSolution — create_solution.py:
  409-488, :540-607, :639-712, :800-819 (conditional branches).
* O7 directory-lineage naming — config_parser.py:45-145: the artifact
  path encodes fs/hpo/bagging choices so distinct experiment variants
  never collide.
* O8 target memoization — Luigi ``complete()`` semantics; Parquet
  ``_SUCCESS`` markers as targets.

Config is a plain dict (see ``sources.config.load_config``) shaped
after ``examples/.../iris/configs/solution.conf``.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from fastmlframework_spark.ml import feature_selection as fs
from fastmlframework_spark.ml.cv import CVPredictor
from fastmlframework_spark.ml.ensembling import (
    Blender,
    Stacker,
    assemble_oof_matrix,
)
from fastmlframework_spark.ml.hpo import maximize
from fastmlframework_spark.ml.wrappers import get_wrapped_estimator
from fastmlframework_spark.pipeline.tasks import LocalTarget, Task, build
from fastmlframework_spark.sources import artifacts as art
from fastmlframework_spark.sources.config import get_path
from fastmlframework_spark.sources.ingestion import ingest_csv

KEY_COL = "row_key"


def solution_dir(
    base: str,
    model: str,
    *,
    run_fs: bool = False,
    run_hpo: bool = False,
    bagged: bool = False,
) -> str:
    """O7 (config_parser.py:45-145, SUBDIR_* at :10-13): encode
    experiment lineage into the artifact path."""
    parts = [
        model,
        "fs_permutation" if run_fs else "fs_none",
        "hpo_bayes" if run_hpo else "hpo_none",
        "bagged" if bagged else "single_seed",
    ]
    return os.path.join(base, "results", *parts)


class SolutionContext:
    """Shared config + session for all tasks of one solution run."""

    def __init__(self, spark: SparkSession, config: dict, project_dir: str):
        self.spark = spark
        self.config = config
        self.project_dir = project_dir

    # -- config accessors (defaults mirror solution.conf fields) -------

    def cfg(self, dotted: str, default=None):
        return get_path(self.config, dotted, default)

    @property
    def target_col(self) -> str:
        return self.cfg("target_column", "target")

    @property
    def index_column(self) -> str | None:
        return self.cfg("index_column")

    @property
    def key_col(self) -> str:
        return self.index_column or KEY_COL

    @property
    def task_kind(self) -> str:
        return self.cfg("modeling_settings.task", "classification")

    @property
    def metric(self) -> str:
        return self.cfg("modeling_settings.metric", "accuracy_score")

    @property
    def models(self) -> list[str]:
        m = self.cfg("modeling_settings.models", ["logistic_regression"])
        return list(m) if isinstance(m, (list, tuple)) else [m]

    @property
    def seeds(self) -> list[int]:
        s = self.cfg("modeling_settings.model_seeds_list", [27])
        return [int(x) for x in (s if isinstance(s, (list, tuple)) else [s])]

    @property
    def bagged(self) -> bool:
        return len(self.seeds) > 1

    def data_dir(self) -> str:
        return os.path.join(self.project_dir, "data")

    def feature_cols(self, df_columns: list[str]) -> list[str]:
        """P1: everything except target/key/excluded
        (prediction.py:312-317)."""
        excl = set(self.cfg("cols_to_exclude", []) or [])
        excl |= {self.target_col, self.key_col, KEY_COL}
        return [c for c in df_columns if c not in excl]


class TrainDataIngestion(Task):
    """O1: CSV → narrow → key → Parquet (create_solution.py:32-69)."""

    def __init__(self, ctx: SolutionContext):
        self.ctx = ctx

    def output(self):
        d = self.ctx.data_dir()
        return [
            LocalTarget(os.path.join(d, "train"), parquet_dir=True),
            LocalTarget(os.path.join(d, "test"), parquet_dir=True),
            LocalTarget(os.path.join(d, "ingest_meta.json")),
        ]

    def run(self) -> None:
        ctx = self.ctx
        nrows = (
            int(ctx.cfg("num_rows", 0)) or None
            if ctx.cfg("debug", False)
            else None
        )
        meta = {}
        for split in ("train", "test"):
            path = ctx.cfg(f"{split}_file")
            if path and not os.path.isabs(path):
                path = os.path.join(ctx.project_dir, path)
            df, report = ingest_csv(
                ctx.spark,
                path,
                index_column=ctx.index_column,
                key_col=ctx.key_col,
                nrows=nrows,
            )
            art.write_artifact(df, os.path.join(ctx.data_dir(), split))
            meta[split] = {
                "rows": report.row_count,
                "narrowed": report.narrowed,
                "key_col": report.key_col,
                "key_minted": report.key_minted,
            }
        art.write_json(meta, os.path.join(ctx.data_dir(), "ingest_meta.json"))


class FeatureSelectionTask(Task):
    """O2: null-importance feature selection → optimal_features.json
    (create_solution.py:72-171)."""

    def __init__(self, ctx: SolutionContext):
        self.ctx = ctx

    def requires(self):
        return TrainDataIngestion(self.ctx)

    def output(self):
        return LocalTarget(
            os.path.join(self.ctx.project_dir, "fs", "optimal_features.json")
        )

    def run(self) -> None:
        ctx = self.ctx
        train = art.read_artifact(
            ctx.spark, os.path.join(ctx.data_dir(), "train")
        )
        feats = ctx.feature_cols(train.columns)
        wrapper = get_wrapped_estimator(
            ctx.cfg("fs_settings.estimator", "random_forest"), ctx.task_kind
        )
        actual = fs.actual_importances(wrapper, train, feats, ctx.target_col)
        null = fs.null_importances(
            wrapper,
            train,
            ctx.key_col,
            feats,
            ctx.target_col,
            n_runs=int(ctx.cfg("fs_settings.nb_target_permutation_runs", 5)),
            seed=int(ctx.cfg("fs_settings.seed", 27)),
        )
        scores = fs.score_features(actual, null)
        threshold = float(ctx.cfg("fs_settings.threshold", 0.0))
        selected = fs.select_features(scores, threshold)
        if not selected:  # guard: never select an empty feature set
            selected = feats
        art.write_json(
            {"features": selected, "threshold": threshold},
            self.output().path,
        )


# Per-family default HPO search boxes (pbounds at solution.conf-level
# in the reference; these are the fallbacks when config omits them).
_DEFAULT_PBOUNDS = {
    "logistic_regression": {"regParam": (0.0, 0.5)},
    "linear_regression": {"regParam": (0.0, 0.5)},
    "random_forest": {"numTrees": (5.0, 25.0), "maxDepth": (2.0, 8.0)},
    "gbt": {"maxDepth": (2.0, 6.0), "stepSize": (0.05, 0.3)},
}


class RunSingleModelHPO(Task):
    """O3: Bayesian HPO of one model's CV score → best_params.json
    (create_solution.py:257-298; hyper_parameters_optimization.py:100-160)."""

    def __init__(self, ctx: SolutionContext, model: str):
        self.ctx = ctx
        self.model = model

    def requires(self):
        req: list[Task] = [TrainDataIngestion(self.ctx)]
        if self.ctx.cfg("modeling_settings.run_fs", False):
            req.append(FeatureSelectionTask(self.ctx))
        return req

    def output(self):
        return LocalTarget(
            os.path.join(
                self.ctx.project_dir, "hpo", self.model, "best_params.json"
            )
        )

    def run(self) -> None:
        ctx = self.ctx
        train = art.read_artifact(
            ctx.spark, os.path.join(ctx.data_dir(), "train")
        )
        feats = _select_feature_cols(ctx, train.columns)
        pbounds = {
            k: tuple(v)
            for k, v in (ctx.cfg("hpo_settings.pbounds", {}) or {}).items()
        } or dict(_DEFAULT_PBOUNDS.get(
            get_wrapped_estimator(self.model, ctx.task_kind).ALIASES.get(
                self.model, self.model
            ),
            {"maxIter": (10, 50)},
        ))

        def objective(**params) -> float:
            wrapper = get_wrapped_estimator(
                self.model, ctx.task_kind, params=dict(params)
            )
            predictor = CVPredictor(
                wrapper,
                metric=ctx.metric,
                k=int(ctx.cfg("modeling_settings.cv_params.n_folds", 3)),
                seeds=[ctx.seeds[0]],
                stratified=bool(
                    ctx.cfg("modeling_settings.cv_params.stratified", True)
                ),
            )
            res = predictor.run(train, None, ctx.key_col, ctx.target_col, feats)
            return float(res.cv_results[0]["cv_mean_score"])

        res = maximize(
            objective,
            pbounds,
            init_points=int(ctx.cfg("hpo_settings.init_points", 2)),
            n_iter=int(ctx.cfg("hpo_settings.n_iter", 3)),
            seed=ctx.seeds[0],
        )
        art.write_json(
            {
                "best_params": res.best_params,
                "best_score": res.best_score,
                "history": res.history,
            },
            self.output().path,
        )


def _select_feature_cols(ctx: SolutionContext, columns: list[str]) -> list[str]:
    """P2: restrict to FS output when present (create_solution.py:236-237)."""
    if ctx.cfg("modeling_settings.run_fs", False):
        fpath = os.path.join(ctx.project_dir, "fs", "optimal_features.json")
        if os.path.exists(fpath):
            return list(art.read_json(fpath)["features"])
    return ctx.feature_cols(columns)


def _load_best_params(ctx: SolutionContext, model: str) -> dict:
    if ctx.cfg("modeling_settings.run_hpo", False):
        p = os.path.join(ctx.project_dir, "hpo", model, "best_params.json")
        if os.path.exists(p):
            return dict(art.read_json(p)["best_params"])
    return dict(ctx.cfg(f"model_params.{model}", {}) or {})


class RunSingleModelPrediction(Task):
    """O3: CV + OOF + test prediction + artifacts
    (create_solution.py:301-377 / §3.2)."""

    def __init__(self, ctx: SolutionContext, model: str):
        self.ctx = ctx
        self.model = model
        self.out_dir = solution_dir(
            ctx.project_dir,
            model,
            run_fs=bool(ctx.cfg("modeling_settings.run_fs", False)),
            run_hpo=bool(ctx.cfg("modeling_settings.run_hpo", False)),
            bagged=ctx.bagged,
        )

    def requires(self):
        req: list[Task] = [TrainDataIngestion(self.ctx)]
        if self.ctx.cfg("modeling_settings.run_fs", False):
            req.append(FeatureSelectionTask(self.ctx))
        if self.ctx.cfg("modeling_settings.run_hpo", False):
            req.append(RunSingleModelHPO(self.ctx, self.model))
        return req

    def output(self):
        return [
            LocalTarget(os.path.join(self.out_dir, art.MANIFEST)),
            LocalTarget(
                os.path.join(self.out_dir, "train_oof"), parquet_dir=True
            ),
        ]

    def run(self) -> None:
        ctx = self.ctx
        spark = ctx.spark
        train = art.read_artifact(spark, os.path.join(ctx.data_dir(), "train"))
        test = art.read_artifact(spark, os.path.join(ctx.data_dir(), "test"))
        feats = _select_feature_cols(ctx, train.columns)
        wrapper = get_wrapped_estimator(
            self.model, ctx.task_kind, params=_load_best_params(ctx, self.model)
        )
        predictor = CVPredictor(
            wrapper,
            metric=ctx.metric,
            k=int(ctx.cfg("modeling_settings.cv_params.n_folds", 3)),
            seeds=ctx.seeds,
            stratified=bool(
                ctx.cfg("modeling_settings.cv_params.stratified", True)
            ),
            predict_probability=bool(
                ctx.cfg("modeling_settings.predict_probability", False)
            ),
            class_label=int(ctx.cfg("modeling_settings.class_label", 1)),
            target_decimals=int(
                ctx.cfg("modeling_settings.target_decimals", 6)
            ),
        )
        res = predictor.run(train, test, ctx.key_col, ctx.target_col, feats)
        art.save_solution_artifacts(
            self.out_dir,
            model_name=self.model,
            key_col=ctx.key_col,
            target_col="target",
            oof=res.oof,
            test_pred=res.test_pred,
            feature_importance=res.feature_importance,
            cv_results=res.cv_results,
            bagged=ctx.bagged,
            target_decimals=int(
                ctx.cfg("modeling_settings.target_decimals", 6)
            ),
        )


class StackingTask(Task):
    """O5: meta-model over the per-model OOF matrix
    (create_solution.py:409-488; stacker.py:13-33)."""

    def __init__(self, ctx: SolutionContext):
        self.ctx = ctx
        self.out_dir = os.path.join(ctx.project_dir, "results", "stacking")

    def requires(self):
        return [
            RunSingleModelPrediction(self.ctx, m) for m in self.ctx.models
        ]

    def output(self):
        return [
            LocalTarget(os.path.join(self.out_dir, art.MANIFEST)),
            LocalTarget(
                os.path.join(self.out_dir, "train_oof"), parquet_dir=True
            ),
        ]

    def _oof_matrix(self):
        ctx = self.ctx
        dirs = {
            m: RunSingleModelPrediction(ctx, m).out_dir for m in ctx.models
        }
        tables = art.load_oof_artifacts(ctx.spark, dirs)
        return assemble_oof_matrix(
            tables, key_col=ctx.key_col, pred_col="target_oof"
        )

    def run(self) -> None:
        ctx = self.ctx
        matrix = self._oof_matrix()
        meta = get_wrapped_estimator(
            ctx.cfg("stacking_settings.meta_model", "logistic_regression"),
            ctx.task_kind,
            params=dict(
                ctx.cfg("stacking_settings.meta_model_params", {}) or {}
            ),
        )
        stacker = Stacker(
            meta,
            metric=ctx.metric,
            k=int(ctx.cfg("modeling_settings.cv_params.n_folds", 3)),
            seeds=[ctx.seeds[0]],
            stratified=bool(
                ctx.cfg("modeling_settings.cv_params.stratified", True)
            ),
            target_decimals=int(
                ctx.cfg("modeling_settings.target_decimals", 6)
            ),
        )
        res = stacker.run(matrix, key_col=ctx.key_col, target_col="target")
        art.save_solution_artifacts(
            self.out_dir,
            model_name="stacker",
            key_col=ctx.key_col,
            target_col="target",
            oof=res.oof,
            cv_results=res.cv_results,
        )


class BlendingTask(Task):
    """O5: BO-weighted voting blend of OOF predictions
    (create_solution.py:540-607; blender.py:289-398)."""

    def __init__(self, ctx: SolutionContext):
        self.ctx = ctx
        self.out_dir = os.path.join(ctx.project_dir, "results", "blending")

    def requires(self):
        req: list[Task] = [
            RunSingleModelPrediction(self.ctx, m) for m in self.ctx.models
        ]
        # Conditional stacked-OOF input (create_solution.py:651-657).
        if self.ctx.cfg("modeling_settings.run_stacking", False) and self.ctx.cfg(
            "blending_settings.blend_stacked", False
        ):
            req.append(StackingTask(self.ctx))
        return req

    def output(self):
        return [
            LocalTarget(os.path.join(self.out_dir, "weights.json")),
            LocalTarget(
                os.path.join(self.out_dir, "train_oof"), parquet_dir=True
            ),
        ]

    def run(self) -> None:
        ctx = self.ctx
        dirs = {
            m: RunSingleModelPrediction(ctx, m).out_dir for m in ctx.models
        }
        tables = art.load_oof_artifacts(ctx.spark, dirs)
        matrix = assemble_oof_matrix(
            tables, key_col=ctx.key_col, pred_col="target_oof"
        )
        blender = Blender(
            metric=ctx.metric,
            k=int(ctx.cfg("modeling_settings.cv_params.n_folds", 3)),
            seed=ctx.seeds[0],
            init_points=int(ctx.cfg("blending_settings.init_points", 2)),
            n_iter=int(ctx.cfg("blending_settings.n_iter", 3)),
        )
        res = blender.run(matrix, key_col=ctx.key_col, target_col="target")
        art.write_artifact(
            res.oof_blend.withColumn("blend", F.round("blend", 6)),
            os.path.join(self.out_dir, "train_oof"),
        )
        art.write_json(
            {"fold_weights": res.weights, "score": res.score},
            os.path.join(self.out_dir, "weights.json"),
        )


class BuildSolution(Task):
    """O6 (create_solution.py:800-819): terminal wrapper with
    conditional stacking/blending branches."""

    def __init__(self, ctx: SolutionContext):
        self.ctx = ctx

    def requires(self):
        ctx = self.ctx
        req: list[Task] = [
            RunSingleModelPrediction(ctx, m) for m in ctx.models
        ]
        if ctx.cfg("modeling_settings.run_stacking", False):
            req.append(StackingTask(ctx))
        if ctx.cfg("modeling_settings.run_blending", False):
            req.append(BlendingTask(ctx))
        return req

    def output(self):
        return LocalTarget(
            os.path.join(self.ctx.project_dir, "solution_manifest.json")
        )

    def run(self) -> None:
        ctx = self.ctx
        manifest = {
            "models": ctx.models,
            "stacking": bool(ctx.cfg("modeling_settings.run_stacking", False)),
            "blending": bool(ctx.cfg("modeling_settings.run_blending", False)),
            "artifacts": {
                m: RunSingleModelPrediction(ctx, m).out_dir
                for m in ctx.models
            },
        }
        art.write_json(manifest, self.output().path)


def build_solution(
    spark: SparkSession,
    config: dict,
    project_dir: str,
    workers: int = 1,
    timings: dict[str, float] | None = None,
) -> list[str]:
    """``luigi.build([BuildSolution(...)])`` equivalent
    (create_solution.py:822-824).  Returns ids of tasks that ran.
    ``workers > 1``: independent per-model tasks (O4 fan-out) run
    concurrently as parallel Spark job chains.  ``timings`` receives
    per-task wall seconds when provided."""
    ctx = SolutionContext(spark, config, project_dir)
    return build([BuildSolution(ctx)], workers=workers, timings=timings)
