"""The CV/OOF prediction engine (SURVEY.md §3.2 run_cv_and_prediction).

Reference pipeline (modeling/prediction.py:288-530): per seed —
KFold split → per-fold fit → OOF scatter → test predict → metric;
then seed-bagging average.  Key structural translations:

* W5 OOF scatter (``oof_preds[valid_idx] = ...``, prediction.py:369)
  → UNION of per-fold (key, prediction) frames: fold membership
  partitions the key space, so the union IS the full OOF table.
* A10 test mean over folds (prediction.py:414) → union with fold tag
  → groupBy(key).avg.
* A11 test mode over folds (label case) → mode_agg with scipy
  tie-break.
* C4 seed bagging (prediction.py:426-476) → driver loop over seeds;
  per-seed OOF tables joined on the KEY (J1 positional concat →
  1:1 equi-join, §1.4) → A9 row-mean.
* A12 importance mean over folds → union of per-fold importance rows
  → groupBy(feature).mean.
* A20/A21 per-fold metric + mean/std — ALL k fold metrics in one
  grouped action over the unioned OOF table (fold carried as a
  literal tag per fold frame, so no re-tag join; VERDICT r8 #2),
  mean/std driver-side over k floats.

Scale notes: the fold-annotated train table is cached once and reused
k×(fits)+k(predicts) times; every per-fold frame is a filter on the
fold column, not a new scan.  Nothing about the engine materializes
rows on the driver except k-float score lists and per-feature
importance tables.
"""

from __future__ import annotations

import statistics
from collections.abc import Sequence
from dataclasses import dataclass
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastmlframework_spark.core import checkpoints
from fastmlframework_spark.functions.horizontal import horizontal_mean, mode_agg
from fastmlframework_spark.ml import metrics as metrics_mod
from fastmlframework_spark.ml.folds import fold_split, with_fold_column
from fastmlframework_spark.ml.wrappers import ModelWrapper


@dataclass
class CVResult:
    """Artifact bundle (FIXTURES.md §3 schemas)."""

    oof: DataFrame  # [key, target_oof, target] (+ per-seed cols when bagged)
    test_pred: DataFrame | None  # [key, target] predictions
    cv_results: list[dict]  # per seed: cv_mean_score, cv_std, per-fold scores
    feature_importance: DataFrame | None  # [feature, importance]


def _union_all(frames: Sequence[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), frames)


class CVPredictor:
    """Model-agnostic K-fold CV with OOF + test prediction and
    optional seed bagging (M1-consumer; §3.2)."""

    def __init__(
        self,
        wrapper: ModelWrapper,
        metric: str = "accuracy_score",
        k: int = 3,
        seeds: Sequence[int] = (27,),
        stratified: bool = True,
        predict_probability: bool = False,
        class_label: int = 1,
        target_decimals: int = 6,
        fold_method: str = "ntile",
    ):
        self.wrapper = wrapper
        self.metric = metric
        self.k = k
        self.seeds = list(seeds)
        self.stratified = stratified
        self.predict_probability = predict_probability
        self.class_label = class_label
        self.target_decimals = target_decimals
        self.fold_method = fold_method

    # -- single seed ---------------------------------------------------

    def _predict_frame(self, fitted, df: DataFrame) -> DataFrame:
        if self.predict_probability:
            return fitted.predict_proba(df, self.class_label)
        return fitted.predict(df)

    def run_cv_one_seed(
        self,
        train_df: DataFrame,
        test_df: DataFrame | None,
        key_col: str,
        target_col: str,
        feature_cols: Sequence[str],
        seed: int,
    ) -> tuple[DataFrame, DataFrame | None, list[float], DataFrame]:
        """One full CV pass → (oof, test_pred, fold_scores, importances)."""
        stratify = target_col if self.stratified else None
        # localCheckpoint (not cache): the fold table's logical plan
        # carries the whole ntile-assignment machinery (bucketed
        # row_number window + broadcast offsets join from
        # global_positions) and EVERY downstream action — one wide
        # fit aggregate per iteration/level, k predict branches, the
        # metric pass — re-analyzes that lineage under its own
        # expression tree.  Profiled at sf0.1: a single Newton
        # fit_folds aggregate cost ~3.2 s wall of which ~0.1 s was
        # execution; the rest was driver-side Catalyst re-analysis
        # (guide §3.3/§7.3).  Checkpointing truncates the plan at the
        # small [key, features, target, fold] table, making every
        # downstream plan O(1) to analyze; rows are deterministic, so
        # results are unchanged.  eager=True also fixes the RDD's REAL
        # (post-AQE) partition count, which the fit_folds fan_out
        # probe needs — a lazily-planned frame reports the pre-AQE
        # count and the probe would mis-decide.  Tracked + explicitly
        # released below once the metric pass has materialized the OOF
        # checkpoint (VERDICT r13 #1: checkpoint blocks are NOT freed
        # by clearCache(), and waiting on the ContextCleaner leaks
        # executor storage for the life of a many-query session).
        folded = checkpoints.checkpoint(
            with_fold_column(
                train_df,
                key_col,
                self.k,
                seed,
                stratify_col=stratify,
                method=self.fold_method,
            ),
            eager=True,
        )

        self.wrapper.reset_seed(seed)
        # Batched-fit fast path: the closed-form wrappers can fit ALL
        # k fold-complement models from one grouped/conditional
        # aggregate per iteration/level (bit-identical by exact
        # integer/fixed-point sums) — one scan of the cached fold
        # table where the per-fold loop ran k (guide §2.3/§2.4).
        fit_all = getattr(self.wrapper, "fit_folds", None)
        models = (
            fit_all(folded, feature_cols, target_col, "fold", self.k)
            if fit_all is not None
            else None
        )
        # Single-pass OOF fast path: closed-form models expose their
        # prediction as a bare Column, so the W5 scatter collapses to
        # ONE CASE-on-fold projection over the fold table — each row
        # is scored by exactly its own fold's expression, identical to
        # the k filter+predict branches it replaces, without k scans,
        # the union, or the per-branch plan analysis (guide §1.2-1).
        # callable(): FittedModel declares prediction_col as a STRING
        # dataclass field, so a bare hasattr would pass MLlib-backed
        # fold models into the CASE projection and crash at scoring
        # time (ADVICE r13).
        one_pass = models is not None and all(
            callable(getattr(m, "prediction_col", None))
            for m in models.values()
        )
        oof_frames, test_frames, scores = [], [], []
        imp_rows: list[tuple[str, float, int]] = []
        for fold in range(self.k):
            if models is not None:
                fitted = models[fold]
                va = folded.filter(F.col("fold") == fold)
            else:
                tr, va = fold_split(folded, "fold", fold)
                fitted = self.wrapper.fit(tr, feature_cols, target_col)
            if not one_pass:
                # Tag the fold as a LITERAL: the validation slice IS
                # fold `fold` by construction, so the A20 pass below
                # needs no re-tag join back onto the folded table
                # (VERDICT r8 #2).
                oof = self._predict_frame(fitted, va).select(
                    F.col(key_col),
                    F.col("prediction").alias("target_oof"),
                    F.col(target_col).alias("target"),
                    F.lit(fold).alias("fold"),
                )
                oof_frames.append(oof)
            if test_df is not None:
                test_frames.append(
                    self._predict_frame(fitted, test_df).select(
                        F.col(key_col), F.col("prediction")
                    )
                )
            for feat, imp in fitted.feature_importances():
                imp_rows.append((feat, float(imp), fold))

        # A20: every fold's metric in ONE action over the unioned OOF
        # table (grouped AUC / grouped agg), not k filtered jobs —
        # halves the CV loop's job count (VERDICT r8 #2).
        # localCheckpoint (not cache): the OOF union's logical plan
        # carries the fold-assignment + per-fold-predict lineage, and
        # the metric/artifact/stacker consumers each re-analyze it —
        # with the grouped-AUC referencing it 4×, Catalyst planning
        # time (driver-side, single-threaded) dominated the metric
        # pass.  Truncating lineage at this small [key, pred, target,
        # fold] table makes every downstream plan O(1) to analyze
        # (guide §5 / §3.3); the rows are already deterministic, so
        # results are unchanged.
        # eager=False: no standalone materialization job — the A20
        # metric collect below is the first action and persists it.
        if one_pass:
            pred = None
            for fold in range(self.k):
                expr = models[fold].prediction_col(
                    self.predict_probability, self.class_label
                )
                cond = F.col("fold") == fold
                pred = (
                    F.when(cond, expr)
                    if pred is None
                    else pred.when(cond, expr)
                )
            oof_scored = checkpoints.checkpoint(
                folded.select(
                    F.col(key_col),
                    pred.alias("target_oof"),
                    F.col(target_col).alias("target"),
                    F.col("fold"),
                ),
                eager=False,
            )
        else:
            oof_scored = checkpoints.checkpoint(
                _union_all(oof_frames), eager=False
            )
        try:
            score_map = metrics_mod.score_by(
                oof_scored, self.metric, "target", "target_oof", "fold"
            )
        finally:
            # The metric collect above is the first action on the lazy
            # OOF checkpoint, so it is materialized now and the fold
            # table has no consumer left (test/importance frames hang
            # off the fitted MODELS, not the fold table): free its
            # blocks instead of leaking them until JVM GC.  The OOF
            # checkpoint itself escapes to the caller and is released
            # by the session owner via checkpoints.release_all().
            checkpoints.release(folded)
        for fold in range(self.k):
            if fold not in score_map:
                raise ValueError(f"fold {fold} produced no OOF rows")
            scores.append(score_map[fold])

        test_pred = None
        if test_df is not None:
            tagged = _union_all(test_frames)
            if self.predict_probability or self.wrapper.task == "regression":
                test_pred = tagged.groupBy(key_col).agg(
                    F.avg("prediction").alias("target")
                )
            else:
                test_pred = mode_agg(
                    tagged, [key_col], "prediction", out_col="target"
                )

        spark = train_df.sparkSession
        if imp_rows:
            imp = spark.createDataFrame(
                imp_rows, ["feature", "importance", "fold"]
            )
        else:
            imp = None
        return oof_scored.drop("fold"), test_pred, scores, imp

    # -- bagged run ----------------------------------------------------

    def run(
        self,
        train_df: DataFrame,
        test_df: DataFrame | None,
        key_col: str,
        target_col: str,
        feature_cols: Sequence[str],
    ) -> CVResult:
        """C4: loop seeds, join per-seed artifacts on the key, bag by
        row-mean (A9) / mode, round per target_decimals (F5)."""
        per_seed = []
        cv_results = []
        imps = []
        for seed in self.seeds:
            oof, test_pred, scores, imp = self.run_cv_one_seed(
                train_df, test_df, key_col, target_col, feature_cols, seed
            )
            per_seed.append((seed, oof, test_pred))
            cv_results.append(
                {
                    "seed": seed,
                    "cv_mean_score": statistics.fmean(scores),
                    "cv_std": statistics.pstdev(scores),
                    "cv_score_per_each_fold": scores,
                }
            )
            if imp is not None:
                imps.append(imp)

        dec = self.target_decimals
        if len(per_seed) == 1:
            _, oof, test_pred = per_seed[0]
            oof = oof.withColumn("target_oof", F.round("target_oof", dec))
            if test_pred is not None:
                test_pred = test_pred.withColumn("target", F.round("target", dec))
        else:
            # J1 as keyed 1:1 equi-joins; A9 bagged mean; A11 mode for labels.
            seed_cols = [f"seed_{s}" for s, _, _ in per_seed]
            oof = None
            for (s, frame, _), cname in zip(per_seed, seed_cols):
                piece = frame.select(
                    key_col,
                    F.col("target_oof").alias(cname),
                    "target",
                )
                oof = (
                    piece
                    if oof is None
                    else oof.drop("target").join(piece, on=key_col)
                )
            bag = (
                horizontal_mean(seed_cols)
                if self.predict_probability or self.wrapper.task == "regression"
                else None
            )
            if bag is not None:
                oof = oof.withColumn("target_oof", F.round(bag, dec))
            else:
                long = oof.select(
                    key_col,
                    F.expr(
                        "stack({n}, {args}) as (__seed, __pred)".format(
                            n=len(seed_cols),
                            args=", ".join(f"'{c}', `{c}`" for c in seed_cols),
                        )
                    ),
                )
                voted = mode_agg(long, [key_col], "__pred", out_col="target_oof")
                oof = oof.join(voted, on=key_col)

            test_pred = None
            test_frames = [t for _, _, t in per_seed if t is not None]
            if test_frames:
                joined = None
                for (s, _, t), cname in zip(per_seed, seed_cols):
                    piece = t.select(key_col, F.col("target").alias(cname))
                    joined = piece if joined is None else joined.join(piece, on=key_col)
                if self.predict_probability or self.wrapper.task == "regression":
                    test_pred = joined.withColumn(
                        "target", F.round(horizontal_mean(seed_cols), dec)
                    )
                else:
                    long = joined.select(
                        key_col,
                        F.expr(
                            "stack({n}, {args}) as (__seed, __pred)".format(
                                n=len(seed_cols),
                                args=", ".join(f"'{c}', `{c}`" for c in seed_cols),
                            )
                        ),
                    )
                    test_pred = mode_agg(
                        long, [key_col], "__pred", out_col="target"
                    ).join(joined.select(key_col), on=key_col)

        if self.target_decimals == 0:
            oof = oof.withColumn("target_oof", F.col("target_oof").cast("long"))
            if test_pred is not None:
                test_pred = test_pred.withColumn(
                    "target", F.col("target").cast("long")
                )

        importance = None
        if imps:
            importance = (
                _union_all(imps)
                .groupBy("feature")
                .agg(F.mean("importance").alias("importance"))
            )
        return CVResult(
            oof=oof,
            test_pred=test_pred,
            cv_results=cv_results,
            feature_importance=importance,
        )
