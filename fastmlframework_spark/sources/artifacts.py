"""Artifact sinks/scans: Parquet tables + JSON manifests.

Reference parity (file:line in /root/reference):

* S2 CSV sink with target-decimals rounding / int cast —
  modeling/prediction.py:743-772, ensembling/blending/blender.py:81-99.
  Canonical artifact here is Parquet (columnar, schema-carrying,
  splittable — the right sink at 100 TB); rounding is applied as F5
  (`F.round` / long-cast) BEFORE the write so artifacts are
  bit-identical re-read.
* S3 OOF artifact scan — ensembling/ensembler.py:60-95: reads
  ``train_OOF*`` / ``test*`` per solution, filtering by ``'bagged' in
  name``.  The filename convention becomes explicit manifest metadata
  (``bagged: bool``) — scans filter on metadata, not name parsing.
* S4 JSON sinks/scans — create_solution.py:165-168/:292-295/:371-374:
  small driver-side control data (feature lists, best HP, manifests).

Directory layout per solution run::

    <dir>/manifest.json            # model name, target, key, bagged, score
    <dir>/train_oof/               # parquet [key, target_oof(|seed_*), target]
    <dir>/test_pred/               # parquet [key, target]      (optional)
    <dir>/feature_importance/      # parquet [feature, importance, fold]
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


def round_for_artifact(
    df: DataFrame, cols: Sequence[str], decimals: int
) -> DataFrame:
    """F5 (prediction.py:230-234/:444-449): round prediction columns to
    ``decimals``; decimals==0 → integer (long) cast, matching the
    reference's ``astype(int)`` branch."""
    out = df
    for c in cols:
        if c not in out.columns:
            continue
        if decimals == 0:
            out = out.withColumn(c, F.round(c, 0).cast("long"))
        else:
            out = out.withColumn(c, F.round(c, decimals))
    return out


def write_artifact(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """S2: Parquet sink (snappy default; splittable at scale).

    ``partition_by`` writes hive-style partition directories — at
    100 TB, partitioning facts by a pruning-friendly column (date,
    event type) turns selective scans into reads of a few directories
    (PartitionFilters in the plan), complementing bucketing
    (``sources/bucketing.py``) which co-locates by join key."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_artifact(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_json(obj: object, path: str) -> None:
    """S4: small driver-side control data."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, sort_keys=True, default=str)


def read_json(path: str):
    with open(path) as fh:
        return json.load(fh)


def save_solution_artifacts(
    out_dir: str,
    *,
    model_name: str,
    key_col: str,
    target_col: str,
    oof: DataFrame,
    test_pred: DataFrame | None = None,
    feature_importance: DataFrame | None = None,
    cv_results: list[dict] | None = None,
    bagged: bool = False,
    target_decimals: int = 6,
    extra_meta: Mapping | None = None,
) -> str:
    """Persist one model run's artifact bundle (prediction.py:508-530
    analogue).  Returns the manifest path."""
    pred_cols = [c for c in oof.columns if c not in (key_col, target_col)]
    write_artifact(
        round_for_artifact(oof, pred_cols, target_decimals),
        os.path.join(out_dir, "train_oof"),
    )
    if test_pred is not None:
        tcols = [c for c in test_pred.columns if c != key_col]
        write_artifact(
            round_for_artifact(test_pred, tcols, target_decimals),
            os.path.join(out_dir, "test_pred"),
        )
    if feature_importance is not None:
        write_artifact(
            feature_importance, os.path.join(out_dir, "feature_importance")
        )
    manifest = {
        "model_name": model_name,
        "key_col": key_col,
        "target_col": target_col,
        "bagged": bagged,
        "target_decimals": target_decimals,
        "has_test_pred": test_pred is not None,
        "cv_results": cv_results or [],
    }
    if extra_meta:
        manifest.update(extra_meta)
    mpath = os.path.join(out_dir, MANIFEST)
    write_json(manifest, mpath)
    return mpath


def load_oof_artifacts(
    spark: SparkSession,
    solution_dirs: Mapping[str, str],
    *,
    bagged_only: bool = False,
    split: str = "train_oof",
) -> dict[str, DataFrame]:
    """S3 (ensembler.py:60-95): scan each solution dir's OOF artifact;
    the reference's ``'bagged' in filename`` filter (:69-71) becomes a
    manifest-metadata filter.  Returns {model_name: DataFrame} ready
    for ``ml.ensembling.assemble_oof_matrix`` (J1 key-joins).
    """
    out: dict[str, DataFrame] = {}
    for name, d in solution_dirs.items():
        manifest = read_json(os.path.join(d, MANIFEST))
        if bagged_only and not manifest.get("bagged", False):
            continue
        out[name] = read_artifact(spark, os.path.join(d, split))
    if not out:
        raise FileNotFoundError(
            "no OOF artifacts matched (bagged_only=%s) in %s"
            % (bagged_only, list(solution_dirs))
        )
    return out


def check_oof_alignment(
    oof: DataFrame, source: DataFrame, key_col: str
) -> None:
    """J3 (ensembler.py:32-39): artifact and source must cover the same
    key set — anti-join emptiness both ways + count equality, raising
    on violation (the reference uses assert_series_equal on the
    position-aligned index; we assert on the explicit key)."""
    n_oof, n_src = oof.count(), source.count()
    if n_oof != n_src:
        raise ValueError(f"OOF rows {n_oof} != source rows {n_src}")
    missing = source.join(oof, on=key_col, how="left_anti").count()
    if missing:
        raise ValueError(f"{missing} source keys absent from OOF artifact")
