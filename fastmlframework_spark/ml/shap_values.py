"""M11: mean-|SHAP| per feature per fold (SURVEY.md §2.9).

Reference: modeling/prediction.py:256-286 — TreeExplainer over each
fold's validation slice, ``np.mean(np.abs(shap_values), axis=0)``
(+ the multiclass list case summed over classes).

SHAP is a heavy optional dependency excluded from this environment
and from the oracle contract (SURVEY §7.4(8)).  The Spark plumbing is
real and tested: the validation slice streams through ``mapInPandas``
in Arrow batches (no driver materialization), each batch's |SHAP|
sums/counts are partial-aggregated executor-side, and the final
per-feature means are one small groupBy.  The explainer itself is an
injectable callable — ``shap.TreeExplainer(model).shap_values`` when
shap is installed, anything batch→matrix shaped in tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - environment-dependent
    import shap  # type: ignore

    HAVE_SHAP = True
except ModuleNotFoundError:
    shap = None
    HAVE_SHAP = False

_PARTIAL_SCHEMA = StructType(
    [
        StructField("feature", StringType()),
        StructField("abs_sum", DoubleType()),
        StructField("n", LongType()),
    ]
)


def default_explainer(model) -> Callable:
    """shap.TreeExplainer-backed batch explainer (requires shap)."""
    if not HAVE_SHAP:  # pragma: no cover
        raise RuntimeError(
            "shap is not installed; pass an explicit `explain` callable "
            "or install shap to use the default TreeExplainer"
        )
    explainer = shap.TreeExplainer(model)  # pragma: no cover

    def explain(batch):  # pragma: no cover
        import numpy as np

        vals = explainer.shap_values(batch)
        # multiclass → list of per-class matrices; sum |.| over classes
        if isinstance(vals, list):
            return sum(np.abs(v) for v in vals)
        return np.abs(vals)

    return explain  # pragma: no cover


def mean_abs_shap(
    df: DataFrame,
    feature_cols: Sequence[str],
    explain: Callable,
    fold_col: str | None = None,
) -> DataFrame:
    """→ [feature, (fold,) mean_abs_shap].

    ``explain(features_pdf) -> (rows × features) matrix of |SHAP|``
    runs per Arrow batch inside ``mapInPandas``; only per-feature
    partial (sum, count) rows leave the executors.
    """
    import numpy as np
    import pandas as pd

    feats = list(feature_cols)
    schema = _PARTIAL_SCHEMA
    group_extra = []
    if fold_col:
        schema = StructType(
            [StructField(fold_col, LongType())] + list(_PARTIAL_SCHEMA)
        )
        group_extra = [fold_col]

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            if fold_col:
                for fold, sub in pdf.groupby(fold_col):
                    mat = np.abs(np.asarray(explain(sub[feats])))
                    yield pd.DataFrame(
                        {
                            fold_col: int(fold),
                            "feature": feats,
                            "abs_sum": mat.sum(axis=0).astype(float),
                            "n": len(sub),
                        }
                    )
            else:
                mat = np.abs(np.asarray(explain(pdf[feats])))
                yield pd.DataFrame(
                    {
                        "feature": feats,
                        "abs_sum": mat.sum(axis=0).astype(float),
                        "n": len(pdf),
                    }
                )

    cols = feats + ([fold_col] if fold_col else [])
    partial = df.select(*cols).mapInPandas(partials, schema)
    return (
        partial.groupBy(*group_extra, "feature")
        .agg(
            (F.sum("abs_sum") / F.sum("n")).alias("mean_abs_shap")
        )
        .withColumn("mean_abs_shap", F.round("mean_abs_shap", 6))
    )
