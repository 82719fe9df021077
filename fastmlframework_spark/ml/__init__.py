from fastmlframework_spark.ml import (
    cv,
    ensembling,
    feature_selection,
    features,
    folds,
    hpo,
    metrics,
    wrappers,
)

__all__ = [
    "cv",
    "ensembling",
    "feature_selection",
    "features",
    "folds",
    "hpo",
    "metrics",
    "wrappers",
]
