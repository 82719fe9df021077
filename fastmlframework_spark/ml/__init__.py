from fastmlframework_spark.ml import folds, metrics

__all__ = ["folds", "metrics"]
