from fastmlframework_spark.ml import cv, features, folds, metrics, wrappers

__all__ = ["cv", "features", "folds", "metrics", "wrappers"]
