from fastmlframework_spark.operators import (
    imputation,
    profiling,
    screening,
    transforms,
)

__all__ = ["imputation", "profiling", "screening", "transforms"]
