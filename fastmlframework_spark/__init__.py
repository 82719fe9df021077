"""fastmlframework_spark — a PySpark-native analytics/ML-dataflow engine.

A from-scratch, Spark-idiomatic rebuild of the capabilities of
``sergii1989/FastMLFramework`` (see SURVEY.md): tabular ingestion and
profiling, preprocessing (imputation, encoding, skew transforms),
deterministic cross-validation with out-of-fold prediction, model
wrappers over MLlib, feature selection by target permutation,
hyper-parameter optimization, stacking/blending ensembles — plus
large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns, streaming windows).

Everything is expressed through the DataFrame API so Catalyst handles
optimization; no RDDs, no driver-side row loops, no positional
alignment (reference rows are aligned by position — SURVEY.md §1.4 —
here every alignment is an explicit key equi-join).
"""

__version__ = "0.1.0"
