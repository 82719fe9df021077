"""Visualization layer (SURVEY.md §2.1 S7, data_vis/visualization.py).

Aggregation runs IN SPARK (the same A5/A15/A17/A22 operators the query
registry exposes); only the tiny aggregated result is collected and
drawn.  matplotlib is optional in this environment — rendering is
gated behind an import-try and raises a clear error when absent, while
every data-preparation function remains fully usable and tested."""

from fastmlframework_spark.data_vis.plots import (  # noqa: F401
    HAVE_MATPLOTLIB,
    prepare_confusion,
    prepare_correlation_heatmap,
    prepare_cv_scores,
    prepare_feature_histogram,
    prepare_feature_train_vs_test,
    prepare_feature_vs_target,
    prepare_importance_topk,
    prepare_missing_values,
    prepare_target_crosstab,
    save_figure,
)
