"""data_vis prep aggregations (S7/A15/A17) + gated SHAP plumbing (M11)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.data_vis import (
    HAVE_MATPLOTLIB,
    prepare_feature_histogram,
    prepare_target_crosstab,
    save_figure,
)
from fastmlframework_spark.ml.shap_values import HAVE_SHAP, mean_abs_shap


def test_histogram_prep_counts_all_rows(spark, sf_dir_small):
    li = load_table(spark, sf_dir_small, "lineitem")
    hist = prepare_feature_histogram(li, "l_quantity", n_bins=10)
    assert hist.count() <= 10
    total = hist.agg(F.sum("n")).first()[0]
    assert total == li.filter(F.col("l_quantity").isNotNull()).count()
    # left-closed bins: starts strictly increasing, widths equal
    rows = hist.orderBy("bin_start").collect()
    widths = {round(r.bin_end - r.bin_start, 4) for r in rows}
    assert len(widths) == 1


def test_histogram_prep_by_target(spark, sf_dir_small):
    li = load_table(spark, sf_dir_small, "lineitem")
    hist = prepare_feature_histogram(li, "l_quantity", target="l_returnflag")
    assert hist.columns == ["bin_start", "bin_end", "l_returnflag", "n"]
    assert hist.agg(F.sum("n")).first()[0] == li.count()


def test_crosstab_prep_shares_sum_to_one(spark, sf_dir_small):
    o = load_table(spark, sf_dir_small, "orders")
    ct = prepare_target_crosstab(o, "o_orderpriority", "o_orderstatus")
    sums = (
        ct.groupBy("feature_value")
        .agg(F.round(F.sum("share"), 4).alias("s"))
        .collect()
    )
    assert all(abs(r.s - 1.0) < 1e-3 for r in sums)


def test_save_figure_gated(spark, sf_dir_small, tmp_path):
    li = load_table(spark, sf_dir_small, "lineitem")
    hist = prepare_feature_histogram(li, "l_quantity", n_bins=5)
    if HAVE_MATPLOTLIB:  # pragma: no cover - not in this container
        out = save_figure(hist, "histogram", str(tmp_path / "h.png"))
        import os

        assert os.path.getsize(out) > 0
    else:
        with pytest.raises(RuntimeError, match="matplotlib"):
            save_figure(hist, "histogram", str(tmp_path / "h.png"))


def test_mean_abs_shap_plumbing(spark, sf_dir_small):
    """Injected linear explainer: |SHAP| == |w_j * x_ij|, so the Spark
    pipeline's mean-|SHAP| must equal the closed-form column means."""
    li = load_table(spark, sf_dir_small, "lineitem").select(
        F.col("l_quantity").cast("double").alias("f1"),
        F.col("l_discount").cast("double").alias("f2"),
        (F.col("l_linenumber") % 3).cast("long").alias("fold"),
    )

    def explain(batch):
        import numpy as np

        return np.abs(batch[["f1", "f2"]].to_numpy() * np.array([2.0, -10.0]))

    got = {
        r.feature: r.mean_abs_shap
        for r in mean_abs_shap(li, ["f1", "f2"], explain).collect()
    }
    exp = li.agg(
        F.round(F.avg(F.abs(F.col("f1") * 2.0)), 6).alias("f1"),
        F.round(F.avg(F.abs(F.col("f2") * -10.0)), 6).alias("f2"),
    ).first()
    assert abs(got["f1"] - exp.f1) < 1e-4
    assert abs(got["f2"] - exp.f2) < 1e-4

    # per-fold variant covers the grouped path
    per_fold = mean_abs_shap(li, ["f1", "f2"], explain, fold_col="fold")
    assert per_fold.count() == 6  # 3 folds × 2 features
    assert not HAVE_SHAP or True
