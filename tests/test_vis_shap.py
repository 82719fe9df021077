"""data_vis prep aggregations (S7/A15/A17) + gated SHAP plumbing (M11)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.data_vis import (
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


def test_corr_heatmap_full_matrix(spark, sf_dir_small):
    li = load_table(spark, sf_dir_small, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    m = prepare_correlation_heatmap(li, cols)
    rows = {(r.col_x, r.col_y): r.corr for r in m.collect()}
    assert len(rows) == 9  # 3x3 full matrix
    for c in cols:
        assert rows[(c, c)] == 1.0
    for a in cols:
        for b in cols:
            assert rows[(a, b)] == rows[(b, a)]  # symmetric
    # auto-detection picks numeric columns only
    auto = prepare_correlation_heatmap(li.select("l_quantity", "l_tax", "l_returnflag"))
    assert {r.col_x for r in auto.collect()} == {"l_quantity", "l_tax"}


def test_missing_values_prep_splits(spark):
    df = spark.createDataFrame(
        [(1.0, None, "a"), (2.0, 5.0, None), (None, 6.0, "c"), (None, None, "d")],
        "target double, f1 double, f2 string",
    )
    out = prepare_missing_values(df, "target").collect()
    got = {(r.split, r.column): (r.n_missing, r.pct_missing) for r in out}
    # train rows (target notnull): one f1 null of 2 rows; test rows: one f1 null of 2
    assert got[("train", "f1")] == (1, 50.0)
    assert got[("test", "f1")] == (1, 50.0)
    assert ("train", "target") not in got  # target never counted as missing in train
    assert ("test", "target") not in got   # dropped for the test split


def test_feature_vs_target_bins_drop_out_of_range(spark):
    df = spark.createDataFrame(
        [(0.0, "a"), (5.0, "a"), (15.0, "b"), (25.0, "a"), (99.0, "b"), (3.0, None)],
        "x double, y string",
    )
    out = prepare_feature_vs_target(
        df, "x", "y", val_min=0.0, val_max=30.0, bin_size=10.0
    )
    rows = {(r.bin_start, r.target_value): r.n for r in out.collect()}
    # 99.0 out of range (pd.cut drops), null-target row excluded
    assert rows == {(0.0, "a"): 2, (10.0, "b"): 1, (20.0, "a"): 1}


def test_feature_train_vs_test_same_grid(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 15.0), (None, 5.5), (None, 25.0)],
        "target double, x double",
    )
    out = prepare_feature_train_vs_test(
        df, "target", "x", val_min=0.0, val_max=30.0, bin_size=10.0
    )
    rows = {(r.bin_start, r.split): r.n for r in out.collect()}
    assert rows == {(0.0, "train"): 1, (10.0, "train"): 1, (0.0, "test"): 1, (20.0, "test"): 1}


def test_importance_topk_keeps_fold_rows(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 0), ("a", 12.0, 1), ("b", 1.0, 0), ("b", 2.0, 1),
         ("c", 5.0, 0), ("c", 7.0, 1)],
        "feature string, importance double, fold int",
    )
    out = prepare_importance_topk(df, n_features=2).collect()
    feats = {r.feature for r in out}
    assert feats == {"a", "c"}  # top-2 by mean
    assert len(out) == 4  # every per-fold row of the top features kept
    means = {r.feature: r.mean_importance for r in out}
    assert means["a"] == 11.0 and means["c"] == 6.0


def test_confusion_prep_row_normalized(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("x", "y"), ("y", "y")], "t string, p string"
    )
    out = {(r.true_label, r.pred_label): (r.n, r.share)
           for r in prepare_confusion(df, "t", "p").collect()}
    assert out[("x", "x")] == (2, 0.666667)
    assert out[("x", "y")] == (1, 0.333333)
    assert out[("y", "y")] == (1, 1.0)


def test_cv_scores_prep_orders(spark):
    df = spark.createDataFrame(
        [(2, 0.9), (1, 0.8)], "seed int, cv_mean_score double"
    )
    rows = prepare_cv_scores(df).collect()
    assert [r.seed for r in rows] == [1, 2]


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
