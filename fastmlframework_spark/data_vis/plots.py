"""S7 PNG figure sink + the reference's plot-prep aggregations.

Reference parity (file:line in /root/reference):

* Binned feature histogram per target class —
  data_vis/visualization.py:105-147 (bin edges via
  generic_tools/utils.py:103-119, left-closed ``right=False``).
* Normalized crosstab feature×target — visualization.py:188-213.
* PNG sink — modeling/prediction.py:602-605/:651-654,
  modeling/feature_selection.py:387-392 (savefig on driver).

The aggregations are Spark jobs (Bucketizer + groupBy / crosstab);
only their few-hundred-row results reach the driver for drawing.
matplotlib is not installed in this container, so ``save_figure``
raises ``RuntimeError`` unless it is importable — the data side is
fully functional either way.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as _T

from fastmlframework_spark.operators import profiling

_NUMERIC_TYPES = (
    _T.ByteType,
    _T.ShortType,
    _T.IntegerType,
    _T.LongType,
    _T.FloatType,
    _T.DoubleType,
    _T.DecimalType,
)

try:  # pragma: no cover - environment-dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MATPLOTLIB = True
except ModuleNotFoundError:
    plt = None
    HAVE_MATPLOTLIB = False


def prepare_feature_histogram(
    df: DataFrame,
    feature: str,
    target: str | None = None,
    n_bins: int = 20,
) -> DataFrame:
    """A17: left-closed equal-width bins (pd.cut right=False) counted
    per (bin, target-class) → [bin_start, bin_end, (target,) n]."""
    lo, hi = df.agg(F.min(feature), F.max(feature)).first()
    if lo is None:
        raise ValueError(f"{feature}: all-null column")
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / n_bins or 1.0
    binned = df.filter(F.col(feature).isNotNull()).withColumn(
        "__bin",
        F.least(
            F.floor((F.col(feature) - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ).cast("int"),
    )
    keys = ["__bin"] + ([target] if target else [])
    return (
        binned.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_start", F.round(F.lit(lo) + F.col("__bin") * width, 6))
        .withColumn(
            "bin_end", F.round(F.lit(lo) + (F.col("__bin") + 1) * width, 6)
        )
        .select("bin_start", "bin_end", *([target] if target else []), "n")
        .orderBy("bin_start", *([target] if target else []))
    )


def prepare_target_crosstab(
    df: DataFrame, feature: str, target: str
) -> DataFrame:
    """A15: row-normalized crosstab (pd.crosstab normalize='index') →
    [feature_value, target_value, share]."""
    counts = df.groupBy(feature, target).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy(feature)
    return counts.select(
        F.col(feature).alias("feature_value"),
        F.col(target).alias("target_value"),
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    )


def prepare_correlation_heatmap(
    df: DataFrame, cols: Sequence[str] | None = None, decimals: int = 6
) -> DataFrame:
    """Correlation-heatmap prep (visualization.py:30-49
    plot_features_corr_heatmap): FULL symmetric matrix in long form →
    [col_x, col_y, corr] including mirror and unit diagonal, ready for
    a driver-side heatmap.  All n(n-1)/2 correlations share one scan
    (correlation_pairs); the mirror/diagonal are driver-free unions of
    that single aggregate."""
    from pyspark.sql import types as T

    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, _NUMERIC_TYPES)
        ]
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two numeric columns")
    upper = profiling.correlation_pairs(df, cols, decimals)
    # Mirror each pair IN-PLAN (explode of a 2-struct array) so the
    # expensive all-pairs aggregate runs once; a separate
    # upper.union(mirror-of-upper) would fork the DAG and execute the
    # full scan+aggregate twice.
    both = upper.select(
        F.explode(
            F.array(
                F.struct("col_x", "col_y", "corr"),
                F.struct(
                    F.col("col_y").alias("col_x"),
                    F.col("col_x").alias("col_y"),
                    F.col("corr"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    spark = df.sparkSession
    diag = spark.createDataFrame(
        [(c, c, 1.0) for c in cols],
        T.StructType(
            [
                T.StructField("col_x", T.StringType()),
                T.StructField("col_y", T.StringType()),
                T.StructField("corr", T.DoubleType()),
            ]
        ),
    )
    return both.unionByName(diag)


def prepare_missing_values(df: DataFrame, target_column: str) -> DataFrame:
    """Missing-data plot prep (visualization.py:57-80
    plot_missing_values_stats): split the concatenated frame on target
    null-ness (P3), per-split per-feature missing pct, features with
    missing values only → [split, column, n_missing, pct_missing]."""
    train = df.filter(F.col(target_column).isNotNull())
    test = df.filter(F.col(target_column).isNull()).drop(target_column)
    out_train = profiling.missing_stats(train).withColumn(
        "split", F.lit("train")
    )
    out_test = profiling.missing_stats(test).withColumn("split", F.lit("test"))
    return (
        out_train.unionByName(out_test)
        .filter(F.col("n_missing") > 0)
        .select("split", "column", "n_missing", "pct_missing")
    )


def prepare_feature_vs_target(
    df: DataFrame,
    feature: str,
    target: str,
    val_min: float | None = None,
    val_max: float | None = None,
    bin_size: float | None = None,
    n_bins: int = 20,
) -> DataFrame:
    """Binned numerical feature VS target classes (visualization.py:
    100-126 plot_numerical_feature_vs_target): train rows only (target
    not null), left-closed pd.cut(right=False) bins, out-of-range rows
    dropped (pd.cut semantics, NOT clamped) →
    [bin_start, bin_end, target_value, n]."""
    train = df.filter(F.col(target).isNotNull())
    if val_min is None or val_max is None:
        lo, hi = train.agg(F.min(feature), F.max(feature)).first()
        val_min = float(lo) if val_min is None else val_min
        val_max = float(hi) if val_max is None else val_max
    if not val_min < val_max:
        raise ValueError("val_max should be larger than val_min")
    width = bin_size if bin_size is not None else (val_max - val_min) / n_bins
    binned = (
        train.filter(
            (F.col(feature) >= val_min) & (F.col(feature) < val_max)
        )
        .withColumn(
            "__bin",
            F.floor((F.col(feature) - F.lit(val_min)) / F.lit(width)).cast("int"),
        )
        .groupBy("__bin", target)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return binned.select(
        F.round(F.lit(val_min) + F.col("__bin") * width, 6).alias("bin_start"),
        F.round(F.lit(val_min) + (F.col("__bin") + 1) * width, 6).alias("bin_end"),
        F.col(target).alias("target_value"),
        "n",
    )


def prepare_feature_train_vs_test(
    df: DataFrame,
    target: str,
    feature: str,
    val_min: float | None = None,
    val_max: float | None = None,
    bin_size: float | None = None,
    n_bins: int = 20,
) -> DataFrame:
    """Train-vs-test distribution of a binned feature
    (visualization.py:129-183 plot_numerical_feature_train_vs_test):
    the same bin grid applied to both splits →
    [bin_start, bin_end, split, n]."""
    if val_min is None or val_max is None:
        lo, hi = df.agg(F.min(feature), F.max(feature)).first()
        val_min = float(lo) if val_min is None else val_min
        val_max = float(hi) if val_max is None else val_max
    if not val_min < val_max:
        raise ValueError("val_max should be larger than val_min")
    width = bin_size if bin_size is not None else (val_max - val_min) / n_bins
    split = F.when(F.col(target).isNotNull(), "train").otherwise("test")
    return (
        df.filter((F.col(feature) >= val_min) & (F.col(feature) < val_max))
        .withColumn("split", split)
        .withColumn(
            "__bin",
            F.floor((F.col(feature) - F.lit(val_min)) / F.lit(width)).cast("int"),
        )
        .groupBy("__bin", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.round(F.lit(val_min) + F.col("__bin") * width, 6).alias("bin_start"),
            F.round(F.lit(val_min) + (F.col("__bin") + 1) * width, 6).alias("bin_end"),
            "split",
            "n",
        )
    )


def prepare_importance_topk(
    importance: DataFrame, n_features: int = 20
) -> DataFrame:
    """Feature-importance plot prep (prediction.py:625-654
    plot_features_importance): top-n features by MEAN importance over
    folds/seeds, then every per-fold row of those features so the
    renderer can draw bar + spread → [feature, importance, fold,
    mean_importance].  The tiny top-n set broadcasts back against the
    per-fold rows (no second shuffle of the big side)."""
    mean_imp = (
        importance.groupBy("feature")
        .agg(F.mean("importance").alias("mean_importance"))
        .orderBy(F.desc("mean_importance"))
        .limit(n_features)
    )
    return importance.join(F.broadcast(mean_imp), on="feature").select(
        "feature", "importance", "fold", "mean_importance"
    )


def prepare_confusion(
    df: DataFrame, true_col: str, pred_col: str, normalize: bool = True
) -> DataFrame:
    """Confusion-matrix plot prep (prediction.py:527-605
    plot_confusion_matrix): [true_label, pred_label, n, share] with
    share row-normalized over the true label (cm / cm.sum(axis=1))."""
    counts = df.groupBy(true_col, pred_col).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy(true_col)
    return counts.select(
        F.col(true_col).alias("true_label"),
        F.col(pred_col).alias("pred_label"),
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    )


def prepare_cv_scores(cv_results: DataFrame) -> DataFrame:
    """CV-results plot prep (prediction.py:602-605): per-seed rows
    ordered for the score-vs-seed chart; pass-through of the (tiny)
    CV table with a stable ordering."""
    order = [c for c in ("seed", "fold") if c in cv_results.columns]
    return cv_results.orderBy(*order) if order else cv_results


def save_figure(prepared: DataFrame, kind: str, path: str, **kwargs) -> str:
    """S7: draw the (small, already-aggregated) DataFrame and savefig.
    ``kind``: 'histogram' (bar per bin) | 'crosstab' (stacked shares) |
    'heatmap' (corr matrix) | 'missing' (pct bars per split) |
    'stacked_bins' (feature-vs-target / train-vs-test) |
    'confusion' (matrix image) | 'importance' (top-k bars)."""
    if not HAVE_MATPLOTLIB:  # pragma: no cover
        raise RuntimeError(
            "matplotlib is not installed; install it to render figures "
            "(the Spark-side aggregations work without it)"
        )
    rows = prepared.collect()  # pragma: no cover
    fig, ax = plt.subplots(figsize=kwargs.get("figsize", (8, 5)))
    if kind == "histogram":
        ax.bar(
            [r["bin_start"] for r in rows],
            [r["n"] for r in rows],
            width=[r["bin_end"] - r["bin_start"] for r in rows],
            align="edge",
        )
    elif kind == "crosstab":
        for tv in sorted({r["target_value"] for r in rows}):
            sub = [r for r in rows if r["target_value"] == tv]
            ax.bar(
                [str(r["feature_value"]) for r in sub],
                [r["share"] for r in sub],
                label=str(tv),
            )
        ax.legend()
    elif kind == "heatmap":
        names = sorted({r["col_x"] for r in rows})
        idx = {c: i for i, c in enumerate(names)}
        import numpy as np

        mat = np.full((len(names), len(names)), np.nan)
        for r in rows:
            mat[idx[r["col_x"]], idx[r["col_y"]]] = r["corr"]
        im = ax.imshow(mat, vmin=-1, vmax=1, cmap="coolwarm")
        ax.set_xticks(range(len(names)), names, rotation=90)
        ax.set_yticks(range(len(names)), names)
        fig.colorbar(im, ax=ax)
    elif kind == "missing":
        for split in sorted({r["split"] for r in rows}):
            sub = [r for r in rows if r["split"] == split]
            ax.barh(
                [f'{r["column"]} ({split})' for r in sub],
                [r["pct_missing"] for r in sub],
                label=split,
            )
        ax.legend()
    elif kind == "stacked_bins":
        series_key = "target_value" if rows and "target_value" in rows[0] else "split"
        bottoms: dict = {}
        for sv in sorted({str(r[series_key]) for r in rows}):
            sub = sorted(
                (r for r in rows if str(r[series_key]) == sv),
                key=lambda r: r["bin_start"],
            )
            xs = [r["bin_start"] for r in sub]
            hs = [r["n"] for r in sub]
            bs = [bottoms.get(x, 0) for x in xs]
            ax.bar(
                xs,
                hs,
                width=[r["bin_end"] - r["bin_start"] for r in sub],
                bottom=bs,
                align="edge",
                label=sv,
            )
            for x, h in zip(xs, hs):
                bottoms[x] = bottoms.get(x, 0) + h
        ax.legend()
    elif kind == "confusion":
        labels = sorted({str(r["true_label"]) for r in rows} | {str(r["pred_label"]) for r in rows})
        idx = {c: i for i, c in enumerate(labels)}
        import numpy as np

        mat = np.zeros((len(labels), len(labels)))
        for r in rows:
            mat[idx[str(r["true_label"])], idx[str(r["pred_label"])]] = r["share"]
        im = ax.imshow(mat, cmap="Blues")
        ax.set_xticks(range(len(labels)), labels)
        ax.set_yticks(range(len(labels)), labels)
        ax.set_xlabel("Predicted label")
        ax.set_ylabel("True label")
        fig.colorbar(im, ax=ax)
    elif kind == "importance":
        agg: dict = {}
        for r in rows:
            agg.setdefault(r["feature"], r["mean_importance"])
        feats = sorted(agg, key=agg.get, reverse=True)
        ax.barh(feats[::-1], [agg[f] for f in feats[::-1]])
        ax.set_xlabel("importance (avg over folds/seeds)")
    else:
        raise ValueError(f"unknown kind {kind!r}")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
