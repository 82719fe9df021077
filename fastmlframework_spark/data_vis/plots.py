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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

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


def save_figure(prepared: DataFrame, kind: str, path: str, **kwargs) -> str:
    """S7: draw the (small, already-aggregated) DataFrame and savefig.
    ``kind``: 'histogram' (bar per bin) | 'crosstab' (stacked shares)."""
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
    else:
        raise ValueError(f"unknown kind {kind!r}")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
