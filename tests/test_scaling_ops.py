"""Unit tests for operators/scaling.py edge cases; happy-path parity
lives in test_queries_oracle.py (scale_standardize_acctbal,
scale_minmax_retailprice, bin_totalprice_deciles)."""

from __future__ import annotations

import pytest

from fastmlframework_spark.operators.scaling import (
    minmax_scale,
    quantile_bin,
    standardize,
)


def test_standardize_constant_column_yields_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "k bigint, v double"
    )
    rows = standardize(df, ["v"]).collect()
    assert all(r["v_z"] is None for r in rows)
    with pytest.raises(ValueError, match="non-empty"):
        standardize(df, [])
    with pytest.raises(ValueError, match="ddof"):
        standardize(df, ["v"], ddof=2)


def test_standardize_grouped_matches_manual(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["v"]): r["v_z"]
        for r in standardize(df, ["v"], group_cols=["g"]).collect()
    }
    # mean 2, sd sqrt(2) → ±1/sqrt(2); group b scales independently.
    assert got[("a", 1.0)] == pytest.approx(-(2 ** -0.5))
    assert got[("b", 30.0)] == pytest.approx(2 ** -0.5)


def test_minmax_bounds_and_constant(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 4.0), (3, 6.0), (4, None)], "k bigint, v double"
    )
    got = {r["k"]: r["v_mm"] for r in minmax_scale(df, ["v"]).collect()}
    assert got[1] == 0.0 and got[3] == 1.0 and got[2] == pytest.approx(0.5)
    assert got[4] is None


def test_quantile_bin_ties_deterministic_and_null_safe(spark):
    # 6× the same value straddling an edge: edge-based binning puts
    # ALL ties in the same bin (ntile would split them by row order).
    rows = [(i, 1.0) for i in range(6)] + [(6, 2.0), (7, 3.0), (8, None)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    got = {r["k"]: r["v_bin"] for r in quantile_bin(df, "v", 4).collect()}
    tie_bins = {got[i] for i in range(6)}
    assert len(tie_bins) == 1
    assert got[8] is None
    assert got[7] == max(b for b in got.values() if b is not None)
    with pytest.raises(ValueError, match="n_bins"):
        quantile_bin(df, "v", 1)


def test_quantile_bin_equal_frequency(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "k bigint, v double"
    )
    counts = (
        quantile_bin(df, "v", 10)
        .groupBy("v_bin")
        .count()
        .collect()
    )
    assert len(counts) == 10
    assert all(90 <= r["count"] <= 110 for r in counts)


# Property-based invariants (hypothesis): hold for ANY data, not just
# the oracle fixtures.
from hypothesis import assume, given, settings, strategies as st

_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=3,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(_vals)
def test_standardize_property_mean_zero_sd_one(spark, xs):
    import statistics

    if len(set(xs)) == 1:
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(xs)], "k bigint, v double"
        )
        assert all(
            r["v_z"] is None for r in standardize(df, ["v"]).collect()
        )
        return
    # Exclude near-degenerate spreads where double cancellation
    # dominates (sd within a few ulps of the magnitude) — the operator
    # is as good as float64 allows there, but the invariant check
    # itself becomes numerically meaningless.
    spread = statistics.stdev(xs)
    assume(spread > 1e-6 * max(1.0, max(abs(v) for v in xs)))
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "k bigint, v double"
    )
    zs = [r["v_z"] for r in standardize(df, ["v"]).collect()]
    assert all(z is not None for z in zs)
    mu = sum(zs) / len(zs)
    sd = (sum((z - mu) ** 2 for z in zs) / (len(zs) - 1)) ** 0.5
    assert abs(mu) < 1e-6
    assert abs(sd - 1.0) < 1e-6


@settings(max_examples=8, deadline=None)
@given(_vals, st.integers(min_value=2, max_value=8))
def test_quantile_bin_property_monotone(spark, xs, n_bins):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "k bigint, v double"
    )
    rows = quantile_bin(df, "v", n_bins).collect()
    got = sorted((r["v"], r["v_bin"]) for r in rows)
    # bins are monotone non-decreasing in v, within [0, n_bins-1]
    bins = [b for _, b in got]
    assert bins == sorted(bins)
    assert all(0 <= b <= n_bins - 1 for b in bins)
    # equal values always share a bin
    by_val = {}
    for v, b in got:
        by_val.setdefault(v, set()).add(b)
    assert all(len(s) == 1 for s in by_val.values())


def test_clip_quantiles_nulls_and_bounds(spark):
    from fastmlframework_spark.operators.scaling import clip_quantiles

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)] + [(101, None)],
        "k bigint, v double",
    )
    got = {
        r["k"]: r["v_clipped"]
        for r in clip_quantiles(df, "v", 0.1, 0.9).collect()
    }
    # Exact interpolating deciles of 1..100 are 10.9 and 90.1.
    assert got[1] == pytest.approx(10.9)
    assert got[100] == pytest.approx(90.1)
    assert got[50] == 50.0  # interior untouched
    assert got[101] is None  # NULL passes through, NOT clamped to lo
    with pytest.raises(ValueError, match="lower < upper"):
        clip_quantiles(df, "v", 0.9, 0.1)


def test_rank_transform_average_ties_and_null_passthrough(spark):
    from fastmlframework_spark.operators.scaling import rank_transform

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0), (5, None)],
        "id long, v double",
    )
    got = {r.id: r.pct_rank for r in rank_transform(df, "v").collect()}
    # ranks over 4 non-null rows: 10->1, 20/20->avg(2,3)=2.5, 40->4
    assert got[1] == 0.25
    assert got[2] == got[3] == 0.625
    assert got[4] == 1.0
    assert got[5] is None


def test_rank_transform_is_monotone_property(spark):
    """Hypothesis-style property on random values: pct_rank is
    monotone in the value, equal on ties, and spans (0, 1]."""
    from hypothesis import given, settings, strategies as st

    from fastmlframework_spark.operators.scaling import rank_transform

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=1,
            max_size=40,
        )
    )
    def _prop(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
        )
        got = {r.id: r.pct_rank for r in rank_transform(df, "v").collect()}
        for i, a in enumerate(vals):
            assert 0 < got[i] <= 1
            for j, b in enumerate(vals):
                if a < b:
                    assert got[i] < got[j]
                elif a == b:
                    assert got[i] == got[j]

    _prop()
