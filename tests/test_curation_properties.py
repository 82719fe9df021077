"""Hypothesis property tests for the curation/time-series operators:
conservation laws and reference-implementation equivalence on random
inputs (SURVEY.md §5 — property-based where the reference had no
tests)."""

from __future__ import annotations

import pytest

# Default-deselected (VERDICT r13 #5: the suite outgrew the driver's
# pytest budget): hypothesis property sweep - run with `-m slow`.
pytestmark = pytest.mark.slow

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from fastmlframework_spark.extensions.curation import (
    global_rank,
    pack_streams,
)
from fastmlframework_spark.functions.weighted import weighted_quantile
from fastmlframework_spark.operators.timeseries import (
    resample_interpolate_exact,
)

_SETTINGS = dict(max_examples=8, deadline=None)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40)
)
def test_pack_streams_conserves_tokens(spark, token_counts):
    """Sum of pack_tokens over all packs == sum of per-doc tokens
    (no doc lost or double-packed), for any token distribution."""
    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_streams(df, ctx=64, shards=3)
    total = packed.agg(F.sum("n_tokens")).first()[0] or 0
    assert total == sum(token_counts)
    assert packed.count() == len(token_counts)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_quantile_matches_reference(spark, pairs):
    """Lower weighted median equals the brute-force definition: the
    smallest value whose cumulative weight reaches half the total."""
    df = spark.createDataFrame(
        [(1, float(v), int(w)) for v, w in pairs], ["g", "v", "w"]
    )
    got = weighted_quantile(df, ["g"], "v", "w", q=0.5).first().wq

    items = sorted((float(v), int(w)) for v, w in pairs)
    total = sum(w for _, w in items)
    cum = 0
    expected = None
    seen: dict[float, int] = {}
    for v, w in items:
        seen[v] = seen.get(v, 0) + w
    for v in sorted(seen):
        cum += seen[v]
        if cum >= 0.5 * total:
            expected = v
            break
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    )
)
def test_global_rank_is_permutation_of_any_input(spark, keys):
    keys = list(set(keys))
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    ranked = global_rank(
        df.withColumn("h", F.md5(F.col("k").cast("string"))),
        order_cols=["h", "k"],
        keep_cols=["k"],
    )
    rows = ranked.collect()
    assert sorted(r.rank for r in rows) == list(range(1, len(keys) + 1))
    assert sorted(r.k for r in rows) == sorted(keys)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=20000),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_interpolate_exact_matches_python_reference(spark, obs):
    """Integer-exact interpolation equals a pure-python re-derivation
    on random (hour, value_cents) observations."""
    t0 = dt.datetime(2024, 1, 1)
    by_hour: dict[int, list[int]] = {}
    for h, cents in obs:
        by_hour.setdefault(h, []).append(cents)
    rows = [
        (1, t0 + dt.timedelta(hours=h, minutes=i), c / 100.0)
        for h, cs in by_hour.items()
        for i, c in enumerate(cs)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        int((r.bucket - t0).total_seconds() // 3600): r.filled_scaled
        for r in resample_interpolate_exact(
            df, "user_id", "ts", "value"
        ).collect()
    }

    hours = sorted(by_hour)
    lo, hi = hours[0], hours[-1]
    sums = {h: (sum(cs), len(cs)) for h, cs in by_hour.items()}
    for h in range(lo, hi + 1):
        if h in sums:
            s, n = sums[h]
            expected = (s * 100) // n
        else:
            p = max(x for x in hours if x < h)
            nx = min(x for x in hours if x > h)
            ps, pn = sums[p]
            ns, nn = sums[nx]
            num = ((nx - h) * 3600 * ps * nn + (h - p) * 3600 * ns * pn) * 100
            den = pn * nn * (nx - p) * 3600
            expected = num // den
        assert got[h] == expected, (h, got[h], expected)
