"""resample_gapfill semantics: dense grid, in-bucket mean, forward
fill across gaps."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from fastmlframework_spark.operators.timeseries import resample_gapfill


def test_gapfill_dense_grid_and_forward_fill(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # key 1: hours 10 (two events -> mean 2.0), 13 (one event);
        # hours 11, 12 are gaps carrying 2.0
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=30), 3.0),
        (1, t0 + dt.timedelta(hours=3), 7.0),
        # key 2: single hour, no gaps
        (2, t0 + dt.timedelta(hours=1), 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_gapfill(df, "user_id", "ts", "value")
    got = {
        (r.user_id, r.bucket.hour): (r.filled, r.is_gap)
        for r in out.collect()
    }
    assert got[(1, 10)] == (2.0, False)
    assert got[(1, 11)] == (2.0, True)
    assert got[(1, 12)] == (2.0, True)
    assert got[(1, 13)] == (7.0, False)
    assert got[(2, 11)] == (5.0, False)
    assert len(got) == 5  # grids span each key's own range only


def test_gapfill_no_gaps_roundtrip(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0 + dt.timedelta(hours=h), float(h)) for h in range(5)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_gapfill(df, "user_id", "ts", "value")
    assert out.filter(F.col("is_gap")).count() == 0
    assert out.count() == 5


def test_interpolate_linear_blend(spark):
    import datetime as dt

    from fastmlframework_spark.operators.timeseries import (
        resample_interpolate,
        resample_interpolate_exact,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # observed at hours 10 (v=1.0) and 13 (v=7.0); gaps at 11, 12
    rows = [(1, t0, 1.0), (1, t0 + dt.timedelta(hours=3), 7.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])

    out = {
        (r.bucket.hour): (r.filled, r.is_gap)
        for r in resample_interpolate(df, "user_id", "ts", "value").collect()
    }
    assert out[10] == (1.0, False)
    assert out[11] == (3.0, True)   # 1 + 1/3 * 6
    assert out[12] == (5.0, True)   # 1 + 2/3 * 6
    assert out[13] == (7.0, False)

    exact = {
        (r.bucket.hour): (r.filled_scaled, r.is_gap)
        for r in resample_interpolate_exact(
            df, "user_id", "ts", "value"
        ).collect()
    }
    assert exact[10] == (10000, False)
    assert exact[11] == (30000, True)
    assert exact[12] == (50000, True)
    assert exact[13] == (70000, False)


def test_seasonal_baseline_flags_only_its_hour(spark):
    """An outlier at hour 9 must be anomalous against the hour-9 band
    but the identical value at hour 21 (where it is typical) must
    not — the conditioning the global z-screen cannot express."""
    import datetime as dt

    import pyspark.sql.functions as F

    from fastmlframework_spark.operators.timeseries import seasonal_baseline

    rows = []
    for d in range(1, 21):
        rows.append((f"2024-01-{d:02d} 09:00:00", "m", 10.0))
        rows.append((f"2024-01-{d:02d} 21:00:00", "m", 100.0))
    rows.append(("2024-01-21 09:00:00", "m", 100.0))   # anomaly at 9h
    df = spark.createDataFrame(
        rows, "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = {r["hour"]: r for r in seasonal_baseline(df).collect()}
    assert out[9]["n_anomalies"] == 1
    assert out[21]["n_anomalies"] == 0
    assert out[9]["n_events"] == 21 and out[21]["n_events"] == 20


def test_ewma_matches_reference_and_skips_nulls(spark):
    """Bounded-lag adjust=True EWM: weights (1-a)^i over the last
    `window` observed points; NULLs compress out (ignore_na=True)."""
    import datetime as dt

    from fastmlframework_spark.operators.timeseries import ewma

    vals = [1, 2, 3, 4, 100, 4, 3]
    rows = [
        ("a", dt.datetime(2024, 1, 1, h), float(v))
        for h, v in enumerate(vals)
    ]
    rows += [
        ("b", dt.datetime(2024, 1, 1, 0), 10.0),
        ("b", dt.datetime(2024, 1, 1, 1), None),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ewma(df, alpha=0.5, window=3)
    got = {
        (r["event_type"], r["ts"].hour): r["ewma"] for r in out.collect()
    }
    # manual bounded adjust=True reference
    for t in range(len(vals)):
        lo = max(0, t - 2)
        window_vals = vals[lo: t + 1][::-1]
        wts = [0.5 ** i for i in range(len(window_vals))]
        exp = sum(v * w for v, w in zip(window_vals, wts)) / sum(wts)
        assert got[("a", t)] == round(exp, 6)
    assert got[("b", 0)] == 10.0
    assert got[("b", 1)] == 10.0   # NULL drops out of the frame


def test_cusum_reference(spark):
    """CUSUM recursion, reset-at-zero, alarm threshold, NULL drop."""
    import datetime as dt

    from fastmlframework_spark.operators.timeseries import cusum

    vals = [0, 1, 0, 1, 3, 3, 3, None, 0]
    rows = [
        (i, "a", dt.datetime(2024, 1, 1, 0, i),
         float(v) if v is not None else None)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = {r["event_id"]: r for r in cusum(df, k=0.5, h=4.0).collect()}
    # manual: s=max(0, s+x-0.5), NULL row dropped entirely
    s, exp = 0.0, {}
    for i, v in enumerate(vals):
        if v is None:
            continue
        s = max(0.0, s + v - 0.5)
        exp[i] = s
    assert set(out) == set(exp)
    for i, e in exp.items():
        assert out[i]["cusum"] == round(e, 6)
        assert out[i]["alarm"] == (e > 4.0)


def test_cusum_scan_equals_loop(spark, sf_dir_small):
    """The prefix-scan identity must reproduce the sequential CUSUM
    to 1e-9 on real event data (reassociated float arithmetic only)."""
    from fastmlframework_spark.core.tables import load_table
    from fastmlframework_spark.operators.timeseries import cusum, cusum_scan

    ev = load_table(spark, sf_dir_small, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    a = cusum(ev, k=55.0, h=200.0).withColumnRenamed("cusum", "c1")
    b = cusum_scan(ev, k=55.0, h=200.0).withColumnRenamed("cusum", "c2")
    j = a.join(b, on=["event_id", "event_type"])
    assert j.count() == a.count() == b.count()
    import pyspark.sql.functions as F

    assert j.filter(F.abs(F.col("c1") - F.col("c2")) > 1e-9).count() == 0


def test_transition_matrix_rows_normalize_and_order(spark):
    """Per-from_state probabilities sum to ~1 and transitions follow
    the (ts, event_id) order within a key, not input order."""
    from fastmlframework_spark.operators.timeseries import transition_matrix

    rows = [
        # user 1: a -> b -> a (out of input order on purpose)
        (3, "2024-01-01 00:02:00", 1, "a", 0.0, None),
        (1, "2024-01-01 00:00:00", 1, "a", 0.0, None),
        (2, "2024-01-01 00:01:00", 1, "b", 0.0, None),
        # user 2: b -> b
        (4, "2024-01-01 00:00:00", 2, "b", 0.0, None),
        (5, "2024-01-01 00:05:00", 2, "b", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.from_state, r.to_state): (r.n_transitions, r.p_transition)
        for r in transition_matrix(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_transition_matrix_probabilities_sum_to_one(spark, sf_dir_small):
    from fastmlframework_spark.core.tables import load_table
    from fastmlframework_spark.operators.timeseries import transition_matrix

    out = transition_matrix(load_table(spark, sf_dir_small, "events"))
    sums = (
        out.groupBy("from_state")
        .agg(F.sum("p_transition").alias("s"))
        .collect()
    )
    assert sums and all(abs(r.s - 1.0) < 1e-4 for r in sums)


def test_holt_smoothing_constant_and_ramp(spark):
    """A constant series smooths to (level=c, trend=0); a linear ramp's
    trend converges toward the slope and the forecast leads the level."""
    from fastmlframework_spark.operators.timeseries import holt_smoothing

    rows = [(i, "2024-01-01 00:%02d:00" % i, 1, "c", 5.0) for i in range(8)]
    rows += [(100 + i, "2024-01-01 01:%02d:00" % i, 2, "r", float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = holt_smoothing(
        df, key_col="user_id", ts_col="ts", val_col="value",
        alpha=0.4, beta=0.3, window=10, tiebreak_col="event_id",
    )
    const = out.filter(F.col("user_id") == 1).orderBy("ts").collect()
    assert all(r.level == 5.0 and r.trend == 0.0 and r.forecast == 5.0 for r in const)
    ramp = out.filter(F.col("user_id") == 2).orderBy("ts").collect()
    assert abs(ramp[-1].trend - 1.0) < 0.35  # converging toward slope 1
    assert ramp[-1].forecast > ramp[-1].level
