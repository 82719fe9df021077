#!/usr/bin/env python
"""Skew-stress bench (VERDICT r7 #5): one deliberately Zipfian-skewed
join+aggregate workload timed three ways —

  plain_no_aqe   straight SMJ + groupBy with AQE off: the hot key's
                 partition lands on ONE reducer (the 100 TB straggler)
  aqe_skew       same plan with AQE skew-join splitting enabled (tuned
                 thresholds for local data sizes); asserts the final
                 adaptive plan actually marks the SMJ ``skew=true``
  salted         operators/skew.py salted_join + salted_groupby with
                 AQE off: the engine's own mitigation, exact semantics

The fact side is events replicated ×REP with a derived user key where
``HOT_FRAC`` of rows collapse onto ONE user — the classic Zipf head.
The fact is round-robin repartitioned first so the shuffle has many
mappers: AQE can only split a skewed reduce partition along mapper
boundaries, so a single-file scan (1 mapper) is structurally
unsplittable — the same reason a production job reading one giant
unsplittable file can't be rescued by AQE either.

All three variants must produce IDENTICAL results (checked by sorted
collect).  Writes BENCH_SKEW.json and prints the one-line summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F

from fastmlframework_spark.core.session import get_spark
from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.operators.skew import salted_groupby, salted_join

REP = 10  # fact-side replication factor
HOT_FRAC = 7  # 7/10 of rows hit the hot key
N_DIM = 100_000

_AQE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local[32] data sizes are far below the 256 MB production default;
    # scale the thresholds down so the optimization is exercised here
    # exactly as it would be at 100 TB with the defaults.
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def _fact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    rep = ev.withColumn(
        "__r", F.explode(F.sequence(F.lit(1), F.lit(REP)))
    )
    uid = (
        F.when(
            F.pmod(F.xxhash64("event_id", "__r"), F.lit(10)) < HOT_FRAC,
            F.lit(1),
        )
        .otherwise(F.pmod(F.xxhash64("event_id", "__r"), F.lit(N_DIM)))
        .cast("long")
    )
    # Round-robin repartition → many mappers feeding the join shuffle,
    # so AQE's skew splitter has boundaries to split along.
    return rep.select(uid.alias("uid"), "value").repartition(64)


def _dim(spark):
    return spark.range(0, N_DIM).select(
        F.col("id").alias("uid"),
        F.pmod(F.col("id"), F.lit(7)).alias("cohort"),
    )


def _plain(fact, dim):
    return (
        fact.join(dim, on="uid")
        .groupBy("cohort")
        .agg(
            F.round(F.sum("value"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _salted(fact, dim):
    joined = salted_join(fact, dim, on=["uid"], n_salts=16)
    out = salted_groupby(
        joined,
        keys=["cohort"],
        aggs=[("value", "sum", "revenue"), ("value", "count", "n_rows")],
        n_salts=16,
    )
    return out.select(
        "cohort", F.round("revenue", 2).alias("revenue"), "n_rows"
    )


def _set_confs(spark, aqe: bool) -> None:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    for k, v in _AQE_CONFS.items():
        spark.conf.set(k, v if aqe else "false" if v == "true" else v)
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())


def _timed(df) -> tuple[float, list]:
    t0 = time.perf_counter()
    rows = sorted(tuple(r) for r in df.collect())
    return round(time.perf_counter() - t0, 4), rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bench-skew",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = _fact(spark, sf_dir), _dim(spark)
    fact.count()  # warm the scan

    results: dict[str, dict] = {}

    _set_confs(spark, aqe=False)
    sec, base_rows = _timed(_plain(fact, dim))
    results["plain_no_aqe"] = {"sec": sec}

    _set_confs(spark, aqe=True)
    df_aqe = _plain(fact, dim)
    sec, aqe_rows = _timed(df_aqe)
    plan = df_aqe._jdf.queryExecution().executedPlan().toString()
    n_skew = plan.count("skew=true")
    results["aqe_skew"] = {"sec": sec, "skew_markers": n_skew}
    if n_skew == 0:
        print("bench_skew: AQE skew split did NOT fire", file=sys.stderr)

    _set_confs(spark, aqe=False)
    sec, salted_rows = _timed(_salted(fact, dim))
    results["salted"] = {"sec": sec}

    assert aqe_rows == base_rows, "AQE variant changed results"
    assert salted_rows == base_rows, "salted variant changed results"

    out = {
        "metric": "skew_join_sec",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "workload": {
            "fact_rows": REP * load_table(spark, sf_dir, "events").count(),
            "hot_key_share": HOT_FRAC / 10,
            "dim_rows": N_DIM,
        },
        "variants": results,
        "results_identical": True,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_SKEW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


def final_plan_skew_markers(spark, sf_dir: str) -> int:
    """Test hook: run the AQE variant once and return the number of
    ``skew=true`` markers in the FINAL adaptive plan (pytest pins > 0).
    Saves and restores every session conf it touches — the pytest
    session is shared, and a leaked autoBroadcastJoinThreshold=-1
    would silently de-broadcast every later plan test."""
    touched = list(_AQE_CONFS) + [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
    ]
    saved = {}
    for k in touched:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        _set_confs(spark, aqe=True)
        fact, dim = _fact(spark, sf_dir), _dim(spark)
        df = _plain(fact, dim)
        df.collect()
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("skew=true")
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
