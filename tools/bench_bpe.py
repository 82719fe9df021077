#!/usr/bin/env python
"""Realistic-tokenizer BPE fit timing (VERDICT r7 #2, ADVICE r8 fix).

The registry's ``text_bpe_train`` demo runs 10 merge rounds; a real
tokenizer fit is tens of thousands.  This tool times the driver-local
fast path (production shape: corpus reduced to its Heaps-bounded
word-type table distributedly, merge loop in-process) next to the
distributed per-round-Spark-job loop, and separates FIXED cost (the
one-time corpus word-count reduction + vocab materialization) from
MARGINAL per-merge cost by fitting ``t = fixed + marginal·merges``
from two merge counts per path (ADVICE r8: dividing total wall time by
merges learned conflated the two and overstated the distributed
projection).  The 32k-merge projections extrapolate the fitted model,
and ``per_merge_speedup`` compares MARGINAL rates only.

Writes BENCH_BPE.json and prints the one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from fastmlframework_spark.core.session import get_spark
from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions.text import bpe_train


def _fit_path(docs, counts: tuple[int, int], repeats: int = 2, **kw) -> dict:
    """Time bpe_train at two merge counts and fit fixed + marginal.
    A warm-up pass runs first: the first execution of each path pays
    whole-stage-codegen compilation, which otherwise lands entirely on
    the first timed point and drives the fitted marginal negative."""
    bpe_train(docs, n_merges=2, **kw).count()  # codegen warm-up
    runs = []
    for m in counts:
        best, learned = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            learned = bpe_train(docs, n_merges=m, **kw).count()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
        runs.append((learned, best))
    (m1, t1), (m2, t2) = runs
    # Session jitter can leave t2 <= t1; a negative slope is physically
    # meaningless (each merge adds work), so clamp to 0 and flag the fit
    # as noise-dominated rather than projecting negative hours.
    marginal = max((t2 - t1) / max(m2 - m1, 1), 0.0)
    fixed = max(t1 - marginal * m1, 0.0)
    return {
        "n_merges": [m1, m2],
        "sec": [round(t1, 4), round(t2, 4)],
        "fixed_sec": round(fixed, 4),
        "marginal_sec_per_merge": round(marginal, 5),
        "noise_dominated": bool(t2 <= t1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("text")
    docs.count()  # warm the scan so both paths pay the same I/O

    # Driver path: the in-process merge loop is microseconds per merge
    # — far below Spark-side collect jitter, so a two-count wall-clock
    # fit reads pure noise.  Time its components DIRECTLY instead:
    # fixed = the distributed word-count reduction + collect, marginal
    # = the in-process loop at a realistic merge ask (pairs may run
    # dry earlier; the rate divides by merges actually learned).
    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.text import _bpe_train_driver

    t0 = time.perf_counter()
    word_rows = (
        docs.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+")
            ).alias("__w")
        )
        .filter(F.col("__w") != F.lit(""))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wc"))
        .collect()
    )
    collected = [(r["__w"], r["__wc"]) for r in word_rows]
    driver_fixed = time.perf_counter() - t0
    t0 = time.perf_counter()
    merges, _ = _bpe_train_driver(collected, 32768)
    loop_sec = time.perf_counter() - t0
    driver = {
        "vocab_types": len(collected),
        "fixed_sec": round(driver_fixed, 4),
        "merge_loop_sec": round(loop_sec, 4),
        "merges_learned": len(merges),
        "marginal_sec_per_merge": round(loop_sec / max(len(merges), 1), 6),
    }
    # (5, 20): a 15-merge spread puts ~2.5s of real marginal work
    # between the two points — the 5-merge spread flipped the fitted
    # slope's sign on ~0.5s session jitter.
    dist = _fit_path(docs, (5, 20), repeats=3, driver_vocab_cap=0)

    def _project_hours(path: dict, merges: int = 32768) -> float:
        return round(
            (path["fixed_sec"] + merges * path["marginal_sec_per_merge"])
            / 3600,
            2,
        )

    out = {
        "metric": "bpe_train_sec",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "model": "t = fixed_sec + marginal_sec_per_merge * n_merges. "
        "Driver path: components timed DIRECTLY (fixed = distributed "
        "word-count reduction + collect; marginal = in-process merge "
        "loop / merges learned).  Distributed path: fitted from two "
        "merge counts.  Caveat: the synthetic sf0.1 corpus has only "
        "~31 word types, so the driver marginal understates a real "
        "1M-type vocab's per-merge cost; the distributed marginal is "
        "job-launch-bound and vocab-insensitive.",
        "driver_path": driver,
        "distributed_path": dist,
        "per_merge_speedup_marginal": round(
            dist["marginal_sec_per_merge"]
            / max(driver["marginal_sec_per_merge"], 1e-9),
            2,
        ),
        "projected_32k_merges_hours": {
            "driver_path": _project_hours(driver),
            "distributed_path": _project_hours(dist),
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_BPE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
