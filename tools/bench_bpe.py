#!/usr/bin/env python
"""Realistic-tokenizer BPE fit timing (VERDICT r7 #2).

The registry's ``text_bpe_train`` demo runs 10 merge rounds; a real
tokenizer fit is tens of thousands.  This tool times the driver-local
fast path at ``n_merges=100`` on sf0.1 (the production shape: corpus
reduced to its Heaps-bounded word-type table distributedly, merge loop
in-process) next to the distributed per-round-Spark-job loop at
``n_merges=10``, and derives the per-round cost of each — the number
that shows WHY the fast path exists (one sequential Spark job per merge
round is pure job-launch overhead at realistic merge counts).

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
from fastmlframework_spark.extensions.text import bpe_train
from fastmlframework_spark.core.tables import load_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("text")
    docs.count()  # warm the scan so both paths pay the same I/O

    t0 = time.perf_counter()
    m_driver = bpe_train(docs, n_merges=100)
    n_driver = m_driver.count()
    driver_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    m_dist = bpe_train(docs, n_merges=10, driver_vocab_cap=0)
    n_dist = m_dist.count()
    dist_sec = time.perf_counter() - t0

    out = {
        "metric": "bpe_train_sec",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "driver_path": {
            "n_merges": 100,
            "sec": round(driver_sec, 4),
            "sec_per_merge": round(driver_sec / max(n_driver, 1), 4),
            "merges_learned": n_driver,
        },
        "distributed_path": {
            "n_merges": 10,
            "sec": round(dist_sec, 4),
            "sec_per_merge": round(dist_sec / max(n_dist, 1), 4),
            "merges_learned": n_dist,
        },
        "per_merge_speedup": round(
            (dist_sec / max(n_dist, 1)) / (driver_sec / max(n_driver, 1)), 2
        ),
        "projected_32k_merges_hours": {
            "driver_path": round(
                32768 * driver_sec / max(n_driver, 1) / 3600, 2
            ),
            "distributed_path": round(
                32768 * dist_sec / max(n_dist, 1) / 3600, 2
            ),
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_BPE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
