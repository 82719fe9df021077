#!/usr/bin/env python
"""Scale probe: replicate the driver testdata N× (disjoint key spaces)
and time representative queries, to check operators scale linearly
before they meet real data volumes.

    python tools/scale_probe.py [--factor 10] [--src /root/testdata/sf0.1]
        [--out /tmp/scale_probe] [--queries q1_pricing_summary,...]

Observed at factor=10 (6M-row lineitem, 67k docs, local[32]):
every probed operator stays linear-or-better — grouped aggregates and
window top-k amortize fixed overhead (~2-3x wall for 10x rows), the
minhash LSH path grows with candidate-pair count as designed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.queries.registry import all_queries  # noqa: E402

# Fact tables get key-shifted copies; dimensions stay as-is.
KEY_SHIFT = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 100_000_000),
}

DEFAULT_QUERIES = (
    "q1_pricing_summary,q5_region_revenue,dedup_exact,dedup_minhash_lsh,"
    "text_quality_by_lang,events_sessionize,window_topk_per_group"
)


def replicate(spark, src: str, out: str, factor: int) -> None:
    tables = (
        "lineitem", "orders", "documents", "embeddings", "events",
        "customer", "supplier", "part", "nation", "region",
    )
    for t in tables:
        df = load_table(spark, src, t)
        if t in KEY_SHIFT:
            key, step = KEY_SHIFT[t]
            df = reduce(
                lambda a, b: a.unionByName(b),
                [
                    df.withColumn(key, F.col(key) + F.lit(i * step))
                    for i in range(factor)
                ],
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    args = ap.parse_args()

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, args.src, args.out, args.factor)
    qs = all_queries()
    for name in args.queries.split(","):
        t0 = time.time()
        qs[name](spark, args.out).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name:28s} {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
