#!/usr/bin/env python
"""The full ANN quantization ladder over the embeddings table — every
rung the similarity layer exposes, scored against the same brute-force
ground truth in one runnable flow:

    exact: brute-force cosine          (the recall oracle)
    flat:  sign-LSH · binary-Hamming · SQ8 (packed) · PQ (ADC)
    composed (sublinear candidates): IVF · IVF-Hamming · IVF-SQ8 · IVF-PQ

    python examples/run_ann_ladder.py [--sf-dir /root/testdata/sf0.001]
                                      [--k 3] [--n-queries 10]

Prints one table: rung, wall seconds (plan execution via a noop sink,
not driver collect), recall@k vs brute force — the accuracy/cost curve
you'd use to pick a production rung at 100 TB.  Every rung here is the
library operator the oracle-checked query registry exposes, so the
results match the hash-verified queries."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.extensions import similarity as xsim  # noqa: E402


def run(spark, sf_dir: str, k: int = 3, n_queries: int = 10) -> dict:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < n_queries)

    exact = xsim.cosine_topk(emb, queries, k=k).cache()
    exact.count()  # materialize the ground truth once

    rungs = {
        "bruteforce": lambda: exact,
        "lsh": lambda: xsim.lsh_topk(emb, queries, k=k, n_planes=4),
        "hamming": lambda: xsim.hamming_topk(emb, queries, k=k, refine=8),
        "sq8": lambda: xsim.sq8_topk(emb, queries, k=k, refine=4),
        "pq": lambda: xsim.pq_topk(emb, queries, k=k),
        "ivf(2/8)": lambda: xsim.ivf_topk(
            emb, queries, k=k, n_clusters=8, n_probe=2
        ),
        "ivf-hamming(2/8)": lambda: xsim.ivfhamming_topk(
            emb, queries, k=k, n_clusters=8, n_probe=2
        ),
        "ivf-sq8(2/8)": lambda: xsim.ivfsq8_topk(
            emb, queries, k=k, n_clusters=8, n_probe=2
        ),
        "ivf-pq(2/8)": lambda: xsim.ivfpq_topk(
            emb, queries, k=k, n_clusters=8, n_probe=2
        ),
    }

    results = {}
    print(f"{'rung':<18} {'sec':>7} {'recall@' + str(k):>9}")
    for name, build in rungs.items():
        df = build()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 3)
        rec = round(xsim.recall_at_k(df, exact), 3)
        results[name] = {"sec": sec, "recall": rec}
        print(f"{name:<18} {sec:>7.3f} {rec:>9.3f}")
    exact.unpersist()
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--n-queries", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="ann-ladder-example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, args.sf_dir, k=args.k, n_queries=args.n_queries)


if __name__ == "__main__":
    main()
