#!/usr/bin/env python
"""Run the full solution pipeline from a config file — the rebuild's
equivalent of the reference's ``luigi.build([BuildSolution(...)])``
notebook cell (solution_pipeline/create_solution.py:822-824).

    python examples/run_solution.py --project /tmp/demo_project \
        --config examples/solution.conf [--make-demo-data]

``--make-demo-data`` writes a small train/test CSV pair derived from
the driver testdata (orders at sf0.001) into <project>/raw_data/ so
the example is runnable end-to-end out of the box.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.pipeline.solution import build_solution  # noqa: E402
from fastmlframework_spark.sources.config import load_config  # noqa: E402


def make_demo_data(spark, project: str, sf_dir: str) -> None:
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.dayofweek("o_orderdate").alias("o_orderdow"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("int")
            .alias("is_urgent"),
        )
    )
    train = orders.filter(F.col("o_orderkey") % 5 != 0)
    test = orders.filter(F.col("o_orderkey") % 5 == 0)
    for name, df in (("train", train), ("test", test)):
        out = os.path.join(project, "raw_data", name)
        df.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    # the config points at raw_data/<split>.csv; Spark reads dirs fine,
    # but keep the conf literal: symlink dir -> file name
    for name in ("train", "test"):
        link = os.path.join(project, "raw_data", f"{name}.csv")
        if not os.path.exists(link):
            os.symlink(os.path.join(project, "raw_data", name), link)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--make-demo-data", action="store_true")
    ap.add_argument(
        "--workers",
        type=int,
        default=1,
        help="run independent tasks (one per model) concurrently",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="fastml-solution")
    spark.sparkContext.setLogLevel("WARN")
    os.makedirs(args.project, exist_ok=True)
    if args.make_demo_data:
        make_demo_data(spark, args.project, args.sf_dir)

    config = load_config(args.config)
    ran = build_solution(spark, config, args.project, workers=args.workers)
    print("tasks run:" if ran else "everything up-to-date (targets exist):")
    for tid in ran:
        print(" ", tid)
    print("artifacts under", os.path.join(args.project, "results"))


if __name__ == "__main__":
    main()
