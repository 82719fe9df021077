#!/usr/bin/env python
"""End-to-end solution-pipeline bench (VERDICT r6 #5).

BENCH_CV.json times the MLlib fits in isolation; the reference's
flagship artifact is the whole Luigi chain — ingest → feature
selection → HPO → per-model CV/prediction → stack/blend
(``solution_pipeline/create_solution.py:800-819``).  This tool runs
``examples/run_solution.py``'s chain against demo data derived from
the driver testdata at a chosen scale and writes BENCH_PIPELINE.json
with the total plus a per-task breakdown, so the orchestration layer
gets per-round regression coverage like every query does.

    python tools/bench_pipeline.py [--sf-dir /root/testdata/sf0.1]
        [--workers 2] [--json-out BENCH_PIPELINE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.pipeline.solution import build_solution  # noqa: E402
from fastmlframework_spark.sources.config import load_config  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--config", default="examples/solution.conf")
    ap.add_argument("--json-out", default="BENCH_PIPELINE.json")
    args = ap.parse_args()

    spark = get_spark(
        app_name="fastml-bench-pipeline",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from run_solution import make_demo_data

    project = tempfile.mkdtemp(prefix="fastml_bench_pipeline_")
    try:
        make_demo_data(spark, project, args.sf_dir)
        config = load_config(args.config)
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        ran = build_solution(
            spark, config, project, workers=args.workers, timings=timings
        )
        total = time.perf_counter() - t0
        if not ran:
            raise SystemExit("nothing ran — stale project dir?")
        # task ids embed the (random) project dir — strip it so the
        # stored breakdown compares across rounds
        timings = {
            k.replace(project, "<project>"): v for k, v in timings.items()
        }
        out = {
            "metric": "pipeline_total_sec",
            "value": round(total, 4),
            "unit": "sec",
            "sf": args.sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "workers": args.workers,
            "n_tasks": len(ran),
            "tasks": dict(sorted(timings.items())),
        }
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(project, ignore_errors=True)


if __name__ == "__main__":
    main()
