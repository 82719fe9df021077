"""Capture optimization evidence for named registry queries: the
final DataFrame's ``explain('formatted')`` plus the Spark job count
and wall time of one full execution (query construction + noop sink).

Usage:
    python tools/plan_capture.py --out plans/r13 --suffix before q1 q2 ...

Job counts come from ``setJobGroup`` + ``statusTracker`` — for the
multi-action CV/pipeline queries the job count IS the headline
evidence (the explain only shows the final projection's plan).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.queries.registry import all_queries  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    cli = ap.parse_args()
    os.makedirs(cli.out, exist_ok=True)
    spark = get_spark(
        app_name="plan-capture",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in cli.names:
        fn = qs[name]
        # one warm pass (codegen compile; memoized frozen models)
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warm-up failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        group = f"cap_{name}_{cli.suffix}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, cli.sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        n_jobs = len(tracker.getJobIdsForGroup(group))
        spark.sparkContext.setJobGroup("idle", "idle")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(cli.out, f"{name}_{cli.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# query: {name}  ({cli.suffix})\n"
                f"# sf_dir: {cli.sf_dir}\n"
                f"# wall_sec_total: {t_total:.3f} "
                f"(construction {t_build:.3f} + noop sink)\n"
                f"# spark_jobs: {n_jobs} (includes the noop-sink job)\n"
                f"# NOTE: for multi-action queries (CV fits, task\n"
                f"# chains) the explain below covers only the FINAL\n"
                f"# frame; the job count above captures the fit/chain\n"
                f"# actions that ran during construction.\n\n"
            )
            fh.write(buf.getvalue())
        print(
            f"{name}: jobs={n_jobs} total={t_total:.2f}s "
            f"(build {t_build:.2f}s) -> {path}",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
