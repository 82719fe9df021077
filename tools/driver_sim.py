"""Simulate the grading driver: run every registry query at sf0.01 and
compare against its DuckDB oracle (row count + order-insensitive values).

Usage: python tools/driver_sim.py [name ...]   (default: all)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(os_)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_ok = n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            cur = con.execute(os_[name])
            cols = [d[0] for d in cur.description]
            idx = [cols.index(c) for c in sorted(cols)]
            orows = sorted(
                tuple(str(r[i]) for i in idx) for r in cur.fetchall()
            )
            ok = len(srows) == len(orows) and srows == orows
        except Exception as ex:  # noqa: BLE001
            ok = False
            print(f"{name} EXC {type(ex).__name__}: {ex}", flush=True)
        dt = time.time() - t0
        n_ok += ok
        n_bad += not ok
        print(f"{name} {ok} {dt:.1f}s", flush=True)
    print(f"TOTAL ok={n_ok} bad={n_bad}", flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
