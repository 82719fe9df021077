"""Local replica of the driver's oracle comparison: run a registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, and order-insensitive values (floats rounded
in the queries themselves; comparison still allows 1e-9 slack)."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from fastmlframework_spark.core.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def compare_query(spark, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    ora_cols, ora_rows = run_oracle(oracle, sf_dir)

    assert sorted(spark_cols) == sorted(ora_cols), (
        f"column mismatch: spark={spark_cols} oracle={ora_cols}"
    )
    assert len(spark_rows) == len(ora_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    )

    # Order-insensitive: sort by all values with columns aligned by name.
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [ora_cols.index(c) for c in sorted(ora_cols)]
    s_sorted = sorted(tuple(_norm(r[i]) for i in s_idx) for r in spark_rows)
    o_sorted = sorted(tuple(_norm(r[i]) for i in o_idx) for r in ora_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, o_sorted) if not _rows_close(a, b)
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif isinstance(x, tuple) and isinstance(y, tuple):
            if not _rows_close(x, y):
                return False
        elif x != y:
            return False
    return True
