"""Local replica of the driver's oracle comparison: run a registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, DuckDB-vs-Spark type families, and
order-insensitive EXACT stringified values — the same comparison the
driver hashes, with zero float tolerance (the per-query rounding/cast
contract is what makes cross-engine values bit-identical)."""

from __future__ import annotations

import duckdb

from fastmlframework_spark.core.tables import TABLES


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str):
    con = _connect(sf_dir)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def oracle_types(sql: str, sf_dir: str) -> dict[str, str]:
    """DuckDB result column types via DESCRIBE (no execution)."""
    con = _connect(sf_dir)
    return {
        c: t for c, t, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
    }


# The driver hashes stringified values from both engines.  Types whose
# pandas rendering diverges from the matching Spark type's rendering
# flip the hash even when values are numerically identical — DuckDB
# HUGEINT materializes as float64 ("236.0") while Spark bigint gives
# "236".  Every aggregate that would produce one must be CAST in the
# oracle SQL (this is exactly how q12_late_priority_counts failed in
# round 2 while passing the old value-normalizing local check).
BANNED_DUCKDB_TYPES = ("HUGEINT", "UHUGEINT")


def _duck_family(t: str) -> str:
    t = t.upper()
    if any(b in t for b in BANNED_DUCKDB_TYPES):
        return "banned"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return "other"


def _spark_family(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "long"):
        return "int"
    if t in ("float", "double") or t.startswith("decimal"):
        return "float"
    if t == "boolean":
        return "bool"
    if t == "string":
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return "other"


# DECIMAL→float64 and Spark double both stringify fractional parts, so
# the float family absorbs decimals; int/float cross-family is the
# hash-flipping case ("236" vs "236.0") and is rejected.
def check_type_parity(
    name: str, spark_dtypes: list[tuple[str, str]], duck_types: dict[str, str]
) -> list[str]:
    problems = []
    for col, styp in spark_dtypes:
        dtyp = duck_types.get(col)
        if dtyp is None:
            continue  # column-name mismatch reported elsewhere
        df, sf = _duck_family(dtyp), _spark_family(styp)
        if df == "banned":
            problems.append(
                f"{name}.{col}: oracle type {dtyp} renders as float in the "
                f"driver hash — CAST it (Spark side is {styp})"
            )
        elif df != sf:
            problems.append(
                f"{name}.{col}: type-family mismatch spark={styp}({sf}) "
                f"oracle={dtyp}({df}) — driver hash will diverge"
            )
    return problems



def compare_query(spark, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    ora_cols, ora_rows = run_oracle(oracle, sf_dir)

    # Dtype-faithful gate: "local green" must imply "driver green", so
    # reject type-family divergence even when values compare equal.
    type_problems = check_type_parity(
        query_fn.__name__, sdf.dtypes, oracle_types(oracle, sf_dir)
    )
    assert not type_problems, "; ".join(type_problems)

    assert sorted(spark_cols) == sorted(ora_cols), (
        f"column mismatch: spark={spark_cols} oracle={ora_cols}"
    )
    assert len(spark_rows) == len(ora_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    )

    # Order-insensitive EXACT stringified comparison — the same hash
    # the driver computes.  No float tolerance: the rounding contract
    # (F.round/ROUND to the same scale in both engines) is what makes
    # cross-engine doubles bit-identical, and a tolerance here would
    # hide contract violations that the driver hash then flags (this
    # is precisely how the round-2 q12 failure stayed invisible to the
    # older normalizing harness).
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [ora_cols.index(c) for c in sorted(ora_cols)]
    s_sorted = sorted(
        tuple(str(r[i]) for i in s_idx) for r in spark_rows
    )
    o_sorted = sorted(
        tuple(str(r[i]) for i in o_idx) for r in ora_rows
    )
    mismatches = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b]
    assert not mismatches, (
        f"stringified value mismatch ({len(mismatches)} rows), first: "
        f"{mismatches[0]} — check the rounding/cast contract on both "
        f"engines"
    )
