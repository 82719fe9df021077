"""Bit-for-bit validation of the DuckDB-SQL XXH64 emulation
(queries/xxh64_sql.py) against Spark's ``xxhash64`` — the foundation
of the sketch-path oracles (dedup_simhash, dedup_minhash_lsh)."""

from __future__ import annotations

import random

import duckdb
import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.queries import xxh64_sql as X

# Every length class of the algorithm: empty, byte tail only, exactly
# one 4-byte chunk, word tail, 32-byte block boundary, multi-block,
# plus multi-byte UTF-8 (hex-decode path must see bytes, not chars).
CASES = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
    "abcdefghijk", "x" * 31, "x" * 32, "x" * 33, "x" * 39, "x" * 40,
    "x" * 64, "héllo wörld", "日本語テキスト",
]
_rng = random.Random(1)
CASES += [
    "".join(_rng.choice("abcdefgh ijklm") for _ in range(n))
    for n in (12, 20, 45, 67, 100, 250)
]


@pytest.fixture(scope="module")
def hashed(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["s"])
    spark_rows = df.select(
        "s",
        F.xxhash64("s").alias("h"),
        F.expr("xxhash64(s, 42)").alias("h42"),
    ).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [[c] for c in CASES])
    sql = (
        "SELECT s, " + X.xxhash64_str("s") + " AS h, "
        + X.xxhash64_str("s", 42) + " AS h42 FROM t"
    )
    duck = {s: (h, h42) for s, h, h42 in con.execute(sql).fetchall()}
    return spark_rows, duck


def test_sql_xxh64_matches_spark(hashed):
    spark_rows, duck = hashed
    assert len(spark_rows) == len(CASES)
    for r in spark_rows:
        assert duck[r.s] == (r.h, r.h42), repr(r.s)


def test_signed64_boundaries():
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + X.signed64(str((1 << 63))) + ", "
        + X.signed64(str((1 << 64) - 1)) + ", "
        + X.signed64(str((1 << 63) - 1))
    ).fetchone()
    assert got == (-(1 << 63), -1, (1 << 63) - 1)
