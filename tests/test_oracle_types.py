"""Meta-test: no registered oracle may produce a DuckDB result column
type that renders differently from its Spark twin in the driver's
stringified value hash.

Round-2 postmortem: ``q12_late_priority_counts`` had byte-identical
values but failed the driver's hash because a bare ``SUM(CASE...)``
types as HUGEINT, which pandas materializes as float64 ("236.0") while
Spark's bigint gives "236".  The old local harness normalized both to
Python ints, hiding the divergence.  This test makes the class of bug
impossible to reintroduce: every oracle is DESCRIBEd (types only — no
execution, so the full registry is checked in seconds) and any
HUGEINT/UHUGEINT column fails with a pointer to the CAST fix.
"""

from __future__ import annotations

import pytest

from fastmlframework_spark.queries.registry import all_oracles
from tests.oracle_harness import BANNED_DUCKDB_TYPES, _duck_family, oracle_types

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = sorted(all_oracles().items())


@pytest.mark.parametrize("name,sql", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_oracle_has_no_hash_unsafe_types(name: str, sql: str) -> None:
    bad = {
        col: typ
        for col, typ in oracle_types(sql, SF_DIR).items()
        if _duck_family(typ) in ("banned", "other")
    }
    assert not bad, (
        f"oracle {name!r} produces driver-hash-unsafe column types {bad}; "
        f"CAST them in the oracle SQL (e.g. CAST(SUM(...) AS BIGINT))"
    )


def test_detector_catches_uncast_sum() -> None:
    """The un-cast q12 variant demonstrably fails this gate: a bare
    integer SUM types as HUGEINT and is flagged."""
    types = oracle_types("SELECT SUM(1) AS s FROM region", SF_DIR)
    assert types["s"] in BANNED_DUCKDB_TYPES
    assert _duck_family(types["s"]) == "banned"
