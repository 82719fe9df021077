"""Oracle parity for every registered query that declares an oracle —
the same gate the driver runs (row-count + schema + order-insensitive
values) at sf=0.01."""

from __future__ import annotations

import pytest

from fastmlframework_spark.queries.registry import all_oracles, all_queries

from tests.oracle_harness import compare_query

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, _QUERIES[name], _ORACLES[name], sf_dir)


@pytest.mark.slow
def test_every_query_returns_rows(spark, sf_dir_small):
    """Default-deselected (VERDICT r13 #5): a ~5-minute smoke that
    re-executes all 229 queries — redundant under the driver's own
    correctness pass and the per-query parity cases above; run with
    `-m slow`."""
    for name, fn in _QUERIES.items():
        df = fn(spark, sf_dir_small)
        assert df.columns, name
        assert df.count() >= 0, name
