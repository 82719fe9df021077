"""Query/oracle registry — the contract surface for the driver harness.

Every implemented operator from SURVEY.md §2 (and the §7.5 extensions)
registers a named query here: a callable ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, an equivalent DuckDB oracle
SQL string.  ``__spark_entry__.py`` exposes this registry verbatim.

Cross-engine float parity: aggregates are rounded (``F.round`` /
``ROUND``) to a fixed scale in BOTH the Spark query and the oracle so
that summation-order differences between engines cannot flip the
driver's value hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_NO_BENCH: set[str] = set()
_NO_BENCH_REASON: dict[str, str] = {}

# Modules that register queries at import time.
_QUERY_MODULES = (
    "fastmlframework_spark.queries.analytics",
    "fastmlframework_spark.queries.tpch_extra",
    "fastmlframework_spark.queries.profiling",
    "fastmlframework_spark.queries.preprocessing",
    "fastmlframework_spark.queries.windows",
    "fastmlframework_spark.queries.cv",
    "fastmlframework_spark.queries.text",
    "fastmlframework_spark.queries.dedup",
    "fastmlframework_spark.queries.similarity",
    "fastmlframework_spark.queries.events",
    "fastmlframework_spark.queries.mlflow",
    "fastmlframework_spark.queries.stacking",
    "fastmlframework_spark.queries.forest",
    "fastmlframework_spark.queries.multimodal",
    "fastmlframework_spark.queries.llmprep",
    "fastmlframework_spark.queries.curation",
    "fastmlframework_spark.queries.quality",
    "fastmlframework_spark.queries.filtering",
)


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    bench_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible operators (driver then does rows-only).
    ``bench=False`` excludes the query from bench.py timing and
    REQUIRES ``bench_reason`` — a one-liner explaining the exclusion
    (exact oracle-only ground truth, frozen hash twin of a benched
    path, …).  The reasons feed the generated COVERAGE.md audit block
    (VERDICT r11 #8), so every exclusion is visible, not implicit."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        if not bench and not bench_reason:
            raise ValueError(
                f"query {name!r}: bench=False requires a bench_reason"
            )
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if not bench:
            _NO_BENCH.add(name)
            _NO_BENCH_REASON[name] = bench_reason  # type: ignore[assignment]
        return fn

    return deco


def bench_exclusions() -> dict[str, str]:
    """Every bench=False registry query with its declared reason —
    the COVERAGE.md audit surface."""
    _load()
    return dict(sorted(_NO_BENCH_REASON.items()))


def _load() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not written yet — fine during incremental build-out,
            # but never swallow a typo inside an existing module.
            if e.name != mod:
                raise


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


def bench_queries() -> dict[str, QueryFn]:
    """Queries included in bench timing."""
    _load()
    return {k: v for k, v in _QUERIES.items() if k not in _NO_BENCH}
