"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``fastmlframework_spark`` package; this
module only re-exports its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fastmlframework_spark.queries.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from fastmlframework_spark.queries.analytics import flagship

    return flagship(spark, "/root/testdata/sf0.001")


# Priority ordering for a prefix-taking driver sampler (VERDICT r10
# #8): (1) latest-red queries, (2) never-sampled, then (3) greens by
# ASCENDING last-sampled round — so each round's ~50-query rotation
# converts local evidence into driver evidence fastest AND keeps
# re-confirming the oldest greens (a round-1 green never re-sampled
# is weaker evidence than one confirmed last round; 60 entries were
# in that state at r10).  Derived at call time from the committed
# CORRECTNESS_r*.json files via the shared parser (core/verdicts.py —
# one definition of "green" for this prioritizer AND
# tools/registry_report.py) — nothing hardcoded, so renames/typos
# can't rot (ADVICE r3 #1).  Harmless for a non-prefix sampler: it's
# still the full registry.
def _prioritized(mapping: dict) -> dict:
    from fastmlframework_spark.core.verdicts import (
        latest_verdicts_with_round,
    )

    checked = latest_verdicts_with_round(
        os.path.dirname(os.path.abspath(__file__))
    )
    ever_red = [k for k in mapping if k in checked and not checked[k][0]]
    never_sampled = [k for k in mapping if k not in checked]
    stale_green = sorted(
        (k for k in mapping if k in checked and checked[k][0]),
        key=lambda k: checked[k][1],
    )
    order = [*ever_red, *never_sampled, *stale_green]
    out = {k: mapping[k] for k in order}
    # safety: anything the buckets missed keeps its original slot
    out.update({k: v for k, v in mapping.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.5,
    never-driver-sampled oracles first (see _NEVER_SAMPLED)."""
    return _prioritized(all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names,
    same rounding); non-SQL-expressible ops are absent → rows-only."""
    return _prioritized(all_oracles())
