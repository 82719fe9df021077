"""Referential-integrity audit — the data-quality gate a warehouse
load runs before publishing a snapshot (beyond-reference §7.5; the
reference validates frame alignment in-memory,
``data_processing/preprocessing.py``-style, which does not exist at
warehouse scale).

Each declared relationship (child key → parent key) is checked with a
``left_anti`` join; the result is one tiny row per relationship.  Plan
notes for 100 TB: small parents (nation/region-sized) broadcast; a
fact-to-fact relationship (lineitem → orders) is a shuffle anti-join
on the key both tables would already be bucketed by in a real layout,
and AQE picks broadcast automatically whenever the parent side turns
out small.  No driver-side iteration over data — only over the
relationship LIST (a few entries), each contributing one branch to a
unioned job.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def orphan_counts(
    relationships: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """``relationships``: (name, child, child_key, parent, parent_key)
    tuples → [rel, n_orphans]: child rows whose key has no parent.

    NULL child keys count as orphans (they reference nothing), which
    is the auditing convention — the anti-join keeps null-keyed rows
    because a null equi-join condition never matches.

    Raises ``ValueError`` on an empty relationship list — an audit
    that checks nothing should not silently return nothing."""
    if not relationships:
        raise ValueError("orphan_counts: relationships must be non-empty")
    parts = []
    for name, child, ck, parent, pk in relationships:
        orphans = child.select(F.col(ck).alias("__k")).join(
            parent.select(F.col(pk).alias("__k")).distinct(),
            on="__k",
            how="left_anti",
        )
        parts.append(
            orphans.agg(
                F.lit(name).alias("rel"),
                F.count(F.lit(1)).alias("n_orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
