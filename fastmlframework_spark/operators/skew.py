"""Skew-resistant aggregation and join (the 100 TB contract).

The reference never meets skew (pandas, single node).  At cluster
scale a hot grouping/join key turns one reducer into the straggler;
AQE's skew-join splitting handles sort-merge joins, and these two
operators cover the remaining cases:

* ``salted_groupby`` — two-stage aggregation for ALGEBRAIC aggregates:
  stage 1 groups on (keys + salt), splitting a hot key's rows across
  ``n_salts`` reducers; stage 2 merges the partials on the true keys.
  Results are EXACTLY equal to the direct groupBy (sum/count/min/max
  are associative-commutative; avg is derived sum/count).
* ``salted_join`` — replicates the small side over the salt domain
  (explode of a literal sequence) and salts the big side's rows, so a
  hot join key's matches spread over ``n_salts`` tasks.  Exact
  equi-join semantics, at the cost of a ``n_salts``× blow-up of the
  small side — use for dimension joins where AQE can't help (e.g.
  broadcast threshold exceeded but one key dominates).

Salt assignment is deterministic-per-row (xxhash64 over the row's
key + a disambiguating id) so re-runs produce identical partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summation
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs``: (column, fn, alias) with fn in {sum, count, min, max,
    avg}.  ``avg`` is computed exactly as merged-sum / merged-count.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    salted = df.withColumn("__salt", salt)

    partial_exprs = []
    merge_exprs = []
    for col, fn, alias in aggs:
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"__s_{alias}"),
                F.count(col).alias(f"__c_{alias}"),
            ]
            merge_exprs.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
            continue
        if fn not in _PARTIAL:
            raise ValueError(
                f"{fn!r} is not algebraic; salted two-stage aggregation "
                "supports sum/count/min/max/avg"
            )
        partial_exprs.append(_PARTIAL[fn](col).alias(f"__p_{alias}"))
        merge_exprs.append(_MERGE[fn](f"__p_{alias}").alias(alias))

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side per row, explode the
    small side across all salts, join on (keys + salt).  Exactly the
    plain ``big.join(small, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return big_s.join(small_s, on=keys + ["__salt"], how=how).drop("__salt")
