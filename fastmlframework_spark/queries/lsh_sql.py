"""DuckDB-SQL twins for the hyperplane-LSH paths.

The LSH operators (``extensions/similarity.py:lsh_topk``,
``extensions/dedup.py:lsh_dup_pairs``) are deterministic given their
seed: the Gaussian hyperplanes come from ``random.Random(seed)`` on
the driver and are inlined into the Spark plan as double literals.
This module inlines the SAME literals into oracle SQL and reproduces
the bucket/cosine arithmetic with Spark's exact evaluation order and
float-vs-double promotion, so the oracle is bit-faithful:

- Spark array exprs are 0-indexed, DuckDB lists 1-indexed (+1 below).
- ``repr(x)`` literals parse to the identical IEEE double in both
  engines; ``::DOUBLE`` stops DuckDB from reading them as DECIMAL.
- Left-to-right ``+`` chains match Spark's unrolled sums; lambda
  folds start from the first element, and IEEE ``0.0 + a == a`` makes
  that identical to Spark's 0.0-seeded ``aggregate``.
- Squares: ``lsh_topk`` normalizes with FLOAT·FLOAT squares (Spark
  ``e * e`` on float input), ``lsh_dup_pairs`` with DOUBLE squares
  (``cast(v as double)*v``) — each twin mirrors its operator.
"""

from __future__ import annotations


def bucket_sql(vec: str, planes: list[list[float]]) -> str:
    """Sign-bit bucket id of ``vec`` (list expr) for literal planes —
    the SQL twin of ``with_lsh_bucket``."""
    bits = []
    for i, p in enumerate(planes):
        proj = " + ".join(
            f"{vec}[{j + 1}] * {x!r}::DOUBLE" for j, x in enumerate(p)
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def dot_sql(a: str, b: str, dim: int, cast_a: bool = False) -> str:
    """Unrolled left-to-right dot product of two list expressions."""
    term = (
        (lambda i: f"CAST({a}[{i + 1}] AS DOUBLE) * {b}[{i + 1}]")
        if cast_a
        else (lambda i: f"{a}[{i + 1}] * {b}[{i + 1}]")
    )
    return "(" + " + ".join(term(i) for i in range(dim)) + ")"


def norm_sq_float_sql(vec: str) -> str:
    """Σ e² with FLOAT squares then double accumulation — the twin of
    ``_NORM``'s ``aggregate(v, 0.0D, (a, e) -> a + e * e)`` on a
    float array."""
    return (
        f"list_reduce(list_transform({vec}, __e -> CAST(__e * __e AS DOUBLE)),"
        " (__a, __b) -> __a + __b)"
    )


def norm_sq_double_sql(vec: str) -> str:
    """Σ e² with DOUBLE squares — the twin of ``lsh_dup_pairs``'s
    ``aggregate(v, 0.0D, (a, v) -> a + cast(v as double)*v)``."""
    return (
        f"list_reduce(list_transform({vec}, __e -> CAST(__e AS DOUBLE) * __e),"
        " (__a, __b) -> __a + __b)"
    )
