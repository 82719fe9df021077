"""PII detection / redaction for corpus curation (SURVEY.md §7.5
extension layer — the scrubbing pass an LLM training pipeline runs
before packing shards).

All patterns are unanchored, RE2-compatible regular expressions
executed JVM-side by ``regexp_replace`` — a map-only scan with no
shuffle, no UDF, and no driver round-trip, so the pass costs one read
of the corpus regardless of scale.  The same patterns run verbatim in
DuckDB (also RE2-compatible for every construct used), which is what
makes the oracle twin exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Deliberately conservative, dialect-portable patterns (Java regex and
# RE2 agree on every construct used: character classes, bounded
# repetition, \b word boundaries).  Order matters: emails are redacted
# before IPs so the dotted host part of an address is never half-eaten
# by the IPv4 rule.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``<text_col>_redacted``) with every
    PII match replaced by its ``[KIND]`` placeholder.  Chained
    ``regexp_replace`` — single projection, whole-stage codegen."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = F.col(text_col)
    for kind, pat in pats.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or f"{text_col}_redacted", out)


def pii_stats(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-group redaction report → [by, n_docs, docs_with_<kind>...,
    chars_redacted].  ``chars_redacted`` is the net character count
    removed by redaction (original length minus redacted length) —
    negative only if a placeholder outgrows its match, which the
    default patterns cannot do for real PII.

    ``docs_with_<kind>`` counts documents where the *kind's redaction
    stage* changed the text — i.e. what ``redact_pii`` actually
    replaced, honoring pattern precedence: the dotted-digit host of an
    already-redacted email is never double-counted as an ipv4 hit."""
    pats = PII_PATTERNS if patterns is None else patterns
    # Each flag compares stage k to stage k-1, and the stage
    # expressions nest textually, so the projection repeats regex
    # subtrees; Spark's subexpression elimination
    # (spark.sql.subexpressionElimination.enabled, on by default)
    # collapses the duplicates to one evaluation each.  With a LARGE
    # custom pattern set, checkpoint intermediate stage columns
    # instead of relying on CSE at O(k²) textual scale.
    stage = F.col(text_col)
    flags = []
    for kind, pat in pats.items():
        nxt = F.regexp_replace(stage, pat, f"[{kind.upper()}]")
        flags.append((nxt != stage).cast("long").alias(f"__hit_{kind}"))
        stage = nxt
    staged = df.select(
        F.col(by), F.length(text_col).alias("__len0"),
        F.length(stage).alias("__len1"), *flags,
    )
    return staged.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(f"__hit_{kind}").alias(f"docs_with_{kind}")
            for kind in pats
        ],
        F.sum(F.col("__len0") - F.col("__len1")).alias("chars_redacted"),
    )
