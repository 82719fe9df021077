"""Unit tests for the data-quality operators' guard semantics and
edge-case contracts (KS drift, MAD outliers, integrity audit, PII
redaction, BM25, token entropy) — the oracle parity for their happy
paths lives in test_queries_oracle.py via queries/quality.py."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fastmlframework_spark.extensions.privacy import pii_stats, redact_pii
from fastmlframework_spark.extensions.text import bm25_scores
from fastmlframework_spark.operators.integrity import orphan_counts
from fastmlframework_spark.operators.stats import ks_statistic, mad_outliers


def test_ks_drops_nulls_and_matches_manual(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", 1.0), ("b", 4.0)],
        "g string, v double",
    )
    row = ks_statistic(df, "g", "v", "a", "b").first()
    # Grid {1,2,4}: ECDF_a = [.5, 1, 1], ECDF_b = [.5, .5, 1] → KS .5;
    # the NULL row must not inflate n_a from 2 to 3.
    assert row["n_a"] == 2 and row["n_b"] == 2
    assert row["ks_stat"] == pytest.approx(0.5)


def test_ks_raises_on_empty_group(spark):
    """The guard is an in-plan raise_error: construction stays lazy
    (no jobs), the error surfaces at action time."""
    df = spark.createDataFrame([("a", 1.0), ("a", None)], "g string, v double")
    lazy = ks_statistic(df, "g", "v", "a", "missing")  # no action yet
    with pytest.raises(Exception, match="empty group"):
        lazy.first()
    # All-NULL values in an otherwise present group also raise.
    with pytest.raises(Exception, match="empty group"):
        ks_statistic(
            spark.createDataFrame(
                [("a", 1.0), ("b", None)], "g string, v double"
            ),
            "g", "v", "a", "b",
        ).first()


def test_mad_outliers_flags_planted_outlier(spark):
    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14]] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    row = mad_outliers(df, "grp", "v").first()
    assert row["n"] == 6
    assert row["n_outliers"] == 1


def test_orphan_counts_raises_on_empty_relationships():
    with pytest.raises(ValueError, match="non-empty"):
        orphan_counts([])


def test_orphan_counts_null_child_key_is_orphan(spark):
    child = spark.createDataFrame([(1,), (None,), (9,)], "k bigint")
    parent = spark.createDataFrame([(1,), (2,)], "p bigint")
    row = orphan_counts([("c->p", child, "k", parent, "p")]).first()
    assert row["rel"] == "c->p"
    assert row["n_orphans"] == 2  # NULL key + unmatched 9


def test_bm25_rejects_empty_and_dedupes_terms(spark):
    df = spark.createDataFrame(
        [(1, "spark spark window"), (2, "hash only here")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, ())
    once = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ("spark",)).collect()}
    twice = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ("spark", "spark")).collect()
    }
    assert once == twice  # duplicate term must not double-count


def test_pii_flags_follow_redaction_precedence(spark):
    # The dotted quad lives INSIDE the email host: the email stage
    # consumes it, so ipv4 must report 0 — flags describe what
    # redact_pii actually replaced, not independent raw-text hits.
    df = spark.createDataFrame(
        [("s", "mail me at bob@mail-10.0.0.9.example.com thanks")],
        "source string, text string",
    )
    row = pii_stats(df, by="source").first()
    assert row["docs_with_email"] == 1
    assert row["docs_with_ipv4"] == 0
    assert row["docs_with_phone"] == 0
    red = redact_pii(df).select("text_redacted").first()[0]
    assert "[EMAIL]" in red and "10.0.0.9" not in red
    # chars_redacted consistent with the actual replacement.
    assert row["chars_redacted"] == len(
        "bob@mail-10.0.0.9.example.com"
    ) - len("[EMAIL]")


def test_pii_standalone_ip_still_flagged(spark):
    df = spark.createDataFrame(
        [("s", "server at 10.0.0.9 port 80")], "source string, text string"
    )
    row = pii_stats(df, by="source").first()
    assert row["docs_with_ipv4"] == 1 and row["docs_with_email"] == 0


def test_hashed_linear_score_guards(spark):
    import pytest as _pytest

    from fastmlframework_spark.extensions.text import hashed_linear_score

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="power of two"):
        hashed_linear_score(df, dim=100)
    with _pytest.raises(ValueError, match="length"):
        hashed_linear_score(df, weights=[0.1, 0.2], dim=256)
    # custom weights: all-zero weights → sigmoid(bias)=0.5
    out = hashed_linear_score(df, weights=[0.0] * 256).collect()[0]
    assert out["score"] == 0.5 and out["n_terms"] == 3


def test_pmi_collocations_edge_docs_and_determinism(spark):
    """1-word/NULL/empty docs contribute no pairs (no element_at(0)
    crash from Spark's descending sequence(1,0)); a planted dominant
    collocation ranks first; output is capped and fully ordered."""
    from fastmlframework_spark.queries.text import (
        _PMI_MIN_COUNT,
        text_pmi_collocations,
    )
    import fastmlframework_spark.queries.text as qt

    rows = [(0, "solo"), (1, None), (2, "  "), (3, "")]
    rows += [(10 + i, "alpha beta gamma " + "x y " * 3) for i in range(_PMI_MIN_COUNT)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # run the query body against this frame by monkey-patching the loader
    orig = qt.load_table
    qt.load_table = lambda spark_, sf_dir_, name_: df
    try:
        out = text_pmi_collocations(spark, "unused").collect()
    finally:
        qt.load_table = orig
    assert out, "planted repeated pairs must clear the min count"
    pairs = [(r.w1, r.w2) for r in out]
    assert ("alpha", "beta") in pairs or ("x", "y") in pairs
    pmis = [r.pmi for r in out]
    assert pmis == sorted(pmis, reverse=True)


def test_filter_agreement_matrix_bounds(spark, sf_dir_small):
    """Diagonal rows have both == either == the filter's fail count;
    off-diagonal both <= min(diagonals) and either >= max(diagonals);
    jaccard in [0, 1] (or NULL when both fail sets are empty)."""
    from fastmlframework_spark.queries.quality import (
        quality_filter_agreement,
    )

    rows = {
        (r.filter_a, r.filter_b): r
        for r in quality_filter_agreement(spark, sf_dir_small).collect()
    }
    assert len(rows) == 6
    diag = {a: rows[(a, a)] for a in ("c4", "gopher", "repetition")}
    for a, b in (("c4", "gopher"), ("c4", "repetition"),
                 ("gopher", "repetition")):
        r = rows[(a, b)]
        assert r.n_fail_both <= min(diag[a].n_fail_both, diag[b].n_fail_both)
        assert r.n_fail_either >= max(diag[a].n_fail_both, diag[b].n_fail_both)
        if r.overlap_jaccard is not None:
            assert 0.0 <= r.overlap_jaccard <= 1.0
    assert any(d.n_fail_both > 0 for d in diag.values())
