"""Hypothesis property tests for the corpus-filtering family:
conservation and reference-implementation equivalence on random
inputs (the same property-based discipline as
test_curation_properties.py)."""

from __future__ import annotations

import pytest

# Default-deselected (VERDICT r13 #5: the suite outgrew the driver's
# pytest budget): hypothesis property sweep - run with `-m slow`.
pytestmark = pytest.mark.slow

import math

from hypothesis import given, settings, strategies as st

from fastmlframework_spark.extensions.dedup import duplicate_spans
from fastmlframework_spark.extensions.filtering import (
    LENGTH_BUCKETS,
    chargram_nll,
    length_bucket_packing,
)

_SETTINGS = dict(max_examples=8, deadline=None)

_word = st.text(alphabet="abcdefg", min_size=1, max_size=6)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=1, max_value=200), min_size=1, max_size=25
    )
)
def test_packing_conserves_docs_and_bounds_pad_ratio(spark, token_counts):
    """Every document lands in exactly one bucket; pad_ratio is in
    (0, 1]; capacity*n_batches covers n_docs — the defining batching
    invariants, on random length distributions."""
    rows = [
        (i, "s", " ".join(["w"] * n)) for i, n in enumerate(token_counts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = length_bucket_packing(df).collect()
    assert sum(r["n_docs"] for r in out) == len(token_counts)
    for r in out:
        assert r["bucket"] in LENGTH_BUCKETS
        assert 0 < r["pad_ratio"] <= 1.0
        assert r["capacity"] * r["n_batches"] >= r["n_docs"]
        # one fewer batch must NOT fit
        assert r["capacity"] * (r["n_batches"] - 1) < r["n_docs"]


@settings(**_SETTINGS)
@given(
    st.lists(_word, min_size=3, max_size=12),
    st.integers(min_value=0, max_value=5),
)
def test_duplicate_spans_vs_reference(spark, shared_words, offset):
    """Planting one shared passage inside two otherwise-unique docs:
    coverage equals the reference interval-union computation for
    whatever window set actually repeats."""
    n = 3
    shared = " ".join(shared_words)
    pre = " ".join(f"u{offset}x{i}" for i in range(offset))
    doc1 = f"{pre} {shared}".strip()
    doc2 = f"{shared} " + " ".join(f"v{i}" for i in range(4))
    df = spark.createDataFrame(
        [(1, "s", doc1), (2, "s", doc2), (3, "s", "q r s t u v w")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(df, n=n).collect()}
    k = len(shared_words)
    if k >= n:
        # shared k-word run → k-n+1 windows in each doc, one span of
        # exactly k words (no other cross-doc n-gram repeats by
        # construction: u*/v*/q.. prefixes are disjoint vocabularies)
        assert set(out) == {1, 2}
        for d in (1, 2):
            assert out[d]["n_dup_windows"] == k - n + 1
            assert out[d]["dup_words"] == k
    else:
        # doc shorter than any window can only surface via the
        # whole-doc fallback window, which is unique here
        assert 3 not in out


@settings(**_SETTINGS)
@given(st.lists(_word, min_size=2, max_size=30))
def test_chargram_nll_matches_reference(spark, words):
    """Spark NLL equals a pure-Python reference on a 1-doc corpus:
    model = the doc's own bucketed bigram counts."""
    text = " ".join(words)
    df = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    [row] = chargram_nll(df, dim=64).collect()

    # reference: same hashing via Spark's xxhash64 (query the engine
    # for the bucket of each bigram — one tiny local DataFrame)
    bgs = [text[i : i + 2] for i in range(len(text) - 1)]
    bdf = spark.createDataFrame([(g,) for g in bgs], "g string")
    import pyspark.sql.functions as F

    buckets = [
        r["b"]
        for r in bdf.select(
            F.expr("pmod(xxhash64(g), 64)").alias("b")
        ).collect()
    ]
    from collections import Counter

    c = Counter(buckets)
    total = len(buckets)
    nll = -sum(
        math.log((c[b] + 1) * 1.0 / (total + 64)) for b in buckets
    ) / len(bgs)
    assert row["n_bigrams"] == len(bgs)
    assert abs(row["nll"] - nll) < 1e-5


@settings(**_SETTINGS)
@given(
    st.lists(_word, min_size=2, max_size=10),
    st.lists(_word, min_size=2, max_size=10),
)
def test_dsir_matches_reference(spark, target_words, query_words):
    """Spark DSIR log-weight equals a pure-Python reference on a tiny
    corpus: one target doc, one raw-only doc, one query doc."""
    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.filtering import dsir_weights

    dim = 64
    t_text = " ".join(target_words)
    r_text = " ".join(w + "x" for w in target_words)  # disjoint-ish raw
    q_text = " ".join(query_words)
    df = spark.createDataFrame(
        [(1, "t", t_text), (2, "r", r_text), (3, "q", q_text)],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, target=F.col("source") == "t", dim=dim
        ).collect()
    }
    # reference: bucket via the engine's own xxhash64 (tiny local DF)
    all_tokens = (
        [("t", w) for w in t_text.split()]
        + [("r", w) for w in r_text.split()]
        + [("q", w) for w in q_text.split()]
    )
    bdf = spark.createDataFrame(all_tokens, "src string, w string").select(
        "src", "w", F.expr(f"pmod(xxhash64(w), {dim})").alias("b")
    )
    rows = bdf.collect()
    from collections import Counter

    ct = Counter(r["b"] for r in rows if r["src"] == "t")
    cr = Counter(r["b"] for r in rows if r["src"] in ("t", "r", "q"))
    tt, tr = sum(ct.values()), sum(cr.values())
    qb = [r["b"] for r in rows if r["src"] == "q"]
    lw = sum(
        math.log((ct[b] + 1) / (tt + dim)) - math.log((cr[b] + 1) / (tr + dim))
        for b in qb
    )
    assert abs(out[3]["log_weight"] - lw) < 1e-5
    assert out[3]["n_tokens"] == len(qb)


@settings(max_examples=6, deadline=None)
@given(
    n_docs=st.integers(1, 8),
    vocab=st.integers(1, 6),
    doc_len=st.integers(0, 40),
    seed=st.integers(0, 10_000),
)
def test_repetition_signals_invariants(spark, n_docs, vocab, doc_len, seed):
    """On ANY corpus: masked dup-5-gram coverage and the line
    fractions are true fractions in [0, 1]; a doc made of one word
    repeated >= 10 times is fully covered; n_lines counts occurrences
    of non-blank lines."""
    import random as _random

    from fastmlframework_spark.extensions.filtering import repetition_signals

    rng = _random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        toks = [rng.choice(words) for _ in range(doc_len)]
        # sprinkle line breaks
        text = " ".join(toks).replace(" ", "\n", doc_len // 7)
        rows.append((d, text))
    rows.append((n_docs, "x " * 12))  # fully self-repetitive
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(out) == {r[0] for r in rows}
    for r in out.values():
        assert 0.0 <= r["dup_line_frac"] <= 1.0
        assert 0.0 <= r["dup_line_char_frac"] <= 1.0
        assert 0.0 <= r["dup_5gram_word_frac"] <= 1.0
        assert r["top_2gram_char_frac"] >= 0.0
        assert r["n_lines"] >= 0
    assert out[n_docs]["dup_5gram_word_frac"] == 1.0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(_word, min_size=2, max_size=30), min_size=2, max_size=12
    )
)
def test_word_bigram_nll_positive_and_full_fit_default(spark, docs_words):
    """On random corpora: every scored doc has nll > 0 (probabilities
    < 1 after smoothing), n_bigrams == words-1, and fit_modulus=1
    scores every doc against the full-corpus model (same output row
    count as input)."""
    from fastmlframework_spark.extensions.filtering import word_bigram_nll

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in word_bigram_nll(df).collect()}
    assert len(out) == len(rows)
    for i, ws in enumerate(docs_words):
        assert out[i].n_bigrams == len(ws) - 1
        assert out[i].nll > 0
