"""Invariant tests for the corpus-filtering extensions
(extensions/filtering.py): Gopher rule semantics on hand-built
documents, LM-scoring direction (typical text scores lower NLL than
noise), DSIR weight direction (target-like docs weigh higher), and
exact packing arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastmlframework_spark.extensions.filtering import (
    GOPHER_THRESHOLDS,
    chargram_nll,
    dsir_weights,
    gopher_rule_flags,
    gopher_rules,
    length_bucket_packing,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then the fox "
    "runs off to the woods of the north where it is seen again " * 3
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_gopher_flags_per_rule(spark):
    rows = [
        (1, "s", GOOD),                                   # passes all
        (2, "s", "too short"),                            # fail_words
        (3, "s", None),                                   # NULL → fail_words
        (4, "s", " ".join(["# #"] * 60)),                 # symbols, no stopwords
        (5, "s", "\n".join(["- bullet item the a of"] * 60)),  # bullet lines
        (6, "s", "\n".join(["the a trailing off..."] * 60)),   # ellipsis lines
        (7, "s", " ".join(["12345"] * 60)),               # no alpha words
        (8, "s", " ".join(["w"] * 60)),                   # mean word len < 3
    ]
    got = {
        r["doc_id"]: r
        for r in gopher_rule_flags(_docs(spark, rows)).collect()
    }
    assert got[1]["passes"] and not any(
        got[1][c] for c in got[1].asDict() if c.startswith("fail_")
    )
    assert got[2]["fail_words"] and not got[2]["passes"]
    assert got[3]["fail_words"] and not got[3]["passes"]
    assert got[4]["fail_symbol"] and got[4]["fail_stopword"]
    assert got[5]["fail_bullet"]
    assert got[6]["fail_ellipsis"]
    assert got[7]["fail_alpha"]
    assert got[8]["fail_word_len"]


def test_gopher_report_counts(spark):
    rows = [(i, "a" if i % 2 else "b", GOOD if i < 6 else "tiny doc")
            for i in range(10)]
    rep = {r["source"]: r for r in gopher_rules(_docs(spark, rows)).collect()}
    assert rep["a"]["n_docs"] == 5 and rep["b"]["n_docs"] == 5
    # docs 6..9 are short: two in each source parity class
    assert rep["a"]["n_fail_words"] + rep["b"]["n_fail_words"] == 4
    assert rep["a"]["n_pass"] + rep["b"]["n_pass"] == 6


def test_gopher_thresholds_sane():
    th = GOPHER_THRESHOLDS
    assert th["min_words"] < th["max_words"]
    assert th["min_mean_word_len"] < th["max_mean_word_len"]


def test_chargram_nll_direction(spark):
    # Corpus of English-like text + one doc of line-noise: the noise
    # doc's character bigrams are rare under the corpus model → its
    # NLL must be the maximum.
    rows = [(i, "s", GOOD) for i in range(20)]
    rows.append((99, "s", "qzx jvk wqq zzj xqv kjz " * 10))
    out = chargram_nll(_docs(spark, rows)).collect()
    by_id = {r["doc_id"]: r["nll"] for r in out}
    assert by_id[99] == max(by_id.values())
    assert all(v > 0 for v in by_id.values())


def test_chargram_nll_drops_short_and_null(spark):
    rows = [(1, "s", GOOD), (2, "s", None), (3, "s", "x")]
    out = chargram_nll(_docs(spark, rows)).collect()
    assert sorted(r["doc_id"] for r in out) == [1]


def test_dsir_weights_direction(spark):
    # Target slice speaks "alpha"; the rest speaks "beta".  An unseen
    # doc written in alpha-vocabulary must out-weigh one written in
    # beta-vocabulary.
    alpha = "sun moon star sky cloud " * 8
    beta = "bolt gear cog wire pipe " * 8
    rows = [(i, "t", alpha) for i in range(10)]
    rows += [(i + 10, "r", beta) for i in range(10)]
    rows += [(100, "q", "sun star sky moon sun"), (101, "q", "gear cog pipe wire bolt")]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(df, target=F.col("source") == "t").collect()
    }
    assert out[100] > 0 > out[101]
    assert out[100] > out[101]


def test_dsir_zero_tokens(spark):
    rows = [(1, "t", "a b c"), (2, "r", "")]
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            _docs(spark, rows), target=F.col("source") == "t"
        ).collect()
    }
    assert out[2]["n_tokens"] == 0 and out[2]["log_weight"] == 0.0


def test_length_bucket_packing_exact(spark):
    # 3 docs of 10 tokens (bucket 16, capacity 32) and 40 docs of 50
    # tokens (bucket 64, capacity 8 → 5 batches).
    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(3)]
    rows += [(i + 3, "s", " ".join(["w"] * 50)) for i in range(40)]
    out = {r["bucket"]: r for r in
           length_bucket_packing(_docs(spark, rows)).collect()}
    assert out[16]["n_docs"] == 3
    assert out[16]["capacity"] == 32 and out[16]["n_batches"] == 1
    assert out[16]["pad_ratio"] == round(30 / (32 * 16), 6)
    assert out[64]["n_docs"] == 40 and out[64]["capacity"] == 8
    assert out[64]["n_batches"] == 5
    assert out[64]["pad_ratio"] == round(2000 / (5 * 8 * 64), 6)


def test_packing_overflow_clamps_to_top_bucket(spark):
    rows = [(1, "s", " ".join(["w"] * 500))]
    out = length_bucket_packing(_docs(spark, rows)).collect()
    assert len(out) == 1 and out[0]["bucket"] == 128
    # overflow docs truncate to the slot: occupied tokens == bucket
    assert out[0]["sum_tokens"] == 128
    assert out[0]["pad_ratio"] == round(128 / (1 * 4 * 128), 6)


def test_duplicate_spans_semantics(spark):
    from fastmlframework_spark.extensions.dedup import duplicate_spans

    # Docs 1 and 2 share an identical 12-word passage embedded at
    # different offsets in otherwise-unique text; doc 3 is unique.
    shared = " ".join(f"s{i}" for i in range(12))
    u = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    rows = [
        (1, "x", f"{u('a', 15)} {shared} {u('b', 15)}"),
        (2, "x", f"{u('c', 5)} {shared} {u('d', 25)}"),
        (3, "x", u("e", 40)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in duplicate_spans(df, n=10).collect()}
    # Only the two sharing docs are reported, one span each.
    assert sorted(out) == [1, 2]
    for k in (1, 2):
        assert out[k]["n_spans"] == 1
        # 12-word shared passage → 3 stride-1 10-gram windows, span
        # covers exactly the 12 shared words.
        assert out[k]["n_dup_windows"] == 3
        assert out[k]["dup_words"] == 12
    assert out[1]["n_words"] == 42 and out[1]["dup_frac"] == round(12 / 42, 6)


def test_duplicate_spans_exact_copy_full_coverage(spark):
    from fastmlframework_spark.extensions.dedup import duplicate_spans

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, "x", text), (2, "x", text)],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(df, n=10).collect()}
    assert sorted(out) == [1, 2]
    for k in (1, 2):
        assert out[k]["dup_frac"] == 1.0 and out[k]["dup_words"] == 30


def test_duplicate_spans_short_doc_clamps(spark):
    from fastmlframework_spark.extensions.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "x", "tiny dup doc"), (2, "x", "tiny dup doc")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(df, n=10).collect()}
    for k in (1, 2):
        assert out[k]["dup_words"] == 3 and out[k]["dup_frac"] == 1.0


def test_zipf_fit_direction(spark):
    from fastmlframework_spark.extensions.text import zipf_fit

    # Zipfian corpus: token w_i appears ~N/i times → slope near -1.
    # Uniform corpus: every token equally often → slope 0.
    zipf_tokens = []
    for i in range(1, 30):
        zipf_tokens += [f"w{i:02d}"] * (300 // i)
    uniform_tokens = [f"u{i:02d}" for i in range(1, 30)] * 10
    df = spark.createDataFrame(
        [(1, "zipf", " ".join(zipf_tokens)),
         (2, "flat", " ".join(uniform_tokens))],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in zipf_fit(df).collect()}
    assert out["zipf"]["zipf_slope"] < -0.8
    assert abs(out["flat"]["zipf_slope"]) < 0.05
    assert out["flat"]["n_distinct_tokens"] == 29


def test_incremental_minhash_dedup_directions(spark):
    from fastmlframework_spark.extensions.dedup import (
        incremental_minhash_dedup,
        minhash_band_index,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}w{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string",
    )
    index = minhash_band_index(corpus)
    # Batch: one exact copy of corpus doc 3, one novel doc.
    batch = spark.createDataFrame(
        [(100, " ".join(f"c3w{j}" for j in range(30))),
         (101, " ".join(f"z{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_corpus_matches"]
           for r in incremental_minhash_dedup(batch, index).collect()}
    assert out[100] >= 1     # copy collides with its original
    assert out[101] == 0     # novel doc is clean


def test_remove_duplicate_spans_ownership(spark):
    from fastmlframework_spark.extensions.dedup import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    u = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    rows = [
        (1, "x", f"{u('a', 15)} {shared}"),   # owner (smallest doc_id)
        (2, "x", f"{shared} {u('d', 15)}"),   # foreign: loses the passage
        (3, "x", u("e", 40)),                 # unique: byte-identical
        (4, "x", None),                       # NULL passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=10).collect()}
    assert out[1]["n_removed"] == 0 and shared in out[1]["clean_text"]
    assert out[2]["n_removed"] == 12 and "s0" not in out[2]["clean_text"]
    assert out[2]["clean_text"] == u("d", 15)
    assert out[3]["clean_text"] == rows[2][2] and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] is None


def test_remove_duplicate_spans_exact_copy_empties(spark):
    from fastmlframework_spark.extensions.dedup import remove_duplicate_spans

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, "x", text), (2, "x", text)],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=10).collect()}
    assert out[1]["clean_text"] == text and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 30


def test_nll_terciles_shape(spark):
    from fastmlframework_spark.extensions.filtering import (
        chargram_nll,
        nll_terciles,
    )

    rows = [(i, "en" if i % 2 else "de", GOOD + f" extra{i}") for i in range(30)]
    df = _docs(spark, rows).withColumnRenamed("source", "lang")
    scored = chargram_nll(df).join(df.select("doc_id", "lang"), on="doc_id")
    out = nll_terciles(scored, by="lang").collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
    for lang, buckets in by.items():
        # terciles: every bucket non-empty, head never larger than the
        # other two combined plus interpolation slack
        assert set(buckets) <= {"head", "middle", "tail"}
        assert sum(buckets.values()) == 15
        assert buckets.get("head", 0) >= 1


def test_vocab_coverage_monotone(spark):
    from fastmlframework_spark.extensions.text import vocab_coverage_curve

    rows = [(i, "s", GOOD) for i in range(5)]
    out = sorted(
        vocab_coverage_curve(_docs(spark, rows)).collect(),
        key=lambda r: r["vocab_size"],
    )
    covs = [r["coverage"] for r in out]
    assert covs == sorted(covs)           # monotone in vocab size
    assert covs[-1] == 1.0                # full vocab covers everything
    assert all(r["total_tokens"] == out[0]["total_tokens"] for r in out)



def test_packing_budget_below_largest_bucket_raises(spark):
    # budget must hold one largest-bucket sequence or capacity floors
    # to 0 and n_batches divides by zero
    import pytest as _pytest
    from fastmlframework_spark.extensions.filtering import LENGTH_BUCKETS

    rows = [(1, "s", "w w w")]
    with _pytest.raises(ValueError, match="budget"):
        length_bucket_packing(_docs(spark, rows), budget=LENGTH_BUCKETS[-1] - 1)


def test_repetition_signals_edges(spark):
    """Gopher repetition battery: dup-line fractions, top-2-gram
    coverage, masked dup-5-gram coverage — all bounded [0,1] except
    the (documented, Dolma-faithful) occurrence-weighted top fraction;
    NULL/empty/1-word docs report zeros."""
    from fastmlframework_spark.extensions.filtering import repetition_signals

    rows = [
        (1, "a b c\na b c\nunique line"),
        (2, "x y x y x y x y"),
        (3, None),
        (4, "w"),
        (5, ""),
        (6, "p q r s t p q r s t p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["dup_line_frac"] == 0.333333
    assert out[1]["dup_line_char_frac"] == round(5 / 21, 6)
    assert out[2]["top_2gram_char_frac"] == 0.8     # 'x y' 4x, 3 chars / 15
    assert out[2]["dup_5gram_word_frac"] == 1.0     # fully self-repetitive
    assert out[6]["dup_5gram_word_frac"] == 1.0
    for k in (3, 4, 5):
        r = out[k]
        assert r["dup_line_frac"] == r["top_2gram_char_frac"] == 0.0
        assert r["dup_5gram_word_frac"] == 0.0
    # masked coverage is a fraction of word positions — never above 1
    assert all(out[k]["dup_5gram_word_frac"] <= 1.0 for k in out)


def test_heaps_law_fit_matches_closed_form(spark):
    """The across-group log-log regression must equal the closed-form
    least squares over the per-group (ln N, ln V) points."""
    import math

    from fastmlframework_spark.extensions.text import heaps_law_fit

    rows = [
        (1, "a", "a b a b"),                      # N=4, V=2
        (2, "b", "a b c d a b c d"),              # N=8, V=4
        (3, "c", "a b c d e f g h a b c d e f g h"),  # N=16, V=8
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = heaps_law_fit(df, by="source").collect()[0]
    pts = [(math.log(4), math.log(2)), (math.log(8), math.log(4)),
           (math.log(16), math.log(8))]
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    beta = sum((x - mx) * (y - my) for x, y in pts) / sum(
        (x - mx) ** 2 for x, _ in pts
    )
    ln_k = my - beta * mx
    assert out["n_groups"] == 3
    assert abs(out["heaps_beta"] - round(beta, 6)) <= 1e-6
    assert abs(out["heaps_ln_k"] - round(ln_k, 6)) <= 1e-6
    # doubling corpus doubles vocab here -> beta == 1 exactly
    assert out["heaps_beta"] == 1.0


def test_c4_page_flags_and_clean_text(spark):
    from fastmlframework_spark.extensions.filtering import (
        c4_clean_text,
        c4_page_flags,
    )

    rows = [
        (1, "This is a fine first sentence. Here is another one! A third?"),
        (2, "function() { return 1; } Some text. More text. And more."),
        (3, "Lorem Ipsum dolor sit amet. Second sentence. Third sentence."),
        (4, "Read our Privacy Policy here. Second sentence. Third one."),
        (5, "Too short."),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_page_flags(df).collect()}
    assert got[1].passes
    assert got[2].fail_curly and not got[2].passes
    assert got[3].fail_lorem  # case-insensitive
    assert got[4].fail_policy
    assert got[5].fail_sentences
    assert got[6].fail_sentences and not got[6].passes  # NULL text

    text = (
        "A proper sentence with enough words here.\n"
        "short line.\n"
        "This line uses JavaScript for tracking purposes today.\n"
        "No terminal punctuation on this longer line here\n"
        "Another good long sentence that clearly qualifies too!"
    )
    (row,) = c4_clean_text(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()
    kept = row.clean_text.split("\n")
    assert kept == [
        "A proper sentence with enough words here.",
        "Another good long sentence that clearly qualifies too!",
    ]


def _py_bpe(rows, n_merges):
    """Reference BPE (Sennrich et al. 2016): explicit pairwise scan
    with leftmost-first merge application — the ground truth the
    padded-string replace() rewrite must reproduce."""
    from collections import Counter

    words = Counter()
    for _, t in rows:
        for w in (t or "").split():
            words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, l, r, l + r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference_scan(spark):
    from fastmlframework_spark.extensions.text import bpe_train

    rows = [
        (1, "low lower lowest low low newer newest new"),
        (2, "low newer wider wide wide aaa aaaa"),  # odd/even runs
        (3, None),  # NULL text must not contribute
    ]
    ref, _ = _py_bpe(rows, 8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=8).collect()]
    assert got == ref


def test_bpe_train_overlapping_run_semantics(spark):
    """Merge (a,a) over odd runs: leftmost-first gives [aa, a] for
    'aaa' — the replace() rewrite must not double-merge."""
    from fastmlframework_spark.extensions.text import bpe_encode, bpe_train

    rows = [(1, "aaa aaaa aa")]
    ref_merges, ref_vocab = _py_bpe(rows, 2)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=2).collect()]
    assert got == ref_merges

    enc = bpe_encode(df, [(m[1], m[2]) for m in ref_merges])
    (row,) = enc.collect()
    want = []
    for w in rows[0][1].split():
        want += ref_vocab[w]
    assert list(row.bpe_symbols) == want


def test_bpe_train_stops_when_no_pairs_left(spark):
    from fastmlframework_spark.extensions.text import bpe_train

    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    out = bpe_train(df, n_merges=50).collect()
    # only 2-char words: after merging 'ab' and 'cd' no pairs remain
    assert [r.merged for r in out] == ["ab", "cd"]


def test_bpe_train_distributed_path_matches_reference(spark):
    """driver_vocab_cap=0 forces the per-round Spark-job loop; it must
    agree with the independent pure-Python reference (same corpus as
    the default-path test above, which now runs driver-local)."""
    from fastmlframework_spark.extensions.text import bpe_train

    rows = [
        (1, "low lower lowest low low newer newest new"),
        (2, "low newer wider wide wide aaa aaaa"),
        (3, None),
    ]
    ref, _ = _py_bpe(rows, 8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe_train(df, n_merges=8, driver_vocab_cap=0).collect()
    ]
    assert got == ref


def test_bpe_train_driver_matches_distributed_on_corpus(spark, sf_dir_small):
    """The driver-local fast path must be bit-identical to the
    distributed loop on real data: merge table (in training order) AND
    post-merge vocabulary [__w, __syms, __wc] both equal at
    n_merges=10 on the sf0.001 documents table."""
    from fastmlframework_spark.extensions.text import bpe_train

    docs = spark.read.parquet(f"{sf_dir_small}/documents.parquet").select(
        "text"
    )
    m_fast, v_fast = bpe_train(docs, n_merges=10, return_vocab=True)
    m_slow, v_slow = bpe_train(
        docs, n_merges=10, return_vocab=True, driver_vocab_cap=0
    )
    assert [tuple(r) for r in m_fast.collect()] == [
        tuple(r) for r in m_slow.collect()
    ]
    fast = sorted(tuple(r) for r in v_fast.collect())
    slow = sorted(tuple(r) for r in v_slow.collect())
    assert fast == slow


def test_bpe_fertility_matches_reference_vocab(spark):
    from fastmlframework_spark.extensions.text import bpe_fertility

    rows = [
        (1, "low lower lowest low low", "web"),
        (2, "newer newest new low", "web"),
        (3, "aaa aaaa aa", "books"),
        (4, None, "books"),  # NULL text: no words, group may vanish
    ]
    ref_merges, ref_vocab = _py_bpe([(i, t) for i, t, _ in rows], 4)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_words, r.n_tokens, r.fertility, r.chars_per_token)
        for r in bpe_fertility(df, by="source", n_merges=4).collect()
    }
    import collections

    want = {}
    per_src = collections.defaultdict(lambda: [0, 0, 0])
    for _, t, src in rows:
        for w in (t or "").split():
            per_src[src][0] += 1
            per_src[src][1] += len(ref_vocab[w])
            per_src[src][2] += len(w)
    for src, (nw, nt, nc) in per_src.items():
        want[src] = (nw, nt, round(nt / nw, 6), round(nc / nt, 6))
    assert got == want


def test_word_bigram_nll_separates_shuffled_from_natural(spark):
    """A document whose words repeat the corpus's dominant bigram
    pattern scores lower NLL than one using the same vocabulary in an
    order the fit slice never saw (word order is the whole point of
    the bigram rung vs chargram)."""
    from fastmlframework_spark.extensions.filtering import word_bigram_nll

    natural = "the cat sat on the mat " * 30
    shuffled = "mat the on sat the cat " * 30
    df = spark.createDataFrame(
        [(0, natural), (2, natural), (4, natural), (1, shuffled)],
        "doc_id long, text string",
    )
    # fit on the even ids (all natural); score everything
    got = {
        r.doc_id: r.nll
        for r in word_bigram_nll(df, fit_modulus=2).collect()
    }
    assert got[1] > got[0]
    assert got[0] == got[2] == got[4]


def test_word_bigram_nll_drops_short_docs_and_counts_pairs(spark):
    from fastmlframework_spark.extensions.filtering import word_bigram_nll

    df = spark.createDataFrame(
        [(1, "one"), (2, None), (3, "a b c d"), (4, "  "), (5, "x y")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in word_bigram_nll(df).collect()}
    assert set(rows) == {3, 5}
    assert rows[3].n_bigrams == 3 and rows[5].n_bigrams == 1
    assert all(r.nll > 0 for r in rows.values())


def test_cms_overestimates_only_and_exact_at_wide_width(spark):
    """CMS error is one-sided: cms_count >= true_count for every
    token, at any width; a deliberately narrow width must produce at
    least one strict overestimate (collisions), while counts stay
    exact for tokens that happen to collide with nothing."""
    from fastmlframework_spark.extensions.text import cms_token_counts

    rows = [(i, "alpha beta gamma " * (i % 5 + 1) + f"tok{i}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    narrow = cms_token_counts(df, depth=2, width=16, top_n=30).collect()
    assert narrow, "top-n probe must return rows"
    assert all(r.cms_count >= r.true_count for r in narrow)
    assert any(r.cms_count > r.true_count for r in narrow), (
        "width=16 over a 40+-token vocabulary must collide somewhere"
    )


def test_cms_rejects_bad_params(spark):
    import pytest
    from fastmlframework_spark.extensions.text import cms_token_counts

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="power of two"):
        cms_token_counts(df, width=1000)
    with pytest.raises(ValueError, match="depth"):
        cms_token_counts(df, depth=0)


def test_cms_sketch_shuffle_is_counter_bounded(spark):
    """The sketch aggregation must partially aggregate map-side: the
    exchange feeding the counter groupBy carries (r, b) keys, so the
    plan shows a partial HashAggregate below the shuffle — the
    bounded-shuffle contract that makes the sketch worth it at
    100 TB."""
    from fastmlframework_spark.extensions.text import cms_token_counts

    rows = [(i, "alpha beta gamma delta") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = cms_token_counts(df)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # The structural contract: the sketch shuffle is keyed on the
    # (depth, bucket) counter grid, NOT on tokens.  Anchor on the
    # final counter aggregate (the HashAggregate emitting __c via
    # count(1)): its direct child must be a grid-keyed Exchange, fed
    # by a partial_count HashAggregate on the same keys (map-side
    # combine into the bounded counter grid before any bytes move).
    # Catalyst renames `__rb.__r`/`__rb.__b` grouping expressions, so
    # the keys are matched positionally, not by name.
    cnt = [
        i for i, l in enumerate(lines)
        if "HashAggregate" in l and "functions=[count(1)]" in l
        and "__c#" in l
    ]
    assert len(cnt) == 1, f"no counter aggregate emitting __c:\n{plan}"
    i = cnt[0]
    assert "Exchange hashpartitioning" in lines[i + 1], (
        f"counter aggregate not fed by a shuffle exchange:\n{plan}"
    )
    assert (
        "HashAggregate" in lines[i + 2]
        and "partial_count(1)" in lines[i + 2]
    ), f"grid exchange not fed by a partial counter aggregate:\n{plan}"
    # the partial aggregate's grouping keys must be the SAME pair the
    # exchange partitions on (grid keys, 2 of them — not the token)
    import re

    ex_keys = re.search(r"hashpartitioning\(([^)]*), \d+\)", lines[i + 1])
    pa_keys = re.search(r"HashAggregate\(keys=\[([^\]]*)\]", lines[i + 2])
    assert ex_keys and pa_keys
    ex_cols = [k.strip() for k in ex_keys.group(1).split(",")]
    pa_cols = [k.strip() for k in pa_keys.group(1).split(",")]
    assert ex_cols == pa_cols and len(ex_cols) == 2, (
        f"exchange keys {ex_cols} != partial-agg keys {pa_cols}:\n{plan}"
    )
    assert not any("__t#" in k for k in ex_cols), (
        f"sketch shuffle is token-keyed, counter bound broken:\n{plan}"
    )
    # the only token-keyed exchanges allowed are top_n-bounded: the
    # exact-truth probe groupBy and the final min-over-depth gather
    # (top_n·depth rows after the broadcast join) — never the sketch
    tok_ex = [
        l for l in lines
        if "Exchange hashpartitioning" in l and "__t#" in l
    ]
    assert len(tok_ex) <= 2, f"unexpected token-keyed shuffles:\n{plan}"


def test_source_divergence_identities_and_bounds(spark):
    """Single-source corpus: p == q so both divergences are exactly 0.
    Multi-source: KL >= 0, 0 <= JS <= ln 2, and a disjoint-vocabulary
    source must dominate near-uniform ones."""
    import math

    from fastmlframework_spark.extensions.text import source_divergence

    one = spark.createDataFrame(
        [(1, "only", "alpha beta alpha gamma")],
        "doc_id long, source string, text string",
    ).select("source", "text")
    r = source_divergence(one).collect()
    assert len(r) == 1 and r[0].kl_vs_corpus == 0.0 and r[0].js_vs_corpus == 0.0

    rows = []
    for i in range(20):
        rows.append((i, "common_a", "alpha beta gamma delta epsilon"))
        rows.append((100 + i, "common_b", "alpha beta gamma delta zeta"))
        rows.append((200 + i, "outlier", "qqq www eee rrr ttt yyy"))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).select("source", "text")
    out = {r.source: r for r in source_divergence(df).collect()}
    ln2 = math.log(2)
    for r in out.values():
        assert r.kl_vs_corpus >= 0
        assert 0 <= r.js_vs_corpus <= ln2 + 1e-9
    assert out["outlier"].kl_vs_corpus > out["common_a"].kl_vs_corpus
    assert out["outlier"].js_vs_corpus > out["common_a"].js_vs_corpus
    # disjoint vocab at 1/3 corpus mass: KL = ln(N/n_s) exactly
    assert out["outlier"].kl_vs_corpus == round(
        math.log(1 / (out["outlier"].n_tokens / sum(
            r.n_tokens for r in out.values()))), 6)
