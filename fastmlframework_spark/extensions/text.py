"""Text-analysis operators for training-data pipelines (SURVEY.md
§7.5): per-document statistics, quality scoring, language ID,
token counting, fingerprinting.

Beyond-reference extensions (BASELINE.json north star) built on the
same operator style as §2: everything is a JVM-side expression
(regexp/length/aggregate higher-order functions) — no Python UDFs in
the hot path, so a 100 TB documents table profiles in one scan with
whole-stage codegen.

Patterns match between Spark (Java regex) and DuckDB (RE2) for every
pattern used here, which is what makes the oracle checks exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from fastmlframework_spark.core import checkpoints

# Tiny per-language stopword alternations (language-ID heuristic).
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "es": r"\b(el|la|que|los|una)\b",
    "fr": r"\b(le|les|des|une|est)\b",
    "zh": r"(的|是|了|在|我)",
}

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[A-Za-z]+"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"


def count_punct(t: Column) -> Column:
    """Count of ``PUNCT_PATTERN`` chars — as the LENGTH of the text
    with every ``[A-Za-z0-9\\s]+`` run deleted, which is the same
    number (class complement: each surviving char is exactly one
    single-char match) but ~18× faster at corpus scale: Java regex
    pays per-MATCH dispatch, and with a single-char negated class
    every punctuation character is its own match, while the
    run-delete form iterates long alnum/whitespace runs."""
    return F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]+", ""))


def count_bpe_tokens(t: Column) -> Column:
    """Count of ``TOKEN_PATTERN`` matches via its three disjoint
    branches — letter runs + digit runs + punctuation chars (the
    branch classes cannot overlap, so the counts add exactly).  ~3×
    faster than counting the alternation: the punct branch dominates
    match count and goes through ``count_punct``'s run-delete form."""
    return (
        F.regexp_count(t, F.lit(WORD_PATTERN))
        + F.regexp_count(t, F.lit(r"[0-9]+"))
        + count_punct(t)
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: char/word/token counts, punctuation
    ratio, average word length — the building blocks of quality
    filters (C4-style corpus curation)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.regexp_count(t, F.lit(WORD_PATTERN))
    n_tokens = count_bpe_tokens(t)
    n_punct = count_punct(t)
    return df.withColumns(
        {
            "n_chars": n_chars.cast("long"),
            "n_words": n_words.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
            "avg_word_len": F.round(
                (n_chars - F.regexp_count(t, F.lit(r"\s"))) /
                F.greatest(n_words, F.lit(1)),
                6,
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword quality heuristic in [0,1]:
    documents that are too short, all punctuation, or stopword-free
    (non-linguistic) score low.  Deliberately simple and portable —
    the shape of a production quality scorer, expressed as one
    projection."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_words = F.regexp_count(t, F.lit(WORD_PATTERN))
    punct_ratio = count_punct(t) / n_chars
    stop_hits = F.regexp_count(t, F.lit(LANG_STOPWORDS["en"]))
    length_term = F.least(F.length(t) / F.lit(200.0), F.lit(1.0))
    word_term = F.least(n_words / F.lit(30.0), F.lit(1.0))
    stop_term = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    score = (
        0.4 * length_term + 0.4 * word_term + 0.2 * stop_term
    ) * (1.0 - F.least(punct_ratio * 2.0, F.lit(1.0)))
    return df.withColumn("quality", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language ID: per-language stopword-hit counts,
    argmax with deterministic (hits desc, lang asc) tie-break.
    One scan, five regexp counters, no shuffle."""
    t = F.col(text_col)
    hit_cols = {
        lang: F.regexp_count(t, F.lit(pat))
        for lang, pat in LANG_STOPWORDS.items()
    }
    # argmax via array of (hits, lang) structs: max_by with lang asc
    # tie-break == array_max over (hits, negated-lang) is awkward, so
    # use a chained CASE over sorted langs (first maximal wins).
    langs = sorted(LANG_STOPWORDS)
    max_hits = F.greatest(*[hit_cols[lang] for lang in langs])
    pred: Column = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(hit_cols[lang] == max_hits, F.lit(lang)).otherwise(pred)
    out = df.withColumn("pred_lang", pred)
    return out.withColumn(
        "pred_lang",
        F.when(max_hits == 0, F.lit("unknown")).otherwise(F.col("pred_lang")),
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letters /
    digits / single punctuation as separate tokens)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": F.regexp_count(t, F.lit(r"\S+")).cast("long"),
            "bpe_tokens": count_bpe_tokens(t).cast("long"),
        }
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", shingle_len: int = 5
) -> DataFrame:
    """Document fingerprint: min md5-hash over character shingles
    (single-permutation minhash — the rolling-hash fingerprint).
    Pure higher-order-function expression (transform + array_min over
    a sequence), portable to the DuckDB oracle, zero Python."""
    k = shingle_len
    expr = (
        f"array_min(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring({text_col}, i, {k})), 1, 15), 16, 10) as bigint)))"
    )
    # ~length(text) md5 calls per row: spread small single-split inputs
    # over all cores before the CPU-bound projection.
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par).withColumn("fingerprint", F.expr(expr))


def tfidf_top_terms(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document → [key, term, score, rank].

    Exact term-level TF-IDF (tf · ln((N+1)/(df+1)), smoothed) over the
    exploded word list — term identity is preserved (unlike the
    HashingTF trick), every stage is a grouped aggregate or a
    per-document window, and the document-frequency table is a
    broadcastable vocabulary aggregate.  Ties break on the term for
    determinism."""
    from pyspark.sql import Window

    words = df.select(
        F.col(key_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(key_col).distinct().count()
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(F.broadcast(docfreq), on="term").withColumn(
        "score",
        F.round(
            F.col("tf")
            * F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)),
            6,
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "term", "score", "rank")
    )


def canonicalize(
    df: DataFrame, text_col: str = "text", out_col: str = "canon"
) -> DataFrame:
    """Text canonicalization ahead of dedup: lowercase, strip
    punctuation, collapse whitespace runs, trim.  Near-dup detectors
    (minhash/simhash) and exact dedup both sharpen substantially when
    run over the canonical form — trivial formatting variants collapse
    to one digest.  Pure per-row expressions; map-only at scale.

    Computed as split-on-whitespace → per-word punctuation strip →
    drop emptied words → join, which equals the naive two-pass
    ``regexp_replace`` chain (punctuation deletion never creates or
    destroys a whitespace run; a word emptied by stripping is exactly
    a run the collapse pass would merge) but runs ~9× faster on real
    docs: Java's regex-with-StringBuffer rebuilds the full string per
    pass, while the per-word form does one ``\\s+`` split and tiny
    per-token replaces.  The SQL oracle keeps the two-pass chain —
    bit-identical output is pinned by the driver hash."""
    c = F.expr(
        f"array_join(filter(transform(split(lower({text_col}), '\\\\s+'),"
        f" __w -> regexp_replace(__w, '[^a-z0-9]+', '')),"
        f" __w -> __w != ''), ' ')"
    )
    return df.withColumn(out_col, c)


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    key_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set
    → [key, bm25] (documents matching no term are dropped).

    Shuffle-free retrieval scoring: for a bounded query (terms known up
    front), per-term tf is a ``filter``+``size`` over the token array —
    a per-row expression, no explode.  The only aggregate is the 1-row
    corpus-stats frame (N, avgdl, per-term document frequency), which
    broadcasts back over the scan; the whole query is one corpus read
    plus a tiny map-side join.  idf uses the standard
    ln(1 + (N - df + .5)/(df + .5)) form, so scores are non-negative
    even for terms in most documents.

    Raises ``ValueError`` on an empty term set; duplicate terms are
    collapsed (order-preserving) so no term double-counts."""
    if not terms:
        raise ValueError("bm25_scores: terms must be non-empty")
    terms = tuple(dict.fromkeys(terms))
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )

    def _tf(term: str) -> Column:
        # Closure per term: a default-arg lambda would change the
        # callable's arity and PySpark would misread it as (x, i).
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [_tf(term).alias(f"__tf_{i}") for i, term in enumerate(terms)]
    base = df.select(F.col(key_col), F.size(toks).alias("__dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        term_score = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
        score = term_score if score is None else score + term_score
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(sum(F.col(f"__tf_{i}") for i in range(len(terms))) > 0)
        .select(key_col, "bm25")
    )


def token_entropy(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group Shannon entropy of the token distribution →
    [by, n_tokens, n_distinct_tokens, entropy] (nats).

    Diversity screen for corpus mixing: low entropy flags templated or
    repetitive sources.  Uses the algebraic identity
    H = ln(N) - (Σ c·ln c)/N so a single (group, token) count plus one
    tiny per-group aggregate suffices — two shuffles total, both
    map-side combined, no join back for the group totals."""
    tok = df.select(
        F.col(by),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != F.lit(""))
    counts = tok.groupBy(by, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy(by).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.round(
            F.log(F.sum("__c"))
            - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c"),
            6,
        ).alias("entropy"),
    )


def placeholder_weights(dim: int, seed: int = 11) -> list[float]:
    """Deterministic stand-in weight vector for the hashed classifier —
    ONE derivation shared by the Spark operator and its DuckDB oracle
    generator (queries/text.py), so the two can't drift."""
    import random as _random

    rng = _random.Random(seed)
    return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]


def hashed_linear_score(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    weights: list[float] | None = None,
    bias: float = 0.0,
    dim: int = 256,
    seed: int = 11,
) -> DataFrame:
    """fastText-style hashed linear classifier applied corpus-wide →
    [key, n_terms, score]: score = sigmoid(bias + mean_t w[h(t) % dim])
    over whitespace tokens, with the trained weight vector shipped as
    ONE array literal (CCNet's quality-classifier shape — the model is
    tiny, the corpus is not; applying it is a pure map, no shuffle, no
    Python).

    ``dim`` must be a power of two: the bucket index is ``pmod`` of
    the SIGNED JVM xxhash64, and power-of-two moduli make that equal
    to the unsigned-hash remainder, which is what the DuckDB oracle
    twin (queries/xxh64_sql.py) computes.  ``weights=None`` derives a
    deterministic seed-``seed`` placeholder vector — swap in real
    trained weights in production."""
    if dim <= 0 or dim & (dim - 1):
        raise ValueError("dim must be a power of two (see docstring)")
    if weights is None:
        weights = placeholder_weights(dim, seed)
    if len(weights) != dim:
        raise ValueError(f"weights must have length {dim}")
    wlit = F.lit([float(x) for x in weights])
    words = f"split({text_col}, '\\\\s+')"
    total = (
        f"aggregate(transform({words}, "
        f"w -> element_at(__W, CAST(pmod(xxhash64(w), {dim}) + 1 AS INT))), "
        "0.0D, (a, v) -> a + v)"
    )
    return (
        df.withColumn("__W", wlit)
        .select(
            F.col(key_col),
            F.expr(f"size({words})").cast("long").alias("n_terms"),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.lit(float(bias))
                            + F.expr(total) / F.expr(f"size({words})")
                        )
                    )
                ),
                6,
            ).alias("score"),
        )
    )


def zipf_fit(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Zipf-law fit of the per-group token frequency distribution →
    [by, n_tokens, n_distinct_tokens, zipf_slope, zipf_intercept]
    (least-squares of ln(freq) on ln(rank); natural text sits near
    slope −1, templated/generated corpora drift toward 0).

    Corpus-health diagnostic complementing ``token_entropy``: the
    token-count aggregate is the only corpus-sized shuffle (map-side
    combined, keys bounded by vocabulary), ranking is a per-group
    window over the vocabulary-sized count table, and the fit itself
    is one ``regr_slope``/``regr_intercept`` aggregate.  Rank ties
    break (count desc, token asc) identically in the DuckDB twin.

    Scale bound: the rank window parallelizes across groups but each
    group's task sorts that group's FULL vocabulary — fine for
    per-source/per-language groups up to ~10⁷ distinct tokens; for a
    whole-web single-group fit, prefer fitting the head (the
    ``vocab_coverage_curve`` TakeOrdered pattern) — the count-1 tail
    is the noisy part of a Zipf fit anyway."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(by),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != F.lit(""))
    counts = tok.groupBy(by, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(by).orderBy(F.desc("__c"), F.asc("__tok"))
    ranked = counts.withColumn("__r", F.row_number().over(w))
    return ranked.groupBy(by).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.round(
            F.regr_slope(F.log("__c"), F.log("__r")), 6
        ).alias("zipf_slope"),
        F.round(
            F.regr_intercept(F.log("__c"), F.log("__r")), 6
        ).alias("zipf_intercept"),
    )


def vocab_coverage_curve(
    df: DataFrame,
    vocab_sizes: tuple[int, ...] = (8, 16, 24, 32),
    text_col: str = "text",
) -> DataFrame:
    """Token-occurrence coverage of the top-``v`` vocabulary for each
    candidate size → [vocab_size, covered_tokens, total_tokens,
    coverage] — the tokenizer-sizing curve (what fraction of the
    corpus a v-entry word vocabulary explains; the knee locates the
    OOV/size trade-off).

    One corpus-sized token count (map-side combined, vocabulary-
    bounded keys); the curve then only needs the TOP ``max(sizes)``
    tokens plus one scalar total, so the rank comes from
    ``orderBy(...).limit(n)`` — Spark's TakeOrderedAndProject, a
    per-partition top-n merge that never globally sorts or
    single-partition-windows the vocabulary (web-corpus whitespace
    vocabularies run 10⁸-10⁹ distinct tokens; candidate sizes are
    ≤256k).  The row_number window that follows runs over those ≤
    ``max(sizes)`` survivors only.  Rank ties break (count desc,
    token asc) identically in the DuckDB twin."""
    from pyspark.sql import Window

    n_head = int(max(vocab_sizes))
    tok = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok")
    ).filter(F.col("__tok") != F.lit(""))
    counts = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    head = counts.orderBy(F.desc("__c"), F.asc("__tok")).limit(n_head)
    w = Window.orderBy(F.desc("__c"), F.asc("__tok"))
    ranked = head.withColumn("__r", F.row_number().over(w))
    # total from the COUNTS frame, not a second tok.agg branch: the
    # subtree matches the head branch's aggregation, so the corpus is
    # scanned/exploded once and AQE can reuse the exchange (a separate
    # tok.agg(count) showed up as a second Scan parquet in PLANS.md).
    total = counts.agg(F.sum("__c").alias("__total"))
    sizes = F.explode(
        F.array(*[F.lit(int(v)) for v in vocab_sizes])
    ).alias("vocab_size")
    return (
        ranked.crossJoin(ranked.sparkSession.range(1).select(sizes))
        .groupBy("vocab_size")
        .agg(
            F.sum(
                F.when(F.col("__r") <= F.col("vocab_size"), F.col("__c"))
                .otherwise(F.lit(0))
            ).alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("total_tokens", F.col("__total"))
        .select(
            F.col("vocab_size").cast("long"),
            F.col("covered_tokens").cast("long"),
            F.col("total_tokens").cast("long"),
            F.round(
                F.col("covered_tokens") * 1.0 / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top: int = 20
) -> DataFrame:
    """The first BPE training step, corpus-scale → [pair,
    n_occurrences]: adjacent character-pair frequencies weighted by
    word occurrence counts — the statistic a byte-pair-encoding
    tokenizer fit greedily maximizes each merge round (Sennrich et
    al. 2016).  Returns the ``top`` candidates (count desc, pair asc
    — deterministic boundary).

    Plan: token counting collapses the corpus to its word VOCABULARY
    first (map-side combined groupBy — pairs are then weighted per
    word TYPE, not re-counted per token occurrence), pair explode is
    bounded by Σ word lengths over the vocabulary, and the top-k is
    an ``orderBy().limit()`` TakeOrderedAndProject — no global sort,
    no single-partition window.  The full iterative fit would rerun
    this with merged symbols; one round is the representative,
    oracle-checkable unit."""
    tok = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__w")
    ).filter(F.col("__w") != F.lit(""))
    vocab = tok.groupBy("__w").agg(F.count(F.lit(1)).alias("__wc"))
    # adjacent char pairs via substring — sequence(1, 0) is DESCENDING
    # in Spark, so short words need the explicit empty branch
    pairs = F.expr(
        "CASE WHEN length(__w) >= 2 THEN "
        "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"
        " ELSE array() END"
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "__wc")
        .groupBy("pair")
        .agg(F.sum("__wc").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(top)
    )


def _bpe_train_driver(
    word_counts: list[tuple[str, int]], n_merges: int
) -> tuple[
    list[tuple[int, str, str, str, int]], list[tuple[str, str, int]]
]:
    """In-process BPE merge loop over a collected word-type table →
    (merges, vocab rows).  Bit-identical to the distributed loop:
    pair counts include every adjacent position (overlaps counted),
    the argmax tie-break is (count desc, lhs asc, rhs asc) — Python
    code-point string order equals Spark/DuckDB UTF-8 binary order
    because UTF-8 preserves code-point order — and the merge rewrite
    is leftmost non-overlapping, exactly what the padded-string
    ``replace()`` does.  Incremental bookkeeping (only words
    containing the merged pair are rewritten; pair counts are
    adjusted by delta) makes a realistic 32k-merge fit linear in
    touched words per round instead of a full vocab pass."""
    words: list[list[str]] = [list(w) for w, _ in word_counts]
    wcs: list[int] = [wc for _, wc in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add(idx: int, sign: int) -> None:
        syms, wc = words[idx], wcs[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            c = pair_counts.get(p, 0) + sign * wc
            if c:
                pair_counts[p] = c
            else:
                pair_counts.pop(p, None)
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)
            else:
                # Drop the stale index eagerly (ADVICE r8): a rewrite
                # that eliminates a pair from this word must not leave
                # the word in that pair's index — grow-only sets would
                # re-scan every historic holder on each later merge of
                # the pair (time) and pin dead indices (memory) over a
                # realistic 32k-merge fit.  _add(idx, +1) re-registers
                # the pairs the NEW form actually contains.
                s = pair_words.get(p)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        pair_words.pop(p, None)

    for idx in range(len(words)):
        _add(idx, +1)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not pair_counts:
            break
        (lhs, rhs), pc = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, pc))
        merged = lhs + rhs
        touched = pair_words.pop((lhs, rhs), set())
        for idx in touched:
            syms = words[idx]
            out: list[str] = []
            i, changed = 0, False
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                _add(idx, -1)
                words[idx] = out
                _add(idx, +1)

    vocab_rows = [
        (w, " " + "  ".join(words[i]) + " ", wcs[i])
        for i, (w, _) in enumerate(word_counts)
    ]
    return merges, vocab_rows


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    return_vocab: bool = False,
    driver_vocab_cap: int = 2_000_000,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Full ITERATIVE BPE tokenizer fit (Sennrich et al. 2016) →
    the learned merge table [merge_rank, lhs, rhs, merged,
    pair_count], one row per merge round in training order.

    Scale contract: the corpus is scanned ONCE — the word-count
    groupBy collapses it to its VOCABULARY (Heaps-bounded: ~N^0.5
    types for N tokens), and every merge round runs over that small
    table, never the corpus.  Each round is one vocabulary-sized
    pair-count aggregate + a 1-row argmax collect (count desc, pair
    asc — the deterministic boundary) + a map-only merge rewrite.

    The merge rewrite is the trick that keeps both the Spark plan and
    the SQL twin loop-free per round: a word's symbol sequence is
    kept as a DOUBLE-space-joined, single-space-padded string
    (``' h  e  l  l  o '``), so applying merge (l, r) is a literal
    ``replace(syms, ' l  r ', ' lr ')``.  Non-overlapping
    leftmost-first replacement is exactly BPE's greedy merge order,
    and because every symbol carries its own delimiters on both
    sides, adjacent matches never share characters — replace() in
    Spark and DuckDB agree byte-for-byte (symbols are whitespace-free
    by construction; chars-of-word splitting assumes BMP text — the
    engines' UTF-16 vs codepoint indexing only diverges on astral
    planes).

    Lineage is truncated with an eager localCheckpoint every few
    rounds — the same discipline as ``connected_components``.  A
    checkpoint EVERY round would double the job count for nothing:
    between checkpoints the chain is narrow map-only replaces, so a
    round's aggregate re-applies at most ``ckpt_every`` cheap string
    rewrites over the vocab table.  Driver transfer is ONE row per
    round.

    With ``return_vocab=True`` returns ``(merges, vocab)`` where
    ``vocab`` is the post-merge vocabulary [__w, __syms, __wc] —
    the word → symbol-sequence map consumers join against instead of
    re-encoding the corpus (``bpe_fertility``).

    Driver-local fast path: a realistic tokenizer fit is ~32k merge
    rounds, and one sequential Spark job per round is hours of
    job-launch overhead even though each job is tiny.  The vocabulary
    is Heaps-bounded (~N^0.5 types), so when it fits under
    ``driver_vocab_cap`` rows (checked with one COUNT job) the
    word-type table is collected ONCE and the merge loop runs
    in-process with incremental pair bookkeeping
    (``_bpe_train_driver`` — bit-identical results, equality-pinned
    in tests).  The corpus itself is still reduced distributedly; only
    the Heaps-bounded (word, count) table crosses to the driver —
    ~10⁶ rows for a 100 TB web corpus is tens of MB.  Set
    ``driver_vocab_cap=0`` to force the distributed loop (the
    oracle-twinned demo path, and the fallback when the vocab really
    is too big to collect)."""
    ckpt_every = 4
    words = (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
            ).alias("__w")
        )
        .filter(F.col("__w") != F.lit(""))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wc"))
    )
    spark = df.sparkSession
    if driver_vocab_cap:
        # The corpus→vocab reduction is the expensive pass at 100 TB;
        # persist the Heaps-bounded result so the cap check and the
        # collect don't each re-scan the corpus.
        words = words.persist()
    if driver_vocab_cap and words.count() <= driver_vocab_cap:
        collected = [(r["__w"], r["__wc"]) for r in words.collect()]
        words.unpersist()
        merges, vocab_rows = _bpe_train_driver(collected, n_merges)
        merges_df = spark.createDataFrame(
            merges,
            "merge_rank int, lhs string, rhs string, merged string,"
            " pair_count long",
        )
        if return_vocab:
            vocab_df = spark.createDataFrame(
                vocab_rows, "__w string, __syms string, __wc long"
            )
            return merges_df, vocab_df
        return merges_df
    vocab = words.select(
        "__w",
        F.concat(
            F.lit(" "), F.array_join(F.split("__w", ""), "  "), F.lit(" ")
        ).alias("__syms"),
        "__wc",
    )
    vocab = checkpoints.checkpoint(vocab, eager=True)
    words.unpersist()  # no-op unless the over-cap check persisted it
    last_ckpt = vocab
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        s = F.expr("split(trim(__syms), '  ')")
        pair_arr = F.expr(
            "transform(sequence(1, size(__s) - 1),"
            " i -> struct(__s[i - 1] AS lhs, __s[i] AS rhs))"
        )
        best = (
            vocab.select(s.alias("__s"), "__wc")
            .filter(F.size("__s") >= 2)
            .select(F.explode(pair_arr).alias("__p"), "__wc")
            .groupBy("__p.lhs", "__p.rhs")
            .agg(F.sum("__wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, pc = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        merges.append((rank, lhs, rhs, lhs + rhs, pc))
        nxt = vocab.withColumn(
            "__syms",
            F.replace(
                F.col("__syms"),
                F.lit(f" {lhs}  {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ),
        )
        if rank % ckpt_every == 0:
            nxt = checkpoints.checkpoint(nxt, eager=True)
            checkpoints.release(last_ckpt)
            last_ckpt = nxt
        vocab = nxt
    merges_df = spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )
    if return_vocab:
        # Re-checkpoint so the returned frame owns its blocks before
        # the loop's intermediate checkpoint is released.
        vocab = checkpoints.checkpoint(vocab, eager=True)
        if last_ckpt is not vocab:
            checkpoints.release(last_ckpt)
        return merges_df, vocab
    checkpoints.release(last_ckpt)
    return merges_df


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_symbols",
) -> DataFrame:
    """Apply a learned BPE merge table to a corpus → ``df`` +
    ``out_col: array<string>`` of per-word symbol sequences,
    flattened across the document in word order.

    Pure map-only: each word becomes its padded symbol string, every
    merge is one literal ``replace`` (the merge table is a handful of
    LITERALS compiled into the plan — the broadcast-free small-model
    pattern), and the final split recovers the symbol array.  Merge
    literals are bound as Column values, never spliced into SQL text,
    so symbols containing quotes are safe.  No shuffle, no UDF; a
    100 TB corpus encodes in one codegen'd scan."""

    def _encode_word(w: Column) -> Column:
        s = F.concat(F.lit(" "), F.array_join(F.split(w, ""), "  "), F.lit(" "))
        for lhs, rhs in merges:
            s = F.replace(
                s, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
            )
        return F.split(F.trim(s), "  ")

    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: w != F.lit(""),
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, _encode_word))
    )


def bpe_fertility(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
    n_merges: int = 10,
) -> DataFrame:
    """Tokenizer fertility audit → [by, n_words, n_tokens, fertility,
    chars_per_token]: train BPE for ``n_merges`` rounds on the whole
    corpus, then measure tokens-per-word (fertility) and
    chars-per-token per group — the standard check that a tokenizer
    doesn't over-fragment some source/language (fertility ≫ 1 on one
    slice means that slice pays more sequence length per word of
    content than the rest of the mix).

    Scale contract: the corpus is scanned ONCE more after training —
    for per-(group, word) counts, a vocabulary-bounded table.  The
    encode step never touches documents: each distinct word's token
    count is read off the TRAINED VOCABULARY (word → merged symbol
    string), and the group stats are weighted sums over the
    (group, word) counts joined to that vocab table — a join between
    two Heaps-bounded sides, corpus-size-free."""
    merges, vocab = bpe_train(
        df, text_col=text_col, n_merges=n_merges, return_vocab=True
    )
    enc = vocab.select(
        "__w",
        F.size(F.expr("split(trim(__syms), '  ')")).alias("__ntok"),
    )
    gw = (
        df.select(
            F.col(by),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
            ).alias("__w"),
        )
        .filter(F.col("__w") != F.lit(""))
        .groupBy(by, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    toks = F.sum(F.col("__c") * F.col("__ntok"))
    return (
        gw.join(enc, on="__w")
        .groupBy(by)
        .agg(
            F.sum("__c").alias("n_words"),
            toks.alias("n_tokens"),
            F.round(toks / F.sum("__c"), 6).alias("fertility"),
            F.round(
                F.sum(F.col("__c") * F.length("__w")) / toks, 6
            ).alias("chars_per_token"),
        )
        .orderBy(by)
    )


def heaps_law_fit(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law fit V = K·N^β over per-group (corpus size N =
    token occurrences, vocabulary V = distinct tokens) points →
    ONE row [n_groups, heaps_beta, heaps_ln_k] — the tokenizer-sizing
    companion to ``zipf_fit``/``vocab_coverage_curve``: β predicts
    how fast the vocabulary (and thus OOV pressure on a fixed-size
    tokenizer) keeps growing as the corpus scales; natural language
    sits near β ≈ 0.5, templated/duplicated corpora fall toward 0.

    Each ``by`` group contributes one (ln N, ln V) point and the fit
    is least-squares across groups, so the curve is measured from
    corpus slices of genuinely different sizes rather than from
    prefix-sampling one corpus (which would need an ordered scan —
    not a distributed shape).  Cost: ONE corpus-sized shuffle (the
    (group, token) count, map-side combined, keys bounded by
    vocabulary × groups), a group-sized aggregate, then a single
    regr_* aggregate over n_groups rows."""
    tok = df.select(
        F.col(by),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != F.lit(""))
    per_group = (
        tok.groupBy(by, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(by)
        .agg(
            F.sum("__c").alias("__n_tok"),
            F.count(F.lit(1)).alias("__n_vocab"),
        )
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.round(
            F.regr_slope(F.log("__n_vocab"), F.log("__n_tok")), 6
        ).alias("heaps_beta"),
        F.round(
            F.regr_intercept(F.log("__n_vocab"), F.log("__n_tok")), 6
        ).alias("heaps_ln_k"),
    )


def cms_token_counts(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Count-min-sketch token-frequency estimates vs exact truth →
    [token, true_count, cms_count] for the ``top_n`` most frequent
    tokens (ties broken by token) — the Cormode–Muthukrishnan sketch
    that answers "how often does X occur?" in ``depth × width``
    counters of memory REGARDLESS of vocabulary size, with one-sided
    error (cms_count ≥ true_count always; overestimate ≤ 2N/width
    with prob ≥ 1 − 2^−depth).

    At 100 TB the exact per-token groupBy shuffles the full
    vocabulary; the sketch shuffles AT MOST ``depth·width`` counter
    keys (map-side partial aggregation collapses each partition to
    the counter grid before the exchange), and sketches from disjoint
    shards merge by plain counter addition — this diagnostic computes
    both so the estimate column is oracle-checkable against truth.

    Determinism: counter buckets are ``xxhash64(token, r)`` masked to
    the power-of-two ``width`` (low bits of the signed value equal
    the unsigned residue), so the DuckDB twin
    (``queries/text.py:_cms_oracle``) rebuilds the identical sketch
    bit-for-bit — even the collision overestimates match."""
    if width < 2 or width & (width - 1):
        raise ValueError(f"width must be a power of two >= 2, got {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def buckets(tok_col: str):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("__r"),
                        F.xxhash64(tok_col, F.lit(r))
                        .bitwiseAND(F.lit(width - 1))
                        .alias("__b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__rb")

    toks = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("__t")
    )
    sketch = (
        toks.select(buckets("__t"))
        .groupBy(F.col("__rb.__r").alias("__r"), F.col("__rb.__b").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    top = (
        toks.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), "__t")
        .limit(top_n)
    )
    probe = top.select("__t", "true_count", buckets("__t")).select(
        "__t", "true_count", F.col("__rb.__r").alias("__r"),
        F.col("__rb.__b").alias("__b"),
    )
    return (
        sketch.join(F.broadcast(probe), on=["__r", "__b"])
        .groupBy("__t", "true_count")
        .agg(F.min("__c").alias("cms_count"))
        .select(F.col("__t").alias("token"), "true_count", "cms_count")
    )


def source_divergence(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group unigram-distribution divergence from the corpus →
    [by, n_tokens, vocab_used, kl_vs_corpus, js_vs_corpus] — the
    mixture-drift diagnostic read next to the datacard: KL(source ‖
    corpus) says how surprising the source looks under the corpus
    distribution (unbounded, asymmetric), Jensen–Shannon bounds it
    symmetrically in [0, ln 2].

    No smoothing needed: the corpus distribution dominates every
    source (q(t) > 0 wherever p(t) > 0), and the JS contribution of
    tokens ABSENT from the source closes in closed form —
    0.5·(1 − Σ_{p>0} q(t))·ln 2 — with the coverage mass Σ q(t)
    computed from INTEGER counts, so no pass over the full vocabulary
    per source is ever made.

    Scale shape: one corpus scan into a vocabulary-bounded
    (|by|×|vocab|) count aggregate, a vocab-bounded corpus-count join,
    and per-group sorted HOF folds.  Cross-engine float EXACTNESS
    (the ``source_language_entropy`` discipline): every divergence
    sum folds LEFT-TO-RIGHT over the token list sorted by token —
    plain SUM over grouped floats has engine-dependent addend order
    and can flip the rounded hash."""
    tok = df.select(
        F.col(by),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("__t"),
    )
    st = tok.groupBy(by, "__t").agg(F.count(F.lit(1)).alias("__c"))
    tot = st.groupBy("__t").agg(F.sum("__c").alias("__ct"))
    n_total = tot.agg(F.sum("__ct").alias("__N"))
    per = (
        st.join(tot, on="__t")
        .groupBy(by)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_used"),
            F.sum("__ct").alias("__qcov_num"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("__t").alias("k"),
                        F.col("__c").alias("a"),
                        F.col("__ct").alias("b"),
                    )
                )
            ).alias("__kv"),
        )
        .crossJoin(F.broadcast(n_total))
    )
    p = "(__e.a * 1.0D / n_tokens)"
    q = "(__e.b * 1.0D / __N)"

    def fold(term: str) -> str:
        return f"aggregate(__kv, 0.0D, (__a, __e) -> __a + ({term}))"

    kl = fold(f"{p} * ln({p} / {q})")
    jsp = fold(f"{p} * ln((2.0D * {p}) / ({p} + {q}))")
    jsq = fold(f"{q} * ln((2.0D * {q}) / ({p} + {q}))")
    js = (
        f"0.5D * ({jsp}) + 0.5D * ({jsq}) + "
        f"0.5D * (1.0D - __qcov_num * 1.0D / __N) * ln(2.0D)"
    )
    return per.select(
        by,
        "n_tokens",
        "vocab_used",
        F.round(F.expr(kl), 6).alias("kl_vs_corpus"),
        F.round(F.expr(js), 6).alias("js_vs_corpus"),
    ).orderBy(by)
