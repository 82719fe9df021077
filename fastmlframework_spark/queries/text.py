"""Oracle-checked queries for the text-analysis extensions (§7.5) on
the documents table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions import text as xtext
from fastmlframework_spark.queries.registry import query

# DuckDB (RE2) versions of the patterns in extensions.text — identical
# match semantics for these ASCII-only patterns.
_RE = {
    "word": "[A-Za-z]+",
    "token": r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]",
    "punct": r"[^A-Za-z0-9\s]",
    "space": r"\s",
    "nonspace": r"\S+",
}


def _rc(col: str, pat: str) -> str:
    return f"len(regexp_extract_all({col}, '{pat}'))"


@query(
    "text_stats_per_doc",
    oracle=f"""
SELECT doc_id,
       LENGTH(text) AS n_chars,
       {_rc('text', _RE['word'])} AS n_words,
       {_rc('text', _RE['token'])} AS n_tokens,
       ROUND({_rc('text', _RE['punct'])} * 1.0 / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
       ROUND((LENGTH(text) - {_rc('text', _RE['space'])}) * 1.0
             / GREATEST({_rc('text', _RE['word'])}, 1), 6) AS avg_word_len
FROM documents
""",
)
def text_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics — one scan, regexp counters, no UDF."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return xtext.text_stats(docs).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        "n_words",
        "n_tokens",
        "punct_ratio",
        "avg_word_len",
    )


_QUALITY_SQL = """
ROUND((0.4 * LEAST(LENGTH(text) / 200.0, 1.0)
     + 0.4 * LEAST(len(regexp_extract_all(text, '[A-Za-z]+')) / 30.0, 1.0)
     + 0.2 * LEAST(len(regexp_extract_all(text, '\\b(the|and|of|to|is)\\b')) / 3.0, 1.0))
    * (1.0 - LEAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 2.0
                   / GREATEST(LENGTH(text), 1), 1.0)), 6)
"""


@query(
    "text_quality_by_lang",
    oracle=f"""
SELECT lang,
       ROUND(AVG({_QUALITY_SQL}), 6) AS avg_quality,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
""",
)
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring rolled up per language label."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return (
        xtext.quality_score(docs)
        .groupBy("lang")
        .agg(
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _langid_oracle() -> str:
    # DuckDB string literals are backslash-literal, so the \b patterns
    # pass through to RE2 unescaped.
    hits = {
        lang: f"len(regexp_extract_all(text, '{pat}'))"
        for lang, pat in xtext.LANG_STOPWORDS.items()
    }
    langs = sorted(hits)
    maxh = "GREATEST({})".format(", ".join(hits[lang] for lang in langs))
    case = " ".join(
        f"WHEN {hits[lang]} = __maxh THEN '{lang}'" for lang in langs
    )
    return f"""
WITH scored AS (
  SELECT lang, text, {maxh} AS __maxh FROM documents
)
SELECT lang,
       CASE WHEN __maxh = 0 THEN 'unknown' {case} END AS pred_lang,
       COUNT(*) AS n
FROM scored GROUP BY 1, 2
"""


@query("lang_id_confusion", oracle=_langid_oracle())
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labeled lang (confusion
    counts).  The synthetic corpus shares one vocabulary, so the
    heuristic's value here is determinism, not accuracy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return (
        xtext.language_id(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "token_counts_by_lang",
    oracle=f"""
SELECT lang,
       ROUND(AVG({_rc('text', _RE['nonspace'])}), 4) AS avg_ws_tokens,
       ROUND(AVG({_rc('text', _RE['token'])}), 4) AS avg_bpe_tokens
FROM documents GROUP BY lang
""",
)
def token_counts_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting, averaged per language."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return (
        xtext.token_count(docs)
        .groupBy("lang")
        .agg(
            F.round(F.avg("ws_tokens"), 4).alias("avg_ws_tokens"),
            F.round(F.avg("bpe_tokens"), 4).alias("avg_bpe_tokens"),
        )
    )


@query(
    "doc_fingerprint",
    oracle="""
WITH idx AS (
  SELECT doc_id, text,
         unnest(generate_series(1, GREATEST(LENGTH(text) - 4, 1))) AS i
  FROM documents
)
SELECT doc_id,
       MIN(CAST(concat('0x', substring(md5(substring(text, CAST(i AS INT), 5)), 1, 15)) AS BIGINT)) AS fingerprint
FROM idx
GROUP BY doc_id
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (min md5 over 5-char
    shingles) — single-permutation minhash, engine-portable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return xtext.fingerprint(docs).select("doc_id", "fingerprint")


@query(
    "tfidf_top_terms",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM words
  WHERE term <> '' GROUP BY doc_id, term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
docfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, tf.term,
         ROUND(tf * LN((n_docs + 1.0) / (df + 1)), 6) AS score
  FROM tf JOIN docfreq ON tf.term = docfreq.term, n
)
SELECT doc_id, term, score, rank FROM (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
) t WHERE rank <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF keyword extraction: top-3 terms per document
    (broadcast vocabulary join + per-doc window)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return xtext.tfidf_top_terms(docs, k=3)


def _hashed_classifier_oracle(dim: int = 256, seed: int = 11,
                              bias: float = 0.0) -> str:
    """SQL twin of ``hashed_linear_score``: same seed-derived weight
    literals (via the shared ``placeholder_weights``), same xxhash64
    buckets (power-of-two modulus of the unsigned hash == pmod of the
    signed hash), same left-to-right token-sum order."""
    from fastmlframework_spark.extensions.text import placeholder_weights
    from fastmlframework_spark.queries import xxh64_sql as xx

    weights = placeholder_weights(dim, seed)
    wlist = "[" + ", ".join(f"{w}::DOUBLE" for w in weights) + "]"
    word_hash = xx.xxh64_bytes(xx.utf8_bytes("__w"), 42)
    total = (
        "list_reduce(list_transform(__words, __w -> "
        f"__WB[CAST(({word_hash}) % {dim} AS BIGINT) + 1]), "
        "(__a, __b) -> __a + __b)"
    )
    return f"""
WITH w AS (SELECT {wlist} AS __WB),
toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS __words
  FROM documents
)
SELECT doc_id,
       CAST(len(__words) AS BIGINT) AS n_terms,
       ROUND(1.0 / (1.0 + EXP(-({bias} + {total} / len(__words)))), 6)
           AS score
FROM toks, w
"""


@query("text_classifier_scores", oracle=_hashed_classifier_oracle())
def text_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier (fastText-style quality filter) over
    every document — the apply-a-tiny-model-to-a-huge-corpus map.
    Hash-matched oracle via the pure-SQL XXH64 twin."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return xtext.hashed_linear_score(docs)


@query(
    "text_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split_regex(text, '\\s+')) AS t
  FROM documents
),
c AS (
  SELECT source, t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
),
r AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, t ASC) AS r
  FROM c
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct_tokens,
       ROUND(regr_slope(ln(c), ln(r)), 6) AS zipf_slope,
       ROUND(regr_intercept(ln(c), ln(r)), 6) AS zipf_intercept
FROM r GROUP BY source
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law slope/intercept of the token frequency distribution
    per source — corpus-health diagnostic (natural text ≈ −1,
    templated corpora drift toward 0); vocabulary-bounded shuffle +
    one regr_* aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xtext.zipf_fit(docs, by="source")


@query(
    "text_vocab_coverage",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS t FROM documents
),
c AS (SELECT t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY t),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t ASC) AS r FROM c
),
v AS (SELECT unnest([8, 16, 24, 32]) AS vocab_size)
SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN r.r <= v.vocab_size THEN r.c ELSE 0 END)
            AS BIGINT) AS covered_tokens,
       CAST(SUM(r.c) AS BIGINT) AS total_tokens,
       ROUND(SUM(CASE WHEN r.r <= v.vocab_size THEN r.c ELSE 0 END) * 1.0
             / SUM(r.c), 6) AS coverage
FROM r, v GROUP BY v.vocab_size
""",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: fraction of token occurrences the
    top-v word vocabulary explains, for candidate sizes 8/16/24/32 —
    the tokenizer-sizing diagnostic; corpus-sized work is one
    map-combined token count."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return xtext.vocab_coverage_curve(docs)


@query(
    "text_bpe_merge_candidates",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents
),
v AS (SELECT w, COUNT(*) AS wc FROM tok WHERE w <> '' GROUP BY w),
p AS (
  SELECT substr(w, i, 2) AS pair, wc
  FROM (
    SELECT w, wc,
           unnest(range(1, CASE WHEN length(w) >= 2
                               THEN length(w) ELSE 1 END)) AS i
    FROM v
  ) e
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS n_occurrences
FROM p GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC LIMIT 20
""",
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training round at corpus scale: top-20 adjacent
    character pairs weighted by word counts — vocabulary-collapsed
    pair explode, TakeOrdered top-k, no global sort."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return xtext.bpe_merge_candidates(docs)


def _bpe_ctes(n_merges: int) -> list[str]:
    """Shared CTE chain of the iterative-BPE oracles: per-(source,
    word) counts, the global word vocabulary, and one (pair-count →
    argmax → replace) trio per merge round.  Each v_k carries the
    original word ``w`` so consumers can map words back to their
    final symbol sequence (``_bpe_fertility_oracle``)."""
    ctes = [
        """swords AS (
  SELECT source, w, COUNT(*) AS c FROM (
    SELECT source, unnest(string_split_regex(text, '\\s+')) AS w
    FROM documents WHERE text IS NOT NULL
  ) WHERE w <> '' GROUP BY source, w
)""",
        """words AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS wc FROM swords GROUP BY w
)""",
        """v0 AS (
  SELECT w, ' ' || array_to_string(
           list_transform(generate_series(1, length(w)),
                          i -> substr(w, CAST(i AS INT), 1)), '  ')
         || ' ' AS syms, wc
  FROM words
)""",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f"""p{k} AS (
  SELECT s[CAST(i AS INT)] AS lhs, s[CAST(i AS INT) + 1] AS rhs,
         SUM(wc) AS pc
  FROM (
    SELECT s, wc, unnest(generate_series(1, len(s) - 1)) AS i
    FROM (SELECT string_split(trim(syms), '  ') AS s, wc FROM v{k - 1})
  ) GROUP BY 1, 2
)""",
        )
        ctes.append(
            f"""b{k} AS (
  SELECT lhs, rhs, pc FROM p{k} ORDER BY pc DESC, lhs, rhs LIMIT 1
)""",
        )
        ctes.append(
            f"""v{k} AS (
  SELECT w, replace(syms, ' ' || b.lhs || '  ' || b.rhs || ' ',
                    ' ' || b.lhs || b.rhs || ' ') AS syms, wc
  FROM v{k - 1}, b{k} b
)""",
        )
    return ctes


def _bpe_oracle(n_merges: int) -> str:
    """Full iterative-BPE merge-table oracle: each round re-derives
    pair counts from the current vocabulary, picks the argmax (count
    desc, pair asc), and applies the merge with the SAME padded-string
    replace() rewrite the Spark operator uses — the representation
    that makes a training LOOP expressible as straight-line SQL."""
    finals = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" CAST(pc AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(n_merges))
        + "\n"
        + finals
        + "\nORDER BY merge_rank"
    )


def _bpe_fertility_oracle(n_merges: int) -> str:
    """Fertility oracle: read each word's token count off the trained
    vocabulary (v_n) and weight by the per-(source, word) counts —
    the corpus itself is never re-encoded."""
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(n_merges))
        + f""",
enc AS (
  SELECT w, len(string_split(trim(syms), '  ')) AS ntok FROM v{n_merges}
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(c * ntok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(c * ntok) AS DOUBLE) / SUM(c), 6) AS fertility,
       ROUND(CAST(SUM(c * length(w)) AS DOUBLE) / SUM(c * ntok), 6)
         AS chars_per_token
FROM swords JOIN enc USING (w)
GROUP BY source ORDER BY source"""
    )


@query("text_bpe_train", oracle=_bpe_oracle(10))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full iterative BPE tokenizer fit, 10 merge rounds → the merge
    table in training order.  The corpus collapses to its word
    vocabulary in ONE scan; every round then runs over the
    Heaps-bounded vocab table (pair-count aggregate + 1-row argmax +
    map-only padded-string replace), with per-round localCheckpoints
    truncating the iterative lineage — the reference one-round
    statistic (`text_bpe_merge_candidates`) taken to the real
    training loop."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return xtext.bpe_train(docs, n_merges=10).orderBy("merge_rank")


@query("text_bpe_fertility", oracle=_bpe_fertility_oracle(10))
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by source after a 10-round BPE fit:
    tokens-per-word and chars-per-token per slice — the audit that a
    tokenizer doesn't over-fragment one source/language of the
    training mix.  The encode step reads token counts off the trained
    VOCABULARY (word → merged symbols) and weights them by per-
    (source, word) counts, so no document is ever re-encoded: one
    extra corpus scan, then vocabulary-bounded joins only."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xtext.bpe_fertility(docs, by="source", n_merges=10)


@query(
    "text_heaps_law",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split_regex(text, '\\s+')) AS t
  FROM documents
),
c AS (
  SELECT source, t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
),
g AS (
  SELECT source, SUM(c) AS n_tok, COUNT(*) AS n_vocab
  FROM c GROUP BY source
)
SELECT COUNT(*) AS n_groups,
       ROUND(regr_slope(ln(n_vocab), ln(n_tok)), 6) AS heaps_beta,
       ROUND(regr_intercept(ln(n_vocab), ln(n_tok)), 6) AS heaps_ln_k
FROM g
""",
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law V = K*N^beta fit across per-source (corpus size,
    vocabulary) points — how fast vocabulary keeps growing with the
    corpus, the forward-looking tokenizer-sizing number that
    ``text_vocab_coverage`` (current coverage) and ``text_zipf_fit``
    (frequency decay) don't answer; natural language sits near
    beta = 0.5, heavily templated or duplicated corpora fall toward
    0.  One vocabulary-bounded shuffle, then aggregates of
    n-source and 1 rows."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xtext.heaps_law_fit(docs, by="source")


_NOVELTY_N = 5


@query(
    "text_ngram_novelty",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS ws
  FROM documents WHERE text IS NOT NULL
),
w AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(ws) - {_NOVELTY_N - 1}, 1) + 1)) AS pos,
         ws
  FROM d
),
g AS (
  SELECT doc_id,
         array_to_string(ws[pos:pos + {_NOVELTY_N - 1}], ' ') AS gram
  FROM w
),
tr AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
te AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 1)
SELECT COUNT(*) AS n_test_ngrams,
       CAST(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_seen,
       ROUND(1.0 - SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                   * 1.0 / COUNT(*), 6) AS novelty_rate
FROM te LEFT JOIN tr USING (gram)
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test n-gram novelty (Lee et al. 2022's generalization
    audit): what fraction of the test split's distinct word 5-grams
    never occur in the train split — the memorization-risk /
    train-test-overlap number a data card reports next to the
    contamination screen.  Splits are the deterministic doc_id parity.

    Scale: the corpus reduces to 8-byte xxhash64 window digests
    (``extensions.dedup.shingles`` — split projected once, per-word
    hash once, chain per window) and the whole audit is ONE
    digest-keyed aggregate — per-digest train/test presence bits via
    map-side-combined MAX, then a 1-row count — instead of the naive
    two-distincts-plus-semi-join (three corpus-wide shuffles for the
    same numbers; measured 2× slower at sf1).  No word string ever
    shuffles.  The oracle groups the literal window STRINGS — same
    equality classes as the digest chain (injective on token
    windows), the ``dedup_duplicate_spans`` twin pattern."""
    from fastmlframework_spark.extensions.dedup import shingles

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
    )
    sh = shingles(docs, n=_NOVELTY_N)
    presence = sh.groupBy("shingle").agg(
        F.max((F.col("doc_id") % 2 == 0).cast("int")).alias("__tr"),
        F.max((F.col("doc_id") % 2 == 1).cast("int")).alias("__te"),
    )
    return presence.agg(
        F.sum("__te").alias("n_test_ngrams"),
        F.sum(F.col("__te") * F.col("__tr")).alias("n_seen"),
    ).select(
        "n_test_ngrams",
        "n_seen",
        F.round(
            1.0 - F.col("n_seen") * 1.0 / F.col("n_test_ngrams"), 6
        ).alias("novelty_rate"),
    )


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 50


@query(
    "text_pmi_collocations",
    oracle=f"""
WITH d AS (
  SELECT list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                     __x -> __x <> '') AS ws
  FROM documents WHERE text IS NOT NULL
),
tok AS (SELECT unnest(ws) AS w FROM d),
uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
n_tok AS (SELECT COUNT(*) AS n FROM tok),
pr AS (
  SELECT ws[__i] AS w1, ws[__i + 1] AS w2
  FROM (SELECT ws, unnest(range(1, len(ws))) AS __i FROM d)
),
pc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pr GROUP BY 1, 2),
n_pr AS (SELECT COUNT(*) AS np FROM pr)
SELECT w1, w2, n_pair,
       ROUND(ln(n_pair * 1.0 / np) - ln(u1.c * 1.0 / n)
             - ln(u2.c * 1.0 / n), 6) AS pmi
FROM pc JOIN uni u1 ON pc.w1 = u1.w
        JOIN uni u2 ON pc.w2 = u2.w, n_tok, n_pr
WHERE n_pair >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP_K}
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PMI_TOP_K} adjacent-word collocations by pointwise mutual
    information (min pair count {_PMI_MIN_COUNT}) — the phrase-mining
    statistic behind tokenizer merge seeding and stopword-resistant
    keyphrase extraction (words that co-occur far above chance).

    Scale: one token explode feeds a vocabulary-bounded unigram
    aggregate and a pair aggregate (both map-side combined); the PMI
    join touches only the vocabulary-sized count tables, the corpus
    totals arrive as two 1-row broadcast aggregates, and the top-k is
    orderBy+limit (TakeOrdered — a per-partition heap + driver merge,
    never a global sort)."""
    words = "filter(split(COALESCE(text, '')," r" '\\s+'), __x -> __x != '')"
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.expr(words).alias("__ws"))
    )
    tok = d.select(F.explode("__ws").alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_tok = tok.agg(F.count(F.lit(1)).alias("n"))
    # sequence(1, 0) is DESCENDING in Spark, so <2-word docs must take
    # the explicit empty-array branch (same guard as gram_windows in
    # extensions/filtering.py)
    pr = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__ws) >= 2 THEN "
                "transform(sequence(1, size(__ws) - 1), "
                "__i -> struct(element_at(__ws, __i) AS w1, "
                "element_at(__ws, __i + 1) AS w2)) "
                "ELSE array() END"
            )
        ).alias("__p")
    ).select("__p.w1", "__p.w2")
    pc = pr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    n_pr = pr.agg(F.count(F.lit(1)).alias("np"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
    return (
        pc.filter(F.col("n_pair") >= _PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pr))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(F.col("n_pair") * 1.0 / F.col("np"))
                - F.log(F.col("__c1") * 1.0 / F.col("n"))
                - F.log(F.col("__c2") * 1.0 / F.col("n")),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP_K)
    )


def _cms_oracle(depth: int = 4, width: int = 1024, top_n: int = 20) -> str:
    """SQL twin of ``extensions/text.py:cms_token_counts``: rebuilds
    the identical count-min sketch (salted xxhash64 via the validated
    ``xxh64_sql`` twin, power-of-two bucket mask) as ``depth``
    UNION-ALL grouped scans, then replays the min-over-rows probe for
    the same deterministic top-N token set — bit-exact including
    collision overestimates."""
    from fastmlframework_spark.queries import xxh64_sql as xx

    base = xx.xxh64_bytes(xx.utf8_bytes("t"), 42)

    def bucket(r: int) -> str:
        return f"CAST({xx.hash_int(r, base)} % {width} AS BIGINT)"

    counters = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, {bucket(r)} AS b, COUNT(*) AS c FROM tok GROUP BY 2"
        for r in range(depth)
    )
    probes = "\n  UNION ALL ".join(
        f"SELECT t, true_count, {r} AS r, {bucket(r)} AS b FROM top"
        for r in range(depth)
    )
    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '{_RE["token"]}')) AS t
  FROM documents
),
exact AS (SELECT t, COUNT(*) AS true_count FROM tok GROUP BY t),
top AS (
  SELECT t, true_count FROM exact
  ORDER BY true_count DESC, t LIMIT {top_n}
),
sk AS ({counters}),
pr AS ({probes})
SELECT pr.t AS token, pr.true_count, MIN(sk.c) AS cms_count
FROM pr JOIN sk ON sk.r = pr.r AND sk.b = pr.b
GROUP BY 1, 2
"""


@query("text_cms_token_counts", oracle=_cms_oracle())
def text_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates (depth 4 × width 1024)
    against exact counts for the 20 most frequent tokens — the
    bounded-memory heavy-hitter sketch whose shuffle is capped at
    depth·width counters regardless of vocabulary size.  The oracle
    rebuilds the identical sketch, so even collision overestimates
    hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    return xtext.cms_token_counts(docs, depth=4, width=1024, top_n=20)


def _divergence_oracle() -> str:
    """SQL twin of ``extensions/text.py:source_divergence``: identical
    count CTEs, identical per-term double arithmetic, and the same
    LEFT-TO-RIGHT fold over the token-sorted term list (list_reduce
    over [0.0] || transformed list == Spark's 0.0-seeded aggregate),
    so the divergence sums are bit-exact before rounding."""
    p = "(__e.a * 1.0 / n_tokens)"
    q = "(__e.b * 1.0 / N)"

    def fold(term: str) -> str:
        return (
            "list_reduce([0.0::DOUBLE] || list_transform(kv, __e -> "
            f"({term})), (__a, __b) -> __a + __b)"
        )

    kl = fold(f"{p} * ln({p} / {q})")
    jsp = fold(f"{p} * ln((2.0 * {p}) / ({p} + {q}))")
    jsq = fold(f"{q} * ln((2.0 * {q}) / ({p} + {q}))")
    return f"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(text, '{_RE["token"]}')) AS t
  FROM documents
),
st AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t),
tot AS (SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM st GROUP BY t),
n AS (SELECT CAST(SUM(ct) AS BIGINT) AS N FROM tot),
g AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS vocab_used,
         CAST(SUM(ct) AS BIGINT) AS qcov_num,
         list_sort(list({{'k': t, 'a': c, 'b': ct}})) AS kv
  FROM st JOIN tot USING (t)
  GROUP BY source
),
gg AS (SELECT g.*, n.N FROM g CROSS JOIN n)
SELECT source, n_tokens, vocab_used,
       ROUND({kl}, 6) AS kl_vs_corpus,
       ROUND(0.5 * ({jsp}) + 0.5 * ({jsq}) +
             0.5 * (1.0 - qcov_num * 1.0 / N) * ln(2.0), 6)
           AS js_vs_corpus
FROM gg ORDER BY source
"""


@query("text_source_divergence", oracle=_divergence_oracle())
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL / Jensen–Shannon divergence vs the corpus
    distribution — the mixture-drift number next to the datacard.
    Vocabulary-bounded shuffles only; divergence sums fold
    left-to-right over token-sorted term lists in BOTH engines (plain
    float SUM has engine-dependent addend order), so the oracle match
    is bit-exact before rounding."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xtext.source_divergence(docs)
