"""Oracle-checked queries for the corpus-filtering extensions
(``extensions/filtering.py``): Gopher rule gates, hashed char-bigram
LM scoring (perplexity-filter shape), DSIR importance weights, and
length-bucketed batch packing — all over the documents table.

Oracle discipline: identical expression shapes and left-to-right
float-summation order (Spark ``aggregate`` ≡ DuckDB ``list_reduce``),
explicit BIGINT casts where DuckDB would widen to HUGEINT, and the
hashed-bucket ops reuse the pure-SQL XXH64 twin
(queries/xxh64_sql.py) with the power-of-two ``pmod`` contract from
``extensions/text.hashed_linear_score``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import fan_out, load_table
from fastmlframework_spark.extensions import filtering as xfilt
from fastmlframework_spark.queries import xxh64_sql as xx
from fastmlframework_spark.queries.registry import query

_WORDS_SQL = r"list_filter(string_split_regex(COALESCE(text, ''), '\s+'), __x -> __x <> '')"
_LINES_SQL = r"list_filter(string_split_regex(COALESCE(text, ''), '\n'), __x -> __x <> '')"


def _gopher_fl_ctes(keys: str = "source", rel: str = "documents") -> str:
    """Shared CTE chain (``base`` → ``sig`` → ``fl``): per-document
    Gopher signals and fail flags, reused by the rule-report oracle,
    the Wilson-interval oracle, and (keyed by doc_id over the planted
    dedup corpus) the curation-funnel oracle."""
    th = xfilt.GOPHER_THRESHOLDS
    stop_types = " + ".join(
        f"CAST(list_contains(ws, '{s}') AS INT)"
        for s in xfilt.GOPHER_STOPWORDS
    )
    return f"""base AS (
  SELECT {keys},
         COALESCE(text, '') AS t,
         {_WORDS_SQL} AS ws,
         {_LINES_SQL} AS ls
  FROM {rel}
),
sig AS (
  SELECT {keys},
         len(ws) AS n_words,
         (LENGTH(t) - len(regexp_extract_all(t, '\\s'))) * 1.0
             / GREATEST(len(ws), 1) AS mean_word_len,
         (len(regexp_extract_all(t, '#'))
          + len(regexp_extract_all(t, '\\.\\.\\.|…'))) * 1.0
             / GREATEST(len(ws), 1) AS symbol_ratio,
         len(list_filter(ls, __l -> regexp_matches(__l, '^\\s*[-*•]')))
             * 1.0 / GREATEST(len(ls), 1) AS bullet_frac,
         len(list_filter(ls, __l -> regexp_matches(__l, '(\\.\\.\\.|…)\\s*$')))
             * 1.0 / GREATEST(len(ls), 1) AS ellipsis_frac,
         len(list_filter(ws, __w -> regexp_matches(__w, '[A-Za-z]')))
             * 1.0 / GREATEST(len(ws), 1) AS alpha_frac,
         {stop_types} AS stop_types
  FROM base
),
fl AS (
  SELECT {keys}, n_words,
         (n_words < {th["min_words"]} OR n_words > {th["max_words"]})
             AS fail_words,
         (mean_word_len < {th["min_mean_word_len"]}
          OR mean_word_len > {th["max_mean_word_len"]}) AS fail_word_len,
         symbol_ratio > {th["max_symbol_word_ratio"]} AS fail_symbol,
         bullet_frac > {th["max_bullet_line_frac"]} AS fail_bullet,
         ellipsis_frac > {th["max_ellipsis_line_frac"]} AS fail_ellipsis,
         alpha_frac < {th["min_alpha_word_frac"]} AS fail_alpha,
         stop_types < {th["min_stopword_types"]} AS fail_stopword
  FROM sig
)"""


def _gopher_oracle() -> str:
    return f"""
WITH {_gopher_fl_ctes()}
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(fail_words AS INT)) AS BIGINT) AS n_fail_words,
       CAST(SUM(CAST(fail_word_len AS INT)) AS BIGINT) AS n_fail_word_len,
       CAST(SUM(CAST(fail_symbol AS INT)) AS BIGINT) AS n_fail_symbol,
       CAST(SUM(CAST(fail_bullet AS INT)) AS BIGINT) AS n_fail_bullet,
       CAST(SUM(CAST(fail_ellipsis AS INT)) AS BIGINT) AS n_fail_ellipsis,
       CAST(SUM(CAST(fail_alpha AS INT)) AS BIGINT) AS n_fail_alpha,
       CAST(SUM(CAST(fail_stopword AS INT)) AS BIGINT) AS n_fail_stopword,
       CAST(SUM(CAST(NOT (fail_words OR fail_word_len OR fail_symbol
                          OR fail_bullet OR fail_ellipsis OR fail_alpha
                          OR fail_stopword) AS INT)) AS BIGINT) AS n_pass
FROM fl GROUP BY source
"""


def _wilson_oracle() -> str:
    """SQL twin of ``curation.quality_confidence``: the shared flag
    CTEs feed a per-source (n_docs, n_pass) aggregate, and the Wilson
    bounds mirror the Spark expression tree operation-for-operation
    (same literals, same association) so the float64 results are
    bit-identical before the 6-dp round."""
    z = 1.959963984540054
    z2 = z * z
    return f"""
WITH {_gopher_fl_ctes()},
cnt AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(CAST(NOT (fail_words OR fail_word_len OR fail_symbol
                            OR fail_bullet OR fail_ellipsis OR fail_alpha
                            OR fail_stopword) AS INT)) AS BIGINT) AS n_pass
  FROM fl GROUP BY source
),
wil AS (
  SELECT source, n_docs, n_pass,
         CAST(n_docs AS DOUBLE) AS n,
         n_pass / CAST(n_docs AS DOUBLE) AS p
  FROM cnt
)
SELECT source, n_docs, n_pass,
       ROUND(p, 6) AS pass_rate,
       ROUND(((p + {z2!r} / (2.0 * n))
              - {z!r} * sqrt(p * (1.0 - p) / n + {z2!r} / ((4.0 * n) * n)))
             / (1.0 + {z2!r} / n), 6) AS ci_low,
       ROUND(((p + {z2!r} / (2.0 * n))
              + {z!r} * sqrt(p * (1.0 - p) / n + {z2!r} / ((4.0 * n) * n)))
             / (1.0 + {z2!r} / n), 6) AS ci_high
FROM wil
"""


@query("quality_gopher_rules", oracle=_gopher_oracle())
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-battery report per source (Rae et al. 2021 §A.1.1):
    one map-only projection of regexp/array-HOF signals, one tiny
    per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xfilt.gopher_rules(docs, by="source")


def _chargram_oracle(dim: int = 1024, fit_modulus: int = 4) -> str:
    """SQL twin of ``chargram_nll``: same xxhash64 buckets (unsigned
    % dim == pmod of the signed hash for power-of-two dim), same
    Laplace smoothing, same left-to-right bigram summation.  The hash
    runs once per DISTINCT bigram (a map CTE), not per occurrence —
    the pure-SQL XXH64 is ~1000 ops per call.  The count CTE fits on
    the doc_id % fit_modulus slice, mirroring the Spark arg."""
    g_hash = xx.xxh64_bytes(xx.utf8_bytes("__g"), 42)
    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND LENGTH(text) >= 2
),
bg AS (
  SELECT doc_id,
         list_transform(range(1, LENGTH(text)),
                        __i -> substr(text, CAST(__i AS INT), 2)) AS bgs
  FROM d
),
dist AS (SELECT DISTINCT unnest(bgs) AS __g FROM bg),
hb AS (
  SELECT __g AS g, CAST(({g_hash}) % {dim} AS BIGINT) AS bucket FROM dist
),
bm AS (SELECT MAP(list(g), list(bucket)) AS m FROM hb),
cnt AS (
  SELECT h.bucket, COUNT(*) AS c
  FROM (SELECT unnest(bgs) AS g FROM bg
        WHERE doc_id % {fit_modulus} = 0) u
  JOIN hb h ON u.g = h.g
  GROUP BY 1
),
arr AS (
  SELECT list(COALESCE(c.c, 0) ORDER BY gr.i) AS A,
         SUM(COALESCE(c.c, 0)) AS total
  FROM range(0, {dim}) gr(i) LEFT JOIN cnt c ON c.bucket = gr.i
)
SELECT doc_id,
       CAST(len(bgs) AS BIGINT) AS n_bigrams,
       ROUND(-(list_reduce([0.0::DOUBLE] || list_transform(bgs, __g ->
           ln((A[CAST(m[__g][1] AS INT) + 1] + 1) * 1.0
              / (total + {dim}))),
           (__a, __b) -> __a + __b)) / len(bgs), 6) AS nll
FROM bg, bm, arr
"""


@query("text_chargram_nll", oracle=_chargram_oracle())
def text_chargram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed char-bigram LM negative log-likelihood per document —
    the CCNet/KenLM perplexity-filter shape; dim-bounded count
    aggregate + broadcast 1-row model + map-only scoring; the model
    fits on the deterministic doc_id % 4 slice (the train-on-a-
    sample, score-everything shape), scoring covers every doc."""
    # fan_out: the per-doc char-bigram scoring (HOF aggregate over
    # every bigram) is the dominant, CPU-bound map stage and the
    # model fit reduces to integer bucket counts — both
    # partitioning-invariant; spreading the single-split scan cut
    # this query 2.4 s -> 0.7 s at sf0.1 (guide §2.5; no-op at scale).
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return xfilt.chargram_nll(docs, fit_modulus=4)


def _dsir_oracle(dim: int = 256, target_lang: str = "en") -> str:
    """SQL twin of ``dsir_weights`` with lang='{target}' as the DSIR
    target slice; per-DISTINCT-token hash map, dense bucket arrays,
    left-to-right token summation."""
    w_hash = xx.xxh64_bytes(xx.utf8_bytes("__w2"), 42)
    return f"""
WITH d AS (
  SELECT doc_id, lang, {_WORDS_SQL} AS ws
  FROM documents WHERE text IS NOT NULL
),
dist AS (SELECT DISTINCT unnest(ws) AS __w2 FROM d),
hb AS (
  SELECT __w2 AS w, CAST(({w_hash}) % {dim} AS BIGINT) AS bucket
  FROM dist
),
bm AS (SELECT MAP(list(w), list(bucket)) AS m FROM hb),
cnt AS (
  SELECT h.bucket,
         SUM(CASE WHEN u.lang = '{target_lang}' THEN 1 ELSE 0 END) AS ct,
         COUNT(*) AS cr
  FROM (SELECT lang, unnest(ws) AS w FROM d) u JOIN hb h ON u.w = h.w
  GROUP BY 1
),
arrs AS (
  SELECT list(COALESCE(c.ct, 0) ORDER BY g.i) AS a_t,
         list(COALESCE(c.cr, 0) ORDER BY g.i) AS a_r,
         SUM(COALESCE(c.ct, 0)) AS tt,
         SUM(COALESCE(c.cr, 0)) AS tr
  FROM range(0, {dim}) g(i) LEFT JOIN cnt c ON c.bucket = g.i
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       ROUND(list_reduce([0.0::DOUBLE] || list_transform(ws, __w ->
           ln((a_t[CAST(m[__w][1] AS INT) + 1] + 1) * 1.0 / (tt + {dim}))
         - ln((a_r[CAST(m[__w][1] AS INT) + 1] + 1) * 1.0 / (tr + {dim}))),
           (__a, __b) -> __a + __b), 6) AS log_weight
FROM d, bm, arrs
"""


@query("dsir_importance_weights", oracle=_dsir_oracle())
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) log importance weight of every document
    toward the lang='en' slice — hashed-unigram bucket distributions,
    broadcast two-model frame, map-only scoring."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return xfilt.dsir_weights(docs, target=F.col("lang") == "en")


def _packing_oracle(budget: int = 512) -> str:
    buckets = xfilt.LENGTH_BUCKETS
    case = " ".join(
        f"WHEN n <= {b} THEN {b}" for b in buckets[:-1]
    )
    return f"""
WITH d AS (
  SELECT len({_WORDS_SQL}) AS n
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT CASE {case} ELSE {buckets[-1]} END AS bucket, n FROM d
),
g AS (
  SELECT bucket, COUNT(*) AS n_docs,
         SUM(LEAST(n, bucket)) AS sum_tokens
  FROM b GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       n_docs,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       CAST({budget} // bucket AS BIGINT) AS capacity,
       CAST((n_docs + {budget} // bucket - 1) // ({budget} // bucket)
            AS BIGINT) AS n_batches,
       ROUND(sum_tokens * 1.0 /
             ((n_docs + {budget} // bucket - 1) // ({budget} // bucket)
              * ({budget} // bucket) * bucket), 6) AS pad_ratio
FROM g
"""


@query("pack_length_buckets", oracle=_packing_oracle())
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic-batching report: padded buckets, batch
    counts under a fixed token budget, per-bucket padding efficiency.
    Integer arithmetic end-to-end — bit-exact across engines."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return xfilt.length_bucket_packing(docs)


def _ccnet_buckets_oracle() -> str:
    chargram = _chargram_oracle()
    third, two_thirds = repr(1 / 3), repr(2 / 3)
    return f"""
WITH scored AS (
  SELECT s.doc_id, s.nll, d.lang
  FROM ({chargram}) s JOIN documents d USING (doc_id)
),
th AS (
  SELECT lang,
         quantile_cont(nll, {third}) AS t1,
         quantile_cont(nll, {two_thirds}) AS t2
  FROM scored GROUP BY 1
)
SELECT s.lang,
       CASE WHEN s.nll <= th.t1 THEN 'head'
            WHEN s.nll <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       ROUND(AVG(s.nll), 6) AS mean_nll
FROM scored s JOIN th USING (lang)
GROUP BY 1, 2
"""


@query("text_ccnet_buckets", oracle=_ccnet_buckets_oracle())
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language head/middle/tail quality buckets from
    the chargram-LM NLL terciles — broadcast thresholds + map-only
    comparison cascade, no global sort."""
    # fan_out: same chargram-scoring rationale as text_chargram_nll
    # (2.6 s -> 1.1 s at sf0.1); the downstream tercile thresholds are
    # exact interpolating percentiles (order-free) and the rounded
    # per-bucket means carry the cross-engine 6-dp margin.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
    )
    scored = xfilt.chargram_nll(docs, fit_modulus=4).join(
        docs.select("doc_id", "lang"), on="doc_id"
    )
    # the tercile aggregate AND the bucketing join both read the
    # scored frame — cache it so the corpus-wide chargram scoring runs
    # once, then checkpoint the tiny bucket output and release the
    # cache (same discipline as the dedup pair paths: the compact
    # result persists, the corpus-sized intermediate does not)
    from fastmlframework_spark.extensions.dedup import _materialize_release

    scored = scored.cache()
    out = xfilt.nll_terciles(scored, by="lang")
    return _materialize_release(out, scored)


def _datacard_oracle() -> str:
    th = xfilt.GOPHER_THRESHOLDS
    stop_types = " + ".join(
        f"CAST(list_contains(ws, '{s}') AS INT)"
        for s in xfilt.GOPHER_STOPWORDS
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, source, text,
         COALESCE(text, '') AS t,
         {_WORDS_SQL} AS ws,
         {_LINES_SQL} AS ls
  FROM documents
),
sig AS (
  SELECT doc_id, lang, source, text, ws,
         len(ws) AS n_words,
         (LENGTH(t) - len(regexp_extract_all(t, '\\s'))) * 1.0
             / GREATEST(len(ws), 1) AS mean_word_len,
         (len(regexp_extract_all(t, '#'))
          + len(regexp_extract_all(t, '\\.\\.\\.|…'))) * 1.0
             / GREATEST(len(ws), 1) AS symbol_ratio,
         len(list_filter(ls, __l -> regexp_matches(__l, '^\\s*[-*•]')))
             * 1.0 / GREATEST(len(ls), 1) AS bullet_frac,
         len(list_filter(ls, __l -> regexp_matches(__l, '(\\.\\.\\.|…)\\s*$')))
             * 1.0 / GREATEST(len(ls), 1) AS ellipsis_frac,
         len(list_filter(ws, __w -> regexp_matches(__w, '[A-Za-z]')))
             * 1.0 / GREATEST(len(ws), 1) AS alpha_frac,
         {stop_types} AS stop_types
  FROM base
),
fl AS (
  SELECT doc_id, lang, source, text, n_words,
         NOT ((n_words < {th["min_words"]} OR n_words > {th["max_words"]})
              OR (mean_word_len < {th["min_mean_word_len"]}
                  OR mean_word_len > {th["max_mean_word_len"]})
              OR symbol_ratio > {th["max_symbol_word_ratio"]}
              OR bullet_frac > {th["max_bullet_line_frac"]}
              OR ellipsis_frac > {th["max_ellipsis_line_frac"]}
              OR alpha_frac < {th["min_alpha_word_frac"]}
              OR stop_types < {th["min_stopword_types"]}) AS passes
  FROM sig
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_text,
       CAST(SUM(n_words) AS BIGINT) AS total_tokens,
       ROUND(SUM(n_words) * 1.0 / COUNT(*), 2) AS avg_doc_tokens,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
       ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0
             / GREATEST(COUNT(text), 1), 6) AS exact_dup_rate,
       ROUND(SUM(CAST(passes AS INT)) * 1.0 / COUNT(*), 6)
           AS gopher_pass_rate
FROM fl
"""


@query("corpus_datacard", oracle=_datacard_oracle())
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datacard — the summary block of a dataset card
    (Gebru et al. "Datasheets for Datasets" shape): corpus size,
    source/language spread, token mass, exact-duplication rate (via
    16-byte digests, never shuffling text), and the Gopher quality
    pass rate.  Every signal is a per-row expression feeding ONE
    aggregate — a single scan of a 100 TB corpus (the countDistincts
    expand to one multi-phase aggregate over digest/source/lang
    keys)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    flagged = xfilt.gopher_rule_flags(docs)
    words = F.expr(
        "size(filter(split(coalesce(text, ''), '\\\\s+'), __x -> __x != ''))"
    )
    return flagged.withColumn("__nw", words).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum("__nw").alias("total_tokens"),
        F.round(F.sum("__nw") / F.count(F.lit(1)), 2).alias("avg_doc_tokens"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.round(
            1.0
            - F.countDistinct(F.md5("text"))
            / F.greatest(F.count("text"), F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
        F.round(
            F.sum(F.col("passes").cast("int")) / F.count(F.lit(1)), 6
        ).alias("gopher_pass_rate"),
    )


_C4_POLICY = ("terms of use", "privacy policy", "cookie policy", "uses cookies")
_C4_POLICY_OR = " OR ".join(f"contains(lower(text), '{p}')" for p in _C4_POLICY)


@query(
    "quality_c4_rules",
    oracle=f"""
WITH fl AS (
  SELECT source,
         contains(text, '{{') AS fail_curly,
         contains(lower(text), 'lorem ipsum') AS fail_lorem,
         ({_C4_POLICY_OR}) AS fail_policy,
         len(regexp_extract_all(text, '[.!?]')) < 3 AS fail_sentences
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(fail_curly AS INT)) AS BIGINT) AS n_fail_curly,
       CAST(SUM(CAST(fail_lorem AS INT)) AS BIGINT) AS n_fail_lorem,
       CAST(SUM(CAST(fail_policy AS INT)) AS BIGINT) AS n_fail_policy,
       CAST(SUM(CAST(fail_sentences AS INT)) AS BIGINT) AS n_fail_sentences,
       CAST(SUM(CAST(NOT (fail_curly OR fail_lorem OR fail_policy
                          OR fail_sentences) AS INT)) AS BIGINT) AS n_pass
FROM fl GROUP BY source ORDER BY source
""",
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 page-rule battery per source (Raffel et al. 2020 §2.2):
    curly braces, lorem ipsum, policy boilerplate, too-few sentences —
    one map-only projection + a tiny per-source aggregate, the
    companion screen to the Gopher battery."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xfilt.c4_rules(docs, by="source").orderBy("source")


_C4_LINE_KEEP_SQL = (
    "regexp_matches(trim(__l), '[.!?\"]$')"
    " AND len(list_filter(string_split_regex(trim(__l), '\\s+'),"
    " __w -> __w != '')) >= 5"
    " AND NOT contains(lower(__l), 'javascript')"
    + "".join(
        f" AND NOT contains(lower(__l), '{p}')" for p in _C4_POLICY
    )
)


@query(
    "text_c4_line_stats",
    oracle=f"""
WITH d AS (
  SELECT source,
         list_filter(string_split(COALESCE(text, ''), chr(10)),
                     __l -> trim(__l) != '') AS lines
  FROM documents
),
s AS (
  SELECT source,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines, __l -> {_C4_LINE_KEEP_SQL}))
              AS BIGINT) AS n_kept
  FROM d
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_lines) AS BIGINT) AS total_lines,
       CAST(SUM(n_kept) AS BIGINT) AS kept_lines,
       ROUND(SUM(n_kept) * 1.0 / GREATEST(SUM(n_lines), 1), 6) AS kept_frac,
       CAST(SUM(CAST(n_kept = n_lines AS INT)) AS BIGINT) AS docs_intact
FROM s GROUP BY source ORDER BY source
""",
)
def text_c4_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-retention summary per source: how much of each page
    survives the keep-terminal-punctuation / ≥5-words / no-js-or-
    policy-phrase line filter (the rewrite itself is
    ``c4_clean_text``; the stats form keeps the output
    corpus-sized).  Array HOFs end-to-end — map-only scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    st = xfilt.c4_line_stats(docs, keep_cols=["source"])
    return (
        st.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").alias("total_lines"),
            F.sum("n_kept").alias("kept_lines"),
            F.round(
                F.sum("n_kept")
                / F.greatest(F.sum("n_lines"), F.lit(1)),
                6,
            ).alias("kept_frac"),
            F.sum(F.col("intact").cast("long")).alias("docs_intact"),
        )
        .orderBy("source")
    )


def _bigram_lm_oracle(
    dim_uni: int = 256,
    dim_bi: int = 2048,
    lam: float = 0.75,
    fit_modulus: int = 4,
) -> str:
    """SQL twin of ``word_bigram_nll``: same xxhash64 buckets
    (unsigned % dim == pmod of the signed hash for power-of-two
    dims), same chr(31)-joined pair keys, same Jelinek-Mercer +
    Laplace arithmetic in the same left-to-right association.  Hashes
    run once per DISTINCT token / pair (map CTEs) — the pure-SQL
    XXH64 is ~1000 ops per call."""
    w_hash = xx.xxh64_bytes(xx.utf8_bytes("__w"), 42)
    p_hash = xx.xxh64_bytes(xx.utf8_bytes("__p"), 42)
    lam_s, one_m = repr(float(lam)), repr(1.0 - float(lam))
    return f"""
WITH d2 AS (
  SELECT doc_id, {_WORDS_SQL} AS ws
  FROM documents WHERE text IS NOT NULL
  AND len({_WORDS_SQL}) >= 2
),
prs AS (
  SELECT doc_id,
         list_transform(range(1, len(ws)),
                        __i -> ws[__i] || chr(31) || ws[__i + 1]) AS ps
  FROM d2
),
distw AS (SELECT DISTINCT unnest(ws) AS __w FROM d2),
hu AS (
  SELECT __w AS w, CAST(({w_hash}) % {dim_uni} AS BIGINT) AS b FROM distw
),
um AS (SELECT MAP(list(w), list(b)) AS mu FROM hu),
distp AS (SELECT DISTINCT unnest(ps) AS __p FROM prs),
hp AS (
  SELECT __p AS p, CAST(({p_hash}) % {dim_bi} AS BIGINT) AS b FROM distp
),
pm AS (SELECT MAP(list(p), list(b)) AS mp FROM hp),
ucnt AS (
  SELECT h.b, COUNT(*) AS c
  FROM (SELECT unnest(ws) AS w FROM d2 WHERE doc_id % {fit_modulus} = 0) u
  JOIN hu h ON u.w = h.w GROUP BY 1
),
pcnt AS (
  SELECT h.b, COUNT(*) AS c
  FROM (SELECT unnest(ps) AS p FROM prs WHERE doc_id % {fit_modulus} = 0) u
  JOIN hp h ON u.p = h.p GROUP BY 1
),
ua AS (
  SELECT list(COALESCE(c.c, 0) ORDER BY g.i) AS cu,
         SUM(COALESCE(c.c, 0)) AS n
  FROM range(0, {dim_uni}) g(i) LEFT JOIN ucnt c ON c.b = g.i
),
pa AS (
  SELECT list(COALESCE(c.c, 0) ORDER BY g.i) AS cb
  FROM range(0, {dim_bi}) g(i) LEFT JOIN pcnt c ON c.b = g.i
)
SELECT doc_id,
       CAST(len(ws) - 1 AS BIGINT) AS n_bigrams,
       ROUND(-(list_reduce([0.0::DOUBLE] ||
           list_transform(range(1, len(ws)), __i ->
             ln({lam_s} * (cb[CAST(mp[ws[__i] || chr(31) || ws[__i + 1]][1]
                               AS INT) + 1] + 1)
                  / (cu[CAST(mu[ws[__i]][1] AS INT) + 1] + {dim_bi})
              + {one_m} * (cu[CAST(mu[ws[__i + 1]][1] AS INT) + 1] + 1)
                  / (n + {dim_uni}))),
           (__a, __b) -> __a + __b)) / (len(ws) - 1), 6) AS nll
FROM prs JOIN d2 USING (doc_id), um, pm, ua, pa
"""


@query("text_bigram_lm_nll", oracle=_bigram_lm_oracle())
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated hashed word-bigram LM NLL per document — the
    word-order-aware rung of the CCNet perplexity-filter ladder
    (chargram NLL sees characters; this sees token sequence).  Model
    fits on the deterministic doc_id % 4 slice, scoring covers every
    doc; two dim-bounded aggregates + broadcast two-array model +
    map-only HOF scoring."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return xfilt.word_bigram_nll(
        docs, dim_uni=256, dim_bi=2048, lam=0.75, fit_modulus=4
    )
