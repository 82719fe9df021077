"""Oracle-checked queries for the corpus-curation extensions
(§7.5): contamination, repetition filtering, sequence packing,
mixture reweighting, shuffle order, and k-NN graph density.

The documents table has no planted contamination, so the
contamination query derives an eval set as mid-document excerpts
(40% of chars starting at 30%) of every ``doc_id % 37 == 0``
document — deterministic in both engines, guaranteeing true hits
whose containment the oracle reproduces exactly.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fastmlframework_spark.core import checkpoints

from fastmlframework_spark.core.tables import fan_out, load_table
from fastmlframework_spark.extensions import curation as xcur
from fastmlframework_spark.extensions import similarity as xsim
from fastmlframework_spark.extensions.text import TOKEN_PATTERN
from fastmlframework_spark.queries.registry import query

# Absolute sample budget for the knn-density diagnostic: bounds the
# exact-graph pair count at ~budget² independent of corpus size.
_KNN_SAMPLE_BUDGET = 1024

_EXCERPT = (
    "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
    " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
)


@query(
    "contamination_eval_overlap",
    oracle=f"""
WITH ev AS (
  SELECT doc_id AS eval_id, {_EXCERPT} AS text
  FROM documents WHERE doc_id % 37 = 0
),
twk AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
tidx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 4, 1))) AS i
  FROM twk
),
tsh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS shingle
  FROM tidx
),
ewk AS (SELECT eval_id, string_split_regex(text, '\\s+') AS w FROM ev),
eidx AS (
  SELECT eval_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 4, 1))) AS i
  FROM ewk
),
esh AS (
  SELECT DISTINCT eval_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS shingle
  FROM eidx
),
esizes AS (SELECT eval_id, COUNT(*) AS n_eval_sh FROM esh GROUP BY eval_id),
common AS (
  SELECT t.doc_id, e.eval_id, COUNT(*) AS n_common
  FROM tsh t JOIN esh e ON t.shingle = e.shingle
  GROUP BY 1, 2
)
SELECT doc_id, eval_id, n_common,
       ROUND(n_common * 1.0 / n_eval_sh, 6) AS containment
FROM common JOIN esizes USING (eval_id)
WHERE n_common * 1.0 / n_eval_sh >= 0.5
""",
)
def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training docs containing
    ≥ 50% of an eval excerpt's distinct 5-gram shingles.  The planted
    excerpts guarantee every eval item flags (at least) its source
    document; the broadcast inverted index keeps the corpus
    scan-only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"), F.expr(_EXCERPT).alias("text")
    )
    return xcur.eval_contamination(
        docs, evals, n=5, min_containment=0.5
    )


def _bloom_oracle(
    n: int = 5, num_bits: int = 8192, num_hashes: int = 5
) -> str:
    """SQL twin of ``ngram_bloom_filter`` + ``bloom_probe_stats``:
    rebuilds the identical packed bit array (same xxhash64 via the
    validated ``xxh64_sql`` twin, same Kirsch–Mitzenmacher double
    hashing, same 32-bit word packing) and replays every bit test per
    train shingle with list lambdas — bit-exact, so even the Bloom
    FALSE POSITIVES match row-for-row."""
    from fastmlframework_spark.queries import xxh64_sql as xx

    wb = 32
    nwords = num_bits // wb
    # [h1, h2_odd] from one unsigned xxhash64: the HUGEINT state's low
    # and (odd-forced) high 32-bit halves, matching Spark's
    # (h & 0xFFFFFFFF) / (shiftrightunsigned(h, 32) | 1) on the signed
    # two's-complement view of the same bits.
    hpair = xx.let(
        xx.xxh64_bytes(xx.utf8_bytes("s"), 42),
        "__u",
        "[CAST(__u % 4294967296 AS BIGINT), "
        "CAST(__u // 4294967296 - (__u // 4294967296) % 2 + 1 AS BIGINT)]",
    )

    def pos(i: int) -> str:
        return f"((h[1] + {i} * h[2]) % {num_bits})"

    tests = " AND ".join(
        f"((words[CAST({pos(i)} // {wb} AS INT) + 1] & "
        f"(1::BIGINT << CAST({pos(i)} % {wb} AS INT))) <> 0)"
        for i in range(num_hashes)
    )
    return f"""
WITH ev AS (SELECT {_EXCERPT} AS text FROM documents WHERE doc_id % 37 = 0),
ewk AS (SELECT string_split_regex(text, '\\s+') AS w FROM ev),
eix AS (
  SELECT w, unnest(generate_series(1, GREATEST(len(w) - {n - 1}, 1))) AS i
  FROM ewk
),
esh AS (
  SELECT DISTINCT
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ') AS s
  FROM eix
),
eh AS (SELECT {hpair} AS h FROM esh),
ebits AS (
  SELECT CAST((h[1] + t.i * h[2]) % {num_bits} AS BIGINT) AS pos
  FROM eh, range({num_hashes}) t(i)
),
ew AS (
  SELECT pos // {wb} AS word,
         bit_or(1::BIGINT << CAST(pos % {wb} AS INT)) AS mask
  FROM ebits GROUP BY 1
),
flist AS (
  SELECT list(COALESCE(ew.mask, 0) ORDER BY gi.i) AS words
  FROM range({nwords}) gi(i) LEFT JOIN ew ON ew.word = gi.i
),
twk AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
tix AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - {n - 1}, 1))) AS i
  FROM twk
),
tsh AS (
  SELECT doc_id,
         list_distinct(list(
           array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ')
         )) AS shs
  FROM tix GROUP BY doc_id
),
th AS (SELECT doc_id, list_transform(shs, s -> {hpair}) AS hs FROM tsh),
scored AS (
  SELECT doc_id, len(hs) AS n_shingles,
         len(list_filter(hs, h -> {tests})) AS n_hits
  FROM th CROSS JOIN flist
)
SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles,
       CAST(n_hits AS INT) AS n_hits,
       ROUND(n_hits * 1.0 / n_shingles, 6) AS hit_ratio
FROM scored WHERE n_shingles > 0 AND n_hits > 0
"""


@query("contamination_bloom_screen", oracle=_bloom_oracle())
def contamination_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-screen: training docs with ≥1
    distinct 5-gram present (per the filter) in the union of the eval
    excerpts — the O(bits)-index, zero-shuffle, map-only complement of
    ``contamination_eval_overlap``'s exact containment join.  The
    planted excerpts guarantee every source doc flags with a high
    hit_ratio; the bit-exact oracle reproduces even the false
    positives, so the hash match covers the screen's real behavior."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.expr(_EXCERPT).alias("text")
    )
    bloom = xcur.ngram_bloom_filter(
        evals, n=5, num_bits=8192, num_hashes=5
    )
    # fan_out: the probe is a CPU-bound pure map over an unsplittable
    # single-row-group scan (guide §2.5) — per-row output, so the
    # round-robin spread cannot change a value; no-op at scale.
    return xcur.bloom_probe_stats(fan_out(docs), bloom).filter(
        F.col("n_hits") > 0
    )


@query(
    "quality_repetition_filter",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{TOKEN_PATTERN}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_ratio
FROM t
WHERE len(toks) > 0
  AND len(list_distinct(toks)) * 1.0 / len(toks) < 0.4
""",
)
def quality_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality filter: documents whose distinct-token ratio
    falls below 0.4 — the cheap boilerplate/template screen of corpus
    curation.  Map-only scan; the ratio is a per-row expression."""
    docs = load_table(spark, sf_dir, "documents")
    stats = xcur.repetition_stats(docs)
    return stats.filter(F.col("distinct_ratio") < 0.4).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
    )


@query(
    "pack_sequences_sharded",
    oracle=f"""
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
             AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT shard, CAST(FLOOR(cum_before / 512) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM c GROUP BY shard, pack_id
ORDER BY shard, pack_id
""",
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing summary: per (shard, pack) document and token
    counts for concat-then-chunk packing into 512-token contexts over
    8 hash shards — the pre-training batch-assembly step, kept
    shard-parallel (no global stream)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = xcur.pack_streams(docs, ctx=512, shards=8)
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("shard", "pack_id")
    )


@query(
    "corpus_mixture_weights",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS total, COUNT(*) AS n_groups FROM counts)
SELECT source, n_docs,
       ROUND(n_docs * 1.0 / total, 6) AS share,
       ROUND((1.0 / n_groups) / (n_docs * 1.0 / total), 6) AS weight
FROM counts, tot
ORDER BY source
""",
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weight that
    moves the observed source mix to uniform — the mixture-control
    step of corpus assembly.  Aggregate-sized throughout."""
    docs = load_table(spark, sf_dir, "documents")
    return xcur.mixture_weights(docs, by="source").orderBy("source")


@query(
    "shuffle_training_order",
    oracle="""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuf7'), doc_id
       ) AS BIGINT) AS rank
FROM documents
""",
)
def shuffle_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: rank 1..N in
    md5(key||salt) order via distributed range-partitioned sort +
    per-partition offsets (never a single-partition window)."""
    docs = load_table(spark, sf_dir, "documents")
    return xcur.shuffle_order(docs, key_col="doc_id", salt="shuf7")


@query(
    "knn_density_by_label",
    oracle="""
WITH th AS (
  SELECT CASE WHEN COUNT(*) <= 1024 THEN 'g'
              ELSE lower(lpad(to_hex(CAST(FLOOR(
                     1024.0 / COUNT(*) * 4294967296) AS BIGINT)), 8, '0'))
         END AS t
  FROM embeddings
),
c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings, th
  WHERE substring(md5(CAST(vec_id AS VARCHAR) || ':knn'), 1, 8) < th.t
),
scored AS (
  SELECT a.vec_id AS qid, a.label AS label, b.vec_id AS cid,
         ROUND(list_cosine_similarity(b.v, a.v), 6) AS cosine
  FROM c a JOIN c b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, label, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT label, ROUND(AVG(cosine), 6) AS avg_k3_cosine, COUNT(*) AS n
FROM ranked WHERE rank = 3
GROUP BY label
""",
)
def knn_density_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph density: per-label mean cosine of each vector's
    3rd-nearest neighbor — the embedding-space density diagnostic
    behind semantic-dedup pruning decisions (dense regions ⇒
    redundancy).

    Density is ESTIMATED on a deterministic hash-sample with an
    ABSOLUTE row budget (~1024 vectors): the threshold is derived from
    the table count, so the brute-force pair count stays ~1024² no
    matter how large the corpus grows — a fixed *fraction* would leave
    the statistic quadratic in N.  The budget-sized exact graph is the
    right tool for a corpus-level mean; per-vector retrieval at scale
    goes through `extensions/similarity.py:ivf_topk` instead.  Both
    engines compute the same double-precision threshold from the same
    count, so the sampled id set is identical."""
    emb_all = load_table(spark, sf_dir, "embeddings")
    n = emb_all.count()
    if n <= _KNN_SAMPLE_BUDGET:
        thresh = "g"  # lexically above any hex digit: keep everything
    else:
        thresh = format(
            math.floor(_KNN_SAMPLE_BUDGET / n * 4294967296), "08x"
        )
    emb = emb_all.filter(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":knn"))),
            1,
            8,
        )
        < thresh
    )
    vecs = emb.select("vec_id", "embedding")
    nn3 = xsim.knn_graph(vecs, k=3).filter(F.col("rank") == 3)
    labels = emb.select(F.col("vec_id").alias("query_id"), "label")
    return (
        nn3.join(labels, on="query_id")
        .groupBy("label")
        .agg(
            F.round(F.avg("cosine"), 6).alias("avg_k3_cosine"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "canonical_digests",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^A-Za-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS canon_digest,
       CAST(LENGTH(trim(regexp_replace(regexp_replace(lower(text),
           '[^A-Za-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS BIGINT)
           AS canon_chars
FROM documents
ORDER BY doc_id
""",
)
def canonical_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization digests: md5 of the lowercased,
    punctuation-stripped, whitespace-collapsed text — the dedup key
    that collapses trivial formatting variants before exact/near-dup
    detection."""
    from fastmlframework_spark.extensions.text import canonicalize

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        canonicalize(docs)
        .select(
            "doc_id",
            F.md5("canon").alias("canon_digest"),
            F.length("canon").cast("long").alias("canon_chars"),
        )
    )


from fastmlframework_spark.queries.text import _QUALITY_SQL


@query(
    "quality_decile_stats",
    oracle=f"""
WITH q AS (
  SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents
),
r AS (
  SELECT doc_id, quality,
         ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rnk,
         COUNT(*) OVER () AS total
  FROM q
)
SELECT CAST(1 + FLOOR((rnk - 1) * 10.0 / total) AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       ROUND(AVG(quality), 6) AS avg_quality,
       ROUND(MIN(quality), 6) AS min_quality,
       ROUND(MAX(quality), 6) AS max_quality
FROM r GROUP BY decile ORDER BY decile
""",
)
def quality_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality stratification: documents ranked by quality score into
    10 equal-width rank deciles (explicit floor arithmetic, identical
    in both engines) with per-decile stats — the "drop the bottom
    quality band" selection step.  The global rank is distributed
    (`global_rank`), never a one-partition window."""
    from fastmlframework_spark.extensions.text import quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Materialize the scored frame (2 narrow columns, ~0.1% of the
    # text it came from) before ranking: repartitionByRange SAMPLES
    # its child to pick bounds, so ranking the raw lineage runs the
    # whole regex battery twice.  The checkpoint RDD is released by
    # the ContextCleaner once the result frame is dropped.
    q = checkpoints.checkpoint(
        quality_score(docs).select("doc_id", "quality"), eager=False
    )
    # N rides along from global_rank's own partition-size aggregate —
    # a separate count() would re-run the whole quality_score lineage
    ranked = xcur.global_rank(
        q,
        order_cols=["quality", "doc_id"],
        keep_cols=["quality"],
        total_col="__total",
    )
    return (
        ranked
        .withColumn(
            "decile",
            (
                1 + F.floor((F.col("rank") - 1) * 10.0 / F.col("__total"))
            ).cast("long"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
        )
        .orderBy("decile")
    )


@query(
    "corpus_resample_weighted",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS total, COUNT(*) AS n_groups FROM counts),
w AS (
  SELECT source,
         ROUND((1.0 / n_groups) / (n_docs * 1.0 / total), 6) AS weight
  FROM counts, tot
),
thresh AS (
  SELECT source,
         lpad(lower(to_hex(CAST(LEAST(FLOOR(LEAST(1.0, weight * 0.3) * 65536),
                                      65535) AS BIGINT))), 4, '0') AS hx
  FROM w
)
SELECT doc_id, source
FROM documents JOIN thresh USING (source)
WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':rs'), 1, 4) < hx
ORDER BY doc_id
""",
)
def corpus_resample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized importance-weighted downsample: each document is
    kept with probability weight×0.3 (weight from
    `corpus_mixture_weights`, moving the mix toward uniform) decided
    by a deterministic hash threshold — reproducible under any
    partitioning, no RNG stream, and the filter composes with scan
    pushdown.  The per-source thresholds are a broadcast of
    aggregate-sized rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = xcur.mixture_weights(docs, by="source").select("source", "weight")
    thresh = w.select(
        "source",
        F.lpad(
            F.lower(
                F.hex(
                    F.least(
                        F.floor(
                            F.least(F.lit(1.0), F.col("weight") * 0.3) * 65536
                        ),
                        F.lit(65535),
                    ).cast("long")
                )
            ),
            4,
            "0",
        ).alias("hx"),
    )
    return (
        docs.join(F.broadcast(thresh), on="source")
        .filter(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rs"))),
                1,
                4,
            )
            < F.col("hx")
        )
        .select("doc_id", "source")
    )


@query(
    "corpus_mixture_temperature",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(n_docs) AS total,
         SUM(POW(n_docs * 1.0, 0.5)) AS z
  FROM counts
)
SELECT source, n_docs,
       ROUND(n_docs * 1.0 / total, 6) AS share,
       ROUND((POW(n_docs * 1.0, 0.5) / z) / (n_docs * 1.0 / total), 6)
           AS weight
FROM counts, tot
ORDER BY source
""",
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture target (alpha = 0.5): rare
    sources get boosted ∝ share^-0.5 instead of all the way to
    uniform — the standard multilingual/data-mixing reweighting."""
    docs = load_table(spark, sf_dir, "documents")
    return xcur.mixture_weights(docs, by="source", alpha=0.5).orderBy(
        "source"
    )


# Planted-boilerplate corpus: the synthetic documents are single-line
# and duplicate-free, so boilerplate is derived deterministically in
# both engines — a shared header line on doc_id % 3 == 0 and a shared
# footer on doc_id % 4 == 0 (doc frequencies ≈ n/3 and n/4, far above
# the threshold; every original text line has doc frequency 1).
_BP_HEADER = "ALL RIGHTS RESERVED - SITE NAVIGATION - COOKIE NOTICE"
_BP_FOOTER = "POWERED BY EXAMPLE CMS | TERMS | PRIVACY"

_BP_CORPUS_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN '{_BP_HEADER}' || chr(10) || text ELSE text END
       || CASE WHEN doc_id % 4 = 0
               THEN chr(10) || '{_BP_FOOTER}' ELSE '' END AS text
FROM documents
"""


@query(
    "text_remove_boilerplate",
    oracle=f"""
WITH corpus AS ({_BP_CORPUS_SQL}),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM corpus
),
hot AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= 20
),
kept AS (
  SELECT l.* FROM lines l ANTI JOIN hot h ON l.line = h.line
),
rebuilt AS (
  SELECT doc_id,
         COUNT(*) AS n_kept,
         STRING_AGG(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(string_split(c.text, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(string_split(c.text, chr(10))) - COALESCE(r.n_kept, 0)
            AS BIGINT) AS n_removed
FROM corpus c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id
""",
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet/Dolma recipe) over a
    corpus with planted shared header/footer lines: lines in ≥ 20
    distinct docs are dropped everywhere, text reassembled in order.
    Every doc keeps its original content; only the planted chrome
    goes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(_BP_HEADER + "\n"),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\n" + _BP_FOOTER),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return xcur.remove_boilerplate_lines(
        corpus, min_doc_freq=20
    )


_EPOCHS_BUDGET = 100_000
_EPOCHS_ALPHA = 0.5


@query(
    "corpus_epochs_plan",
    oracle=f"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'),
                         __x -> __x <> '')) AS t
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT source, COUNT(*) AS n_docs, SUM(t) AS avail FROM t GROUP BY 1
),
z AS (SELECT SUM(POW(avail, {_EPOCHS_ALPHA})) AS z FROM c)
SELECT source,
       n_docs,
       CAST(avail AS BIGINT) AS tokens_available,
       ROUND(POW(avail, {_EPOCHS_ALPHA}) / z, 6) AS target_share,
       CAST(FLOOR({_EPOCHS_BUDGET} * (POW(avail, {_EPOCHS_ALPHA}) / z))
            AS BIGINT) AS tokens_needed,
       ROUND(CAST(FLOOR({_EPOCHS_BUDGET} * (POW(avail, {_EPOCHS_ALPHA}) / z))
                  AS BIGINT) * 1.0 / avail, 6) AS epochs
FROM c, z
""",
)
def corpus_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget training plan under a temperature-0.5 target
    mixture: per-source token mass, required contribution toward a
    100k-token budget, and the implied epoch count (epochs > 1 =
    deliberate repetition — the data-constrained planning shape)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return xcur.epochs_plan(
        docs, _EPOCHS_BUDGET, alpha=_EPOCHS_ALPHA
    )


@query(
    "curation_url_domains",
    oracle="""
WITH planted AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 = 0
              THEN ' see http://www.site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.com/page'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' via https://spam.example.com/x'
              ELSE '' END AS text
  FROM documents WHERE text IS NOT NULL
),
hosts AS (
  SELECT doc_id,
         lower(regexp_replace(unnest(
             regexp_extract_all(text, 'https?://([^/\\s]+)', 1)
         ), '^www\\.', '')) AS domain
  FROM planted
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       domain IN ('spam.example.com', 'ads.example.net') AS blocked
FROM hosts GROUP BY domain
""",
)
def curation_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style URL-domain curation stats: URLs planted
    deterministically into the synthetic corpus (the boilerplate-query
    pattern), then extracted/normalized per domain with blocklist
    flags — map-only regexp + a domain-bounded aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" see http://www.site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/page"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" via https://spam.example.com/x"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return xcur.url_domain_stats(planted)


@query(
    "quality_encoding_screen",
    oracle="""
WITH planted AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 4 = 0 THEN repeat(chr(65533), doc_id % 3 + 1)
              ELSE '' END ||
         CASE WHEN doc_id % 6 = 0 THEN chr(1) || chr(2) ELSE '' END AS t
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT)
           AS n_replacement,
       CAST(len(regexp_extract_all(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))
           AS BIGINT) AS n_control,
       ROUND((len(regexp_extract_all(t, chr(65533)))
              + len(regexp_extract_all(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')))
             * 1.0 / greatest(length(t), 1), 6) AS bad_char_frac
FROM planted
""",
)
def quality_encoding_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake/encoding-damage screen: U+FFFD replacement chars and
    C0 control chars planted deterministically, then counted per
    document by the map-only encoding_quality operator."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.expr("repeat('�', CAST(doc_id % 3 + 1 AS INT))"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit("\x01\x02")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return xcur.encoding_quality(planted)


# The CORRECTNESS contract runs at sf=0.01 (500-vector embeddings
# fixture); the oracle inlines the plane count the operator's
# adaptive default derives for that corpus size — via the SAME
# adaptive_n_planes function, so a formula change cannot
# desynchronize the twin (same pattern as queries/dedup.py's
# _ORACLE_EMBED_CORPUS_ROWS).
_ORACLE_CONTAM_CORPUS_ROWS = 500


def _embedding_contamination_oracle(
    dim: int = 64, threshold: float = 0.999
) -> str:
    """Literal SQL twin of ``curation.embedding_contamination`` over
    the planted eval slice: seed-7 hyperplanes inlined, double-square
    norms and the cast-first left-to-right dot mirroring the Spark
    expressions bit-exactly (queries/lsh_sql.py)."""
    from fastmlframework_spark.extensions.dedup import adaptive_n_planes
    from fastmlframework_spark.extensions.similarity import hyperplanes
    from fastmlframework_spark.queries import lsh_sql as L

    planes = hyperplanes(
        dim, adaptive_n_planes(_ORACLE_CONTAM_CORPUS_ROWS), seed=7
    )
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding AS v,
         sqrt({L.norm_sq_double_sql("embedding")}) AS nrm,
         {L.bucket_sql("embedding", planes)} AS bucket
  FROM embeddings
),
ev AS (
  SELECT embedding AS v,
         sqrt({L.norm_sq_double_sql("embedding")}) AS nrm,
         {L.bucket_sql("embedding", planes)} AS bucket
  FROM embeddings WHERE vec_id % 10 = 0
),
hits AS (
  SELECT c.vec_id,
         ROUND({L.dot_sql("c.v", "e.v", dim, cast_a=True)}
               / (c.nrm * e.nrm), 6) AS cosine
  FROM corpus c JOIN ev e ON c.bucket = e.bucket
)
SELECT vec_id, COUNT(*) AS n_eval_matches, MAX(cosine) AS max_cosine
FROM hits WHERE cosine >= {threshold}
GROUP BY vec_id
"""


@query(
    "contamination_embedding_eval", oracle=_embedding_contamination_oracle()
)
def contamination_embedding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: every ``vec_id %
    10 == 0`` vector doubles as a planted eval item, and the flagged
    set must contain (at least) each eval vector's own original at
    cosine 1.0 — paraphrase-level contamination that
    ``contamination_eval_overlap``'s n-gram containment cannot see.
    Corpus side is one map-only bucket scan; the benchmark-sized eval
    side broadcasts (the ingest-index-probe shape at 100 TB).  Full
    hash-matched oracle via the inlined seed-7 hyperplanes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    evals = emb.filter(F.col("vec_id") % 10 == 0).select("embedding")
    return xcur.embedding_contamination(emb, evals)


@query(
    "corpus_token_budget",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS quality,
         CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
             AS n_tokens
  FROM documents
),
r AS (
  SELECT *,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n_tokens) OVER () AS total
  FROM q
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       ROUND(MIN(quality), 6) AS min_quality
FROM r WHERE cum - n_tokens < 0.5 * total
GROUP BY source ORDER BY source
""",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection: take documents best-quality
    first until half the corpus's tokens are spent (the boundary doc
    included — budgets are met, never undershot), reported per source
    — the dataset-construction step of a training run sized in
    TOKENS, not rows, and the per-source mix it implies.

    The running token sum is `global_rank`'s distributed prefix sum
    (range-partitioned cumsum + per-partition offsets); the budget
    derives from the same per-partition sums, so the scored frame —
    lazily checkpointed, it is 4 narrow columns — is scanned once
    with no single-partition window.  The oracle replays the
    selection with a plain SQL window cumsum; integer token counts
    keep both engines' sums exact, so the `<` boundary cannot flip."""
    from fastmlframework_spark.extensions.text import (
        count_bpe_tokens,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    scored = (
        quality_score(docs)
        .select(
            "doc_id",
            "source",
            "quality",
            count_bpe_tokens(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    scored = checkpoints.checkpoint(scored, eager=False)
    sel = xcur.select_to_token_budget(
        scored, budget_frac=0.5, keep_cols=["source", "quality"]
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.min("quality"), 6).alias("min_quality"),
        )
        .orderBy("source")
    )


def _funnel_oracle(
    num_hashes: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    """SQL twin of the 4-stage curation funnel: the Gopher flag CTEs
    re-keyed by doc_id over the planted dedup corpus, the md5 window
    min of ``dedup_exact``, and the xxhash64 MinHash band twin of
    ``dedup_minhash_lsh`` — composed into one cumulative survivor
    pipeline."""
    from fastmlframework_spark.queries.dedup import _CORPUS_SQL, _mh_sql_parts
    from fastmlframework_spark.queries.filtering import _gopher_fl_ctes

    hlist, sig_cols, band_eq, agree = _mh_sql_parts(num_hashes, bands)
    fails = (
        "fail_words OR fail_word_len OR fail_symbol OR fail_bullet"
        " OR fail_ellipsis OR fail_alpha OR fail_stopword"
    )
    return f"""
WITH corpus AS ({_CORPUS_SQL}),
{_gopher_fl_ctes(keys="doc_id", rel="corpus")},
p2 AS (SELECT doc_id, n_words FROM fl WHERE NOT ({fails})),
txt AS (
  SELECT c.doc_id, c.text, p.n_words FROM corpus c JOIN p2 p USING (doc_id)
),
s3 AS (
  SELECT doc_id, text, n_words FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS __mn FROM txt
  ) WHERE doc_id = __mn
),
hashed AS (SELECT doc_id, {hlist} AS __H FROM s3),
sg AS (SELECT doc_id, {sig_cols} FROM hashed),
cand AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         ({agree}) / {float(num_hashes)} AS agr
  FROM sg a JOIN sg b ON a.doc_id < b.doc_id AND ({band_eq})
),
dropped AS (SELECT DISTINCT key_b FROM cand WHERE agr >= {threshold}),
s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT key_b FROM dropped))
SELECT CAST(1 AS INT) AS stage, 'raw' AS stage_name,
       COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_tokens
FROM fl
UNION ALL
SELECT 2, 'quality', COUNT(*),
       CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM p2
UNION ALL
SELECT 3, 'exact_dedup', COUNT(*),
       CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s3
UNION ALL
SELECT 4, 'near_dedup', COUNT(*),
       CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s4
ORDER BY stage
"""


@query("curation_funnel", oracle=_funnel_oracle())
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation shrinkage report over the planted
    dedup corpus: docs/tokens surviving raw → Gopher quality →
    exact dedup → MinHash near-dedup, each gate shrinking the
    candidate set for the costlier gate after it.  Fully
    oracle-backed by composing the Gopher flag CTEs, the md5 exact-
    dedup grouping, and the bit-exact xxhash64 MinHash twin."""
    from fastmlframework_spark.queries.dedup import _corpus

    return xcur.curation_funnel(_corpus(spark, sf_dir))


@query(
    "source_language_entropy",
    oracle="""
WITH c AS (
  SELECT source, lang, COUNT(*) AS n
  FROM documents GROUP BY source, lang
),
t AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         COUNT(*) AS n_langs,
         list_sort(list(lang)) AS langs,
         list_reduce(
           [0.0::DOUBLE] ||
           list_transform(
             list_sort(list({'k': lang, 'v': n})),
             __e -> -(__e.v * 1.0 / SUM(n))
                    * ln(__e.v * 1.0 / SUM(n))),
           (__a, __b) -> __a + __b) AS ent
  FROM c GROUP BY source
)
SELECT source, n_docs, n_langs, ROUND(ent, 6) AS lang_entropy
FROM t ORDER BY source
""",
)
def source_language_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each source monolingual?  Per-source language-mix entropy
    (nats) — the source-homogeneity number a mixture plan reads next
    to the datacard (high entropy → the source label is NOT a
    language proxy and lang-conditioned sampling must split it).

    Cross-engine float EXACTNESS on an unordered aggregate: entropy
    terms are folded LEFT-TO-RIGHT over the per-source language list
    sorted by language — a sorted HOF fold in both engines — because
    a plain SUM over grouped floats has engine-dependent addend order
    and can flip the rounded hash.  Shuffle is language-bounded
    (|sources|×|langs| rows); the corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    per_src = c.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sort_array(
            F.collect_list(F.struct(F.col("lang").alias("k"),
                                    F.col("n").alias("v")))
        ).alias("__kv"),
    )
    ent = (
        "aggregate(__kv, 0.0D, (__a, __e) -> "
        "__a + (-(__e.v * 1.0D / n_docs) * ln(__e.v * 1.0D / n_docs)))"
    )
    return per_src.select(
        "source",
        "n_docs",
        "n_langs",
        F.round(F.expr(ent), 6).alias("lang_entropy"),
    ).orderBy("source")


def _qual_by_dup_oracle() -> str:
    """Exact-dup membership (md5 group size > 1 over the planted
    corpus) crossed with the Gopher verdict of the ORIGIN document."""
    from fastmlframework_spark.queries.dedup import _CORPUS_SQL as corpus_sql
    from fastmlframework_spark.queries.filtering import _gopher_fl_ctes

    fails = (
        "fail_words OR fail_word_len OR fail_symbol OR fail_bullet"
        " OR fail_ellipsis OR fail_alpha OR fail_stopword"
    )
    return f"""
WITH corpus AS ({corpus_sql}),
dup AS (
  SELECT doc_id,
         COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS is_dup
  FROM corpus
),
{_gopher_fl_ctes(keys="doc_id", rel="corpus")}
SELECT d.is_dup,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT ({fails}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass,
       ROUND(SUM(CASE WHEN NOT ({fails}) THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS pass_rate
FROM dup d JOIN fl USING (doc_id)
GROUP BY d.is_dup ORDER BY d.is_dup
"""


@query("quality_by_dup_status", oracle=_qual_by_dup_oracle())
def quality_by_dup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are duplicated documents lower quality?  Gopher pass rate split
    by exact-duplicate membership over the planted corpus — the
    empirical check behind "dedup first, filter second" ordering
    debates (if dups pass at the same rate, gate order is a pure cost
    question; if not, it changes the surviving mix).

    Plan: dup membership is the digest-partitioned count window
    (digest-sized shuffle keys), the verdict is the map-only Gopher
    battery, and the result is a 2-row aggregate."""
    from fastmlframework_spark.extensions.filtering import gopher_rule_flags
    from fastmlframework_spark.queries.dedup import _corpus

    corpus = _corpus(spark, sf_dir)
    w = Window.partitionBy(F.md5("text"))
    dup = corpus.select(
        "doc_id", "text", (F.count(F.lit(1)).over(w) > 1).alias("is_dup")
    )
    flagged = gopher_rule_flags(dup).select("is_dup", "passes")
    return (
        flagged.groupBy("is_dup")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("passes").cast("long")).alias("n_pass"),
            F.round(
                F.sum(F.col("passes").cast("long")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("pass_rate"),
        )
        .orderBy("is_dup")
    )


def _pii_oracle() -> str:
    from fastmlframework_spark.extensions.curation import PII_PATTERNS
    from fastmlframework_spark.queries.xxh64_sql import xxhash64_str

    def cnt(kind: str) -> str:
        pat = PII_PATTERNS[kind].replace("'", "''")
        return (
            "CAST(LENGTH(regexp_extract_all(coalesce(text, ''),"
            f" '{pat}')) AS INT) AS n_{kind}"
        )

    clean = "coalesce(text, '')"
    for kind in ("email", "phone", "ipv4"):
        pat = PII_PATTERNS[kind].replace("'", "''")
        clean = (
            f"regexp_replace({clean}, '{pat}', '[{kind.upper()}]', 'g')"
        )
    return f"""
WITH planted AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
         || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.42.7 today' ELSE '' END
    AS text
  FROM documents
)
SELECT doc_id, {cnt("email")}, {cnt("phone")}, {cnt("ipv4")},
       {xxhash64_str(clean)} AS clean_hash
FROM planted
"""


@query("pii_scrub_planted", oracle=_pii_oracle())
def pii_scrub_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (C4/Dolma curation stage) with planted spans:
    emails (doc_id%7, id-bearing so every span is distinct), NANP
    phones (%11), IPv4s (%13) appended in-query, then
    `extensions.curation.pii_scrub` masks + counts.  Value-hash
    evidence covers the MASKED TEXT itself, not just the counts: the
    oracle rebuilds Spark's xxhash64 of clean_text bit-for-bit
    (queries/xxh64_sql.py), so a single mis-masked byte anywhere in
    the corpus flips the driver hash.  Map-only plan — the 100 TB
    cost is one codegen'd scan."""
    from fastmlframework_spark.extensions.curation import pii_scrub

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" from 10.0.42.7 today")
            ).otherwise(F.lit("")),
        ),
    )
    return pii_scrub(planted).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.xxhash64("clean_text").alias("clean_hash"),
    )
