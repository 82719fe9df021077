"""LLM-training-data preparation queries (SURVEY.md §7.5): document
chunking, stratified corpus sampling, and sketch-accuracy invariants
for the approximate operators a 100 TB pipeline leans on.

Sketch queries (``approx_*``) use INVARIANT oracles: the Spark side
computes both the sketch estimate and the exact value and emits the
exact value plus a within-tolerance boolean; the oracle emits the
exact value plus ``TRUE``.  A hash match therefore proves the sketch
landed inside its advertised error bound — the strongest
SQL-expressible statement about a non-deterministic-looking estimator
(HLL++ and KLL are in fact deterministic for fixed input, but their
values are engine-private, so parity on the *bound* is the portable
contract).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions import chunking
from fastmlframework_spark.extensions.text import TOKEN_PATTERN
from fastmlframework_spark.queries.registry import query

_CHUNK_SIZE = 40
_OVERLAP = 10
_STEP = _CHUNK_SIZE - _OVERLAP


@query(
    "doc_chunk_tokens",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         regexp_extract_all(text, '{TOKEN_PATTERN}') AS tokens
  FROM documents
),
expanded AS (
  SELECT doc_id, lang, tokens,
         unnest(generate_series(0, greatest(len(tokens) - 1, 0), {_STEP})) AS start
  FROM toks
)
SELECT doc_id, lang, source, n_chars,
       CAST(start / {_STEP} AS BIGINT) AS chunk_idx,
       CAST(len(tokens[start + 1 : start + {_CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(tokens[start + 1 : start + {_CHUNK_SIZE}], ' ')) AS chunk_digest
FROM expanded JOIN documents USING (doc_id, lang)
ORDER BY doc_id, chunk_idx
""",
)
def doc_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking over the documents corpus
    (size=40, overlap=10): the pre-tokenization step of an LLM data
    pipeline.  One narrow scan, no shuffle — the explode stays inside
    the source partition; chunk identity travels as an md5 digest so
    the output is chunk-count-sized, not text-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return chunking.chunk_by_tokens(
        docs, text_col="text", chunk_size=_CHUNK_SIZE, overlap=_OVERLAP
    )


@query(
    "sample_stratified_hash",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 1)
      <= CASE WHEN lang = 'en' THEN '3' ELSE '7' END
ORDER BY doc_id
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (C1 family, extended): keep
    ~4/16 of English documents and ~8/16 of every other language —
    the rebalancing step of corpus curation (downsample the dominant
    language).  Hash-prefix thresholding instead of an RNG stream:
    reproducible under any partitioning, re-execution, or engine, and
    pushes down to the scan as a pure filter (no sampleBy state)."""
    docs = load_table(spark, sf_dir, "documents")
    digit = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))), 1, 1
    )
    cutoff = F.when(F.col("lang") == "en", F.lit("3")).otherwise(F.lit("7"))
    return (
        docs.filter(digit <= cutoff)
        .select("doc_id", "lang", "source")
    )


@query(
    "approx_distinct_ok",
    oracle="""
SELECT COUNT(DISTINCT l_partkey) AS exact_cnt,
       TRUE AS within_tol
FROM lineitem
""",
)
def approx_distinct_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality invariant: `approx_count_distinct`
    (rsd=1%) must land within 5% of the exact distinct count.  At
    100 TB the HLL sketch is the only viable distinct counter (fixed
    ~kB state, map-side combinable, no shuffle of distinct values);
    this query pins its accuracy contract against the exact answer
    while the data is still small enough to compute one."""
    li = load_table(spark, sf_dir, "lineitem")
    # Two independent 1-row aggregates cross-joined, NOT one agg with
    # both expressions: mixing a DISTINCT aggregate with a sketch
    # aggregate makes Spark plan an Expand + double aggregation
    # (measured ~7× slower); two plain aggs each scan once in
    # parallel-friendly partial/final form and the join is 1×1.
    exact = li.agg(F.count_distinct("l_partkey").alias("exact_cnt"))
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_cnt")
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "exact_cnt",
        (
            F.abs(F.col("approx_cnt") - F.col("exact_cnt"))
            <= 0.05 * F.col("exact_cnt")
        ).alias("within_tol"),
    )


@query(
    "approx_quantile_ok",
    oracle="""
SELECT ROUND(quantile_cont(o_totalprice, 0.50), 4) AS exact_p50,
       ROUND(quantile_cont(o_totalprice, 0.90), 4) AS exact_p90,
       TRUE AS p50_ok,
       TRUE AS p90_ok
FROM orders
""",
)
def approx_quantile_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile invariant: `percentile_approx`
    (accuracy=10000) must land within 1% of the exact interpolated
    percentile.  Same contract-pinning pattern as the HLL query — the
    sketch (GK/KLL-style, mergeable, bounded memory) is the scale
    path for histogram binning and drift scoring; the exact
    `percentile` is the small-data oracle."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.expr("percentile_approx(o_totalprice, array(0.5, 0.9), 10000)")
    exact = F.expr("percentile(o_totalprice, array(0.5, 0.9))")
    return (
        o.agg(approx.alias("ap"), exact.alias("ex"))
        .select(
            F.round(F.col("ex")[0], 4).alias("exact_p50"),
            F.round(F.col("ex")[1], 4).alias("exact_p90"),
            (F.abs(F.col("ap")[0] - F.col("ex")[0]) <= 0.01 * F.col("ex")[0]).alias(
                "p50_ok"
            ),
            (F.abs(F.col("ap")[1] - F.col("ex")[1]) <= 0.01 * F.col("ex")[1]).alias(
                "p90_ok"
            ),
        )
    )


@query(
    "freq_items_ok",
    oracle=f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS tok
  FROM documents
),
counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
SELECT tok AS top_token, TRUE AS in_sketch
FROM counts ORDER BY n DESC, tok LIMIT 1
""",
)
def freq_items_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch invariant (same contract-pinning pattern
    as the HLL/KLL queries): ``freqItems`` (Karp-Papadimitriou-
    Shenker misra-gries-style, one pass, bounded state — the heavy-
    hitter sketch at 100 TB) must contain the EXACT most frequent
    token, which the oracle computes while the data is small enough
    to count exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(1)
        .select(F.col("tok").alias("top_token"))
    )
    sketch = toks.freqItems(["tok"], support=0.01).select(
        F.col("tok_freqItems").alias("items")
    )
    return top.crossJoin(F.broadcast(sketch)).select(
        "top_token",
        F.array_contains(F.col("items"), F.col("top_token")).alias(
            "in_sketch"
        ),
    )


def _exact_k_oracle(k: int = 20) -> str:
    """Signed xxhash64 of the stringified key (xxh64_sql twin) as the
    deterministic shuffle order inside each stratum."""
    from fastmlframework_spark.queries import xxh64_sql as xx

    h = xx.signed64(
        xx.xxh64_bytes(xx.utf8_bytes("CAST(doc_id AS VARCHAR)"), 42)
    )
    return f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {h}, doc_id) AS rn
  FROM documents
) t WHERE rn <= {k}
"""


@query("sample_exact_k_per_lang", oracle=_exact_k_oracle())
def sample_exact_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota sampling: EXACTLY k=20 documents per language
    (fewer only if the stratum is smaller), drawn uniformly and
    reproducibly by ranking each stratum on xxhash64 of the key — the
    eval-set/human-review construction primitive that fraction-based
    sampling (``sample_stratified_hash``) can't give you (a fraction
    of a small stratum can be 0 or 2×k).

    Scale: rank ≤ k over a hash order is the WindowGroupLimit shape —
    Spark prunes each input partition to k rows per stratum MAP-SIDE before
    the exchange (plan-pinned), so the shuffle moves ≤ k·partitions
    rows per language, never the corpus."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    h = F.expr("xxhash64(CAST(doc_id AS STRING))")
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@query(
    "sketch_merge_distinct",
    oracle="""
SELECT source, COUNT(DISTINCT doc_id) AS exact_cnt, TRUE AS within_tol
FROM documents GROUP BY source
UNION ALL
SELECT '__ALL__', COUNT(DISTINCT doc_id), TRUE FROM documents
ORDER BY source
""",
)
def sketch_merge_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABILITY of the HLL distinct sketch — the property that
    makes it the 100 TB distinct counter: per-source Datasketches HLL
    sketches (`hll_sketch_agg`) estimate each shard's cardinality, and
    the GLOBAL count comes from `hll_union_agg` over the ~kB per-shard
    sketches — the corpus is never rescanned and no distinct value
    ever shuffles.  Each estimate must land within 5% of the exact
    count (computable while data is small); the '__ALL__' row is the
    union-merge path under test."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    per_src = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("__sk"),
        F.count_distinct("doc_id").alias("exact_cnt"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate("__sk") - F.col("exact_cnt"))
        <= 0.05 * F.col("exact_cnt")
    )
    src_rows = per_src.select("source", "exact_cnt", ok.alias("within_tol"))
    g_exact = docs.agg(F.count_distinct("doc_id").alias("exact_cnt"))
    g_est = per_src.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est")
    )
    all_row = g_exact.crossJoin(F.broadcast(g_est)).select(
        F.lit("__ALL__").alias("source"),
        "exact_cnt",
        (
            F.abs(F.col("__est") - F.col("exact_cnt"))
            <= 0.05 * F.col("exact_cnt")
        ).alias("within_tol"),
    )
    return src_rows.unionByName(all_row).orderBy("source")


@query(
    "moments_merge_variance",
    oracle="""
SELECT COUNT(*) AS n_rows,
       ROUND(var_pop(l_quantity), 4) AS var_direct,
       TRUE AS merge_ok
FROM lineitem WHERE l_quantity IS NOT NULL
""",
)
def moments_merge_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABILITY of second moments (Chan et al. parallel
    variance): per-shard partials (n, mean, M2) combine into the
    exact global variance with ONE aggregate over the shard table —
    M2_tot = ΣM2_i + Σ n_i·(mean_i − grand_mean)² — the property
    that lets a 100 TB pipeline maintain running statistics per
    partition/day/source and merge them without ever rescanning.
    ``merge_ok`` pins the merged result to the direct single-pass
    variance within 1e-9 relative (float addition ORDER differs
    between the two paths, so the contract is tolerance, not
    bit-equality — the ``approx_distinct_ok`` pattern).

    Plan: the shard partials are one map-side-combinable aggregate
    over the fact table; the merge and the grand mean run over the
    32-row shard table; the direct variance is the control scan."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())
        .select((F.col("l_partkey") % 32).alias("__shard"), "l_quantity")
    )
    partials = li.groupBy("__shard").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("l_quantity").alias("__mu"),
        (F.var_pop("l_quantity") * F.count(F.lit(1))).alias("__m2"),
    )
    grand = partials.agg(
        F.sum("__n").alias("__nt"),
        (F.sum(F.col("__n") * F.col("__mu")) / F.sum("__n")).alias("__gm"),
    )
    merged = (
        partials.crossJoin(F.broadcast(grand))
        .agg(
            F.first("__nt").alias("n_rows"),
            (
                (
                    F.sum("__m2")
                    + F.sum(
                        F.col("__n")
                        * (F.col("__mu") - F.col("__gm"))
                        * (F.col("__mu") - F.col("__gm"))
                    )
                )
                / F.first("__nt")
            ).alias("__var_merged"),
        )
    )
    direct = li.agg(F.var_pop("l_quantity").alias("__var_direct"))
    return merged.crossJoin(F.broadcast(direct)).select(
        "n_rows",
        F.round("__var_direct", 4).alias("var_direct"),
        (
            F.abs(F.col("__var_merged") - F.col("__var_direct"))
            <= 1e-9 * F.abs(F.col("__var_direct"))
        ).alias("merge_ok"),
    )
