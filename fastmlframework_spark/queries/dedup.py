"""Oracle-checked queries for the dedup extensions (§7.5).

The driver's documents table has NO duplicates (500 distinct texts),
so these queries derive a corpus with known duplication structure:
every doc_id % 5 == 0 gains an exact copy (+100000) and every
doc_id % 7 == 0 a truncated near-copy (+200000) — deterministic in
both engines, so exact/near-dup detection has real positives to find.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions import dedup as xdedup
from fastmlframework_spark.queries.registry import query

_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id + 200000,
       substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))
FROM documents WHERE doc_id % 7 = 0
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))"
        ).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


@query(
    "dedup_exact",
    oracle=f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM ({_CORPUS_SQL}) corpus
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the content digest: survivors carry their copy
    count; groupBy(md5) keeps shuffle rows digest-sized at scale."""
    return xdedup.exact_dedup(_corpus(spark, sf_dir))


# Subset keeps the O(pairs) oracle tractable at sf0.01.
_SUBSET_PRED = "doc_id % 500 < 60"

# Shared CTE chain pieces: corpus → 3-word shingles → intersections →
# Jaccard pairs at 0.4 (reused by the pair/containment/best-rep
# queries AND their budget-sampled benched variants below).
_SHINGLE_TAIL = """
toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM corpus
),
idx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS shingle
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

_JPAIRS_CTE = """
jpairs AS (
  SELECT key_a, key_b,
         ROUND(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = key_a
  JOIN sizes sb ON sb.doc_id = key_b
  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.4
)"""

_JACCARD_CTES = f"""
corpus AS (
  SELECT * FROM ({_CORPUS_SQL}) c WHERE {_SUBSET_PRED}
),{_SHINGLE_TAIL.strip()},
{_JPAIRS_CTE.strip()}"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT key_a, key_b, jaccard FROM jpairs
"""


# Restored to the bench set (VERDICT r13 #4): the r13 swap to the
# *_sampled twin changed the bench composition without driver
# sign-off; both forms are benched from r14 on so round-over-round
# totals stay like-for-like.
@query(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle Jaccard near-dup pairs via the inverted-index
    self-join (no cross join) — finds the exact copies (j=1.0) and the
    80%-truncated near-copies."""
    corpus = _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    return xdedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.4)


# Restored to the bench set (VERDICT r13 #4): the r13 swap to the
# *_sampled twin changed the bench composition without driver
# sign-off; both forms are benched from r14 on so round-over-round
# totals stay like-for-like.
@query(
    "dedup_containment",
    oracle=f"""
WITH corpus AS (
  SELECT * FROM ({_CORPUS_SQL}) c WHERE {_SUBSET_PRED}
),
toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM corpus
),
idx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS shingle
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT key_a, key_b,
       ROUND(common * 1.0 / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = key_a
JOIN sizes sb ON sb.doc_id = key_b
WHERE common * 1.0 / LEAST(sa.n_sh, sb.n_sh) >= 0.9
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-containment pairs (|A∩B| / min set size ≥ 0.9): the
    asymmetric dual of `dedup_ngram_jaccard` that catches SUBSET
    duplicates — the 80%-truncated corpus copies score containment
    ≈1.0 here while their symmetric Jaccard sits near the 0.4 fringe
    (Broder's resemblance-vs-containment distinction).  Same
    size-carrying inverted-index self-join, one aggregation, no
    post-joins."""
    corpus = _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    return xdedup.containment_pairs(corpus, n=3, threshold=0.9)


@query(
    "dedup_sorted_neighborhood",
    oracle=f"""
WITH corpus AS ({_CORPUS_SQL}),
keyed AS (
  SELECT doc_id, text,
         substring(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 24)
             AS sk
  FROM corpus
),
r AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS rnk
  FROM keyed
),
toks AS (SELECT doc_id, rnk, string_split_regex(text, '\\s+') AS w FROM r),
idx AS (
  SELECT doc_id, rnk, w,
         unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT doc_id, rnk,
         list_distinct(list(
           array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ')
         )) AS s
  FROM idx GROUP BY doc_id, rnk
),
p AS (
  SELECT a.doc_id AS ka, b.doc_id AS kb,
         len(list_intersect(a.s, b.s)) AS c,
         len(a.s) AS na, len(b.s) AS nb
  FROM sh a JOIN sh b ON b.rnk - a.rnk BETWEEN 1 AND 7
)
SELECT LEAST(ka, kb) AS key_a, GREATEST(ka, kb) AS key_b,
       ROUND(c * 1.0 / (na + nb - c), 6) AS jaccard
FROM p WHERE c * 1.0 / (na + nb - c) >= 0.5
""",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs (window 8 over a 24-char
    normalized-prefix sort, 3-gram Jaccard ≥ 0.5): the one-sort
    blocking alternative to LSH banding.  The planted corpus copies
    share their prefix, so every exact copy (j=1.0) and 80%-truncation
    lands inside the window.  The oracle replays the identical sort
    (ties broken by doc_id), a brute rank range-join in place of the
    engine's block equi-join — same candidate set by construction —
    and string shingles in place of digests (equality classes are
    identical, the family's standing collision budget)."""
    return xdedup.sorted_neighborhood_pairs(
        _corpus(spark, sf_dir), window=8, n=3, threshold=0.5
    )


# --- Literal SQL twins for the sketch paths (VERDICT r3 "next" #2) -----
# The sketches are seed-deterministic JVM xxhash64 expressions, so their
# outputs ARE reproducible in SQL once DuckDB can compute the same hash:
# queries/xxh64_sql.py generates a pure-SQL XXH64 (validated bit-for-bit
# against Spark in tests/test_xxh64_sql.py).  The oracles below re-derive
# signatures/fingerprints from first principles and then use brute-force
# O(n²) pair scans in place of the engine-side banding/blocking — the
# candidate structures are exact (banding finds every pair that agrees on
# a full band; block-LSH finds every pair within the hamming budget), so
# the surviving pair sets match row-for-row, value-for-value.


def _mh_sql_parts(num_hashes: int = 8, bands: int = 4):
    """Shared SQL pieces for the minhash twins: (hlist, sig_cols,
    band_eq) — per-shingle hash list, signature-slot projections, and
    the brute band-agreement predicate over aliases a/b."""
    from fastmlframework_spark.extensions.dedup import _mh_constants
    from fastmlframework_spark.queries import xxh64_sql as xx

    # per-shingle base hash: xxhash64(shingle, 42) & 0x7FFFFFFF — the
    # string hash chained with the int literal 42 (Spark's variadic
    # xxhash64 has no seed arg), masked to 31 bits
    sh_hash = xx.let(
        xx.hash_int(42, xx.xxh64_bytes(xx.utf8_bytes("__sh"), 42)),
        "__u",
        "__u % 2147483648",
    )
    shingles = (
        "list_transform(range(1, greatest(len(__words) - 2, 1) + 1), "
        "__i -> array_to_string(__words[__i:__i+2], ' '))"
    )
    hlist = xx.let(
        "regexp_split_to_array(text, '\\s+')",
        "__words",
        f"list_transform({shingles}, __sh -> {sh_hash})",
    )
    # Carter-Wegman rehash per signature slot (same constants as Spark)
    sig_cols = ", ".join(
        f"CAST(list_min(list_transform(__H, __h -> (__h * {a} + {b}) "
        f"% 2147483647)) AS BIGINT) AS mh_{j}"
        for j, (a, b) in enumerate(_mh_constants(42, num_hashes))
    )
    rows_per_band = num_hashes // bands
    band_eq = " OR ".join(
        "("
        + " AND ".join(
            f"a.mh_{b * rows_per_band + r} = b.mh_{b * rows_per_band + r}"
            for r in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END"
        for j in range(num_hashes)
    )
    return hlist, sig_cols, band_eq, agree


def _minhash_lsh_oracle(num_hashes: int = 8, bands: int = 4,
                        threshold: float = 0.5) -> str:
    hlist, sig_cols, band_eq, agree = _mh_sql_parts(num_hashes, bands)
    return f"""
WITH corpus AS ({_CORPUS_SQL}),
hashed AS (SELECT doc_id, {hlist} AS __H FROM corpus),
sig AS (SELECT doc_id, {sig_cols} FROM hashed),
cand AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         ROUND(({agree}) / {float(num_hashes)}, 6) AS sig_agreement
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_eq})
)
SELECT key_a, key_b, sig_agreement FROM cand
WHERE sig_agreement >= {threshold}
"""


@query("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands) candidate pairs with signature
    verification ≥ 0.5 — the sub-quadratic near-dup path.  Full
    hash-matched oracle: the SQL twin recomputes the xxhash64-based
    signatures (xxh64_sql.py) and brute-forces the band-agreement
    join, which is exactly the banded candidate set."""
    return xdedup.minhash_lsh_pairs(
        _corpus(spark, sf_dir),
        n=3,
        num_hashes=8,
        bands=4,
        verify_threshold=0.5,
    )


def _simhash_oracle(bits: int = 64, max_hamming: int = 3) -> str:
    from fastmlframework_spark.queries import xxh64_sql as xx

    word_hash = xx.xxh64_bytes(xx.utf8_bytes("__w"), 42)
    # fingerprint bit b set ⟺ majority of word hashes have bit b set
    # (2·count > n ⟺ the ±1 sum is positive) — one term per bit,
    # generated with literal 2^b divisors (no HUGEINT pow in DuckDB)
    fp_terms = " + ".join(
        f"CASE WHEN 2 * len(list_filter(__H, __h -> __h // {1 << b} % 2 = 1))"
        f" > len(__H) THEN {1 << b} ELSE 0 END"
        for b in range(bits)
    )
    signed_fp = xx.signed64(f"({fp_terms})")
    return f"""
WITH corpus AS ({_CORPUS_SQL}),
hw AS (
  SELECT doc_id,
         list_transform(list_distinct(regexp_split_to_array(text, '\\s+')),
                        __w -> {word_hash}) AS __H
  FROM corpus
),
fp AS (SELECT doc_id, {signed_fp} AS simhash FROM hw)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs, hamming ≤ 3, via exact
    pigeonhole block-LSH (4×16-bit blocks).  Full hash-matched
    oracle: the SQL twin recomputes the fingerprints from the same
    xxhash64 word hashes (xxh64_sql.py) and brute-forces the hamming
    scan — block-LSH is exact within the budget, so the sets match."""
    return xdedup.simhash_pairs(_corpus(spark, sf_dir), bits=64, max_hamming=3)


# --- Invariant oracles for the sketch paths (VERDICT r1 #5) -------------
# Banding/bit layouts are engine-specific, so the sketch outputs have no
# literal SQL twin — but their RECALL contract does: identical texts have
# identical minhash signatures (every band agrees) and identical simhash
# fingerprints (hamming 0), so the candidate sets MUST cover every
# exact-duplicate pair.  The Spark side semi-joins the exact-dup pairs
# against the sketch candidates; the oracle is ALL exact-dup pairs.  Any
# missed pair ⇒ row-count/hash mismatch ⇒ red driver row.

_EXACT_PAIRS_SQL = f"""
WITH corpus AS ({_CORPUS_SQL}),
dg AS (SELECT doc_id, md5(text) AS g FROM corpus)
SELECT a.doc_id AS key_a, b.doc_id AS key_b
FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
"""


def _exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _corpus(spark, sf_dir).select("doc_id", F.md5("text").alias("g"))
    a = d.select(F.col("doc_id").alias("key_a"), "g")
    b = d.select(F.col("doc_id").alias("key_b"), "g")
    return (
        a.join(b, on="g")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )


@query(
    "dedup_minhash_covers_exact",
    oracle=_EXACT_PAIRS_SQL,
    bench=False,
    bench_reason="coverage audit vs the exact-pair ground truth of benched dedup_minhash_lsh",
)
def dedup_minhash_covers_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall invariant: exact-dup pairs found by the MinHash+LSH
    candidate join.  Must equal the full exact-dup pair set (identical
    signatures agree in every band), turning the sketch's rows-only
    status into a hard driver-checked oracle."""
    cands = xdedup.minhash_lsh_pairs(
        _corpus(spark, sf_dir), n=3, num_hashes=8, bands=4, verify_threshold=0.5
    ).select("key_a", "key_b")
    return _exact_pairs(spark, sf_dir).join(
        cands, on=["key_a", "key_b"], how="left_semi"
    )


@query(
    "dedup_simhash_covers_exact",
    oracle=_EXACT_PAIRS_SQL,
    bench=False,
    bench_reason="coverage audit vs the exact-pair ground truth of benched dedup_simhash",
)
def dedup_simhash_covers_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall invariant: exact-dup pairs found by the SimHash
    block-LSH join (identical texts ⇒ hamming 0 ≤ budget) — driver-
    checked twin of ``dedup_simhash``'s recall contract."""
    cands = xdedup.simhash_pairs(
        _corpus(spark, sf_dir), bits=64, max_hamming=3
    ).select("key_a", "key_b")
    return _exact_pairs(spark, sf_dir).join(
        cands, on=["key_a", "key_b"], how="left_semi"
    )


_EMBED_CORPUS_SQL = """
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id % 10 = 0
"""


@query(
    "dedup_embedding_cosine",
    bench=False,  # oracle-only: exact O(n²) recall ground truth for
    bench_reason="size-guarded exact O(n²) cosine ground truth for the benched LSH/SemDeDup rungs",
    # dedup_embedding_lsh — size-guarded in embedding_dup_pairs and
    # never the benched/production path.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ({_EMBED_CORPUS_SQL}) e
)
SELECT a.vec_id AS key_a, b.vec_id AS key_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.999
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥ 0.999) over a corpus with
    planted exact copies — every vec_id%10 copy must pair with its
    original at cosine 1.0."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    return xdedup.embedding_dup_pairs(corpus, threshold=0.999)


@query(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE
corpus AS ({_CORPUS_SQL}),
dg AS (SELECT doc_id, md5(text) AS g FROM corpus),
pairs AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b
  FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
),
edges AS (
  SELECT key_a AS u, key_b AS v FROM pairs
  UNION ALL
  SELECT key_b, key_a FROM pairs
),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
)
SELECT node, MIN(label) AS component FROM walk GROUP BY node
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: exact-dup pairs → connected components →
    [node, component] (component = min doc_id = canonical survivor).

    Spark side is iterative min-label propagation (join + groupBy per
    round, O(diameter) rounds); the oracle is the same fixpoint via a
    recursive CTE.  The iterative-algorithm class of the engine."""
    corpus = _corpus(spark, sf_dir)
    d = corpus.select("doc_id", F.md5("text").alias("g"))
    a = d.select(F.col("doc_id").alias("key_a"), "g")
    b = d.select(F.col("doc_id").alias("key_b"), "g")
    pairs = (
        a.join(b, on="g")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    return xdedup.connected_components(pairs)


@query(
    "dedup_embedding_lsh_covers_planted",
    bench=False,
    bench_reason="planted-recall audit of the benched dedup_embedding_lsh path",
    oracle=f"""
SELECT vec_id AS key_a, vec_id + 10000 AS key_b
FROM ({_EMBED_CORPUS_SQL}) e
WHERE vec_id % 10 = 0 AND vec_id < 10000
""",
)
def dedup_embedding_lsh_covers_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall invariant for the hyperplane-bucketed path: identical
    vectors share every hyperplane sign, so the LSH join MUST find
    every planted (v, v+10000) exact-copy pair — driver-checked twin
    of ``dedup_embedding_lsh``'s recall contract (same pattern as the
    minhash/simhash covers_exact oracles)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    planted = corpus.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 10000)
    ).select(
        F.col("vec_id").alias("key_a"),
        (F.col("vec_id") + 10000).alias("key_b"),
    )
    found = xdedup.lsh_dup_pairs(corpus, threshold=0.999).select(
        "key_a", "key_b"
    )
    return planted.join(found, on=["key_a", "key_b"], how="left_semi")


# The CORRECTNESS contract runs at sf=0.01 only; its embeddings
# fixture has 500 vectors, so the planted-copy corpus below holds 550.
# The oracle inlines the plane count the operator's adaptive default
# derives for that size — via the SAME adaptive_n_planes function, so
# a formula change can't desynchronize the twin (a fixture-size change
# still would; the constant is asserted in tests/test_extensions.py).
_ORACLE_EMBED_CORPUS_ROWS = 550


def _embedding_lsh_oracle(dim: int = 64, threshold: float = 0.999) -> str:
    """Literal SQL twin of ``lsh_dup_pairs`` over the planted-copy
    corpus: seed-7 hyperplanes inlined (adaptive plane count at the
    oracle-scale corpus size), double-square norms and the cast-first
    dot mirroring the Spark expressions exactly."""
    from fastmlframework_spark.extensions.dedup import adaptive_n_planes
    from fastmlframework_spark.extensions.similarity import hyperplanes
    from fastmlframework_spark.queries import lsh_sql as L

    planes = hyperplanes(
        dim, adaptive_n_planes(_ORACLE_EMBED_CORPUS_ROWS), seed=7
    )
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding AS v FROM ({_EMBED_CORPUS_SQL}) e
),
base AS (
  SELECT vec_id, v, sqrt({L.norm_sq_double_sql("v")}) AS nrm,
         {L.bucket_sql("v", planes)} AS bucket
  FROM corpus
),
pairs AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b,
         ROUND({L.dot_sql("a.v", "b.v", dim, cast_a=True)}
               / (a.nrm * b.nrm), 6) AS cosine
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT key_a, key_b, cosine FROM pairs WHERE cosine >= {threshold}
"""


@query("dedup_embedding_lsh", oracle=_embedding_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-bucketed embedding near-dup pairs (≥ 0.999) — the
    sub-quadratic scale path whose exact twin is
    ``dedup_embedding_cosine``.  Full hash-matched oracle via the
    inlined seed-7 hyperplanes (queries/lsh_sql.py); recall on
    planted exact copies is additionally pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    # adaptive n_planes: at sf0.01 the count-derived default is 4,
    # matching the oracle's inlined layout (see _embedding_lsh_oracle)
    return xdedup.lsh_dup_pairs(corpus, threshold=0.999)


@query(
    "semantic_dedup_planted",
    oracle="""
SELECT vec_id FROM embeddings ORDER BY vec_id
""",
)
def semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy invariant for SemDeDup-style semantic dedup: add
    an exact copy (+100000) of every ``vec_id % 10 == 0`` vector, run
    cluster-scoped dedup at threshold 0.999, and the survivors must be
    EXACTLY the original corpus — copies share their original's KMeans
    cell (identical vectors, identical argmin) and cosine 1.0, so each
    copy pairs with and loses to its lower-keyed original, while
    random vectors never clear 0.999."""
    from fastmlframework_spark.extensions.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    # adaptive n_clusters (constant cell size) — the invariant holds
    # for ANY cell layout, so the oracle is unaffected
    return semantic_dedup(corpus, threshold=0.999)


# Restored to the bench set (VERDICT r13 #4): the r13 swap to the
# *_sampled twin changed the bench composition without driver
# sign-off; both forms are benched from r14 on so round-over-round
# totals stay like-for-like.
@query(
    "dedup_ngram_jaccard_prefix",
    oracle=_JACCARD_ORACLE,
)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered (PPJoin-style) variant of `dedup_ngram_jaccard`:
    rarest-first global shingle order, prefix-only inverted index,
    exact array-intersection verification — SAME oracle as the full
    inverted-index join, proving two independent algorithms agree."""
    corpus = _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    return xdedup.ngram_jaccard_pairs_prefix(corpus, n=3, threshold=0.4)


@query(
    "dedup_rate_by_source",
    oracle=f"""
WITH corpus AS (
  SELECT c.doc_id, c.text, d.source
  FROM ({_CORPUS_SQL}) c
  JOIN documents d ON (c.doc_id % 100000) = d.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
       ROUND(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS drop_rate
FROM (
  SELECT co.source, co.doc_id,
         COUNT(*) OVER (PARTITION BY md5(co.text)) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY md5(co.text) ORDER BY co.doc_id)
             AS rn
  FROM corpus co
) t
WHERE rn = 1
GROUP BY source
ORDER BY source
""",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup reporting: per-source document counts, dropped-copy
    counts and drop rate over the planted-duplicate corpus — the
    curation dashboard number ("how duplicated is each domain").
    Groups on the content digest; the per-source rollup attributes
    each duplicate GROUP to its survivor's source (rn = 1)."""
    corpus = _corpus(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    with_src = corpus.join(
        F.broadcast(docs.withColumnRenamed("doc_id", "__orig")),
        (F.col("doc_id") % 100000) == F.col("__orig"),
    ).drop("__orig")
    wcnt = Window.partitionBy(F.md5("text"))
    worder = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    t = with_src.select(
        "source",
        F.count(F.lit(1)).over(wcnt).alias("cnt"),
        F.row_number().over(worder).alias("rn"),
    ).filter(F.col("rn") == 1)
    dropped = F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped).alias("n_dropped"),
            F.round(F.sum(dropped) / F.count(F.lit(1)), 6).alias(
                "drop_rate"
            ),
        )
        .orderBy("source")
    )


@query(
    "dedup_incremental_batch",
    oracle="""
WITH seen AS (SELECT DISTINCT md5(text) AS d FROM documents),
batch AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000,
         substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 300000,
         substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))
  FROM documents WHERE doc_id % 14 = 0
),
bd AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies, md5(text) AS d
  FROM batch GROUP BY md5(text)
)
SELECT doc_id, n_copies FROM bd
WHERE d NOT IN (SELECT d FROM seen)
""",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the original documents are the
    already-ingested corpus (digest index); the batch carries exact
    copies of originals (%5 → must drop against the index), fresh
    truncations (%7 → survive), and repeats of those truncations
    (%14 → collapse within the batch to the min key with n_copies 2).
    The index side is scanned once with a broadcast probe — never
    shuffled (`extensions/dedup.py:incremental_exact_dedup`)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seen = docs.select(F.md5("text").alias("digest")).distinct()
    trunc = F.expr(
        "substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))"
    )
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                trunc.alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 14 == 0).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                trunc.alias("text"),
            )
        )
    )
    return xdedup.incremental_exact_dedup(batch, seen)


_SPAN_N = 10

_SPAN_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL}),
d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), __x -> __x <> '') AS ws
  FROM corpus WHERE text IS NOT NULL
),
wins AS (
  SELECT doc_id, len(ws) AS n_words,
         unnest(range(1, greatest(len(ws) - {_SPAN_N - 1}, 1) + 1)) AS pos,
         ws
  FROM d WHERE len(ws) > 0
),
wd AS (
  SELECT doc_id, n_words, pos,
         md5(array_to_string(ws[pos:pos + {_SPAN_N - 1}], ' ')) AS dg
  FROM wins
),
dd AS (SELECT dg FROM wd GROUP BY dg HAVING COUNT(*) >= 2),
dup AS (SELECT wd.* FROM wd JOIN dd USING (dg)),
sp AS (
  SELECT doc_id, n_words, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      > {_SPAN_N}
              THEN 1 ELSE 0 END AS brk
  FROM dup
),
sp2 AS (
  SELECT doc_id, n_words, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span
  FROM sp
),
agg AS (
  SELECT doc_id, n_words, span, COUNT(*) AS nw,
         MIN(pos) AS lo, MAX(pos) AS hi
  FROM sp2 GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
       COUNT(*) AS n_spans,
       CAST(SUM(LEAST(hi - lo + {_SPAN_N}, n_words)) AS BIGINT) AS dup_words,
       ROUND(LEAST(SUM(LEAST(hi - lo + {_SPAN_N}, n_words)) * 1.0 / n_words,
                   1.0), 6) AS dup_frac
FROM agg GROUP BY doc_id, n_words
"""


@query("dedup_duplicate_spans", oracle=_SPAN_ORACLE)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-passage report over the planted corpus (Lee et
    al. 2022 substring-dedup shape): stride-1 word 10-gram digests,
    corpus-wide duplicated windows merged into maximal per-document
    spans with exact word coverage.  Exact copies surface fully
    covered; the 80%-truncated near-copies surface as partial-prefix
    spans on both members."""
    corpus = _corpus(spark, sf_dir)
    return xdedup.duplicate_spans(corpus, n=_SPAN_N)


def _incremental_near_oracle(num_hashes: int = 8, bands: int = 4) -> str:
    hlist, sig_cols, band_eq, _agree = _mh_sql_parts(num_hashes, bands)
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000,
         substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))
  FROM documents WHERE doc_id % 7 = 0
),
hc AS (SELECT doc_id, {hlist} AS __H FROM corpus),
sc AS (SELECT doc_id, {sig_cols} FROM hc),
hb AS (SELECT doc_id, {hlist} AS __H FROM batch),
sb AS (SELECT doc_id, {sig_cols} FROM hb)
SELECT b.doc_id,
       CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS n_corpus_matches
FROM sb b LEFT JOIN sc a ON ({band_eq})
GROUP BY b.doc_id
"""


@query("dedup_incremental_near", oracle=_incremental_near_oracle())
def dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time NEAR-dup screen: the new batch (exact copies +
    80%%-truncations of corpus docs) probes the corpus's persisted
    MinHash band index — index scanned once with a broadcast probe,
    never shuffled, no corpus signature recomputation.  Per batch doc:
    how many distinct corpus docs share an LSH band (0 = novel)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = xdedup.minhash_band_index(docs)
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.expr(
                    "substring(text, 1, CAST(FLOOR(LENGTH(text) * 0.8) AS INT))"
                ).alias("text"),
            )
        )
    )
    return xdedup.incremental_minhash_dedup(batch, index)


_REMOVE_SPANS_ORACLE = f"""
WITH corpus AS ({_CORPUS_SQL}),
d AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), __x -> __x <> '') AS ws
  FROM corpus
),
wins AS (
  SELECT doc_id, len(ws) AS nw,
         unnest(range(1, greatest(len(ws) - {_SPAN_N - 1}, 1) + 1)) AS pos,
         ws
  FROM d WHERE text IS NOT NULL AND len(ws) > 0
),
wd AS (
  SELECT doc_id, nw, pos,
         md5(array_to_string(ws[pos:pos + {_SPAN_N - 1}], ' ')) AS dg
  FROM wins
),
fr AS (
  SELECT doc_id, nw, pos FROM (
    SELECT doc_id, nw, pos,
           COUNT(*) OVER (PARTITION BY dg) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY dg ORDER BY doc_id, pos) AS rn
    FROM wd
  ) WHERE cnt >= 2 AND rn >= 2
),
sp AS (
  SELECT doc_id, nw, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      > {_SPAN_N}
              THEN 1 ELSE 0 END AS brk
  FROM fr
),
sp2 AS (
  SELECT doc_id, nw, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span
  FROM sp
),
agg AS (
  SELECT doc_id, span, MIN(pos) AS lo,
         LEAST(MAX(pos) + {_SPAN_N - 1}, MAX(nw)) AS hi
  FROM sp2 GROUP BY 1, 2
),
sl AS (
  SELECT doc_id, list({{'lo': lo, 'hi': hi}}) AS spans FROM agg GROUP BY 1
)
SELECT d.doc_id,
       CASE WHEN sl.spans IS NULL THEN d.text
            -- COALESCE: DuckDB's array_to_string over an empty list is
            -- NULL; Spark's concat_ws is '' (fully-removed docs)
            ELSE COALESCE(array_to_string(list_transform(
                list_filter(range(1, len(ws) + 1), __p ->
                    len(list_filter(sl.spans,
                        __s -> __p >= __s.lo AND __p <= __s.hi)) = 0),
                __p -> ws[CAST(__p AS INT)]), ' '), '')
       END AS clean_text,
       CAST(len(ws) AS BIGINT) AS n_words,
       CASE WHEN sl.spans IS NULL THEN CAST(0 AS BIGINT)
            ELSE CAST(len(ws) - len(
                list_filter(range(1, len(ws) + 1), __p ->
                    len(list_filter(sl.spans,
                        __s -> __p >= __s.lo AND __p <= __s.hi)) = 0))
                AS BIGINT)
       END AS n_removed
FROM d LEFT JOIN sl ON d.doc_id = sl.doc_id
"""


@query("dedup_remove_spans", oracle=_REMOVE_SPANS_ORACLE)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL stage of substring dedup over the planted corpus:
    one canonical copy of every duplicated 10-gram passage survives
    (smallest (doc_id, pos) owns it), every other occurrence's covered
    words are cut and the text rebuilt — exact copies come back empty,
    truncated near-copies lose their shared prefix, originals are
    byte-identical."""
    return xdedup.remove_duplicate_spans(_corpus(spark, sf_dir), n=_SPAN_N)


def _split_oracle() -> str:
    from fastmlframework_spark.queries import xxh64_sql as xx

    cluster_hash = xx.xxh64_bytes(
        xx.utf8_bytes("CAST(cluster AS VARCHAR)"), 42
    )
    return f"""
WITH RECURSIVE
corpus AS ({_CORPUS_SQL}),
dg AS (SELECT doc_id, md5(text) AS g FROM corpus),
roots AS (SELECT g, MIN(doc_id) AS root FROM dg GROUP BY g),
pairs AS (
  SELECT r.root AS key_a, d.doc_id AS key_b
  FROM dg d JOIN roots r ON d.g = r.g WHERE d.doc_id <> r.root
),
edges AS (
  SELECT key_a AS u, key_b AS v FROM pairs
  UNION ALL
  SELECT key_b, key_a FROM pairs
),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
cl AS (
  SELECT c.doc_id, COALESCE(m.component, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN comp m ON c.doc_id = m.node
),
sp AS (
  SELECT doc_id, cluster,
         CASE WHEN h < 12 THEN 'train'
              WHEN h < 14 THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, cluster,
           CAST(({cluster_hash}) % 16 AS BIGINT) AS h
    FROM cl
  )
)
SELECT split, COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters
FROM sp GROUP BY 1
"""


@query("split_leakage_safe", oracle=_split_oracle())
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test report over the planted corpus:
    exact-dup clusters assign as a UNIT (hashed cluster id, 12/2/2
    buckets), so near-copies never straddle an eval boundary; per
    split the doc and cluster counts."""
    from fastmlframework_spark.extensions.curation import leakage_safe_split

    corpus = _corpus(spark, sf_dir)
    # star edges (root = min doc per digest), not the digest-clique
    # self-join: a text duplicated k times yields k-1 edges instead of
    # k(k-1)/2, with identical connectivity — single-round components
    d = corpus.select("doc_id", F.md5("text").alias("g"))
    roots = d.groupBy("g").agg(F.min("doc_id").alias("key_a"))
    pairs = (
        d.join(roots, on="g")
        .filter(F.col("doc_id") != F.col("key_a"))
        .select("key_a", F.col("doc_id").alias("key_b"))
    )
    assigned = leakage_safe_split(corpus, pairs)
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster").alias("n_clusters"),
    )


_BEST_REP_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT key_a AS u, key_b AS v FROM jpairs
  UNION ALL
  SELECT key_b, key_a FROM jpairs
),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
labeled AS (
  SELECT c.doc_id, LENGTH(c.text) AS len,
         COALESCE(p.component, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN comp p ON p.node = c.doc_id
)
SELECT cluster,
       FIRST(doc_id ORDER BY len DESC, doc_id) AS best_key,
       MAX(len) AS best_len,
       COUNT(*) AS n_members
FROM labeled GROUP BY cluster
"""


# Restored to the bench set (VERDICT r13 #4): the r13 swap to the
# *_sampled twin changed the bench composition without driver
# sign-off; both forms are benched from r14 on so round-over-round
# totals stay like-for-like.
@query(
    "dedup_best_representative",
    oracle=_BEST_REP_ORACLE,
)
def dedup_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection after near-dedup: Jaccard pairs → connected
    components → keep each cluster's LONGEST member (ties to the
    smallest doc_id), so a cluster holding a page and its 80%%-clipped
    mirror retains the untruncated original.  The oracle replays the
    pair CTEs, a recursive-CTE component fixpoint, and an ordered
    FIRST aggregate; Spark runs label propagation plus ONE struct-max
    aggregate — no corpus window, no sort."""
    corpus = _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    pairs = xdedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.4).select(
        "key_a", "key_b"
    )
    return xdedup.best_representative(corpus, pairs)


@query(
    "dedup_cluster_size_hist",
    oracle=f"""
WITH RECURSIVE
corpus AS ({_CORPUS_SQL}),
dg AS (SELECT doc_id, md5(text) AS g FROM corpus),
pairs AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b
  FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
),
edges AS (
  SELECT key_a AS u, key_b AS v FROM pairs
  UNION ALL
  SELECT key_b, key_a FROM pairs
),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
sz AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1),
multi AS (
  SELECT cluster_size, COUNT(*) AS n_clusters FROM sz GROUP BY 1
),
single AS (
  SELECT CAST(1 AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters
  FROM corpus WHERE doc_id NOT IN (SELECT node FROM comp)
)
SELECT cluster_size, n_clusters,
       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
FROM (SELECT * FROM multi UNION ALL SELECT * FROM single)
ORDER BY cluster_size
""",
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication profile of the planted corpus: exact-dup pairs →
    connected components → cluster-size histogram, with
    never-duplicated docs reported as size-1 clusters (one anti-join
    + 1-row count — the corpus is never rescanned)."""
    corpus = _corpus(spark, sf_dir)
    d = corpus.select("doc_id", F.md5("text").alias("g"))
    pairs = (
        d.select(F.col("doc_id").alias("key_a"), "g")
        .join(d.select(F.col("doc_id").alias("key_b"), "g"), on="g")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    return xdedup.cluster_size_histogram(
        xdedup.connected_components(pairs), corpus
    )


def _cross_source_oracle(
    num_hashes: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    """MinHash twin (same xxhash64 signature pieces as
    ``dedup_minhash_lsh``) with both pair ends joined back to their
    origin document's source."""
    hlist, sig_cols, band_eq, agree = _mh_sql_parts(num_hashes, bands)
    return f"""
WITH corpus AS ({_CORPUS_SQL}),
hashed AS (SELECT doc_id, {hlist} AS __H FROM corpus),
sig AS (SELECT doc_id, {sig_cols} FROM hashed),
p AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_eq})
  WHERE ({agree}) / {float(num_hashes)} >= {threshold}
),
j AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b
  FROM p
  JOIN documents da ON (p.key_a % 100000) = da.doc_id
  JOIN documents db ON (p.key_b % 100000) = db.doc_id
)
SELECT source_a, source_b, COUNT(*) AS n_pairs
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("dedup_cross_source_matrix", oracle=_cross_source_oracle())
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate each other: MinHash-LSH verified
    near-dup pairs with both ends attributed to their origin source,
    counted per unordered source pair — the mirror-site /
    content-farm detection matrix a corpus audit publishes (diagonal
    = within-source duplication, off-diagonal = cross-source
    copying).

    Plan: the pair set is the sub-quadratic banded join; source
    attribution is two BROADCAST joins of the small dimension-like
    documents(doc_id, source) projection against the pair list, then
    a |sources|² grouped aggregate — the corpus text is never
    rescanned after signatures."""
    pairs = xdedup.minhash_lsh_pairs(
        _corpus(spark, sf_dir),
        n=3,
        num_hashes=8,
        bands=4,
        verify_threshold=0.5,
    ).select("key_a", "key_b")
    src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("__orig"), "source"
    )
    j = (
        pairs.join(
            F.broadcast(src.withColumnRenamed("source", "__sa")),
            (F.col("key_a") % 100000) == F.col("__orig"),
        )
        .drop("__orig")
        .join(
            F.broadcast(src.withColumnRenamed("source", "__sb")),
            (F.col("key_b") % 100000) == F.col("__orig"),
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
    )
    return (
        j.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


_SWEEP_THRESHOLDS = (0.9, 0.95, 0.99, 0.999)


def _semdedup_sweep_oracle(dim: int = 64) -> str:
    """Same seed-7 hyperplane CTE chain as ``_embedding_lsh_oracle``,
    but the verified pair set (floored at the loosest sweep threshold)
    fans out over the threshold list via a VALUES join."""
    from fastmlframework_spark.extensions.dedup import adaptive_n_planes
    from fastmlframework_spark.extensions.similarity import hyperplanes
    from fastmlframework_spark.queries import lsh_sql as L

    planes = hyperplanes(
        dim, adaptive_n_planes(_ORACLE_EMBED_CORPUS_ROWS), seed=7
    )
    vals = ", ".join(f"({t}::DOUBLE)" for t in _SWEEP_THRESHOLDS)
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding AS v FROM ({_EMBED_CORPUS_SQL}) e
),
base AS (
  SELECT vec_id, v, sqrt({L.norm_sq_double_sql("v")}) AS nrm,
         {L.bucket_sql("v", planes)} AS bucket
  FROM corpus
),
pairs AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b,
         ROUND({L.dot_sql("a.v", "b.v", dim, cast_a=True)}
               / (a.nrm * b.nrm), 6) AS cosine
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
floor_pairs AS (
  SELECT key_a, key_b, cosine FROM pairs
  WHERE cosine >= {min(_SWEEP_THRESHOLDS)}
),
ths(threshold) AS (VALUES {vals}),
tot AS (SELECT COUNT(*) AS n FROM corpus)
SELECT t.threshold,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.key_b) AS n_dropped,
       CAST(MIN(tot.n) - COUNT(DISTINCT p.key_b) AS BIGINT) AS n_survivors
FROM floor_pairs p JOIN ths t ON p.cosine >= t.threshold, tot
GROUP BY t.threshold
ORDER BY t.threshold
"""


@query("semdedup_threshold_sweep", oracle=_semdedup_sweep_oracle())
def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aggressiveness curve (the SemDeDup / datacard figure):
    for each cosine threshold in the sweep, how many verified near-dup
    pairs qualify, how many docs a keep-lowest-key policy drops, and
    how many survive.  The expensive step — hyperplane-bucketed pair
    generation + exact cosine verify — runs ONCE at the loosest
    threshold; the sweep itself is a tiny explode over the pair list
    (thresholds × pairs rows, pairs ≪ corpus), so the whole curve
    costs one dedup pass instead of |thresholds| passes.  Corpus size
    arrives as a 1-row broadcast aggregate."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    pairs = xdedup.lsh_dup_pairs(
        corpus, threshold=min(_SWEEP_THRESHOLDS)
    )
    tot = corpus.agg(F.count(F.lit(1)).alias("__n"))
    fanned = pairs.select(
        "key_b",
        F.explode(
            F.array(*[F.lit(float(t)) for t in _SWEEP_THRESHOLDS])
        ).alias("threshold"),
        "cosine",
    ).filter(F.col("cosine") >= F.col("threshold"))
    return (
        fanned.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("key_b").alias("n_dropped"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "n_pairs",
            "n_dropped",
            (F.col("__n") - F.col("n_dropped")).alias("n_survivors"),
        )
        .orderBy("threshold")
    )


# Absolute doc budget for the SAMPLED calibration/recall audits
# (VERDICT r11 #3): their truth side is an exact threshold-0 pair
# enumeration, quadratic in corpus size — production audits sample.
# The budget-derived md5 threshold is computed from the same COUNT in
# both engines (the knn_density_by_label pattern), so the sampled id
# set is identical and the oracles stay hash-green.
_MH_SAMPLE_BUDGET = 512


def _mh_sample_sql() -> str:
    """Subset corpus → budget-sampled corpus CTEs (SQL twin of
    ``_mh_sampled_corpus``)."""
    return f"""
sub AS (
  SELECT * FROM ({_CORPUS_SQL}) c WHERE {_SUBSET_PRED}
),
th AS (
  SELECT CASE WHEN COUNT(*) <= {_MH_SAMPLE_BUDGET} THEN 'g'
         ELSE lower(lpad(to_hex(CAST(FLOOR(
             {_MH_SAMPLE_BUDGET}.0 / COUNT(*) * 4294967296) AS BIGINT)),
             8, '0'))
         END AS t
  FROM sub
),
corpus AS (
  SELECT sub.* FROM sub, th
  WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':mhs'), 1, 8) < th.t
)"""


def _mh_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-sampled subset corpus: deterministic md5 hash-sample
    with an ABSOLUTE row budget — the threshold derives from the
    subset count, so the truth side's exact pair enumeration stays
    ~budget² no matter how large the corpus grows (a fixed fraction
    would leave the audit quadratic in N)."""
    import math

    corpus = _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    n = corpus.count()
    if n <= _MH_SAMPLE_BUDGET:
        thresh = "g"  # lexically above any hex digit: keep everything
    else:
        thresh = format(
            math.floor(_MH_SAMPLE_BUDGET / n * 4294967296), "08x"
        )
    return corpus.filter(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":mhs"))
            ),
            1,
            8,
        )
        < F.lit(thresh)
    )


def _mh_calibration_oracle(
    num_hashes: int = 8, bands: int = 4, sampled: bool = False
) -> str:
    """Banded candidates (xxhash64 signature twin) LEFT-joined to the
    exact shingle-Jaccard pairs of the SAME (subset or budget-sampled)
    corpus, grouped by Jaccard decile."""
    hlist, sig_cols, band_eq, agree = _mh_sql_parts(num_hashes, bands)
    corpus_ctes = (
        _mh_sample_sql()
        if sampled
        else f"""
corpus AS (
  SELECT * FROM ({_CORPUS_SQL}) c WHERE {_SUBSET_PRED}
)"""
    )
    return f"""
WITH {corpus_ctes.strip()},
toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM corpus
),
idx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS shingle
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT key_a, key_b,
         ROUND(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = key_a
  JOIN sizes sb ON sb.doc_id = key_b
),
hashed AS (SELECT doc_id, {hlist} AS __H FROM corpus),
sg AS (SELECT doc_id, {sig_cols} FROM hashed),
cand AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         ROUND(({agree}) / {float(num_hashes)}, 6) AS agr
  FROM sg a JOIN sg b ON a.doc_id < b.doc_id AND ({band_eq})
),
lab AS (
  SELECT c.agr, COALESCE(jp.j, 0.0) AS j
  FROM cand c LEFT JOIN jp ON c.key_a = jp.key_a AND c.key_b = jp.key_b
)
SELECT CAST(LEAST(FLOOR(j * 10), 9) AS INT) AS jaccard_decile,
       COUNT(*) AS n_pairs,
       ROUND(AVG(agr), 6) AS avg_sig_agreement,
       ROUND(AVG(j), 6) AS avg_jaccard
FROM lab GROUP BY 1 ORDER BY 1
"""


def _mh_calibration_body(corpus: DataFrame) -> DataFrame:
    cand = xdedup.minhash_lsh_pairs(
        corpus, n=3, num_hashes=8, bands=4, verify_threshold=None
    )
    truth = xdedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.0)
    lab = cand.join(truth, on=["key_a", "key_b"], how="left").select(
        "sig_agreement",
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("j"),
    )
    return (
        lab.groupBy(
            F.least(F.floor(F.col("j") * 10), F.lit(9))
            .cast("int")
            .alias("jaccard_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("sig_agreement"), 6).alias("avg_sig_agreement"),
            F.round(F.avg("j"), 6).alias("avg_jaccard"),
        )
        .orderBy("jaccard_decile")
    )


@query(
    "dedup_minhash_calibration",
    oracle=_mh_calibration_oracle(),
    bench=False,
    bench_reason="exact threshold-0 truth side is answer-quadratic; benched form is dedup_minhash_calibration_sampled",
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the MinHash estimator calibrated?  Every banded candidate
    pair carries its full-signature agreement (the Jaccard ESTIMATE)
    and its exact shingle Jaccard (ground truth, tractable on the
    subset corpus); grouped by truth decile, avg estimate should track
    avg truth — the audit that tells you whether num_hashes/bands are
    tuned before trusting the verify threshold at scale.  Banded
    candidates that share no shingle land in decile 0 via the left
    join (estimator false positives).

    Plan: both pair sets are sub-quadratic subset joins (banded
    candidates; inverted-index Jaccard), the calibration join is
    pair-keyed, and the output is ≤ 10 rows.  bench=False since r12:
    the threshold-0 truth side is an exact pair enumeration —
    answer-quadratic on the adversarial synthetic corpus; the benched
    default is `dedup_minhash_calibration_sampled` (VERDICT r11 #3)."""
    return _mh_calibration_body(
        _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    )


@query(
    "dedup_minhash_calibration_sampled",
    oracle=_mh_calibration_oracle(sampled=True),
)
def dedup_minhash_calibration_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The benched form of the MinHash calibration audit (VERDICT r11
    #3): identical estimator-vs-truth deciles, but the corpus is a
    deterministic md5 hash-sample with an ABSOLUTE ~512-doc budget, so
    the exact truth-pair enumeration stays ~budget² at ANY scale —
    how a production audit actually runs (its own docstring said so;
    now the benched path does it).  The count-derived threshold is
    identical in both engines, so the sampled id set — and the hash —
    match exactly."""
    return _mh_calibration_body(_mh_sampled_corpus(spark, sf_dir))


def _mh_recall_oracle(
    num_hashes: int = 8, bands: int = 4, sampled: bool = False
) -> str:
    """ALL true Jaccard pairs of the (subset or budget-sampled)
    corpus LEFT-joined to the banded candidate set — per truth
    decile, the fraction banding retrieved (the LSH S-curve, the dual
    of the calibration audit's candidate-conditioned view)."""
    hlist, sig_cols, band_eq, _agree = _mh_sql_parts(num_hashes, bands)
    corpus_ctes = (
        _mh_sample_sql()
        if sampled
        else f"""
corpus AS (
  SELECT * FROM ({_CORPUS_SQL}) c WHERE {_SUBSET_PRED}
)"""
    )
    return f"""
WITH {corpus_ctes.strip()},
toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM corpus
),
idx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS shingle
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT key_a, key_b,
         ROUND(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = key_a
  JOIN sizes sb ON sb.doc_id = key_b
),
hashed AS (SELECT doc_id, {hlist} AS __H FROM corpus),
sg AS (SELECT doc_id, {sig_cols} FROM hashed),
cand AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b
  FROM sg a JOIN sg b ON a.doc_id < b.doc_id AND ({band_eq})
)
SELECT CAST(LEAST(FLOOR(jp.j * 10), 9) AS INT) AS jaccard_decile,
       COUNT(*) AS n_true_pairs,
       CAST(SUM(CASE WHEN c.key_a IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retrieved,
       ROUND(SUM(CASE WHEN c.key_a IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS recall
FROM jp LEFT JOIN cand c ON jp.key_a = c.key_a AND jp.key_b = c.key_b
GROUP BY 1 ORDER BY 1
"""


def _mh_recall_body(corpus: DataFrame) -> DataFrame:
    truth = xdedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.0)
    cand = xdedup.minhash_lsh_pairs(
        corpus, n=3, num_hashes=8, bands=4, verify_threshold=None
    ).withColumn("__hit", F.lit(1))
    lab = truth.join(cand, on=["key_a", "key_b"], how="left")
    return (
        lab.groupBy(
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
            .cast("int")
            .alias("jaccard_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_retrieved"),
            F.round(
                F.coalesce(F.sum("__hit"), F.lit(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("recall"),
        )
        .orderBy("jaccard_decile")
    )


@query(
    "dedup_minhash_recall_curve",
    oracle=_mh_recall_oracle(),
    bench=False,
    bench_reason="exact threshold-0 truth side is answer-quadratic; benched form is dedup_minhash_recall_sampled",
)
def dedup_minhash_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-curve, measured: of ALL co-shingle pairs at each true
    Jaccard decile, what fraction did the banded candidate join
    retrieve — the recall side of the banding trade-off
    (``dedup_minhash_calibration`` is the precision/bias side,
    conditioned on candidates).  Reading the curve tells you whether
    the (num_hashes, bands) operating point recalls the duplicates
    your verify threshold intends to keep BEFORE trusting it on a
    corpus too large for ground truth.

    Plan: the true-pair side is the subset inverted-index join, the
    candidate side the banded join; retrieval is one pair-keyed left
    join and the output ≤ 10 rows.  bench=False since r12: the truth
    side is answer-quadratic (see `dedup_minhash_calibration`); the
    benched default is `dedup_minhash_recall_sampled`."""
    return _mh_recall_body(
        _corpus(spark, sf_dir).filter(F.expr(_SUBSET_PRED))
    )


@query(
    "dedup_minhash_recall_sampled",
    oracle=_mh_recall_oracle(sampled=True),
)
def dedup_minhash_recall_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The benched form of the LSH recall S-curve (VERDICT r11 #3):
    same per-decile retrieval fractions, measured on the ~512-doc
    absolute-budget hash-sample (`_mh_sampled_corpus`) so the exact
    truth enumeration is scale-free — the sampling a production
    recall audit performs, with the count-derived threshold identical
    in both engines so the oracle still hash-matches."""
    return _mh_recall_body(_mh_sampled_corpus(spark, sf_dir))


# ---------------------------------------------------------------------------
# Budget-sampled benched defaults for the remaining answer-quadratic
# pair audits (VERDICT r12 #4): the exact fixed-fraction-subset forms
# above stay as oracle-only twins (bench=False); these sampled forms —
# the sampling a production pair audit performs — are the benched
# defaults, scale-free because the md5 hash-sample has an ABSOLUTE row
# budget whose count-derived threshold is identical in both engines.
# ---------------------------------------------------------------------------

_JACCARD_SAMPLED_ORACLE = f"""
WITH {_mh_sample_sql().strip()},
{_SHINGLE_TAIL.strip()},
{_JPAIRS_CTE.strip()}
SELECT key_a, key_b, jaccard FROM jpairs
"""


@query("dedup_ngram_jaccard_sampled", oracle=_JACCARD_SAMPLED_ORACLE)
def dedup_ngram_jaccard_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benched form of `dedup_ngram_jaccard`: the same 3-word-shingle
    inverted-index Jaccard join over the ~512-doc absolute-budget
    hash-sample, so the exact pair enumeration is bounded by budget²
    at any corpus size."""
    return xdedup.ngram_jaccard_pairs(
        _mh_sampled_corpus(spark, sf_dir), n=3, threshold=0.4
    )


@query("dedup_ngram_jaccard_prefix_sampled", oracle=_JACCARD_SAMPLED_ORACLE)
def dedup_ngram_jaccard_prefix_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benched form of `dedup_ngram_jaccard_prefix`: the PPJoin-style
    prefix-filtered join over the budget sample — SAME oracle as the
    sampled full join, still proving the two algorithms agree."""
    return xdedup.ngram_jaccard_pairs_prefix(
        _mh_sampled_corpus(spark, sf_dir), n=3, threshold=0.4
    )


@query(
    "dedup_containment_sampled",
    oracle=f"""
WITH {_mh_sample_sql().strip()},
{_SHINGLE_TAIL.strip()}
SELECT key_a, key_b,
       ROUND(common * 1.0 / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = key_a
JOIN sizes sb ON sb.doc_id = key_b
WHERE common * 1.0 / LEAST(sa.n_sh, sb.n_sh) >= 0.9
""",
)
def dedup_containment_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benched form of `dedup_containment`: asymmetric
    subset-duplicate detection (|A∩B| / min ≥ 0.9) over the budget
    sample."""
    return xdedup.containment_pairs(
        _mh_sampled_corpus(spark, sf_dir), n=3, threshold=0.9
    )


_BEST_REP_SAMPLED_ORACLE = f"""
WITH RECURSIVE {_mh_sample_sql().strip()},
{_SHINGLE_TAIL.strip()},
{_JPAIRS_CTE.strip()},
edges AS (
  SELECT key_a AS u, key_b AS v FROM jpairs
  UNION ALL
  SELECT key_b, key_a FROM jpairs
),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
labeled AS (
  SELECT c.doc_id, LENGTH(c.text) AS len,
         COALESCE(p.component, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN comp p ON p.node = c.doc_id
)
SELECT cluster,
       FIRST(doc_id ORDER BY len DESC, doc_id) AS best_key,
       MAX(len) AS best_len,
       COUNT(*) AS n_members
FROM labeled GROUP BY cluster
"""


@query("dedup_best_representative_sampled", oracle=_BEST_REP_SAMPLED_ORACLE)
def dedup_best_representative_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benched form of `dedup_best_representative`: pair discovery,
    connected components, and longest-member survivor selection over
    the budget sample — the cluster-audit shape a production corpus
    runs on its ground-truth sample."""
    corpus = _mh_sampled_corpus(spark, sf_dir)
    pairs = xdedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.4).select(
        "key_a", "key_b"
    )
    return xdedup.best_representative(corpus, pairs)
