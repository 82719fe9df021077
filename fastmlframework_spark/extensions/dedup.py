"""Deduplication operators for training-data pipelines (SURVEY.md
§7.5): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale design: every method is join/aggregate-shaped —

* exact: hash-groupBy on a content digest; one shuffle on the digest.
* n-gram Jaccard: inverted-index self-join on shingles (explode →
  join on shingle → per-pair intersection counts) — never an O(n²)
  cross join; the shingle index shards the pair space.
* MinHash+LSH: signatures are per-row expressions (transform/
  array_min over shingles — JVM codegen, no UDF); banding hashes
  signature slices so only same-bucket rows join (the classic
  sub-quadratic near-dup path at 100 TB).
* SimHash: 64-bit sign-aggregated word-hash, hamming-distance check
  within LSH buckets of bit-prefixes.
* embedding cosine: normalized dot products, either brute top-k for
  small query sets or bucketed via random hyperplanes (similarity.py).

md5-based hashing keeps every stage reproducible in the DuckDB
oracles (exact same candidate pairs cross-engine).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_HASH64 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


def _hash64(x: str) -> str:
    return _HASH64.format(x=x)


def exact_dedup(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: survivors = min key per content digest →
    [key, n_copies].  Grouping on the md5 digest, not the full text,
    keeps shuffle rows small at scale."""
    return (
        df.withColumn("__digest", F.md5(F.col(text_col)))
        .groupBy("__digest")
        .agg(
            F.min(key_col).alias(key_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__digest")
    )


def shingles(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    words: bool = True,
) -> DataFrame:
    """Distinct n-gram shingle set per document → [key, shingle].
    Word shingles by default (reference-free extension; char shingles
    via words=False)."""
    if words:
        arr = F.expr(
            f"transform(sequence(1, greatest(size(split({text_col}, '\\\\s+')) - {n - 1}, 1)),"
            f" i -> concat_ws(' ', slice(split({text_col}, '\\\\s+'), i, {n})))"
        )
    else:
        arr = F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
            f" i -> substring({text_col}, i, {n}))"
        )
    return (
        df.select(F.col(key_col), F.explode(F.array_distinct(arr)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted-index self-join →
    [key_a, key_b, jaccard] with key_a < key_b.

    |A∩B| from the shingle-equi-join, |A∪B| = |A|+|B|−|A∩B|; only
    pairs sharing ≥1 shingle are ever materialized.
    """
    sh = shingles(df, key_col, text_col, n).cache()
    sizes = sh.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(key_col).alias("key_a"), "shingle")
    b = sh.select(F.col(key_col).alias("key_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        inter.join(
            sizes.select(F.col(key_col).alias("key_a"), F.col("n_sh").alias("na")),
            on="key_a",
        )
        .join(
            sizes.select(F.col(key_col).alias("key_b"), F.col("n_sh").alias("nb")),
            on="key_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )
    return out


def minhash_signature_expr(text_col: str, n: int, seed: int) -> str:
    """One minhash value: min over word shingles of md5(shingle|seed)."""
    shingle_arr = (
        f"transform(sequence(1, greatest(size(split({text_col}, '\\\\s+')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, '\\\\s+'), i, {n})))"
    )
    hashed = _hash64(f"concat(s, '|', '{seed}')")
    return f"array_min(transform({shingle_arr}, s -> {hashed}))"


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures → [key, mh_0..mh_{H-1}].  Each hash is a
    seeded md5-min over the shingle set — a per-row JVM expression."""
    cols = {
        f"mh_{j}": F.expr(minhash_signature_expr(text_col, n, seed + j))
        for j in range(num_hashes)
    }
    return df.select(key_col, text_col).withColumns(cols).drop(text_col)


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    seed: int = 42,
    verify_threshold: float | None = 0.6,
) -> DataFrame:
    """MinHash+LSH candidate pairs → [key_a, key_b, sig_agreement].

    Banding: ``bands`` groups of ``num_hashes/bands`` signature slots;
    a pair is a candidate iff some band's slot-concatenation hashes
    equal (join on (band, band_digest)) — the sub-quadratic path.
    ``verify_threshold`` keeps candidates whose full-signature
    agreement fraction (Jaccard estimate) clears it.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, key_col, text_col, n, num_hashes, seed).cache()

    band_frames = []
    for b in range(bands):
        slots = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        digest = F.md5(F.concat_ws("|", *[F.col(s).cast("string") for s in slots]))
        band_frames.append(
            sig.select(
                F.col(key_col),
                F.lit(b).alias("band"),
                digest.alias("band_digest"),
            )
        )
    from functools import reduce

    banded = reduce(lambda x, y: x.unionByName(y), band_frames)
    left = banded.select(F.col(key_col).alias("key_a"), "band", "band_digest")
    right = banded.select(F.col(key_col).alias("key_b"), "band", "band_digest")
    cand = (
        left.join(right, on=["band", "band_digest"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )

    sig_a = sig.select(
        F.col(key_col).alias("key_a"),
        *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(num_hashes)],
    )
    sig_b = sig.select(
        F.col(key_col).alias("key_b"),
        *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    ) / F.lit(float(num_hashes))
    out = (
        cand.join(sig_a, on="key_a")
        .join(sig_b, on="key_b")
        .withColumn("sig_agreement", F.round(agree, 6))
        .select("key_a", "key_b", "sig_agreement")
    )
    if verify_threshold is not None:
        out = out.filter(F.col("sig_agreement") >= verify_threshold)
    return out


def simhash(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash → [key, simhash]: per-bit sign of the summed ±1
    contributions of word hashes.  Expressed as one aggregate over the
    exploded word list (shuffle on key), bit loop unrolled into
    ``bits`` conditional sums — no Python.

    16 bits default keeps the expression compact; production would use
    64 via the same unrolling.
    """
    words = df.select(
        F.col(key_col),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), r"\s+"))
        ).alias("w"),
    ).withColumn("h", F.expr(_hash64("w")))
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    agg = words.groupBy(key_col).agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(key_col), sim.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 2,
    prefix_bits: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs within bit-prefix LSH buckets →
    [key_a, key_b, hamming].  Bucket on the top ``prefix_bits`` so the
    self-join is block-local; verify hamming ≤ max_hamming via
    bit_count(xor)."""
    sh = simhash(df, key_col, text_col, bits).withColumn(
        "bucket", F.shiftright("simhash", bits - prefix_bits)
    )
    a = sh.select(
        F.col(key_col).alias("key_a"), F.col("simhash").alias("ha"), "bucket"
    )
    b = sh.select(
        F.col(key_col).alias("key_b"), F.col("simhash").alias("hb"), "bucket"
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("hamming", F.bit_count(F.expr("ha ^ hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs → [key_a, key_b, cosine].

    Exact all-pairs via a self-join — correct at test scale; the
    sub-quadratic path for 100 TB is the hyperplane-bucketed variant
    in similarity.lsh_bucket_pairs (same verify expression)."""
    normed = df.select(
        F.col(key_col),
        F.expr(
            f"transform({vec_col}, x -> x / sqrt(aggregate({vec_col}, 0.0D, (a, v) -> a + v * v)))"
        ).alias("__nv"),
    )
    a = normed.select(F.col(key_col).alias("key_a"), F.col("__nv").alias("va"))
    b = normed.select(F.col(key_col).alias("key_b"), F.col("__nv").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn(
            "cosine",
            F.round(
                F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0D, (a, v) -> a + v)"),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("key_a", "key_b", "cosine")
    )
