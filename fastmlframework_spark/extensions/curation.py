"""Corpus-curation operators for LLM training-data pipelines
(SURVEY.md §7.5 extension layer): benchmark-contamination detection,
repetition/diversity quality stats, sequence packing, domain-mixture
reweighting, and deterministic global shuffle order.

Scale design notes (100 TB):

* contamination: the eval/benchmark side is always SMALL (a few
  thousand documents); its shingle index broadcasts, so the train
  corpus is scanned once and never shuffled on text — the inverted
  index shards the candidate space exactly like the n-gram dedup path
  (`extensions/dedup.py`).
* packing: a single global token stream would serialize; packing is
  SHARD-LOCAL (hash-sharded), each shard packing its own stream with
  one window over (shard, key) — embarrassingly parallel, one shuffle.
* shuffle order: a global permutation is inherently a total sort, but
  Spark's range-partitioned sort distributes it; the global rank is
  recovered from per-partition counts (a partition-count-sized driver
  exchange, not a data collect).
* mixture weights: aggregate-sized — per-domain counts cross a 1-row
  total, everything past the first groupBy is broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from fastmlframework_spark.core import checkpoints

from fastmlframework_spark.extensions.dedup import shingles
from fastmlframework_spark.extensions.text import TOKEN_PATTERN, count_bpe_tokens


def eval_contamination(
    train: DataFrame,
    evals: DataFrame,
    key_col: str = "doc_id",
    eval_key_col: str = "eval_id",
    text_col: str = "text",
    n: int = 5,
    min_containment: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check → [key, eval_key, n_common,
    containment]: training documents that contain ≥ ``min_containment``
    of an eval document's distinct word ``n``-grams.

    Containment (|T∩E| / |E|), not Jaccard: an eval item is
    contaminated when it appears INSIDE a (much longer) train doc, so
    normalizing by the train side would wash out exactly the hits that
    matter.  The eval shingle index and per-eval sizes broadcast; the
    train corpus streams through one shingle scan."""
    tr = shingles(train, key_col, text_col, n).withColumnRenamed(
        key_col, "__train_key"
    )
    ev = shingles(evals, eval_key_col, text_col, n)
    ev_sizes = ev.groupBy(eval_key_col).agg(
        F.count(F.lit(1)).alias("n_eval_sh")
    )
    common = (
        tr.join(F.broadcast(ev), on="shingle")
        .groupBy("__train_key", eval_key_col)
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(F.broadcast(ev_sizes), on=eval_key_col)
        .withColumn("containment", F.col("n_common") / F.col("n_eval_sh"))
        .filter(F.col("containment") >= min_containment)
        .select(
            F.col("__train_key").alias(key_col),
            eval_key_col,
            "n_common",
            F.round("containment", 6).alias("containment"),
        )
    )


def repetition_stats(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token-diversity stats per document → [key, n_tokens,
    n_distinct, distinct_ratio].  Low distinct/total ratio flags
    boilerplate/template/spam documents (the cheap repetition filter
    of corpus curation).  Pure per-row expressions — a map-only scan
    at any scale."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
    return (
        df.select(
            F.col(key_col),
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "distinct_ratio", F.col("n_distinct") / F.col("n_tokens")
        )
    )


def pack_streams(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    ctx: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Concat-then-chunk sequence packing → per-document [key, shard,
    n_tokens, pack_id]: documents are concatenated in key order inside
    each hash shard and the token stream is cut every ``ctx`` tokens;
    a document belongs to the pack its first token lands in.

    Shard-local on purpose: one global stream would funnel the corpus
    through a single sort; ``shards`` independent streams pack in
    parallel with one window each, and training consumes packs in any
    shard order."""
    n_tok = count_bpe_tokens(F.col(text_col)).cast("long")
    base = df.select(
        F.col(key_col),
        (F.col(key_col) % shards).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("pack_id", F.floor(F.col("cum_before") / ctx)).drop(
        "cum_before"
    )


def mixture_weights(
    df: DataFrame, by: str = "source", alpha: float = 0.0
) -> DataFrame:
    """Domain-mixture reweighting → [group, n_docs, share, weight]:
    sampling weight per domain that moves the observed mixture to a
    TEMPERATURE-flattened target, ``target_i ∝ share_i^alpha``
    (weight = target_share / observed_share; rows with weight > 1 get
    upsampled, < 1 downsampled).

    ``alpha = 0`` is the uniform target (every domain equal — the
    original behavior), ``alpha = 1`` keeps the observed mixture
    (all weights 1), and the usual multilingual/data-mixing practice
    is ``alpha ≈ 0.3–0.7``, boosting rare domains without letting any
    single one dominate.  Aggregate-sized: per-domain counts
    cross-join a broadcast 1-row total (incl. the partition-function
    sum Σ share^alpha), all map-side."""
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("__total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias(
            "__z_counts"
        ),
    )
    share = F.col("n_docs") / F.col("__total")
    # target = n^alpha / Σ n^alpha == share^alpha / Σ share^alpha
    # (the total^alpha factor cancels), computed on raw counts to
    # avoid double rounding
    target = F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col(
        "__z_counts"
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            by,
            "n_docs",
            F.round(share, 6).alias("share"),
            F.round(target / share, 6).alias("weight"),
        )
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    keep_cols: list[str],
    rank_col: str = "rank",
    total_col: str | None = None,
    cum_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed global ROW_NUMBER over ``order_cols`` →
    ``keep_cols + [rank]``, rank 1..N with no single-partition window:
    the frame is range-partitioned and sorted on the order columns
    (Spark's distributed sort), then the global rank = within-partition
    row_number + the partition's offset, where offsets come from
    per-partition counts — a #partitions-sized driver exchange, never
    a data collect.

    ``total_col`` additionally attaches the global row count to every
    row — free, since it is the sum of the SAME per-partition counts
    the offsets need: callers that rank an expensively-computed frame
    (a scored corpus) and also need N (rank deciles) must not pay a
    separate ``count()`` pass over that frame's lineage.

    ``cum_cols`` attaches, per listed column ``c``, the INCLUSIVE
    running sum of ``c`` in global rank order as ``cum_<c>`` plus the
    global total as ``total_<c>`` — the same distributed prefix-sum
    trick applied to values: within-partition window cumsum shifted by
    per-partition sum offsets whose own prefix runs over the
    #partitions-row table.  This is what greedy budgeted selection
    ("take the best documents until N tokens") needs, with no
    single-partition window anywhere."""
    cum_cols = list(cum_cols or [])
    par = df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(par, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    sizes = sorted_df.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in cum_cols],
    )
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_exprs: list = []
    for c in cum_cols:
        cum_exprs.append(
            F.coalesce(F.sum(f"__s_{c}").over(woff), F.lit(0)).alias(
                f"__coff_{c}"
            )
        )
        cum_exprs.append(F.sum(f"__s_{c}").over(wtot).alias(f"total_{c}"))
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off"),
        F.sum("__n").over(wtot).alias("__tot"),
        *cum_exprs,
    )
    wrank = Window.partitionBy("__pid").orderBy(*order_cols)
    wcum = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    extra = [F.col("__tot").alias(total_col)] if total_col else []
    for c in cum_cols:
        extra.append(
            (F.sum(c).over(wcum) + F.col(f"__coff_{c}")).alias(f"cum_{c}")
        )
        extra.append(F.col(f"total_{c}"))
    return (
        sorted_df.join(F.broadcast(offsets), on="__pid")
        .select(
            *keep_cols,
            (F.row_number().over(wrank) + F.col("__off"))
            .cast("long")
            .alias(rank_col),
            *extra,
        )
    )


def select_to_token_budget(
    df: DataFrame,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    budget_frac: float = 0.5,
    key_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy budgeted selection: take documents in quality order
    (best first, ties to the smallest key) until the cumulative token
    count fills ``budget_frac`` of the corpus total → the SELECTED
    rows with [key, *keep, token_col, rank, cum_tokens].  A document
    is selected iff it STARTS before the budget boundary
    (``cum − own_tokens < budget``), so the boundary document is
    included and the budget is met, never undershot — the dataset-
    construction step of a training run sized in tokens, not rows.

    Distributed via ``global_rank``'s cumulative columns: the running
    token sum is a range-partitioned window cumsum shifted by
    per-partition offsets, and the budget itself derives from the same
    per-partition sums — no extra pass over the scored lineage, no
    single-partition window."""
    keep = [c for c in (keep_cols or []) if c != token_col]
    ranked = global_rank(
        df.withColumn("__negq", -F.col(quality_col)),
        order_cols=["__negq", key_col],
        keep_cols=[key_col, *keep, token_col],
        cum_cols=[token_col],
    )
    budget = F.lit(budget_frac) * F.col(f"total_{token_col}")
    return ranked.filter(
        (F.col(f"cum_{token_col}") - F.col(token_col)) < budget
    ).select(
        key_col,
        *keep,
        token_col,
        "rank",
        F.col(f"cum_{token_col}").alias("cum_tokens"),
    )


def shuffle_order(
    df: DataFrame, key_col: str = "doc_id", salt: str = "shuf7"
) -> DataFrame:
    """Deterministic global shuffle for training order → [key, rank]:
    rank 1..N in md5(key||salt) order — reproducible across engines,
    partitionings and re-runs (no RNG stream); distributed via
    ``global_rank``."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    return global_rank(
        df.select(F.col(key_col), h.alias("__h")),
        order_cols=["__h", key_col],
        keep_cols=[key_col],
    )


# Conservative PII patterns, deliberately restricted to syntax both
# Java regex (Spark) and RE2 (DuckDB) interpret identically — char
# classes, bounded repetition, \b word boundaries; no lookarounds.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
) -> DataFrame:
    """C4/Dolma-style PII redaction at ingest → df columns +
    [clean_text, n_email, n_phone, n_ipv4]: each detected span is
    replaced with a typed mask token (``[EMAIL]`` …) and counted, so
    curation can both ship scrubbed text and monitor per-source PII
    rates (a source whose PII density jumps is a crawl-config bug).

    100 TB shape: pure map — per-row regexp_extract_all (count) +
    chained regexp_replace (mask), whole-stage-codegen'd into the
    scan; no shuffle, no state, no Python.  The patterns are the
    conservative high-precision tier (emails, NANP-style phones,
    IPv4); entity-level PII (names, addresses) needs an NER pass,
    which belongs in a gated model stage, not the regex screen.

    Deterministic + engine-portable by construction (see
    PII_PATTERNS), so the full scrub — counts AND masked text —
    carries a DuckDB value-hash oracle (`pii_scrub_planted`).

    NULL text scrubs as the empty string: counts are 0 (not the -1
    that F.size(NULL) yields under legacy sizeOfNull) and clean_text
    is '' — summed per-source PII stats stay correct on sparse
    corpora."""
    out = df
    text = F.coalesce(F.col(text_col), F.lit(""))
    clean = text
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))),
        )
        clean = F.regexp_replace(clean, pat, f"[{kind.upper()}]")
    return out.withColumn("clean_text", clean)


def remove_boilerplate_lines(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 20,
    broadcast_hot: bool = True,
) -> DataFrame:
    """CCNet/Dolma-style line-level boilerplate removal →
    [key, clean_text, n_lines, n_removed].

    A line that appears (exactly) in ``min_doc_freq`` or more DISTINCT
    documents is boilerplate (headers, footers, cookie banners,
    navigation chrome) and is dropped from every document; document
    text is reassembled from the surviving lines in original order.
    Documents whose every line is boilerplate come back with empty
    ``clean_text`` (kept, so the caller decides whether to drop).

    Scale shape: ONE explode definition feeds both the digest-grouped
    document-frequency count (map-side combined, digest-sized rows)
    and the flagging join, and a single per-document aggregation
    produces counts AND the reassembled text — no separate totals
    scan.  The hot set is bounded by total_lines / min_doc_freq
    distinct digests; that is broadcast-sized for real chrome on
    real corpora but NOT in general (a 1 TB corpus at the default
    threshold can exceed the 8 GB broadcast cap) — set
    ``broadcast_hot=False`` to fall back to a shuffled join when the
    corpus/threshold combination makes the hot set large."""
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("line_digest", F.md5("line"))
    hot = (
        lines.groupBy("line_digest")
        .agg(F.countDistinct(key_col).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("line_digest", F.lit(True).alias("__hot"))
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    flagged = lines.join(hot, on="line_digest", how="left")
    rebuilt = (
        flagged.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count("__hot").cast("long").alias("n_removed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__hot").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .select(key_col, "clean_text", "n_lines", "n_removed")
    )
    # NULL-text docs explode to zero lines and would vanish from the
    # aggregation — re-attach every input key (key-only projection:
    # column pruning keeps this scan text-free) so the every-doc-
    # comes-back contract holds
    return (
        df.select(key_col)
        .join(rebuilt, on=key_col, how="left")
        .select(
            key_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def epochs_plan(
    df: DataFrame,
    budget_tokens: int,
    by: str = "source",
    text_col: str = "text",
    alpha: float = 0.0,
) -> DataFrame:
    """Token-budget training plan → [by, n_docs, tokens_available,
    target_share, tokens_needed, epochs]: given a total training
    budget and a temperature-flattened target mixture
    (target_i ∝ tokens_i^alpha, as ``mixture_weights``), how many
    tokens each domain must contribute and how many EPOCHS of it that
    means — epochs > 1 is deliberate repetition, the data-constrained
    regime of Muennighoff et al. 2023 ("Scaling Data-Constrained
    Language Models"), where a planner caps repeats per domain.

    Aggregate-sized end-to-end: one corpus scan for per-domain token
    sums, a broadcast 1-row partition function, then pure arithmetic.
    ``tokens_needed`` floors (exact in both engines — no cross-engine
    round-half ambiguity on doubles).

    A domain with zero available tokens (every doc empty/whitespace)
    can't contribute: it is excluded from the partition function
    (pow(0, 0) = 1 would otherwise hand alpha=0 plans a phantom
    share) and reported with target_share/tokens_needed/epochs all 0
    — never a divide-by-zero."""
    toks = F.size(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
        )
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(by), toks.alias("__t")
    )
    counts = base.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("__avail"),
    )
    has_tokens = F.col("__avail") > 0
    tot = counts.agg(
        F.sum(
            F.when(
                has_tokens, F.pow(F.col("__avail").cast("double"), F.lit(alpha))
            ).otherwise(F.lit(0.0))
        ).alias("__z")
    )
    target = F.when(
        has_tokens,
        F.pow(F.col("__avail").cast("double"), F.lit(alpha)) / F.col("__z"),
    ).otherwise(F.lit(0.0))
    needed = F.floor(F.lit(float(budget_tokens)) * target).cast("long")
    return counts.crossJoin(F.broadcast(tot)).select(
        by,
        "n_docs",
        F.col("__avail").cast("long").alias("tokens_available"),
        F.round(target, 6).alias("target_share"),
        needed.alias("tokens_needed"),
        F.round(
            F.when(has_tokens, needed / F.col("__avail")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("epochs"),
    )


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    key_col: str = "doc_id",
    buckets: int = 16,
    train_lt: int = 12,
    valid_lt: int = 14,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment → [key, cluster,
    split]: near-duplicate CLUSTERS (connected components of
    ``dup_pairs``) are the unit of assignment, so two near-copies can
    never straddle an eval boundary — the split-contamination failure
    mode doc-level random splits have.

    Split = hashed cluster id into ``buckets`` (power of two — the
    pmod(xxhash64)/unsigned-remainder oracle contract): < ``train_lt``
    → train, < ``valid_lt`` → valid, else test (defaults 12/2/2 =
    75/12.5/12.5%).  Singletons are their own cluster.  Plan: the
    component labels (one row per DUPLICATED doc — can be a large
    fraction of a web corpus, so NOT force-broadcast; AQE picks the
    join strategy from the actual label count) join back once,
    everything else is a map."""
    if not 0 < train_lt < valid_lt <= buckets:
        raise ValueError(
            "need 0 < train_lt < valid_lt <= buckets "
            f"(got {train_lt}/{valid_lt}/{buckets})"
        )
    from fastmlframework_spark.extensions.dedup import connected_components
    from fastmlframework_spark.extensions.filtering import _bucket_sql

    bucket = _bucket_sql("CAST(cluster AS STRING)", buckets)
    comp = connected_components(dup_pairs)
    labeled = df.select(key_col).join(
        comp.withColumnRenamed("node", key_col),
        on=key_col,
        how="left",
    ).withColumn(
        "cluster", F.coalesce("component", F.col(key_col))
    )
    h = F.expr(bucket)
    split = (
        F.when(h < train_lt, F.lit("train"))
        .when(h < valid_lt, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return labeled.select(key_col, "cluster", split.alias("split"))


# Blocklisted URL domains (C4/RefinedWeb-style list shape — real
# pipelines load the full blocklist from a config; the mechanism is
# what matters here).  Shared with the oracle twin.
URL_BLOCKLIST = ("spam.example.com", "ads.example.net")

# NB: embedded in an F.expr SQL string literal, where Spark strips
# unknown escapes — the backslash must arrive doubled so the regex
# engine sees \s (a bare \s in the literal becomes plain "s").
_URL_HOST_PATTERN = r"https?://([^/\\s]+)"


def url_domain_stats(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    blocklist: tuple[str, ...] = URL_BLOCKLIST,
) -> DataFrame:
    """Per-domain URL statistics for blocklist curation (the C4 /
    RefinedWeb URL-filtering shape) → [domain, n_urls, n_docs,
    blocked]: extract every URL host from document text (regexp,
    ``www.``-stripped, lower-cased), count occurrences and distinct
    documents, and flag blocklisted domains.

    One map-only regexp extraction + explode into a domain-bounded
    aggregate (web corpora have ~10⁷ domains — small next to the
    document count); the blocklist rides the plan as a literal array
    (a real 10⁵-entry blocklist would broadcast-join instead — same
    shape, different constant)."""
    hosts = F.expr(
        f"transform(regexp_extract_all({text_col}, '{_URL_HOST_PATTERN}', 1),"
        " h -> lower(regexp_replace(h, '^www\\\\.', '')))"
    )
    blocked = F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(key_col), F.explode(hosts).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(key_col).alias("n_docs"),
        )
        .withColumn("blocked", blocked)
    )


def encoding_quality(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Encoding-damage screen per document → [key, n_chars,
    n_replacement, n_control, bad_char_frac]: counts of U+FFFD
    replacement characters (the mojibake tell — a decoder already
    gave up on those bytes) and C0 control characters (excluding
    tab/newline/CR), and their combined fraction of the document.
    The cheap pre-filter that catches double-encoded or
    binary-contaminated documents before they poison tokenizers.

    Pure per-row ``regexp_count`` expressions — map-only, one scan,
    whole-stage-codegens into the parquet read at any scale."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = F.regexp_count(t, F.lit("�"))
    n_ctrl = F.regexp_count(
        t, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    )
    n_chars = F.length(t)
    return df.select(
        F.col(key_col),
        n_chars.cast("long").alias("n_chars"),
        n_repl.cast("long").alias("n_replacement"),
        n_ctrl.cast("long").alias("n_control"),
        F.round(
            (n_repl + n_ctrl) / F.greatest(n_chars, F.lit(1)), 6
        ).alias("bad_char_frac"),
    )


def embedding_contamination(
    corpus: DataFrame,
    evals: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    n_planes: int | None = None,
    seed: int = 7,
    rows_per_bucket: int = 128,
) -> DataFrame:
    """Embedding-space benchmark decontamination → [key,
    n_eval_matches, max_cosine] for every corpus vector whose cosine
    against SOME eval vector reaches ``threshold`` — the semantic
    complement of ``eval_contamination`` (n-gram containment misses
    paraphrases; embedding cosine catches them).

    Same hyperplane-sign sharding as ``dedup.lsh_dup_pairs`` and the
    same exact-verify arithmetic (double-square norms, cast-first
    left-to-right dot — the expressions the bit-faithful SQL twin in
    ``queries/lsh_sql.py`` mirrors), but the join is asymmetric: the
    EVAL side is benchmark-sized (10³-10⁵ rows), so its bucketed
    vectors broadcast and the corpus is never shuffled — one scan
    computing buckets map-side, a broadcast hash join per bucket
    collision, and a corpus-key aggregate.  ``n_planes`` defaults to
    ``adaptive_n_planes`` of the CORPUS count (occupancy is
    corpus-driven); at 100 TB this is the identical shape to the
    ingest-dedup index probe: big side map-only, small side broadcast."""
    from fastmlframework_spark.extensions.dedup import adaptive_n_planes
    from fastmlframework_spark.extensions.similarity import (
        hyperplanes,
        vec_dim,
        with_lsh_bucket,
    )

    dim = vec_dim(corpus, vec_col)
    if n_planes is None:
        n_planes = adaptive_n_planes(corpus.count(), rows_per_bucket)
    planes = hyperplanes(dim, n_planes, seed)
    norm = (
        f"sqrt(aggregate({vec_col}, 0.0D, (a, v) -> a + cast(v as double)*v))"
    )
    c = with_lsh_bucket(
        corpus.select(
            key_col, F.col(vec_col), F.expr(norm).alias("__norm")
        ),
        vec_col,
        planes,
    ).select(
        F.col(key_col),
        F.col(vec_col).alias("ea"),
        F.col("__norm").alias("na"),
        "bucket",
    )
    e = with_lsh_bucket(
        evals.select(F.col(vec_col), F.expr(norm).alias("__norm")),
        vec_col,
        planes,
    ).select(
        F.col(vec_col).alias("eb"), F.col("__norm").alias("nb"), "bucket"
    )
    dot = (
        "aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * y), "
        "0.0D, (a, v) -> a + v)"
    )
    return (
        c.join(F.broadcast(e), on="bucket")
        .withColumn("cosine", F.round(F.expr(f"({dot}) / (na * nb)"), 6))
        .filter(F.col("cosine") >= threshold)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("cosine").alias("max_cosine"),
        )
    )


#: Bloom filters pack 32 (not 64) bits per BIGINT word so every mask
#: and bit test stays a POSITIVE value in both Spark and the DuckDB
#: oracle — 1<<63 flips sign in two's complement and the engines
#: disagree on what that stringifies to; 1<<31 in a 64-bit lane never
#: can.  RAM cost of the half-empty words is irrelevant at any m.
BLOOM_WORD_BITS = 32


def _with_word_ngrams(
    df: DataFrame, text_col: str, n: int, out: str = "__shs"
) -> DataFrame:
    """Attach the distinct word ``n``-gram array per row (space-joined
    windows over a whitespace split, short texts yield their whole
    token span) — the map-side shingle unit shared by the Bloom build
    and probe.  NULL and empty text yield an EMPTY array, not the
    ``['']`` artifact the raw split/slice/concat_ws chain produces
    (split(NULL)→NULL, slice→NULL, concat_ws→''): the empty-string
    pseudo-shingle is filtered out, so downstream NULL/empty-admit
    contracts (``bloom_probe_annotate``, the streaming
    decontamination gate) genuinely trigger.  String shingles, not
    ``dedup.shingle_sets`` digests:
    the Bloom positions are ARITHMETIC on the shingle's own xxhash64,
    so the oracle must hash the identical bytes, and the validated
    cross-engine hash twin (``queries/xxh64_sql.py``) covers UTF-8
    strings.

    The split array is projected as its OWN column first: inlining
    ``split`` into the window lambda re-evaluates it per window —
    O(len²) per doc, the same Catalyst trap ``dedup.shingle_sets``
    documents (measured 2.6s → 0.9s on the sf0.1 probe scan)."""
    w = F.col("__w")
    return (
        df.withColumn("__w", F.split(F.col(text_col), r"\s+"))
        .withColumn(
            out,
            F.filter(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.size(w) - (n - 1), F.lit(1)),
                        ),
                        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
                    )
                ),
                lambda s: s != F.lit(""),
            ),
        )
        .drop("__w")
    )


def _bloom_position(i: int | str, num_bits: int, h: str = "h") -> str:
    """SQL for Bloom position i of 64-bit hash column ``h``:
    Kirsch–Mitzenmacher double hashing — h1 = low 32 bits, h2 = high
    32 bits forced odd (odd strides visit every residue of the
    power-of-two table), pos_i = (h1 + i·h2) mod m.  All operands
    non-negative and < 2^35, so plain ``%`` matches the oracle's
    unsigned arithmetic exactly."""
    return (
        f"((({h} & 4294967295) + "
        f"{i} * (shiftrightunsigned({h}, 32) | 1)) % {num_bits})"
    )


def ngram_bloom_filter(
    evals: DataFrame,
    text_col: str = "text",
    n: int = 5,
    num_bits: int | None = 8192,
    num_hashes: int = 5,
) -> DataFrame:
    """ONE-row Bloom filter over the eval corpus's distinct word
    ``n``-grams → [bloom_words: array<long> (num_bits/32 packed
    words), num_bits, num_hashes, ngram_n] — the filter carries its
    own parameters so ``bloom_probe_stats`` cannot probe with
    mismatched position arithmetic.

    ``num_bits=None`` auto-sizes the table to the eval corpus:
    m = n_distinct_shingles · num_hashes / ln 2 rounded up to a
    64-bit (two-word) multiple (the k-optimal load, fpr ≈ 2^-k).  A FIXED m is
    only safe when the eval corpus is known small — at
    eval-shingle counts approaching m the filter saturates and the
    screen flags everything; auto-sizing costs one count() over the
    (small, broadcast-bound) eval side and keeps the index at ~2.3
    bits per shingle per hash at any eval size.

    This is the O(bits) alternative to ``eval_contamination``'s
    broadcast inverted index: the index size is FIXED at ``num_bits``
    regardless of how many eval shingles exist, and the probe side
    (``bloom_probe_stats``) becomes a pure map — no shingle-equality
    join at all.  At 100 TB that is the cheapest possible
    decontamination pre-screen: broadcast a few KB once, scan the
    corpus once, shuffle nothing; the exact per-eval containment join
    then runs only over the tiny flagged subset.  False positives are
    one-sided (a screen can only over-flag, never miss), bounded by
    the standard (1 - e^{-kn/m})^k.

    Positions are deterministic double hashing off ONE ``xxhash64``
    per shingle (see ``_bloom_position``), so the DuckDB oracle twin
    (``queries/curation.py``) rebuilds the identical bit array."""
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    sh = (
        _with_word_ngrams(evals.select(text_col), text_col, n)
        .select(F.explode("__shs").alias("__sh"))
        .distinct()
        .select(F.xxhash64("__sh").alias("h"))
    )
    if num_bits is None:
        import math

        n_sh = sh.count()
        word_chunk = BLOOM_WORD_BITS * 2
        num_bits = max(
            word_chunk,
            math.ceil(n_sh * num_hashes / math.log(2) / word_chunk)
            * word_chunk,
        )
    if num_bits <= 0 or num_bits % BLOOM_WORD_BITS:
        raise ValueError(f"num_bits must be a positive multiple of "
                         f"{BLOOM_WORD_BITS}, got {num_bits}")
    nwords = num_bits // BLOOM_WORD_BITS
    pos = sh.select(
        F.explode(
            F.array(
                *[F.expr(_bloom_position(i, num_bits)) for i in range(num_hashes)]
            )
        ).alias("__pos")
    )
    words = pos.select(
        F.floor(F.col("__pos") / BLOOM_WORD_BITS).cast("int").alias("__word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__pos % {BLOOM_WORD_BITS} AS INT))"
        ).alias("__mask"),
    )
    # Dense-array assembly via range left-join + sorted collect.
    # NOT `transform(sequence(0, nwords-1), i -> element_at(map, i))`:
    # Catalyst map element_at is a LINEAR scan, making that assembly
    # O(nwords²) — measured ~12 min for an auto-sized 10M-bit filter
    # (320k words) vs seconds here.  The sorted-struct collect is
    # O(nwords log nwords) and the row stays MBs at any sane m.
    sparse = words.groupBy("__word").agg(F.bit_or("__mask").alias("__m"))
    idx = (
        evals.sparkSession.range(nwords)
        .select(F.col("id").cast("int").alias("__word"))
    )
    return (
        idx.join(sparse, on="__word", how="left")
        .select(
            "__word",
            F.coalesce("__m", F.lit(0).cast("long")).alias("__m"),
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__word", "__m"))),
                lambda e: e["__m"],
            ).alias("bloom_words")
        )
        .select(
            "bloom_words",
            F.lit(num_bits).alias("num_bits"),
            F.lit(num_hashes).alias("num_hashes"),
            F.lit(n).alias("ngram_n"),
        )
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two ``ngram_bloom_filter`` frames built with IDENTICAL
    parameters into the filter of the UNION of their eval corpora.

    Bitwise OR of the packed words is EXACT, not approximate: a
    shingle's positions depend only on its own bytes, so
    ``merge(build(A), build(B)) == build(A ∪ B)`` bit-for-bit
    (pinned by ``tests/test_curation.py``).  This is what makes the
    Bloom index operational at 100 TB: each eval shard builds its own
    filter independently and the tiny one-row frames reduce by OR —
    no global shuffle of eval shingles ever happens.

    Raises if the two filters' ``num_bits``/``num_hashes``/``ngram_n``
    differ (their position arithmetic would be incompatible)."""
    pa = a.select("num_bits", "num_hashes", "ngram_n").first()
    pb = b.select("num_bits", "num_hashes", "ngram_n").first()
    if tuple(pa) != tuple(pb):
        raise ValueError(
            f"incompatible bloom filters: {tuple(pa)} vs {tuple(pb)}"
        )
    return (
        a.select(F.col("bloom_words").alias("__wa"))
        .crossJoin(b.select(F.col("bloom_words").alias("__wb")))
        .select(
            F.zip_with(
                "__wa", "__wb", lambda x, y: x.bitwiseOR(y)
            ).alias("bloom_words"),
            F.lit(pa["num_bits"]).alias("num_bits"),
            F.lit(pa["num_hashes"]).alias("num_hashes"),
            F.lit(pa["ngram_n"]).alias("ngram_n"),
        )
    )


def bloom_probe_annotate(
    df: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Probe every row of ``df`` against an ``ngram_bloom_filter``,
    CARRYING ALL INPUT COLUMNS THROUGH → df columns +
    [n_shingles, n_hits, hit_ratio]: the fraction of the row's
    distinct word ``n``-grams that the filter claims appear ANYWHERE
    in the eval corpus.  Rows whose text yields no shingles (NULL or
    empty text — ``_with_word_ngrams`` filters the empty-string
    pseudo-shingle) get ``n_shingles = 0`` and NULL ``hit_ratio`` —
    they cannot be contaminated, and a consumer's admit predicate
    treats NULL hit_ratio as clean
    (``streaming.quality.streaming_decontamination_gate``).

    ``n``/``num_bits``/``num_hashes`` come from the filter frame's
    own metadata columns (one single-row first() — the build/probe
    position arithmetic cannot drift apart).

    Plan shape: ZERO shuffles, and — because the input columns ride
    along instead of being re-joined on a key — no self-join either:
    the shingle array, the per-shingle hash, and all k bit tests are
    per-row HOF expressions (transform → filter → size), and the
    one-row filter frame arrives via a broadcast cross join.  The
    corpus is scanned ONCE, map-only, which is the whole point of
    the Bloom variant at 100 TB; the annotate form is what an ingest
    gate composes with (admit/quarantine as a pure filter), while
    ``bloom_probe_stats`` keeps the narrow stats projection.  Each
    position is computed ONCE (an inner transform over hash indices)
    and consumed by both the word lookup and the bit shift via the
    forall lambda binding — not re-derived per use."""
    meta = bloom.select("ngram_n", "num_bits", "num_hashes").first()
    n, num_bits, num_hashes = (
        meta["ngram_n"], meta["num_bits"], meta["num_hashes"]
    )
    positions = (
        f"transform(sequence(0, {num_hashes - 1}), "
        f"i -> {_bloom_position('i', num_bits)})"
    )
    test = (
        f"((element_at(__bloom_words, "
        f"CAST(p DIV {BLOOM_WORD_BITS} AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT)))"
        f" != 0)"
    )
    hits = F.expr(
        f"size(filter(transform(__shs, s -> xxhash64(s)), "
        f"h -> forall({positions}, p -> {test})))"
    )
    in_cols = df.columns
    # The two stats ride through ONE explode(array(struct(...)))
    # generator (exactly one row out per row in).  This is an
    # optimizer barrier, not a reshuffle: a downstream filter on
    # n_hits/hit_ratio (the batch screen's `n_hits > 0`, a gate's
    # admit predicate) cannot be pushed below a Generate, so Catalyst
    # cannot substitute the whole per-shingle hash+k-probe expression
    # into a Filter/join condition and evaluate it TWICE per row —
    # measured 4.6 s → 1.1 s on the sf0.1 corpus screen (guide §4.4:
    # the JVM-expression analogue of duplicated-UDF pushdown; plan
    # evidence in plans/r13/contamination_bloom_screen_*.txt).
    stats = F.explode(
        F.array(F.struct(F.size("__shs").alias("n"), hits.alias("h")))
    )
    return (
        _with_word_ngrams(df, text_col, n)
        .crossJoin(
            F.broadcast(bloom.select(F.col("bloom_words").alias("__bloom_words")))
        )
        .select(*in_cols, stats.alias("__probe"))
        .select(
            *in_cols,
            F.col("__probe.n").alias("n_shingles"),
            F.col("__probe.h").alias("n_hits"),
        )
        .withColumn(
            "hit_ratio",
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_hits") / F.col("n_shingles"), 6),
            ),
        )
    )


def bloom_probe_stats(
    train: DataFrame,
    bloom: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe every training document against an ``ngram_bloom_filter``
    → [key, n_shingles, n_hits, hit_ratio]: the narrow stats
    projection of ``bloom_probe_annotate`` (shared plan — zero
    shuffles, one map-only corpus scan behind a one-row broadcast),
    restricted to rows that produced at least one shingle — the
    screen ahead of the exact per-eval containment join, which then
    runs only on the flagged docs.

    The at-least-one-shingle restriction is applied as a CHEAP input
    predicate, ``text RLIKE '\\S'``, instead of a post-hoc
    ``n_shingles > 0``: the two are exactly equivalent
    (``_with_word_ngrams`` splits on java ``\\s+`` and drops the
    empty pseudo-shingle, so a row yields a shingle iff its text has
    at least one non-``\\s`` character — NULL text fails both), and
    the cheap form keeps Catalyst from pushing the full shingle
    expression into a pre-probe Filter and computing it twice per row
    (guide §4.4; measured in plans/r13/contamination_bloom_screen)."""
    return bloom_probe_annotate(
        train.select(key_col, text_col).filter(
            F.col(text_col).rlike(r"\S")
        ),
        bloom,
        text_col,
    ).select(key_col, "n_shingles", "n_hits", "hit_ratio")


def quality_confidence(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-group quality pass-rate with Wilson 95% score interval →
    [by, n_docs, n_pass, pass_rate, ci_low, ci_high]: the decision
    layer over ``gopher_rules`` — a source with 3/4 passing and a
    source with 30k/40k passing have the same point estimate but very
    different evidence, and curation keep/drop calls on small sources
    need the interval, not the ratio.  Wilson (1927) rather than the
    normal approximation: stays inside [0, 1] and behaves at n_pass
    ∈ {0, n}.

    One corpus scan (the Gopher flag battery is a map-only
    projection) into a group-bounded aggregate; the interval is
    closed-form float64 arithmetic on the two counts — no resampling,
    nothing beyond the single groupBy at any scale."""
    from fastmlframework_spark.extensions.filtering import gopher_rule_flags

    counts = (
        gopher_rule_flags(df, text_col)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("passes").cast("long")).alias("n_pass"),
        )
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_pass") / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(z) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    return counts.select(
        by,
        "n_docs",
        "n_pass",
        F.round(p, 6).alias("pass_rate"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    )


def curation_funnel(
    corpus: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    near_threshold: float = 0.5,
    survivor_persistence: str = "local_checkpoint",
) -> DataFrame:
    """End-to-end curation survivor funnel → [stage, stage_name,
    n_docs, n_tokens]: the document/token mass remaining after each
    cumulative stage of the standard LLM-corpus pipeline —

      1 raw          everything ingested
      2 quality      docs passing the full Gopher rule battery
      3 exact_dedup  one survivor (min key) per content digest
      4 near_dedup   drop the higher-key member of every verified
                     MinHash-LSH near-dup pair among the survivors

    — the shrinkage report data teams publish next to a datacard
    (what did each gate cost us, in docs and tokens?).

    Scale shape (≤2 corpus scans total): stages 1 and 2 are ONE
    conditional aggregate over the flag projection — count/sum plus
    sum(when(passes, ...)) in a single pass, split into two rows by
    exploding a 2-element struct array over the 1-row result — so the
    raw corpus is scanned exactly once for both stages and nothing is
    materialized.  The exact-dedup survivor set ``s3`` (quality-passing
    docs, one per digest — the only frame consumed three times: its own
    aggregate, the MinHash pair generation, and the anti-join) is
    eagerly ``localCheckpoint``-ed, so the second corpus scan happens
    once and every stage-3/4 branch reads the materialized survivors.
    Checkpointing s3 rather than the raw projection is deliberate: at
    100 TB the post-quality post-dedup survivor set is the small frame;
    the failing/duplicate mass never hits executor storage.  Stage 4
    then runs the sub-quadratic banded MinHash join ONLY over that
    survivor set — the same cheap→costly gate ordering production
    pipelines use.  Note the eager checkpoint makes construction run
    one Spark job (same pattern as ``semantic_dedup``'s component
    loop).

    Durability trade (ADVICE r8): ``localCheckpoint`` stores the
    survivor blocks in EXECUTOR-LOCAL (non-reliable) storage and cuts
    the lineage — on a real cluster, losing an executor after
    construction makes later reads of the returned frame FAIL
    outright (no lineage left to recompute from), and the result is
    frozen against subsequent corpus changes.  That is the right
    default for a one-shot report on a healthy cluster (no
    checkpoint-dir config, no reliable-store round-trip).  For
    long-lived consumers pass ``survivor_persistence="persist"``:
    the survivor set is persisted + materialized but keeps its
    lineage, so an executor loss transparently recomputes the lost
    partitions (from the CURRENT source — the snapshot-freeze
    property is traded away with the failure mode)."""
    from fastmlframework_spark.extensions.dedup import minhash_lsh_pairs
    from fastmlframework_spark.extensions.filtering import gopher_rule_flags

    ntok = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda w: w != F.lit(""),
        )
    )
    d0 = gopher_rule_flags(corpus.select(key_col, text_col), text_col).select(
        key_col, text_col, "passes", ntok.alias("__ntok")
    )
    # Stages 1+2 in ONE scan: conditional sums over the flag projection,
    # fanned out to two rows by exploding a literal struct array.
    stage12 = (
        d0.agg(
            F.count(F.lit(1)).alias("n1"),
            F.coalesce(F.sum("__ntok"), F.lit(0)).alias("t1"),
            F.coalesce(
                F.sum(F.when(F.col("passes"), F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("n2"),
            F.coalesce(
                F.sum(F.when(F.col("passes"), F.col("__ntok")).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("t2"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("stage"),
                        F.lit("raw").alias("stage_name"),
                        F.col("n1").alias("n_docs"),
                        F.col("t1").alias("n_tokens"),
                    ),
                    F.struct(
                        F.lit(2).alias("stage"),
                        F.lit("quality").alias("stage_name"),
                        F.col("n2").alias("n_docs"),
                        F.col("t2").alias("n_tokens"),
                    ),
                )
            ).alias("s")
        )
        .select("s.stage", "s.stage_name", "s.n_docs", "s.n_tokens")
    )
    s2 = d0.filter(F.col("passes")).select(key_col, text_col, "__ntok")
    dig_w = Window.partitionBy(F.md5(F.col(text_col)))
    s3 = (
        s2.withColumn("__mn", F.min(key_col).over(dig_w))
        .filter(F.col(key_col) == F.col("__mn"))
        .drop("__mn")
    )
    if survivor_persistence == "local_checkpoint":
        s3 = checkpoints.checkpoint(s3, eager=True)
    elif survivor_persistence == "persist":
        s3 = s3.persist()
        s3.count()  # materialize now; lineage kept for fault recovery
    else:
        raise ValueError(
            "survivor_persistence must be 'local_checkpoint' or "
            f"'persist', got {survivor_persistence!r}"
        )
    pairs = minhash_lsh_pairs(
        s3.select(key_col, text_col),
        key_col=key_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=near_threshold,
    )
    drop = pairs.select(F.col("key_b").alias(key_col)).distinct()
    s4 = s3.join(drop, on=key_col, how="left_anti")

    def _stage(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("__ntok"), F.lit(0)).alias("n_tokens"),
        ).select(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_docs",
            "n_tokens",
        )

    return (
        stage12.unionByName(_stage(s3, 3, "exact_dedup"))
        .unionByName(_stage(s4, 4, "near_dedup"))
        .orderBy("stage")
    )
