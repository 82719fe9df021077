"""Corpus-filtering operators for LLM training-data pipelines
(SURVEY.md §7.5 extension layer): rule-based quality gates, n-gram
language-model scoring, importance resampling, and length-bucketed
batch packing.

Published shapes, Spark-first expression:

- ``gopher_rules`` — the rule battery from Gopher (Rae et al. 2021,
  §A.1.1) / refined in Dolma & FineWeb: word-count bounds, mean word
  length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, stopword presence.  One projection over
  the corpus (regexp counters + array HOFs), then a tiny per-source
  aggregate — map-side combined, no join, one scan at any scale.
- ``chargram_nll`` — the CCNet/KenLM perplexity-filter shape (Wenzek
  et al. 2019) with a hashed character-bigram LM standing in for the
  external KenLM binary: bucket counts are a dim-bounded aggregate,
  the model broadcasts back as ONE 1-row map, and scoring is a pure
  map over the corpus.  Two scans total, shuffle bounded by ``dim``.
- ``dsir_weights`` — Data Selection via Importance Resampling (Xie et
  al. 2023): hashed unigram bucket distributions for a target slice
  vs the raw corpus, per-document log importance weight
  Σ_t [ln p_target(b(t)) − ln p_raw(b(t))].  Same broadcast-model
  plan as ``chargram_nll``.
- ``length_bucket_packing`` — dynamic-batching report: documents are
  bucketed to padded sequence lengths, batch counts derive from a
  fixed token budget, and the padding efficiency of each bucket is
  returned.  Pure integer arithmetic → bit-exact across engines.

Everything is JVM-side expressions (no Python UDFs); the hashed-model
operators share the power-of-two ``pmod(xxhash64)`` bucket contract
with ``extensions/text.hashed_linear_score`` so the DuckDB oracle
twins reuse the pure-SQL XXH64 generator (queries/xxh64_sql.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Stopword list for the Gopher "contains at least k stopwords" rule —
# shared with the oracle generator (queries/filtering.py) so the two
# derivations cannot drift.
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "is")

# Rule thresholds (Gopher §A.1.1 defaults, word-count floor kept at
# the paper's 50 — the synthetic corpus straddles it, which is what
# makes the report non-degenerate in tests).
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_types": 2,
}


def _words(text_col: str) -> Column:
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )


def gopher_rule_flags(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher rule flags: appends one boolean ``fail_*``
    column per rule plus ``passes`` (all rules clear).  NULL text
    fails the word-count rule and passes nothing.

    Every signal is a per-row expression — regexp counters for the
    char-class ratios, array HOFs for the word/line fractions — so
    the whole battery is a single map-only projection that
    whole-stage-codegens into the scan."""
    th = GOPHER_THRESHOLDS
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    lines = F.filter(F.split(t, r"\n"), lambda l: l != F.lit(""))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_word_len = (
        F.length(t) - F.regexp_count(t, F.lit(r"\s"))
    ) / F.greatest(n_words, F.lit(1))
    symbol_ratio = (
        F.regexp_count(t, F.lit(r"#"))
        + F.regexp_count(t, F.lit(r"\.\.\.|…"))
    ) / F.greatest(n_words, F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / n_lines
    )
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
    ) / F.greatest(n_words, F.lit(1))
    stop_types = sum(
        F.array_contains(words, s).cast("int") for s in GOPHER_STOPWORDS
    )
    flags = {
        "fail_words": (n_words < th["min_words"])
        | (n_words > th["max_words"]),
        "fail_word_len": (mean_word_len < th["min_mean_word_len"])
        | (mean_word_len > th["max_mean_word_len"]),
        "fail_symbol": symbol_ratio > th["max_symbol_word_ratio"],
        "fail_bullet": bullet_frac > th["max_bullet_line_frac"],
        "fail_ellipsis": ellipsis_frac > th["max_ellipsis_line_frac"],
        "fail_alpha": alpha_frac < th["min_alpha_word_frac"],
        "fail_stopword": stop_types < th["min_stopword_types"],
    }
    out = df.withColumns(flags)
    passes = None
    for name in flags:
        c = ~F.col(name)
        passes = c if passes is None else passes & c
    return out.withColumn("passes", passes)


def gopher_rules(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group Gopher rule report → [by, n_docs, fail_* counts,
    n_pass].  One corpus scan + a tiny map-side-combined aggregate."""
    flagged = gopher_rule_flags(df, text_col)
    fail_cols = [c for c in flagged.columns if c.startswith("fail_")]
    return flagged.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(F.col(c).cast("long")).alias(f"n_{c}") for c in fail_cols],
        F.sum(F.col("passes").cast("long")).alias("n_pass"),
    )


def _bucket_sql(expr: str, dim: int) -> str:
    """Power-of-two xxhash64 bucket of a string expression (Spark SQL
    fragment).  pmod of the signed hash == unsigned-hash remainder for
    power-of-two ``dim`` — the contract the DuckDB twin relies on."""
    if dim <= 0 or dim & (dim - 1):
        raise ValueError("dim must be a power of two")
    return f"pmod(xxhash64({expr}), {dim})"


def chargram_nll(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    fit_modulus: int = 1,
) -> DataFrame:
    """Hashed character-bigram LM negative log-likelihood per document
    → [key, n_bigrams, nll] (nats/bigram, Laplace-smoothed, round 6).

    The CCNet perplexity-filter shape without the external KenLM
    dependency: the "model" is the corpus's own bucketed bigram
    distribution, so high-NLL documents are the ones whose character
    statistics diverge from the corpus (noise, encoding damage,
    non-linguistic content).  Plan: one explode→groupBy bounded by
    ``dim`` buckets (map-side combined), the model broadcasts back as
    a single 1-row map, scoring is a map-only HOF ``aggregate`` —
    left-to-right summation, mirrored exactly by the oracle's
    ``list_reduce``.  Documents shorter than 2 chars (or NULL) drop.

    ``fit_modulus`` > 1 fits the model on the deterministic
    ``key % fit_modulus == 0`` document slice (the CCNet recipe — at
    100 TB the LM trains on a sample, scoring stays corpus-wide);
    a frequency model is stable under uniform subsampling, and the
    modulus form keeps the oracle twin a one-line WHERE clause."""
    bg = f"transform(sequence(1, length({text_col}) - 1), i -> substring({text_col}, i, 2))"
    bucket = _bucket_sql("__g", dim)
    base = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= 2)
    )
    fit_on = (
        base.filter(F.col(key_col) % fit_modulus == 0)
        if fit_modulus > 1
        else base
    )
    counts = (
        fit_on.select(F.explode(F.expr(bg)).alias("__g"))
        .groupBy(F.expr(bucket).alias("__bucket"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # Dense LOG-PROB array, not a count map: Spark's element_at over
    # MapType is a linear scan (a 1024-entry map probed once per
    # bigram per row would dominate), and folding the Laplace ln into
    # the one-time model transform drops ~n_chars ln()/divisions per
    # row from the hot loop — each term is the SAME double either way,
    # so the oracle's per-occurrence computation still matches bit-
    # for-bit.  The map→array transform runs on the 1-row model frame;
    # per-row lookups are O(1) array indexing.
    model = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__bucket", "__c"))
        ).alias("__m"),
        # empty fit slice (no key hits the modulus residue) must give
        # the finite uniform model ln(1/dim), not NULL-poison the array
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__total"),
    ).select(
        F.expr(
            f"transform(sequence(0, {dim - 1}), __i -> "
            "ln((coalesce(element_at(__m, CAST(__i AS BIGINT)), 0L) + 1)"
            f" * 1.0D / (__total + {dim})))"
        ).alias("__arr")
    )
    total = (
        f"aggregate({bg}, 0.0D, (__a, __g) -> "
        f"__a + element_at(__arr, CAST({bucket} AS INT) + 1))"
    )
    # windows are stride-1, so n_bigrams == length - 1 exactly (the
    # filter guarantees length >= 2) — no second array materialization
    n_bg = (F.length(text_col) - 1).cast("long")
    return (
        base.crossJoin(F.broadcast(model))
        .select(
            F.col(key_col),
            n_bg.alias("n_bigrams"),
            F.round(-F.expr(total) / n_bg, 6).alias("nll"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    key_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> DataFrame:
    """DSIR per-document log importance weight → [key, n_tokens,
    log_weight] (round 6): Σ over whitespace tokens of
    ln p_target(bucket(t)) − ln p_raw(bucket(t)), hashed-unigram
    bucket distributions with Laplace smoothing.

    ``target`` is a boolean Column over ``df`` selecting the slice
    whose distribution documents should be reweighted toward (DSIR
    resamples with probability ∝ exp(log_weight)).  Both bucket
    distributions come from ONE pass each over a dim-bounded
    aggregate; the two tiny models broadcast back as a single 1-row
    frame and scoring is a map-only HOF — no shuffle touches the
    corpus itself."""
    bucket = _bucket_sql("__w", dim)
    base = df.filter(F.col(text_col).isNotNull()).withColumn(
        "__is_target", target.cast("boolean")
    )
    toks = base.select(
        "__is_target",
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"\s+"),
                lambda w: w != F.lit(""),
            )
        ).alias("__w"),
    )
    counts = toks.groupBy(F.expr(bucket).alias("__bucket")).agg(
        F.sum(F.col("__is_target").cast("long")).alias("__ct"),
        F.count(F.lit(1)).alias("__cr"),
    )
    # Dense arrays for O(1) per-token lookups (see chargram_nll).
    model = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__bucket", "__ct"))
        ).alias("__mt"),
        F.map_from_entries(
            F.collect_list(F.struct("__bucket", "__cr"))
        ).alias("__mr"),
        F.sum("__ct").alias("__tt"),
        F.sum("__cr").alias("__tr"),
    ).select(
        F.expr(
            f"transform(sequence(0, {dim - 1}), __i -> "
            "coalesce(element_at(__mt, CAST(__i AS BIGINT)), 0L))"
        ).alias("__at"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), __i -> "
            "coalesce(element_at(__mr, CAST(__i AS BIGINT)), 0L))"
        ).alias("__ar"),
        "__tt",
        "__tr",
    )
    words = f"filter(split({text_col}, '\\\\s+'), __x -> __x != '')"
    term = (
        f"ln((element_at(__at, CAST({bucket} AS INT) + 1) + 1) * 1.0D"
        f" / (__tt + {dim}))"
        f" - ln((element_at(__ar, CAST({bucket} AS INT) + 1) + 1) * 1.0D"
        f" / (__tr + {dim}))"
    )
    total = f"aggregate({words}, 0.0D, (__a, __w) -> __a + {term})"
    return base.crossJoin(F.broadcast(model)).select(
        F.col(key_col),
        F.expr(f"size({words})").cast("long").alias("n_tokens"),
        F.round(F.expr(total), 6).alias("log_weight"),
    )


# Padded sequence-length buckets for dynamic batching (ascending).
LENGTH_BUCKETS = (16, 32, 64, 128)


def length_bucket_packing(
    df: DataFrame,
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """Length-bucketed batching report → [bucket, n_docs, sum_tokens,
    capacity, n_batches, pad_ratio]: documents are padded up to the
    smallest bucket ≥ their whitespace-token count (overflow TRUNCATES
    to the largest — a doc can't occupy more than its sequence slot),
    a batch holds ``budget // bucket`` sequences, and ``pad_ratio`` is
    occupied slot-tokens over allocated slots — the padding efficiency
    dynamic batching buys over one global max-length pad.  Truncation
    is what makes pad_ratio ≤ 1 an invariant (hypothesis-pinned).

    Integer arithmetic end-to-end (ceil-div as (n+c-1)//c), so the
    oracle comparison is exact; the only aggregate is per-bucket
    (≤ len(LENGTH_BUCKETS) groups).

    ``budget`` must fit at least one largest-bucket sequence —
    otherwise capacity floors to 0 and n_batches divides by zero."""
    if budget < LENGTH_BUCKETS[-1]:
        raise ValueError(
            f"budget={budget} cannot hold one {LENGTH_BUCKETS[-1]}-token "
            f"sequence (the largest length bucket); use budget >= "
            f"{LENGTH_BUCKETS[-1]}"
        )
    n = F.size(_words(text_col))
    bucket: Column = F.lit(LENGTH_BUCKETS[-1])
    for b in reversed(LENGTH_BUCKETS[:-1]):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    per_bucket = (
        df.filter(F.col(text_col).isNotNull())
        .select(bucket.alias("bucket"), n.alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.least("__n", F.col("bucket"))).alias("sum_tokens"),
        )
    )
    capacity = F.lit(budget) / F.col("bucket")
    cap = F.floor(capacity).cast("long")
    n_batches = F.floor(
        (F.col("n_docs") + cap - 1) / cap
    ).cast("long")
    return per_bucket.select(
        F.col("bucket").cast("long"),
        F.col("n_docs"),
        F.col("sum_tokens").cast("long"),
        cap.alias("capacity"),
        n_batches.alias("n_batches"),
        F.round(
            F.col("sum_tokens")
            * 1.0
            / (n_batches * cap * F.col("bucket")),
            6,
        ).alias("pad_ratio"),
    )


def nll_terciles(
    scored: DataFrame,
    by: str = "lang",
    val_col: str = "nll",
) -> DataFrame:
    """CCNet head/middle/tail split → [by, bucket, n_docs, mean_nll]:
    per-group exact terciles of the LM score divide documents into
    quality buckets (head = most corpus-like third), the shape CCNet
    publishes per language and mixture planners consume.

    The tercile thresholds are one tiny per-group aggregate
    (interpolating ``percentile`` ≡ DuckDB ``quantile_cont``)
    broadcast back over the scored frame; bucketing is a map-only
    comparison cascade — no global sort, no ntile window."""
    one_third = 1 / 3
    two_thirds = 2 / 3
    th = scored.groupBy(by).agg(
        F.percentile(val_col, F.lit(one_third)).alias("__t1"),
        F.percentile(val_col, F.lit(two_thirds)).alias("__t2"),
    )
    bucket = (
        F.when(F.col(val_col) <= F.col("__t1"), F.lit("head"))
        .when(F.col(val_col) <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(th), on=by)
        .withColumn("bucket", bucket)
        .groupBy(by, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(val_col), 6).alias("mean_nll"),
        )
    )


def repetition_signals(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Within-document repetition signals (Gopher §A.1.1's other
    half, the repetition battery Dolma/RefinedWeb/FineWeb reuse) →
    [key, n_lines, dup_line_frac, dup_line_char_frac,
    top_{top_n}gram_char_frac, dup_{dup_n}gram_char_frac]:

    - ``dup_line_frac``        — repeated-occurrence lines / lines,
    - ``dup_line_char_frac``   — characters in repeated line
      occurrences / line characters,
    - ``top_ngram_char_frac``  — characters covered by the most
      frequent word ``top_n``-gram: count × gram length over the
      whitespace-normalized doc length (the occurrence-weighted
      definition Dolma's implementation ships; can exceed 1 on
      pathological self-overlapping docs, as it does there),
    - ``dup_ngram_word_frac``  — fraction of WORD POSITIONS covered
      by ``dup_n``-grams occurring ≥ 2× in the doc, computed by the
      same merged-span masking ``duplicate_spans`` uses, so each
      position counts once and the fraction is ≤ 1.  (Gopher masks
      characters; word-position masking is the same signal at word
      granularity — exact spaces-and-letters accounting would need
      per-character bookkeeping for no analytic gain.)

    Empty/NULL docs report zeros.  Plan: two explodes (lines, grams)
    into (key, token) counts — map-side combined, linear like
    ``duplicate_spans`` — per-document windows over each doc's own
    grams (bounded by doc length) for the top-gram pick (count desc,
    length desc, gram asc — deterministic in both engines) and the
    span merge, then per-key aggregates.  No pair joins, nothing
    corpus-quadratic."""
    from pyspark.sql import Window

    t = F.coalesce(F.col(text_col), F.lit(""))
    # spread first: a handful of parquet splits would otherwise run
    # the CPU-bound explodes on as many cores (dedup._spread rationale
    # — a no-op knob once inputs arrive with thousands of splits)
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(F.col(key_col), t.alias("__t")).repartition(par)

    # --- line family ---------------------------------------------
    lines = base.select(
        key_col, F.explode(F.split(F.col("__t"), r"\n")).alias("__l")
    ).filter(F.trim(F.col("__l")) != F.lit(""))
    per_line = lines.groupBy(key_col, "__l").agg(
        F.count(F.lit(1)).alias("__c")
    )
    line_stats = per_line.groupBy(key_col).agg(
        F.sum("__c").alias("n_lines"),
        F.sum(F.col("__c") - 1).alias("__dl"),
        F.sum(F.col("__c") * F.length("__l")).alias("__lc"),
        F.sum((F.col("__c") - 1) * F.length("__l")).alias("__dlc"),
    )

    # --- word n-gram families ------------------------------------
    # split ONCE into a projected array column: inlining the filter/
    # split expression into every transform lambda re-evaluates it per
    # gram (O(len²) per doc — measured 2× the whole operator's cost)
    wbase = base.select(
        key_col,
        F.expr(r"filter(split(__t, '\\s+'), __x -> __x != '')").alias("__ws"),
    ).select(
        key_col,
        "__ws",
        F.expr("length(concat_ws(' ', __ws))").alias("__tc"),
        F.size("__ws").alias("__nw"),
    )

    def gram_windows(n: int):
        # guard: sequence(1, 0) is DESCENDING in Spark, so a doc with
        # < n words must take the empty-array branch explicitly
        grams = F.expr(
            f"CASE WHEN __nw >= {n} THEN "
            f"transform(sequence(1, __nw - {n - 1}),"
            f" i -> struct(i AS pos, concat_ws(' ', slice(__ws, i, {n})) AS g))"
            f" ELSE array() END"
        )
        return wbase.select(
            key_col, "__tc", "__nw", F.explode(grams).alias("__w")
        ).select(
            key_col, "__tc", "__nw",
            F.col("__w.pos").alias("__pos"),
            F.col("__w.g").alias("__g"),
        )

    top_w = Window.partitionBy(key_col).orderBy(
        F.desc("__c"), F.desc(F.length("__g")), F.asc("__g")
    )
    top_stats = (
        gram_windows(top_n)
        .groupBy(key_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"), F.first("__tc").alias("__tc"))
        .withColumn("__r", F.row_number().over(top_w))
        .filter(F.col("__r") == 1)
        .select(
            key_col,
            (
                F.col("__c") * F.length("__g")
                / F.greatest(F.col("__tc"), F.lit(1))
            ).alias("__topf"),
        )
    )

    # masked coverage: keep positions of >=2x grams, merge overlapping
    # length-n windows (gap <= n) into maximal spans, sum span word
    # coverage — each word position counts once (duplicate_spans shape)
    # digest-only gram stream for the dup stage: the count window
    # partitions on (key, digest), so the gram never needs to exist as
    # a string here — hash each word once, then hash each window as a
    # chain over its dup_n word-hash longs (same no-string contract as
    # dedup._span_windows: n array probes + an n·8-byte hash per
    # window, and the exchange carries an 8-byte long instead of the
    # ~(5·word) gram string; within-doc 64-bit collisions are
    # ~doc_len²/2⁶⁴ — never material).  element_at stays in bounds:
    # the CASE guard emits windows only when __nw >= dup_n.
    hargs = ", ".join(
        f"element_at(__wh, i + {k})" for k in range(dup_n)
    )
    dgrams = F.expr(
        f"CASE WHEN __nw >= {dup_n} THEN "
        f"transform(sequence(1, __nw - {dup_n - 1}),"
        f" i -> struct(i AS pos, xxhash64({hargs}) AS dg))"
        f" ELSE array() END"
    )
    dw = (
        wbase.select(
            key_col,
            "__nw",
            F.expr("transform(__ws, __w -> xxhash64(__w))").alias("__wh"),
        )
        .select(key_col, "__nw", F.explode(dgrams).alias("__w"))
        .select(
            key_col, "__nw",
            F.col("__w.pos").alias("__pos"),
            F.col("__w.dg").alias("__dg"),
        )
    )
    cnt_w = Window.partitionBy(key_col, "__dg")
    dup_pos = (
        dw.withColumn("__c", F.count(F.lit(1)).over(cnt_w))
        .filter(F.col("__c") >= 2)
        .select(key_col, "__nw", "__pos")
    )
    ord_w = Window.partitionBy(key_col).orderBy("__pos")
    spans = (
        dup_pos.withColumn("__prev", F.lag("__pos").over(ord_w))
        .withColumn(
            "__brk",
            (
                F.col("__prev").isNull()
                | (F.col("__pos") - F.col("__prev") > dup_n)
            ).cast("long"),
        )
        .withColumn(
            "__span",
            F.sum("__brk").over(
                ord_w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(key_col, "__nw", "__span")
        .agg(F.min("__pos").alias("__lo"), F.max("__pos").alias("__hi"))
    )
    dup_stats = spans.groupBy(key_col).agg(
        (
            F.sum(F.col("__hi") - F.col("__lo") + dup_n)
            / F.greatest(F.first("__nw"), F.lit(1))
        ).alias("__dupf")
    )

    keys = base.select(key_col)
    return (
        keys.join(line_stats, key_col, "left")
        .join(top_stats, key_col, "left")
        .join(dup_stats, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(
                F.coalesce(
                    F.col("__dl") / F.greatest(F.col("n_lines"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(
                    F.col("__dlc") / F.greatest(F.col("__lc"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_char_frac"),
            F.round(F.coalesce("__topf", F.lit(0.0)), 6).alias(
                f"top_{top_n}gram_char_frac"
            ),
            F.round(F.coalesce("__dupf", F.lit(0.0)), 6).alias(
                f"dup_{dup_n}gram_word_frac"
            ),
        )
    )


# C4 cleaning heuristics (Raffel et al. 2020, §2.2 "Colossal Clean
# Crawled Corpus"): page-level drop rules plus the line-level
# retention filter.  Public-paper rule set; phrase lists below are the
# paper's examples.
C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
)


def c4_page_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-page C4 drop-rule flags → ``fail_*`` booleans + ``passes``:
    curly braces (code), "lorem ipsum" placeholder text, policy
    boilerplate phrases, and fewer than 3 sentence terminators.  One
    map-only projection, same battery shape as ``gopher_rule_flags``."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    tl = F.lower(t)
    policy = None
    for p in C4_POLICY_PHRASES:
        c = tl.contains(p)
        policy = c if policy is None else policy | c
    flags = {
        "fail_curly": t.contains("{"),
        "fail_lorem": tl.contains("lorem ipsum"),
        "fail_policy": policy,
        "fail_sentences": F.regexp_count(t, F.lit(r"[.!?]")) < 3,
    }
    out = df.withColumns(flags)
    passes = None
    for name in flags:
        c = ~F.col(name)
        passes = c if passes is None else passes & c
    return out.withColumn("passes", passes)


def c4_rules(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group C4 page-rule report → [by, n_docs, n_fail_*, n_pass].
    One corpus scan + a tiny map-side-combined aggregate."""
    flagged = c4_page_flags(df, text_col)
    fail_cols = [c for c in flagged.columns if c.startswith("fail_")]
    return flagged.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(F.col(c).cast("long")).alias(f"n_{c}") for c in fail_cols],
        F.sum(F.col("passes").cast("long")).alias("n_pass"),
    )


def c4_line_keep(line: Column) -> Column:
    """C4's line-retention predicate: the (trimmed) line ends in
    terminal punctuation, has at least 5 words, and mentions neither
    "javascript" nor a policy phrase.  Expressed so the SQL twin can
    mirror it term-for-term."""
    lt = F.trim(line)
    ll = F.lower(line)
    words = F.filter(F.split(lt, r"\s+"), lambda w: w != F.lit(""))
    keep = (
        lt.rlike(r'[.!?"]$')
        & (F.size(words) >= 5)
        & ~ll.contains("javascript")
    )
    for p in C4_POLICY_PHRASES:
        keep = keep & ~ll.contains(p)
    return keep


def c4_line_stats(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Line-level C4 filtering summary per document → [key, *keep,
    n_lines, n_kept, intact]: how much of each page survives the line
    filter (the paper REWRITES pages to their kept lines; the stats
    form keeps the query corpus-sized while ``c4_clean_text`` does
    the rewrite).  All array higher-order functions — map-only;
    ``keep_cols`` ride along so grouping columns need no re-join."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != F.lit(""))
    kept = F.filter(lines, c4_line_keep)
    return df.select(
        F.col(key_col),
        *(keep_cols or []),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    ).withColumn("intact", F.col("n_kept") == F.col("n_lines"))


def c4_clean_text(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """The C4 page rewrite: pages keep only the lines passing
    ``c4_line_keep``, joined back with newlines.  Map-only."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != F.lit(""))
    return df.withColumn(
        out_col, F.array_join(F.filter(lines, c4_line_keep), "\n")
    )


def word_bigram_nll(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    dim_uni: int = 256,
    dim_bi: int = 2048,
    lam: float = 0.75,
    fit_modulus: int = 1,
) -> DataFrame:
    """Interpolated hashed word-bigram LM negative log-likelihood per
    document → [key, n_bigrams, nll] (nats/bigram).  One rung up the
    CCNet perplexity-filter ladder from :func:`chargram_nll`: the
    score of each adjacent word pair (w1, w2) is

        ln( λ·(c(w1w2)+1)/(c(w1)+dim_bi)          -- conditional
          + (1−λ)·(c(w2)+1)/(N+dim_uni) )         -- unigram backoff

    — Jelinek-Mercer interpolation with Laplace floors, over hashed
    vocabulary buckets (unigrams mod ``dim_uni``, pairs mod
    ``dim_bi``; both must be powers of two for the pmod/unsigned-mod
    oracle contract).  High-NLL docs are the boilerplate/spam/
    word-salad tail whose word ORDER diverges from the corpus even
    when character statistics look fine.

    Plan: two dim-bounded explode→groupBy count aggregates on the
    ``key % fit_modulus == 0`` fit slice (train-on-a-sample, the
    CCNet recipe), broadcast back as ONE 1-row two-array model frame;
    scoring is a map-only HOF ``aggregate`` over the word array —
    left-to-right summation mirrored exactly by the oracle's
    ``list_reduce``.  Docs with fewer than two words drop.  All three
    per-pair hashes are JVM codegen ``xxhash64`` calls; the pair key
    is w1‖US‖w2 (chr(31)) so one string hash covers the bigram."""
    for d in (dim_uni, dim_bi):
        if d <= 0 or d & (d - 1):
            raise ValueError("dims must be powers of two")
    words = f"filter(split({text_col}, '\\\\s+'), __x -> __x != '')"
    base = (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__ws", F.expr(words))
        .filter(F.size("__ws") >= 2)
    )
    fit_on = (
        base.filter(F.col(key_col) % fit_modulus == 0)
        if fit_modulus > 1
        else base
    )
    u_counts = (
        fit_on.select(F.explode("__ws").alias("__w"))
        .groupBy(F.expr(f"pmod(xxhash64(__w), {dim_uni})").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pair_arr = (
        "transform(sequence(1, size(__ws) - 1), __i -> "
        "concat(element_at(__ws, __i), chr(31), element_at(__ws, __i + 1)))"
    )
    b_counts = (
        fit_on.select(F.explode(F.expr(pair_arr)).alias("__p"))
        .groupBy(F.expr(f"pmod(xxhash64(__p), {dim_bi})").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )

    def _dense(counts: DataFrame, dim: int, arr: str, with_total: bool):
        aggs = [
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m")
        ]
        if with_total:
            aggs.append(
                F.coalesce(F.sum("__c"), F.lit(0)).alias("__n")
            )
        out = counts.agg(*aggs).select(
            F.expr(
                f"transform(sequence(0, {dim - 1}), __i -> "
                "coalesce(element_at(__m, CAST(__i AS BIGINT)), 0L))"
            ).alias(arr),
            *(["__n"] if with_total else []),
        )
        return out

    model = _dense(u_counts, dim_uni, "__cu", True).crossJoin(
        _dense(b_counts, dim_bi, "__cb", False)
    )
    u_at = (
        f"element_at(__cu, CAST(pmod(xxhash64(element_at(__ws, {{i}})), "
        f"{dim_uni}) AS INT) + 1)"
    )
    b_at = (
        "element_at(__cb, CAST(pmod(xxhash64(concat("
        "element_at(__ws, __i), chr(31), element_at(__ws, __i + 1)"
        f")), {dim_bi}) AS INT) + 1)"
    )
    lam_s, one_m = repr(float(lam)), repr(1.0 - float(lam))
    term = (
        f"ln({lam_s}D * ({b_at} + 1) / ({u_at.format(i='__i')} + {dim_bi})"
        f" + {one_m}D * ({u_at.format(i='__i + 1')} + 1)"
        f" / (__n + {dim_uni}))"
    )
    total = (
        f"aggregate(sequence(1, size(__ws) - 1), 0.0D, "
        f"(__a, __i) -> __a + {term})"
    )
    n_bg = (F.size("__ws") - 1).cast("long")
    return base.crossJoin(F.broadcast(model)).select(
        F.col(key_col),
        n_bg.alias("n_bigrams"),
        F.round(-F.expr(total) / n_bg, 6).alias("nll"),
    )
