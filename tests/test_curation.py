"""Invariant tests for the corpus-curation extensions
(extensions/curation.py) beyond the oracle parity already covered by
test_queries_oracle.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions import curation as xcur


@pytest.fixture(scope="module")
def docs(spark, sf_dir_small):
    return load_table(spark, sf_dir_small, "documents").select("doc_id", "text")


def test_shuffle_order_is_permutation(spark, docs):
    """Ranks must be exactly 1..N with no gaps or dups — exercises the
    partition-offset reassembly across a partition count different
    from the query path's."""
    out = xcur.shuffle_order(docs.repartition(7), key_col="doc_id")
    n = docs.count()
    stats = out.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("rank").alias("dist"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).first()
    assert (stats.cnt, stats.dist, stats.lo, stats.hi) == (n, n, 1, n)


def test_shuffle_order_deterministic(spark, docs):
    a = {r.doc_id: r.rank for r in xcur.shuffle_order(docs).collect()}
    b = {
        r.doc_id: r.rank
        for r in xcur.shuffle_order(docs.repartition(3)).collect()
    }
    assert a == b


def test_shuffle_order_salt_changes_order(spark, docs):
    a = {r.doc_id: r.rank for r in xcur.shuffle_order(docs, salt="s1").collect()}
    b = {r.doc_id: r.rank for r in xcur.shuffle_order(docs, salt="s2").collect()}
    assert a != b


def test_contamination_finds_planted_excerpts(spark, docs):
    """Every planted excerpt must flag its source document with
    containment near 1 (boundary-cut shingles may trim it)."""
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.expr(
            "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
            " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
        ).alias("text"),
    )
    hits = xcur.eval_contamination(docs, evals, n=5, min_containment=0.5)
    self_hits = hits.filter(F.col("doc_id") == F.col("eval_id"))
    # A tiny excerpt (< ~n+2 words) yields only boundary-cut shingles
    # that cannot appear in the source doc — only excerpts long enough
    # to carry clean interior shingles are guaranteed to self-flag.
    eligible = evals.filter(
        F.size(F.split(F.col("text"), r"\s+")) >= 7
    ).count()
    assert self_hits.count() >= eligible
    assert self_hits.agg(F.min("containment")).first()[0] >= 0.5


def test_pack_streams_respects_stream_arithmetic(spark, docs):
    """Within a shard, pack_id must equal floor(cum-preceding/ctx) and
    be non-decreasing in key order."""
    packed = xcur.pack_streams(docs, ctx=256, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        last_pack = -1
        for r in rows:
            assert r.pack_id == cum // 256
            assert r.pack_id >= last_pack
            last_pack = r.pack_id
            cum += r.n_tokens


def test_mixture_weights_rebalance(spark, sf_dir_small):
    """weight * share must be the uniform target for every group."""
    src = load_table(spark, sf_dir_small, "documents")
    out = xcur.mixture_weights(src, by="source").collect()
    target = 1.0 / len(out)
    for r in out:
        assert r.share * r.weight == pytest.approx(target, rel=1e-3)


def test_curation_pipeline_end_to_end(spark, sf_dir_small, tmp_path):
    """The full curation example must run and monotonically shrink the
    corpus through each screen, ending in valid shards."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from run_curation import run

    out = str(tmp_path / "cur")
    s = run(spark, sf_dir_small, out)
    assert (
        s["input_docs"]
        >= s["after_exact_dedup"]
        >= s["after_near_dedup"]
        >= s["after_quality"]
        >= s["after_decontamination"]
        > 0
    )
    assert s["shard_rows"] == s["after_decontamination"]
    assert s["n_packs"] > 0
    # post-dedup the corpus should carry few duplicated passages
    assert 0 <= s["dup_span_docs"] <= s["after_decontamination"]
    # PII stage ran: synthetic corpus carries no PII, so the scrub
    # must be an exact pass-through (counts present and zero)
    assert s["pii_spans_masked"] == 0 and s["pii_docs"] == 0
    # a 2x-token budget forces max(epochs) >= sum(needed)/sum(avail)
    # ~= 2 for ANY mixture — anything materially below 2 means the
    # budget or temperature scaling broke (floor slack only)
    assert s["max_planned_epochs"] >= 1.9
    # the before-picture datacard rides along (one-scan summary row)
    assert s["datacard"]["n_docs"] == s["input_docs"]
    assert 0.0 <= s["datacard"]["gopher_pass_rate"] <= 1.0


def test_mixture_temperature_identities(spark, sf_dir):
    """alpha = 1 keeps the observed mixture (all weights 1);
    alpha = 0 equals the uniform target."""
    from fastmlframework_spark.core.tables import load_table
    from fastmlframework_spark.extensions.curation import mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    keep = {r["source"]: r["weight"]
            for r in mixture_weights(docs, alpha=1.0).collect()}
    assert all(w == 1.0 for w in keep.values()), keep
    uni = {r["source"]: r["weight"]
           for r in mixture_weights(docs, alpha=0.0).collect()}
    legacy = {r["source"]: r["weight"]
              for r in mixture_weights(docs).collect()}
    assert uni == legacy


def test_remove_boilerplate_edge_cases(spark):
    from fastmlframework_spark.extensions.curation import (
        remove_boilerplate_lines,
    )

    rows = [(i, "BOILER\nunique-%d" % i) for i in range(30)]
    rows.append((98, "BOILER"))          # all-boilerplate doc
    rows.append((99, "only unique text"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_doc_freq=20).collect()}
    assert out[0]["clean_text"] == "unique-0"
    assert out[0]["n_removed"] == 1 and out[0]["n_lines"] == 2
    assert out[98]["clean_text"] == "" and out[98]["n_removed"] == 1
    assert out[99]["clean_text"] == "only unique text"
    assert out[99]["n_removed"] == 0


def test_epochs_plan_arithmetic(spark):
    from fastmlframework_spark.extensions.curation import epochs_plan

    # Source a: 2 docs x 10 tokens; source b: 1 doc x 30 tokens.
    rows = [(1, "a", " ".join(["w"] * 10)), (2, "a", " ".join(["w"] * 10)),
            (3, "b", " ".join(["w"] * 30))]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # alpha=0: uniform target — each source must contribute half of 100.
    out = {r["source"]: r for r in epochs_plan(df, 100, alpha=0.0).collect()}
    assert out["a"]["tokens_available"] == 20
    assert out["a"]["tokens_needed"] == 50 and out["b"]["tokens_needed"] == 50
    assert out["a"]["epochs"] == 2.5          # repetition regime
    assert out["b"]["epochs"] == round(50 / 30, 6)
    # alpha=1: proportional target — every source exactly budget/total.
    out1 = {r["source"]: r for r in epochs_plan(df, 100, alpha=1.0).collect()}
    assert out1["a"]["epochs"] == out1["b"]["epochs"] == 2.0


def test_leakage_safe_split_keeps_clusters_together(spark):
    from fastmlframework_spark.extensions.curation import leakage_safe_split

    # 50 clusters of 3 exact copies each + 50 singletons.
    rows = []
    for c in range(50):
        text = " ".join(f"c{c}w{i}" for i in range(20))
        for j in range(3):
            rows.append((c * 10 + j, "s", text))
    for k in range(50):
        rows.append((1000 + k, "s", " ".join(f"u{k}x{i}" for i in range(20))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    import pyspark.sql.functions as F

    d = df.select("doc_id", F.md5("text").alias("g"))
    pairs = (
        d.alias("a")
        .join(d.alias("b"), on="g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("key_a"), F.col("b.doc_id").alias("key_b"))
    )
    out = leakage_safe_split(df, pairs).collect()
    assert len(out) == 200
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    # THE invariant: no cluster straddles splits
    assert all(len(s) == 1 for s in by_cluster.values())
    splits = {r["split"] for r in out}
    assert splits <= {"train", "valid", "test"} and "train" in splits


def test_epochs_plan_zero_token_domain(spark):
    """A domain whose docs are all empty/whitespace has no tokens to
    contribute: it must get target_share/tokens_needed/epochs of 0
    (never a divide-by-zero, never a pow(0,0)=1 phantom share at
    alpha=0) while other domains split the full budget."""
    from fastmlframework_spark.extensions.curation import epochs_plan

    rows = [(1, "a", " ".join(["w"] * 10)), (2, "b", "   "), (3, "b", "")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for alpha in (0.0, 0.5, 1.0):
        out = {r["source"]: r for r in epochs_plan(df, 100, alpha=alpha).collect()}
        assert out["b"]["tokens_available"] == 0
        assert out["b"]["target_share"] == 0.0
        assert out["b"]["tokens_needed"] == 0
        assert out["b"]["epochs"] == 0.0
        assert out["a"]["target_share"] == 1.0
        assert out["a"]["tokens_needed"] == 100


def test_url_domain_stats(spark):
    from fastmlframework_spark.extensions.curation import url_domain_stats

    rows = [
        (1, "see http://www.Site1.example.com/page and https://spam.example.com/x"),
        (2, "nothing"), (3, None),
        (4, "https://site1.example.com/other http://ads.example.net"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["domain"]: r for r in url_domain_stats(df).collect()}
    assert set(out) == {"site1.example.com", "spam.example.com", "ads.example.net"}
    assert out["site1.example.com"]["n_urls"] == 2      # www-stripped + cased
    assert out["site1.example.com"]["n_docs"] == 2
    assert out["spam.example.com"]["blocked"] is True
    assert out["ads.example.net"]["blocked"] is True
    assert out["site1.example.com"]["blocked"] is False


def test_encoding_quality(spark):
    from fastmlframework_spark.extensions.curation import encoding_quality

    rows = [(1, "clean"), (2, "x��"), (3, "a\x01b\tc\nd"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert out[1]["bad_char_frac"] == 0.0
    assert out[2]["n_replacement"] == 2 and out[2]["bad_char_frac"] == round(2 / 3, 6)
    # tab/newline are NOT control damage; \x01 is
    assert out[3]["n_control"] == 1
    assert out[4]["n_chars"] == 0 and out[4]["bad_char_frac"] == 0.0


def test_embedding_contamination_flags_planted_copies(spark):
    """Corpus vectors that ARE eval vectors (cosine 1.0) must be
    flagged with their own match; a far-off vector must not."""
    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.curation import (
        embedding_contamination,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, -1.0, -1.0, -1.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    evals = corpus.filter(F.col("vec_id").isin(1, 2)).select("embedding")
    out = {
        r["vec_id"]: r
        for r in embedding_contamination(
            corpus, evals, n_planes=4
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_eval_matches"] == 1 and out[1]["max_cosine"] == 1.0
    assert out[2]["n_eval_matches"] == 1


def test_embedding_contamination_broadcasts_eval_side(spark):
    """The corpus must never shuffle: the benchmark-sized eval side
    broadcasts into the bucket join (the index-probe shape)."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.curation import (
        embedding_contamination,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    evals = corpus.filter(F.col("vec_id") < 3).select("embedding")
    df = embedding_contamination(corpus, evals, n_planes=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_select_to_token_budget_boundary_and_order(spark):
    """Greedy selection must take docs best-quality-first, include the
    BOUNDARY doc (budget met, never undershot), and the distributed
    cum_/total_ columns must equal a plain window cumsum."""
    from fastmlframework_spark.extensions.curation import (
        global_rank,
        select_to_token_budget,
    )

    rows = [(i, float(100 - i), 10 * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")
    total = sum(r[2] for r in rows)  # 550
    sel = select_to_token_budget(df, budget_frac=0.5)  # budget 275.0
    got = {r.doc_id: r for r in sel.collect()}
    # quality desc == doc_id asc here; cum 10,30,60,100,150,210,280:
    # doc 6 STARTS at 210 < 275 -> included; doc 7 starts at 280 -> out
    assert sorted(got) == [0, 1, 2, 3, 4, 5, 6]
    assert got[6].cum_tokens == 280  # budget met, not undershot
    assert [got[i].rank for i in sorted(got)] == list(range(1, 8))

    ranked = global_rank(
        df, ["doc_id"], ["doc_id"], cum_cols=["n_tokens"]
    ).collect()
    for r in ranked:
        assert r.total_n_tokens == total
        assert r.cum_n_tokens == sum(10 * (i + 1) for i in range(r.rank))


def test_curation_funnel_monotone_and_stage_order(spark, sf_dir_small):
    """Each funnel gate can only shrink the corpus: docs and tokens
    must be non-increasing across stages 1→4, with raw equal to the
    planted corpus size."""
    from fastmlframework_spark.queries.curation import (
        curation_funnel as funnel_q,
    )
    from fastmlframework_spark.queries.dedup import _corpus

    rows = {r.stage: r for r in funnel_q(spark, sf_dir_small).collect()}
    assert [rows[s].stage_name for s in (1, 2, 3, 4)] == [
        "raw", "quality", "exact_dedup", "near_dedup",
    ]
    assert rows[1].n_docs == _corpus(spark, sf_dir_small).count()
    for a, b in ((1, 2), (2, 3), (3, 4)):
        assert rows[a].n_docs >= rows[b].n_docs
        assert rows[a].n_tokens >= rows[b].n_tokens
    # the planted corpus guarantees every gate actually fires
    assert rows[2].n_docs < rows[1].n_docs
    assert rows[3].n_docs < rows[2].n_docs
    assert rows[4].n_docs < rows[3].n_docs


def test_curation_funnel_persist_mode_identical(spark, sf_dir_small):
    """ADVICE r8: the cluster-durable survivor mode (persist +
    materialize, lineage kept so executor loss recomputes) must
    return the exact same funnel as the localCheckpoint default, and
    an unknown mode must raise."""
    import pytest

    from fastmlframework_spark.extensions.curation import curation_funnel
    from fastmlframework_spark.queries.dedup import _corpus

    corpus = _corpus(spark, sf_dir_small)
    default = sorted(map(tuple, curation_funnel(corpus).collect()))
    durable = sorted(
        map(
            tuple,
            curation_funnel(
                corpus, survivor_persistence="persist"
            ).collect(),
        )
    )
    assert default == durable
    with pytest.raises(ValueError, match="survivor_persistence"):
        curation_funnel(corpus, survivor_persistence="bogus")


def test_bloom_screen_flags_planted_sources(spark, docs):
    """Every doc whose excerpt seeds the eval set must flag itself
    with a high hit_ratio (its excerpt's shingles are all in the
    filter), and the non-planted flag rate must stay small (Bloom
    false positives are bounded, and union-membership hits on a
    shared-vocabulary corpus are rare at n=5)."""
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.expr(
            "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
            " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
        ).alias("text")
    )
    bloom = xcur.ngram_bloom_filter(evals, n=5, num_bits=8192, num_hashes=5)
    stats = xcur.bloom_probe_stats(docs, bloom)
    rows = {r.doc_id: r for r in stats.collect()}
    # The excerpt is a CHARACTER substring, so its first/last words are
    # truncated: a short doc's excerpt may contain no complete source
    # 5-gram at all.  The guarantee only binds where the excerpt has
    # interior shingles — long-enough sources.
    planted = [k for k in rows if k % 37 == 0 and rows[k].n_shingles >= 25]
    assert planted, "fixture corpus must contain long planted eval sources"
    for k in planted:
        assert rows[k].hit_ratio >= 0.1, (
            f"planted source {k} under-flagged: {rows[k]}"
        )
    others = [k for k in rows if k % 37 and rows[k].n_hits > 0]
    assert len(others) <= 0.05 * len(rows), (
        f"too many non-planted docs flagged: {len(others)}/{len(rows)}"
    )


def test_bloom_probe_is_map_only(spark, docs):
    """The probe side must add ZERO shuffles: every Exchange in the
    executed plan belongs to the one-row filter build (distinct +
    word groupBy + single-row assemble) under the BroadcastExchange —
    the operator's 100 TB contract."""
    evals = docs.filter(F.col("doc_id") % 37 == 0)
    bloom = xcur.ngram_bloom_filter(evals)
    stats = xcur.bloom_probe_stats(docs, bloom)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bcast = next(
        i for i, l in enumerate(lines) if "BroadcastExchange" in l
    )
    probe_side = lines[:bcast]
    assert not any("Exchange" in l for l in probe_side), (
        "probe side must be shuffle-free:\n" + "\n".join(probe_side)
    )


def test_bloom_probe_expression_evaluated_once(spark, docs):
    """A downstream filter on the probe stats (the screen's
    ``n_hits > 0``, a gate's admit predicate) must NOT re-evaluate
    the per-shingle hash+k-bit-test expression: the explode-struct
    barrier in ``bloom_probe_annotate`` keeps Catalyst from
    substituting it into a Filter/join condition, so the whole
    expensive expression appears exactly ONCE in the optimized plan
    (it used to appear twice — once in the BroadcastNestedLoopJoin
    condition, once in the output Project — doubling the per-row
    probe cost; guide §4.4's duplication trap, JVM-expression
    form)."""
    evals = docs.filter(F.col("doc_id") % 37 == 0)
    bloom = xcur.ngram_bloom_filter(evals)
    screened = xcur.bloom_probe_stats(docs, bloom).filter(
        F.col("n_hits") > 0
    )
    plan = screened._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bcast = next(
        i for i, l in enumerate(lines) if "BroadcastExchange" in l
    )
    probe_side = "\n".join(lines[:bcast])
    assert probe_side.count("forall(") == 1, (
        "probe expression duplicated on the probe side:\n" + probe_side
    )
    # the shingle builder must also appear exactly once (the old
    # pushed-down size(__shs) > 0 filter recomputed it per row)
    assert probe_side.count("array_distinct(") == 1, (
        "shingle expression duplicated on the probe side:\n" + probe_side
    )


def test_bloom_filter_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError, match="num_bits"):
        xcur.ngram_bloom_filter(docs, num_bits=1000)
    with pytest.raises(ValueError, match="num_hashes"):
        xcur.ngram_bloom_filter(docs, num_hashes=0)


def test_bloom_no_false_negatives(spark, docs):
    """Bloom membership is one-sided: probing the EVAL docs
    themselves against their own filter must give hit_ratio == 1.0
    for every doc (every shingle was inserted)."""
    evals = docs.filter(F.col("doc_id") % 37 == 0)
    bloom = xcur.ngram_bloom_filter(evals, n=3, num_bits=4096, num_hashes=4)
    stats = xcur.bloom_probe_stats(evals, bloom)
    bad = stats.filter(F.col("n_hits") != F.col("n_shingles")).collect()
    assert not bad, f"false negatives impossible by construction: {bad}"


def test_bloom_autosize_tracks_eval_size(spark, docs):
    """num_bits=None sizes the table at the k-optimal ~k/ln2 bits per
    distinct eval shingle (rounded to 64-bit, i.e. two-word, multiples),
    so the filter cannot saturate as the eval corpus grows."""
    import math

    small = docs.limit(5)
    bloom = xcur.ngram_bloom_filter(small, n=3, num_bits=None, num_hashes=5)
    row = bloom.first()
    n_sh = (
        xcur._with_word_ngrams(small.select("text"), "text", 3)
        .select(F.explode("__shs").alias("s")).distinct().count()
    )
    expected = max(64, math.ceil(n_sh * 5 / math.log(2) / 64) * 64)
    assert row.num_bits == expected
    assert len(row.bloom_words) == expected // 32
    assert row.num_hashes == 5 and row.ngram_n == 3


def test_bloom_merge_equals_union_build(spark, docs):
    """Sketch mergeability must be EXACT: OR-merging per-shard filters
    equals building one filter over the union corpus, bit-for-bit,
    and probing through either gives identical stats."""
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    kw = dict(n=3, num_bits=4096, num_hashes=4)
    merged = xcur.bloom_merge(
        xcur.ngram_bloom_filter(evens, **kw),
        xcur.ngram_bloom_filter(odds, **kw),
    )
    union = xcur.ngram_bloom_filter(docs, **kw)
    assert merged.first().bloom_words == union.first().bloom_words
    probe = docs.limit(50)
    a = sorted(map(tuple, xcur.bloom_probe_stats(probe, merged).collect()))
    b = sorted(map(tuple, xcur.bloom_probe_stats(probe, union).collect()))
    assert a == b


def test_bloom_merge_rejects_mismatched_params(spark, docs):
    with pytest.raises(ValueError, match="incompatible"):
        xcur.bloom_merge(
            xcur.ngram_bloom_filter(docs, num_bits=4096),
            xcur.ngram_bloom_filter(docs, num_bits=8192),
        )


def test_decontamination_example_end_to_end(spark, sf_dir_small):
    """The staged decontamination example must run and behave like a
    funnel: every exact-confirmed doc was Bloom-flagged (one-sided
    screen error — confirmed ⊆ flagged), every planted source doc is
    found, and the filter stays KB-sized."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from run_decontamination import run

    s = run(spark, sf_dir_small)
    assert s["n_exact_confirmed"] <= s["n_bloom_flagged"]
    assert s["n_bloom_strong"] <= s["n_bloom_flagged"]
    # the planted self-hits survive both stages (containment 1.0 bar
    # boundary-trimmed shingles, same guarantee the registry query pins)
    assert s["n_exact_confirmed"] >= s["n_bloom_strong"] - 2
    assert s["bloom_kb"] < 64
    assert s["n_semantic_flagged"] > 0


def test_pii_scrub_masks_and_counts(spark):
    """Masking replaces every span with the typed token, counts are
    computed on the ORIGINAL text, and PII-free rows pass through
    byte-identical."""
    rows = [
        (1, "reach me at a.b+c@ex-ample.co.uk or x@y.io thanks"),
        (2, "call 555-123-4567 or 800 555 1212 from 10.0.0.1"),
        (3, "no pii here at all"),
        (4, "ip 192.168.001.255 and mail bob@site.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in xcur.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 0, 0)
    assert out[1]["clean_text"] == "reach me at [EMAIL] or [EMAIL] thanks"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 2, 1)
    assert out[2]["clean_text"] == "call [PHONE] or [PHONE] from [IPV4]"
    assert out[3]["clean_text"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["n_email"] == 1 and out[4]["n_ipv4"] == 1
    assert "[EMAIL]" in out[4]["clean_text"] and "[IPV4]" in out[4]["clean_text"]


def test_pii_scrub_is_map_only(spark, docs):
    plan = (
        xcur.pii_scrub(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_pii_scrub_null_text_counts_zero(spark):
    """ADVICE r11: F.size(regexp_extract_all(NULL)) is -1 under legacy
    sizeOfNull — NULL text must scrub to counts 0 and clean_text '',
    not corrupt summed per-source PII stats with -1s."""
    df = spark.createDataFrame(
        [(1, "mail a@b.co"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in xcur.pii_scrub(df).collect()}
    assert rows[2].n_email == 0 and rows[2].n_phone == 0
    assert rows[2].n_ipv4 == 0 and rows[2].clean_text == ""
    assert rows[1].n_email == 1 and "[EMAIL]" in rows[1].clean_text
    # the summed stats a dashboard tails stay exact
    agg = (
        xcur.pii_scrub(df)
        .agg(F.sum("n_email").alias("e"))
        .first()
    )
    assert agg.e == 1


def test_bloom_probe_null_and_empty_text_yield_no_shingles(spark):
    """ADVICE r11: the raw split/slice/concat_ws chain manufactures a
    [''] pseudo-shingle for NULL/empty text, silently defeating the
    documented NULL-admit contract.  After the fix, such rows carry
    n_shingles == 0 and NULL hit_ratio — the decontamination gate's
    coalesce-admit path genuinely triggers."""
    evals = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    bloom = xcur.ngram_bloom_filter(evals, n=2, num_bits=1024, num_hashes=3)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in xcur.bloom_probe_annotate(df, bloom).collect()
    }
    assert rows[1].n_shingles == 0 and rows[1].hit_ratio is None
    assert rows[2].n_shingles == 0 and rows[2].hit_ratio is None
    assert rows[3].n_shingles > 0 and rows[3].hit_ratio == 1.0
