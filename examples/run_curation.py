#!/usr/bin/env python
"""End-to-end corpus-curation pipeline over the documents table —
the §7.5 extension layer as one runnable flow:

    canonicalize → exact dedup → near-dup (MinHash+LSH) → components
      → line-level boilerplate removal → Gopher rule battery
      → quality/repetition filter → chargram-LM tail cut
      → contamination screen → duplicate-passage audit
      → PII redaction (mask + per-kind counts)
      → mixture reweighting + token-budget epochs plan
      → sequence packing → training shards

    python examples/run_curation.py [--sf-dir /root/testdata/sf0.001]
                                    [--out /tmp/curation_out]

Writes per-stage parquet artifacts plus a summary JSON; every stage is
the library operator the query registry exposes, so the numbers here
match the oracle-checked queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.extensions import curation as xcur  # noqa: E402
from fastmlframework_spark.extensions import dedup as xdedup  # noqa: E402
from fastmlframework_spark.extensions import filtering as xfilt  # noqa: E402
from fastmlframework_spark.extensions.text import canonicalize, quality_score  # noqa: E402
from fastmlframework_spark.sources.shards import write_training_shards  # noqa: E402


def run(spark, sf_dir: str, out: str) -> dict:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n0 = docs.count()

    # 0. corpus datacard — the before-picture a dataset card leads
    # with (size, spread, dup rate, quality pass rate in one scan).
    from fastmlframework_spark.queries.filtering import corpus_datacard

    card = corpus_datacard(spark, sf_dir).first().asDict()

    # 1. canonicalize, then EXACT dedup on the canonical digest.
    canon = canonicalize(docs).withColumn("__digest", F.md5("canon"))
    survivors = (
        canon.groupBy("__digest").agg(F.min("doc_id").alias("doc_id"))
    )
    # Persist between stages: every later screen AND its count would
    # otherwise re-derive the whole upstream lineage (dedup joins,
    # components) from the scan — the standard checkpointing discipline
    # of multi-stage pipelines.
    stage1 = (
        canon.join(survivors.select("doc_id"), on="doc_id", how="left_semi")
        .drop("__digest", "canon")
        .cache()
    )
    n1 = stage1.count()

    # 2. near-dup pairs (MinHash+LSH) → components → keep min id.
    pairs = xdedup.minhash_lsh_pairs(
        stage1, num_hashes=8, bands=4, verify_threshold=0.8
    ).select("key_a", "key_b")
    if pairs.limit(1).count():
        comp = xdedup.connected_components(pairs)
        dropped = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        # localCheckpoint, not cache: the components step carries an
        # ITERATIVE lineage (one join+agg layer per round); downstream
        # plans embedding it grow enough to blow up plan construction.
        # Checkpointing truncates the logical plan to the materialized
        # result.
        stage2 = (
            stage1.join(dropped, on="doc_id", how="left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        stage2 = stage1
    n2 = stage2.count()

    # 2b. line-level boilerplate removal (shared chrome across many
    # docs goes; the synthetic corpus is single-line so this is a
    # pass-through here, but the stage is the real CCNet/Dolma step
    # and the planted-positive oracle is text_remove_boilerplate).
    cleaned = xcur.remove_boilerplate_lines(stage2, min_doc_freq=20)
    stage2 = (
        stage2.drop("text")
        .join(
            cleaned.select("doc_id", F.col("clean_text").alias("text")),
            on="doc_id",
        )
        .filter(F.length("text") > 0)
    )

    # 3. quality screens: the Gopher rule battery, repetition and
    # heuristic quality scores, and the chargram-LM tail cut (drop the
    # 1% of documents whose character statistics diverge most from the
    # corpus — the perplexity-filter step).
    flags = xfilt.gopher_rule_flags(stage2).select("doc_id", "passes")
    rep = xcur.repetition_stats(stage2).select("doc_id", "distinct_ratio")
    q = quality_score(stage2).select("doc_id", "quality")
    # encoding damage + within-doc repetition (Gopher's other half)
    enc = xcur.encoding_quality(stage2).select("doc_id", "bad_char_frac")
    rsig = xfilt.repetition_signals(stage2).select(
        "doc_id", "dup_line_frac", "dup_5gram_word_frac"
    )
    # cache: the chargram plan (corpus bigram explode + model build +
    # scoring) feeds BOTH the percentile action and the stage-3 join —
    # uncached it would execute twice.
    nll = xfilt.chargram_nll(stage2).select("doc_id", "nll").cache()
    nll_cut = nll.agg(
        F.expr("percentile_approx(nll, 0.99)").alias("p99")
    ).first()["p99"]
    if nll_cut is None:  # degenerate corpus: nothing survived to score
        nll_cut = float("inf")
    stage3 = (
        stage2.join(flags, on="doc_id")
        .join(rep, on="doc_id")
        .join(q, on="doc_id")
        .join(enc, on="doc_id")
        .join(rsig, on="doc_id")
        # left join: the scorer drops sub-2-char docs (no bigrams) —
        # they must fall through to the rule screens, not vanish here
        .join(nll, on="doc_id", how="left")
        .filter(
            F.col("passes")
            & (F.col("distinct_ratio") >= 0.3)
            & (F.col("quality") >= 0.2)
            & (F.col("bad_char_frac") <= 0.01)
            & (F.col("dup_line_frac") <= 0.3)
            & (F.col("dup_5gram_word_frac") <= 0.5)
            & (
                F.col("nll").isNull()
                | (F.col("nll") <= F.lit(float(nll_cut)))
            )
        )
        .drop(
            "passes", "distinct_ratio", "quality", "nll",
            "bad_char_frac", "dup_line_frac", "dup_5gram_word_frac",
        )
        .cache()
    )
    n3 = stage3.count()
    nll.unpersist()

    # 4. contamination screen against the planted eval excerpts.
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.expr(
            "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
            " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
        ).alias("text"),
    )
    contaminated = xcur.eval_contamination(
        stage3, evals, n=5, min_containment=0.5
    ).select("doc_id").distinct()
    stage4 = stage3.join(contaminated, on="doc_id", how="left_anti").cache()
    n4 = stage4.count()

    # 4b. duplicate-passage audit (report-only: exact/near dedup
    # already ran, so what remains is PARTIAL passage overlap — the
    # substring-dedup signal a doc-level pass can't remove).
    n_span_docs = xdedup.duplicate_spans(stage4).count()

    # 4c. PII redaction — the ship-side scrub every public-corpus
    # pipeline runs before sharding (C4/Dolma): mask emails/phones/
    # IPv4s in place and carry the per-kind counts into the summary
    # (a source whose PII density jumps is a crawl-config bug).
    scrubbed = xcur.pii_scrub(stage4).cache()
    pii = scrubbed.agg(
        F.sum("n_email").alias("e"),
        F.sum("n_phone").alias("p"),
        F.sum("n_ipv4").alias("i"),
        F.sum(
            (
                (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
            ).cast("long")
        ).alias("docs"),
    ).first()
    stage4 = scrubbed.drop("text", "n_email", "n_phone", "n_ipv4").select(
        F.col("clean_text").alias("text"),
        *[c for c in stage4.columns if c != "text"],
    )

    # 5. mixture weights + the token-budget epochs plan (2x the
    # surviving token mass under a temperature-0.5 target — epochs > 2
    # flags domains the plan would over-repeat).
    weights = xcur.mixture_weights(stage4, by="source")
    # same empty-filtered tokenizer epochs_plan uses, so the 2x budget
    # is measured in the plan's own token units
    toks = F.size(
        F.filter(F.split("text", r"\s+"), lambda w: w != F.lit(""))
    )
    total_tokens = stage4.select(F.sum(toks).alias("t")).first()["t"] or 0
    plan = xcur.epochs_plan(stage4, int(2 * total_tokens), alpha=0.5)
    max_epochs = plan.agg(F.max("epochs").alias("m")).first()["m"] or 0.0

    # 6. pack into context windows, then materialize training shards.
    packed = xcur.pack_streams(stage4, ctx=512, shards=8)
    n_packs = packed.select("shard", "pack_id").distinct().count()
    manifest = write_training_shards(
        stage4.select("doc_id", "text"),
        os.path.join(out, "shards"),
        n_shards=4,
    )

    weights.write.mode("overwrite").parquet(os.path.join(out, "weights"))
    plan.write.mode("overwrite").parquet(os.path.join(out, "epochs_plan"))
    packed.write.mode("overwrite").parquet(os.path.join(out, "packs"))
    summary = {
        "datacard": {k: (float(v) if hasattr(v, "real") else v)
                     for k, v in card.items()},
        "input_docs": n0,
        "after_exact_dedup": n1,
        "after_near_dedup": n2,
        "after_quality": n3,
        "after_decontamination": n4,
        "n_packs": n_packs,
        "dup_span_docs": n_span_docs,
        "pii_spans_masked": int((pii.e or 0) + (pii.p or 0) + (pii.i or 0)),
        "pii_docs": int(pii.docs or 0),
        "max_planned_epochs": float(max_epochs),
        "shards": manifest["n_shards"],
        "shard_rows": manifest["total_rows"],
    }
    with open(os.path.join(out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/curation_out")
    args = ap.parse_args()
    spark = get_spark(app_name="curation-example", master="local[8]",
                      shuffle_partitions=8)
    summary = run(spark, args.sf_dir, args.out)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
