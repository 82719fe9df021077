#!/usr/bin/env python
"""The staged benchmark-decontamination funnel over the documents
table — the cheap→costly gate ordering a production pipeline uses to
keep eval data out of a 100 TB training corpus:

    stage 1  Bloom screen     O(bits) broadcast index, map-only corpus
                              scan, zero shuffles — flags every doc
                              sharing ANY 5-gram with the eval union
                              (one-sided error: can over-flag, never
                              miss)
    stage 2  exact containment broadcast inverted-index join, run ONLY
                              over stage-1 survivors of the flag —
                              per-eval-item |T∩E|/|E| attribution
    stage 3  embedding check  hyperplane-bucketed cosine vs the eval
                              vectors — catches paraphrase-level
                              contamination n-grams cannot see

    python examples/run_decontamination.py
        [--sf-dir /root/testdata/sf0.001] [--min-containment 0.5]

Prints the funnel: corpus size, Bloom-flagged count (and the filter's
size in KB), exact-confirmed count, per-eval attribution sample, and
the embedding-space flag count.  Every stage is the library operator
the oracle-checked registry exposes (`contamination_bloom_screen`,
`contamination_eval_overlap`, `contamination_embedding_eval`), so the
numbers here match the hash-verified queries."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.extensions import curation as xcur  # noqa: E402

EXCERPT = (
    "substring(text, CAST(FLOOR(LENGTH(text) * 0.3) AS INT) + 1,"
    " CAST(FLOOR(LENGTH(text) * 0.4) AS INT))"
)


def run(spark, sf_dir: str, min_containment: float = 0.5) -> dict:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # The planted eval set: mid-document excerpts of every 37th doc
    # (same derivation as the registry queries, so hits are guaranteed).
    evals = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"), F.expr(EXCERPT).alias("text")
    )
    n_evals = evals.count()

    # Stage 1: Bloom screen.  Auto-sized filter (k-optimal load) built
    # from the eval side; the corpus probe shuffles nothing.
    bloom = xcur.ngram_bloom_filter(
        evals.select("text"), n=5, num_bits=None, num_hashes=5
    )
    filt_row = bloom.first()
    stats = xcur.bloom_probe_stats(docs, bloom).cache()
    # Two operating points: ANY hit preserves recall exactly (the
    # stage-2 input — Bloom error is one-sided, so no contaminated doc
    # can be missed); the ratio cut is the precision point a real
    # pipeline would alert on.  The synthetic corpus shares one small
    # vocabulary, so the any-hit rate here is far above a real crawl's.
    flagged = stats.filter(F.col("n_hits") > 0).cache()
    n_flagged = flagged.count()
    n_flagged_strong = stats.filter(F.col("hit_ratio") >= 0.25).count()

    # Stage 2: exact containment, only over the flagged survivors.
    survivors = docs.join(
        F.broadcast(flagged.select("doc_id")), on="doc_id"
    )
    confirmed = xcur.eval_contamination(
        survivors, evals, n=5, min_containment=min_containment
    ).cache()
    n_confirmed = confirmed.count()
    sample = [
        (r.doc_id, r.eval_id, r.containment)
        for r in confirmed.orderBy(
            F.col("containment").desc(), "doc_id", "eval_id"
        ).limit(5).collect()
    ]

    # Stage 3: embedding-space check over the vectors table (planted
    # eval vectors, same shape as the registry query).
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    emb_evals = emb.filter(F.col("vec_id") % 10 == 0).select("embedding")
    n_semantic = xcur.embedding_contamination(emb, emb_evals).count()

    return {
        "n_docs": n_docs,
        "n_evals": n_evals,
        "bloom_kb": round(filt_row.num_bits / 8 / 1024, 2),
        "bloom_bits": filt_row.num_bits,
        "n_bloom_flagged": n_flagged,
        "n_bloom_strong": n_flagged_strong,
        "n_exact_confirmed": n_confirmed,
        "top_hits": sample,
        "n_semantic_flagged": n_semantic,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--min-containment", type=float, default=0.5)
    args = ap.parse_args()
    spark = get_spark(app_name="decontamination-example")
    spark.sparkContext.setLogLevel("ERROR")
    s = run(spark, args.sf_dir, args.min_containment)
    print(f"corpus docs             : {s['n_docs']}")
    print(f"eval items              : {s['n_evals']}")
    print(
        f"bloom filter            : {s['bloom_bits']} bits "
        f"({s['bloom_kb']} KB broadcast)"
    )
    print(
        f"stage 1 bloom-flagged   : {s['n_bloom_flagged']} any-hit "
        f"(recall-exact stage-2 input); "
        f"{s['n_bloom_strong']} at hit_ratio >= 0.25"
    )
    print(f"stage 2 exact-confirmed : {s['n_exact_confirmed']}")
    for d, e, c in s["top_hits"]:
        print(f"    doc {d} contains eval {e} (containment {c})")
    print(f"stage 3 semantic flags  : {s['n_semantic_flagged']}")


if __name__ == "__main__":
    main()
