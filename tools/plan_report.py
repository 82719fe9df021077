#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plan (tree section) of
headline queries, as reviewable evidence that the 100 TB contract
holds — pushed filters, broadcast dimensions, single fact shuffles,
range-partitioned sorts, no cartesian products.

    python tools/plan_report.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.queries.registry import all_queries  # noqa: E402

# Query -> the plan property a reviewer should look for.
HEADLINERS = {
    "q1_pricing_summary": "predicate pushdown + column pruning + partial agg",
    "q5_region_revenue": "star joins: every dimension broadcast",
    "q18_large_orders": "HAVING set as broadcast left-semi (one lineitem shuffle)",
    "q21_waiting_suppliers": "de-correlated EXISTS pair: single fact scan + window",
    "dedup_minhash_lsh": "banded signature join on (band, digest) — sub-quadratic",
    "contamination_eval_overlap": "broadcast inverted eval index; corpus scan-only",
    "shuffle_training_order": "distributed sort: RangePartitioning, no single-partition window",
    "events_gapfill_hourly": "per-key span grid + running ignoreNulls window",
    "asof_latest_order": "union + last-non-null window (one shuffle as-of join)",
    "weighted_median_price": "weighted quantile as range-frame cumsum (no UDAF)",
    "pii_redaction_stats": "map-only chained regexp redaction: one scan, one agg exchange",
    "text_bm25_scores": "broadcast 1-row corpus stats; per-row tf, no explode",
    "bin_totalprice_deciles": "percentile edges broadcast + comparison cascade (no ntile sort)",
    "stat_ks_quantity_drift": "quantized-grid ECDF: bounded ordered window after map-side combine",
    "text_chargram_nll": "dim-bounded count agg + broadcast dense-array model + map-only HOF scoring",
    "dedup_duplicate_spans": "linear window-digest groupBy + dup-digest join-back; no pair join",
    "quality_gopher_rules": "whole rule battery as one map-only projection into a tiny agg",
    "metric_roc_auc": "AUC rank as value-bucketed distributed prefix sum (window behind hashpartitioning(__bkt), never SinglePartition over scores)",
    "text_vocab_coverage": "top-max(sizes) tokens via TakeOrderedAndProject; no full-vocabulary rank",
    "ann_topk_pq": "driver-fitted literal codebooks, broadcast ADC LUTs over the codes scan, keyed exact-refine join",
    "contamination_embedding_eval": "corpus bucketed map-only; benchmark-sized eval side broadcast into the bucket join",
    "canonical_digests": "map-only normalize+digest; no trailing global sort on the row-level output",
    "curation_funnel": "stages 1-2 as ONE conditional aggregate (single corpus pass); stage-3/4 branches read the localCheckpoint-ed survivor set (ExistingRDD), not the corpus",
    "cv_oof_frozen": "the full CV loop's plan: fold-annotated cache reused per fold, W5 union, then ALL k fold metrics in one grouped bucketed-rank AUC action (r9) — no per-fold corpus re-scan, no per-fold metric job",
    "ann_topk_ivfsq8": "packed SQ8 codes (7 per BIGINT) scanned only in probed cells: broadcast (query x cell) join, map-side WindowGroupLimit shortlist, unpack below the candidate join (r9)",
    "ann_topk_ivf_partial": "REAL 2-of-8 cell cut under a full hash-matched oracle (r10): probe ranking shares assignment's |c|^2-2vc score, candidate join only over probed cells",
    "ann_ivf_cell_stats": "quantizer-balance audit: one corpus scan into an 8-row partial-agg groupBy; histogram completion + max/mean ratio as broadcast joins over <=k-row frames",
    "contamination_bloom_screen": "O(bits) Bloom index built from the small eval side and broadcast once; probe side MAP-ONLY (HOF transform/filter bit tests, zero probe shuffles)",
    "dedup_sorted_neighborhood": "one distributed range-sort (global_rank) + fixed-size block equi-join (skew-free, <=3w rows/group); digest sets ride the join, Jaccard is per-row array arithmetic — no pair aggregation",
    "text_cms_token_counts": "sketch shuffle capped at depth*width counter keys via map-side partial agg; probe is a broadcast join over top-n*depth rows",
    "text_source_divergence": "vocabulary-bounded count aggregates + vocab join; divergence sums as token-sorted left-to-right HOF folds (cross-engine float-exact), absent-token JS mass closed-form from integer counts",
    "cv_oof_ridge": "REAL closed-form fit (r11): per-fold integer-exact X'X/X'y partial-agg over the cached folded table, driver O(d^3) Cramer solve, literal-coefficient map-only scoring — no iteration, no per-row Python",
    "pii_scrub_planted": "PII redaction (r11): chained regexp mask + counts as ONE codegen'd map-only scan; value-hash covers the masked text via the xxhash64 twin",
    "cv_oof_logistic_newton": "REAL iterative fit (r12): per-iteration fixed-point DECIMAL(38,0) gradient/Hessian partial-agg (map-side combined, exact in any order), driver Gauss-Jordan solve, literal-coefficient sigmoid scoring — the optimizer trajectory itself is the hash-matched plan",
    "cv_oof_tree_depth2": "REAL greedy tree fit (r12): one bounded value-histogram aggregate per level (features unpivoted map-side, counts exact integers), driver argmax, nested-CASE map-only scoring",
    "blend_objective_grid": "BO objective surface (r12): ONE matrix scan nested-loop-joined to the 75-row broadcast (fold, weights) grid, all 75 AUCs in a single grouped bucketed-rank pass",
    "embedding_kmeans_lloyd": "REAL distributed clustering (r12): map-only assignment against literal centroids; the update shuffle carries only kxdim fixed-point counters behind a partial_sum HashAggregate",
    "stacker_oof_ridge": "two-level fit (r13): both base CVs are bounded partial-agg fits; the OOF matrix is two 1:1 key equi-joins over the parquet artifacts; the meta fit re-enters the integer-sum ridge shape — no stage materializes rows on the driver",
    "solution_chain_stacked": "O1-O8 chain (r13): CSV scan -> narrowed keyed parquet, per-model CV fits as per-fold partial aggs, stacking over artifact scans; every task boundary is a parquet sink/scan, nothing rides the driver between tasks",
    "cv_oof_forest_bagged": "bagged forest (r13): per member one histogram partial-agg per level over the hash-subsampled rows; the WHOLE 3-tree ensemble scores as a single map-only nested-CASE mean projection",
}


def tree_only(plan: str) -> str:
    """Keep the tree section of explain('formatted') (drop the
    per-operator detail blocks)."""
    lines = plan.splitlines()
    out = []
    for line in lines[1:]:  # skip '== Physical Plan =='
        if line.strip() == "":
            break
        out.append(line.rstrip())
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    spark = get_spark(app_name="plan-report", master="local[8]",
                      shuffle_partitions=8)
    qs = all_queries()
    chunks = [
        "# PLANS — physical-plan evidence for headline queries",
        "",
        "Generated by `tools/plan_report.py` (explain('formatted'), tree"
        " section).  What to look for per plan is noted above each tree;"
        " `tests/test_plans.py` asserts these properties in CI.",
        "",
    ]
    for name, note in HEADLINERS.items():
        df = qs[name](spark, args.sf_dir)
        # Checkpointed results (dedup pair paths) explain as a bare
        # ExistingRDD scan; the frame that actually executed rides
        # along as _plan_evidence.
        df = getattr(df, "_plan_evidence", df)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        chunks += [
            f"## {name}",
            "",
            f"*{note}*",
            "",
            "```",
            tree_only(buf.getvalue()),
            "```",
            "",
        ]
    with open(args.out, "w") as fh:
        fh.write("\n".join(chunks))
    print(f"wrote {args.out} ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
