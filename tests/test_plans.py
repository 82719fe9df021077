"""Physical-plan hygiene (SURVEY.md §4 / the 100 TB design contract).

Correctness tests prove WHAT a query computes; these prove the plan is
the one you'd WANT on a 1000-executor cluster reading 100 TB:

* filters reach the parquet scan (``PushedFilters``),
* scans read only the projected columns (``ReadSchema``),
* small dimension sides broadcast (no full-fact shuffle),
* single-pass profiling (one aggregate over all columns, not N scans),
* hot expression paths stay inside WholeStageCodegen.

If a refactor silently regresses one of these, this file fails even
though results stay correct.
"""

from __future__ import annotations

import contextlib
import io
import re

from fastmlframework_spark.queries.registry import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir_small):
    plan = _plan(spark, sf_dir_small, "q1_pricing_summary")
    # Ship-date predicate pushed into the scan.
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    # Scan reads only the 7 needed columns — never l_comment-style blobs.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }, read_cols
    # Partial aggregation before the exchange (map-side combine).
    assert "HashAggregate" in plan and "Exchange" in plan


def test_q1_whole_stage_codegen(spark, sf_dir_small):
    """After AQE finalizes, the scan→filter→partial-agg pipeline must
    sit inside WholeStageCodegen stages (codegen ids in the plan)."""
    df = all_queries()["q1_pricing_summary"](spark, sf_dir_small)
    df.collect()  # finalize the adaptive plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan, plan[:300]
    assert "codegen id" in plan, plan


def test_q5_dimensions_broadcast(spark, sf_dir_small):
    plan = _plan(spark, sf_dir_small, "q5_region_revenue")
    # region/nation (tiny dims) must broadcast — the fact table is
    # never shuffled for them.
    assert "BroadcastHashJoin" in plan, plan
    # no cartesian anywhere
    assert "CartesianProduct" not in plan


def test_q3_mktsegment_pushdown(spark, sf_dir_small):
    plan = _plan(spark, sf_dir_small, "q3_top_orders")
    assert re.search(
        r"PushedFilters: \[[^\]]*EqualTo\(c_mktsegment,BUILDING\)", plan
    ), plan


def test_profile_minmax_single_scan(spark, sf_dir_small):
    """A1: per-column min/max must be ONE aggregate pass (the
    reference's per-column driver loop, preprocessing.py:24-28,
    collapsed into a single job)."""
    plan = _plan(spark, sf_dir_small, "profile_minmax")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, plan


def test_horizontal_mean_no_shuffle(spark, sf_dir_small):
    """A9 is a pure projection — a bagged row-mean must not shuffle."""
    plan = _plan(spark, sf_dir_small, "horizontal_mean_rows")
    assert "Exchange" not in plan, plan


def test_fold_assignment_no_global_sort(spark, sf_dir_small):
    """C3: deterministic hash-mod folds — no whole-table window, no
    global sort, no exchange beyond the scan."""
    plan = _plan(spark, sf_dir_small, "fold_assignment_hash")
    assert "Sort " not in plan or "SortMergeJoin" in plan, plan


def test_q6_fully_pushed_scan(spark, sf_dir_small):
    """Q6 is a zero-join scan: every predicate must reach PushedFilters
    and the scan reads only the 4 touched columns."""
    plan = _plan(spark, sf_dir_small, "q6_forecast_revenue")
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_discount.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_quantity.*\]", plan), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols <= {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    }, read_cols
    assert "Join" not in plan


def test_q4_semi_join_shape(spark, sf_dir_small):
    """EXISTS must compile to a LeftSemi join (dedup inside the join),
    with the date filter pushed to the orders scan."""
    plan = _plan(spark, sf_dir_small, "q4_priority_with_returns")
    assert "LeftSemi" in plan, plan
    assert re.search(r"PushedFilters: \[.*o_orderdate.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_returnflag.*\]", plan), plan


def test_q16_broadcast_anti_join(spark, sf_dir_small):
    """The NOT-IN supplier exclusion must be a broadcast LeftAnti —
    never a shuffled anti-join of the fact table."""
    plan = _plan(spark, sf_dir_small, "q16_part_supplier_counts")
    assert re.search(r"Broadcast.*Join.*LeftAnti|LeftAnti.*Broadcast", plan, re.S), plan


def test_q22_no_collect_threshold(spark, sf_dir_small):
    """The scalar avg-balance threshold crosses in as a broadcast
    nested-loop cross join of a 1-row aggregate (plan-side, no driver
    round-trip), and the recent-customer set anti-joins broadcast."""
    plan = _plan(spark, sf_dir_small, "q22_idle_rich_customers")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q12_pushdown_and_no_cartesian(spark, sf_dir_small):
    """Q12: the shipdate window reaches the scan; the cross-table late
    predicate stays a post-join filter on an equi-join (never a
    nested-loop)."""
    plan = _plan(spark, sf_dir_small, "q12_late_priority_counts")
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_broadcasts_and_semi_joins(spark, sf_dir_small):
    """Q20: part prune and the qualifying-supplier set must broadcast;
    both nested qualifications are semi-joins (supplier table is never
    shuffled or duplicated)."""
    plan = _plan(spark, sf_dir_small, "q20_dominant_widget_suppliers")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan


def test_q21_single_fact_shuffle_no_self_join(spark, sf_dir_small):
    """Q21's EXISTS/NOT-EXISTS de-correlates into stacked aggregates:
    lineitem must appear in exactly ONE scan (no fact self-join), and
    the per-order re-aggregation reuses the (orderkey, suppkey)
    shuffle instead of adding a second fact-sized exchange."""
    plan = _plan(spark, sf_dir_small, "q21_waiting_suppliers")
    # formatted explain lists each operator once in the tree and once
    # in the detail section — count the numbered detail headers.
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 3, plan  # lineitem + orders + supplier
    assert "CartesianProduct" not in plan
    assert re.search(r"BroadcastHashJoin", plan), plan  # supplier names


def test_contamination_broadcasts_eval_index(spark, sf_dir_small):
    """The eval shingle index must broadcast — the train corpus is
    never shuffled on text content."""
    plan = _plan(spark, sf_dir_small, "contamination_eval_overlap")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_shuffle_order_uses_range_partitioning(spark, sf_dir_small):
    """The global rank must ride a distributed range-partitioned sort;
    the only single-partition work is the #partitions-sized offset
    frame."""
    plan = _plan(spark, sf_dir_small, "shuffle_training_order")
    assert "RangePartitioning" in plan or "rangepartitioning" in plan.lower(), plan


def test_pii_stats_is_map_only_single_scan(spark, sf_dir_small):
    """PII redaction stats: one documents scan, map-only regexp
    projection, and exactly one aggregation exchange — no joins, no
    second pass over the corpus."""
    plan = _plan(spark, sf_dir_small, "pii_redaction_stats")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_bm25_broadcasts_corpus_stats(spark, sf_dir_small):
    """BM25: the 1-row corpus-stats frame broadcasts back over the
    scan (nested-loop join on a single row, never a shuffle of the
    corpus) and tf stays a per-row expression — no explode."""
    plan = _plan(spark, sf_dir_small, "text_bm25_scores")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "Generate" not in plan, plan  # explode would show as Generate


def test_quantile_bin_has_no_global_sort(spark, sf_dir_small):
    """Edge-based binning must not smuggle in an ntile-style
    single-partition window over the DATA: no Window operator, no Sort
    — just the broadcast edge array + projection.  (The percentile
    aggregate's own 1-row SinglePartition merge carries aggregate
    buffers, not rows, and is expected.)"""
    plan = _plan(spark, sf_dir_small, "bin_totalprice_deciles")
    assert "Window" not in plan, plan
    assert re.search(r"\(\d+\) Sort", plan) is None, plan


def test_standardize_broadcasts_group_stats(spark, sf_dir_small):
    """Grouped z-score: the per-segment stats join must broadcast —
    the customer table is never shuffled on the group key."""
    plan = _plan(spark, sf_dir_small, "scale_standardize_acctbal")
    assert "BroadcastHashJoin" in plan, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    # one exchange for the tiny stats aggregate; the fact side is
    # scan→project only
    assert n_exchanges <= 1, plan


def _executed_plan(df) -> str:
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_aqe_splits_skewed_join(spark):
    """AQE's OptimizeSkewedJoin is the native handler for JOIN skew
    (operators/skew.py covers the cases it can't: aggregation skew via
    salted_groupby, and broadcast-ineligible dimension joins via
    salted_join).  This pins that with a runtime-skewed key the final
    adaptive plan splits the hot partition — SortMergeJoin(skew=true)
    over a skewed AQEShuffleRead — and, as a control, that a uniform
    key under the SAME thresholds is left untouched, i.e. the firing
    is skew DETECTION, not the conf.  forceOptimizeSkewedJoin only
    waives the extra-shuffle veto; detection thresholds still decide.
    """
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4194304",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        # shuffle sizes are COMPRESSED map-output bytes, so the pad must
        # be incompressible or the hot partition shrinks below any
        # sane threshold: two chained sha2 hex digests ≈ 128 high-
        # entropy bytes per row
        pad = F.concat(
            F.sha2(F.col("id").cast("string"), 256),
            F.sha2(F.concat(F.lit("s"), F.col("id").cast("string")), 256),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )

        # 90% of 300k rows on one key → one ~35 MB (compressed)
        # shuffle partition, ≫ the 4 MB threshold and ≫ 2× the
        # median; the uniform control's ~1 MB partitions clear
        # neither bar
        skewed = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            pad.alias("pad"),
        )
        plan = _executed_plan(skewed.join(small, on="k"))
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan

        # uniform control: same volume, same confs, no hot key
        uniform = spark.range(0, 300_000).select(
            (F.col("id") % 1000).alias("k"), pad.alias("pad")
        )
        plan_u = _executed_plan(uniform.join(small, on="k"))
        assert "skew=true" not in plan_u, plan_u
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir_small):
    """Spark's InjectRuntimeFilter: when a selective dimension filters
    a shuffle join, the fact side's scan gains a
    might_contain(bloom_filter, xxhash64(key)) predicate built from
    the dimension's keys — at 100 TB this drops non-matching fact rows
    at the scan instead of carrying them through the shuffle.  Pinned
    here with the only non-default knob being the application-side
    size floor (defaults assume a ≥10 GB fact scan); the control shows
    no injection when the dimension has no selective predicate."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir_small}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir_small}/orders.parquet")
        urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(urgent, li.l_orderkey == urgent.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan, plan
        # control: no selective predicate on the creation side → no filter
        j2 = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            j2.explain("formatted")
        assert "might_contain" not in buf2.getvalue()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_roc_auc_rank_is_bucket_partitioned(spark, sf_dir_small):
    """A20 at 100×: the AUC rank's cumulative window over the distinct
    score domain must run partitioned by the value bucket — never a
    single-partition window over all distinct scores (continuous model
    probabilities make distinct-count ~ row-count).  SinglePartition
    exchanges may only carry 1-row aggregate merges and the bounded
    (≤ n_buckets rows) per-bucket offset cumulation."""
    plan = _plan(spark, sf_dir_small, "metric_roc_auc")
    # the per-score cumulation window is partitioned by __bkt
    assert "hashpartitioning(__bkt" in plan, plan
    # every window ordering by the score column is bucket-partitioned
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "__s#" in line:
            assert "__bkt" in line, line


def test_vocab_coverage_rank_is_take_ordered(spark, sf_dir_small):
    """The coverage curve needs only the top-max(sizes) tokens, so the
    vocabulary must flow through TakeOrderedAndProject (per-partition
    top-n merge), never a row_number window over the full distinct
    vocabulary (10⁸-10⁹ tokens on a web corpus)."""
    plan = _plan(spark, sf_dir_small, "text_vocab_coverage")
    assert "TakeOrderedAndProject" in plan, plan


def _window_group_limit_below_exchange(plan: str) -> bool:
    """True when a partial WindowGroupLimit sits BELOW the window's
    exchange — Spark's native two-phase top-k (SPARK-37099): map-side
    per-(group, partition) pruning, so the post-shuffle task gets
    ≤ k × n_partitions rows per group instead of the group's whole
    corpus-sized candidate set."""
    tree = plan.split("\n\n")[0].splitlines()
    saw_exchange_under_window = False
    for line in tree:
        if "Exchange" in line:
            saw_exchange_under_window = True
        if "WindowGroupLimit" in line and saw_exchange_under_window:
            return True
    return False


def test_ann_topk_rank_limit_pushdown(spark, sf_dir_small):
    """Every per-query ANN rank must keep the rank-limit pushdown: a
    partial WindowGroupLimit below the exchange prunes each partition
    to k rows per query map-side.  Losing it (a refactor that hides
    the rank filter from the optimizer) would funnel a query's entire
    corpus-sized candidate set through one task at 100×."""
    for q in ("ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf"):
        plan = _plan(spark, sf_dir_small, q)
        assert _window_group_limit_below_exchange(plan), (q, plan)


def test_pq_candidate_cut_rank_limit_pushdown(spark, sf_dir_small):
    """The PQ ADC candidate cut (refine·k per query over the codes
    scan) is the biggest per-query row stream in the module — the
    partial WindowGroupLimit must survive there too."""
    plan = _plan(spark, sf_dir_small, "ann_topk_pq")
    assert _window_group_limit_below_exchange(plan), plan


def test_cusum_scan_is_window_only(spark, sf_dir_small):
    """The benched CUSUM path must be the closed prefix form — two
    per-key running windows, pure whole-stage codegen.  Any
    ApplyInPandas/BatchEvalPython node means the per-key Python loop
    leaked back in, which serializes a hot key's entire history
    through one Arrow stream at 100×."""
    plan = _plan(spark, sf_dir_small, "events_cusum_scan")
    assert "Window" in plan, plan
    assert "ApplyInPandas" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_span_dedup_digests_are_long_not_md5(spark, sf_dir_small):
    """The duplicate-passage window explode is the heaviest row stream
    in the dedup family (~doc_len rows per doc) and everything
    downstream shuffles on the digest — the digest must stay an 8-byte
    xxhash64 long end-to-end.  An md5 (or any string digest) sneaking
    back in widens every exchange in the family by 4× and re-adds the
    per-window string materialization (r6 cut sf1 times 47-69% by
    removing it)."""
    for q in ("dedup_duplicate_spans", "dedup_remove_spans"):
        plan = _plan(spark, sf_dir_small, q)
        assert "md5" not in plan, (q, plan)
        assert "xxhash64" in plan, (q, plan)


def test_vocab_coverage_single_corpus_scan(spark, sf_dir_small):
    """The coverage curve's token total must come from the counts
    aggregate, not a second tokenize-and-count branch: a web corpus
    is scanned and exploded ONCE.  The sharing happens at runtime —
    both branches canonicalize to the same token-count exchange, so
    AQE replaces the second subtree with a ReusedExchange — which is
    why this pin executes the query and reads the FINAL adaptive
    plan: the static plan always prints both subtrees.  A second
    FileScan surviving execution means the total regressed to a
    branch whose aggregation no longer matches the head's (what the
    old tok.agg(count) form did)."""
    df = all_queries()["text_vocab_coverage"](spark, sf_dir_small)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    final = buf.getvalue().split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final, final
    assert len(re.findall(r"FileScan parquet", final)) == 1, final
    assert "ReusedExchange" in final, final


def test_row_level_reports_have_no_global_sort(spark, sf_dir_small):
    """Corpus-sized row-level outputs (per-doc digests, chunk tables,
    per-row encodes, dedup decisions) must not end in a global sort:
    the driver compare is order-insensitive, shard writers re-sort
    locally when file order matters, and a trailing orderBy range-
    partitions and sorts the ENTIRE output for nothing (measured 70%
    of canonical_digests' sf1 wall-clock).  Sorts on small aggregate
    outputs (TPC-H presentation order) are fine and not covered here."""
    for q in (
        "canonical_digests",
        "corpus_resample_weighted",
        "semantic_dedup_planted",
        "doc_chunk_tokens",
        "sample_stratified_hash",
        "target_encode_oof_priority",
    ):
        plan = _plan(spark, sf_dir_small, q)
        assert "rangepartitioning" not in plan, (q, plan)


def test_weighted_median_cumsum_is_bucket_partitioned(spark, sf_dir_small):
    """The weighted-quantile cumulative weight must be the distributed
    bucketed prefix sum: a sort window partitioned only by
    l_returnflag (a THREE-value key) funnels every lineitem row
    through 3 single-task sorts — one flag's whole slice serializes
    at 100×.  Every window that orders by the value column must be
    partitioned by the value bucket; the only group-keyed windows
    allowed are the ≤ n_buckets-row offset/total cumulations (which
    order by __bkt, not the value)."""
    plan = _plan(spark, sf_dir_small, "weighted_median_price")
    assert "__bkt" in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "l_extendedprice" in line:
            assert "__bkt" in line, line


def test_hard_negatives_rank_limit_pushdown_and_broadcast(spark, sf_dir_small):
    """Hard-negative mining must keep both scale properties of the
    ANN family: the query side broadcast (no corpus shuffle for the
    join) and the partial WindowGroupLimit below the exchange (per-
    query top-k pruned map-side)."""
    plan = _plan(spark, sf_dir_small, "ann_hard_negatives")
    assert _window_group_limit_below_exchange(plan), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_prototype_outliers_partial_agg_and_broadcast(spark, sf_dir_small):
    """The centroid aggregate must partial-aggregate below its
    exchange (map-side combine eats the d× posexplode inflation) and
    the |labels|-row prototype table must broadcast back over the
    corpus scan; the per-label bottom-k keeps the rank-limit
    pushdown."""
    plan = _plan(spark, sf_dir_small, "embedding_prototype_outliers")
    assert _window_group_limit_below_exchange(plan), plan
    assert "BroadcastExchange" in plan, plan
    assert "partial_avg" in plan, plan


def test_bigram_lm_model_broadcasts_and_scores_map_only(spark, sf_dir_small):
    """word_bigram_nll: the two-array model must reach the corpus via
    a broadcast (BroadcastNestedLoopJoin of the 1-row frame), and the
    corpus side must see NO exchange after its scan — scoring is a
    map-only HOF over the word array; only the dim-bounded count
    aggregates shuffle."""
    plan = _plan(spark, sf_dir_small, "text_bigram_lm_nll")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # no corpus-wide sort anywhere (scores are per-row, order-free)
    assert "rangepartitioning" not in plan, plan


def test_transition_matrix_single_corpus_shuffle(spark, sf_dir_small):
    """The LEAD window shuffles events ONCE on user_id; everything
    after operates on the |states|^2 aggregate.  Exactly one exchange
    may hash-partition on user_id, and no window may order the full
    corpus without the user_id partitioning."""
    plan = _plan(spark, sf_dir_small, "events_transition_matrix")
    assert plan.lower().count("hashpartitioning(user_id") == 1, plan


def test_rank_transform_is_bucket_partitioned(spark, sf_dir_small):
    """Percent-rank scaling must never total-order the corpus: every
    window that orders by the value column must be partitioned by the
    value bucket (the only unpartitioned window is the ≤ n_buckets-row
    offset prefix, which orders by __bkt)."""
    plan = _plan(spark, sf_dir_small, "scale_rank_acctbal")
    assert "__bkt" in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "c_acctbal" in line:
            assert "__bkt" in line, line


def test_exact_k_sample_rank_limit_pushdown(spark, sf_dir_small):
    """The per-stratum quota sample must keep the partial
    WindowGroupLimit below the exchange — map-side pruning to k rows
    per language per partition is what makes the quota sample a
    shuffle of k·partitions rows instead of the corpus."""
    plan = _plan(spark, sf_dir_small, "sample_exact_k_per_lang")
    assert _window_group_limit_below_exchange(plan), plan


def test_curation_funnel_two_corpus_scans(spark, sf_dir_small):
    """The 4-stage funnel must cost ≤2 corpus scans: stages 1–2 are ONE
    conditional aggregate (a single parquet scan), and the exact-dedup
    survivor set is localCheckpoint-ed before the stage-3 aggregate /
    MinHash pairs / anti-join fan-out, so those branches read the
    materialized RDD (the checkpoint itself was the second scan, paid
    at construction).  The final plan therefore shows exactly one
    parquet scan plus ExistingRDD scans — four corpus passes here means
    the r7 re-execution regression is back.

    The planted `_corpus` is a 3-way self-union of documents.parquet, so
    ONE logical corpus pass shows 3 parquet scan nodes — calibrate
    against a trivial single-pass aggregate rather than hardcoding."""
    import contextlib
    import io

    from fastmlframework_spark.queries.dedup import _corpus

    one_pass = _corpus(spark, sf_dir_small).groupBy().count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_pass.explain("formatted")
    per_pass = len(re.findall(r"\(\d+\) Scan parquet", buf.getvalue()))
    assert per_pass >= 1

    plan = _plan(spark, sf_dir_small, "curation_funnel")
    n_parquet = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_parquet == per_pass, (n_parquet, per_pass, plan)
    assert "ExistingRDD" in plan, plan


def test_ivfsq8_broadcast_probe_and_packed_scan(spark, sf_dir_small):
    """IVF-SQ8 scale contract (VERDICT r8 #4): the (query x probed
    cell) table BROADCASTS onto the encoded corpus (joins on the cell
    id — never a corpus shuffle), the SQ8 shortlist is a map-side
    rank-limit (WindowGroupLimit), and the packed-words unpack
    (flatten/transform) evaluates BELOW the candidate join, once per
    corpus row rather than once per (corpus x query) candidate."""
    plan = _plan(spark, sf_dir_small, "ann_topk_ivfsq8")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan, plan

    from fastmlframework_spark.queries.similarity import ann_topk_ivfsq8

    df = ann_topk_ivfsq8(spark, sf_dir_small)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    unpack_depth = join_depth = None
    for ln in lines:
        body = ln.lstrip(" :+-")
        depth = len(ln) - len(body)
        if unpack_depth is None and "flatten(transform(" in ln:
            unpack_depth = depth
        # the CANDIDATE join is the one keyed on the cell id
        if join_depth is None and "Join Inner" in ln and "cell" in ln:
            join_depth = depth
    assert unpack_depth is not None and join_depth is not None, opt[:2000]
    # deeper indentation == further from the root == below the join
    assert unpack_depth > join_depth, (unpack_depth, join_depth)


def test_ann_cell_paths_single_udf_pass(spark, sf_dir_small):
    """r9 regression guard: an inner join on a with_cells output used
    to make Catalyst infer IsNotNull(cell) and push it below the
    repartition exchange, re-evaluating the Arrow cell-assignment UDF
    for every corpus row a second time.  The coalesce(-1) fix marks
    the column non-nullable; each benched IVF/PQ plan must carry
    EXACTLY ONE distinct Arrow/Batch-eval Python node (the planted
    bench=False variants may legitimately split one logical pass
    across union branches)."""
    for name in (
        "ann_topk_ivf",
        "ann_topk_pq",
        "ann_topk_ivfpq",
        "ann_topk_ivfsq8",
        "ann_topk_ivfhamming",
    ):
        plan = _plan(spark, sf_dir_small, name)
        ids = set(
            re.findall(r"\((\d+)\) (?:ArrowEvalPython|BatchEvalPython)", plan)
        )
        assert len(ids) == 1, (name, sorted(ids))
