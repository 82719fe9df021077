"""Scaling-law certification for the dedup/ANN family (VERDICT r1 #7).

tools/scale_probe.py --exponents fits t = a * sf^b per query over the
sf0.001 → 0.01 → 0.1 testdata (100× data range) and commits the JSON;
this test pins the contract: every bucketed/banded path must stay well
sub-quadratic (b < 1.5) — a cartesian or per-key-cross-product
regression would show b → 2 immediately.
"""

from __future__ import annotations

import json
import os

import pytest

_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "scale_probe_exponents.json",
)

_BUCKETED = (
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_components",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "contamination_eval_overlap",
    "pack_sequences_sharded",
    "shuffle_training_order",
    "semantic_dedup_planted",
    "knn_density_by_label",
    "text_chargram_nll",
    "dsir_importance_weights",
    "quality_gopher_rules",
    "pack_length_buckets",
    "dedup_duplicate_spans",
    "dedup_remove_spans",
    "dedup_incremental_near",
    "text_ccnet_buckets",
    "events_seasonal_baseline",
    "text_vocab_coverage",
)


@pytest.fixture(scope="module")
def probe():
    if not os.path.exists(_JSON):
        pytest.skip("probe artifact not generated yet")
    with open(_JSON) as fh:
        return json.load(fh)


def _decade(q: dict, lo: float, hi: float) -> float | None:
    """Per-decade exponent from the committed (sf, sec) points —
    ``exponent_top_decade`` always means the LAST decade, which since
    the sf10 probe (r10) differs per entry (sf0.1→1 for 4-decade
    entries, sf1→10 for 5-decade ones); gates pin decades by value."""
    import math

    sf, sec = q["sf"], q["sec"]
    if lo in sf and hi in sf:
        i, j = sf.index(lo), sf.index(hi)
        return math.log10(sec[j] / sec[i])
    return None


@pytest.mark.parametrize("name", _BUCKETED)
def test_bucketed_paths_are_subquadratic(probe, name):
    q = probe["queries"].get(name)
    assert q is not None, f"{name} missing from probe artifact"
    assert q["exponent"] < 1.5, f"{name} scaling exponent {q['exponent']}"


@pytest.mark.parametrize("name", _BUCKETED)
def test_top_decade_stays_linearish(probe, name):
    """The global fit is deflated by fixed overhead at small sfs, so
    the honest scaling signal is the LAST decade (sf0.1 → sf1 once
    the probe includes the mutated 10× replica).  b < 1.3 there means
    the path is linear-with-overhead, not hiding a quadratic tail."""
    q = probe["queries"].get(name)
    assert q is not None, f"{name} missing from probe artifact"
    top = _decade(q, 0.1, 1.0)
    if top is None:
        pytest.skip("probe entry lacks the sf1 decade")
    assert top < 1.3, f"{name} sf0.1->sf1 exponent {top}"


def test_probe_covers_scales(probe):
    for name, q in probe["queries"].items():
        assert len(q["sf"]) >= 3 and len(q["sec"]) == len(q["sf"]), name
        assert q["sf"] == sorted(q["sf"]), name


def test_probe_covers_full_benched_registry(probe):
    """VERDICT r5 #4: every benched registry query must carry a
    committed scaling exponent — a super-linear constant invisible at
    sf0.1 cannot hide in an unprobed query.  (Queries newer than the
    last committed probe run would surface here.)"""
    from fastmlframework_spark.queries.registry import bench_queries

    missing = sorted(set(bench_queries()) - set(probe["queries"]))
    assert not missing, f"benched queries missing from probe: {missing}"


def test_all_sf1_decade_exponents_bounded(probe):
    """No benched query may scale worse than b = 1.2 over the
    sf0.1 → sf1 decade: the whole registry, not just the historic
    dedup/ANN set, is certified linear-with-overhead."""
    bad = {}
    for name, q in probe["queries"].items():
        d = _decade(q, 0.1, 1.0)
        if d is not None and d >= 1.2:
            bad[name] = round(d, 4)
    assert not bad, f"super-linear sf0.1->sf1 exponents: {bad}"


# sf1 → sf10 pins for the fifth-decade probe set (VERDICT r9 #7).
# Exact PAIR-LISTING similarity joins are provably candidate/answer-
# quadratic on adversarial inputs, and the synthetic corpus is one:
# ~31 word types (prefix shingles stay high-df, so prefix filtering
# cannot bound candidates) and replication multiplies near-dup family
# sizes.  Those queries carry an explicit looser bound + reason here —
# the scalable path for such corpora is the probabilistic rung
# (MinHash-LSH: sf10 b≈0.98) which the engine also ships.
SF10_LOOSER_BOUNDS = {
    "dedup_ngram_jaccard_prefix": (
        2.2,
        "exact set-similarity pair join; tiny-vocab corpus defeats "
        "prefix filtering (candidates ~quadratic by construction)",
    ),
    "dedup_best_representative": (
        2.2,
        "consumes ngram_jaccard_pairs — inherits the same corpus-"
        "adversarial quadratic candidate set; the selection stage "
        "itself (components + struct-max) is linear in the pair list",
    ),
    "dedup_ngram_jaccard": (
        2.2,
        "the exact pair-listing Jaccard join itself — answer-bound "
        "(quadratic candidates on the tiny-vocab corpus); the "
        "scalable rung for such corpora is MinHash-LSH",
    ),
    "dedup_minhash_calibration": (
        2.2,
        "audit query whose GROUND TRUTH side is the exact threshold-0 "
        "Jaccard pair join (quadratic on this corpus by construction); "
        "production runs it on a sample, and the LSH candidate side it "
        "audits stays ~linear (dedup_minhash_lsh)",
    ),
    "dedup_minhash_recall_curve": (
        2.2,
        "same exact-ground-truth audit shape as "
        "dedup_minhash_calibration — truth side quadratic by "
        "construction on the tiny-vocab corpus",
    ),
    "dedup_containment": (
        2.3,
        "exact containment pair join (inverted-index intersect) — "
        "answer-bound like the Jaccard pair listers: the tiny-vocab "
        "corpus makes shared-shingle candidate pairs ~quadratic; the "
        "scalable screen for containment is the Bloom/inverted "
        "contamination path, which stays ~linear",
    ),
}


def test_sf10_decade_exponents_bounded(probe):
    """Every query in the fifth-decade probe set must stay below
    b = 1.5 over sf1 → sf10, except the documented answer-bound
    pair-listing cases above (each still pinned, just looser)."""
    names = probe.get("sf10_probe", {}).get("queries", [])
    assert names, "sf10 probe set missing"
    bad = {}
    for name in names:
        q = probe["queries"].get(name)
        assert q is not None, f"{name} missing from probe queries"
        d = _decade(q, 1.0, 10.0)
        assert d is not None, f"{name} lacks the sf10 decade"
        bound = SF10_LOOSER_BOUNDS.get(name, (1.5,))[0]
        if d >= bound:
            bad[name] = (round(d, 4), bound)
    assert not bad, f"sf1->sf10 exponents over their bounds: {bad}"


def test_sf10_probe_covers_expensive_families(probe):
    """VERDICT r9 #7: every family representative whose sf1 bench cost
    exceeded ~2s carries a committed sf10 exponent — the named set
    below is the floor, not the ceiling."""
    required = {
        "stream_seasonal_stats",
        "stream_near_dedup",
        "stream_quality_gate",
        "stream_cusum",
        "stream_exact_dedup",
        "text_ccnet_buckets",
        "quality_repetition_signals",
        "semdedup_threshold_sweep",
        "dedup_ngram_jaccard_prefix",
        "dedup_minhash_lsh",
        "dedup_cross_source_matrix",
        "split_leakage_safe",
        "dedup_embedding_lsh",
        "events_holt_smoothing",
        "semantic_dedup_planted",
        "curation_funnel",
        "cv_oof_frozen",
        "dedup_duplicate_spans",
        "text_bpe_train",
        # r10 additions past the ~2s-at-sf1 line
        "contamination_bloom_screen",
        "dedup_sorted_neighborhood",
        "stream_decontamination",
    }
    have = set(probe.get("sf10_probe", {}).get("queries", []))
    missing = sorted(required - have)
    assert not missing, f"sf10 probe missing: {missing}"


# sf10 -> sf100 pins for the SIXTH-decade representatives (VERDICT
# r12 #7): the heaviest family representatives carry a committed
# sf100 sample so a super-linear constant invisible at sf10 cannot
# hide.  Representatives only — a full-registry sf100 pass would cost
# hours for no additional signal.  Two deliberate exclusions:
# - stream_decontamination: its committed sf10 drain already costs
#   680 s (availableNow over the full 2.7M-doc corpus) and its
#   sf1->sf10 exponent is pinned by the fifth-decade gate; a ~2 h
#   sf100 drain buys no new signal for that cost.
# - dedup_duplicate_spans: the 27M-doc sf100 replica explodes to
#   ~2.7B stride-1 window rows whose sort SPILL exceeds this single
#   box's free disk (observed SPILL_OUT_OF_MEMORY / no-space at
#   sf100) — a probe-host disk bound, not an operator quadratic: the
#   row count is linear by construction and its sf1->sf10 b=0.95 is
#   committed; on a cluster the spill distributes across executors.
SF100_REPRESENTATIVES = (
    "cv_oof_logistic_newton",
    "cv_oof_tree_depth2",
    "dedup_sorted_neighborhood",
    "ann_topk_ivfsq8",
    "contamination_bloom_screen",
    "embedding_kmeans_lloyd",
)

SF100_LOOSER_BOUNDS: dict = {}


def test_sf100_decade_exponents_bounded(probe):
    """Every sixth-decade representative must stay below b = 1.5 over
    sf10 -> sf100 (documented exceptions would go in
    SF100_LOOSER_BOUNDS with a reason, as the sf10 set does)."""
    probed = [
        n for n in SF100_REPRESENTATIVES
        if n in probe["queries"]
        and 100.0 in probe["queries"][n]["sf"]
    ]
    if not probed:
        pytest.skip("sf100 decade not probed yet")
    assert set(probed) == set(SF100_REPRESENTATIVES), (
        sorted(set(SF100_REPRESENTATIVES) - set(probed))
    )
    bad = {}
    for name in probed:
        d = _decade(probe["queries"][name], 10.0, 100.0)
        bound = SF100_LOOSER_BOUNDS.get(name, (1.5,))[0]
        if d is None or d >= bound:
            bad[name] = (None if d is None else round(d, 4), bound)
    assert not bad, f"sf10->sf100 exponents over their bounds: {bad}"
