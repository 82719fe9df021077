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
    top = q.get("exponent_top_decade")
    if top is None:
        pytest.skip("probe artifact predates top-decade field")
    assert top < 1.3, f"{name} top-decade exponent {top}"


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


def test_all_top_decade_exponents_bounded(probe):
    """No benched query may scale worse than b = 1.2 over the top
    decade (sf0.1 → sf1): the whole registry, not just the historic
    dedup/ANN set, is certified linear-with-overhead."""
    bad = {
        name: q["exponent_top_decade"]
        for name, q in probe["queries"].items()
        if q.get("exponent_top_decade") is not None
        and q["exponent_top_decade"] >= 1.2
    }
    assert not bad, f"super-linear top-decade exponents: {bad}"
