"""CI gate for the mechanized bookkeeping block in COVERAGE.md
(VERDICT r3 #6: hand-kept registry/oracle counts drifted three ways in
round 3 — the block is generated, and this test fails when the
committed doc no longer matches the registry + CORRECTNESS artifacts)."""

from __future__ import annotations

import os
import re

from tools.registry_report import BEGIN, END, build_block

_COVERAGE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "COVERAGE.md",
)


def test_coverage_block_is_current():
    with open(_COVERAGE) as fh:
        doc = fh.read()
    m = re.search(re.escape(BEGIN) + r"(.*?)" + re.escape(END), doc, re.S)
    assert m, "registry-report markers missing from COVERAGE.md"
    committed = BEGIN + m.group(1) + END
    assert committed == build_block(), (
        "COVERAGE.md registry-report block is stale — run "
        "tools/registry_report.py"
    )


def test_readme_query_counts_current():
    from tools.registry_report import README_LINE, readme_line

    readme = os.path.join(os.path.dirname(_COVERAGE), "README.md")
    with open(readme) as fh:
        doc = fh.read()
    m = README_LINE.search(doc)
    assert m, "query-count line missing from README.md"
    assert m.group(0) == readme_line(), (
        "README.md query counts are stale — run tools/registry_report.py"
    )


def test_prioritizer_orders_red_never_oldest_green(monkeypatch, tmp_path):
    """VERDICT r10 #8: _prioritized must order (latest-red,
    never-sampled, greens oldest-round-first) so a prefix-taking
    driver sampler re-confirms stale greens instead of replaying the
    newest ones forever."""
    import __spark_entry__ as entry
    from fastmlframework_spark.core import verdicts as v

    fake = {
        "green_r1": (True, 1),
        "green_r9": (True, 9),
        "green_r4": (True, 4),
        "red_r8": (False, 8),
    }
    monkeypatch.setattr(v, "latest_verdicts_with_round", lambda root: fake)
    mapping = {
        "green_r9": 1,
        "never_b": 2,
        "green_r1": 3,
        "red_r8": 4,
        "never_a": 5,
        "green_r4": 6,
    }
    got = list(entry._prioritized(mapping))
    assert got[0] == "red_r8"
    assert set(got[1:3]) == {"never_a", "never_b"}
    assert got[3:] == ["green_r1", "green_r4", "green_r9"]
    # values ride along untouched
    assert entry._prioritized(mapping)["green_r4"] == 6


def test_latest_verdicts_with_round_latest_wins(tmp_path):
    import json

    from fastmlframework_spark.core.verdicts import (
        latest_verdicts,
        latest_verdicts_with_round,
    )

    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    r = {"rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_a": g, "q_b": g})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"q_a": r})
    )
    got = latest_verdicts_with_round(str(tmp_path))
    assert got == {"q_a": (False, 10), "q_b": (True, 2)}
    assert latest_verdicts(str(tmp_path)) == {"q_a": False, "q_b": True}
