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
