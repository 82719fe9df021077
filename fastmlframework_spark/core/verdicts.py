"""Driver CORRECTNESS artifact parsing, shared by the sampling
prioritizer (``__spark_entry__``) and the bookkeeping generator
(``tools/registry_report.py``) — one definition of "green" and one
latest-round-wins fold, so the two can't drift apart."""

from __future__ import annotations

import glob
import json
import os
import re


def correctness_files(repo_root: str) -> list[str]:
    """CORRECTNESS_r{N}.json paths in round order (numeric sort — a
    bare lexicographic ``r0*`` glob stops matching at round 10)."""
    paths = glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else 0

    return sorted(paths, key=round_no)


def is_green(row: dict) -> bool:
    """The driver's pass condition: rows+schema match and the value
    hash matches (absent hash = rows-only check, counted as green)."""
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match") in (True, None)
    )


def latest_verdicts(repo_root: str) -> dict[str, bool]:
    """name -> latest driver verdict (True = green) across all
    committed rounds; names never sampled are absent."""
    return {
        name: green
        for name, (green, _) in latest_verdicts_with_round(repo_root).items()
    }


def latest_verdicts_with_round(repo_root: str) -> dict[str, tuple[bool, int]]:
    """name -> (latest verdict, round it was last sampled in) — the
    round number drives staleness-aware sampling order (VERDICT r10
    #8: a green from round 1 that was never re-sampled is weaker
    evidence than one confirmed last round)."""
    verdict: dict[str, tuple[bool, int]] = {}
    for path in correctness_files(repo_root):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            verdict[name] = (is_green(row), rnd)
    return verdict
