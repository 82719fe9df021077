#!/usr/bin/env python
"""Round-close bench commit with a message STAMPED from the artifacts
(VERDICT r8 #7: commit 02ea0de's hand-typed message said 151.7 s at
sf0.1 while the committed BENCH_FULL.json recorded 157.2 s — numbers
in a commit message must come from the files that commit contains).

    python tools/round_close.py            # print the stamped message
    python tools/round_close.py --commit   # stage benches + commit

The message is derived ONLY from the committed JSON artifacts:
entry counts and totals from BENCH_FULL.json / BENCH_SF1.json,
regression stats from BENCH_COMPARE.json.  Nothing is typed by hand,
so the message cannot drift from the files.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = ("BENCH_FULL.json", "BENCH_SF1.json", "BENCH_COMPARE.json")


def _load(name: str) -> dict | None:
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _bench_line(tag: str, data: dict) -> str:
    q = data["queries"]
    ok = {k: v for k, v in q.items() if v >= 0}
    failed = sorted(k for k, v in q.items() if v < 0)
    line = (
        f"{tag}: {len(ok)}/{len(q)} entries green, "
        f"{round(sum(ok.values()), 1)}s total (sf{data['sf']})"
    )
    if failed:
        line += f"; FAILED: {', '.join(failed)}"
    return line


def check_install_log_fresh() -> list[str]:
    """Staleness gate (VERDICT r12 #5b): the committed
    INSTALL_CHECK.log must record the CURRENT registry count —
    r12 shipped a log saying 201 queries against a 221-query
    registry.  Returns a list of problems (empty = fresh)."""
    import re

    problems: list[str] = []
    path = os.path.join(REPO, "INSTALL_CHECK.log")
    if not os.path.exists(path):
        return ["INSTALL_CHECK.log missing — run tools/check_install.py"]
    with open(path) as fh:
        text = fh.read()
    m = re.search(r"registry: (\d+) queries", text)
    sys.path.insert(0, REPO)
    from fastmlframework_spark.queries.registry import all_queries

    live = len(all_queries())
    if not m or int(m.group(1)) != live:
        problems.append(
            f"INSTALL_CHECK.log records registry "
            f"{m.group(1) if m else '?'} but the live registry has "
            f"{live} queries — rerun tools/check_install.py"
        )
    if "vendored" not in text:
        problems.append(
            "INSTALL_CHECK.log predates the vendored-package check — "
            "rerun tools/check_install.py"
        )
    return problems


def build_message() -> str:
    full = _load("BENCH_FULL.json")
    if full is None:
        sys.exit("BENCH_FULL.json missing — run bench.py first")
    lines = [_bench_line("sf0.1", full)]
    sf1 = _load("BENCH_SF1.json")
    if sf1 is not None:
        lines.append(_bench_line("sf1", sf1))
    cmp_ = _load("BENCH_COMPARE.json")
    if cmp_ is not None:
        ratios = sorted(
            e["ratio"]
            for e in cmp_["queries"].values()
            if e.get("ratio") is not None
        )
        if ratios:
            med = statistics.median(ratios)
            lines.append(
                f"vs {cmp_['baseline']} baseline ({len(ratios)} comparable): "
                f"median ratio {med:.3f}, max {ratios[-1]:.3f}, "
                f"{len(cmp_.get('regressions', []))} over the 2x gate"
            )
    n_green = sum(1 for v in full["queries"].values() if v >= 0)
    head = (
        f"Round-close benches: {n_green} entries green at sf0.1 "
        f"({round(sum(v for v in full['queries'].values() if v >= 0), 1)}s)"
    )
    if sf1 is not None:
        sf1_ok = [v for v in sf1["queries"].values() if v >= 0]
        head = head[:-1] + f") and sf1 ({round(sum(sf1_ok), 1)}s)"
    return head + "\n\n" + "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--commit",
        action="store_true",
        help="git add the bench artifacts and commit with the stamped "
        "message (default: just print it)",
    )
    args = ap.parse_args()
    stale = check_install_log_fresh()
    for p in stale:
        print(f"STALE: {p}", file=sys.stderr)
    if stale and args.commit:
        sys.exit("refusing to stamp a round-close over stale artifacts")
    msg = build_message()
    if not args.commit:
        print(msg)
        return
    present = [a for a in ARTIFACTS if os.path.exists(os.path.join(REPO, a))]
    subprocess.run(["git", "-C", REPO, "add", *present], check=True)
    subprocess.run(["git", "-C", REPO, "commit", "-m", msg], check=True)


if __name__ == "__main__":
    main()
