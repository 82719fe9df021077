#!/usr/bin/env python
"""Verify `pip install -e .` works in-container and the installed
package imports WITHOUT the repo on sys.path (VERDICT r8 #8).

The container has no PyPI access and pyproject.toml deliberately has
no [build-system] table, so the editable install rides the system
setuptools/wheel (PYTHONPATH=/usr/lib/python3/dist-packages supplies
bdist_wheel) with --no-build-isolation.  The import check runs from a
scratch cwd with a child interpreter that does NOT insert the repo
path itself — resolution must come from the installed .pth/finder
machinery, which is exactly what a user's `pip install` relies on.

    python tools/check_install.py          # install + verify + log

Writes INSTALL_CHECK.log at the repo root (committed as evidence).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from urllib.parse import urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "INSTALL_CHECK.log")

# pip echoes whatever index/mirror the environment points it at
# ("Looking in indexes: ..."); that can be a private host and must never
# land in a committed artifact.  Keep only URLs on a public allowlist and
# redact everything else before the log is written.
_PUBLIC_HOSTS = {
    "pypi.org",
    "files.pythonhosted.org",
    "pip.pypa.io",
    "github.com",
}


def redact(text: str) -> str:
    out = []
    for line in text.splitlines():
        if re.match(r"\s*Looking in (indexes|links):", line):
            continue  # drop the whole line: its only content is the mirror URL
        def _sub(m: re.Match) -> str:
            host = urlparse(m.group(0)).hostname or ""
            return m.group(0) if host in _PUBLIC_HOSTS else "<redacted-url>"
        out.append(re.sub(r"https?://[^\s'\"]+", _sub, line))
    return "\n".join(out)

IMPORT_CHECK = r"""
import sys
# Guard: the repo must NOT be reachable through cwd/sys.path[0]; the
# import below has to resolve via the pip-installed finder machinery.
sys.path = [p for p in sys.path if p not in ("", "{repo}")]
import fastmlframework_spark
from fastmlframework_spark.queries.registry import all_queries, all_oracles
q, o = all_queries(), all_oracles()
assert len(q) > 150 and set(o) <= set(q), (len(q), len(o))
print("imported from:", fastmlframework_spark.__file__)
print("registry:", len(q), "queries,", len(o), "oracles")
"""

# Environment-gated delegation targets: the wrappers/tasks delegate to
# these when importable (ml/hpo.py bayes_opt, pipeline/tasks.py luigi,
# ml/wrappers.py SynapseML/LightGBM/XGBoost parity per SURVEY §7.4(3));
# the per-round check records which are present so the skip-marked
# genuine-package tests' status is explainable from the committed log.
VENDOR_PACKAGES = ("synapse.ml", "lightgbm", "xgboost", "luigi", "bayes_opt")

VENDOR_CHECK = r"""
import importlib.util
for name in {pkgs!r}:
    try:
        spec = importlib.util.find_spec(name)
    except ModuleNotFoundError:  # absent parent of a dotted name
        spec = None
    print(f"vendored {{name}}: {{'PRESENT' if spec else 'absent'}}")
"""


def run() -> int:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/usr/lib/python3/dist-packages"
    steps: list[tuple[str, list[str], dict]] = [
        (
            "pip install -e . --no-deps --no-build-isolation",
            [
                sys.executable,
                "-m",
                "pip",
                "install",
                "-e",
                ".",
                "--no-deps",
                "--no-build-isolation",
            ],
            {"cwd": REPO, "env": env},
        ),
        (
            "import from installed copy (cwd=/tmp, repo stripped)",
            [sys.executable, "-c", IMPORT_CHECK.format(repo=REPO)],
            {"cwd": "/tmp"},
        ),
        (
            "vendored-package check (env-gated delegation targets)",
            [sys.executable, "-c", VENDOR_CHECK.format(pkgs=VENDOR_PACKAGES)],
            {"cwd": "/tmp"},
        ),
    ]
    lines = []
    code = 0
    for title, cmd, kw in steps:
        proc = subprocess.run(cmd, capture_output=True, text=True, **kw)
        lines.append(f"$ {title}\n{redact(proc.stdout + proc.stderr)}")
        if proc.returncode != 0:
            lines.append(f"FAILED (exit {proc.returncode})")
            code = proc.returncode
            break
    else:
        lines.append("OK: editable install imports without repo sys.path")
    with open(LOG, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return code


if __name__ == "__main__":
    sys.exit(run())
