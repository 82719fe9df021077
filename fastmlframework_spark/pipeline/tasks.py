"""Minimal Luigi-compatible task engine.

The reference orchestrates everything with Luigi (README.md:65-69;
solution_pipeline/create_solution.py:32-819): tasks declare
``requires()`` and file ``output()`` targets; a task whose target
exists is skipped (target-based memoization, O8 — e.g.
create_solution.py:67-69/:170-171).  ``luigi`` is not installed in
this environment, so this module implements the same contract —
``Task.requires() / output() / run()``, ``LocalTarget.exists()``,
``build([...])`` — as ~100 lines of driver-side Python.  When real
Luigi is importable the same Task subclasses can be ported 1:1 (the
API surface is deliberately identical).

This is pure driver-side control flow: each task body launches Spark
jobs; the IR between tasks is files (Parquet dirs / JSON), exactly the
reference's file-IR design (§3.1 step 4) with CSV/pickle swapped for
Parquet/config-reconstruction (S5 note).
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterable


class LocalTarget:
    """Luigi ``LocalTarget`` analogue.  For Parquet directories the
    existence check is the ``_SUCCESS`` marker (atomic-commit
    semantics of Spark's file sink), not the bare directory."""

    def __init__(self, path: str, parquet_dir: bool = False):
        self.path = path
        self.parquet_dir = parquet_dir

    def exists(self) -> bool:
        if self.parquet_dir:
            return os.path.exists(os.path.join(self.path, "_SUCCESS"))
        return os.path.exists(self.path)

    def __repr__(self) -> str:  # pragma: no cover
        return f"LocalTarget({self.path!r})"


class Task:
    """Luigi ``Task`` analogue.  Subclasses override ``requires()``
    (upstream tasks), ``output()`` (one target or a list), ``run()``."""

    def requires(self) -> "Task | Iterable[Task] | None":
        return None

    def output(self) -> LocalTarget | list[LocalTarget]:
        raise NotImplementedError

    def run(self) -> None:
        raise NotImplementedError

    # -- engine helpers -------------------------------------------------

    def _outputs(self) -> list[LocalTarget]:
        out = self.output()
        return list(out) if isinstance(out, (list, tuple)) else [out]

    def complete(self) -> bool:
        """O8: a task is complete iff every output target exists."""
        outs = self._outputs()
        return bool(outs) and all(t.exists() for t in outs)

    def _requires(self) -> list["Task"]:
        req = self.requires()
        if req is None:
            return []
        return list(req) if isinstance(req, (list, tuple)) else [req]

    def task_id(self) -> str:
        outs = ";".join(t.path for t in self._outputs())
        return f"{type(self).__name__}[{outs}]"


class DAGError(RuntimeError):
    pass


def build(
    tasks: Iterable[Task],
    *,
    force: bool = False,
    workers: int = 1,
    timings: dict[str, float] | None = None,
) -> list[str]:
    """Run the closure of ``tasks`` in dependency order, skipping
    complete tasks (unless ``force``).  Returns the ids of tasks that
    actually ran.  Equivalent of ``luigi.build(..., local_scheduler=
    True)`` (create_solution.py:822-824).

    ``workers > 1`` runs independent tasks of the same topological
    level concurrently on a thread pool — Luigi's ``workers=N`` fan-out
    (O4: one prediction task per model).  Spark job submission is
    thread-safe; concurrent tasks become concurrently-scheduled job
    chains on the shared session, which is exactly how independent
    model fits should share a cluster.

    ``timings``: pass a dict to receive per-task wall seconds for
    every task that ran (tools/bench_pipeline.py's breakdown)."""
    # Discover the closure + dependency edges (cycle-checked).
    nodes: dict[str, Task] = {}
    deps: dict[str, list[str]] = {}
    in_progress: set[str] = set()

    def visit(task: Task) -> None:
        tid = task.task_id()
        if tid in nodes:
            return
        if tid in in_progress:
            raise DAGError(f"dependency cycle through {tid}")
        in_progress.add(tid)
        req = task._requires()
        for dep in req:
            visit(dep)
        nodes[tid] = task
        deps[tid] = [d.task_id() for d in req]
        in_progress.discard(tid)

    for t in tasks:
        visit(t)

    ran: list[str] = []
    done: set[str] = set()

    def run_one(tid: str) -> str | None:
        task = nodes[tid]
        if not force and task.complete():
            return None
        t0 = time.perf_counter()
        task.run()
        if timings is not None:
            timings[tid] = round(time.perf_counter() - t0, 4)
        if not task.complete():
            raise DAGError(f"{tid} ran but its output targets do not exist")
        return tid

    while len(done) < len(nodes):
        ready = [
            tid
            for tid in nodes
            if tid not in done and all(d in done for d in deps[tid])
        ]
        if not ready:  # pragma: no cover - cycle guard above prevents this
            raise DAGError("no runnable tasks but DAG incomplete")
        if workers > 1 and len(ready) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(run_one, ready))
        else:
            results = [run_one(tid) for tid in ready]
        ran.extend(r for r in results if r is not None)
        done.update(ready)
    return ran
