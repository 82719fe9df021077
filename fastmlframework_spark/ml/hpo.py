"""Driver-side hyper-parameter optimization (SURVEY.md §2.9 M13).

Reference behavior: BayesianOptimization(f=cv_objective).maximize(
init_points, n_iter) over pbounds, history kept as a table —
modeling/hyper_parameters_optimization.py:100-160.

``bayes_opt`` is not available in this environment, so the same
sequential maximize contract is provided by a deterministic
explore/exploit search: ``init_points`` Latin-ish random probes of the
bounds, then ``n_iter`` rounds of Gaussian exploitation around the
incumbent with a shrinking step (a Bayesian-optimization stand-in
with identical call/result shape).  If ``bayes_opt`` IS importable we
delegate to it, matching the reference exactly.

The optimization loop is inherently sequential (each proposal depends
on history); parallelism belongs INSIDE the objective — each probe is
a full Spark CV run (SURVEY.md §4: parallelize the inner CV, not the
BO loop).
"""

from __future__ import annotations

import random
from collections.abc import Callable, Mapping
from dataclasses import dataclass

try:  # pragma: no cover - not installed in the build environment
    from bayes_opt import BayesianOptimization  # type: ignore

    _HAS_BAYES_OPT = True
except ImportError:
    _HAS_BAYES_OPT = False


@dataclass
class HPOResult:
    best_params: dict[str, float]
    best_score: float
    history: list[dict]  # [{'params': {...}, 'score': s}, ...]


def maximize(
    objective: Callable[..., float],
    pbounds: Mapping[str, tuple[float, float]],
    init_points: int = 5,
    n_iter: int = 15,
    seed: int = 27,
) -> HPOResult:
    """M13: maximize ``objective(**params)`` over box bounds."""
    if _HAS_BAYES_OPT:  # pragma: no cover
        opt = BayesianOptimization(
            f=objective, pbounds=dict(pbounds), random_state=seed, verbose=0
        )
        opt.maximize(init_points=init_points, n_iter=n_iter)
        history = [
            {"params": r["params"], "score": r["target"]} for r in opt.res
        ]
        return HPOResult(
            best_params=dict(opt.max["params"]),
            best_score=float(opt.max["target"]),
            history=history,
        )

    rng = random.Random(seed)
    names = sorted(pbounds)
    history: list[dict] = []
    best_params: dict[str, float] | None = None
    best_score = float("-inf")

    def probe(params: dict[str, float]) -> None:
        nonlocal best_params, best_score
        score = float(objective(**params))
        history.append({"params": dict(params), "score": score})
        if score > best_score:
            best_score, best_params = score, dict(params)

    for _ in range(max(init_points, 1)):
        probe({n: rng.uniform(*pbounds[n]) for n in names})

    for i in range(n_iter):
        frac = 1.0 - i / max(n_iter, 1)  # shrinking exploitation radius
        cand = {}
        for n in names:
            lo, hi = pbounds[n]
            sigma = (hi - lo) * 0.2 * frac
            val = rng.gauss(best_params[n], sigma)
            cand[n] = min(max(val, lo), hi)
        probe(cand)

    return HPOResult(
        best_params=best_params, best_score=best_score, history=history
    )
