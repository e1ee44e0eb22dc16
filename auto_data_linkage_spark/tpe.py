"""Dependency-free Tree-structured Parzen Estimator (TPE) — the
sequential model-based sampler the reference drives its search with
(autolinker.py:818-825: hyperopt ``fmin(..., algo=tpe.suggest)`` over the
space built at autolinker.py:338-364).

Hyperopt factorizes a nested choice space into per-dimension 1-D
estimators (Bergstra et al., "Algorithms for Hyper-Parameter
Optimization", NeurIPS 2011): observations are split into the top-γ
*good* set and the rest, each dimension models l(x) over good and g(x)
over bad, and the next point maximizes l/g over a candidate draw from
l. This module implements exactly that recipe for the three dimension
kinds the space uses — categorical, uniform, quantized-uniform — plus
hyperopt's conditional-dimension rule (a threshold dimension only
learns from trials where its distance function was active).

Driver-side only: sampling cost is microseconds per trial against
Spark-job trial evaluations — identical cost profile to the reference's
sequential-in-driver hyperopt.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Categorical:
    options: tuple

    def sample(self, rng: random.Random):
        return rng.choice(self.options)


@dataclass(frozen=True)
class Uniform:
    lo: float
    hi: float

    def sample(self, rng: random.Random) -> float:
        return rng.uniform(self.lo, self.hi)


@dataclass(frozen=True)
class QUniform:
    """Uniform over {lo, lo+q, ..., hi} (hyperopt ``hp.quniform``)."""

    lo: float
    hi: float
    q: float = 1.0

    def sample(self, rng: random.Random) -> float:
        return self._round(rng.uniform(self.lo, self.hi))

    def _round(self, x: float) -> float:
        return min(self.hi, max(self.lo, round(x / self.q) * self.q))


@dataclass
class _Observation:
    params: dict
    score: float  # higher is better


class TPESampler:
    """suggest()/observe() loop over a flat dict of named dimensions.

    ``space`` maps name → Categorical | Uniform | QUniform. A trial's
    ``params`` dict may omit dimensions that were inactive (conditional
    branches); each dimension learns only from trials where it appears.

    - first ``n_startup`` trials: pure random (hyperopt's startup jitter),
    - after: split observations at the γ quantile of score, draw
      ``n_candidates`` from l per dimension, keep the argmax of l/g.

    Deterministic under ``seed``.
    """

    def __init__(
        self,
        space: dict,
        *,
        seed: int = 42,
        gamma: float = 0.25,
        n_startup: int = 20,
        n_candidates: int = 24,
    ):
        self.space = dict(space)
        self.rng = random.Random(seed)
        self.gamma = gamma
        self.n_startup = n_startup
        self.n_candidates = n_candidates
        self._obs: list[_Observation] = []

    # ------------------------------------------------------------- public
    def suggest(self) -> dict:
        """Propose values for EVERY dimension (the caller applies its own
        conditionality when consuming, and reports back only the active
        subset via observe())."""
        if len(self._obs) < self.n_startup:
            return {k: d.sample(self.rng) for k, d in self.space.items()}
        good, bad = self._split()
        out = {}
        for name, dim in self.space.items():
            g_vals = [o.params[name] for o in good if name in o.params]
            b_vals = [o.params[name] for o in bad if name in o.params]
            if not g_vals:
                out[name] = dim.sample(self.rng)
            elif isinstance(dim, Categorical):
                out[name] = self._suggest_cat(dim, g_vals, b_vals)
            else:
                out[name] = self._suggest_num(dim, g_vals, b_vals)
        return out

    def observe(self, params: dict, score: float) -> None:
        """Record a finished trial (only its ACTIVE dimensions)."""
        self._obs.append(_Observation(dict(params), float(score)))

    # ------------------------------------------------------------ internal
    def _split(self) -> tuple[list[_Observation], list[_Observation]]:
        ranked = sorted(self._obs, key=lambda o: -o.score)
        n_good = max(1, math.ceil(self.gamma * len(ranked)))
        return ranked[:n_good], ranked[n_good:]

    def _suggest_cat(self, dim: Categorical, good: list, bad: list):
        # smoothed frequency estimators (hyperopt's categorical posterior:
        # prior weight 1 on every option)
        def dens(vals):
            counts = {o: 1.0 for o in dim.options}
            for v in vals:
                counts[v] = counts.get(v, 1.0) + 1.0
            total = sum(counts.values())
            return {o: c / total for o, c in counts.items()}

        l, g = dens(good), dens(bad)
        opts = list(dim.options)
        weights = [l[o] for o in opts]
        best, best_ratio = None, -1.0
        for _ in range(self.n_candidates):
            c = self.rng.choices(opts, weights=weights, k=1)[0]
            ratio = l[c] / max(g[c], 1e-12)
            if ratio > best_ratio:
                best, best_ratio = c, ratio
        return best

    def _suggest_num(self, dim, good: list, bad: list):
        lo, hi = float(dim.lo), float(dim.hi)
        l_mix = _parzen(good, lo, hi)
        g_mix = _parzen(bad, lo, hi)
        best, best_ratio = None, -1.0
        for _ in range(self.n_candidates):
            mu, sigma = self.rng.choice(l_mix)
            x = min(hi, max(lo, self.rng.gauss(mu, sigma)))
            if isinstance(dim, QUniform):
                x = dim._round(x)
            ratio = _mix_pdf(l_mix, x) / max(_mix_pdf(g_mix, x), 1e-12)
            if ratio > best_ratio:
                best, best_ratio = x, ratio
        return best


def _parzen(vals: list, lo: float, hi: float) -> list[tuple[float, float]]:
    """Adaptive-width Gaussian mixture over observed points plus the
    range-wide prior component (hyperopt's adaptive Parzen estimator:
    each point's bandwidth is its max neighbor gap, clipped to
    [range/min(100,n+2), range])."""
    span = max(hi - lo, 1e-12)
    pts = sorted(float(v) for v in vals)
    if not pts:
        return [((lo + hi) / 2.0, span)]
    mix: list[tuple[float, float]] = [((lo + hi) / 2.0, span)]  # prior
    min_bw = span / min(100.0, float(len(pts) + 2))
    for i, p in enumerate(pts):
        left = pts[i - 1] if i > 0 else lo
        right = pts[i + 1] if i + 1 < len(pts) else hi
        bw = max(p - left, right - p, min_bw)
        mix.append((p, min(bw, span)))
    return mix


def _mix_pdf(mix: list[tuple[float, float]], x: float) -> float:
    total = 0.0
    for mu, sigma in mix:
        z = (x - mu) / sigma
        total += math.exp(-0.5 * z * z) / (sigma * math.sqrt(2 * math.pi))
    return total / len(mix)
