"""Online Fisher exact test for Bernoulli streams — pure-NumPy recast of
``alibi_detect/cd/fet_online.py:12-325`` (scipy-free: the hypergeometric
survival function is computed from log-factorial tables instead of
``scipy.stats.hypergeom``).

Semantics preserved:

- stat per window = ``1 − hypergeom.cdf(sum_win − 1, n_ref + w, sum_ref +
  sum_win, w)`` (p-value of seeing ≥ sum_win successes in the window under
  exchangeability with the reference; ``fet_online.py:299-311``), optionally
  EWMA-smoothed with ``lam`` (``:225-233, :284-325``).
- thresholds configured by simulating ``n_bootstraps`` Bernoulli streams with
  the reference success rate, seeded, taking per-step conditional
  ``(1−1/ert)`` quantiles with exceeded streams discarded
  (``fet_online.py:134-223``). Randomized tie-breaking via uniform
  perturbation of the discrete stats (``permit_probs`` analog).

Engine placement: fit on the driver (seeded), broadcast; scoring runs inside
the per-source ordered ``applyInPandas`` like the other online detectors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .ewma import ewma
from .quantile import quantile


def _lfact(n: int) -> np.ndarray:
    """log k! for k = 0..n via cumulative log sum (exact enough for p-values)."""
    out = np.zeros(n + 1)
    if n > 0:
        out[1:] = np.cumsum(np.log(np.arange(1, n + 1, dtype=np.float64)))
    return out


def hypergeom_sf_ge(k: np.ndarray, m: int, n_success: np.ndarray, n_draw: int) -> np.ndarray:
    """P[X ≥ k] for X ~ Hypergeom(M=m, K=n_success, N=n_draw), vectorized over
    (k, n_success) pairs. Computed by summing pmf terms in log space."""
    k = np.asarray(k, dtype=np.int64)
    n_success = np.asarray(n_success, dtype=np.int64)
    lf = _lfact(m)

    def one(ki, Ki):
        lo = max(ki, max(0, Ki + n_draw - m))
        hi = min(Ki, n_draw)
        if lo > hi:
            return 0.0
        x = np.arange(lo, hi + 1)
        logp = (
            lf[Ki] - lf[x] - lf[Ki - x]
            + lf[m - Ki] - lf[n_draw - x] - lf[m - Ki - (n_draw - x)]
            - (lf[m] - lf[n_draw] - lf[m - n_draw])
        )
        return float(np.exp(logp).sum())

    # window sums take few distinct values on long streams — compute each
    # distinct (k, K) pair once
    pairs = np.stack([k.ravel(), n_success.ravel()], axis=1)
    uniq, inverse = np.unique(pairs, axis=0, return_inverse=True)
    vals = np.array([one(ki, Ki) for ki, Ki in uniq])
    return vals[inverse].reshape(k.shape)


@dataclass
class OnlineFET:
    """Fitted online-FET config (single window size) — broadcastable."""

    ert: float
    window_size: int
    n_bootstraps: int = 2000
    seed: int = 0
    lam: float = 0.99  # EWMA smoothing of stats, reference default cd/fet_online.py:64
    n_ref: int = 0
    sum_ref: int = 0
    thresholds: np.ndarray = field(default=None, repr=False)

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int,
        n_bootstraps: int = 2000,
        seed: int = 0,
        lam: float = 0.99,
        t_max: int | None = None,
    ) -> "OnlineFET":
        x_ref = np.asarray(x_ref).ravel()
        if not np.isin(x_ref, [0, 1]).all():
            raise ValueError("FET requires a Bernoulli (0/1) stream")
        n_ref, sum_ref = int(x_ref.shape[0]), int(x_ref.sum())
        w = window_size
        t_max = t_max or 2 * int(ert)
        rng = np.random.default_rng(seed)
        p_hat = sum_ref / n_ref

        # simulate streams (fet_online.py:196-223), score them, conditional quantiles
        streams = (rng.random((n_bootstraps, t_max + w)) < p_hat).astype(np.int64)
        win_sums = np.cumsum(streams, axis=1)
        win_sums = win_sums[:, w:] - win_sums[:, :-w]  # sliding sums, [B, t_max]
        sf = hypergeom_sf_ge(win_sums, n_ref + w, sum_ref + win_sums, w)
        stats = 1.0 - sf  # large when window has MORE successes than expected
        # randomized tie-breaking (permit_probs analog): jitter below pmf scale
        stats = stats + rng.random(stats.shape) * 1e-9
        stats = ewma(stats, lam)

        thresholds = np.empty(t_max)
        alive = np.ones(n_bootstraps, dtype=bool)
        fpr = 1.0 / ert
        for t in range(t_max):
            s = stats[alive, t]
            if s.size < 2:
                # too few surviving streams to estimate a quantile — clamp to
                # the last threshold (the scoring lookup clamps too)
                thresholds[t:] = thresholds[t - 1] if t else np.inf
                break
            p = min(1.0 - fpr, (s.size - 1) / s.size)
            thresholds[t] = quantile(s, max(p, 1.0 / s.size), qtype=7)
            alive[alive] = s < thresholds[t]
        return cls(
            ert=ert,
            window_size=w,
            n_bootstraps=n_bootstraps,
            seed=seed,
            lam=lam,
            n_ref=n_ref,
            sum_ref=sum_ref,
            thresholds=thresholds,
        )

    def score_stream(
        self, xs: np.ndarray, t0: int = 0, carry: float | None = None, warm: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Score an ordered 0/1 batch. Returns (stats, thresholds, is_drift,
        resume carry {'t', 'ewma', 'tail'}). ``warm`` is the last w−1 points
        of the previous chunk."""
        xs = np.asarray(xs, dtype=np.int64).ravel()
        w = self.window_size
        pre = warm if warm is not None else np.zeros(0, dtype=np.int64)
        seq = np.concatenate([pre, xs])
        c = np.cumsum(np.concatenate([[0], seq]))
        n = xs.shape[0]
        stats = np.full(n, np.nan)
        # window sums for positions where a full window exists
        idx = np.arange(len(pre), len(seq))
        have = idx >= w - 1
        if have.any():
            ws = c[idx[have] + 1] - c[idx[have] + 1 - w]
            sf = hypergeom_sf_ge(ws, self.n_ref + w, self.sum_ref + ws, w)
            stats[have] = 1.0 - sf
        sm = ewma(np.nan_to_num(stats, nan=0.0), self.lam, carry=carry)
        t = t0 + np.arange(1, n + 1)
        thr = self.thresholds[np.minimum(t - 1, len(self.thresholds) - 1)]
        drift = (sm > thr).astype(np.int32)
        tail = seq[-(w - 1):] if w > 1 else np.zeros(0, dtype=np.int64)
        return sm, thr, drift, {"t": int(t[-1]) if n else t0, "ewma": float(sm[-1]) if n else carry, "tail": tail}
