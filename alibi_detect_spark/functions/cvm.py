"""Online Cramér–von Mises drift detection — pure-NumPy recast of
``alibi_detect/cd/cvm_online.py:11-313``.

Semantics preserved:

- per-step statistic for window size w at time t (window = last w points):
  the two-sample CVM statistic between the reference and the sliding window,
  computed from joint ECDFs (``cvm_online.py:212-242``, ``_ids_to_stats``
  ``:279-313``), normalised per Anderson's expectation/variance
  (``_normalise_stats :267-276``).
- thresholds are distribution-free: simulate seeded standard-normal streams,
  score them the same way, take per-step conditional ``(1−1/ert)`` quantiles
  discarding exceeded streams (``cvm_online.py:108-168``).

The quadratic-in-window work per step is vectorized over the batch; the
engine runs this inside the per-source ordered ``applyInPandas``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .quantile import quantile


def _cvm_stat_windows(ref: np.ndarray, seq: np.ndarray, w: int) -> np.ndarray:
    """Normalised two-sample CVM stat of each length-w sliding window of
    ``seq`` vs ``ref``. Returns stats aligned to window END positions
    (NaN before the first full window)."""
    n = ref.shape[0]
    m = len(seq)
    out = np.full(m, np.nan)
    if m < w:
        return out
    ref_s = np.sort(ref)
    # Anderson normalisation for two samples of sizes (n, w)
    nm = n * w
    tot = n + w
    mean = 1.0 / 6.0 + 1.0 / (6.0 * tot)
    var = (tot + 1.0) * (4.0 * nm * tot - 3.0 * (n * n + w * w) - 2.0 * nm)
    var /= 45.0 * tot * tot * 4.0 * nm
    for end in range(w - 1, m):
        win = seq[end - w + 1 : end + 1]
        win_s = np.sort(win)
        pooled = np.concatenate([ref_s, win_s])
        # ECDFs at every pooled point (right-continuous)
        f_ref = np.searchsorted(ref_s, pooled, side="right") / n
        f_win = np.searchsorted(win_s, pooled, side="right") / w
        # CVM = nm/(n+w)^2 * Σ over pooled points of (F_ref − F_win)²
        t_stat = nm / (tot * tot) * np.sum((f_ref - f_win) ** 2)
        out[end] = (t_stat / (n * w / tot) - mean) / np.sqrt(var)
    return out


@dataclass
class OnlineCVM:
    """Fitted online-CVM config (single window size) — broadcastable."""

    ert: float
    window_size: int
    n_bootstraps: int = 1000
    seed: int = 0
    x_ref: np.ndarray = field(default=None, repr=False)
    thresholds: np.ndarray = field(default=None, repr=False)

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int,
        n_bootstraps: int = 1000,
        seed: int = 0,
        t_max: int | None = None,
    ) -> "OnlineCVM":
        x_ref = np.asarray(x_ref, dtype=np.float64).ravel()
        w = window_size
        n = x_ref.shape[0]
        t_max = t_max or 2 * int(ert)
        rng = np.random.default_rng(seed)
        # distribution-free: thresholds from standard-normal streams with a
        # standard-normal "reference" of the same size (cvm_online.py:145-168)
        fpr = 1.0 / ert
        stats = np.empty((n_bootstraps, t_max))
        for b in range(n_bootstraps):
            ref_sim = rng.standard_normal(n)
            seq_sim = rng.standard_normal(t_max + w - 1)
            s = _cvm_stat_windows(ref_sim, seq_sim, w)
            stats[b] = s[w - 1 :][:t_max]
        thresholds = np.empty(t_max)
        alive = np.ones(n_bootstraps, dtype=bool)
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
            x_ref=x_ref,
            thresholds=thresholds,
        )

    def score_stream(
        self, xs: np.ndarray, t0: int = 0, warm: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Score an ordered batch; ``warm`` = last w−1 points of the previous
        chunk. Returns (stats, thresholds, is_drift, resume carry)."""
        xs = np.asarray(xs, dtype=np.float64).ravel()
        w = self.window_size
        pre = warm if warm is not None else np.zeros(0)
        seq = np.concatenate([pre, xs])
        all_stats = _cvm_stat_windows(self.x_ref, seq, w)
        stats = all_stats[len(pre):]
        n = xs.shape[0]
        t = t0 + np.arange(1, n + 1)
        thr = self.thresholds[np.minimum(t - 1, len(self.thresholds) - 1)]
        drift = ((stats > thr) & ~np.isnan(stats)).astype(np.int32)
        tail = seq[-(w - 1):] if w > 1 else np.zeros(0)
        return stats, thr, drift, {"t": int(t[-1]) if n else t0, "tail": tail}
