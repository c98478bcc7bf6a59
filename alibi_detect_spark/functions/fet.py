"""Online Fisher exact test for Bernoulli streams — pure-NumPy recast of
``alibi_detect/cd/fet_online.py:12-325`` (scipy-free: the hypergeometric
survival function is computed from log-factorial tables instead of
``scipy.stats.hypergeom``).

Semantics preserved:

- stat per window (``alternative='greater'``) = ``1 − hypergeom.cdf(sum_ref,
  n+w, sum_ref+sum_win, n)`` ≡ ``P[X < sum_win]`` for the window draw
  (``fet_online.py:299-311``), EWMA-smoothed with ``lam`` FROM THE FIRST
  FULL-WINDOW STAT (``:225-233``: the reference applies ``_exp_moving_avg``
  starting at index ``ws−1``; earlier outputs stay NaN — no zero-damping).
- multiple simultaneous window sizes (``cd/base_online.py:221``): per-window
  stats, drift when the max over windows exceeds the per-step threshold
  (``fet_online.py:252-282``).
- thresholds configured by simulating ``n_bootstraps`` Bernoulli streams with
  the reference success rate (FET thresholds DEPEND on the reference bits,
  unlike CVM), per-step conditional ``(1−1/ert)`` type-6 non-interpolated
  quantiles of the max-over-windows stat with exceeded streams discarded
  (``fet_online.py:134-223``; quantile spec at ``:177``). Randomized
  tie-breaking via a sub-pmf-scale uniform jitter of the discrete stats — the
  engine's deterministic analog of the reference's ``permit_probs``.
- threshold indexing by RAW stream time: NaN before ``min(window_sizes)−1``,
  lookups clamp at ``t_max = 2·max(window_sizes)−1`` (``fet_online.py:108-113``).

Engine placement: fit on the driver or per key (seeded by key, not task
order), broadcast; scoring runs inside per-source ordered ``applyInPandas``.
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
    (k, n_success) pairs. pmf terms summed SEQUENTIALLY in ascending-x order —
    the same fold order as a SQL ``list_reduce``, so the DuckDB oracle twin
    reproduces the sum to the last ulp modulo libm differences."""
    k = np.asarray(k, dtype=np.int64)
    n_success = np.asarray(n_success, dtype=np.int64)
    lf = _lfact(m)

    def one(ki, Ki):
        lo = max(ki, max(0, Ki + n_draw - m))
        hi = min(Ki, n_draw)
        if lo > hi:
            return 0.0
        acc = 0.0
        for x in range(lo, hi + 1):
            logp = (
                lf[Ki] - lf[x] - lf[Ki - x]
                + lf[m - Ki] - lf[n_draw - x] - lf[m - Ki - (n_draw - x)]
                - (lf[m] - lf[n_draw] - lf[m - n_draw])
            )
            acc = acc + float(np.exp(logp))
        return acc

    # window sums take few distinct values on long streams — compute each
    # distinct (k, K) pair once. Pairs are encoded as single ints so the
    # dedup is a 1-D unique (np.unique(axis=0)'s row argsort dominated the
    # threshold-table build at 199 fits); the decode feeds the identical
    # per-pair computation, so outputs are bit-unchanged.
    enc = k.ravel() * np.int64(m + 1) + n_success.ravel()
    uenc, inverse = np.unique(enc, return_inverse=True)
    vals = np.array([one(int(e // (m + 1)), int(e % (m + 1))) for e in uenc])
    return vals[inverse].reshape(k.shape)


def _window_sums(seq: np.ndarray, w: int) -> np.ndarray:
    """Sliding sums of the last ``w`` entries at each position (NaN-free int
    math); positions with fewer than ``w`` entries return -1."""
    c = np.concatenate([[0], np.cumsum(seq)])
    out = np.full(seq.shape[0], -1, dtype=np.int64)
    if seq.shape[0] >= w:
        out[w - 1:] = c[w:] - c[:-w]
    return out


@dataclass
class OnlineFET:
    """Fitted online-FET config — broadcastable."""

    ert: float
    window_sizes: tuple[int, ...]
    n_bootstraps: int = 2000
    seed: int = 0
    lam: float = 0.99  # EWMA smoothing of stats, reference default cd/fet_online.py:64
    n_ref: int = 0
    sum_ref: int = 0
    thresholds: np.ndarray = field(default=None, repr=False)

    @property
    def window_size(self) -> int:
        return self.window_sizes[0]

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int | None = None,
        window_sizes: tuple[int, ...] | None = None,
        n_bootstraps: int = 2000,
        seed: int = 0,
        lam: float = 0.99,
        t_max: int | None = None,
    ) -> "OnlineFET":
        if window_sizes is None:
            window_sizes = (int(window_size),)
        window_sizes = tuple(int(w) for w in window_sizes)
        x_ref = np.asarray(x_ref).ravel()
        if not np.isin(x_ref, [0, 1]).all():
            raise ValueError("FET requires a Bernoulli (0/1) stream")
        n_ref, sum_ref = int(x_ref.shape[0]), int(x_ref.sum())
        max_ws, min_ws = max(window_sizes), min(window_sizes)
        t_max = t_max or 2 * max_ws - 1
        rng = np.random.default_rng(seed)
        p_hat = sum_ref / n_ref

        # simulate streams (fet_online.py:196-223), score all windows,
        # conditional quantiles on the max-over-windows stat
        streams = (rng.random((n_bootstraps, t_max)) < p_hat).astype(np.int64)
        cs = np.concatenate(
            [np.zeros((n_bootstraps, 1), dtype=np.int64), np.cumsum(streams, axis=1)], axis=1
        )
        stats = np.full((n_bootstraps, t_max, len(window_sizes)), np.nan)
        for j, w in enumerate(window_sizes):
            ws = cs[:, w:] - cs[:, :-w]  # [B, t_max-w+1], windows ending at t>=w-1
            sf = hypergeom_sf_ge(ws, n_ref + w, sum_ref + ws, w)
            raw = 1.0 - sf
            # randomized tie-breaking (permit_probs analog): jitter below pmf scale
            raw = raw + rng.random(raw.shape) * 1e-9
            stats[:, w - 1:, j] = ewma(raw, lam)

        # max over windows; columns before min_ws-1 are all-NaN and never read
        max_stats = np.full((n_bootstraps, t_max), np.nan)
        max_stats[:, min_ws - 1:] = np.nanmax(stats[:, min_ws - 1:, :], axis=-1)
        thresholds = np.full(t_max, np.nan)
        fpr = 1.0 / ert
        for t in range(min_ws - 1, t_max):
            s = max_stats[:, t]
            if s.size < 2:
                thresholds[t:] = thresholds[t - 1] if t > min_ws - 1 else np.inf
                break
            p = min(1.0 - fpr, (s.size - 1) / s.size)
            # reference quantile spec: type 6, non-interpolated (fet_online.py:177)
            thresholds[t] = quantile(s, max(p, 1.0 / s.size), qtype=6, interpolate=False)
            max_stats = max_stats[s < thresholds[t]]
        return cls(
            ert=ert,
            window_sizes=window_sizes,
            n_bootstraps=n_bootstraps,
            seed=seed,
            lam=lam,
            n_ref=n_ref,
            sum_ref=sum_ref,
            thresholds=thresholds,
        )

    def score_stream(
        self,
        xs: np.ndarray,
        t0: int = 0,
        carry: "float | np.ndarray | None" = None,
        warm: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Score an ordered 0/1 batch. Returns ``(stats [n, n_windows],
        thresholds [n], is_drift [n], resume carry {'t', 'ewma', 'tail'})``.
        ``warm`` is the last ``max(ws)−1`` points of the previous chunk;
        ``carry`` the per-window EWMA state (scalar accepted for one window)."""
        xs = np.asarray(xs, dtype=np.int64).ravel()
        n = xs.shape[0]
        max_ws = max(self.window_sizes)
        pre = np.zeros(0, dtype=np.int64) if warm is None else np.asarray(warm, dtype=np.int64)
        seq = np.concatenate([pre, xs])
        t = t0 + np.arange(1, n + 1)
        stats = np.full((n, len(self.window_sizes)), np.nan)
        carry_arr = np.full(len(self.window_sizes), np.nan)
        if carry is not None:
            carry_arr[:] = np.asarray(carry, dtype=np.float64).ravel()
        new_carry = carry_arr.copy()
        for j, w in enumerate(self.window_sizes):
            sums = _window_sums(seq, w)[len(pre):]
            have = (t >= w) & (sums >= 0)
            if not have.any():
                continue
            sf = hypergeom_sf_ge(sums[have], self.n_ref + w, self.sum_ref + sums[have], w)
            raw = 1.0 - sf
            c = None if np.isnan(carry_arr[j]) else float(carry_arr[j])
            # EWMA starts at the first full-window stat (reference
            # _exp_moving_avg applied from index ws-1); earlier outputs NaN
            stats[have, j] = ewma(raw, self.lam, carry=c)
            new_carry[j] = stats[have, j][-1]
        thr = self.thresholds[np.minimum(t - 1, len(self.thresholds) - 1)]
        with np.errstate(invalid="ignore"):
            max_stat = np.full(n, np.nan)
            any_fin = ~np.isnan(stats).all(axis=1)
            max_stat[any_fin] = np.nanmax(stats[any_fin], axis=1)
        drift = ((max_stat > thr) & ~np.isnan(max_stat) & ~np.isnan(thr)).astype(np.int32)
        tail = seq[-(max_ws - 1):] if max_ws > 1 else seq[:0]
        return stats, thr, drift, {
            "t": int(t[-1]) if n else t0,
            "ewma": new_carry,
            "tail": tail,
        }
