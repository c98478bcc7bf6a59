"""Online MMD drift detection — pure-NumPy recast of the reference's
``MMDDriftOnline`` (``alibi_detect/cd/pytorch/mmd_online.py:13-230`` and
``cd/base_online.py:27-209``).

Semantics preserved:

- Gaussian RBF kernel ``k(x,y) = exp(-‖x−y‖²/(2σ²))`` with the median
  heuristic of ``utils/pytorch/kernels.py:9-30`` (σ² = half the median of the
  pairwise squared distances, diagonal-aware offset).
- Fit-time (driver-side, seeded): full ref kernel matrix; ``n_bootstraps``
  permutation splits into sub-ref + extended test window; per-step conditional
  ``(1 − 1/ert)``-quantile thresholds with exceeded streams discarded
  (``mmd_online.py:134-192``), using the exact type-7 quantile
  (``utils/misc.py``); ref split retried until no initial detection
  (``mmd_online.py:110-132``).
- Per-step statistic ``MMD² = k_xx_sub_sum + Σ zero_diag(k_yy)/(W(W−1)) −
  2·mean(k_xy)`` over a FIFO test window (``mmd_online.py:194-230``);
  threshold lookup clamps at ``t ≥ W`` (``base_online.py:131-144``).

The engine runs :meth:`OnlineMMD.score_stream` inside a per-source ordered
``applyInPandas``; the whole fitted config (ref subset, k_xx_sub_sum,
thresholds) is computed ONCE on the driver and broadcast, so distribution
cannot perturb RNG order. Resume state is ``(t, test_window)`` — ``k_xy`` is
a deterministic function of those and is rebuilt on restore.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .quantile import quantile


def squared_pairwise_distance(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """‖x−y‖² via the expansion trick, clamped at 0
    (cf. ``utils/pytorch/distance.py:10-30``)."""
    x2 = np.einsum("ij,ij->i", x, x)[:, None]
    y2 = np.einsum("ij,ij->i", y, y)[None, :]
    d = x2 + y2 - 2.0 * (x @ y.T)
    return np.maximum(d, 0.0)


def median_heuristic_sigma(x: np.ndarray, y: np.ndarray, dist2: np.ndarray) -> float:
    """Median-heuristic bandwidth (``utils/pytorch/kernels.py:9-30``)."""
    n = min(x.shape[0], y.shape[0])
    shared = n if (x.shape == y.shape and np.array_equal(x[:n], y[:n])) else 0
    n_median = shared + (dist2.size - shared) // 2 - 1
    return float(np.sqrt(0.5 * np.sort(dist2.ravel())[int(n_median)]))


def rbf_kernel(x: np.ndarray, y: np.ndarray, sigma: float) -> np.ndarray:
    d2 = squared_pairwise_distance(x, y)
    return np.exp(-d2 / (2.0 * sigma**2))


def _zero_diag_sum(k: np.ndarray) -> float:
    return float(k.sum() - np.trace(k))


@dataclass
class OnlineMMDState:
    t: int
    test_window: np.ndarray  # [W, d]


@dataclass
class OnlineMMD:
    """Fitted online-MMD config — broadcastable, immutable after :meth:`fit`."""

    ert: float
    window_size: int
    n_bootstraps: int = 1000
    seed: int = 0
    sigma: float = field(default=np.nan)
    x_ref_sub: np.ndarray = field(default=None, repr=False)  # [rw, d]
    k_xx_sub_sum: float = field(default=np.nan)
    thresholds: np.ndarray = field(default=None, repr=False)  # [W]
    init_test_window: np.ndarray = field(default=None, repr=False)  # [W, d]

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int,
        n_bootstraps: int = 1000,
        seed: int = 0,
        sigma: float | None = None,
    ) -> "OnlineMMD":
        x_ref = np.asarray(x_ref, dtype=np.float64)
        n = x_ref.shape[0]
        w = window_size
        etw = 2 * w - 1
        rw = n - etw
        if rw <= 1:
            raise ValueError(f"need len(x_ref) > 2*window_size, got {n} vs W={w}")
        d2 = squared_pairwise_distance(x_ref, x_ref)
        sig = sigma if sigma is not None else median_heuristic_sigma(x_ref, x_ref, d2)
        if not np.isfinite(sig) or sig <= 0.0:
            # degenerate ref (constant / gap-dominated series): any positive
            # bandwidth gives k≡1 on the ref; pick 1.0 so the stream side
            # still discriminates. The reference never guards this (it assumes
            # informative x_ref); at pipeline scale empty sources are routine.
            sig = 1.0
        k_xx = np.exp(-d2 / (2.0 * sig**2))
        fpr = 1.0 / ert
        rng = np.random.default_rng(seed)

        # --- bootstrap thresholds (cd/pytorch/mmd_online.py:134-192) ---
        perms = [rng.permutation(n) for _ in range(n_bootstraps)]
        y_inds = [p[-etw:] for p in perms]
        k_full_sum = _zero_diag_sum(k_xx)
        # cached column sums: k(x_sub, y_etw) summed over the sub-ref axis
        kxy_cols = [k_xx[p[:-etw]][:, yi].sum(axis=0) for p, yi in zip(perms, y_inds)]
        kxx_sums = np.array(
            [
                (k_full_sum - _zero_diag_sum(k_xx[np.ix_(yi, yi)]) - 2.0 * c.sum())
                / (rw * (rw - 1))
                for yi, c in zip(y_inds, kxy_cols)
            ]
        )
        kxy_cols = [c / (rw * w) for c in kxy_cols]

        thresholds = np.empty(w)
        for step in range(w):
            mmds = np.array(
                [
                    s
                    + _zero_diag_sum(k_xx[np.ix_(yi[step : step + w], yi[step : step + w])])
                    / (w * (w - 1))
                    - 2.0 * c[step : step + w].sum()
                    for s, yi, c in zip(kxx_sums, y_inds, kxy_cols)
                ]
            )
            if mmds.size == 0:
                # all bootstrap streams discarded (degenerate/tied stats) —
                # carry the last threshold forward instead of failing the fit
                thresholds[step:] = thresholds[step - 1] if step else np.inf
                break
            # conditional quantile; clamp p to what the surviving sample can
            # estimate (small n_bootstraps or heavy discards)
            p = min(1.0 - fpr, (mmds.size - 1) / mmds.size)
            thresholds[step] = quantile(mmds, max(p, 1.0 / mmds.size), qtype=7)
            keep = mmds < thresholds[step]
            y_inds = [yi for yi, k in zip(y_inds, keep) if k]
            kxx_sums = kxx_sums[keep]
            kxy_cols = [c for c, k in zip(kxy_cols, keep) if k]

        # --- ref split, retried until no initial detection (:110-132) ---
        for _attempt in range(1000):
            perm = rng.permutation(n)
            ref_inds, init_inds = perm[:rw], perm[-w:]
            k_sub = k_xx[np.ix_(ref_inds, ref_inds)]
            k_xx_sub_sum = _zero_diag_sum(k_sub) / (rw * (rw - 1))
            test_win = x_ref[init_inds]
            k_yy = k_xx[np.ix_(init_inds, init_inds)]
            k_xy = k_xx[np.ix_(ref_inds, init_inds)]
            mmd0 = k_xx_sub_sum + _zero_diag_sum(k_yy) / (w * (w - 1)) - 2.0 * k_xy.mean()
            if mmd0 < thresholds[0]:
                break

        return cls(
            ert=ert,
            window_size=w,
            n_bootstraps=n_bootstraps,
            seed=seed,
            sigma=sig,
            x_ref_sub=np.ascontiguousarray(x_ref[ref_inds]),
            k_xx_sub_sum=k_xx_sub_sum,
            thresholds=thresholds,
            init_test_window=np.ascontiguousarray(test_win),
        )

    def initial_state(self) -> OnlineMMDState:
        return OnlineMMDState(t=0, test_window=self.init_test_window.copy())

    def threshold_at(self, t: int) -> float:
        w = self.window_size
        return float(self.thresholds[t] if t < w else self.thresholds[-1])

    def score_stream(
        self, xs: np.ndarray, state: OnlineMMDState | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, OnlineMMDState]:
        """Score a batch of stream points in order.

        Vectorized where the math allows: the kernel columns vs the sub-ref are
        ONE matmul for the whole batch (cf. the per-row column in
        ``mmd_online.py:194-206``); the FIFO window stats are a short loop over
        the batch with O(W²) work per step, W small.

        Returns ``(stats, thresholds, is_drift, new_state)``.
        """
        if state is None:
            state = self.initial_state()
        xs = np.asarray(xs, dtype=np.float64)
        n, w = xs.shape[0], self.window_size
        k_cols = rbf_kernel(self.x_ref_sub, xs, self.sigma)  # [rw, n] one matmul
        k_col_means = k_cols.mean(axis=0)  # mean over sub-ref per point
        window = state.test_window.copy()
        stats = np.empty(n)
        thr = np.empty(n)
        drift = np.empty(n, dtype=np.int32)
        t = state.t
        # rolling mean of the last-W kernel-column means = mean(k_xy)
        recent = rbf_kernel(self.x_ref_sub, window, self.sigma).mean(axis=0)
        for i in range(n):
            t += 1
            window = np.vstack([window[1:], xs[i : i + 1]])
            recent = np.concatenate([recent[1:], k_col_means[i : i + 1]])
            k_yy = rbf_kernel(window, window, self.sigma)
            stat = (
                self.k_xx_sub_sum
                + _zero_diag_sum(k_yy) / (w * (w - 1))
                - 2.0 * recent.mean()
            )
            stats[i] = stat
            # reference predict() looks up thresholds[self.t] AFTER the
            # increment (base_online.py:194 + :131-144)
            thr[i] = self.threshold_at(t)
            drift[i] = int(stat > thr[i])
        return stats, thr, drift, OnlineMMDState(t=t, test_window=window)
