"""Online least-squares density difference (LSDD) drift detection — pure-NumPy
recast of ``alibi_detect/cd/pytorch/lsdd_online.py:12-243`` and
``utils/pytorch/distance.py:152-243`` (``permed_lsdds``). Bu et al. (2017),
with alibi-detect's ERT-targeted threshold modification.

Semantics preserved:

- reference normalized to zero mean / unit std (ddof=1, matching
  ``torch.std``; ``lsdd_online.py:118-127``);
- random kernel centers (default ``2·window_size``) set aside from the ref;
  ``k_xc = k(x_ref_eff, centers)`` with median-heuristic σ on the normalized
  ref (``:129-139``);
- ``H = k_{√2·σ}(centers, centers)`` without the ``(πσ²)^{d/2}`` factor
  (comment at ``:158-159`` — alternative stat, same p-values);
- regularization λ picked as the largest candidate ``4^{-i}`` whose relative
  difference stays below ``lambda_rd_max`` (Appendix A; ``distance.py:195-223``),
  then ``H_λ⁻¹ = 2(H+λI)⁻¹ − (H+λI)⁻¹ H (H+λI)⁻¹`` (below Eqn 11);
- per-step stat ``lsdd = h' H_λ⁻¹ h`` with ``h = mean_ref k_xc − mean_win
  k_xtc`` (Eqns 21/11), FIFO window of kernel rows (``:216-223``);
- seeded bootstrap conditional-quantile thresholds with discards
  (``:141-182``).

Engine placement: fit once per key on the executor with a key-derived seed
(like the other online detectors), score inside the ordered ``applyInPandas``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mmd import median_heuristic_sigma, squared_pairwise_distance
from .quantile import quantile


def _rbf(x: np.ndarray, y: np.ndarray, sigma: float) -> np.ndarray:
    return np.exp(-squared_pairwise_distance(x, y) / (2.0 * sigma**2))


def permed_lsdds(
    k_all_c: np.ndarray,
    x_perms: list[np.ndarray],
    y_perms: list[np.ndarray],
    h_mat: np.ndarray,
    h_lam_inv: np.ndarray | None = None,
    lam_rd_max: float = 0.2,
) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin of ``utils/pytorch/distance.py:152-243``."""
    k_xc_means = np.stack([k_all_c[x].mean(axis=0) for x in x_perms], 0)
    k_yc_means = np.stack([k_all_c[y].mean(axis=0) for y in y_perms], 0)
    h_perms = k_xc_means - k_yc_means  # [B, C]

    if h_lam_inv is None:
        candidate_lambdas = [1 / (4**i) for i in range(10)]
        eye = np.eye(h_mat.shape[0])
        h_plus_lam_invs = np.stack(
            [np.linalg.inv(h_mat + eye * lam) for lam in candidate_lambdas], -1
        )  # [C, C, L]
        omegas = np.einsum("jkl,bk->bjl", h_plus_lam_invs, h_perms)
        h_omegas = np.einsum("bj,bjl->bl", h_perms, omegas)
        omega_h_omegas = np.einsum("bkl,bkl->bl", np.einsum("bjl,jk->bkl", omegas, h_mat), omegas)
        rds = (1 - (omega_h_omegas / h_omegas)).mean(axis=0)
        ok = np.nonzero(rds < lam_rd_max)[0]
        if len(ok) == 0:
            raise ValueError("no candidate lambda satisfies the relative-difference bound")
        lam_index = int(ok[0])
        hpli = h_plus_lam_invs[:, :, lam_index]
        h_lam_inv = 2 * hpli - (hpli.T @ h_mat @ hpli)

    lsdd_perms = (h_perms * (h_lam_inv @ h_perms.T).T).sum(axis=-1)
    return lsdd_perms, h_lam_inv


def lsdd_2samp(
    x_ref: np.ndarray,
    x: np.ndarray,
    n_permutations: int = 100,
    n_kernel_centers: int | None = None,
    lambda_rd_max: float = 0.2,
    seed: int = 0,
    eps: float = 1e-12,
) -> tuple[float, float]:
    """Offline LSDD two-sample test with a permutation p-value — NumPy recast
    of ``alibi_detect/cd/pytorch/lsdd.py:13-135``: normalize by ref moments,
    kernel centers from the ref, λ-regularized H inverse inferred once, stat
    and permutation null both via :func:`permed_lsdds`. Returns (p, stat)."""
    x_ref = np.atleast_2d(np.asarray(x_ref, dtype=np.float64))
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n, m = x_ref.shape[0], x.shape[0]
    nkc = n_kernel_centers if n_kernel_centers is not None else max(2, n // 4)

    mean, std = x_ref.mean(axis=0), x_ref.std(axis=0, ddof=1)
    ref_n = (x_ref - mean) / (std + eps)
    x_n = (x - mean) / (std + eps)

    d2 = squared_pairwise_distance(ref_n, ref_n)
    sigma = median_heuristic_sigma(ref_n, ref_n, d2)
    if not np.isfinite(sigma) or sigma <= 0:
        sigma = 1.0
    centers = ref_n[rng.permutation(n)[:nkc]]
    pooled = np.concatenate([ref_n, x_n], axis=0)
    k_all_c = _rbf(pooled, centers, sigma)
    h_mat = _rbf(centers, centers, np.sqrt(2.0) * sigma)

    ident = [np.arange(n)]
    ident_y = [np.arange(n, n + m)]
    stat_arr, h_lam_inv = permed_lsdds(k_all_c, ident, ident_y, h_mat, lam_rd_max=lambda_rd_max)
    stat = float(stat_arr[0])
    perms = [rng.permutation(n + m) for _ in range(n_permutations)]
    perm_stats, _ = permed_lsdds(
        k_all_c, [p[:n] for p in perms], [p[n:] for p in perms], h_mat, h_lam_inv=h_lam_inv
    )
    p_val = float((stat <= perm_stats).mean())
    return p_val, stat


@dataclass
class OnlineLSDDState:
    t: int
    test_window: np.ndarray  # [W, d] (normalized)


@dataclass
class OnlineLSDD:
    """Fitted online-LSDD config — broadcastable, immutable after :meth:`fit`."""

    ert: float
    window_size: int
    n_bootstraps: int = 1000
    seed: int = 0
    lambda_rd_max: float = 0.2
    sigma: float = field(default=np.nan)
    ref_mean: np.ndarray = field(default=None, repr=False)
    ref_std: np.ndarray = field(default=None, repr=False)
    kernel_centers: np.ndarray = field(default=None, repr=False)
    c2s: np.ndarray = field(default=None, repr=False)
    h_lam_inv: np.ndarray = field(default=None, repr=False)
    thresholds: np.ndarray = field(default=None, repr=False)
    init_test_window: np.ndarray = field(default=None, repr=False)

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int,
        n_bootstraps: int = 1000,
        seed: int = 0,
        n_kernel_centers: int | None = None,
        lambda_rd_max: float = 0.2,
        eps: float = 1e-12,
    ) -> "OnlineLSDD":
        x_ref = np.atleast_2d(np.asarray(x_ref, dtype=np.float64))
        if x_ref.shape[0] < x_ref.shape[1]:
            x_ref = x_ref.T if x_ref.shape[1] > 1 else x_ref
        n = x_ref.shape[0]
        w = window_size
        nkc = n_kernel_centers if n_kernel_centers is not None else 2 * w
        etw = 2 * w - 1
        nkc_size = n - nkc
        rw = nkc_size - etw
        if rw <= 1:
            raise ValueError(f"need len(x_ref) > n_kernel_centers + 2*window_size, got {n}")
        rng = np.random.default_rng(seed)

        ref_mean = x_ref.mean(axis=0)
        ref_std = x_ref.std(axis=0, ddof=1)  # torch.std default = unbiased
        x_norm = (x_ref - ref_mean) / (ref_std + eps)

        d2 = squared_pairwise_distance(x_norm, x_norm)
        sigma = median_heuristic_sigma(x_norm, x_norm, d2)
        if not np.isfinite(sigma) or sigma <= 0:
            sigma = 1.0

        perm = rng.permutation(n)
        c_inds, non_c_inds = perm[:nkc], perm[nkc:]
        centers = x_norm[c_inds]
        if np.unique(centers, axis=0).shape[0] < nkc:
            centers = centers + rng.standard_normal(centers.shape) * 1e-6
        x_eff = x_norm[non_c_inds]
        k_xc = _rbf(x_eff, centers, sigma)
        h_mat = _rbf(centers, centers, np.sqrt(2.0) * sigma)

        # --- bootstrap thresholds (lsdd_online.py:141-182) ---
        fpr = 1.0 / ert
        perms = [rng.permutation(nkc_size) for _ in range(n_bootstraps)]
        x_inds_all = [p[:rw] for p in perms]
        y_inds_all = [p[rw:] for p in perms]
        y0 = [y[:w] for y in y_inds_all]
        lsdds_0, h_lam_inv = permed_lsdds(k_xc, x_inds_all, y0, h_mat, lam_rd_max=lambda_rd_max)
        thresholds = np.empty(w)
        p = min(1.0 - fpr, (lsdds_0.size - 1) / lsdds_0.size)
        thresholds[0] = quantile(lsdds_0, max(p, 1.0 / lsdds_0.size), qtype=7)
        for step in range(1, w):
            yw = [y[step : step + w] for y in y_inds_all]
            lsdds_w, _ = permed_lsdds(k_xc, x_inds_all, yw, h_mat, h_lam_inv=h_lam_inv)
            if lsdds_w.size < 2:
                thresholds[step:] = thresholds[step - 1]
                break
            p = min(1.0 - fpr, (lsdds_w.size - 1) / lsdds_w.size)
            thresholds[step] = quantile(lsdds_w, max(p, 1.0 / lsdds_w.size), qtype=7)
            keep = lsdds_w < thresholds[step]
            x_inds_all = [x for x, k in zip(x_inds_all, keep) if k]
            y_inds_all = [y for y, k in zip(y_inds_all, keep) if k]

        # --- ref split, retried until no initial detection (:190-215) ---
        c2s = None
        test_win = None
        for _ in range(1000):
            perm2 = rng.permutation(nkc_size)
            ref_inds, init_inds = perm2[:rw], perm2[-w:]
            c2s_try = k_xc[ref_inds].mean(axis=0)
            k_xtc = k_xc[init_inds]
            h0 = c2s_try - k_xtc.mean(axis=0)
            lsdd0 = float(h0 @ h_lam_inv @ h0)
            c2s, test_win = c2s_try, x_eff[init_inds]
            if lsdd0 < thresholds[0]:
                break

        return cls(
            ert=ert,
            window_size=w,
            n_bootstraps=n_bootstraps,
            seed=seed,
            lambda_rd_max=lambda_rd_max,
            sigma=float(sigma),
            ref_mean=ref_mean,
            ref_std=ref_std,
            kernel_centers=centers,
            c2s=c2s,
            h_lam_inv=h_lam_inv,
            thresholds=thresholds,
            init_test_window=np.ascontiguousarray(test_win),
        )

    def initial_state(self) -> OnlineLSDDState:
        return OnlineLSDDState(t=0, test_window=self.init_test_window.copy())

    def threshold_at(self, t: int) -> float:
        w = self.window_size
        return float(self.thresholds[t] if t < w else self.thresholds[-1])

    def score_stream(
        self, xs: np.ndarray, state: OnlineLSDDState | None = None, eps: float = 1e-12
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, OnlineLSDDState]:
        """Score an ordered batch: ONE kernel matmul for the batch's kernel
        rows, then the FIFO window mean per step (W small)."""
        if state is None:
            state = self.initial_state()
        xs = np.atleast_2d(np.asarray(xs, dtype=np.float64))
        if xs.shape[1] != self.kernel_centers.shape[1] and xs.shape[0] == self.kernel_centers.shape[1]:
            xs = xs.T
        xs_n = (xs - self.ref_mean) / (self.ref_std + eps)
        n, w = xs_n.shape[0], self.window_size
        k_rows = _rbf(xs_n, self.kernel_centers, self.sigma)  # [n, C]
        k_win = _rbf(state.test_window, self.kernel_centers, self.sigma)  # [W, C]
        stats = np.empty(n)
        thr = np.empty(n)
        drift = np.empty(n, dtype=np.int32)
        window = state.test_window.copy()
        t = state.t
        for i in range(n):
            t += 1
            k_win = np.vstack([k_win[1:], k_rows[i : i + 1]])
            window = np.vstack([window[1:], xs_n[i : i + 1]])
            h = self.c2s - k_win.mean(axis=0)
            stats[i] = float(h @ self.h_lam_inv @ h)
            thr[i] = self.threshold_at(t)
            drift[i] = int(stats[i] > thr[i])
        # state.test_window is kept in NORMALIZED space throughout (both the
        # initial window and every update), so resume is exact by identity
        return stats, thr, drift, OnlineLSDDState(t=t, test_window=window)
