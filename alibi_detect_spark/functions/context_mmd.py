"""Context-aware MMD drift (MMD-ADiTT) — pure-NumPy recast of
``alibi_detect/cd/context_aware.py:18-171`` + torch backend
``cd/pytorch/context_aware.py:119-258`` (Cobb & Van Looveren, "Context-Aware
Drift Detection", ICML 2022).

Semantics preserved:

- test statistic = conditional MMD between P(x|c) of ref and test, via
  conditional-mean-embedding couplings: ``A_s = L_held[:, idx_s] @ (L_s +
  n_s·λ_s·I)^{-1}``, ``coupling_ss' = mean_i outer(A_s[i], A_s'[i])``,
  ``stat = Σ K_00∘W_00 + Σ K_11∘W_11 − 2·Σ K_01∘W_01``
  (``context_aware.py:185-228 _cmmd``).
- λ per side picked by K-fold CV over the 2^{-i} grid, minimising the
  RKHS-distance loss ``lWKWl + max(K) − 2·lWk`` (``:231-258 _pick_lam``).
- bandwidths via the diagonal-aware median heuristic
  (``:261-281 _sigma_median_diag``).
- a fraction ``prop_c_held`` of test contexts is held out for conditioning
  (``:143-147``).
- p-value from a CONDITIONAL permutation test: labels are redrawn per
  permutation as Bernoulli(propensity(c)) so the null preserves the context
  distribution (``:162-180``). The reference's propensity model is a
  calibrated sklearn SVC (absent here by design); this recast estimates the
  propensity with kernel ridge regression on the SAME context kernel —
  clipped to (1/n, 1−1/n) — which serves the identical role (any calibrated
  P(test|c) gives a valid conditional null).

Seeded end-to-end; runs on the driver or inside one Arrow group.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a2 = np.einsum("ij,ij->i", a, a)[:, None]
    b2 = np.einsum("ij,ij->i", b, b)[None, :]
    return np.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)


def _sigma_median_diag(d2: np.ndarray) -> float:
    """Median heuristic without the +n diagonal correction
    (``context_aware.py:261-281``)."""
    n_median = d2.size // 2
    s = np.sqrt(0.5 * np.sort(d2.ravel())[n_median])
    return float(s) if s > 0 else 1.0


def _rbf(a: np.ndarray, b: np.ndarray, sigma: float) -> np.ndarray:
    return np.exp(-_sq_dists(a, b) / (2.0 * sigma * sigma))


def _pick_lam(
    rng: np.random.Generator, k: np.ndarray, l_mat: np.ndarray, n_folds: int = 5
) -> float:
    """K-fold CV over λ ∈ {2^0 … 2^-19} minimising the RKHS regression loss
    (``context_aware.py:231-258``)."""
    lams = np.array([2.0 ** (-i) for i in range(20)])
    n = l_mat.shape[0]
    fold_size = n // n_folds
    perm = rng.permutation(n)
    k = k[np.ix_(perm, perm)]
    l_mat = l_mat[np.ix_(perm, perm)]
    losses = np.zeros_like(lams)
    eye_cache: dict[int, np.ndarray] = {}
    for fold in range(n_folds):
        oof = np.arange(fold * fold_size, (fold + 1) * fold_size)
        inf = np.setdiff1d(np.arange(n), oof)
        k_if = k[np.ix_(inf, inf)]
        l_if = l_mat[np.ix_(inf, inf)]
        n_if = len(inf)
        eye = eye_cache.setdefault(n_if, np.eye(n_if))
        l_oof_if = l_mat[np.ix_(oof, inf)]
        k_if_oof = k[np.ix_(inf, oof)]
        l_if_oof = l_mat[np.ix_(inf, oof)]
        kmax = k.max()
        for j, lam in enumerate(lams):
            l_inv = np.linalg.inv(l_if + n_if * lam * eye)
            lw = l_oof_if @ l_inv  # [n_oof, n_if]
            lwkw = lw @ (k_if @ l_inv)  # [n_oof, n_if]
            lwkwl = np.einsum("ij,ji->i", lwkw, l_if_oof)  # [n_oof]
            lwk = np.einsum("ij,ji->i", lw, k_if_oof)
            losses[j] += float((lwkwl + kmax - 2.0 * lwk).sum())
    return float(lams[int(np.argmin(losses))])


def _cmmd(
    k: np.ndarray,
    l_mat: np.ndarray,
    bools: np.ndarray,
    l_held: np.ndarray,
    lams: tuple[float, float],
) -> float:
    idx0 = np.where(bools == 0)[0]
    idx1 = np.where(bools == 1)[0]
    n0, n1 = len(idx0), len(idx1)
    l0_inv = np.linalg.inv(l_mat[np.ix_(idx0, idx0)] + n0 * lams[0] * np.eye(n0))
    l1_inv = np.linalg.inv(l_mat[np.ix_(idx1, idx1)] + n1 * lams[1] * np.eye(n1))
    a0 = l_held[:, idx0] @ l0_inv  # [n_held, n0]
    a1 = l_held[:, idx1] @ l1_inv
    m = a0.shape[0]
    w00 = (a0.T @ a0) / m
    w11 = (a1.T @ a1) / m
    w01 = (a0.T @ a1) / m
    sim_xx = float((k[np.ix_(idx0, idx0)] * w00).sum())
    sim_yy = float((k[np.ix_(idx1, idx1)] * w11).sum())
    sim_xy = float((k[np.ix_(idx0, idx1)] * w01).sum())
    return sim_xx + sim_yy - 2.0 * sim_xy


@dataclass
class ContextMMDResult:
    p_value: float
    stat: float
    threshold: float
    n_ref: int
    n_test: int


def context_mmd_2samp(
    x_ref: np.ndarray,
    c_ref: np.ndarray,
    x: np.ndarray,
    c: np.ndarray,
    p_val: float = 0.05,
    n_permutations: int = 100,
    prop_c_held: float = 0.25,
    n_folds: int = 5,
    seed: int = 0,
    ridge_lam: float = 0.01,
) -> ContextMMDResult:
    """Conditional two-sample test: does P(x|c) differ between ref and test?
    Insensitive to pure context (covariate) shift by construction."""
    x_ref = np.atleast_2d(np.asarray(x_ref, dtype=np.float64).T).T
    x = np.atleast_2d(np.asarray(x, dtype=np.float64).T).T
    c_ref = np.atleast_2d(np.asarray(c_ref, dtype=np.float64).T).T
    c = np.atleast_2d(np.asarray(c, dtype=np.float64).T).T
    rng = np.random.default_rng(seed)

    # hold out a portion of test contexts for conditioning (:143-147)
    n = len(c)
    n_held = int(n * prop_c_held)
    if n_held < 1 or n - n_held < 2 or len(x_ref) < n_folds * 2:
        raise ValueError(
            f"context_mmd_2samp needs enough data to hold out contexts and run "
            f"{n_folds}-fold CV (got n_test={n}, n_ref={len(x_ref)})"
        )
    inds_held = rng.choice(n, n_held, replace=False)
    inds_test = np.setdiff1d(np.arange(n), inds_held)
    c_held = c[inds_held]
    c, x = c[inds_test], x[inds_test]
    n_ref, n_test = len(x_ref), len(x)
    bools = np.concatenate([np.zeros(n_ref), np.ones(n_test)])

    x_all = np.concatenate([x_ref, x])
    c_all = np.concatenate([c_ref, c])
    k = _rbf(x_all, x_all, _sigma_median_diag(_sq_dists(x_all, x_all)))
    l_mat = _rbf(c_all, c_all, _sigma_median_diag(_sq_dists(c_all, c_all)))
    l_held = _rbf(c_held, c_all, _sigma_median_diag(_sq_dists(c_all, c_all)))

    # λ per side by CV on the ORIGINAL assignment only (:196-202)
    idx0, idx1 = np.where(bools == 0)[0], np.where(bools == 1)[0]
    lam0 = _pick_lam(rng, k[np.ix_(idx0, idx0)], l_mat[np.ix_(idx0, idx0)], n_folds)
    lam1 = _pick_lam(rng, k[np.ix_(idx1, idx1)], l_mat[np.ix_(idx1, idx1)], n_folds)
    lams = (lam0, lam1)

    # propensity P(test | c) via kernel ridge on the same context kernel —
    # the recast of the reference's calibrated SVC domain classifier
    n_all = len(c_all)
    alpha = np.linalg.solve(l_mat + n_all * ridge_lam * np.eye(n_all), bools)
    prop = np.clip(l_mat @ alpha, 1.0 / n_all, 1.0 - 1.0 / n_all)

    stat = _cmmd(k, l_mat, bools, l_held, lams)
    perm_stats = np.empty(n_permutations)
    for i in range(n_permutations):
        for _ in range(100):
            pb = (rng.random(n_all) < prop).astype(np.float64)
            if 1 < pb.sum() < n_all - 1:
                break
        perm_stats[i] = _cmmd(k, l_mat, pb, l_held, lams)

    p = float((stat <= perm_stats).mean())
    idx_thr = int(p_val * n_permutations)
    threshold = float(np.sort(perm_stats)[::-1][idx_thr])
    return ContextMMDResult(p_value=p, stat=stat, threshold=threshold, n_ref=n_ref, n_test=n_test)
