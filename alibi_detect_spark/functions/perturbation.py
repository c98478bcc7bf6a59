"""Synthetic perturbation + permutation-test utilities — NumPy recasts of
``alibi_detect/utils/perturbation.py:108-162`` (``inject_outlier_ts``) and
``alibi_detect/utils/statstest.py:5-38`` (``permutation_test``), with a
seeded ``np.random.Generator`` instead of the reference's global RNG (our
determinism contract: all randomness is an explicit function of the seed)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def inject_outlier_ts(
    x: np.ndarray,
    perc_outlier: int,
    perc_window: int = 10,
    n_std: float = 2.0,
    min_std: float = 1.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Inject outliers into (multi)variate time series; returns
    (perturbed, is_outlier). Same windowed-stdev perturbation as the
    reference: chosen points move by ``max(|N(0,1)|·n_std, min_std)`` local
    standard deviations."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, dtype=np.float64)
    n_dim = x.ndim
    if n_dim == 1:
        x = x.reshape(-1, 1)
    n_samples, n_ts = x.shape
    x_out = x.copy()
    is_outlier = np.zeros(n_samples)
    window = int(perc_window * n_samples * 0.5 / 100)
    n_outlier = int(n_samples * perc_outlier * 0.01 / n_ts)
    if n_outlier == 0:
        return (x_out.reshape(n_samples) if n_dim == 1 else x_out), is_outlier
    for s in range(n_ts):
        outlier_idx = np.sort(rng.choice(n_samples, n_outlier, replace=False))
        lo = np.maximum(outlier_idx - window, 0)
        hi = np.minimum(outlier_idx + window, n_samples)
        stdev = np.array([x_out[lo[i] : hi[i], s].std() for i in range(n_outlier)])
        rnd = rng.standard_normal(n_outlier)
        x_out[outlier_idx, s] += np.sign(rnd) * np.maximum(np.abs(rnd * n_std), min_std) * stdev
        is_outlier[outlier_idx] = 1
    if n_dim == 1:
        x_out = x_out.reshape(n_samples)
    return x_out, is_outlier


def permutation_test(
    x: np.ndarray,
    y: np.ndarray,
    metric: Callable,
    n_permutations: int = 100,
    seed: int = 0,
    **kwargs,
) -> tuple[float, float, np.ndarray]:
    """Permutation two-sample test (``utils/statstest.py:5-38``): p =
    fraction of label-shuffled metric values ≥ the observed one."""
    rng = np.random.default_rng(seed)
    n, k = x.shape[0], 0
    dist = metric(x, y, **kwargs)
    x_y = np.concatenate([x, y])
    dist_permutations = np.zeros(n_permutations)
    for i in range(n_permutations):
        perm = rng.permutation(x_y.shape[0])
        xp, yp = x_y[perm[:n]], x_y[perm[n:]]
        d = metric(xp, yp, **kwargs)
        dist_permutations[i] = d
        k += dist <= d
    return k / n_permutations, dist, dist_permutations


def mmd2_unbiased(x: np.ndarray, y: np.ndarray, sigma: float) -> float:
    """Unbiased MMD² with a Gaussian RBF kernel (metric for the permutation
    test; ``utils/pytorch/distance.py:130-149`` block-sum form)."""
    from .mmd import rbf_kernel

    n, m = x.shape[0], y.shape[0]
    k_xx = rbf_kernel(x, x, sigma)
    k_yy = rbf_kernel(y, y, sigma)
    k_xy = rbf_kernel(x, y, sigma)
    return float(
        (k_xx.sum() - np.trace(k_xx)) / (n * (n - 1))
        + (k_yy.sum() - np.trace(k_yy)) / (m * (m - 1))
        - 2.0 * k_xy.mean()
    )
