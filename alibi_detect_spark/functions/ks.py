"""Two-sample Kolmogorov–Smirnov test — NumPy recast of the reference's
``KSDrift`` feature scorer (``alibi_detect/cd/ks.py:8-102``, which delegates to
``scipy.stats.ks_2samp``; scipy is not available here so the statistic and the
asymptotic two-sided p-value are implemented directly).

D = sup_x |ECDF_ref(x) − ECDF_test(x)|; p ≈ Kolmogorov sf at
``D·sqrt(n·m/(n+m))`` (Smirnov's asymptotic form). Multiple-feature
aggregation follows ``cd/base.py:1003-1007``: Bonferroni (any ``p <
p_val/d``) or Benjamini–Hochberg FDR (``utils/statstest.py:41-68``).

Spark-native alternative (used by the SQL-checked query): D is expressible
with a union + window cumulative counts — see ``operators/drift.py``.
"""

from __future__ import annotations

import numpy as np


def kolmogorov_sf(t: float, terms: int = 101) -> float:
    """Q(t) = 2 Σ_{k≥1} (−1)^{k−1} exp(−2 k² t²) — Kolmogorov distribution
    survival function (asymptotic null of the two-sample KS statistic)."""
    if t <= 0:
        return 1.0
    k = np.arange(1, terms + 1, dtype=np.float64)
    s = 2.0 * np.sum((-1.0) ** (k - 1) * np.exp(-2.0 * (k * t) ** 2))
    return float(min(max(s, 0.0), 1.0))


def ks_2samp(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Two-sided two-sample KS. Returns (D, asymptotic p-value)."""
    x = np.sort(np.asarray(x, dtype=np.float64).ravel())
    y = np.sort(np.asarray(y, dtype=np.float64).ravel())
    n, m = x.shape[0], y.shape[0]
    pooled = np.concatenate([x, y])
    cdf_x = np.searchsorted(x, pooled, side="right") / n
    cdf_y = np.searchsorted(y, pooled, side="right") / m
    d = float(np.max(np.abs(cdf_x - cdf_y)))
    en = np.sqrt(n * m / (n + m))
    return d, kolmogorov_sf(en * d)


def ks_feature_scores(x_ref: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature KS over column-aligned 2-D arrays (``cd/ks.py:80-102``)."""
    x_ref = np.atleast_2d(np.asarray(x_ref, dtype=np.float64))
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    d = x_ref.shape[1]
    p_vals = np.empty(d)
    dists = np.empty(d)
    for j in range(d):
        dists[j], p_vals[j] = ks_2samp(x_ref[:, j], x[:, j])
    return p_vals, dists


def fdr(p_vals: np.ndarray, q_val: float) -> bool:
    """Benjamini–Hochberg step-up (``utils/statstest.py:41-68``): drift iff any
    sorted p ≤ (rank/d)·q."""
    p = np.sort(np.asarray(p_vals, dtype=np.float64).ravel())
    d = p.shape[0]
    ranks = np.arange(1, d + 1) / d
    return bool(np.any(p <= ranks * q_val))


def aggregate_drift(p_vals: np.ndarray, p_val: float, correction: str = "bonferroni") -> int:
    """Bonferroni / FDR decision (``cd/base.py:1003-1007``)."""
    if correction == "bonferroni":
        return int(np.any(p_vals < p_val / p_vals.shape[0]))
    if correction == "fdr":
        return int(fdr(p_vals, p_val))
    raise ValueError(f"unknown correction {correction!r}")
