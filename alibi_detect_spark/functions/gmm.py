"""Gaussian-mixture outlier scoring — NumPy recast of
``alibi_detect/od/_gmm.py:22-231`` (torch backend ``od/pytorch/gmm.py``: EM
fit on the reference set, score = negative log-likelihood).

Seeded, deterministic EM: means initialized from a seeded choice of reference
points, full covariances with ridge regularization. The fit is driver-or-
executor side on the (small, in-memory by alibi-detect's contract) reference;
scoring is vectorized over Arrow batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _log_gaussians(x: np.ndarray, means: np.ndarray, covs: np.ndarray) -> np.ndarray:
    """log N(x | mean_k, cov_k) for all k → [n, k]."""
    n, d = x.shape
    k = means.shape[0]
    out = np.empty((n, k))
    for j in range(k):
        diff = x - means[j]
        chol = np.linalg.cholesky(covs[j])
        z = np.linalg.solve(chol, diff.T).T  # triangular, but general solve is fine (no scipy)
        maha = np.einsum("ij,ij->i", z, z)
        logdet = 2.0 * np.log(np.diag(chol)).sum()
        out[:, j] = -0.5 * (maha + logdet + d * np.log(2.0 * np.pi))
    return out


@dataclass
class GMMOutlier:
    n_components: int = 3
    n_iter: int = 50
    seed: int = 0
    reg: float = 1e-6
    weights: np.ndarray = field(default=None, repr=False)
    means: np.ndarray = field(default=None, repr=False)
    covs: np.ndarray = field(default=None, repr=False)

    def fit(self, x_ref: np.ndarray) -> "GMMOutlier":
        x = np.asarray(x_ref, dtype=np.float64)
        n, d = x.shape
        k = self.n_components
        rng = np.random.default_rng(self.seed)
        means = x[rng.choice(n, k, replace=False)]
        covs = np.stack([np.cov(x.T) + self.reg * np.eye(d)] * k)
        weights = np.full(k, 1.0 / k)
        for _ in range(self.n_iter):
            # E step
            logp = _log_gaussians(x, means, covs) + np.log(weights)[None, :]
            m = logp.max(axis=1, keepdims=True)
            resp = np.exp(logp - m)
            resp /= resp.sum(axis=1, keepdims=True)
            # M step
            nk = resp.sum(axis=0) + 1e-12
            weights = nk / n
            means = (resp.T @ x) / nk[:, None]
            for j in range(k):
                diff = x - means[j]
                covs[j] = (resp[:, j][:, None] * diff).T @ diff / nk[j] + self.reg * np.eye(d)
        self.weights, self.means, self.covs = weights, means, covs
        return self

    def score(self, x: np.ndarray) -> np.ndarray:
        """Negative log-likelihood under the fitted mixture (``od/_gmm.py``
        score semantics: high = outlying)."""
        x = np.asarray(x, dtype=np.float64)
        logp = _log_gaussians(x, self.means, self.covs) + np.log(self.weights)[None, :]
        m = logp.max(axis=1)
        return -(m + np.log(np.exp(logp - m[:, None]).sum(axis=1)))
