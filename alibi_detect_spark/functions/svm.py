"""One-class SVM outlier detection — pure-NumPy recast of
``alibi_detect/od/_svm.py:27-250`` (torch/sklearn backends at
``od/pytorch/svm.py``).

Same construction as the reference: map the data into the RBF kernel's RKHS
via the Nyström approximation (seeded inducing subsample, eigenvector
whitening), then solve the LINEAR one-class SVM primal directly —
``min_{w,ρ} ν·‖w‖²/2 − ν·ρ + mean(max(0, ρ − w·φ(x)))`` — by full-batch
subgradient descent (the reference's ``bgd`` mode is full-batch torch with
line search; sklearn's ``sgd`` mode is the same objective one point at a
time — absent here by design). ``nu`` keeps its reference meaning: the
regularisation knob ≈ the fraction of reference points treated as outliers.

Score = ``ρ − w·φ(x)`` (higher = more anomalous), matching the detector's
``score``/``infer_threshold``/``predict`` percentile contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class OneClassSVM:
    nu: float = 0.1
    n_components: int = 64
    seed: int = 0
    sigma: float = 0.0
    inducing: np.ndarray = field(default=None, repr=False)
    whiten: np.ndarray = field(default=None, repr=False)  # [m, m] V Λ^{-1/2}
    w: np.ndarray = field(default=None, repr=False)
    rho: float = 0.0

    def _phi(self, x: np.ndarray) -> np.ndarray:
        d2 = (
            np.einsum("ij,ij->i", x, x)[:, None]
            + np.einsum("ij,ij->i", self.inducing, self.inducing)[None, :]
            - 2.0 * (x @ self.inducing.T)
        )
        k = np.exp(-np.maximum(d2, 0.0) / (2.0 * self.sigma**2))
        return k @ self.whiten

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        nu: float = 0.1,
        n_components: int = 64,
        seed: int = 0,
        n_iter: int = 200,
        lr: float = 1.0,
    ) -> "OneClassSVM":
        x_ref = np.asarray(x_ref, dtype=np.float64)
        n = x_ref.shape[0]
        rng = np.random.default_rng(seed)
        m = min(n_components, n)
        det = cls(nu=nu, n_components=m, seed=seed)
        det.inducing = x_ref[rng.choice(n, m, replace=False)]
        # median-heuristic bandwidth on the inducing set
        d2 = (
            np.einsum("ij,ij->i", det.inducing, det.inducing)[:, None]
            + np.einsum("ij,ij->i", det.inducing, det.inducing)[None, :]
            - 2.0 * (det.inducing @ det.inducing.T)
        )
        d2 = np.maximum(d2, 0.0)
        med = float(np.median(d2[d2 > 0])) if (d2 > 0).any() else 1.0
        det.sigma = float(np.sqrt(0.5 * med)) or 1.0
        # Nyström whitening: K_mm = V Λ V' → φ(x) = K_xm V Λ^{-1/2}
        k_mm = np.exp(-d2 / (2.0 * det.sigma**2))
        vals, vecs = np.linalg.eigh(k_mm)
        vals = np.maximum(vals, 1e-10)
        det.whiten = vecs / np.sqrt(vals)[None, :]
        phi = det._phi(x_ref)  # [n, m]

        w = np.zeros(m)
        rho = 0.0
        for t in range(1, n_iter + 1):
            margin = phi @ w  # w·φ(x)
            viol = margin < rho
            grad_w = nu * w - (phi[viol].sum(axis=0) / n if viol.any() else 0.0)
            grad_rho = -nu + viol.mean()
            step = lr / np.sqrt(t)
            w = w - step * grad_w
            rho = rho - step * grad_rho
        det.w = w
        det.rho = float(rho)
        return det

    def score(self, x: np.ndarray) -> np.ndarray:
        """Outlier score ``ρ − w·φ(x)`` — higher = more anomalous."""
        x = np.asarray(x, dtype=np.float64)
        return self.rho - self._phi(x) @ self.w
