"""Online Mahalanobis outlier scorer — pure-NumPy recast of
``alibi_detect/od/mahalanobis.py:15-316``.

Semantics preserved (same array ops, same update order): online mean via
rolling partial means, batch covariance update, PCA onto the top
``n_components`` eigenvectors (NumPy ``eigh`` — ascending order, top
components are the trailing columns, matching scipy's ``subset_by_index``),
Sherman–Morrison-style recursive inverse updates, input clipping after
``start_clip`` observations.

One deliberate spec addition: the reference's scores depend on how the stream
is split into ``score(X_batch)`` calls (the covariance update folds in the
whole batch before projecting). The engine therefore fixes ``batch_size`` as
part of the operator spec — per-key series are processed in fixed chunks with
carried state, so the distributed run and the single-node oracle chunk
identically and match bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EPSILON = 1e-8


@dataclass
class OnlineMahalanobis:
    threshold: float | None = None
    n_components: int = 3
    std_clip: float = 3.0
    start_clip: int = 100
    max_n: int | None = None
    # mutable online state
    n: int = 0
    mean: np.ndarray | float = 0.0
    C: np.ndarray | float = 0.0
    clip: list | None = field(default=None, repr=False)

    def score(self, x: np.ndarray) -> np.ndarray:
        """Score ONE batch, mutating online state (``od/mahalanobis.py:233-316``)."""
        x = np.asarray(x, dtype=np.float64)
        n_batch, n_params = x.shape
        n_components = min(self.n_components, n_params)
        n = min(self.n, self.max_n) if self.max_n is not None else self.n

        x_clip = np.clip(x, self.clip[0], self.clip[1]) if self.n > self.start_clip else x

        roll_partial_means = x_clip.cumsum(axis=0) / (np.arange(n_batch) + 1).reshape((n_batch, 1))
        coefs = (np.arange(n_batch) + 1.0) / (np.arange(n_batch) + n + 1.0)
        new_means = self.mean + coefs.reshape((n_batch, 1)) * (roll_partial_means - self.mean)
        new_means_offset = np.empty_like(new_means)
        new_means_offset[0] = self.mean
        new_means_offset[1:] = new_means[:-1]

        coefs = ((n + np.arange(n_batch)) / (n + np.arange(n_batch) + 1.0)).reshape((n_batch, 1, 1))
        b = coefs * np.matmul((x_clip - new_means_offset)[:, :, None], (x_clip - new_means_offset)[:, None, :])
        cov_batch = (n - 1.0) / (n + max(1, n_batch - 1.0)) * self.C + 1.0 / (
            n + max(1, n_batch - 1.0)
        ) * b.sum(axis=0)

        # PCA: top n_components of the symmetric cov (eigh ascending → tail)
        _, eigvects = np.linalg.eigh(cov_batch)
        eigvects = eigvects[:, n_params - n_components :]

        proj_x = np.matmul(x, eigvects)
        proj_x_clip = np.matmul(x_clip, eigvects)
        proj_means = np.matmul(new_means_offset, eigvects)
        if isinstance(self.C, (int, float)) and self.C == 0:
            proj_cov = np.diag(np.zeros(n_components))
        else:
            proj_cov = np.matmul(eigvects.transpose(), np.matmul(self.C, eigvects))

        coefs = (1.0 / (n + np.arange(n_batch) + 1.0)).reshape((n_batch, 1, 1))
        b = coefs * np.matmul((proj_x_clip - proj_means)[:, :, None], (proj_x_clip - proj_means)[:, None, :])
        all_c_inv = np.zeros_like(b)
        c_inv = None
        for i, bi in enumerate(b):
            if c_inv is None:
                if abs(np.linalg.det(proj_cov)) > EPSILON:
                    c_inv = np.linalg.inv(proj_cov)
                    all_c_inv[i] = c_inv
                    continue
                else:
                    if n + i == 0:
                        continue
                    proj_cov = (n + i - 1.0) / (n + i) * proj_cov + bi
                    continue
            else:
                c_inv = (n + i - 1.0) / float(n + i - 2.0) * all_c_inv[i - 1]
            bc1 = np.matmul(b[i - 1], c_inv)
            all_c_inv[i] = c_inv - 1.0 / (1.0 + np.trace(bc1)) * np.matmul(c_inv, bc1)

        self.mean = new_means[-1]
        self.C = cov_batch
        stdev = np.sqrt(np.diag(cov_batch))
        self.n += n_batch
        if self.n > self.start_clip:
            self.clip = [self.mean - self.std_clip * stdev, self.mean + self.std_clip * stdev]

        x_diff = proj_x - proj_means
        return np.matmul(x_diff[:, None, :], np.matmul(all_c_inv, x_diff[:, :, None])).reshape(n_batch)

    def score_stream(self, xs: np.ndarray, batch_size: int = 64) -> np.ndarray:
        """Score an ordered stream in FIXED batches (the chunking is part of
        the spec — see module docstring)."""
        xs = np.asarray(xs, dtype=np.float64)
        out = np.empty(xs.shape[0])
        for start in range(0, xs.shape[0], batch_size):
            sl = slice(start, start + batch_size)
            out[sl] = self.score(xs[sl])
        return out

    def state_dict(self) -> dict:
        return {
            "n": self.n,
            "mean": np.asarray(self.mean, dtype=np.float64),
            "C": np.asarray(self.C, dtype=np.float64),
            "clip_lo": None if self.clip is None else self.clip[0],
            "clip_hi": None if self.clip is None else self.clip[1],
        }

    @classmethod
    def from_state(cls, state: dict, **kwargs) -> "OnlineMahalanobis":
        det = cls(**kwargs)
        det.n = int(state["n"])
        det.mean = state["mean"]
        det.C = state["C"]
        if state.get("clip_lo") is not None:
            det.clip = [state["clip_lo"], state["clip_hi"]]
        return det
