"""Isolation Forest — pure-NumPy recast of the reference's sklearn wrapper
(``alibi_detect/od/isolationforest.py:8-147``: fit on the reference batch,
``score = -decision_function`` so higher = more anomalous, threshold =
percentile of scores; ``predict`` → ``is_outlier = score > threshold``).

sklearn is absent from this environment by design, so the forest itself is
implemented here: seeded trees on uniform subsamples, uniformly random
(feature, split) choices (Liu et al., ICDM 2008), average path length
normalised by ``c(ψ)``, anomaly score ``2^(−E[h]/c(ψ))`` (monotone to
sklearn's ``-decision_function``, so percentile thresholds select the same
instances). Trees are stored as flat arrays; scoring is fully vectorized
(one gather per depth level per tree — no per-row Python).

Engine placement: fit on the broadcast reference, score inside the
``mapInPandas`` corpus scan of :mod:`..operators.outlier`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_EULER = 0.5772156649015329


def _c(n) -> np.ndarray:
    """Average unsuccessful-search path length of a BST with n points."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    m = n > 2
    out[m] = 2.0 * (np.log(n[m] - 1.0) + _EULER) - 2.0 * (n[m] - 1.0) / n[m]
    out[n == 2] = 1.0
    return out


@dataclass
class _Tree:
    feature: np.ndarray  # [n_nodes] int, -1 = leaf
    threshold: np.ndarray  # [n_nodes] float
    left: np.ndarray  # [n_nodes] int child index
    right: np.ndarray
    depth: np.ndarray  # [n_nodes] int
    leaf_size: np.ndarray  # [n_nodes] int (points that fell in the node)


def _build_tree(x: np.ndarray, rng: np.random.Generator, max_depth: int) -> _Tree:
    feature, threshold, left, right, depth, size = [], [], [], [], [], []
    stack = [(np.arange(x.shape[0]), 0, -1, False)]  # (rows, depth, parent, is_right)
    while stack:
        rows, d, parent, is_right = stack.pop()
        idx = len(feature)
        if parent >= 0:
            (right if is_right else left)[parent] = idx
        sub = x[rows]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        splittable = np.where(hi > lo)[0]
        if d >= max_depth or rows.size <= 1 or splittable.size == 0:
            feature.append(-1)
            threshold.append(0.0)
            left.append(-1)
            right.append(-1)
            depth.append(d)
            size.append(rows.size)
            continue
        f = int(rng.choice(splittable))
        t = float(rng.uniform(lo[f], hi[f]))
        feature.append(f)
        threshold.append(t)
        left.append(-1)
        right.append(-1)
        depth.append(d)
        size.append(rows.size)
        mask = sub[:, f] < t
        stack.append((rows[mask], d + 1, idx, False))
        stack.append((rows[~mask], d + 1, idx, True))
    return _Tree(
        np.array(feature, dtype=np.int64),
        np.array(threshold),
        np.array(left, dtype=np.int64),
        np.array(right, dtype=np.int64),
        np.array(depth, dtype=np.int64),
        np.array(size, dtype=np.int64),
    )


@dataclass
class IsolationForest:
    """Fitted isolation forest — broadcastable."""

    n_trees: int = 100
    max_samples: int = 256
    seed: int = 0
    trees: list = field(default_factory=list, repr=False)
    c_psi: float = 0.0

    @classmethod
    def fit(
        cls, x_ref: np.ndarray, n_trees: int = 100, max_samples: int = 256, seed: int = 0
    ) -> "IsolationForest":
        x_ref = np.asarray(x_ref, dtype=np.float64)
        n = x_ref.shape[0]
        psi = min(max_samples, n)
        rng = np.random.default_rng(seed)
        max_depth = int(np.ceil(np.log2(max(psi, 2))))
        trees = []
        for _ in range(n_trees):
            rows = rng.choice(n, size=psi, replace=False)
            trees.append(_build_tree(x_ref[rows], rng, max_depth))
        det = cls(n_trees=n_trees, max_samples=psi, seed=seed)
        det.trees = trees
        det.c_psi = float(_c(np.array([psi]))[0])
        return det

    def score(self, x: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1): ``2^(−E[path length]/c(ψ))``."""
        x = np.asarray(x, dtype=np.float64)
        m = x.shape[0]
        total = np.zeros(m)
        for tr in self.trees:
            node = np.zeros(m, dtype=np.int64)
            active = tr.feature[node] >= 0
            while active.any():
                f = tr.feature[node[active]]
                goes_left = x[active, f] < tr.threshold[node[active]]
                nxt = np.where(goes_left, tr.left[node[active]], tr.right[node[active]])
                node[active] = nxt
                active = tr.feature[node] >= 0
            # path length = leaf depth + c(leaf population) adjustment
            total += tr.depth[node] + _c(tr.leaf_size[node])
        eh = total / self.n_trees
        return np.power(2.0, -eh / self.c_psi)
