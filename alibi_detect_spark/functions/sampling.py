"""Reservoir sampling + reference-update policies — NumPy recast of
``alibi_detect/utils/sampling.py:5-44`` (``reservoir_sampling``) and
``alibi_detect/cd/utils.py:13-48`` (``update_reference`` with ``{'last': n}``
or ``{'reservoir_sampling': n}``).

Engine placement: the ``'last'`` policy is relational (window row_number ≤ n —
see the ``ref_update_last_n`` driver query); the reservoir policy is a seeded
per-key recursion that runs in the per-key ordered ``applyInPandas`` (RNG
semantics-match, not bit-match, vs the reference — documented)."""

from __future__ import annotations

import numpy as np


def reservoir_sampling(
    x_ref: np.ndarray,
    x: np.ndarray,
    reservoir_size: int,
    n: int,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Apply reservoir sampling (``utils/sampling.py:5-44`` semantics:
    fill-then-replace with probability ``size/count``).

    ``x_ref`` is the current reservoir, ``x`` the new batch, ``n`` the number
    of instances seen BEFORE this batch."""
    rng = rng or np.random.default_rng(0)
    if x.shape[0] + x_ref.shape[0] <= reservoir_size:
        return np.concatenate([x_ref, x], axis=0)
    n_ref = x_ref.shape[0]
    output_size = min(reservoir_size, n_ref + x.shape[0])
    shape = (output_size,) + x.shape[1:]
    reservoir = np.zeros(shape, dtype=x_ref.dtype)
    reservoir[:n_ref] = x_ref
    for item in x:
        n += 1
        if n_ref < output_size:
            reservoir[n_ref, :] = item
            n_ref += 1
        else:
            r = int(rng.integers(0, n))
            if r < output_size:
                reservoir[r, :] = item
    return reservoir


def update_reference(
    x_ref: np.ndarray,
    x: np.ndarray,
    n: int,
    update_method: dict | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """``cd/utils.py:13-48``: ``{'last': k}`` keeps the most recent k;
    ``{'reservoir_sampling': k}`` maintains a uniform sample over the stream."""
    if update_method is None:
        return x_ref
    keys = list(update_method.keys())
    if keys != ["last"] and keys != ["reservoir_sampling"]:
        raise KeyError("update_method must be {'last': n} or {'reservoir_sampling': n}")
    size = update_method[keys[0]]
    if keys[0] == "last":
        return np.concatenate([x_ref, x], axis=0)[-size:]
    return reservoir_sampling(x_ref, x, size, n, rng=rng)
