"""Exact sample quantiles with R-type interpolation.

Same estimator family as ``alibi_detect/utils/misc.py:4-52`` (types 6/7/8,
Hyndman & Fan 1996): ``h`` index per type, linear interpolation between order
statistics. Used for bootstrap threshold configuration — always driver-side on
small arrays, never ``percentile_approx`` (bit-match matters).
"""

from __future__ import annotations

import numpy as np


def quantile(sample: np.ndarray, p: float, qtype: int = 7, interpolate: bool = True) -> float:
    a = np.sort(np.asarray(sample, dtype=np.float64).ravel())
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty sample")
    if not (1 / n <= p <= (n - 1) / n):
        raise ValueError(f"p={p} not estimable from {n} samples")
    if qtype == 6:
        h = (n + 1) * p
    elif qtype == 7:
        h = (n - 1) * p + 1
    elif qtype == 8:
        h = (n + 1 / 3) * p + 1 / 3
    else:
        raise ValueError("qtype must be 6, 7 or 8")
    lo = int(h)
    q = a[lo - 1]
    if interpolate and lo != h:
        q = q + (h - lo) * (a[lo] - a[lo - 1])
    return float(q)
