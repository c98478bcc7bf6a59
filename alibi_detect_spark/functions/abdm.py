"""Categorical-variable embedding for the legacy Mahalanobis detector —
the ``cat_vars`` path of ``alibi_detect/od/mahalanobis.py:23,64,82-108``:
ABDM pairwise category distances (``utils/distance.py:125-198``, Le et al.
2005), numerical-feature binning (``utils/discretizer.py`` quartile bins),
multidimensional scaling to per-category scalars, and standardization.

Spark-first recast with oracle parity in mind:

- ABDM is relational by nature: the conditional probabilities are one
  contingency aggregate ``P(other-var bin | category)`` and the pairwise
  distance is a symmetric-KL sum over bins — the engine computes the
  contingency DISTRIBUTED (one groupBy over the full table) and only the
  k×n_bins count relation ever reaches the driver.
- The reference embeds the pairwise distances with sklearn SMACOF MDS
  (``utils/distance.py:242-246``, random inits). sklearn is out of this
  environment, and SMACOF is RNG-seeded — this module substitutes CLASSICAL
  (Torgerson) MDS: double-centered Gram matrix, top-2 eigenvectors via a
  FIXED-ITERATION power method with deterministic ``e₁`` init and one
  deflation step. Classical MDS is the closed-form optimum of the same
  strain objective SMACOF iterates on; distance-from-origin readout and
  standardization follow the reference exactly (``distance.py:246-262``).
  Declared analog — see SURVEY §8 fidelity ledger.
- Every function here is SCALAR Python float math with explicit sequential
  fold order (never NumPy reductions): the DuckDB twin mirrors the chains
  term-for-term (``list_reduce`` ≡ the 0.0-seeded left fold), so the driver
  arithmetic and the SQL oracle produce bit-identical doubles. The only
  libm-dependent ops are the KL ``log`` calls, absorbed by a 9dp round of
  each pairwise distance; everything downstream is correctly-rounded IEEE
  (+ − × ÷ sqrt).
"""

from __future__ import annotations

import math

EPS = 1e-12


def searchsorted_bin(v: float, borders: list[float]) -> int:
    """``np.searchsorted(unique_borders, v)`` as used by the reference
    discretizer (``utils/discretizer.py:43``, side='left'): the count of
    distinct borders strictly below ``v``. Written as one conditional term
    per raw border so the SQL twin can mirror it without a dedup step."""
    bin_ = 0
    prev = None
    for q in borders:
        if prev is None or q > prev:
            bin_ += 1 if v > q else 0
        prev = q
    return bin_


def abdm_dpair(cont: list[list[int]], counts: list[int]) -> list[list[float]]:
    """ABDM pairwise category distances (``utils/distance.py:160-196``).

    ``cont[j][i]`` = count of rows with category ``j`` and context bin ``i``;
    ``counts[j]`` = total rows of category ``j``. Returns the full k×k
    symmetric distance matrix, each entry a sequential symmetric-KL fold over
    bins (ascending bin index — the reference's accumulation order) rounded
    at 9dp to absorb libm ``log`` ulps before the downstream MDS chain."""
    k = len(counts)
    n_bins = len(cont[0]) if k else 0
    p = [
        [float(cont[j][i]) / (float(counts[j]) + EPS) for i in range(n_bins)]
        for j in range(k)
    ]
    d = [[0.0] * k for _ in range(k)]
    for j1 in range(k):
        for j2 in range(k):
            acc = 0.0
            for i in range(n_bins):
                a, b = p[j1][i], p[j2][i]
                acc = acc + (
                    a * math.log((a + EPS) / (b + EPS))
                    + b * math.log((b + EPS) / (a + EPS))
                )
            d[j1][j2] = round(acc, 9) + 0.0
    return d


def _power_top(bmat: list[list[float]], n_iter: int) -> tuple[list[float], float]:
    """Fixed-iteration power method on a small symmetric matrix: ``e₁`` init,
    ``n_iter`` (mat-vec, normalize) steps, Rayleigh eigenvalue. Sequential
    folds mirror the SQL twin (same shape as ``pca_outlier_dfeat``)."""
    k = len(bmat)
    v = [1.0] + [0.0] * (k - 1)
    for _ in range(n_iter):
        w = []
        for j in range(k):
            acc = bmat[j][0] * v[0]
            for i in range(1, k):
                acc = acc + bmat[j][i] * v[i]
            w.append(acc)
        nrm2 = w[0] * w[0]
        for i in range(1, k):
            nrm2 = nrm2 + w[i] * w[i]
        nrm = math.sqrt(nrm2)
        v = [wj / nrm for wj in w]
    w = []
    for j in range(k):
        acc = bmat[j][0] * v[0]
        for i in range(1, k):
            acc = acc + bmat[j][i] * v[i]
        w.append(acc)
    lam = v[0] * w[0]
    for i in range(1, k):
        lam = lam + v[i] * w[i]
    return v, lam


def classical_mds_dabs(dpair: list[list[float]], n_iter: int = 16) -> list[float]:
    """Per-category scalar embedding of an ABDM distance matrix — the
    deterministic analog of ``multidim_scaling`` (``utils/distance.py:
    230-279``, n_components=2, standardize_cat_vars=True, smooth=1):
    classical MDS via double-centered Gram + 2 power-method eigenpairs,
    distance from the max-norm origin category (ties → larger index, the
    reference's stable-argsort readout), standardized to zero mean / unit
    std. Returns the k ``d_abs`` values rounded at 6dp (the literals both
    engines score with)."""
    k = len(dpair)
    d2 = [[dpair[j][i] * dpair[j][i] for i in range(k)] for j in range(k)]
    rmean = []
    for j in range(k):
        acc = d2[j][0]
        for i in range(1, k):
            acc = acc + d2[j][i]
        rmean.append(acc / k)
    grand = rmean[0]
    for j in range(1, k):
        grand = grand + rmean[j]
    grand = grand / k
    bmat = [
        [-0.5 * (d2[j][i] - rmean[j] - rmean[i] + grand) for i in range(k)]
        for j in range(k)
    ]
    u1, lam1 = _power_top(bmat, n_iter)
    b2 = [
        [bmat[j][i] - lam1 * u1[j] * u1[i] for i in range(k)] for j in range(k)
    ]
    u2, lam2 = _power_top(b2, n_iter)
    s1 = math.sqrt(lam1 if lam1 > 0.0 else 0.0)
    s2 = math.sqrt(lam2 if lam2 > 0.0 else 0.0)
    e1 = [s1 * u1[j] for j in range(k)]
    e2 = [s2 * u2[j] for j in range(k)]
    nrm = [math.sqrt(e1[j] * e1[j] + e2[j] * e2[j]) for j in range(k)]
    origin = 0
    for j in range(1, k):
        if nrm[j] >= nrm[origin]:
            origin = j
    dorig = [
        math.sqrt(
            (e1[j] - e1[origin]) * (e1[j] - e1[origin])
            + (e2[j] - e2[origin]) * (e2[j] - e2[origin])
        )
        for j in range(k)
    ]
    mean = dorig[0]
    for j in range(1, k):
        mean = mean + dorig[j]
    mean = mean / k
    var = (dorig[0] - mean) * (dorig[0] - mean)
    for j in range(1, k):
        var = var + (dorig[j] - mean) * (dorig[j] - mean)
    var = var / k
    std = math.sqrt(var)
    return [round((dorig[j] - mean) / (std + EPS), 6) + 0.0 for j in range(k)]


def mvdm_dpair(cont: list[list[int]], counts: list[int], alpha: int = 1) -> list[list[float]]:
    """MVDM pairwise category distances (``utils/distance.py:76-123``, Cost &
    Salzberg 1993): L^alpha distance between the per-category conditional
    label distributions. Same contingency input as :func:`abdm_dpair` —
    ``cont[j][i]`` = count of label/bin ``i`` within category ``j`` (the
    engine's declared label surrogate is the quartile bin of the numeric
    feature). alpha=1 is the reference default; sequential fold + 9dp round
    keep the SQL twin bit-identical."""
    k = len(counts)
    n_bins = len(cont[0]) if k else 0
    p = [
        [float(cont[j][i]) / (float(counts[j]) + EPS) for i in range(n_bins)]
        for j in range(k)
    ]
    d = [[0.0] * k for _ in range(k)]
    for j1 in range(k):
        for j2 in range(k):
            acc = 0.0
            for i in range(n_bins):
                acc = acc + abs(p[j1][i] - p[j2][i]) ** alpha
            d[j1][j2] = round(acc, 9) + 0.0
    return d


def combine_abdm_mvdm(
    dabs_abdm: list[float],
    dabs_mvdm: list[float],
    w: float = 0.5,
    center: bool = True,
) -> list[float]:
    """The ``d_type='abdm-mvdm'`` weighted combination
    (``od/mahalanobis.py:160-184``): ``v_abdm·w + v_mvdm·(1−w)`` over the two
    standardized MDS embeddings, then (``center=True``) shift by
    ``0.5·(max+min)`` of the combined values. Inputs are the 6dp-rounded
    ``d_abs`` vectors both engines already share.

    Rounded at 8dp, NOT 6: with w=0.5 the combined values are multiples of
    5e-7 and the 0.5·(max+min) shift halves the grid again, so the centered
    values are multiples of 2.5e-7 — sitting ON 6dp and 7dp half boundaries
    where Python's half-even and SQL's half-away rounding diverge. On the
    1e-8 grid they are tie-free (even multiples of 5e-9, ~1e-15 fp error vs
    a 5e-9 tie distance), so both engines round identically."""
    k = len(dabs_abdm)
    comb = [dabs_abdm[j] * w + dabs_mvdm[j] * (1.0 - w) for j in range(k)]
    if center:
        mx = max(comb)
        mn = min(comb)
        comb = [c - 0.5 * (mx + mn) for c in comb]
    return [round(c, 8) + 0.0 for c in comb]


# public alias: the fixed-iteration power method is reused by the
# multi-component embedding-width PCA/AE closed forms (operators/outlier.py)
power_top = _power_top


def deflate(bmat: list[list[float]], u: list[float], lam: float) -> list[list[float]]:
    """Rank-1 deflation ``B − λ·u·uᵀ`` with the exact association the SQL
    twins mirror (``b - lam*u[j]*u[i]``)."""
    k = len(bmat)
    return [[bmat[j][i] - lam * u[j] * u[i] for i in range(k)] for j in range(k)]
