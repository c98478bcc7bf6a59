"""Data-independent decision thresholds for the oracle-checkable online
detectors — the ``cvm_decisions`` recipe generalized to the MMD / FET / LSDD
families.

The reference calibrates online thresholds against the reference window
(``cd/base_online.py:131-144``: per-step conditional ``(1 − 1/ert)`` quantiles
of simulated stat streams, exceeded streams discarded). That calibration is
data-DEPENDENT for MMD/FET/LSDD (the bootstrap resamples ``x_ref``), which a
static SQL oracle cannot reproduce across scale factors. These helpers run the
SAME fit/bootstrap machinery against a DECLARED calibration distribution —
constants of (seed, sizes, ert) only — so the resulting thresholds are pure
literals that both the Spark query and the DuckDB twin can inline, making the
threshold-lookup + comparison decision path (``cd/base_online.py:131-144,
382-395``) fully hash-checkable. The general data-dependent calibration stays
in the detector classes (``OnlineMMD.fit`` / ``OnlineFET.fit`` /
``OnlineLSDD.fit``) and the rows-only ``online_decisions`` query.

Every function here is called twice per run — once while building
``queries()`` and once while building ``oracle_sql()`` — and must therefore be
a deterministic pure function of its arguments.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .quantile import quantile


@lru_cache(maxsize=None)
def mmd_decision_thresholds(
    n_cal: int = 64,
    window_size: int = 10,
    sigma: float = 5.0,
    ert: float = 50.0,
    n_bootstraps: int = 500,
    seed: int = 42,
    lo: int = 1,
    hi: int = 10,
) -> tuple[float, ...]:
    """Thresholds for the deterministic-split online MMD
    (:func:`..operators.detect.mmd_online_stats_over`), calibrated by the real
    ``OnlineMMD.fit`` bootstrap (``cd/pytorch/mmd_online.py:134-192``) on a
    DECLARED calibration series: seeded integer-uniforms on ``[lo, hi]``
    (matching the magnitude of the hourly event counts the stat runs over),
    with the stat pipeline's fixed ``sigma``. Rounded to 6dp so the literal
    inlined in SQL is the exact double both engines compare against."""
    from .mmd import OnlineMMD

    rng = np.random.default_rng(seed)
    cal = rng.integers(lo, hi + 1, n_cal).astype(np.float64).reshape(-1, 1)
    det = OnlineMMD.fit(
        cal, ert=ert, window_size=window_size, n_bootstraps=n_bootstraps,
        seed=seed, sigma=sigma,
    )
    return tuple(round(float(t), 6) for t in det.thresholds)


@lru_cache(maxsize=None)
def fet_decision_thresholds(
    n_ref: int = 200,
    sum_ref: int = 160,
    window_sizes: tuple[int, ...] = (15,),
    ert: float = 100.0,
    n_bootstraps: int = 1500,
    seed: int = 42,
) -> tuple[float, ...]:
    """Thresholds for the online FET smoothed-p-value stream, via the real
    ``OnlineFET.fit`` Bernoulli-stream simulation (``cd/fet_online.py:
    134-223``) at a DECLARED baseline rate ``sum_ref / n_ref`` (0.8 by
    default — the corpus's ``value >= 10`` indicator rate). FET thresholds
    depend on the reference bits only through ``(n_ref, sum_ref)``, so fixing
    those two integers makes the whole array a constant. Entries before
    ``min(window_sizes) − 1`` are NaN (never read; reference indexing
    ``fet_online.py:108-113``)."""
    from .fet import OnlineFET

    bits = np.concatenate(
        [np.ones(sum_ref, dtype=np.int64), np.zeros(n_ref - sum_ref, dtype=np.int64)]
    )
    det = OnlineFET.fit(
        bits, ert=ert, window_sizes=tuple(window_sizes),
        n_bootstraps=n_bootstraps, seed=seed,
    )
    return tuple(
        float("nan") if not np.isfinite(t) else round(float(t), 6)
        for t in det.thresholds
    )


@lru_cache(maxsize=None)
def fet_data_threshold_table(
    n_ref: int = 200,
    window_sizes: tuple[int, ...] = (15,),
    ert: float = 100.0,
    n_bootstraps: int = 1500,
    seed: int = 42,
) -> tuple[tuple[int, int, float], ...]:
    """Data-DEPENDENT online-FET thresholds as a total lookup table over the
    sufficient statistic.

    The reference calibrates FET thresholds by bootstrapping Bernoulli streams
    at the ACTUAL reference success rate and scoring them against the ACTUAL
    reference window (``cd/fet_online.py:134-223``) — but that calibration
    depends on ``x_ref`` only through ``(n_ref, sum_ref)`` (the simulation rate
    is ``sum_ref/n_ref`` and the hypergeometric stat reads only the two
    totals). With ``n_ref`` fixed by the detector config, running the REAL
    :meth:`OnlineFET.fit` bootstrap once per admissible ``sum_ref`` (1 …
    n_ref−1; the degenerate all-0/all-1 references are rejected by the
    detector guard) yields thresholds for EVERY possible reference window.
    Both the Spark query and the DuckDB twin then join this table on the
    ``sum_ref`` computed FROM THE DATA — the thresholds each key actually uses
    are the reference's own data-dependent bootstrap output, selected by its
    actual reference bits.

    Returns ``(sum_ref, t, thr)`` rows with ``t`` 1-based from the first
    finite step (stream time ``min(window_sizes)``) through the clamp step
    ``t_max = 2·max(window_sizes) − 1`` (threshold indexing semantics
    ``cd/fet_online.py:108-113``), ``thr`` rounded to 6dp so the literal both
    engines compare against is the same double."""
    from .fet import OnlineFET

    min_ws, max_ws = min(window_sizes), max(window_sizes)
    rows: list[tuple[int, int, float]] = []
    for sum_ref in range(1, n_ref):
        bits = np.concatenate(
            [np.ones(sum_ref, dtype=np.int64), np.zeros(n_ref - sum_ref, dtype=np.int64)]
        )
        det = OnlineFET.fit(
            bits, ert=ert, window_sizes=tuple(window_sizes),
            n_bootstraps=n_bootstraps, seed=seed,
        )
        finite = det.thresholds[min_ws - 1 : 2 * max_ws - 1]
        rows.extend(
            (sum_ref, i + 1, round(float(t), 6))
            for i, t in enumerate(finite)
            if np.isfinite(t)
        )
    return tuple(rows)


@lru_cache(maxsize=None)
def lsdd2_decision_thresholds(
    n_ref: int = 64,
    window_size: int = 10,
    sigma: float = 5.0,
    lam: float = 0.25,
    ert: float = 50.0,
    n_bootstraps: int = 500,
    seed: int = 42,
    lo: float = 0.0,
    hi: float = 500.0,
    quant: int = 1_000_000_000,
) -> tuple[float, ...]:
    """Thresholds for the declarative two-center quantized online LSDD
    (:func:`..operators.detect.lsdd_online_stats_over`), by simulating
    ``n_bootstraps`` DECLARED uniform ``[lo, hi]`` calibration streams through
    the IDENTICAL stat chain (centers = first two ref values, quantized RBF
    features, exact window/reference sums, rank-2 Woodbury scalar algebra)
    and applying the reference's per-step conditional quantile with
    exceeded-stream discard (``cd/base_online.py:131-144``; type-7 quantile
    like ``OnlineLSDD.fit``). Thresholds clamp at ``t >= window_size``."""
    w = window_size
    rng = np.random.default_rng(seed)
    # each stream: n_ref reference values then 2w-1 stream values => w steps
    xs = rng.uniform(lo, hi, (n_bootstraps, n_ref + 2 * w - 1))
    two_sig2 = 2.0 * sigma * sigma
    a = 1.0 + lam

    c1, c2 = xs[:, 0:1], xs[:, 1:2]
    k1 = np.round(np.exp(-((xs - c1) ** 2) / two_sig2) * quant)
    k2 = np.round(np.exp(-((xs - c2) ** 2) / two_sig2) * quant)
    sr1 = k1[:, :n_ref].sum(axis=1)
    sr2 = k2[:, :n_ref].sum(axis=1)
    # rank-2 closed form (mirrors lsdd_online_stats_over / the SQL twin)
    e = np.exp(-((c1[:, 0] - c2[:, 0]) ** 2) / (2.0 * two_sig2))
    det_h = a * a - e * e
    b11, b12 = a / det_h, -e / det_h
    bh11, bh12 = b11 + b12 * e, b11 * e + b12
    bhb11, bhb12 = bh11 * b11 + bh12 * b12, bh11 * b12 + bh12 * b11
    m11, m12 = 2.0 * b11 - bhb11, 2.0 * b12 - bhb12

    cs1 = np.concatenate([np.zeros((n_bootstraps, 1)), np.cumsum(k1[:, n_ref:], axis=1)], axis=1)
    cs2 = np.concatenate([np.zeros((n_bootstraps, 1)), np.cumsum(k2[:, n_ref:], axis=1)], axis=1)
    stats = np.empty((n_bootstraps, w))
    for t in range(w):
        w1 = cs1[:, t + w] - cs1[:, t]
        w2 = cs2[:, t + w] - cs2[:, t]
        h1 = sr1 / (n_ref * float(quant)) - w1 / (w * float(quant))
        h2 = sr2 / (n_ref * float(quant)) - w2 / (w * float(quant))
        stats[:, t] = m11 * (h1 * h1 + h2 * h2) + 2.0 * m12 * h1 * h2

    fpr = 1.0 / ert
    thresholds = np.empty(w)
    cur = stats
    for t in range(w):
        s = cur[:, t]
        if s.size < 2:
            thresholds[t:] = thresholds[t - 1] if t else np.inf
            break
        p = min(1.0 - fpr, (s.size - 1) / s.size)
        thresholds[t] = quantile(s, max(p, 1.0 / s.size), qtype=7)
        cur = cur[s < thresholds[t]]
    return tuple(round(float(t), 9) for t in thresholds)
