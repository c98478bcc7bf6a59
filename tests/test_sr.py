"""Spectral Residual behavioral fixture, ported from the reference test
strategy (``alibi_detect/od/tests/test_sr.py:6-53``): fixed-seed sinusoid,
10 perturbed points, ≤2 false positives clean / ≥10 detections perturbed."""

import itertools

import numpy as np
import pytest

from alibi_detect_spark.functions.sr import _pad_edges, sr_score, sr_threshold

t = np.linspace(0, 0.5, 1000)
X_clean = np.sin(40 * 2 * np.pi * t) + 0.5 * np.sin(90 * 2 * np.pi * t)
rng = np.random.default_rng(0)
idx_pert = rng.choice(1000, size=10, replace=False)
X_pert = X_clean.copy()
X_pert[idx_pert] = 10.0

PARAMS = list(itertools.product([10, 20], [20, 30], [10, 20]))


@pytest.mark.parametrize("window_amp,window_local,n_est_points", PARAMS)
def test_sr_behavioral(window_amp, window_local, n_est_points):
    threshold = 6.0
    kw = dict(window_amp=window_amp, window_local=window_local, n_est_points=n_est_points)
    clean_scores = sr_score(X_clean, t=np.arange(1000), **kw)
    pert_scores = sr_score(X_pert, t=np.arange(1000), **kw)
    assert int((clean_scores > threshold).sum()) <= 2
    assert int((pert_scores > threshold).sum()) >= 10
    # consistency: is_outlier == score > threshold by construction
    detected = set(np.where(pert_scores > threshold)[0])
    assert len(detected & set(idx_pert.tolist())) >= 9


def test_sr_threshold_is_exact_percentile():
    scores = sr_score(X_pert, window_amp=20, window_local=20, n_est_points=10)
    thr = sr_threshold(scores, 95.0)
    assert thr == float(np.percentile(scores, 95.0))


@pytest.mark.parametrize("method", ["constant", "replicate", "reflect"])
@pytest.mark.parametrize("side", ["bilateral", "left", "right"])
def test_pad_shapes(method, side):
    """Property check mirroring od/tests/test_sr.py:56-105: padding restores
    'same' length under a valid convolution, for many random sizes."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(10, 200))
        w = int(rng.integers(2, 9))
        x = rng.normal(size=n)
        padded = _pad_edges(x, w - 1, method, side)
        out = np.convolve(padded, np.ones(w) / w, mode="valid")
        assert out.shape[0] == n


def test_sr_rejects_short_series():
    with pytest.raises(ValueError):
        sr_score(np.arange(10, dtype=float), window_local=20)
