"""Spectral Residual saliency scoring for univariate, equidistant series.

Implements the SR algorithm of Ren et al., "Time-Series Anomaly Detection
Service at Microsoft" (KDD 2019), with the exact semantics of the reference
detector (``alibi_detect/od/sr.py:26-410``), re-expressed functionally:

1. extrapolate ``n_est_points`` tail points from the mean gradient of the last
   ``n_grad_points`` (``od/sr.py:276-318``);
2. saliency map (``od/sr.py:231-274``): FFT → ``log(|fft| + 1e-8)`` → moving
   average over the *first half of the symmetric spectrum* (bias term kept,
   mirror the filtered half back) → residual spectrum → ``|ifft(exp(res +
   i·phase))|``;
3. drop the padding; score ``(sr − ma_sr) / (ma_sr + 1e-8)`` where ``ma_sr``
   is the left-padded moving average of the *preceding* ``window_local``
   saliency points (``od/sr.py:349-367``; the filter carries a leading zero so
   the current point is excluded).

Pure NumPy → identical bits on driver and executors. In Spark the engine
scores each (source, chunk) series inside a grouped ``applyInPandas`` with a
halo so chunking is part of the spec (SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-8


def _pad_edges(x: np.ndarray, total: int, method: str, side: str) -> np.ndarray:
    """Pad so a 'valid' convolution with a (total+1)-tap filter keeps length.

    ``method`` ∈ {constant, replicate, reflect}; ``side`` ∈ {bilateral, left,
    right}. Matches the reference's ``pad_same`` (``od/sr.py:141-229``).
    """
    if side == "bilateral":
        right = total // 2
        left = total - right
    elif side == "left":
        left, right = total, 0
    else:
        left, right = 0, total
    if method == "replicate":
        lpad = np.full(left, x[0])
        rpad = np.full(right, x[-1])
    elif method == "reflect":
        lpad = x[1 : left + 1][::-1]
        rpad = x[-right - 1 : -1][::-1] if right > 0 else x[:0]
    elif method == "constant":
        lpad = np.zeros(left)
        rpad = np.zeros(right)
    else:
        raise ValueError(f"unknown padding method {method!r}")
    return np.concatenate([lpad, x, rpad])


def saliency_map(
    x: np.ndarray,
    window_amp: int,
    padding_amp_method: str = "reflect",
    padding_amp_side: str = "bilateral",
) -> np.ndarray:
    n = x.shape[0]
    if n <= window_amp:
        raise ValueError(f"series length {n} must exceed window_amp {window_amp}")
    spec = np.fft.fft(x)
    log_amp = np.log(np.abs(spec) + EPS)
    phase = np.angle(spec)
    # the DC bias passes through untouched; the moving average runs over the
    # first half of the symmetric frequencies and is mirrored back
    half = log_amp[1 : 1 + (n - 1 + 1) // 2]
    filt = np.full(window_amp, 1.0 / window_amp)
    padded = _pad_edges(half, window_amp - 1, padding_amp_method, padding_amp_side)
    ma_half = np.convolve(padded, filt, mode="valid")
    mirror = ma_half[:-1] if (n - 1) % 2 == 1 else ma_half
    ma_log_amp = np.concatenate([log_amp[:1], ma_half, mirror[::-1]])
    residual = log_amp - ma_log_amp
    return np.abs(np.fft.ifft(np.exp(residual + 1j * phase)))


def _tail_estimate(x: np.ndarray, t: np.ndarray, n_grad_points: int) -> float:
    """Mean-gradient extrapolated value appended after the series end
    (``od/sr.py:276-318``)."""
    dx = x[-1] - x[-n_grad_points - 1 : -1]
    dt = t[-1] - t[-n_grad_points - 1 : -1]
    grad = np.mean(dx / dt) * np.mean(dt)
    return float(x[-n_grad_points] + grad)


def sr_score(
    x: np.ndarray,
    t: np.ndarray | None = None,
    window_amp: int = 20,
    window_local: int = 20,
    n_est_points: int = 10,
    n_grad_points: int = 5,
    padding_amp_method: str = "reflect",
    padding_local_method: str = "reflect",
    padding_amp_side: str = "bilateral",
) -> np.ndarray:
    """Outlier score per point: ``(sr − ma_sr) / (ma_sr + EPS)``."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    n = x.shape[0]
    if t is None:
        t = np.arange(n)
    t = np.asarray(t, dtype=np.float64).reshape(-1)
    if n <= window_local:
        raise ValueError(f"series length {n} must exceed window_local {window_local}")
    x_ext = np.concatenate([x, np.full(n_est_points, _tail_estimate(x, t, n_grad_points))])
    sal = saliency_map(x_ext, window_amp, padding_amp_method, padding_amp_side)[:n]
    # local average of the *preceding* window_local saliency points: filter of
    # width window_local+1 whose first tap (after the convolution flip) is 0
    local_filt = np.full(window_local + 1, 1.0 / window_local)
    local_filt[0] = 0.0
    padded = _pad_edges(sal, window_local, padding_local_method, "left")
    ma_sal = np.convolve(padded, local_filt, mode="valid")
    return (sal - ma_sal) / (ma_sal + EPS)


def sr_chunk_scores(halo: np.ndarray, chunk: np.ndarray, **sr_params) -> np.ndarray:
    """Score ONE chunk given the carried halo tail: SR over ``halo ⧺ chunk``,
    emitting only the chunk's scores. The single shared kernel both the
    chunked batch operator and the streaming twin call — bit-match between
    them is by construction."""
    series = np.concatenate([halo, chunk]) if halo.size else chunk
    return sr_score(series, **sr_params)[halo.size:]


def sr_score_chunked(
    x: np.ndarray, chunk_size: int, halo: int, **sr_params
) -> np.ndarray:
    """Chunk+halo SR over an unbounded stream (the SURVEY §7.4 protocol,
    reference scoring semantics ``od/sr.py:320-368`` applied per chunk):
    deterministic chunk boundaries at multiples of ``chunk_size``; each chunk
    is scored on [last ``halo`` values ⧺ chunk]; only COMPLETE chunks emit
    scores (a trailing partial chunk stays pending — the streaming twin holds
    it in the state store until it fills). Returns ``(n // chunk_size) ·
    chunk_size`` scores.

    Requires ``chunk_size > max(window_amp, window_local)`` so the first
    (halo-less) chunk satisfies ``sr_score``'s length contract."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    if halo < 0:
        raise ValueError(f"halo must be >= 0, got {halo}")
    out = []
    h = np.empty(0)
    for i in range(len(x) // chunk_size):
        chunk = x[i * chunk_size : (i + 1) * chunk_size]
        out.append(sr_chunk_scores(h, chunk, **sr_params))
        # h[-0:] would be the WHOLE array — guard the halo=0 config
        h = np.concatenate([h, chunk])[-halo:] if halo > 0 else np.empty(0)
    return np.concatenate(out) if out else np.empty(0)


def sr_threshold(scores: np.ndarray, threshold_perc: float = 95.0) -> float:
    """``infer_threshold`` analog (``od/sr.py:112-139``): exact percentile."""
    return float(np.percentile(scores, threshold_perc))
