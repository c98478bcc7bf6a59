"""Online Cramér–von Mises drift detection — pure-NumPy recast of
``alibi_detect/cd/cvm_online.py:11-313``.

Semantics preserved:

- per-step statistic for window size w at raw stream time t (window = last w
  points): the two-sample CVM statistic between the reference and the sliding
  window, evaluated at the reference points AND the window points via
  right-continuous joint ECDFs (``cvm_online.py:212-242``, vectorized exactly
  like ``_ids_to_stats`` ``:279-313`` — boolean comparison matrices + integer
  cumulative sums, never a per-point Python loop), normalised per Anderson's
  expectation/variance (``_normalise_stats :267-276``: ``(T·nw/(n+w)² − μ)/σ``).
- multiple simultaneous window sizes (``cd/base_online.py:221``): stats are
  per-window, drift is flagged when the MAX over windows exceeds the single
  per-step threshold (``cvm_online.py:245-264 _check_drift``).
- thresholds are distribution-free (``cvm_online.py:108-143``: they depend
  only on (n_ref, window_sizes, ert, seed), not on the data): simulate seeded
  standard-normal streams, take per-step conditional ``(1−1/ert)`` quantiles
  of the max-over-windows stat, discarding exceeded streams. The engine
  computes them ONCE on the driver and broadcasts (`fit_thresholds`), exactly
  as it already does for the online-MMD bootstrap — never per key.
- threshold indexing follows the reference: thresholds are indexed by RAW
  stream time (NaN before ``min(window_sizes)−1``), lookups clamp at
  ``t_max = 2·max(window_sizes)−1`` (``cvm_online.py:128``, the point after
  which thresholds stop changing).

All window counts are integers (boolean cumsums), so chunked scoring with a
``max(window_sizes)−1`` warm tail reproduces the unchunked trajectory
bit-for-bit under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .quantile import quantile


def _anderson_norm(n: int, w: int) -> tuple[float, float, float]:
    """(scale, mean, std) of the two-sample CVM normalisation for sample
    sizes (n, w): stat = (T·scale − mean)/std (``cvm_online.py:267-276``)."""
    tot = n + w
    mean = 1.0 / 6.0 + 1.0 / (6.0 * tot)
    var_num = (tot + 1.0) * (4.0 * n * w * tot - 3.0 * (n * n + w * w) - 2.0 * n * w)
    var_denom = 45.0 * tot * tot * 4.0 * n * w
    scale = n * w / (tot * tot)
    return scale, mean, float(np.sqrt(var_num / var_denom))


def _cvm_stats_block(
    ref: np.ndarray,
    ref_s: np.ndarray,
    a_ref: np.ndarray,
    block: np.ndarray,
    warm: np.ndarray,
    t0: int,
    window_sizes: tuple[int, ...],
) -> np.ndarray:
    """Normalised CVM stats [len(block), n_windows] for every window END in
    ``block``; ``warm`` = the last ``max(ws)−1`` stream points preceding it,
    ``t0`` = number of stream points before the block (raw-time NaN cutoff).

    Vectorization mirrors the reference's boolean-matrix technique
    (``cvm_online.py:279-313``): all ECDF counts are integer cumsums of
    comparison matrices, so results are independent of blocking."""
    n = ref.shape[0]
    seq = np.concatenate([warm, block])
    L, nb = seq.shape[0], block.shape[0]
    off = L - nb
    out = np.full((nb, len(window_sizes)), np.nan)
    if nb == 0:
        return out
    # F_ref evaluated at every seq point (right-continuous: #ref <= p)
    a_seq = np.searchsorted(ref_s, seq, side="right") / n
    # window counts at ref points: C[i, s] = seq_s <= ref_i
    cs_c = np.zeros((n, L + 1), dtype=np.int64)
    np.cumsum(seq[None, :] <= ref[:, None], axis=1, out=cs_c[:, 1:])
    # window counts at seq points: B[p, s] = seq_s <= seq_p
    cs_b = np.zeros((L, L + 1), dtype=np.int64)
    np.cumsum(seq[None, :] <= seq[:, None], axis=1, out=cs_b[:, 1:])

    t_raw = t0 + np.arange(1, nb + 1)  # raw stream time, 1-based
    ends = off + np.arange(nb)  # window-end index within seq
    for k, w in enumerate(window_sizes):
        have = t_raw >= w
        if not have.any():
            continue
        e = ends[have]
        starts = e - w + 1  # >= 0 because warm carries max_ws-1 points
        # Layout note: both terms reduce along the CONTIGUOUS last axis of a
        # [ends × ...] row-major array, so each window end's sum uses the
        # same accumulation order regardless of how many ends share the
        # batch — the bit-level blocking/chunking invariance the resume and
        # streaming paths assert. (A column-wise reduction over [n × ends]
        # changes numpy's accumulation pattern with the batch width.)
        # term over reference points: sum_i (F_ref(ref_i) - F_win(ref_i))^2
        win_at_ref = (cs_c[:, e + 1] - cs_c[:, starts]).T / w  # [|e|, n]
        d1 = np.ascontiguousarray(a_ref[None, :] - win_at_ref)
        term_ref = np.einsum("ij,ij->i", d1, d1)
        # term over window points: sum_{p in win} (F_ref(p) - F_win(p))^2
        p_idx = starts[:, None] + np.arange(w)[None, :]  # [|e|, w]
        win_at_win = (cs_b[p_idx, e[:, None] + 1] - cs_b[p_idx, starts[:, None]]) / w
        d2 = np.ascontiguousarray(a_seq[p_idx] - win_at_win)
        term_win = np.einsum("ij,ij->i", d2, d2)
        scale, mean, std = _anderson_norm(n, w)
        out[have, k] = ((term_ref + term_win) * scale - mean) / std
    return out


def fit_thresholds(
    n_ref: int,
    window_sizes: tuple[int, ...],
    ert: float,
    n_bootstraps: int = 1000,
    seed: int = 0,
    t_max: int | None = None,
    batch_size: int = 128,
) -> np.ndarray:
    """Distribution-free CVM thresholds (``cvm_online.py:108-168``): simulate
    standard-normal streams, score max-over-windows, conditional quantiles
    with exceeded streams discarded. Indexed by raw time (NaN before
    ``min(window_sizes)−1``). Driver-side, once per (n_ref, windows, ert,
    seed) — NEVER per key (thresholds do not depend on the data)."""
    window_sizes = tuple(int(w) for w in window_sizes)
    max_ws, min_ws = max(window_sizes), min(window_sizes)
    t_max = t_max or 2 * max_ws - 1
    rng = np.random.default_rng(seed)
    fpr = 1.0 / ert
    warm0 = np.zeros(0)
    stats = np.empty((n_bootstraps, t_max, len(window_sizes)))
    for lo in range(0, n_bootstraps, batch_size):
        hi = min(lo + batch_size, n_bootstraps)
        xs = rng.standard_normal((hi - lo, n_ref + t_max))
        for b in range(hi - lo):
            ref = xs[b, :n_ref]
            ref_s = np.sort(ref)
            a_ref = np.searchsorted(ref_s, ref, side="right") / n_ref
            stats[lo + b] = _cvm_stats_block(
                ref, ref_s, a_ref, xs[b, n_ref:], warm0, 0, window_sizes
            )
    # max over windows; columns before min_ws-1 are all-NaN and never read
    max_stats = np.full((n_bootstraps, t_max), np.nan)
    max_stats[:, min_ws - 1:] = np.nanmax(stats[:, min_ws - 1:, :], axis=-1)
    thresholds = np.full(t_max, np.nan)
    for t in range(min_ws - 1, t_max):
        s = max_stats[:, t]
        if s.size < 2:
            thresholds[t:] = thresholds[t - 1] if t > min_ws - 1 else np.inf
            break
        p = min(1.0 - fpr, (s.size - 1) / s.size)
        thresholds[t] = quantile(s, max(p, 1.0 / s.size), qtype=7)
        max_stats = max_stats[s <= thresholds[t]]  # keep ties, like the reference
    return thresholds


@dataclass
class OnlineCVM:
    """Fitted online-CVM config — broadcastable."""

    ert: float
    window_sizes: tuple[int, ...]
    n_bootstraps: int = 1000
    seed: int = 0
    x_ref: np.ndarray = field(default=None, repr=False)
    ref_sorted: np.ndarray = field(default=None, repr=False)
    ref_cdf_ref: np.ndarray = field(default=None, repr=False)
    thresholds: np.ndarray = field(default=None, repr=False)

    @property
    def window_size(self) -> int:  # single-window convenience
        return self.window_sizes[0]

    @classmethod
    def fit(
        cls,
        x_ref: np.ndarray,
        ert: float,
        window_size: int | None = None,
        window_sizes: tuple[int, ...] | None = None,
        n_bootstraps: int = 1000,
        seed: int = 0,
        t_max: int | None = None,
        thresholds: np.ndarray | None = None,
    ) -> "OnlineCVM":
        """``thresholds`` may be precomputed via :func:`fit_thresholds` on the
        driver and shared across keys (they are distribution-free)."""
        if window_sizes is None:
            window_sizes = (int(window_size),)
        window_sizes = tuple(int(w) for w in window_sizes)
        x_ref = np.asarray(x_ref, dtype=np.float64).ravel()
        if thresholds is None:
            thresholds = fit_thresholds(
                x_ref.shape[0], window_sizes, ert, n_bootstraps, seed, t_max
            )
        ref_s = np.sort(x_ref)
        a_ref = np.searchsorted(ref_s, x_ref, side="right") / x_ref.shape[0]
        return cls(
            ert=ert,
            window_sizes=window_sizes,
            n_bootstraps=n_bootstraps,
            seed=seed,
            x_ref=x_ref,
            ref_sorted=ref_s,
            ref_cdf_ref=a_ref,
            thresholds=thresholds,
        )

    def score_stream(
        self,
        xs: np.ndarray,
        t0: int = 0,
        warm: np.ndarray | None = None,
        block_size: int = 4096,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Score an ordered batch; ``warm`` = last ``max(ws)−1`` points of the
        previous chunk. Returns ``(stats [n, n_windows], thresholds [n],
        is_drift [n], resume carry)``. Internally blocks the stream so the
        boolean comparison matrices stay bounded regardless of chunk size
        (integer counts make blocking exact)."""
        xs = np.asarray(xs, dtype=np.float64).ravel()
        max_ws = max(self.window_sizes)
        pre = np.zeros(0) if warm is None else np.asarray(warm, dtype=np.float64)
        n = xs.shape[0]
        stats = np.full((n, len(self.window_sizes)), np.nan)
        t_cur = t0
        tail = pre
        for lo in range(0, n, block_size):
            block = xs[lo : lo + block_size]
            stats[lo : lo + block.shape[0]] = _cvm_stats_block(
                self.x_ref, self.ref_sorted, self.ref_cdf_ref,
                block, tail, t_cur, self.window_sizes,
            )
            t_cur += block.shape[0]
            joined = np.concatenate([tail, block])
            tail = joined[-(max_ws - 1):] if max_ws > 1 else joined[:0]
        t = t0 + np.arange(1, n + 1)
        thr = self.thresholds[np.minimum(t - 1, len(self.thresholds) - 1)]
        with np.errstate(invalid="ignore"):
            max_stat = np.full(n, np.nan)
            any_fin = ~np.isnan(stats).all(axis=1)
            max_stat[any_fin] = np.nanmax(stats[any_fin], axis=1)
        drift = ((max_stat > thr) & ~np.isnan(max_stat) & ~np.isnan(thr)).astype(np.int32)
        return stats, thr, drift, {"t": int(t[-1]) if n else t0, "tail": tail}
