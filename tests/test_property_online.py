"""Property-based chunking-invariance tests (hypothesis): for ANY split of
the stream into chunks, resuming the online detectors with their carries must
reproduce the unchunked trajectory bit-for-bit — the contract every page /
micro-batch / resume path in the engine relies on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from alibi_detect_spark.functions.cvm import OnlineCVM, fit_thresholds
from alibi_detect_spark.functions.fet import OnlineFET

_THR = fit_thresholds(60, (4, 7), ert=25.0, n_bootstraps=100, seed=3)
_RNG = np.random.default_rng(101)
_CVM_DET = OnlineCVM.fit(_RNG.standard_normal(60), ert=25.0, window_sizes=(4, 7), thresholds=_THR)
_FET_DET = OnlineFET.fit(
    (_RNG.random(150) < 0.4).astype(int), ert=25.0, window_sizes=(4, 7),
    n_bootstraps=200, seed=4,
)


def _chunks(xs, cuts):
    cuts = sorted({c % (len(xs) + 1) for c in cuts})
    bounds = [0] + [c for c in cuts if 0 < c < len(xs)] + [len(xs)]
    return [xs[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.floats(-5, 5, allow_nan=False), min_size=1, max_size=120),
    cuts=st.lists(st.integers(0, 120), max_size=5),
)
def test_cvm_any_chunking_bitmatches(data, cuts):
    xs = np.asarray(data, dtype=np.float64)
    full, _, drift_f, _ = _CVM_DET.score_stream(xs)
    got, dgot = [], []
    t0, warm = 0, None
    for ch in _chunks(xs, cuts):
        s, _, d, carry = _CVM_DET.score_stream(ch, t0=t0, warm=warm)
        got.append(s)
        dgot.append(d)
        t0, warm = carry["t"], carry["tail"]
    s_all = np.concatenate(got) if got else np.zeros((0, 2))
    assert np.array_equal(
        np.nan_to_num(s_all, nan=-1.0).view(np.uint64),
        np.nan_to_num(full, nan=-1.0).view(np.uint64),
    )
    assert np.array_equal(np.concatenate(dgot) if dgot else np.zeros(0), drift_f)


@settings(max_examples=25, deadline=None)
@given(
    bits=st.lists(st.integers(0, 1), min_size=1, max_size=120),
    cuts=st.lists(st.integers(0, 120), max_size=5),
)
def test_fet_any_chunking_bitmatches(bits, cuts):
    xs = np.asarray(bits, dtype=np.int64)
    full, _, drift_f, _ = _FET_DET.score_stream(xs)
    got, dgot = [], []
    t0, carry, warm = 0, None, None
    for ch in _chunks(xs, cuts):
        s, _, d, c = _FET_DET.score_stream(ch, t0=t0, carry=carry, warm=warm)
        got.append(s)
        dgot.append(d)
        t0, carry, warm = c["t"], c["ewma"], c["tail"]
    s_all = np.concatenate(got) if got else np.zeros((0, 2))
    assert np.array_equal(
        np.nan_to_num(s_all, nan=-1.0).view(np.uint64),
        np.nan_to_num(full, nan=-1.0).view(np.uint64),
    )
    assert np.array_equal(np.concatenate(dgot) if dgot else np.zeros(0), drift_f)


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(st.floats(-5, 5, allow_nan=False), min_size=30, max_size=200),
    block=st.integers(1, 50),
)
def test_cvm_internal_blocking_exact(data, block):
    xs = np.asarray(data, dtype=np.float64)
    a, _, _, _ = _CVM_DET.score_stream(xs)
    b, _, _, _ = _CVM_DET.score_stream(xs, block_size=block)
    assert np.array_equal(
        np.nan_to_num(a, nan=-1.0).view(np.uint64), np.nan_to_num(b, nan=-1.0).view(np.uint64)
    )
