"""Codec round-trip + property tests (no Spark)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from alibi_detect_spark.functions import codec


def test_timestamps_roundtrip_regular():
    ts = np.arange(0, 3600 * 500, 3600, dtype=np.int64) + 1_700_000_000
    blob = codec.encode_timestamps(ts)
    assert np.array_equal(codec.decode_timestamps(blob), ts)
    # regular series ≈ 1 bit/point after the header
    assert len(blob) < 4 + 8 + 8 + len(ts) // 8 + 8


def test_timestamps_roundtrip_gappy():
    rng = np.random.default_rng(0)
    deltas = rng.choice([3600, 7200, 36000, 1, 10**7], size=1000)
    ts = np.cumsum(deltas).astype(np.int64)
    assert np.array_equal(codec.decode_timestamps(codec.encode_timestamps(ts)), ts)


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_timestamps_roundtrip_property(vals):
    ts = np.sort(np.array(vals, dtype=np.int64)) if vals else np.array([], dtype=np.int64)
    assert np.array_equal(codec.decode_timestamps(codec.encode_timestamps(ts)), ts)


def test_values_roundtrip_bits():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [
            rng.normal(1000, 5, 500),
            np.full(100, 3.25),
            np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-308, 1e308]),
        ]
    )
    out = codec.decode_values(codec.encode_values(x))
    assert np.array_equal(x.view(np.uint64), out.view(np.uint64))  # bit-exact incl. NaN


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_values_roundtrip_property(vals):
    x = np.array(vals, dtype=np.float64)
    out = codec.decode_values(codec.encode_values(x))
    assert np.array_equal(x.view(np.uint64), out.view(np.uint64))


def test_page_roundtrip():
    ts = np.arange(0, 3600 * 100, 3600, dtype=np.int64)
    cols = {
        "a": np.arange(100, dtype=np.float64),
        "b": np.full(100, np.nan),
        "zz": np.random.default_rng(2).normal(size=100),
    }
    ts2, cols2 = codec.decode_page(codec.encode_page(ts, cols))
    assert np.array_equal(ts, ts2)
    assert set(cols2) == set(cols)
    for k in cols:
        assert np.array_equal(cols[k].view(np.uint64), cols2[k].view(np.uint64))


def test_gorilla_compression_wins_on_smooth_series():
    """Sanity: slowly-varying doubles compress well below 8 bytes/point."""
    x = np.round(np.cumsum(np.full(4096, 1.0)), 6)
    blob = codec.encode_values(x)
    assert len(blob) < 4096 * 8 * 0.6


@pytest.mark.parametrize("n", [0, 1, 2])
def test_tiny_series(n):
    ts = np.arange(n, dtype=np.int64)
    x = np.linspace(0, 1, n)
    assert np.array_equal(codec.decode_timestamps(codec.encode_timestamps(ts)), ts)
    assert np.array_equal(codec.decode_values(codec.encode_values(x)), x)
