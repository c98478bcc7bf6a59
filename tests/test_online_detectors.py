"""Behavioral tests for the online FET / CVM detectors, mirroring the
reference's test strategy (``alibi_detect/cd/tests/test_cvm_online.py:19-62``,
``test_fet_online.py``): ERT calibration under H0, fast detection under H1,
and chunked scoring with carried state reproducing the unchunked trajectory
bit-for-bit (the resume contract)."""

import numpy as np
import pytest

from alibi_detect_spark.functions.cvm import OnlineCVM
from alibi_detect_spark.functions.fet import OnlineFET, hypergeom_sf_ge

ERT = 40.0


def test_hypergeom_sf_basic():
    # P[X >= 0] = 1; P[X >= N+1] = 0; monotone decreasing in k
    m, K, n = 30, 12, 8
    ks = np.arange(0, n + 2)
    sf = hypergeom_sf_ge(ks, m, np.full_like(ks, K), n)
    assert sf[0] == pytest.approx(1.0)
    assert sf[-1] == pytest.approx(0.0, abs=1e-12)
    assert np.all(np.diff(sf) <= 1e-12)
    # against a closed form: P[X >= n] for K >= n is C(K,n)/C(m,n)
    import math

    want = math.comb(K, n) / math.comb(m, n)
    assert sf[-2] == pytest.approx(want, rel=1e-10)


@pytest.fixture(scope="module")
def fet_det():
    rng = np.random.default_rng(0)
    x_ref = (rng.random(400) < 0.3).astype(int)
    return OnlineFET.fit(x_ref, ert=ERT, window_size=15, n_bootstraps=1500, seed=1)


def test_fet_ert_h0(fet_det):
    rng = np.random.default_rng(2)
    runs = []
    for _ in range(60):
        xs = (rng.random(int(6 * ERT)) < 0.3).astype(int)
        _, _, drift, _ = fet_det.score_stream(xs)
        hit = np.argmax(drift) if drift.any() else len(drift)
        runs.append(hit + 1)
    art = float(np.mean(runs))
    assert ERT / 3 < art < 3 * ERT, art


def test_fet_detects_h1(fet_det):
    rng = np.random.default_rng(3)
    adds = []
    for _ in range(20):
        xs = (rng.random(int(2 * ERT)) < 0.85).astype(int)  # strong shift up
        _, _, drift, _ = fet_det.score_stream(xs)
        assert drift.any()
        adds.append(np.argmax(drift) + 1)
    assert float(np.mean(adds)) < ERT / 2


def test_fet_chunked_resume(fet_det):
    rng = np.random.default_rng(4)
    xs = (rng.random(100) < 0.3).astype(int)
    full, thr_f, drift_f, _ = fet_det.score_stream(xs)
    a, _, _, carry = fet_det.score_stream(xs[:37])
    b, thr_b, drift_b, _ = fet_det.score_stream(
        xs[37:], t0=carry["t"], carry=carry["ewma"], warm=carry["tail"]
    )
    got = np.concatenate([a, b])
    assert np.array_equal(got.view(np.uint64), full.view(np.uint64))
    # thresholds are NaN before the first full window (raw-time indexing)
    assert np.array_equal(np.concatenate([thr_f[:37], thr_b]), thr_f, equal_nan=True)
    assert np.isnan(thr_f[: fet_det.window_size - 1]).all()
    assert np.isfinite(thr_f[fet_det.window_size - 1 :]).all()


@pytest.fixture(scope="module")
def cvm_det():
    rng = np.random.default_rng(5)
    x_ref = rng.standard_normal(200)
    return OnlineCVM.fit(x_ref, ert=ERT, window_size=10, n_bootstraps=400, seed=6)


def test_cvm_ert_h0(cvm_det):
    rng = np.random.default_rng(7)
    runs = []
    for _ in range(60):
        xs = rng.standard_normal(int(6 * ERT))
        _, _, drift, _ = cvm_det.score_stream(xs)
        hit = np.argmax(drift) if drift.any() else len(drift)
        runs.append(hit + 1)
    art = float(np.mean(runs))
    assert ERT / 3 < art < 3 * ERT, art


def test_cvm_detects_h1(cvm_det):
    rng = np.random.default_rng(8)
    adds = []
    for _ in range(20):
        xs = rng.standard_normal(int(2 * ERT)) + 2.5  # mean shift
        _, _, drift, _ = cvm_det.score_stream(xs)
        assert drift.any()
        adds.append(np.argmax(drift) + 1)
    assert float(np.mean(adds)) < ERT / 2


def test_cvm_chunked_resume(cvm_det):
    rng = np.random.default_rng(9)
    xs = rng.standard_normal(80)
    full, _, _, _ = cvm_det.score_stream(xs)
    a, _, _, carry = cvm_det.score_stream(xs[:29])
    b, _, _, _ = cvm_det.score_stream(xs[29:], t0=carry["t"], warm=carry["tail"])
    got = np.concatenate([a, b])
    fa = np.nan_to_num(full, nan=-999.0)
    ga = np.nan_to_num(got, nan=-999.0)
    assert np.array_equal(ga.view(np.uint64), fa.view(np.uint64))


def test_mahalanobis_online_detects_outliers():
    from alibi_detect_spark.functions.mahalanobis import OnlineMahalanobis

    rng = np.random.default_rng(11)
    x = rng.standard_normal((600, 3))
    idx = np.array([150, 300, 450])
    x[idx] += 8.0  # gross outliers
    det = OnlineMahalanobis(n_components=2)
    scores = det.score_stream(x, batch_size=64)
    thr = np.percentile(scores, 99)
    flagged = set(np.where(scores > thr)[0])
    assert set(idx) <= flagged


def test_mahalanobis_online_state_roundtrip():
    from alibi_detect_spark.functions.mahalanobis import OnlineMahalanobis

    rng = np.random.default_rng(12)
    x = rng.standard_normal((256, 3))
    a = OnlineMahalanobis(n_components=2)
    full = a.score_stream(x, batch_size=64)
    b = OnlineMahalanobis(n_components=2)
    first = b.score_stream(x[:128], batch_size=64)
    c = OnlineMahalanobis.from_state(b.state_dict(), n_components=2)
    second = c.score_stream(x[128:], batch_size=64)
    got = np.concatenate([first, second])
    assert np.array_equal(got.view(np.uint64), full.view(np.uint64))


@pytest.fixture(scope="module")
def lsdd_det():
    rng = np.random.default_rng(21)
    x_ref = rng.standard_normal((250, 2))
    from alibi_detect_spark.functions.lsdd import OnlineLSDD

    return OnlineLSDD.fit(x_ref, ert=ERT, window_size=10, n_bootstraps=500, seed=22)


def test_lsdd_ert_h0(lsdd_det):
    rng = np.random.default_rng(23)
    runs = []
    for _ in range(40):
        xs = rng.standard_normal((int(6 * ERT), 2))
        _, _, drift, _ = lsdd_det.score_stream(xs)
        hit = np.argmax(drift) if drift.any() else len(drift)
        runs.append(hit + 1)
    art = float(np.mean(runs))
    assert ERT / 3 < art < 3 * ERT, art


def test_lsdd_detects_h1(lsdd_det):
    rng = np.random.default_rng(24)
    adds = []
    for _ in range(15):
        xs = rng.standard_normal((int(2 * ERT), 2)) + 2.0
        _, _, drift, _ = lsdd_det.score_stream(xs)
        assert drift.any()
        adds.append(np.argmax(drift) + 1)
    assert float(np.mean(adds)) < ERT / 2


def test_lsdd_chunked_resume(lsdd_det):
    rng = np.random.default_rng(25)
    xs = rng.standard_normal((90, 2))
    full, thr_f, _, _ = lsdd_det.score_stream(xs)
    a, _, _, st = lsdd_det.score_stream(xs[:41])
    b, _, _, _ = lsdd_det.score_stream(xs[41:], state=st)
    got = np.concatenate([a, b])
    assert np.array_equal(got.view(np.uint64), full.view(np.uint64))


def test_lsdd_offline_perm_test():
    from alibi_detect_spark.functions.lsdd import lsdd_2samp

    rng = np.random.default_rng(61)
    a = rng.standard_normal((150, 2))
    p_same, _ = lsdd_2samp(a, rng.standard_normal((150, 2)), n_permutations=100, seed=62)
    p_shift, _ = lsdd_2samp(a, rng.standard_normal((150, 2)) + 1.5, n_permutations=100, seed=62)
    assert p_same > 0.05
    assert p_shift < 0.02


@pytest.fixture(scope="module")
def cvm_det_multi():
    rng = np.random.default_rng(13)
    x_ref = rng.standard_normal(200)
    return OnlineCVM.fit(x_ref, ert=ERT, window_sizes=(5, 10, 20), n_bootstraps=400, seed=14)


def test_cvm_multiwindow_ert_h0(cvm_det_multi):
    """Multi-window semantics (cd/base_online.py:221, cvm_online.py:245-264):
    drift = max over windows vs a single per-step threshold; ERT holds."""
    rng = np.random.default_rng(15)
    runs = []
    for _ in range(60):
        xs = rng.standard_normal(int(6 * ERT))
        stats, thr, drift, _ = cvm_det_multi.score_stream(xs)
        assert stats.shape[1] == 3
        # warm-up NaN per window: stat k is NaN before window_sizes[k] fills
        for k, ws in enumerate(cvm_det_multi.window_sizes):
            assert np.isnan(stats[: ws - 1, k]).all()
            assert np.isfinite(stats[ws - 1 :, k]).all()
        hit = np.argmax(drift) if drift.any() else len(drift)
        runs.append(hit + 1)
    art = float(np.mean(runs))
    assert ERT / 3 < art < 3 * ERT, art


def test_cvm_multiwindow_detects_h1(cvm_det_multi):
    rng = np.random.default_rng(16)
    adds = []
    for _ in range(20):
        xs = rng.standard_normal(int(2 * ERT)) + 2.5
        _, _, drift, _ = cvm_det_multi.score_stream(xs)
        assert drift.any()
        adds.append(np.argmax(drift) + 1)
    assert float(np.mean(adds)) < ERT / 2


def test_cvm_multiwindow_chunked_resume(cvm_det_multi):
    rng = np.random.default_rng(17)
    xs = rng.standard_normal(90)
    full, _, drift_f, _ = cvm_det_multi.score_stream(xs)
    a, _, da, carry = cvm_det_multi.score_stream(xs[:33])
    b, _, db, _ = cvm_det_multi.score_stream(xs[33:], t0=carry["t"], warm=carry["tail"])
    got = np.concatenate([a, b])
    fa = np.nan_to_num(full, nan=-999.0)
    ga = np.nan_to_num(got, nan=-999.0)
    assert np.array_equal(ga.view(np.uint64), fa.view(np.uint64))
    assert np.array_equal(np.concatenate([da, db]), drift_f)


def test_cvm_blocked_scoring_exact(cvm_det_multi):
    """Internal blocking of the boolean-matrix scorer is exact (integer
    counts): tiny block_size reproduces the one-shot trajectory bit-for-bit."""
    rng = np.random.default_rng(18)
    xs = rng.standard_normal(200)
    a, _, _, _ = cvm_det_multi.score_stream(xs)
    b, _, _, _ = cvm_det_multi.score_stream(xs, block_size=7)
    assert np.array_equal(
        np.nan_to_num(a, nan=-1.0).view(np.uint64), np.nan_to_num(b, nan=-1.0).view(np.uint64)
    )


@pytest.fixture(scope="module")
def fet_det_multi():
    rng = np.random.default_rng(19)
    x_ref = (rng.random(400) < 0.3).astype(int)
    return OnlineFET.fit(x_ref, ert=ERT, window_sizes=(10, 20), n_bootstraps=1500, seed=20)


def test_fet_multiwindow_ert_h0(fet_det_multi):
    rng = np.random.default_rng(26)
    runs = []
    for _ in range(60):
        xs = (rng.random(int(6 * ERT)) < 0.3).astype(int)
        stats, _, drift, _ = fet_det_multi.score_stream(xs)
        assert stats.shape[1] == 2
        hit = np.argmax(drift) if drift.any() else len(drift)
        runs.append(hit + 1)
    art = float(np.mean(runs))
    assert ERT / 3 < art < 3 * ERT, art


def test_fet_multiwindow_detects_h1(fet_det_multi):
    rng = np.random.default_rng(27)
    adds = []
    for _ in range(20):
        xs = (rng.random(int(2 * ERT)) < 0.85).astype(int)
        _, _, drift, _ = fet_det_multi.score_stream(xs)
        assert drift.any()
        adds.append(np.argmax(drift) + 1)
    assert float(np.mean(adds)) < ERT / 2


def test_fet_multiwindow_chunked_resume(fet_det_multi):
    rng = np.random.default_rng(28)
    xs = (rng.random(120) < 0.3).astype(int)
    full, _, drift_f, _ = fet_det_multi.score_stream(xs)
    a, _, da, carry = fet_det_multi.score_stream(xs[:47])
    b, _, db, _ = fet_det_multi.score_stream(
        xs[47:], t0=carry["t"], carry=carry["ewma"], warm=carry["tail"]
    )
    got = np.concatenate([a, b])
    fa = np.nan_to_num(full, nan=-999.0)
    ga = np.nan_to_num(got, nan=-999.0)
    assert np.array_equal(ga.view(np.uint64), fa.view(np.uint64))
    assert np.array_equal(np.concatenate([da, db]), drift_f)


def test_cvm_thresholds_distribution_free_shared():
    """fit_thresholds is a pure function of (n_ref, windows, ert, seed) —
    the driver computes it once and shares it across keys; per-key fits with
    precomputed thresholds must score identically to self-fit ones."""
    from alibi_detect_spark.functions.cvm import fit_thresholds

    thr = fit_thresholds(200, (10,), ERT, n_bootstraps=400, seed=6)
    rng = np.random.default_rng(5)
    x_ref = rng.standard_normal(200)
    a = OnlineCVM.fit(x_ref, ert=ERT, window_size=10, n_bootstraps=400, seed=6)
    b = OnlineCVM.fit(x_ref, ert=ERT, window_size=10, thresholds=thr)
    assert np.array_equal(a.thresholds, b.thresholds, equal_nan=True)
    xs = rng.standard_normal(100)
    sa, ta, da, _ = a.score_stream(xs)
    sb, tb, db, _ = b.score_stream(xs)
    assert np.array_equal(np.nan_to_num(sa, nan=-1.0), np.nan_to_num(sb, nan=-1.0))
    assert np.array_equal(da, db)


def test_fet_data_threshold_table_is_the_real_fit():
    """The (sum_ref -> thresholds) lookup rows must be EXACTLY what
    OnlineFET.fit produces on a key's actual reference bits: the bootstrap
    reads x_ref only through (n_ref, sum_ref), so any arrangement of bits
    with the same sum yields the same thresholds (cd/fet_online.py:134-223)."""
    from alibi_detect_spark.functions.online_thresholds import (
        fet_data_threshold_table,
    )

    tbl = fet_data_threshold_table()
    by_sum = {}
    for sr, tt, thr in tbl:
        by_sum.setdefault(sr, {})[tt] = thr
    # full sufficient-statistic domain, 15 finite steps each
    assert set(by_sum) == set(range(1, 200))
    assert all(set(v) == set(range(1, 16)) for v in by_sum.values())

    rng = np.random.default_rng(99)
    for sum_ref in (17, 160):
        # a shuffled reference with the same sufficient statistic
        bits = np.concatenate(
            [np.ones(sum_ref, dtype=np.int64), np.zeros(200 - sum_ref, dtype=np.int64)]
        )
        rng.shuffle(bits)
        det = OnlineFET.fit(
            bits, ert=100.0, window_sizes=(15,), n_bootstraps=1500, seed=42
        )
        got = [round(float(t), 6) for t in det.thresholds[14:29]]
        want = [by_sum[sum_ref][tt] for tt in range(1, 16)]
        assert got == want
