"""Round-5 operator tests: categorical Mahalanobis (cat_vars/ABDM path)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from alibi_detect_spark.functions.abdm import (
    abdm_dpair,
    classical_mds_dabs,
    searchsorted_bin,
)


def _abdm_reference(X: np.ndarray, cat_col: int, bin_col: int, n_cat: int, n_bin: int):
    """Straight transcription of alibi_detect/utils/distance.py:125-196 for
    one categorical column with one binned context variable."""
    eps = 1e-12
    p_cond = np.zeros([n_bin, n_cat])
    for j in range(n_cat):
        rows = X[X[:, cat_col] == j]
        for i in range(n_bin):
            p_cond[i, j] = np.sum(rows[:, bin_col] == i) / (rows.shape[0] + eps)
    d = np.zeros([n_cat, n_cat])
    for i in range(n_cat):
        for j in range(i):
            acc = 0.0
            for t in range(n_bin):
                a, b = p_cond[t, i], p_cond[t, j]
                acc += a * np.log((a + eps) / (b + eps)) + b * np.log((b + eps) / (a + eps))
            d[i, j] = acc
    return d + d.T


def test_abdm_dpair_matches_reference_formula():
    rng = np.random.default_rng(7)
    n, k, nb = 4000, 5, 4
    X = np.stack([rng.integers(0, k, n), rng.integers(0, nb, n)], axis=1)
    want = _abdm_reference(X, 0, 1, k, nb)
    cont = [
        [int(((X[:, 0] == j) & (X[:, 1] == i)).sum()) for i in range(nb)]
        for j in range(k)
    ]
    counts = [int((X[:, 0] == j).sum()) for j in range(k)]
    got = np.array(abdm_dpair(cont, counts))
    assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(got, got.T)
    assert np.allclose(np.diag(got), 0.0)


def test_searchsorted_bin_matches_numpy():
    rng = np.random.default_rng(8)
    borders = [1.5, 3.25, 3.25, 7.0]  # includes a duplicated border
    uniq = np.unique(borders)
    for v in rng.uniform(0, 9, 200):
        assert searchsorted_bin(float(v), borders) == int(np.searchsorted(uniq, v))
    for q in borders:  # exactly-on-border cases (side='left')
        assert searchsorted_bin(q, borders) == int(np.searchsorted(uniq, q))


def test_classical_mds_recovers_euclidean_distances():
    """For a Euclidean-embeddable distance matrix of 2-D points, the top-2
    classical MDS embedding reproduces pairwise distances, so d_abs equals
    the standardized distance-from-the-max-norm point."""
    pts = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 4.0], [2.0, 2.0], [5.0, 5.0]])
    k = len(pts)
    dmat = [
        [round(float(np.linalg.norm(pts[i] - pts[j])), 9) for j in range(k)]
        for i in range(k)
    ]
    dabs = classical_mds_dabs(dmat, n_iter=60)
    # origin = point with max distance from the centroid (here [5,5], idx 4)
    cen = pts.mean(axis=0)
    dorig = np.linalg.norm(pts - pts[np.linalg.norm(pts - cen, axis=1).argmax()], axis=1)
    want = (dorig - dorig.mean()) / (dorig.std() + 1e-12)
    assert np.allclose(dabs, want, atol=1e-5)


def test_classical_mds_deterministic_and_scalarchain():
    """Same matrix twice -> bit-identical output (pure scalar chain, no RNG)."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 3, (6, 3))
    dmat = [
        [float(np.linalg.norm(pts[i] - pts[j])) for j in range(6)] for i in range(6)
    ]
    a = classical_mds_dabs(dmat)
    b = classical_mds_dabs([row[:] for row in dmat])
    assert a == b
    assert all(isinstance(x, float) and math.isfinite(x) for x in a)
    # standardization: mean ~ 0, population std ~ 1 (6dp rounding tolerance)
    assert abs(sum(a) / len(a)) < 1e-5
    assert abs(math.sqrt(sum((x - sum(a) / len(a)) ** 2 for x in a) / len(a)) - 1.0) < 1e-4


@pytest.mark.usefixtures("spark")
def test_mahalanobis_cat_operator(spark):
    """End-to-end: the operator's cat2num mapping concentrates outlier mass
    on rows whose (category, value) combination is rare."""
    import pandas as pd

    from alibi_detect_spark.operators.outlier import mahalanobis_cat_scores

    rng = np.random.default_rng(3)
    n = 2000
    cat = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    base = {"a": 10.0, "b": 50.0, "c": 90.0}
    val = np.array([base[c] for c in cat]) + rng.normal(0, 3.0, n)
    # 10 anomalous rows: category 'a' with category-'c' values
    val[:10] = 90.0 + rng.normal(0, 1.0, 10)
    cat[:10] = "a"
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(n), "event_type": cat, "value": val})
    )
    out = mahalanobis_cat_scores(df, "event_type", "value").toPandas()
    assert len(out) == n
    assert out["maha_cat"].notna().all()
    top20 = set(out.nlargest(20, "maha_cat")["event_id"])
    assert len(top20 & set(range(10))) >= 8


@pytest.mark.usefixtures("spark")
def test_ssa_w4_detects_spike(spark):
    """Window-4 SSA: a clean sinusoid reconstructs near-exactly; an injected
    spike dominates the reconstruction-error ranking around its position."""
    import pandas as pd

    from alibi_detect_spark.operators.detect import ssa_outlier_wfeat_over

    t = np.arange(400)
    x = 10.0 + 5.0 * np.sin(2 * np.pi * t / 24)
    x[200] += 40.0
    df = spark.createDataFrame(
        pd.DataFrame({"k": "s", "o": t.astype(np.int64), "x": x})
    )
    out = (
        ssa_outlier_wfeat_over(df, "k", "o", "x", w=4)
        .toPandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert len(out) == 400
    top = out.nlargest(4, "ssa4_score")["o"].to_numpy()
    # the spike window touches positions 197..203; all top errors sit there
    assert all(197 <= p <= 203 for p in top)
    assert 200 in top
    # away from the spike the rank-1 reconstruction has low error
    far = out[(out["o"] < 150) | (out["o"] > 250)]["ssa4_score"]
    assert far.median() < out.loc[200, "ssa4_score"] / 100


@pytest.mark.usefixtures("spark")
def test_ssa_w4_matches_numpy_power_method(spark):
    """The distributed per-key eigenvector equals a NumPy power method on the
    same lag Gram (same init, iterations, fold order is absorbed by tolerance)."""
    import pandas as pd

    from alibi_detect_spark.operators.detect import ssa_outlier_wfeat_over

    rng = np.random.default_rng(5)
    t = np.arange(300)
    x = np.round(20.0 + 8.0 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 300), 6)
    df = spark.createDataFrame(
        pd.DataFrame({"k": "s", "o": t.astype(np.int64), "x": x})
    )
    out = (
        ssa_outlier_wfeat_over(df, "k", "o", "x", w=4)
        .toPandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    # NumPy oracle: lag matrix, uncentered Gram, power method, Hankel average
    w = 4
    lagm = np.stack([x[i : len(x) - w + 1 + i] for i in range(w)], axis=1)
    g = lagm.T @ lagm / len(lagm)
    v = np.array([1.0, 0.0, 0.0, 0.0])
    for _ in range(8):
        wv = g @ v
        v = wv / np.linalg.norm(wv)
    proj = lagm @ v
    num = np.zeros(len(x))
    cnt = np.zeros(len(x))
    for s in range(len(lagm)):
        for i in range(w):
            num[s + i] += proj[s] * v[i]
            cnt[s + i] += 1
    want = np.round((x - num / cnt) ** 2, 6)
    got = out["ssa4_score"].to_numpy()
    assert np.allclose(got, want, atol=1e-5)


def test_mvdm_dpair_matches_reference_formula():
    """Transcription check of utils/distance.py:76-123 (alpha=1)."""
    rng = np.random.default_rng(17)
    n, k, ny = 3000, 4, 4
    X = rng.integers(0, k, n)
    y = rng.integers(0, ny, n)
    eps = 1e-12
    p_cond = np.zeros([k, ny])
    for i in range(k):
        idx = np.where(X == i)[0]
        for i_y in range(ny):
            p_cond[i, i_y] = np.sum(y[idx] == i_y) / (y[idx].shape[0] + eps)
    want = np.zeros([k, k])
    for i in range(k):
        for j in range(i):
            want[i, j] = np.sum(np.abs(p_cond[i] - p_cond[j]))
    want += want.T

    from alibi_detect_spark.functions.abdm import mvdm_dpair

    cont = [[int(((X == j) & (y == i)).sum()) for i in range(ny)] for j in range(k)]
    counts = [int((X == j).sum()) for j in range(k)]
    got = np.array(mvdm_dpair(cont, counts))
    assert np.allclose(got, want, atol=1e-9)


def test_combine_abdm_mvdm_reference_semantics():
    """od/mahalanobis.py:160-184: w-weighted combine then center by
    0.5*(max+min) then 8dp tie-free rounding; w=1 (centered) reduces to the
    recentered abdm vector."""
    from alibi_detect_spark.functions.abdm import combine_abdm_mvdm

    a = [1.0, -0.5, 0.25, 2.0]
    m = [0.0, 1.0, -1.0, 0.5]
    c = combine_abdm_mvdm(a, m, w=0.5)
    raw = [x * 0.5 + y * 0.5 for x, y in zip(a, m)]
    shift = 0.5 * (max(raw) + min(raw))
    assert c == [round(x - shift, 8) + 0.0 for x in raw]
    # centered output spans a symmetric range
    assert abs(max(c) + min(c)) < 2e-6
    only_a = combine_abdm_mvdm(a, m, w=1.0)
    shift_a = 0.5 * (max(a) + min(a))
    assert only_a == [round(x - shift_a, 8) + 0.0 for x in a]


@pytest.mark.usefixtures("spark")
def test_pca_sub_and_ae_emb_match_numpy_eigendecomposition(spark):
    """Rank-4 subspace residual and AE top-error score vs a straight NumPy
    eigendecomposition of the same quantized covariance (power+deflation
    converges to the true leading eigenbasis on a spectrum with gaps)."""
    import pandas as pd

    from alibi_detect_spark.operators.outlier import (
        ae_outlier_emb,
        pca_outlier_sub_emb,
    )

    rng = np.random.default_rng(21)
    n, d = 400, 64
    # anisotropic data: 4 dominant directions with distinct variances
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    scales = np.concatenate([[8.0, 6.0, 4.5, 3.0], np.full(d - 4, 0.3)])
    x = (rng.standard_normal((n, d)) * scales) @ basis.T
    x = np.round(x, 6)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x.astype(np.float32))})
    )
    sub = pca_outlier_sub_emb(df, n_iter=40).toPandas().sort_values("vec_id")
    ae = ae_outlier_emb(df, n_iter=40).toPandas().sort_values("vec_id")

    xq = np.round(x.astype(np.float32).astype(np.float64) * 1e6) / 1e6
    mu = xq.mean(axis=0)
    c = xq - mu
    cov = c.T @ c / n
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, ::-1][:, :4]
    proj = c @ top
    want_sub = (c * c).sum(axis=1) - (proj * proj).sum(axis=1)
    assert np.allclose(sub["pca_sub_resid"].to_numpy(), want_sub, atol=1e-3)

    rec = proj @ top.T
    err = (c - rec) ** 2
    topk = np.sort(err, axis=1)[:, -32:]
    assert np.allclose(ae["ae_emb_score"].to_numpy(), topk.mean(axis=1), atol=1e-4)

    # rank-4 residual is never larger than rank-1 (more variance explained)
    from alibi_detect_spark.operators.outlier import pca_outlier_emb

    r1 = pca_outlier_emb(df, n_iter=40).toPandas().sort_values("vec_id")
    assert (sub["pca_sub_resid"].to_numpy() <= r1["pca_resid"].to_numpy() + 1e-6).all()


@pytest.mark.usefixtures("spark")
def test_json_metadata_stats(spark):
    import pandas as pd

    from alibi_detect_spark.operators.multimodal import json_metadata_stats

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "props": ['{"k": %d}' % v for v in [1, 2, 3, 10, 5, 5, 8]],
        }
    )
    out = (
        json_metadata_stats(spark.createDataFrame(pdf), "props", "k", "k")
        .toPandas()
        .set_index("k")
    )
    assert out.loc["a", "n"] == 4 and out.loc["a", "sum_k"] == 16
    assert out.loc["a", "min_k"] == 1 and out.loc["a", "max_k"] == 10
    assert out.loc["a", "avg_k"] == 4.0
    assert out.loc["a", "p50_k"] == 3  # percentile(.5) of [1,2,3,10] = 2.5 -> rounds 3 HALF_UP
    assert out.loc["b", "p50_k"] == 5


@pytest.mark.usefixtures("spark")
def test_kpca_4land_matches_numpy_twin(spark):
    """4-landmark Nyström kPCA: the distributed score equals a NumPy twin of
    the same chain (md5 landmarks, Σ-var bandwidth, power-method principal
    direction, residual off it), and is partition-invariant. Note the
    semantics: like pca_outlier_4d it drops the TOP component — with 4
    kernel features the residual keeps the remaining manifold variance, so
    this instance is a subspace scorer, not an any-outlier detector (the
    2-landmark case is the detection-shaped instance)."""
    import hashlib

    from tests.test_round3b_ops import _manifold_with_adv

    from alibi_detect_spark.operators.outlier import kpca_outlier_4land

    df = _manifold_with_adv(spark, n=900, n_adv=5, seed=13)
    a = kpca_outlier_4land(df, ("v", "u"), "event_id").toPandas().sort_values("event_id")

    pdf = df.toPandas().sort_values("event_id")
    v, u = pdf["v"].to_numpy(), pdf["u"].to_numpy()
    pr = np.array(
        [hashlib.md5(f"kpca4:{i}".encode()).hexdigest() for i in pdf["event_id"]]
    )
    order = np.lexsort((pdf["event_id"].to_numpy(), pr))[:4]
    # bandwidth from 4dp-quantized moments (DECIMAL cast in-engine)
    v4, u4 = np.round(v, 4), np.round(u, 4)
    s2 = v4.var() + u4.var() + 1e-9
    feats = np.stack(
        [
            np.exp(-((v - v[o]) ** 2 + (u - u[o]) ** 2) / (2.0 * s2))
            for o in order
        ],
        axis=1,
    )
    fq = np.round(feats, 4)
    mu = fq.mean(axis=0)
    cov = (fq - mu).T @ (fq - mu) / len(fq)
    w = np.array([1.0, 0.0, 0.0, 0.0])
    for _ in range(8):
        z = cov @ w
        w = z / np.linalg.norm(z)
    c = feats - mu
    want = (c * c).sum(axis=1) - (c @ w) ** 2
    assert np.allclose(a["kpca4_resid"].to_numpy(), want, atol=1e-4)

    b = (
        kpca_outlier_4land(df.repartition(16, "u"), ("v", "u"), "event_id")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.reset_index(drop=True).equals(b)


@pytest.mark.usefixtures("spark")
def test_mahalanobis_cat_degenerate_guards(spark):
    """r6 hardening: NULL categories, k < 2, and k > max_categories fail fast
    with actionable errors instead of opaque sort/NaN failures."""
    import pandas as pd

    from alibi_detect_spark.operators.outlier import mahalanobis_cat_scores

    base = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "event_type": ["a", "b", "a", "b"],
         "value": [1.0, 2.0, 3.0, 4.0]}
    )
    nulls = base.copy()
    nulls.loc[0, "event_type"] = None
    with pytest.raises(ValueError, match="NULL"):
        mahalanobis_cat_scores(spark.createDataFrame(nulls), "event_type", "value")
    single = base.copy()
    single["event_type"] = "a"
    with pytest.raises(ValueError, match=">= 2 categories"):
        mahalanobis_cat_scores(spark.createDataFrame(single), "event_type", "value")
    with pytest.raises(ValueError, match="max_categories"):
        mahalanobis_cat_scores(
            spark.createDataFrame(base), "event_type", "value", max_categories=1
        )


def test_emb_quant_moments_overflow_guard(spark):
    """r6 hardening: components whose quantized magnitude could wrap int64 in
    the per-batch accumulation raise instead of corrupting the moments."""
    import numpy as np
    import pandas as pd

    from alibi_detect_spark.operators import outlier

    # quant=1e6 -> xq ~ 4e9 per component; 600 rows x (4e9)^2 >= 2^63
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(600, dtype=np.int64),
            "embedding": [np.full(4, 4e3, dtype=np.float64).tolist()] * 600,
        }
    )
    emb = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="overflow int64"):
        outlier.pca_outlier_emb(emb, dim=4)
