"""Round-4 operators: PValNormalizer ensemble column and the declared-
calibration decision thresholds for the online MMD / FET / LSDD families."""

import numpy as np
import pandas as pd
import pytest

from alibi_detect_spark.functions.online_thresholds import (
    fet_decision_thresholds,
    lsdd2_decision_thresholds,
    mmd_decision_thresholds,
)
from alibi_detect_spark.operators import ann


def _ref_pval_normalizer(scores: np.ndarray, val_scores: np.ndarray) -> np.ndarray:
    """Reference formula, od/pytorch/ensemble.py:100-115 verbatim in NumPy:
    transform(s) = 1 − (1 + #{val > s}) / (n_val + 1), per column."""
    less = scores[:, None, :] < val_scores[None, :, :]
    p_vals = (1 + less.sum(axis=1)) / (val_scores.shape[0] + 1)
    return 1.0 - p_vals


def test_pval_normalizer_matches_reference_formula(spark):
    rng = np.random.default_rng(7)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
    )
    emb = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    ks = (3, 5, 7)
    out = (
        ann.knn_ensemble_scores(emb, F.col("vec_id") % 5 == 0, ks=ks)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # brute-force the k-th NN distances exactly as the operator defines them
    ref_mask = np.arange(n) % 5 == 0
    r = vecs[ref_mask]
    ref_ids = np.arange(n)[ref_mask]
    d = np.round(
        np.sqrt(
            np.maximum(
                (vecs**2).sum(1)[:, None] + (r**2).sum(1)[None, :] - 2 * vecs @ r.T,
                0.0,
            )
        ),
        6,
    )
    d[np.arange(n)[:, None] == ref_ids[None, :]] = np.inf
    ds = np.sort(d, axis=1)
    scores = np.stack([ds[:, k - 1] for k in ks], axis=1)
    val_scores = scores[ref_mask]
    expect = _ref_pval_normalizer(scores, val_scores).mean(axis=1)

    got = out["pval_avg_score"].to_numpy()
    np.testing.assert_allclose(got, np.round(expect, 6), atol=1.5e-6)
    # outliers (large distances) must map near 1, inliers near the low end
    assert got.min() < 0.4 and got.max() > 0.9


def test_decision_thresholds_shapes_and_determinism():
    m = mmd_decision_thresholds()
    assert len(m) == 10 and all(np.isfinite(m))
    assert m == mmd_decision_thresholds()  # pure function of constants

    f = fet_decision_thresholds()
    assert len(f) == 29
    assert all(np.isnan(t) for t in f[:14]) and all(np.isfinite(t) for t in f[14:])
    # smoothed p-value stats live in (0, 1); thresholds must too
    assert all(0.0 < t < 1.0 for t in f[14:])

    l = lsdd2_decision_thresholds()
    assert len(l) == 10 and all(np.isfinite(t) and t > 0.0 for t in l)


def test_lsdd_thresholds_track_ert():
    # larger ert => rarer target false alarms => higher thresholds
    lo = lsdd2_decision_thresholds(ert=20.0, n_bootstraps=300)
    hi = lsdd2_decision_thresholds(ert=200.0, n_bootstraps=300)
    assert np.mean(hi) > np.mean(lo)


@pytest.mark.parametrize("name", ["mmd_decisions", "fet_decisions", "lsdd_decisions"])
def test_decision_queries_shape(spark, sf_dir, name):
    import __spark_entry__ as E

    out = E.queries()[name](spark, sf_dir).toPandas()
    # one row per event_type, counts well-formed
    assert len(out) == out["event_type" if "event_type" in out else "source"].nunique()
    key = "source" if "source" in out.columns else "event_type"
    assert set(out.columns) == {"detector", key, "n_scored", "n_drift"}
    assert (out["n_drift"] <= out["n_scored"]).all()
    assert (out["n_drift"] >= 0).all()
