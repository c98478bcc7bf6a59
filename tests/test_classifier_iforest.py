"""Behavioral tests for ClassifierDrift (NB + LogisticRegression) and the
NumPy IsolationForest, mirroring the reference's test strategy
(``cd/tests/test_classifier.py``: H0 p-value large / H1 p-value small;
``od/tests/test_iforest.py:42-57``: off-cluster instances flagged)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from alibi_detect_spark.functions.iforest import IsolationForest
from alibi_detect_spark.operators.classifier import classifier_drift_lr, classifier_drift_nb


def _drift_df(spark, shift: float, n: int = 3000, seed: int = 0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        is_test = i % 2 == 1
        v = rng.normal(10.0 + (shift if is_test else 0.0), 2.0)
        u = rng.normal(50.0 + (2 * shift if is_test else 0.0), 10.0)
        rows.append((i, "test" if is_test else "ref", float(v), float(u)))
    return spark.createDataFrame(rows, "event_id long, sample string, value double, u double")


def test_classifier_drift_nb_h0(spark):
    # single H0 draw: p is uniform under the null, so only a loose lower
    # bound is sound (the reference's own H0 tests use the same tolerance idea)
    out = classifier_drift_nb(_drift_df(spark, 0.0, seed=5), ("value", "u"), "event_id").toPandas()
    assert out["p_value"].iloc[0] > 0.01


def test_classifier_drift_nb_h1(spark):
    out = classifier_drift_nb(_drift_df(spark, 2.0), ("value", "u"), "event_id").toPandas()
    assert out["p_value"].iloc[0] < 1e-4
    assert out["ks_stat"].iloc[0] > 0.1


def test_classifier_drift_lr_h0(spark):
    out = classifier_drift_lr(_drift_df(spark, 0.0, seed=5), ["value", "u"], "event_id").toPandas()
    assert out["p_value"].iloc[0] > 0.01


def test_classifier_drift_lr_h1(spark):
    out = classifier_drift_lr(_drift_df(spark, 2.0), ["value", "u"], "event_id").toPandas()
    assert out["p_value"].iloc[0] < 1e-4


def test_iforest_detects_off_cluster():
    rng = np.random.default_rng(33)
    x_ref = rng.standard_normal((500, 4))
    det = IsolationForest.fit(x_ref, n_trees=100, max_samples=256, seed=7)
    x = rng.standard_normal((200, 4))
    out_idx = [13, 99, 180]
    x[out_idx] += 6.0
    s = det.score(x)
    thr = np.percentile(s, 95)
    assert set(out_idx) <= set(np.where(s > thr)[0])
    # inliers score below outliers on average, scores bounded in (0, 1)
    assert (s > 0).all() and (s < 1).all()
    assert s[out_idx].min() > np.median(s)


def test_iforest_deterministic_and_spark_scan_matches(spark):
    rng = np.random.default_rng(34)
    x = rng.standard_normal((300, 4))
    rows = [(int(i), [float(v) for v in r]) for i, r in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from alibi_detect_spark.operators.outlier import iforest_outlier_scores

    got = (
        iforest_outlier_scores(df.repartition(5), F.col("vec_id") % 2 == 0, seed=9)
        .toPandas()
        .sort_values("vec_id")["iforest_score"]
        .to_numpy()
    )
    # same fit in-process: the scan must reproduce it exactly (broadcast fit,
    # vectorized traversal — no partitioning sensitivity)
    ref = x[::2]
    det = IsolationForest.fit(ref, n_trees=100, max_samples=256, seed=9)
    want = np.round(det.score(x), 6)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_iforest_seeded_reproducible(seed):
    rng = np.random.default_rng(40 + seed)
    x_ref = rng.standard_normal((200, 3))
    a = IsolationForest.fit(x_ref, n_trees=20, max_samples=64, seed=seed)
    b = IsolationForest.fit(x_ref, n_trees=20, max_samples=64, seed=seed)
    xs = rng.standard_normal((50, 3))
    assert np.array_equal(a.score(xs), b.score(xs))


def test_svm_one_class_detects_off_cluster():
    """OneClassSVM (od/_svm.py semantics): off-cluster instances score high."""
    from alibi_detect_spark.functions.svm import OneClassSVM

    rng = np.random.default_rng(55)
    x_ref = rng.standard_normal((400, 4))
    det = OneClassSVM.fit(x_ref, nu=0.1, n_components=64, seed=6)
    x = rng.standard_normal((200, 4))
    out_idx = [7, 77, 190]
    x[out_idx] += 6.0
    s = det.score(x)
    thr = np.percentile(s, 95)
    assert set(out_idx) <= set(np.where(s > thr)[0])
    # reference points mostly inside the margin: their scores sit below the
    # off-cluster ones
    assert s[out_idx].min() > np.median(s)


def test_svm_spark_scan_matches_numpy(spark):
    from alibi_detect_spark.functions.svm import OneClassSVM
    from alibi_detect_spark.operators.outlier import svm_outlier_scores

    rng = np.random.default_rng(56)
    x = rng.standard_normal((300, 4))
    rows = [(int(i), [float(v) for v in r]) for i, r in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (
        svm_outlier_scores(df.repartition(7), F.col("vec_id") % 2 == 0, seed=8)
        .toPandas()
        .sort_values("vec_id")["svm_score"]
        .to_numpy()
    )
    det = OneClassSVM.fit(x[::2], nu=0.1, n_components=64, seed=8)
    want = np.round(det.score(x), 6)
    assert np.array_equal(got, want)
