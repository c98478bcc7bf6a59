"""Behavioral tests for the context-aware MMD recast
(``cd/context_aware.py`` semantics, mirroring
``cd/tests/test_context_aware.py``'s H0/H1 structure): no drift under the
same conditional, DETECTS conditional shift, and — the detector's defining
property — stays quiet under pure context (covariate) shift."""

import numpy as np
from pyspark.sql import functions as F

from alibi_detect_spark.functions.context_mmd import context_mmd_2samp


def _cond_sample(rng, n, shift=0.0, c_lo=0.0, c_hi=1.0):
    c = rng.uniform(c_lo, c_hi, n)
    x = np.sin(2 * np.pi * c) + 0.3 * rng.standard_normal(n) + shift
    return x[:, None], c[:, None]


def test_context_mmd_h0():
    rng = np.random.default_rng(81)
    x_ref, c_ref = _cond_sample(rng, 200)
    x, c = _cond_sample(rng, 200)
    res = context_mmd_2samp(x_ref, c_ref, x, c, n_permutations=60, seed=82)
    assert res.p_value > 0.05


def test_context_mmd_detects_conditional_shift():
    rng = np.random.default_rng(83)
    x_ref, c_ref = _cond_sample(rng, 200)
    x, c = _cond_sample(rng, 200, shift=1.5)
    res = context_mmd_2samp(x_ref, c_ref, x, c, n_permutations=60, seed=84)
    assert res.p_value < 0.02
    assert res.stat > res.threshold


def test_context_mmd_ignores_context_shift():
    """Covariate shift in c ONLY (test contexts concentrated in [0.5, 1])
    with the SAME conditional P(x|c) must not flag — the property plain MMD
    cannot offer (cd/context_aware.py docstring)."""
    rng = np.random.default_rng(85)
    x_ref, c_ref = _cond_sample(rng, 250)
    x, c = _cond_sample(rng, 250, c_lo=0.5, c_hi=1.0)
    res = context_mmd_2samp(x_ref, c_ref, x, c, n_permutations=60, seed=86)
    assert res.p_value > 0.05


def test_context_mmd_spark_operator(spark):
    from alibi_detect_spark.operators.drift import context_mmd_drift

    rng = np.random.default_rng(87)
    rows = []
    for i in range(1200):
        c = rng.uniform(0, 1)
        x = float(np.sin(2 * np.pi * c) + 0.3 * rng.standard_normal())
        rows.append((i, "ref" if i % 2 == 0 else "test", x, float(c)))
    df = spark.createDataFrame(rows, "event_id long, sample string, value double, c double")
    out = context_mmd_drift(df, "value", ["c"], n_per_side=150, n_permutations=40,
                            order_col="event_id").toPandas()
    assert out["n_ref"].iloc[0] == 150
    assert out["p_value"].iloc[0] > 0.05
