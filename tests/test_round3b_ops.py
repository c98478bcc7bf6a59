"""Behavioral tests for the second half of round 3: the deep-family analogs
(LLR, VAE/pPCA, AEGMM/VAEGMM, AdversarialAE, ModelDistillation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from alibi_detect_spark.operators import llr


def _cluster_with_ood(spark, n: int = 2000, n_ood: int = 8, seed: int = 11):
    """Tight central cluster + a few far-out rows (the OOD instances)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(50.0, 3.0, n)
    u = rng.normal(20.0, 2.0, n)
    v[:n_ood] = rng.uniform(180.0, 200.0, n_ood)
    u[:n_ood] = rng.uniform(90.0, 99.0, n_ood)
    rows = [(int(i), float(v[i]), float(u[i])) for i in range(n)]
    return spark.createDataFrame(rows, "event_id long, v double, u double")


def test_llr_flags_ood(spark):
    """od/llr.py contract: instances far from the semantic density but
    relatively less unlikely under the wide background model get the top
    negative-LLR scores."""
    df = _cluster_with_ood(spark)
    top = llr.llr_outlier_2feat(df, ("v", "u"), "event_id", top_k=20).collect()
    top_ids = {r["event_id"] for r in top[:8]}
    assert top_ids == set(range(8))
    # ranks are 1..k in score order
    assert [r["rank"] for r in top] == list(range(1, 21))


def test_llr_partitioning_invariance(spark):
    """Exact DECIMAL moments + md5 mutation make the fit order-free: any
    repartitioning yields the identical top-k relation."""
    df = _cluster_with_ood(spark, n=1000)
    a = llr.llr_outlier_2feat(df.repartition(1), ("v", "u"), "event_id").collect()
    b = llr.llr_outlier_2feat(df.repartition(16, "v"), ("v", "u"), "event_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
