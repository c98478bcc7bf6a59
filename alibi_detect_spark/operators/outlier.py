"""Batch outlier detectors over embedding columns (SURVEY §2.3 new-API ops).

Same plan shape as :mod:`.ann`: the reference set is collected once (small by
alibi-detect's own contract), the fit happens in NumPy, and scoring is a pure
``mapInPandas`` corpus scan — no shuffle of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ann import EMB_COL, _collect_matrix


def pca_outlier_scores(
    emb: DataFrame,
    ref_pred,
    n_components: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Linear-PCA outlier score (``alibi_detect/od/_pca.py:20-208``, torch
    backend ``od/pytorch/pca.py:121-171``): fit = eigendecomposition of the
    reference covariance, DROP the top ``n_components`` eigenvectors; score =
    squared norm of the centered instance projected onto the remaining
    (invariant) directions — variance off the principal subspace."""
    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    if n_components >= r.shape[1]:
        raise ValueError("n_components must be less than the number of features")
    mean = r.mean(axis=0)
    rc = r - mean
    cov = (rc.T @ rc) / (len(rc) - 1)
    _, v = np.linalg.eigh(cov)  # ascending — invariant dims are the head
    pcs = v[:, : -n_components]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            proj = (x - mean) @ pcs
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "pca_score": np.round((proj**2).sum(axis=1), 6),
                }
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, pca_score double")


def gmm_outlier_scores(
    emb: DataFrame,
    ref_pred,
    n_components: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """GMM outlier score (``alibi_detect/od/_gmm.py:22-231``): seeded EM fit
    on the broadcast reference, score = negative log-likelihood, one corpus
    scan."""
    from ..functions.gmm import GMMOutlier

    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    det = GMMOutlier(n_components=n_components, seed=seed).fit(r)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "gmm_score": np.round(det.score(x), 6),
                }
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, gmm_score double")
