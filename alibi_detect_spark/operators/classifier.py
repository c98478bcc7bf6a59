"""Classifier-based drift detection (``alibi_detect/cd/classifier.py:20-217``,
base machinery ``cd/base.py:22-310``): train a classifier to distinguish
reference from test instances; drift is significant out-of-fold
discrimination. Deterministic K-fold splits (``cd/base.py:158 get_splits``)
become a closed-form fold assignment (``id % n_folds``) so the whole
pipeline is partitioning-invariant; out-of-fold probabilities
(``cd/base.py:203 test_probs``) feed the KS two-sample test between the ref
and test probability samples (``preds_type='probs'`` path).

Two classifiers:

- :func:`classifier_drift_nb` — Gaussian naive Bayes. The fold-wise
  class-conditional moments are CLOSED FORM (exact DECIMAL aggregates), so
  out-of-fold probabilities — and the final KS stat — are expressible in
  ANSI SQL and hash-checked against the DuckDB oracle. Plan shape: one
  partial+final aggregate for the per-(fold, class) moments, one broadcast
  join of the (n_folds)-row moment table back onto the stream, column math,
  then the relational KS. Nothing iterative, nothing driver-side.
- :func:`classifier_drift_lr` — ``pyspark.ml`` LogisticRegression with
  explicit K-fold out-of-fold scoring (the reference's default classifier
  family). Training is iterative (L-BFGS) so there is no SQL oracle; the
  driver records a rows-only check and the behavioral pytest mirrors
  ``cd/tests/test_classifier.py`` (H0 p-value large, H1 p-value ~0).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .drift import ks_2samp

_TWO_PI = 2.0 * math.pi


def _hash_fold(id_col: str, n_folds: int):
    """Deterministic md5-derived fold (closed form, identical in DuckDB:
    ``CAST(('0x'||substr(md5(id),1,4)) AS BIGINT) % n``): decorrelated from
    any id-arithmetic labeling scheme — ``id % n`` folds would confound with
    an ``id % 2`` ref/test split and leave empty training cells."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast("long")
    return (h % n_folds).cast("int").alias("fold")


def classifier_drift_nb(
    df: DataFrame,
    num_cols: tuple[str, str],
    id_col: str,
    sample: str = "sample",
    n_folds: int = 4,
    var_eps: float = 1e-9,
) -> DataFrame:
    """Gaussian-NB ClassifierDrift: returns one row
    ``(feature, n_ref, n_test, ks_stat, p_value)`` — the KS test between the
    out-of-fold P(test | x) of reference vs test instances."""
    v_col, u_col = num_cols
    lab = df.select(
        F.col(sample).alias("s"),
        _hash_fold(id_col, n_folds),
        F.col(v_col).cast("double").alias("v"),
        F.col(u_col).cast("double").alias("u"),
    )
    dv = F.col("v").cast("decimal(18,4)")
    du = F.col("u").cast("decimal(18,4)")
    per_fold = lab.groupBy("fold", "s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dv).alias("sv"),
        F.sum(dv * dv).alias("svv"),
        F.sum(du).alias("su"),
        F.sum(du * du).alias("suu"),
    )
    totals = per_fold.groupBy("s").agg(
        F.sum("cnt").alias("t_cnt"),
        F.sum("sv").alias("t_sv"),
        F.sum("svv").alias("t_svv"),
        F.sum("su").alias("t_su"),
        F.sum("suu").alias("t_suu"),
    )
    # leave-fold-out training moments = totals − fold (exact decimal math)
    train = per_fold.join(totals, "s").select(
        "fold",
        "s",
        (F.col("t_cnt") - F.col("cnt")).cast("double").alias("n"),
        (F.col("t_sv") - F.col("sv")).cast("double").alias("sv"),
        (F.col("t_svv") - F.col("svv")).cast("double").alias("svv"),
        (F.col("t_su") - F.col("su")).cast("double").alias("su"),
        (F.col("t_suu") - F.col("suu")).cast("double").alias("suu"),
    )
    pick = lambda y, c: F.max(F.when(F.col("s") == y, F.col(c))).alias(f"{c}_{y}")  # noqa: E731
    wide = train.groupBy("fold").agg(
        *[pick(y, c) for y in ("ref", "test") for c in ("n", "sv", "svv", "su", "suu")]
    )
    j = lab.join(F.broadcast(wide), "fold")

    def loglik(y: str):
        n = F.col(f"n_{y}")
        mv = F.col(f"sv_{y}") / n
        varv = (F.col(f"svv_{y}") / n - mv * mv) + var_eps
        mu = F.col(f"su_{y}") / n
        varu = (F.col(f"suu_{y}") / n - mu * mu) + var_eps
        prior = n / (F.col("n_ref") + F.col("n_test"))
        return (
            F.lit(-0.5) * F.log(F.lit(_TWO_PI) * varv)
            - (F.col("v") - mv) * (F.col("v") - mv) / (F.lit(2.0) * varv)
            - F.lit(0.5) * F.log(F.lit(_TWO_PI) * varu)
            - (F.col("u") - mu) * (F.col("u") - mu) / (F.lit(2.0) * varu)
            + F.log(prior)
        )

    p_test = F.lit(1.0) / (F.lit(1.0) + F.exp(loglik("ref") - loglik("test")))
    probs = j.select(
        F.lit("clf_prob").alias("feature"),
        F.round(p_test, 9).alias("value"),
        F.col("s").alias(sample),
    )
    return ks_2samp(probs, "feature", "value", sample)


def classifier_drift_lr(
    df: DataFrame,
    num_cols: list[str],
    id_col: str,
    sample: str = "sample",
    n_folds: int = 3,
    max_iter: int = 10,
    reg_param: float = 0.01,
) -> DataFrame:
    """LogisticRegression ClassifierDrift (the reference's default classifier
    family) with explicit leave-fold-out scoring. Deterministic given the
    data (L-BFGS from a fixed init, closed-form fold assignment), but not
    SQL-expressible — rows-only driver check + behavioral pytest."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    lab = df.select(
        F.col(sample).alias("s"),
        _hash_fold(id_col, n_folds),
        (F.col(sample) != "ref").cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in num_cols],
    )
    asm = VectorAssembler(inputCols=list(num_cols), outputCol="features")
    assembled = asm.transform(lab).cache()
    parts = []
    for f in range(n_folds):
        lr = LogisticRegression(
            featuresCol="features", labelCol="y", maxIter=max_iter, regParam=reg_param
        )
        model = lr.fit(assembled.where(F.col("fold") != f))
        scored = model.transform(assembled.where(F.col("fold") == f))
        parts.append(
            scored.select(
                F.lit("clf_prob").alias("feature"),
                F.round(vector_to_array("probability")[1], 9).alias("value"),
                F.col("s").alias(sample),
            )
        )
    pooled = parts[0]
    for p in parts[1:]:
        pooled = pooled.unionByName(p)
    return ks_2samp(pooled, "feature", "value", sample)
