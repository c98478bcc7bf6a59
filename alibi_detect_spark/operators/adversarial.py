"""Adversarial-instance detectors — the ``alibi_detect/ad`` package recast
for Spark in closed form.

- :func:`adversarial_ae_2feat` — AdversarialAE (``ad/adversarialae.py:
  56-277``): score = KL(model(x) ‖ model(AE(x))) with temperature-sharpened
  model predictions (``ad/adversarialae.py:243-263``). The TF classifier
  becomes a closed-form Gaussian naive-Bayes head (exact DECIMAL moments, the
  proven ``classifier_drift_nb`` machinery) and the autoencoder becomes the
  linear-AE optimum — the rank-1 PCA reconstruction from a closed-form 2×2
  eigendecomposition (the ``pca_outlier_2feat`` recipe). Adversarial
  instances sit off the data manifold, so reconstruction moves them and the
  classifier's prediction flips — exactly the reference's detection signal.
- :func:`model_distillation_2feat` — ModelDistillation (``ad/
  model_distillation.py:17-194``): score = KL(model(x) ‖ distilled(x)). The
  distilled student is a closed-form RIDGE fit (quantized integer moments →
  exact 2×2 solve, the ``spot_the_diff_drift`` recipe) from a REDUCED input
  (first feature only) to the teacher's probability — a weaker student whose
  disagreement with the teacher spikes exactly where the reference's
  distilled model does.

Both are pure column math end to end: one partial+final DECIMAL moment
aggregate per fitted head, broadcast 1-row parameter relations, whole-stage
codegen scoring, ``TakeOrderedAndProject`` top-k — no UDF, no collect, and
every expression tree is mirrored term-for-term in the DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_TWO_PI = 2.0 * math.pi
_PLO = 1e-12
_PHI = 1.0 - 1e-12


def _nb2_wide(base: DataFrame) -> DataFrame:
    """1-row wide relation of per-class Gaussian-NB moments over (v, u) with
    binary class column ``y`` — exact DECIMAL sums, order-free."""
    dv = F.col("v").cast("decimal(18,4)")
    du = F.col("u").cast("decimal(18,4)")
    per = base.groupBy("y").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dv).alias("sv"),
        F.sum(dv * dv).alias("svv"),
        F.sum(du).alias("su"),
        F.sum(du * du).alias("suu"),
    )
    pick = lambda k, c: F.max(F.when(F.col("y") == k, F.col(c))).cast("double").alias(f"{c}_{k}")  # noqa: E731
    return per.agg(*[pick(k, c) for k in (0, 1) for c in ("cnt", "sv", "svv", "su", "suu")])


def _nb2_loglik(vc, uc, k: int, var_eps: float = 1e-9):
    """log P(x, y=k) under the fitted NB head, evaluated at (vc, uc) —
    the ``classifier_drift_nb`` loglik shape (same association order)."""
    n = F.col(f"cnt_{k}")
    mv = F.col(f"sv_{k}") / n
    varv = (F.col(f"svv_{k}") / n - mv * mv) + var_eps
    mu = F.col(f"su_{k}") / n
    varu = (F.col(f"suu_{k}") / n - mu * mu) + var_eps
    prior = n / (F.col("cnt_0") + F.col("cnt_1"))
    return (
        F.lit(-0.5) * F.log(F.lit(_TWO_PI) * varv)
        - (vc - mv) * (vc - mv) / (F.lit(2.0) * varv)
        - F.lit(0.5) * F.log(F.lit(_TWO_PI) * varu)
        - (uc - mu) * (uc - mu) / (F.lit(2.0) * varu)
        + F.log(prior)
    )


def _p1(vc, uc):
    """Clamped P(y=1 | x): sigmoid of the NB loglik difference. The clamp
    ([1e-12, 1−1e-12], identical literals in the oracle) absorbs the
    exp-overflow→0 edge so the KL terms stay finite."""
    raw = F.lit(1.0) / (F.lit(1.0) + F.exp(_nb2_loglik(vc, uc, 0) - _nb2_loglik(vc, uc, 1)))
    return F.least(F.greatest(raw, F.lit(_PLO)), F.lit(_PHI))


def _pca_recon_par(df: DataFrame) -> DataFrame:
    """1-row relation (mx, my, w1, w2, nrm2): rank-1 PCA reconstruction
    parameters from the closed-form 2×2 eigendecomposition — major
    eigenvalue ``λ₊``, direction ``w = (c, λ₊−a)``, ``nrm2 = |w|²``."""
    dx_in = F.col("v").cast("decimal(18,4)")
    dy_in = F.col("u").cast("decimal(18,4)")
    mo = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx_in).cast("double").alias("sx"),
        F.sum(dy_in).cast("double").alias("sy"),
        F.sum(dx_in * dx_in).cast("double").alias("sxx_r"),
        F.sum(dy_in * dy_in).cast("double").alias("syy_r"),
        F.sum(dx_in * dy_in).cast("double").alias("sxy_r"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mx"),
        (F.col("sy") / F.col("n")).alias("my"),
        (F.col("sxx_r") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))).alias("a"),
        (F.col("syy_r") / F.col("n") - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("b"),
        (F.col("sxy_r") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("c"),
    )
    lamp = (F.col("a") + F.col("b") + F.sqrt(
        (F.col("a") - F.col("b")) * (F.col("a") - F.col("b")) + F.lit(4.0) * F.col("c") * F.col("c")
    )) / F.lit(2.0)
    return mo.select(
        "mx",
        "my",
        F.col("c").alias("w1"),
        (lamp - F.col("a")).alias("w2"),
        (F.col("c") * F.col("c") + (lamp - F.col("a")) * (lamp - F.col("a"))).alias("nrm2"),
    )


def adversarial_ae_2feat(
    df: DataFrame,
    cols: tuple[str, str],
    label_col: str,
    id_col: str,
    top_k: int = 100,
) -> DataFrame:
    """AdversarialAE score over two features: KL between the NB head's
    temperature-sharpened prediction on x and its prediction on the rank-1
    PCA reconstruction of x (temperature = 1/2, i.e. squared-prob
    sharpening, ``ad/adversarialae.py:258-260``). Returns the top-k
    ``(id, adv_score, rank)`` by score (desc, ties by id)."""
    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
        F.col(label_col).cast("long").alias("y"),
    )
    j = (
        base.crossJoin(F.broadcast(_nb2_wide(base)))
        .crossJoin(F.broadcast(_pca_recon_par(base)))
    )
    # rank-1 reconstruction: x_rec = mean + (w·(x−mean)/|w|²)·w
    proj = (F.col("v") - F.col("mx")) * F.col("w1") + (F.col("u") - F.col("my")) * F.col("w2")
    rv = F.col("mx") + proj * F.col("w1") / F.col("nrm2")
    ru = F.col("my") + proj * F.col("w2") / F.col("nrm2")
    p1 = _p1(F.col("v"), F.col("u"))
    p0 = F.lit(1.0) - p1
    # temperature 1/2: y ← y^(1/T) renormalized = squared probs
    t1 = (p1 * p1) / (p1 * p1 + p0 * p0)
    t0 = F.lit(1.0) - t1
    r1 = _p1(rv, ru)
    r0 = F.lit(1.0) - r1
    score = t0 * F.log(t0 / r0) + t1 * F.log(t1 / r1)
    scored = j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("adv_score"))
    order = [F.col("adv_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "adv_score", F.col("rank").cast("int").alias("rank")
    )


def model_distillation_2feat(
    df: DataFrame,
    cols: tuple[str, str],
    label_col: str,
    id_col: str,
    lam: float = 1.0,
    top_k: int = 100,
) -> DataFrame:
    """ModelDistillation score: KL between the NB teacher's prediction and a
    ridge-distilled student that sees only the FIRST feature
    (``loss_type='kld'``, temperature 1, ``ad/model_distillation.py:
    171-190``). The student fit is exact: the teacher probability and the
    feature are quantized to integers (1e9 / 1e4), every normal-equation
    moment is an exact integer sum, and the 2×2 ridge system is solved in
    closed form. Returns the top-k ``(id, distill_score, rank)``."""
    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
        F.col(label_col).cast("long").alias("y"),
    )
    withp = base.crossJoin(F.broadcast(_nb2_wide(base))).select(
        id_col, "v", _p1(F.col("v"), F.col("u")).alias("p1")
    )
    q = withp.select(
        id_col,
        "v",
        "p1",
        F.round(F.col("v") * 10000).cast("long").alias("vq"),
        F.round(F.col("p1") * 1000000000).cast("long").alias("pq"),
    )
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    mom = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        big(F.col("vq")).alias("sv_r"),
        big(F.col("vq") * F.col("vq")).alias("svv_r"),
        big(F.col("pq")).alias("sp_r"),
        big(F.col("vq") * F.col("pq")).alias("svp_r"),
    ).select(
        "n",
        (F.col("sv_r") / F.lit(1e4)).alias("sv"),
        (F.col("svv_r") / F.lit(1e8)).alias("svv"),
        (F.col("sp_r") / F.lit(1e9)).alias("sp"),
        (F.col("svp_r") / F.lit(1e13)).alias("svp"),
    )
    det = (F.col("n") + F.lit(lam)) * (F.col("svv") + F.lit(lam)) - F.col("sv") * F.col("sv")
    coef = mom.select(
        (((F.col("svv") + F.lit(lam)) * F.col("sp") - F.col("sv") * F.col("svp")) / det).alias("b0"),
        (((F.col("n") + F.lit(lam)) * F.col("svp") - F.col("sv") * F.col("sp")) / det).alias("b1"),
    )
    sj = q.crossJoin(F.broadcast(coef))
    yhat = F.least(F.greatest(F.col("b0") + F.col("b1") * F.col("v"), F.lit(1e-6)), F.lit(0.999999))
    p1 = F.col("p1")
    p0 = F.lit(1.0) - p1
    score = p0 * F.log(p0 / (F.lit(1.0) - yhat)) + p1 * F.log(p1 / yhat)
    scored = sj.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("distill_score"))
    order = [F.col("distill_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "distill_score", F.col("rank").cast("int").alias("rank")
    )
