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


def lof_outlier_scores(
    emb: DataFrame,
    ref_pred,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Local Outlier Factor vs a broadcast reference set
    (``alibi_detect/od/_lof.py:22-213`` semantics: fitted neighbourhood
    statistics on the reference, scores = mean neighbour-lrd / own-lrd).
    Fit is NumPy on the collected reference; scoring is one corpus scan."""
    _, ref_ids, r = _collect_matrix(emb, ref_pred, id_col)
    n_ref = r.shape[0]
    # pairwise within ref (self excluded); distances rounded to 6dp BEFORE
    # neighbour selection, ties broken by ref id — the repo-wide numeric
    # contract that makes the ranking reproducible against the SQL oracle
    d_rr = np.round(
        np.sqrt(
            np.maximum(
                np.einsum("ij,ij->i", r, r)[:, None]
                + np.einsum("ij,ij->i", r, r)[None, :]
                - 2.0 * (r @ r.T),
                0.0,
            )
        ),
        6,
    )
    np.fill_diagonal(d_rr, np.inf)
    order_rr = np.lexsort((np.broadcast_to(ref_ids, d_rr.shape), d_rr), axis=-1)
    rows = np.arange(n_ref)[:, None]
    nn_idx = order_rr[:, :k]
    kdist = d_rr[rows, nn_idx][:, -1]  # k-distance per ref point
    reach_rr = np.maximum(kdist[nn_idx], d_rr[rows, nn_idx])
    lrd_ref = 1.0 / (reach_rr.mean(axis=1) + 1e-12)

    r2 = np.einsum("ij,ij->i", r, r)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            d = np.round(
                np.sqrt(
                    np.maximum(
                        np.einsum("ij,ij->i", x, x)[:, None] + r2[None, :] - 2.0 * (x @ r.T), 0.0
                    )
                ),
                6,
            )
            # NOTE: a scanned point that IS a reference point keeps its 0-dist
            # self pair (fitted-reference semantics of od/_lof.py: the test
            # batch is scored against the fitted set as-is)
            idx = np.lexsort((np.broadcast_to(ref_ids, d.shape), d), axis=-1)[:, :k]
            rws = np.arange(len(x))[:, None]
            reach = np.maximum(kdist[idx], d[rws, idx])
            lrd_p = 1.0 / (reach.mean(axis=1) + 1e-12)
            lof = lrd_ref[idx].mean(axis=1) / lrd_p
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "lof_score": np.round(lof, 6)}
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, lof_score double")


def infer_threshold(
    scores, score_col: str, threshold_perc: float = 95.0, mode: str = "exact"
):
    """The reference's ``infer_threshold``/``predict`` contract
    (``alibi_detect/base.py`` ThresholdMixin; e.g. ``od/_knn.py:110``,
    ``od/isolationforest.py:100``) as a generic relational wrapper over ANY
    score relation: threshold = type-7 percentile of the scores,
    ``is_outlier = score > threshold``.

    Modes (all produce the same rounded threshold on the same data; they
    differ in how the order statistic is computed):

    - ``"exact"`` (default, the oracle-gate path): one ``percentile(...)``
      aggregate. Exact and lazy, but Spark's exact percentile buffers EVERY
      value in one aggregation buffer — fine for bounded score relations
      (the reference's own contract: scores of a fitted batch), NOT for a
      10^12-row scan.
    - ``"exact_2pass"``: exact at any scale with bounded memory —
      (1) count + ``approx_percentile`` bracket whose rank error is bounded
      by n/accuracy, (2) iterative distributed histogram refinement inside
      the bracket until the surviving range collects, then the exact type-7
      interpolation driver-side. Every pass is a scan + tiny aggregate; no
      full-value buffering anywhere. Eager (returns with a literal
      threshold).
    - ``"approx"``: single ``approx_percentile`` — for scale runs where a
      rank-bounded approximation is acceptable.
    """
    from pyspark.sql import functions as F

    p = threshold_perc / 100.0
    if mode == "exact":
        # materialize the score relation once (lazy checkpoint — no extra
        # build job): it feeds BOTH the percentile aggregate and the output
        # rows; upstream python/Arrow score stages would otherwise run twice
        scores = scores.localCheckpoint(eager=False)
        thr = scores.agg(
            F.round(F.expr(f"percentile({score_col}, {p})"), 6).alias("threshold")
        )
        return scores.crossJoin(F.broadcast(thr)).withColumn(
            "is_outlier", (F.col(score_col) > F.col("threshold")).cast("int")
        )
    if mode == "approx":
        thr = scores.agg(
            F.round(F.expr(f"approx_percentile({score_col}, {p}, 10000)"), 6).alias("threshold")
        )
        return scores.crossJoin(F.broadcast(thr)).withColumn(
            "is_outlier", (F.col(score_col) > F.col("threshold")).cast("int")
        )
    if mode != "exact_2pass":
        raise ValueError(f"unknown mode {mode!r}")
    thr_val = _exact_percentile_2pass(scores, score_col, p)
    return scores.withColumn("threshold", F.lit(round(thr_val, 6))).withColumn(
        "is_outlier", (F.col(score_col) > F.col("threshold")).cast("int")
    )


def _exact_percentile_2pass(
    scores, score_col: str, p: float, accuracy: int = 10000, collect_cap: int = 100_000
) -> float:
    """Exact type-7 percentile without full-value buffering: approx bracket
    (rank error ≤ n/accuracy) → distributed equal-width histogram refinement
    (each round narrows the candidate range ~accuracy×; every round is one
    scan of the cached bracket slice + one tiny aggregate) → exact
    interpolation on the ≤``collect_cap`` survivors. 10^12 rows converge in
    ≤3 refinement rounds; nothing larger than the histogram (``accuracy``
    rows) or the final survivor set ever reaches the driver."""
    from pyspark.sql import functions as F

    col = F.col(score_col)
    margin = 3.0 / accuracy
    qlo, qhi = max(0.0, p - margin), min(1.0, p + margin)
    head = scores.agg(
        F.count(col).alias("n"),
        F.expr(f"approx_percentile({score_col}, {qlo}, {accuracy})").alias("blo"),
        F.expr(f"approx_percentile({score_col}, {qhi}, {accuracy})").alias("bhi"),
    ).collect()[0]
    n, blo, bhi = head["n"], float(head["blo"]), float(head["bhi"])
    if n == 0:
        raise ValueError("cannot infer a threshold from an empty score relation")
    k = (n - 1) * p
    k1 = int(k)  # 0-based lower order statistic
    frac = k - k1
    k2 = min(k1 + 1, n - 1)
    # rank error of approx_percentile ≤ n/accuracy < margin·n ⇒ the true
    # k1/k2 order statistics lie in [blo, bhi]
    sl = scores.select(col.alias("v")).where((col >= blo) & (col <= bhi)).localCheckpoint()
    below = scores.where(col < blo).count()
    lo, hi = blo, bhi
    while True:
        if lo == hi:  # every surviving value is identical — no collect needed
            return lo
        cnt = sl.count()
        if cnt <= collect_cap:
            break
        width = (hi - lo) / accuracy
        if width <= 0.0:
            return lo
        b = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(accuracy - 1)
        ).cast("long")
        hist = (
            sl.groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"), F.min("v").alias("mn"), F.max("v").alias("mx"))
            .orderBy("b")
            .collect()
        )
        # walk the histogram to the bucket span covering ranks k1..k2
        run = below
        first = last = None
        for r in hist:
            if run <= k2 and run + r["c"] > k1:
                if first is None:
                    first = r
                last = r
            run += r["c"]
        new_lo, new_hi = float(first["mn"]), float(last["mx"])
        # identical values land in the same bucket, so every bucket before
        # `first` is strictly below new_lo — the histogram already gives the
        # new below-count without another full scan
        run = below
        for r in hist:
            if r["b"] == first["b"]:
                break
            run += r["c"]
        nxt = sl.where((F.col("v") >= new_lo) & (F.col("v") <= new_hi)).localCheckpoint()
        sl, lo, hi, below = nxt, new_lo, new_hi, run
    vals = sorted(r["v"] for r in sl.select("v").collect())
    v1 = vals[k1 - below]
    v2 = vals[k2 - below] if k2 != k1 else v1
    return float(v1 + frac * (v2 - v1))


def pca_outlier_2feat(
    df, cols: tuple[str, str], id_cols: list[str], top_k: int = 100
):
    """Linear-PCA outlier score over TWO features with a CLOSED-FORM
    eigendecomposition — the oracle-checkable instance of
    ``alibi_detect/od/_pca.py`` semantics (fit = covariance eigenbasis, drop
    the top component, score = squared projection onto the remaining
    invariant direction). For a 2×2 covariance [[a,c],[c,b]] the minor
    eigenvalue is ``λ− = ((a+b) − sqrt((a−b)² + 4c²))/2`` and its direction
    ``(c, λ−−a)``, so the whole detector is whole-stage-codegen column math:
    one partial+final DECIMAL moment aggregate (exact under any order), one
    broadcast join, no UDF. The d-dimensional eigendecomposition variant is
    :func:`pca_outlier_scores`."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    dx_in = F.col(x).cast("decimal(18,4)")
    dy_in = F.col(y).cast("decimal(18,4)")
    stats = df.agg(
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
    j = df.crossJoin(F.broadcast(stats))
    lam = (F.col("a") + F.col("b") - F.sqrt(
        (F.col("a") - F.col("b")) * (F.col("a") - F.col("b")) + F.lit(4.0) * F.col("c") * F.col("c")
    )) / F.lit(2.0)
    v1, v2 = F.col("c"), lam - F.col("a")
    dx = F.col(x).cast("double") - F.col("mx")
    dy = F.col(y).cast("double") - F.col("my")
    proj = dx * v1 + dy * v2
    score = (proj * proj) / (v1 * v1 + v2 * v2)
    scored = j.select(*id_cols, F.round(score, 6).alias("pca2_score"))
    # orderBy+limit → TakeOrderedAndProject: distributed per-partition top-k
    # + tiny driver merge (same shape as drift.mahalanobis_scores) — NOT a
    # single-partition global-window sort. row_number runs on k rows only.
    order = [F.col("pca2_score").desc(), *[F.col(c) for c in id_cols]]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        *id_cols, "pca2_score", F.col("rank").cast("int").alias("rank")
    )


def pca_outlier_dfeat(
    df,
    cols: tuple[str, ...],
    id_col: str = "event_id",
    n_iter: int = 8,
):
    """Linear-PCA outlier score over ANY number of features with a FIXED-
    ITERATION POWER METHOD — the parameterized-d oracle instance of
    ``alibi_detect/od/_pca.py`` semantics (fit = covariance eigenbasis, drop
    the top component, score = residual variance off the principal
    direction). The d-dim eigendecomposition variant stays in
    :func:`pca_outlier_scores` (rows-only).

    Exactness-by-construction: the covariance comes from exact DECIMAL
    moments (order-free under any partitioning), and the power iteration is
    driver-side scalar float math with a FIXED deterministic init (e₁) and a
    FIXED iteration count — no RNG, no quantization needed, because every
    operation (4×4 mat-vec, norm, divide) is an IEEE expression the SQL twin
    mirrors term-for-term from the same exact sums. Fixed ``n_iter`` is part
    of the spec (like the quantized-EM GMM's fixed E/M steps); with d=4 and
    a clear spectral gap, 8 iterations is far past float32 convergence, and
    when the gap is small the operator is still a well-defined deterministic
    scorer in both engines.

    Scale shape: ONE partial+final moment aggregate (d + d(d+1)/2 + 1 exact
    sums), all remaining math on the driver, then one codegen scan with the
    (μ, v) literals in the closure — no joins, no Python stages."""
    import math

    from pyspark.sql import functions as F

    d = len(cols)
    dec = [F.col(c).cast("decimal(18,4)") for c in cols]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for j in range(d):
        aggs.append(F.sum(dec[j]).cast("double").alias(f"s{j}"))
    for j in range(d):
        for k in range(j, d):
            aggs.append(F.sum(dec[j] * dec[k]).cast("double").alias(f"s{j}{k}"))
    g = df.agg(*aggs).collect()[0]
    n = g["n"]
    mu = [g[f"s{j}"] / n for j in range(d)]
    cmat = [[0.0] * d for _ in range(d)]
    for j in range(d):
        for k in range(j, d):
            cjk = g[f"s{j}{k}"] / n - (g[f"s{j}"] / n) * (g[f"s{k}"] / n)
            cmat[j][k] = cmat[k][j] = cjk

    v = [1.0] + [0.0] * (d - 1)
    for _ in range(n_iter):
        w = []
        for j in range(d):
            acc = cmat[j][0] * v[0]
            for k in range(1, d):
                acc = acc + cmat[j][k] * v[k]
            w.append(acc)
        nrm2 = w[0] * w[0]
        for k in range(1, d):
            nrm2 = nrm2 + w[k] * w[k]
        nrm = math.sqrt(nrm2)
        v = [wj / nrm for wj in w]

    xc = [F.col(c).cast("double") - F.lit(m) for c, m in zip(cols, mu)]
    tot = xc[0] * xc[0]
    proj = xc[0] * F.lit(v[0])
    for j in range(1, d):
        tot = tot + xc[j] * xc[j]
        proj = proj + xc[j] * F.lit(v[j])
    return df.select(
        id_col, (F.round(tot - proj * proj, 6) + F.lit(0.0)).alias("pca_resid")
    )


def _emb_quant_moments(emb, vec_col: str, d: int, quant: int):
    """ONE Arrow pass of per-batch partial integer sums of the quantized
    embedding components (Σ xq_j, Σ xq_j·xq_k; d(d+1)/2-row relation per
    batch, int64-safe per batch, exact DECIMAL total) → the (n, μ, Σ) fit
    moments on the driver. The 100 TB shape shared by every emb-width
    closed form (see :func:`pca_outlier_emb` docstring)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    def moments_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * float(quant)
            xq = np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)).astype(np.int64)
            # enforce the "int64-safe per batch" claim: |xq| ≤ B with
            # rows·B² < 2⁶³ guarantees the per-batch accumulation cannot
            # wrap (numpy wraps silently); fail loudly instead of corrupting
            # the fit moments
            mx = int(np.abs(xq).max(initial=0))
            if mx and len(xq) * mx * mx >= 2**63:
                raise ValueError(
                    f"emb quantized moments: |component*quant| up to {mx} over "
                    f"{len(xq)} rows/batch can overflow int64 — lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch or quant"
                )
            s1 = xq.sum(axis=0)
            s2 = xq.T @ xq  # [d, d] int64 — asserted safe per Arrow batch
            rows = {"j": [], "k": [], "v": []}
            rows["j"].append(-1); rows["k"].append(-1); rows["v"].append(len(xq))
            for j in range(d):
                rows["j"].append(j); rows["k"].append(-1); rows["v"].append(int(s1[j]))
                for k in range(j, d):
                    rows["j"].append(j); rows["k"].append(k); rows["v"].append(int(s2[j, k]))
            yield pd.DataFrame(rows)

    mom = (
        emb.select(vec_col)
        .mapInPandas(moments_fn, schema="j int, k int, v long")
        .groupBy("j", "k")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).cast("double").alias("s"))
        .collect()
    )
    s = {(int(r["j"]), int(r["k"])): r["s"] for r in mom}
    n = s[(-1, -1)]
    q = float(quant)
    mu = [s[(j, -1)] / (n * q) for j in range(d)]
    cmat = [[0.0] * d for _ in range(d)]
    for j in range(d):
        for k in range(j, d):
            cjk = s[(j, k)] / (n * q * q) - mu[j] * mu[k]
            cmat[j][k] = cmat[k][j] = cjk
    return n, mu, cmat


def pca_outlier_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 8,
    quant: int = 1_000_000,
):
    """:func:`pca_outlier_dfeat` at the reference's REAL embedding width —
    rank-1 principal direction over a d-dim ``array<float>`` column via the
    fixed-iteration power method, fully oracle-checkable at d = 64.

    Moments come from ONE Arrow pass emitting per-batch partial integer
    sums of the quantized components (``Σ xq_j``, ``Σ xq_j·xq_k`` — a
    d(d+1)/2-row relation per batch, int64-safe per batch, exact DECIMAL
    total): the 100 TB shape, constant driver state, no d²-per-row blow-up.
    The SQL twin derives the SAME integers from a posexplode pair join —
    value-identical because integer sums are order-free. The power
    iteration is driver-side scalar math with sequential left-fold
    associations; scoring uses ``F.aggregate`` (a sequential fold, exactly
    DuckDB's ``list_reduce`` order) so the per-row reductions are
    bit-identical too."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    d = dim

    def moments_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * float(quant)
            xq = np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)).astype(np.int64)
            # enforce the "int64-safe per batch" claim: |xq| ≤ B with
            # rows·B² < 2⁶³ guarantees the per-batch accumulation cannot
            # wrap (numpy wraps silently); fail loudly instead of corrupting
            # the fit moments
            mx = int(np.abs(xq).max(initial=0))
            if mx and len(xq) * mx * mx >= 2**63:
                raise ValueError(
                    f"emb quantized moments: |component*quant| up to {mx} over "
                    f"{len(xq)} rows/batch can overflow int64 — lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch or quant"
                )
            s1 = xq.sum(axis=0)
            s2 = xq.T @ xq  # [d, d] int64 — asserted safe per Arrow batch
            rows = {"j": [], "k": [], "v": []}
            rows["j"].append(-1); rows["k"].append(-1); rows["v"].append(len(xq))
            for j in range(d):
                rows["j"].append(j); rows["k"].append(-1); rows["v"].append(int(s1[j]))
                for k in range(j, d):
                    rows["j"].append(j); rows["k"].append(k); rows["v"].append(int(s2[j, k]))
            yield pd.DataFrame(rows)

    mom = (
        emb.select(vec_col)
        .mapInPandas(moments_fn, schema="j int, k int, v long")
        .groupBy("j", "k")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).cast("double").alias("s"))
        .collect()
    )
    s = {(int(r["j"]), int(r["k"])): r["s"] for r in mom}
    n = s[(-1, -1)]
    q = float(quant)
    mu = [s[(j, -1)] / (n * q) for j in range(d)]
    cmat = [[0.0] * d for _ in range(d)]
    for j in range(d):
        for k in range(j, d):
            cjk = s[(j, k)] / (n * q * q) - mu[j] * mu[k]
            cmat[j][k] = cmat[k][j] = cjk

    import math

    v = [1.0] + [0.0] * (d - 1)
    for _ in range(n_iter):
        w = []
        for j in range(d):
            acc = cmat[j][0] * v[0]
            for k in range(1, d):
                acc = acc + cmat[j][k] * v[k]
            w.append(acc)
        nrm2 = w[0] * w[0]
        for k in range(1, d):
            nrm2 = nrm2 + w[k] * w[k]
        nrm = math.sqrt(nrm2)
        v = [wj / nrm for wj in w]

    # per-row reductions as SEQUENTIAL folds (F.aggregate ≡ list_reduce):
    # tot = Σ (x_j − μ_j)², proj = Σ (x_j − μ_j)·v_j over the raw doubles
    mu_arr = F.array(*[F.lit(m) for m in mu])
    v_arr = F.array(*[F.lit(x) for x in v])
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = F.zip_with(xd, mu_arr, lambda a, b: a - b)
    tot = F.aggregate(
        F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda acc, t: acc + t
    )
    proj = F.aggregate(
        F.zip_with(c, v_arr, lambda a, b: a * b), F.lit(0.0), lambda acc, t: acc + t
    )
    return emb.select(
        id_col, (F.round(tot - proj * proj, 6) + F.lit(0.0)).alias("pca_resid")
    )


def gmm_outlier_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 2,
    quant_x: int = 1_000_000,
    quant_r: int = 1000,
    eps: float = 1e-9,
):
    """:func:`gmm_outlier_dfeat` at the reference's REAL embedding width —
    2-component diagonal quantized-EM GMM over a d-dim ``array<float>``
    column, fully oracle-checkable at d = 64 (the seeded-EM variant over the
    same table is :func:`gmm_outlier_scores`, rows-only).

    Same exactness scheme as the feature-tuple twin: responsibilities are
    rounded to ``quant_r`` integers, every M-step moment is an exact DECIMAL
    sum of quantized components, and the per-row log-densities are
    SEQUENTIAL index folds (``F.aggregate`` over ``sequence(1, d)`` ≡
    DuckDB ``list_reduce``), so both engines walk identical IEEE chains.
    Init: component means at the two extreme rows of the FIRST component
    (ties by id), shared per-dim population variance, equal weights.

    Per iteration: one posexplode + 64-group aggregate (codegen, map-side
    partials — no corpus joins); the scoring plan is one scan of fold
    expressions with the (μ, σ², w) literal arrays in the closure."""
    import math

    from pyspark.sql import functions as F

    d = dim
    q = float(quant_x)
    qr = float(quant_r)
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    ex = base.select(
        "__id", F.posexplode("v").alias("j", "x")
    ).select(
        "__id", "j", F.round(F.col("x") * quant_x).cast("long").alias("xq")
    )
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731

    gl = (
        ex.groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            big(F.col("xq")).alias("s"),
            big(F.col("xq") * F.col("xq")).alias("ss"),
        )
        .collect()
    )
    gm = {int(r["j"]): r for r in gl}
    n = gm[0]["n"]
    pop_var = [
        gm[j]["ss"] / (n * q * q) - (gm[j]["s"] / (n * q)) * (gm[j]["s"] / (n * q)) + eps
        for j in range(d)
    ]
    # init probes in ONE job: min/max over the (first-component, id, v) struct
    # is the lexicographic order the former two orderBy().limit(1).collect()
    # jobs used (ties impossible — id unique), so the selected rows are
    # identical and one full-scan job disappears
    probe = F.struct(
        F.element_at(F.col("v"), 1).alias("k0"), F.col("__id").alias("k1"),
        F.col("v").alias("v"),
    )
    pm = base.agg(F.min(probe).alias("p_lo"), F.max(probe).alias("p_hi")).collect()[0]
    params = [
        ([float(x) for x in pm["p_lo"]["v"]], list(pop_var), 0.5),
        ([float(x) for x in pm["p_hi"]["v"]], list(pop_var), 0.5),
    ]

    def ld(p):
        means, vs, wgt = p
        m_arr = F.array(*[F.lit(m) for m in means])
        v_arr = F.array(*[F.lit(x) for x in vs])
        xe = lambda i: F.element_at(F.col("v"), i)  # noqa: E731
        me = lambda i: F.element_at(m_arr, i)  # noqa: E731
        ve = lambda i: F.element_at(v_arr, i)  # noqa: E731
        fold = F.aggregate(
            F.sequence(F.lit(1), F.lit(d)),
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.lit(-0.5) * F.log(F.lit(2 * math.pi) * ve(i))
                - (xe(i) - me(i)) * (xe(i) - me(i)) / (F.lit(2.0) * ve(i))
            ),
        )
        return fold + F.lit(math.log(wgt))

    for _ in range(n_iter):
        q0 = F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(ld(params[1]) - ld(params[0]))) * quant_r
        ).cast("long")
        resp = base.select("__id", q0.alias("q0"))
        e = ex.join(resp, "__id").withColumn("q1", F.lit(quant_r) - F.col("q0"))
        mom = (
            e.groupBy("j")
            .agg(
                big(F.col("q0")).alias("r0j"),
                big(F.col("q1")).alias("r1j"),
                big(F.col("q0") * F.col("xq")).alias("s0"),
                big((F.col("q0") * F.col("xq")) * F.col("xq")).alias("ss0"),
                big(F.col("q1") * F.col("xq")).alias("s1"),
                big((F.col("q1") * F.col("xq")) * F.col("xq")).alias("ss1"),
            )
            .collect()
        )
        mm = {int(r["j"]): r for r in mom}
        r0, r1 = mm[0]["r0j"], mm[0]["r1j"]
        if r0 == 0 or r1 == 0:
            raise ValueError("GMM EM degenerate: a component's responsibility sum is 0")
        tot = r0 + r1
        new = []
        for k, r in (("0", r0), ("1", r1)):
            means = [mm[j][f"s{k}"] / (r * q) for j in range(d)]
            vs = [
                mm[j][f"ss{k}"] / (r * q * q)
                - (mm[j][f"s{k}"] / (r * q)) * (mm[j][f"s{k}"] / (r * q))
                + eps
                for j in range(d)
            ]
            new.append((means, vs, r / tot))
        params = new

    ld0, ld1 = ld(params[0]), ld(params[1])
    mx = F.greatest(ld0, ld1)
    nll = -(mx + F.log(F.exp(ld0 - mx) + F.exp(ld1 - mx)))
    return base.select(
        F.col("__id").alias(id_col),
        (F.round(nll, 6) + F.lit(0.0)).alias("gmm_nll"),
    )


def ocsvm_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_landmarks: int = 8,
    var_eps: float = 1e-9,
    quant: int = 1_000_000,
):
    """:func:`ocsvm_mean_2feat` at the reference's REAL embedding width —
    the kernel-mean (ν→1) one-class-SVM decision function over a d-dim
    ``array<float>`` column, fully oracle-checkable at d = 64. Score =
    ``−(1/m)·Σᵢ k(x, lᵢ)`` with md5-priority landmark rows and bandwidth
    ``σ² = Σ_d var_d`` from exact quantized moments; the per-landmark
    squared distances are SEQUENTIAL index folds (``F.aggregate`` ≡ DuckDB
    ``list_reduce``), the landmark sum an explicit left-associated chain —
    both engines walk identical IEEE expressions."""
    import math  # noqa: F401

    from pyspark.sql import functions as F

    d = dim
    q = float(quant)
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    ex = base.select("__id", F.posexplode("v").alias("j", "x")).select(
        "j", F.round(F.col("x") * quant).cast("long").alias("xq")
    )
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    gl = (
        ex.groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            big(F.col("xq")).alias("s"),
            big(F.col("xq") * F.col("xq")).alias("ss"),
        )
        .collect()
    )
    gm = {int(r["j"]): r for r in gl}
    n = gm[0]["n"]
    s2 = 0.0
    for j in range(d):
        s2 = s2 + (
            gm[j]["ss"] / (n * q * q) - (gm[j]["s"] / (n * q)) * (gm[j]["s"] / (n * q))
        )
    s2 = s2 + var_eps

    pr = F.md5(F.concat(F.lit("ocsvm:"), F.col("__id").cast("string")))
    lrows = (
        base.withColumn("pr", pr).orderBy("pr", "__id").limit(n_landmarks).collect()
    )
    lands = [[float(x) for x in r["v"]] for r in lrows]

    def d2_to(landmark):
        arr = F.array(*[F.lit(x) for x in landmark])
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(d)),
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(F.col("v"), i) - F.element_at(arr, i))
            * (F.element_at(F.col("v"), i) - F.element_at(arr, i)),
        )

    ks = F.exp(-d2_to(lands[0]) / F.lit(2.0 * s2))
    for landmark in lands[1:]:
        ks = ks + F.exp(-d2_to(landmark) / F.lit(2.0 * s2))
    score = F.lit(0.0) - ks / F.lit(float(n_landmarks))
    return base.select(
        F.col("__id").alias(id_col),
        (F.round(score, 6) + F.lit(0.0)).alias("ocsvm_score"),
    )


def iforest_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_trees: int = 4,
    depth: int = 8,
):
    """:func:`iforest_hash_2feat` at the reference's REAL embedding width —
    deterministic md5 global-range cut trees over a d-dim ``array<float>``
    column, fully oracle-checkable at d = 64 (seeded-sklearn semantics stay
    in :func:`iforest_outlier_scores`, rows-only). Each level's (dimension,
    threshold fraction) comes from ``md5('ife:t:l')``; thresholds are
    ``lo_d + frac·(hi_d − lo_d)`` over the per-dimension GLOBAL range
    (driver-computed from exact min/max aggregates — the SQL twin derives
    the identical doubles in-engine), so every tree is a bit-string column
    and the isolation depth comes from prefix counts over the ≤2^depth-row
    leaf relation, exactly the 2-feature operator's plan shape."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    gamma = 0.5772156649015329
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    ex = base.select(F.posexplode("v").alias("j", "x"))
    rg = (
        ex.groupBy("j")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rgm = {int(r["j"]): r for r in rg}
    nn = float(rgm[0]["c"])

    j = base
    for t in range(n_trees):
        bits = None
        for lv in range(depth):
            hd = hashlib.md5(f"ife:{t}:{lv}".encode()).hexdigest()
            dml = int(hd[:4], 16) % dim
            frac = (int(hd[4:12], 16) % 1000000) / 1e6
            lo, hi = rgm[dml]["mn"], rgm[dml]["mx"]
            thr = lo + frac * (hi - lo)
            bit = F.when(
                F.element_at(F.col("v"), dml + 1) <= F.lit(thr), F.lit("0")
            ).otherwise(F.lit("1"))
            bits = bit if bits is None else F.concat(bits, bit)
        j = j.withColumn(f"b{t}", bits)

    def c_of(s):
        return F.when(s == 2.0, F.lit(1.0)).otherwise(
            F.lit(2.0) * (F.log(s - F.lit(1.0)) + F.lit(gamma))
            - F.lit(2.0) * (s - F.lit(1.0)) / s
        )

    def c_py(s):
        return 1.0 if s == 2.0 else 2.0 * (math.log(s - 1.0) + gamma) - 2.0 * (s - 1.0) / s

    # leaf-count maps for ALL trees in ONE grouping-sets job (≤ 2^depth rows
    # per tree, bounded regardless of data size), then re-injected as literal
    # create_map lookups: the previous shape — an eager localCheckpoint plus
    # depth−1 broadcast joins PER TREE — planned 120 Exchanges / 64 broadcast
    # joins and ran ~160 jobs at build time. The isolation-depth expression h
    # itself is unchanged (same F.when/F.log chain over the same exact
    # integer prefix sums, so scores are bit-identical); only where the leaf
    # counts come from changed.
    bcols = [f"b{t}" for t in range(n_trees)]
    cnt_rows = (
        j.groupingSets([[F.col(b)] for b in bcols], *[F.col(b) for b in bcols])
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    leaf_counts: list[dict[str, int]] = [{} for _ in range(n_trees)]
    for r in cnt_rows:
        for t, b in enumerate(bcols):
            if r[b] is not None:
                leaf_counts[t][r[b]] = int(r["c"])
                break
    h_cols = []
    for t in range(n_trees):
        lc = leaf_counts[t]
        # exact integer prefix sums over the leaf strings (driver-side)
        pref: list[dict[str, int]] = [dict() for _ in range(depth)]
        for leaf, c in lc.items():
            for lv in range(1, depth):
                p = leaf[:lv]
                pref[lv][p] = pref[lv].get(p, 0) + c
        # one F.expr parse of the whole literal map (a per-leaf F.lit storm
        # costs thousands of py4j round trips); values are integer-valued
        # doubles, so repr() round-trips exactly through the SQL parser
        entries = []
        for leaf, c in sorted(lc.items()):
            s_arr = [float(pref[lv][leaf[:lv]]) for lv in range(1, depth)] + [float(c)]
            arr_sql = ",".join(repr(s) for s in s_arr)
            entries.append(f"'{leaf}',array({arr_sql})")
        sarr = F.element_at(F.expr("map(" + ",".join(entries) + ")"), F.col(f"b{t}"))
        h = F.when(F.element_at(sarr, 1) == 1.0, F.lit(1.0))
        for lv in range(2, depth):
            h = h.when(F.element_at(sarr, lv) == 1.0, F.lit(float(lv)))
        h = h.when(F.element_at(sarr, depth) == 1.0, F.lit(float(depth))).otherwise(
            F.lit(float(depth)) + c_of(F.element_at(sarr, depth))
        )
        h_cols.append(h)
    avg_h = h_cols[0]
    for t in range(1, n_trees):
        avg_h = avg_h + h_cols[t]
    avg_h = avg_h / F.lit(float(n_trees))
    score = F.pow(F.lit(2.0), -(avg_h / F.lit(c_py(nn))))
    return j.select(
        F.col("__id").alias(id_col),
        (F.round(score, 6) + F.lit(0.0)).alias("if_score"),
    )


def mahalanobis_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    var_eps: float = 1e-9,
    quant: int = 1_000_000,
):
    """Mahalanobis outlier score at the REAL embedding width, DIAGONAL-
    covariance instance (standardized Euclidean) — the d=64 oracle sibling
    of :func:`..operators.drift.mahalanobis_scores` (which carries the full
    2×2 closed-form inverse at d=2). A full 64×64 covariance inverse has no
    mirrored closed form, so this instance scores against the per-dimension
    variances: ``score = Σ_j (x_j − μ_j)²/(var_j + ε)``, with μ/var from
    exact quantized moments and the per-row reduction a SEQUENTIAL index
    fold (``F.aggregate`` ≡ ``list_reduce``)."""
    from pyspark.sql import functions as F

    d = dim
    q = float(quant)
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    ex = base.select(F.posexplode("v").alias("j", "x")).select(
        "j", F.round(F.col("x") * quant).cast("long").alias("xq")
    )
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    gl = (
        ex.groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            big(F.col("xq")).alias("s"),
            big(F.col("xq") * F.col("xq")).alias("ss"),
        )
        .collect()
    )
    gm = {int(r["j"]): r for r in gl}
    n = gm[0]["n"]
    mu = [gm[j]["s"] / (n * q) for j in range(d)]
    vr = [
        gm[j]["ss"] / (n * q * q) - (gm[j]["s"] / (n * q)) * (gm[j]["s"] / (n * q))
        + var_eps
        for j in range(d)
    ]
    mu_arr = F.array(*[F.lit(m) for m in mu])
    vr_arr = F.array(*[F.lit(x) for x in vr])
    score = F.aggregate(
        F.sequence(F.lit(1), F.lit(d)),
        F.lit(0.0),
        lambda acc, i: acc
        + (F.element_at(F.col("v"), i) - F.element_at(mu_arr, i))
        * (F.element_at(F.col("v"), i) - F.element_at(mu_arr, i))
        / F.element_at(vr_arr, i),
    )
    return base.select(
        F.col("__id").alias(id_col),
        (F.round(score, 6) + F.lit(0.0)).alias("maha_score"),
    )


def vae_outlier_2feat(
    df, cols: tuple[str, str], id_col: str, top_k: int = 100, eps: float = 1e-9
):
    """OutlierVAE analog (``alibi_detect/od/vae.py:16-299``) over TWO features
    with a CLOSED-FORM probabilistic-PCA fit — the hash-checkable instance of
    VAE reconstruction scoring. A *linear* VAE's global optimum recovers
    probabilistic PCA (Lucas et al. 2019, "Don't Blame the ELBO"): with k=1
    latent and d=2 the ML solution is fully closed form (Tipping & Bishop
    1999): ``σ² = λ₋`` (the discarded eigenvalue), ``W = v̂₊·sqrt(λ₊ − σ²)``,
    posterior ``q(z|x) = N(Wᵀ(x−μ)/M, σ²/M)`` with ``M = WᵀW + σ²``.

    The reference scores by Monte-Carlo averaging squared reconstruction
    error over latent samples (``od/vae.py:237-245``); the analog computes
    that average's EXACT expectation analytically:
    ``E[(x_f − μ_f − W_f z)²] = (x_f − μ_f − W_f m_z)² + W_f²·σ²/M``
    per feature, instance score = feature mean (``outlier_perc=100``).
    Deterministic → no RNG to reconcile, and every term is mirrored in the
    DuckDB oracle.

    Plan: one partial+final DECIMAL moment aggregate, broadcast of the 1-row
    parameter relation, codegen column math, ``TakeOrderedAndProject`` top-k
    (same shape as :func:`pca_outlier_2feat`)."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    dx_in = F.col(x).cast("decimal(18,4)")
    dy_in = F.col(y).cast("decimal(18,4)")
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
    disc = F.sqrt(
        (F.col("a") - F.col("b")) * (F.col("a") - F.col("b")) + F.lit(4.0) * F.col("c") * F.col("c")
    )
    par = mo.select(
        "mx",
        "my",
        "a",
        "c",
        ((F.col("a") + F.col("b") - disc) / F.lit(2.0) + F.lit(eps)).alias("sig2"),
        ((F.col("a") + F.col("b") + disc) / F.lit(2.0)).alias("lamp"),
    ).select(
        "mx",
        "my",
        "sig2",
        # unit major eigvec scaled by sqrt(λ₊ − σ²) — the pPCA loading W
        (F.col("c") / F.sqrt(F.col("c") * F.col("c") + (F.col("lamp") - F.col("a")) * (F.col("lamp") - F.col("a")))
         * F.sqrt(F.greatest(F.col("lamp") - F.col("sig2"), F.lit(0.0)))).alias("w1"),
        ((F.col("lamp") - F.col("a")) / F.sqrt(F.col("c") * F.col("c") + (F.col("lamp") - F.col("a")) * (F.col("lamp") - F.col("a")))
         * F.sqrt(F.greatest(F.col("lamp") - F.col("sig2"), F.lit(0.0)))).alias("w2"),
        (F.greatest(F.col("lamp") - F.col("sig2"), F.lit(0.0)) + F.col("sig2")).alias("m_cap"),
    )
    j = df.crossJoin(F.broadcast(par))
    dx = F.col(x).cast("double") - F.col("mx")
    dy = F.col(y).cast("double") - F.col("my")
    mz = (F.col("w1") * dx + F.col("w2") * dy) / F.col("m_cap")
    pv = F.col("sig2") / F.col("m_cap")
    e1 = (dx - F.col("w1") * mz) * (dx - F.col("w1") * mz) + F.col("w1") * F.col("w1") * pv
    e2 = (dy - F.col("w2") * mz) * (dy - F.col("w2") * mz) + F.col("w2") * F.col("w2") * pv
    score = (e1 + e2) / F.lit(2.0)
    scored = j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("vae_score"))
    order = [F.col("vae_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "vae_score", F.col("rank").cast("int").alias("rank")
    )


def ae_outlier_scores(
    emb: DataFrame,
    ref_pred,
    n_components: int = 4,
    outlier_perc: float = 100.0,
    id_col: str = "vec_id",
) -> DataFrame:
    """OutlierAE analog (``alibi_detect/od/ae.py:14-260``): reconstruction-
    error outlier scoring with FEATURE-LEVEL scores and the ``outlier_perc``
    instance aggregation (``od/ae.py:181-208``: feature score =
    ``(x − recon)²`` per dimension, instance score = mean of the top
    ``outlier_perc``% feature errors).

    The TF-trained encoder/decoder is out of this environment; the
    encoder/decoder here is the CLOSED-FORM optimum of a *linear* AE — the
    rank-k PCA projection (Baldi & Hornik 1989: a linear autoencoder's loss
    minimum spans the top principal subspace): ``recon = mean +
    P P'(x − mean)`` with ``P`` = top ``n_components`` eigenvectors of the
    reference covariance. At ``outlier_perc=100`` the instance score equals
    the off-subspace residual (== :func:`pca_outlier_scores` up to the 1/d
    mean — asserted in tests); lower percentiles reproduce the reference's
    top-feature-error aggregation that a plain PCA score cannot express.
    Fit on the broadcast reference, one ``mapInPandas`` corpus scan."""
    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    d = r.shape[1]
    if n_components >= d:
        raise ValueError("n_components must be less than the number of features")
    mean = r.mean(axis=0)
    rc = r - mean
    cov = (rc.T @ rc) / (len(rc) - 1)
    _, v = np.linalg.eigh(cov)  # ascending — principal dirs are the tail
    pcs = v[:, -n_components:]
    k_top = max(1, int(np.ceil(d * outlier_perc / 100.0)))

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            xc = x - mean
            recon = (xc @ pcs) @ pcs.T
            ferr = (xc - recon) ** 2  # feature-level scores, od/ae.py:181
            top = np.sort(ferr, axis=1)[:, -k_top:]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "ae_score": np.round(top.mean(axis=1), 6),
                }
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, ae_score double")


def gmm_outlier_dfeat(
    df,
    cols: tuple[str, ...],
    id_col: str = "event_id",
    n_iter: int = 2,
    quant: int = 1000,
    eps: float = 1e-9,
    materialize: bool = False,
):
    """GMM outlier score over ANY number of features with a QUANTIZED-EM fit
    — the parameterized-d generalization of the 2-feature oracle instance of
    ``alibi_detect/od/_gmm.py:22-231`` (diagonal 2-component mixture, fixed
    ``n_iter``; the reference's torch EM is ``od/pytorch/gmm.py``). The
    seeded-EM full-covariance variant stays in :func:`gmm_outlier_scores`
    (rows-only).

    Exactness-by-construction (the EM analog of ``ann.kmeans_cells``'s
    quantized Lloyd): each E-step's responsibilities are ROUNDED to integers
    (``round(r·10³)``, identical rounding in DuckDB), so every M-step moment
    is an exact integer sum (accumulated as DECIMAL(38,0) — order-free under
    any partitioning) divided once — both engines derive bit-identical
    means/variances/weights at every iteration, and the final NLL is a
    deterministic closed-form column of the data. Init is deterministic:
    component means at the extreme rows of the first feature (ties by id),
    shared per-dim population variance (exact decimal moments), equal
    weights.

    Scale shape: per iteration one corpus scan + one tiny aggregate (the
    2-component moment row, 2·(2d+1) numbers regardless of corpus size),
    params travel by closure — no corpus joins, no full-value buffering."""
    import math

    from pyspark.sql import functions as F

    q = float(quant)
    names = [f"x{i}" for i in range(len(cols))]
    sel = [F.col(id_col)]
    for c, nm in zip(cols, names):
        sel.append(F.col(c).cast("double").alias(nm))
        sel.append(F.round(F.col(c).cast("double") * quant).cast("long").alias(f"{nm}q"))
    base = df.select(*sel)
    if materialize:
        # each EM iteration is an action over `base`; when the input is an
        # expensive derived relation (the AEGMM feature map re-derives the
        # eigenbasis per scan), cut the lineage once up front
        base = base.localCheckpoint()
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for nm in names:
        aggs += [
            big(F.col(f"{nm}q")).alias(f"s_{nm}"),
            big(F.col(f"{nm}q") * F.col(f"{nm}q")).alias(f"ss_{nm}"),
        ]
    # init probes in the SAME job as the moment aggregate: min/max over the
    # (first-feature, id, features…) struct is the lexicographic order the
    # former two orderBy().limit(1).collect() jobs used (ties impossible —
    # id is unique), so the selected rows are identical and two full-scan
    # jobs disappear (3 collect jobs → 1)
    probe = F.struct(
        F.col(names[0]).alias("k0"), F.col(id_col).alias("k1"),
        *[F.col(nm).alias(nm) for nm in names],
    )
    aggs += [F.min(probe).alias("p_lo"), F.max(probe).alias("p_hi")]
    gl = base.agg(*aggs).collect()[0]
    n = gl["n"]
    pop_var = [
        gl[f"ss_{nm}"] / (n * q * q) - (gl[f"s_{nm}"] / (n * q)) * (gl[f"s_{nm}"] / (n * q)) + eps
        for nm in names
    ]
    p_lo, p_hi = gl["p_lo"], gl["p_hi"]
    # params[k] = (means[d], variances[d], weight)
    params = [
        ([float(p_lo[nm]) for nm in names], list(pop_var), 0.5),
        ([float(p_hi[nm]) for nm in names], list(pop_var), 0.5),
    ]

    def ld(p):
        means, vs, w = p
        # association mirrors the SQL twin term-for-term:
        # ((((-0.5·ln(2πv₀)) − t₀) − 0.5·ln(2πv₁)) − t₁) … + ln(w)
        expr = F.lit(-0.5 * math.log(2 * math.pi * vs[0]))
        expr = expr - (F.col(names[0]) - F.lit(means[0])) * (F.col(names[0]) - F.lit(means[0])) / F.lit(2 * vs[0])
        for nm, m, vv in zip(names[1:], means[1:], vs[1:]):
            expr = expr + F.lit(-0.5 * math.log(2 * math.pi * vv))
            expr = expr - (F.col(nm) - F.lit(m)) * (F.col(nm) - F.lit(m)) / F.lit(2 * vv)
        return expr + F.lit(math.log(w))

    for _ in range(n_iter):
        q0 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(ld(params[1]) - ld(params[0]))) * quant).cast(
            "long"
        )
        e = base.withColumn("q0", q0).withColumn("q1", F.lit(quant) - F.col("q0"))
        aggs = []
        for k in ("q0", "q1"):
            r = F.col(k)
            aggs.append(big(r).alias(f"r_{k}"))
            for nm in names:
                aggs += [
                    big(r * F.col(f"{nm}q")).alias(f"s_{nm}_{k}"),
                    big(r * F.col(f"{nm}q") * F.col(f"{nm}q")).alias(f"ss_{nm}_{k}"),
                ]
        s = e.agg(*aggs).collect()[0]
        tot = s["r_q0"] + s["r_q1"]
        new = []
        for k in ("q0", "q1"):
            r = s[f"r_{k}"]
            if r == 0:
                # a component whose rounded responsibilities sum to 0 has no
                # M-step: means/variances would go NaN and propagate silently
                # through every score (the oracle diverges identically)
                raise ValueError(
                    "GMM EM degenerate: component responsibility sum is 0 "
                    f"at component {k}; use fewer components or rescale"
                )
            means = [s[f"s_{nm}_{k}"] / (r * q) for nm in names]
            vs = [
                s[f"ss_{nm}_{k}"] / (r * q * q)
                - (s[f"s_{nm}_{k}"] / (r * q)) * (s[f"s_{nm}_{k}"] / (r * q))
                + eps
                for nm in names
            ]
            new.append((means, vs, r / tot))
        params = new

    ld0, ld1 = ld(params[0]), ld(params[1])
    mx = F.greatest(ld0, ld1)
    nll = -(mx + F.log(F.exp(ld0 - mx) + F.exp(ld1 - mx)))
    return base.select(id_col, (F.round(nll, 6) + F.lit(0.0)).alias("gmm_nll"))


def gmm_outlier_2feat(
    df,
    cols: tuple[str, str],
    id_col: str = "event_id",
    n_iter: int = 2,
    quant: int = 1000,
    eps: float = 1e-9,
    materialize: bool = False,
):
    """Two-feature instance of :func:`gmm_outlier_dfeat` (kept as the named
    entry point for the AEGMM/VAEGMM feature-map pipelines and the
    ``gmm_outlier_2c`` oracle query)."""
    return gmm_outlier_dfeat(
        df, cols, id_col=id_col, n_iter=n_iter, quant=quant, eps=eps,
        materialize=materialize,
    )


def ae_outlier_2feat(
    df,
    cols: tuple[str, str],
    id_col: str,
    outlier_perc: float = 50.0,
    top_k: int = 100,
):
    """OutlierAE over TWO features in CLOSED FORM — the hash-checkable
    instance of ``alibi_detect/od/ae.py:14-260`` (the d-dimensional rank-k
    variant is :func:`ae_outlier_scores`, rows-only). Encoder/decoder =
    rank-1 PCA reconstruction (linear-AE optimum); feature-level scores
    ``(x_f − recon_f)²`` (``od/ae.py:181``) and the ``outlier_perc``
    instance aggregation (``od/ae.py:208``): with d=2, ``perc<=50`` keeps
    the single worst feature error (``greatest``), ``perc>50`` averages
    both. Returns the top-k ``(id, ae2_score, rank)``."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    dx_in = F.col(x).cast("decimal(18,4)")
    dy_in = F.col(y).cast("decimal(18,4)")
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
    par = mo.select(
        "mx",
        "my",
        F.col("c").alias("w1"),
        (lamp - F.col("a")).alias("w2"),
        (F.col("c") * F.col("c") + (lamp - F.col("a")) * (lamp - F.col("a"))).alias("nrm2"),
    )
    j = df.crossJoin(F.broadcast(par))
    dx = F.col(x).cast("double") - F.col("mx")
    dy = F.col(y).cast("double") - F.col("my")
    proj = dx * F.col("w1") + dy * F.col("w2")
    ev = dx - proj * F.col("w1") / F.col("nrm2")
    eu = dy - proj * F.col("w2") / F.col("nrm2")
    fv = ev * ev
    fu = eu * eu
    score = F.greatest(fv, fu) if outlier_perc <= 50.0 else (fv + fu) / F.lit(2.0)
    scored = j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("ae2_score"))
    order = [F.col("ae2_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "ae2_score", F.col("rank").cast("int").alias("rank")
    )


def kpca_outlier_2land(
    df,
    cols: tuple[str, str],
    id_col: str,
    top_k: int = 100,
    var_eps: float = 1e-9,
):
    """Kernel-PCA outlier score with a 2-landmark Nyström feature map — the
    hash-checkable instance of ``alibi_detect/od/_pca.py`` kernel variant
    (``od/pytorch/pca.py:173-268``; the d-dim seeded variant is
    :func:`kernel_pca_outlier_scores`, rows-only). The reference fits PCA in
    a kernel feature space; here the feature space is the 2-landmark Nyström
    approximation ``φ(x) = [k(x, l₁), k(x, l₂)]`` with deterministic
    md5-priority landmarks and a data-derived bandwidth ``σ² = Σ_d var_d``,
    and the PCA-off-manifold score is :func:`pca_outlier_2feat`'s closed-form
    2×2 eigendecomposition applied to φ — exact DECIMAL moments, broadcast
    parameter relations, ``TakeOrderedAndProject`` top-k, no UDF."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
    )
    pr = F.md5(F.concat(F.lit("kpca:"), F.col(id_col).cast("string")))
    two = base.withColumn("pr", pr).orderBy("pr", id_col).limit(2)
    wv = Window.orderBy("pr", id_col)
    land = (
        two.withColumn("rn", F.row_number().over(wv))
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("v"))).alias("l1v"),
            F.max(F.when(F.col("rn") == 1, F.col("u"))).alias("l1u"),
            F.max(F.when(F.col("rn") == 2, F.col("v"))).alias("l2v"),
            F.max(F.when(F.col("rn") == 2, F.col("u"))).alias("l2u"),
        )
    )
    dv = F.col("v").cast("decimal(18,4)")
    du = F.col("u").cast("decimal(18,4)")
    gs = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dv).cast("double").alias("sv"),
        F.sum(dv * dv).cast("double").alias("svv"),
        F.sum(du).cast("double").alias("su"),
        F.sum(du * du).cast("double").alias("suu"),
    ).select(
        (
            (F.col("svv") / F.col("n") - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")))
            + (F.col("suu") / F.col("n") - (F.col("su") / F.col("n")) * (F.col("su") / F.col("n")))
            + F.lit(var_eps)
        ).alias("s2")
    )
    j = base.crossJoin(F.broadcast(land)).crossJoin(F.broadcast(gs))
    kern = lambda lv, lu: F.exp(  # noqa: E731
        -((F.col("v") - F.col(lv)) * (F.col("v") - F.col(lv))
          + (F.col("u") - F.col(lu)) * (F.col("u") - F.col(lu)))
        / (F.lit(2.0) * F.col("s2"))
    )
    feats = j.select(
        id_col, kern("l1v", "l1u").alias("f1"), kern("l2v", "l2u").alias("f2")
    )
    return pca_outlier_2feat(feats, ("f1", "f2"), [id_col], top_k).withColumnRenamed(
        "pca2_score", "kpca2_score"
    )


def ocsvm_mean_2feat(
    df,
    cols: tuple[str, str],
    id_col: str,
    n_landmarks: int = 8,
    top_k: int = 100,
    var_eps: float = 1e-9,
):
    """One-class-SVM analog in CLOSED FORM — the hash-checkable instance of
    ``alibi_detect/od/_svm.py:27-250`` (the Nyström + gradient-trained
    variant is :func:`svm_outlier_scores`, rows-only). The reference scores
    by the decision function ``w·φ(x) − ρ``; in the ν→1 limit every support
    vector carries equal weight, so ``w`` is the kernel mean embedding of
    the (landmark) sample and the score reduces to
    ``−(1/m)·Σᵢ k(x, lᵢ)`` — no QP, no iteration. Landmarks are
    deterministic md5-priority rows, bandwidth ``σ² = Σ_d var_d`` (exact
    DECIMAL moments). Outliers (far from all landmarks) score near the
    0 maximum; inliers go negative. Top-k by score (desc, ties by id).

    Plan: a ``TakeOrdered`` 8-row landmark relation + 1-row bandwidth
    relation broadcast onto the stream, codegen kernel sum,
    ``TakeOrderedAndProject`` top-k — no UDF, no collect."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
    )
    pr = F.md5(F.concat(F.lit("ocsvm:"), F.col(id_col).cast("string")))
    land_rows = base.withColumn("pr", pr).orderBy("pr", id_col).limit(n_landmarks)
    wv = Window.orderBy("pr", id_col)
    land = land_rows.withColumn("rn", F.row_number().over(wv)).agg(
        *[
            F.max(F.when(F.col("rn") == i, F.col(c))).alias(f"l{i}{c}")
            for i in range(1, n_landmarks + 1)
            for c in ("v", "u")
        ]
    )
    dv = F.col("v").cast("decimal(18,4)")
    du = F.col("u").cast("decimal(18,4)")
    gs = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dv).cast("double").alias("sv"),
        F.sum(dv * dv).cast("double").alias("svv"),
        F.sum(du).cast("double").alias("su"),
        F.sum(du * du).cast("double").alias("suu"),
    ).select(
        (
            (F.col("svv") / F.col("n") - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")))
            + (F.col("suu") / F.col("n") - (F.col("su") / F.col("n")) * (F.col("su") / F.col("n")))
            + F.lit(var_eps)
        ).alias("s2")
    )
    j = base.crossJoin(F.broadcast(land)).crossJoin(F.broadcast(gs))
    kern = lambda i: F.exp(  # noqa: E731
        -(
            (F.col("v") - F.col(f"l{i}v")) * (F.col("v") - F.col(f"l{i}v"))
            + (F.col("u") - F.col(f"l{i}u")) * (F.col("u") - F.col(f"l{i}u"))
        )
        / (F.lit(2.0) * F.col("s2"))
    )
    total = kern(1)
    for i in range(2, n_landmarks + 1):
        total = total + kern(i)
    score = -(total / F.lit(float(n_landmarks)))
    scored = j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("ocsvm_score"))
    order = [F.col("ocsvm_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "ocsvm_score", F.col("rank").cast("int").alias("rank")
    )


def iforest_hash_2feat(
    df,
    cols: tuple[str, str],
    id_col: str,
    n_trees: int = 2,
    depth: int = 6,
    top_k: int = 100,
):
    """Isolation-forest scoring in CLOSED FORM — the hash-checkable instance
    of ``alibi_detect/od/isolationforest.py:10-147`` (the sklearn-faithful
    seeded variant is :func:`iforest_outlier_scores`, rows-only). Keeps the
    isolation mechanism intact — random cuts, per-instance isolation depth,
    the ``c(n)`` average-path normalization and the ``2^(−E[h]/c(n))``
    score — with the two randomized choices pinned deterministic:

    - each tree level's (feature, threshold) comes from ``md5('ift:t:l')``
      — thresholds uniform over the GLOBAL feature range (a fixed-structure
      random-cut tree: every instance's path is the same comparison
      sequence, so the tree becomes a bit-string column);
    - ``h(x)`` = the first level at which x's prefix cell contains exactly
      one instance, else ``depth + c(leaf_size)`` (sklearn's
      ``_average_path_length`` adjustment, ``c(2)=1``,
      ``c(s)=2(ln(s−1)+γ)−2(s−1)/s``).

    Plan shape at scale: one codegen pass builds the leaf bit-string per
    tree, one tiny groupBy per tree (≤ 2^depth rows), prefix counts are
    aggregations OVER THE LEAF RELATION (never the data), and the
    (leaf → h) map broadcast-joins back — the corpus is scanned once per
    tree aggregate plus once for scoring, with no wide shuffle."""
    import hashlib

    from pyspark.sql import Window, functions as F

    gamma = 0.5772156649015329
    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
    )
    rng = base.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.min("u").alias("umin"),
        F.max("u").alias("umax"),
    )
    j = base.crossJoin(F.broadcast(rng))
    for t in range(n_trees):
        bits = None
        for lv in range(depth):
            hd = hashlib.md5(f"ift:{t}:{lv}".encode()).hexdigest()
            feat = int(hd[:4], 16) % 2
            frac = (int(hd[4:12], 16) % 1000000) / 1e6
            c0, lo, hi = ("v", "vmin", "vmax") if feat == 0 else ("u", "umin", "umax")
            thr = F.col(lo) + F.lit(frac) * (F.col(hi) - F.col(lo))
            bit = F.when(F.col(c0) <= thr, F.lit("0")).otherwise(F.lit("1"))
            bits = bit if bits is None else F.concat(bits, bit)
        j = j.withColumn(f"b{t}", bits)

    def c_of(s):
        return F.when(s == 2.0, F.lit(1.0)).otherwise(
            F.lit(2.0) * (F.log(s - F.lit(1.0)) + F.lit(gamma))
            - F.lit(2.0) * (s - F.lit(1.0)) / s
        )

    # leaf-count maps for ALL trees in ONE grouping-sets job (≤ 2^depth rows
    # per tree, bounded regardless of data size), re-injected as literal
    # create_map lookups — replaces the per-tree eager localCheckpoint +
    # depth−1 broadcast joins (48 Exchanges / 24 broadcast joins, ~45 build
    # jobs). The isolation-depth expression h is unchanged (same F.when/F.log
    # chain over the same exact integer prefix sums → bit-identical scores).
    bcols = [f"b{t}" for t in range(n_trees)]
    cnt_rows = (
        j.groupingSets([[F.col(b)] for b in bcols], *[F.col(b) for b in bcols])
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    leaf_counts: list[dict[str, int]] = [{} for _ in range(n_trees)]
    for r in cnt_rows:
        for t, b in enumerate(bcols):
            if r[b] is not None:
                leaf_counts[t][r[b]] = int(r["c"])
                break
    h_cols = []
    for t in range(n_trees):
        lc = leaf_counts[t]
        pref: list[dict[str, int]] = [dict() for _ in range(depth)]
        for leaf, c in lc.items():
            for lv in range(1, depth):
                p = leaf[:lv]
                pref[lv][p] = pref[lv].get(p, 0) + c
        # one F.expr parse of the whole literal map (a per-leaf F.lit storm
        # costs thousands of py4j round trips); values are integer-valued
        # doubles, so repr() round-trips exactly through the SQL parser
        entries = []
        for leaf, c in sorted(lc.items()):
            s_arr = [float(pref[lv][leaf[:lv]]) for lv in range(1, depth)] + [float(c)]
            arr_sql = ",".join(repr(s) for s in s_arr)
            entries.append(f"'{leaf}',array({arr_sql})")
        sarr = F.element_at(F.expr("map(" + ",".join(entries) + ")"), F.col(f"b{t}"))
        h = F.when(F.element_at(sarr, 1) == 1.0, F.lit(1.0))
        for lv in range(2, depth):
            h = h.when(F.element_at(sarr, lv) == 1.0, F.lit(float(lv)))
        h = h.when(F.element_at(sarr, depth) == 1.0, F.lit(float(depth))).otherwise(
            F.lit(float(depth)) + c_of(F.element_at(sarr, depth))
        )
        h_cols.append(h)
    avg_h = h_cols[0]
    for t in range(1, n_trees):
        avg_h = avg_h + h_cols[t]
    avg_h = avg_h / F.lit(float(n_trees))
    score = F.pow(F.lit(2.0), -(avg_h / c_of(F.col("nn"))))
    scored = j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("if_score"))
    order = [F.col("if_score").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "if_score", F.col("rank").cast("int").alias("rank")
    )


def aegmm_features(
    df,
    cols: tuple[str, str],
    id_col: str,
    variational: bool = False,
    max_eucl: float = 100.0,
    eps: float = 1e-9,
):
    """The AEGMM/VAEGMM feature map (``alibi_detect/od/aegmm.py:157-174``,
    ``od/vaegmm.py``; network ``models/tensorflow/autoencoder.py:328-355``):
    ``z = [encoder latent, recon features]`` where the recon features are the
    relative Euclidean distance ``‖x − x̂‖ / (min(‖x‖, ‖x̂‖) + 1e-12)``
    clipped to ``[0, max_eucl]`` (``eucl_cosim_features``). The encoder /
    decoder pair is the linear-AE closed form over two features:

    - ``variational=False`` (AEGMM): latent = unit-normalized projection on
      the major principal direction, recon = rank-1 PCA reconstruction;
    - ``variational=True`` (VAEGMM): latent = the pPCA posterior mean
      ``Wᵀ(x−μ)/M`` (see :func:`vae_outlier_2feat`), recon = ``μ + W·m_z``.

    Returns ``(id, zl, zr)`` — feed to :func:`gmm_outlier_2feat` for the
    ``gmm_energy`` scoring stage (``od/aegmm.py:172-174``). Everything is
    broadcast-join column math mirrored in the DuckDB oracle."""
    from pyspark.sql import functions as F

    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("x0"),
        F.col(y).cast("double").alias("y0"),
    )
    dx_in = F.col("x0").cast("decimal(18,4)")
    dy_in = F.col("y0").cast("decimal(18,4)")
    mo = base.agg(
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
    disc = F.sqrt(
        (F.col("a") - F.col("b")) * (F.col("a") - F.col("b")) + F.lit(4.0) * F.col("c") * F.col("c")
    )
    lamp = (F.col("a") + F.col("b") + disc) / F.lit(2.0)
    if variational:
        sig2 = (F.col("a") + F.col("b") - disc) / F.lit(2.0) + F.lit(eps)
        g = F.greatest(lamp - sig2, F.lit(0.0))
        nrm = F.sqrt(F.col("c") * F.col("c") + (lamp - F.col("a")) * (lamp - F.col("a")))
        par = mo.select(
            "mx",
            "my",
            (F.col("c") / nrm * F.sqrt(g)).alias("w1"),
            ((lamp - F.col("a")) / nrm * F.sqrt(g)).alias("w2"),
            (g + sig2).alias("m_cap"),
        )
        j = base.crossJoin(F.broadcast(par))
        zl = (F.col("w1") * (F.col("x0") - F.col("mx")) + F.col("w2") * (F.col("y0") - F.col("my"))) / F.col("m_cap")
        f1 = j.select(
            id_col,
            "x0",
            "y0",
            zl.alias("zl"),
            (F.col("mx") + F.col("w1") * zl).alias("rv"),
            (F.col("my") + F.col("w2") * zl).alias("ru"),
        )
    else:
        par = mo.select(
            "mx",
            "my",
            F.col("c").alias("w1"),
            (lamp - F.col("a")).alias("w2"),
            (F.col("c") * F.col("c") + (lamp - F.col("a")) * (lamp - F.col("a"))).alias("nrm2"),
        )
        j = base.crossJoin(F.broadcast(par))
        proj = (F.col("x0") - F.col("mx")) * F.col("w1") + (F.col("y0") - F.col("my")) * F.col("w2")
        f1 = j.select(
            id_col,
            "x0",
            "y0",
            (proj / F.sqrt(F.col("nrm2"))).alias("zl"),
            (F.col("mx") + proj * F.col("w1") / F.col("nrm2")).alias("rv"),
            (F.col("my") + proj * F.col("w2") / F.col("nrm2")).alias("ru"),
        )
    rec_euc = F.least(
        F.sqrt(
            (F.col("x0") - F.col("rv")) * (F.col("x0") - F.col("rv"))
            + (F.col("y0") - F.col("ru")) * (F.col("y0") - F.col("ru"))
        )
        / (
            F.least(
                F.sqrt(F.col("x0") * F.col("x0") + F.col("y0") * F.col("y0")),
                F.sqrt(F.col("rv") * F.col("rv") + F.col("ru") * F.col("ru")),
            )
            + F.lit(1e-12)
        ),
        F.lit(max_eucl),
    )
    return f1.select(id_col, "zl", rec_euc.alias("zr"))


def iforest_outlier_scores(
    emb: DataFrame,
    ref_pred,
    n_trees: int = 100,
    max_samples: int = 256,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Isolation-forest outlier score
    (``alibi_detect/od/isolationforest.py:8-147`` semantics: fit on the
    reference, score = anomaly score, higher = more anomalous; the detector's
    ``infer_threshold`` percentile + ``is_outlier`` comparison are the
    caller's two cheap column ops on this output). Seeded NumPy forest fitted
    on the broadcast reference (sklearn-free — see
    :mod:`..functions.iforest`), scored in one ``mapInPandas`` corpus scan —
    the same no-corpus-shuffle shape as every other outlier scan here."""
    from ..functions.iforest import IsolationForest

    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    det = IsolationForest.fit(r, n_trees=n_trees, max_samples=max_samples, seed=seed)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "iforest_score": np.round(det.score(x), 6),
                }
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, iforest_score double")


def svm_outlier_scores(
    emb: DataFrame,
    ref_pred,
    nu: float = 0.1,
    n_components: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """One-class SVM outlier score (``alibi_detect/od/_svm.py:27-250``
    semantics: fit on the reference, score = distance inside the margin,
    higher = more anomalous). Seeded NumPy Nyström + primal GD fit on the
    broadcast reference (:mod:`..functions.svm`), one ``mapInPandas`` corpus
    scan — a [batch × m] kernel block per Arrow batch, no corpus shuffle."""
    from ..functions.svm import OneClassSVM

    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    det = OneClassSVM.fit(r, nu=nu, n_components=n_components, seed=seed)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "svm_score": np.round(det.score(x), 6),
                }
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, svm_score double")


def kernel_pca_outlier_scores(
    emb: DataFrame,
    ref_pred,
    n_components: int = 4,
    sigma: float | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Kernel-PCA outlier score (``alibi_detect/od/pytorch/pca.py:173-268``,
    ``KernelPCATorch``): centered RBF kernel matrix on the reference,
    principal components normalized by 1/√eigenvalue, score =
    ``−2·mean(k_xr) − ‖projection‖²`` (unlike the linear case, the TOP
    components are kept). Fit on the broadcast reference, one corpus scan."""
    from ..functions.mmd import median_heuristic_sigma, rbf_kernel, squared_pairwise_distance

    _, _, r = _collect_matrix(emb, ref_pred, id_col)
    n = r.shape[0]
    if n_components >= n:
        raise ValueError("n_components must be less than the number of reference instances")
    if sigma is None:
        d2 = squared_pairwise_distance(r, r)
        sigma = median_heuristic_sigma(r, r, d2)
        if not np.isfinite(sigma) or sigma <= 0:
            sigma = 1.0
    k = rbf_kernel(r, r, sigma)
    k_col_sums = k.sum(axis=0)
    k_row_sums = k.sum(axis=1)
    k_sum = k_row_sums.sum()
    k_cen = k - k_col_sums[None, :] / n - k_row_sums[:, None] / n + k_sum / (n * n)
    d_eig, v = np.linalg.eigh(k_cen)
    # guard tiny/negative eigenvalues before the 1/sqrt normalization
    d_eig = np.maximum(d_eig, 1e-12)
    pcs = (v / np.sqrt(d_eig)[None, :])[:, -n_components:]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[EMB_COL].to_numpy()).astype(np.float64)
            k_xr = rbf_kernel(x, r, sigma)
            row_sums = k_xr.sum(axis=1)
            m = k_xr.shape[1]
            # Batch-independent centering: every term is normalized by the
            # REFERENCE size m, never the Arrow batch size, so scores are
            # invariant to partitioning/batch boundaries. (The reference's
            # od/pytorch/pca.py:239-243 divides the row term by the test batch
            # size; in exact arithmetic that term cancels against the
            # projection — top eigenvectors of the centered kernel are
            # orthogonal to 1 — so this deviation only removes the ulp-level
            # batch sensitivity, it does not change the scores.)
            k_xr_cen = (
                k_xr - k_col_sums[None, :] / m - row_sums[:, None] / m + k_sum / (m * m)
            )
            proj = k_xr_cen @ pcs
            scores = -2.0 * k_xr.mean(axis=-1) - (proj**2).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "kpca_score": np.round(scores, 6)}
            )

    return emb.select(id_col, EMB_COL).mapInPandas(fn, schema="vec_id long, kpca_score double")


def mahalanobis_cat_scores(
    df: DataFrame,
    cat_col: str,
    value_col: str,
    id_col: str = "event_id",
    n_iter: int = 16,
    d_type: str = "abdm",
    w: float = 0.5,
    max_categories: int = 1000,
):
    """Mahalanobis outlier scoring over MIXED categorical + numerical features
    — the ``cat_vars`` path of the legacy detector
    (``alibi_detect/od/mahalanobis.py:23,64,82-108`` + ``fit :110-190``):

    1. quartile-bin the numerical feature (``utils/discretizer.py``,
       percentiles [25, 50, 75], searchsorted over the deduped borders);
    2. ABDM pairwise category distances from the binned-context contingency
       (``utils/distance.py:125-198``);
    3. multidimensional scaling to one scalar per category + standardization
       (``utils/distance.py:230-279`` — classical-MDS power-method analog,
       see :mod:`..functions.abdm`);
    4. ``cat2num`` the rows and score with the closed-form 2-feature
       population Mahalanobis (same exact-DECIMAL template as
       ``drift.mahalanobis_scores``).

    ``d_type`` covers the reference's full surface (``od/mahalanobis.py:
    104-108,150-184``): ``'abdm'`` (context KL), ``'mvdm'`` (conditional
    label L1 — the declared label surrogate is the quartile bin), and
    ``'abdm-mvdm'`` (the ``w``-weighted combination of the two standardized
    MDS embeddings, re-centered).

    Scale shape: the contingency is ONE distributed groupBy over the full
    table (map-side partial counts, k rows out); percentile borders are one
    exact-percentile aggregate; everything category-sized (k×4 contingency,
    k×k ABDM, the MDS chain) is driver scalar math mirrored term-for-term by
    the SQL twin; scoring is one moment aggregate + one codegen scan with the
    k category literals in a CASE chain. Nothing unbounded ever reaches the
    driver and the corpus never shuffles."""
    from pyspark.sql import functions as F

    from ..functions.abdm import (
        abdm_dpair,
        classical_mds_dabs,
        combine_abdm_mvdm,
        mvdm_dpair,
    )

    if d_type not in ("abdm", "mvdm", "abdm-mvdm"):
        raise ValueError(f"unsupported d_type: {d_type!r}")

    # 1. micro-unit integer quartile borders (identical doubles both engines)
    qrow = (
        df.withColumn("yq", F.round(F.col(value_col) * 1000000).cast("long"))
        .agg(
            *[
                (F.round(F.expr(f"percentile(yq, {p})")) / F.lit(1e6) + F.lit(0.0)).alias(f"q{i}")
                for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
            ]
        )
        .collect()[0]
    )
    borders = [qrow["q1"], qrow["q2"], qrow["q3"]]

    # searchsorted over deduped borders: one conditional term per raw border
    v = F.col(value_col)
    bin_expr = (v > F.lit(borders[0])).cast("int")
    for prev, q in zip(borders, borders[1:]):
        if q > prev:
            bin_expr = bin_expr + (v > F.lit(q)).cast("int")

    # 2. distributed contingency: k rows (category, total, per-bin counts)
    rows = (
        df.groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            *[
                F.sum((bin_expr == F.lit(i)).cast("long")).alias(f"b{i}")
                for i in range(4)
            ],
        )
        .collect()
    )
    # degenerate-input guards: a NULL category would make the sort below
    # raise an opaque TypeError, k < 2 has no pairwise distance to embed,
    # and the k-row contingency collect + k×k MDS are only bounded because
    # category cardinality is (the reference's d_abs dict carries the same
    # implicit bound) — fail fast with actionable messages instead
    if any(r[cat_col] is None for r in rows):
        raise ValueError(
            f"mahalanobis_cat_scores: NULL values in category column "
            f"{cat_col!r} — filter or impute them before scoring"
        )
    if len(rows) < 2:
        raise ValueError(
            f"mahalanobis_cat_scores: need >= 2 categories in {cat_col!r}, "
            f"got {len(rows)} — pairwise category distances are undefined"
        )
    if len(rows) > max_categories:
        raise ValueError(
            f"mahalanobis_cat_scores: {len(rows)} categories in {cat_col!r} "
            f"exceeds max_categories={max_categories}; the k-row contingency "
            "collect and k x k MDS are driver-side — raise max_categories "
            "only if the driver can hold k x k doubles"
        )
    rows.sort(key=lambda r: r[cat_col])
    cats = [r[cat_col] for r in rows]
    counts = [int(r["n_c"]) for r in rows]
    cont = [[int(r[f"b{i}"]) for i in range(4)] for r in rows]

    # 3. pairwise category distances + classical-MDS + standardize
    #    (driver scalar chain, mirrored term-for-term by the SQL twin)
    if d_type == "abdm":
        dabs = classical_mds_dabs(abdm_dpair(cont, counts), n_iter=n_iter)
    elif d_type == "mvdm":
        dabs = classical_mds_dabs(mvdm_dpair(cont, counts), n_iter=n_iter)
    else:
        dabs = combine_abdm_mvdm(
            classical_mds_dabs(abdm_dpair(cont, counts), n_iter=n_iter),
            classical_mds_dabs(mvdm_dpair(cont, counts), n_iter=n_iter),
            w=w,
        )

    # 4. cat2num + exact-moment Mahalanobis
    mapping = F.when(F.col(cat_col) == F.lit(cats[0]), F.lit(dabs[0]))
    for cval, dval in zip(cats[1:], dabs[1:]):
        mapping = mapping.when(F.col(cat_col) == F.lit(cval), F.lit(dval))
    feat = df.select(id_col, mapping.alias("x0"), F.col(value_col).alias("x1"))
    d0 = F.col("x0").cast("decimal(18,8)")
    d1 = F.col("x1").cast("decimal(18,4)")
    stats = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d0).cast("double").alias("sx"),
        F.sum(d1).cast("double").alias("sy"),
        F.sum(d0 * d0).cast("double").alias("sxx_r"),
        F.sum(d1 * d1).cast("double").alias("syy_r"),
        F.sum(d0 * d1).cast("double").alias("sxy_r"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mx"),
        (F.col("sy") / F.col("n")).alias("my"),
        (F.col("sxx_r") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))).alias("sxx"),
        (F.col("syy_r") / F.col("n") - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("syy"),
        (F.col("sxy_r") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("sxy"),
    )
    j = feat.crossJoin(F.broadcast(stats))
    det = F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy")
    dx = F.col("x0").cast("double") - F.col("mx")
    dy = F.col("x1").cast("double") - F.col("my")
    score = (
        F.col("syy") * dx * dx - 2 * F.col("sxy") * dx * dy + F.col("sxx") * dy * dy
    ) / det
    return j.select(id_col, (F.round(score, 6) + F.lit(0.0)).alias("maha_cat"))


def _emb_top_eigvecs(cmat, n_comp: int, n_iter: int):
    """Leading eigenpairs of a small dense covariance via fixed-iteration
    power method + rank-1 deflation (functions/abdm.power_top — the same
    sequential-fold scalar chains the SQL twins mirror)."""
    from ..functions.abdm import deflate, power_top

    vs, b = [], cmat
    for _ in range(n_comp):
        u, lam = power_top(b, n_iter)
        vs.append(u)
        b = deflate(b, u, lam)
    return vs


def pca_outlier_sub_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_comp: int = 4,
    n_iter: int = 8,
    quant: int = 1_000_000,
):
    """Linear-PCA outlier score with a RANK-``n_comp`` principal SUBSPACE at
    the real embedding width — the oracle-checkable instance of
    ``alibi_detect/od/_pca.py:20-208`` (fit = covariance eigenbasis, drop
    the top ``n_components`` eigenvectors, score = squared residual off the
    principal subspace; the full-eigendecomposition variant stays in
    :func:`pca_outlier_scores`, rows-only). Same one-Arrow-pass exact
    moments as :func:`pca_outlier_emb`; the extra eigenvectors come from
    fixed-iteration power + rank-1 deflation on the driver; scoring
    subtracts each component's squared projection in sequence (all
    ``F.aggregate`` sequential folds ≡ ``list_reduce``)."""
    from pyspark.sql import functions as F

    _, mu, cmat = _emb_quant_moments(emb, vec_col, dim, quant)
    vs = _emb_top_eigvecs(cmat, n_comp, n_iter)

    mu_arr = F.array(*[F.lit(m) for m in mu])
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = F.zip_with(xd, mu_arr, lambda a, b: a - b)
    tot = F.aggregate(
        F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda acc, t: acc + t
    )
    score = tot
    for v in vs:
        v_arr = F.array(*[F.lit(x) for x in v])
        p = F.aggregate(
            F.zip_with(c, v_arr, lambda a, b: a * b), F.lit(0.0), lambda acc, t: acc + t
        )
        score = score - p * p
    return emb.select(
        id_col, (F.round(score, 6) + F.lit(0.0)).alias("pca_sub_resid")
    )


def ae_outlier_emb(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_comp: int = 4,
    n_iter: int = 8,
    quant: int = 1_000_000,
    outlier_perc: float = 50.0,
):
    """OutlierAE at the real embedding width with the reference's
    ``outlier_perc`` instance aggregation (``od/ae.py:181-208``: per-feature
    reconstruction errors, instance score = mean of the top
    ``ceil(perc% · d)`` feature errors). The encoder/decoder optimum is the
    rank-``n_comp`` PCA reconstruction (linear-AE closed form, declared
    analog — SURVEY §8 ledger); the top-error selection is a pure SORT of
    identical doubles, so both engines pick the same features and the
    sequential-fold mean hash-matches."""
    import math

    from pyspark.sql import functions as F

    if n_comp != 4:
        raise ValueError("the mirrored pairwise recon grouping is fixed at n_comp=4")
    _, mu, cmat = _emb_quant_moments(emb, vec_col, dim, quant)
    vs = _emb_top_eigvecs(cmat, n_comp, n_iter)
    n_top = int(math.ceil(0.01 * outlier_perc * dim))

    mu_arr = F.array(*[F.lit(m) for m in mu])
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = F.zip_with(xd, mu_arr, lambda a, b: a - b)
    projs = []
    v_arrs = []
    for v in vs:
        v_arr = F.array(*[F.lit(x) for x in v])
        v_arrs.append(v_arr)
        projs.append(
            F.aggregate(
                F.zip_with(c, v_arr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
    # materialize the projections as COLUMNS before the recon lambdas: a
    # proj referenced inside a HOF lambda body is re-evaluated per array
    # element (64x the 64-fold — a 6x slowdown), and CollapseProject would
    # re-inline them through a bare select, so the narrow (cl, p1..p4)
    # projection gets a localCheckpoint barrier (value-identical; one
    # 68-double-per-row corpus copy — at real scale persist it or fuse the
    # scoring into the moment Arrow pass instead)
    proj_df = emb.select(
        id_col, c.alias("cl"), *[projs[i].alias(f"p{i + 1}") for i in range(4)]
    ).localCheckpoint()
    p1, p2, p3, p4 = [F.col(f"p{i}") for i in range(1, 5)]
    # recon_j − μ_j = (v1[j]·p1 + v2[j]·p2) + (v3[j]·p3 + v4[j]·p4) —
    # pairwise grouping mirrored verbatim by the SQL twin
    r12 = F.zip_with(v_arrs[0], v_arrs[1], lambda a, b: a * p1 + b * p2)
    r34 = F.zip_with(v_arrs[2], v_arrs[3], lambda a, b: a * p3 + b * p4)
    rec = F.zip_with(r12, r34, lambda a, b: a + b)
    err = F.zip_with(F.col("cl"), rec, lambda a, b: (a - b) * (a - b))
    top = F.slice(F.sort_array(err, asc=False), 1, n_top)
    score = (
        F.aggregate(top, F.lit(0.0), lambda acc, t: acc + t) / F.lit(float(n_top))
    )
    return proj_df.select(
        id_col, (F.round(score, 6) + F.lit(0.0)).alias("ae_emb_score")
    )


def kpca_outlier_4land(
    df,
    cols: tuple[str, str],
    id_col: str,
    var_eps: float = 1e-9,
    n_iter: int = 8,
):
    """Kernel-PCA outlier score with a 4-LANDMARK Nyström feature map — the
    wider hash-checkable kPCA instance (``od/pytorch/pca.py:173-268``;
    :func:`kpca_outlier_2land` is the closed-form 2-landmark case, the d-dim
    seeded variant stays rows-only). φ(x) = [k(x, l₁..l₄)] with
    deterministic md5-priority landmarks and the Σ-var bandwidth; the
    off-manifold score is :func:`pca_outlier_dfeat`'s fixed-iteration power
    method over the 4-dim feature space — exact DECIMAL feature moments,
    broadcast parameter relations, no UDF."""
    from pyspark.sql import Window, functions as F

    x, y = cols
    base = df.select(
        F.col(id_col),
        F.col(x).cast("double").alias("v"),
        F.col(y).cast("double").alias("u"),
    )
    pr = F.md5(F.concat(F.lit("kpca4:"), F.col(id_col).cast("string")))
    four = base.withColumn("pr", pr).orderBy("pr", id_col).limit(4)
    wv = Window.orderBy("pr", id_col)
    land = four.withColumn("rn", F.row_number().over(wv)).agg(
        *[
            F.max(F.when(F.col("rn") == i, F.col(c))).alias(f"l{i}{c}")
            for i in range(1, 5)
            for c in ("v", "u")
        ]
    )
    dv = F.col("v").cast("decimal(18,4)")
    du = F.col("u").cast("decimal(18,4)")
    gs = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dv).cast("double").alias("sv"),
        F.sum(dv * dv).cast("double").alias("svv"),
        F.sum(du).cast("double").alias("su"),
        F.sum(du * du).cast("double").alias("suu"),
    ).select(
        (
            (F.col("svv") / F.col("n") - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")))
            + (F.col("suu") / F.col("n") - (F.col("su") / F.col("n")) * (F.col("su") / F.col("n")))
            + F.lit(var_eps)
        ).alias("s2")
    )
    j = base.crossJoin(F.broadcast(land)).crossJoin(F.broadcast(gs))
    kern = lambda i: F.exp(  # noqa: E731
        -(
            (F.col("v") - F.col(f"l{i}v")) * (F.col("v") - F.col(f"l{i}v"))
            + (F.col("u") - F.col(f"l{i}u")) * (F.col("u") - F.col(f"l{i}u"))
        )
        / (F.lit(2.0) * F.col("s2"))
    )
    feats = j.select(id_col, *[kern(i).alias(f"f{i}") for i in range(1, 5)])
    return pca_outlier_dfeat(
        feats, ("f1", "f2", "f3", "f4"), id_col, n_iter
    ).withColumnRenamed("pca_resid", "kpca4_resid")
