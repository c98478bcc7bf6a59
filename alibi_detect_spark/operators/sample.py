"""Distributed sampling operators.

Spark-side reservoir sampling: the reference's ``reservoir_sampling``
(``alibi_detect/utils/sampling.py:5-44``) is a sequential one-pass algorithm;
its distributed equivalent is priority sampling (A-Res with hash-derived
uniforms): assign each row a deterministic pseudo-uniform priority and keep
the ``n`` smallest. This is order-invariant, mergeable (per-partition top-n +
tiny merge — Spark's ``TakeOrderedAndProject``, no global sort shuffle), and
exactly reproducible in SQL, so the sample itself is oracle-checkable — the
property the reference's RNG-order-dependent loop cannot offer at scale.
The sequential NumPy twin lives in ``functions/sampling.py`` (pytest parity
with the reference's semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reservoir_sample(
    df: DataFrame, id_col: str, n: int, seed: int = 42, keep_cols: list[str] | None = None
) -> DataFrame:
    """Uniform-without-replacement sample of ``n`` rows: priority =
    ``md5(seed ':' id)`` (identical hex ordering in Spark and DuckDB),
    keep the n smallest."""
    pri = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    cols = keep_cols if keep_cols is not None else [id_col]
    return (
        df.select(*cols, pri.alias("priority"))
        .orderBy("priority")
        .limit(n)
    )


def weighted_reservoir_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 42,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted-without-replacement sample (Efraimidis–Spirakis A-ES: keep
    the ``n`` rows with the largest ``u^{1/w}``, u ~ U(0,1)) — the
    quality-weighted sampling stage of a training-data pipeline (sample
    documents proportionally to a quality score).

    Deterministic/oracle-checkable twist: ``u`` is md5-derived (first 12 hex
    chars → integer in (0, 2^48), identical in both engines) and the rank key
    is ``ln(u)/w`` (monotone in ``u^{1/w}`` for w > 0), ROUNDED to 9dp before
    ranking with ties broken by id — the repo's round-before-rank recipe, so
    the selected set is identical in Spark and DuckDB despite ``ln`` being a
    libm call. Plan: per-partition top-n + tiny merge
    (``TakeOrderedAndProject``), no global sort — same shape as
    :func:`reservoir_sample`."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(2**48 + 1))  # strictly inside (0, 1)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    cols = keep_cols if keep_cols is not None else [id_col]
    return (
        df.where(F.col(weight_col) > 0)
        .select(*cols, key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), id_col)  # largest u^{1/w} win
        .limit(n)
    )
