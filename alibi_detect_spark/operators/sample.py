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
