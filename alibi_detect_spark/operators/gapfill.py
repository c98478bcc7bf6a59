"""Gap-fill: make every per-source series strictly equidistant.

The reference *assumes* equidistant timestamps (``alibi_detect/od/sr.py:126``
docstring; ``score`` defaults ``t = arange(N)``) — gap-fill is what makes that
assumption true at scale (SURVEY §4).

Plan shape: per-source min/max (tiny agg) → ``sequence()`` + ``explode`` grid
→ LEFT join grid ↔ rollup on (source, bucket_ts). The grid side is
per-source bounded (series length, not row count), and the join key is exactly
the rollup's grouping key so AQE plans a cheap shuffle; at 10^12 scale the
grid is millions of rows vs trillions of raw rows — negligible.

Fill policy: counts/sums → 0 (exact), min/max/mean → null, ``gapfilled`` flag
set. Downstream detector fills are explicit (see ``operators/detect.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schemas import TIER_SECONDS


def gapfill(rollup: DataFrame, tier: str = "1h") -> DataFrame:
    secs = TIER_SECONDS[tier]
    grid = (
        rollup.groupBy("source")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "source",
            F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(secs))).alias("bucket_ts"),
        )
    )
    filled = (
        grid.join(rollup.drop("gapfilled"), ["source", "bucket_ts"], "left")
        .select(
            "source",
            "bucket_ts",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("sum_n_tok"), F.lit(0)).alias("sum_n_tok"),
            "min_n_tok",
            "max_n_tok",
            "mean_n_tok",
            F.col("n_docs").isNull().alias("gapfilled"),
        )
    )
    return filled
