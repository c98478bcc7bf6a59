"""Single-node NumPy/pandas reference pipeline — the bit-match oracle.

Implements the identical rollup → gap-fill → downsample → encode → detect
stages as the Spark engine, calling the very same kernel functions
(:mod:`alibi_detect_spark.functions`, ``operators.encode.encode_source_series``,
``operators.detect.score_series``), so equality between cluster output and
oracle output is structural.
"""

from .pipeline import (  # noqa: F401
    downsample_pandas,
    encode_pages_pandas,
    gapfill_pandas,
    oracle_pipeline,
    rollup_pandas,
    score_pandas,
)
