"""Table schemas for the engine (input_hint authoritative: BASELINE.json).

The raw table mirrors an Iceberg table of pre-tokenized training sequences::

    (doc_id string, tokens array<int32>, n_tok int32, source string, event_ts timestamp)

Internally the engine keys time by ``bucket_ts`` = epoch **seconds** as int64 —
exact integer arithmetic end-to-end (no tz / float ambiguity), rendered as a
timestamp only at the presentation edge.
"""

from __future__ import annotations

from pyspark.sql import types as T

TOKEN_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)

# tier-1/2/3 rollup rows — one per (source, bucket). Integer stats are exact
# under any aggregation order → distributed == single-node bit-for-bit.
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("bucket_ts", T.LongType(), False),  # epoch seconds, tier-aligned
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("sum_n_tok", T.LongType(), False),
        T.StructField("min_n_tok", T.IntegerType(), True),
        T.StructField("max_n_tok", T.IntegerType(), True),
        T.StructField("mean_n_tok", T.DoubleType(), True),  # sum/count, one division
        T.StructField("gapfilled", T.BooleanType(), False),
    ]
)

# Encoded tier page: one row per (source, tier, page). Self-contained decode.
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("page_start_ts", T.LongType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("page", T.BinaryType(), False),
    ]
)

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("bucket_ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("sr_score", T.DoubleType(), True),
        T.StructField("is_outlier", T.IntegerType(), True),
        T.StructField("mmd_stat", T.DoubleType(), True),
        T.StructField("mmd_threshold", T.DoubleType(), True),
        T.StructField("mmd_is_drift", T.IntegerType(), True),
        T.StructField("ewma_stat", T.DoubleType(), True),
    ]
)

TIER_SECONDS = {"1h": 3600, "6h": 21600, "1d": 86400}
