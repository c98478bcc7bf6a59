"""Streaming tier rollup + stateful EWMA (Structured Streaming).

Late data: the reference assumes a strictly ordered stream and has no late
handling (SURVEY §2.6); here the watermark makes that contract explicit —
rows later than ``watermark_delay`` are dropped, and a (source, bucket) row
is emitted exactly once when its window closes. The checkpoint directory
carries all rollup state, so a killed job resumes mid-stream with no
recomputation and no duplicates (exactly-once file sink).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import TIER_SECONDS


def stream_rollup(
    spark: SparkSession,
    input_path: str,
    tier: str = "1h",
    watermark_delay: str = "1 minute",
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """Tier-1 rollup as a streaming aggregation over a parquet file source.

    Same aggregate set as the batch :func:`..operators.rollup.rollup_tier1`
    (integer stats → order-independent → equals the batch/oracle result for
    every emitted window). Append output mode: a row per (source, bucket)
    exactly once, after the watermark passes the window end.
    """
    secs = TIER_SECONDS[tier]
    if schema is None:
        schema = "doc_id string, n_tok int, source string, event_ts timestamp"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(input_path)
    agg = (
        raw.withWatermark("event_ts", watermark_delay)
        .groupBy("source", F.window("event_ts", f"{secs} seconds").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
        )
        .select(
            "source",
            F.unix_timestamp(F.col("win.start")).alias("bucket_ts"),
            "n_docs",
            "sum_n_tok",
            "min_n_tok",
            "max_n_tok",
            (F.col("sum_n_tok") / F.col("n_docs")).alias("mean_n_tok"),
        )
    )
    return agg


def run_stream_rollup_once(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    tier: str = "1h",
    watermark_delay: str = "1 minute",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all available input with ``trigger(availableNow)`` and stop —
    the batch-ish harness for tests and backfills; a production run uses the
    same query with a continuous trigger."""
    agg = stream_rollup(spark, input_path, tier, watermark_delay, max_files_per_trigger)
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


MMD_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("mmd_stat", DoubleType()),
        StructField("mmd_threshold", DoubleType()),
        StructField("mmd_is_drift", LongType()),
    ]
)
MMD_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("window_flat", ArrayType(DoubleType())),
        StructField("last_ts", LongType()),
    ]
)


def mmd_stream(
    rollup: DataFrame,
    detectors: dict,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Streaming online-MMD drift as a custom stateful operator
    (``applyInPandasWithState``): the detector configs (ref subset, kernel
    bandwidth, bootstrap thresholds) are FITTED BATCH-SIDE and shipped in the
    closure (exactly the reference's fit-then-stream lifecycle,
    ``cd/base_online.py``); the state store carries (t, FIFO test window) per
    source, so trajectories bit-match the batch replay across micro-batches
    and restarts."""
    import numpy as np

    from ..functions.mmd import OnlineMMDState

    def fn(key, pdf_iter, state):
        (source,) = key
        det = detectors.get(source)
        if det is None:
            return
        if state.exists:
            t, flat, last_ts = state.get
            st = OnlineMMDState(t=int(t), test_window=np.asarray(flat, dtype=np.float64).reshape(det.window_size, -1))
        else:
            st, last_ts = det.initial_state(), -1
        # gather ALL Arrow chunks of this group's micro-batch before sorting:
        # chunk arrival order is nondeterministic (shuffle fetch), and a
        # per-chunk last_ts filter would silently drop earlier-timestamped
        # rows from later chunks, corrupting the carried state
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if not len(pdf):
                continue
            x = pdf[value_col].to_numpy(dtype=np.float64)[:, None]
            stats, thr, drift, st = det.score_stream(x, st)
            last_ts = int(pdf["bucket_ts"].iloc[-1])
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": pdf["bucket_ts"].to_numpy(dtype=np.int64),
                    "mmd_stat": stats,
                    "mmd_threshold": thr,
                    "mmd_is_drift": drift.astype(np.int64),
                }
            )
        state.update((st.t, [float(v) for v in st.test_window.ravel()], last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=MMD_OUT_SCHEMA,
        stateStructType=MMD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


EWMA_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("ewma", DoubleType()),
    ]
)
EWMA_STATE_SCHEMA = StructType(
    [StructField("carry", DoubleType()), StructField("last_ts", LongType())]
)


def ewma_stream(
    rollup: DataFrame, lam: float = 0.1, value_col: str = "sum_n_tok"
) -> DataFrame:
    """Custom stateful streaming operator: per-source EWMA with the carry in
    the state store (``applyInPandasWithState``), the streaming twin of
    :func:`..operators.detect.ewma_over`. Exactness contract: within a
    micro-batch rows are sorted by ``bucket_ts``; across micro-batches the
    carry reproduces the uninterrupted recursion as long as batches arrive in
    time order (true for the append-mode rollup upstream, whose emissions are
    watermark-ordered)."""
    from ..functions.ewma import ewma

    def fn(key, pdf_iter, state):
        (source,) = key
        if state.exists:
            carry, last_ts = state.get
        else:
            carry, last_ts = None, -1
        # gather ALL Arrow chunks of this group's micro-batch before sorting:
        # chunk arrival order is nondeterministic (shuffle fetch), and a
        # per-chunk last_ts filter would silently drop earlier-timestamped
        # rows from later chunks, corrupting the carried state
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if not len(pdf):
                continue
            x = pdf[value_col].to_numpy(dtype=np.float64)
            out = ewma(x, lam, carry=carry)
            carry = float(out[-1])
            last_ts = int(pdf["bucket_ts"].iloc[-1])
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": pdf["bucket_ts"].to_numpy(dtype=np.int64),
                    "ewma": out,
                }
            )
        state.update((carry if carry is not None else float("nan"), last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


CVM_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("cvm_stats", ArrayType(DoubleType())),
        StructField("cvm_threshold", DoubleType()),
        StructField("cvm_is_drift", LongType()),
    ]
)
CVM_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("tail", ArrayType(DoubleType())),
        StructField("last_ts", LongType()),
    ]
)


def cvm_stream(rollup: DataFrame, detectors: dict, value_col: str = "sum_n_tok") -> DataFrame:
    """Streaming online-CVM drift (multi-window) as a custom stateful operator
    (``applyInPandasWithState``): detectors are fitted batch-side — the
    distribution-free thresholds once on the driver — and shipped in the
    closure; the state store carries (raw time t, the last ``max_ws−1``
    stream points) per source. Because the CVM window counts are integers,
    chunked micro-batch scoring reproduces the batch replay bit-for-bit."""
    import numpy as np

    def fn(key, pdf_iter, state):
        (source,) = key
        det = detectors.get(source)
        if det is None:
            return
        if state.exists:
            t0, tail, last_ts = state.get
            warm = np.asarray(tail, dtype=np.float64)
        else:
            t0, warm, last_ts = 0, None, -1
        # gather ALL Arrow chunks of this group's micro-batch before sorting:
        # chunk arrival order is nondeterministic (shuffle fetch), and a
        # per-chunk last_ts filter would silently drop earlier-timestamped
        # rows from later chunks, corrupting the carried state
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if not len(pdf):
                continue
            x = pdf[value_col].to_numpy(dtype=np.float64)
            stats, thr, drift, carry = det.score_stream(x, t0=int(t0), warm=warm)
            t0, warm = carry["t"], carry["tail"]
            last_ts = int(pdf["bucket_ts"].iloc[-1])
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": pdf["bucket_ts"].to_numpy(dtype=np.int64),
                    "cvm_stats": [list(row) for row in stats],
                    "cvm_threshold": thr,
                    "cvm_is_drift": drift.astype(np.int64),
                }
            )
        state.update((int(t0), [float(v) for v in (warm if warm is not None else [])], last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=CVM_OUT_SCHEMA,
        stateStructType=CVM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


FET_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("fet_stats", ArrayType(DoubleType())),
        StructField("fet_threshold", DoubleType()),
        StructField("fet_is_drift", LongType()),
    ]
)
FET_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("ewma", ArrayType(DoubleType())),
        StructField("tail", ArrayType(LongType())),
        StructField("last_ts", LongType()),
    ]
)


def fet_stream(rollup: DataFrame, detectors: dict, bit_col: str = "bit") -> DataFrame:
    """Streaming online-FET drift (multi-window): state = (raw time, per-window
    EWMA carries, last ``max_ws−1`` bits). The EWMA recursion continues across
    micro-batches exactly, so trajectories bit-match the batch replay."""
    import numpy as np

    def fn(key, pdf_iter, state):
        (source,) = key
        det = detectors.get(source)
        if det is None:
            return
        if state.exists:
            t0, carry_e, tail, last_ts = state.get
            carry = np.asarray(carry_e, dtype=np.float64) if len(carry_e) else None
            warm = np.asarray(tail, dtype=np.int64)
        else:
            t0, carry, warm, last_ts = 0, None, None, -1
        # gather ALL Arrow chunks of this group's micro-batch before sorting:
        # chunk arrival order is nondeterministic (shuffle fetch), and a
        # per-chunk last_ts filter would silently drop earlier-timestamped
        # rows from later chunks, corrupting the carried state
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if not len(pdf):
                continue
            bits = pdf[bit_col].to_numpy(dtype=np.int64)
            stats, thr, drift, c = det.score_stream(bits, t0=int(t0), carry=carry, warm=warm)
            t0, carry, warm = c["t"], c["ewma"], c["tail"]
            last_ts = int(pdf["bucket_ts"].iloc[-1])
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": pdf["bucket_ts"].to_numpy(dtype=np.int64),
                    "fet_stats": [list(row) for row in stats],
                    "fet_threshold": thr,
                    "fet_is_drift": drift.astype(np.int64),
                }
            )
        state.update(
            (
                int(t0),
                [float(v) for v in (carry if carry is not None else [])],
                [int(v) for v in (warm if warm is not None else [])],
                last_ts,
            )
        )

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=FET_OUT_SCHEMA,
        stateStructType=FET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


LSDD_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("lsdd_stat", DoubleType()),
        StructField("lsdd_threshold", DoubleType()),
        StructField("lsdd_is_drift", LongType()),
    ]
)
LSDD_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("window_flat", ArrayType(DoubleType())),
        StructField("last_ts", LongType()),
    ]
)


def lsdd_stream(
    rollup: DataFrame, detectors: dict, value_cols: list[str] | None = None
) -> DataFrame:
    """Streaming online-LSDD drift (``cd/pytorch/lsdd_online.py`` lifecycle):
    detectors fitted batch-side (kernel centers, λ-regularized H inverse,
    bootstrap thresholds), FIFO normalized test window carried in the state
    store — trajectories bit-match the batch replay across micro-batches."""
    import numpy as np

    from ..functions.lsdd import OnlineLSDDState

    cols = value_cols or ["sum_n_tok"]

    def fn(key, pdf_iter, state):
        (source,) = key
        det = detectors.get(source)
        if det is None:
            return
        if state.exists:
            t, flat, last_ts = state.get
            st = OnlineLSDDState(
                t=int(t),
                test_window=np.asarray(flat, dtype=np.float64).reshape(det.window_size, -1),
            )
        else:
            st, last_ts = det.initial_state(), -1
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if not len(pdf):
                continue
            x = pdf[cols].to_numpy(dtype=np.float64)
            stats, thr, drift, st = det.score_stream(x, st)
            last_ts = int(pdf["bucket_ts"].iloc[-1])
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": pdf["bucket_ts"].to_numpy(dtype=np.int64),
                    "lsdd_stat": stats,
                    "lsdd_threshold": thr,
                    "lsdd_is_drift": drift.astype(np.int64),
                }
            )
        state.update((st.t, [float(v) for v in st.test_window.ravel()], last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=LSDD_OUT_SCHEMA,
        stateStructType=LSDD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


MAHA_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("maha_score", DoubleType()),
    ]
)
MAHA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sv", LongType()),
        StructField("svv", LongType()),
        StructField("su", LongType()),
        StructField("suu", LongType()),
        StructField("svu", LongType()),
        StructField("last_ts", LongType()),
    ]
)


def mahalanobis_stream(
    rollup: DataFrame,
    value_cols: tuple[str, str] = ("sum_n_tok", "v2"),
    warmup: int = 30,
    quant: int = 10_000,
    var_eps: float = 1e-9,
) -> DataFrame:
    """Stateful streaming online-Mahalanobis — the streaming twin of
    :func:`..operators.detect.mahalanobis_online_stats_over`. The carried
    state is SIX integers (the exact quantized prefix moments) + a
    high-water timestamp: because the online state collapses to prefix sums,
    the state store holds no window buffer at all, and the stream reproduces
    the batch trajectory bit-for-bit under any micro-batch slicing (the
    moments are exact integers, the scalar math is the identical IEEE
    expression tree)."""
    vcol, ucol = value_cols
    q = float(quant)

    def fn(key, pdf_iter, state):
        (source,) = key
        if state.exists:
            n0, sv, svv, su, suu, svu, last_ts = state.get
        else:
            n0, sv, svv, su, suu, svu, last_ts = 0, 0, 0, 0, 0, 0, -(2**62)
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            whole = pd.concat(chunks).sort_values("bucket_ts", kind="mergesort")
            whole = whole[whole["bucket_ts"] > last_ts]
            if len(whole):
                v = whole[vcol].to_numpy(dtype=np.float64)
                u = whole[ucol].to_numpy(dtype=np.float64)
                vq = np.round(v * quant).astype(np.int64)
                uq = np.round(u * quant).astype(np.int64)

                def cum(base, arr):
                    # object dtype = arbitrary-precision Python ints: the
                    # second-moment cumsums overflow int64 for large values
                    # (the batch twin accumulates in DECIMAL(38,0)); then
                    # convert each exact integer to its nearest double —
                    # bit-identical to the batch's decimal→double cast,
                    # BEFORE any division (int/float true division is
                    # correctly rounded and would differ by 1 ulp)
                    c = np.concatenate(
                        [np.zeros(1, dtype=object), np.cumsum(arr.astype(object))]
                    )[:-1]
                    exact = base + c
                    return exact, np.array([float(t) for t in exact], dtype=np.float64)

                pv = vq.astype(object)
                pu = uq.astype(object)
                csv_i, csv = cum(sv, pv)
                csvv_i, csvv = cum(svv, pv * pv)
                csu_i, csu = cum(su, pu)
                csuu_i, csuu = cum(suu, pu * pu)
                csvu_i, csvu = cum(svu, pv * pu)
                cn = n0 + np.arange(len(v), dtype=np.int64)
                cond = cn >= warmup
                with np.errstate(divide="ignore", invalid="ignore"):
                    nn = cn.astype(np.float64)
                    mv = csv / (nn * q)
                    mu = csu / (nn * q)
                    a = (csvv / (nn * q * q) - mv * mv) + var_eps
                    b = (csuu / (nn * q * q) - mu * mu) + var_eps
                    c = csvu / (nn * q * q) - mv * mu
                    det = a * b - c * c
                    dx = v - mv
                    dy = u - mu
                    d2 = (b * dx * dx - 2.0 * c * dx * dy + a * dy * dy) / det
                sc = np.round(d2, 6) + 0.0
                n0 = int(n0 + len(v))
                sv = int(csv_i[-1] + pv[-1])
                svv = int(csvv_i[-1] + pv[-1] * pv[-1])
                su = int(csu_i[-1] + pu[-1])
                suu = int(csuu_i[-1] + pu[-1] * pu[-1])
                svu = int(csvu_i[-1] + pv[-1] * pu[-1])
                if max(abs(svv), abs(suu), abs(svu)) >= 2**62:
                    raise OverflowError(
                        "mahalanobis_stream moment state exceeds int64 — lower "
                        "`quant` for this value scale (state carries exact "
                        "integers in a LongType store)"
                    )
                last_ts = int(whole["bucket_ts"].iloc[-1])
                if cond.any():
                    yield pd.DataFrame(
                        {
                            "source": source,
                            "bucket_ts": whole["bucket_ts"].to_numpy(dtype=np.int64)[cond],
                            "maha_score": sc[cond],
                        }
                    )
        state.update((n0, sv, svv, su, suu, svu, last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=MAHA_OUT_SCHEMA,
        stateStructType=MAHA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


LSDDH_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("lsdd_stat", DoubleType()),
    ]
)
LSDDH_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("c1", DoubleType()),
        StructField("c2", DoubleType()),
        StructField("sr1", LongType()),
        StructField("sr2", LongType()),
        StructField("tail1", ArrayType(LongType())),
        StructField("tail2", ArrayType(LongType())),
        StructField("pend", ArrayType(DoubleType())),
        StructField("last_ts", LongType()),
    ]
)


def lsdd_hash_stream(
    rollup: DataFrame,
    value_col: str = "sum_n_tok",
    n_ref: int = 64,
    window_size: int = 10,
    sigma: float = 5.0,
    lam: float = 0.25,
    quant: int = 1_000_000_000,
    decision_thresholds: tuple[float, ...] | None = None,
) -> DataFrame:
    """Stateful streaming twin of
    :func:`..operators.detect.lsdd_online_stats_over` (the declarative
    closed-form online LSDD). Carried state: the two kernel centers, the
    exact integer reference sums, the last ``window_size − 1`` quantized
    kernel features, and (during the first two rows only) the pending raw
    values the centers are derived from. Because every sum is an exact
    integer and the scalar chain mirrors the batch operator's expression
    tree, the stream reproduces the batch trajectory bit-for-bit under any
    micro-batch slicing.

    With ``decision_thresholds`` (e.g.
    ``functions.online_thresholds.lsdd2_decision_thresholds()``) the stream
    ALSO emits the decision path of the batch ``lsdd_decisions`` query:
    per-step threshold lookup on the absolute stream time (warm-up-varying,
    clamped at ``window_size`` — ``cd/base_online.py:131-144`` indexing) and
    ``lsdd_is_drift = stat > threshold`` over the identically-rounded stat,
    so streamed decisions equal the batch comparisons exactly."""
    if window_size < 2:
        # keep=0 would slice h[-0:] = the WHOLE array, growing the state
        # store unboundedly (and a 1-point LSDD window is degenerate anyway)
        raise ValueError(f"window_size must be >= 2, got {window_size}")
    two_sig2 = 2.0 * sigma * sigma
    four_sig2 = 4.0 * sigma * sigma
    a = 1.0 + lam
    keep = window_size - 1

    def fn(key, pdf_iter, state):
        (source,) = key
        if state.exists:
            n0, c1, c2, sr1, sr2, tail1, tail2, pend, last_ts = state.get
            tail1, tail2, pend = list(tail1), list(tail2), list(pend)
        else:
            n0, c1, c2 = 0, float("nan"), float("nan")
            sr1, sr2, tail1, tail2, pend, last_ts = 0, 0, [], [], [], -(2**62)
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            whole = pd.concat(chunks).sort_values("bucket_ts", kind="mergesort")
            whole = whole[whole["bucket_ts"] > last_ts]
            if len(whole):
                v = whole[value_col].to_numpy(dtype=np.float64)
                ts = whole["bucket_ts"].to_numpy(dtype=np.int64)
                last_ts = int(ts[-1])
                # rows seen before the centers are fixed wait in `pend`
                # (both centers come from the first two rows in order)
                n_seen = n0 + len(pend)
                if n_seen < 2:
                    need = 2 - n_seen
                    pend.extend(float(x) for x in v[:need])
                    n_seen = n0 + len(pend)
                    if n_seen < 2:
                        state.update((n0, c1, c2, sr1, sr2, tail1, tail2, pend, last_ts))
                        return
                    c1, c2 = pend[0], pend[1]
                    # reprocess the pended rows plus the rest of this batch;
                    # pended rows are ref rows 1..2 — they never emit, so
                    # their timestamps are placeholders
                    v = np.concatenate([np.array(pend, dtype=np.float64), v[need:]])
                    ts = np.concatenate([np.zeros(len(pend), dtype=np.int64), ts[need:]])
                    pend = []
                kq1 = np.round(np.exp(-((v - c1) * (v - c1)) / two_sig2) * quant).astype(np.int64)
                kq2 = np.round(np.exp(-((v - c2) * (v - c2)) / two_sig2) * quant).astype(np.int64)
                rn = n0 + np.arange(len(v), dtype=np.int64) + 1
                refm = rn <= n_ref
                sr1 = int(sr1 + kq1[refm].sum())
                sr2 = int(sr2 + kq2[refm].sum())
                sm = rn > n_ref
                if sm.any():
                    h1 = np.concatenate([np.array(tail1, dtype=np.int64), kq1[sm]])
                    h2 = np.concatenate([np.array(tail2, dtype=np.int64), kq2[sm]])
                    t0 = len(tail1)
                    cs1 = np.concatenate([[0], np.cumsum(h1)])
                    cs2 = np.concatenate([[0], np.cumsum(h2)])
                    idx = t0 + np.arange(int(sm.sum()))
                    full = idx >= window_size - 1
                    if full.any():
                        i = idx[full]
                        w1 = (cs1[i + 1] - cs1[i + 1 - window_size]).astype(np.float64)
                        w2 = (cs2[i + 1] - cs2[i + 1 - window_size]).astype(np.float64)
                        e = float(np.exp(-((c1 - c2) * (c1 - c2)) / four_sig2))
                        det = (a * a) - e * e
                        b11 = a / det
                        b12 = (-e) / det
                        bh11 = b11 + b12 * e
                        bh12 = b11 * e + b12
                        bhb11 = bh11 * b11 + bh12 * b12
                        bhb12 = bh11 * b12 + bh12 * b11
                        m11 = 2.0 * b11 - bhb11
                        m12 = 2.0 * b12 - bhb12
                        hh1 = sr1 / (n_ref * float(quant)) - w1 / (window_size * float(quant))
                        hh2 = sr2 / (n_ref * float(quant)) - w2 / (window_size * float(quant))
                        stat = m11 * (hh1 * hh1 + hh2 * hh2) + 2.0 * m12 * hh1 * hh2
                        out_ts = ts[sm][full]
                        row = {
                            "source": source,
                            "bucket_ts": out_ts,
                            "lsdd_stat": np.round(stat, 9) + 0.0,
                        }
                        if decision_thresholds is not None:
                            # 1-based step since the first full window, from
                            # the ABSOLUTE row number (the kq tail only holds
                            # the last window_size-1 features, so positions
                            # within this batch cannot index the thresholds)
                            t_step = rn[sm][full] - n_ref - window_size + 1
                            t_idx = np.minimum(t_step, window_size) - 1
                            thr = np.asarray(decision_thresholds, dtype=np.float64)[t_idx]
                            row["lsdd_threshold"] = thr
                            row["lsdd_is_drift"] = (row["lsdd_stat"] > thr).astype(np.int32)
                        yield pd.DataFrame(row)
                    tail1 = [int(x) for x in h1[-keep:]]
                    tail2 = [int(x) for x in h2[-keep:]]
                n0 = int(rn[-1])
        state.update((n0, c1, c2, sr1, sr2, tail1, tail2, pend, last_ts))

    out_schema = LSDDH_OUT_SCHEMA
    if decision_thresholds is not None:
        if len(decision_thresholds) < window_size:
            raise ValueError(
                f"decision_thresholds needs >= window_size={window_size} entries"
            )
        out_schema = StructType(
            list(LSDDH_OUT_SCHEMA.fields)
            + [
                StructField("lsdd_threshold", DoubleType()),
                StructField("lsdd_is_drift", IntegerType()),
            ]
        )
    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=LSDDH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


SR_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("sr_score", DoubleType()),
    ]
)
SR_STATE_SCHEMA = StructType(
    [
        StructField("halo", ArrayType(DoubleType())),
        StructField("pend_v", ArrayType(DoubleType())),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("last_ts", LongType()),
    ]
)


def sr_stream(
    rollup: DataFrame,
    value_col: str = "sum_n_tok",
    chunk_size: int = 64,
    halo: int = 32,
    sr_params: dict | None = None,
) -> DataFrame:
    """Stateful streaming Spectral Residual — the streaming twin of the
    chunk+halo batch protocol (:func:`..functions.sr.sr_score_chunked`,
    reference scoring semantics ``od/sr.py:320-368`` applied per chunk).

    SR needs a whole series for its FFT, so the stream's unit of work is a
    FIXED chunk: rows buffer in the state store until ``chunk_size`` of them
    accumulate, then the chunk is scored on [carried ``halo`` tail ⧺ chunk]
    via the SAME kernel the batch operator calls (``sr_chunk_scores``) and
    only the carried tail + any partial chunk stay in state. Chunk boundaries
    are absolute stream positions, so the emitted trajectory is invariant to
    micro-batch slicing — bit-for-bit equal to the batch replay.

    State size is bounded by ``halo + chunk_size − 1`` doubles per key
    regardless of stream length."""
    from ..functions.sr import sr_chunk_scores

    if chunk_size <= max(
        (sr_params or {}).get("window_amp", 20),
        (sr_params or {}).get("window_local", 20),
    ):
        raise ValueError(
            f"chunk_size {chunk_size} must exceed the SR windows so the first"
            " (halo-less) chunk is scoreable"
        )
    if halo < 0:
        raise ValueError(f"halo must be >= 0, got {halo}")
    srp = dict(sr_params or {})

    def fn(key, pdf_iter, state):
        (source,) = key
        if state.exists:
            h, pv, pts, last_ts = state.get
            h, pv, pts = list(h), list(pv), list(pts)
        else:
            h, pv, pts, last_ts = [], [], [], -(2**62)
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            whole = pd.concat(chunks).sort_values("bucket_ts", kind="mergesort")
            whole = whole[whole["bucket_ts"] > last_ts]
            if len(whole):
                pv.extend(float(v) for v in whole[value_col].to_numpy(dtype=np.float64))
                pts.extend(int(t) for t in whole["bucket_ts"].to_numpy(dtype=np.int64))
                last_ts = int(whole["bucket_ts"].iloc[-1])
                while len(pv) >= chunk_size:
                    chunk = np.array(pv[:chunk_size], dtype=np.float64)
                    cts = np.array(pts[:chunk_size], dtype=np.int64)
                    scores = sr_chunk_scores(
                        np.array(h, dtype=np.float64), chunk, **srp
                    )
                    yield pd.DataFrame(
                        {"source": source, "bucket_ts": cts, "sr_score": scores}
                    )
                    # h[-0:] would be the WHOLE history — guard halo=0
                    h = (h + [float(v) for v in chunk])[-halo:] if halo > 0 else []
                    pv, pts = pv[chunk_size:], pts[chunk_size:]
        state.update((h, pv, pts, last_ts))

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=SR_OUT_SCHEMA,
        stateStructType=SR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
    prefix_words: int | None = None,
) -> DataFrame:
    """Streaming EXACT dedup at ingestion time — the streaming twin of
    :func:`..operators.dedup.exact_dup_groups`'s survivor semantics: the
    FIRST arrival of each content hash passes through, later duplicates are
    dropped. Built on Structured Streaming's native
    ``dropDuplicatesWithinWatermark``: the dedup state is keyed by the
    md5 content hash (computed map-side — the text never shuffles for the
    key) and EXPIRES past the watermark, so state is bounded by the
    duplicate-arrival horizon instead of the stream's full history — the
    only shape that survives an unbounded 100 TB ingest feed. Duplicates
    farther apart than ``watermark_delay`` are deliberately NOT caught here;
    the batch operator over the landed table is the exhaustive pass (the
    standard two-tier dedup architecture)."""
    from pyspark.sql import functions as F

    if prefix_words is None:
        key = F.md5(F.col(text_col))
    else:
        key = F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col(text_col), " "), 1, prefix_words))
        )
    return (
        docs.withColumn("content_hash", key)
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


SSA_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("ssa4_score", DoubleType()),
    ]
)
SSA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("xs_tail", ArrayType(DoubleType())),
        StructField("ts_pend", ArrayType(LongType())),
        StructField("last_ts", LongType()),
    ]
)


def ssa_stream(
    rollup: DataFrame,
    vectors: dict,
    w: int = 4,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Streaming window-``w`` SSA reconstruction scoring — the stateful twin
    of :func:`..operators.detect.ssa_outlier_wfeat_over` (fit batch-side via
    :func:`..operators.detect.ssa_wfeat_par`, the per-key eigenvector ships
    in the closure; ``od/seq2seq.py:199-244`` scoring contract).

    A position finalizes only once every lag window covering it is complete
    (its score needs ``x`` up to ``w−1`` steps ahead), so emission lags the
    stream head by ``w−1`` rows and the state carries the last ``2w−2``
    values plus the pending positions' timestamps. Arithmetic mirrors the
    batch SQL term-for-term: left-fold projections, newest-window-first
    contribution sums with ``+0.0`` for missing leading windows, HALF_UP 6dp
    rounding (Spark ``round``'s BigDecimal semantics via ``decimal``) — so
    finalized scores bit-match the batch operator under ANY micro-batch
    slicing."""
    from decimal import ROUND_HALF_UP, Decimal

    def _round6_half_up(val: float) -> float:
        # Spark's round(double, 6) = BigDecimal.valueOf(x) → setScale(6,
        # HALF_UP): it rounds the SHORTEST round-trip decimal repr (Java
        # Double.toString ≡ Python repr), not the exact binary expansion —
        # Decimal(val) directly would flip ~1% of 6dp digits at 1e8 scale
        return float(Decimal(repr(float(val))).quantize(Decimal("0.000001"), ROUND_HALF_UP)) + 0.0

    def fn(key, pdf_iter, state):
        import logging

        log = logging.getLogger("alibi_detect_spark.ssa_stream")
        (source,) = key
        v = vectors.get(source)
        if v is None:
            # unfitted source: emit nothing, but OBSERVABLY — a new source
            # appearing mid-stream otherwise disappears without a trace
            # (message lands in the executor stderr log)
            n_rows = sum(len(p) for p in pdf_iter)
            log.warning(
                "ssa_stream: source %r has no fitted vectors — dropping %d "
                "row(s); re-fit to include it", source, n_rows,
            )
            return
        if state.exists:
            n, xs_tail, ts_pend, last_ts = state.get
            n = int(n)
            xs = [float(x) for x in xs_tail]
            pend = [int(t) for t in ts_pend]
            last_ts = int(last_ts)
        else:
            n, xs, pend, last_ts = 0, [], [], -1
        chunks = [p for p in pdf_iter if len(p)]
        whole = pd.concat(chunks) if chunks else None
        out_ts, out_sc = [], []
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values("bucket_ts", kind="mergesort")
            n_in = len(pdf)
            pdf = pdf[pdf["bucket_ts"] > last_ts]
            if n_in > len(pdf):
                # late data behind the state high-water mark is dropped by
                # design (exactly-once replay contract) — log it so the drop
                # is observable in the executor logs
                log.warning(
                    "ssa_stream: source %r dropped %d late row(s) at or "
                    "behind bucket_ts=%d", source, n_in - len(pdf), last_ts,
                )
            if not len(pdf):
                continue
            for ts, val in zip(
                pdf["bucket_ts"].to_numpy(dtype=np.int64),
                pdf[value_col].to_numpy(dtype=np.float64),
            ):
                xs.append(float(val))
                pend.append(int(ts))
                n += 1
                q = n - w  # 0-based position finalized by this arrival
                if q >= 0:
                    # xs holds positions n-len(xs)..n-1; keep 2w-1 live
                    off = n - len(xs)

                    def proj(t: int) -> float:
                        acc = xs[t - off] * v[0]
                        for i in range(1, w):
                            acc = acc + xs[t - off + i] * v[i]
                        return acc

                    # mirror the batch fold: i ascending = newest window
                    # first, missing leading windows contribute +0.0
                    num, cnt = None, 0
                    for i in range(w):
                        t = q - i
                        term = proj(t) * v[i] if t >= 0 else 0.0
                        num = term if num is None else num + term
                        cnt += 1 if t >= 0 else 0
                    x_q = xs[q - off]
                    d = x_q - num / cnt
                    out_ts.append(pend[0])
                    out_sc.append(_round6_half_up(d * d))
                    pend = pend[1:]
                if len(xs) > 2 * w - 1:
                    xs = xs[-(2 * w - 1):]
            last_ts = int(pdf["bucket_ts"].iloc[-1])
        state.update((n, xs, pend, last_ts))
        if out_ts:
            yield pd.DataFrame(
                {
                    "source": source,
                    "bucket_ts": np.asarray(out_ts, dtype=np.int64),
                    "ssa4_score": np.asarray(out_sc, dtype=np.float64),
                }
            )

    return rollup.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=SSA_OUT_SCHEMA,
        stateStructType=SSA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
