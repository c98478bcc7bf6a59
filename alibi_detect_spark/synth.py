"""Deterministic synthetic token table (FIXTURES.md F1, input_hint schema).

Every column is a pure function of the global row index ``i`` and the seed —
computed with a splitmix64-style stateless mixer, NOT a sequential RNG — so the
table is identical whether generated on the driver (oracle), by 8 Spark tasks,
or by 512: partitioning cannot perturb the data. This is the 10^12-sequence
posture: generation is embarrassingly parallel via ``spark.range(N)`` +
``mapInPandas`` (Arrow batches, no per-row Python).

Shape knobs (defaults per FIXTURES.md):
- ``n_tok`` in [16, 2048] deterministic per row;
- ``source`` skewed: ~30% of rows land on the hot key ``src-0000``;
- ``event_ts`` advances one time-slot every ``n_sources`` rows with
  ``rows_per_bucket`` slots per hourly bucket, and every bucket whose index is
  ≡ 13 (mod 37) is skipped entirely → real gaps for gap-fill to repair.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import TOKEN_VOCAB_SIZE

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_U64 = np.uint64


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — stateless, vectorized uint64 → uint64."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _GOLDEN
        x ^= x >> _U64(30)
        x *= _MIX1
        x ^= x >> _U64(27)
        x *= _MIX2
        x ^= x >> _U64(31)
    return x


# hourly buckets with residue 13 (mod 37) are dropped → 36 live buckets per 37
_LIVE_RESIDUES = np.array([r for r in range(37) if r != 13], dtype=np.int64)


def _fixed_width_ids(prefix: str, nums: np.ndarray, width: int) -> np.ndarray:
    """``prefix + zero-padded-decimal`` ids, fully vectorized (a digit matrix
    viewed as fixed-width bytes — ~20x faster than np.char.zfill/add, byte-
    identical output)."""
    pre = np.frombuffer(prefix.encode("ascii"), dtype=np.uint8)
    n = nums.shape[0]
    total = len(pre) + width
    buf = np.empty((n, total), dtype=np.uint8)
    buf[:, : len(pre)] = pre
    x = nums.astype(np.int64, copy=True)
    for j in range(width - 1, -1, -1):
        buf[:, len(pre) + j] = 48 + (x % 10).astype(np.uint8)
        x //= 10
    return buf.reshape(-1).view(f"S{total}").astype(f"U{total}")


@dataclass(frozen=True)
class SynthConfig:
    n_rows: int
    n_sources: int = 8
    seed: int = 42
    rows_per_bucket: int = 512  # time slots per hourly bucket
    hot_share_pct: int = 30  # % of rows on src-0000
    epoch0: int = 1_699_999_200  # 2023-11-14T22:00:00Z — hour-aligned so the
    # skipped synthetic buckets land exactly on rollup buckets (real gaps)
    bucket_seconds: int = 3600
    max_tokens: int = 2048  # cap so array payloads stay bounded


def synth_batch(indices: np.ndarray, cfg: SynthConfig, with_tokens: bool = True) -> pd.DataFrame:
    """Materialize rows for the given global indices (any order/subset)."""
    i = indices.astype(np.int64)
    h1 = mix64(i.view(np.uint64) ^ _U64(cfg.seed))
    h2 = mix64(h1)

    n_tok = (16 + (h1 % _U64(cfg.max_tokens - 15)).astype(np.int64)).astype(np.int32)

    hot = (h2 % _U64(100)).astype(np.int64) < cfg.hot_share_pct
    src_idx = np.where(
        hot, 0, 1 + (mix64(h2) % _U64(max(cfg.n_sources - 1, 1))).astype(np.int64)
    )

    slot = i // cfg.n_sources
    bucket = slot // cfg.rows_per_bucket
    # skip gap buckets: map bucket b to the b-th live bucket index
    live_bucket = 37 * (bucket // 36) + _LIVE_RESIDUES[bucket % 36]
    within = slot % cfg.rows_per_bucket
    sub_step = cfg.bucket_seconds // cfg.rows_per_bucket or 1
    ts = cfg.epoch0 + live_bucket * cfg.bucket_seconds + within * sub_step

    df = pd.DataFrame(
        {
            "doc_id": _fixed_width_ids("doc-", i, 12),
            "n_tok": n_tok,
            "source": _fixed_width_ids("src-", src_idx, 4),
            "event_ts": pd.to_datetime(ts, unit="s"),
        }
    )
    if with_tokens:
        # token j of row i = mix64(mix64(seed^i) ^ j) % vocab — deterministic,
        # vectorized over the flattened (row, j) index space
        reps = n_tok.astype(np.int64)
        row_h = np.repeat(h1, reps)
        j = np.concatenate([np.arange(k, dtype=np.uint64) for k in reps]) if len(reps) else np.array([], dtype=np.uint64)
        flat = (mix64(row_h ^ j) % _U64(TOKEN_VOCAB_SIZE)).astype(np.int32)
        offsets = np.zeros(len(reps) + 1, dtype=np.int64)
        np.cumsum(reps, out=offsets[1:])
        df["tokens"] = [flat[offsets[k] : offsets[k + 1]] for k in range(len(reps))]
        df = df[["doc_id", "tokens", "n_tok", "source", "event_ts"]]
    else:
        df = df[["doc_id", "n_tok", "source", "event_ts"]]
    return df


def synth_pandas(cfg: SynthConfig, with_tokens: bool = True) -> pd.DataFrame:
    """Single-node (oracle) materialization of the full table."""
    return synth_batch(np.arange(cfg.n_rows, dtype=np.int64), cfg, with_tokens=with_tokens)


def synth_dataframe(spark, cfg: SynthConfig, with_tokens: bool = True, num_partitions: int | None = None):
    """Distributed materialization: ``spark.range`` → ``mapInPandas``."""
    from .schemas import TOKEN_TABLE_SCHEMA

    schema = TOKEN_TABLE_SCHEMA if with_tokens else "doc_id string, n_tok int, source string, event_ts timestamp"

    def gen(batches):
        for pdf in batches:
            yield synth_batch(pdf["id"].to_numpy(), cfg, with_tokens=with_tokens)

    rng = spark.range(0, cfg.n_rows, numPartitions=num_partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=schema)
