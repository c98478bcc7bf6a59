"""Per-partition lineage + checkpoint state + metrics tables.

The reference checkpoints online-detector state to ``.npz`` via
``StateMixin.save_state/load_state`` (``alibi_detect/utils/state/state.py:14-61``)
keyed by ``online_state_keys``. The engine's analog is a *lineage table*: one
row per (job, stage, partition key) recording the input fingerprint, row
counts, and a small binary state blob (EWMA carry, MMD FIFO window, encode
cursor). Resume = read latest blobs, filter already-fingerprinted inputs,
process the remainder — idempotent because writes are keyed MERGEs
(emulated here by latest-timestamp-wins over an append-only parquet log;
Iceberg deployment uses a real ``MERGE INTO``).
"""

from __future__ import annotations

import io
import json
import os
import time
import uuid

import numpy as np
import pandas as pd


def pack_state(state: dict) -> bytes:
    """Serialize a {str: scalar|ndarray} state dict (npz, no pickle)."""
    arrays = {}
    scalars = {}
    for k, v in state.items():
        if isinstance(v, np.ndarray):
            arrays[k] = v
        elif v is not None:
            scalars[k] = v
    buf = io.BytesIO()
    np.savez(buf, __scalars__=np.frombuffer(json.dumps(scalars).encode(), dtype=np.uint8), **arrays)
    return buf.getvalue()


def unpack_state(blob: bytes) -> dict:
    with np.load(io.BytesIO(blob)) as z:
        out: dict = {k: z[k] for k in z.files if k != "__scalars__"}
        out.update(json.loads(z["__scalars__"].tobytes().decode()))
    return out


class LineageLog:
    """Append-only lineage/metrics log with latest-wins reads (MERGE emulation)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record(
        self,
        stage: str,
        partition_key: str,
        input_fingerprint: str,
        rows_out: int,
        state: dict | None = None,
        metrics: dict | None = None,
    ) -> None:
        row = pd.DataFrame(
            [
                {
                    "stage": stage,
                    "partition_key": partition_key,
                    "input_fingerprint": input_fingerprint,
                    "rows_out": rows_out,
                    "state": pack_state(state) if state else None,
                    "metrics": json.dumps(metrics or {}),
                    "updated_at": time.time_ns(),
                }
            ]
        )
        row.to_parquet(os.path.join(self.root, f"{uuid.uuid4().hex}.parquet"))

    def _load(self) -> pd.DataFrame | None:
        files = [f for f in os.listdir(self.root) if f.endswith(".parquet")]
        if not files:
            return None
        df = pd.concat(
            [pd.read_parquet(os.path.join(self.root, f)) for f in files],
            ignore_index=True,
        )
        df = df.sort_values("updated_at").groupby(["stage", "partition_key"], as_index=False).last()
        return df

    def latest(self, stage: str) -> pd.DataFrame:
        df = self._load()
        if df is None:
            return pd.DataFrame(
                columns=["stage", "partition_key", "input_fingerprint", "rows_out", "state", "metrics", "updated_at"]
            )
        return df[df["stage"] == stage].reset_index(drop=True)

    def state_for(self, stage: str, partition_key: str) -> dict | None:
        df = self.latest(stage)
        hit = df[df["partition_key"] == partition_key]
        if hit.empty or hit["state"].iloc[0] is None:
            return None
        return unpack_state(hit["state"].iloc[0])

    def done_fingerprints(self, stage: str) -> set[str]:
        return set(self.latest(stage)["input_fingerprint"])
