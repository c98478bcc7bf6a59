"""Tier-page encoding: per-(source, tier) Gorilla pages via ``applyInPandas``.

Each source's gap-filled rollup series is sorted, split into fixed-size pages
(page boundary = every ``page_size`` points from the series start — the split
is part of the spec so the oracle chunks identically), and each page is
encoded with the shared NumPy codec → byte-equal to the oracle's pages.

Scale posture: the group key is ``source``; a decade of hourly points is
~90k rows per source, so a group is always small even at 10^12 raw rows —
rollup happens BEFORE this stage. The hot-source skew problem therefore does
not reappear here (group size is bounded by time range, not row count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codec
from ..schemas import PAGE_SCHEMA

VALUE_COLUMNS = ("n_docs", "sum_n_tok", "min_n_tok", "max_n_tok", "mean_n_tok")
DEFAULT_PAGE_SIZE = 1024


def encode_source_series(
    pdf: pd.DataFrame, tier: str, page_size: int = DEFAULT_PAGE_SIZE
) -> pd.DataFrame:
    """Shared kernel: sort one source's rollup rows, emit encoded pages.

    Runs identically inside ``applyInPandas`` and in the oracle loop.
    """
    pdf = pdf.sort_values("bucket_ts", kind="mergesort")
    ts = pdf["bucket_ts"].to_numpy(dtype=np.int64)
    cols = {c: pdf[c].to_numpy(dtype=np.float64) for c in VALUE_COLUMNS}
    source = pdf["source"].iloc[0]
    out = []
    for start in range(0, len(ts), page_size):
        sl = slice(start, start + page_size)
        ts_page = ts[sl]
        page = codec.encode_page(ts_page, {c: v[sl] for c, v in cols.items()})
        out.append((source, tier, int(ts_page[0]), int(len(ts_page)), page))
    return pd.DataFrame(
        out, columns=["source", "tier", "page_start_ts", "n_points", "page"]
    )


def encode_pages(
    rollup: DataFrame, tier: str, page_size: int = DEFAULT_PAGE_SIZE
) -> DataFrame:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return encode_source_series(pdf, tier=tier, page_size=page_size)

    return rollup.groupBy("source").applyInPandas(fn, schema=PAGE_SCHEMA)


def decode_pages(pages: DataFrame) -> DataFrame:
    """Decode pages back to rollup rows (verification / tier-read path)."""
    import pyspark.sql.functions as F  # noqa: F401

    schema = (
        "source string, tier string, bucket_ts long, n_docs double, sum_n_tok double,"
        " min_n_tok double, max_n_tok double, mean_n_tok double"
    )

    def fn(batches):
        for pdf in batches:
            frames = []
            for src, tier_, blob in zip(pdf["source"], pdf["tier"], pdf["page"]):
                ts, cols = codec.decode_page(bytes(blob))
                frame = pd.DataFrame({"bucket_ts": ts})
                for c in VALUE_COLUMNS:
                    frame[c] = cols[c]
                frame.insert(0, "tier", tier_)
                frame.insert(0, "source", src)
                frames.append(frame)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return pages.mapInPandas(fn, schema=schema)
