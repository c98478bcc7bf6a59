"""Structured Streaming surface of the engine.

The reference's online detectors consume one instance per ``predict(x_t)``
call (``alibi_detect/cd/base_online.py:173-209``). The streaming twin of our
batch continuous aggregates:

- :func:`rollup_stream.stream_rollup` — tier-1 tumbling rollup as a
  watermarked streaming aggregation (append mode emits each (source, bucket)
  exactly once, checkpoint gives exactly-once resume);
- :func:`rollup_stream.ewma_stream` — the EWMA threshold recursion
  (``cd/fet_online.py:225-233``) as a custom stateful operator via
  ``applyInPandasWithState`` (per-source carry in the state store).
"""

from .rollup_stream import ewma_stream, stream_rollup  # noqa: F401
