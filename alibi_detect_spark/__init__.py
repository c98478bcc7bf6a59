"""alibi_detect_spark — a PySpark-native time-series rollup + downsample + retention engine.

Recasts SeldonIO/alibi-detect's online detectors (Spectral Residual saliency,
online MMD / KS / CVM drift windows, EWMA-smoothed thresholds — see SURVEY.md §2)
as continuous aggregates over an Iceberg-style table of pre-tokenized training
sequences ``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Architecture (Spark-first, NOT a port):

- **Rollups** are plain ``groupBy(source, window)`` aggregations — whole-stage
  codegen, partial+final hash agg, AQE. Integer aggregates (count / sum / min /
  max over ``n_tok``) are order-independent, so the distributed result is
  *bit-identical* to the single-node NumPy oracle by construction.
- **Gap-fill** is ``sequence() + explode`` + a left join per source.
- **Codec** (delta-of-delta timestamps + Gorilla-XOR values, Facebook Gorilla
  VLDB'15) is pure NumPy in :mod:`alibi_detect_spark.functions.codec` — the
  *same module* runs under pytest as the oracle and inside ``applyInPandas``,
  so encoded tier pages are byte-equal between the cluster and the oracle.
- **Detectors** (:mod:`alibi_detect_spark.functions.sr`, ``.mmd``, ``.ks``,
  ``.ewma``) are pure-NumPy kernels applied per-source over the ordered rollup
  series inside grouped Arrow UDFs; all randomized configuration (bootstrap
  thresholds) happens once, seeded, on the driver and is broadcast.

No per-row Python anywhere: only built-in columnar expressions and
pandas/Arrow-batched UDFs.
"""

__version__ = "0.1.0"

TOKEN_VOCAB_SIZE = 50_257  # GPT-2-style vocab; synthetic token ids live in [0, vocab)
