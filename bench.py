"""Benchmark harness — one JSON line for the driver.

Two parts:
1. **Headline** (BASELINE.json metric): rolled-up points/sec through the full
   tier pipeline (tier-1 rollup → gap-fill → 6h/1d downsample → Gorilla-page
   encode → parquet tier tables) over the deterministic synthetic token table.
2. **Query suite**: wall seconds per entry for the representative operator
   queries from ``__spark_entry__`` at ``$SPARK_GRAFT_SF_DIR``.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all cores), SPARK_GRAFT_BENCH_ROWS (default 2M).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "rollup_1h_events",
    "rollup_1d_cascade",
    "gapfill_1h_events",
    "token_rollup_1h",
    "token_rollup_source",
    "token_rollup_1h_salted",
    "token_invariant",
    "ref_update_last_n",
    "ewma_hourly_counts",
    "pages_roundtrip",
    "ks_drift",
    "ks_drift_emb",
    "cvm_drift",
    "chi2_drift",
    "lang_drift",
    "mmd_drift",
    "mmd_drift_vec",
    "mmd_perm_vec",
    "mmd_perm_test",
    "lsdd_perm_test",
    "lsdd_perm_hash",
    "learned_kernel_drift",
    "spot_the_diff",
    "preproc_drift",
    "fet_drift",
    "tabular_drift",
    "uncertainty_drift",
    "uncertainty_margin_drift",
    "regressor_uncertainty_drift",
    "classifier_drift",
    "classifier_drift_lr",
    "classifier_drift_logit",
    "context_mmd_drift",
    "context_mmd_hash",
    "drift_fdr",
    "mahalanobis_topk",
    "knn_outlier",
    "knn_outlier_predict",
    "knn_ensemble",
    "pca_outlier",
    "gmm_outlier",
    "gmm_outlier_2c",
    "gmm_outlier_4d",
    "pca_outlier_2d",
    "pca_outlier_4d",
    "pca_outlier_emb",
    "pca_outlier_sub",
    "ae_outlier_emb",
    "gmm_outlier_emb",
    "ocsvm_emb",
    "iforest_emb",
    "mahalanobis_emb",
    "lof_outlier",
    "kpca_outlier",
    "iforest_outlier",
    "svm_outlier",
    "llr_outlier",
    "vae_outlier_2d",
    "ae_outlier_2d",
    "kpca_outlier_2c",
    "kpca_outlier_4c",
    "ocsvm_mean",
    "iforest_hash",
    "spot_the_diff_2d",
    "ssa_outlier_hash",
    "adversarial_ae",
    "model_distillation",
    "aegmm_outlier",
    "vaegmm_outlier",
    "sr_saliency",
    "mmd_online",
    "lsdd_online_hash",
    "mahalanobis_online_hash",
    "fet_online",
    "cvm_online",
    "lsdd_online",
    "mahalanobis_online",
    "seasonal_bands",
    "trend_bands",
    "ssa_outlier",
    "online_decisions",
    "cvm_decisions",
    "mmd_decisions",
    "fet_decisions",
    "fet_decisions_data",
    "lsdd_decisions",
    "mahalanobis_cat",
    "mahalanobis_mvdm",
    "mahalanobis_abdm_mvdm",
    "ssa_outlier_w4",
    "dedup_exact_prefix",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "contamination_check",
    "weighted_sample",
    "media_features",
    "props_json_stats",
    "ae_outlier",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_build",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    "lm_unigram_score",
    "doc_repetition",
    "quantile_thresholds",
    "reservoir_sample",
    "tpch_q1",
]


def materialize(df) -> int:
    """Force full execution of every output column (noop sink, no driver
    collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", 2_000_000))

    import __spark_entry__ as E
    from alibi_detect_spark.pipeline import run_synthetic
    from alibi_detect_spark.session import get_spark

    # no console progress bars: their \r-spam on stderr pushed the result
    # line out of the driver's tail capture in round 3 (BENCH_r03 parsed=null)
    spark = get_spark(
        "adspark-bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    # warm the JVM + python-worker pool so the headline measures steady-state
    # throughput, not process spawn
    spark.range(0, 1_000_000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # --- headline: tier pipeline points/sec over the synthetic token table ---
    wh = tempfile.mkdtemp(prefix="adspark_bench_wh_")
    try:
        t0 = time.monotonic()
        out = run_synthetic(spark, n_rows, wh, n_sources=32, rows_per_bucket=512)
        points = sum(out["tiers"][t].count() for t in out["tiers"])
        n_pages = out["pages"].count()
        pipeline_sec = time.monotonic() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    # --- operator query suite at the requested scale factor ---
    qs = E.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()) + pipeline_sec, 3)
    pipeline_block = {
        "rows_in": n_rows,
        "rollup_points": points,
        "pages": n_pages,
        "sec": round(pipeline_sec, 3),
        "points_per_sec": round(points / pipeline_sec, 1),
        "raw_rows_per_sec": round(n_rows / pipeline_sec, 1),
    }
    full = json.dumps(
        {
            "metric": "tier rollup+gapfill+downsample+Gorilla-encode pipeline"
            " + operator query suite (see queries)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "pipeline": dict(
                pipeline_block,
                stage_seconds={k: round(v, 3) for k, v in out["metrics"].items()},
            ),
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()),
        }
    )
    # durable full record first (survives any stdout-capture truncation) ...
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"), "w") as fh:
        fh.write(full + "\n")
    # ... then a COMPACT (<1 KB) line on stdout: the full 95-query map
    # overflowed the driver's tail capture in rounds 2-4 (BENCH parsed=null),
    # so stdout carries the headline + the 10 slowest queries only.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    line = json.dumps(
        {
            "metric": "tier pipeline + operator suite"
            " (10 slowest shown; full map in bench_result.json)",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "queries_run": len(timings),
            "queries_sec": round(sum(timings.values()), 3),
            "sf": sf,
            "pipeline": pipeline_block,
        }
    )
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
