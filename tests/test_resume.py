"""Kill-and-resume: a job stopped mid-pipeline resumes from lineage and
produces outputs identical to an uninterrupted run, without recomputing the
completed stages (BASELINE.json: "resumable from checkpoint with
per-partition lineage and metrics tables")."""

import numpy as np
import pandas as pd
import pytest

from alibi_detect_spark.pipeline import run_pipeline
from alibi_detect_spark.synth import SynthConfig, synth_dataframe

CFG = SynthConfig(n_rows=30_000, n_sources=4, rows_per_bucket=64)
DETECT = dict(mmd_params=dict(n_ref=32, ert=40.0, window_size=5, n_bootstraps=80))


@pytest.fixture(scope="module")
def raw(spark):
    return synth_dataframe(spark, CFG, with_tokens=False, num_partitions=4).cache()


def _pages_bytes(df):
    pdf = df.toPandas().sort_values(["tier", "source", "page_start_ts"])
    return [bytes(b) for b in pdf["page"]]


def test_resume_after_kill(spark, raw, tmp_path):
    wh_int, wh_clean = str(tmp_path / "interrupted"), str(tmp_path / "clean")

    # uninterrupted reference run
    clean = run_pipeline(spark, raw, wh_clean, page_size=128, detect_kwargs=DETECT)

    # "killed" after tier-1: only rollup_1h exists + its lineage row
    partial = run_pipeline(
        spark, raw, wh_int, page_size=128, detect_kwargs=DETECT,
        job_fingerprint="jobA", stop_after="rollup_1h",
    )
    assert partial["pages"] is None and partial["scores"] is None
    assert not (tmp_path / "interrupted" / "pages").exists()

    # resume with the same fingerprint: completes, skipping tier-1
    resumed = run_pipeline(
        spark, raw, wh_int, page_size=128, detect_kwargs=DETECT,
        job_fingerprint="jobA", resume=True,
    )
    assert resumed["metrics"].get("rollup_1h_skipped") is True
    assert "tier_1h" not in {k: v for k, v in resumed["metrics"].items() if v and k == "tier_1h"}

    # outputs identical to the uninterrupted run
    assert _pages_bytes(resumed["pages"]) == _pages_bytes(clean["pages"])
    key = ["source", "bucket_ts"]
    a = resumed["scores"].toPandas().sort_values(key).reset_index(drop=True)
    b = clean["scores"].toPandas().sort_values(key).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            av, bv = np.nan_to_num(av, nan=-1.0), np.nan_to_num(bv, nan=-1.0)
            assert np.array_equal(av.view(np.uint64), bv.view(np.uint64)), c
        else:
            assert (av == bv).all(), c


def test_resume_ignores_other_fingerprint(spark, raw, tmp_path):
    wh = str(tmp_path / "wh")
    run_pipeline(spark, raw, wh, page_size=128, detect_kwargs=DETECT,
                 job_fingerprint="jobA", stop_after="rollup_1h")
    # a DIFFERENT job config must NOT reuse jobA's tier table
    out = run_pipeline(spark, raw, wh, page_size=64, detect_kwargs=DETECT,
                       job_fingerprint="jobB", resume=True)
    assert out["metrics"].get("rollup_1h_skipped") is None
    assert out["metrics"]["tier_1h"] > 0


def test_retention_expiry(spark, raw, tmp_path):
    """Retention: dropping a tier partition removes exactly that tier's pages
    (Iceberg analog: DELETE WHERE tier=... -> partition drop)."""
    wh = str(tmp_path / "wh_exp")
    out = run_pipeline(spark, raw, wh, page_size=128, detect_kwargs=DETECT)
    tiers_before = {r["tier"] for r in out["pages"].select("tier").distinct().collect()}
    assert {"1h", "6h", "1d"} <= tiers_before
    out["catalog"].expire("pages", "1h")
    remaining = spark.read.parquet(f"{wh}/pages")
    tiers_after = {r["tier"] for r in remaining.select("tier").distinct().collect()}
    assert tiers_after == tiers_before - {"1h"}
