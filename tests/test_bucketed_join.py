"""Co-located joins via bucketing: the materialized dedup inverted index,
written bucketed by the shingle key, self-joins WITHOUT any shuffle — the
physical pattern that makes repeated candidate generation shuffle-free at
warehouse scale."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from alibi_detect_spark.operators import dedup
from alibi_detect_spark.sources.catalog import write_bucketed_index


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_index_self_join_has_no_shuffle(spark, tmp_path):
    rows = [
        (i, f"word{i % 7} common text body with shared tokens number {i % 11} tail {i}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.exploded_shingles(docs).select("doc_id", "h60")
    spark.sql("DROP TABLE IF EXISTS shingle_idx")
    write_bucketed_index(sh, "shingle_idx", str(tmp_path / "idx"), "h60", n_buckets=8)

    idx = spark.table("shingle_idx")
    a = idx.select(F.col("doc_id").alias("doc_a"), "h60")
    b = idx.select(F.col("doc_id").alias("doc_b"), "h60")
    joined = a.join(b, "h60").where(F.col("doc_a") < F.col("doc_b"))
    # the toy table auto-broadcasts, which would hide the property being
    # demonstrated; at warehouse scale the index is far beyond the broadcast
    # threshold, so disable it to see the real plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(joined)
        # both sides read pre-bucketed files: equi-join with ZERO shuffles
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS shingle_idx")


def test_compact_tier_rewrites_small_files(spark, tmp_path):
    """Compaction collapses per-batch small files into one sorted file with
    identical data — the parquet twin of Iceberg rewrite_data_files."""
    import numpy as np

    from alibi_detect_spark.sources.catalog import compact_tier

    path = str(tmp_path / "tier")
    rng = np.random.default_rng(5)
    rows = [("s%d" % (i % 3), int(1704067200 + i * 3600), float(rng.integers(1, 50))) for i in range(300)]
    df = spark.createDataFrame(rows, "source string, bucket_ts long, v double")
    # simulate many tiny per-batch appends
    for lo in range(0, 300, 50):
        sub = spark.createDataFrame(rows[lo : lo + 50], "source string, bucket_ts long, v double")
        sub.repartition(4).write.mode("append").parquet(path)
    before_pdf = spark.read.parquet(path).toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    nb, na = compact_tier(spark, path, target_files=1)
    assert nb > 5 and na == 1, (nb, na)
    after_pdf = spark.read.parquet(path).toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    assert before_pdf.equals(after_pdf)
