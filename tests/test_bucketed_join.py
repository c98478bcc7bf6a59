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
