"""Tier-table catalog.

In production this engine targets **Apache Iceberg** (hidden partitioning on
``(source bucket, hours(ts))``, snapshot isolation, MERGE INTO for idempotent
resume, partition-drop retention expiry). The sandbox image has no Iceberg
runtime jar, so the catalog speaks the same API over plain parquet
directories; :func:`iceberg_session_conf` returns the exact session config a
cluster deployment would add, and every write here maps 1:1 onto an Iceberg
statement (documented per method).

Physical layout (both backends):

- raw table partition spec: ``days(event_ts), bucket(source, 64)`` — partition
  pruning serves both time-range retention scans and single-source reads.
- tier tables: ``tier`` partition + range distribution on
  ``(source, bucket_ts)`` so each file holds contiguous series runs (page
  decode locality, min/max file skipping on bucket_ts).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def iceberg_session_conf(warehouse: str, catalog: str = "tiers") -> dict[str, str]:
    """SparkSession config for the Iceberg deployment (needs iceberg-spark-runtime jar)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }


class TierCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write_raw(self, df: DataFrame, name: str = "raw") -> None:
        """Iceberg: ``CREATE TABLE ... PARTITIONED BY (days(event_ts), bucket(64, source))``."""
        # local parquet: write as generated (generation partitions are already
        # balanced); rely on file-level min/max stats for pruning
        df.write.mode("overwrite").parquet(self._path(name))

    def write_rollup(self, df: DataFrame, name: str, sorted_within: bool = True) -> None:
        """Iceberg: ``ALTER TABLE ... WRITE ORDERED BY (source, bucket_ts)`` +
        ``REPLACE`` snapshot. Range distribution keeps series runs contiguous."""
        out = df.repartitionByRange("source", "bucket_ts")
        if sorted_within:
            out = out.sortWithinPartitions("source", "bucket_ts")
        out.write.mode("overwrite").parquet(self._path(name))

    def write_pages(self, df: DataFrame, name: str = "pages") -> None:
        """Iceberg: append/merge into the page table partitioned by ``tier``."""
        df.write.mode("overwrite").partitionBy("tier").parquet(self._path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path(name))

    def expire(self, name: str, tier: str) -> None:
        """Retention expiry — Iceberg: ``DELETE WHERE tier=... AND bucket_ts < cutoff``
        → partition drop. Parquet fallback: remove the tier partition dir."""
        p = os.path.join(self._path(name), f"tier={tier}")
        if os.path.exists(p):
            shutil.rmtree(p)

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))


def write_bucketed_index(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Materialize a relation BUCKETED by its join key — the co-located-join
    path for the dedup inverted index (and any other repeatedly self-joined
    relation) at warehouse scale: both sides of an equi-join on
    ``bucket_col`` read pre-shuffled buckets, so the join plan contains NO
    Exchange. Iceberg twin: ``CREATE TABLE ... PARTITIONED BY
    (bucket(n, col))`` + storage-partitioned joins
    (``spark.sql.sources.v2.bucketing.enabled``); the parquet fallback uses
    Spark's native bucketing (requires ``saveAsTable``)."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table)
    )


def compact_tier(
    spark: SparkSession, path: str, sort_cols: tuple[str, ...] = ("source", "bucket_ts"),
    target_files: int = 1,
) -> tuple[int, int]:
    """Small-file compaction for a tier table directory: rewrite the
    partition's data as ``target_files`` sorted files. Iceberg twin:
    ``CALL system.rewrite_data_files(table => ..., strategy => 'sort')`` —
    this parquet fallback does the same rewrite via a staging directory and
    a swap. Returns (files_before, files_after).

    Crash-safety contract (this is two renames, not one atomic op): readers
    must be quiesced during the swap window — unlike Iceberg's snapshot
    commit, a concurrent reader can observe the directory missing between the
    two renames. A stale staging dir from a previously crashed run is
    discarded before writing, and if the second rename fails the original
    directory is restored from the swap location, so a crash never strands
    the table: the data is always at ``path`` or restorable from
    ``path + "__old"`` (which is only removed after the new data is in
    place).

    Streaming rollups and incremental appends accumulate one file per
    micro-batch/task; scan efficiency at 10^12 rows depends on periodically
    rewriting them into few large sorted files (row-group pruning on
    (source, bucket_ts) then works)."""
    import glob

    before = len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    staged = path.rstrip("/") + "__compacting"
    swap = path.rstrip("/") + "__old"
    for stale in (staged, swap):  # leftovers from a previously crashed run
        if os.path.exists(stale):
            shutil.rmtree(stale)
    (
        df.repartition(target_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(staged)
    )
    os.rename(path, swap)
    try:
        os.rename(staged, path)
    except OSError:
        os.rename(swap, path)  # restore the original table, then re-raise
        raise
    shutil.rmtree(swap)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    return before, after
