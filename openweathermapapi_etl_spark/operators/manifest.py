"""File-level min/max manifest + data-skipping scan — Iceberg-style.

Hive partition pruning (B4c) skips DIRECTORIES by the partition
column; Z-ordering (B4d) clusters values so file ranges are tight.
This module closes the loop with the READ side: a manifest of
per-file column ranges lets a scan open only the files whose
``[min, max]`` interval intersects the predicate — the mechanism
behind Iceberg/Delta data skipping (Iceberg spec §"Manifests",
public), and the single biggest scan reducer at 100 TB for
predicates on a clustered NON-partition column.

At cluster scale the manifest comes from parquet footer stats
captured at COMMIT time (the writer already has them — no re-read).
This container's builder derives the same manifest with one
column-pruned pass over the written files (reads only the stat
column, not the payload); the resulting table is identical, one row
per file, and everything downstream — pruning, the pruned scan — is
exactly the production shape:

1. ``file_stats``: group by ``input_file_name()`` → min/max/count of
   the stat column. Metadata-sized output (one row per FILE).
2. ``prune``: filter the manifest by interval intersection
   ``max >= lo AND min <= hi`` — runs on the manifest, never the
   data. The survivor list is control-plane-sized (bounded by file
   count, not row count) and is the ONLY thing collected.
3. pruned read: ``spark.read.parquet(*survivors)`` + the row-level
   predicate (file skipping is an optimization, never a filter — the
   residual predicate always reapplies, so a stale or over-wide
   manifest can cost time but never correctness).

Reference basis: the reference's Postgres sink relies on a B-tree
index for date-range reads (dags/weather-etl.py:134-143 loads into a
plain table); min/max file skipping is the lake-native equivalent its
queries would need the day the table outgrows one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stats(spark: SparkSession, path: str, stat_col: str) -> DataFrame:
    """Manifest: (file, min, max, n_rows) — one row per data file.

    Column-pruned scan of ``stat_col`` only; at commit-time-stats
    scale this DataFrame is read straight from the table format's
    manifest files instead (same schema, same consumers).
    """
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(stat_col).alias("min_v"),
            F.max(stat_col).alias("max_v"),
            F.count("*").alias("n_rows"),
        )
    )


def pruned_files(manifest: DataFrame, lo, hi) -> list[str]:
    """Files whose [min_v, max_v] intersects [lo, hi] — the scan set.

    The collect is control-plane: one string per SURVIVING FILE
    (bounded by file count; a 100 TB table has 10^5-10^6 manifest
    rows and the survivor set of a selective predicate is far
    smaller — this is the same list every table-format reader hands
    its scan planner).
    """
    rows = (
        manifest.filter((F.col("max_v") >= lo) & (F.col("min_v") <= hi))
        .select("file")
        .collect()
    )
    return [r.file for r in rows]


def skipping_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    stat_col: str,
    lo,
    hi,
) -> DataFrame:
    """Range scan that opens only manifest-surviving files.

    The residual predicate is ALWAYS reapplied row-level (skipping
    is an optimization, not a filter), so correctness never depends
    on manifest tightness.
    """
    files = pruned_files(manifest, lo, hi)
    if not files:  # nothing can match; keep the schema
        return spark.read.parquet(path).filter(F.lit(False))
    return (
        spark.read.parquet(*files)
        .filter((F.col(stat_col) >= lo) & (F.col(stat_col) <= hi))
    )
