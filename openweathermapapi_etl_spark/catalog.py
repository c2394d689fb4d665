"""Testdata catalog: load the driver's parquet tables and register temp
views so plans can be written in either DataFrame or SQL form
(SURVEY.md §3.3 — the reference's ad-hoc PGAdmin SQL surface maps to
``spark.sql`` over registered views).

Scale note: loads are plain ``spark.read.parquet`` — columnar scans
with predicate pushdown and column pruning handled by Catalyst. At
100 TB each "table" is a directory of many files (ideally
date-partitioned); nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: path -> (num_row_groups, num_rows); parquet footer reads are cheap
#: but there is no reason to repeat them per query.
_PARQUET_META: dict[str, tuple[int, int]] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _parquet_meta(path: str) -> tuple[int, int]:
    if path not in _PARQUET_META:
        try:
            import pyarrow.parquet as pq

            f = pq.ParquetFile(path)
            _PARQUET_META[path] = (f.num_row_groups, f.metadata.num_rows)
        except Exception:
            _PARQUET_META[path] = (0, 0)  # directory input / no pyarrow: skip
    return _PARQUET_META[path]


#: Tables whose downstream pipelines are per-row EXPENSIVE (interpreted
#: higher-order functions over text / 64-dim vector folds). Relational
#: tables are deliberately excluded: their row work is cheap codegen'd
#: expressions and the first join/agg re-shuffles anyway, so an extra
#: exchange only adds cost (measured: +17% on the relational bench).
_HEAVY_ROW_TABLES = {"documents", "embeddings"}


def _parallelize_scan(
    spark: SparkSession, df: DataFrame, path: str, name: str
) -> DataFrame:
    """Round-robin repartition unsplittable scans of heavy-row tables.

    A parquet file is splittable only at row-group boundaries; the
    driver testdata is one row group per file, so every scan is ONE
    task no matter how many cores exist — without this, the whole
    MinHash/SimHash/cosine pipeline runs single-threaded (measured 2×
    on the dedup bench). The repartition shuffles raw input once
    (megabytes here) to buy full scan-side parallelism. At 100 TB real
    tables are many files × many row groups and the guard never fires
    — this is a small-input fixup, not a hand-scheduling policy.
    """
    if name not in _HEAVY_ROW_TABLES:
        return df
    cores = spark.sparkContext.defaultParallelism
    row_groups, rows = _parquet_meta(path)
    if row_groups == 0 or row_groups >= cores or rows < 1000:
        return df
    return df.repartition(min(cores, max(2, rows // 250)))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` is nanosecond-precision in the parquet footer, which
    Spark's reader rejects (TimestampType is microseconds). With
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as raw
    int64 nanos and is floored to a microsecond timestamp here; DuckDB
    oracles must apply ``date_trunc('microseconds', ts)`` to agree
    (the testdata carries non-zero sub-microsecond residue).
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name}")
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            ).select(*[f.name for f in TESTDATA_TABLES["events"].fields])
        elif ts_type == "timestamp_ntz":
            # Microsecond-precision testdata (isAdjustedToUTC=false)
            # infers TIMESTAMP_NTZ under Spark 4; normalize to
            # TimestampType so every downstream plan sees ONE type
            # (NTZ rejects CAST(ts AS DOUBLE), and the streaming
            # replay schema is TimestampType). The session TZ is
            # pinned UTC, so the wall-clock values are unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return _parallelize_scan(spark, df, path, name)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
