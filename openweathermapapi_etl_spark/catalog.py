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


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


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
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select(*[f.name for f in TESTDATA_TABLES["events"].fields])
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
