"""Readers/writers: B1 parquet scan, B2 schema'd JSON scan, B3 CSV scan,
B4 parquet sink (append/overwrite), B5 JDBC (optional).

Scale notes
-----------
- Parquet reads honor ``spark.sql.files.maxPartitionBytes`` for split
  sizing; filters/projections push into the scan (verify via
  ``.explain``: ``PushedFilters`` / ``ReadSchema``).
- Writes support ``partition_by`` so big fact tables lay out as
  hive-partitioned directories → partition pruning on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """B1 — columnar scan with pushdown/pruning (Catalyst-native)."""
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """B2 — JSONL scan with an explicit schema.

    Mirrors the reference's ``response.json()`` decode
    (/root/reference/dags/weather-etl.py:122) but schema-first: fields
    missing from a document surface as NULL instead of KeyError.
    """
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """B3 — CSV scan, explicit schema (inference is banned in prod paths)."""
    return spark.read.schema(schema).csv(path, header=header, sep=sep)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """B4 — parquet sink, append or overwrite, optionally hive-partitioned."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    """B5 — JDBC sink (the reference's literal Postgres sink,
    /root/reference/dags/weather-etl.py:112-114,134-140 — but batched
    and parallel instead of row-at-a-time INSERTs).

    Verified against the Derby embedded driver Spark bundles for its
    metastore (b05_jdbc_roundtrip); point ``url``/``options`` at
    Postgres + its driver jar for the reference's literal sink.
    """
    try:
        df.write.mode(mode).options(**options).jdbc(url=url, table=table)
    except Exception as exc:
        raise RuntimeError(
            "JDBC sink failed — is the driver jar on the classpath? "
            "(pass spark.jars / options['driver'])"
        ) from exc


def read_jdbc(
    spark: SparkSession, url: str, table: str, **options: str
) -> DataFrame:
    """B5 — JDBC source. ``table`` may be a table name or a
    ``(SELECT ...) alias`` pushdown subquery; add ``partitionColumn``/
    ``lowerBound``/``upperBound``/``numPartitions`` options for a
    parallel read — without them JDBC reads are ONE task, the classic
    JDBC-at-scale trap."""
    return spark.read.options(**options).jdbc(url=url, table=table)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """B4b — ORC sink: the other columnar format Spark ships natively
    (vectorized reader, predicate pushdown, same split machinery as
    parquet). Interop surface for Hive-era lakes."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """B4b — ORC scan (pushdown/pruning Catalyst-native, like B1)."""
    return spark.read.orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """B2b — line-delimited text sink (single string column; the raw
    corpus interchange format). One line per row — rows containing
    newlines must be escaped upstream."""
    df.write.mode(mode).text(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """B2b — text scan: one row per line, single ``value`` column.
    Splittable by line like any text source; schema-free by nature."""
    return spark.read.text(path)
