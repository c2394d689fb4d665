"""Shared helpers for oracle-parity query authoring.

Float-determinism policy (SURVEY.md §7 "oracle parity traps"):
double-precision SUM/AVG results depend on accumulation order, which
differs between Spark partitions and DuckDB. Every aggregated double
therefore goes through exact DECIMAL(38,6) arithmetic — addition of
decimals is associative/commutative, so partial aggregation order is
irrelevant and both engines produce bit-identical values — and is cast
back to DOUBLE for the output schema. Row-level double arithmetic
(+,-,*,/) is IEEE-754 and already bit-identical, so it needs no
treatment. This costs one cast per row on the Spark side and keeps the
whole aggregation inside whole-stage codegen (decimal sum is
JVM-native, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..session import prep

#: Decimal type used for order-independent exact aggregation.
DEC = "decimal(38,6)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with parity confs pinned."""
    prep(spark)
    return load_table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata temp views (for spark.sql-form queries)."""
    prep(spark)
    register_views(spark, sf_dir)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression → DOUBLE.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count → one double op.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def o_dsum(expr: str) -> str:
    """Oracle-side spelling of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    """Oracle-side spelling of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
