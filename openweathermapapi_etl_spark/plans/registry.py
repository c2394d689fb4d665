"""Query registry: name → Spark callable, name → DuckDB oracle SQL.

Contract (driver, ``/root/repo/__spark_entry__.py`` docstring): each
callable takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle
SQL runs in DuckDB against pre-registered views of the same parquet
tables. Column names must match exactly (the driver sorts columns by
name before hashing). Queries without an oracle get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def canonicalizable_violations(schema) -> list[str]:
    """Columns whose type the correctness driver cannot canonicalize.

    The driver sorts the collected result with pandas ``sort_values``,
    which factorizes object columns — a top-level ``array``/``map``/
    ``struct`` column arrives as numpy arrays / dicts / Rows and throws
    ``unhashable type`` (round-6 red row ``c03_pq_encode``). Query
    surfaces must stringify complex outputs (``array_join`` /
    ``concat_ws`` / ``to_json``); operators keep their typed returns
    for API consumers. Returns ``["col: type", ...]`` — empty == OK.
    """
    from pyspark.sql import types as T

    bad = (T.ArrayType, T.MapType, T.StructType, T.VariantType)
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, bad)
    ]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
