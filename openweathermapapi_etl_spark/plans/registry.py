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

#: Queries DELIBERATELY registered without a DuckDB oracle, with the
#: reason (arrival-order dependence, hash-implementation dependence,
#: ...). The driver renders a no-oracle query as an ``err`` row, which
#: reads red even when the rows-only check is green — this marker is
#: passed through ``__spark_entry__.rows_only_by_design()`` so a green
#: round's record is self-explaining (r11 verdict Next #5). A query
#: lacking BOTH an oracle and an entry here fails the registry test:
#: oracle-lessness must always be a documented decision.
ROWS_ONLY_BY_DESIGN: dict[str, str] = {}


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


def register(
    name: str,
    oracle: str | None = None,
    rows_only_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its oracle.

    A query with NO oracle must state ``rows_only_reason`` — the
    one-line justification recorded in :data:`ROWS_ONLY_BY_DESIGN` and
    surfaced to the driver via ``rows_only_by_design()``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is None and rows_only_reason is None:
            raise ValueError(
                f"query {name!r} has no oracle and no rows_only_reason "
                f"— oracle-lessness must be a documented decision"
            )
        if oracle is not None and rows_only_reason is not None:
            raise ValueError(
                f"query {name!r} has BOTH an oracle and a "
                f"rows_only_reason — pick one"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY_BY_DESIGN[name] = rows_only_reason
        return fn

    return deco
