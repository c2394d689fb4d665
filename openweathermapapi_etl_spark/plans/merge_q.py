"""M1 — keyed upsert correctness queries (SURVEY.md §2.1 A11, §4.3).

Demonstrated on the ``orders`` table so the full merge semantics are
DuckDB-hash-checkable: base ∪ updates with intra-batch conflicts,
last-write-wins dedup, anti-join survivors — and storage-layer
idempotence (a re-applied batch is a no-op).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import VersionedParquetTable, keyed_upsert
from .registry import register
from .util import t

ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

# Oracle spelling of keyed_upsert's plan: LWW dedup by the non-key
# column tuple (descending, nulls last — mirrors
# operators/merge.py::dedup_last_write_wins), then anti-join survivors.
M1_ORACLE = """
WITH base AS (
  SELECT * FROM orders WHERE o_orderkey % 10 < 8),
updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 100000 AS o_totalprice, o_orderdate,
         'UPSERTED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 10 >= 7
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 200000, o_orderdate, 'UPSERTED-B'
  FROM orders WHERE o_orderkey % 10 >= 7),
dedup AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM (SELECT u.*,
               ROW_NUMBER() OVER (
                 PARTITION BY o_orderkey
                 ORDER BY o_custkey DESC NULLS LAST,
                          o_orderstatus DESC NULLS LAST,
                          o_totalprice DESC NULLS LAST,
                          o_orderdate DESC NULLS LAST,
                          o_orderpriority DESC NULLS LAST) AS rn
        FROM updates u) ranked
  WHERE rn = 1),
merged AS (
  SELECT * FROM dedup
  UNION ALL
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM dedup d WHERE d.o_orderkey = b.o_orderkey))
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority
FROM merged
"""


def _base_and_updates(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 < 8)
    upd_keys = orders.filter(F.col("o_orderkey") % 10 >= 7)
    upd_a = upd_keys.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 100000).alias("o_totalprice"),
        "o_orderdate",
        F.lit("UPSERTED").alias("o_orderpriority"),
    )
    upd_b = upd_keys.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 200000).alias("o_totalprice"),
        "o_orderdate",
        F.lit("UPSERTED-B").alias("o_orderpriority"),
    )
    return base, upd_a.unionByName(upd_b)


def _present(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
        "o_orderpriority",
    )


@register("m1_keyed_upsert", oracle=M1_ORACLE)
def m1_keyed_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 operator: merge a conflicting update batch into a base table
    (reference ON CONFLICT semantics, /root/reference/dags/weather-etl.py:152-163,
    strengthened to intra-batch last-write-wins per SURVEY.md §2.1)."""
    base, updates = _base_and_updates(spark, sf_dir)
    return _present(keyed_upsert(base, updates, keys=["o_orderkey"]))


@register("m1_versioned_upsert_idempotent", oracle=M1_ORACLE)
def m1_versioned_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 storage layer: VersionedParquetTable upsert, applied TWICE with
    the same batch — the oracle describes a single application, so the
    hash match *proves* idempotence (A11 fine point) plus atomic
    version-swap reads."""
    base, updates = _base_and_updates(spark, sf_dir)
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_m1_table_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.upsert(spark, base, keys=["o_orderkey"])
    table.upsert(spark, updates, keys=["o_orderkey"])
    table.upsert(spark, updates, keys=["o_orderkey"])  # idempotent re-run
    return _present(table.read(spark))


@register("m1_partitioned_upsert", oracle=M1_ORACLE)
def m1_partitioned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 storage layer, partition-pruned flavor: the table is hive-
    partitioned on o_orderstatus; the upsert merges and rewrites ONLY
    touched partitions and hard-links the rest from the previous
    version (operators/merge.py). The oracle is the same plain MERGE —
    identical results prove pruning loses nothing. This is the shape
    that keeps M1 O(touched partitions) on a 100 TB date-partitioned
    fact table."""
    base, updates = _base_and_updates(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m1p_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, partition_by="o_orderstatus")
    table.upsert(spark, base, keys=["o_orderkey"])
    table.upsert(spark, updates, keys=["o_orderkey"])
    return _present(table.read(spark))
