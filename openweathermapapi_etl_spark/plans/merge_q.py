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
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.manifest import file_stats, skipping_read
from ..operators.merge import MultiTableTxn, VersionedParquetTable, keyed_upsert
from ..operators.reconcile import reconcile
from .registry import register
from .util import dsum, o_dsum, t

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


# ---------------------------------------------------------------------------
# M2 — SCD Type 2 history merge
# ---------------------------------------------------------------------------

# The scenario on `customer`: an existing history (every customer open
# since 1994, plus a pre-closed older version for custkey%5==0), then
# one snapshot: custkey%3==0 re-delivered (acctbal changed only when
# custkey%6==0) and custkey%10==0 re-registered under a shifted key
# (brand-new members). Exercises all four per-key outcomes: close+new,
# no-op, new-key insert, untouched passthrough.
M2_ORACLE = """
WITH cust AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
cur0 AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         DATE '1994-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM cust),
pre AS (
  SELECT c_custkey, c_acctbal - 50 AS c_acctbal, c_mktsegment,
         DATE '1993-01-01', DATE '1994-01-01', FALSE
  FROM cust WHERE c_custkey % 5 = 0),
history AS (SELECT * FROM cur0 UNION ALL SELECT * FROM pre),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 100
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment, DATE '1995-06-01' AS eff
  FROM cust WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 100000, c_acctbal, c_mktsegment, DATE '1995-06-01'
  FROM cust WHERE c_custkey % 10 = 0),
cur AS (SELECT * FROM history WHERE is_current),
hist AS (SELECT * FROM history WHERE NOT is_current),
j AS (
  SELECT c.c_custkey AS ck, c.c_acctbal AS ca, c.c_mktsegment AS cm,
         c.valid_from AS cvf, c.valid_to AS cvt,
         u.c_custkey AS uk, u.c_acctbal AS ua, u.c_mktsegment AS um, u.eff,
         c.c_custkey IS NOT NULL AS has_c, u.c_custkey IS NOT NULL AS has_u,
         (c.c_acctbal IS DISTINCT FROM u.c_acctbal
          OR c.c_mktsegment IS DISTINCT FROM u.c_mktsegment) AS changed
  FROM cur c FULL OUTER JOIN upd u ON c.c_custkey = u.c_custkey),
emitted AS (
  SELECT ck AS c_custkey, ca AS c_acctbal, cm AS c_mktsegment,
         cvf AS valid_from, cvt AS valid_to, TRUE AS is_current
  FROM j WHERE has_c AND (NOT has_u OR NOT changed)
  UNION ALL
  SELECT ck, ca, cm, cvf, eff, FALSE FROM j WHERE has_c AND has_u AND changed
  UNION ALL
  SELECT uk, ua, um, eff, NULL, TRUE FROM j WHERE has_c AND has_u AND changed
  UNION ALL
  SELECT uk, ua, um, eff, NULL, TRUE FROM j WHERE NOT has_c)
SELECT c_custkey, c_acctbal, c_mktsegment,
       strftime(valid_from, '%Y-%m-%d') AS valid_from_s,
       strftime(valid_to, '%Y-%m-%d')   AS valid_to_s,
       CAST(is_current AS INTEGER)      AS is_current_i
FROM (SELECT * FROM hist UNION ALL SELECT * FROM emitted)
"""


def _scd2_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from ..operators.merge import scd2_apply  # noqa: F401  (re-export site)

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    d93 = F.lit("1993-01-01").cast("date")
    d94 = F.lit("1994-01-01").cast("date")
    d95 = F.lit("1995-06-01").cast("date")
    cur0 = cust.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        d94.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    pre = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") - 50).alias("c_acctbal"),
        "c_mktsegment",
        d93.alias("valid_from"),
        d94.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    upd_redelivered = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 6 == 0, F.col("c_acctbal") + 100)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
        d95.alias("eff"),
    )
    upd_new = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 100000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
        d95.alias("eff"),
    )
    return cur0.unionByName(pre), upd_redelivered.unionByName(upd_new)


@register("m2_scd2_merge", oracle=M2_ORACLE)
def m2_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: Slowly-Changing-Dimension Type 2 merge — changed keys close
    their open row and append a new version; unchanged re-deliveries
    are no-ops; unseen keys insert; closed history passes through
    (operators/merge.py::scd2_apply — one full-outer join of the open
    slice vs the snapshot, each joined row explodes into its 0/1/2
    output rows, no second join). The history discipline M1's
    overwrite semantics deliberately lack."""
    from ..operators.merge import scd2_apply

    history, updates = _scd2_inputs(spark, sf_dir)
    out = scd2_apply(
        history, updates,
        keys=["c_custkey"],
        tracked=["c_acctbal", "c_mktsegment"],
        eff_col="eff",
    )
    return out.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from_s"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to_s"),
        F.col("is_current").cast("int").alias("is_current_i"),
    )


# ---------------------------------------------------------------------------
# M3 — snapshot diff (change-data-capture between two refreshes)
# ---------------------------------------------------------------------------

M3_ORACLE = """
WITH snap_old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 3
),
snap_new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 1 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END              AS change_type,
       o.o_orderstatus                     AS old_o_orderstatus,
       o.o_totalprice                      AS old_o_totalprice,
       n.o_orderstatus                     AS new_o_orderstatus,
       n.o_totalprice                      AS new_o_totalprice
FROM snap_old o FULL OUTER JOIN snap_new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
   OR (o.o_totalprice  IS DISTINCT FROM n.o_totalprice)
"""


@register("m3_snapshot_diff", oracle=M3_ORACLE)
def m3_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: change-data-capture between two table snapshots
    (operators/merge.py::snapshot_diff) — the inverse of M1's upsert:
    given the states before and after a refresh, emit the
    insert/update/delete change rows a downstream incremental consumer
    would replay. Two deterministic snapshots are derived from
    ``orders``: keys ≡3 (mod 10) are missing from the old snapshot
    (→ inserts), keys ≡7 are missing from the new (→ deletes), keys ≡1
    change status and price (→ updates); everything else is unchanged
    and must NOT appear. One full-outer shuffle join + row-local
    null-safe comparison; at scale, bucket both snapshots on the key
    for a zero-exchange diff, or restrict to changed partitions first
    (the M1p pattern)."""
    from ..operators.merge import snapshot_diff

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_old = orders.filter(F.col("o_orderkey") % 10 != 3)
    snap_new = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 1, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 10 == 1, F.col("o_totalprice") + 100.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(
        snap_old,
        snap_new,
        keys=["o_orderkey"],
        tracked=["o_orderstatus", "o_totalprice"],
    )


# ---------------------------------------------------------------------------
# M4 — incremental aggregate maintenance (delta-merge, no rescan)
# ---------------------------------------------------------------------------

M4_ORACLE = """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_custkey
"""


@register("m4_incremental_agg", oracle=M4_ORACLE)
def m4_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: incremental maintenance of a materialized per-customer
    aggregate — the pattern that turns a 100 TB nightly recompute into
    a delta-sized merge: keep the materialized agg table, aggregate
    ONLY the newly arrived partition, and combine with a keyed
    full-outer merge of partial states (counts and decimal sums are
    additive, so base ⊕ delta ≡ recompute — which is exactly what the
    oracle checks by aggregating the whole table directly). The split
    here is by order date (pre/post 1997-01-01), mirroring a
    date-partitioned fact where ONLY the new date partition is read.
    Non-additive aggregates (exact distinct) need mergeable sketch
    state instead — that path is b18_hll_mergeable_rollup."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cutoff = F.lit("1997-01-01").cast("date")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("tp"),
        )

    base = agg(orders.filter(F.col("o_orderdate") < cutoff))
    delta = agg(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = base.withColumnRenamed("n_orders", "n_b").withColumnRenamed(
        "tp", "tp_b"
    ).join(
        delta.withColumnRenamed("n_orders", "n_d").withColumnRenamed(
            "tp", "tp_d"
        ),
        "o_custkey",
        "full_outer",
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return merged.select(
        "o_custkey",
        (
            F.coalesce(F.col("n_b"), F.lit(0))
            + F.coalesce(F.col("n_d"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("tp_b"), zero) + F.coalesce(F.col("tp_d"), zero)
        )
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# M6 — targeted key delete (GDPR propagation), partition-pruned
# ---------------------------------------------------------------------------


@register(
    "m6_targeted_delete",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_custkey % 19 = 0)
    """,
)
def m6_targeted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: right-to-be-forgotten delete through the versioned table
    (operators/merge.py::VersionedParquetTable.delete) — every order of
    the flagged customers is removed in one atomic commit, and ONLY
    hive partitions that actually contain a flagged key are rewritten
    (discovered by a broadcast semi-join projected to the partition
    column; untouched partitions hard-link from the previous version).
    The delete-key column (o_custkey) is deliberately NOT the partition
    column (o_orderstatus) — the general case where touched partitions
    must be found from the table, not read off the delete batch. The
    oracle is the surviving-rows anti-join; identical results prove the
    pruned rewrite loses nothing. pytest additionally pins the
    file-level behavior (links for untouched partitions, no
    resurrection of fully-emptied partitions)."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m6_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, partition_by="o_orderstatus")
    table.overwrite(orders.select(*ORDER_COLS))
    delete_keys = orders.filter(F.col("o_custkey") % 19 == 0).select("o_custkey")
    table.delete(spark, delete_keys, keys=["o_custkey"])
    return _present(table.read(spark))


# ---------------------------------------------------------------------------
# M7 — time-travel read (the table AS OF a previous version)
# ---------------------------------------------------------------------------


@register(
    "m7_time_travel",
    oracle="""
    SELECT c_custkey,
           c_acctbal AS bal_before,
           c_acctbal + 100.0 AS bal_after,
           c_mktsegment
    FROM customer WHERE c_custkey % 7 = 0
    """,
)
def m7_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: time-travel read — the audit query every mutable table
    eventually needs: "what did these keys look like BEFORE the merge
    that just ran?". The versioned table's snapshot dirs are immutable
    (upsert writes a new dir and atomically swaps the pointer), so
    AS-OF is a direct parquet read of the retained predecessor —
    no log replay, no lock, no interference with the current-version
    readers (operators/merge.py::read_version; retention keeps the
    previous version while its in-flight readers drain).

    The query seeds v1 = customer, upserts +100 to every 7th key
    (→ v2), then joins read_version(v1) against read() on the touched
    keys — before/after balances from two physical snapshots, hash-
    checked against the oracle's arithmetic reconstruction. Both sides
    of the join are snapshot scans with key-pushdown; at 100 TB the
    join is partition-pruned the same way the upsert was."""
    cust = t(spark, sf_dir, "customer")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m7_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    v1 = table.overwrite(cust)
    delta = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
    )
    table.upsert(spark, delta, keys=["c_custkey"])
    before = table.read_version(spark, v1).select(
        "c_custkey", F.col("c_acctbal").alias("bal_before"), "c_mktsegment"
    )
    after = table.read(spark).select(
        "c_custkey", F.col("c_acctbal").alias("bal_after")
    )
    touched = delta.select("c_custkey")
    return (
        before.join(after, "c_custkey")
        .join(touched, "c_custkey", "semi")
        .select("c_custkey", "bal_before", "bal_after", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# M8 — write-audit-publish (staged version + audit gate + atomic swing)
# ---------------------------------------------------------------------------


@register("m8_write_audit_publish", oracle=M1_ORACLE)
def m8_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: the WAP (write-audit-publish) release gate — the lakehouse
    generalization of the reference's staging-then-transactional-merge
    (/root/reference/dags/weather-etl.py:85-93): the merged candidate
    is STAGED as an uncommitted version directory, audit queries run
    against that snapshot while production readers still see the old
    version, and only a passing audit swings the pointer
    (operators/merge.py::stage/publish/abandon). Audits here are the
    B22 battery run at snapshot scope: row count must not shrink, the
    merge key must stay unique, and no key may be NULL — each a plain
    aggregate over the staged parquet (full pushdown, no production
    interference). The oracle is M1's MERGE semantics: a hash-identical
    result proves the staged-then-published path altered nothing. The
    failed-audit path (abandon: pointer untouched, staged dir removed)
    is pinned by tests/test_merge.py."""
    base, updates = _base_and_updates(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m8_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(base)
    merged = keyed_upsert(table.read(spark), updates, keys=["o_orderkey"])
    staged = table.stage(merged)

    snap = table.read_version(spark, staged)
    audit = snap.agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_null_keys"),
    ).collect()[0]
    n_before = table.read(spark).count()
    if audit.n >= n_before and audit.n_keys == audit.n and audit.n_null_keys == 0:
        table.publish(staged)
    else:  # pragma: no cover — this corpus always passes; path pinned in pytest
        table.abandon(staged)
        raise AssertionError("WAP audit failed; staged version abandoned")
    return _present(table.read(spark))


# ---------------------------------------------------------------------------
# M10 — bucketed-checksum reconciliation (migration / replica audit)
# ---------------------------------------------------------------------------


@register(
    "m10_reconcile_checksum",
    oracle="""
    WITH dst AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 971 = 3 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 997 <> 5
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice,
             o_orderdate, 'EXTRA'
      FROM orders WHERE o_orderkey % 991 = 7),
    j AS (
      SELECT s.o_orderkey AS sk, d.o_orderkey AS dk,
             CASE WHEN d.o_orderkey IS NULL THEN 'missing'
                  WHEN s.o_orderkey IS NULL THEN 'extra'
                  WHEN s.o_custkey IS DISTINCT FROM d.o_custkey
                    OR s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
                    OR CAST(s.o_totalprice AS DECIMAL(38,6))
                       IS DISTINCT FROM CAST(d.o_totalprice AS DECIMAL(38,6))
                    OR s.o_orderdate IS DISTINCT FROM d.o_orderdate
                    OR s.o_orderpriority IS DISTINCT FROM d.o_orderpriority
                  THEN 'changed' END AS status
      FROM orders s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey)
    SELECT COALESCE(sk, dk) AS o_orderkey, status
    FROM j WHERE status IS NOT NULL
    """,
)
def m10_reconcile_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: bucketed-checksum reconciliation
    (operators/reconcile.py) — "is the migrated copy EXACTLY the
    source, and if not, which rows?" answered WITHOUT a row-level
    full-table join: per-bucket COUNT + BIT_XOR of portable 60-bit
    row fingerprints (a partial agg — each executor ships n_buckets
    rows, no row data crosses the network), equal buckets proven
    equal and pruned, row-level drill-down only inside the
    (corruption-sized) mismatched bucket set. The destination here is
    the source with three seeded defects — every 997th key dropped,
    every 971st repriced, every 991st duplicated under a shifted key —
    and the report must name exactly those keys. The oracle is the
    direct full-outer IS DISTINCT FROM comparison: identical results
    prove the checksum shortcut loses nothing. Doubles enter the
    fingerprint through DECIMAL(38,6) rendering (util.py float
    policy); fingerprint/bucket portability (Spark conv(md5) ==
    DuckDB '0x'||md5 cast) is pinned in tests so either side of a
    REAL migration can checksum itself in its own engine. This
    query runs the ``fast`` xxhash64 flavor — the right default when
    both snapshots are Spark-readable (7× cheaper than the rendered
    md5 path; the oracle never sees fingerprints, so the same parity
    gate covers either flavor); the ``portable`` md5 flavor's
    cross-engine equality is pinned in tests/test_merge.py."""
    orders = t(spark, sf_dir, "orders")
    changed = F.col("o_orderkey") % 971 == 3
    dst_df = (
        orders.filter(F.col("o_orderkey") % 997 != 5)
        .withColumn(
            "o_totalprice",
            F.when(changed, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 991 == 7).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                F.lit("X").alias("o_orderstatus"),
                "o_totalprice",
                "o_orderdate",
                F.lit("EXTRA").alias("o_orderpriority"),
            )
        )
    )
    # A real reconciliation's destination is a STORED table, not a
    # live expression — materialize the seeded-defect copy once
    # (otherwise the checksum AND drill-down phases would each
    # re-derive it, quadrupling the scan work being measured).
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m10_dst_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    dst_df.write.parquet(root)
    dst = spark.read.parquet(root)
    fp_cols = [
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(38,6)"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    ]
    return reconcile(
        orders, dst, ["o_orderkey"], fp_cols, n_buckets=1024,
        fingerprint="fast",
    )


# ---------------------------------------------------------------------------
# M11 — min/max manifest data skipping (Iceberg-style file pruning)
# ---------------------------------------------------------------------------


@register(
    "m11_manifest_prune",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
    FROM orders
    WHERE o_orderdate >= '1998-03-01' AND o_orderdate <= '1998-09-30'
    """,
)
def m11_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: file-level min/max data skipping (operators/manifest.py) —
    the read-side complement of B4c partition pruning and B4d
    Z-ordering: the table is laid out range-clustered on o_orderdate
    (repartitionByRange → each file owns a tight date interval), a
    manifest of per-file [min, max, count] is derived, and a 7-month
    range scan opens ONLY the files whose interval intersects the
    predicate — at 100 TB this is the difference between reading the
    table and reading the week you asked for. The survivor list is
    the only collect (control-plane, bounded by file count); the
    residual predicate is always reapplied row-level, so manifest
    width can never cost correctness — proven by the oracle being the
    plain full-table filter. pytest additionally pins that the pruned
    scan opens strictly fewer files than the table has."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m11_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    (
        orders.repartitionByRange(16, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(root)
    )
    manifest = file_stats(spark, root, "o_orderdate")
    lo, hi = F.lit("1998-03-01").cast("timestamp"), F.lit("1998-09-30").cast(
        "timestamp"
    )
    return skipping_read(spark, root, manifest, "o_orderdate", lo, hi).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
    )


# ---------------------------------------------------------------------------
# M12 — additive schema evolution through the MERGE path
# ---------------------------------------------------------------------------


@register(
    "m12_merge_schema_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 10 < 8),
    upd AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 100000 AS o_totalprice,
             'web' AS o_channel
      FROM orders WHERE o_orderkey % 10 >= 7)
    SELECT o_orderkey, o_custkey, o_totalprice, o_channel FROM upd
    UNION ALL
    SELECT b.o_orderkey, b.o_custkey, b.o_totalprice, NULL AS o_channel
    FROM base b
    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    """,
)
def m12_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: additive schema evolution through MERGE — the day-2 merge
    reality: the upstream added a column (here ``o_channel``) and the
    upsert batch carries it, while the table does not. With
    ``allow_new_columns`` the merge NULL-fills survivors (Delta/Iceberg
    mergeSchema semantics) in the same one-anti-join plan — no table
    rewrite, no second pass; a batch MISSING an existing column still
    fails loudly (additive-only — a dropped column is data loss, not
    evolution; pinned in pytest). The versioned table needs no
    mergeSchema read flag: each version dir carries the whole new
    schema wholesale. The oracle is the UNION reconstruction; hash
    equality pins both the merge semantics and the NULL-fill."""
    orders = t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    upd = orders.filter(F.col("o_orderkey") % 10 >= 7).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 100000).alias("o_totalprice"),
        F.lit("web").alias("o_channel"),
    )
    return keyed_upsert(
        base, upd, keys=["o_orderkey"], allow_new_columns=True
    )


# ---------------------------------------------------------------------------
# M13 — referential pseudonymization (keyed-hash tokenization)
# ---------------------------------------------------------------------------


@register(
    "m13_pseudonymize_referential",
    oracle="""
    WITH c AS (
      SELECT sha256('pseud:v1:' || CAST(c_custkey AS VARCHAR)) AS pid,
             c_mktsegment
      FROM customer WHERE c_custkey % 11 = 0),
    o AS (
      SELECT sha256('pseud:v1:' || CAST(o_custkey AS VARCHAR)) AS pid,
             o_totalprice
      FROM orders)
    SELECT c.pid, c.c_mktsegment,
           CAST(COUNT(o.pid) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM c LEFT JOIN o ON o.pid = c.pid
    GROUP BY c.pid, c.c_mktsegment
    """,
)
def m13_pseudonymize_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13: pseudonymization with referential integrity — the GDPR
    data-minimization transform M6's hard delete complements: replace
    the natural key with a salted keyed hash EVERYWHERE it appears,
    so analytics (joins, per-customer aggregates) still work while no
    raw identifier leaves the trusted zone. The same deterministic
    token function applied independently to each table preserves FK
    joinability WITHOUT a lookup table to protect or leak — rotate
    the salt version ('pseud:v1:') to break linkability epoch-over-
    epoch. Row-local sha2 on both sides, the join/agg plan unchanged
    from its raw-key twin (the hash is just a wider join key). The
    oracle recomputes the tokens independently in DuckDB — the hash
    match proves cross-engine token equality AND that the
    pseudonymized join loses no rows (LEFT JOIN keeps order-less
    customers with n_orders = 0)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")

    def pseud(key: F.Column) -> F.Column:
        return F.sha2(
            F.concat(F.lit("pseud:v1:"), key.cast("string")), 256
        )

    c = cust.filter(F.col("c_custkey") % 11 == 0).select(
        pseud(F.col("c_custkey")).alias("pid"), "c_mktsegment"
    )
    o = orders.select(
        pseud(F.col("o_custkey")).alias("pid"), "o_totalprice"
    )
    return (
        c.join(o, "pid", "left")
        .groupBy("pid", "c_mktsegment")
        .agg(
            F.count("o_totalprice").alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


# ---------------------------------------------------------------------------
# M14 — table branches (isolated experiment + fast-forward merge)
# ---------------------------------------------------------------------------


@register(
    "m14_table_branching",
    oracle="""
    SELECT c_custkey,
           c_acctbal         AS bal_during,
           c_acctbal + 100.0 AS bal_branch,
           c_acctbal + 100.0 AS bal_after_merge
    FROM customer WHERE c_custkey % 7 = 0
    """,
)
def m14_table_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14: table branches (operators/merge.py, Nessie/Iceberg-branch
    semantics on the version store) — run a risky backfill against the
    PRODUCTION table with zero reader impact: a branch is a named
    pointer sharing the same immutable version dirs; branch commits
    allocate from the same version counter but move only the branch
    head, and merge is FAST-FORWARD ONLY (a diverged main raises —
    rebase and replay; main's history is never rewritten). The query
    proves the three isolation facts at once via its three columns:
    main DURING the branch work still serves the base snapshot
    (bal_during = original), the branch serves the experiment
    (bal_branch = +100), and after the fast-forward main serves the
    branch head (bal_after_merge = +100). Divergence rejection and
    vacuum pinning of branch-referenced versions are pytest-pinned."""
    cust = t(spark, sf_dir, "customer")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m14_table_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(cust)
    table.create_branch("exp")
    delta = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
    )
    table.upsert_branch(spark, "exp", delta, keys=["c_custkey"])
    during = table.read(spark).select(
        "c_custkey", F.col("c_acctbal").alias("bal_during")
    )
    branch = table.read_branch(spark, "exp").select(
        "c_custkey", F.col("c_acctbal").alias("bal_branch")
    )
    table.merge_branch("exp")
    after = table.read(spark).select(
        "c_custkey", F.col("c_acctbal").alias("bal_after_merge")
    )
    keys = delta.select("c_custkey")
    return (
        during.join(branch, "c_custkey")
        .join(after, "c_custkey")
        .join(keys, "c_custkey", "semi")
    )


# ---------------------------------------------------------------------------
# M2 continued — SCD2 point-in-time (AS OF event time) read path
# ---------------------------------------------------------------------------


@register(
    "m2_point_in_time",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_date_s,
           CASE WHEN c.c_custkey % 6 = 0
                 AND o.o_orderdate >= TIMESTAMP '1995-06-01'
                THEN c.c_acctbal + 100 ELSE c.c_acctbal END AS bal_at_order
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 5 = 1
    """,
)
def m2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2b: the point-in-time join — the READ PATH SCD2 history exists
    for: each fact row joins the dimension version that was valid AT
    THE FACT'S OWN TIME (valid_from <= t < valid_to), so a 1994 order
    sees the 1994 balance and a 1996 order the post-change one —
    against the LIVE output of scd2_apply, not a fixture: if the merge
    produced overlapping or gapped validity intervals, facts would
    duplicate or vanish and the hash would catch it (every fact must
    match EXACTLY one version). The oracle reconstructs the expected
    balance arithmetically from the seeded change pattern. Shape: a
    keyed range join — equality on the business key plus the interval
    predicate; per-key version counts are small by SCD2's nature, so
    the range check runs inside hash-join buckets (B14's binning is
    the escape hatch for pathological per-key history depths)."""
    from ..operators.merge import scd2_apply

    history, updates = _scd2_inputs(spark, sf_dir)
    hist = scd2_apply(
        history,
        updates,
        keys=["c_custkey"],
        tracked=["c_acctbal", "c_mktsegment"],
        eff_col="eff",
    ).select(
        "c_custkey",
        "c_acctbal",
        F.col("valid_from").cast("timestamp").alias("vf"),
        F.col("valid_to").cast("timestamp").alias("vt"),
    )
    facts = t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 5 == 1
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        facts.join(
            hist,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("vf"))
            & (F.col("vt").isNull() | (F.col("o_orderdate") < F.col("vt"))),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_s"),
            F.col("c_acctbal").alias("bal_at_order"),
        )
    )


# ---------------------------------------------------------------------------
# M15 — CDC-driven aggregate maintenance (retraction semantics)
# ---------------------------------------------------------------------------


@register(
    "m15_cdc_agg_maintenance",
    oracle="""
    WITH final AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 100 = 11 THEN o_totalprice + 500
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 100 <> 7
      UNION ALL
      SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 100 = 13)
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM final GROUP BY o_custkey
    """,
)
def m15_cdc_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15: aggregate maintenance from a CDC CHANGELOG — M4 extended
    from insert-only deltas to the full I/U/D stream (the Flink
    retraction model, applied batch-side): deletes contribute
    (−1, −value), updates retract the old and assert the new
    ((−1,−old) ⊕ (+1,+new)), inserts add (+1, +new); the per-group
    delta folds into the materialized base with one keyed full-outer
    merge of partial states, and groups whose count reaches zero drop
    out. Counts and decimal sums are abelian-group state (invertible,
    not just additive) — that invertibility is exactly what makes
    DELETE maintainable without recompute; MIN/MAX are not invertible
    and need M4's recompute-the-partition fallback or sketch state.
    The oracle recomputes from the reconstructed final table: base ⊕
    changelog ≡ recompute, hash-checked. At 100 TB the changelog is
    delta-sized and the merge touches only changed groups."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dec = "decimal(38,6)"
    base = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_b"),
        F.sum(F.col("o_totalprice").cast(dec)).alias("tp_b"),
    )
    k = F.col("o_orderkey") % 100
    p = F.col("o_totalprice").cast(dec)
    dels = orders.filter(k == 7).select(
        "o_custkey", F.lit(-1).alias("dn"), (-p).alias("dtp")
    )
    upd_old = orders.filter(k == 11).select(
        "o_custkey", F.lit(-1).alias("dn"), (-p).alias("dtp")
    )
    upd_new = orders.filter(k == 11).select(
        "o_custkey",
        F.lit(1).alias("dn"),
        (F.col("o_totalprice") + 500).cast(dec).alias("dtp"),
    )
    ins = orders.filter(k == 13).select(
        "o_custkey", F.lit(1).alias("dn"), p.alias("dtp")
    )
    delta = (
        dels.unionByName(upd_old).unionByName(upd_new).unionByName(ins)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("n_d"), F.sum("dtp").alias("tp_d"))
    )
    zero = F.lit(0).cast(dec)
    merged = base.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (
            F.coalesce(F.col("n_b"), F.lit(0))
            + F.coalesce(F.col("n_d"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("tp_b"), zero) + F.coalesce(F.col("tp_d"), zero)
        ).alias("tp"),
    )
    return merged.filter(F.col("n_orders") > 0).select(
        "o_custkey",
        "n_orders",
        F.col("tp").cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# M16 — atomic multi-table transaction (cascade delete across two tables)
# ---------------------------------------------------------------------------


@register(
    "m16_multi_table_txn",
    oracle=f"""
    WITH survivors AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey % 17 <> 0)
    SELECT s.o_orderkey, s.o_custkey,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items,
           {o_dsum('l.l_quantity')} AS total_qty
    FROM survivors s
    LEFT JOIN lineitem l ON l.l_orderkey = s.o_orderkey
    GROUP BY s.o_orderkey, s.o_custkey
    """,
)
def m16_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16: atomic MULTI-TABLE transaction
    (operators/merge.py::MultiTableTxn) — the cascade delete that
    motivates it: removing a customer's orders must remove their
    lineitems IN THE SAME COMMIT, or a concurrent reader joins orders
    to lineitems and sees orphaned line rows (the referential-
    integrity anomaly single-table atomicity cannot prevent). Both
    tables' new snapshots are STAGED (invisible), then one atomic
    ``_TXN`` pointer swing publishes them together; the query reads
    both tables back THROUGH the txn pointer and joins them — the
    oracle's anti-join arithmetic matching proves the cascade lost
    nothing and orphaned nothing. A crash between the two stages
    leaves readers on the old consistent pair (pytest pins this).

    Scale: staging is the normal distributed write path; the commit
    is one O(tables)-byte rename on the coordinator — no lock, no 2PC
    across executors. The delete itself is two broadcast anti-joins
    (the deleted-key set is customer-fraction-sized)."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m16_txn_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    txn = MultiTableTxn(root)
    ot, lt = txn.table("orders"), txn.table("lineitem")
    txn.commit(
        {
            "orders": ot.stage(orders.select("o_orderkey", "o_custkey")),
            "lineitem": lt.stage(lineitem),
        }
    )
    # The cascade: delete flagged customers' orders AND their lineitems
    # in one transaction.
    del_orders = (
        txn.read(spark, "orders")
        .filter(F.col("o_custkey") % 17 == 0)
        .select("o_orderkey")
    )
    new_o = txn.read(spark, "orders").join(
        F.broadcast(del_orders), "o_orderkey", "anti"
    )
    new_l = txn.read(spark, "lineitem").join(
        F.broadcast(del_orders),
        F.col("l_orderkey") == del_orders["o_orderkey"],
        "anti",
    )
    txn.commit(
        {"orders": ot.stage(new_o), "lineitem": lt.stage(new_l)}
    )
    o2, l2 = txn.read(spark, "orders"), txn.read(spark, "lineitem")
    return (
        o2.join(l2, o2["o_orderkey"] == l2["l_orderkey"], "left")
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            dsum("l_quantity", "total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# M17 — shallow clone (zero-copy dev/test table); M18 — table history
# ---------------------------------------------------------------------------


@register(
    "m17_shallow_clone",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    """,
)
def m17_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M17: SHALLOW CLONE isolation
    (operators/merge.py::VersionedParquetTable.clone_to) — the
    Delta-style zero-copy dev table: clone the production snapshot by
    hard-linking its immutable version dir (O(files) metadata, zero
    bytes), then MUTATE THE ORIGINAL (+100 to every 7th customer's
    orders) and read the CLONE — which must still equal the
    pre-mutation seed, proving writes to either table are invisible
    to the other. The oracle is the untouched seed; a leak of the
    original's post-clone upsert into the clone breaks the hash.
    pytest additionally pins the mechanics (shared inodes, divergence
    in both directions).

    Scale: clone cost never touches data — at 100 TB it is the same
    metadata rename discipline as every commit; immutable version
    dirs are what make inode sharing safe (no write path ever edits
    a committed file in place)."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m17_clone_{os.getpid()}"
    )
    shutil.rmtree(root + "_src", ignore_errors=True)
    shutil.rmtree(root + "_dst", ignore_errors=True)
    table = VersionedParquetTable(root + "_src")
    table.overwrite(orders.select(*ORDER_COLS))
    clone = table.clone_to(root + "_dst")
    # Mutate the ORIGINAL after cloning; the clone must not see it.
    delta = orders.select(*ORDER_COLS).filter(
        F.col("o_custkey") % 7 == 0
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
    table.upsert(spark, delta, keys=["o_orderkey"])
    return _present(clone.read(spark))


@register(
    "m18_table_history",
    oracle="""
    WITH v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
           WHERE o_custkey % 10 <> 0)
    SELECT 1 AS version, v1.n AS n_rows,
           v1.n AS rows_delta FROM v1
    UNION ALL
    SELECT 2, v2.n, v2.n - v1.n FROM v1, v2
    """,
)
def m18_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M18: TABLE HISTORY — the DESCRIBE HISTORY surface every
    versioned store needs for audits and incident forensics: one row
    per retained snapshot with its row count and the delta against
    the previous version. The story here: seed (v1), then a targeted
    delete (v2, negative delta — the forensics signature of a GDPR
    sweep or a bad filter deploy). History depth equals VACUUM
    retention (operators/merge.py::_vacuum, retain=2 here): snapshots
    older than the window have fallen off disk by design, so the
    history surface reports exactly the retained, re-readable set —
    production raises retention where deeper forensics matter.

    Scale shape: the history frame is VERSION-COUNT-sized — the one
    place a driver-side loop is correct (each retained snapshot costs
    one count() job, itself distributed; retention bounds the loop).
    Version dirs being immutable makes the counts reproducible —
    history rows never drift after the fact."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m18_hist_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(orders.select(*ORDER_COLS))
    table.delete(
        spark,
        orders.filter(F.col("o_custkey") % 10 == 0).select("o_custkey"),
        keys=["o_custkey"],
    )
    rows = []
    prev = 0
    for v in table.versions():
        n = table.read_version(spark, v).count()
        rows.append((v, n, n - prev))
        prev = n
    return spark.createDataFrame(
        rows, "version int, n_rows bigint, rows_delta bigint"
    ).select(
        F.col("version").cast("int").alias("version"),
        "n_rows",
        "rows_delta",
    )


# ---------------------------------------------------------------------------
# M19 — partition evolution (layout change behind the atomic pointer)
# ---------------------------------------------------------------------------


@register(
    "m19_partition_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    """,
)
def m19_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M19: PARTITION EVOLUTION
    (operators/merge.py::VersionedParquetTable.repartition_layout) —
    change a live table's hive partition column (status → priority
    here) without breaking readers: the relayout is a normal staged
    version behind the same atomic pointer swing, the previous layout
    stays readable for time travel, and writes after the evolution
    use the new layout (the post-evolution upsert here rewrites ONLY
    the touched priority-partitions — partition pruning works against
    the NEW column immediately). The oracle is the logical content,
    which must be layout-invariant: identical hashes across
    seed → evolve → upsert-and-revert prove no rows were lost,
    duplicated, or reshuffled into the wrong partition.

    Scale: the relayout costs one rewrite of current data (schedule
    with M5 compaction); everything else is the usual O(1) pointer
    metadata. Layout-per-version is what makes the operation safe —
    no in-place directory surgery, ever."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m19_evolve_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, partition_by="o_orderstatus")
    table.overwrite(orders.select(*ORDER_COLS))
    table.repartition_layout(spark, "o_orderpriority")
    # Exercise the NEW layout's write path: +100 then -100 to every
    # 13th customer nets out to the seed content, but both upserts run
    # partition-pruned against o_orderpriority.
    up = orders.select(*ORDER_COLS).filter(F.col("o_custkey") % 13 == 0)
    table.upsert(
        spark,
        up.withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0)),
        keys=["o_orderkey"],
    )
    table.upsert(spark, up, keys=["o_orderkey"])
    return _present(table.read(spark))


# ---------------------------------------------------------------------------
# M20 — orphaned-version audit (crash forensics on the version store)
# ---------------------------------------------------------------------------


@register(
    "m20_orphan_audit",
    oracle="""
    SELECT 1 AS version, 'retained' AS state
    UNION ALL SELECT 2, 'current'
    UNION ALL SELECT 3, 'staged-uncommitted'
    """,
)
def m20_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M20: ORPHAN AUDIT (operators/merge.py::version_states) — after a
    seed (v1), an upsert (v2, now current) and a stage() whose commit
    "crashed" (v3, pointer never swung), the audit classifies every
    version dir on disk: v1 retained for time travel, v2 current, v3
    staged-uncommitted — the leftover a dead writer abandons. The
    deterministic classification IS the crash-safety proof from the
    outside: the orphan exists on disk yet the committed state the
    readers see (and the oracle pins) never includes it. Cleanup is
    abandon() once the writer is confirmed dead (pytest pins that
    path); M16's multi-table transactions rely on exactly this
    property between their stage and publish steps.

    Scale: one listdir against one pointer read — O(retained
    versions), independent of data bytes; the audit never opens a
    parquet footer."""
    from ..operators.merge import version_states

    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m20_orphan_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(orders.select("o_orderkey", "o_custkey"))
    table.upsert(
        spark,
        orders.select("o_orderkey", "o_custkey").filter(
            F.col("o_custkey") % 9 == 0
        ),
        keys=["o_orderkey"],
    )
    # Crash simulation: stage a third version, never commit it.
    table.stage(orders.select("o_orderkey", "o_custkey").limit(10))
    return spark.createDataFrame(
        version_states(table), "version int, state string"
    )


# ---------------------------------------------------------------------------
# M21 — merge-on-read delete (tombstones applied at scan, compacted later)
# ---------------------------------------------------------------------------


@register(
    "m21_merge_on_read_delete",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    WHERE o_custkey % 6 <> 0 AND o_custkey % 11 <> 0
    """,
)
def m21_merge_on_read_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M21: MERGE-ON-READ deletes
    (operators/merge.py::VersionedParquetTable.delete_mor /
    apply_deletes) — the write-cheap half of the delete spectrum
    (Iceberg v2 deletes, Delta deletion vectors): two successive
    tombstone commits (customers %6, then %11) each cost
    O(tombstones) I/O — the data files are hard-linked unchanged —
    and readers apply the UNIONED tombstone set as a broadcast
    anti-join at scan time; then :meth:`apply_deletes` compacts the
    tombstones away and the final pure-scan read must equal what the
    MOR reads showed all along (the oracle is the double anti-join —
    one hash over seed → MOR → compacted proves all three states
    agree). Eager M6 rewrites and MOR tombstones are the two ends of
    the same trade: write amplification vs read amplification; a
    real table mixes them (MOR for small urgent deletes, eager at
    compaction time — exactly this query's lifecycle).

    pytest pins the mechanics: linked (unrewritten) data files,
    tombstone accumulation across deletes, and tombstone removal
    after compaction."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m21_mor_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(orders.select(*ORDER_COLS))
    table.delete_mor(
        spark,
        orders.filter(F.col("o_custkey") % 6 == 0).select("o_orderkey"),
        keys=["o_orderkey"],
    )
    table.delete_mor(
        spark,
        orders.filter(F.col("o_custkey") % 11 == 0).select("o_orderkey"),
        keys=["o_orderkey"],
    )
    table.apply_deletes(spark)
    return _present(table.read(spark))


# ---------------------------------------------------------------------------
# M22 — rollback / RESTORE (pointer-swing recovery from a bad deploy)
# ---------------------------------------------------------------------------


@register(
    "m22_rollback_restore",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    """,
)
def m22_rollback_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M22: ROLLBACK / RESTORE
    (operators/merge.py::VersionedParquetTable.rollback) — the
    incident-recovery primitive: a bad deploy corrupts every 5th
    customer's totals (v2), rollback swings the pointer BACK to the
    seed (one atomic rename, zero data movement — the immutable v1
    dir was sitting there the whole time), and the read must equal
    the untouched seed; the corrupted v2 stays on disk for forensics
    until vacuum. This is publish()'s guard inverted on purpose:
    normal commits refuse to move backwards exactly so that ONLY an
    explicit rollback can, and a vacuumed target fails loudly (the
    restore window IS the retention window — m18's history depth).

    Scale: O(1) pointer metadata; recovery time is independent of
    table size, which is the entire point of keeping snapshots
    immutable."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m22_restore_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    v1 = table.overwrite(orders.select(*ORDER_COLS))
    # The bad deploy: corrupt totals for every 5th customer.
    bad = orders.select(*ORDER_COLS).filter(
        F.col("o_custkey") % 5 == 0
    ).withColumn("o_totalprice", F.col("o_totalprice") * -1.0)
    table.upsert(spark, bad, keys=["o_orderkey"])
    table.rollback(v1)
    return _present(table.read(spark))


# ---------------------------------------------------------------------------
# M23 — write-time CHECK constraints (Delta-invariant style commit gate)
# ---------------------------------------------------------------------------


@register(
    "m23_write_constraints",
    oracle="""
    WITH batch AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 103 = 0 THEN NULL
                  ELSE o_custkey END AS o_custkey,
             CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate
      FROM orders)
    SELECT 'price_positive' AS rule,
           CAST(COUNT(*) FILTER (WHERE (o_totalprice > 0) IS NOT TRUE)
                AS BIGINT) AS n_violations
    FROM batch
    UNION ALL
    SELECT 'status_enum',
           CAST(COUNT(*) FILTER (
             WHERE (o_orderstatus IN ('O', 'F', 'P')) IS NOT TRUE)
                AS BIGINT)
    FROM batch
    UNION ALL
    SELECT 'custkey_not_null',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
    FROM batch
    UNION ALL
    SELECT 'date_in_range',
           CAST(COUNT(*) FILTER (
             WHERE (o_orderdate BETWEEN DATE '1995-01-01'
                                    AND DATE '2001-12-31') IS NOT TRUE)
                AS BIGINT)
    FROM batch
    """,
)
def m23_write_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M23: write-time CHECK constraints
    (operators/constraints.py::audit_constraints) — the commit gate a
    production lakehouse puts in front of every write (Delta
    invariants / CHECK constraints; the reference DAG has no such
    layer — /root/reference/dags/weather-etl.py loads the payload
    straight into staging, which is exactly the gap this closes). A
    simulated dirty upstream batch (deterministically corrupted
    slices of orders: negated prices, an out-of-enum status, NULLed
    customer keys) is audited against four declared rules; the
    output is the per-rule violation report — including the
    zero-violation rule, proving every rule ran. A row violates when
    its predicate is NOT TRUE (FALSE or NULL both fail — Delta
    semantics, stricter than ANSI CHECK where UNKNOWN passes);
    `enforce_constraints` raising before any version dir is written
    is pinned by pytest.

    Scale shape: ONE full-scan Aggregate — every rule compiles to a
    conditional count inside the same whole-stage-codegen pass, so 40
    rules cost one scan, not 40; the report is rules-sized regardless
    of batch size and the table never holds a contract-breaking row."""
    from ..operators.constraints import audit_constraints

    o = t(spark, sf_dir, "orders")
    batch = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 103 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(F.col("o_orderkey") % 101 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
    )
    return audit_constraints(
        batch,
        {
            "price_positive": F.col("o_totalprice") > 0,
            "status_enum": F.col("o_orderstatus").isin("O", "F", "P"),
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "date_in_range": F.col("o_orderdate").between(
                "1995-01-01", "2001-12-31"
            ),
        },
    )


# ---------------------------------------------------------------------------
# M24 — optimistic concurrency control (multi-writer CAS commits)
# ---------------------------------------------------------------------------


@register(
    "m24_optimistic_concurrency",
    oracle="""
    SELECT 'conflicts_detected' AS event, CAST(1 AS BIGINT) AS n
    UNION ALL
    SELECT 'rows_a', CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_custkey % 7 = 0
    UNION ALL
    SELECT 'rows_b', CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_custkey % 11 = 0 AND o_custkey % 7 <> 0
    UNION ALL
    SELECT 'rows_untouched', CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_custkey % 7 <> 0 AND o_custkey % 11 <> 0
    """,
)
def m24_optimistic_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M24: optimistic concurrency control
    (operators/merge.py::claim_version / commit_if / upsert_occ) —
    the multi-writer commit protocol last-write-wins lacks: version
    slots are claimed exclusively (atomic mkdir — two writers can
    never collide on a dir), and the pointer swing is a
    COMPARE-AND-SWAP against the base version the merge was computed
    on, so a competing commit in between raises instead of being
    silently overwritten; the loser re-merges against the NEW current
    and retries — no lost update, which this query PROVES by staging
    the classic race: writer A merges against v1 and stalls, writer B
    commits, A's CAS correctly conflicts, A's retry folds B's rows in.
    The final table carries BOTH writers' marks (the overlap goes to
    A, who committed last); the oracle recomputes all three row
    classes straight from orders.

    Scale: the protocol is O(1) pointer metadata per attempt plus one
    batch-sized re-merge per conflict — table size never enters;
    writers on disjoint partitions still serialize on the single
    pointer (partition-level pointers are the classic extension,
    same CAS per pointer)."""
    from ..operators.merge import ConcurrentWriteError

    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m24_occ_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    a = VersionedParquetTable(root)
    b = VersionedParquetTable(root)
    seed = orders.select(*ORDER_COLS)
    a.overwrite(seed)
    upd_a = seed.filter(F.col("o_custkey") % 7 == 0).withColumn(
        "o_orderpriority", F.lit("A-WRITE")
    )
    upd_b = seed.filter(F.col("o_custkey") % 11 == 0).withColumn(
        "o_orderpriority", F.lit("B-WRITE")
    )
    # Writer A merges against base v1 and stages its slot...
    base_a = a.current_version()
    merged_a = keyed_upsert(a.read(spark), upd_a, keys=["o_orderkey"])
    slot_a = a.claim_version()
    a._write(merged_a, a._version_dir(slot_a))
    # ...writer B commits first; A's CAS must detect the race.
    b.upsert(spark, upd_b, keys=["o_orderkey"])
    conflicts = 0
    try:
        a.commit_if(slot_a, base_a)
    except ConcurrentWriteError:
        conflicts += 1
        shutil.rmtree(a._version_dir(slot_a), ignore_errors=True)
        a.upsert_occ(spark, upd_a, keys=["o_orderkey"])
    final = a.read(spark)
    counts = final.select(
        F.when(F.col("o_orderpriority") == "A-WRITE", "rows_a")
        .when(F.col("o_orderpriority") == "B-WRITE", "rows_b")
        .otherwise("rows_untouched")
        .alias("event")
    ).groupBy("event").agg(F.count("*").alias("n"))
    log = spark.createDataFrame(
        [("conflicts_detected", conflicts)], "event string, n long"
    )
    return counts.unionByName(log)


# ---------------------------------------------------------------------------
# M25 — change data feed (table_changes across the version history)
# ---------------------------------------------------------------------------


@register(
    "m25_change_data_feed",
    oracle="""
    SELECT CAST(2 AS INT) AS version, o_orderkey,
           'update' AS change_type,
           o_orderpriority AS old_o_orderpriority,
           'CHANGED' AS new_o_orderpriority
    FROM orders WHERE o_custkey % 5 = 0
    UNION ALL
    SELECT 2, o_orderkey + 10000000, 'insert',
           CAST(NULL AS VARCHAR), o_orderpriority
    FROM orders WHERE o_custkey % 13 = 0
    UNION ALL
    SELECT 3, o_orderkey, 'delete',
           CASE WHEN o_custkey % 5 = 0 THEN 'CHANGED'
                ELSE o_orderpriority END,
           CAST(NULL AS VARCHAR)
    FROM orders WHERE o_custkey % 9 = 0
    """,
)
def m25_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M25: CHANGE DATA FEED
    (operators/merge.py::VersionedParquetTable.change_feed) — the
    Delta-CDF / ``table_changes(from, to)`` consumer surface: after a
    seed (v1), a mixed upsert (updates + inserts → v2) and a targeted
    delete (→ v3), the feed reports every row-level change with the
    version that introduced it — consecutive retained snapshots
    diffed pairwise (snapshot_diff's null-safe full-outer join per
    step) and stamped. The oracle recomputes all three change classes
    straight from orders, so the hash match proves the feed is
    exactly the deltas — no phantom changes, no missed ones. The
    table runs a retain=10 policy: CDF depth IS the retention window,
    and a vacuumed version fails loudly rather than yielding a
    silently incomplete feed (pytest pins that guard).

    Scale: downstream consumers follow a 100 TB table by reading
    change-sized feeds instead of re-diffing snapshots; each step is
    one keyed full-outer join, O(touched partitions) when layouts
    match."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m25_cdf_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, retain=10)
    seed = orders.select(*ORDER_COLS)
    table.overwrite(seed)
    updates = seed.filter(F.col("o_custkey") % 5 == 0).withColumn(
        "o_orderpriority", F.lit("CHANGED")
    )
    inserts = seed.filter(F.col("o_custkey") % 13 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    table.upsert(spark, updates.unionByName(inserts), keys=["o_orderkey"])
    table.delete(
        spark,
        seed.filter(F.col("o_custkey") % 9 == 0).select("o_orderkey"),
        keys=["o_orderkey"],
    )
    feed = table.change_feed(
        spark,
        keys=["o_orderkey"],
        tracked=["o_orderpriority"],
        from_version=1,
        to_version=3,
    )
    return feed.select(
        "version",
        "o_orderkey",
        "change_type",
        "old_o_orderpriority",
        "new_o_orderpriority",
    )


# ---------------------------------------------------------------------------
# M26 — timestamp time travel (AS OF TIMESTAMP over the commit log)
# ---------------------------------------------------------------------------


@register(
    "m26_time_travel_timestamp",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders
    """,
)
def m26_time_travel_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M26: AS-OF-TIMESTAMP time travel
    (operators/merge.py::read_as_of_timestamp) — version-number time
    travel (M7) answers "show me v3"; incident forensics asks "show me
    the table as the 14:02 job saw it". Every pointer swing appends to
    an append-only commit log (_HISTORY.jsonl) — the pointer file only
    remembers its LATEST state — and a timestamp read is an as-of
    resolution over that log, so a ROLLBACK correctly re-surfaces the
    restored version for later timestamps instead of replaying the bad
    deploy. Here: seed, capture t_mid, then a corrupting upsert; the
    as-of read at t_mid must return the untouched seed (the oracle),
    while the current pointer still serves the corrupted v2 — both
    facts from one log. pytest pins the rollback-resurfacing and
    pre-history guards.

    Scale: resolution is one control-plane file read (O(commits)
    bytes); the data read is the normal immutable-snapshot scan —
    recovery-point lookup cost is independent of table size."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m26_ts_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)
    table.overwrite(orders.select(*ORDER_COLS))
    t_mid = time.time()
    bad = (
        orders.select(*ORDER_COLS)
        .filter(F.col("o_custkey") % 4 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * -1.0)
    )
    table.upsert(spark, bad, keys=["o_orderkey"])
    return _present(table.read_as_of_timestamp(spark, t_mid))


# ---------------------------------------------------------------------------
# M27 — partition expiry (zero-rewrite TTL sweep)
# ---------------------------------------------------------------------------


@register(
    "m27_partition_ttl",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o_orderpriority
    FROM orders WHERE o_orderstatus <> 'F'
    """,
)
def m27_partition_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M27: PARTITION EXPIRY
    (operators/merge.py::VersionedParquetTable.drop_partitions) — the
    retention sweep every time-partitioned 100 TB table runs on a
    schedule ("expire everything older than N"): dropping whole hive
    partitions as a pure metadata commit — surviving partition dirs
    hard-link into the new version, dropped ones are simply omitted;
    ZERO rows read, rewritten, or shuffled, so the sweep's cost is
    linking, never scanning. Here the orders table partitioned by
    status expires the 'F' (finished) partition; the oracle is the
    surviving filter. Expiry is an ordinary versioned commit: the
    expired partition stays time-travel-readable until vacuum (and
    pytest pins the hard-link zero-rewrite property + idempotent
    re-run on a missing value).

    Contrast with M6 (eager key delete: anti-join + touched-partition
    rewrite) and M21 (MOR tombstones): partition expiry is the third
    deletion granularity, and the only one whose cost is O(surviving
    partition COUNT) — independent even of the dropped data's size."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m27_ttl_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, partition_by="o_orderstatus")
    table.overwrite(orders.select(*ORDER_COLS))
    table.drop_partitions(spark, ["F"])
    return _present(
        table.read(spark).select(*ORDER_COLS)
    )


# ---------------------------------------------------------------------------
# M28 — no-op-suppressed merge (change feed shows only real changes)
# ---------------------------------------------------------------------------


@register(
    "m28_noop_suppressed_merge",
    oracle="""
    SELECT CAST(2 AS INT) AS version, o_orderkey,
           'update' AS change_type,
           o_orderpriority AS old_o_orderpriority,
           'CHANGED' AS new_o_orderpriority
    FROM orders WHERE o_custkey % 4 = 0
    """,
)
def m28_noop_suppressed_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M28: NO-OP-SUPPRESSED merge
    (operators/merge.py::upsert_changed_only) — a replayed
    full-snapshot batch where only the custkey%4 slice actually
    changed (the %7 slice is byte-identical to what the table already
    holds) merges with no-op suppression, and the CHANGE FEED (M25)
    across the resulting commit is the proof: it contains EXACTLY the
    real updates — no phantom 'update' rows for re-ingested identical
    data, no inserts, no deletes. Without suppression every replayed
    row rewrites its partition and lands in the feed as a change,
    poisoning every downstream incremental consumer with 'changes'
    that changed nothing. A pure-no-op batch commits NOTHING at all
    (version pointer untouched — pytest pins it).

    Scale: detection is ONE full-row null-safe anti-join of the
    deduped batch against the current snapshot — batch-sized
    broadcast, one table scan; write I/O then tracks REAL change
    volume, not feed volume."""
    orders = t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m28_noop_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root, retain=10)
    seed = orders.select(*ORDER_COLS)
    table.overwrite(seed)
    changed = seed.filter(F.col("o_custkey") % 4 == 0).withColumn(
        "o_orderpriority", F.lit("CHANGED")
    )
    noops = seed.filter(
        (F.col("o_custkey") % 7 == 0) & (F.col("o_custkey") % 4 != 0)
    )
    table.upsert_changed_only(
        spark, changed.unionByName(noops), keys=["o_orderkey"]
    )
    feed = table.change_feed(
        spark,
        keys=["o_orderkey"],
        tracked=["o_orderpriority"],
        from_version=1,
        to_version=2,
    )
    return feed.select(
        "version",
        "o_orderkey",
        "change_type",
        "old_o_orderpriority",
        "new_o_orderpriority",
    )


# ---------------------------------------------------------------------------
# M29 — replication via the change feed (CDF is sufficient to rebuild state)
# ---------------------------------------------------------------------------


@register(
    "m29_cdf_replication",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           CASE WHEN o_custkey % 5 = 0 THEN 'CHANGED'
                ELSE o_orderpriority END AS o_orderpriority
    FROM orders
    WHERE o_custkey % 9 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    FROM orders
    WHERE o_custkey % 13 = 0 AND o_custkey % 9 <> 0
    """,
)
def m29_cdf_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M29: REPLICATION driven purely by the change feed — the
    strongest correctness statement M25 can make: a replica that
    never sees the primary's data files, only its
    ``change_feed(...)``, must land byte-identical to the primary.
    The primary takes a mixed upsert (updates + inserts) then a
    targeted delete; the replica starts from the v1 snapshot and
    applies each feed step in commit order — inserts/updates as one
    keyed merge on the ``new_*`` images, deletes as a key delete. The
    final replica content (this query's output) is hash-matched
    against the primary's expected state recomputed straight from
    orders: a phantom change, a missed change, or a wrong image
    anywhere in the feed breaks the hash. This is exactly how a
    cross-region follower or a downstream materialized copy tails a
    100 TB table — change-sized transfers, never snapshot re-ships.

    Scale: each applied step is the M1/M6 machinery (batch-sized
    broadcast merges); the feed transfer is change-sized by
    construction."""
    orders = t(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_m29_repl_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    primary = VersionedParquetTable(os.path.join(base, "primary"), retain=10)
    seed = orders.select(*ORDER_COLS)
    primary.overwrite(seed)
    updates = seed.filter(F.col("o_custkey") % 5 == 0).withColumn(
        "o_orderpriority", F.lit("CHANGED")
    )
    inserts = seed.filter(F.col("o_custkey") % 13 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    primary.upsert(spark, updates.unionByName(inserts), keys=["o_orderkey"])
    primary.delete(
        spark,
        seed.filter(F.col("o_custkey") % 9 == 0).select("o_orderkey").unionByName(
            inserts.filter(F.col("o_custkey") % 9 == 0).select("o_orderkey")
        ),
        keys=["o_orderkey"],
    )
    tracked = [c for c in ORDER_COLS if c != "o_orderkey"]
    feed = primary.change_feed(
        spark,
        keys=["o_orderkey"],
        tracked=tracked,
        from_version=1,
        to_version=primary.current_version(),
    ).localCheckpoint(eager=True)
    # The replica tails the feed, never the primary's files.
    replica = VersionedParquetTable(os.path.join(base, "replica"), retain=10)
    replica.overwrite(primary.read_version(spark, 1))
    # ONE control-plane agg for the whole apply loop (r14, guide
    # §1.2(1)): the previous spelling ran a distinct-versions collect
    # plus TWO isEmpty probe jobs per version over the checkpointed
    # feed — 5 driver barriers for what one feed-sized groupBy answers
    # (isEmpty ⇔ per-version change_type count of 0, same skip
    # decisions, same apply order).
    step_counts = {
        r["version"]: (r["n_up"], r["n_del"])
        for r in feed.groupBy("version")
        .agg(
            F.count(
                F.when(F.col("change_type").isin("insert", "update"), 1)
            ).alias("n_up"),
            F.count(F.when(F.col("change_type") == "delete", 1)).alias(
                "n_del"
            ),
        )
        .collect()
    }
    for v in sorted(step_counts):
        step = feed.filter(F.col("version") == v)
        n_up, n_del = step_counts[v]
        if n_up:
            upserts = step.filter(
                F.col("change_type").isin("insert", "update")
            ).select(
                "o_orderkey",
                *[F.col(f"new_{c}").alias(c) for c in tracked],
            )
            replica.upsert(spark, upserts, keys=["o_orderkey"])
        if n_del:
            deletes = step.filter(F.col("change_type") == "delete").select(
                "o_orderkey"
            )
            replica.delete(spark, deletes, keys=["o_orderkey"])
    return _present(replica.read(spark).select(*ORDER_COLS))
