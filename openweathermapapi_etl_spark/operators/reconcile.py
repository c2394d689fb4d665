"""Bucketed-checksum table reconciliation — migration/replica audit.

The canonical 100 TB question after any copy (engine migration, DR
replica, backfill, vendor handoff): "is the destination EXACTLY the
source, and if not, which rows?" A row-level full-outer join answers
it but shuffles both tables end-to-end — 2×100 TB of network for an
answer that is almost always "yes, except 12 rows". The standard fix
(used by every replication checker since rsync; e.g. the
Merkle-tree anti-entropy in Amazon's Dynamo paper, SOSP 2007 —
public literature) is hierarchical checksums:

1. fingerprint every row to a 60-bit integer (md5 → hex prefix —
   chosen because the SAME bytes are computable in any engine, so
   source and destination need not run the same system);
2. assign each row to one of ``n_buckets`` buckets by key hash;
3. per side, aggregate per bucket: ``COUNT(*)`` and ``BIT_XOR`` of
   the row fingerprints — a PARTIAL aggregate, so each executor ships
   exactly ``n_buckets`` rows regardless of data size: the only
   corpus-sized work is the scan itself, and no row data ever
   crosses the network;
4. full-outer join the two (tiny) bucket summaries — equal buckets
   are proven equal (up to 60-bit collision) and never touched again;
5. drill down ONLY into mismatched buckets: semi-filter both sides
   on the mismatched bucket ids (a broadcast of a list whose size is
   proportional to the CORRUPTION, not the data), then a key-level
   full-outer join classifies each divergent row as ``missing``
   (source-only), ``extra`` (destination-only), or ``changed``
   (both present, fingerprints differ).

XOR is the right combiner: commutative/associative (partial-agg
safe), overflow-free, and self-inverse — a bucket whose rows moved
between files still checks equal, only content changes surface.

Fingerprint portability contract: callers pass the columns ALREADY
rendered engine-neutral (cast doubles through DECIMAL so '17.0' vs
'17.000000' formatting cannot differ, dates/strings/integers are
naturally stable); this operator flag-renders each column (chr(0)
for NULL, chr(1)+text for a value — NULL collides with NO literal)
and concatenates with an unprintable separator.

Reference basis: the reference lands every batch into Postgres with
no post-load verification at all (dags/weather-etl.py:134-143 —
fire-and-forget ``to_sql``); a reconciliation surface is what its
operators would reach for on the first suspected silent load failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Unit separator between rendered columns.
_SEP = "\x1f"
#: Per-column null flag bytes: a NULL renders as chr(0) alone, a
#: present value as chr(1) + text — so NULL can never collide with
#: ANY literal string (the old chr(0)chr(0) SENTINEL was itself a
#: representable string value, exactly the binary-junk class a
#: corruption audit exists to catch; r11 review catch).
_NULL_FLAG = "\x00"
_VAL_FLAG = "\x01"


def row_fingerprint(cols: list[Column | str]) -> Column:
    """Portable 60-bit row fingerprint as BIGINT.

    ``conv(substr(md5(concat_ws(sep, flag-rendered...)), 1, 15), 16,
    10)`` — bit-identical to DuckDB's ``CAST('0x' || substr(md5(...),
    1, 15) AS BIGINT)`` (verified in tests), so either engine can
    checksum its own side. Each column renders as ``chr(0)`` when
    NULL else ``chr(1) || text``, making the NULL class collision-
    free. Remaining theoretical collision: a STRING value embedding
    ``chr(31) || chr(1)`` can shift bytes across a column boundary —
    callers with adversarial binary-in-string data should use the
    typed :func:`fast_fingerprint` (immune: no rendering) on the
    Spark side and pre-sanitize for the cross-engine path.
    """
    def render(c: Column | str) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        return F.when(col.isNull(), F.lit(_NULL_FLAG)).otherwise(
            F.concat(F.lit(_VAL_FLAG), col.cast("string"))
        )

    rendered = [render(c) for c in cols]
    return (
        F.conv(F.substring(F.md5(F.concat_ws(_SEP, *rendered)), 1, 15), 16, 10)
        .cast("long")
    )


def fast_fingerprint(cols: list[Column | str]) -> Column:
    """JVM-native row fingerprint (xxhash64 over TYPED values).

    ~7× faster than the md5 path (measured: 1.4 s vs 10.4 s per 600 k
    rows/core) because nothing is rendered to string and no base
    conversion runs — the right default when BOTH sides are readable
    by this cluster (snapshot-vs-snapshot, pre/post-migration dual
    reads). Use :func:`row_fingerprint` only when the other side must
    checksum itself in a different engine: xxhash64 seeds/typed
    hashing are Spark-specific, md5-over-rendered-text is universal.
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


_FP = {"portable": row_fingerprint, "fast": fast_fingerprint}


def bucket_of(
    key_cols: list[Column | str], n_buckets: int, fingerprint: str = "portable"
) -> Column:
    """Deterministic bucket id from the key columns."""
    return F.pmod(_FP[fingerprint](key_cols), F.lit(n_buckets)).cast("long")


def bucket_checksums(
    df: DataFrame,
    key_cols: list[str],
    fingerprint_cols: list[Column | str],
    n_buckets: int,
    fingerprint: str = "portable",
) -> DataFrame:
    """(bucket, n_rows, checksum) — one row per non-empty bucket.

    The partial aggregate means each executor emits ≤ ``n_buckets``
    rows; the shuffle is metadata-sized no matter the table size.
    """
    fp = _FP[fingerprint]
    # The row fingerprint covers KEYS + values, not values alone: the
    # bucket XOR is a multiset equality over fingerprints, so a
    # value-only fingerprint cannot see two keys in the same bucket
    # SWAPPING values — identical multiset, corrupted table, bucket
    # "proven equal" (r11 review catch). With keys inside, the swap
    # changes both fingerprints.
    return (
        df.select(
            bucket_of(key_cols, n_buckets, fingerprint).alias("bucket"),
            fp([*key_cols, *fingerprint_cols]).alias("_fp"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.bit_xor("_fp").alias("checksum"),
        )
    )


def reconcile(
    src: DataFrame,
    dst: DataFrame,
    key_cols: list[str],
    fingerprint_cols: list[Column | str],
    n_buckets: int = 1 << 12,
    fingerprint: str = "portable",
) -> DataFrame:
    """Row-level divergence report between two table snapshots.

    Returns one row per divergent key: the key columns plus
    ``status`` ∈ {``missing`` (in src only), ``extra`` (in dst
    only), ``changed`` (present in both, content differs)}. Equal
    buckets are pruned BEFORE any row-level work, so the expensive
    phase touches only data that actually diverged.
    """
    s_sum = bucket_checksums(src, key_cols, fingerprint_cols, n_buckets, fingerprint)
    d_sum = bucket_checksums(dst, key_cols, fingerprint_cols, n_buckets, fingerprint)
    bad = (
        s_sum.alias("s")
        .join(d_sum.alias("d"), "bucket", "full_outer")
        .filter(
            ~(
                F.col("s.n_rows").eqNullSafe(F.col("d.n_rows"))
                & F.col("s.checksum").eqNullSafe(F.col("d.checksum"))
            )
        )
        .select("bucket")
    )

    def rows(df: DataFrame) -> DataFrame:
        # Broadcast the (corruption-sized) bad-bucket set; survivors
        # carry key + fingerprint only — row payloads never shuffle.
        # Then fold PER KEY (count + XOR): the old row-vs-row
        # full-outer join many-to-many-matched duplicate keys, so
        # "src has the row twice, dst once" matched every copy to the
        # single dst row, fingerprints agreed, and the divergence the
        # bucket phase detected was silently dropped on the way to
        # the report — a false-clean (r11 review catch). Per-key
        # (n, checksum) makes duplicate-count drift a first-class
        # 'changed' and keeps the drill-down join key-unique.
        return (
            df.select(
                *key_cols,
                bucket_of(key_cols, n_buckets, fingerprint).alias("bucket"),
                _FP[fingerprint]([*key_cols, *fingerprint_cols]).alias("fp"),
            )
            .join(F.broadcast(bad), "bucket", "left_semi")
            .groupBy(*key_cols)
            .agg(F.count("*").alias("n"), F.bit_xor("fp").alias("fp"))
        )

    s_rows = rows(src).alias("sr")
    d_rows = rows(dst).alias("dr")
    # NULL-safe key equality (same rationale as keyed_upsert): a
    # NULL-key row present on both sides must classify as equal or
    # changed, not split into a phantom missing+extra pair.
    cond = [F.col(f"sr.{k}").eqNullSafe(F.col(f"dr.{k}")) for k in key_cols]
    return (
        s_rows.join(d_rows, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"sr.{k}"), F.col(f"dr.{k}")).alias(k)
                for k in key_cols
            ],
            F.when(F.col("dr.fp").isNull(), F.lit("missing"))
            .when(F.col("sr.fp").isNull(), F.lit("extra"))
            .when(
                (F.col("sr.fp") != F.col("dr.fp"))
                | (F.col("sr.n") != F.col("dr.n")),
                F.lit("changed"),
            )
            .alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )
