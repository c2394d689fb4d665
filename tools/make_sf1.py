#!/usr/bin/env python
"""Synthesize an sf1 dataset (10× sf0.1) for the local scale probe.

/root/testdata is driver-generated and read-only, and the largest SF
it ships is 0.1 — one notch below where several plan decisions flip
(broadcast→SMJ thresholds, AQE skew splits). This script builds sf1 by
REPLICATING sf0.1 ten times with disjoint key offsets per copy: value
distributions, FK relationships, and text/vector payloads stay exactly
the generator's, so a plan-shape delta between sf0.1 and sf1 is a
SCALE effect, not a data-shape artifact. Dimensions (region, nation)
stay enum-sized, as they would at any SF.

Usage: python tools/make_sf1.py [out_dir]            (default /tmp/sf1)
       python tools/make_sf1.py --zipf [out_dir]     (default /tmp/sf1z)
       python tools/make_sf1.py --copies N [out_dir] (replication factor;
                                                      default 10 = sf1)

--zipf (round-13 order #1) builds the SKEW-ADVERSARIAL variant: same
10x volume, but the join/agg keys every probe so far left uniform are
redrawn against a zipf(s=1) rank-frequency law with an explicit
~10%-mass hot key — the shape AQE skew splits, salting, and the
null-bypass rewrite exist for:

  * orders.o_custkey   — zipfian over the full sf1 customer domain;
    hot custkey carries ~10% of all orders (hits b10_salted_join,
    flagship_q3/q5/q18's orders⋈customer side).
  * lineitem.l_orderkey — zipfian over the sf1 orders domain; hot
    orderkey carries ~10% of all lineitems (hits the l⋈o joins and
    the groupBy(l_orderkey) in flagship_q18). FKs stay valid: every
    redrawn key exists on the dimension side.
  * events.user_id     — zipfian; hot user ~10% of events (hits
    b16_key_skew_profile and the window/sessionize family).
  * documents.text     — one mega-duplicate cluster: a deterministic
    ~10% of all docs share one hot text (duplicate-heavy corpus for
    the dedup/CC family), the rest keep the sf1 duplicate-factor-10.

Zipf draw is deterministic (hash-seeded inverse CDF): u from a salted
xxhash-style DuckDB hash of the row key; rank = ceil(exp(u*ln(N))) —
the s=1 inverse CDF, P(rank=r) ~ 1/r — except u < 0.10 pins rank 1,
the documented hot key. Rank maps to a real key via a row_number()
over the dimension, so referential integrity holds by construction.

Output is ephemeral probe data (not committed); SCALE.md records the
findings. Determinism: pure column arithmetic over the deterministic
source tables — re-running reproduces byte-identical values (parquet
metadata aside).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
#: One offset unit per key domain, far above any sf0.1 key.
OFF = 10_000_000

#: table -> list of key columns that must shift per copy (FK-consistent:
#: the same offset applies wherever the key appears).
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
ENUM_TABLES = ["region", "nation"]


#: --zipf: fraction of fact rows pinned to the single hot key.
HOT_MASS = 0.10


def _zipf_expr(seed_expr: str) -> str:
    """Deterministic zipf(s=1) rank in [1, N] from a hashed row key.

    ``u`` is uniform-ish on [0,1) from DuckDB's 64-bit hash; the first
    HOT_MASS of u-space pins rank 1 (the hot key), the rest follows
    the s=1 inverse CDF rank = ceil(exp(u' * ln(N))), whose mass at
    rank r is ~ 1/(r * ln N). Expects a CTE/inline ``nn(nv)`` holding
    the dimension cardinality."""
    u = f"((hash({seed_expr}) % 1000000 + 1000000) % 1000000) / 1000000.0"
    rescaled = f"(({u}) - {HOT_MASS}) / (1.0 - {HOT_MASS})"
    return (
        f"CASE WHEN ({u}) < {HOT_MASS} THEN 1 "
        f"ELSE LEAST(nn.nv, GREATEST(1, CAST(ceil(exp(({rescaled}) "
        f"* ln(nn.nv))) AS BIGINT))) END"
    )


def _skew_fact(
    con, out: str, fact: str, fk: str, dim_parquet: str, dim_key: str,
    seed: str,
) -> None:
    """Rewrite ``fact.fk`` zipfian over the keys present in
    ``dim_parquet.dim_key`` (rank 1 = the hot key). All other columns
    pass through; FK validity holds because ranks index real keys."""
    cols = [
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{out}/{fact}.parquet')"
        ).fetchall()
    ]
    sel = ", ".join(
        f"rk.k AS {c}" if c == fk else f"f.{c}" for c in cols
    )
    # Seed the draw from the fact's ORIGINAL fk value (pre-redraw) so
    # re-runs reproduce the draw byte-identically.
    zr = _zipf_expr(f"'{seed}' || CAST(f.rowid_seed AS VARCHAR)")
    con.execute(
        f"""
        COPY (
          WITH nn AS (SELECT count(*) AS nv
                      FROM parquet_scan('{out}/{dim_parquet}.parquet')),
          ranked AS (SELECT {dim_key} AS k,
                            row_number() OVER (ORDER BY {dim_key}) AS r
                     FROM parquet_scan('{out}/{dim_parquet}.parquet')),
          drawn AS (SELECT f.*, {zr} AS zr
                    FROM (SELECT *, {fk} AS rowid_seed
                          FROM parquet_scan('{out}/{fact}.parquet')) f,
                         nn)
          SELECT {sel}
          FROM drawn f
          JOIN ranked rk ON rk.r = f.zr
        ) TO '{out}/{fact}.parquet.tmp' (FORMAT parquet)
        """
    )
    os.replace(f"{out}/{fact}.parquet.tmp", f"{out}/{fact}.parquet")


def main() -> None:
    # argparse (r14 advisor low): the hand-rolled parser neither
    # documented --copies nor rejected a misplaced flag value being
    # silently taken as out_dir.
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out_dir", nargs="?", default=None,
                    help="output dir (default /tmp/sf1, /tmp/sf1z with --zipf)")
    ap.add_argument("--zipf", action="store_true",
                    help="skew-adversarial variant: zipf FKs + mega-dup text")
    ap.add_argument("--copies", type=int, default=COPIES, metavar="N",
                    help=f"replication factor over sf0.1 (default {COPIES}; "
                         "5 → sf0.5-equivalent volume)")
    ns = ap.parse_args()
    zipf, copies = ns.zipf, ns.copies
    out = ns.out_dir or ("/tmp/sf1z" if zipf else "/tmp/sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ENUM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM parquet_scan('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM parquet_scan('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i.n * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM parquet_scan('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(generate_series(0, {copies - 1})) AS n) i) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM parquet_scan('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)
    if not zipf:
        return
    # --- skew pass: redraw the uniform FKs against the zipf law -----
    _skew_fact(con, out, "orders", "o_custkey", "customer", "c_custkey",
               seed="zc:")
    print("orders.o_custkey: zipfian (hot custkey ~10% of orders)")
    _skew_fact(con, out, "lineitem", "l_orderkey", "orders", "o_orderkey",
               seed="zo:")
    print("lineitem.l_orderkey: zipfian (hot orderkey ~10% of lineitems)")
    _skew_fact(con, out, "events", "user_id", "events", "event_id",
               seed="zu:")
    print("events.user_id: zipfian over event_id domain (hot user ~10%)")
    # Duplicate mega-cluster: a deterministic ~10% of docs share the
    # text of the smallest doc_id (one giant near-dup cluster on top
    # of the replication-induced duplicate-factor-10).
    con.execute(
        f"""
        COPY (
          WITH hot AS (SELECT text AS hot_text, n_chars AS hot_n
                       FROM parquet_scan('{out}/documents.parquet')
                       ORDER BY doc_id LIMIT 1)
          SELECT doc_id,
                 CASE WHEN (hash('zd:' || CAST(doc_id AS VARCHAR)) % 10
                            + 10) % 10 = 0
                      THEN hot.hot_text ELSE text END AS text,
                 lang, source,
                 CASE WHEN (hash('zd:' || CAST(doc_id AS VARCHAR)) % 10
                            + 10) % 10 = 0
                      THEN hot.hot_n ELSE n_chars END AS n_chars
          FROM parquet_scan('{out}/documents.parquet'), hot
        ) TO '{out}/documents.parquet.tmp' (FORMAT parquet)
        """
    )
    os.replace(f"{out}/documents.parquet.tmp", f"{out}/documents.parquet")
    print("documents: hot-text mega-cluster (~10% of docs)")
    # Report the realized hot-key masses so the fixture is self-auditing.
    for label, tbl, col in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("events.user_id", "events", "user_id"),
        ("documents.text", "documents", "text"),
    ):
        top, total = con.execute(
            f"""SELECT max(c), sum(c) FROM (
                 SELECT count(*) AS c
                 FROM parquet_scan('{out}/{tbl}.parquet') GROUP BY {col})"""
        ).fetchone()
        print(f"  {label}: hot key mass {top}/{total} = {top/total:.3f}")


if __name__ == "__main__":
    main()
