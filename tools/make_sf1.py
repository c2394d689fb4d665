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

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)

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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
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
            f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS n) i) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM parquet_scan('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
