#!/usr/bin/env python
"""Isolated min-of-N per-query bench (r11 verdict Next #6).

The round-11 sf1 probe ran the whole headline set in one session, so
the heavy queries' numbers carried ~1.5x interference from their
neighbors' cache/GC pressure. This tool times each named query in its
OWN process (fresh JVM, fresh session): one unmeasured warmup scan,
then N measured runs, reporting the min — the comparable figure for a
standing SCALE.md column.

Usage:
  python tools/bench_isolated.py [--sf-dir DIR] [--runs N] q1 q2 ...
  python tools/bench_isolated.py --one NAME   (internal: child mode)

Prints one JSON line: {"sf_dir": ..., "runs": N,
                       "queries": {name: min_sec, ...},
                       "failed": [name, ...]}
Failed queries appear ONLY in "failed" — never as sentinel values in
"queries" — so downstream sum/min/ratio over the timing map cannot
silently absorb a failure.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    """Fully evaluate every output column (no column pruning)."""
    df.write.format("noop").mode("overwrite").save()


def run_one(name: str, sf_dir: str, runs: int) -> float:
    sys.path.insert(0, REPO)
    from openweathermapapi_etl_spark.session import get_session
    import __spark_entry__ as entry

    queries = entry.queries()
    if name not in queries:
        raise SystemExit(f"unknown query: {name}")
    spark = get_session(f"bench-isolated-{name}")
    # Warmup: JIT + codegen + file listing, not measured.
    _force(queries["b01_parquet_scan"](spark, sf_dir))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(queries[name](spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.1"))
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--one", metavar="NAME",
                   help="internal: time one query in this process")
    p.add_argument("queries", nargs="*", metavar="QUERY")
    opts = p.parse_args()
    sf_dir, runs = opts.sf_dir, opts.runs
    if opts.one:
        print(json.dumps({opts.one: round(run_one(opts.one, sf_dir, runs), 3)}))
        return
    if not opts.queries:
        p.error("no queries named (and --one not given)")
    timings: dict[str, float] = {}
    failed: list[str] = []
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    for name in opts.queries:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", sf_dir, "--runs", str(runs), "--one", name],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        if out.returncode != 0:
            # Fail loud per query, keep going so one bad name doesn't
            # void an hour-long sweep; the failure is in the record —
            # in "failed", never as a sentinel inside "queries".
            sys.stderr.write(out.stderr[-2000:] + "\n")
            failed.append(name)
            continue
        timings.update(json.loads(out.stdout.strip().splitlines()[-1]))
        sys.stderr.write(f"{name}: {timings[name]}\n")
    print(json.dumps({"sf_dir": sf_dir, "runs": runs,
                      "queries": timings, "failed": failed}))


if __name__ == "__main__":
    main()
