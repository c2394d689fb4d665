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
                       "queries": {name: min_sec, ...}}
"""

from __future__ import annotations

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
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if args and args[0] == "--one":
        print(json.dumps({args[1]: round(run_one(args[1], sf_dir, runs), 3)}))
        return
    if not args:
        raise SystemExit("usage: bench_isolated.py [--sf-dir D] [--runs N] q...")
    timings: dict[str, float] = {}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    for name in args:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", sf_dir, "--runs", str(runs), "--one", name],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        if out.returncode != 0:
            # Fail loud per query, keep going so one bad name doesn't
            # void an hour-long sweep; the error is in the record.
            sys.stderr.write(out.stderr[-2000:] + "\n")
            timings[name] = -1.0
            continue
        timings.update(json.loads(out.stdout.strip().splitlines()[-1]))
        sys.stderr.write(f"{name}: {timings[name]}\n")
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": timings}))


if __name__ == "__main__":
    main()
