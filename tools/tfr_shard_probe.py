#!/usr/bin/env python
"""Synthetic large-shard probe for the TFRecord reader's size gate
(r14 verdict order #8 → r15).

r14 measured the ungated buffered/numpy rewrite a 1.3-1.9x LOSS at
fixture scale (KB-size records, MB-size shards: numpy import tax per
fresh DataSource worker + call overhead per tiny record). The r15
reader gates a numpy-free whole-buffer framing path on shard size
(`SPARK_GRAFT_TFR_BUFFER_MIN_BYTES`, default 64 MB). This probe
builds a shard of the PRODUCTION size class the gate targets and
times both paths on it, plus both paths on a fixture-size shard, so
the gate's sign is pinned at both ends.

Usage: python tools/tfr_shard_probe.py [--mb 128] [--runs 3]
Prints one JSON line with per-path min seconds and the ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from openweathermapapi_etl_spark.sources.tfrecord import (  # noqa: E402
    read_records,
    write_records,
)


def build_shard(path: str, target_bytes: int) -> int:
    """~300-byte records (the fixture corpus's scale) until the shard
    reaches target_bytes; returns the record count."""
    n = 0
    text = "token " * 50  # ~300 bytes of payload
    chunk = 10_000
    while os.path.exists(path) and os.path.getsize(path) < target_bytes:
        write_records(
            path, ((n + i, text) for i in range(chunk))
        )
        n += chunk
    if not os.path.exists(path):
        write_records(path, ((i, text) for i in range(chunk)))
        n = chunk
        return n + build_shard(path, target_bytes)
    return n


def time_path(path: str, threshold: str, runs: int) -> float:
    os.environ["SPARK_GRAFT_TFR_BUFFER_MIN_BYTES"] = threshold
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        n = sum(1 for _ in read_records(path))
        best = min(best, time.perf_counter() - t0)
    assert n > 0
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128)
    ap.add_argument("--fixture-kb", type=int, default=512)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    out = {}
    with tempfile.TemporaryDirectory() as d:
        big = os.path.join(d, "big.tfr")
        n_big = build_shard(big, args.mb * 1024 * 1024)
        small = os.path.join(d, "small.tfr")
        n_small = build_shard(small, args.fixture_kb * 1024)
        for name, path, n in (("big", big, n_big), ("small", small, n_small)):
            scalar = time_path(path, "999999999999", args.runs)
            buffered = time_path(path, "0", args.runs)
            out[name] = {
                "bytes": os.path.getsize(path),
                "records": n,
                "scalar_s": round(scalar, 4),
                "buffered_s": round(buffered, 4),
                "buffered_over_scalar": round(buffered / scalar, 3),
            }
    os.environ.pop("SPARK_GRAFT_TFR_BUFFER_MIN_BYTES", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
