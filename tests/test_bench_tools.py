"""Unit pins for the measurement tooling (tools/bench_diff.py,
tools/bench_isolated.py) — the round-12 verdict showed the
verification layer itself can harbor false-greens (check_parity's
typo'd-name "ALL OK"), so the host-drift normalization added in
round 13 gets the same treatment: pure-python tests that fail on a
broken normalizer, no Spark session needed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_diff  # noqa: E402


def test_host_factor_median_and_floor():
    """Median over control ratios; noise-floored pairs excluded;
    fewer than 5 usable -> forced 1.0 (refusal, not a tiny median)."""
    old = {f"q{i}": 1.0 for i in range(7)}
    new = {f"q{i}": r for i, r in enumerate([1.1, 1.2, 1.2, 1.2, 1.3, 9.9, 0.1])}
    ctl = [f"q{i}" for i in range(5)]
    f, n = bench_diff.host_factor(old, new, ctl, min_sec=0.3)
    assert n == 5 and f == 1.2
    # Below 5 usable: forced to 1.0 even though a median exists.
    f, n = bench_diff.host_factor(old, new, ctl[:4], min_sec=0.3)
    assert (f, n) == (1.0, 4)
    # Noise floor: BOTH sides must clear it (r14 advisor) — a
    # sub-floor denominator (0.1 -> 0.3 = 3.0x pure jitter) must NOT
    # feed the normalizer, so "a" (both sub-floor) AND "b" (old
    # sub-floor, new at floor) are both excluded -> 5 used.
    old2 = {"a": 0.1, "b": 0.1, **{f"c{i}": 1.0 for i in range(5)}}
    new2 = {"a": 0.2, "b": 0.3, **{f"c{i}": 2.0 for i in range(5)}}
    f, n = bench_diff.host_factor(old2, new2, list(old2), min_sec=0.3)
    assert n == 5 and f == pytest.approx(2.0)


def test_diff_normalizes_by_host_factor():
    """A uniform 2x host epoch with one genuine 4x regression: raw
    diff flags everything, normalized diff flags exactly the one."""
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 2.0 for i in range(10)}
    new["q9"] = 4.0
    raw = bench_diff.diff(old, new, threshold=1.5, min_sec=0.3)
    assert len(raw["regressed"]) == 10
    norm = bench_diff.diff(old, new, threshold=1.5, min_sec=0.3, host=2.0)
    assert [r["query"] for r in norm["regressed"]] == ["q9"]
    assert norm["regressed"][0]["ratio"] == 2.0  # 4x raw / 2x host
    assert norm["host_factor"] == 2.0
    # Normalization also re-bases "improved": a query that merely
    # tracked the host epoch is NOT an improvement.
    assert not norm["improved"]


def test_control_refs_end_to_end_r11_vs_r12():
    """The round-13 order's acceptance check, pinned: the committed
    BENCH_FULL_r11 vs _r12 sweeps, control-derived from the round-12
    commit range, must reproduce the manual adjudication — a host
    factor near the manually-derived 1.21 and (almost) no flags.
    m5_compaction_plan is the one residual the tool still flags at
    1.5x; its adjudication lives in SCALE.md (round-13 section)."""
    r11 = os.path.join(REPO, "BENCH_FULL_r11.json")
    r12 = os.path.join(REPO, "BENCH_FULL_r12.json")
    if not (os.path.exists(r11) and os.path.exists(r12)):
        pytest.skip("standing baselines not present")
    # On a shallow clone / rewritten history the pinned commits may
    # not exist; control_set's check=True git diff would then raise
    # and json.loads('') ERRORs the test. Skip, mirroring the
    # missing-baseline path (r14 advisor catch).
    for ref in ("f7d7bf2", "2dae0ea"):
        ok = subprocess.run(
            ["git", "cat-file", "-e", ref], cwd=REPO, capture_output=True
        )
        if ok.returncode != 0:
            pytest.skip(f"pinned commit {ref} absent (shallow clone?)")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_diff.py"),
         r11, r12, "--control-refs", "f7d7bf2", "2dae0ea", "--json"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode in (0, 1), out.stderr[-1500:]
    d = json.loads(out.stdout)
    assert 1.1 < d["host_factor"] < 1.3, d["host_factor"]
    flagged = {r["query"] for r in d["regressed"]}
    assert flagged <= {"m5_compaction_plan"}, flagged
    # The derivation must be non-degenerate (the hub rule): a control
    # set in the hundreds, not zero.
    assert "control set:" in out.stderr and d["shared"] >= 300


def test_bench_isolated_failures_isolated_from_timings():
    """Failed queries land in "failed", never as sentinel values in
    "queries" (r12 advice: a -1.0 in the timing map poisons any
    downstream sum/min/ratio silently)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_isolated.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--runs", "1",
         "b01_parquet_scan", "zz_definitely_not_a_query"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0
    d = json.loads(out.stdout.strip().splitlines()[-1])
    # The bogus name lands ONLY in "failed"; the valid query still
    # gets a real (non-sentinel) timing — the r14 advisor pointed out
    # the old all-bogus spelling made the >= 0 check vacuously true
    # against an empty map, pinning nothing.
    assert d["failed"] == ["zz_definitely_not_a_query"]
    assert set(d["queries"]) == {"b01_parquet_scan"}
    assert d["queries"]["b01_parquet_scan"] >= 0
