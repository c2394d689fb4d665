#!/usr/bin/env python
"""Compare two bench JSON files and flag per-query time regressions.

PLANS_FULL.md (pinned by tests/test_plan_shapes.py) gates plan SHAPE
drift book-wide; this closes the remaining observability gap the
round-10 verdict named: wall-TIME drift. BENCH_FULL_r{N}.json is the
standing per-query baseline; run this against the next full sweep (or
any headline BENCH_r{N}.json pair) to get the regression list the
bench JSON's flat format can't show by eye across 357 entries.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]
                               [--min-sec 0.3] [--json]

Exit code 1 if any query regressed past the threshold (so a round
script can gate on it). Queries below --min-sec in BOTH files are
noise-floored and never flagged: at sf0.1 a 0.1 s query jitters 2-3x
run-to-run on a shared local[32] JVM, and flagging those would bury
the real signal (the same floor bench.py's own round-over-round
comparisons have always applied informally).
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    """Per-query seconds from either bench.py's own output (a
    ``queries`` dict) or the driver's BENCH_r{N}.json wrapper, whose
    ``tail`` field holds HEAD-TRUNCATED bench stdout — there the
    complete JSON object is unrecoverable, so the ``"name": sec``
    pairs are regex-scraped instead (the truncation can cost the
    first few queries, never corrupt a surviving pair: each pair is
    self-delimiting and the scrape drops any torn prefix)."""
    with open(path) as fh:
        doc = json.load(fh)
    qs = doc.get("queries")
    if isinstance(qs, dict) and qs:
        return {k: float(v) for k, v in qs.items()
                if isinstance(v, (int, float))}
    tail = doc.get("tail")
    if isinstance(tail, str):
        pairs = re.findall(r'"([a-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail)
        # Whitelist by query-name shape (tier prefix a/b/c/m + number,
        # or flagship_*) instead of blacklisting wrapper keys: any
        # present-or-future numeric wrapper field would otherwise be
        # misreported as a query and trigger spurious regressed/missing
        # verdicts (r12 advisor catch).
        qname = re.compile(r"^(?:[abcm]\d+[a-z]?_|flagship_)")
        return {k: float(v) for k, v in pairs if qname.match(k)}
    return {k: float(v) for k, v in doc.items()
            if isinstance(v, (int, float))}


def diff(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float,
    min_sec: float,
) -> dict:
    shared = sorted(set(old) & set(new))
    regressed, improved = [], []
    for name in shared:
        o, n = old[name], new[name]
        if o < min_sec and n < min_sec:
            continue  # noise floor: both runs too fast to compare
        ratio = n / o if o > 0 else float("inf")
        row = {"query": name, "old_s": round(o, 3), "new_s": round(n, 3),
               "ratio": round(ratio, 2)}
        if ratio >= threshold:
            regressed.append(row)
        elif ratio <= 1.0 / threshold:
            improved.append(row)
    regressed.sort(key=lambda r: -r["ratio"])
    improved.sort(key=lambda r: r["ratio"])
    return {
        "shared": len(shared),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        # A query that VANISHED from the new run (crashed/hung out of
        # the sweep) is the worst regression, not a footnote — gate on
        # it too, noise-floored like everything else. Renames/removals
        # are deliberate acts; re-baseline when they happen.
        "missing": sorted(
            q for q in set(old) - set(new) if old[q] >= min_sec
        ),
        "sum_old_s": round(sum(old[q] for q in shared), 1),
        "sum_new_s": round(sum(new[q] for q in shared), 1),
        "regressed": regressed,
        "improved": improved,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio >= this (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="noise floor: skip queries under this in both runs")
    ap.add_argument("--json", action="store_true", dest="as_json")
    args = ap.parse_args()

    d = diff(load_queries(args.old), load_queries(args.new),
             args.threshold, args.min_sec)
    if args.as_json:
        print(json.dumps(d, indent=2))
    else:
        if d["shared"] and d["sum_old_s"] > 0:
            print(f"shared queries: {d['shared']}  "
                  f"total {d['sum_old_s']}s -> {d['sum_new_s']}s "
                  f"({d['sum_new_s'] / d['sum_old_s']:.2f}x)")
        elif d["shared"]:
            print(f"shared queries: {d['shared']}  "
                  f"total {d['sum_old_s']}s -> {d['sum_new_s']}s")
        else:
            print("no shared queries")
        for tag in ("only_old", "only_new"):
            if d[tag]:
                print(f"{tag}: {', '.join(d[tag])}")
        if d["missing"]:
            print(f"\nMISSING from new run (>= {args.min_sec}s in old — "
                  f"crashed or dropped out of the sweep?):")
            for q in d["missing"]:
                print(f"  {q}")
        for label, rows in (("REGRESSED", d["regressed"]),
                            ("improved", d["improved"])):
            if rows:
                print(f"\n{label} (>= {args.threshold}x, "
                      f"noise floor {args.min_sec}s):")
                for r in rows:
                    print(f"  {r['ratio']:6.2f}x  {r['old_s']:7.3f}s -> "
                          f"{r['new_s']:7.3f}s  {r['query']}")
    return 1 if d["regressed"] or d["missing"] else 0


if __name__ == "__main__":
    sys.exit(main())
