#!/usr/bin/env python
"""Capture `.explain("formatted")` per query into plans/<tag>/<q>_<suffix>.txt.

The optimization-round evidence artifact (guide §1): run BEFORE an
optimization lands with ``--suffix before`` and after with
``--suffix after``; the judge diffs the two files against the claims
in OPTIMIZATION_r*.md. Streaming queries execute their replay inside
the callable — their capture reflects the post-run result table scan,
so job/batch-count evidence for them lives in the round doc instead.

Usage:
  python tools/explain_capture.py --tag r14 --suffix before [--sf-dir D] q1 q2 ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from openweathermapapi_etl_spark.plans import QUERIES
    from openweathermapapi_etl_spark.session import get_session

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("explain-capture")
    for name in args.queries:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        buf = io.StringIO()
        try:
            df = fn(spark, args.sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # streaming construction failures etc.
            buf.write(f"(not explainable: {type(exc).__name__}: {exc})\n")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
