#!/usr/bin/env python
"""Checkpoint-decision-rule lint (r14 verdict order #5 → r15).

Round 14's batch-5 sweep left a measured decision rule for when a
multiply-consumed DataFrame should get a lazy ``localCheckpoint``:

  checkpoint ONLY when
    (a) its recomputation is corpus-scale (the frame's lineage scans a
        base table / runs an expensive pipeline),
    (b) the cached rows are far smaller than the recomputation's input
        (an aggregation/limit sits on top — caching a corpus-sized or
        exploded frame trades a cheap columnar re-scan for row-format
        cache pressure), and
    (c) no consumer broadcast-joins it (plan truncation loses size
        stats, flipping BHJ → SMJ — the r14 loss mechanism #1),
  and ALWAYS A/B isolated — the static plan diff predicted the wrong
  sign for 5 of 18 r14 candidates.

This tool encodes the rule as an AST triage over the plan/operator
modules: it finds every function-local DataFrame assignment whose
value derives from a shuffle-bearing builder (groupBy/join/explode/
distinct or a named expensive operator), counts downstream loads of
the name inside the same function, whether the assignment already
checkpoints, and classifies each multiply-consumed, un-checkpointed
hit against (a)/(b)/(c) — (c) statically approximated by "the name is
used as the RIGHT side of a .join() call", where broadcast selection
is plausible. The output is a TRIAGE LIST for humans + A/B, not an
auto-fixer: verdict "candidate" means "measure it", never "apply it".

Usage: python tools/checkpoint_lint.py [--json] [paths...]
       (default paths: openweathermapapi_etl_spark/{plans,operators})
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Method calls that imply a shuffle / expensive recomputation when
#: they appear anywhere in the assignment's value expression.
SHUFFLE_BUILDERS = {
    "groupBy",
    "join",
    "distinct",
    "dropDuplicates",
    "explode",
    "repartition",
    "unionAll",
    "unionByName",
    "union",
    "window",
    "agg",
}

#: Named expensive pipelines (operators) — presence anywhere in the
#: value expression marks the recomputation corpus-scale, rule (a).
EXPENSIVE_OPS = {
    "lsh_candidate_pairs",
    "minhash_signature",
    "knn_graph",
    "setsim_join",
    "simhash",
    "hamming_band_pairs",
    "token_rank_sets",
    "word_shingles",
    "delta_lsh",
    "connected_components",
    "dedup_clusters",
    "symmetrize_pairs",
    "global_rank",
}

#: Base-table loaders — scanning one marks the lineage corpus-scale.
TABLE_LOADERS = {"t", "load_table"}

#: DataFrame API methods — an Attribute access with one of these
#: consumes the FRAME; any other attribute (``cn.k``) is a COLUMN
#: reference into a plan that already consumed the frame once, which
#: must not count as a second evaluation (b11's ``cn.k`` in the
#: post-join select re-reads nothing).
DF_METHODS = SHUFFLE_BUILDERS | {
    "select",
    "filter",
    "where",
    "withColumn",
    "withColumnRenamed",
    "alias",
    "crossJoin",
    "orderBy",
    "sort",
    "sortWithinPartitions",
    "sample",
    "limit",
    "drop",
    "dropna",
    "fillna",
    "selectExpr",
    "localCheckpoint",
    "persist",
    "cache",
    "write",
    "collect",
    "count",
    "isEmpty",
    "toDF",
    "rdd",
    "schema",
    "dtypes",
    "columns",
    "exceptAll",
    "intersect",
    "intersectAll",
    "subtract",
    "coalesce",
    "transform",
    "groupby",
    "unpivot",
    "melt",
    "hint",
    "na",
    "stat",
    "first",
    "head",
    "take",
    "sparkSession",
}


def _method_names(node: ast.AST) -> set[str]:
    out: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            f = n.func
            if isinstance(f, ast.Attribute):
                out.add(f.attr)
            elif isinstance(f, ast.Name):
                out.add(f.id)
    return out


def _is_small_cache(value: ast.AST) -> bool:
    """Rule (b) heuristic: the OUTERMOST call chain ends in an
    aggregation/limit — the cached frame is group-count-sized, far
    smaller than what rebuilding it would scan."""
    n = value
    # Walk down trailing method calls: .agg(...) / .count() etc. at the
    # top of the chain means the final frame is aggregate-shaped.
    seen: list[str] = []
    while isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute):
        seen.append(n.func.attr)
        n = n.func.value
        if len(seen) > 6:
            break
    head = seen[:3]
    return any(m in ("agg", "limit", "summary") for m in head)


def _join_right_uses(func: ast.FunctionDef, name: str) -> int:
    """Rule (c) heuristic: count uses of ``name`` as the FIRST argument
    of someone else's .join(...) — the position Catalyst may choose to
    broadcast, where checkpoint-induced stats loss flips BHJ→SMJ."""
    hits = 0
    for n in ast.walk(func):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "join"
            and n.args
        ):
            a0 = n.args[0]
            for sub in ast.walk(a0):
                if isinstance(sub, ast.Name) and sub.id == name:
                    hits += 1
                    break
    return hits


def lint_file(path: str) -> list[dict]:
    src = open(path).read()
    tree = ast.parse(src, path)
    rows: list[dict] = []
    for func in [
        n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
    ]:
        assigns: dict[str, ast.Assign] = {}
        for n in func.body:
            for sub in ast.walk(n):
                if isinstance(sub, ast.Assign) and len(sub.targets) == 1:
                    tgt = sub.targets[0]
                    if isinstance(tgt, ast.Name):
                        assigns[tgt.id] = sub
        # Rule (a) with TRANSITIVE lineage: a name is corpus-scale if
        # its own expression loads a table / calls an expensive op, OR
        # references a name that is (fixpoint over the function's
        # assignments — `ch` derived from a loaded `d` still counts).
        scale: dict[str, bool] = {}
        for name, assign in assigns.items():
            m = _method_names(assign.value)
            scale[name] = bool(m & EXPENSIVE_OPS or m & TABLE_LOADERS)
        changed = True
        while changed:
            changed = False
            for name, assign in assigns.items():
                if scale[name]:
                    continue
                refs = {
                    s.id
                    for s in ast.walk(assign.value)
                    if isinstance(s, ast.Name) and isinstance(s.ctx, ast.Load)
                }
                if any(scale.get(r, False) for r in refs):
                    scale[name] = True
                    changed = True
        for name, assign in assigns.items():
            methods = _method_names(assign.value)
            if not (methods & SHUFFLE_BUILDERS or methods & EXPENSIVE_OPS):
                continue
            checkpointed = "localCheckpoint" in methods or "persist" in methods
            # Count loads strictly after the assignment line, skipping
            # column-attribute references (``cn.k`` — same-plan column
            # access, not a re-evaluation of the frame's lineage).
            parents: dict[ast.AST, ast.AST] = {}
            for p in ast.walk(func):
                for ch in ast.iter_child_nodes(p):
                    parents[ch] = p
            uses = 0
            for n in ast.walk(func):
                if not (
                    isinstance(n, ast.Name)
                    and n.id == name
                    and isinstance(n.ctx, ast.Load)
                    and n.lineno > assign.lineno
                ):
                    continue
                par = parents.get(n)
                if (
                    isinstance(par, ast.Attribute)
                    and par.attr not in DF_METHODS
                ):
                    continue  # column reference, not a frame consumption
                uses += 1
            if uses < 2 or checkpointed:
                continue
            corpus_scale = scale[name]
            small_cache = _is_small_cache(assign.value)
            bcast_risk = _join_right_uses(func, name)
            verdict = (
                "candidate"
                if corpus_scale and small_cache and bcast_risk == 0
                else "skip"
            )
            reason = []
            if not corpus_scale:
                reason.append("recompute not corpus-scale (rule a)")
            if not small_cache:
                reason.append("cache not aggregate-shaped (rule b)")
            if bcast_risk:
                reason.append(
                    f"used as join() argument {bcast_risk}x — "
                    "broadcast-flip risk (rule c)"
                )
            rows.append(
                {
                    "file": os.path.relpath(path, REPO),
                    "func": func.name,
                    "var": name,
                    "line": assign.lineno,
                    "uses": uses,
                    "builders": sorted(methods & SHUFFLE_BUILDERS),
                    "expensive": sorted(methods & EXPENSIVE_OPS),
                    "verdict": verdict,
                    "skip_reason": "; ".join(reason) or None,
                }
            )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("paths", nargs="*", default=None)
    args = ap.parse_args()
    paths = args.paths or [
        os.path.join(REPO, "openweathermapapi_etl_spark", "plans"),
        os.path.join(REPO, "openweathermapapi_etl_spark", "operators"),
    ]
    files: list[str] = []
    for p in paths:
        files.extend(
            glob.glob(os.path.join(p, "*.py")) if os.path.isdir(p) else [p]
        )
    rows = [r for f in sorted(files) for r in lint_file(f)]
    if args.json:
        json.dump(rows, sys.stdout, indent=1)
        print()
        return
    cand = [r for r in rows if r["verdict"] == "candidate"]
    skip = [r for r in rows if r["verdict"] == "skip"]
    print(f"{len(rows)} multiply-consumed un-checkpointed frames; "
          f"{len(cand)} candidates, {len(skip)} rule-skips\n")
    for r in rows:
        mark = "CANDIDATE" if r["verdict"] == "candidate" else "skip     "
        why = f"  [{r['skip_reason']}]" if r["skip_reason"] else ""
        print(
            f"{mark} {r['file']}:{r['line']} {r['func']}.{r['var']} "
            f"uses={r['uses']}{why}"
        )


if __name__ == "__main__":
    main()
