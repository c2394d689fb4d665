"""The mutation audit as a pytest (r14 verdict order #1): every seeded
semantic bug must meet its expectation — caught by the parity
comparator (oracle-backed targets) or the rows-only comparator
(streaming/hash targets), or be a documented expected-survivor whose
compensating value-level pin lives in tests/test_mutation_pins.py.

This is the sensitivity proof of the correctness gate itself: 361
green parity rows show agreement; this shows the gate would NOTICE
disagreement."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "mutation_audit", os.path.join(REPO, "tools", "mutation_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["mutation_audit"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_mutation_meets_expectation(spark, tmp_path):
    tool = _load_tool()
    fixture = os.path.join(str(tmp_path), "mutation_fixture")
    summary = tool.run_audit(spark, fixture, sanity=True, log=lambda s: None)
    assert summary["unexpected"] == [], summary
    # The audit is only meaningful at its designed size: all
    # registered mutations ran, none errored out.
    assert summary["total"] == len(tool.MUTATIONS)
    errs = [r for r in summary["results"] if r["outcome"] == "error"]
    assert not errs, errs
    # The two documented survivors are exactly the value-preserving
    # rows-only mutations, each naming its compensating pin.
    assert sorted(summary["expected_survivors"]) == [
        "b43e_key_shift", "c02_minhash_fast_wrong_family",
    ]
    for r in summary["results"]:
        if r["outcome"] == "survived":
            assert r.get("compensation", "").startswith(
                "tests/test_mutation_pins.py::"
            )
