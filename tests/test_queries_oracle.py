"""The t2 gate as a test: every registered query vs its DuckDB oracle
at sf0.001 (SURVEY.md §5.2 item 2). One parametrized test per query so
failures localize."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_parity import compare, duck_con  # noqa: E402

from openweathermapapi_etl_spark.plans import ORACLES, QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    from openweathermapapi_etl_spark.plans.registry import (
        canonicalizable_violations,
    )

    df = QUERIES[name](spark, SF_DIR)
    # Driver output contract: no top-level array/map/struct columns —
    # the driver's pandas canonicalizer throws `unhashable type` on
    # them (round-6 red row c03_pq_encode). Checked on every query so
    # the failure class cannot be reintroduced.
    bad = canonicalizable_violations(df.schema)
    assert not bad, f"{name}: non-canonicalizable output columns {bad}"
    sdf = df.toPandas()
    if name not in ORACLES:
        assert len(sdf) > 0, f"{name}: rows-only check returned no rows"
        return
    odf = con.execute(ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_output_contract_checker_flags_raw_arrays(spark):
    """The contract checker itself: a raw array column is flagged, its
    stringified twin passes — proving the per-query assertion above
    would have caught round 6's `c03_pq_encode` regression."""
    from pyspark.sql import functions as F

    from openweathermapapi_etl_spark.plans.registry import (
        canonicalizable_violations,
    )

    raw = spark.range(3).select("id", F.array(F.lit(1), F.lit(2)).alias("codes"))
    assert canonicalizable_violations(raw.schema) == ["codes: array<int>"]
    fixed = raw.select(
        "id", F.concat_ws("-", F.col("codes").cast("array<string>")).alias("codes")
    )
    assert canonicalizable_violations(fixed.schema) == []


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_driver_window_rotates_to_stalest_checked():
    """The correctness driver records rows for the first 50 registered
    names only. The window ROTATES each round; since round 5 the head
    is DERIVED (tools/changed_queries.py: git diff → module → reverse
    transitive import closure → registered queries) instead of
    hand-curated, with this round's NEW queries promoted to the very
    front (never-driver-checked outranks changed-but-green). This
    round the closure (127 affected) overflows the 50-slot window, so
    the invariant is: the derived head leads in order (the window is
    entirely new + affected names, truncating only the lower-risk
    transitive tail), the overflow ranks immediately after the window
    (stalest for the next rotation), and round 5's window rotates to
    the back."""
    from openweathermapapi_etl_spark.plans import _R5_WINDOW, _R6_HEAD

    names = list(QUERIES)
    assert names[: len(_R6_HEAD)] == _R6_HEAD, "affected queries must lead"
    # The previous round's window rotates to the back (minus names
    # promoted into the head).
    tail = [n for n in _R5_WINDOW if n not in set(_R6_HEAD)]
    assert names[-len(tail):] == tail, "round-5 window must rotate to the back"
    # Everything in between is the stale remainder; nothing lost.
    middle = names[len(_R6_HEAD):-len(tail)]
    assert set(middle) == set(QUERIES) - set(_R6_HEAD) - set(tail)
    # Every name the 50-slot window sheds this round is either covered
    # by round 5's window (checked last round) or ranked ahead of all
    # round-5-checked names for the next rotation — no query is both
    # dropped from the window AND deprioritized behind fresher names.
    window = set(names[:50])
    for n in set(QUERIES) - window - set(_R5_WINDOW):
        assert names.index(n) < len(names) - len(tail), n
    # The queries whose operator code materially changed this round
    # (the rank.py pin rework) sit INSIDE the driver window.
    for n in ("b26_global_rank", "c07_token_budget_sample",
              "m5_compaction_plan"):
        assert names.index(n) < 50, n
