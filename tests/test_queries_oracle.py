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
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) > 0, f"{name}: rows-only check returned no rows"
        return
    odf = con.execute(ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


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
    names only (rounds 1-3: CORRECTNESS_r0N.json held exactly the first
    50). Per round-2 advisor guidance the window ROTATES: this round's
    new/changed queries lead, then every query round 3's window did NOT
    cover (stalest driver check first), and round 3's window rotates to
    the back. Pin that invariant so a refactor can't silently pin a
    fixed curated head again."""
    from openweathermapapi_etl_spark.plans import _R3_WINDOW, _R4_HEAD

    names = list(QUERIES)
    head = names[:50]
    assert head[: len(_R4_HEAD)] == _R4_HEAD, "new/changed queries must lead"
    # Every query NOT driver-checked in round 3 (checked r2 or brand
    # new) must be inside this round's window...
    stalest = set(QUERIES) - set(_R3_WINDOW)
    assert stalest <= set(head), (
        "every round-3-unchecked query must be in the first 50"
    )
    # ...and anything else in the window must be head or a round-3 name
    # rotated forward to fill the remainder.
    assert set(head) <= set(_R4_HEAD) | stalest | set(_R3_WINDOW)
    # Union of r3's window and this head = every registered query: no
    # query goes two rounds without an independent driver check.
    assert set(_R3_WINDOW) | set(head) == set(QUERIES)
