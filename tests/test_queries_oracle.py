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


def test_driver_window_spans_all_families():
    """The correctness driver records rows for the first 50 registered
    names only (round-1 CORRECTNESS held exactly the first 50). Pin the
    curated head so a refactor can't silently push a family back out of
    the driver's verification window."""
    head = list(QUERIES)[:50]
    families = {QUERIES[n].__module__.rsplit(".", 1)[-1] for n in head}
    assert {
        "relational",
        "scalar_funcs",
        "udfs",
        "tier_c",
        "merge_q",
        "weather_q",
        "streaming_q",
    } <= families, f"driver window lost a family: {sorted(families)}"
    for prefix in ("m1_", "c0", "a03", "a10", "b4", "b5"):
        assert any(n.startswith(prefix) for n in head), prefix
