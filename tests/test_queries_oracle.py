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
    # rows_only_by_design() (r11 verdict Next #5): exactly the queries
    # with NO oracle, each with a non-empty reason — so the driver's
    # err:no_oracle rendering of these three has a self-explaining
    # pass-through and a silently oracle-less query cannot register.
    rob = mod.rows_only_by_design()
    assert set(rob) == set(mod.queries()) - set(mod.oracle_sql())
    assert all(isinstance(r, str) and r for r in rob.values())
    assert set(rob) == {
        "b39_watermark_late_drop",
        "b43_streaming_dedup_watermarked_evicting",
        "c02_minhash_fast",
    }


def test_register_requires_oracle_or_documented_reason():
    """Oracle-lessness must be a documented decision: register() with
    neither an oracle nor a rows_only_reason (or with both) raises."""
    import pytest as _pytest

    from openweathermapapi_etl_spark.plans.registry import register

    with _pytest.raises(ValueError, match="no oracle and no rows_only_reason"):
        register("zz_test_no_oracle")(lambda spark, sf: None)
    with _pytest.raises(ValueError, match="BOTH an oracle and a"):
        register("zz_test_both", oracle="SELECT 1", rows_only_reason="x")(
            lambda spark, sf: None
        )
    assert "zz_test_no_oracle" not in QUERIES
    assert "zz_test_both" not in QUERIES


def test_driver_window_rotates_to_stalest_checked():
    """The correctness driver records rows for the first 50 registered
    names only. The window ROTATES each round; the head is DERIVED
    (tools/changed_queries.py: {never driver-checked} ∪ {git diff →
    module → reverse transitive import closure → registered queries}),
    with never-checked names at the very front (round-6 verdict: the
    old rule stranded b23_distribution_windows outside every window).
    Invariants: the head leads in order, the overflow ranks
    immediately after the window (stalest for the next rotation), and
    the previous round's window rotates to the back."""
    from openweathermapapi_etl_spark.plans import _HEAD, _PREV_WINDOW

    names = list(QUERIES)
    assert names[: len(_HEAD)] == _HEAD, "affected queries must lead"
    # The previous round's window rotates to the back (minus names
    # promoted into the head).
    tail = [n for n in _PREV_WINDOW if n not in set(_HEAD)]
    assert names[-len(tail):] == tail, "previous window must rotate to the back"
    # Everything in between is the stale remainder; nothing lost.
    middle = names[len(_HEAD):-len(tail)]
    assert set(middle) == set(QUERIES) - set(_HEAD) - set(tail)
    # Every name the 50-slot window sheds this round is either covered
    # by round 6's window (checked last round) or ranked ahead of all
    # round-6-checked names for the next rotation — no query is both
    # dropped from the window AND deprioritized behind fresher names.
    window = set(names[:50])
    for n in set(QUERIES) - window - set(_PREV_WINDOW):
        assert names.index(n) < len(names) - len(tail), n


def test_driver_window_covers_every_never_checked_query():
    """Round-6 verdict Wrong #2, made structural: the 50-slot driver
    window must be OPTIMALLY FILLED — no slot may hold an
    already-green, unchanged query while a never-driver-checked one
    (or a pinned recheck) waits outside. When candidates outnumber
    slots (registrations outpace the window), stranding is allowed
    only as pure overflow, and the overflow must queue IMMEDIATELY
    after the window so it is head-of-line next round — bounded at
    one round, never indefinite."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from changed_queries import never_driver_checked

    from openweathermapapi_etl_spark.plans import _RECHECK

    names = list(QUERIES)
    must_fill = set(never_driver_checked(names)) | set(_RECHECK)
    window = names[:50]
    if len(must_fill) <= 50:
        outside = sorted(must_fill - set(window))
        assert not outside, (
            f"never-driver-checked queries outside a non-full window: {outside}"
        )
    else:
        # Overflow round: every slot goes to a candidate...
        wasted = [n for n in window if n not in must_fill]
        assert not wasted, f"window slots wasted on already-checked: {wasted}"
        # ...and the stranded candidates sit directly after the window
        # (positions 50..50+overflow-1), head-of-line for next round.
        n_over = len(must_fill) - 50
        after = names[50 : 50 + n_over]
        assert set(after) <= must_fill and set(window) | set(after) == must_fill


def test_cached_agg_plan_reads_from_cache(spark):
    """b67's contract: the aggregate's executed plan must scan the
    InMemoryRelation, not the parquet source — a silent cache miss is
    a plan regression, not just a perf vibe."""
    from openweathermapapi_etl_spark.plans import QUERIES

    df = QUERIES["b67_cached_agg_reuse"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" in plan, plan
    spark.catalog.uncacheTable("b67_cached_cust")


def test_session_temp_view_not_visible_across_sessions(spark):
    """b71's negative contract: a SESSION temp view does not cross the
    session boundary (that isolation is why global_temp exists)."""
    import pytest

    spark.range(3).createOrReplaceTempView("b71_session_only")
    sibling = spark.newSession()
    with pytest.raises(Exception, match="b71_session_only"):
        sibling.table("b71_session_only").collect()
