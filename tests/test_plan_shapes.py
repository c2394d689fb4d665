"""Physical-plan shape guards: the scale properties SCALE.md claims
(broadcast joins on dims, filter pushdown into scans, TakeOrderedAndProject
top-k, no accidental cartesian products) asserted as tests so a plan
regression fails CI, not a 100 TB run. See PLANS.md for the full audit.
"""

from __future__ import annotations

import contextlib
import io
import re

from openweathermapapi_etl_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_flagship_broadcasts_dims_no_cartesian(spark):
    s = plan_of(spark, "flagship_q3")
    assert s.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in s
    # all three scans receive pushed filters
    assert len([m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", s) if m]) == 3


def test_filters_push_into_parquet_scan(spark):
    s = plan_of(spark, "b07_filter_predicates")
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", s))
    for col in ("o_orderdate", "o_totalprice"):
        assert col in pushed, f"{col} not pushed into the scan"


def test_topk_plans_take_ordered_no_global_sort(spark):
    s = plan_of(spark, "b27_top_k")
    assert "TakeOrderedAndProject" in s


def test_range_join_keeps_equi_prefix_hash_join(spark):
    s = plan_of(spark, "b14_range_join")
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s
    assert "CartesianProduct" not in s


def test_salted_agg_is_two_stage(spark):
    # two groupBys → (partial+final) pairs: at least 3 HashAggregate
    # nodes and exactly one exchange keyed on the salt stage
    s = plan_of(spark, "b16_salted_agg")
    assert s.count("HashAggregate") >= 3


def test_groupby_agg_has_partial_aggregation(spark):
    s = plan_of(spark, "b16_groupby_agg")
    assert "partial_sum" in s  # map-side combine before the exchange


def test_ivf_plan_single_corpus_scoring_pass(spark):
    """The round-3 IVF rewrite (operators/similarity.py): the corpus×
    centroid scoring runs ONCE inside the inverted-file aggregation and
    the re-rank joins the carried vectors instead of rescanning. Pin the
    shape: no sort-merge joins, ≤4 shuffles (inverted-file groupBy + two
    small windows), exactly 2 keyless broadcast NLJs (full-corpus
    assignment + query-slice probing — a third would mean the corpus is
    being rescored), and 4 scans (round 1's two-pass shape had more of
    all of these: 22 exchanges / 2 SMJ)."""
    s = plan_of(spark, "c03_cosine_topk_ivf")
    tree = s.split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert len(re.findall(r"\bExchange\b", tree)) <= 4
    assert tree.count("BroadcastNestedLoopJoin") == 2
    assert tree.count("Scan parquet") == 4


def test_bucketed_join_has_zero_exchanges(spark):
    """The whole point of bucketing: the fact⋈fact sort-merge join must
    read co-located buckets with NO shuffle in the plan."""
    s = plan_of(spark, "b10_bucketed_colocated_join")
    assert "SortMergeJoin" in s
    assert "Exchange" not in s
