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
# only (observed in rounds 1-2: CORRECTNESS_r0{1,2}.json each held
# exactly the first 50 registered names of that round). Per round-2
# advisor guidance the window is ROTATED each round rather than pinned
# to a fixed curated head, so every query regains an independent
# driver check on a cycle and a regression can't hide outside the
# window indefinitely:
#
#   head  = this round's NEW or CHANGED queries (first-time / re-
#           verification is mandatory),
#   then  = queries whose last driver check is OLDEST (round 1's
#           window-excluded set, i.e. everything not in round 2's
#           window),
#   tail  = round 2's window (most recently verified).
#
# Independent of the window, tools/check_parity.py runs ALL queries
# (full output committed per round as PARITY_r{N}.txt) and the pytest
# oracle suite re-verifies every query at sf0.001 on each run.

# Round 2's driver window (== CORRECTNESS_r02.json keys): these are the
# most recently driver-verified, so they rotate to the BACK this round.
_R2_WINDOW = [
    "flagship_q3",
    "m1_keyed_upsert",
    "m1_versioned_upsert_idempotent",
    "m1_partitioned_upsert",
    "a03_weather_transform",
    "a10_weather_pipeline_e2e",
    "c01_exact_dedup",
    "c02_minhash_signatures",
    "c02_lsh_candidates",
    "c02_simhash",
    "c02_ngram_jaccard",
    "c02_embedding_neardup",
    "c02_minhash_fast",
    "c03_cosine_topk",
    "c03_cosine_topk_lsh",
    "c03_cosine_topk_ivf",
    "c04_token_stats",
    "c04_langid",
    "c04_quality_score",
    "c04_fingerprint",
    "c05_binary_roundtrip",
    "c05_decode_mapinpandas",
    "c05_resize",
    "c05_frame_sample",
    "c05_feature_extract",
    "b38_stream_microbatch_count",
    "b39_watermark_late_drop",
    "b40_tumbling_window",
    "b41_sliding_window",
    "b42_session_window",
    "b43_streaming_dedup",
    "b44_foreachbatch_upsert",
    "b50_stateful_running_agg",
    "b51_stream_stream_join",
    "b52_stream_static_join",
    "b45_scalar_udf",
    "b46_pandas_udf",
    "b47_grouped_map",
    "b48_udtf_explode",
    "b49_pandas_udaf",
    "b35_explode",
    "b36_map_funcs",
    "b37_json_funcs",
    "b16_groupby_agg",
    "b10_inner_join",
    "b15_asof_join",
    "b23_ranking_windows",
    "b01_parquet_scan",
    "b04_parquet_sink_roundtrip",
    "b06_select_expr",
]

# This round's NEW queries and queries whose code or oracle CHANGED —
# they need a first-time / fresh driver check, so they lead the window.
_R3_HEAD = [
    "b43_streaming_dedup_watermarked",     # NEW: bounded-state dedup
    "b51_stream_stream_join_watermarked",  # NEW: bounded-state join
    "b16_approx_percentile",               # NEW: sketch percentile
    "c03_cosine_topk_ivf",                 # plan rewritten (1-pass IVF)
    "b44_foreachbatch_upsert",             # oracle boundary ceil fix
    "m1_keyed_upsert",                     # null-safe anti join
    "m1_versioned_upsert_idempotent",      # null-safe anti join
    "m1_partitioned_upsert",               # null-safe anti join
]


def _reorder() -> None:
    # A typo'd / renamed / not-yet-implemented name in a priority list
    # must fail LOUDLY, not silently shrink the window (round-2 advisor:
    # three reserved-but-unimplemented names silently filtered out).
    stale = (set(_R3_HEAD) | set(_R2_WINDOW)) - set(QUERIES)
    if stale:
        raise AssertionError(f"priority lists name unknown queries: {sorted(stale)}")
    head = list(_R3_HEAD)
    in_head, in_r2 = set(head), set(_R2_WINDOW)
    # Oldest driver check first: everything round 2's window excluded.
    rotated = [n for n in QUERIES if n not in in_r2 and n not in in_head]
    tail = [n for n in _R2_WINDOW if n not in in_head]
    ordered = head + rotated + tail
    q_snap, o_snap = dict(QUERIES), dict(ORACLES)
    QUERIES.clear()
    QUERIES.update({n: q_snap[n] for n in ordered})
    ORACLES.clear()
    ORACLES.update({n: o_snap[n] for n in ordered if n in o_snap})


_reorder()
