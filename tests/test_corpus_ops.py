"""Unit tests for the round-5 event-analytics and decontamination
operators: gap sessionization, key-skew profiling, and n-gram
contamination flags (their end-to-end oracle checks live in
test_queries_oracle.py; these pin the edge semantics a hash compare
on happy-path data can't distinguish)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from openweathermapapi_etl_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from openweathermapapi_etl_spark.operators.skew import key_skew_profile
from openweathermapapi_etl_spark.operators.text import contamination_flags

_TS = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

_EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_sessionize_gap_splits_sessions(spark):
    rows = [
        (1, 10, _TS(0)),
        (1, 11, _TS(1)),        # +1h → same session
        (1, 12, _TS(14)),       # +13h → new session
        (2, 20, _TS(5)),        # other user: own numbering
    ]
    out = sessionize(
        spark.createDataFrame(rows, _EV_SCHEMA),
        "user_id", "ts", gap="12 hours", tiebreak="event_id",
    )
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {10: 1, 11: 1, 12: 2, 20: 1}


def test_sessionize_gap_boundary_is_strict(spark):
    # exactly 12h later is NOT a new session (strict >, matching the
    # oracle's `ts > lag(ts) + INTERVAL 12 HOUR`)
    rows = [(1, 10, _TS(0)), (1, 11, _TS(12))]
    out = sessionize(
        spark.createDataFrame(rows, _EV_SCHEMA), "user_id", "ts"
    )
    assert {r.session_seq for r in out.collect()} == {1}


def test_sessionize_drops_null_user_and_ts(spark):
    rows = [(1, 10, _TS(0)), (None, 11, _TS(1)), (1, 12, None)]
    out = sessionize(
        spark.createDataFrame(rows, _EV_SCHEMA), "user_id", "ts"
    )
    assert [r.event_id for r in out.collect()] == [10]


def test_session_stats_start_end_and_aggs(spark):
    rows = [(1, 10, _TS(0)), (1, 11, _TS(2)), (1, 12, _TS(20))]
    sessions = sessionize(
        spark.createDataFrame(rows, _EV_SCHEMA),
        "user_id", "ts", gap="12 hours", tiebreak="event_id",
    )
    out = session_stats(
        sessions, "user_id", "ts", [F.count("*").alias("n_events")]
    ).orderBy("session_seq").collect()
    assert [(r.session_seq, r.n_events) for r in out] == [(1, 2), (2, 1)]
    assert out[0].session_start == _TS(0) and out[0].session_end == _TS(2)


def test_key_skew_profile_shares_ranks_and_null_key(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [(None,)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("k", T.StringType())])
    )
    out = {r.k: r for r in key_skew_profile(df, "k", top_k=3).collect()}
    assert out["a"].n == 6 and abs(out["a"].share - 0.6) < 1e-12
    assert out["a"].rnk == 1 and out["b"].rnk == 2
    # NULL is profiled as its own (hot) key, not silently dropped
    assert out[None].n == 1 and out[None].rnk == 3
    top2 = key_skew_profile(df, "k", top_k=2).collect()
    assert {r.k for r in top2} == {"a", "b"}


def test_contamination_flags_hits_and_short_docs(spark):
    docs = [
        (1, "w1 w2 w3 w4 w5", True),    # eval: grams {w1..w4, w2..w5}
        (2, "z w2 w3 w4 w5 q", False),  # train: shares gram w2..w5
        (3, "x1 x2 x3 x4 x5", False),   # train: clean
        (4, "w1 w2 w3", False),         # train: < n tokens → no grams
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "ev"])
    out = {r.doc_id: r for r in
           contamination_flags(df, "text", "doc_id", F.col("ev"), n=4).collect()}
    assert set(out) == {2}  # only the contaminated doc is flagged
    assert out[2].n_grams == 3 and out[2].n_hits == 1
    assert abs(out[2].hit_frac - 1 / 3) < 1e-12


def test_contamination_flags_eval_docs_never_flagged(spark):
    # two identical eval docs share all grams with each other but must
    # not appear in the output (it reports TRAINING contamination only)
    docs = [(1, "a b c d e", True), (2, "a b c d e", True),
            (3, "a b c d x", False)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "ev"])
    out = contamination_flags(df, "text", "doc_id", F.col("ev"), n=4)
    assert [r.doc_id for r in out.collect()] == [3]


def test_energy_frames_partial_frame_dropped_and_segments_split(spark):
    from openweathermapapi_etl_spark.operators.multimodal import (
        energy_frames,
        energy_segments,
    )

    rows = [
        (1, bytes([200] * 8 + [0] * 8 + [200] * 8 + [1, 2, 3])),  # 2 full + tail
        (2, bytes([5] * 7)),  # shorter than one frame -> no rows
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    frames = energy_frames(df, "id", "payload", frame_bytes=8)
    got = {(r.id, r.frame_idx, r.energy) for r in frames.collect()}
    assert got == {(1, 0, 1600), (1, 1, 0), (1, 2, 1600)}
    segs = energy_segments(frames, "id", threshold=100).collect()
    assert {(s.id, s.seg_start, s.seg_end, s.n_frames) for s in segs} == {
        (1, 0, 0, 1),
        (1, 2, 2, 1),
    }


def test_delta_lsh_corpus_side_bucket_cap(spark):
    """The incremental band join caps CORPUS-side buckets: a
    boilerplate bucket must not fan every matching delta doc into
    itself."""
    from pyspark.sql import Row

    from openweathermapapi_etl_spark.operators.dedup import (
        delta_lsh_candidates,
        minhash_signature,
    )

    boiler = "the same boilerplate text repeated again and again forever"
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=boiler) for i in range(10)]
        + [Row(doc_id=100, text="a genuinely unique document about spark")]
    )
    delta = spark.createDataFrame([Row(doc_id=1000, text=boiler)])
    cs = minhash_signature(corpus, "text", "doc_id", k=8)
    ds = minhash_signature(delta, "text", "doc_id", k=8)
    uncapped = delta_lsh_candidates(cs, ds, "doc_id", max_bucket=None)
    assert uncapped.count() == 10  # delta doc matches every boiler copy
    capped = delta_lsh_candidates(cs, ds, "doc_id", max_bucket=5)
    assert capped.count() == 0  # the oversized bucket is dropped wholesale


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing selection guarantee (Schleimer et al.): two
    documents sharing a token run of length >= w+n-1 must share at
    least one selected fingerprint."""
    from pyspark.sql import Row

    from openweathermapapi_etl_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= w+n-1 = 6
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two three {shared} four five six"),
            Row(doc_id=2, text=f"seven eight {shared} nine ten eleven"),
            Row(doc_id=3, text="totally different words in this document here"),
        ]
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", n=3, w=4)
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_match_pairs(fps, "doc_id", min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnowing_short_docs_emit_their_minimum(spark):
    """Documents with fewer than w shingles have no full window; they
    must emit their whole-sequence minimum, not ZERO fingerprints —
    the old full-windows-only filter made short documents (including
    byte-identical ones) invisible to the match stage (r11 review
    catch). Two identical 5-token docs must match; a 2-token doc
    (too short to shingle at n=3) stays fingerprint-free."""
    from pyspark.sql import Row

    from openweathermapapi_etl_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="tiny quoted phrase appears here"),  # 5 toks
            Row(doc_id=2, text="tiny quoted phrase appears here"),
            Row(doc_id=3, text="unrelated little snippet of words"),
            Row(doc_id=4, text="too short"),  # < n tokens: no shingles
        ]
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", n=3, w=4)
    by_doc = {r.doc_id for r in fps.collect()}
    assert {1, 2, 3} <= by_doc, "short docs must emit >= 1 fingerprint"
    assert 4 not in by_doc, "shingle-free docs stay fingerprint-free"
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_match_pairs(fps, "doc_id", min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)
