"""Value-level pins compensating the rows-only driver checks (r14
verdict order #1 + #6 context).

The rows-only trio (b39_watermark_late_drop,
b43_streaming_dedup_watermarked_evicting, c02_minhash_fast) get only a
row-count check from the driver — tools/mutation_audit.py demonstrates
that value-preserving mutations (a +1 key shift, a swapped hash family)
survive that check. These tests are the compensating controls: each
pins the VALUES of a rows-only query through an independently computed
expectation, so the mutation classes the driver cannot see are caught
here. mutation_audit's expected-survivor entries name these tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from openweathermapapi_etl_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_minhash_fast_golden_signatures(spark):
    """c02_minhash_fast's whole point is the xxhash64 hash family; a
    silent family swap (mutation_audit::c02_minhash_fast_wrong_family)
    keeps one-row-per-doc and sails through the rows-only check. Pin
    the exact signature values for three fixed texts — xxhash64 with
    the pinned seed is a stable Spark intrinsic, so these goldens are
    deterministic across runs and machines."""
    from openweathermapapi_etl_spark.operators.dedup import minhash_signature

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow today now"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        tuple(r)
        for r in minhash_signature(
            df, "text", "doc_id", k=8, portable=False
        ).collect()
    }
    golden = {
        (1, 136165696, 226942915, 6721305, 248028506,
         151982655, 69904715, 80047596, 357387295),
        (2, 159031510, 148969129, 61630635, 477094795,
         301008951, 98726462, 319557708, 513719263),
        (3, 175298064, 68795761, 75695657, 412123104,
         58042205, 62923359, 20205257, 33905904),
    }
    assert got == golden
    # And the registered query really runs the fast family: same
    # pipeline over the corpus must NOT equal the portable twin.
    fast = QUERIES["c02_minhash_fast"](spark, SF).collect()
    portable = {
        tuple(r) for r in QUERIES["c02_minhash_signatures"](spark, SF).collect()
    }
    assert len(fast) == len(portable)  # rows-only part (the driver's view)
    assert {tuple(r) for r in fast} != portable  # the value-level part


def test_b43e_output_multiset_pinned_to_event_pairs(spark):
    """b43_streaming_dedup_watermarked_evicting value pin: every
    emitted (user_id, event_type) must be a REAL distinct pair from
    events, every distinct pair must be emitted at least once (first
    arrival always emits), and no pair more than twice (once per
    arrival batch — eviction can re-emit a batch-1 key in batch 2, and
    there are exactly two batches). The key-shift mutant
    (mutation_audit::b43e_key_shift) keeps the row count but emits
    pairs for a user id that does not exist — caught here, invisible
    to the driver's rows-only check."""
    out = QUERIES["b43_streaming_dedup_watermarked_evicting"](
        spark, SF
    ).collect()
    got = [(r.user_id, r.event_type) for r in out]
    real_pairs = {
        (r.user_id, r.event_type)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type").distinct().collect()
    }
    assert set(got) == real_pairs          # values, not just cardinality
    counts: dict = {}
    for p in got:
        counts[p] = counts.get(p, 0) + 1
    assert all(1 <= c <= 2 for c in counts.values()), (
        {p: c for p, c in counts.items() if c > 2}
    )


def test_b39_emitted_windows_match_on_time_batch_agg(spark):
    """b39_watermark_late_drop value pin: every emitted finalized
    window must carry EXACTLY the batch-side count of ON-TIME events
    (ts >= the same median split b39 computes) for that (window,
    event_type) — i.e. the late half contributed nothing and no count
    is distorted. A wrong-valued aggregation that happens to keep the
    emitted-window count would pass the driver's rows-only check but
    not this."""
    from openweathermapapi_etl_spark.plans.streaming_q import _SPARK_FMT_S
    from openweathermapapi_etl_spark.plans.util import t

    out = QUERIES["b39_watermark_late_drop"](spark, SF).collect()
    assert out, "b39 emitted no finalized windows — replay degenerated"
    events = t(spark, SF, "events")
    mid_ts = events.selectExpr(
        "CAST(percentile_approx(CAST(ts AS DOUBLE), 0.5) AS TIMESTAMP) AS m"
    ).collect()[0][0]
    on_time = events.filter(
        (F.col("ts") >= F.lit(mid_ts)) | F.col("ts").isNull()
    )
    batch = {
        (r.window_start, r.event_type): r.n
        for r in on_time.groupBy(
            F.window("ts", "5 minutes"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("window.start", _SPARK_FMT_S).alias("window_start"),
            "event_type",
            "n",
        )
        .collect()
    }
    for r in out:
        assert batch.get((r.window_start, r.event_type)) == r.n, (
            r, batch.get((r.window_start, r.event_type))
        )
