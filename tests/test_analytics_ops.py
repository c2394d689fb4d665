"""Unit tests for the round-7 analytics batch: exact set-similarity
join (prefix filtering), sequence islands, drawdown, and CDC
changelog compaction — the operator-level pins behind analytics_q.py
(the oracle suite covers the registered query surfaces)."""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

from pyspark.sql import functions as F

from openweathermapapi_etl_spark.operators.sequences import (
    cdc_latest_state,
    max_drawdown,
    sequence_islands,
)
from openweathermapapi_etl_spark.operators.setsim import setsim_join


# ---------------------------------------------------------------------------
# setsim_join — exact, no false negatives, tau boundary
# ---------------------------------------------------------------------------


def _brute_pairs(docs: list[tuple[int, str]], tau: Fraction, n: int = 3):
    """Pure-Python all-pairs Jaccard on distinct word n-gram sets."""

    def sset(text: str) -> frozenset[str]:
        tk = text.split(" ")
        return frozenset(
            " ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)
        )

    out = {}
    for (ia, ta), (ib, tb) in combinations(sorted(docs), 2):
        sa, sb = sset(ta), sset(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if inter * tau.denominator >= uni * tau.numerator:
            out[(ia, ib)] = (inter, uni)
    return out


def test_setsim_matches_bruteforce(spark):
    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),          # exact dup of 1
        (3, "a b c d e f g x"),          # near dup of 1 (shares 5/7+ shingles)
        (4, "x y z w v u t s"),          # unrelated
        (5, "q r"),                      # too short: empty shingle set
        (6, "x y z w v u t r"),          # near dup of 4
    ]
    tau = Fraction(1, 2)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in setsim_join(df, "doc_id", "text", tau=tau).collect()
    }
    assert got == _brute_pairs(docs, tau)


def test_setsim_positional_dedup_matches_distinct(spark):
    """r15 pin: ``pair_dedup="positional"`` (the PPJoin/VernicaJoin
    first-shared-prefix-token filter — keep a joined row only when its
    token is the SMALLEST the two prefixes share) must produce the
    identical verified pair set as the DISTINCT spelling — on a corpus
    where pairs share SEVERAL prefix tokens (exact dups), at both a
    loose and a tight tau, against the same brute-force truth."""
    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (3, "a b c d e f g x"),
        (4, "x y z w v u t s"),
        (5, "q r"),
        (6, "x y z w v u t r"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for tau in (Fraction(1, 2), Fraction(4, 5)):
        def res(mode):
            return {
                (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
                for r in setsim_join(
                    df, "doc_id", "text", tau=tau, pair_dedup=mode
                ).collect()
            }
        want = _brute_pairs(docs, tau)
        assert res("positional") == res("distinct") == want, tau


def test_setsim_positional_bound_keeps_deepest_qualifying_row(spark):
    """r15 resume pin for the PPJoin POSITIONAL UPPER-BOUND prune
    (keep a joined prefix row only when 1 + min(|a|-i, |b|-j) can
    still reach the overlap Jaccard >= tau requires): a pair engineered
    to sit exactly AT tau with its first shared token at the DEEPEST
    admissible prefix position (i = j = 3 of 4, sizes 6+6, overlap
    exactly alpha = 4) must survive — an off-by-one in the bound
    prunes it and this test fails — while a sub-tau pair whose only
    shared prefix token sits one position deeper is pruned at the join
    (positional mode; the distinct mode rejects it at verification)
    and must simply be absent. Both modes must agree. Unigram sets
    (shingle_n=None) so the rank positions are constructed exactly:
    private tokens occur once (rarest — ranked first), shared tokens
    twice, so each doc's sorted rank array is [privates...,
    shared...]."""
    docs = [
        (1, "p1 p2 c1 c2 c3 c4"),   # A: J(A,B) = 4/8 = tau exactly
        (2, "q1 q2 c1 c2 c3 c4"),   # B: first shared c1 at pos 3/6
        (3, "r1 r2 r3 d1 d2 d3"),   # C: J(C,D) = 3/9 < tau; only
        (4, "s1 s2 s3 d1 d2 d3"),   # D: shared prefix token d1 at pos 4
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for mode in ("distinct", "positional"):
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
            for r in setsim_join(
                df,
                "doc_id",
                "text",
                tau=Fraction(1, 2),
                shingle_n=None,
                pair_dedup=mode,
            ).collect()
        }
        assert got == {(1, 2): (4, 8)}, mode


def test_setsim_tau_boundary_is_exact(spark):
    # Sets engineered to land EXACTLY on tau: inter=4, uni=8, tau=1/2.
    # 'a b c d e f' -> shingles {abc,bcd,cde,def}; adding ' x a b c d e f'
    # style suffixes shifts the set. Construct via explicit shingle
    # control: 6 shared tokens + 2 private per side gives inter=4, and
    # each side has 6 shingles -> uni = 8.
    a = "s1 s2 s3 s4 s5 s6 a1 a2"  # shingles: 6 total, 4 shared (s1..s4 starts)
    b = "s1 s2 s3 s4 s5 s6 b1 b2"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    rows = setsim_join(df, "doc_id", "text", tau=Fraction(1, 2)).collect()
    assert [(r["inter"], r["uni"]) for r in rows] == [(4, 8)]
    # One notch above the boundary excludes the pair: integer compare,
    # no float epsilon at the threshold.
    assert setsim_join(df, "doc_id", "text", tau=Fraction(9, 16)).count() == 0


# ---------------------------------------------------------------------------
# sequence_islands — partition-boundary correctness
# ---------------------------------------------------------------------------


def test_sequence_islands_across_partitions(spark):
    # Islands: [1..5], [8..9], [100], [102..104]. Force few-row range
    # partitions so islands span partition boundaries — the rank-based
    # construction must still merge them (no per-partition seams).
    ids = [1, 2, 3, 4, 5, 8, 9, 100, 102, 103, 104]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = sorted(
        (r["island_start"], r["island_end"], r["n_ids"])
        for r in sequence_islands(df, "id", num_partitions=4).collect()
    )
    assert got == [(1, 5, 5), (8, 9, 2), (100, 100, 1), (102, 104, 3)]


def test_sequence_islands_dedups_ids(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (4,)], ["id"])
    got = sorted(
        (r["island_start"], r["island_end"], r["n_ids"])
        for r in sequence_islands(df, "id").collect()
    )
    assert got == [(1, 2, 2), (4, 4, 1)]


def test_sequence_islands_excludes_null_ids(spark):
    """A NULL id has no position on the number line — it must not
    surface as a spurious (NULL, NULL, 1) island corrupting downstream
    gap accounting (r11 review catch)."""
    df = spark.createDataFrame([(1,), (2,), (None,), (4,)], "id int")
    got = sorted(
        (r["island_start"], r["island_end"], r["n_ids"])
        for r in sequence_islands(df, "id").collect()
    )
    assert got == [(1, 2, 2), (4, 4, 1)]


# ---------------------------------------------------------------------------
# max_drawdown
# ---------------------------------------------------------------------------


def test_max_drawdown_hand_case(spark):
    # Series: 10, 7, 12, 4, 9 -> peaks 10,10,12,12,12; drawdowns
    # 0,3,0,8,3 -> max 8. A key that only rises has drawdown 0.
    rows = [("u", i, v) for i, v in enumerate([10.0, 7.0, 12.0, 4.0, 9.0])]
    rows += [("v", i, v) for i, v in enumerate([1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, ["k", "seq", "val"])
    got = {
        r["k"]: (r["peak"], r["max_drawdown"])
        for r in max_drawdown(df, "k", ["seq"], "val").collect()
    }
    assert got == {"u": (12.0, 8.0), "v": (3.0, 0.0)}


# ---------------------------------------------------------------------------
# cdc_latest_state
# ---------------------------------------------------------------------------


def test_cdc_latest_state_semantics(spark):
    log = [
        # key 1: U, U -> survives with last value, 2 versions
        (1, 1, "U", 10.0),
        (1, 2, "U", 11.0),
        # key 2: U then D -> tombstoned
        (2, 1, "U", 20.0),
        (2, 2, "D", None),
        # key 3: D then U -> the delete is NOT last, key survives
        (3, 1, "D", None),
        (3, 2, "U", 30.0),
    ]
    df = spark.createDataFrame(log, ["k", "seq", "op", "val"])
    got = {
        r["k"]: (r["val"], r["n_versions"])
        for r in cdc_latest_state(df, "k", ["seq"], "op").collect()
    }
    assert got == {1: (11.0, 2), 3: (30.0, 2)}


# ---------------------------------------------------------------------------
# spatial: grid radius join (operators/spatial.py)
# ---------------------------------------------------------------------------


def test_grid_radius_join_matches_cross_product(spark):
    """The grid rewrite must equal the naive cross join + distance
    filter exactly — no false negatives at cell borders."""
    from pyspark.sql import functions as F

    from openweathermapapi_etl_spark.operators.spatial import (
        grid_radius_join,
        hash_coord,
    )

    left = spark.range(200).select(
        F.col("id").alias("lid"),
        hash_coord("x", "id").alias("lx"),
        hash_coord("y", "id").alias("ly"),
    )
    right = spark.range(300, 380).select(
        F.col("id").alias("rid"),
        hash_coord("x", "id").alias("rx"),
        hash_coord("y", "id").alias("ry"),
    )
    r = 0.11
    got = {
        (x.lid, x.rid)
        for x in grid_radius_join(
            left, right, ("lx", "ly"), ("rx", "ry"), r
        ).collect()
    }
    d2 = (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx")) + (
        F.col("ly") - F.col("ry")
    ) * (F.col("ly") - F.col("ry"))
    want = {
        (x.lid, x.rid)
        for x in left.crossJoin(right)
        .filter(d2 <= F.lit(r) * F.lit(r))
        .collect()
    }
    assert got == want and len(want) > 0


def test_grid_radius_join_exact_boundary_pair_included(spark):
    """dist == r exactly (axis-aligned, adjacent cells) must match."""
    from openweathermapapi_etl_spark.operators.spatial import grid_radius_join

    left = spark.createDataFrame([(1, 0.10, 0.50)], "lid int, lx double, ly double")
    right = spark.createDataFrame(
        [(9, 0.15, 0.50), (8, 0.1500001, 0.50)], "rid int, rx double, ry double"
    )
    out = grid_radius_join(left, right, ("lx", "ly"), ("rx", "ry"), 0.05)
    assert [r.rid for r in out.collect()] == [9]


def test_grid_radius_join_rejects_shared_column_names(spark):
    """Two point tables with the same x/y names — the natural call —
    would hit AMBIGUOUS_REFERENCE deep in analysis (and duplicate
    output columns are unusable anyway); the guard raises up front
    with the rename instruction (r11 review catch)."""
    import pytest

    from openweathermapapi_etl_spark.operators.spatial import grid_radius_join

    pts = spark.createDataFrame([(1, 0.1, 0.5)], "id int, x double, y double")
    with pytest.raises(ValueError, match="BOTH sides"):
        grid_radius_join(pts, pts, ("x", "y"), ("x", "y"), 0.05)


# ---------------------------------------------------------------------------
# c02_dedup_pr_audit_sampled — the sample restricts, never distorts
# ---------------------------------------------------------------------------


def test_sampled_pr_audit_truth_is_full_truth_restricted(spark):
    """The sampled audit's ground truth must equal the FULL exact
    ground truth restricted to pairs whose endpoints are both in the
    hash sample — i.e. sampling shrinks the pair universe but never
    changes any surviving pair's verdict (the estimator's consistency
    argument rests on exactly this). Also pins that the candidate restriction
    is the same row-local membership rule on both endpoints."""
    from openweathermapapi_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from openweathermapapi_etl_spark.operators.sampling import split_bucket
    from openweathermapapi_etl_spark.plans.analytics_q import _PR_SAMPLE_MOD

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def in_sample(col):
        return split_bucket(col, "prsample", _PR_SAMPLE_MOD) == 0

    # Full exact truth, then restricted to the sampled pair universe.
    full_truth = setsim_join(d, "doc_id", "text", tau=Fraction(1, 2))
    restricted = {
        (r["id_a"], r["id_b"])
        for r in full_truth.filter(
            in_sample(F.col("id_a")) & in_sample(F.col("id_b"))
        ).collect()
    }
    # The sampled audit's truth side: exact join over sampled docs only.
    sampled_truth = {
        (r["id_a"], r["id_b"])
        for r in setsim_join(
            d.filter(in_sample(F.col("doc_id"))),
            "doc_id",
            "text",
            tau=Fraction(1, 2),
        ).collect()
    }
    assert sampled_truth == restricted

    # Candidate restriction: every surviving pair has both endpoints
    # sampled, and it equals the set-filter of the full candidates.
    sigs = minhash_signature(d, "text", "doc_id", k=8, portable=True)
    cand = lsh_candidate_pairs(
        sigs, "doc_id", k=8, band_size=2, max_bucket=10_000
    )
    full_cand = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    kept = {
        (r["id_a"], r["id_b"])
        for r in cand.filter(
            in_sample(F.col("id_a")) & in_sample(F.col("id_b"))
        ).collect()
    }
    sample_ids = {
        r["doc_id"]
        for r in d.filter(in_sample(F.col("doc_id"))).select("doc_id").collect()
    }
    assert kept == {
        (a, b) for (a, b) in full_cand if a in sample_ids and b in sample_ids
    }


def test_embedding_neardup_lsh_is_subset_of_exact(spark):
    """The bucketed flavor's contract (r13): LSH candidates can only
    MISS pairs, never invent them — every (id_a, id_b, cos_sim) it
    emits appears verbatim in the exact triangle's output, and at this
    fixture the subset is non-empty (vacuous recall would mean the
    buckets degenerated)."""
    from openweathermapapi_etl_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    exact = {
        (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
        for r in QUERIES["c02_embedding_neardup"](spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
        for r in QUERIES["c02_embedding_neardup_lsh"](spark, sf_dir).collect()
    }
    assert lsh and lsh <= exact, (
        f"LSH invented pairs not in the exact set: {lsh - exact}"
    )
