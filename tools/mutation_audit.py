#!/usr/bin/env python
"""Mutation audit of the query↔oracle parity gate (r14 verdict order #1).

361 green parity rows prove the queries agree with their oracles; they
cannot prove the gate would NOTICE a disagreement. This tool proves the
gate's *sensitivity*: K deliberate semantic mutations — each a throwaway
re-spelling of a registered query with exactly ONE seeded bug (dropped
filter, join type swapped, off-by-one window frame, null-handling flip,
wrong aggregation key, …) — run through the SAME comparator as
tools/check_parity.py (the driver-t2 replica) against the ORIGINAL
registered oracle. Every oracle-backed mutation must turn the gate RED;
a survivor exposes an under-discriminating oracle.

Rows-only targets (b39/b43-evicting/c02_minhash_fast) are audited with
the driver's weaker rows-only comparator (row count vs the unmutated
query). Cardinality bugs must still be caught there; value-preserving
mutations are EXPECTED survivors — each is listed with the value-level
pytest pin that compensates (tests/test_mutation_pins.py), so the bug
class is caught somewhere even though the driver check cannot.

Fixture: the committed SFs are parity fixtures, not adversarial ones —
sf0.001/sf0.01 have ZERO exact-duplicate texts, zero unmatched FK rows
and zero acctbal ties, so a MIN→MAX survivor-pick or left↔inner swap
would "survive" for FIXTURE reasons, saying nothing about the oracle.
The audit therefore synthesizes its own discriminating fixture (sf0.001
plus planted order-less customers, duplicate texts, and in-partition
acctbal ties) and runs both engines on it. `--sanity` first re-runs the
UNMUTATED targets through the comparator on that fixture (all must be
green) so a catch is attributable to the mutation, not the fixture.

Usage:
  python tools/mutation_audit.py [--fixture-dir /tmp/mutation_fixture]
                                 [--sanity] [--only NAME ...]

Exit 0 iff every mutation met its expectation (caught, or documented
expected-survivor); one JSON line on stdout with the full record.
Runnable as pytest via tests/test_mutation_audit.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
BASE_SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# the adversarial fixture
# ---------------------------------------------------------------------------


def make_fixture(out_dir: str) -> None:
    """sf0.001 + the rows the committed fixtures lack: 30 customers
    with no orders (left↔inner discrimination) carrying planted
    in-nation acctbal ties (rank↔dense_rank discrimination), and 50
    exact-duplicate document texts (survivor-pick discrimination).
    Deterministic — pure SQL over the deterministic source."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t in ("customer", "documents"):
            continue
        con.execute(
            f"COPY (SELECT * FROM '{BASE_SF}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{BASE_SF}/customer.parquet'
          UNION ALL
          SELECT (SELECT MAX(c_custkey) FROM '{BASE_SF}/customer.parquet')
                   + i AS c_custkey,
                 'Planted Customer ' || i AS c_name,
                 -- all 30 in nation 7: pairs (2j, 2j+1) share a balance,
                 -- so ties exist inside the rank windows' partitions.
                 CAST(7 AS INTEGER) AS c_nationkey,
                 CAST(1000 + (i // 2) * 10 AS DOUBLE) AS c_acctbal,
                 'BUILDING' AS c_mktsegment
          FROM (SELECT unnest(generate_series(1, 30)) AS i)
        ) TO '{out_dir}/customer.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{BASE_SF}/documents.parquet'
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
          FROM '{BASE_SF}/documents.parquet' WHERE doc_id % 10 = 3
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


# ---------------------------------------------------------------------------
# comparator (same discipline as tools/check_parity.py)
# ---------------------------------------------------------------------------


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def compare(spark_df, oracle_df) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(
            f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}"
        )
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_df), _normalize(oracle_df)
    if not a.equals(b):
        problems.append("values differ")
    return problems


# ---------------------------------------------------------------------------
# the mutants — one seeded semantic bug each, original spelling cited
# ---------------------------------------------------------------------------


def _t(spark, sf_dir, name):
    from openweathermapapi_etl_spark.plans.util import t

    return t(spark, sf_dir, name)


def mut_b06_dropped_filter(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b06_select_expr minus its l_linenumber
    filter — the canonical dropped-WHERE bug."""
    li = _t(spark, sf_dir, "lineitem")  # BUG: filter dropped
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.5).alias("qty_scaled"),
    )


def mut_b06_threshold_off(spark, sf_dir) -> DataFrame:
    """b06_select_expr with <= flipped to < on the line-number bound."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") < 3)  # BUG
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.5).alias("qty_scaled"),
    )


def mut_b07_in_list_short(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b07_filter_predicates with 'F' dropped from
    the status IN-list."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
        & F.col("o_orderstatus").isin("O")  # BUG: 'F' dropped
        & (F.col("o_orderpriority").like("1-%")
           | F.col("o_orderpriority").like("2-%"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def mut_b09_null_count(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b09_try_cast_dirty counting ALL rows as
    parsed — the count(col)-vs-count(*) null-handling flip."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    dirty = d.select(
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit("x"), F.col("doc_id").cast("string")))
        .otherwise((F.col("doc_id") * 3).cast("string")).alias("raw_num")
    )
    parsed = dirty.select(F.expr("TRY_CAST(raw_num AS BIGINT)").alias("v"))
    return parsed.agg(
        F.count("*").alias("n_rows"),
        F.count("*").alias("n_parsed"),  # BUG: counts NULLs too
        F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("parsed_sum"),
    )


def mut_b11_left_to_inner(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b11_left_join with the join type swapped to
    inner — planted order-less customers vanish."""
    from openweathermapapi_etl_spark.plans.util import dsum

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "inner")  # BUG: was left
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum("o_totalprice", "total_spend"))
    )


def mut_b11_join_key_shift(spark, sf_dir) -> DataFrame:
    """b11_left_join matching o_custkey = c_custkey + 1 — the
    off-by-one join-key bug."""
    from openweathermapapi_etl_spark.plans.util import dsum

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey + 1, "left")  # BUG
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum("o_totalprice", "total_spend"))
    )


def mut_b15_asof_forward(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b15_asof_join with direction flipped to
    forward — 'latest click at-or-before' becomes 'next click after'."""
    from openweathermapapi_etl_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts", "value"], direction="forward",  # BUG
    )
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("__asof_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
        F.col("__asof_value").alias("last_click_value"),
    )


def mut_b16_wrong_group_key(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b16_groupby_agg aggregating over
    l_linenumber masquerading as l_linestatus — the wrong-key bug."""
    from openweathermapapi_etl_spark.plans.util import davg, dsum

    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy(
        "l_returnflag", F.col("l_linenumber").alias("l_linestatus")  # BUG
    ).agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


def mut_b17_distinct_to_plain(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b17_count_distinct with COUNT(DISTINCT
    custkey) degraded to plain COUNT."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("o_custkey").alias("n_customers"),  # BUG: not distinct
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count("*").alias("n_orders"),
    )


def mut_b20_rollup_to_cube(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b20_rollup spelled as CUBE — emits the
    extra (NULL, n_name) grouping set."""
    from openweathermapapi_etl_spark.plans.util import dsum

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.cube("r_name", "n_name").agg(  # BUG: was rollup
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count("*").alias("n_cust"),
        dsum("c_acctbal", "total_bal"),
    )


def mut_b23_order_flip(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b23_ranking_windows ordering ascending —
    every rank inverted."""
    c = _t(spark, sf_dir, "customer")
    w_det = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")  # BUG: was .desc()
    )
    w_bal = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal"))  # BUG
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w_det).alias("rn"),
        F.rank().over(w_bal).alias("rnk"),
        F.dense_rank().over(w_bal).alias("drnk"),
        F.ntile(4).over(w_det).alias("quartile"),
    )


def mut_b23_rank_swap(spark, sf_dir) -> DataFrame:
    """b23_ranking_windows with rank↔dense_rank swapped — only ties
    (planted in the fixture) can expose it."""
    c = _t(spark, sf_dir, "customer")
    w_det = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_bal = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w_det).alias("rn"),
        F.dense_rank().over(w_bal).alias("rnk"),   # BUG: swapped
        F.rank().over(w_bal).alias("drnk"),        # BUG: swapped
        F.ntile(4).over(w_det).alias("quartile"),
    )


def mut_b24_frame_off(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b24_analytic_windows with last_value left
    on the DEFAULT frame (unbounded-preceding → current row) — the
    classic silent window-frame bug."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w_full).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),  # BUG: default frame
    )


def mut_b24_null_unsafe_runs(spark, sf_dir) -> DataFrame:
    """plans/events_q.py::b24_state_runs with eqNullSafe degraded to
    plain != — the dropped-IS-DISTINCT-FROM bug: the lag() NULL at each
    user's first row no longer starts a run, shifting every run_id."""
    from openweathermapapi_etl_spark.plans.events_q import _SPARK_FMT_US

    e = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_run",
        F.when(
            F.lag("event_type").over(w) != F.col("event_type"), 1  # BUG
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "run_id", "event_type").agg(
        F.date_format(F.min("ts"), _SPARK_FMT_US).alias("run_start"),
        F.date_format(F.max("ts"), _SPARK_FMT_US).alias("run_end"),
        F.count("*").alias("run_len"),
    )


def mut_b29_bag_to_set(spark, sf_dir) -> DataFrame:
    """plans/relational.py::b29_union with UNION ALL degraded to UNION
    — bag semantics silently deduplicated."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"), F.lit("c").alias("src")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k"), F.lit("s").alias("src")
    )
    return c.unionByName(s).distinct()  # BUG: distinct added


def mut_m1_updates_lose(spark, sf_dir) -> DataFrame:
    """plans/merge_q.py::m1_keyed_upsert with the merge polarity
    reversed — existing rows WIN on key collision (INSERT-IGNORE
    instead of upsert)."""
    from openweathermapapi_etl_spark.operators.merge import (
        dedup_last_write_wins,
    )
    from openweathermapapi_etl_spark.plans.merge_q import (
        _base_and_updates,
        _present,
    )

    base, updates = _base_and_updates(spark, sf_dir)
    deduped = dedup_last_write_wins(updates, ["o_orderkey"]).select(
        *base.columns
    )
    new_only = deduped.join(
        base.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    return _present(base.unionByName(new_only))  # BUG: base wins


def mut_c01_keep_max(spark, sf_dir) -> DataFrame:
    """plans/tier_c.py::c01_exact_dedup keeping MAX(doc_id) — the
    wrong-survivor-pick bug (planted duplicate texts expose it)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.max("doc_id").alias("keep_id"),  # BUG: was min
        F.count("*").alias("n_copies"),
    )


def mut_c02_band_width(spark, sf_dir) -> DataFrame:
    """plans/tier_c.py::c02_lsh_candidates with band_size doubled
    (4 bands of 2 → 2 bands of 4) — the recall knob silently moved."""
    from openweathermapapi_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sigs = minhash_signature(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=8, portable=True
    )
    return lsh_candidate_pairs(sigs, "doc_id", k=8, band_size=4,  # BUG
                               max_bucket=None)


def mut_c04_gram_off(spark, sf_dir) -> DataFrame:
    """plans/curation.py::c04_repetition_stats over 3-grams instead of
    2-grams — the off-by-one n."""
    from openweathermapapi_etl_spark.operators.text import (
        ngram_repetition_stats,
    )

    return ngram_repetition_stats(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3  # BUG
    )


def mut_c06_wrong_canonical(spark, sf_dir) -> DataFrame:
    """plans/curation.py::c06_dedup_clusters relabeled with the MAX
    member id as cluster_id — wrong canonical-survivor rule."""
    from openweathermapapi_etl_spark.operators.cluster import dedup_clusters
    from openweathermapapi_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sigs = minhash_signature(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=8, portable=True
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", k=8, band_size=2,
                                max_bucket=10_000)
    cc = dedup_clusters(pairs)
    relabel = cc.groupBy("cluster_id").agg(
        F.max("doc_id").alias("wrong_id")
    )
    return cc.join(relabel, "cluster_id").select(
        "doc_id", F.col("wrong_id").alias("cluster_id"), "cluster_size"  # BUG
    )


def mut_c07_split_boundary(spark, sf_dir) -> DataFrame:
    """plans/curation.py::c07_hash_split with train_pct 80 → 79 — the
    off-by-one split boundary."""
    from openweathermapapi_etl_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_split(d, "doc_id", train_pct=79, val_pct=10, salt="split")  # BUG


def mut_b40_window_size(spark, sf_dir) -> DataFrame:
    """plans/streaming_q.py::b40_tumbling_window with 10-minute windows
    instead of 5 — wrong tumble width."""
    from openweathermapapi_etl_spark.plans.streaming_q import (
        _SPARK_FMT_S,
        _replay_dir,
        replay_files_stream,
        run_to_memory,
    )
    from openweathermapapi_etl_spark.plans.util import dsum
    from openweathermapapi_etl_spark.schemas import EVENTS
    from openweathermapapi_etl_spark.session import prep

    prep(spark)
    d = _replay_dir(spark, sf_dir, "b40mut")
    stream = replay_files_stream(spark, d, EVENTS)
    agg = (
        stream.groupBy(F.window("ts", "10 minutes"), F.col("event_type"))  # BUG
        .agg(F.count("*").alias("n"), dsum("value", "total"))
        .select(
            F.date_format("window.start", _SPARK_FMT_S).alias("window_start"),
            "event_type", "n", "total",
        )
    )
    return run_to_memory(agg, "b40mut_out", "complete")


# --- rows-only targets: audited with the driver's weaker comparator ---


def mut_b43e_dedup_key_dropped(spark, sf_dir) -> DataFrame:
    """b43_streaming_dedup_watermarked_evicting deduping on user_id
    ONLY — a cardinality bug the rows-only check MUST catch."""
    return _b43e_respelled(spark, sf_dir, keys=["user_id"], shift=0)


def mut_b43e_key_shift(spark, sf_dir) -> DataFrame:
    """b43_streaming_dedup_watermarked_evicting with user_id shifted by
    +1 inside the pipeline — row count identical, every value wrong.
    EXPECTED to survive the rows-only check; the value-level pin in
    tests/test_mutation_pins.py::test_b43e_output_pairs_exist_in_events
    is the compensating control."""
    return _b43e_respelled(spark, sf_dir, keys=["user_id", "event_type"],
                           shift=1)


def _b43e_respelled(spark, sf_dir, keys, shift) -> DataFrame:
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from openweathermapapi_etl_spark.catalog import load_table
    from openweathermapapi_etl_spark.plans.streaming_q import (
        replay_files_stream,
        run_to_memory,
        write_events_file,
    )
    from openweathermapapi_etl_spark.schemas import EVENTS
    from openweathermapapi_etl_spark.session import prep

    prep(spark)
    events = load_table(spark, sf_dir, "events")
    mid_ts = events.selectExpr(
        "CAST(percentile_approx(CAST(ts AS DOUBLE), 0.5) AS TIMESTAMP) AS m"
    ).collect()[0][0]
    tag = f"mutation_audit_b43e_{_os.getpid()}_{'_'.join(keys)}_{shift}"
    d = _os.path.join(_tempfile.gettempdir(), tag)
    _shutil.rmtree(d, ignore_errors=True)
    write_events_file(
        events.filter((F.col("ts") < F.lit(mid_ts)) | F.col("ts").isNull()),
        d, 0,
    )
    write_events_file(events.filter(F.col("ts") >= F.lit(mid_ts)), d, 1)
    stream = replay_files_stream(spark, d, EVENTS)
    shifted = stream.withColumn("user_id", F.col("user_id") + shift)
    deduped = (
        shifted.select("user_id", "event_type", "ts")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(keys)
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, f"{tag}_out", "append")


def mut_b39_watermark_fat_finger(spark, sf_dir) -> DataFrame:
    """b39_watermark_late_drop with the watermark delay fat-fingered to
    3650 DAYS — nothing is ever late, but nothing ever finalizes
    either, so the append-mode output collapses to zero rows. (A
    mutant that DELETES the watermark outright is rejected by Spark's
    analyzer — append aggregation without watermark is an
    AnalysisException, i.e. that bug class cannot ship silently; this
    is the runnable neighbor.) Rows-only MUST catch it."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from openweathermapapi_etl_spark.catalog import load_table
    from openweathermapapi_etl_spark.plans.streaming_q import (
        _SPARK_FMT_S,
        replay_files_stream,
        run_checkpointed_append,
        write_events_file,
    )
    from openweathermapapi_etl_spark.schemas import EVENTS
    from openweathermapapi_etl_spark.session import prep

    prep(spark)
    events = load_table(spark, sf_dir, "events")
    mid_ts = events.selectExpr(
        "CAST(percentile_approx(CAST(ts AS DOUBLE), 0.5) AS TIMESTAMP) AS m"
    ).collect()[0][0]
    tag = f"mutation_audit_b39_{_os.getpid()}"
    d = _os.path.join(_tempfile.gettempdir(), tag)
    ckpt = _os.path.join(_tempfile.gettempdir(), f"{tag}_ckpt")
    _shutil.rmtree(d, ignore_errors=True)
    _shutil.rmtree(ckpt, ignore_errors=True)
    arrivals = [
        (F.col("ts") >= F.lit(mid_ts)) | F.col("ts").isNull(),
        F.col("ts") < F.lit(mid_ts),
    ]
    collected: list = []
    for i, pred in enumerate(arrivals):
        write_events_file(events.filter(pred), d, i)
        stream = replay_files_stream(spark, d, EVENTS)
        agg = (
            stream.withWatermark("ts", "3650 days")  # BUG: was 10 minutes
            .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format("window.start", _SPARK_FMT_S).alias(
                    "window_start"
                ),
                "event_type", "n",
            )
        )
        run_checkpointed_append(agg, ckpt, collected)
    return spark.createDataFrame(
        collected, "window_start string, event_type string, n bigint"
    )


def mut_c02_minhash_fast_wrong_family(spark, sf_dir) -> DataFrame:
    """c02_minhash_fast silently computed with the PORTABLE hash family
    instead of xxhash64 — every signature value wrong, one row per doc.
    EXPECTED to survive the rows-only check; compensated by
    tests/test_mutation_pins.py::test_minhash_fast_golden_signatures."""
    from openweathermapapi_etl_spark.operators.dedup import minhash_signature

    return minhash_signature(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=8, portable=True,  # BUG: production flavor is portable=False
    )


MUTATIONS: list[dict] = [
    # name, target registered query, mutant fn, expected outcome
    dict(name="b06_dropped_filter", target="b06_select_expr",
         fn=mut_b06_dropped_filter, expect="caught"),
    dict(name="b06_threshold_off_by_one", target="b06_select_expr",
         fn=mut_b06_threshold_off, expect="caught"),
    dict(name="b07_in_list_short", target="b07_filter_predicates",
         fn=mut_b07_in_list_short, expect="caught"),
    dict(name="b09_null_count_flip", target="b09_try_cast_dirty",
         fn=mut_b09_null_count, expect="caught"),
    dict(name="b11_left_to_inner", target="b11_left_join",
         fn=mut_b11_left_to_inner, expect="caught"),
    dict(name="b11_join_key_off_by_one", target="b11_left_join",
         fn=mut_b11_join_key_shift, expect="caught"),
    dict(name="b15_asof_direction_flip", target="b15_asof_join",
         fn=mut_b15_asof_forward, expect="caught"),
    dict(name="b16_wrong_group_key", target="b16_groupby_agg",
         fn=mut_b16_wrong_group_key, expect="caught"),
    dict(name="b17_distinct_to_plain", target="b17_count_distinct",
         fn=mut_b17_distinct_to_plain, expect="caught"),
    dict(name="b20_rollup_to_cube", target="b20_rollup",
         fn=mut_b20_rollup_to_cube, expect="caught"),
    dict(name="b23_order_flip", target="b23_ranking_windows",
         fn=mut_b23_order_flip, expect="caught"),
    dict(name="b23_rank_dense_swap", target="b23_ranking_windows",
         fn=mut_b23_rank_swap, expect="caught"),
    dict(name="b24_frame_off_by_default", target="b24_analytic_windows",
         fn=mut_b24_frame_off, expect="caught"),
    dict(name="b24_null_unsafe_compare", target="b24_state_runs",
         fn=mut_b24_null_unsafe_runs, expect="caught"),
    dict(name="b29_bag_to_set", target="b29_union",
         fn=mut_b29_bag_to_set, expect="caught"),
    dict(name="b40_window_size", target="b40_tumbling_window",
         fn=mut_b40_window_size, expect="caught"),
    dict(name="m1_updates_lose", target="m1_keyed_upsert",
         fn=mut_m1_updates_lose, expect="caught"),
    dict(name="c01_keep_max", target="c01_exact_dedup",
         fn=mut_c01_keep_max, expect="caught"),
    dict(name="c02_band_width", target="c02_lsh_candidates",
         fn=mut_c02_band_width, expect="caught"),
    dict(name="c04_gram_off_by_one", target="c04_repetition_stats",
         fn=mut_c04_gram_off, expect="caught"),
    dict(name="c06_wrong_canonical", target="c06_dedup_clusters",
         fn=mut_c06_wrong_canonical, expect="caught"),
    dict(name="c07_split_boundary", target="c07_hash_split",
         fn=mut_c07_split_boundary, expect="caught"),
    # rows-only targets (driver's weaker comparator):
    dict(name="b39_watermark_fat_finger", target="b39_watermark_late_drop",
         fn=mut_b39_watermark_fat_finger, expect="caught", rows_only=True),
    dict(name="b43e_dedup_key_dropped",
         target="b43_streaming_dedup_watermarked_evicting",
         fn=mut_b43e_dedup_key_dropped, expect="caught", rows_only=True),
    dict(name="b43e_key_shift",
         target="b43_streaming_dedup_watermarked_evicting",
         fn=mut_b43e_key_shift, expect="survives", rows_only=True,
         compensation="tests/test_mutation_pins.py::"
                      "test_b43e_output_pairs_exist_in_events"),
    dict(name="c02_minhash_fast_wrong_family", target="c02_minhash_fast",
         fn=mut_c02_minhash_fast_wrong_family, expect="survives",
         rows_only=True,
         compensation="tests/test_mutation_pins.py::"
                      "test_minhash_fast_golden_signatures"),
]


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def run_audit(
    spark: SparkSession,
    fixture_dir: str,
    only: list[str] | None = None,
    sanity: bool = False,
    log=print,
) -> dict:
    from openweathermapapi_etl_spark.plans import ORACLES, QUERIES

    if not os.path.exists(os.path.join(fixture_dir, "customer.parquet")):
        log(f"building adversarial fixture at {fixture_dir}")
        make_fixture(fixture_dir)
    con = duck_con(fixture_dir)
    muts = [m for m in MUTATIONS if only is None or m["name"] in only]
    results = []
    if sanity:
        for target in sorted({m["target"] for m in muts}):
            if target not in ORACLES:
                continue
            t0 = time.time()
            sdf = QUERIES[target](spark, fixture_dir).toPandas()
            odf = con.execute(ORACLES[target]).df()
            probs = compare(sdf, odf)
            log(f"sanity {target}: "
                f"{'OK' if not probs else 'BROKEN ' + str(probs)}"
                f" [{time.time() - t0:.1f}s]")
            if probs:
                raise SystemExit(
                    f"fixture breaks unmutated {target}: {probs} — "
                    "a catch on this target would be unattributable"
                )
    for m in muts:
        t0 = time.time()
        rec = dict(name=m["name"], target=m["target"], expect=m["expect"],
                   rows_only=bool(m.get("rows_only")))
        try:
            mutant_df = m["fn"](spark, fixture_dir).toPandas()
            if m.get("rows_only"):
                base_n = len(QUERIES[m["target"]](spark, fixture_dir)
                             .toPandas())
                caught = len(mutant_df) != base_n
                rec["detail"] = (f"rows mutant={len(mutant_df)} "
                                 f"original={base_n}")
            else:
                oracle_df = con.execute(ORACLES[m["target"]]).df()
                probs = compare(mutant_df, oracle_df)
                caught = bool(probs)
                rec["detail"] = "; ".join(probs) if probs else "hash-equal"
            rec["outcome"] = "caught" if caught else "survived"
        except SystemExit:
            raise
        except Exception as exc:  # mutant must RUN to inform the audit
            rec["outcome"] = "error"
            rec["detail"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["ok"] = (
            (rec["outcome"] == "caught" and m["expect"] == "caught")
            or (rec["outcome"] == "survived" and m["expect"] == "survives")
        )
        if m.get("compensation"):
            rec["compensation"] = m["compensation"]
        rec["sec"] = round(time.time() - t0, 1)
        log(f"{'PASS' if rec['ok'] else 'FAIL'}  {m['name']} "
            f"[{m['target']}] -> {rec['outcome']} ({rec['detail']}) "
            f"[{rec['sec']}s]")
        results.append(rec)
    con.close()
    summary = dict(
        fixture_dir=fixture_dir,
        total=len(results),
        caught=sum(1 for r in results if r["outcome"] == "caught"),
        expected_survivors=[
            r["name"] for r in results
            if r["outcome"] == "survived" and r["ok"]
        ],
        unexpected=[r["name"] for r in results if not r["ok"]],
        results=results,
    )
    return summary


def main() -> int:
    ap = argparse.ArgumentParser(description="mutation audit of the parity gate")
    ap.add_argument("--fixture-dir", default="/tmp/mutation_fixture")
    ap.add_argument("--sanity", action="store_true",
                    help="first run the UNMUTATED targets through the "
                         "comparator on the fixture (all must be green)")
    ap.add_argument("--only", nargs="*", default=None)
    ns = ap.parse_args()
    from openweathermapapi_etl_spark.session import get_session

    spark = get_session()
    summary = run_audit(spark, ns.fixture_dir, ns.only, ns.sanity,
                        log=lambda s: print(s, file=sys.stderr))
    print(json.dumps(summary))
    return 0 if not summary["unexpected"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
