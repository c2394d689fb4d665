"""Round-7 serving/consumption-side operators: sparse retrieval
scoring (BM25), training-batch length bucketing, Spark-4 VARIANT
semi-structured access, and runtime-bloom-filtered joins.

These are the stages between a curated corpus and its consumers — a
RAG/eval retrieval pass, the batch-shaping report a training launcher
reads, schema-on-read access to raw payloads, and the scan-reduction
machinery a selective fact/dim join needs at 100 TB. Float policy
matches the rest of the book: no transcendentals in checked paths
(BM25 uses the rational idf for the same reason c04_tfidf_topterms
does), exact integers until a final division, decimal-trick sums for
order-independent double aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import epoch_shuffle, length_buckets
from ..operators.text import bm25_topk
from .registry import register
from .tier_c import _O_HASH
from .util import dsum, o_dsum, t

# ---------------------------------------------------------------------------
# C4 continued — BM25 retrieval
# ---------------------------------------------------------------------------

#: The fixed retrieval query (sorted; both engines fold in this order).
_BM25_TERMS = ["join", "scan", "vector"]
_BM25_K = 10


@register(
    "c04_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tok),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
              FROM dl),
    hits AS (SELECT doc_id, unnest(tk) AS term FROM tok),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM hits WHERE term IN ('join', 'scan', 'vector')
           GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    w AS (SELECT tf.doc_id, tf.term, dl.dl,
            ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
            * ((tf * CAST(2.2 AS DOUBLE))
               / (tf + 1.2 * (0.25 + 0.75
                              * (CAST(dl.dl AS DOUBLE) / avgdl))))
              AS w
          FROM tf JOIN df USING (term)
                  JOIN dl ON tf.doc_id = dl.doc_id
                  CROSS JOIN stats),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
                   ANY_VALUE(dl) AS dl,
                   list_reduce(list(w ORDER BY term), (x, y) -> x + y) AS score
            FROM w GROUP BY doc_id)
    SELECT doc_id, n_terms_hit, dl, score
    FROM agg ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    """,
)
def c04_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4l: BM25 top-{_BM25_K} retrieval for a fixed 3-term query
    (operators/text.py::bm25_topk) — the sparse twin of the C3 dense
    search family. Rational Robertson–Spärck-Jones idf (no ln(): +,*,/
    are correctly-rounded IEEE ops, bit-equal across engines; same
    policy as c04_tfidf_topterms), per-term weights folded in
    term-sorted order. The term filter is an isin over a literal
    handful → pushed to the scan; corpus stats and df broadcast; the
    only corpus-sized exchange is the (doc, term) tf agg; selection is
    TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, "doc_id", "text", topk=_BM25_K)


# ---------------------------------------------------------------------------
# C7 continued — length-bucket batch shaping
# ---------------------------------------------------------------------------

_PAD = 64


@register(
    "c07_length_buckets",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
               FROM documents),
    b AS (SELECT doc_id, dl,
                 (greatest(dl, 1) + {_PAD - 1})
                   - ((greatest(dl, 1) + {_PAD - 1}) % {_PAD}) AS bucket_len
          FROM d)
    SELECT bucket_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_tokens,
           CAST(bucket_len * COUNT(*) AS BIGINT) AS padded_tokens,
           CAST(bucket_len * COUNT(*) - SUM(dl) AS DOUBLE)
             / CAST(bucket_len * COUNT(*) AS DOUBLE) AS waste_frac
    FROM b GROUP BY bucket_len
    """,
)
def c07_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7m: length-bucket batch-shaping report
    (operators/sampling.py::length_buckets) — pad every document's
    token count to the next multiple of {_PAD} and report per-bucket
    document counts, real vs padded token totals, and padding-waste
    fraction; the planning pass behind length-bucketed training
    batches. Pure long arithmetic to the final division (bit-stable);
    row-local bucket assignment + one tiny keyed agg — partial sums
    only on the wire at any corpus size."""
    docs = t(spark, sf_dir, "documents")
    with_len = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ", -1)).alias("dl")
    )
    return length_buckets(with_len, "dl", pad_to=_PAD)


# ---------------------------------------------------------------------------
# B37 continued — Spark 4 VARIANT semi-structured access
# ---------------------------------------------------------------------------


@register(
    "b37_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.missing')    AS missing_path,
           json(props)::VARCHAR                       AS roundtrip,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
)
def b37_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37b: VARIANT — Spark 4's binary semi-structured type
    (parse_json once at ingest, typed variant_get extraction after;
    OSS twin of the schema-on-read columns warehouses bolt onto raw
    JSON). Against b37's per-access get_json_object string re-parse,
    the VARIANT column parses ONCE and every extraction is a typed
    binary traversal — the at-scale difference when many fields are
    read from the same payload. The variant column itself is
    driver-canonicalized via to_json (VariantType is not
    pandas-sortable); a missing path under try-extraction semantics is
    NULL, same as the JSON-path twin."""
    e = t(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_num"),
        F.variant_get("v", "$.missing", "string").alias("missing_path"),
        F.to_json("v").alias("roundtrip"),
        (F.variant_get("v", "$.k", "bigint") % 10).alias("k_mod"),
    )


# ---------------------------------------------------------------------------
# B10 continued — runtime bloom-filter join
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    # Injection gates. At production scale the defaults fire on their
    # own (creation side under 10 MB plan size, application side scan
    # over 10 GB); at test SF the application-side floor must drop to 0
    # and the broadcast fallback must be disabled or the demonstration
    # join broadcasts instead (a broadcast join needs no bloom filter —
    # that IS the optimizer being right at this size).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@register(
    "b10_bloom_runtime_filter",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*)               AS n_items,
           {o_dsum('l.l_quantity')} AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def b10_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10d: runtime bloom-filter join — Catalyst injects a
    ``bloom_filter_agg`` over the selective (filtered-orders) side and
    a ``might_contain`` pre-filter on the fact scan, so lineitem rows
    whose order can't match die AT THE SCAN instead of riding the
    shuffle (the OSS spelling of Trino/ORC dynamic filtering; the
    plan-shape pin lives in tests/test_plan_shapes.py). At 100 TB this
    is the difference between shuffling the whole fact table and
    shuffling the ~joinable slice.

    The result is conf-independent (the filter is a pure scan
    reduction) — the oracle is the plain join. Because runtime-filter
    injection happens at ACTION time, the demonstration confs are
    scoped by materializing inside the conf window (eager
    localCheckpoint of the small agg result) and restored before
    returning; co-resident queries never see them.
    """
    from ..session import conf_window

    # Build the lazy plan FIRST: t() routes through prep(), which
    # (re)pins the session's broadcast threshold — the conf window must
    # open after that, or prep un-does the demonstration confs.
    agg = _bloom_join_agg(spark, sf_dir)
    with conf_window(spark, _BLOOM_CONFS):
        # Materialize while the confs are live (tiny: one row per
        # order priority), so the runtime filter really ran.
        return agg.localCheckpoint(eager=True)


def _bloom_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy selective fact/dim join b10_bloom_runtime_filter
    materializes — factored out so the plan-shape test can explain it
    inside its own conf window (the registered query returns the
    checkpointed RESULT, whose plan is just the checkpoint scan)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity", "total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# C7 continued — deterministic per-epoch corpus reshuffle
# ---------------------------------------------------------------------------

_N_EPOCHS = 2


@register(
    "c07_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT CAST(unnest(generate_series(0, {_N_EPOCHS - 1}))
                        AS INT) AS epoch),
    x AS (SELECT epoch, doc_id,
                 {{h}} AS h0
          FROM documents, e),
    k AS (SELECT epoch, doc_id,
                 ((h0 * h0) % 1000000007 * 2654435761 + h0)
                   % 1000000007 AS h
          FROM x)
    SELECT epoch, doc_id,
           CAST(row_number() OVER (PARTITION BY epoch
                                   ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM k
    """.format(h=_O_HASH.format(
        s="'eshuf:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
    )),
)
def c07_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7n: deterministic per-epoch corpus reshuffle
    (operators/sampling.py::epoch_shuffle) — every training epoch gets
    a different pseudo-random permutation of the corpus, reproducible
    bit-for-bit on any cluster layout (the data-order half of training
    reproducibility; rand() cannot give you a resumable epoch 3).
    Order key = portable hash through a nonlinear scramble (the raw
    polynomial hash is order-preserving in trailing characters — see
    the operator docstring); positions come from the distributed
    global_rank over (epoch, key, id) — one range shuffle, no
    single-reducer window — rebased per epoch with a broadcast 1-row
    count."""
    docs = t(spark, sf_dir, "documents")
    # pin=False: deterministic parquet lineage (see rank.py policy).
    return epoch_shuffle(docs, "doc_id", n_epochs=_N_EPOCHS, pin=False)


@register(
    "c07_epoch_decorrelation",
    oracle=f"""
    WITH e AS (SELECT CAST(unnest(generate_series(0, 1)) AS INT) AS epoch),
    x AS (SELECT epoch, doc_id,
                 {{h}} AS h0
          FROM documents, e),
    k AS (SELECT epoch, doc_id,
                 ((h0 * h0) % 1000000007 * 2654435761 + h0)
                   % 1000000007 AS h
          FROM x),
    pos AS (SELECT epoch, doc_id,
                   CAST(row_number() OVER (PARTITION BY epoch
                                           ORDER BY h, doc_id) AS BIGINT)
                     AS pos
            FROM k),
    paired AS (
      SELECT a.doc_id, a.pos AS p0, b.pos AS p1
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id
      WHERE a.epoch = 0 AND b.epoch = 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((p0 - p1) * (p0 - p1)) AS BIGINT) AS d2
          FROM paired)
    SELECT n, d2,
           1.0 - 6.0 * d2 / (CAST(n AS DOUBLE)
                             * (CAST(n AS DOUBLE) * n - 1)) AS spearman_rho
    FROM s
    """.format(h=_O_HASH.format(
        s="'eshuf:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
    )),
)
def c07_epoch_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7v: epoch DECORRELATION audit — does the reshuffle actually
    shuffle? Spearman rank correlation between a document's position
    in epoch 0 and epoch 1: ρ = 1 − 6·Σd²/(n(n²−1)), where Σd² over
    the paired positions is EXACT integer arithmetic (positions are
    ranks by construction) and only the final normalization is a
    double — bit-exact cross-engine with no quantization tricks. A
    healthy shuffle sits near 0; ρ near 1 is the classic
    seed-reuse/salt-collision bug (every epoch replays the same
    order, the model sees data in one fixed curriculum and
    overfits order artifacts), ρ near −1 an accidental reversal.
    This audit is why the scramble in epoch_shuffle is load-bearing:
    the raw polynomial hash's trailing-character order-preservation
    would show up HERE as ρ >> 0 across epochs.

    Scale shape: positions come from the audited operator's own
    range-shuffle ranks; the pairing is one id-keyed self-join of two
    epoch slices; the rollup is three scalar integers. Auditing the
    shuffle costs one join over what the shuffle itself cost."""
    docs = t(spark, sf_dir, "documents")
    pos = epoch_shuffle(docs, "doc_id", n_epochs=2, pin=False).select(
        "epoch", "doc_id", "pos"
    )
    a = pos.filter(F.col("epoch") == 0).select(
        "doc_id", F.col("pos").alias("p0")
    )
    b = pos.filter(F.col("epoch") == 1).select(
        "doc_id", F.col("pos").alias("p1")
    )
    s = (
        a.join(b, "doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("p0") - F.col("p1")) * (F.col("p0") - F.col("p1"))
            )
            .cast("bigint")
            .alias("d2"),
        )
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "n",
        "d2",
        (
            F.lit(1.0)
            - F.lit(6.0) * F.col("d2") / (n_d * (n_d * F.col("n") - 1))
        ).alias("spearman_rho"),
    )
