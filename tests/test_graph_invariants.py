"""Structural INVARIANT tests for the round-8 graph / quantizer /
dedup operators — properties the DuckDB hash-parity gate cannot
express (it proves engine agreement, not that the answer has the
shape the algorithm guarantees). Each test checks the certificate the
algorithm's correctness argument rests on, directly against the data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openweathermapapi_etl_spark.operators.similarity import (
    knn_graph,
    rvq_encode,
)
from openweathermapapi_etl_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _sym_edges(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    g = knn_graph(e, k=3, dim=64, n_planes=6).select("src", "dst")
    return {(r["src"], r["dst"]) for r in g.collect()} | {
        (r["dst"], r["src"]) for r in g.collect()
    }


def test_mis_is_independent_and_maximal(spark):
    rows = QUERIES["c06_maximal_independent_set"](spark, SF).collect()
    state = {r["vec_id"]: r["state"] for r in rows}
    edges = _sym_edges(spark)
    ins = {v for v, s in state.items() if s == "in"}
    # Independence: no edge joins two selected nodes.
    assert not [(a, b) for (a, b) in edges if a in ins and b in ins]
    # Maximality (over the decided subgraph): every 'out' node has a
    # selected neighbor — it was dropped FOR a reason, not at random.
    neigh = {}
    for a, b in edges:
        neigh.setdefault(a, set()).add(b)
    for v, s in state.items():
        if s == "out":
            assert neigh.get(v, set()) & ins, f"out node {v} has no IS neighbor"


def test_bfs_distances_carry_certificates(spark):
    rows = QUERIES["c06_bfs_distance"](spark, SF).collect()
    dist = {r["node"]: r["dist"] for r in rows}
    edges = _sym_edges(spark)
    preds = {}
    for a, b in edges:
        preds.setdefault(b, set()).add(a)
    for node, d in dist.items():
        assert 0 <= d <= 3
        if d > 0:
            # A node at distance d must have an in-neighbor at d-1 —
            # the certificate that makes min-hop distances checkable
            # without re-running the traversal. (Directed edges: BFS
            # follows src->dst, so check the node's predecessors.)
            assert any(
                dist.get(p) == d - 1 for p in preds.get(node, ())
            ), f"node {node} at d={d} lacks a d-1 predecessor"


def test_kcenter_selection_radius_non_increasing(spark):
    rows = sorted(
        QUERIES["c03_kcenter_select"](spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # never re-selects a center
    dists = [r["dist"] for r in rows[1:]]  # rank 0 is the seed
    # Greedy farthest-point: each pick's distance-to-chosen-set is the
    # MAX over remaining points, and adding centers only shrinks
    # distances — the selection radius must be non-increasing.
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists


def test_rvq_codebook_members_have_zero_distortion(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    enc = rvq_encode(e, "vec_id", "embedding", coarse_mod=40, resid_mod=67)
    own = enc.filter(F.col("vid") % 67 == 0).collect()
    # A stage-2 codebook member's residual IS in the codebook, so its
    # best second-stage match is itself: exact-zero distortion, and
    # the assignment must be its own id (ties break on smaller rid
    # only among equal distances; 0 is uniquely its own).
    assert own and all(r["distortion"] == 0.0 for r in own)
    assert all(r["resid_id"] == r["vid"] for r in own)


def test_first_copy_dedup_keeps_each_chunk_exactly_once(spark):
    out = QUERIES["c04_first_copy_dedup"](spark, SF)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    # Every distinct chunk survives exactly once corpus-wide: the sum
    # of kept chunks equals the number of distinct chunk texts.
    from openweathermapapi_etl_spark.operators.text import (
        token_chunks,
        tokens,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    distinct_chunks = (
        d.select(F.explode(token_chunks(tokens("text"), 3, 3)).alias("c"))
        .select(F.array_join(F.col("c.toks"), " ").alias("ctext"))
        .distinct()
        .count()
    )
    assert total_kept == distinct_chunks
