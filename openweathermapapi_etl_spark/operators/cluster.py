"""C6 — near-dup cluster resolution: connected components over the
LSH candidate-pair graph.

LSH banding (operators/dedup.py) emits candidate PAIRS; a dedup
pipeline needs CLUSTERS — if A~B and B~C matched in different bands,
all three are one duplicate group and exactly one representative
survives. That closure is connected components on the pair graph
(reference has no analogue: its `SELECT DISTINCT *` dedup is row-exact
only, `/root/reference/dags/weather-etl.py:156-158`; this is the
standard generalization every training-data pipeline runs after LSH).

Scale design
------------
Min-label propagation: every node starts labeled with its own id; each
round, a node adopts the minimum label among itself and its neighbors;
at fixpoint the label is the component's minimum node id — a canonical,
deterministic cluster id. Each round is ONE shuffle (edge⋈label +
groupBy-min on the destination), the dominant data volume is the edge
list (2|E| after symmetrization), and rounds needed = component
*diameter*, not size. LSH components are unions of bucket cliques:
diameters in practice are 2-5 even at web scale, so the loop converges
in a handful of rounds. `localCheckpoint(eager=True)` truncates the
lineage every round — without it the plan doubles per iteration and
re-executes the whole prefix; on a real cluster with flaky executors
swap in reliable `checkpoint()`. The convergence probe is a
single-row count on the already-materialized round result (bounded
control-plane read). For adversarial chain-shaped graphs (diameter
O(n)) the published O(log n) fallback is alternating large-star /
small-star (Kiveris et al., *Connected Components in MapReduce and
Beyond*, SoCC'14); not needed for LSH graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it. Returns (node, label).

    Raises if ``max_iter`` rounds don't reach the fixpoint — silent
    truncation would emit WRONG cluster ids (two half-merged clusters),
    and at LSH diameters hitting 25 rounds means the input graph is not
    the shape this operator is documented for.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # Materialize the edge list ONCE before looping: every round
        # joins against `sym`, and without a checkpoint each round
        # re-executes sym's entire upstream lineage (for LSH input
        # that's the whole shingle→minhash→banding pipeline — measured
        # 3-4x the total runtime at sf0.1). On a cluster, persist to
        # disk or reliable-checkpoint instead if 2|E| exceeds memory.
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = stepped.filter(F.col("label") < F.col("_old")).count()
        labels = stepped.select("node", "label")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the LSH-graph envelope this "
        "operator is sized for (see module docstring for the O(log n) "
        "alternating-star fallback)"
    )


def dedup_clusters(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve candidate pairs into duplicate clusters.

    Returns (doc_id, cluster_id, cluster_size): cluster_id is the
    minimum doc id of the component (the canonical survivor — keep the
    row where doc_id == cluster_id, drop the rest), cluster_size its
    member count. Only nodes that appear in some pair are returned;
    unpaired documents are their own implicit singleton clusters and
    need no shuffle at all.
    """
    labels = connected_components(edges, src, dst, max_iter)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
