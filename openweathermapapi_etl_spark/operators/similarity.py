"""C3 — similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the (small)
  query set against the full corpus; per-pair cosine via a
  *sequential* array fold (left-to-right double accumulation) so any
  engine that folds the array in order reproduces the bits exactly —
  DuckDB's ``list_reduce`` is the oracle twin. The baseline and the
  oracle-checkable path.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH
  buckets (sign bits of seeded projections) prune the corpus to
  same-bucket candidates before exact scoring. Deterministic given
  the seed, but not SQL-oracle-expressible → rows-only check.

Scale notes: brute force is O(|Q|·|C|) — fine when |Q| is broadcast-
small. For corpus-vs-corpus at 100 TB, LSH buckets (or an IVF coarse
quantizer) bound each bucket's candidate set; the final exact scoring
is again a bounded per-bucket loop. All arithmetic stays in JVM
expressions (zip_with/aggregate) — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_fold(a: Column, b: Column) -> Column:
    """Dot product as a deterministic left-to-right double fold.

    Element products are IEEE-exact; the fold order is the array
    order, so DuckDB's ``list_reduce(list_transform(...), (x,y)->x+y)``
    produces bit-identical doubles (0.0 + p1 == p1, so a seeded and an
    unseeded fold agree)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm_fold(a: Column) -> Column:
    """sqrt of the sequential-fold sum of squares (sqrt is IEEE-exact)."""
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, p: acc + p))


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (norm_fold(a) * norm_fold(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self-match excluded).

    Ties in cosine (e.g. duplicated vectors) break on neighbor id, so
    the cut is deterministic.
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot products with fixed hyperplanes."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_fold(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no RNG state,
    reproducible across runs/hosts)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share the query's hyperplane bucket
    (2^n_planes buckets → ~|C|/2^n candidates per query), then exact
    cosine + per-query top-k. Recall < 1 by design; bench-path only.
    """
    from pyspark.sql import Window as W

    planes = make_planes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bits(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bits(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
