"""Grid-bucketed spatial radius join — the 2-D twin of the binned
range join (B14b).

"All right-side points within distance r of each left-side point" is
a cross join with a distance filter in naive SQL — corpus² at any
scale. The standard fix (every spatial engine: PostGIS ST_DWithin
tiling, GeoSpark/Sedona grid partitioning, Uber H3 — public
literature) buckets space into cells of side == r:

1. each LEFT point lands in its containing cell ``(⌊x/r⌋, ⌊y/r⌋)``
   — one row, no expansion;
2. each RIGHT point replicates to its cell AND the 8 neighbors
   (row-local explode, constant 9× on the SMALLER side only) —
   any pair within distance r is then guaranteed to share a cell
   key (a disc of radius r centered anywhere in a cell only reaches
   the 3×3 neighborhood), so the equi-join has NO false negatives;
3. hash equi-join on the cell key + the exact predicate
   ``dx² + dy² <= r²`` — the join engine does the heavy lifting on
   a key whose cardinality grows with the data (cells), and the
   cross product never exists.

Skew note: a hot cell (urban cluster) concentrates pairs exactly
like a hot key in any equi-join — the existing salting/AQE-skew
machinery (operators/skew.py, pinned live in tests) applies to the
cell key unchanged; there is nothing spatial about the mitigation.

Reference basis: the reference stores per-city weather rows keyed by
name with no geometry (dags/weather-etl.py:126-131); a radius query
("stations near X") is the first spatial ask its data invites, here
expressed without a geo extension — pure integer/IEEE arithmetic,
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_of(x: Column, y: Column, r: float) -> tuple[Column, Column]:
    """Containing grid cell of side r (floor division, IEEE-stable)."""
    return F.floor(x / F.lit(r)), F.floor(y / F.lit(r))


def hash_coord(prefix: str, key: Column | str) -> Column:
    """Deterministic engine-portable pseudo-coordinate in [0, 1).

    ``(fingerprint(prefix, key) mod 10^6) / 10^6`` — the same md5
    path as :func:`~.reconcile.row_fingerprint`, so DuckDB derives
    bit-identical positions for the oracle (tests pin the equality).
    Stands in for real lat/lon in this container; production swaps
    the projection, the grid join is unchanged.
    """
    from .reconcile import row_fingerprint

    k = F.col(key) if isinstance(key, str) else key
    return (
        F.pmod(row_fingerprint([F.lit(prefix), k]), F.lit(1_000_000)).cast(
            "double"
        )
        / F.lit(1_000_000.0)
    )


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    radius: float,
) -> DataFrame:
    """Pairs (left ⨯ right columns + ``dist2``) within ``radius``.

    The 9-cell replication goes on ``right`` — pass the smaller side
    there. Both inputs keep all their columns; ``dist2`` is the exact
    squared distance (callers avoid the sqrt until display time — the
    compare against r² is exact in IEEE doubles).

    The two sides must not share column names: the coordinates are
    resolved by bare name after the join (two point tables both named
    x/y would hit AMBIGUOUS_REFERENCE at analysis time — r11 review
    catch), and any shared payload name would make the output frame's
    duplicate columns unusable to the caller anyway. Rename one side
    first; the guard raises up front with that instruction.
    """
    overlap = sorted(set(left.columns) & set(right.columns))
    if overlap:
        raise ValueError(
            f"grid_radius_join: column name(s) {overlap} exist on BOTH "
            "sides — coordinates resolve by bare name after the join "
            "and duplicate output columns are unusable; rename one "
            "side (withColumnRenamed) before joining"
        )
    lx, ly = F.col(left_xy[0]), F.col(left_xy[1])
    rx, ry = F.col(right_xy[0]), F.col(right_xy[1])
    lcx, lcy = cell_of(lx, ly, radius)
    l = left.withColumn("_cx", lcx).withColumn("_cy", lcy)
    rcx, rcy = cell_of(rx, ry, radius)
    off = F.explode(
        F.array(*[F.lit(d) for d in (-1, 0, 1)])
    )
    rr = (
        right.withColumn("_dx", off)
        .withColumn("_dy", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn("_cx", rcx + F.col("_dx"))
        .withColumn("_cy", rcy + F.col("_dy"))
        .drop("_dx", "_dy")
    )
    d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        l.join(rr, ["_cx", "_cy"])
        .filter(d2 <= F.lit(radius) * F.lit(radius))
        .withColumn("dist2", d2)
        .drop("_cx", "_cy")
    )
