"""B15 — as-of join: for each left row, the latest right row with
``right_ts <= left_ts`` within the same key group.

Spark has no native ASOF JOIN (DuckDB does — it serves as the oracle).
Implementation is the *union + ordered window* plan rather than a
range-join + post-filter or a per-group ``pd.merge_asof``:

1. tag left and right rows, union them on a common shape;
2. one shuffle, hash-partitioned by key, sorted by (ts, side) within
   partitions — right rows sort before left at equal ts so '<=' holds;
3. carry the last-seen right payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding frame;
4. keep left rows and unpack the payload.

Scale notes: cost is one shuffle+sort of |L|+|R| — no quadratic range
expansion, no Python. Equivalent to the "union + fill-forward" pattern
used in large-scale point-in-time joins. Skewed keys split via AQE.

Determinism: callers must make right rows unique per (key, ts) —
otherwise *any* engine's as-of result is ambiguous at tied timestamps
(dedup with max/last-write-wins first; see plans/relational.py b15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; matched right values appear as ``__asof_<col>``
    (NULL when no right row matches).

    ``tolerance_us`` bounds staleness (pandas ``merge_asof(tolerance=)``
    semantics): a match farther than the bound does NOT count —
    point-in-time feature joins use this to refuse stale features
    rather than silently serve them. Row-local post-mask on the
    carried right timestamp; plan shape identical to the unbounded
    join (the window still fills — only the unpack nulls out expired
    matches).

    ``direction`` (pandas ``merge_asof(direction=)`` family):
    ``backward`` (default) = latest right row at-or-before;
    ``forward`` = earliest right row at-or-after; ``nearest`` =
    whichever is closer in time, ties to backward. All three come out
    of the SAME single shuffle: the sort order places equal-timestamp
    right rows before left rows, so the backward fill captures
    ``rt <= lt`` and the forward fill captures ``rt > lt`` — forward
    then reclaims exact-timestamp matches from the backward column
    row-locally, and nearest picks the closer of the two. No second
    exchange, no re-sort."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction: {direction!r}")
    payload = F.struct(
        F.col(right_ts).alias("__rt"), *[F.col(c) for c in value_cols]
    ).alias("__payload")

    right_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
    )
    left_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(right_tagged.schema["__payload"].dataType)
        .alias("__payload"),
        *[F.col(c) for c in left.columns if c != on],
    )

    w = (
        W.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = left_tagged.unionByName(right_tagged).withColumn(
        "__match_b", F.last("__payload", ignorenulls=True).over(w)
    )
    if direction == "backward":
        filled = filled.withColumn("__match", F.col("__match_b"))
    else:
        w_fwd = (
            W.partitionBy(on)
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        filled = filled.withColumn(
            "__match_f", F.first("__payload", ignorenulls=True).over(w_fwd)
        )
        if direction == "forward":
            # The forward frame starts at the left row itself, so an
            # equal-timestamp right row (sorted just BEFORE it) lives
            # in the backward column — reclaim it: forward semantics
            # include exact matches.
            match = F.when(
                F.unix_micros(F.col("__match_b.__rt"))
                == F.unix_micros(F.col("__t")),
                F.col("__match_b"),
            ).otherwise(F.col("__match_f"))
        else:  # nearest, ties to backward (pandas semantics)
            bd = F.unix_micros(F.col("__t")) - F.unix_micros(
                F.col("__match_b.__rt")
            )
            fd = F.unix_micros(F.col("__match_f.__rt")) - F.unix_micros(
                F.col("__t")
            )
            match = (
                F.when(F.col("__match_b").isNull(), F.col("__match_f"))
                .when(F.col("__match_f").isNull(), F.col("__match_b"))
                .when(bd <= fd, F.col("__match_b"))
                .otherwise(F.col("__match_f"))
            )
        filled = filled.withColumn("__match", match)
    if tolerance_us is None:
        fresh = F.lit(True)
    else:
        fresh = F.abs(
            F.unix_micros(F.col("__t"))
            - F.unix_micros(F.col("__match.__rt"))
        ) <= F.lit(tolerance_us)
    out = filled.filter(F.col("__side") == 1).select(
        on,
        *[c for c in left.columns if c != on],
        *[
            F.when(fresh, F.col(f"__match.{c}")).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return out
