"""Ordered-sequence analytics: integer islands, running drawdown, and
changelog (CDC) latest-state compaction.

All three are classic "needs an ordered walk" problems that naive SQL
answers with a global-ORDER-BY window (single reducer). Here each is
expressed so the only global structure is either (a) a key-partitioned
window (per-key order, shuffle on the key — embarrassingly parallel at
100 TB) or (b) the exchange-aware total-order rank from
:mod:`.rank` (range shuffle + control-plane offsets).

Reference basis: the reference's ad-hoc SQL surface
(/root/reference/README.md:62-78) — sequence audits ("which ingest
batches are missing?"), peak-to-trough checks, and latest-state
queries over its keyed weather table are exactly the follow-up
queries its README invites users to write in PGAdmin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rank import global_rank


def sequence_islands(
    df: DataFrame, id_col: str, num_partitions: int | None = None
) -> DataFrame:
    """Contiguous runs ("islands") of an integer id set — equivalently
    the complement of its gaps.

    The classic trick: for distinct ids in ascending order,
    ``id - row_number(id)`` is constant exactly within a consecutive
    run, so islands fall out of a single groupBy on that delta — no
    self-join, no lead/lag over a global window. The row_number comes
    from :func:`~.rank.global_rank` (range shuffle + broadcast
    offsets), so no stage ever sees the whole sequence on one task.

    Columns: island_start, island_end, n_ids (all bigint).

    NULL ids — including values the long cast NULLS (ANSI off:
    non-numeric strings) — are EXCLUDED: the old distinct kept one
    NULL row whose ``_id - _rn`` delta grouped into a spurious
    (NULL, NULL, 1) island that corrupted downstream gap accounting
    (r11 review catch). An id that is null has no position on the
    number line; it cannot belong to a run.
    """
    ids = (
        df.select(F.col(id_col).cast("long").alias("_id"))
        .filter(F.col("_id").isNotNull())
        .distinct()
    )
    ranked = global_rank(ids, ["_id"], rank_name="_rn", num_partitions=num_partitions)
    return (
        ranked.groupBy((F.col("_id") - F.col("_rn")).alias("_delta"))
        .agg(
            F.min("_id").alias("island_start"),
            F.max("_id").alias("island_end"),
            F.count("*").alias("n_ids"),
        )
        .drop("_delta")
    )


def max_drawdown(
    df: DataFrame,
    key_col: str,
    order_by: list[Column | str],
    value_col: str,
) -> DataFrame:
    """Per-key maximum drawdown: the largest drop from a running peak
    to a later value, walking each key's series in ``order_by`` order.

    One key-partitioned window (running max — cumulative frame, spills
    if a key's history is huge but never crosses keys) + one agg.
    Running max and the subtraction are order-exact IEEE ops, so the
    result is bit-identical to any engine walking the same total
    order; ``order_by`` must be a total order within a key.

    Columns: <key>, peak (max running peak), max_drawdown.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_peak = df.select(
        F.col(key_col),
        F.col(value_col).alias("_v"),
        F.max(value_col).over(w).alias("_peak"),
    )
    return with_peak.groupBy(key_col).agg(
        F.max("_peak").alias("peak"),
        F.max(F.col("_peak") - F.col("_v")).alias("max_drawdown"),
    )


def cdc_latest_state(
    df: DataFrame,
    key_col: str,
    order_by: list[Column | str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Compact a CDC changelog (upserts + deletes, totally ordered per
    key) to the latest surviving state per key.

    The semantics every log-compacted store implements: take each
    key's LAST change by ``order_by``; if it is a delete, the key is
    gone, otherwise its payload is the current state. One row_number
    window partitioned by the key (single hash shuffle) + a filter —
    the merge-free spelling of M1's upsert applied to a whole history
    at once (operators/merge.py implements the incremental twin; this
    is the batch replay). Also emits ``n_versions`` — how many
    changelog rows the key compacted away — the write-amplification
    signal a compaction planner (M5) consumes.

    Returns all input columns except the window rank, restricted to
    surviving keys, plus ``n_versions``.

    A NULL ``op_col`` on a key's latest change FAILS the job: under
    three-valued logic ``op != 'D'`` is NULL for a NULL op, so the
    old ``where`` silently dropped the key EXACTLY as if it were
    deleted — a malformed CDC record converted into an invisible row
    deletion (r11 review catch). Pre-filter or repair malformed ops
    explicitly upstream.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(key_col).orderBy(*[c.desc() for c in cols])
    wc = Window.partitionBy(key_col)
    latest = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_versions", F.count("*").over(wc))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.where(
        F.when(
            F.col(op_col).isNull(),
            F.raise_error(
                F.lit(
                    f"cdc_latest_state: NULL {op_col} on a key's latest "
                    "change — a malformed record would silently delete "
                    "the key; repair or filter malformed ops upstream"
                )
            ).cast("boolean"),
        ).otherwise(F.col(op_col) != delete_op)
    )
