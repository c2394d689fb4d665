"""Batch sessionization: gap-based session assignment over an event
log (the batch twin of B42's streaming session windows).

The classic two-window formulation — ``lag`` to detect gaps, running
``sum`` of the gap flags to number sessions — keeps everything in
whole-stage codegen: no UDF, no state store, one shuffle keyed on the
user. At 100 TB the shuffle is partitioned by ``user_col`` and a
user's history sorts within its partition; skew is bounded by the most
active single user (salt upstream if one user is a bot firehose —
see operators/skew.py::key_skew_profile for finding out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "12 hours",
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-user session ordinal (``session_seq``, 1-based) to
    every event: a new session starts when the gap since the user's
    previous event exceeds ``gap``.

    Rows with NULL user or NULL timestamp are dropped — a NULL key
    can't belong to a user's timeline, and a NULL event time has no
    position in it; both would otherwise land in an arbitrary session.
    ``tiebreak`` breaks equal-timestamp orderings deterministically
    (pass the event id; without it, equal-ts rows may swap sessions
    between runs/engines).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(user_col).orderBy(*order)
    prev_ts: Column = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_new_session", new_session)
        .withColumn(
            "session_seq",
            F.sum("_new_session")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint"),
        )
        .drop("_new_session")
    )


def session_stats(
    sessions: DataFrame,
    user_col: str,
    ts_col: str,
    aggs: list[Column],
) -> DataFrame:
    """Collapse sessionized events to one row per (user, session):
    start/end timestamps plus caller aggregates. Reuses the
    sessionize shuffle's partitioning (groupBy keys are a superset of
    the window's partition key plus a derived column — Catalyst plans
    the final agg without a second exchange of the full data)."""
    return sessions.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        *aggs,
    )
