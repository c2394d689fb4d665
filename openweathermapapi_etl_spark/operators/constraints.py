"""Write-time CHECK-constraint enforcement (M23).

Delta-invariant / Iceberg-validation style quality gate in front of a
table commit: declare named boolean predicates every valid row must
satisfy, audit a batch in ONE full-scan aggregate, and refuse the
write when any rule has violations — the table never holds a row that
breaks its contract.

Reference parity: the reference DAG trusts its source implicitly
(/root/reference/dags/weather-etl.py loads the API payload straight
into staging with no validation layer); this is the gate a production
lakehouse adds so a malformed upstream batch aborts loudly instead of
poisoning downstream consumers.

Semantics: a row VIOLATES a rule when the predicate is not TRUE —
i.e. FALSE **or NULL** both count (Delta-invariant semantics, stricter
than ANSI CHECK where UNKNOWN passes; for data quality, "we could not
prove the row valid" must fail).

Scale shape: the audit is a single Aggregate over the batch — every
rule becomes one conditional-count expression evaluated in the same
whole-stage-codegen pass, so auditing 40 rules costs one scan, not 40.
No shuffle beyond the final single-row reduce; the per-rule report is
rules-sized (a handful of rows) regardless of batch size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    """Raised by :func:`enforce_constraints` when any rule has
    violating rows. Carries the per-rule report so callers can log or
    dead-letter it."""

    def __init__(self, report: list[tuple[str, int]]):
        self.report = report
        detail = ", ".join(f"{rule}={n}" for rule, n in report)
        super().__init__(f"constraint violations: {detail}")


def _as_column(pred: Column | str) -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def audit_constraints(
    df: DataFrame, constraints: dict[str, Column | str]
) -> DataFrame:
    """Count violating rows per named rule in one pass.

    Returns a DataFrame ``(rule string, n_violations bigint)`` with
    one row per declared rule — zero-violation rules included, so the
    report doubles as proof every rule actually ran.
    """
    if not constraints:
        raise ValueError("no constraints declared")
    for name in constraints:
        # Names are interpolated into the stack() unpivot expression;
        # restrict them to identifier characters so a quote/backtick
        # can't break parsing (fail at declaration, not at audit).
        if not name.replace("_", "").isalnum():
            raise ValueError(f"constraint name must be identifier-like: {name!r}")
    aggs = [
        F.sum(F.when(_as_column(pred), 0).otherwise(1))
        .cast("bigint")
        .alias(name)
        for name, pred in constraints.items()
    ]
    wide = df.agg(*aggs)
    # unpivot the single audit row to (rule, n_violations); an empty
    # input batch aggregates to NULL counts -> 0 violations.
    stack = ", ".join(f"'{n}', coalesce(`{n}`, 0L)" for n in constraints)
    return wide.selectExpr(
        f"stack({len(constraints)}, {stack}) AS (rule, n_violations)"
    )


def enforce_constraints(
    df: DataFrame, constraints: dict[str, Column | str]
) -> DataFrame:
    """Gate: return ``df`` unchanged when every rule passes, raise
    :class:`ConstraintViolation` with the per-rule report otherwise.

    Call in front of a table commit (e.g.
    ``table.overwrite(enforce_constraints(batch, rules))``) — the
    exception propagates before any version directory is written, so a
    dirty batch leaves zero trace.

    The batch is PINNED (eager localCheckpoint) before the audit: a
    non-deterministic lineage (sampled/salted/re-read sources) could
    otherwise pass the audit scan and then materialize DIFFERENT rows
    at write time — the audited rows must be the written rows for the
    guarantee to mean anything. Cost is one materialization, which the
    commit was about to pay anyway."""
    pinned = df.localCheckpoint(eager=True)
    report = [
        (r["rule"], r["n_violations"])
        for r in audit_constraints(pinned, constraints).collect()
    ]
    bad = [(rule, n) for rule, n in report if n > 0]
    if bad:
        raise ConstraintViolation(bad)
    return pinned
