"""Time-series regularization: per-key date spines and gap filling.

An event log is irregular (rows exist only where something happened);
most downstream consumers — rolling features, cohort charts, training
curricula keyed by day — want a REGULAR grid with the last observation
carried forward. The classic spelling is a calendar ("date spine")
outer-joined to the data, then a forward fill.

Scale shape (100 TB events):

- the spine is *generated*, not stored: per-key [min, max] bounds are
  one partial-aggregatable groupBy (map-side combine shrinks it to one
  row per key before the shuffle), then ``sequence() + explode`` fans
  the grid out executor-side — no driver loop, no calendar table scan;
- the fill is a keyed window (``last(..., ignorenulls=True)`` over
  rows-unbounded-preceding) — partitioned by key, so it parallelizes
  across keys and never builds a global sort;
- total post-explode row count is ``sum(days_spanned(key))`` — bounded
  and predictable, unlike a cross join against a global calendar which
  materializes ``keys × all_days`` and filters late.

Reference basis: the reference stores one weather row per (city, run)
and its PGAdmin examples chart per-city series over time
(/root/reference/README.md:62-78); gaps appear whenever a 5-min run
fails (dags/weather-etl.py:46,58). This operator is the engine-side
repair for exactly that gap pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def date_spine(df: DataFrame, key_col: str, day_col: Column | str) -> DataFrame:
    """One row per (key, day) for every day in the key's observed
    [min(day), max(day)] span. ``day_col`` must be a DATE expression.

    Generated executor-side: groupBy bounds (combiner-friendly) +
    ``sequence``/``explode`` — the spine never exists as a table.
    """
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    bounds = df.groupBy(key_col).agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1")
    )
    return bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    day_col: Column | str,
    value_col: Column | str,
    filled_name: str = "filled",
) -> DataFrame:
    """Regularize ``df`` to a daily grid per key and forward-fill the
    last observed value into the gap days.

    Returns one row per (key, day) with:

    - ``observed`` — the day's aggregated value, null on gap days;
    - ``filled``   — last non-null ``observed`` at or before the day
      (null only before the key's first observation — impossible here
      because the spine starts at the key's min day);
    - ``is_gap``   — true where the day had no rows.

    ``value_col`` must already be one-row-per-(key, day) aggregated by
    the caller (this function does not choose an aggregate for you).
    Two shuffles total — the bounds agg and the (key, day) join — plus
    the keyed fill window which reuses the join's key partitioning
    profile (hash on key vs (key, day): Catalyst plans one Exchange for
    the window; at scale, pre-bucketing events by key removes both).
    """
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    daily = df.select(
        F.col(key_col), day.alias("day"), val.alias("observed")
    )
    spine = date_spine(daily, key_col, "day")
    joined = spine.join(daily, on=[key_col, "day"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(filled_name, F.last("observed", ignorenulls=True).over(w))
        .withColumn("is_gap", F.col("observed").isNull())
    )
