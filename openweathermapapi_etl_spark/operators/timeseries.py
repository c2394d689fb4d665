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

    - ``observed`` — the day's aggregated value, null on gap days
      AND on present days whose aggregate is null (all-null inputs);
    - ``filled``   — last non-null ``observed`` at or before the day
      (null until the key's first NON-NULL observation: the spine
      starts at the key's min day, but that day's aggregate can
      itself be null);
    - ``is_gap``   — true where the day had NO ROWS, tracked by a
      presence marker, not by ``observed IS NULL``: a present day
      whose aggregate is null (e.g. ``max()`` over all-null sensor
      readings) is NOT a gap (r11 review catch — the old spelling
      conflated the two).

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
        F.col(key_col), day.alias("day"), val.alias("observed"),
        F.lit(True).alias("_present"),
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
        .withColumn("is_gap", F.col("_present").isNull())
        .drop("_present")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average of an irregular series — each
    observation weighted by how long it was "current" (until the next
    observation), the standard aggregate for unevenly sampled sensors
    (a value that held for an hour counts 60× one that held a minute —
    the plain AVG the reference's PGAdmin examples run over the weather
    table silently over-weights bursts).

    Exactness: the DECIMAL(38,6) trick is NOT enough here — a
    value×microseconds product exceeds 2^53, where the two engines'
    double→decimal casts round differently (observed 1-ulp twa drift).
    Instead everything is EXACT INTEGERS inside the sum: values
    quantized to 1/100 (``round(v*100)`` — the data is 2-decimal, so
    never at a rounding tie), weights floored to whole milliseconds;
    per-key sums stay < 2^53, so the final double division sees
    bit-identical operands on any engine and any aggregation order.
    Quantization error ≤ 0.005 on values, 1 ms on weights — both far
    below sensor noise; sub-ms holding times weigh 0. The last
    observation per key has no successor and is excluded (its holding
    time is unknown — open interval). A NULL-VALUE observation still
    terminates its predecessor's holding interval (the lead sees it)
    but its OWN interval is excluded from numerator and denominator
    alike — the old spelling kept it in total_ms/n_intervals while
    SUM skipped the null product, silently biasing twa toward zero
    over the unknown-value span (r11 review catch).

    One keyed window (lead) + one keyed agg, both on ``key_col``:
    Catalyst reuses the single hash exchange for both.

    Returns (key, n_intervals, total_ms, twa).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    dt_ms = ((F.lead(us).over(w) - us) / F.lit(1000)).cast("long")
    qv = F.round(F.col(value_col) * 100).cast("long")
    weighted = (
        df.withColumn("_dt_ms", dt_ms)
        .filter(F.col("_dt_ms").isNotNull() & F.col(value_col).isNotNull())
        .withColumn("_qv", qv)
    )
    return weighted.groupBy(key_col).agg(
        F.count("*").alias("n_intervals"),
        F.sum("_dt_ms").alias("total_ms"),
        (
            F.sum(F.col("_qv") * F.col("_dt_ms")).cast("double")
            / (F.lit(100.0) * F.sum("_dt_ms").cast("double"))
        ).alias("twa"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    window_rows: int = 10,
    threshold: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag observations whose value
    deviates more than ``threshold`` standard deviations from the
    trailing ``window_rows``-observation window (inclusive of the
    current row) — the streaming-friendly outlier rule every metrics
    pipeline runs over event series.

    Only rows whose window is FULL are scored (a part-filled window's
    variance is noise). Frame sums use DECIMAL(38,6), so mean/variance
    are order-independent and the flag is bit-stable across engines;
    variance via the sum-of-squares identity stays row-local on top of
    the two frame sums. One keyed window — parallel across keys.

    Returns the flagged rows: (key, tiebreak, value, z).
    """
    dec = "decimal(38,6)"
    n = window_rows
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    cnt = F.count(value_col).over(w)
    s1 = F.sum(v.cast(dec)).over(w).cast("double")
    s2 = F.sum((v * v).cast(dec)).over(w).cast("double")
    mean = s1 / cnt
    # Sample variance; cancellation can drive it epsilon-negative, so
    # clamp through the same greatest() both engines evaluate.
    var = F.greatest((s2 - cnt * mean * mean) / (cnt - 1), F.lit(0.0))
    # Zero-variance guard, explicit on BOTH engines (the oracle carries
    # the same WHERE var > 0): a constant-valued full window must score
    # no row. Without it, x/0.0 is engine-dependent at the last-ulp
    # margin — Spark yields NULL (row silently filtered) while IEEE
    # float engines yield ±inf (row flagged) — a cross-engine parity
    # flake on degenerate data.
    z = F.when(var > 0, (v - mean) / F.sqrt(var))
    return (
        df.withColumn("_cnt", cnt)
        .withColumn("_z", z)
        .filter((F.col("_cnt") == n) & (F.abs(F.col("_z")) > threshold))
        .select(
            key_col,
            tiebreak_col,
            F.col(value_col).alias("value"),
            F.col("_z").alias("z"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    alpha: float = 0.3,
    window_rows: int = 10,
) -> DataFrame:
    """Truncated exponentially-weighted moving average: smoothed value
    = Σ wₖ·v₍ₜ₋ₖ₎ / Σ wₖ over the trailing ``window_rows``
    observations, wₖ = (1-alpha)^k — the standard metrics smoother,
    truncated to a fixed window so it is expressible as one keyed
    window pass (the infinite-history recursive form needs stateful
    streaming; B50 covers that shape).

    Bit-reproducibility without decimals: the weights are *literal
    constants* baked into the expression (both engines parse the same
    decimal literal to the same double), and the weighted sum is a
    FIXED left-to-right expression tree of row-local IEEE ops — no
    aggregation order to vary. Rows with a part-filled window (or any
    null among the trailing values) get a null ``ewma``, mirroring the
    SQL twin exactly.

    One keyed window; ``window_rows`` lag expressions share the single
    window spec, so Spark evaluates them in one pass.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    weights = [(1.0 - alpha) ** k for k in range(window_rows)]
    v = F.col(value_col).cast("double")
    terms = [F.lit(weights[0]) * v] + [
        F.lit(wk) * F.lag(v, k).over(w)
        for k, wk in enumerate(weights[1:], start=1)
    ]
    num = terms[0]
    for term in terms[1:]:
        num = num + term
    den = sum(weights)  # same literal fold order as the SQL twin
    return df.select(
        key_col,
        tiebreak_col,
        F.col(value_col).alias("value"),
        (num / F.lit(den)).alias("ewma"),
    ).filter(F.col("ewma").isNotNull())
