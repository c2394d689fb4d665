"""Distributed total-order rank / sharding — the scale-safe spelling
of ``ROW_NUMBER() OVER (ORDER BY ...)``.

A global window with no PARTITION BY collapses the whole input into a
single task (Spark even warns: "No Partition Defined for Window
operation"), which is the canonical 100 TB anti-pattern: one reducer
sorts everything. The distributed construction used by every external
sorter (and by Spark's own ``sortBy`` writers) is:

1. ``repartitionByRange`` on the order keys — range-sampled
   boundaries put each partition on a contiguous, disjoint key range
   (equal keys land in one partition), every partition sorts locally
   in parallel;
2. per-partition row counts — a tiny control-plane aggregate
   (``num_partitions`` rows) collected to the driver;
3. rank = cumulative offset of the partition + the local rank
   *within* the partition — computed exchange-free from
   ``monotonically_increasing_id`` after ``sortWithinPartitions``
   (see the in-function comment), so it never serializes and never
   re-shuffles.

The result is bit-identical to the single-task window whenever the
order keys form a total order (pass a tie-breaking key suffix if the
primary key has duplicates — otherwise ranks within a tie are
partition-placement-dependent, same as any ROW_NUMBER over ties).

Reference basis: the reference's ad-hoc PGAdmin SQL surface
(/root/reference/README.md:62-78) includes window functions over the
weather table; Postgres evaluates ROW_NUMBER on one backend, which is
exactly what this construction avoids at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column | str],
    rank_name: str = "rnk",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Append a 1-based global ROW_NUMBER over ``order_by`` without a
    single-reducer window.

    ``order_by`` must be a total order (unique key tuple) for a
    deterministic result. Cost: ONE range shuffle of the data + one
    tiny control-plane aggregate; the local rank and the offset join
    are both exchange-free (the offset side is ``num_partitions``
    rows, always broadcast).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *cols
    ).withColumn("_pid", F.spark_partition_id())

    # Local rank WITHOUT a second exchange: a Window.partitionBy(_pid)
    # would be correct but Catalyst cannot see that rows are already
    # pid-partitioned, so it plans Exchange(hashpartitioning(_pid)) —
    # a second full shuffle of the data. Instead: sortWithinPartitions
    # (sort, no movement) + monotonically_increasing_id, whose
    # documented layout is (partition id << 33) + consecutive
    # record number in scan order — so id − (pid << 33) + 1 IS the
    # 1-based local rank in key order. Limit: 2^33 rows per partition
    # (≈8.6 B), far above any sane partition sizing; bit-equality with
    # the naive global window is unit-tested.
    local = (
        ranged.sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn(
            "_local_rn",
            F.col("_mid")
            - F.shiftleft(F.col("_pid").cast("long"), 33)
            + F.lit(1),
        )
    )

    # Pin `local` before the control-plane read: the counts collect and
    # the returned plan are two separate jobs, and correctness needs
    # both to see the SAME partition contents. Plain lineage replays
    # repartitionByRange's boundary sampling and
    # monotonically_increasing_id on recompute (e.g. lost-executor
    # retry of a nondeterministic upstream), which could shift rows so
    # the collected offsets no longer match. localCheckpoint
    # materializes the partitions to executor storage and truncates
    # lineage — both jobs read the identical stored blocks, or fail
    # loudly if they're lost (never silently re-derive). Lazy (not
    # eager): the counts collect below is the first action anyway, so
    # it materializes the checkpoint as a side effect — eager would
    # pay one full extra pass over the data before it (measured +130%
    # on b26_global_rank at sf0.1). ``pin=False`` opts out where the
    # lineage is DETERMINISTIC (e.g. a parquet scan): recompute then
    # reproduces identical partitions — RangePartitioner samples with
    # a fixed per-partition seed, monotonically_increasing_id is a
    # pure function of partition content — which is the same unpinned
    # two-job construction as Spark core's own zipWithIndex, and
    # skips storing the whole dataset (at 100 TB the pin IS the cost).
    # Default stays pinned: safe under any upstream.
    if pin:
        local = local.localCheckpoint(eager=False)

    # Offsets: #rows in all partitions strictly before this one.
    # num_partitions rows — a bounded control-plane read, not data.
    counts = sorted(
        (r["_pid"], r["n"])
        for r in local.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    return (
        local.join(F.broadcast(off_df), on="_pid")
        .withColumn(rank_name, (F.col("_offset") + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn", "_offset", "_mid")
    )


def prefix_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Append the inclusive running total of ``value_col`` in
    ``order_by`` order — ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` — without the single-reducer global window.

    Same skeleton as :func:`global_rank`: range repartition (each
    partition owns a contiguous key range), per-partition local
    running sums in parallel, then a ``num_partitions``-row
    control-plane pass turns per-partition totals into starting
    offsets, broadcast back. The local pass is exchange-free like
    global_rank's: a ``Window.partitionBy("_pid")`` would be correct
    but Catalyst can't see rows are already pid-partitioned and plans
    ``Exchange(hashpartitioning(_pid))`` — a second full shuffle. A
    running SUM can't fall out of ``monotonically_increasing_id`` the
    way a rank does, so the local pass is ``sortWithinPartitions`` +
    one streaming Arrow ``mapInPandas`` cumsum per partition (no
    movement, vectorized; the Arrow round-trip is the price of
    skipping a full shuffle of the data). ``order_by`` must be a total
    order for a deterministic result. This is the workhorse behind
    quota-style selection (take documents until a token budget is
    hit), shard byte-offset assignment, and cumulative-distribution
    reports.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    dtypes = dict(df.dtypes)
    int_types = ("tinyint", "smallint", "int", "bigint")
    integral = dtypes[value_col] in int_types
    ranged = (
        df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
        .withColumn("_pid", F.spark_partition_id())
        .sortWithinPartitions(*cols)
    )
    # EVERY integral column rides the Arrow lane as a NULL-FREE
    # widened copy plus a null marker, never raw: Arrow→pandas
    # promotes a nullable int64 to float64, which silently loses low
    # bits above 2^53 — and that corrupts not just the value column's
    # accumulation (the old fillna(0).astype round-trip) but ANY
    # integral payload column merely PASSING THROUGH a partition that
    # happens to contain a null (r11 review catch, extended: the
    # review flagged the value lane; the repro showed the passthrough
    # lane too). Non-integral columns are safe: floats are already
    # float64, strings/arrays/structs ride as objects, decimals as
    # Decimal objects. Widened to long Spark-side for the same reason
    # the old code widened in pandas: a narrow cumsum wraps.
    enc = ranged
    protected: dict[str, tuple[str, str]] = {}
    for i, (name, t) in enumerate(df.dtypes):
        if t in int_types:
            z, m = f"_z{i}", f"_m{i}"
            protected[name] = (z, m)
            enc = (
                enc.withColumn(z, F.coalesce(F.col(name).cast("long"), F.lit(0).cast("long")))
                .withColumn(m, F.col(name).isNull())
                .drop(name)
            )
    if integral:
        vz, vm = protected[value_col]
    else:
        vz, vm = "_vz", "_vm"
        enc = enc.withColumn(
            vz, F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
        ).withColumn(vm, F.col(value_col).isNull())

    cum_type = LongType() if integral else DoubleType()
    out_schema = StructType(list(enc.schema.fields) + [StructField("_local_cum", cum_type)])

    def _cumsum(batches):
        # One call per partition; batches arrive in sortWithinPartitions
        # order, so carrying the accumulator across batches yields the
        # partition-local running total in a single streaming pass.
        # Partition-LOCAL null masking only — the global SQL null rule
        # (null until the first non-null anywhere before) is finished
        # by the _seen flag in the offset join below.
        acc = 0
        seen_nonnull = 0
        for pdf in batches:
            nonnull = (~pdf[vm]).astype("int64").cumsum() + seen_nonnull
            c = pdf[vz].cumsum() + acc
            # Mask through the NULLABLE Int64 dtype, not .where() on
            # the numpy int64 series: numpy has no int-NA, so where()
            # promotes to float64 and the masked column would lose
            # >2^53 bits on the way back out — the same lane the
            # coalesce/marker encoding protects everywhere else.
            masked = (c.astype("Int64") if integral else c).where(nonnull > 0)
            pdf = pdf.assign(_local_cum=masked)
            if len(c):
                acc = c.iloc[-1]
                seen_nonnull = int(nonnull.iloc[-1])
            yield pdf

    local = enc.mapInPandas(_cumsum, out_schema)
    # Pin before the two-job split, same rationale (and same lazy
    # spelling — the totals collect materializes it) as global_rank.
    if pin:
        local = local.localCheckpoint(eager=False)
    totals = sorted(
        (r["_pid"], r["s"], r["c"])
        for r in local.groupBy("_pid")
        .agg(
            F.sum(F.when(~F.col(vm), F.col(vz))).alias("s"),
            F.sum((~F.col(vm)).cast("long")).alias("c"),
        )
        .collect()
    )
    offsets, acc, nonnull_before = {}, 0 if integral else 0.0, 0
    for pid, s, c in totals:
        offsets[pid] = (acc, nonnull_before > 0)
        acc += s or 0
        nonnull_before += c or 0
    # Offsets carry the value type: casting a double running total to
    # long would silently truncate. (For doubles the offset is a sum of
    # per-partition totals, a different addition order than the strict
    # sequential window — identical for integers/exact doubles, ~1e-16
    # tail otherwise; the oracle-checked queries use integral values.)
    off_type = "long" if integral else "double"
    off_df = df.sparkSession.createDataFrame(
        [(pid, off, seen) for pid, (off, seen) in offsets.items()],
        f"_pid int, _offset {off_type}, _seen boolean",
    )
    # SQL SUM-over-frame null rule is GLOBAL: a row whose partition
    # prefix is all-null still shows the running total of the earlier
    # partitions (the _seen branch) — the old `_offset + _local_cum`
    # returned null for such rows whenever a range partition happened
    # to start with nulls (r11 review catch); null survives only
    # before the first non-null value of the whole frame.
    restored = local.join(F.broadcast(off_df), on="_pid").withColumn(
        out_col,
        F.when(
            F.col("_local_cum").isNotNull(),
            (F.col("_offset") + F.col("_local_cum")).cast(off_type),
        ).when(F.col("_seen"), F.col("_offset").cast(off_type)),
    )
    for name, (z, m) in protected.items():
        restored = restored.withColumn(
            name, F.when(~F.col(m), F.col(z).cast(dtypes[name]))
        )
    return restored.select(*df.columns, out_col)
