#!/usr/bin/env python
"""Skew-adversarial probe: salted vs naive join/agg spellings under a
genuinely hot key (round-13 order #1).

Every scale probe before round 13 ran on uniform-density data
(tools/make_sf1.py replicates sf0.1 verbatim), so the engine's skew
machinery — operators/skew.py salting, the AQE skew-join conf, the
null-bypass rewrite — had plan pins but no MEASURED behavior under the
distribution it exists for. This tool times matched spellings of the
same query on a zipfian fixture (make_sf1.py --zipf: hot o_custkey =
10% of orders, hot l_orderkey = 10% of lineitems), each arm in its own
fresh-JVM child process, one warmup + min-of-N, with the join-strategy
confs pinned PER ARM:

  join arms (orders ⋈ customer on o_custkey, zipf-hot):
    join_bhj        — session defaults: customer broadcasts (the
                      toy-scale escape hatch; at 100 TB the dim side
                      of this join does NOT fit, so the other arms
                      force the shuffle path honestly)
    join_smj_noaqe  — broadcast off, AQE skew split off: the naive
                      100 TB straggler (hot key → one reducer)
    join_smj_aqe    — broadcast off, AQE skew split ON: the cure
    join_salted     — broadcast off, operators/skew.salted_join(8):
                      the prevention (hot key spread over 8 salts)

  agg arms (groupBy o_custkey: sum+count over zipf-hot key):
    agg_naive       — plain groupBy: partial aggregation should absorb
                      the hot key map-side (the claim in
                      operators/skew.py's docstring — measured here)
    agg_salted      — salted_sum_count(16)

  window arm (informational):
    window_hot_user — row_number over PARTITION BY user_id on zipf
                      events (hot user = 10%): the one skew with no
                      algebraic cure — the floor any partition-keyed
                      window pays under a hot key.

Usage:
  python tools/skew_probe.py [--sf-dir /tmp/sf1z] [--runs 3] [arm ...]
  python tools/skew_probe.py --one ARM        (internal child mode)

Prints one JSON line {"sf_dir":..., "runs":N, "arms":{name: min_sec},
"failed":[...]}. Run against BOTH /tmp/sf1 (uniform) and /tmp/sf1z
(zipf) to separate volume cost from skew cost; SCALE.md records the
findings.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Per-arm session conf overrides (applied after engine defaults).
NO_BHJ = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
ARM_CONFS: dict[str, dict[str, str]] = {
    "join_bhj": {},
    "join_smj_noaqe": {**NO_BHJ, "spark.sql.adaptive.skewJoin.enabled": "false"},
    "join_smj_aqe": {**NO_BHJ, "spark.sql.adaptive.skewJoin.enabled": "true"},
    "join_salted": dict(NO_BHJ),
    # The fact-side flavor (lineitem ⋈ orders on zipf-hot l_orderkey):
    # 4x the rows of the orders⋈customer arm — at sf1 volumes the
    # orders arm's hot key finishes in well under a task quantum and
    # skew never binds; this is the arm that shows the straggler.
    "ljoin_smj_noaqe": {**NO_BHJ, "spark.sql.adaptive.skewJoin.enabled": "false"},
    "ljoin_smj_aqe": {**NO_BHJ, "spark.sql.adaptive.skewJoin.enabled": "true"},
    # AQE with the skew thresholds scaled to the fixture: the DEFAULT
    # 256 MB skewedPartitionThresholdInBytes is production-sized, so a
    # 3M-row (~100 MB) hot partition at local volumes is never split —
    # the aqe arm above measures that refusal; this arm scales the
    # byte gates down by the same factor the data is scaled down,
    # which is what the conf would look like relative to partition
    # sizes at 100 TB.
    "ljoin_smj_aqe_tuned": {
        **NO_BHJ,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    },
    "ljoin_salted": dict(NO_BHJ),
    "agg_naive": {},
    "agg_salted": {},
    "window_hot_user": {},
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _tables(spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return o, c


def build_arm(spark, sf_dir: str, arm: str):
    from pyspark.sql import functions as F

    if arm.startswith("join_"):
        o, c = _tables(spark, sf_dir)
        c = c.withColumnRenamed("c_custkey", "o_custkey")
        if arm == "join_salted":
            from openweathermapapi_etl_spark.operators.skew import salted_join

            out = salted_join(o, c, on="o_custkey", n_salts=8,
                              salt_on="o_orderkey")
        else:
            out = o.join(c, "o_custkey")
        return out.select("o_orderkey", "o_totalprice", "c_name",
                          "c_nationkey")
    if arm.startswith("ljoin_"):
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate",
            "o_orderpriority",
        )
        if arm == "ljoin_salted":
            from openweathermapapi_etl_spark.operators.skew import salted_join

            out = salted_join(li, o, on="l_orderkey", n_salts=8,
                              salt_on="l_partkey")
        else:
            out = li.join(o, "l_orderkey")
        return out.select("l_orderkey", "l_quantity", "l_extendedprice",
                          "o_orderdate", "o_orderpriority")
    if arm == "agg_naive":
        o, _ = _tables(spark, sf_dir)
        return o.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s"),
            F.count("*").alias("n_rows"),
        )
    if arm == "agg_salted":
        from openweathermapapi_etl_spark.operators.skew import salted_sum_count

        o, _ = _tables(spark, sf_dir)
        return salted_sum_count(
            o, ["o_custkey"],
            {"s": F.col("o_totalprice").cast("decimal(38,6)")},
            n_salts=16, salt_on="o_orderkey",
        )
    if arm == "window_hot_user":
        from pyspark.sql import Window

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        w = Window.partitionBy("user_id").orderBy("event_id")
        return ev.select(
            "event_id", "user_id",
            F.row_number().over(w).alias("rn"),
        )
    raise SystemExit(f"unknown arm: {arm}")


def _task_skew(app_port: int) -> list[dict]:
    """Per-stage max/median task durations from the UI REST API — the
    straggler evidence wall-clock alone cannot show at local volumes
    (scan/exchange phases amortize the skew out of the total)."""
    import json as _json
    import urllib.request

    def get(path: str):
        with urllib.request.urlopen(
            f"http://localhost:{app_port}/api/v1/{path}", timeout=10
        ) as r:
            return _json.loads(r.read())

    app_id = get("applications")[0]["id"]
    stages = get(f"applications/{app_id}/stages?status=complete")
    out = []
    for s in sorted(stages, key=lambda s: -(s.get("executorRunTime") or 0))[:4]:
        q = get(
            f"applications/{app_id}/stages/{s['stageId']}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
        )
        med, mx = q["duration"]
        out.append({
            "stage": s["stageId"],
            "name": (s.get("name") or "")[:60],
            "tasks": s.get("numCompleteTasks"),
            "median_task_ms": med,
            "max_task_ms": mx,
            "skew_ratio": round(mx / med, 1) if med else None,
        })
    return out


def run_one(arm: str, sf_dir: str, runs: int, tasks: bool = False):
    sys.path.insert(0, REPO)
    from openweathermapapi_etl_spark.session import get_session

    if tasks:
        # The engine session disables the UI; the task-skew probe
        # needs the REST API, so build the session directly with the
        # same confs get_session pins, plus the UI (child process —
        # no co-resident session to clash with).
        from pyspark.sql import SparkSession

        from openweathermapapi_etl_spark.session import RUNTIME_CONFS, prep

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        b = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"skew-probe-tasks-{arm}")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4049")
            .config("spark.sql.files.maxPartitionBytes",
                    str(128 * 1024 * 1024))
        )
        for k, v in RUNTIME_CONFS.items():
            b = b.config(k, v)
        spark = prep(b.getOrCreate())
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_session(f"skew-probe-{arm}")
    for k, v in ARM_CONFS.get(arm, {}).items():
        spark.conf.set(k, v)
    # Warmup: file listing + codegen, not measured.
    _force(spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .limit(1000))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(build_arm(spark, sf_dir, arm))
        best = min(best, time.perf_counter() - t0)
    if tasks:
        return {"min_sec": round(best, 3), "stages": _task_skew(4049)}
    return best


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sf-dir", default="/tmp/sf1z")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--tasks", action="store_true",
                   help="report per-stage max/median task durations "
                        "(UI REST) alongside wall time")
    p.add_argument("--one", metavar="ARM")
    p.add_argument("arms", nargs="*", default=[])
    opts = p.parse_args()
    if opts.one:
        r = run_one(opts.one, opts.sf_dir, opts.runs, tasks=opts.tasks)
        print(json.dumps({opts.one: r if opts.tasks else round(r, 3)}))
        return
    arms = opts.arms or list(ARM_CONFS)
    timings: dict[str, object] = {}
    failed: list[str] = []
    for arm in arms:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", opts.sf_dir, "--runs", str(opts.runs),
             *(["--tasks"] if opts.tasks else []),
             "--one", arm],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:] + "\n")
            failed.append(arm)
            continue
        timings.update(json.loads(out.stdout.strip().splitlines()[-1]))
        sys.stderr.write(f"{arm}: {timings[arm]}\n")
    print(json.dumps({"sf_dir": opts.sf_dir, "runs": opts.runs,
                      "arms": timings, "failed": failed}))


if __name__ == "__main__":
    main()
