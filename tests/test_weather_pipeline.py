"""Weather-domain tests (SURVEY.md §5.2 items 3-4): gold-input →
gold-output for the A3-A6 transform fine points, end-to-end pipeline
idempotence, and the canned-fetcher streaming source."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from openweathermapapi_etl_spark.operators.merge import VersionedParquetTable
from openweathermapapi_etl_spark.pipeline.weather import (
    run_batch_pipeline,
    transform_raw,
)
from openweathermapapi_etl_spark.schemas import WEATHER_RAW
from openweathermapapi_etl_spark.streaming.source import (
    http_microbatch_query,
    make_canned_fetcher,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "weather_raw.jsonl")


def make_raw(spark, docs):
    return spark.read.schema(WEATHER_RAW).json(
        spark.sparkContext.parallelize([json.dumps(d) for d in docs])
    )


DOC = {
    "dt": 1_690_000_000,  # 2023-07-22T04:26:40Z
    "timezone": 3600,
    "name": "Rotterdam",
    "weather": [
        {"id": 500, "main": "Rain", "description": "light rain", "icon": "10d"},
        {"id": 701, "main": "Mist", "description": "mist", "icon": "50d"},
    ],
    "main": {"temp": 18.5, "feels_like": 18.0, "humidity": 70},
}


def test_transform_naive_local_time(spark):
    """A5+A6: stored Time is naive local wall-clock = UTC + offset
    (ref weather-etl.py:126-128), not a zone conversion."""
    row = transform_raw(make_raw(spark, [DOC])).collect()[0]
    assert row.Time == datetime.datetime(2023, 7, 22, 5, 26, 40)  # UTC+1h
    assert row.City_Name == "Rotterdam"
    assert row.Temperature == 18.5


def test_transform_negative_offset(spark):
    doc = dict(DOC, timezone=-18000)
    row = transform_raw(make_raw(spark, [doc])).collect()[0]
    assert row.Time == datetime.datetime(2023, 7, 21, 23, 26, 40)  # UTC-5h


def test_transform_multi_element_array_join_order(spark):
    """A4: ', '-join in array order (ref weather-etl.py:130)."""
    row = transform_raw(make_raw(spark, [DOC])).collect()[0]
    assert row.Weather_Description == "light rain, mist"


def test_transform_empty_array(spark):
    doc = dict(DOC, weather=[])
    row = transform_raw(make_raw(spark, [doc])).collect()[0]
    assert row.Weather_Description == ""


def test_transform_missing_field_is_null_not_crash(spark):
    """Schema-first decode: a missing field is NULL (the reference's
    dict access would KeyError — SURVEY.md §1.3)."""
    doc = {k: v for k, v in DOC.items() if k != "main"}
    row = transform_raw(make_raw(spark, [doc])).collect()[0]
    assert row.Temperature is None


def test_pipeline_e2e_idempotent_rerun(spark, tmp_path):
    """§5.2 item 4: run the full pipeline twice → identical final table
    (A11 idempotence)."""
    t1 = run_batch_pipeline(spark, FIXTURE, str(tmp_path / "w1"))
    first = {tuple(r) for r in t1.read(spark).collect()}
    t2 = run_batch_pipeline(spark, FIXTURE, str(tmp_path / "w1"))
    second = {tuple(r) for r in t2.read(spark).collect()}
    assert first == second and len(first) > 0
    # PK holds (B22 over the weather table).
    dups = (
        t2.read(spark).groupBy("Time", "City_Name").count().filter("count > 1")
    ).collect()
    assert dups == []


def test_pipeline_null_dt_document_survives_replay(spark, tmp_path):
    """A document missing ``dt`` decodes as NULL under the schema-first
    contract (vs the reference's KeyError) — it must ride ONE replay
    batch with a NULL Time, not silently vanish: the old ``dt == None``
    batch predicate never matched (three-valued logic, r12 review)."""
    no_dt = {k: v for k, v in DOC.items() if k != "dt"}
    no_dt["name"] = "NullDtCity"
    path = tmp_path / "docs_null_dt.jsonl"
    with open(path, "w") as fh:
        fh.write(json.dumps(DOC) + "\n")
        fh.write(json.dumps(no_dt) + "\n")
    table = run_batch_pipeline(spark, str(path), str(tmp_path / "wn"))
    rows = {
        (r["City_Name"], r["Time"] is None)
        for r in table.read(spark).collect()
    }
    assert ("NullDtCity", True) in rows, rows
    assert ("Rotterdam", False) in rows


def test_streaming_http_source_canned(spark, tmp_path):
    """A1 via the rate-clock + injectable fetcher: one tick fetches all
    cities, transforms, and merges; a second tick upserts over it."""
    cities = ["CityA", "CityB"]
    doc_a = dict(DOC, name="CityA")
    doc_b = dict(DOC, name="CityB", main={"temp": 3.0, "feels_like": 1.0, "humidity": 50})
    fetcher = make_canned_fetcher(
        {"CityA": [doc_a, dict(doc_a, main={"temp": 21.0, "feels_like": 20.0, "humidity": 60})],
         "CityB": [doc_b, dict(doc_b)]}
    )
    root = str(tmp_path / "weather_stream")
    q = http_microbatch_query(
        spark, fetcher, root, cities=cities, interval="1 seconds"
    )
    try:
        table = VersionedParquetTable(root)
        import time

        deadline = time.time() + 60
        while time.time() < deadline and (table.current_version() or 0) < 2:
            time.sleep(0.5)
    finally:
        q.stop()
    assert (table.current_version() or 0) >= 2
    rows = {(r.City_Name, r.Temperature) for r in table.read(spark).collect()}
    # Same (dt, city) key across ticks → second fetch overwrote the first.
    assert ("CityA", 21.0) in rows and ("CityB", 3.0) in rows


def test_bronze_log_idempotent_on_batch_retry(spark, tmp_path):
    """A16 retry idempotence (round-3 fix): a failed micro-batch is
    re-entered by Spark with the SAME batch_id; the bronze zone writes
    mode=overwrite per batch dir, so the retry replaces rather than
    double-logs. Simulate the retry by invoking the batch processor
    twice with batch_id=0 and assert the bronze dir holds each city's
    document exactly once."""
    from openweathermapapi_etl_spark.streaming.source import make_batch_processor

    cities = ["CityA", "CityB"]
    docs = {
        "CityA": [dict(DOC, name="CityA"), dict(DOC, name="CityA")],
        "CityB": [dict(DOC, name="CityB"), dict(DOC, name="CityB")],
    }
    bronze = str(tmp_path / "bronze")
    table = VersionedParquetTable(str(tmp_path / "tbl"))
    process = make_batch_processor(
        spark, make_canned_fetcher(docs), table, cities, raw_log_root=bronze
    )
    process(None, 0)
    process(None, 0)  # the retry: same batch_id
    logged = spark.read.text(os.path.join(bronze, "batch=0"))
    assert logged.count() == len(cities)  # not 2x
    names = sorted(
        json.loads(r.value)["name"] for r in logged.collect()
    )
    assert names == ["CityA", "CityB"]
    # ...and the silver table stayed key-unique (M1 idempotence).
    dups = table.read(spark).groupBy("Time", "City_Name").count().filter(
        "count > 1"
    ).collect()
    assert dups == []


def test_processing_time_trigger_fires_on_real_clock(spark, tmp_path):
    """A12: the reference schedules on a real clock (cron */5,
    /root/reference/dags/weather-etl.py:46). Run the stream with a
    1-second ``processingTime`` trigger — NOT availableNow — let ≥2
    ticks fire on the wall clock, assert the batch count from the
    query's own progress log, and stop cleanly."""
    import time

    cities = ["CityA"]
    # Sized to outlast the worst case: 1s ticks for the full 60s poll
    # deadline on a loaded machine (round-4 advisor: a drained queue
    # kills the query mid-test with an opaque fetcher error instead of
    # a clear tick-count assertion).
    fetcher = make_canned_fetcher({"CityA": [dict(DOC, name="CityA")] * 120})
    root = str(tmp_path / "weather_clock")
    q = http_microbatch_query(
        spark, fetcher, root, cities=cities, interval="1 seconds"
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(q.recentProgress) < 3:
            time.sleep(0.5)
        progress = list(q.recentProgress)
    finally:
        q.stop()
        q.awaitTermination(30)
    batch_ids = {p["batchId"] for p in progress}
    assert len(batch_ids) >= 2, f"expected >=2 real-clock ticks, got {batch_ids}"
    assert not q.isActive  # clean stop
    assert VersionedParquetTable(root).current_version() >= 1


def test_distributed_fetch_matches_driver_side(spark, tmp_path):
    """A1 scale flavor: the mapInPandas executor-side fetch produces the
    same silver table as the driver-side loop for the same documents,
    bronze log included."""
    from openweathermapapi_etl_spark.streaming.source import (
        make_distributed_batch_processor,
    )

    cities = ["CityA", "CityB"]
    docs = {
        "CityA": [dict(DOC, name="CityA")],
        "CityB": [dict(DOC, name="CityB", main={"temp": 3.0, "feels_like": 1.0, "humidity": 50})],
    }
    bronze = str(tmp_path / "bronze_dist")
    table = VersionedParquetTable(str(tmp_path / "tbl_dist"))
    process = make_distributed_batch_processor(
        spark, make_canned_fetcher(docs), table, cities, raw_log_root=bronze
    )
    process(None, 0)
    rows = {(r.City_Name, r.Temperature) for r in table.read(spark).collect()}
    assert rows == {("CityA", 18.5), ("CityB", 3.0)}
    logged = spark.read.text(os.path.join(bronze, "batch=0"))
    assert sorted(json.loads(r.value)["name"] for r in logged.collect()) == cities


def test_distributed_fetch_mid_partition_failure_aborts_batch(spark, tmp_path):
    """A7 atomicity in the executor-side flavor: the fetch runs INSIDE
    the write job, so one city failing mid-partition fails the job and
    the M1 version pointer never moves — nothing committed, same
    all-or-nothing guarantee as the driver-side loop."""
    import pytest

    from openweathermapapi_etl_spark.streaming.source import (
        make_distributed_batch_processor,
    )

    cities = ["CityA", "CityBoom"]
    # CityA has a document; CityBoom's queue is empty → the task
    # running its partition raises mid-job.
    fetcher = make_canned_fetcher({"CityA": [dict(DOC, name="CityA")]})
    table = VersionedParquetTable(str(tmp_path / "tbl_atomic"))
    process = make_distributed_batch_processor(spark, fetcher, table, cities)
    with pytest.raises(Exception, match="no canned response left"):
        process(None, 0)
    assert table.current_version() is None


def test_failed_fetch_aborts_whole_batch(spark, tmp_path):
    """A7 atomicity: one city succeeds, the next raises — the batch
    must abort with NOTHING written (the reference commits once per
    run, after all cities: a failed HTTP call means no partial table,
    /root/reference/dags/weather-etl.py:119,143)."""
    import time

    cities = ["CityA", "CityBoom"]
    # CityA has a document; CityBoom's queue is empty → fetcher raises.
    fetcher = make_canned_fetcher({"CityA": [dict(DOC, name="CityA")]})
    root = str(tmp_path / "weather_atomic")
    q = http_microbatch_query(
        spark, fetcher, root, cities=cities, interval="1 seconds"
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and q.exception() is None:
            time.sleep(0.5)
        exc = q.exception()
    finally:
        q.stop()
    assert exc is not None  # the batch failed loudly (not A15 silence)
    # ...and atomically: no version was ever committed.
    assert VersionedParquetTable(root).current_version() is None


# ---------------------------------------------------------------------------
# A1 as a Spark-4 Python DataSource (streaming/http_datasource.py)
# ---------------------------------------------------------------------------


def _ds_stream(spark, canned: dict, cities: str):
    import json as _json

    from openweathermapapi_etl_spark.streaming.http_datasource import (
        WeatherHTTPDataSource,
    )

    spark.dataSource.register(WeatherHTTPDataSource)
    return (
        spark.readStream.format("weather_http")
        .option("cities", cities)
        .option("canned", _json.dumps(canned))
        .load()
    )


def test_http_datasource_emits_one_row_per_city_per_tick(spark):
    import json as _json
    import time

    canned = {c: [dict(DOC, name=c)] * 60 for c in ("CityA", "CityB")}
    stream = _ds_stream(spark, canned, "CityA,CityB")
    batches: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.collect())
        )
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(batches) < 2:
        time.sleep(0.5)
    assert q.exception() is None
    q.stop()
    q.awaitTermination()
    assert len(batches) >= 2
    first = sorted((r["city"], _json.loads(r["raw"])["name"]) for r in batches[0])
    assert first == [("CityA", "CityA"), ("CityB", "CityB")]


def test_http_datasource_failed_fetch_aborts_batch(spark):
    import time

    # CityBoom has NO canned responses: its fetch raises inside the
    # sweep, before any row is returned — the batch must abort with
    # ZERO rows committed (A7 atomicity through the DataSource API).
    canned = {"CityA": [dict(DOC, name="CityA")] * 5}
    stream = _ds_stream(spark, canned, "CityA,CityBoom")
    batches: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.collect())
        )
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and q.exception() is None:
        time.sleep(0.5)
    exc = q.exception()
    assert exc is not None and "CityBoom" in str(exc)
    assert batches == []  # nothing committed


def test_http_datasource_drives_full_pipeline_e2e(spark, tmp_path):
    """A1b end-to-end: the custom DataSource stream → parse raw JSON
    (WEATHER_RAW) → A3-A6 transform → A10 dedup → M1 merge into the
    versioned table — the whole reference DAG with the Spark-4-native
    source mounted at the front. Two ticks of identical canned docs
    must land exactly one row per city (idempotent merge), proving the
    DataSource flavor composes with the same downstream as the
    foreachBatch source."""
    import json as _json
    import time

    cities = ("Rotterdam", "Amsterdam")
    canned = {
        c: [dict(DOC, name=c)] * 60 for c in cities
    }
    stream = _ds_stream(spark, canned, ",".join(cities))
    table = VersionedParquetTable(str(tmp_path / "weather"))
    keys = ["City_Name", "Time"]

    from openweathermapapi_etl_spark.operators.merge import keyed_upsert

    def land(batch_df, _bid):
        rows = [r["raw"] for r in batch_df.collect()]
        raw = spark.read.schema(WEATHER_RAW).json(
            spark.sparkContext.parallelize(rows)
        )
        tidy = transform_raw(raw).dropDuplicates()
        cur = table.read(spark) if table.current_version() else None
        merged = keyed_upsert(cur, tidy, keys=keys) if cur is not None else tidy
        table.overwrite(merged)

    q = (
        stream.writeStream.foreachBatch(land)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and (table.current_version() or 0) < 2:
        time.sleep(0.5)
    assert q.exception() is None
    q.stop()
    q.awaitTermination()
    out = table.read(spark).collect()
    assert {r.City_Name for r in out} == set(cities)
    assert len(out) == 2  # identical ticks merged idempotently


# ---------------------------------------------------------------------------
# B64: Python DataSource SINK (sources/jsonl_datasource.py) — the writer
# half of the Spark 4 Python DataSource API, with the commit protocol
# (per-task commit messages -> driver commit/abort) proven both ways.
# ---------------------------------------------------------------------------


def _register_jsonl_sink(spark):
    from openweathermapapi_etl_spark.sources.jsonl_datasource import (
        JsonlDirDataSource,
    )

    try:
        spark.dataSource.register(JsonlDirDataSource)
    except Exception:
        pass  # already registered in this session


def test_jsonl_sink_commit_writes_manifest_and_roundtrips(spark, tmp_path):
    from openweathermapapi_etl_spark.sources.jsonl_datasource import (
        committed_files,
    )

    _register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS doubled")
    df.repartition(4).write.format("jsonl_dir").option("path", out).mode(
        "append"
    ).save()
    files = committed_files(out)
    assert len(files) == 4
    # no stray temp files survive a successful commit
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]
    back = spark.read.json(files)
    assert back.count() == 100
    assert {r.id * 2 for r in back.collect()} == {r.doubled for r in back.collect()}


def test_jsonl_sink_task_failure_aborts_whole_batch(spark, tmp_path):
    """One failing task must leave NO committed output (no manifest, no
    visible files) — the A7 all-or-nothing contract through the real
    executor/driver commit protocol."""
    import pyspark.errors

    from openweathermapapi_etl_spark.sources.jsonl_datasource import (
        committed_files,
    )

    _register_jsonl_sink(spark)
    out = str(tmp_path / "sink_fail")
    df = spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS s")
    with pytest.raises(Exception):
        df.repartition(4).write.format("jsonl_dir").option("path", out).option(
            "fail_on_value", "37"
        ).mode("append").save()
    assert committed_files(out) == []
    assert not os.path.exists(os.path.join(out, "_COMMITTED"))


def test_jsonl_sink_append_accumulates_overwrite_replaces(spark, tmp_path):
    """The mode the sink's own docstring advertises: two append saves
    must ACCUMULATE (the old fixed part-NNNNN names + wholesale
    manifest replace silently destroyed the first batch — r11 review
    catch), and an overwrite save must replace everything and unlink
    the superseded files."""
    from openweathermapapi_etl_spark.sources.jsonl_datasource import (
        committed_files,
    )

    _register_jsonl_sink(spark)
    out = str(tmp_path / "sink_modes")

    def save(lo, hi, mode):
        spark.range(lo, hi).selectExpr("id").repartition(2).write.format(
            "jsonl_dir"
        ).option("path", out).mode(mode).save()

    save(0, 10, "append")
    save(10, 30, "append")
    files = committed_files(out)
    assert len(files) == 4  # 2 parts per commit, both commits visible
    assert {r.id for r in spark.read.json(files).collect()} == set(range(30))

    save(100, 105, "overwrite")
    files = committed_files(out)
    assert len(files) == 2
    assert {r.id for r in spark.read.json(files).collect()} == set(range(100, 105))
    # superseded data files were unlinked after the manifest swing
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert on_disk == {os.path.basename(f) for f in files}


def test_jsonl_sink_abort_cleans_failed_tasks_own_temp(spark, tmp_path):
    """abort() must remove the FAILED task's partial temp too — it
    never returned a commit message, so the old message-list loop
    left it on disk forever (r11 review catch)."""
    from openweathermapapi_etl_spark.sources.jsonl_datasource import (
        committed_files,
    )

    _register_jsonl_sink(spark)
    out = str(tmp_path / "sink_abort_tmp")
    df = spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS s")
    with pytest.raises(Exception):
        df.repartition(4).write.format("jsonl_dir").option("path", out).option(
            "fail_on_value", "37"
        ).mode("append").save()
    assert committed_files(out) == []
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")], (
        "failed task's partial temp must be cleaned by abort()"
    )


def test_jsonl_sink_requires_path(spark):
    _register_jsonl_sink(spark)
    df = spark.range(3)
    with pytest.raises(Exception, match="path"):
        df.write.format("jsonl_dir").mode("append").save()


def _staged_writer(jd, out, n_rows=1):
    """A writer with one already-written temp file + its commit
    message, driving the driver-side commit() directly (no Spark job
    needed to exercise the manifest protocol)."""
    w = jd._JsonlDirWriter({"path": str(out)}, overwrite=False)
    tmp = f"_tmp_{w.commit_id}_unit.jsonl"
    (out / tmp).write_text('{"id": 0}\n' * n_rows)
    return w, jd._FileCommit(tmp_name=tmp, n_rows=n_rows)


def test_jsonl_sink_unreadable_manifest_refuses_commit(tmp_path):
    """ONLY a missing manifest means "no prior commits". A corrupt or
    unreadable one must ABORT the commit instead of being atomically
    replaced with just the new batch's files — the old `except
    (OSError, ValueError, KeyError): return []` silently dropped every
    previously committed file from readers (r12 advisor catch)."""
    from openweathermapapi_etl_spark.sources import jsonl_datasource as jd

    out = tmp_path / "sink_corrupt_manifest"
    out.mkdir()
    (out / jd.MANIFEST).write_text("{this is not json")
    w, msg = _staged_writer(jd, out)
    with pytest.raises(RuntimeError, match="unreadable sink manifest"):
        w.commit([msg])
    # the commit point never swung: the unreadable manifest survives
    # byte-for-byte for an operator to inspect, and no lock leaks
    assert (out / jd.MANIFEST).read_text() == "{this is not json"
    assert not (out / (jd.MANIFEST + ".lock")).exists()
    # the reader raises on it too (unreadable != empty)
    with pytest.raises(json.JSONDecodeError):
        jd.committed_files(str(out))


def test_jsonl_sink_concurrent_appends_all_survive(tmp_path):
    """The manifest merge is a read-modify-write; the per-path lock
    file must serialize concurrent append commits so the last one
    can't erase earlier commits' files from the manifest (r12 advisor
    catch — without the lock this test loses files nondeterministically)."""
    import threading

    from openweathermapapi_etl_spark.sources import jsonl_datasource as jd

    out = tmp_path / "sink_concurrent_append"
    out.mkdir()
    staged = [_staged_writer(jd, out) for _ in range(8)]
    barrier = threading.Barrier(len(staged))
    errs: list[Exception] = []

    def go(w, m):
        barrier.wait()
        try:
            w.commit([m])
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [
        threading.Thread(target=go, args=(w, m)) for w, m in staged
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert len(jd.committed_files(str(out))) == len(staged)
    assert not (out / (jd.MANIFEST + ".lock")).exists()


def test_jsonl_sink_stale_lock_fails_loudly(tmp_path, monkeypatch):
    """A lock left by a dead writer must surface as an error after the
    bounded retries — never a silent skip or an unlocked write."""
    from openweathermapapi_etl_spark.sources import jsonl_datasource as jd

    monkeypatch.setattr(jd.time, "sleep", lambda s: None)  # fast retries
    out = tmp_path / "sink_stale_lock"
    out.mkdir()
    (out / (jd.MANIFEST + ".lock")).write_text("")
    w, msg = _staged_writer(jd, out)
    with pytest.raises(RuntimeError, match="manifest lock held"):
        w.commit([msg])


def _ds_dist_stream(spark, canned: dict, cities: str):
    import json as _json

    from openweathermapapi_etl_spark.streaming.http_datasource import (
        WeatherHTTPDistDataSource,
    )

    spark.dataSource.register(WeatherHTTPDistDataSource)
    return (
        spark.readStream.format("weather_http_dist")
        .option("cities", cities)
        .option("canned", _json.dumps(canned))
        .load()
    )


def test_http_dist_datasource_executor_side_fetch_per_city(spark):
    import json as _json
    import time

    canned = {c: [dict(DOC, name=c)] * 60 for c in ("CityA", "CityB")}
    stream = _ds_dist_stream(spark, canned, "CityA,CityB")
    batches: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.collect())
        )
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(batches) < 2:
        time.sleep(0.5)
    assert q.exception() is None
    q.stop()
    q.awaitTermination()
    assert len(batches) >= 2
    first = sorted((r["city"], _json.loads(r["raw"])["name"]) for r in batches[0])
    assert first == [("CityA", "CityA"), ("CityB", "CityB")]


def test_http_dist_datasource_failing_city_task_aborts_batch(spark):
    import time

    canned = {"CityA": [dict(DOC, name="CityA")] * 5}  # CityBoom absent
    stream = _ds_dist_stream(spark, canned, "CityA,CityBoom")
    batches: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.collect())
        )
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and q.exception() is None:
        time.sleep(0.5)
    exc = q.exception()
    q.stop()
    assert exc is not None and "CityBoom" in str(exc)
    assert batches == []  # task failure aborted the batch pre-commit


def test_http_dist_reader_resumes_offsets_across_restart(tmp_path):
    """Restart contract (r11 review catch): the engine restores its
    committed offset, but the dist reader's counter lived only in
    instance memory — a restarted query saw latestOffset()=1 against
    start=N and planned empty/stalled batches for N triggers. With the
    offset_state option the counter round-trips a driver-local file
    (written in commit()), so a fresh instance resumes PAST the
    restored offset. Unit-level: drive the reader protocol directly —
    default cities (pins the DEFAULT_CITIES NameError fix) and no
    network (canned)."""
    import json as _json

    from openweathermapapi_etl_spark.streaming.http_datasource import (
        WeatherHTTPDistStreamReader,
    )
    from openweathermapapi_etl_spark.streaming.source import DEFAULT_CITIES

    state = str(tmp_path / "offsets.json")
    canned = _json.dumps({c: [{}] * 50 for c in DEFAULT_CITIES})
    # Default-cities path: no 'cities' option (was a NameError).
    r1 = WeatherHTTPDistStreamReader({"canned": canned, "offset_state": state})
    assert r1.initialOffset() == {"batch": 0}
    end = None
    for _ in range(3):
        start, end = end or r1.initialOffset(), r1.latestOffset()
        parts = r1.partitions(start, end)
        assert len(parts) == len(DEFAULT_CITIES) * (end["batch"] - start["batch"])
        r1.commit(end)
    assert end == {"batch": 3}

    # "Restart": a fresh instance must resume at the committed offset,
    # so its next latestOffset EXCEEDS the engine-restored start.
    r2 = WeatherHTTPDistStreamReader({"canned": canned, "offset_state": state})
    nxt = r2.latestOffset()
    assert nxt == {"batch": 4}, "counter must resume from the state file"
    assert r2.partitions({"batch": 3}, nxt)  # non-empty follow-on batch

    # Without offset_state the reader stays fresh-query-correct.
    r3 = WeatherHTTPDistStreamReader({"canned": canned})
    assert r3.initialOffset() == {"batch": 0}
