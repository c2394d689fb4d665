"""A1 (Spark-4-native flavor) — the weather HTTP source as a custom
Python DataSource, so the reference's fetch loop mounts directly on
``spark.readStream.format("weather_http")``.

The foreachBatch formulation (streaming/source.py) is the pragmatic
spelling of A1; this one is the *integration-native* spelling Spark 4
added a first-class API for: a ``DataSource`` subclass registered on
the session, whose ``SimpleDataSourceStreamReader`` drives offsets and
fetches. Same reference semantics, new mounting point:

- one fetch per configured city per micro-batch, any failure raising
  BEFORE rows are returned — the batch aborts atomically, nothing is
  committed (A7; ref /root/reference/dags/weather-etl.py:119);
- missing credentials fail at reader construction, not mid-stream
  (A14, ref :106-108);
- the offset is a plain batch counter: progress is the number of
  completed fetch sweeps, mirroring the reference's cron-tick model
  (ref :46).

The *simple* reader variant runs in the source's Python runner process
and ships rows to executors — the right trade at the reference's
12-requests-per-tick scale (the partition-planning
DataSourceStreamReader variant is the escape hatch for huge city
lists, same seam as fetch_documents_distributed). Because the runner
is a SEPARATE process (driver-side objects don't reach it) and
DataSource options are strings, the test seam is a ``canned`` option
carrying JSON response queues per city; absent that, the reader builds
the production ``requests`` fetcher.

Replay caveat (documented, inherent to a non-replayable upstream): on
checkpoint recovery ``readBetweenOffsets`` re-fetches live — the HTTP
API is not a replayable log, so recovered batches are at-least-once
with fresher-than-original data. The reference has the same property:
a re-run cron tick re-fetches. Downstream exactly-once is restored by
the M1 idempotent merge, as everywhere else in the pipeline.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("city", StringType(), False),
        StructField("raw", StringType(), False),
    ]
)


class WeatherHTTPStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        from .source import DEFAULT_CITIES, make_canned_fetcher

        cities_opt = options.get("cities")
        self.cities = (
            [c.strip() for c in cities_opt.split(",") if c.strip()]
            if cities_opt
            else list(DEFAULT_CITIES)
        )
        canned = options.get("canned")
        if canned is not None:
            # Test seam: per-city response queues, popped one per sweep
            # (state lives in this reader for the life of the query).
            self.fetcher = make_canned_fetcher(json.loads(canned))
        else:
            from .source import make_requests_fetcher

            # A14: credential check happens HERE, at stream start.
            self.fetcher = make_requests_fetcher()

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _sweep(self) -> list[tuple[str, str]]:
        # One fetch per city; the first failure raises and the whole
        # micro-batch aborts with nothing emitted (A7 atomicity).
        return [(c, json.dumps(self.fetcher(c))) for c in self.cities]

    def read(self, start: dict) -> tuple[list[tuple[str, str]], dict]:
        return self._sweep(), {"batch": start["batch"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple[str, str]]:
        # Recovery replay: re-fetch live (at-least-once; see module
        # docstring). One sweep per recovered batch.
        rows: list[tuple[str, str]] = []
        for _ in range(start["batch"], end["batch"]):
            rows.extend(self._sweep())
        return rows


class WeatherHTTPDataSource(DataSource):
    """``spark.dataSource.register(WeatherHTTPDataSource)`` then
    ``spark.readStream.format("weather_http").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "weather_http"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> WeatherHTTPStreamReader:
        return WeatherHTTPStreamReader(self.options)
