"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL (``BoydDataEngineer/OpenWeatherMapAPI-ETL``,
surveyed in ``/root/repo/SURVEY.md``), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession builder + runtime-conf pinning (UTC, AQE).
- ``schemas``    : every StructType (weather domain + testdata tables).
- ``catalog``    : testdata table loader / temp-view registration.
- ``sources``    : batch + streaming sources (parquet/json/csv, HTTP micro-batch).
- ``operators``  : custom operators Spark core lacks — keyed upsert (M1),
                   as-of join (B15), dedup family (C1/C2), similarity (C3),
                   text analysis (C4), multimodal (C5).
- ``functions``  : scalar-function helpers shared by plans.
- ``plans``      : the named query inventory (SURVEY §2) + DuckDB oracle twins.
- ``streaming``  : Structured Streaming jobs (B38-B44).
- ``pipeline``   : the end-to-end weather ETL (reference parity, A1-A16).

Design stance (100 TB): declarative DataFrame plans so Catalyst handles
pushdown/pruning/join selection; broadcast small dims; no driver-side
loops over data; Python only via Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
