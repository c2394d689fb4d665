"""Batch sources & sinks (SURVEY.md §2.2 B1-B5).

All readers take explicit schemas (no inference in the hot path).
Writers default to snappy parquet. JDBC (B5 — the reference's literal
sink, /root/reference/dags/weather-etl.py:112-114) is provided but off
the correctness path: no JDBC driver jar ships in this image, so it is
gated behind a runtime check.
"""

from .io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    read_jdbc,
    write_jdbc,
    write_parquet,
)
