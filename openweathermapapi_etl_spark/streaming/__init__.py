"""Structured Streaming layer (SURVEY.md §2.2 B38-B44).

The reference's cron-driven micro-batch (5-minute Airflow DAG,
/root/reference/dags/weather-etl.py:46) generalizes to Structured
Streaming: triggers replace the scheduler, ``foreachBatch`` + M1
replaces staging-table-plus-merge, watermarks/windows add the
event-time semantics Postgres never had.
"""

from .source import http_microbatch_query, make_canned_fetcher  # noqa: F401
from .jobs import replay_files_stream, split_events_files  # noqa: F401
