"""End-to-end pipelines (the reference's ETL re-expressed Spark-first)."""

from .weather import transform_raw, run_batch_pipeline  # noqa: F401
