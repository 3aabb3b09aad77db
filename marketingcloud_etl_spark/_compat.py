"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import SparkSession


def parquet_count(spark: SparkSession, path: str) -> int:
    """Row count of a parquet target, 0 when absent — the reference's
    _get_record_count error fallback (R11,
    /root/reference/app/salesforce_extractor.py:183-195)."""
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0
