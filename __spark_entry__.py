"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship ingest+dedup+agg pipeline on sf0.001.
queries()     — every named operator query from the catalog
                (marketingcloud_etl_spark/plans/*).
oracle_sql()  — DuckDB-equivalent SQL for each SQL-expressible query;
                rows-only ops (streaming, LSH, REST source, multimodal)
                are intentionally absent here.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from marketingcloud_etl_spark.plans.catalog import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q00_flagship_ingest_dedup"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
