"""Fixture-table loaders.

All ten tables from TESTDATA.md / FIXTURES.md, loaded as plain parquet
scans so Catalyst gets full predicate-pushdown + column-pruning freedom.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

__all__ = ["TABLES", "DEFAULT_SF_DIR", "table", "load_tables", "register_views"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as raw nanos and truncate to micros with
        # integer division (ns div 1000) — identical to DuckDB's ns→us
        # truncation, so oracle comparisons stay exact.
        # NOTE: nanosAsLong stays set for the session — any later
        # TIMESTAMP(NANOS) parquet read also comes back as bigint. The
        # `ts` dtype check below is the pattern such readers must copy.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
