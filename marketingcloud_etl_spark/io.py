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

__all__ = ["TABLES", "table", "register_views"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as raw nanos and truncate to micros with
        # integer division (ns div 1000) — identical to DuckDB's ns→us
        # truncation, so oracle comparisons stay exact. The conf is
        # captured at read/analysis time, so it can be restored
        # immediately — later nanos-parquet reads in the session are
        # unaffected.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def fixture_tag(sf_dir: str) -> str:
    """Identifier-safe cache tag for a fixture dir, keyed on the FULL
    absolute path: two trees with the same leaf name (/a/sf0.1 vs
    /b/sf0.1) must never share a /tmp materialization or a catalog
    table name. The leaf stays in the tag for human readability."""
    import hashlib

    abs_dir = os.path.abspath(sf_dir.rstrip("/"))
    leaf = os.path.basename(abs_dir).replace(".", "_")
    return f"{leaf}_{hashlib.sha1(abs_dir.encode()).hexdigest()[:10]}"
