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
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some
        # fixture generations and TIMESTAMP(MICROS, isAdjustedToUTC=false)
        # in others. Normalize both to a UTC-instant TIMESTAMP column:
        #  - nanos: Spark's vectorized reader rejects them; read as raw
        #    int64 and truncate to micros (ns div 1000) — identical to
        #    DuckDB's ns→us truncation, so oracle comparisons stay exact.
        #  - micros without tz: with NTZ inference on, this becomes
        #    TIMESTAMP_NTZ, which unix_micros()/watermarks reject.
        #    Disable inference so the stored micros are read as UTC
        #    epoch instants (exactly what DuckDB's naive read shows
        #    under the UTC session timezone prep() pins).
        # Both confs are captured at read/analysis time, so restoring
        # them immediately leaves later parquet reads unaffected.
        prev = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.legacy.parquet.nanosAsLong",
                "spark.sql.parquet.inferTimestampNTZ.enabled",
            )
        }
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
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
