"""Named-query catalog — the single registry behind __spark_entry__.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. The driver compares
the two at sf=0.01 (row-count + schema + order-insensitive value-hash),
so every computed column is aliased identically on both sides and all
float aggregation goes through the decimal-money protocol
(functions/money.py).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "QueryDef"] = {}

# modules that register queries on import
_PLAN_MODULES = (
    "marketingcloud_etl_spark.plans.relational",
    "marketingcloud_etl_spark.plans.scalar_fns",
    "marketingcloud_etl_spark.plans.etl_queries",
    "marketingcloud_etl_spark.plans.dedup_queries",
    "marketingcloud_etl_spark.plans.text_queries",
    "marketingcloud_etl_spark.plans.vector_queries",
    "marketingcloud_etl_spark.plans.streaming_queries",
    "marketingcloud_etl_spark.plans.udf_queries",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only driver check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every plan module (idempotent) and return the registry."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return QUERIES
