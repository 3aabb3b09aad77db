"""marketingcloud_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
(`barschool/marketingcloud-etl`, see SURVEY.md) as an idiomatic Spark
DataFrame/SQL engine, extended with the relational operator surface and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) mandated by BASELINE.json, sized for 100 TB.

Layout:
    session    — SparkSession factory (AQE, UTC, arrow, local[N])
    io         — parquet fixture loaders
    functions/ — deterministic expression helpers (decimal-money
                 protocol, text metrics, vector math, content hashing)
    plans/     — the named-query catalog consumed by __spark_entry__
    operators/ — composite operators (dedup, similarity, as-of,
                 sessionize, multimodal, skew utilities)
    sources/   — custom Python DataSources (paginated REST) + JDBC
    sinks/     — upsert / overwrite sinks (parquet merge, JDBC)
    etl/       — the reference-parity lead-activity pipeline + CLI
    streaming/ — Structured Streaming jobs (windows, watermarks,
                 stateful dedup, foreachBatch upsert)
"""

__version__ = "0.1.0"
