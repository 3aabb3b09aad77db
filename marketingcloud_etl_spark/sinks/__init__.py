from .upsert import overwrite_parquet, upsert_parquet, jdbc_write  # noqa: F401
