from .upsert import (  # noqa: F401
    compact_parquet,
    jdbc_write,
    overwrite_parquet,
    scd1_merge,
    upsert_parquet,
)
from .jdbc_merge import merge_upsert  # noqa: F401
