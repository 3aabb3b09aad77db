"""Canonical content hashing for dedup.

Reference semantics (R10, /root/reference/app/salesforce_extractor.py:179-181):
a deterministic content hash over the full raw record is the dedup key.
The reference uses blake2b(digest_size=8) over canonical JSON; we keep
the *semantics* (deterministic full-record content hash) but use
``md5`` over length-prefixed fields so the DuckDB oracle can compute
the identical expression. Length-prefixing (``len:value`` per field)
makes the encoding injective — a plain separator join would collide
when field values themselves contain the separator (("a\\x1fb","c") vs
("a","b\\x1fc")); nulls are canonicalized to a sentinel so that NULL
vs "" hash differently, matching dict-key semantics.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"
NULL_SENTINEL = "\x00NULL\x00"

__all__ = ["content_hash", "SEP", "NULL_SENTINEL"]


def content_hash(cols: Iterable[Column | str], alias: str = "hash") -> Column:
    parts = []
    for c in cols:
        s = F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL)
        )
        parts.append(F.concat(F.length(s).cast("string"), F.lit(":"), s))
    return F.md5(F.concat_ws(SEP, *parts)).alias(alias)


def content_hash_sql(cols: Iterable[str]) -> str:
    """The DuckDB-equivalent SQL expression for :func:`content_hash`."""
    fields = []
    for c in cols:
        s = f"coalesce(cast({c} as varchar), chr(0) || 'NULL' || chr(0))"
        fields.append(f"cast(length({s}) as varchar) || ':' || {s}")
    inner = ", ".join(fields)
    return f"md5(concat_ws(chr(31), {inner}))"
