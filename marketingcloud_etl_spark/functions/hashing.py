"""Canonical content hashing for dedup.

Reference semantics (R10, /root/reference/app/salesforce_extractor.py:179-181):
a deterministic content hash over the full raw record is the dedup key.
The reference uses blake2b(digest_size=8) over canonical JSON; we keep
the *semantics* (deterministic full-record content hash) but use
``md5(concat_ws(sep, fields...))`` so the DuckDB oracle can compute the
identical expression. A unit separator (0x1f) avoids ambiguity between
field boundaries; nulls are canonicalized to a sentinel so that
NULL vs "" hash differently, matching dict-key semantics.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"
NULL_SENTINEL = "\x00NULL\x00"

__all__ = ["content_hash", "SEP", "NULL_SENTINEL"]


def content_hash(cols: Iterable[Column | str], alias: str = "hash") -> Column:
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws(SEP, *parts)).alias(alias)


def content_hash_sql(cols: Iterable[str]) -> str:
    """The DuckDB-equivalent SQL expression for :func:`content_hash`."""
    inner = ", ".join(f"coalesce(cast({c} as varchar), chr(0) || 'NULL' || chr(0))" for c in cols)
    return f"md5(concat_ws(chr(31), {inner}))"
