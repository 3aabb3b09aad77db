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

__all__ = [
    "content_hash",
    "checksum_half_sums",
    "checksum_half_sums_sql",
    "SEP",
    "NULL_SENTINEL",
]


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


def checksum_half_sums(digest: Column, lo: str = "checksum_lo", hi: str = "checksum_hi") -> list[Column]:
    """The repo-wide additive checksum protocol: a 32-bit row digest
    summed as its low/high 16-bit halves — two overflow-proof bigints
    (a single bigint sum of 32-bit digests wraps at ~2^32 rows in
    Spark while DuckDB promotes to HUGEINT and fails the bigint cast;
    each half-sum is bounded by 2^16 x rows, exact past 10^14 rows,
    and stays in whole-stage codegen — full rationale at
    plans/audit_queries.py's protocol comment). ONE definition site:
    q408/q417/q418's audit helpers and the CDC/repair family
    (q428/q430/q431) all route here, so a protocol change (e.g. the
    documented decimal(38,0) escalation) cannot fork silently."""
    return [
        F.sum(digest.bitwiseAND(F.lit(65535))).cast("bigint").alias(lo),
        F.sum(F.shiftright(digest, 16)).cast("bigint").alias(hi),
    ]


def checksum_half_sums_sql(digest_sql: str, lo: str = "checksum_lo", hi: str = "checksum_hi") -> str:
    """DuckDB twin of :func:`checksum_half_sums` (same aliases)."""
    return (
        f"cast(sum(({digest_sql}) & 65535) as bigint) AS {lo},\n"
        f"           cast(sum(({digest_sql}) >> 16) as bigint) AS {hi}"
    )
