"""Text expression helpers (tokenization, stats) — built-ins only.

``documents.text`` is space-separated word soup (FIXTURES.md); the
tokenizer is a whitespace split with empty-token filtering so it matches
DuckDB's ``string_split`` + filter exactly.

Contract note: both sides spell the split as ``\\s+`` in their own
regex dialect. Java regex and RE2 agree on space/tab/newline/CR but
disagree on exotic whitespace (RE2's ``\\s`` excludes vertical tab) —
out of contract for the space-separated fixture corpus; use literal
char classes if exotic whitespace ever enters the data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tokens", "distinct_tokens", "tokens_sql", "distinct_tokens_sql"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokens, empties removed. Spark `split` is regex-based."""
    return F.filter(F.split(_col(c), r"\s+"), lambda t: t != "")


def distinct_tokens(c: Column | str) -> Column:
    return F.array_sort(F.array_distinct(tokens(c)))


def tokens_sql(c: str) -> str:
    return f"list_filter(regexp_split_to_array({c}, '\\s+'), t -> t != '')"


def distinct_tokens_sql(c: str) -> str:
    return f"list_sort(list_distinct({tokens_sql(c)}))"
