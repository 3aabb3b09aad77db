"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
higher-order functions, no UDFs (SURVEY.md §2.B "LLM-data operators").

Determinism: elements are cast to double first, then folded
sequentially (``aggregate`` is an ordered left fold in both Spark and
DuckDB's ``list_`` kernels we mirror with explicit folds), so the same
IEEE operations happen in the same order in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_double_array", "dot", "l2norm", "cosine", "cosine_sql"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_array(c: Column | str) -> Column:
    return _col(c).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    # zero-norm guard: 0/0 would be NaN, and Spark orders NaN as the
    # LARGEST double — an all-zero embedding would outrank every real
    # neighbor in a cos-desc top-k. Define cosine with a zero vector
    # as 0.0 (no directional similarity).
    denom = l2norm(a) * l2norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _dot_sql(a: str, b: str) -> str:
    # explicit ordered fold; mirrors F.aggregate's left fold exactly
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a})+1), "
        f"i -> cast({a}[i] as double) * cast({b}[i] as double))), (acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL mirroring :func:`cosine` operation-for-operation,
    including the zero-norm → 0.0 guard."""
    denom = f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    return f"(CASE WHEN {denom} > 0 THEN {_dot_sql(a, b)} / {denom} ELSE 0.0 END)"
