"""Deterministic numeric-aggregation protocol ("decimal-money protocol").

Summing IEEE doubles is order-dependent, and Spark's partial/final
aggregation visits rows in a nondeterministic order across partitions —
so a raw ``SUM(double)`` can differ run-to-run AND from the DuckDB
oracle. Decimal addition is exact and associative, so the protocol is:

1. cast base double columns (2-decimal money data) to a decimal wide
   enough to hold them exactly — tie-free because the fixture values are
   2-decimal quantities whose double representation sits ~1e-12 from the
   true value, far from any rounding boundary;
2. do products/sums in decimal (explicit per-operand casts so Spark and
   DuckDB precision-propagation rules can't diverge past 38 digits);
3. cast the final exact decimal to double (deterministic IEEE rounding,
   identical in both engines).

Averages are expressed as ``CAST(sum_dec AS DOUBLE) / COUNT`` — a single
double division of identical operands, not a decimal division (whose
result-scale rules differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str, prec: int = 18, scale: int = 4) -> Column:
    """Exact decimal view of a money/measure double column."""
    return _col(c).cast(f"decimal({prec},{scale})")
