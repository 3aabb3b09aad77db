"""Batch sessionization: gap-based session ids via lag + cumulative sum
(the batch twin of Structured Streaming's session_window — SURVEY.md
§2.B "Streaming"). Pure window functions, oracle-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the
    gap since the previous event reaches ``gap_minutes``. Deterministic
    given a unique secondary order column is unnecessary because equal
    timestamps land in the same session regardless of order."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col).over(w)
    # full microsecond precision (unix_micros), exact integer
    # arithmetic. >= matches streaming session_window semantics: a
    # session's interval is [start, last+gap) — an event exactly `gap`
    # after its predecessor opens a NEW session, so strict > here would
    # diverge from the streaming twin on exact-boundary data
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) >= gap_us)
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
