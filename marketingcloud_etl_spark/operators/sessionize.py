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


def session_state(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Fold a (partial) event stream into the per-user SESSION STATE
    the incremental posture persists: one row per user —
    ``(user, n_sessions, n_events, last_ts)``. Sessionization is
    prefix-decomposable: sessions(A ++ B) = sessions(A) + sessions(B)
    − bridge(A, B), where the bridge depends ONLY on A's last event
    time and B's first — so this constant-width state is sufficient to
    continue sessionizing forever without re-reading history
    (:func:`merge_session_state`)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col).agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
    )


def merge_session_state(
    state: DataFrame,
    batch: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Merge an arriving batch of events into a persisted
    :func:`session_state` table, EXACTLY: every event in ``batch`` must
    be later than the state's ``last_ts`` for its user (time-ordered
    arrival — the same contract Structured Streaming's watermark
    enforces for session_window). The batch sessionizes internally
    (user-keyed window over BATCH rows only), then one full-outer
    user-keyed join against the state decides the boundary: the
    batch's first session CONTINUES the user's last persisted session
    when the boundary gap is under ``gap_minutes`` (subtract the
    bridge), else it opens a new one. Exact-``gap`` boundaries open a
    new session, matching :func:`sessionize` / streaming
    session_window's [start, last+gap) interval.

    Returns the NEW state: ``(user, n_sessions, n_events, last_ts)``
    covering everything ever seen.

    Scale shape: per refresh the work is one window over the BATCH and
    one user-keyed join of two user-sized frames — history events are
    read zero times, and the state is one constant-width row per user
    (the batch analogue of applyInPandasWithState's per-key state, but
    oracle-checkable). This is the decomposition that makes gap
    sessionization safe to run incrementally at any scale; metrics
    that are NOT prefix-decomposable (median session length) need the
    distribution state (q402's counts posture) instead."""
    gap_us = gap_minutes * 60 * 1_000_000
    b = sessionize(batch, user_col, ts_col, gap_minutes)
    bagg = b.groupBy(user_col).agg(
        F.max("session_id").cast("bigint").alias("__b_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("__b_events"),
        F.min(ts_col).alias("__b_first"),
        F.max(ts_col).alias("__b_last"),
    )
    j = state.join(bagg, user_col, "full_outer")
    bridged = (
        F.col("n_sessions").isNotNull()
        & F.col("__b_sessions").isNotNull()
        & (
            (F.unix_micros(F.col("__b_first")) - F.unix_micros(F.col("last_ts")))
            < F.lit(gap_us)
        )
    )
    return j.select(
        user_col,
        (
            F.coalesce("n_sessions", F.lit(0))
            + F.coalesce("__b_sessions", F.lit(0))
            - bridged.cast("bigint")
        )
        .cast("bigint")
        .alias("n_sessions"),
        (F.coalesce("n_events", F.lit(0)) + F.coalesce("__b_events", F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        F.coalesce("__b_last", F.col("last_ts")).alias("last_ts"),
    )
