"""Sequential pattern matching (MATCH_RECOGNIZE-style) as a reusable
operator: count non-overlapping occurrences of an ordered stage list
(with a per-transition time bound) in each key's event sequence.

Spark has no MATCH_RECOGNIZE; the scale-safe compilation is a per-key
ordered fold — ONE shuffle groups the key's events, ``array_sort``
fixes the (ts, id) total order, and a single ``aggregate`` HOF runs
the k-state automaton left-to-right. Match state per key is O(1)
(stage index, anchor timestamp, match count) whatever k or the
sequence length, so the same automaton also runs incrementally under
``transformWithState`` (streaming/jobs.py::pattern_match_tws).

Semantics (deterministic, pinned by tests and the q346/q350/q352
oracles):
- an event equal to ``stages[0]`` ALWAYS (re)anchors a fresh candidate
  match, whatever state the automaton is in;
- an event equal to ``stages[i]`` (i ≥ 1) advances i−1 → i only when
  it arrives within ``gaps_us[i-1]`` of the previous accepted stage
  (else the state is left unchanged);
- accepting the final stage increments the count and resets to the
  ground state — matches never overlap, every stage is consumed by at
  most one match;
- all other events are ignored.

Used by q346 (3-stage), q352 (4-stage with per-stage gaps) and the
streaming twin q350. Reference has no sequence surface; this extends
SURVEY §2's marketing family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sql(stages: Sequence[str], gaps_us: Sequence[int], seq_col: str) -> str:
    """The aggregate() HOF expression running the automaton over a
    sorted array of (ts_us, …, et) structs. Generated as one CASE
    chain per state field so Catalyst codegens it like any other
    scalar expression — no UDF, no per-row Python."""
    k = len(stages)
    if k < 2:
        raise ValueError("a pattern needs at least 2 stages")
    if len(gaps_us) != k - 1:
        raise ValueError("gaps_us must have len(stages) - 1 entries")

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    adv = [
        f"WHEN x.et = {lit(stages[i])} AND acc.stage = {i} "
        f"AND x.ts_us - acc.anchor <= {gaps_us[i - 1]}"
        for i in range(1, k)
    ]
    stage_case = (
        f"CASE WHEN x.et = {lit(stages[0])} THEN 1 "
        + " ".join(
            f"{w} THEN {0 if i == k - 1 else i + 1}"
            for i, w in zip(range(1, k), adv)
        )
        + " ELSE acc.stage END"
    )
    anchor_case = (
        f"CASE WHEN x.et = {lit(stages[0])} THEN x.ts_us "
        + " ".join(
            f"{w} THEN {'cast(0 as bigint)' if i == k - 1 else 'x.ts_us'}"
            for i, w in zip(range(1, k), adv)
        )
        + " ELSE acc.anchor END"
    )
    match_inc = f"CASE {adv[-1]} THEN 1 ELSE 0 END"
    return f"""
        aggregate(
          {seq_col},
          struct(0 as stage, cast(0 as bigint) as anchor, 0 as matches),
          (acc, x) -> struct(
            {stage_case} as stage,
            {anchor_case} as anchor,
            acc.matches + {match_inc} as matches)
        ).matches
    """


def sequential_pattern_count(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    type_col: str,
    stages: Sequence[str],
    gaps_us: Sequence[int],
    tiebreak_col: str | None = None,
    out_col: str = "matches",
) -> DataFrame:
    """Per ``key_col``: the number of non-overlapping occurrences of
    ``stages`` (each transition i−1→i within ``gaps_us[i-1]`` µs).
    Returns one row per key: (key_col, out_col).

    ``tiebreak_col`` extends (ts, tiebreak) into a total order — pass
    a unique event id whenever timestamps can tie, or the fold order
    (and therefore the count) is nondeterministic within ties."""
    ev = df.select(
        key_col,
        F.struct(
            F.col(ts_us_col).alias("ts_us"),
            *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
            F.col(type_col).alias("et"),
        ).alias("__pev"),
    )
    seq = ev.groupBy(key_col).agg(
        F.array_sort(F.collect_list("__pev")).alias("__pseq")
    )
    fold: Column = F.expr(_fold_sql(stages, gaps_us, "__pseq"))
    return seq.select(key_col, fold.alias(out_col))
