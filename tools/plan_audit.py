#!/usr/bin/env python
"""Catalog-wide physical-plan census → PLAN_AUDIT.md.

Builds every batch catalog query's DataFrame at a small scale factor
(plan analysis only — nothing is collected) and counts the physical
operators that decide 100 TB behavior:

* join strategies (BroadcastHash / ShuffledHash / SortMerge /
  BroadcastNestedLoop / CartesianProduct),
* exchanges (hash / range / single-partition),
* Python boundaries (ArrowEval / MapInPandas / ... vs the row-at-a-time
  BatchEvalPython, which is banned).

Codegen coverage is NOT counted here: the pre-execution AQE plan print
omits WholeStageCodegen annotations — that property is asserted at
runtime by test_whole_stage_codegen_covers_scalar_pipeline instead.

The census is EVIDENCE, not a gate — the hard invariants (no
CartesianProduct, no row-Python, no unpartitioned windows, scalar-only
outputs) live in tests/test_plan_quality.py. This report exists so a
reviewer can see the whole catalog's physical shape at a glance and so
round-over-round diffs of PLAN_AUDIT.md surface plan regressions that
per-query timings hide.

Streaming-tagged queries are skipped: building them EXECUTES their
replay (availableNow triggers inside the query fn), and their
micro-batch plans are pinned by the streaming equivalence tests
instead.

Usage: python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MARKS = {
    "CartesianProduct": "cartesian",
    "BroadcastNestedLoopJoin": "bnlj",
    "BroadcastHashJoin": "bhj",
    "ShuffledHashJoin": "shj",
    "SortMergeJoin": "smj",
    "Exchange hashpartitioning": "x_hash",
    "Exchange rangepartitioning": "x_range",
    "Exchange SinglePartition": "x_single",
    "BatchEvalPython": "py_row",  # row-at-a-time Python UDF — banned
    "ArrowEvalPython": "py_arrow",
    "MapInPandas": "py_mapinpandas",
    "FlatMapGroupsInPandas": "py_applyinpandas",
    "MapInArrow": "py_mapinarrow",
    "FlatMapGroupsInArrow": "py_applyinarrow",
    "PythonUDTF": "py_udtf",
}


_PLAN_ID = re.compile(r"\[plan_id=(\d+)\]")


def census(plan: str) -> Counter:
    """Count physical operators, deduplicating repeated subtree prints:
    a pinned/shared subtree is re-printed once per consumer in
    ``toString()``, so nodes carrying a ``plan_id`` are counted once
    per unique id, not once per printed line. ``BatchEvalPythonUDTF``
    lines are UDTF evaluations, not the banned row-at-a-time scalar
    UDF — matched before the substring would mislabel them."""
    c: Counter = Counter()
    seen: set[tuple[str, str]] = set()
    for line in plan.splitlines():
        for needle, key in MARKS.items():
            if needle not in line:
                continue
            if key == "py_row" and "UDTF" in line:
                continue  # BatchEvalPythonUDTF — counted via py_udtf
            m = _PLAN_ID.search(line)
            if m:
                tag = (key, m.group(1))
                if tag in seen:
                    continue
                seen.add(tag)
            c[key] += 1
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from marketingcloud_etl_spark.operators.ranking import release_ranking_caches
    from marketingcloud_etl_spark.plans.catalog import load_all
    from marketingcloud_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    rows: list[tuple[str, Counter]] = []
    skipped: list[str] = []
    failed: list[str] = []
    for name, qd in registry.items():
        if "streaming" in qd.tags:
            skipped.append(name)
            continue
        try:
            df = qd.fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, census(plan)))
        except Exception as exc:  # pragma: no cover - census must not die
            failed.append(f"{name}: {type(exc).__name__}")
        finally:
            release_ranking_caches()

    total = Counter()
    for _, c in rows:
        total += c

    flagged = [(n, c) for n, c in rows if c["cartesian"] or c["py_row"]]
    # informational, not a violation: Exchange SinglePartition in these
    # plans is a one-row aggregation final (scalar subquery, bound
    # check, grand total) — the dangerous class, a DATA-sized
    # single-partition sort, is banned separately by the unpartitioned-
    # window source test and the ranking-path plan tests.
    heavy_single = sorted(
        ((n, c["x_single"]) for n, c in rows if c["x_single"] >= 3),
        key=lambda t: -t[1],
    )
    py_users = [
        (n, c)
        for n, c in rows
        if any(
            c[k]
            for k in (
                "py_arrow",
                "py_mapinpandas",
                "py_applyinpandas",
                "py_mapinarrow",
                "py_applyinarrow",
                "py_udtf",
            )
        )
    ]

    out = [
        "# PLAN_AUDIT — catalog-wide physical-plan census",
        "",
        f"Generated by `tools/plan_audit.py` at `{args.sf_dir}`; "
        f"{len(rows)} batch queries audited, {len(skipped)} streaming "
        "queries skipped (building them executes their replay; their "
        "plans are pinned by the streaming equivalence tests).",
        "",
        "## Aggregate census",
        "",
        "| physical operator | occurrences | queries using it |",
        "|---|---|---|",
    ]
    for key, label in [
        ("bhj", "BroadcastHashJoin"),
        ("smj", "SortMergeJoin"),
        ("shj", "ShuffledHashJoin"),
        ("bnlj", "BroadcastNestedLoopJoin (broadcast-sized sides only)"),
        ("cartesian", "CartesianProduct (banned)"),
        ("x_hash", "Exchange hashpartitioning"),
        ("x_range", "Exchange rangepartitioning"),
        ("x_single", "Exchange SinglePartition (final one-row aggs)"),
        ("py_row", "BatchEvalPython row-at-a-time UDF (banned)"),
        ("py_arrow", "ArrowEvalPython (vectorized scalar UDF)"),
        ("py_mapinpandas", "MapInPandas"),
        ("py_applyinpandas", "FlatMapGroupsInPandas (applyInPandas)"),
        ("py_mapinarrow", "MapInArrow"),
        ("py_applyinarrow", "FlatMapGroupsInArrow (applyInArrow)"),
        ("py_udtf", "Python UDTF"),
    ]:
        nq = sum(1 for _, c in rows if c[key])
        out.append(f"| {label} | {total[key]} | {nq} |")

    out += [
        "",
        "## Red flags",
        "",
    ]
    if not flagged:
        out.append(
            "None. Zero CartesianProduct, zero row-at-a-time Python "
            "UDFs across the audited catalog."
        )
    else:
        out.append("| query | cartesian | row-python |")
        out.append("|---|---|---|")
        for n, c in flagged:
            out.append(f"| {n} | {c['cartesian']} | {c['py_row']} |")

    out += [
        "",
        "## Single-partition exchange census (informational)",
        "",
        "`Exchange SinglePartition` in these plans is a one-row "
        "aggregation final (scalar subquery, bound-check row, grand "
        "total) — constant-size by construction. The dangerous class, "
        "a data-sized single-partition SORT, is banned separately: the "
        "unpartitioned-window source test and the ranking-path plan "
        "tests assert its absence, and every global ranking routes "
        "through operators/ranking.py.",
        "",
        "| query | one-row agg finals |",
        "|---|---|",
    ]
    for n, k in heavy_single:
        out.append(f"| {n} | {k} |")

    out += [
        "",
        "## Python-boundary queries (deliberate Arrow-batched stages)",
        "",
        "| query | arrow | mapInPandas | applyInPandas | mapInArrow | applyInArrow | udtf |",
        "|---|---|---|---|---|---|---|",
    ]
    for n, c in sorted(py_users):
        out.append(
            f"| {n} | {c['py_arrow']} | {c['py_mapinpandas']} | "
            f"{c['py_applyinpandas']} | {c['py_mapinarrow']} | "
            f"{c['py_applyinarrow']} | {c['py_udtf']} |"
        )

    if failed:
        out += ["", "## Census failures (query fn raised at build)", ""]
        out += [f"- {f}" for f in failed]

    out.append("")
    (REPO / "PLAN_AUDIT.md").write_text("\n".join(out))
    print(
        f"wrote PLAN_AUDIT.md: {len(rows)} audited, "
        f"{len(flagged)} flagged, {len(failed)} failed, "
        f"{len(skipped)} streaming skipped"
    )
    spark.stop()


if __name__ == "__main__":
    main()
