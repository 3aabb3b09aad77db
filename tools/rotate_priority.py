#!/usr/bin/env python
"""Regenerate catalog._PRIORITY for a new round.

The driver records verdicts for the FIRST 50 oracle-able names in
catalog order each round, so after CORRECTNESS_r{N}.json lands the
window must rotate: every name with a green row from ANY round moves
behind the rows-only block, and the remaining unevidenced queries
stand in front, oldest (lowest query number) first. This script
computes that ordering from the committed artifacts and rewrites the
_PRIORITY tuple in plans/catalog.py in place; run it as the FIRST
commit of each round, then re-run
tests/test_plan_quality.py::test_priority_front_slots_cover_unevidenced_backlog.

Usage: python tools/rotate_priority.py [--dry-run]
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def qnum(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


def main() -> None:
    from marketingcloud_etl_spark.plans.catalog import load_all

    green: set[str] = set()
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        for n, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(n)

    reg = load_all()
    names = list(reg)
    unevidenced = sorted(
        (n for n in names if reg[n].oracle is not None and n not in green),
        key=qnum,
    )
    rows_only = sorted((n for n in names if reg[n].oracle is None), key=qnum)
    greens = sorted((n for n in names if n in green), key=qnum)
    ordered = unevidenced + rows_only + greens
    assert len(ordered) == len(set(ordered)) == len(names)

    print(
        f"{len(names)} queries: {len(unevidenced)} unevidenced "
        f"(window = first 50: {unevidenced[:3]}…{unevidenced[47:50]}), "
        f"{len(rows_only)} rows-only, {len(greens)} green"
    )
    if "--dry-run" in sys.argv:
        return

    cat = REPO / "marketingcloud_etl_spark" / "plans" / "catalog.py"
    src = cat.read_text()
    start = src.index("_PRIORITY = (")
    end = src.index("\n)\n", start) + len("\n)\n")
    body = "".join(f'    "{n}",\n' for n in ordered)
    cat.write_text(src[:start] + "_PRIORITY = (\n" + body + ")\n" + src[end:])
    print(f"rewrote {cat}")


if __name__ == "__main__":
    main()
