"""Property-based tests (hypothesis) for the engine's core invariants —
the guarantees every other operator builds on:

  * content_hash is deterministic and injective-in-practice on the
    tested domain (distinct rows → distinct hashes, equal rows → equal
    hashes) regardless of row order or partitioning
  * dedup_exact is idempotent and a fixpoint (applying twice == once)
  * ingesting a batch twice yields the single-batch result (the
    reference pipeline's re-run invariant, R12)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketingcloud_etl_spark.functions.hashing import content_hash
from marketingcloud_etl_spark.operators.dedup import dedup_exact

# text including separator-ish and unicode chars, to catch
# concat-ambiguity bugs in the hash input encoding
_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2FF),
    max_size=12,
)
_row = st.tuples(st.integers(-1000, 1000), _text, _text)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_row, min_size=1, max_size=25))
def test_hash_dedup_invariants(spark, rows):
    df = spark.createDataFrame(rows, "a int, b string, c string").coalesce(2)
    cols = ["a", "b", "c"]

    hashed = df.withColumn("h", content_hash(cols))
    collected = hashed.collect()
    by_row = {}
    for r in collected:
        key = (r["a"], r["b"], r["c"])
        # equal rows always hash equal
        assert by_row.setdefault(key, r["h"]) == r["h"]
    # distinct rows hash distinct (64-bit+ digest on a tiny domain)
    assert len(set(by_row.values())) == len(by_row)

    once = dedup_exact(df, cols)
    twice = dedup_exact(once.drop("hash"), cols)
    assert once.count() == len(by_row)  # one survivor per distinct row
    assert twice.count() == once.count()  # idempotent

    # re-run invariant: ingesting the batch twice changes nothing
    doubled = dedup_exact(df.unionByName(df), cols)
    assert doubled.count() == once.count()


def test_canonical_exact_bigint_no_false_pass():
    """Integral object columns (DuckDB DECIMAL/HUGEINT) must compare
    exactly: two values differing only below float64 resolution
    (> 2^53) are a REAL mismatch and must fail, not coerce equal."""
    import decimal

    import pandas as pd
    import pytest as _pytest

    from .oracle import assert_frames_match, canonical

    big = 2**53 + 1  # 9007199254740993; float64 rounds to ...992
    a = pd.DataFrame({"k": [1], "v": pd.Series([big], dtype=object)})
    b = pd.DataFrame({"k": [1], "v": pd.Series([decimal.Decimal(big - 1)], dtype=object)})
    with _pytest.raises(AssertionError):
        assert_frames_match(a, b, "bigint-precision")
    # and equal values still pass through the exact path
    c = pd.DataFrame({"k": [1], "v": pd.Series([decimal.Decimal(big)], dtype=object)})
    assert_frames_match(a, c, "bigint-equal")
    # fractional decimals keep the float path
    f1 = pd.DataFrame({"v": pd.Series([decimal.Decimal("1.25")], dtype=object)})
    f2 = pd.DataFrame({"v": pd.Series([1.25], dtype=object)})
    assert_frames_match(f1, f2, "fractional")
    assert canonical(f1)["v"].dtype == "float64"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(1, 12),
)
def test_distributed_ntile_property(spark, keys, n_buckets):
    """Hypothesis pin: for ANY key multiset (duplicates included — the
    uid tiebreak completes the total order) and ANY bucket count, the
    distributed ntile/row_number must equal Spark's own window
    functions exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from marketingcloud_etl_spark.operators.ranking import (
        distributed_ntile,
        global_row_number,
        release_ranking_caches,
    )

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "uid long, k long").coalesce(2)
    order = [F.col("k").asc(), F.col("uid").asc()]
    try:
        want = df.select(
            "uid",
            F.ntile(n_buckets).over(W.orderBy(*order)).alias("want_nt"),
            F.row_number().over(W.orderBy(*order)).alias("want_rn"),
        )
        got = (
            distributed_ntile(df, n_buckets, order, "nt")
            .select("uid", "nt")
            .join(global_row_number(df, order, "rn").select("uid", "rn"), "uid")
        )
        bad = want.join(got, "uid").filter(
            (F.col("nt") != F.col("want_nt")) | (F.col("rn") != F.col("want_rn"))
        )
        assert bad.count() == 0, bad.limit(5).collect()
    finally:
        release_ranking_caches()


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=30),
    st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=30),
)
def test_nearest_asof_merge_matches_bruteforce(p_secs, c_secs):
    """operators/asof.nearest_asof_merge (q193's kernel) vs the O(n·m)
    brute force: every probe must match the candidate minimizing
    (|Δt|, candidate ts, candidate id), dropped beyond tolerance —
    including duplicate-timestamp candidates and empty sides. Pure
    pandas, no Spark session needed."""
    import numpy as np
    import pandas as pd

    from marketingcloud_etl_spark.operators.asof import nearest_asof_merge

    TOL = 600.0
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i, s in enumerate(p_secs):
        rows.append({"eid": 1000 + i, "ts": base + pd.Timedelta(seconds=s), "kind": "p"})
    for i, s in enumerate(c_secs):
        rows.append({"eid": 2000 + i, "ts": base + pd.Timedelta(seconds=s), "kind": "c"})
    pdf = pd.DataFrame(rows, columns=["eid", "ts", "kind"]).astype(
        {"eid": "int64", "kind": "object"}
    )
    got = nearest_asof_merge(pdf, tolerance_s=TOL)
    got = set(map(tuple, got[["p_id", "c_id", "diff_s"]].to_numpy().tolist()))

    want = set()
    cands = [(base + pd.Timedelta(seconds=s), 2000 + i) for i, s in enumerate(c_secs)]
    for i, s in enumerate(p_secs):
        pts = base + pd.Timedelta(seconds=s)
        if not cands:
            continue
        best = min(
            cands, key=lambda c: (abs((c[0] - pts).total_seconds()), c[0], c[1])
        )
        d = abs((best[0] - pts).total_seconds())
        if d <= TOL:
            want.add((1000 + i, best[1], int(np.floor(d))))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_staircase_matches_bruteforce(spark, pts):
    """The q308 staircase formulation (per-key max collapse + exclusive
    distributed prefix-max) must equal the O(n²) dominance definition
    of the skyline — minimize x, maximize y, strictness somewhere —
    on arbitrary point multisets including duplicates and total ties."""
    from pyspark.sql import functions as F

    from marketingcloud_etl_spark.operators.ranking import global_prefix_max

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid int, x int, y int").coalesce(2)

    per_x = df.groupBy("x").agg(F.max("y").alias("my"))
    stair = global_prefix_max(per_x, ["x"], "my", "best_cheaper", exclusive=True)
    frontier = stair.filter(
        F.col("best_cheaper").isNull() | (F.col("my") > F.col("best_cheaper"))
    )
    got = {
        r["pid"]
        for r in df.join(
            frontier, (df.x == frontier.x) & (df.y == F.col("my"))
        ).collect()
    }

    want = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y)) for x2, y2 in pts
        )
    }
    assert got == want, (sorted(got), sorted(want), pts)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es)),
    st.integers(1, 4),
)
def test_pagerank_fixed_point_property(spark, edge_pairs, iters):
    """On ARBITRARY small directed graphs, pagerank_fixed_point equals
    the sequential pure-Python integer power iteration exactly — the
    distributed join/agg pipeline cannot drift from the scalar spec on
    any input, at any iteration count."""
    from marketingcloud_etl_spark.operators.pagerank import pagerank_fixed_point

    edges = sorted({(a, b) for a, b in edge_pairs if a != b})
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r.id: r.rank_micro for r in pagerank_fixed_point(df, iters=iters).collect()
    }

    scale, dpct = 1_000_000_000_000, 85
    node_ids = sorted({x for e in edges for x in e})
    n = len(node_ids)
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    r = {i: scale // n for i in node_ids}
    base = (scale * (100 - dpct) // 100) // n
    for _ in range(iters):
        s = {i: 0 for i in node_ids}
        for a, b in edges:
            s[b] += r[a] // out_deg[a]
        r = {i: base + (dpct * s[i]) // 100 for i in node_ids}
    assert got == r


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 50),         # ts (small range forces ties/gaps)
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 10),
    st.integers(1, 10),
)
def test_sequential_pattern_count_property(spark, events, gap1, gap2):
    """On ARBITRARY small event sequences (duplicate timestamps, noise
    types, any gap bounds), the generated aggregate() fold equals the
    sequential Python automaton exactly — the generator's CASE chains
    cannot drift from the documented semantics on any input."""
    from marketingcloud_etl_spark.operators.patterns import (
        sequential_pattern_count,
    )

    rows = [(k, ts, i, et) for i, (k, ts, et) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "k bigint, ts_us bigint, eid bigint, et string"
    )
    got = {
        r["k"]: r["matches"]
        for r in sequential_pattern_count(
            df, "k", "ts_us", "et",
            stages=("a", "b", "c"), gaps_us=(gap1, gap2),
            tiebreak_col="eid",
        ).collect()
    }

    from collections import defaultdict

    seqs = defaultdict(list)
    for k, ts, i, et in rows:
        seqs[k].append((ts, i, et))
    want = {}
    for k, s in seqs.items():
        stage = anchor = m = 0
        for ts, _i, et in sorted(s):
            if et == "a":
                stage, anchor = 1, ts
            elif et == "b" and stage == 1 and ts - anchor <= gap1:
                stage, anchor = 2, ts
            elif et == "c" and stage == 2 and ts - anchor <= gap2:
                stage, anchor, m = 0, 0, m + 1
        want[k] = m
    assert got == want, (got, want, events)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
        min_size=1,
        max_size=5,
    ),
    st.integers(2, 64),
)
def test_pcm_window_energy_property(spark, sample_lists, win):
    """Arbitrary PCM payloads (any length, including < one window —
    trailing partial windows are dropped) decode to exactly the numpy
    reference energies."""
    import math
    import struct

    from marketingcloud_etl_spark.operators.multimodal import (
        pcm_window_energy,
    )

    rows = [
        (i, bytearray(struct.pack(f"<{len(s)}h", *s)))
        for i, s in enumerate(sample_lists)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, payload binary")
    got = {
        (r["vec_id"], r["window_idx"]): (r["energy_milli"], r["n_samples"])
        for r in pcm_window_energy(df, window_samples=win).collect()
    }
    want = {}
    for i, s in enumerate(sample_lists):
        for w in range(len(s) // win):
            chunk = s[w * win : (w + 1) * win]
            rms = math.sqrt(sum(x * x for x in chunk) / win)
            want[(i, w)] = (math.floor(rms * 1000.0), win)
    assert got == want


# ---- manifest lifecycle state machine -------------------------------------
# op encoding: 0 = publish a fresh generation dir; 1 = rollback
# (re-publish the dir of a random live, non-gc'd history entry);
# 2..6 = gc with keep_last = op - 2 (0..4). Pure-filesystem model (the
# manifest functions never require Spark), so the search is cheap.
_manifest_ops = st.lists(st.integers(0, 6), min_size=1, max_size=12)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_manifest_ops, seed=st.integers(0, 2**16))
def test_manifest_gc_lifecycle_invariants(tmp_path_factory, ops, seed):
    """Random publish / rollback-republish / gc sequences preserve the
    manifest's lifecycle contract (the state-machine generalization of
    the example-based gc tests, which round 9's crash-recovery bug
    showed are not enough):

      I1. the `current` pointer's dir always exists on disk;
      I2. every history entry NOT marked gc has its dir on disk
          (nothing live ever dangles);
      I3. every dir referenced ONLY by gc-marked entries (and not
          current) is gone from disk (no storage leaks — including
          entries marked by an earlier pass, the crash-recovery case);
      I4. gc is idempotent: an immediate re-run with the same
          keep_last deletes nothing further.
    """
    import json
    import os
    import random

    from marketingcloud_etl_spark.sinks.manifest import (
        current_generation,
        gc_generations,
        publish_generation,
    )

    rng = random.Random(seed)
    base = tmp_path_factory.mktemp("manifest_prop")
    man = str(base / "MANIFEST.json")
    n_dirs = 0

    def history():
        with open(man) as f:
            return json.load(f).get("history", [])

    def check_invariants():
        hist = history()
        cur = current_generation(man)
        assert os.path.isdir(cur), "I1: current dir missing"
        live_dirs = {h["dir"] for h in hist if not h.get("gc")}
        for d in live_dirs:
            assert os.path.isdir(d), f"I2: live entry dangles: {d}"
        for h in hist:
            d = h["dir"]
            if h.get("gc") and d not in live_dirs and d != cur:
                assert not os.path.exists(d), f"I3: leaked gc'd dir: {d}"

    # first op is always a publish so `current` exists
    for i, op in enumerate([0] + ops):
        if op == 0 or i == 0:
            d = str(base / f"gen{n_dirs}")
            os.makedirs(d)
            with open(os.path.join(d, "part-0"), "w") as f:
                f.write(f"gen{n_dirs}")
            n_dirs += 1
            publish_generation(man, d, {"generation": n_dirs - 1})
        elif op == 1:
            live = [h["dir"] for h in history() if not h.get("gc")]
            if live:
                publish_generation(man, rng.choice(live), {"rollback": True})
        else:
            keep = op - 2
            gc_generations(man, keep_last=keep)
            rep2 = gc_generations(man, keep_last=keep)
            assert rep2["deleted"] == [], f"I4: gc not idempotent: {rep2}"
        check_invariants()
