"""End-to-end pin for the composed semantic-dedup pipeline
(operators/semantic_dedup.py): plant near-duplicate vectors in a random
corpus and require the WHOLE chain — cell blocking → exact verify → CC
→ canonical pick → cluster-keyed split — to find them, cluster them,
keep exactly one, and never split a cluster across train/test."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from marketingcloud_etl_spark.operators.semantic_dedup import (
    cell_candidates,
    semantic_dedup,
)
from marketingcloud_etl_spark.operators.similarity import train_ivf_codebook

DIM = 16


def _unit(rng: random.Random) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _corpus(spark):
    """200 random unit vectors + three planted near-dup groups: ids
    1000/1001 copy vec 1, 2000/2001/2002 copy vec 2, 3000/3001 copy
    vec 3 — each with tiny noise (cosine ≥ 0.999 to its original)."""
    rng = random.Random(7)
    base = {i: _unit(rng) for i in range(200)}
    rows = [(i, v) for i, v in base.items()]
    planted = {1: [1000, 1001], 2: [2000, 2001, 2002], 3: [3000, 3001]}
    for src, copies in planted.items():
        for cid in copies:
            noisy = [x + rng.gauss(0.0, 1e-3) for x in base[src]]
            n = math.sqrt(sum(x * x for x in noisy))
            rows.append((cid, [x / n for x in noisy]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return df, planted


def test_planted_neardups_end_to_end(spark):
    df, planted = _corpus(spark)
    cb = train_ivf_codebook(df, n_cells=8, refine_iters=1)
    assign, edges = semantic_dedup(df, cb, threshold=0.99, n_probe=2)
    a = {r.vec_id: r for r in assign.collect()}

    # every input doc got exactly one assignment row
    assert len(a) == df.count()

    for src, copies in planted.items():
        group = [src, *copies]
        # the whole planted group collapsed into ONE component...
        comps = {a[i].component for i in group}
        assert comps == {src}, (src, comps)
        # ...which keeps exactly one canonical member (the min id)...
        keepers = [i for i in group if a[i].keep]
        assert keepers == [src]
        # ...and never straddles the split boundary
        assert len({a[i].split for i in group}) == 1

    # edges: every planted pair was candidate-generated AND verified
    got_edges = {(r.id_a, r.id_b) for r in edges.collect()}
    for src, copies in planted.items():
        group = sorted([src, *copies])
        for i, x in enumerate(group):
            for y in group[i + 1 :]:
                assert (x, y) in got_edges, (x, y)

    # no random-pair false positives at this threshold
    planted_ids = {i for src, copies in planted.items() for i in (src, *copies)}
    for x, y in got_edges:
        assert x in planted_ids and y in planted_ids

    # untouched docs are singleton components, kept, and split-assigned
    singles = [r for i, r in a.items() if i not in planted_ids]
    assert all(r.component == r.vec_id and r.keep for r in singles)
    assert all(r.split in ("train", "test") for r in singles)


def test_cell_candidates_is_blocked_not_allpairs(spark):
    """The candidate join must stay a cell-blocked self-join: candidate
    count far below n² (the property that makes the pipeline viable at
    scale), while still covering every near-identical pair."""
    df, planted = _corpus(spark)
    n = df.count()
    cb = train_ivf_codebook(df, n_cells=8, refine_iters=1)
    cand = cell_candidates(df, cb, n_probe=2)
    n_cand = cand.count()
    assert n_cand < n * (n - 1) / 2 * 0.6, n_cand
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    for src, copies in planted.items():
        group = sorted([src, *copies])
        for i, x in enumerate(group):
            for y in group[i + 1 :]:
                assert (x, y) in got, (x, y)


def test_semantic_index_probe_incremental(spark, tmp_path):
    """Cross-batch semantic state (q389's operator layer): exact
    re-ingests verify as dups through the stored fingerprint with
    provenance; perturbed near-dups surface as CANDIDATES (IVF
    multi-probe recall) but not fingerprint-dups; appending batch
    survivors closes the incremental loop."""
    import json

    from marketingcloud_etl_spark.operators.semantic_dedup import (
        build_semantic_index,
        probe_semantic_index,
    )

    df, _ = _corpus(spark)
    corpus = df.filter(F.col("vec_id") < 200)
    cb = train_ivf_codebook(corpus, n_cells=8, refine_iters=1)
    cb = json.loads(json.dumps([[c, list(v)] for c, v in cb]))  # state roundtrip
    state = str(tmp_path / "semantic_index")
    build_semantic_index(corpus, cb).write.partitionBy("cell").parquet(state)
    index = spark.read.parquet(state)

    reingest = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    neardup = corpus.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20)).select(
        (F.col("vec_id") + 6000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(1e-4)).otherwise(F.lit(0.0))
        ).alias("embedding"),
    )
    batch1 = reingest.unionByName(neardup)
    res1 = {r.id: r for r in probe_semantic_index(batch1, index, cb).collect()}
    assert all(res1[i + 5000].is_dup for i in range(10))        # exact re-ingest
    assert all(res1[i + 5000].dup_of == i for i in range(10))   # provenance
    near = [res1[i + 6000] for i in range(10, 20)]
    assert not any(r.is_dup for r in near)                      # perturbed ≠ exact
    assert sum(1 for r in near if r.n_candidates > 0) >= 8      # IVF recall

    survivors = batch1.join(
        probe_semantic_index(batch1, index, cb).filter(~F.col("is_dup")).select("id"),
        batch1.vec_id == F.col("id"),
    ).select("vec_id", "embedding")
    build_semantic_index(survivors, cb).write.mode("append").partitionBy("cell").parquet(state)
    index2 = spark.read.parquet(state)
    batch2 = neardup.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    res2 = {r.id: r for r in probe_semantic_index(batch2, index2, cb).collect()}
    assert all(res2[i + 7000].is_dup for i in range(10, 20))    # dup of batch-1 rows
    assert all(res2[i + 7000].dup_of == i + 6000 for i in range(10, 20))
