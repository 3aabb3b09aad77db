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
