"""Partition-count invariance: the float-determinism protocols
(decimal-money sums, sorted-fold, exact-int derivations) must produce
BITWISE-identical results when the session's parallelism changes —
the property that lets a 32-core local run and a 1000-executor cluster
agree. A raw SUM(double) query would fail this under reshuffling."""

from __future__ import annotations

import os

import pytest

from marketingcloud_etl_spark.plans.catalog import load_all

REGISTRY = load_all()

# every query here emits at least one double column derived from
# aggregation — the exact surface partial-agg ordering could corrupt
INVARIANCE_QUERIES = (
    "q01_pricing_summary",      # decimal-money protocol
    "q42_tfidf",                # salted token aggs + round protocol
    "q100_stats_moments",       # decimal power sums
    "q108_token_entropy",       # sorted-fold (ln terms)
    "q111_mixture_weights",     # sorted-fold (sqrt terms)
    "q119_median_mad_outliers", # exact percentile interpolation
    "q295_product_profit",      # decimal revenue-minus-cost mix (Q9 shape)
    "q312_neyman_allocation",   # sorted-fold of sqrt power-sum terms
    "q323_gini_concentration",  # distributed ranks × decimal(38,0) sums
    "q334_ks_two_sample",       # integer ECDF cross-multiplication
    "q342_pagerank_exact",      # fixed-point iterative graph op: the
                                # operator's whole claim is bitwise
                                # invariance under re-partitioning
    "q347_hits_fixed_point",    # fixed-point HITS: same claim as q342
    "q348_training_shard_manifest",  # hash shards + modular checksums
    "q349_markov_attribution",  # ppb fixed-point HOF power iteration
    "q357_grouped_quantile_scalable",  # distributed rank-cover quantiles:
                                # the interpolation must not depend on
                                # how the range partitioner cut the
                                # count table
)


def _rows(spark, sf_dir: str, name: str, cpus: str) -> list[tuple]:
    prev = os.environ.get("SPARK_GRAFT_CPUS")
    os.environ["SPARK_GRAFT_CPUS"] = cpus  # prep() resizes shuffle partitions
    try:
        df = REGISTRY[name].fn(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(map(tuple, df.select(*cols).collect()))
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_CPUS", None)
        else:
            os.environ["SPARK_GRAFT_CPUS"] = prev


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_invariant_to_partition_count(spark, sf_dir, name):
    narrow = _rows(spark, sf_dir, name, "3")
    wide = _rows(spark, sf_dir, name, "32")
    assert narrow == wide, f"{name} drifts under re-partitioning"
