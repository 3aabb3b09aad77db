"""PageRank by power iteration — the float-valued iterative-graph
operator complementing connected components (components.py).

Spark shape per iteration: one join (ranks onto edges, both sides
hash-partitioned on the source id) + one aggregation (contributions
by destination). Ranks are localCheckpoint()ed each round so the plan
stays O(1) deep instead of growing with iterations — the same lineage
discipline as connected_components. Simplified model: dangling nodes
(no out-edges) drop their mass, the common formulation when the graph
is an undirected similarity graph fed symmetrically.

Rows-only by contract (float iteration); pinned against a numpy
reference implementation on the same edge set in
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``edges``. Returns
    (id, rank). Feed each undirected edge in both directions for the
    symmetric similarity-graph case."""
    # checkpoint the loop-invariant inputs ONCE: every iteration's eager
    # localCheckpoint of ranks would otherwise recompute the full edge
    # derivation (for q128 that is the n-gram Jaccard join battery)
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # one driver scalar, not data
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    e = edges.join(out_deg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), "__deg"
    ).localCheckpoint()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = e.join(ranks, e["__src"] == ranks["id"]).select(
            F.col("__dst").alias("id"), (F.col("rank") / F.col("__deg")).alias("c")
        )
        sums = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                (F.lit(base) + damping * F.coalesce("s", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
