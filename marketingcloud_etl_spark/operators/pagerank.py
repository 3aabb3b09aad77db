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


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    damping_pct: int = 85,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_every: int = 0,
) -> DataFrame:
    """EXACT PageRank in integer fixed-point micro-units: every rank is
    a bigint fraction of ``scale``, contributions are floor-divided by
    out-degree, and the damping mix is integer percent arithmetic —
    so the result is bit-identical under ANY partitioning or
    aggregation order (integer addition is associative; float
    power iteration is not), which makes the iterative-graph family
    driver-hashable (q342) instead of rows-only like float q128.
    Mass shrinks by the floor remainders each round — deterministic
    and identical on any engine that floors the same way; ranking
    order matches float PageRank to ~1e-12 relative.

    Same Spark shape as :func:`pagerank`: one join + one aggregation
    per iteration; loop-invariant edge/degree frames checkpoint once.
    Unlike the float operator, the per-round rank frame feeds exactly
    one downstream consumer, so by default the whole iteration chain
    stays ONE lazy DAG (a depth-``iters`` plan executes as a single
    job — ~2x faster than eager per-round materialization at bench
    scale); pass ``checkpoint_every=k`` to cut lineage every k rounds
    when running high iteration counts."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # one driver scalar, not data
    if n == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("rank_micro"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    e = edges.join(out_deg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), "__deg"
    ).localCheckpoint()
    base = (scale * (100 - damping_pct) // 100) // n
    ranks = nodes.select(
        "id", F.lit(scale // n).cast("bigint").alias("rank_micro")
    )
    for it in range(iters):
        contribs = e.join(ranks, e["__src"] == ranks["id"]).select(
            F.col("__dst").alias("id"),
            F.expr("rank_micro div __deg").alias("c"),
        )
        sums = contribs.groupBy("id").agg(F.sum("c").cast("bigint").alias("s"))
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("bigint").alias("rank_micro"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks
