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
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``edges``. Returns
    (id, rank). Feed each undirected edge in both directions for the
    symmetric similarity-graph case and declare it with
    ``symmetric=True`` (skips the node-set union — see
    :func:`_nodes_with_degree`)."""
    # checkpoint the edge list FIRST, then the loop-invariant frames
    # derived from it: every iteration's eager localCheckpoint of ranks
    # would otherwise recompute the full edge derivation (for q128 that
    # is the n-gram Jaccard join battery), and nodes/degree each add
    # one more derivation pass without the cut here
    edges = edges.localCheckpoint()
    nodes = _nodes_with_degree(edges, src, dst, symmetric=symmetric)
    n = nodes.count()  # one driver scalar, not data
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    ranks = nodes.select(
        "id", "__deg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(iters):
        # shuffle_hash on the NODE-sized build side: left alone the
        # planner broadcast the EDGE list every iteration (it sits
        # under the 64 MB threshold at bench scale — edge-sized
        # broadcasts are exactly backwards), and the un-hinted
        # at-scale fallback is a sort-merge join that re-sorts the
        # edge list per iteration. Hinted, each iteration hash-joins
        # against the rank frame and the per-iteration edge exchanges
        # are byte-identical subtrees AQE reuses across rounds.
        contribs = edges.join(
            ranks.hint("shuffle_hash"), edges[src] == ranks["id"]
        ).select(
            F.col(dst).alias("id"), (F.col("rank") / F.col("__deg")).alias("c")
        )
        sums = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                "__deg",
                (F.lit(base) + damping * F.coalesce("s", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", "rank")


def _nodes_with_degree(
    edges: DataFrame, src: str, dst: str, symmetric: bool = False
) -> DataFrame:
    """One checkpointed (id, __deg) frame: every node id with its
    out-degree (0 for dangling nodes). Carrying the degree ON the
    node/rank frame instead of materializing a degree-annotated edge
    list halves the edge-sized checkpoint footprint — the degree column
    then travels with the NODE-sized rank frame through each
    iteration's join, never with the edge-sized one. Only rank rows
    that match some edge's source ever feed the ``rank / __deg``
    contribution, and those have __deg >= 1 by construction, so the
    dangling-node zero never divides.

    ``symmetric=True`` declares every edge is fed in both directions
    (the similarity-graph case): then the source set IS the node set
    and every node has out-degree ≥ 1, so the degree aggregation alone
    produces the frame — the union-both-endpoints + distinct + left
    join (two extra edge-sized shuffles) collapses to ONE groupBy.
    Results are identical for symmetric inputs; the flag is purely a
    plan declaration, like a JOIN hint."""
    deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    if symmetric:
        return deg.localCheckpoint()
    ids = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    return (
        ids.join(deg, "id", "left")
        .select("id", F.coalesce("__deg", F.lit(0)).alias("__deg"))
        .localCheckpoint()
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    damping_pct: int = 85,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_every: int = 0,
    symmetric: bool = False,
    init: DataFrame | None = None,
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
    per iteration; the edge list checkpoints FIRST so the (possibly
    expensive) edge derivation runs once — nodes and the
    degree-annotated edge frame then derive from the in-memory copy
    instead of re-running the upstream plan per consumer.
    Unlike the float operator, the per-round rank frame feeds exactly
    one downstream consumer, so by default the whole iteration chain
    stays ONE lazy DAG (a depth-``iters`` plan executes as a single
    job — ~2x faster than eager per-round materialization at bench
    scale); pass ``checkpoint_every=k`` to cut lineage every k rounds
    when running high iteration counts.

    ``init`` WARM-STARTS the power iteration from a persisted
    (id, rank_micro) state (q414's incremental-refresh posture):
    nodes present in ``init`` keep their persisted rank as round 0,
    nodes new to the graph start at the uniform ``scale // n`` (n =
    CURRENT node count). Per-round cost is unchanged (power iteration
    scans every edge each round regardless); what warm-starting buys
    at scale is ROUNDS — re-convergence from yesterday's solution
    instead of from uniform."""
    edges = edges.localCheckpoint()
    nodes = _nodes_with_degree(edges, src, dst, symmetric=symmetric)
    n = nodes.count()  # one driver scalar, not data
    if n == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("rank_micro"))
    base = (scale * (100 - damping_pct) // 100) // n
    if init is None:
        ranks = nodes.select(
            "id", "__deg", F.lit(scale // n).cast("bigint").alias("rank_micro")
        )
    else:
        ranks = nodes.join(init.select("id", "rank_micro"), "id", "left").select(
            "id",
            "__deg",
            F.coalesce("rank_micro", F.lit(scale // n).cast("bigint"))
            .cast("bigint")
            .alias("rank_micro"),
        )
    for it in range(iters):
        # shuffle_hash on the NODE-sized build side: left alone the
        # planner broadcast the EDGE list every iteration (it sits
        # under the 64 MB threshold at bench scale — edge-sized
        # broadcasts are exactly backwards), and the un-hinted
        # at-scale fallback is a sort-merge join that re-sorts the
        # edge list per iteration. Hinted, each iteration hash-joins
        # against the rank frame and the per-iteration edge exchanges
        # are byte-identical subtrees AQE reuses across rounds.
        contribs = edges.join(
            ranks.hint("shuffle_hash"), edges[src] == ranks["id"]
        ).select(
            F.col(dst).alias("id"),
            F.expr("rank_micro div __deg").alias("c"),
        )
        sums = contribs.groupBy("id").agg(F.sum("c").cast("bigint").alias("s"))
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                "__deg",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("bigint").alias("rank_micro"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", "rank_micro")
