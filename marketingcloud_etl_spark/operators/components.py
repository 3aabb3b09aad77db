"""Connected components over a candidate-pair edge table — the
clustering stage of near-duplicate deduplication.

MinHash/SimHash LSH (operators/dedup.py) emits candidate PAIRS; dedup
policy ("keep one doc per duplicate cluster") needs the transitive
closure of those pairs: A~B and B~C put A,C in one cluster even if
A,C never collided. That closure is connected components.

Algorithm: min-label propagation expressed as DataFrame joins — each
iteration every node takes the minimum component label among itself
and its neighbors, until a fixpoint. This is the standard
shuffle-based CC for graphs that don't fit one machine (GraphFrames
uses the same family of algorithms); each iteration is one join +
one aggregation, both on the node id key, so the shuffle is
O(edges) per round and the round count is the graph diameter (dup
clusters are shallow — a handful of rounds in practice; ``max_iter``
bounds pathological chains).

Lineage is truncated every iteration with ``localCheckpoint`` —
without it the plan doubles per round and the driver spends its time
analyzing an exponentially growing tree (the classic iterative-
DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component
    id (the minimum node id in the component). Returns (id, component).

    Raises if the propagation has not converged after ``max_iter``
    rounds — a silent partial clustering would split duplicate groups
    and leak duplicates into the "deduplicated" output.
    """
    # symmetrize: propagation below follows edges one way
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()  # cut the (possibly expensive) candidate lineage

    labels = e.select(F.col("a").alias("id")).distinct().withColumn("component", F.col("id"))
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            e.join(labels.withColumnRenamed("id", "b_id"), F.col("b") == F.col("b_id"))
            .select(F.col("a").alias("id"), "component")
        )
        hop = (
            labels.unionByName(nbr_min)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: follow the label's own label (label chains only
        # ever point downward, so this halves chain length per round —
        # convergence in O(log diameter) rounds instead of O(diameter))
        parent = hop.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        new_labels = (
            hop.join(parent, F.col("component") == F.col("p_id"), "left")
            .select("id", F.coalesce("p_comp", "component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("l"), "id")
            .filter(F.col("n.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_clusters(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster near-dup candidate pairs and pick one keeper per cluster
    (the minimum id — deterministic). Returns one row per ``df`` doc:
    its component and a ``keep`` flag. Docs not in any candidate pair
    are their own singleton component and are always kept (anti-join
    against the component table — broadcast-sized relative to the
    corpus, since only colliding docs have edges)."""
    comp = connected_components(candidate_pairs)
    clustered = comp.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("keep"),
    )
    unpaired = (
        df.select(id_col)
        .join(comp.select(F.col("id").alias(id_col)), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.col(id_col).alias("component"),
            F.lit(True).alias("keep"),
        )
    )
    return clustered.unionByName(unpaired)


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """MERGE a batch of new edges into an existing component labelling
    WITHOUT re-clustering the graph — the cross-batch state posture
    (q388-q390) for connected components. ``labels`` is yesterday's
    (id, component) table (components labelled by their minimum member
    id, :func:`connected_components`' convention); ``new_edges`` is
    today's arrivals. Returns the updated (id, component) covering
    every previously-labelled node plus every new-edge endpoint, and
    EQUAL to ``connected_components`` over the union of all edges ever
    seen (the invariant the q391 oracle hash-checks).

    The standard contracted-supergraph trick, three bounded steps:

    1. map each new-edge endpoint to its existing component (itself if
       unseen) — two broadcast-able joins keyed on the endpoint;
    2. run CC on the CONTRACTED graph whose nodes are touched
       component labels + new node ids, and whose edges are the mapped
       new edges (self-loops dropped) — its size is O(new edges), not
       O(corpus): min-labels over min-labels compose, so the contracted
       minimum IS the global minimum;
    3. relabel: old labels join the contracted relabel map on their
       component (touched components move wholesale, untouched ones
       pass through), new nodes take their contracted label directly.

    At 100 TB yesterday's labelling is a billion-row table but the
    daily work is proportional to the BATCH: the contracted CC and the
    relabel map are new-edge-sized, and the only corpus-sized
    operation is the final component-keyed relabel join — one shuffle,
    no iteration. Full CC from scratch pays O(E) per round for
    O(log d) rounds, every day."""
    e = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    la = labels.select(F.col("id").alias("a"), F.col("component").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("component").alias("cb"))
    mapped = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("ca", "a").alias("ma"),
            F.coalesce("cb", "b").alias("mb"),
        )
    )
    contracted = mapped.filter(F.col("ma") != F.col("mb")).distinct()
    # self-loop-only nodes (a new edge internal to one existing
    # component, or a new-node self pair) still need labels: seed them
    # as singletons so the union below covers every touched node
    touched = (
        mapped.select(F.col("ma").alias("n"))
        .unionByName(mapped.select(F.col("mb").alias("n")))
        .distinct()
    )
    cc = connected_components(contracted, "ma", "mb", max_iter)
    relabel = (
        touched.join(cc.withColumnRenamed("id", "n"), "n", "left")
        .select(F.col("n"), F.coalesce("component", "n").alias("new_comp"))
    )
    # old nodes: components move wholesale through the relabel map
    old = labels.join(
        relabel.withColumnRenamed("n", "component"), "component", "left"
    ).select("id", F.coalesce("new_comp", "component").alias("component"))
    # new nodes: endpoints never seen before take their contracted label
    new_nodes = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
        .join(relabel.withColumnRenamed("n", "id"), "id", "left")
        .select("id", F.coalesce("new_comp", "id").alias("component"))
    )
    return old.unionByName(new_nodes)
