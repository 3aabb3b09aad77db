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
