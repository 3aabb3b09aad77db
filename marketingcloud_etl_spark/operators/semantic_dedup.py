"""Composed end-to-end semantic deduplication over an embedding column
— the pipeline a real corpus-curation run executes, as ONE operator:

    embeddings → coarse-cell candidate blocking (IVF codebook, top-p
    probe cells) → exact cosine verification of candidate pairs only →
    connected components → canonical pick → leakage-safe train/test
    split.

This is the SemDeDup-family shape (cluster the embedding space, compare
pairs only within cells): candidate generation is a cell-id equi-self-
join whose shuffle is O(n·probes), never the n² cross product — the
100 TB path. The cells come from the same IVF codebook the ANN search
path trains (operators/similarity.train_ivf_codebook), so one offline
training pass serves both search and dedup.

Every stage downstream of candidate generation is exact: pairs are
verified with full-precision cosine, the transitive closure is
operators/components.connected_components (O(log diameter) join rounds
with lineage cuts), the canonical pick and the split are deterministic
hash/min expressions. Approximation lives ONLY in candidate recall —
near-identical vectors land in the same top cells with overwhelming
probability, and multi-probe (``n_probe`` ≥ 2) covers cell-boundary
straddlers; the planted-near-dup e2e test pins this recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot
from .components import dedup_clusters
from .similarity import _normalize

# hash-split protocol shared with q85/q110: first 8 md5 hex chars of the
# stringified key as a bigint, mod 100
_H32_OF = "cast(conv(substring(md5(cast({e} as string)), 1, 8), 16, 10) as bigint)"


def _cell_scores_sql(vec_sql: str, norm_cents: list[list[float]]) -> str:
    """ONE expression producing the array of dot products of a vector
    against a LITERAL normalized-centroid matrix (argmax over dot ==
    argmax over cosine; the vector's own norm scales every cell
    identically). Same structural rules as similarity._argmax_cell_sql:
    single F.expr, vector let-bound through a one-element transform so
    it isn't re-evaluated per centroid after CollapseProject inlining."""
    cents_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"cast({x!r} as double)" for x in c) + ")"
            for c in norm_cents
        )
        + ")"
    )
    return (
        f"element_at(transform(array(cast({vec_sql} as array<double>)), v -> "
        f"transform({cents_lit}, c -> "
        f"aggregate(zip_with(v, c, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x))), 1)"
    )


def _unit_sql(vec_sql: str) -> str:
    """ONE expression producing the unit-normalized double array (zero
    vectors pass through unchanged — their dot with anything is 0, the
    same "no directional similarity" convention as functions.vectors.
    cosine). The norm fold is let-bound through single-element
    transforms so it computes ONCE per vector, not once per element
    after CollapseProject inlining. Normalizing up front turns the
    per-PAIR verify cost from three folds (dot + two norms) into one
    dot — the pair side is where the volume is."""
    return (
        f"element_at(transform(array(cast({vec_sql} as array<double>)), v -> "
        f"element_at(transform(array("
        f"aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)"
        f"), nn -> if(nn > 0D, transform(v, x -> x / sqrt(nn)), v)), 1)), 1)"
    )


def cell_candidates(
    df: DataFrame,
    codebook: list,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup candidate PAIRS (id_a < id_b) from coarse-cell blocking:
    each vector is assigned its ``n_probe`` highest-cosine cells (one
    narrow literal-matrix pass — no crossJoin against the centroid
    table on the corpus side), and a pair is a candidate when the two
    vectors share at least one probed cell. The only shuffle is the
    cell-id equi-self-join: O(n·n_probe) rows in, within-cell pairs
    out."""
    norm_cents = [_normalize([float(x) for x in c]) for _, c in codebook]
    scored = df.select(
        F.col(id_col).alias("__id"),
        F.expr(_cell_scores_sql(vec_col, norm_cents)).alias("__s0"),
    )
    # peel off the top-n_probe cells: argmax, mask, argmax again — all
    # codegen'd array expressions, no window, no shuffle
    for i in range(n_probe):
        scored = scored.withColumn(
            f"__c{i}",
            F.expr(f"cast(array_position(__s{i}, array_max(__s{i})) as int) - 1"),
        )
        if i + 1 < n_probe:
            scored = scored.withColumn(
                f"__s{i + 1}",
                F.expr(
                    f"transform(__s{i}, (x, j) -> "
                    f"if(j = __c{i}, cast('-Infinity' as double), x))"
                ),
            )
    cells = scored.select(
        "__id",
        F.explode(F.array(*[F.col(f"__c{i}") for i in range(n_probe)])).alias("cell"),
    ).distinct()
    # cut the literal-centroid expression out of every downstream plan:
    # it is ~n_cells·dim literals of SQL text, and left inline it would
    # be re-analyzed, re-codegen'd (Janino on a 100 KB method), and
    # re-executed on BOTH sides of the self-join below and in every
    # consumer action. The materialized (id, cell) frame is 2 small
    # columns × n·n_probe rows.
    cells = cells.localCheckpoint()
    a = cells.select(F.col("__id").alias("id_a"), "cell")
    b = cells.select(F.col("__id").alias("id_b"), "cell")
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def semantic_dedup(
    df: DataFrame,
    codebook: list,
    threshold: float,
    n_probe: int = 2,
    test_pct: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline. Returns ``(assign, edges)``:

    * ``assign`` — one row per input doc: (id_col, component, keep,
      split). ``component`` is the duplicate-cluster id (its minimum
      member id; singletons are their own component), ``keep`` marks
      the canonical member (minimum id — deterministic), ``split`` is
      'train'/'test' hashed on the CLUSTER id, so a near-dup group can
      never straddle the boundary (the eval-contamination guard).
    * ``edges`` — the verified near-dup pairs (id_a, id_b, cos_sim),
      exact cosine ≥ ``threshold``, candidates only.
    """
    cand = cell_candidates(df, codebook, n_probe, id_col, vec_col)
    unit = df.select(F.col(id_col).alias("__id"), F.expr(_unit_sql(vec_col)).alias("__u"))
    va = unit.select(F.col("__id").alias("id_a"), F.col("__u").alias("__va"))
    vb = unit.select(F.col("__id").alias("id_b"), F.col("__u").alias("__vb"))
    edges = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", dot("__va", "__vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    # the verified edge set is tiny (near-dup pairs), but its lineage is
    # the expensive candidate-join + dot scan; materialize once so the
    # CC pass and every caller-side read (leak checks, tests) reuse it
    # instead of re-running candidate generation per action
    edges = edges.localCheckpoint()
    clustered = dedup_clusters(df, edges.select("id_a", "id_b"), id_col=id_col)
    bucket = F.pmod(F.expr(_H32_OF.format(e="component")), F.lit(100))
    assign = clustered.withColumn(
        "split",
        F.when(bucket >= 100 - test_pct, F.lit("test")).otherwise(F.lit("train")),
    )
    return assign, edges
