"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family: Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07 — public algorithm).

For token-set Jaccard >= t, any two qualifying sets must share at
least one token among the FIRST p = |s| - ceil(t*|s|) + 1 tokens of a
global canonical order (rarest token first): if the prefixes are
disjoint, the overlap is bounded below the threshold. So candidates
come from an equi-join on PREFIX tokens only — the exact-result
counterpart to MinHash-LSH (dedup.py), with no recall loss:

  1. global token frequencies (one aggregation);
  2. per-doc distinct tokens sorted by (freq, token) — rare tokens
     first minimizes prefix collisions;
  3. explode only the prefix, equi-join on token, distinct pairs;
  4. exact Jaccard verify on candidates (never all pairs).

Shuffle is O(sum of prefix lengths), concentrated on RARE tokens by
construction — the hot stopword keys that make the naive token join
skew-bound never enter the prefix for large sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def setsim_join(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
) -> DataFrame:
    """All pairs (id_a < id_b) with distinct-token Jaccard >= threshold.
    ``docs`` carries (id_col, tokens_col: array<string>). Returns
    (id_a, id_b, n_inter, n_union, jaccard_ppm) — the similarity as
    exact floored parts-per-million (integer; a rounded double ratio
    can straddle engine rounding boundaries)."""
    d = docs.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(tokens_col)).alias("__set"),
    ).filter(F.size("__set") > 0)

    # canonical order: global frequency asc, token asc (total order)
    freq = (
        d.select(F.explode("__set").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    ordered = (
        d.select("__id", F.size("__set").alias("__len"), F.explode("__set").alias("t"))
        .join(freq, "t")
        .withColumn(
            "__pos",
            F.row_number().over(Window.partitionBy("__id").orderBy("__f", "t")),
        )
    )
    # prefix length p = len - ceil(t*len) + 1
    prefix = ordered.filter(
        F.col("__pos") <= F.col("__len") - F.ceil(F.lit(threshold) * F.col("__len")) + 1
    )
    a = prefix.select(F.col("__id").alias("id_a"), "t")
    b = prefix.select(F.col("__id").alias("id_b"), "t")
    cand = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = d.select(F.col("__id").alias("id_a"), F.col("__set").alias("sa"))
    sb = d.select(F.col("__id").alias("id_b"), F.col("__set").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("n_inter"),
            union.alias("n_union"),
            F.floor(inter.cast("double") * 1000000.0 / union)
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .filter(F.col("n_inter").cast("double") / F.col("n_union") >= threshold)
    )
