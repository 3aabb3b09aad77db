"""Distributed as-of join.

Spark has no native ASOF JOIN; two formulations with different scale
profiles (SURVEY.md §2.B "Joins" / §7 risk register):

  * window formulation (plans/relational.py::q11_join_asof) — range
    join + max aggregate; oracle-expressible, fine when the per-key
    candidate fan-out is modest.
  * merge_asof formulation (here) — co-partition both sides by key,
    per-group pandas ``merge_asof`` (sorted merge, O(n+m) per key) via
    applyInPandas (Arrow-batched). The scale path when keys have long
    histories: one shuffle per side, no candidate blow-up.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the latest (``backward``) / earliest
    (``forward``) right row with right.on ≤ / ≥ left.on, matched by
    the ``by`` key. Output: left columns + right's non-key columns,
    suffixed. Right columns must not collide with left's after
    suffixing.
    """
    right_cols = [c for c in right.columns if c not in (on, by)]
    lcols = list(left.columns)
    rsch = {f.name: f for f in right.schema.fields}
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f"{on}{suffix}", rsch[on].dataType, True)]
        + [StructField(f"{c}{suffix}", rsch[c].dataType, True) for c in right_cols]
    )
    renames = {on: f"{on}{suffix}", **{c: f"{c}{suffix}" for c in right_cols}}

    # one co-partitioning shuffle: tag sides, union, group by key
    l_tagged = left.withColumn("__side", F.lit(0))
    r_tagged = right.select(by, on, *right_cols).withColumn("__side", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == 0][lcols].sort_values(on, kind="mergesort")
        if lpdf.empty:
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_schema.fields})
        # merge_asof raises on null merge keys: null-ts left rows match
        # nothing by definition, so route them around the merge
        null_left = lpdf[lpdf[on].isna()]
        lpdf = lpdf[lpdf[on].notna()]
        rights = pdf[pdf["__side"] == 1]
        if rights[by].isna().any():
            # SQL equality never matches NULL keys — the null-key group
            # must not pair its left and right rows
            rights = rights.iloc[0:0]
        rpdf = (
            rights[[on, *right_cols]]
            .dropna(subset=[on])
            .sort_values(on, kind="mergesort")
            .rename(columns=renames)
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=f"{on}{suffix}",
            direction=direction,
        )
        if not null_left.empty:
            merged = pd.concat([merged, null_left], ignore_index=True)
        return merged

    return unioned.groupBy(by).applyInPandas(lambda pdf: per_group(pdf), schema=out_schema)


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_right",
    n_buckets: int = 64,
) -> DataFrame:
    """Same semantics as :func:`asof_join`, via the cogrouped-map API:
    ``groupBy().cogroup().applyInPandas`` co-shuffles both sides and
    hands each group's two frames to one pandas ``merge_asof`` — no
    union/tag pass, one Arrow exchange per side. Prefer this
    formulation; the union form exists for Spark builds without
    cogroup.

    Cogrouping is by ``hash(key) % n_buckets``, not the raw key: one
    pandas call handles a whole bucket of keys (``merge_asof(by=key)``
    is vectorized across keys), so per-group Python/Arrow overhead is
    paid n_buckets times, not once per distinct key — the difference
    between ~10² and ~10⁶ python calls at scale. Keys never split
    across buckets, so semantics are unchanged."""
    right_cols = [c for c in right.columns if c not in (on, by)]
    lcols = list(left.columns)
    rsch = {f.name: f for f in right.schema.fields}
    on_r = f"{on}{suffix}"
    suffixed = [f"{c}{suffix}" for c in right_cols]
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(on_r, rsch[on].dataType, True)]
        + [StructField(f"{c}{suffix}", rsch[c].dataType, True) for c in right_cols]
    )
    # rename the right side BEFORE the cogroup: when both sides derive
    # from the same scan, identically-named columns share attribute ids
    # and the analyzer silently drops the right's copy from its frame
    right_renamed = right.select(
        by,
        F.col(on).alias(on_r),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_schema.fields})
        if rpdf.empty or f"{by}__r" not in rpdf.columns:
            # a bucket with no right rows arrives as a zero-column frame;
            # rebuild it with merge-compatible dtypes
            rpdf = pd.DataFrame(
                {
                    f"{by}__r": pd.Series(dtype=lpdf[by].dtype),
                    on_r: pd.Series(dtype=lpdf[on].dtype),
                    **{c: pd.Series(dtype="object") for c in suffixed},
                }
            )
        lpdf = lpdf[lcols].sort_values(on, kind="mergesort")
        # merge_asof raises on null ON keys, and matches null BY keys as
        # equal (NaN == NaN in its grouping) where SQL equality never
        # matches NULL — route null-key left rows around the merge and
        # drop null-key right rows
        null_left = lpdf[lpdf[on].isna() | lpdf[by].isna()]
        lpdf = lpdf[lpdf[on].notna() & lpdf[by].notna()]
        rpdf = (
            rpdf[[f"{by}__r", on_r, *suffixed]]
            .dropna(subset=[on_r, f"{by}__r"])
            .sort_values(on_r, kind="mergesort")
            .rename(columns={f"{by}__r": by})
        )
        out = pd.merge_asof(
            lpdf, rpdf, left_on=on, right_on=on_r, by=by, direction=direction
        )
        if not null_left.empty:
            out = pd.concat([out, null_left], ignore_index=True)
        return out[[f.name for f in out_schema.fields]]

    bkt = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets))  # noqa: E731
    left_b = left.withColumn("__bkt", bkt(by))
    right_b = right_renamed.withColumnRenamed(by, f"{by}__r").withColumn(
        "__bkt", bkt(f"{by}__r")
    )
    return (
        left_b.groupBy("__bkt")
        .cogroup(right_b.groupBy("__bkt"))
        .applyInPandas(lambda lp, rp: merge(lp, rp), schema=out_schema)
    )


def nearest_asof_merge(pdf: "pd.DataFrame", tolerance_s: float) -> "pd.DataFrame":
    """One key-group's NEAREST-direction as-of match (q193's kernel,
    module-level so the tie/tolerance semantics are property-testable
    against a brute-force reference without Spark):

    input columns (one group, any order): ``eid``, ``ts``, ``kind``
    ('p' = probe row, 'c' = candidate row). Each probe matches the
    candidate minimizing |Δt|, ties broken toward the EARLIER
    candidate then the smaller candidate id, dropped beyond
    ``tolerance_s``. Implemented as both-direction ``merge_asof`` +
    argmin — O(n log n) per group vs the brute force's O(n·m)."""
    import numpy as np

    empty = pd.DataFrame(
        {
            "p_id": pd.Series(dtype="int64"),
            "c_id": pd.Series(dtype="int64"),
            "diff_s": pd.Series(dtype="int64"),
        }
    )
    pp = (
        pdf[pdf["kind"] == "p"][["eid", "ts"]]
        .sort_values(["ts", "eid"])
        .rename(columns={"eid": "p_id"})
    )
    cc = (
        pdf[pdf["kind"] == "c"][["eid", "ts"]]
        .sort_values(["ts", "eid"])
        .rename(columns={"eid": "c_id"})
    )
    # equal-ts candidates: keep the smallest id (the (|Δt|, ts, id)
    # tiebreak picks the same row)
    cc = cc.drop_duplicates(subset="ts", keep="first")
    if pp.empty or cc.empty:
        return empty
    cc = cc.assign(c_ts=cc["ts"])
    b = pd.merge_asof(pp, cc, on="ts", direction="backward")
    f = pd.merge_asof(pp, cc, on="ts", direction="forward")
    bdiff = (pp["ts"].values - b["c_ts"].values) / np.timedelta64(1, "s")
    fdiff = (f["c_ts"].values - pp["ts"].values) / np.timedelta64(1, "s")
    bdiff = np.where(np.isnan(bdiff), np.inf, bdiff)
    fdiff = np.where(np.isnan(fdiff), np.inf, fdiff)
    take_b = bdiff <= fdiff  # tie -> backward (earlier candidate ts)
    cid = np.where(take_b, b["c_id"].values, f["c_id"].values)
    diff = np.where(take_b, bdiff, fdiff)
    ok = diff <= tolerance_s
    return pd.DataFrame(
        {
            "p_id": pp["p_id"].values[ok],
            "c_id": cid[ok].astype("int64"),
            "diff_s": np.floor(diff[ok]).astype("int64"),
        }
    )
