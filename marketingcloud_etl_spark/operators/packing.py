"""Sequence bin-packing for training-data assembly — first-fit-
decreasing (FFD) within corpus shards.

q107's concat-and-chunk packing splits documents across sequence
boundaries; when documents must stay WHOLE (instruction tuning,
document-level objectives), packing becomes bin packing: place each
doc's token span into a fixed-capacity bin, minimizing bins. FFD
(sort by size desc, place each item into the first bin that fits) is
the classic 11/9·OPT + 6/9 approximation and is deterministic given a
total order — re-runs produce identical bins.

Scale shape: packing is per-SHARD (source), embarrassingly parallel —
one ``applyInPandas`` group per source, pandas/numpy inside (the
algorithm is inherently sequential WITHIN a bin set, so the
parallelism unit is the shard, exactly like q107). A global pack
order would funnel the corpus through one task for a ~1% bin-count
win; per-shard is what production runs.

Guarantees (pinned by tests + q151's self-verifying booleans):
  * every doc appears in exactly one bin;
  * no multi-doc bin exceeds capacity (docs longer than capacity get
    singleton oversize bins — flagged, never silently truncated);
  * FFD structural property: at most one non-oversize bin per shard
    is less than half full.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bin_pack_ffd"]


def bin_pack_ffd(
    df: DataFrame,
    capacity: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Assign each row a ``bin_id`` (dense, per shard) via first-fit-
    decreasing. Returns (shard_col, id_col, size_col, bin_id,
    oversize) — ``oversize`` marks docs bigger than ``capacity``
    (singleton bins). Deterministic: items sort by (size desc, id)."""
    import pandas as pd

    out_schema = (
        f"{shard_col} string, {id_col} bigint, {size_col} bigint, "
        "bin_id bigint, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([size_col, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        oversize = []
        for sz in pdf[size_col]:
            sz = int(sz)
            if sz > capacity:
                bins.append(-1)  # oversize singleton, accepts nothing
                assigned.append(len(bins) - 1)
                oversize.append(True)
                continue
            for b, rem in enumerate(bins):
                if rem >= sz:
                    bins[b] = rem - sz
                    assigned.append(b)
                    break
            else:
                bins.append(capacity - sz)
                assigned.append(len(bins) - 1)
            oversize.append(False)
        pdf = pdf.assign(bin_id=assigned, oversize=oversize)
        return pdf[[shard_col, id_col, size_col, "bin_id", "oversize"]]

    return (
        df.select(shard_col, id_col, size_col)
        .groupBy(shard_col)
        .applyInPandas(pack, schema=out_schema)
    )
