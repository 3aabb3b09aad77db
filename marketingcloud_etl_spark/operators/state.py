"""Generic maintenance passes over persisted state tables.

The incremental family (q388 minhash bands, q389 semantic cells, q390
BM25 postings, q391 component labels) persists id-keyed parquet state
that batches probe and append to. Two maintenance passes exist over
that layout:

- ``compact_*`` (per-layout, in the owning operator modules): TTL /
  retention by PREDICATE, one partition-keyed shuffle, one file per
  partition — the scheduled pass.
- :func:`erase_from_state` (here): targeted deletion by TOMBSTONE
  FRAME — a takedown / right-to-erasure list of ids arriving as data,
  not as a predicate. The erasure list is tiny relative to the state,
  so the pass is a broadcast LEFT ANTI join: NARROW over the state
  files (zero shuffle of the state table), preserving the partition
  layout file-for-file.

Reference parity: the reference has no deletion path at all (its sink
is insert-ignore, `/root/reference/app/salesforce_extractor.py:296`);
this is the lifecycle operation a persisted-state engine needs that a
run-once ETL script does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def erase_from_state(
    spark,
    state_dir: str,
    out_dir: str,
    tombstones: DataFrame,
    id_col: str = "id",
    partition_col: str | None = None,
) -> DataFrame:
    """Rewrite the state at ``state_dir`` into ``out_dir`` with every
    row whose ``id_col`` appears in ``tombstones`` removed.

    ``tombstones`` must have exactly one column (any name): the ids to
    erase. It is broadcast, so the anti-join is map-side — the state
    table itself is never shuffled, and with ``partition_col`` set the
    partitioned layout survives file-for-file (each input file's
    surviving rows write back to the same partition; an already
    compacted one-file-per-partition state stays one file per
    partition).

    Erasure semantics the caller must understand (pinned by q399's
    oracle): deleting a doc's STATE ROWS removes that doc id from the
    index, but content-identical twins that were indexed under other
    ids still match future probes — removing *content* requires
    tombstoning every id that carries it. That is the correct
    behaviour for id-keyed takedown (erase THIS record), and the q399
    battery verifies both sides of it.

    Scale shape: tombstone lists (takedown orders, GDPR requests) are
    orders of magnitude smaller than the state — broadcast anti-join
    beats the compaction shuffle whenever the erasure list fits in a
    broadcast, which is the steady case; fall back to the per-layout
    ``compact_*`` pass with a ``keep`` predicate when it does not.
    Writes a fresh generation dir (never in place — concurrent probes
    race an in-place rewrite; ``out_dir == state_dir`` is rejected).
    The write uses overwrite mode so a retried erasure can reuse its
    UNPUBLISHED scratch dir; once a dir has been published via
    sinks/manifest.py it is immutable by contract and must never be a
    target again — pick a fresh generation dir per publish."""
    tname = tombstones.columns
    if len(tname) != 1:
        raise ValueError(f"tombstones must have exactly one column, got {tname}")
    import os

    if os.path.realpath(out_dir) == os.path.realpath(state_dir):
        # the overwrite below would destroy the state mid-read — the
        # in-place rewrite this module's contract exists to forbid.
        # realpath (not abspath) so a SYMLINKED alias of the state dir
        # is rejected too: abspath compares the spelling of the paths,
        # and a link pointing back at state_dir would slip through and
        # clobber the live state
        raise ValueError(
            "erase_from_state writes a FRESH generation dir: "
            f"out_dir must differ from state_dir ({state_dir!r})"
        )
    tomb = tombstones.select(F.col(tname[0]).alias(id_col)).distinct()
    state = spark.read.parquet(state_dir)
    kept = state.join(F.broadcast(tomb), id_col, "left_anti")
    writer = kept.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(out_dir)
    return spark.read.parquet(out_dir)


def signed_view_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Merge a SIGNED aggregate delta into a maintained view — the
    retraction algebra (differential-dataflow / DBSP convention) that
    turns insert-only view maintenance into full CDC maintenance:
    ``state`` and ``delta`` both carry ``keys + measures`` where every
    measure is a sign-weighted sum (+1 rows for inserts, −1 for
    deletes, already aggregated). The merge is ONE keyed additive
    aggregation, and ``measures[0]`` is BY CONVENTION the support
    count: groups whose maintained support reaches zero are dropped —
    a sum alone cannot distinguish 'zero total' from 'gone', which is
    why retraction-aware views must always maintain a count.

    Negative maintained support means the delta deleted rows the state
    never contained (a CDC ordering bug); it is filtered like zero
    here, and q406's oracle would hash-mismatch if it ever happened.

    Scale: state and delta are group-domain-bounded; the merge
    shuffles only those rows. The base fact is never touched."""
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(m).cast("bigint").alias(m) for m in measures])
        .filter(F.col(measures[0]) > 0)
    )
