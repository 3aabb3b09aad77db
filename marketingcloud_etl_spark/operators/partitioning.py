"""Partition-spreading for CPU-heavy narrow stages.

A single small parquet file scans as ONE input split, so a narrow
CPU-bound stage (MinHash signatures, hyperplane dots, fingerprints)
runs on one core in local mode. On a real cluster the input splits
already provide the parallelism, so the spread must be conditional —
an unconditional ``repartition`` would add a full shuffle of the
payload columns at 100 TB for nothing.

The probe is conversion-free: ``DataFrame.inputFiles()`` (public API,
driver-side catalog metadata — no job, no DataFrame→RDD conversion,
unlike ``df.rdd.getNumPartitions()`` which builds and analyzes an RDD
plan through py4j on every call). File-backed inputs with fewer files
than cores get repartitioned; non-file inputs (createDataFrame test
frames, post-shuffle results) report no files and are left alone —
they already carry the session's parallelism or an explicit one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it is backed by
    fewer input files than there are cores."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # pragma: no cover - defensive: exotic sources
        n_files = 0
    if 0 < n_files < par:
        df = df.repartition(par)
    return df
