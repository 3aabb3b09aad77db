"""Partition-spreading for CPU-heavy narrow stages.

A single small parquet file scans as ONE input split, so a narrow
CPU-bound stage (MinHash signatures, hyperplane dots, fingerprints)
runs on one core in local mode. On a real cluster the input splits
already provide the parallelism, so the spread must be conditional —
an unconditional ``repartition`` would add a full shuffle of the
payload columns at 100 TB for nothing.

The probe is conversion-free and split-aware. ``DataFrame.inputFiles()``
(public API, driver-side catalog metadata — no job, no DataFrame→RDD
conversion) gives the file list; when there are fewer files than cores
the probe then estimates how many INPUT SPLITS those files produce
(``ceil(size / spark.sql.files.maxPartitionBytes)`` per file — parquet
is splittable, so 32 × 2 GB files on a 256-core cluster already scan
as ~512 splits and must NOT be shuffled). Size lookups go through the
Hadoop FileSystem driver-side and only run when ``n_files < cores``,
so the metadata cost is bounded by the core count. Non-file inputs
(createDataFrame test frames, post-shuffle results) report no files
and are left alone — they already carry the session's parallelism or
an explicit one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _estimated_splits(df: DataFrame, files: list[str]) -> int:
    """Lower-bound the scan's input-partition count: one split per
    started ``maxPartitionBytes`` chunk of each file. Spark may pack
    small files into fewer partitions (openCostInBytes), never more —
    so underestimating keeps the repartition decision safe."""
    spark = df.sparkSession
    jvm = spark._jvm
    try:
        conf = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        max_bytes = int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf))
    except Exception:  # pragma: no cover - conf parse fallback
        max_bytes = _DEFAULT_MAX_PARTITION_BYTES
    try:
        hconf = spark._jsc.hadoopConfiguration()
        splits = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
            splits += max(1, -(-size // max_bytes))
        return int(splits)
    except Exception:  # pragma: no cover - FS without driver metadata
        return len(files)


def needs_spread(df: DataFrame) -> bool:
    """True iff ``df``'s file scan yields fewer input splits than there
    are cores — the probe behind :func:`spread_partitions`, exposed so
    callers can condition OTHER narrow-regime work on the same test
    (q401 pins its tokenized stream only in the single-split regime
    where the four sequential state steps would otherwise re-run the
    build on one task; at scale the probe is false and the pin — a
    corpus-sized persist, a §5 spill hazard — is never taken)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive: exotic sources
        return False
    n_files = len(files)
    if n_files == 0 or n_files >= par:
        return False
    return _estimated_splits(df, files) < par


def spread_partitions(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its file scan
    yields fewer input splits than there are cores."""
    if needs_spread(df):
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df
