"""Streaming + sessionization catalog.

Batch-expressible twins (sessionization, tumbling windows) are
oracle-checked; genuinely-streaming queries (watermarks, session
windows, stateful dedup) run a real Structured Streaming job to
completion (availableNow → memory sink) and are rows-only for the
driver, with batch-equivalence pinned in tests/test_streaming.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec
from ..io import fixture_tag, table
from ..operators.sessionize import sessionize
from ..session import prep
from .catalog import query


@query(
    "q56_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      -- same (ts, event_id) order as g: a ts-only cumsum could order
      -- tied timestamps differently than the lag pass and split or
      -- merge a session spuriously
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id,
           cast(count(DISTINCT session_id) as bigint) AS n_sessions,
           count(*) AS n_events
    FROM s GROUP BY user_id
    """,
    tags=("streaming", "session"),
)
def q56_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + gap > 30min + cumsum) — the
    oracle-checkable twin of session_window streaming."""
    prep(spark)
    e = table(spark, sf_dir, "events")
    s = sessionize(e, gap_minutes=30)
    return s.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q57_batch_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n,
           cast(sum(cast(value as decimal(14,2))) as double) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def q57_batch_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation in batch form (date_trunc) — the
    equivalence target for the streaming version below."""
    prep(spark)
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
    )


@query("q58_stream_tumbling", oracle=None, tags=("streaming", "rows-only"))
def q58_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg executed as a real Structured
    Streaming query (multi-file replay → availableNow → memory sink).
    Must equal q57 row-for-row (pinned in tests)."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory, tumbling_counts

    agg = tumbling_counts(events_stream(spark, sf_dir))
    return run_to_memory(agg, "q58_out", output_mode="complete").withColumnRenamed(
        "window_start", "hour_start"
    )


@query("q59_stream_session_window", oracle=None, tags=("streaming", "rows-only"))
def q59_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30min) streaming aggregation run to
    completion; session count per user must match q56 (pinned in
    tests)."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory, session_windows

    # unbounded watermark: the replay files arrive time-unordered, and
    # (unlike tumbling aggs) the session-window operator drops
    # later-than-watermark rows even in complete mode
    sw = session_windows(events_stream(spark, sf_dir), gap="30 minutes", watermark="3650 days")
    out = run_to_memory(sw, "q59_out", output_mode="complete")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


@query("q61_stream_dedup", oracle=None, tags=("streaming", "rows-only"))
def q61_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on (user_id, event_type): state
    bounded by the watermark horizon; emits first-seen rows."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory, stream_dedup

    dd = stream_dedup(events_stream(spark, sf_dir), watermark="365 days")
    out = run_to_memory(dd.select("user_id", "event_type"), "q61_out", output_mode="append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_keys"))


@query(
    "q68_sliding_window",
    oracle="""
    WITH expanded AS (
      SELECT event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start
      FROM events
    )
    SELECT win_start, event_type,
           count(*) AS n,
           cast(sum(cast(value as decimal(14,2))) as double) AS total_value
    FROM expanded GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def q68_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h wide, 1h slide): every event lands in exactly
    two windows. ``F.window(ts, '2 hours', '1 hour')`` — the oracle
    expresses the same membership by exploding each row to its two
    window starts. Batch form of the streaming sliding aggregation."""
    prep(spark)
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )


@query(
    "q69_stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(14,2))) as double) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("streaming", "join"),
)
def q69_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension: the events stream joins the broadcast
    customer dim row-by-row (no join state), runs to completion, then
    aggregates — and must equal the same join computed in batch, which
    is exactly what the oracle checks. The one streaming query with a
    full value-hash gate."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory, stream_static_join

    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream_static_join(events_stream(spark, sf_dir), dim, "user_id").select(
        "c_mktsegment", "value"
    )
    out = run_to_memory(joined, "q69_out", output_mode="append")
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
    )


@query(
    "q75_stream_foreachbatch_upsert",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           cast(sum(cast(value as decimal(14,2))) as double) AS total_value
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "sink"),
)
def q75_stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink — the reference's insert-ignore loader
    (R12) in streaming form: every micro-batch anti-joins the parquet
    target on event_id and appends only new rows. Because replay
    micro-batches overlap nothing and event_id is unique, the final
    target must equal the source table exactly — which the oracle
    checks by value."""
    import os
    import shutil

    prep(spark)
    from ..sinks.upsert import upsert_parquet
    from ..streaming.jobs import events_stream

    tag = fixture_tag(sf_dir)
    target = f"/tmp/mcetl_febatch_{tag}"
    shutil.rmtree(target, ignore_errors=True)
    # also clear any checkpoint a crashed earlier run left behind —
    # stale offsets would make the stream skip every file against the
    # freshly-emptied target
    shutil.rmtree(f"{target}_ckpt_new", ignore_errors=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(batch_df, target, key="event_id")

    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{target}_ckpt_new")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(f"{target}_ckpt_new", ignore_errors=True)
    out = spark.read.parquet(target)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
    )


@query(
    "q81_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS total_cents
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def q81_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState end-to-end: the custom stateful operator
    emits each user's cumulative (count, cents) per micro-batch; the
    final emission per user — cumulative, so the row with the max
    count — must equal the plain batch aggregate, which the oracle
    checks by value. Cents are summed as exact integers on both sides
    (per-row rounding first: a float sum of 2-dp doubles then one
    round drifts at batch boundaries)."""
    prep(spark)
    from pyspark.sql.window import Window as W

    from ..streaming.jobs import events_stream, run_to_memory, stateful_running_totals

    out = run_to_memory(
        stateful_running_totals(events_stream(spark, sf_dir)),
        "q81_out",
        output_mode="update",
    )
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )


from .. import _pbcompat as _pb

_q104_query = (
    query(
        "q104_transform_with_state",
        oracle="""
    SELECT user_id, count(*) AS n_events,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS total_cents
    FROM events GROUP BY user_id
    """,
        tags=("streaming", "stateful"),
    )
    if _pb.resolvable()
    # no protobuf runtime on this host → transformWithState cannot run;
    # gate the query OUT of the catalog (mirroring the pytest.skip the
    # test equivalent takes) instead of hard-failing a full-catalog
    # sweep with a RuntimeError.
    else (lambda fn: fn)
)


@_q104_query
def q104_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState end-to-end (Spark 4's arbitrary-state API):
    per-user running totals through typed ValueState, replayed over the
    file stream, final emission per user compared against the plain
    batch aggregate by the oracle — identical contract to q81's
    applyInPandasWithState twin, so both stateful APIs carry the same
    hash-checked evidence. Needs the RocksDB state store (multi
    column-family) and protobuf in every Python worker; see
    streaming/jobs.py::enable_transform_with_state — the session conf
    is restored after the query finishes."""
    prep(spark)
    from pyspark.sql.window import Window as W

    from ..streaming.jobs import (
        RUN_ROCKSDB,
        enable_transform_with_state,
        events_stream,
        run_to_memory,
        stateful_running_totals_tws,
    )

    if not enable_transform_with_state(spark):
        raise RuntimeError(
            "transformWithState needs protobuf; neither a real "
            "distribution nor the _pbcompat bundled runtime is available"
        )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, RUN_ROCKSDB)
    try:
        out = run_to_memory(
            stateful_running_totals_tws(events_stream(spark, sf_dir)),
            "q104_out",
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )


def _run_tws_final(spark: SparkSession, sf_dir: str, builder, sink_name: str, out_cols):
    """Shared q104-protocol runner for transformWithState twins: enable
    protobuf + RocksDB, replay the file stream to completion, pick each
    user's FINAL emission (max processed_n — the cumulative row count
    every processor carries)."""
    from pyspark.sql.window import Window as W

    from ..streaming.jobs import (
        RUN_ROCKSDB,
        enable_transform_with_state,
        events_stream,
        run_to_memory,
    )

    if not enable_transform_with_state(spark):
        raise RuntimeError(
            "transformWithState needs protobuf; neither a real "
            "distribution nor the _pbcompat bundled runtime is available"
        )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, RUN_ROCKSDB)
    try:
        out = run_to_memory(
            builder(events_stream(spark, sf_dir)), sink_name, output_mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    w = W.partitionBy("user_id").orderBy(F.col("processed_n").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


_q141_query = (
    query(
        "q141_tws_liststate_topn",
        oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS processed_n
      FROM events
    )
    SELECT user_id,
           cast(max(processed_n) as bigint) AS processed_n,
           cast(count(*) as bigint) AS n_top,
           cast(sum(event_id) as bigint) AS ids_sum,
           cast(max(epoch_us(ts)) as bigint) AS latest_us
    FROM ranked WHERE rn <= 3 GROUP BY user_id
    """,
        tags=("streaming", "stateful"),
    )
    if _pb.resolvable()
    else (lambda fn: fn)
)


@_q141_query
def q141_tws_liststate_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState LIST state: per-user top-3 events by
    (ts, event_id) maintained incrementally across micro-batches —
    bounded "recent items per key" state (O(3) per key regardless of
    stream length). The kept set is a global top-3 under a total
    order, so any replay batching yields the same final state; the
    oracle recomputes it with a batch window. Runs under RocksDB with
    protobuf via _pbcompat (q104's protocol, incl. the final-emission
    pick by cumulative row count)."""
    prep(spark)
    from ..streaming.jobs import top3_events_tws

    return _run_tws_final(
        spark, sf_dir, top3_events_tws, "q141_out",
        ["user_id", "processed_n", "n_top", "ids_sum", "latest_us"],
    )


_q142_query = (
    query(
        "q142_tws_mapstate_counts",
        oracle="""
    SELECT user_id,
           cast(count(*) as bigint) AS processed_n,
           cast(count(DISTINCT event_type) as bigint) AS n_types,
           cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint)
             AS purchases,
           cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint)
             AS clicks
    FROM events GROUP BY user_id
    """,
        tags=("streaming", "stateful"),
    )
    if _pb.resolvable()
    else (lambda fn: fn)
)


@_q142_query
def q142_tws_mapstate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState MAP state: per-user per-event-type counters
    updated incrementally — the typed-state form of a grouped pivot,
    O(|types|) state per key. Final per-user map must equal the batch
    group-by, which the oracle checks by value (q104's protocol)."""
    prep(spark)
    from ..streaming.jobs import type_counts_tws

    return _run_tws_final(
        spark, sf_dir, type_counts_tws, "q142_out",
        ["user_id", "processed_n", "n_types", "purchases", "clicks"],
    )


@query(
    "q123_stream_stream_join",
    oracle="""
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT epoch_us(p.ts) - epoch_us(c.ts) AS lead_us
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.ts > p.ts - INTERVAL 30 MINUTE
       AND c.ts <= p.ts
    )
    SELECT cast(count(*) as bigint) AS n_pairs,
           cast(sum(lead_us) as bigint) AS total_lead_us,
           cast(floor(cast(sum(lead_us) as double) / count(*)) as bigint)
             AS avg_lead_us
    FROM pairs
    """,
    tags=("streaming", "join"),
)
def q123_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch formulation of the watermarked stream⋈stream join
    (streaming/jobs.py::stream_stream_join): purchases matched to
    same-user clicks in the preceding 30 minutes. The streaming twin
    runs the IDENTICAL join condition over the replayed file stream
    and must produce the same pairs (tests/test_streaming.py) — the
    time bound on both inputs is what lets the streaming engine prune
    buffered join state instead of holding both streams forever.

    Batch shape: both sides hash-partition on user_id (one shuffle
    each), the interval predicate evaluates inside the joined
    partitions; lead times are summed as exact integer microseconds."""
    prep(spark)
    from ..streaming.jobs import stream_stream_join  # noqa: F401  (streaming twin)

    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("p_ts"))
    c = e.filter(F.col("event_type") == "click").select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select((F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lead_us"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("lead_us").cast("long").alias("total_lead_us"),
        # floored integer mean: one IEEE division of exact ints + floor,
        # engine-identical (round(...,6) on an arbitrary ratio is not)
        F.floor(F.sum("lead_us").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("avg_lead_us"),
    )


@query(
    "q147_statestore_read",
    oracle="""
    SELECT event_type,
           cast(count(*) as bigint) AS n_rows,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS total_cents
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "observability"),
)
def q147_statestore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The state-store BATCH READER (``spark.read.format("statestore")``)
    — operational introspection of a streaming checkpoint without
    touching the running query. A tumbling aggregation runs to
    completion over the replayed events, then its checkpoint's state
    files are read back as a batch DataFrame (key struct + aggregation
    buffer struct per partition) and the recovered per-type counters
    must equal the batch aggregate — proving the on-disk state IS the
    answer, the property checkpoint recovery (and this debugging
    workflow at 100 TB) relies on."""
    import tempfile

    prep(spark)
    from ..streaming.jobs import events_stream

    ck = tempfile.mkdtemp(prefix="mcetl_q147_ckpt_")
    agg = (
        events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("q147_sink")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ck)
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n_rows"),
        F.col("value.sum").alias("total_cents"),
    )


@query(
    "q172_stream_foreach_sink",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS total_cents
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "sink"),
)
def q172_stream_foreach_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreach`` (per-ROW) streaming sink — the lowest-level sink
    protocol, for targets with no batch API (the per-record REST POST
    the reference's world speaks): a ForeachWriter opens per
    (partition, epoch), streams rows into a JSON-lines part file, and
    publishes it atomically on close. The (partition, epoch) file name
    is the idempotence key — a retried task overwrites its own file,
    never duplicates it — so the re-read equals the source exactly and
    the oracle value-checks the full loop. foreachBatch (q75) is the
    set-based fast path; this is the row-protocol twin. Cents are
    per-row-rounded integers, order-proof."""
    import glob
    import json
    import os
    import shutil

    prep(spark)
    from ..streaming.jobs import events_stream

    tag = fixture_tag(sf_dir)
    target = f"/tmp/mcetl_feach_{tag}"
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(f"{target}_ckpt", ignore_errors=True)
    os.makedirs(target, exist_ok=True)

    class RowWriter:
        def open(self, partition_id: int, epoch_id: int) -> bool:
            self.path = os.path.join(target, f"p{partition_id}-e{epoch_id}.jsonl")
            self.tmp = self.path + ".tmp"
            self.f = open(self.tmp, "w")
            return True

        def process(self, row) -> None:
            cents = int(row.value * 100 + (0.5 if row.value >= 0 else -0.5))
            self.f.write(
                json.dumps({"event_type": row.event_type, "cents": cents}) + "\n"
            )

        def close(self, error) -> None:
            self.f.close()
            if error is None:
                os.replace(self.tmp, self.path)  # atomic publish per task
            else:
                os.remove(self.tmp)

    q = (
        events_stream(spark, sf_dir)
        .select("event_type", "value")
        .writeStream.foreach(RowWriter())
        .option("checkpointLocation", f"{target}_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(f"{target}_ckpt", ignore_errors=True)
    back = spark.read.schema("event_type string, cents bigint").json(
        sorted(glob.glob(os.path.join(target, "*.jsonl")))
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "q188_chained_stateful_stream",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           cast(count(*) as bigint) AS n
    FROM events GROUP BY day, event_type
    """,
    tags=("streaming", "stateful", "chained"),
)
def q188_chained_stateful_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful operators chained in ONE streaming query (the
    Spark 4 multi-stateful pipeline): exactly-once ingestion of an
    at-least-once feed without a landing rewrite. The replayed stream
    is unioned with itself so every event arrives twice, a watermarked
    ``dropDuplicates`` on the event id restores exactly-once, and the
    surviving rows flow DIRECTLY into a tumbling-window count — dedup
    state and window state live in the same query, no intermediate
    sink. The watermark exceeds the fixture's whole span because the
    replay files arrive time-unordered (q59's protocol; a production
    feed uses its real disorder bound). The oracle is the batch
    aggregate of the ORIGINAL events — dedup must exactly cancel the
    doubling for every window."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory

    s = events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    dd = doubled.withWatermark("ts", "3650 days").dropDuplicates(["event_id"])
    win = (
        dd.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "event_type", "n")
    )
    return run_to_memory(win, "q188_out", output_mode="complete")


@query(
    "q344_dedup_within_watermark",
    oracle="""
    SELECT event_type,
           cast(count(*) as bigint) AS n,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS cents
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "stateful", "dedup"),
)
def q344_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` hash-verified (the API's only
    other appearance, q61, is rows-only): the replayed stream unioned
    with itself — every event arrives twice — and the within-watermark
    dedup on event id must exactly cancel the doubling, because each
    duplicate lands inside its original's watermark horizon. Unlike
    plain watermarked ``dropDuplicates`` (q188), this operator EXPIRES
    a key's state one watermark-delta after that key's LAST duplicate
    rather than keeping it forever — the contract that bounds dedup
    state at 100 TB feed scale (state size tracks the disorder window,
    not the corpus). The oracle is the batch aggregate of the ORIGINAL
    events; per-row-rounded integer cents make the sum order-proof."""
    prep(spark)
    from ..streaming.jobs import events_stream, run_to_memory

    s = events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    dd = doubled.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_memory(
        dd.select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ),
        "q344_out",
        output_mode="append",
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


@query(
    "q196_stream_stream_left_outer",
    oracle="""
    WITH cut AS (
      SELECT least(max(ts) FILTER (WHERE event_type='purchase'),
                   max(ts) FILTER (WHERE event_type='click')) AS cut
      FROM events),
    p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events, cut
      WHERE event_type = 'purchase' AND ts < cut - INTERVAL 95 MINUTES),
    c AS (SELECT user_id AS c_user, event_id AS c_id, ts AS c_ts FROM events
      WHERE event_type = 'click')
    SELECT p.user_id, p.p_id, cast(count(c.c_id) as bigint) AS n_clicks_30m,
           count(c.c_id) = 0 AS unmatched
    FROM p LEFT JOIN c ON p.user_id = c.c_user
     AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTES AND c.c_ts <= p.p_ts
    GROUP BY p.user_id, p.p_id
    """,
    tags=("streaming", "join", "outer"),
)
def q196_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream LEFT OUTER join — the semantics q123 (inner)
    cannot give: a purchase with NO click in its 30-minute lookback
    still emits, with nulls, once BOTH watermarks pass its join
    horizon (state for it can provably never match again). Runs on the
    event-time-ORDERED replay (jobs.ordered_replay_dir) — outer joins
    are the watermark-sensitive case where arrival order is
    semantics-bearing, exactly as in production. The oracle is the
    batch left join restricted to purchases whose outer decision is
    FINAL at stream end: p_ts < min(max purchase ts, max click ts) −
    (30 min join bound + 60 min watermark + 5 min slack) — the same
    cutoff applied to the streamed result, so the compare covers both
    matched multiplicities and the null emissions."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    p = (
        s.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftOuter",
    )
    out = run_to_memory(
        j.select("user_id", "p_id", "p_ts", "c_id"), "q196_out", output_mode="append"
    )
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
        ).alias("cut")
    )
    return (
        out.join(F.broadcast(cut), F.lit(True))
        .filter(F.col("p_ts") < F.col("cut") - F.expr("INTERVAL 95 MINUTES"))
        .groupBy("user_id", "p_id")
        .agg(
            F.count("c_id").alias("n_clicks_30m"),
            F.max(F.col("c_id").isNull()).alias("unmatched"),
        )
    )


@query(
    "q213_session_append_finalized",
    oracle="""
    WITH cut AS (SELECT max(ts) - INTERVAL 95 MINUTES AS cut FROM events),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id)) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), spans AS (
      SELECT user_id, sid, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTES AS s_end,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, cast(count(*) as bigint) AS n_sessions,
           cast(sum(n_events) as bigint) AS n_events
    FROM spans, cut WHERE s_end <= cut
    GROUP BY user_id
    """,
    tags=("streaming", "session", "append"),
)
def q213_session_append_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode session windows — the production emission semantics
    q59's complete-mode workaround sidesteps: a session row is emitted
    exactly once, when the watermark proves no further event can
    extend it (watermark past session end + gap). Runs on the
    event-time-ORDERED replay with a REAL 1-hour watermark (q59 needed
    an unbounded one). The oracle recomputes gap-sessionization in SQL
    (new session on gap ≥ 30 min, session end = last event + gap —
    Spark's session_window definition) and restricts both sides to
    sessions provably finalized at stream end (end ≤ max ts − 95 min:
    60 watermark + 30 gap + 5 slack)."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    sw = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
            "user_id",
            "n_events",
        )
    )
    out = run_to_memory(sw, "q213_out", output_mode="append")
    cut = table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 95 MINUTES")).alias("cut")
    )
    return (
        out.join(F.broadcast(cut), F.lit(True))
        .filter(F.col("s_end") <= F.col("cut"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@query(
    "q219_stream_temporal_enrich",
    oracle="""
    WITH scd AS (
      SELECT user_id AS d_user, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             event_type AS state
      FROM events WHERE event_type IN ('signup', 'purchase')
    ), clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT coalesce(s.state, 'none') AS state_at_click,
           cast(count(*) as bigint) AS n_clicks
    FROM clicks c LEFT JOIN scd s
      ON c.user_id = s.d_user AND c.ts >= s.valid_from
     AND (s.valid_to IS NULL OR c.ts < s.valid_to)
    GROUP BY state_at_click
    """,
    tags=("streaming", "join", "temporal"),
)
def q219_stream_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING temporal enrichment — q215's event-time SCD join with
    the fact side arriving as a stream: each streamed click left-joins
    the STATIC SCD2 dimension on user + interval containment. Stream-
    static joins are stateless (each row enriches and leaves — no
    watermark, no join state), so this is the cheap, exactly-per-row
    way to stamp dimension context onto a live feed; the stateful
    machinery (q123/q196) is only needed when BOTH sides move. The
    oracle is the batch q215 aggregate — stream and batch enrichment
    must agree row-for-row."""
    prep(spark)
    from pyspark.sql.window import Window as W

    from ..streaming.jobs import events_stream, run_to_memory

    ev = table(spark, sf_dir, "events")
    dim = ev.filter(F.col("event_type").isin("signup", "purchase"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    scd = dim.select(
        F.col("user_id").alias("d_user"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.col("event_type").alias("state"),
    )
    s = events_stream(spark, sf_dir)
    clicks = s.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    enr = clicks.join(
        scd,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    ).select(
        "event_id", F.coalesce(F.col("state"), F.lit("none")).alias("state_at_click")
    )
    out = run_to_memory(enr, "q219_out", output_mode="append")
    return out.groupBy("state_at_click").agg(F.count(F.lit(1)).alias("n_clicks"))


@query(
    "q236_watermark_late_drop",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo,
             max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span
      FROM events
    ), e AS (
      SELECT event_type,
             make_timestamp(epoch_us(ts)
                            - CASE WHEN event_id % 97 = 0
                                   THEN 432000000000 ELSE 0 END) AS ts2,
             cast(floor((epoch_us(ts) - b.lo) * 8.0 / b.span) as bigint) AS slice
      FROM events, b
    ), sm AS (
      -- Spark tracks max event time in MILLISECONDS (EventTimeStats),
      -- so the watermark floor-truncates any µs component
      SELECT slice,
             make_timestamp((epoch_us(max(ts2)) // 1000) * 1000) AS m
      FROM e GROUP BY slice
    ), wm AS (
      -- the late-record filter LAGS the watermark by one batch
      -- (verified empirically on Spark 4.1): rows of batch i are
      -- filtered against the watermark computed from batches ≤ i−2
      SELECT slice,
             max(m) OVER (ORDER BY slice
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               - INTERVAL 30 MINUTES AS wm_before
      FROM sm
    ), kept AS (
      SELECT e.event_type, e.ts2
      FROM e JOIN wm USING (slice)
      WHERE wm.wm_before IS NULL
         OR date_trunc('hour', e.ts2) + INTERVAL 1 HOUR > wm.wm_before
    ), fin AS (
      SELECT make_timestamp((epoch_us(max(ts2)) // 1000) * 1000)
               - INTERVAL 30 MINUTES AS final_wm
      FROM e
    )
    SELECT date_trunc('hour', ts2) AS window_start, event_type,
           cast(count(*) as bigint) AS n
    FROM kept, fin
    WHERE date_trunc('hour', ts2) + INTERVAL 1 HOUR <= final_wm
    GROUP BY window_start, event_type
    """,
    tags=("streaming", "watermark"),
)
def q236_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA DROP, driver-checkable — the semantics q58's
    rows-only check could only smoke-test: a replay with PLANTED late
    rows (every 97th event's time shifted back 120h, arrival position
    unchanged — jobs.late_replay_dir) runs through a 30-minute
    watermark + 1h tumbling append aggregation, and the oracle
    SIMULATES the engine rule in SQL: batch i's watermark is the max
    event time over batches < i minus the delay; a row is dropped iff
    its window end ≤ that watermark; a window is emitted iff its end ≤
    the final watermark. Batch membership is recomputable because the
    replay slices on the exact µs bucket arithmetic the writer used.
    In-order rows always survive (their window end is ahead of any
    earlier-batch watermark by construction); the planted rows whose shift
    overshoots the lagged watermark are provably dropped — the oracle
    counts must agree exactly, proving drop semantics, not just
    plumbing."""
    prep(spark)
    from ..streaming.jobs import late_replay_dir, run_to_memory

    src = late_replay_dir(spark, sf_dir, shift_hours=120)
    schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("latestFirst", "false")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    return run_to_memory(agg, "q236_out", output_mode="append")


@query(
    "q243_update_mode_timeline",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo,
             max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span
      FROM events
    ), e AS (
      SELECT event_type,
             cast(floor((epoch_us(ts) - b.lo) * 8.0 / b.span) as bigint) AS slice
      FROM events, b
    ), per AS (
      SELECT event_type, slice, count(*) AS cnt
      FROM e GROUP BY event_type, slice
    )
    SELECT event_type,
           cast(sum(cnt) OVER (PARTITION BY event_type ORDER BY slice
                               ROWS UNBOUNDED PRECEDING) as bigint) AS n
    FROM per
    """,
    tags=("streaming", "update-mode"),
)
def q243_update_mode_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode, emission-timeline-checkable — q81 checks
    final state; this checks every INTERMEDIATE emission: an unwindowed
    per-type running count emits, in each micro-batch, one row per key
    touched in that batch carrying the cumulative count so far. Batch =
    time slice (ordered replay, 1 file/trigger), so the full emitted
    MULTISET is deterministic and the oracle reconstructs it as a
    running sum over per-(type, slice) counts — if the engine emitted
    stale state, skipped an update, or double-counted a batch, some
    row's total would drift. No watermark: state is O(|keys|), the
    shape dashboard counters run at scale."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    agg = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_memory(agg, "q243_out", output_mode="update")


@query(
    "q250_stream_stream_full_outer",
    oracle="""
    WITH cut AS (
      SELECT least(max(ts) FILTER (WHERE event_type='purchase'),
                   max(ts) FILTER (WHERE event_type='click')) AS cut
      FROM events),
    p_all AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
              WHERE event_type = 'purchase'),
    c_all AS (SELECT user_id AS c_user, event_id AS c_id, ts AS c_ts FROM events
              WHERE event_type = 'click'),
    p_fin AS (SELECT p_all.* FROM p_all, cut WHERE p_ts < cut - INTERVAL 125 MINUTES),
    c_fin AS (SELECT c_all.* FROM c_all, cut WHERE c_ts < cut - INTERVAL 155 MINUTES),
    p_side AS (
      SELECT 'p' AS side, p.user_id, p.p_id AS anchor_id,
             cast(count(c.c_id) as bigint) AS n_matches,
             count(c.c_id) = 0 AS unmatched
      FROM p_fin p LEFT JOIN c_all c ON p.user_id = c.c_user
        AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTES AND c.c_ts <= p.p_ts
      GROUP BY p.user_id, p.p_id
    ), c_side AS (
      SELECT 'c' AS side, c.c_user AS user_id, c.c_id AS anchor_id,
             cast(0 as bigint) AS n_matches, true AS unmatched
      FROM c_fin c
      WHERE NOT EXISTS (
        SELECT 1 FROM p_all p WHERE p.user_id = c.c_user
          AND p.p_ts >= c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTES)
    )
    SELECT * FROM p_side UNION ALL SELECT * FROM c_side
    """,
    tags=("streaming", "join", "outer"),
)
def q250_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream FULL OUTER join — completes the join-mode matrix
    (inner q123, left q196): BOTH sides emit null-padded rows once
    their watermark proves no partner can still arrive. Finality is
    side-specific and cascades through the join bound, so the compare
    universe is layered: a purchase is decided once the click
    watermark passes its (30 min-lookback) horizon → p_ts < cut−125;
    an unmatched click needs the purchase watermark past c_ts+30 →
    c_ts < cut−155. Each anchor row is judged against the FULL other
    side (matches are never truncated by the other side's cutoff —
    the asymmetry that makes naive symmetric-cutoff oracles wrong).
    Matched multiplicities, null-padded purchases AND null-padded
    clicks all hash-match the batch reconstruction."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    p = (
        s.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "fullOuter",
    )
    out = run_to_memory(
        j.select("user_id", "p_id", "p_ts", "c_user", "c_id", "c_ts"),
        "q250_out",
        output_mode="append",
    )
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
        ).alias("cut")
    )
    o = out.join(F.broadcast(cut), F.lit(True))
    p_rows = (
        o.filter(
            F.col("p_id").isNotNull()
            & (F.col("p_ts") < F.col("cut") - F.expr("INTERVAL 125 MINUTES"))
        )
        .groupBy(F.col("user_id"), F.col("p_id").alias("anchor_id"))
        .agg(
            F.count("c_id").alias("n_matches"),
            F.max(F.col("c_id").isNull()).alias("unmatched"),
        )
        .select(
            F.lit("p").alias("side"), "user_id", "anchor_id", "n_matches", "unmatched"
        )
    )
    c_rows = o.filter(
        F.col("p_id").isNull()
        & (F.col("c_ts") < F.col("cut") - F.expr("INTERVAL 155 MINUTES"))
    ).select(
        F.lit("c").alias("side"),
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("anchor_id"),
        F.lit(0).cast("bigint").alias("n_matches"),
        F.lit(True).alias("unmatched"),
    )
    return p_rows.unionByName(c_rows)


@query(
    "q358_stream_stream_left_semi",
    oracle="""
    SELECT p.user_id, p.event_id AS p_id,
           cast(count(*) as bigint) AS n
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 30 MINUTES
          AND c.ts <= p.ts)
    GROUP BY p.user_id, p.event_id
    """,
    tags=("streaming", "join", "semi"),
)
def q358_stream_stream_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream LEFT SEMI join — the last cell of the join-mode
    matrix (inner q123, left outer q196, full outer q250): emit each
    purchase exactly ONCE as soon as any qualifying click proves it
    matched, and never ship the click's columns. Unlike the outer
    modes, semi needs NO layered finality cutoff in the oracle: a
    matched left row emits at match time (not at watermark expiry),
    and the join bound only admits clicks with c_ts ≤ p_ts, so under
    ordered slice-per-batch replay every qualifying click is already
    in (or arrives with) the purchase's own micro-batch horizon —
    the emitted set is exactly the batch EXISTS semantics over the
    whole log, and the at-most-once emission is itself the verified
    property (a double-emit breaks the count column's hash). State
    stays watermark-bounded on both sides like the other modes."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    p = (
        s.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftSemi",
    )
    out = run_to_memory(
        j.select("user_id", "p_id"), "q358_out", output_mode="append"
    )
    # count(*) pins at-most-once emission: a re-emitted anchor would
    # make some n > 1 and break the value hash, not just the row count
    return out.groupBy("user_id", "p_id").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q257_batch_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTES AS session_end,
           cast(count(*) as bigint) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("streaming", "session", "batch-twin"),
)
def q257_batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` run in BATCH mode — the operator itself (not
    a lag/cumsum re-derivation) with a full value oracle: Spark's
    session merge must produce EXACTLY the spans the SQL gap
    formulation defines (start = first event, end = last event + gap,
    new session at gap ≥ 30 min). q56 verifies per-user session
    counts; this pins every span boundary, which is what q59/q213's
    streaming runs then inherit. Batch session_window is one
    partitioned aggregation — no state store, no watermark — so it's
    also the cheap backfill twin of the streaming job."""
    prep(spark)
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q273_chained_window_agg",
    oracle="""
    WITH fin AS (
      SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
               - INTERVAL 30 MINUTES AS final_wm
      FROM events
    ), hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS h,
             count(*) AS n
      FROM events GROUP BY event_type, h
    )
    SELECT date_trunc('day', h.h) AS day, h.event_type,
           cast(max(h.n) as bigint) AS peak_hourly,
           cast(sum(h.n) as bigint) AS day_total
    FROM hourly h, fin
    WHERE date_trunc('day', h.h) + INTERVAL 1 DAY <= fin.final_wm
    GROUP BY day, h.event_type
    """,
    tags=("streaming", "window", "multi-stateful"),
)
def q273_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED STATEFUL AGGREGATIONS (Spark 4 multi-stateful): hourly
    counts re-aggregated into per-day PEAK-hour and total inside ONE
    streaming query — window-of-window, the continuous-rollup shape
    that previously needed an intermediate sink (q188 chains
    dedup→agg; this chains agg→agg, the case where the second
    operator's input is the first's APPEND output). The inner window's
    event time column carries into the outer day window via
    ``window_time``; emission finality for a day needs the watermark
    past day end (oracle cutoff = final watermark, ms-truncated —
    q236's arithmetic). Peak-hour-of-day is the classic capacity
    metric; both levels are exact integers."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    hourly = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.withColumn("ht", F.window_time("hw"))
        .groupBy(F.window("ht", "1 day").alias("dw"), "event_type")
        .agg(F.max("n").alias("peak_hourly"), F.sum("n").alias("day_total"))
        .select(
            F.col("dw.start").alias("day"), "event_type", "peak_hourly", "day_total"
        )
    )
    return run_to_memory(daily, "q273_out", output_mode="append")


def _register_q350() -> None:
    """Register q350 with q346's oracle (imported lazily so
    marketing_queries and streaming_queries stay cycle-free at module
    import time), gated like q104 on a resolvable protobuf runtime."""
    from .marketing_queries import PATTERN_MATCH_ORACLE

    deco = (
        query(
            "q350_stream_pattern_match",
            oracle=PATTERN_MATCH_ORACLE,
            tags=("streaming", "stateful", "sequence"),
        )
        if _pb.resolvable()
        else (lambda fn: fn)
    )

    @deco
    def q350_stream_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
        """STREAMING twin of q346: the same 3-state view→click→purchase
        automaton run INCREMENTALLY over the ordered slice-per-batch
        replay via transformWithState (streaming/jobs.py::
        pattern_match_tws) — one ValueState row per user, each batch
        folds its time-slice of events into the carried state. Because
        slices partition event time (equal timestamps never straddle a
        batch) the incremental fold equals the batch fold EXACTLY, so
        this query hashes against the IDENTICAL recursive-CTE oracle as
        q346: cross-batch state carry, per-batch re-sorting, and
        update-mode emission semantics all become driver-hashed
        evidence. `matches` is nondecreasing per user, so the final
        per-user value is max over that user's update emissions.

        Scale: unlike batch q346's collected per-user arrays, state
        here is O(1) per user on an UNBOUNDED feed — this is the shape
        the operator runs at production scale; RocksDB state store,
        checkpoint-recoverable like q104/q141/q142."""
        prep(spark)
        from ..streaming.jobs import (
            RUN_ROCKSDB,
            enable_transform_with_state,
            events_stream_ordered,
            pattern_match_tws,
            run_to_memory,
        )

        if not enable_transform_with_state(spark):
            raise RuntimeError(
                "transformWithState needs protobuf; neither a real "
                "distribution nor the _pbcompat bundled runtime is available"
            )
        src = events_stream_ordered(spark, sf_dir).select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        )
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, RUN_ROCKSDB)
        try:
            out = run_to_memory(
                pattern_match_tws(src), "q350_out", output_mode="update"
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        final = out.groupBy("user_id").agg(F.max("matches").alias("m"))
        return final.groupBy(F.col("m").cast("int").alias("n_matches")).agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("m").cast("bigint").alias("total_matches"),
        )


_register_q350()


@query(
    "q367_stream_stream_right_outer",
    oracle="""
    WITH cut AS (
      SELECT least(max(ts) FILTER (WHERE event_type='purchase'),
                   max(ts) FILTER (WHERE event_type='click')) AS cut
      FROM events),
    c AS (SELECT user_id AS c_user, event_id AS c_id, ts AS c_ts
      FROM events, cut
      WHERE event_type = 'click' AND ts < cut - INTERVAL 95 MINUTES),
    p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase')
    SELECT c.c_user AS user_id, c.c_id,
           cast(count(p.p_id) as bigint) AS n_purchases_fwd30m,
           count(p.p_id) = 0 AS unconverted
    FROM c LEFT JOIN p ON c.c_user = p.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTES AND c.c_ts <= p.p_ts
    GROUP BY c.c_user, c.c_id
    """,
    tags=("streaming", "join", "outer"),
)
def q367_stream_stream_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream RIGHT OUTER join — the last cell of the streaming
    join-mode matrix (inner q123, left q196, full q250, left-semi
    q358): here the NULL-PADDED side is the probe stream — a click
    with NO purchase in its 30-minute forward window emits with nulls
    once both watermarks pass its horizon, i.e. the
    every-click-conversion-labeled feed (the training-label join for a
    conversion model, where unconverted clicks are the negatives and
    MUST emit). Same join bound as q196 with the outer side flipped,
    so the state-finality condition is the mirror image: a click's
    outer decision finalizes when the PURCHASE watermark passes
    c_ts + 30 min. Ordered event-time replay; the oracle is the batch
    right join (written as the swapped left join) restricted to clicks
    whose outer decision is final at stream end — cut − (30 min bound
    + 60 min watermark + 5 min slack), q196's cutoff protocol."""
    prep(spark)
    from ..streaming.jobs import events_stream_ordered, run_to_memory

    s = events_stream_ordered(spark, sf_dir)
    p = (
        s.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "rightOuter",
    )
    out = run_to_memory(
        j.select("c_user", "c_id", "c_ts", "p_id"), "q367_out", output_mode="append"
    )
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
        ).alias("cut")
    )
    return (
        out.join(F.broadcast(cut), F.lit(True))
        .filter(F.col("c_ts") < F.col("cut") - F.expr("INTERVAL 95 MINUTES"))
        .groupBy(F.col("c_user").alias("user_id"), "c_id")
        .agg(
            F.count("p_id").alias("n_purchases_fwd30m"),
            F.max(F.col("p_id").isNull()).alias("unconverted"),
        )
    )


_SH3Q = (
    "list_distinct(list_transform(range(1, len({t}) - 1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]))"
)
_TOKSQ = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')"
_FPQ = f"md5(array_to_string(list_sort({_SH3Q.format(t=_TOKSQ)}), chr(31)))"

# q392 golden-input cache: sf_dir -> dir holding the immutable arrival
# files + generation-0 corpus index (each run file-copies a fresh
# mutable state from it — the replay appends survivors per batch)
_Q392_GOLDEN: dict[str, str] = {}


@query(
    "q392_stream_incremental_dedup",
    oracle=f"""
    WITH cfp AS (
      SELECT DISTINCT {_FPQ} AS fp FROM documents
      WHERE doc_id % 4 = 3 AND len({_TOKSQ}) >= 3
    ), b0 AS (
      SELECT doc_id, {_FPQ} AS fp FROM documents
      WHERE doc_id % 4 = 0 AND len({_TOKSQ}) >= 3
    ), b1 AS (
      SELECT doc_id, {_FPQ} AS fp FROM documents
      WHERE doc_id % 4 = 1 AND len({_TOKSQ}) >= 3
    ), b2 AS (
      SELECT doc_id, {_FPQ} AS fp FROM documents
      WHERE doc_id % 4 = 2 AND len({_TOKSQ}) >= 3
    ), s0 AS (SELECT fp FROM cfp),
    s1 AS (SELECT fp FROM s0 UNION SELECT DISTINCT fp FROM b0),
    s2 AS (SELECT fp FROM s1 UNION SELECT DISTINCT fp FROM b1),
    r AS (
      SELECT 0 AS batch_idx, count(*) AS n_batch, count(s.fp) AS n_dup
      FROM b0 b LEFT JOIN s0 s ON b.fp = s.fp
      UNION ALL
      SELECT 1, count(*), count(s.fp) FROM b1 b LEFT JOIN s1 s ON b.fp = s.fp
      UNION ALL
      SELECT 2, count(*), count(s.fp) FROM b2 b LEFT JOIN s2 s ON b.fp = s.fp
    )
    SELECT cast(batch_idx as bigint) AS batch_idx,
           cast(n_batch as bigint) AS n_batch,
           cast(n_dup as bigint) AS n_dup,
           cast(n_batch - n_dup as bigint) AS n_new
    FROM r
    """,
    tags=("streaming", "dedup", "incremental", "state"),
)
def q392_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental near-dup dedup over EVOLVING state — the
    q388 index driven by Structured Streaming's foreachBatch: documents
    arrive as three ordered micro-batches (doc_id % 4 = 0, 1, 2 — one
    parquet file each, mtime-ordered, maxFilesPerTrigger=1), and each
    batch (a) probes the persisted minhash band-bucket index, (b)
    records its (n_batch, n_dup, n_new), and (c) APPENDS its survivors'
    index rows — so batch 1 dedups against the corpus AND batch 0's
    survivors, the semantics the reference's watermark increment (R16)
    has for page counts, here for near-dup content.

    Hash-verifiability of a STATEFUL STREAMING job: appending survivors
    makes the visible fingerprint set after batch b equal
    corpus ∪ fps(B_0..b) exactly (a dup's fingerprint is already
    present, so appending only survivors loses nothing), and banded
    minhash has no false negatives for set-identical docs — so each
    batch's counts equal the oracle's layered-union LEFT JOINs, and
    the driver value-hashes a foreachBatch pipeline end-to-end (the
    evolving-state complement of q343's two-phase-commit sink).

    100 TB story: per micro-batch cost is the q388 probe (batch
    buckets broadcast against the index, zero corpus shuffle) plus a
    batch-sized append; state grows by survivors only. The batch
    boundary is data-defined (one file per arrival), so re-running the
    replay reproduces byte-identical counts."""
    import os
    import tempfile
    import shutil
    import time as _time

    prep(spark)
    from ..operators.dedup import build_minhash_index, probe_minhash_rows

    d = table(spark, sf_dir, "documents")

    # The replay MUTATES its state dir (each batch appends survivors),
    # so every run needs a fresh copy — but the GOLDEN inputs (the
    # three arrival files and the generation-0 corpus index) are
    # deterministic per sf_dir: build them once, file-copy per run.
    # This is exactly the production posture (a replay test starts
    # from an immutable snapshot), and it keeps the benched cost the
    # STREAM — probe + append per micro-batch — not index re-derivation.
    golden = _Q392_GOLDEN.get(sf_dir)
    if golden is None or not os.path.isdir(golden):
        golden = tempfile.mkdtemp(prefix="mcetl_q392_golden_")
        gsrc = os.path.join(golden, "arrivals")
        os.makedirs(gsrc)
        for b in range(3):
            sub = os.path.join(gsrc, f"b={b}")
            d.filter(F.col("doc_id") % 4 == b).select("doc_id", "text").coalesce(
                1
            ).write.parquet(sub)
        corpus = d.filter(F.col("doc_id") % 4 == 3).select("doc_id", "text")
        build_minhash_index(corpus).repartition("band").write.partitionBy(
            "band"
        ).parquet(os.path.join(golden, "minhash_index"))
        _Q392_GOLDEN[sf_dir] = golden

    base = tempfile.mkdtemp(prefix="mcetl_q392_")
    src = os.path.join(base, "arrivals")
    state_dir = os.path.join(base, "minhash_index")
    shutil.copytree(os.path.join(golden, "arrivals"), src)
    shutil.copytree(os.path.join(golden, "minhash_index"), state_dir)
    # mtime order defines the batch boundaries (one file per arrival)
    now = _time.time()
    for b in range(3):
        sub = os.path.join(src, f"b={b}")
        for name in os.listdir(sub):
            if name.endswith(".parquet"):
                os.utime(os.path.join(sub, name), (now + b, now + b))

    # keyed by batch_id so an at-least-once foreachBatch redelivery
    # overwrites rather than duplicates a count row. (A redelivery
    # AFTER the append below would additionally see the batch's own
    # survivors in the index — full exactly-once state maintenance
    # needs q343's batchId-manifest two-phase commit; this query's
    # bounded deterministic replay never retries, and the oracle would
    # catch it if it did.)
    results: dict[int, tuple[int, int]] = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # ONE minhash/shingle pass per micro-batch: build the batch's
        # index rows once, probe the state from them, and append the
        # SURVIVOR SUBSET of the same rows — probing the text and then
        # re-fingerprinting the survivors ran the (dominant) signature
        # compute twice per batch. spread=False: the hot-loop opt-out —
        # a micro-batch is one tiny arrival file, and the operator's
        # conditional spread would repartition its text rows per batch
        # (a per-batch exchange) for a batch-sized build.
        rows = build_minhash_index(
            batch_df.select("doc_id", "text"), spread=False
        ).localCheckpoint(eager=True)
        # explicit schema — the state layout is fixed by
        # build_minhash_index; skips per-batch footer inference
        index = spark.read.schema(
            "id bigint, band int, bucket bigint, set_fp string"
        ).parquet(state_dir)
        res = probe_minhash_rows(rows, index).localCheckpoint(eager=True)
        row = res.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_dup").cast("bigint")).alias("d"),
        ).first()
        results[int(batch_id)] = (int(row.n or 0), int(row.d or 0))
        surv_rows = rows.join(
            res.filter(~F.col("is_dup")).select("id"), "id"
        )
        surv_rows.repartition("band").write.mode("append").partitionBy(
            "band"
        ).parquet(state_dir)

    schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return spark.createDataFrame(
        [(b, n, dup, n - dup) for b, (n, dup) in sorted(results.items())],
        "batch_idx bigint, n_batch bigint, n_dup bigint, n_new bigint",
    )


# q437 golden-input cache: sf_dir -> (dir holding the immutable arrival
# files + generation-0 semantic index, trained IVF codebook)
_Q437_GOLDEN: dict[str, tuple] = {}


@query(
    "q437_stream_semantic_dedup",
    oracle="""
    WITH b0 AS (
      SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 4 = 0
      UNION ALL
      SELECT -vec_id, embedding FROM embeddings
      WHERE vec_id % 4 = 3 AND vec_id % 5 = 1
    ), b1 AS (
      SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 4 = 1
      UNION ALL
      SELECT -vec_id, embedding FROM embeddings
      WHERE vec_id % 4 = 0 AND vec_id % 5 = 1
    ), b2 AS (
      SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 4 = 2
      UNION ALL
      SELECT -vec_id, embedding FROM embeddings
      WHERE vec_id % 4 = 1 AND vec_id % 5 = 1
    ), s0 AS (
      SELECT DISTINCT embedding FROM embeddings WHERE vec_id % 4 = 3
    ), s1 AS (
      SELECT embedding FROM s0 UNION SELECT DISTINCT embedding FROM b0
    ), s2 AS (
      SELECT embedding FROM s1 UNION SELECT DISTINCT embedding FROM b1
    ), r AS (
      SELECT 0 AS batch_idx, count(*) AS n_batch, count(s.embedding) AS n_dup
      FROM b0 b LEFT JOIN s0 s ON b.embedding = s.embedding
      UNION ALL
      SELECT 1, count(*), count(s.embedding)
      FROM b1 b LEFT JOIN s1 s ON b.embedding = s.embedding
      UNION ALL
      SELECT 2, count(*), count(s.embedding)
      FROM b2 b LEFT JOIN s2 s ON b.embedding = s.embedding
    )
    SELECT cast(batch_idx as bigint) AS batch_idx,
           cast(n_batch as bigint) AS n_batch,
           cast(n_dup as bigint) AS n_dup,
           cast(n_batch - n_dup as bigint) AS n_new
    FROM r
    """,
    tags=("streaming", "dedup", "semantic", "incremental", "state"),
)
def q437_stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental SEMANTIC dedup over EVOLVING state — the
    q392 foreachBatch protocol transposed from the minhash index to
    the VECTOR index (q389's IVF-cell state): embedding batches arrive
    as three ordered micro-batches (one parquet file each,
    mtime-ordered, maxFilesPerTrigger=1), and each batch (a) probes
    the persisted cell-partitioned semantic index
    (operators/semantic_dedup.py::probe_semantic_index), (b) records
    its (n_batch, n_dup, n_new), and (c) APPENDS its survivors' index
    rows — so batch 1 dedups against the corpus AND batch 0's
    survivors. Each batch plants re-ingests of the PREVIOUS tier under
    negated ids (batch 0 re-crawls corpus vectors, batch 1 re-crawls
    batch-0 vectors, …), so every layer of the evolving state is
    actually exercised: a batch-1 re-ingest is a dup ONLY because
    batch 0's survivors were appended.

    Hash-verifiability mirrors q392: appending survivors makes the
    visible fingerprint set after batch b equal corpus ∪ embs(B_0..b)
    exactly, and the IVF probe has NO false negatives for element-wise
    identical vectors (same codebook → same probed cells, verified
    against the stored exact fingerprint), so each batch's counts
    equal the oracle's layered-union equality joins. This closes the
    VERDICT r9/r10 gap: the evolving-state streaming posture was
    proven for the minhash index only; this proves it for the vector
    index with the identical layered-union oracle protocol.

    100 TB story: per micro-batch cost is the q389 probe (batch cells
    broadcast against the cell-partitioned index, zero index shuffle)
    plus a survivors-sized append; the codebook is trained ONCE on the
    corpus and shared by every batch, exactly like the ANN path's
    offline codebook. Batch boundaries are data-defined (one file per
    arrival), so the replay is deterministic end-to-end."""
    import os
    import shutil
    import tempfile
    import time as _time

    prep(spark)
    from ..operators.semantic_dedup import (
        build_semantic_index,
        probe_semantic_rows,
    )
    from ..operators.similarity import train_ivf_codebook

    e = table(spark, sf_dir, "embeddings")

    golden = _Q437_GOLDEN.get(sf_dir)
    if golden is None or not os.path.isdir(golden[0]):
        gdir = tempfile.mkdtemp(prefix="mcetl_q437_golden_")
        gsrc = os.path.join(gdir, "arrivals")
        os.makedirs(gsrc)
        for b in range(3):
            fresh = e.filter(F.col("vec_id") % 4 == b).select("vec_id", "embedding")
            prev = 3 if b == 0 else b - 1  # tier whose vectors this batch re-crawls
            reingest = (
                e.filter((F.col("vec_id") % 4 == prev) & (F.col("vec_id") % 5 == 1))
                .select((-F.col("vec_id")).alias("vec_id"), "embedding")
            )
            fresh.unionByName(reingest).coalesce(1).write.parquet(
                os.path.join(gsrc, f"b={b}")
            )
        corpus = e.filter(F.col("vec_id") % 4 == 3).select("vec_id", "embedding")
        # the codebook rides the in-process golden tuple; a fresh
        # process rebuilds the whole golden dir (training is
        # deterministic), so persisting it would be dead weight
        codebook = train_ivf_codebook(corpus, n_cells=16, refine_iters=1)
        build_semantic_index(corpus, codebook).repartition("cell").write.partitionBy(
            "cell"
        ).parquet(os.path.join(gdir, "semantic_index"))
        golden = (gdir, codebook)
        _Q437_GOLDEN[sf_dir] = golden
    gdir, codebook = golden

    base = tempfile.mkdtemp(prefix="mcetl_q437_")
    src = os.path.join(base, "arrivals")
    state_dir = os.path.join(base, "semantic_index")
    shutil.copytree(os.path.join(gdir, "arrivals"), src)
    shutil.copytree(os.path.join(gdir, "semantic_index"), state_dir)
    now = _time.time()
    for b in range(3):
        sub = os.path.join(src, f"b={b}")
        for name in os.listdir(sub):
            if name.endswith(".parquet"):
                os.utime(os.path.join(sub, name), (now + b, now + b))

    results: dict[int, tuple[int, int]] = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # ONE Arrow matmul + fingerprint pass per micro-batch: build
        # the batch's index rows once, probe the state FROM them, and
        # append the SURVIVOR SUBSET of the same rows — probing the
        # vectors and then re-deriving the survivors' cells ran the
        # (dominant) cell-scoring matmul twice per batch (the q392
        # probe_minhash_rows pattern, r13)
        rows = build_semantic_index(
            batch_df.select("vec_id", "embedding"), codebook
        ).localCheckpoint(eager=True)
        # explicit schema — the state layout is fixed by
        # build_semantic_index; skips per-batch footer inference
        index = spark.read.schema(
            "id bigint, cell int, vec_fp string"
        ).parquet(state_dir)
        res = probe_semantic_rows(rows, index).localCheckpoint(eager=True)
        row = res.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_dup").cast("bigint")).alias("d"),
        ).first()
        results[int(batch_id)] = (int(row.n or 0), int(row.d or 0))
        surv_rows = rows.join(res.filter(~F.col("is_dup")).select("id"), "id")
        surv_rows.repartition("cell").write.mode("append").partitionBy(
            "cell"
        ).parquet(state_dir)

    schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return spark.createDataFrame(
        [(b, n, dup, n - dup) for b, (n, dup) in sorted(results.items())],
        "batch_idx bigint, n_batch bigint, n_dup bigint, n_new bigint",
    )


# q443 golden-input cache: sf_dir -> dir holding the immutable arrival
# files + generation-0 corpus postings index
_Q443_GOLDEN: dict[str, str] = {}


def _q443_oracle() -> str:
    """Layered from-scratch BM25 per batch boundary: after batch b the
    live corpus is doc_id % 4 = 3 plus batches 0..b, and the
    maintained index must serve EXACTLY what a fresh q390-style
    derivation over that corpus returns — df and doc stats refolded
    from the postings (n_docs counted over docs WITH tokens, matching
    the Spark side's refold-from-postings semantics)."""
    from .text_queries import _Q390_QUERY_TERMS

    qt_vals = ", ".join(f"({q}, '{t}')" for q, t in _Q390_QUERY_TERMS)
    layers = []
    for b in range(3):
        layers.append(f"""
    lv{b} AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 4 = 3 OR doc_id % 4 <= {b}
    ), tk{b} AS (
      SELECT doc_id, unnest({_TOKSQ}) AS t FROM lv{b}
    ), dl{b} AS (
      SELECT doc_id, count(*) AS len FROM tk{b} GROUP BY doc_id
    ), st{b} AS (
      SELECT (SELECT count(*) FROM dl{b}) AS n_docs,
             (SELECT sum(len) FROM dl{b}) AS total_len
    ), tf{b} AS (
      SELECT doc_id, t, count(*) AS tf FROM tk{b}
      WHERE t IN (SELECT t FROM qt) GROUP BY doc_id, t
    ), idf{b} AS (
      SELECT t, count(DISTINCT doc_id) AS df FROM tf{b} GROUP BY t
    ), sc{b} AS (
      SELECT qt.query_id, tf.doc_id,
             ln(1 + (s.n_docs - i.df + 0.5) / (i.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * d.len
                                 / (s.total_len / cast(s.n_docs as double))))
               AS term_score
      FROM qt JOIN tf{b} tf ON tf.t = qt.t
              JOIN idf{b} i ON i.t = qt.t
              JOIN dl{b} d ON tf.doc_id = d.doc_id
              CROSS JOIN st{b} s
    ), ag{b} AS (
      SELECT query_id, doc_id,
             list_reduce(list_sort(list(term_score)), (x, y) -> x + y) AS bm25,
             count(*) AS n_terms_hit
      FROM sc{b} GROUP BY query_id, doc_id
    ), rk{b} AS (
      SELECT {b} AS batch_idx, query_id, doc_id, bm25, n_terms_hit,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rank
      FROM ag{b}
    )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM rk{b} WHERE rank <= 3" for b in range(3)
    )
    return (
        f"""
    WITH qt AS (SELECT * FROM (VALUES {qt_vals}) v(query_id, t)),"""
        + ",".join(layers)
        + f"""
    SELECT cast(batch_idx as bigint) AS batch_idx, query_id,
           cast(rank as bigint) AS rank, doc_id,
           round(bm25, 6) AS bm25,
           cast(n_terms_hit as bigint) AS n_terms_hit
    FROM ({union})"""
    )


@query(
    "q443_stream_bm25_maintenance",
    oracle=_q443_oracle(),
    tags=("streaming", "text", "search", "incremental", "state"),
)
def q443_stream_bm25_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING BM25 index maintenance — the retrieval tier's entry in
    the state-posture matrix, which this query COMPLETES: {minhash,
    vector, BM25-postings} × {incremental batch, foreachBatch stream}
    are now all evidenced (q388/q389/q390 batch; q392/q437/THIS
    stream). Document micro-batches arrive mtime-ordered (one parquet
    file each); each batch (a) APPENDS its postings rows to the
    persisted index (R16's incremental posture — corpus text is never
    re-tokenized), (b) REFOLDS df and doc-stats from the postings
    (they are functionals of the postings table — the
    compact_bm25_index identity — so the refold is exact where merging
    stale per-generation snapshots would drift), and (c) SERVES the
    fixed query battery (q390's four queries, incl. the zero-postings
    term) against the maintained index, emitting the per-query top-3
    with batch_idx.

    Hash-verifiability: after batch b the postings table equals a
    from-scratch build over corpus ∪ batches 0..b exactly (postings
    are per-(doc, term) rows; appends of disjoint doc sets compose),
    and scoring is q390's bitwise float protocol — so each layer's
    served ranking value-matches the oracle's fresh derivation over
    the same live set. A served score CHANGES across layers for an
    unchanged doc (df and avg-length move as the corpus grows) — the
    oracle's per-layer stats pin exactly that drift, which is what
    distinguishes real maintenance from a frozen-stats cache.

    100 TB story: per micro-batch cost is tokenizing THE BATCH (one
    narrow pass), a batch-sized postings append, a df/stats refold
    (one keyed agg over the postings — at scale, maintained
    incrementally as signed deltas, q429's move), and a serve bounded
    by postings hits. Periodic q396 compaction restores the term-
    sorted row-group layout the appends erode; none of this re-reads
    the corpus text."""
    import os
    import shutil
    import tempfile
    import time as _time

    prep(spark)
    from ..operators.retrieval import bm25_serve, build_bm25_index
    from .text_queries import _Q390_QUERY_TERMS

    d = table(spark, sf_dir, "documents")

    golden = _Q443_GOLDEN.get(sf_dir)
    if golden is None or not os.path.isdir(golden):
        golden = tempfile.mkdtemp(prefix="mcetl_q443_golden_")
        gsrc = os.path.join(golden, "arrivals")
        os.makedirs(gsrc)
        for b in range(3):
            d.filter(F.col("doc_id") % 4 == b).select("doc_id", "text").coalesce(
                1
            ).write.parquet(os.path.join(gsrc, f"b={b}"))
        corpus = d.filter(F.col("doc_id") % 4 == 3).select("doc_id", "text")
        # postings ONLY: the query refolds df/stats from the postings
        # every batch (they are functionals), so persisting them would
        # be dead weight copied into every timed run. Same term-sorted
        # shard layout write_bm25_index produces.
        gen0, _, _ = build_bm25_index(corpus)
        (
            gen0.repartition(8, "t")
            .sortWithinPartitions("t", "doc_id")
            .write.parquet(os.path.join(golden, "bm25", "postings"))
        )
        _Q443_GOLDEN[sf_dir] = golden

    base = tempfile.mkdtemp(prefix="mcetl_q443_")
    src = os.path.join(base, "arrivals")
    state = os.path.join(base, "bm25")
    shutil.copytree(os.path.join(golden, "arrivals"), src)
    shutil.copytree(os.path.join(golden, "bm25"), state)
    now = _time.time()
    for b in range(3):
        sub = os.path.join(src, f"b={b}")
        for name in os.listdir(sub):
            if name.endswith(".parquet"):
                os.utime(os.path.join(sub, name), (now + b, now + b))

    qt = spark.createDataFrame(
        list(_Q390_QUERY_TERMS), "query_id int, t string"
    )
    terms = sorted({t for _, t in _Q390_QUERY_TERMS})
    results: list[tuple] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # (a) append the batch's postings — one tokenize of the batch,
        # never of the corpus
        new_postings, _, _ = build_bm25_index(
            batch_df.select("doc_id", "text")
        )
        new_postings.write.mode("append").parquet(state + "/postings")
        # (b) refold df/stats from the postings (functionals — exact).
        # df is refolded for the QUERY TERMS only: the serve joins df
        # onto query-term hits, so non-battery terms never surface —
        # the term IN-filter prunes row groups of the term-sorted
        # layout instead of aggregating the whole postings table per
        # batch (identical served scores). Explicit schema: the state
        # layout is fixed by build_bm25_index, so the per-batch footer
        # read schema inference would pay is skipped (3× per replay).
        postings = spark.read.schema(
            "t string, doc_id bigint, tf bigint, len bigint"
        ).parquet(state + "/postings")
        dfreq = (
            postings.filter(F.col("t").isin(*terms))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        dl = postings.select("doc_id", "len").distinct()
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("total_len"),
        )
        # (c) serve the battery against the maintained index
        served = bm25_serve(qt, postings, dfreq, stats, top_k=3, terms=terms)
        for r in served.collect():
            results.append(
                (
                    int(batch_id),
                    r["query_id"],
                    int(r["rank"]),
                    r["doc_id"],
                    float(r["bm25"]),
                    int(r["n_terms_hit"]),
                )
            )

    schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.createDataFrame(
        sorted(results),
        "batch_idx bigint, query_id int, rank bigint, doc_id bigint, "
        "bm25 double, n_terms_hit bigint",
    )
    return out.select(
        "batch_idx",
        "query_id",
        "rank",
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        "n_terms_hit",
    )


# q403 state cache: sf_dir -> parquet dir of the per-user session state
_Q403_STATE: dict[str, str] = {}


@query(
    "q403_incremental_session_state",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id,
           cast(count(DISTINCT session_id) as bigint) AS n_sessions,
           count(*) AS n_events
    FROM s GROUP BY user_id
    """,
    tags=("streaming", "session", "incremental", "state"),
)
def q403_incremental_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SESSIONIZATION — sessions spanning batch boundaries,
    the order-dependent state merge the rest of the state family
    (q388–q402) doesn't cover: gap sessionization is
    prefix-decomposable (sessions(A ++ B) = sessions(A) + sessions(B)
    − bridge, where the bridge depends only on A's last and B's first
    event time), so a constant-width per-user state row
    ``(n_sessions, n_events, last_ts)`` is sufficient to continue
    sessionizing forever. History (events before Jan 16) folds into
    the persisted state ONCE; the arriving batch sessionizes
    internally (user-keyed window over batch rows only) and ONE
    user-keyed full-outer join settles every boundary: bridge when
    the cross-batch gap is under 30 min, new session otherwise —
    exact-gap boundaries open a session, matching streaming
    session_window's [start, last+gap) interval (q56/q59's protocol).

    The oracle recomputes per-user session counts over ALL events with
    q56's lag+cumsum SQL, so the driver hash-checks the decomposition:
    state-fold ∘ batch-merge ≡ global sessionization, per user. The
    boundary-µs protocol rides the divergence ledger: integer
    microsecond differencing, never date_diff('second') (the q213
    lesson).

    100 TB story: the daily cost is one window over the BATCH and one
    user-keyed join of two user-sized frames — history events are read
    ZERO times (plan-pinned single events scan) and the state is one
    constant-width row per user (the batch analogue of
    applyInPandasWithState's per-key state, but oracle-checkable).
    Non-decomposable session metrics (median length) take the q402
    counts posture instead."""
    import os
    import tempfile

    prep(spark)
    from ..operators.sessionize import merge_session_state, session_state

    e = table(spark, sf_dir, "events").select("user_id", "ts")

    state_dir = _Q403_STATE.get(sf_dir)
    if state_dir is None or not os.path.isdir(state_dir):
        state_dir = tempfile.mkdtemp(prefix="mcetl_q403_") + "/session_state"
        session_state(e.filter(F.col("ts") < "2024-01-16")).write.mode(
            "overwrite"
        ).parquet(state_dir)
        _Q403_STATE[sf_dir] = state_dir
    state = spark.read.parquet(state_dir)

    batch = e.filter(F.col("ts") >= "2024-01-16")
    merged = merge_session_state(state, batch)
    return merged.select("user_id", "n_sessions", "n_events")
