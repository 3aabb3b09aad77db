"""Batch-equivalence pins for the streaming surface (SURVEY.md §5.5):
a streamed aggregation must equal the same aggregation computed in
batch over the identical data."""

from __future__ import annotations

import pyspark.sql.functions as F

from marketingcloud_etl_spark.io import table
from marketingcloud_etl_spark.plans.catalog import load_all

REGISTRY = load_all()


def test_stream_tumbling_equals_batch(spark, sf_dir):
    streamed = REGISTRY["q58_stream_tumbling"].fn(spark, sf_dir)
    batch = REGISTRY["q57_batch_tumbling"].fn(spark, sf_dir)
    s = {(r.hour_start, r.event_type): (r.n, round(r.total_value, 2)) for r in streamed.collect()}
    b = {(r.hour_start, r.event_type): (r.n, round(r.total_value, 2)) for r in batch.collect()}
    assert s == b


def test_stream_sessions_equal_batch_sessionization(spark, sf_dir):
    streamed = REGISTRY["q59_stream_session_window"].fn(spark, sf_dir)
    batch = REGISTRY["q56_sessionization"].fn(spark, sf_dir)
    s = {(r.user_id): (r.n_sessions, r.n_events) for r in streamed.collect()}
    b = {(r.user_id): (r.n_sessions, r.n_events) for r in batch.collect()}
    assert s == b


def test_stream_dedup_bounded_and_complete(spark, sf_dir):
    out = REGISTRY["q61_stream_dedup"].fn(spark, sf_dir)
    got = {r.event_type: r.n_keys for r in out.collect()}
    # with an effectively-infinite watermark every (user,type) key
    # appears exactly once
    e = table(spark, sf_dir, "events")
    want = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_static_join(spark, sf_dir):
    from marketingcloud_etl_spark.streaming.jobs import (
        events_stream,
        run_to_memory,
        stream_static_join,
    )

    e = events_stream(spark, sf_dir)
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream_static_join(e, c, "user_id").groupBy("c_mktsegment").count()
    got = {r.c_mktsegment: r["count"] for r in run_to_memory(joined, "t_ssj").collect()}
    batch = (
        table(spark, sf_dir, "events")
        .join(c, "user_id")
        .groupBy("c_mktsegment")
        .count()
    )
    want = {r.c_mktsegment: r["count"] for r in batch.collect()}
    assert got == want