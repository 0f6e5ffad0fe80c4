"""Structured Streaming: the windowed aggs run as REAL streaming queries
(file source -> watermark -> memory sink) and agree with their batch
twins — the batch-first contract of streaming/windows.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_etl_studio_spark.streaming.windows import (
    run_stream_dedup,
    run_stream_tumbling,
    tumbling_agg,
)
from ai_etl_studio_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_stream_tumbling_matches_batch(spark):
    streamed = run_stream_tumbling(spark, SF_DIR, "t_tumbling")
    batch = tumbling_agg(load_table(spark, SF_DIR, "events"))
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b
    assert len(s) > 0


def test_stream_dedup_matches_batch_twin(spark):
    streamed = run_stream_dedup(spark, SF_DIR, "t_dedup")
    batch_distinct = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", F.date_trunc("minute", "ts").alias("minute"))
        .distinct()
    )
    # streamed keeps one arbitrary event per key; compare key sets
    s = sorted(map(tuple, streamed.select("user_id", "event_type", "minute").collect()))
    b = sorted(map(tuple, batch_distinct.collect()))
    assert s == b


def test_streaming_plan_is_incremental(spark):
    """The streaming DataFrame really is a streaming plan (not a batch
    re-read): isStreaming flag + watermark node present."""
    from ai_etl_studio_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, SF_DIR).withWatermark("ts", "10 minutes")
    assert stream.isStreaming
    agg = tumbling_agg(stream)
    assert agg.isStreaming
