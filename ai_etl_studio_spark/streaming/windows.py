"""Event-time windowed aggregations — batch twins + streaming wiring.

Batch-first design: ``tumbling_agg`` / ``sliding_agg`` / ``hopping
dedup`` are plain DataFrame transforms usable on either a batch or a
streaming input; the ``queries()`` entries run them batch (exact DuckDB
oracles via epoch arithmetic), and ``run_stream_*`` wires the identical
transform through readStream → memory sink.

Spark's F.window() buckets are epoch-aligned (UTC), which is what the
oracle reproduces with floor(epoch/width)*width.

Scale: streaming state is keyed by (window, key); the watermark bounds
state size — without it, state grows unboundedly at 100 TB/day event
rates. Watermarked dedup (dropDuplicatesWithinWatermark) is the
streaming twin of dedup_exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.functions.exact import cents
from ai_etl_studio_spark.operators import register

#: File-source schema: ts arrives as nanos-since-epoch long (see
#: catalog.load_table) and is converted to a µs timestamp after read.
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """10-minute tumbling window counts/sums per event_type (works on
    batch and streaming inputs alike)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_tumbling",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg, batch twin (F.window == epoch-aligned
    10-minute buckets)."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_agg(e).orderBy("window_start", "event_type")


def sliding_agg(events: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2 windows."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@register(
    "window_sliding",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor((epoch(ts) - off) / 600) AS BIGINT) * 600 + off) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 300]) AS off) offsets
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window agg, batch twin. Oracle replays Spark's semantics:
    a (width=600s, slide=300s) window assigns each event to the two
    epoch-aligned window starts offset by 0s and 300s."""
    e = load_table(spark, sf_dir, "events")
    return sliding_agg(e).orderBy("window_start", "event_type")


@register(
    "stream_dedup_batch_twin",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_distinct_minutes
    FROM (
      SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS minute
      FROM events
    ) d
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of watermarked streaming dedup: one event per
    (user, type, minute) — dropDuplicates on the truncated event-time key
    (streaming: withWatermark + dropDuplicatesWithinWatermark, exercised
    in tests/test_streaming.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_type", F.date_trunc("minute", "ts").alias("minute"))
        .dropDuplicates(["user_id", "event_type", "minute"])
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct_minutes"))
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Streaming wiring (driven by tests; not part of the oracle surface)
# ---------------------------------------------------------------------------


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (1 file = 1 microbatch
    in availableNow mode)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        # FileStreamSource needs a directory; the glob selects just events
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def run_stream_tumbling(
    spark: SparkSession, sf_dir: str, query_name: str = "tumbling_out"
) -> DataFrame:
    """Run the tumbling agg as a real streaming query (watermarked,
    memory sink, drained synchronously) and return the sink table."""
    stream = read_event_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = tumbling_agg(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_dedup(
    spark: SparkSession, sf_dir: str, query_name: str = "dedup_out"
) -> DataFrame:
    """Watermarked streaming dedup (dropDuplicatesWithinWatermark)."""
    stream = read_event_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = stream.select(
        "user_id", "event_type", F.date_trunc("minute", "ts").alias("minute"), "ts"
    ).dropDuplicatesWithinWatermark(["user_id", "event_type", "minute"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
