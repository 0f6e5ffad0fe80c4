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

from ai_etl_studio_spark.catalog import epoch_long_to_ts, load_table
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
    # The file-stream source with an explicit bigint schema surfaces ts in
    # MICROseconds (the batch legacy-conf path surfaces nanos) — the shared
    # magnitude-aware helper normalizes both (fixes the r1 double-DIV bug).
    return raw.withColumn("ts", epoch_long_to_ts("ts"))


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


@register(
    "session_window_native",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS session_value
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (30-min gap), batch twin.
    The oracle replays its semantics with the lag/cumsum pattern:
    session_end = last event + gap, matching F.session_window's window.end.

    Scale: in streaming mode this op keeps per-key session state merged
    incrementally and emits on watermark expiry — the managed-state
    version of the sessionize window pattern (analytics.sessionize).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "time_rollup_multigrain",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0 THEN date_trunc('hour', ts) END AS hour,
           CASE WHEN GROUPING(date_trunc('minute', ts)) = 0 THEN date_trunc('minute', ts) END AS minute,
           GROUPING(date_trunc('day', ts)) * 4 + GROUPING(date_trunc('hour', ts)) * 2
             + GROUPING(date_trunc('minute', ts)) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts), date_trunc('minute', ts))
    ORDER BY gid, day NULLS FIRST, hour NULLS FIRST, minute NULLS FIRST
    """,
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: ONE pass produces
    minute-, hour-, and day-grain aggregates (+ grand total) via
    GROUP BY ROLLUP over truncated timestamps — the batch equivalent of
    a timeseries DB's multi-resolution materialized rollup.

    Scale: rollup expands AFTER partial aggregation, so the shuffle is
    (#minute-groups × 4 levels), not (#events × 4). At 100 TB/day this
    is the difference between a rollup and four scans.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    minute = F.date_trunc("minute", "ts")
    return (
        e.select(
            day.alias("day"), hour.alias("hour"), minute.alias("minute"), "value"
        )
        .rollup("day", "hour", "minute")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100).alias("total_value"),
        )
        .select("day", "hour", "minute", "gid", "n_events", "total_value")
        .orderBy(
            "gid",
            F.asc_nulls_first("day"),
            F.asc_nulls_first("hour"),
            F.asc_nulls_first("minute"),
        )
    )


def run_stream_stateful_counter(
    spark: SparkSession, sf_dir: str, query_name: str = "stateful_out"
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running (event count, cents total) maintained in managed
    state across microbatches, emitted in update mode.

    This is the extension seam for operators Spark's built-ins can't
    express (per-key online models, CDC reconciliation, custom
    sessionization). State is (bigint, bigint) per key — watermark-less
    here because the key space is bounded; production keys get a
    timeout (GroupStateTimeout.EventTimeTimeout) to bound state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = read_event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        n, cents_total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents_total += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, cents_total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents_total / 100.0]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id bigint, n_events bigint, total_value double",
        "n bigint, cents bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join + tumbling rollup per segment.

    Works identically on batch and streaming ``events``: Spark re-plans
    the static side per microbatch — the standard streaming-dimension
    pattern (no state, unlike stream-stream joins). No broadcast hint:
    customer is SF-linear, so the planner broadcasts the 2-column dim
    projection while it fits and falls back to a per-microbatch shuffle
    join beyond — forcing it would OOM at the 100 TB design point."""
    return (
        events.join(
            customers.select("c_custkey", "c_mktsegment"),
            events.user_id == F.col("c_custkey"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_static_join_batch_twin",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
             AS window_start,
           c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY window_start, c_mktsegment
    ORDER BY window_start, c_mktsegment
    """,
)
def stream_static_join_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join (events ⋈
    customer dim → hourly per-segment rollup).

    Scale: the dim side broadcasts (no shuffle of the 100 TB fact/event
    stream); in streaming mode the broadcast refreshes per microbatch so
    dim updates are picked up without restarts."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return enrich_with_customers(e, c).orderBy("window_start", "c_mktsegment")


def run_stream_static_join(
    spark: SparkSession, sf_dir: str, query_name: str = "enrich_out"
) -> DataFrame:
    """Run the enrichment join as a real streaming query (memory sink,
    drained synchronously) and return the sink table."""
    stream = read_event_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    c = load_table(spark, sf_dir, "customer")
    out = enrich_with_customers(stream, c)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def click_purchase_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """All (click, purchase) pairs per user with the purchase at most
    30 min after the click — the stream-stream interval-join shape
    (equi-key on user_id + event-time range predicate). Works on batch
    or streaming inputs; streaming requires watermarks on BOTH sides so
    Spark can bound join state (clicks older than watermark+30min are
    evicted)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        # µs diff then floor-div: sub-second ts components make
        # per-timestamp second-truncation (unix_timestamp) off by one;
        # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike
        (
            F.expr("timestampdiff(MICROSECOND, click_ts, purchase_ts)")
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("gap_s"),
    )


@register(
    "interval_join_events",
    oracle="""
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) // 1000000 AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ORDER BY c.user_id, click_id, purchase_id
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: every purchase
    within 30 min of a same-user click (attribution primitive).

    Scale: equi-key (user_id) + time-range condition → SMJ keyed on
    user_id with the range as a post-join predicate; in streaming mode
    the same plan becomes a symmetric-hash join whose state the two
    watermarks bound. Never run a stream-stream join without watermarks
    on both sides — state grows with the full history otherwise."""
    e = load_table(spark, sf_dir, "events")
    return click_purchase_pairs(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    ).orderBy("user_id", "click_id", "purchase_id")


def run_stream_stream_join(
    spark: SparkSession, sf_dir: str, query_name: str = "ssjoin_out"
) -> DataFrame:
    """Run the interval join as a real stream-stream join: both sides
    watermarked, append mode (the only mode stream-stream inner joins
    support), memory sink, drained synchronously."""
    s1 = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).withWatermark("ts", "1 hour")
    s2 = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", "1 hour")
    out = click_purchase_pairs(s1, s2)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def click_conversion_outcomes(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT-OUTER companion of ``click_purchase_pairs``: EVERY click,
    with its same-user purchases within 30 min — or NULLs if none (the
    funnel's denominator rows the inner join drops). Works on batch or
    streaming inputs; in streaming, unmatched clicks are emitted with
    NULLs only once the watermark passes click_ts + 30 min (state
    eviction proves no match can still arrive) — the defining
    stream-stream OUTER join semantics."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.expr("timestampdiff(MICROSECOND, click_ts, purchase_ts)")
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("gap_s"),
        F.col("purchase_id").isNotNull().cast("bigint").alias("converted"),
    )


@register(
    "interval_left_join_conversions",
    oracle="""
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) // 1000000
             AS gap_s,
           CAST(CASE WHEN p.event_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS converted
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ORDER BY user_id, click_id, purchase_id
    """,
)
def interval_left_join_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream LEFT-OUTER interval join: every
    click with its 30-min conversions or NULLs — the row set a
    conversion-rate funnel actually needs (interval_join_events only
    keeps the converted paths; the denominator is here).

    Scale: same SMJ-keyed-on-user plan as the inner twin; in streaming
    mode the left side's state holds each click until the watermark
    passes click_ts + 30 min, then emits the NULL row — bounded state
    (watermark delay + join window), never full-history. Never run a
    stream-stream OUTER join without watermarks on BOTH sides: nulls
    would never emit AND state would never evict."""
    e = load_table(spark, sf_dir, "events")
    return click_conversion_outcomes(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    ).orderBy("user_id", "click_id", "purchase_id")


def run_stream_stream_left_join(
    spark: SparkSession, sf_dir: str, query_name: str = "ssljoin_out"
) -> DataFrame:
    """Run the conversion-outcome join as a real stream-stream
    LEFT-OUTER join: both sides watermarked, append mode, memory sink,
    drained synchronously. NULL (unconverted) rows for the newest
    clicks — those whose 30-min match window the final watermark has
    not yet closed — are correctly still absent when the source drains;
    the bit-identity test compares the matched rows exactly and the
    NULL rows on the watermark-closed prefix."""
    s1 = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).withWatermark("ts", "1 hour")
    s2 = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", "1 hour")
    out = click_conversion_outcomes(s1, s2)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_to_parquet(
    spark: SparkSession, sf_dir: str, out_path: str, checkpoint_path: str
) -> int:
    """Production sink shape: stream -> foreachBatch -> idempotent
    parquet append, exactly-once via the checkpoint (microbatch id is
    recorded; a replayed batch overwrites its own output).

    foreachBatch is the extension seam for sinks Spark lacks (JDBC
    upsert, Delta merge, search-index push): each microbatch arrives as
    a regular DataFrame with full batch-API access. Returns the number
    of microbatches processed.
    """
    stream = read_event_stream(spark, sf_dir)
    seen: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(seen)


def jdbc_batch_upsert(
    batch_df: DataFrame, batch_id: int, url: str, table: str, driver: str
) -> None:
    """Idempotent foreachBatch JDBC sink body: DELETE the batch's own
    prior rows (batch-id keyed), then append them — the delete-insert
    MERGE that makes a replayed microbatch a no-op instead of a
    duplicate. This is the production CDC-sink discipline: Spark's
    checkpoint gives at-least-once delivery to foreachBatch, and the
    sink supplies the idempotence that upgrades it to exactly-once.

    The DELETE runs driver-side on one JDBC connection (cheap: one
    statement per microbatch); the insert fans out through Spark's JDBC
    writer, one connection per partition. A batch interrupted mid-insert
    replays into its own DELETE, so partial writes cannot double-count.
    """
    jvm = batch_df.sparkSession._sc._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            # Spark's JDBC writer QUOTES column identifiers (lowercase,
            # case-sensitive in Derby/PG) — the predicate must match
            stmt.executeUpdate(
                f'DELETE FROM {table} WHERE "batch_id" = {int(batch_id)}'
            )
        except Exception as exc:
            # first batch: the table doesn't exist yet (Spark's JDBC
            # append below creates it) — only THAT failure may pass
            if "42X05" not in str(exc) and "does not exist" not in str(exc):
                raise
        finally:
            stmt.close()
    finally:
        conn.close()
    (
        batch_df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode("append")
        .save()
    )


def run_stream_to_jdbc(
    spark: SparkSession,
    sf_dir: str,
    url: str,
    table: str,
    checkpoint_path: str,
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
) -> int:
    """Exactly-once streaming sink into a live RDBMS (embedded Derby —
    the environment's one executable JDBC engine): per-event revenue
    rows stream through foreachBatch into ``jdbc_batch_upsert``. The
    checkpoint makes Spark replay any uncommitted microbatch after a
    failure; the batch-id-keyed delete-insert makes that replay
    idempotent — together, exactly-once table contents. Returns the
    number of microbatches processed.

    This is the shape ``run_stream_to_parquet`` approximates with
    files, against a real transactional sink; the replay test re-fires
    a committed batch and asserts the table is unchanged."""
    stream = read_event_stream(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
    )
    seen: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(int(batch_id))
        jdbc_batch_upsert(batch_df, batch_id, url, table, driver)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(seen)


def run_stream_transform_with_state(
    spark: SparkSession, sf_dir: str, query_name: str = "tws_out"
) -> DataFrame:
    """Custom stateful streaming operator via transformWithStateInPandas
    (Spark 4.0's arbitrary-state API, successor to
    applyInPandasWithState above): a per-user StatefulProcessor keeping
    a (count, cents-total, distinct-event-type-set-size) ValueState,
    emitting the running totals each microbatch.

    Why the new API at scale: typed state handles (ValueState /
    ListState / MapState) are individually addressable in the state
    store — a processor updates ONE key's state without rewriting an
    opaque per-key blob — plus first-class TTL, initial-state seeding,
    and state schema evolution across restarts. Semantics here are
    deliberately identical to run_stream_stateful_counter so the two
    APIs are directly comparable (and test-checked against the same
    batch twin).

    Dependency gate: the API's Python state server speaks protobuf —
    absent/broken `google.protobuf` crashes the TWS driver worker at
    query start (this container lacks it; the matching test
    importorskips, arming itself when the dependency appears).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, cents bigint, ntypes bigint"
            )
            self._types = handle.getListState("types", "t string")

        def handleInputRows(self, key, rows, timerValues):
            n, cents_total = 0, 0
            if self._state.exists():
                n, cents_total, _ = self._state.get()
            seen = {r[0] for r in self._types.get()}
            for pdf in rows:
                n += len(pdf)
                cents_total += int(round(float(pdf["value"].sum()) * 100))
                new = set(pdf["event_type"].unique()) - seen
                if new:
                    self._types.appendList(
                        pd.DataFrame({"t": sorted(new)})
                    )
                    seen |= new
            self._state.update((n, cents_total, len(seen)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents_total / 100.0],
                    "n_event_types": [len(seen)],
                }
            )

        def close(self) -> None:
            pass

    stream = read_event_stream(spark, sf_dir)
    out = stream.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        "user_id bigint, n_events bigint, total_value double, n_event_types bigint",
        "Update",
        "processingTime",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_user_totals(
    spark: SparkSession, sf_dir: str, query_name: str = "totals_out"
) -> DataFrame:
    """Per-user running totals — count, exact cents sum, distinct
    event-type count — via ``applyInPandasWithState``. Same semantics as
    ``run_stream_transform_with_state`` (the Spark-4 typed-state form,
    whose Python state server needs protobuf); this twin runs in any
    environment, so the totals contract is always test-covered.

    Scale: state per key is two bigints plus the distinct event-type
    list (bounded by type cardinality, not event count).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = read_event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        n, cents, types = state.get if state.exists else (0, 0, [])
        seen = set(types)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(
                pdf["value"].map(lambda v: int(round(float(v) * 100))).sum()
            )
            seen |= set(pdf["event_type"].unique())
        state.update((n, cents, sorted(seen)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "n_event_types": [len(seen)],
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id bigint, n_events bigint, total_value double, n_event_types bigint",
        "n bigint, cents bigint, types array<string>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_ewma(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "ewma_out",
    watermark_delay: str = "1 hour",
    stream: DataFrame | None = None,
) -> DataFrame:
    """Streaming twin of operators/analytics.ewma_user_value: per-user
    running EWMA (alpha 0.3) over EVENT-TIME order, tolerant of
    out-of-order arrival up to ``watermark_delay``.

    Late-data semantics (watermark buffer-and-sort):

    - rows still inside the watermark are BUFFERED in state; once the
      watermark passes a row's event time it is folded into the
      committed (ewma, n) in (ts, event_id) order — so cross-microbatch
      reordering within the delay cannot corrupt the fold;
    - each emission is the committed fold speculatively extended over
      the sorted buffer, so after the last microbatch the output equals
      the batch operator exactly whenever no row exceeded the delay
      (parity test) — same per-step 9dp rounding as the batch fold;
    - rows arriving AFTER the watermark has passed them are dropped,
      mirroring Spark's windowed-aggregation late-data rule
      (tests/test_streaming.py pins both behaviors).

    State per key is (ewma, n) plus only the not-yet-ripe buffer — at
    100 TB the buffer is bounded by each key's event rate within the
    watermark delay, not by history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if stream is None:
        stream = read_event_stream(spark, sf_dir)
    stream = stream.withWatermark("ts", watermark_delay)

    def _fold(ewma, n, rows):
        for _, _, v in rows:
            ewma = v if ewma is None else round(ewma * 0.7 + v * 0.3, 9)
            n += 1
        return ewma, n

    def update(key, pdfs, state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            ewma, n, b_ts, b_eid, b_val = state.get
            buf = [
                (int(t), int(e), float(v)) for t, e, v in zip(b_ts, b_eid, b_val)
            ]
        else:
            ewma, n, buf = None, 0, []
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t, e, v in zip(ts_us, pdf["event_id"], pdf["value"]):
                if int(t) // 1000 < wm_ms:
                    continue  # beyond the watermark: dropped, like F.window aggs
                buf.append((int(t), int(e), float(v)))
        buf.sort()
        ripe = [r for r in buf if r[0] // 1000 < wm_ms]
        buf = [r for r in buf if r[0] // 1000 >= wm_ms]
        ewma, n = _fold(ewma, n, ripe)
        state.update(
            (
                ewma,
                n,
                [r[0] for r in buf],
                [r[1] for r in buf],
                [r[2] for r in buf],
            )
        )
        s_ewma, s_n = _fold(ewma, n, buf)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [s_n],
                "ewma_value": [None if s_ewma is None else round(s_ewma, 6)],
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id bigint, n_events bigint, ewma_value double",
        "ewma double, n bigint, buf_ts array<bigint>, "
        "buf_eid array<bigint>, buf_val array<double>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

#: Spark 4's in-box RocksDB state store — the 100 TB state backend.
#: The default HDFSBackedStateStoreProvider keeps every partition's
#: state map in executor HEAP (bounded by executor memory, the known
#: killer for large streaming keyspaces); RocksDB spills state to
#:  local SSD with incremental checkpointing, so state scales with
#: disk, not heap. Results must be BIT-IDENTICAL across providers —
#: the store is an implementation detail of stateful exec, never
#: semantics — pinned in tests/test_streaming.py for both heavy twins.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


class _state_provider_conf:
    """Scoped state-store-provider override: stateful streaming confs
    are captured at query START, so setting the session conf around
    .start() (and restoring after the query stops) pins the provider
    for exactly one query without leaking into the session."""

    def __init__(self, spark: SparkSession, provider: str | None):
        self.spark, self.provider = spark, provider

    def __enter__(self):
        if self.provider is not None:
            self.saved = self.spark.conf.get(_PROVIDER_CONF)
            self.spark.conf.set(_PROVIDER_CONF, self.provider)
        return self

    def __exit__(self, *exc):
        if self.provider is not None:
            self.spark.conf.set(_PROVIDER_CONF, self.saved)
        return False


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (the 'new batch
    arriving' side of incremental dedup)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def run_stream_dedup_vs_corpus(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "dedup_corpus_out",
    state_provider: str | None = None,
) -> DataFrame:
    """REAL streaming twin of operators.dedup.stream_dedup_vs_corpus:
    incoming documents stream in, their minhash bands (the same pure
    column expressions as the batch twin — bands_from works unchanged on
    a streaming frame) stream-static join the PRE-BUILT corpus LSH
    index, and a streaming aggregation rolls up per-doc verdicts.

    Shape notes for 100 TB: the static index is the only state that
    scales with corpus size and it lives in a (broadcastable/bucketed)
    batch table, NOT in streaming state; the streaming agg keys on
    doc_id of the CURRENT batch only, so state is bounded by batch
    size. Complete output mode because the sink is the monitor table.
    ``state_provider`` pins the state-store backend for THIS query
    (ROCKSDB_PROVIDER = disk-backed state for 100 TB keyspaces);
    results are provider-independent by contract, pinned in tests.
    Returns (doc_id, source, is_dup)."""
    from ai_etl_studio_spark.operators.dedup import bands_from

    corpus = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    idx = (
        bands_from(corpus)
        .select("band", "band_key")
        .distinct()
        .withColumn("hit", F.lit(1))
    )

    incoming = read_docs_stream(spark, sf_dir).filter(F.col("source") != "src0")
    verdicts = (
        bands_from(incoming.select("doc_id", "text"))
        .join(F.broadcast(idx), ["band", "band_key"], "left")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce("hit", F.lit(0))).alias("is_dup"))
    )
    with _state_provider_conf(spark, state_provider):
        q = (
            verdicts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(query_name)


def run_stream_countmin(
    spark: SparkSession, sf_dir: str, query_name: str = "cms_out"
) -> DataFrame:
    """REAL streaming build of the count-min sketch
    (operators.text.countmin_heavy_hitters's cell table): token
    occurrences stream in, each emits its CMS_D (row, bucket) cells, and
    a streaming aggregation maintains the counters.

    This is the whole point of count-min in a pipeline: the sketch is a
    MERGEABLE summary, so the streaming state is bounded at CMS_D×CMS_W
    counters FOREVER — no watermark needed, no state growth with the
    stream, and the resulting cells are bit-identical to a batch build
    over the same data (asserted in tests/test_streaming.py). Complete
    output mode because the sink is the (constant-size) monitor table.
    Returns (j, bucket, cnt)."""
    from ai_etl_studio_spark.functions.texthash import md5_hash32, tokens
    from ai_etl_studio_spark.operators.text import CMS_D, CMS_W

    occ = (
        read_docs_stream(spark, sf_dir)
        .select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    jarr = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    cells = (
        occ.select("tok", jarr)
        .select(
            "j",
            (
                md5_hash32(
                    F.concat(F.col("j").cast("string"), F.lit(":"), F.col("tok"))
                )
                % CMS_W
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_curation(
    spark: SparkSession, sf_dir: str, query_name: str = "curation_out"
) -> DataFrame:
    """REAL streaming twin of the pretraining curation pipeline's
    per-batch stages: documents stream in and each micro-batch is
    quality-gated (stateless row predicates), line-cleaned against the
    PERSISTED boilerplate digest index, and decontaminated against the
    static benchmark shingle set — the production ingest path, where
    only corpus-global state (boilerplate frequencies, benchmark grams)
    lives in build-once batch tables and the stream does stream-static
    broadcast joins.

    Per-source verdict counts come back from a streaming aggregation
    whose state is bounded by |sources|. Returns (source, n_docs,
    n_quality, n_with_boilerplate, n_decontaminated).

    Scale: nothing in streaming state grows with the corpus — the
    classic split of 'heavy global passes nightly, cheap membership
    joins per batch'."""
    from ai_etl_studio_spark.functions.texthash import tokens, word_shingles
    from ai_etl_studio_spark.operators.dedup import (
        ensure_boilerplate_index,
    )
    from ai_etl_studio_spark.operators.quality import DECON_N

    # build-once global state (batch side)
    bp = spark.table(ensure_boilerplate_index(spark, sf_dir)).withColumn(
        "is_bp", F.lit(1)
    )
    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(tokens("text").alias("toks"))
        .filter(F.size("toks") >= DECON_N)
        .select(F.explode(word_shingles(F.col("toks"), DECON_N)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )

    # ONE static probe table: boilerplate line digests + benchmark gram
    # digests, kind-tagged, unioned, broadcast
    probes_static = (
        bp.select(F.lit("line").alias("kind"), F.col("h"))
        .unionAll(bench.select(F.lit("gram").alias("kind"), F.col("h")))
        .withColumn("hit", F.lit(1))
    )

    incoming = read_docs_stream(spark, sf_dir).filter(F.col("source") != "src0")
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    base = incoming.select("doc_id", "source", ts.alias("ts"))
    n_w = F.size("ts")
    mwl = F.length(F.array_join("ts", "")).cast("double") / n_w
    gated = base.withColumn(
        "q_pass",
        (n_w.between(20, 100_000) & mwl.between(3.0, 10.0)).cast("int"),
    )
    from ai_etl_studio_spark.operators.dedup import LINE_W

    n_lines = F.ceil(F.size("ts") / F.lit(float(LINE_W))).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(F.slice("ts", i * LINE_W + 1, LINE_W), " "),
    )
    grams = F.when(
        F.size("ts") >= DECON_N, word_shingles(F.col("ts"), DECON_N)
    ).otherwise(F.array().cast("array<string>"))
    # tag-union both probe kinds into one explode -> one stream-static join
    probe_arr = F.concat(
        F.transform(
            line_arr,
            lambda l: F.struct(F.lit("line").alias("kind"), F.md5(l).alias("h")),
        ),
        F.transform(
            grams,
            lambda g: F.struct(F.lit("gram").alias("kind"), F.md5(g).alias("h")),
        ),
    )
    probed = gated.select(
        "doc_id", "source", "q_pass", F.explode_outer(probe_arr).alias("p")
    ).select("doc_id", "source", "q_pass", F.col("p.kind").alias("kind"), F.col("p.h").alias("h"))
    hit = (
        probed.join(F.broadcast(probes_static), ["kind", "h"], "left")
        .groupBy("doc_id", "source", "q_pass")
        .agg(
            F.max(
                F.when((F.col("kind") == "gram") & (F.col("hit") == 1), 1).otherwise(0)
            ).alias("is_dirty"),
            F.sum(
                F.when((F.col("kind") == "line") & (F.col("hit") == 1), 1).otherwise(0)
            ).alias("n_bp_lines"),
        )
    )
    # ONE streaming aggregation (per-doc verdicts, state bounded by the
    # batch) — chaining the per-source rollup as a second stateful op
    # would trip Spark's multiple-stateful-operator correctness check;
    # the rollup runs as a batch query over the drained sink instead.
    q = (
        hit.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(query_name)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q_pass").alias("n_quality"),
            F.sum(F.when(F.col("n_bp_lines") > 0, 1).otherwise(0)).alias(
                "n_with_boilerplate"
            ),
            F.sum(
                F.when(
                    (F.col("q_pass") == 1) & (F.col("is_dirty") == 0), 1
                ).otherwise(0)
            ).alias("n_decontaminated"),
        )
    )


def run_stream_freshness(
    spark: SparkSession, sf_dir: str, query_name: str = "fresh_out"
) -> DataFrame:
    """Live freshness monitor — the streaming twin of the batch
    ``freshness_audit``: per event stream, the latest arrival timestamp
    and total arrivals, maintained incrementally as microbatches land.
    In production this feeds the staleness alert (anchor-now minus
    last_ts); the fixed-anchor arithmetic stays in the batch op so the
    streaming state is pure MAX/COUNT.

    Scale: state per key is one timestamp + one counter — constant per
    stream regardless of volume; complete-mode output is |streams| rows.
    MAX and COUNT are both mergeable, so microbatch updates are
    map-side partials into the state store, never a re-scan.
    """
    stream = read_event_stream(spark, sf_dir)
    agg = stream.groupBy(F.col("event_type").alias("stream")).agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
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


def run_stream_psi(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "psi_out",
    state_provider: str | None = None,
) -> DataFrame:
    """REAL streaming build of psi_drift's drift histogram: documents
    stream in and a streaming aggregation maintains the per-bin
    expected/actual side counts — the live corpus-drift monitor.

    Like the count-min build, the histogram is a MERGEABLE summary, so
    the streaming state is bounded at |bins| rows FOREVER — no
    watermark, no state growth with the stream — and the resulting bin
    table is bit-identical to the batch reduction inside
    operators.drift.psi_drift over the same data (asserted in
    tests/test_streaming.py); the PSI expression itself is a tiny-table
    projection either side can apply. Complete output mode because the
    sink is the constant-size monitor table. ``state_provider`` pins
    the state-store backend for THIS query (ROCKSDB_PROVIDER =
    disk-backed state); results are provider-independent by contract,
    pinned in tests. Returns (bin, cnt_expected, cnt_actual)."""
    from ai_etl_studio_spark.operators.drift import _PSI_BIN

    b = (
        read_docs_stream(spark, sf_dir)
        .filter(F.col("lang").isNotNull())
        .groupBy((F.col("n_chars") / _PSI_BIN).cast("bigint").alias("bin"))
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                "cnt_expected"
            ),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias(
                "cnt_actual"
            ),
        )
    )
    with _state_provider_conf(spark, state_provider):
        q = (
            b.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(query_name)


def run_stream_hourly_profile(
    spark: SparkSession, sf_dir: str, query_name: str = "hourly_out"
) -> DataFrame:
    """REAL streaming build of hourly_seasonality_profile's cell table:
    events stream in and a streaming aggregation maintains the
    (event_type, hour) counts — the live load-profile monitor.

    Mergeable-summary shape again: state is bounded at |types|×24 rows
    FOREVER (no watermark, no growth), and the cells are bit-identical
    to the batch reduction (asserted in tests/test_streaming.py); the
    share normalization is a tiny-table projection either side can
    apply. Complete output mode into the constant-size monitor table.
    Returns (event_type, hr, n)."""
    b = (
        read_event_stream(spark, sf_dir)
        .groupBy(
            "event_type", F.hour("ts").cast("bigint").alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    q = (
        b.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_quality_bands(
    spark: SparkSession, sf_dir: str, query_name: str = "qbands_out"
) -> DataFrame:
    """REAL streaming build of quality_calibration_bands' reliability
    cells: documents stream in and a streaming aggregation maintains
    the per-band doc/pass/word counts — the live "is the cheap quality
    score still calibrated" monitor for an ingest pipeline.

    Mergeable-summary shape: the banding + gate are the SAME narrow
    codegen projection as the batch operator (imported expressions, not
    re-derived), state is bounded at ≤10 rows FOREVER, and the cells
    are bit-identical to the batch rollup (asserted in
    tests/test_streaming.py). Complete output mode into the
    constant-size monitor table. Returns (band, n_docs, n_pass,
    total_words)."""
    from ai_etl_studio_spark.operators.quality import (
        _G_MAX_MWL,
        _G_MAX_WORDS,
        _G_MIN_MWL,
        _G_MIN_WORDS,
    )
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = read_docs_stream(spark, sf_dir).filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    base = d.select(ts.alias("ts")).filter(F.size("ts") > 0)
    n_words = F.size("ts")
    n_stop = F.size(F.filter("ts", lambda w: w.isin(*STOPWORDS)))
    mwl = F.length(F.array_join("ts", "")).cast("double") / n_words
    band = F.least(
        F.lit(9),
        F.floor(n_stop.cast("double") / n_words * 10).cast("bigint"),
    )
    gate = n_words.between(_G_MIN_WORDS, _G_MAX_WORDS) & mwl.between(
        _G_MIN_MWL, _G_MAX_MWL
    )
    b = (
        base.select(
            band.alias("band"),
            n_words.alias("n_words"),
            F.when(gate, 1).otherwise(0).alias("ok"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ok").cast("bigint").alias("n_pass"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
    )
    q = (
        b.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_byte_entropy(
    spark: SparkSession, sf_dir: str, query_name: str = "bytes_out"
) -> DataFrame:
    """REAL streaming build of media_byte_entropy's byte histogram:
    documents stream in, payload bytes expand MAP-SIDE into (media
    type, byte) pairs, and a streaming aggregation maintains the
    ≤|types|×256-cell count table — the live
    compression/encryption/mislabeling monitor on an ingest feed.

    Mergeable-summary shape again: state is bounded at ≤768 rows
    FOREVER (no watermark, no growth with the stream), the cells are
    bit-identical to the batch reduction inside
    operators.multimodal.media_byte_entropy (asserted in
    tests/test_streaming.py), and the entropy expression is a
    tiny-table projection either side can apply. Complete output mode
    into the constant-size monitor table. Returns
    (media_type, byte, c)."""
    d = read_docs_stream(spark, sf_dir).filter(F.col("text").isNotNull())
    m = d.select(
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.hex(F.encode("text", "UTF-8")).alias("h"),
    )
    b = (
        m.select(
            "media_type",
            F.explode(
                F.sequence(F.lit(1), (F.length("h") / 2).cast("bigint"))
            ).alias("i"),
            "h",
        )
        .select(
            "media_type", F.expr("substring(h, i * 2 - 1, 2)").alias("byte")
        )
        .groupBy("media_type", "byte")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    q = (
        b.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def read_orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the orders parquet (the 'orders arriving'
    side of live warehouse monitors)."""
    return (
        spark.readStream.schema(ORDERS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "orders.parquet")
        .load(sf_dir)
    )


def run_stream_urgency_by_nation(
    spark: SparkSession, sf_dir: str, query_name: str = "urgency_out"
) -> DataFrame:
    """REAL streaming build of fdr_bh_screening's input table: orders
    stream in, join the STATIC customer dimension (stream-static join —
    no state, the dimension is just read per micro-batch), and a
    streaming aggregation maintains the per-nation (orders, urgent)
    counts — the live feed under the FDR screen.

    Mergeable-summary shape: state is bounded at |nation| rows FOREVER,
    the counts are bit-identical to the batch reduction inside
    fdr_bh_screening (asserted in tests/test_streaming.py), and the
    z/p/BH machinery is a bounded-table projection either side can
    apply downstream. Complete output mode into the constant-size
    monitor table. Returns (nk, n, u)."""
    from ai_etl_studio_spark.catalog import load_table

    o = read_orders_stream(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    pn = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("u"),
        )
    )
    q = (
        pn.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_waterfall(
    spark: SparkSession, sf_dir: str, query_name: str = "waterfall_out"
) -> DataFrame:
    """REAL streaming build of revenue_waterfall_by_year's P&L legs:
    lineitem rows stream in (same parquet file source pattern) and a
    streaming aggregation maintains the four exact-cents sums per ship
    year — the live close-of-books monitor.

    Mergeable-summary shape: integer SUMs are order-free and
    associative, state is bounded at |years| rows FOREVER, and the
    legs are bit-identical to the batch reduction (asserted in
    tests/test_streaming.py). Complete output mode into the
    constant-size monitor table. Returns (yr, gross_cents,
    discount_cents, tax_cents, net_collected_cents)."""
    schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    )
    li = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "lineitem.parquet")
        .load(sf_dir)
    )
    ep, disc, tax = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    wf = li.groupBy(
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("yr")
    ).agg(
        F.sum(F.round(ep * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("gross_cents"),
        F.sum(F.round(ep * disc * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("discount_cents"),
        F.sum(F.round(ep * (1 - disc) * tax * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("tax_cents"),
        F.sum(F.round(ep * (1 - disc) * (1 + tax) * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("net_collected_cents"),
    )
    q = (
        wf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_linestatus_share(
    spark: SparkSession, sf_dir: str, query_name: str = "lstatus_out"
) -> DataFrame:
    """REAL streaming build of linestatus_share_by_quarter's aging
    cells: lineitem rows stream in and a streaming aggregation
    maintains (total, finished) counts per ship quarter — the live
    ledger-aging monitor.

    Mergeable-summary shape: state is bounded by the business horizon
    (|quarters|, growing with calendar time, never with stream rate),
    the cells are bit-identical to the batch reduction (asserted in
    tests/test_streaming.py), and the share is a bounded-table
    projection. Complete output mode. Returns (yq, n, nf)."""
    schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    )
    li = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "lineitem.parquet")
        .load(sf_dir)
    )
    d = F.col("l_shipdate").cast("date")
    q = li.groupBy(
        (
            F.year(d) * 10
            + F.expr("(month(CAST(l_shipdate AS DATE)) + 2) DIV 3")
        )
        .cast("bigint")
        .alias("yq")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("nf"),
    )
    qq = (
        q.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        qq.processAllAvailable()
    finally:
        qq.stop()
    return spark.table(query_name)


def run_stream_tax_mix(
    spark: SparkSession, sf_dir: str, query_name: str = "taxmix_out"
) -> DataFrame:
    """REAL streaming build of tax_rate_mix_by_year's exposure cells
    (the eighth readStream twin): lineitem rows stream in and a
    streaming aggregation maintains per-(ship-year, tax-band) line
    counts, taxable base and tax collected — the live indirect-tax
    ledger a VAT monitor reads.

    Mergeable-summary shape: state is bounded by |years|×|tax bands|
    (the business horizon × a fixed rate schedule — never stream
    rate); all three measures are exact integer sums (cents via the
    same all-integer cross multiplication as the batch op), so the
    cells are bit-identical to the batch reduction in ANY arrival
    order (asserted in tests/test_streaming.py). Complete output mode.
    Returns (yr, tax_pct, n_lines, base_cents, tax_cents)."""
    schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    )
    li = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "lineitem.parquet")
        .load(sf_dir)
    )
    cells = li.groupBy(
        F.year(F.col("l_shipdate").cast("date")).alias("yr"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("tax_pct"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("base_cents"),
        F.sum(
            F.expr(
                "(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
                " * CAST(round(l_tax * 100, 0) AS BIGINT)) DIV 100"
            )
        )
        .cast("bigint")
        .alias("tax_cents"),
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_daily_revenue(
    spark: SparkSession, sf_dir: str, query_name: str = "dailyrev_out"
) -> DataFrame:
    """REAL streaming build of the daily-revenue series (the ninth
    readStream twin) — the cells revenue_cvar_daily, the ACF family and
    every daily forecast op read: orders stream in and a streaming
    aggregation maintains exact integer cents per order day.

    Mergeable-summary shape: state is bounded by the CALENDAR (one row
    per day with orders — the business horizon, never stream rate), and
    the integer sums are order-free, so the series is bit-identical to
    the batch reduction in any arrival order (asserted in
    tests/test_streaming.py, where the batch side IS the CVaR op's
    daily leg). Complete output mode. Returns (day, r)."""
    o = read_orders_stream(spark, sf_dir)
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("r")
    )
    q = (
        daily.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_value_moments(
    spark: SparkSession, sf_dir: str, query_name: str = "moments_out"
) -> DataFrame:
    """REAL streaming maintenance of the order-value moment state (the
    tenth readStream twin): orders stream in and ONE un-grouped
    streaming aggregation carries n, Σv, Σv², Σv³, Σv⁴ over integer
    cents — the sufficient statistics every distributional monitor
    (jarque_bera normality gate, skewness/kurtosis tiles, σ-fence
    limits) reads live. Downstream tests derive skew/kurtosis from the
    state exactly as the batch ops do.

    Mergeable-summary shape: the state is FIVE numbers (the smallest
    possible bounded state — independent of stream rate, calendar, and
    key cardinality); the higher powers ride decimal(38,0) exactly as
    in the batch jarque_bera op, and integer/decimal sums are
    order-free, so the row is bit-identical to the batch aggregate in
    ANY arrival order (asserted in tests/test_streaming.py). Complete
    output mode. Returns (n, s1, s2, s3, s4)."""
    o = read_orders_stream(spark, sf_dir)
    v = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    v2 = (v * v).cast("bigint")
    st = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("decimal(38,0)").alias("s1"),
        F.sum(v2.cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
        F.sum(v2.cast("decimal(19,0)") * v.cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("s3"),
        F.sum(v2.cast("decimal(19,0)") * v2.cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("s4"),
    )
    q = (
        st.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_stream_discount_trend(
    spark: SparkSession, sf_dir: str, query_name: str = "catrend_out"
) -> DataFrame:
    """REAL streaming maintenance of cochran_armitage_discount_trend's
    dose-response state (the eleventh readStream twin): lineitem rows
    stream in and ONE streaming aggregation keeps per-discount-level
    (n, returned) counts — the five CA sufficient sums (N, R, Σwr,
    Σwn, Σw²n) are linear in these 11 cells, so the trend z the batch
    op computes is derivable from the live state at any moment: the
    returns-by-discount gradient as an actual monitor, not a nightly
    job.

    Mergeable-summary shape: state is bounded by the |discount levels|
    rate schedule (11 cells — never stream rate); both measures are
    exact integer counts, so the cells are bit-identical to the batch
    reduction in ANY arrival order (asserted in
    tests/test_streaming.py, which also re-derives z from the state
    and matches the batch op's output). Complete output mode. Returns
    (w, n, r)."""
    schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    )
    li = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "lineitem.parquet")
        .load(sf_dir)
    )
    cells = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("w")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
