"""Streaming CDC-merge sink and watermarked outer stream-stream join —
the two remaining production streaming shapes: last-writer-wins upsert
state maintained across microbatches via foreachBatch, and the outer
join's emit-null-after-watermark semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _stage(spark, tmp_dir, src_dir, name, rows, schema, mtime):
    import shutil

    scratch = os.path.join(tmp_dir, f"scratch_{name}")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        scratch
    )
    part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
    dest = os.path.join(src_dir, name)
    shutil.move(os.path.join(scratch, part), dest)
    os.utime(dest, (mtime, mtime))


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_foreach_batch_cdc_merge_last_writer_wins(spark, tmp_path):
    """CDC upsert through foreachBatch: each microbatch merges into a
    keyed parquet state table (delete-and-replace by key, ties broken by
    highest seq). After three ordered microbatches the state holds one
    row per key with the latest value — the JDBC-upsert / Delta-MERGE
    sink pattern, minus the engine-specific sink."""
    import time

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    schema = "k bigint, v string, seq bigint, ts timestamp"
    now = time.time()
    _stage(spark, str(tmp_path), src, "b1.parquet",
           [(1, "a1", 1, _ts("2024-01-01T00:00:01")),
            (2, "b1", 2, _ts("2024-01-01T00:00:02"))], schema, now - 300)
    _stage(spark, str(tmp_path), src, "b2.parquet",
           [(1, "a2", 3, _ts("2024-01-01T00:01:01")),
            (3, "c1", 4, _ts("2024-01-01T00:01:02"))], schema, now - 200)
    _stage(spark, str(tmp_path), src, "b3.parquet",
           [(2, "b2", 5, _ts("2024-01-01T00:02:01")),
            (1, "a3", 6, _ts("2024-01-01T00:02:02"))], schema, now - 100)

    def merge(batch_df, batch_id):
        batch = (
            batch_df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("k").orderBy(F.desc("seq"))
                ),
            )
            .filter("_rn = 1")
            .drop("_rn")
        )
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            current = spark.read.parquet(state)
            merged = (
                current.join(batch.select("k"), "k", "left_anti")
                .unionByName(batch)
            )
        else:
            merged = batch
        # write to a scratch dir then swap — the batch reads `state`
        # lazily, so an in-place overwrite would clobber its own input
        scratch = state + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(scratch)
        import shutil

        if os.path.exists(state):
            shutil.rmtree(state)
        os.rename(scratch, state)

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = {r.k: (r.v, r.seq) for r in spark.read.parquet(state).collect()}
    assert final == {1: ("a3", 6), 2: ("b2", 5), 3: ("c1", 4)}


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Watermarked left-outer stream-stream join: an unmatched left row
    is held in state until the watermark passes its join window, then
    emitted with a NULL right side — never dropped, never emitted early.
    """
    import time

    src = str(tmp_path / "ssrc")
    os.makedirs(src)
    schema = "ts timestamp, k bigint, side string"
    now = time.time()
    # batch 1: left rows 1 (will match) and 2 (never matches) + right
    # match for 1
    _stage(spark, str(tmp_path), src, "f1.parquet",
           [(_ts("2024-01-01T00:00:10"), 1, "L"),
            (_ts("2024-01-01T00:00:20"), 2, "L"),
            (_ts("2024-01-01T00:00:30"), 1, "R")], schema, now - 300)
    # batch 2+3: watermark-advancing rows on BOTH sides (each side's
    # watermark advances from its own events; the join watermark is the
    # min), two batches so the filter takes effect
    _stage(spark, str(tmp_path), src, "f2.parquet",
           [(_ts("2024-01-01T12:00:00"), 99, "L"),
            (_ts("2024-01-01T12:00:00"), 99, "R")], schema, now - 200)
    _stage(spark, str(tmp_path), src, "f3.parquet",
           [(_ts("2024-01-01T12:30:00"), 98, "L"),
            (_ts("2024-01-01T12:30:00"), 98, "R")], schema, now - 100)

    base = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    left = (
        base.filter("side = 'L'")
        .select(F.col("ts").alias("l_ts"), F.col("k").alias("l_k"))
        .withWatermark("l_ts", "5 minutes")
    )
    right = (
        base.filter("side = 'R'")
        .select(F.col("ts").alias("r_ts"), F.col("k").alias("r_k"))
        .withWatermark("r_ts", "5 minutes")
    )
    joined = left.join(
        right,
        (F.col("l_k") == F.col("r_k"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_outer")
        .option("checkpointLocation", str(tmp_path / "ssckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {(r.l_k, r.r_k) for r in spark.table("ss_outer").collect()}
    assert (1, 1) in rows  # matched pair
    assert (2, None) in rows  # unmatched left emitted with NULL right
