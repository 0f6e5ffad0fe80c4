"""Streaming durability semantics: checkpoint-restart exactly-once and
watermark late-data dropping — the two behaviors that make a streaming
pipeline production-grade at 100 TB/day (a restart must not double-count;
state must not grow unboundedly waiting for stragglers)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F


def _stage_file(spark, tmp_dir, src_dir, name, rows, mtime=None):
    """Write rows as ONE parquet file at src_dir/name (the file-stream
    source wants loose files, not nested write directories)."""
    scratch = os.path.join(tmp_dir, f"scratch_{name}")
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
    dest = os.path.join(src_dir, name)
    shutil.move(os.path.join(scratch, part), dest)
    if mtime is not None:
        os.utime(dest, (mtime, mtime))


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """availableNow + checkpoint: each input file contributes exactly once
    to the sink across THREE separate query runs (initial, incremental,
    no-new-data). The checkpoint's file log is the exactly-once source of
    truth; the parquet sink is append-mode."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, k string, v double")
            .format("parquet")
            .load(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = [(_ts("2024-01-01T00:00:01"), "a", 1.0), (_ts("2024-01-01T00:00:02"), "b", 2.0)]
    _stage_file(spark, str(tmp_path), src, "f1.parquet", batch1)
    run_once()
    assert spark.read.parquet(sink).count() == 2

    batch2 = [(_ts("2024-01-01T00:00:03"), "c", 3.0)]
    _stage_file(spark, str(tmp_path), src, "f2.parquet", batch2)
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 3
    # no duplicates: every (k) appears exactly once
    assert got.groupBy("k").count().filter("count > 1").count() == 0

    # a restart with NO new data must append nothing (no reprocessing)
    run_once()
    assert spark.read.parquet(sink).count() == 3


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: once the
    watermark has advanced past a window's end, rows arriving for that
    window are dropped, and the window's result — emitted exactly once —
    excludes them.

    Three files processed as ordered microbatches (maxFilesPerTrigger=1,
    modification-time ordering): file1 carries early events plus a
    watermark-advancing 12:00 event; file2 another advancing event (the
    watermark update from batch N's stats takes effect in batch N+1's
    late-row filter — verified empirically, Spark 4.1); file3 a late
    event for the long-closed 00:00 window."""
    src = str(tmp_path / "wsrc")
    os.makedirs(src)

    early = [
        (_ts("2024-01-01T00:01:00"), "on_time", 1.0),
        (_ts("2024-01-01T00:02:00"), "on_time", 1.0),
        (_ts("2024-01-01T12:00:00"), "advance", 1.0),
    ]
    advance2 = [(_ts("2024-01-01T12:01:00"), "advance2", 1.0)]
    late = [(_ts("2024-01-01T00:03:00"), "late", 100.0)]
    now = time.time()
    _stage_file(spark, str(tmp_path), src, "f1.parquet", early, mtime=now - 300)
    _stage_file(spark, str(tmp_path), src, "f2.parquet", advance2, mtime=now - 200)
    _stage_file(spark, str(tmp_path), src, "f3.parquet", late, mtime=now - 100)

    stream = (
        spark.readStream.schema("ts timestamp, k string, v double")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in p["stateOperators"]
        )
    finally:
        q.stop()

    out = {
        r["w"].start.isoformat(): (r["n"], r["sum_v"])
        for r in spark.table("wm_out").collect()
    }
    # the 00:00 window was finalized by the advancing watermark; it holds
    # only the two on-time rows — the late row (v=100) was dropped by the
    # state operator, not merged
    assert out["2024-01-01T00:00:00"] == (2, 2.0)
    assert dropped == 1
