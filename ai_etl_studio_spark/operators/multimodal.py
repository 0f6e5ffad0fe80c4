"""Multimodal column plumbing (driver-directed extension).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
decode step is gated by an EXPLICIT OPT-IN (r6, the r5 ADVICE fix):
real decode runs only when ``SPARK_GRAFT_REAL_CODECS=1`` is set AND the
codec library is importable (PIL for images, soundfile for audio,
PyAV for video) — dimensions/frame counts then come from the codec,
and unparseable bytes surface as ``decode_ok = false`` instead of fake
numbers. Without the opt-in the step is PINNED to the clearly marked
deterministic fake (`_fake_decode_meta`) even when a codec happens to
be importable (Pillow is a common transitive dependency, and the
synthetic payloads are document-text bytes, not real media — an
import-probe alone would flip the registered oracle-checked ops to
decode_ok=false on such payloads and break the correctness sweep).
The opt-in keeps CI hermetic and the DuckDB oracles exact everywhere.
Everything Spark cares about is real and tested either way: binary
column construction, schema, Arrow-batched Pandas-UDF signatures,
`mapInPandas` batch shape, and partition-count preservation.

The synthetic payloads derive from ``documents.text`` (utf-8 bytes, and
the corpus is pure ASCII at every SF — byte offsets == char offsets),
so ALL four pipelines have exact DuckDB oracles: the stubs are
deterministic arithmetic/md5 over payload bytes that SQL replays
exactly, leaving the Arrow/mapInPandas plumbing as the thing under
test.

Scale: binary payloads dominate bytes — never shuffle them. Both
operators here are narrow (no shuffle at all); a real pipeline keeps
payloads in parquet binary columns, pushes metadata-only predicates to
the scan, and decodes late, per-partition, inside Arrow batches with
``maxRecordsPerBatch`` bounding executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators import register


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: (media_id, payload binary, media_type,
    declared_bytes). Deterministic — payload = utf-8 bytes of the doc."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.col("n_chars").alias("declared_bytes"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT media_type, COUNT(*) AS n_media,
           CAST(SUM(payload_bytes) AS BIGINT) AS total_bytes,
           MAX(payload_bytes) AS max_bytes
    FROM (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             octet_length(encode(text)) AS payload_bytes
      FROM documents
    ) m
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over binary payloads — all JVM-side
    (octet_length on the binary column; no decode)."""
    m = media_table(spark, sf_dir)
    return (
        m.select("media_type", F.octet_length("payload").alias("payload_bytes"))
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("payload_bytes").alias("total_bytes"),
            F.max("payload_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


DECODE_SCHEMA = (
    "media_id bigint, media_type string, payload_bytes int, "
    "width int, height int, n_frames int, decode_ok boolean"
)


def _codec_probe() -> tuple[object | None, object | None, object | None]:
    """(PIL.Image module, soundfile module, av module — each or None) —
    probed once per interpreter. Executors probe independently (the
    closure ships the FUNCTION, not the probe result), which is what
    you want: a heterogeneous cluster decodes wherever the codec
    exists. The probe only says what COULD decode; whether real decode
    runs at all is the explicit SPARK_GRAFT_REAL_CODECS opt-in
    (see `real_codecs_enabled`)."""
    global _PROBE
    if _PROBE is None:
        try:
            from PIL import Image as _img  # noqa: N813
        except ImportError:
            _img = None
        try:
            import soundfile as _sf
        except ImportError:
            _sf = None
        try:
            import av as _av  # PyAV: the ffmpeg binding for video
        except ImportError:
            _av = None
        _PROBE = (_img, _sf, _av)
    return _PROBE


_PROBE: tuple[object | None, object | None, object | None] | None = None


def real_codecs_enabled() -> bool:
    """The explicit opt-in for real decode: SPARK_GRAFT_REAL_CODECS=1.
    Evaluated on the DRIVER at plan-build time and shipped through the
    closure, so the registered oracle-checked ops stay pinned to the
    deterministic stub unless the operator of the pipeline asked for
    real decode — an importable codec alone never flips behavior."""
    import os

    return os.environ.get("SPARK_GRAFT_REAL_CODECS") == "1"


def _real_decode_meta(
    payload: bytes, media_type: str
) -> tuple[int, int, int] | None:
    """Decode REAL bytes with whatever codec the runtime has; return
    None when no codec for this type is installed (the caller falls
    back to the deterministic stub). Raises on unparseable bytes —
    the caller turns that into a decode_ok=false row, never a fake
    success."""
    img, sf, av = _codec_probe()
    if media_type == "image/png" and img is not None:
        import io

        with img.open(io.BytesIO(bytes(payload))) as im:
            return (im.width, im.height, getattr(im, "n_frames", 1))
    if media_type == "audio/wav" and sf is not None:
        import io

        with sf.SoundFile(io.BytesIO(bytes(payload))) as f:
            return (0, 0, int(f.frames))
    if media_type == "video/mp4" and av is not None:
        import io

        with av.open(io.BytesIO(bytes(payload))) as container:
            vstreams = [s for s in container.streams if s.type == "video"]
            if not vstreams:
                raise ValueError("no video stream")
            vs = vstreams[0]
            n_frames = vs.frames or sum(
                1 for _ in container.decode(video=0)
            )
            return (int(vs.width or 0), int(vs.height or 0), int(n_frames))
    return None


def _fake_decode_meta(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """STUB decode — the hermetic fallback when `_codec_probe` finds no
    codec for the type (see module docstring). Deterministic fake:
    dimensions derived from payload length so tests are stable.

    Raises NotImplementedError for unknown media types, marking the
    decode boundary explicitly.
    """
    n = len(payload)
    if media_type == "image/png":
        return (64 + n % 640, 64 + n % 480, 1)
    if media_type == "audio/wav":
        return (0, 0, 1 + n % 1000)  # n_frames ~ samples
    if media_type == "video/mp4":
        return (320, 240, 1 + n % 300)
    raise NotImplementedError(f"no decoder for {media_type}")


def decode_media(df: DataFrame, real: bool | None = None) -> DataFrame:
    """`mapInPandas` decode: Arrow-batched, per-partition, zero shuffle.

    The UDF sees pandas DataFrames (one per Arrow batch) and yields
    batches — the 100 TB-safe shape for any Python-side media work.

    ``real=None`` (the registered-op default) resolves to the
    SPARK_GRAFT_REAL_CODECS opt-in on the driver; the resolved boolean
    ships in the closure so every executor agrees. real=False pins the
    deterministic stub; real=True decodes with whatever codec each
    worker can import, stub-falls-back per type when none exists, and
    reports unparseable bytes as decode_ok=false.
    """
    use_real = real_codecs_enabled() if real is None else real

    def decode_one(payload: bytes, media_type: str) -> tuple[int, int, int, bool]:
        if use_real:
            try:
                real_meta = _real_decode_meta(payload, media_type)
            except Exception:
                return (0, 0, 0, False)  # codec present, bytes unparseable
            if real_meta is not None:
                return (*real_meta, True)
        return (*_fake_decode_meta(payload, media_type), True)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                decode_one(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "decode_ok": [m[3] for m in meta],
                }
            )

    return df.mapInPandas(decode_batches, DECODE_SCHEMA)


@register(
    "multimodal_decode_pipeline",
    # The decode stub is pure arithmetic on payload length (and the
    # corpus is ASCII at every SF: octet_length == length, verified),
    # so even the Python-side pipeline has an exact SQL twin.
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             CAST(octet_length(encode(text)) AS INTEGER) AS pb
      FROM documents
    ),
    d AS (
      SELECT media_type, pb,
             CASE WHEN media_type = 'image/png' THEN 64 + pb % 640
                  WHEN media_type = 'audio/wav' THEN 0 ELSE 320 END AS w,
             CASE WHEN media_type = 'image/png' THEN 64 + pb % 480
                  WHEN media_type = 'audio/wav' THEN 0 ELSE 240 END AS h,
             CASE WHEN media_type = 'image/png' THEN 1
                  WHEN media_type = 'audio/wav' THEN 1 + pb % 1000
                  ELSE 1 + pb % 300 END AS fr
      FROM m
    )
    SELECT media_type, COUNT(*) AS n_decoded,
           CAST(SUM(pb) AS BIGINT) AS total_bytes,
           CAST(MAX(w) AS INTEGER) AS max_width,
           CAST(MAX(h) AS INTEGER) AS max_height,
           CAST(MAX(fr) AS INTEGER) AS max_frames
    FROM d GROUP BY media_type ORDER BY media_type
    """,
)
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media pipeline: binary table → mapInPandas decode (stub)
    → per-type feature aggregation. The stub is deterministic arithmetic
    on payload length, so the oracle replays it exactly in SQL — the
    Arrow/mapInPandas plumbing is what's actually under test."""
    decoded = decode_media(media_table(spark, sf_dir))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_decoded"),
            F.sum("payload_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("media_type")
    )


FRAME_SCHEMA = "media_id bigint, frame_idx int, byte_offset int, frame_hash string"


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: emit every ``every_n_bytes``-th
    position as a 'frame' (stub for ffmpeg keyframe extraction — no
    codecs in this container), up to ``max_frames`` per media item.
    One input row fans out to N output rows inside the same Arrow batch —
    the standard decode-fan-out shape.
    """
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "byte_offset": [], "frame_hash": []
            }
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video/mp4":
                    continue
                for idx in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    off = idx * every_n_bytes
                    chunk = bytes(payload[off : off + every_n_bytes])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["byte_offset"].append(off)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(frames, FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    # ASCII corpus ⇒ byte offsets == character offsets, so the md5 of
    # each 64-byte chunk is md5(substring(text, off+1, 64)).
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             CAST(octet_length(encode(text)) AS INTEGER) AS pb
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT media_id, CAST(i * 64 AS INTEGER) AS byte_offset,
             md5(substring(text, i * 64 + 1, 64)) AS frame_hash
      FROM m, unnest(generate_series(0, least(8, greatest(1, pb // 64)) - 1)) AS u(i)
    )
    SELECT media_id, COUNT(*) AS n_frames_sampled,
           CAST(MAX(byte_offset) AS INTEGER) AS last_offset,
           MIN(frame_hash) AS min_frame_hash
    FROM f GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling pipeline: media table -> mapInPandas frame
    fan-out -> per-media frame counts. Deterministic (md5 of payload
    chunks), exactly replayed by the SQL oracle."""
    frames = sample_frames(media_table(spark, sf_dir))
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.max("byte_offset").alias("last_offset"),
            F.min("frame_hash").alias("min_frame_hash"),
        )
        .orderBy("media_id")
    )


SEGMENT_SCHEMA = (
    "media_id bigint, seg_idx int, seg_start int, seg_len int, seg_hash string"
)


def chunk_audio(
    df: DataFrame, seg_bytes: int = 48, hop_bytes: int = 32, max_segs: int = 16
) -> DataFrame:
    """Overlapping audio segmentation: fixed-size windows every
    ``hop_bytes`` (hop < window ⇒ overlap, the ASR/feature-extraction
    framing). Stub for a real sample-accurate segmenter (no audio codecs
    in this container) — the fan-out shape, batch iteration, and
    deterministic hashing are the real plumbing.
    """
    import hashlib

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "seg_idx": [], "seg_start": [],
                "seg_len": [], "seg_hash": [],
            }
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "audio/wav":
                    continue
                n = len(payload)
                idx = 0
                for start in range(0, max(1, n - seg_bytes + 1), hop_bytes):
                    if idx >= max_segs:
                        break
                    chunk = bytes(payload[start : start + seg_bytes])
                    out["media_id"].append(mid)
                    out["seg_idx"].append(idx)
                    out["seg_start"].append(start)
                    out["seg_len"].append(len(chunk))
                    out["seg_hash"].append(hashlib.md5(chunk).hexdigest())
                    idx += 1
            yield pd.DataFrame(out)

    return df.mapInPandas(segs, SEGMENT_SCHEMA)


@register(
    "multimodal_audio_segments",
    # starts = 0, 32, 64, … < max(1, pb-47), capped at 16 segments;
    # ceil(U/32) = (U+31)//32 with U = greatest(1, pb-47).
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             CAST(octet_length(encode(text)) AS INTEGER) AS pb
      FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (
      SELECT media_id, CAST(i * 32 AS INTEGER) AS seg_start,
             CAST(least(48, pb - i * 32) AS INTEGER) AS seg_len,
             md5(substring(text, i * 32 + 1, 48)) AS seg_hash
      FROM m, unnest(generate_series(
               0, least(15, (greatest(1, pb - 47) + 31) // 32 - 1))) AS u(i)
    )
    SELECT media_id, COUNT(*) AS n_segments,
           CAST(MAX(seg_start) AS INTEGER) AS last_start,
           CAST(SUM(seg_len) AS BIGINT) AS bytes_covered,
           MIN(seg_hash) AS min_seg_hash
    FROM s GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation pipeline: media table -> overlapping-window
    fan-out (mapInPandas) -> per-media segment stats. Deterministic and
    exactly replayed by the SQL oracle.

    Scale: like frame sampling, the binary payload is read once per
    partition inside an Arrow batch and never shuffled — only the
    (media_id, seg meta) rows move; segments that feed a model go
    straight into the inference UDF in the same stage.
    """
    segs = chunk_audio(media_table(spark, sf_dir))
    return (
        segs.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.max("seg_start").alias("last_start"),
            F.sum("seg_len").alias("bytes_covered"),
            F.min("seg_hash").alias("min_seg_hash"),
        )
        .orderBy("media_id")
    )


#: Chunk size in BYTES for content-chunk dedup (128 hex chars).
_CHUNK_BYTES = 64


@register(
    "media_chunk_dedup",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             hex(encode(text)) AS h
      FROM documents),
    chunks AS (
      SELECT media_type,
             md5(substring(h, (g.i - 1) * {2 * _CHUNK_BYTES} + 1,
                           {2 * _CHUNK_BYTES})) AS chash,
             length(substring(h, (g.i - 1) * {2 * _CHUNK_BYTES} + 1,
                              {2 * _CHUNK_BYTES})) // 2 AS cbytes
      FROM m, unnest(generate_series(1,
             CAST(ceil(length(h) / {2.0 * _CHUNK_BYTES}) AS BIGINT))) AS g(i)),
    per_hash AS (
      SELECT media_type, chash,
             COUNT(*) AS cnt, MAX(cbytes) AS cbytes
      FROM chunks GROUP BY media_type, chash)
    SELECT media_type,
           CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           COUNT(*) AS n_distinct_chunks,
           CAST(SUM((cnt - 1) * cbytes) AS BIGINT) AS dedup_savings_bytes
    FROM per_hash
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def media_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free content-chunk dedup over binary payloads: every media
    blob splits into fixed {_CHUNK_BYTES}-byte chunks, chunks hash, and
    identical chunks across the corpus count as dedupe-able storage —
    the block-level dedup estimate every media lake runs BEFORE paying
    for decode (shared intros, repeated frames, templated assets all
    surface as repeated chunks). Fully real — unlike the decode stubs,
    no codec is involved.

    Scale: the payload never shuffles — chunk hashes do (16 bytes per
    {_CHUNK_BYTES}-byte chunk, a 4× reduction in flight); chunking is
    hex + substring + md5 inside whole-stage codegen (no Python, no
    UDF), and the rollup is two map-side-combined aggregations. At
    rolling-hash (CDC) granularity the same plan applies — only the
    boundary expression changes.
    """
    m = media_table(spark, sf_dir).select(
        "media_type", F.hex("payload").alias("h")
    )
    n_chunks = F.ceil(F.length("h") / (2.0 * _CHUNK_BYTES)).cast("bigint")
    chunk_hex = F.expr(
        f"substring(h, (i - 1) * {2 * _CHUNK_BYTES} + 1, {2 * _CHUNK_BYTES})"
    )
    chunks = (
        m.select(
            "media_type",
            "h",
            F.explode(F.sequence(F.lit(1).cast("bigint"), n_chunks)).alias("i"),
        )
        .select(
            "media_type",
            F.md5(chunk_hex).alias("chash"),
            (F.length(chunk_hex) / 2).cast("bigint").alias("cbytes"),
        )
    )
    per_hash = chunks.groupBy("media_type", "chash").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("cbytes").alias("cbytes")
    )
    return (
        per_hash.groupBy("media_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_distinct_chunks"),
            F.sum((F.col("cnt") - 1) * F.col("cbytes"))
            .cast("bigint")
            .alias("dedup_savings_bytes"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# Order-sensitive media sequence fingerprints (re-encode/reorder detector)
# ---------------------------------------------------------------------------

@register(
    "media_sequence_fingerprint",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             hex(encode(text)) AS h
      FROM documents WHERE text IS NOT NULL),
    chunks AS (
      SELECT doc_id, media_type, g.i AS idx,
             md5(substring(h, (g.i - 1) * {2 * _CHUNK_BYTES} + 1,
                           {2 * _CHUNK_BYTES})) AS chash
      FROM m, unnest(generate_series(1,
             CAST(ceil(length(h) / {2.0 * _CHUNK_BYTES}) AS BIGINT))) AS g(i)),
    fp AS (
      SELECT doc_id, media_type,
             md5(string_agg(chash, '' ORDER BY idx)) AS seq_fp,
             md5(string_agg(chash, '' ORDER BY chash)) AS set_fp
      FROM chunks GROUP BY doc_id, media_type)
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT seq_fp) AS BIGINT) AS n_seq_groups,
           CAST(COUNT(DISTINCT set_fp) AS BIGINT) AS n_set_groups,
           CAST(COUNT(DISTINCT seq_fp) - COUNT(DISTINCT set_fp) AS BIGINT)
             AS reordered_groups
    FROM fp GROUP BY media_type ORDER BY media_type
    """,
)
def media_sequence_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-SENSITIVE vs order-insensitive media fingerprints: the
    sequence fingerprint hashes the chunk-hash stream in stream order,
    the set fingerprint hashes it sorted — their group-count gap counts
    payloads built from the same blocks in a different arrangement
    (remuxed/reordered media, shuffled shard concatenations) that
    media_chunk_dedup's block-level view cannot distinguish.

    Scale: chunking is the same per-row codegen'd substring fan-out as
    media_chunk_dedup (payload bytes never shuffle — only 16-byte chunk
    hashes move); both fingerprints reduce per doc in ONE
    sort-within-group aggregation, and the readout is a |types|-row
    distinct-count rollup.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    m = d.select(
        "doc_id",
        media_type.alias("media_type"),
        F.upper(F.hex(F.encode("text", "UTF-8"))).alias("h"),
    )
    width = 2 * _CHUNK_BYTES
    chunks = m.select(
        "doc_id",
        "media_type",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, CAST(ceil(length(h) / {float(width)})"
                f" AS INT)), i -> md5(substring(h, (i-1)*{width}+1, {width})))"
            )
        ).alias("idx", "chash"),
    )
    fp = chunks.groupBy("doc_id", "media_type").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "chash"))
                    ),
                    lambda s: s.getField("chash"),
                ),
                "",
            )
        ).alias("seq_fp"),
        F.md5(F.array_join(F.array_sort(F.collect_list("chash")), "")).alias(
            "set_fp"
        ),
    )
    return (
        fp.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.countDistinct("seq_fp").cast("bigint").alias("n_seq_groups"),
            F.countDistinct("set_fp").cast("bigint").alias("n_set_groups"),
            (F.countDistinct("seq_fp") - F.countDistinct("set_fp"))
            .cast("bigint")
            .alias("reordered_groups"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# Byte-entropy profile per media type (compression/encryption detector)
# ---------------------------------------------------------------------------

@register(
    "media_byte_entropy",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             hex(encode(text)) AS h
      FROM documents WHERE text IS NOT NULL),
    b AS (
      SELECT media_type, substring(h, g.i * 2 - 1, 2) AS byte
      FROM m, unnest(generate_series(1, CAST(length(h) // 2 AS BIGINT)))
        AS g(i)),
    c AS (
      SELECT media_type, byte, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2),
    t AS (
      SELECT media_type, byte, c,
             CAST(SUM(c) OVER (PARTITION BY media_type) AS BIGINT) AS n
      FROM c)
    SELECT media_type, CAST(MAX(n) AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
           CAST(SUM(CAST(round((CAST(c AS DOUBLE) / n)
               * log2(CAST(n AS DOUBLE) / c) * 1000000000, 0) AS BIGINT))
             AS BIGINT) AS entropy_bits_nano
    FROM t GROUP BY media_type ORDER BY media_type
    """,
)
def media_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon byte-entropy per media type — the codec-free
    compression/encryption detector: plaintext payloads sit near 4-5
    bits/byte, well-compressed or encrypted media near 8; a 'video'
    feed reading like text is mislabeled, and text reading like noise
    is binary contamination.

    Scale: per-partition byte HISTOGRAMS are built inside one
    ``mapInArrow`` pass (numpy bincount over the Arrow string buffer —
    the payload bytes are already contiguous utf-8 in the batch, so no
    per-byte row ever exists in the JVM and the payload never shuffles);
    only ≤ |types|×256 partial-count rows per partition cross the
    exchange. Counts are exact integers, so the result is bit-identical
    to the former explode-per-byte plan (r11, guide §4.2). The byte key
    is the integer byte value (the former hex-pair string, 1:1 — only
    distinctness and counts feed the output). The per-byte surprisal
    terms quantize to nanoticks before the final ≤256-row sum per type,
    per the engine's entropy discipline.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    m = d.select(
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        "text",
    )

    def _byte_hist(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        types = ("audio/wav", "image/png", "video/mp4")
        for batch in batches:
            mt = batch.column("media_type")
            txt = batch.column("text")
            out_t: list[str] = []
            out_b: list[int] = []
            out_c: list[int] = []
            for val in types:
                sub = pc.filter(txt, pc.equal(mt, val))
                if isinstance(sub, pa.ChunkedArray):
                    sub = sub.combine_chunks()
                if len(sub) == 0:
                    continue
                # StringArray buffers: [validity, offsets, utf-8 data].
                # The filtered array starts at offset 0, so the value
                # region is offsets[0]..offsets[-1] of the data buffer.
                if sub.buffers()[2] is None:
                    continue
                off_dt = (
                    np.int64
                    if pa.types.is_large_string(sub.type)
                    else np.int32
                )
                offs = np.frombuffer(sub.buffers()[1], dtype=off_dt)[
                    sub.offset : sub.offset + len(sub) + 1
                ]
                data = np.frombuffer(sub.buffers()[2], dtype=np.uint8)[
                    offs[0] : offs[-1]
                ]
                counts = np.bincount(data, minlength=256)
                nz = np.nonzero(counts)[0]
                out_t.extend([val] * len(nz))
                out_b.extend(int(x) for x in nz)
                out_c.extend(int(x) for x in counts[nz])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_t, pa.string()),
                    pa.array(out_b, pa.int32()),
                    pa.array(out_c, pa.int64()),
                ],
                names=["media_type", "byte", "c"],
            )

    partials = m.mapInArrow(
        _byte_hist, "media_type string, byte int, c bigint"
    )
    c = partials.groupBy("media_type", "byte").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    from pyspark.sql import Window as _W

    n = F.sum("c").over(_W.partitionBy("media_type")).cast("bigint")
    t = c.withColumn("n", n)
    term = F.round(
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(F.col("n").cast("double") / F.col("c"))
        * 1_000_000_000,
        0,
    ).cast("bigint")
    return (
        t.groupBy("media_type")
        .agg(
            F.max("n").cast("bigint").alias("n_bytes"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bytes"),
            F.sum(term).cast("bigint").alias("entropy_bits_nano"),
        )
        .orderBy("media_type")
    )


@register(
    "media_format_sniff",
    oracle=r"""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             substr(text, 1, 4) AS head,
             octet_length(encode(text)) AS payload_bytes
      FROM documents WHERE text IS NOT NULL),
    s AS (
      SELECT media_type,
             CASE WHEN head = '' THEN 'empty'
                  WHEN substr(head, 1, 1) = '<' THEN 'markup'
                  WHEN substr(head, 1, 1) IN ('{', '[') THEN 'json'
                  WHEN substr(head, 1, 4) = '%PDF' THEN 'pdf'
                  WHEN substr(head, 1, 1) IN ('&', '#') THEN 'escaped'
                  ELSE 'text' END AS sniffed,
             payload_bytes
      FROM m)
    SELECT media_type, sniffed,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(payload_bytes) AS BIGINT) AS total_bytes
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def media_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format sniffing vs the DECLARED media type — the
    governance matrix that catches mislabeled/corrupted payloads before
    a decode pass wastes GPU time on them (every declared type here
    sniffs as text because the synthetic payloads are document bytes —
    the matrix SHOWS that, which is exactly the audit's job; on real
    media the sniffer keys off PNG/JPEG/RIFF/ftyp magics — the '%PDF'
    arm is live either way).

    Scale: the sniff reads ONLY the payload head (a 4-byte projection —
    columnar parquet never materializes the payload for it when the
    head is derived at write time; here the prefix substring is
    JVM-side codegen and payloads never shuffle — the output is the
    |types|×|classes| matrix).
    """
    m = media_table(spark, sf_dir).filter(F.col("payload").isNotNull())
    head = F.decode(F.expr("substring(payload, 1, 4)"), "UTF-8")
    s = m.select(
        "media_type",
        F.when(head == "", "empty")
        .when(F.substring(head, 1, 1) == "<", "markup")
        .when(F.substring(head, 1, 1).isin("{", "["), "json")
        .when(F.substring(head, 1, 4) == "%PDF", "pdf")
        .when(F.substring(head, 1, 1).isin("&", "#"), "escaped")
        .otherwise("text")
        .alias("sniffed"),
        F.octet_length("payload").alias("payload_bytes"),
    )
    return (
        s.groupBy("media_type", "sniffed")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("payload_bytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("media_type", "sniffed")
    )
