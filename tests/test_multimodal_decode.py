"""The decode gate (r6, closing the r5 ADVICE medium): real decode is
an EXPLICIT opt-in (SPARK_GRAFT_REAL_CODECS=1) on top of the codec
import probe — without the opt-in the pipeline is pinned to the
deterministic stub even when a codec is importable, so the registered
oracle-checked ops are hermetic in every environment. With the opt-in
and a codec, decode is real and honest about unparseable bytes
(decode_ok=false, never a fake success). Video decode (PyAV) joins the
image/audio probes as the third conditional branch."""

from __future__ import annotations

import pytest

from ai_etl_studio_spark.operators.multimodal import (
    _codec_probe,
    _fake_decode_meta,
    _real_decode_meta,
    decode_media,
    media_table,
    real_codecs_enabled,
)
from tests.conftest import SF_DIR

_HAS_PIL = _codec_probe()[0] is not None
_HAS_SF = _codec_probe()[1] is not None
_HAS_AV = _codec_probe()[2] is not None


def test_default_is_stub_identical(spark):
    """WITHOUT the opt-in the pipeline must emit EXACTLY the stub rows
    regardless of which codecs happen to be importable — the hermetic
    guarantee the DuckDB oracles rely on (the r5 ADVICE failure mode:
    Pillow importable as a transitive dep flipped the registered ops
    to decode_ok=false on the synthetic text-byte payloads)."""
    assert not real_codecs_enabled(), (
        "SPARK_GRAFT_REAL_CODECS must not be set in the test environment"
    )
    m = media_table(spark, SF_DIR).limit(50)
    rows = decode_media(m).collect()
    assert rows
    for r in rows:
        payload_len = r["payload_bytes"]
        w, h, n = _fake_decode_meta(b"x" * payload_len, r["media_type"])
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["decode_ok"] is True


def test_real_true_on_text_bytes_is_honest(spark):
    """real=True on non-media bytes: with a codec importable the rows
    must surface decode_ok=false (honest failure); with no codec the
    stub fallback keeps decode_ok=true — either way, never a fake
    success claiming REAL dimensions."""
    m = media_table(spark, SF_DIR).limit(9)
    rows = decode_media(m, real=True).collect()
    assert rows
    by_codec = {"image/png": _HAS_PIL, "audio/wav": _HAS_SF, "video/mp4": _HAS_AV}
    for r in rows:
        if by_codec[r["media_type"]]:
            assert r["decode_ok"] is False
            assert (r["width"], r["height"], r["n_frames"]) == (0, 0, 0)
        else:
            assert r["decode_ok"] is True  # stub fallback


def test_real_decode_returns_none_without_codec():
    if _HAS_PIL:
        pytest.skip("PIL installed")
    assert _real_decode_meta(b"\x89PNG\r\n", "image/png") is None


def test_real_video_decode_returns_none_without_codec():
    if _HAS_AV:
        pytest.skip("PyAV installed")
    assert _real_decode_meta(b"\x00\x00\x00\x18ftypmp42", "video/mp4") is None


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed")
def test_real_png_decode(spark):
    """Conditional: a REAL 7x3 PNG decodes to its true dimensions and
    garbage bytes surface as decode_ok=false."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    good = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(good), "image/png", len(good)),
         (2, bytearray(b"not a png"), "image/png", 9)],
        "media_id long, payload binary, media_type string, declared_bytes long",
    )
    rows = {r["media_id"]: r for r in decode_media(df, real=True).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["decode_ok"]) == (7, 3, True)
    assert rows[2]["decode_ok"] is False


@pytest.mark.skipif(not _HAS_SF, reason="soundfile not installed")
def test_real_wav_decode(spark):
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    sf.write(buf, np.zeros(123, dtype="float32"), 8000, format="WAV")
    good = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(good), "audio/wav", len(good))],
        "media_id long, payload binary, media_type string, declared_bytes long",
    )
    r = decode_media(df, real=True).collect()[0]
    assert (r["n_frames"], r["decode_ok"]) == (123, True)


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed")
def test_real_video_decode(spark):
    """Conditional: a REAL 16x8 2-frame mp4 decodes to its true
    dimensions/frame count and garbage bytes surface as
    decode_ok=false."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("h264", rate=4)
        stream.width, stream.height, stream.pix_fmt = 16, 8, "yuv420p"
        for _ in range(2):
            frame = av.VideoFrame.from_ndarray(
                np.zeros((8, 16, 3), dtype="uint8"), format="rgb24"
            )
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    good = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(good), "video/mp4", len(good)),
         (2, bytearray(b"not an mp4"), "video/mp4", 10)],
        "media_id long, payload binary, media_type string, declared_bytes long",
    )
    rows = {r["media_id"]: r for r in decode_media(df, real=True).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (16, 8)
    assert rows[1]["n_frames"] == 2
    assert rows[1]["decode_ok"] is True
    assert rows[2]["decode_ok"] is False
