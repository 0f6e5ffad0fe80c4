"""The decode capability probe (r5): hermetic in this container (no
codecs -> deterministic stub, oracle rows unchanged), real when a codec
library is importable (conditional tests), and honest about unparseable
bytes (decode_ok=false, never a fake success)."""

from __future__ import annotations

import pytest

from ai_etl_studio_spark.operators.multimodal import (
    _codec_probe,
    _fake_decode_meta,
    _real_decode_meta,
    decode_media,
    media_table,
)
from tests.conftest import SF_DIR

_HAS_PIL = _codec_probe()[0] is not None
_HAS_SF = _codec_probe()[1] is not None


def test_probe_fallback_is_stub_identical(spark):
    """With no codec installed the pipeline must emit EXACTLY the stub
    rows (the hermetic guarantee the DuckDB oracles rely on). With a
    codec installed the synthetic payloads are not real media, so this
    identity is only asserted codec-free."""
    if _HAS_PIL or _HAS_SF:
        pytest.skip("codec installed — sandbox identity not applicable")
    m = media_table(spark, SF_DIR).limit(50)
    rows = decode_media(m).collect()
    assert rows
    for r in rows:
        payload_len = r["payload_bytes"]
        w, h, n = _fake_decode_meta(b"x" * payload_len, r["media_type"])
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["decode_ok"] is True


def test_real_decode_returns_none_without_codec():
    if _HAS_PIL:
        pytest.skip("PIL installed")
    assert _real_decode_meta(b"\x89PNG\r\n", "image/png") is None


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
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
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
    r = decode_media(df).collect()[0]
    assert (r["n_frames"], r["decode_ok"]) == (123, True)
