"""Stdlib media codecs (r3): pure round-trip tests, no Spark."""

import numpy as np
import pytest

from jsons_to_schema_spark.operators import codecs


def test_wav_roundtrip():
    p = codecs.encode_wav(n_frames=1600, amplitude=1234, rate=8000, channels=2)
    d = codecs.decode_media(p)
    assert d["format"] == "wav"
    assert d["sample_rate"] == 8000
    assert d["channels"] == 2
    assert d["duration_ms"] == 200
    assert d["mean_value"] == pytest.approx(1234.0)
    assert d["width"] is None and d["height"] is None


def test_wav_rms_nonconstant():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        samples = np.array([3, -4, 0, 5], dtype="<i2")
        w.writeframes(samples.tobytes())
    d = codecs.decode_wav(buf.getvalue())
    assert d["mean_value"] == pytest.approx(np.sqrt((9 + 16 + 0 + 25) / 4))
    assert d["duration_ms"] == 0  # 4 frames / 44100 rounds to 0 ms


def test_bmp_roundtrip_with_row_padding():
    # width=3 -> row_bytes=9, stride=12: padding must be EXCLUDED from mean
    p = codecs.encode_bmp(3, 2, (10, 20, 30))
    d = codecs.decode_media(p)
    assert (d["format"], d["width"], d["height"], d["channels"]) == ("bmp", 3, 2, 3)
    assert d["mean_value"] == pytest.approx(20.0)


def test_ppm_roundtrip():
    p = codecs.encode_ppm(5, 4, (0, 100, 200))
    d = codecs.decode_media(p)
    assert (d["format"], d["width"], d["height"]) == ("ppm", 5, 4)
    assert d["mean_value"] == pytest.approx(100.0)


def test_ppm_header_comments():
    p = codecs.encode_ppm(2, 2, (9, 9, 9))
    commented = b"P6\n# a comment\n2 2\n255\n" + p.split(b"255\n", 1)[1]
    d = codecs.decode_ppm(commented)
    assert (d["width"], d["height"]) == (2, 2)
    assert d["mean_value"] == pytest.approx(9.0)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="external libraries"):
        codecs.decode_media(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        codecs.decode_media(b"")


def test_sniff():
    assert codecs.sniff_format(codecs.encode_wav(8, 1)) == "wav"
    assert codecs.sniff_format(codecs.encode_bmp(1, 1, (1, 1, 1))) == "bmp"
    assert codecs.sniff_format(codecs.encode_ppm(1, 1, (1, 1, 1))) == "ppm"
    assert codecs.sniff_format(b"\xff\xd8\xff") is None  # JPEG needs a real lib


def test_decode_wav_8bit_unsigned_midpoint():
    """8-bit PCM is unsigned with a 128 midpoint: digital silence (all
    0x80 bytes) must decode to RMS 0, full-scale alternation to ~127."""
    import io
    import wave

    from jsons_to_schema_spark.operators.codecs import decode_wav

    def wav8(samples: bytes, rate: int = 8000) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(rate)
            w.writeframes(samples)
        return buf.getvalue()

    silence = decode_wav(wav8(b"\x80" * 800))
    assert silence["mean_value"] == 0.0
    assert silence["duration_ms"] == 100
    loud = decode_wav(wav8(bytes([255, 1]) * 400))
    assert abs(loud["mean_value"] - 127.0) < 0.01
