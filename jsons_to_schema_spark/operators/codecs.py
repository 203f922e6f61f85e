"""Real media codecs from the Python STANDARD LIBRARY only (r3).

The container has no PIL/ffmpeg, but three formats are genuinely decodable
with stdlib + numpy, which is enough to make the multimodal seam REAL for
them instead of a stub:

* WAV  (RIFF/PCM)  — ``wave`` module: sample rate, channels, width, frames,
  duration, RMS amplitude (numpy over the raw frames).
* BMP  (Windows DIB, uncompressed 24/32-bpp) — fixed-offset header parse
  (``struct``): dimensions + mean RGB over the padded pixel array.
* PPM  (P6 binary) — whitespace-token header + raw RGB: dimensions +
  mean RGB.

Everything else (JPEG/PNG/MP4/...) genuinely requires external codec
libraries and stays behind ``NotImplementedError`` — that seam is now a
per-FORMAT boundary, not a blanket one.

All functions are pure bytes→dict (no Spark imports): they run inside
Arrow-batched ``mapInPandas`` stages (operators/multimodal.py) and are unit
tested directly in microseconds.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_WIDTHS = {1: np.int8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniffer for the stdlib-decodable formats; None = unknown."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P3"):
        return "ppm"
    return None


def decode_wav(payload: bytes) -> dict:
    """PCM WAV → {format, width, height, duration_ms, sample_rate, channels,
    mean_value}.  mean_value is the RMS amplitude over all samples (all
    channels interleaved) — for a constant-amplitude signal it equals the
    amplitude exactly, which is what the driver oracle exploits."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth not in _WIDTHS:
        raise NotImplementedError(f"WAV sample width {sampwidth} unsupported")
    if sampwidth == 1:
        # 8-bit PCM WAV stores UNSIGNED bytes with a 128 midpoint (review
        # r3: reading them as int8 reported RMS 128 for digital silence)
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        samples = np.frombuffer(raw, dtype=_WIDTHS[sampwidth]).astype(np.float64)
    rms = float(np.sqrt(np.mean(samples * samples))) if samples.size else 0.0
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "duration_ms": round(n_frames * 1000 / rate) if rate else 0,
        "sample_rate": rate,
        "channels": channels,
        "mean_value": rms,
    }


def decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24/32-bpp BMP → dimensions + mean over every channel
    byte of the pixel array (rows are 4-byte padded; padding excluded)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BMP core-header variant unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    n_ch = bpp // 8
    abs_h = abs(height)
    row_bytes = width * n_ch
    stride = (row_bytes + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8, count=stride * abs_h, offset=pixel_off)
    rows = arr.reshape(abs_h, stride)[:, :row_bytes]
    mean = float(rows.astype(np.float64).mean()) if rows.size else 0.0
    return {
        "format": "bmp",
        "width": width,
        "height": abs_h,
        "duration_ms": 0,
        "sample_rate": None,
        "channels": n_ch,
        "mean_value": mean,
    }


def decode_ppm(payload: bytes) -> dict:
    """P6 binary PPM → dimensions + mean over the raw RGB bytes."""
    if payload[:2] != b"P6":
        raise NotImplementedError("only binary P6 PPM supported")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comments starting '#' skipped), then a single whitespace byte, then
    # raw RGB.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval >= 256:
        raise NotImplementedError("16-bit PPM unsupported")
    n = width * height * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    mean = float(arr.astype(np.float64).mean()) if arr.size else 0.0
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "duration_ms": 0,
        "sample_rate": None,
        "channels": 3,
        "mean_value": mean,
    }


_DECODERS = {"wav": decode_wav, "bmp": decode_bmp, "ppm": decode_ppm}


def decode_media(payload: bytes) -> dict:
    """Sniff + decode.  Raises NotImplementedError for formats that truly
    need external libraries (JPEG/PNG/MP4/...)."""
    fmt = sniff_format(payload or b"")
    if fmt is None:
        head = bytes(payload[:8] if payload else b"")
        raise NotImplementedError(
            f"no stdlib codec for payload starting {head!r}: JPEG/PNG/MP4 "
            "etc. require external libraries (PIL/ffmpeg) not present in "
            "this environment"
        )
    return _DECODERS[fmt](payload)


# ---------------------------------------------------------------------------
# Encoders for the deterministic test/driver payloads (synthesis only —
# production data arrives already encoded).
# ---------------------------------------------------------------------------

def encode_wav(
    n_frames: int, amplitude: int, rate: int = 8000, channels: int = 1
) -> bytes:
    """Constant-amplitude 16-bit PCM WAV (RMS == amplitude exactly)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            np.full(n_frames * channels, amplitude, dtype="<i2").tobytes()
        )
    return buf.getvalue()


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Uncompressed 24-bpp bottom-up BMP filled with one BGR color."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pixel_bytes = stride * height
    b, g, r = rgb[2], rgb[1], rgb[0]
    row = (bytes((b, g, r)) * width) + b"\x00" * (stride - row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + row * height


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Binary P6 PPM filled with one RGB color."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)
