"""Real media codecs from the Python STANDARD LIBRARY only (r3; PNG r4).

The container has no PIL/ffmpeg, but four formats are genuinely decodable
with stdlib + numpy, which is enough to make the multimodal seam REAL for
them instead of a stub:

* WAV  (RIFF/PCM)  — ``wave`` module: sample rate, channels, width, frames,
  duration, RMS amplitude (numpy over the raw frames).
* BMP  (Windows DIB, uncompressed 24/32-bpp) — fixed-offset header parse
  (``struct``): dimensions + mean RGB over the padded pixel array.
* PPM  (P6 binary) — whitespace-token header + raw RGB: dimensions +
  mean RGB.
* PNG  (r4, VERDICT item 4) — ``zlib`` inflate + full scanline
  UNFILTERING (None/Sub/Up/Average/Paeth), 8-bit gray / gray+alpha /
  RGB / RGBA / palette, non-interlaced: dimensions + channel mean.

Everything else (JPEG/MP4/... and PNG's interlaced/16-bit variants)
genuinely requires external codec libraries and stays behind
``NotImplementedError`` — that seam is a per-FORMAT boundary, not a
blanket one.

All functions are pure bytes→dict (no Spark imports): they run inside
Arrow-batched ``mapInPandas`` stages (operators/multimodal.py) and are unit
tested directly in microseconds.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

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
    if payload[:8] == _PNG_SIG:
        return "png"
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


# PNG color type → samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(filt: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct raw scanlines from filtered ones (PNG §9 filters 0–4).

    filt is (height, 1+stride) — filter-type byte + filtered row.  Sub,
    Average and Paeth recur on the previous PIXEL, so those rows run a
    per-byte loop; Up/None rows stay whole-row numpy ops.  int16/int32
    intermediates avoid uint8 wraparound in the predictors."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(filt[y, 0])
        row = filt[y, 1:].astype(np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = row
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = row
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        prev = cur.astype(np.uint8)
        out[y] = prev
    return out


def decode_png(payload: bytes) -> dict:
    """8-bit non-interlaced PNG → dimensions + mean over every decoded
    channel byte (palette rows expanded through PLTE first, alpha included
    — same "every channel byte" convention as BMP 32-bpp)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, bit_depth, color_type, comp, filt_m, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported (8 only)")
    if color_type not in _PNG_SAMPLES or comp != 0 or filt_m != 0:
        raise NotImplementedError(
            f"PNG color_type={color_type} compression={comp} filter={filt_m} unsupported"
        )
    n_samp = _PNG_SAMPLES[color_type]
    stride = width * n_samp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    pixels = _png_unfilter(raw.reshape(height, stride + 1), height, stride, n_samp)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pixels = plte[pixels.reshape(-1)]
        channels = 3
    else:
        channels = n_samp
    mean = float(pixels.astype(np.float64).mean()) if pixels.size else 0.0
    return {
        "format": "png",
        "width": width,
        "height": height,
        "duration_ms": 0,
        "sample_rate": None,
        "channels": channels,
        "mean_value": mean,
    }


_DECODERS = {"wav": decode_wav, "bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png}


def decode_media(payload: bytes) -> dict:
    """Sniff + decode.  Raises NotImplementedError for formats that truly
    need external libraries (JPEG/MP4/...)."""
    fmt = sniff_format(payload or b"")
    if fmt is None:
        head = bytes(payload[:8] if payload else b"")
        raise NotImplementedError(
            f"no stdlib codec for payload starting {head!r}: JPEG/MP4 "
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


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    rgb: tuple[int, int, int] | None = None,
    pixels: "np.ndarray | None" = None,
    filter_type: int = 0,
) -> bytes:
    """8-bit non-interlaced PNG for deterministic test payloads: either a
    solid ``rgb`` fill or an explicit ``pixels`` array of shape (h, w)
    grayscale, (h, w, 2) gray+alpha, (h, w, 3) RGB, or (h, w, 4) RGBA.
    ``filter_type`` applies the SAME PNG filter (0–4) to every scanline —
    letting tests drive each unfilter branch against an arithmetic oracle."""
    if pixels is None:
        if rgb is None:
            raise ValueError("encode_png: pass rgb or pixels")
        pixels = np.tile(np.array(rgb, dtype=np.uint8), (height, width, 1))
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, n_ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[n_ch]
    raw = pixels.reshape(h, w * n_ch).astype(np.int32)
    bpp = n_ch
    stride = w * n_ch
    rows = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            filt = (cur - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError(f"filter_type {filter_type} invalid")
        rows += bytes([filter_type]) + filt.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )
