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
* MP4  (r4) — ISO BMFF CONTAINER demux (``struct`` box walk): video-track
  geometry, duration, and the full sample table (stts/stsz/stsc/stco/
  co64/stss) → real per-frame byte ranges, timestamps, and keyframe
  flags.  Coded-frame pixel decode (H.264 etc.) stays the seam.

Everything else (JPEG, coded video frames, and PNG's interlaced/16-bit
variants) genuinely requires external codec libraries and stays behind
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
    if payload[4:8] == b"ftyp":
        return "mp4"
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


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF structural demux (r4).  Decoding the CODED FRAMES (H.264
# etc.) genuinely needs external codec libraries — but the CONTAINER is pure
# struct: box walk → moov → trak(vide) → stbl sample tables gives real
# per-frame byte ranges, timestamps, and sync (keyframe) flags.  That is
# exactly what a 100-TB video pipeline needs Spark-side: plan frame work
# items (offset, size, pts, seek point) without shipping or decoding
# payloads; the per-frame pixel decode stays the per-format seam.
# ---------------------------------------------------------------------------


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO BMFF box in range."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"mp4: corrupt box size {size} at offset {pos}")
        yield btype, pos + header, pos + size
        pos += size


def _find_box(buf: bytes, start: int, end: int, path: tuple[bytes, ...]):
    """Locate the first box matching the container path; (start,end) or None."""
    for btype, s, e in _walk_boxes(buf, start, end):
        if btype == path[0]:
            return (s, e) if len(path) == 1 else _find_box(buf, s, e, path[1:])
    return None


def _full_box(buf: bytes, start: int) -> tuple[int, int]:
    """(version, flags) of a full box whose body starts at ``start``."""
    vf = struct.unpack_from(">I", buf, start)[0]
    return vf >> 24, vf & 0xFFFFFF


def _u32s(buf: bytes, pos: int, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=">u4", count=n, offset=pos).astype(np.int64)


def parse_mp4(payload: bytes) -> dict:
    """ISO BMFF container parse: first video track's geometry + full sample
    table.  Returns {width, height, timescale, duration_units, n_frames,
    sizes, offsets, pts_units, sync} with numpy arrays per sample; offsets
    are ABSOLUTE file offsets reconstructed from stsc × stco/co64, pts from
    stts run-length deltas, sync (keyframe sample indexes, 0-based) from
    stss (all samples sync if stss absent, per ISO 14496-12)."""
    buf = bytes(payload)
    moov = _find_box(buf, 0, len(buf), (b"moov",))
    if moov is None:
        raise ValueError("mp4: no moov box")
    for btype, ts_, te in _walk_boxes(buf, *moov):
        if btype != b"trak":
            continue
        hdlr = _find_box(buf, ts_, te, (b"mdia", b"hdlr"))
        if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find_box(buf, ts_, te, (b"tkhd",))
        v, _ = _full_box(buf, tkhd[0])
        geo = tkhd[0] + (88 if v == 1 else 76)
        width = struct.unpack_from(">I", buf, geo)[0] >> 16  # 16.16 fixed
        height = struct.unpack_from(">I", buf, geo + 4)[0] >> 16
        mdhd = _find_box(buf, ts_, te, (b"mdia", b"mdhd"))
        v, _ = _full_box(buf, mdhd[0])
        if v == 1:
            timescale = struct.unpack_from(">I", buf, mdhd[0] + 20)[0]
            duration = struct.unpack_from(">Q", buf, mdhd[0] + 24)[0]
        else:
            timescale, duration = struct.unpack_from(">II", buf, mdhd[0] + 12)
        stbl = _find_box(buf, ts_, te, (b"mdia", b"minf", b"stbl"))
        tables = {t: (s, e) for t, s, e in _walk_boxes(buf, *stbl)}

        # stts: run-length (count, delta) → per-sample decode deltas
        s, _e = tables[b"stts"]
        n_runs = struct.unpack_from(">I", buf, s + 4)[0]
        runs = _u32s(buf, s + 8, 2 * n_runs).reshape(n_runs, 2)
        deltas = np.repeat(runs[:, 1], runs[:, 0])
        n = len(deltas)
        pts_units = np.concatenate([[0], np.cumsum(deltas[:-1])])

        # stsz: constant or per-sample sizes
        s, _e = tables[b"stsz"]
        const_size, count = struct.unpack_from(">II", buf, s + 4)
        sizes = (
            np.full(count, const_size, dtype=np.int64)
            if const_size
            else _u32s(buf, s + 12, count)
        )

        # stco/co64 chunk offsets
        if b"stco" in tables:
            s, _e = tables[b"stco"]
            n_chunks = struct.unpack_from(">I", buf, s + 4)[0]
            chunk_offs = _u32s(buf, s + 8, n_chunks)
        else:
            s, _e = tables[b"co64"]
            n_chunks = struct.unpack_from(">I", buf, s + 4)[0]
            chunk_offs = np.frombuffer(
                buf, dtype=">u8", count=n_chunks, offset=s + 8
            ).astype(np.int64)

        # stsc runs → samples-per-chunk for every chunk, then absolute
        # per-sample offsets (chunk base + intra-chunk size prefix sum)
        s, _e = tables[b"stsc"]
        n_sc = struct.unpack_from(">I", buf, s + 4)[0]
        sc = _u32s(buf, s + 8, 3 * n_sc).reshape(n_sc, 3)
        spc = np.empty(n_chunks, dtype=np.int64)
        for k in range(n_sc):
            first = int(sc[k, 0]) - 1
            last = int(sc[k + 1, 0]) - 1 if k + 1 < n_sc else n_chunks
            spc[first:last] = sc[k, 1]
        offsets = np.empty(n, dtype=np.int64)
        si = 0
        for ci in range(n_chunks):
            c = int(spc[ci])
            seg = sizes[si : si + c]
            offsets[si : si + c] = chunk_offs[ci] + np.concatenate(
                [[0], np.cumsum(seg[:-1])]
            )
            si += c

        if b"stss" in tables:
            s, _e = tables[b"stss"]
            n_sync = struct.unpack_from(">I", buf, s + 4)[0]
            sync = _u32s(buf, s + 8, n_sync) - 1  # 1-based → 0-based
        else:
            sync = np.arange(n, dtype=np.int64)

        return {
            "width": int(width),
            "height": int(height),
            "timescale": int(timescale),
            "duration_units": int(duration),
            "n_frames": int(n),
            "sizes": sizes,
            "offsets": offsets,
            "pts_units": pts_units,
            "sync": sync,
        }
    raise ValueError("mp4: no video (vide) track")


def mp4_frame_index(payload: bytes) -> dict:
    """parse_mp4 + millisecond conversion: adds pts_ms (int64 array),
    duration_ms, keyframe (bool array), mean_frame_bytes."""
    t = parse_mp4(payload)
    ts = t["timescale"]
    pts_ms = (t["pts_units"] * 1000) // ts
    keyframe = np.zeros(t["n_frames"], dtype=bool)
    keyframe[t["sync"]] = True
    return {
        **t,
        "pts_ms": pts_ms,
        "duration_ms": int(t["duration_units"] * 1000 // ts),
        "keyframe": keyframe,
        "mean_frame_bytes": float(t["sizes"].mean()) if t["n_frames"] else 0.0,
    }


def decode_mp4(payload: bytes) -> dict:
    """Container-level decode for the shared feature schema: real geometry
    and duration from the sample tables; mean_value = mean coded frame size
    in bytes (structural — pixel decode stays the per-format seam)."""
    t = mp4_frame_index(payload)
    return {
        "format": "mp4",
        "width": t["width"],
        "height": t["height"],
        "duration_ms": t["duration_ms"],
        "sample_rate": None,
        "channels": None,
        "mean_value": t["mean_frame_bytes"],
    }


_DECODERS = {
    "wav": decode_wav,
    "bmp": decode_bmp,
    "ppm": decode_ppm,
    "png": decode_png,
    "mp4": decode_mp4,
}


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


def _box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _fbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags), body)


def encode_mp4(
    width: int,
    height: int,
    frame_sizes: list[int] | np.ndarray,
    delta_units: int = 40,
    timescale: int = 1000,
    sync_every: int = 5,
    samples_per_chunk: int = 7,
) -> bytes:
    """Structurally valid ISO BMFF file for deterministic test payloads:
    ftyp + mdat-first layout (mdat body at absolute offset 32, so chunk
    offsets are arithmetic) + a full moov with one video track whose sample
    tables cover every parser branch — multi-run-capable stts (single run
    here), per-sample stsz, multi-chunk stsc/stco (``samples_per_chunk``
    with a shorter tail run), and stss keyframes every ``sync_every``.
    Frame payloads are deterministic filler ((i + j) % 251) — the container
    is the artifact under test, coded-pixel decode is the per-format seam."""
    sizes = np.asarray(frame_sizes, dtype=np.int64)
    n = len(sizes)
    mdat_body = b"".join(
        ((np.arange(int(s), dtype=np.int64) + i) % 251).astype(np.uint8).tobytes()
        for i, s in enumerate(sizes)
    )
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"iso2")
    assert len(ftyp) == 24
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # == 32

    duration = int(n * delta_units)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _fbox(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
        + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _fbox(
        b"tkhd", 0, 7,
        struct.pack(">II", 0, 0)                # creation/modification time
        + struct.pack(">I4xI8x", 1, duration)   # track_id, rsvd, duration, rsvd
        + struct.pack(">HHHH", 0, 0, 0, 0)      # layer, alternate, volume, rsvd
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _fbox(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _fbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")

    # minimal video sample entry (geometry repeated per ISO 14496-12 §12.1.3)
    entry = (
        struct.pack(">I4s", 86, b"mp4v")
        + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _fbox(b"stts", 0, 0, struct.pack(">III", 1, n, delta_units))
    stsz = _fbox(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes.tolist()),
    )
    n_chunks = max(1, -(-n // samples_per_chunk))
    tail = n - samples_per_chunk * (n_chunks - 1)
    stsc_entries = [(1, samples_per_chunk, 1)]
    if tail != samples_per_chunk and n_chunks > 1:
        stsc_entries.append((n_chunks, tail, 1))
    stsc = _fbox(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    chunk_offs, si = [], 0
    for ci in range(n_chunks):
        chunk_offs.append(data_start + int(sizes[:si].sum()))
        si += samples_per_chunk if ci < n_chunks - 1 else tail
    stco = _fbox(
        b"stco", 0, 0,
        struct.pack(">I", n_chunks) + struct.pack(f">{n_chunks}I", *chunk_offs),
    )
    syncs = list(range(1, n + 1, sync_every))  # 1-based sample numbers
    stss = _fbox(
        b"stss", 0, 0,
        struct.pack(">I", len(syncs)) + struct.pack(f">{len(syncs)}I", *syncs),
    )
    vmhd = _fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _fbox(b"dref", 0, 0, struct.pack(">I", 1) + _fbox(b"url ", 0, 1, b""))
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco, stss)
    minf = _box(b"minf", vmhd, _box(b"dinf", dref), stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov
