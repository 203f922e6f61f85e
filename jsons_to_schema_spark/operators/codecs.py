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
  UNFILTERING (None/Sub/Up/Average/Paeth), 8- AND 16-bit gray /
  gray+alpha / RGB / RGBA / palette, non-interlaced and Adam7
  interlaced: dimensions + channel mean.
* MP4  (r4) — ISO BMFF CONTAINER demux (``struct`` box walk): video-track
  geometry, duration, and the full sample table (stts/stsz/stsc/stco/
  co64/stss) → real per-frame byte ranges, timestamps, and keyframe
  flags.  Coded-frame pixel decode (H.264 etc.) stays the seam.
* JPEG (r4) — baseline (SOF0) AND progressive (SOF2) ITU-T T.81 decode:
  marker parse, canonical Huffman entropy decode (spectral selection +
  successive approximation scans accumulating into a coefficient store
  for SOF2), dequant + de-zigzag, matrix IDCT, integer chroma
  upsampling (4:4:4/4:2:0/4:2:2/gray), restart intervals, YCbCr→RGB —
  plus quality-scaled Annex-K baseline and scripted progressive
  encoders for deterministic payload synthesis.
* GIF  (r4) — variable-width LSB-first LZW decode with dictionary growth
  to 4096 + clear-code resets, global/local palettes, 4-pass interlace;
  matching LZW encoder for synthesis.

What remains behind ``NotImplementedError`` genuinely requires external
codec libraries: coded video frames (H.264/VP9) and JPEG's arithmetic/
lossless/12-bit variants — a per-FORMAT seam, not a blanket one.

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
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def _wav_samples(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(rate, channels, n_frames, float64 samples — interleaved, signed,
    zero-centered).  The single WAV read both decode_wav and
    audio_features share, so the 8-bit unsigned-midpoint subtlety (r3
    review: int8 reads reported RMS 128 for digital silence) and the
    width gate live in exactly one place (r4 review)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth not in _WIDTHS:
        raise NotImplementedError(f"WAV sample width {sampwidth} unsupported")
    if sampwidth == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        samples = np.frombuffer(raw, dtype=_WIDTHS[sampwidth]).astype(np.float64)
    return rate, channels, n_frames, samples


def decode_wav(payload: bytes) -> dict:
    """PCM WAV → {format, width, height, duration_ms, sample_rate, channels,
    mean_value}.  mean_value is the RMS amplitude over all samples (all
    channels interleaved) — for a constant-amplitude signal it equals the
    amplitude exactly, which is what the driver oracle exploits."""
    rate, channels, n_frames, samples = _wav_samples(payload)
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


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, pixel-data offset) of a binary P6 PPM —
    shared by decode_ppm and decode_pixels so both read pixels from the
    header-derived offset (slicing the TAIL would silently channel-shift
    on trailing bytes, which real P6 files routinely carry)."""
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
    return width, height, maxval, pos


def decode_ppm(payload: bytes) -> dict:
    """P6 binary PPM → dimensions + mean over the raw RGB bytes."""
    width, height, _maxval, pos = _ppm_header(payload)
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


# Adam7 pass geometry: (x-origin, y-origin, x-step, y-step) per PNG §8.2.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_bytes_to_samples(px: np.ndarray, pw: int, n_samp: int, sampbytes: int) -> np.ndarray:
    """(rows, pw·n_samp·sampbytes) unfiltered BYTES → (rows, pw, n_samp)
    sample values: uint8 pass-through or big-endian uint16 recombination."""
    if sampbytes == 1:
        return px.reshape(-1, pw, n_samp)
    hi_lo = px.reshape(-1, pw, n_samp, 2).astype(np.uint16)
    return (hi_lo[..., 0] << 8) | hi_lo[..., 1]


def _png_decode_samples(payload: bytes):
    """Shared PNG decode core: chunk walk → inflate → unfilter (per Adam7
    pass when interlaced) → (samples, ihdr, plte) where samples is
    (height, width, n_samp) uint8 / uint16 BEFORE palette expansion.
    Filters always operate on bytes with bpp = n_samp·sampbytes (PNG §9),
    so 16-bit rows reuse the same unfilter kernel; each interlace pass is
    its own independently-filtered sub-image (prev row resets per pass)."""
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
    if bit_depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported (8/16 only)")
    if color_type == 3 and bit_depth == 16:
        raise ValueError("PNG forbids 16-bit palette images")
    if color_type not in _PNG_SAMPLES or comp != 0 or filt_m != 0 or interlace > 1:
        raise NotImplementedError(
            f"PNG color_type={color_type} compression={comp} filter={filt_m} "
            f"interlace={interlace} unsupported"
        )
    n_samp = _PNG_SAMPLES[color_type]
    sampbytes = bit_depth // 8
    bpp = n_samp * sampbytes
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    dtype = np.uint16 if sampbytes == 2 else np.uint8
    if interlace == 0:
        stride = width * bpp
        if raw.size != height * (stride + 1):
            raise ValueError("PNG pixel data size mismatch")
        px = _png_unfilter(raw.reshape(height, stride + 1), height, stride, bpp)
        samples = _png_bytes_to_samples(px, width, n_samp, sampbytes).astype(dtype)
    else:  # Adam7
        samples = np.zeros((height, width, n_samp), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines (PNG §8.2)
            stride = pw * bpp
            need = ph * (stride + 1)
            chunk = raw[off : off + need]
            if chunk.size != need:
                raise ValueError("PNG interlaced pixel data size mismatch")
            off += need
            px = _png_unfilter(chunk.reshape(ph, stride + 1), ph, stride, bpp)
            samples[y0::dy, x0::dx, :] = _png_bytes_to_samples(px, pw, n_samp, sampbytes)
        if off != raw.size:
            raise ValueError("PNG interlaced pixel data size mismatch")
    return samples, ihdr, plte


def decode_png(payload: bytes) -> dict:
    """PNG → dimensions + mean over every decoded channel value (palette
    rows expanded through PLTE first, alpha included — same "every channel
    value" convention as BMP 32-bpp).  8- and 16-bit depths, all five
    color types, non-interlaced and Adam7 (r4: the interlaced/16-bit seam
    closed); 16-bit means are over the native 0–65535 sample range."""
    samples, ihdr, plte = _png_decode_samples(payload)
    width, height, _bit_depth, color_type = ihdr[0], ihdr[1], ihdr[2], ihdr[3]
    n_samp = _PNG_SAMPLES[color_type]
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pixels = plte[samples.reshape(-1)]
        channels = 3
    else:
        pixels = samples
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
    # feature schema is the shared contract: drop the pixel array here
    # (resize/vision stages call decode_jpeg directly for pixels)
    "jpeg": lambda p: {k: v for k, v in decode_jpeg(p).items() if k != "pixels"},
    "gif": lambda p: decode_gif(p),
}


def decode_media(payload: bytes) -> dict:
    """Sniff + decode.  Raises NotImplementedError for formats that truly
    need external libraries (JPEG/MP4/...)."""
    fmt = sniff_format(payload or b"")
    if fmt is None:
        head = bytes(payload[:8] if payload else b"")
        raise NotImplementedError(
            f"no stdlib codec for payload starting {head!r}: coded video "
            "frames (H.264/VP9/...) require external libraries (ffmpeg) "
            "not present in this environment"
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


def _png_filter_image(raw: np.ndarray, bpp: int, filter_type: int) -> bytearray:
    """Apply one PNG filter (0–4) to every scanline of a (rows, stride)
    BYTE image; the previous row starts at zeros, so each Adam7 pass
    filters as the independent sub-image the spec requires."""
    rows = bytearray()
    h, stride = raw.shape
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = raw[y].astype(np.int32)
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
    return rows


def encode_png(
    width: int,
    height: int,
    rgb: tuple[int, int, int] | None = None,
    pixels: "np.ndarray | None" = None,
    filter_type: int = 0,
    bit_depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """PNG for deterministic test payloads: either a solid ``rgb`` fill or
    an explicit ``pixels`` array of shape (h, w) grayscale, (h, w, 2)
    gray+alpha, (h, w, 3) RGB, or (h, w, 4) RGBA; ``bit_depth`` 8 or 16
    (16-bit samples stored big-endian) and optional Adam7 ``interlace``.
    ``filter_type`` applies the SAME PNG filter (0–4) to every scanline —
    letting tests drive each unfilter branch against an arithmetic oracle."""
    if bit_depth not in (8, 16):
        raise ValueError("encode_png: bit_depth must be 8 or 16")
    dtype = np.uint16 if bit_depth == 16 else np.uint8
    if pixels is None:
        if rgb is None:
            raise ValueError("encode_png: pass rgb or pixels")
        pixels = np.tile(np.array(rgb, dtype=dtype), (height, width, 1))
    pixels = np.asarray(pixels, dtype=dtype)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, n_ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[n_ch]
    sampbytes = bit_depth // 8
    bpp = n_ch * sampbytes

    def to_bytes(sub: np.ndarray) -> np.ndarray:
        if sampbytes == 1:
            return sub.reshape(sub.shape[0], -1)
        b = np.empty(sub.shape + (2,), dtype=np.uint8)
        b[..., 0] = sub >> 8
        b[..., 1] = sub & 0xFF
        return b.reshape(sub.shape[0], -1)

    rows = bytearray()
    if not interlace:
        rows += _png_filter_image(to_bytes(pixels), bpp, filter_type)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows += _png_filter_image(to_bytes(sub), bpp, filter_type)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0
    )
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
    frame_sizes: "list[int] | np.ndarray | None" = None,
    delta_units: int = 40,
    timescale: int = 1000,
    sync_every: int = 5,
    samples_per_chunk: int = 7,
    frame_payloads: "list[bytes] | None" = None,
) -> bytes:
    """Structurally valid ISO BMFF file for deterministic test payloads:
    ftyp + mdat-first layout (mdat body at absolute offset 32, so chunk
    offsets are arithmetic) + a full moov with one video track whose sample
    tables cover every parser branch — multi-run-capable stts (single run
    here), per-sample stsz, multi-chunk stsc/stco (``samples_per_chunk``
    with a shorter tail run), and stss keyframes every ``sync_every``.
    Frame payloads default to deterministic filler ((i + j) % 251) sized by
    ``frame_sizes`` — the container is the artifact under test and coded-
    pixel decode is the per-format seam — or pass ``frame_payloads``
    explicitly (e.g. JPEG bytes → a Motion-JPEG file whose frames the
    baseline JPEG decoder can genuinely decode end-to-end)."""
    if frame_payloads is not None:
        sizes = np.asarray([len(fp) for fp in frame_payloads], dtype=np.int64)
        n = len(sizes)
        mdat_body = b"".join(frame_payloads)
    else:
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


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81) — stdlib + numpy (r4).  Full marker parse, canonical
# Huffman entropy decode, dequantize + de-zigzag, orthonormal matrix
# IDCT, integer chroma upsampling, YCbCr→RGB.  Baseline sequential (SOF0)
# AND progressive (SOF2: spectral selection + successive approximation,
# scans accumulating into a per-component coefficient store); lossless/
# arithmetic coding and 12-bit precision raise NotImplementedError.  The
# bit-serial entropy loop is per-block Python — appropriate for the
# thumbnail/metadata payloads a curation pipeline decodes Spark-side,
# not a throughput codec.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: block = _DCT_T.T @ coef @ _DCT_T
_DCT_T = np.array([
    [(np.sqrt(1 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])

# ITU-T T.81 Annex K reference tables -----------------------------------
_K1_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_K2_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)
# Progressive AC table: the Annex-K baseline AC tables lack the EOBn
# symbols (r<<4, r=1..14) progressive EOB runs need, so the progressive
# ENCODER emits this flat canonical table instead — all (run, size)
# symbols with size ≤ 10 at 8 bits (176/256 satisfies Kraft; the all-ones
# 8-bit code stays unused).  Entropy coding is lossless, so table
# optimality is irrelevant to round-trip tests.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted((r << 4) | s for r in range(16) for s in range(11)),
)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals)


class _HuffDecoder:
    """Canonical Huffman per T.81 F.2.2.3: mincode/maxcode/valptr tables."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode, self.maxcode, self.valptr = [0] * 17, [-1] * 17, [0] * 17
        code = k = 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            self.maxcode[length] = code - 1 if bits[length - 1] else -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy-coded segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, h: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if h.maxcode[length] >= 0 and code <= h.maxcode[length]:
                return h.vals[h.valptr[length] + code - h.mincode[length]]
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF/JPEG → dimensions + mean over the reconstructed RGB
    (grayscale replicated).  Supports 8-bit SOF0 with any integer sampling
    factors (4:4:4 / 4:2:0 / 4:2:2 / grayscale) and restart intervals."""
    buf = bytes(payload)
    if buf[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    coef_store: dict[int, np.ndarray] | None = None
    pos = 2
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI — progressive decode finishes here
            break
        seg_len = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if prec:
                    qt[tid] = np.frombuffer(seg, ">u2", 64, sp).astype(np.int64)
                    sp += 128
                else:
                    qt[tid] = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int64)
                    sp += 64
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                huff[(cls, tid)] = _HuffDecoder(bits, list(seg[sp + 17 : sp + 17 + n]))
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            progressive = marker == 0xC2
            h, w = struct.unpack_from(">HH", seg, 1)
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "jpeg: lossless/extended/arithmetic coding unsupported "
                "(baseline SOF0 + progressive SOF2 only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"], comp["ac"] = tabs >> 4, tabs & 0xF
                scan.append(comp)
            data_start = pos + seg_len
            if not progressive:
                return _decode_scan(
                    buf, data_start, w, h, scan, qt, huff, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            if coef_store is None:
                coef_store = _init_coef_store(w, h, comps)
            scan_end = _entropy_end(buf, data_start)
            _decode_prog_scan(
                buf[data_start:scan_end], scan, ss, se, ah, al,
                coef_store, huff, restart_interval, w, h, comps,
            )
            pos = scan_end
            continue
        pos += seg_len
    if progressive and coef_store is not None:
        return _assemble_progressive(coef_store, comps, qt, w, h)
    raise ValueError("jpeg: no SOS marker")


def _split_entropy_segments(raw: bytes, restart_interval: int) -> list[bytes]:
    """Split entropy-coded data on restart markers (safe: an in-data 0xFF
    is always followed by a stuffed 0x00, never 0xD0-0xD7) and unstuff
    each segment — shared by the baseline and progressive scan decoders."""
    if restart_interval:
        import re as _re

        segments = _re.split(b"\xff[\xd0-\xd7]", raw)
    else:
        segments = [raw]
    return [s.replace(b"\xff\x00", b"\xff") for s in segments]


def _decode_scan(buf, start, w, h, comps, qt, huff, restart_interval) -> dict:
    # unstuff + strip restart markers, tracking restart boundaries
    end = buf.rfind(b"\xff\xd9")
    if end < 0:
        end = len(buf)
    segments = _split_entropy_segments(buf[start:end], restart_interval)

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    reader = _BitReader(segments[0])
    seg_idx = 0
    for mcu_i in range(mcus_x * mcus_y):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):  # keep the codec's ValueError contract
                raise ValueError("jpeg: restart marker count mismatch")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu_i, mcus_x)
        for c in comps:
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.decode_huff(huff[(0, c["dc"])])
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(huff[(1, c["ac"])])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if rs == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    coef = np.zeros(64)
                    coef[_ZIGZAG] = zz * q
                    block = _DCT_T.T @ coef.reshape(8, 8) @ _DCT_T + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
    return _jpeg_finish(comps, planes, w, h)


def _jpeg_finish(comps, planes, w, h) -> dict:
    """Upsample chroma planes to the full MCU grid, crop, color-convert —
    shared tail of the baseline and progressive decode paths."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, max_v // c["v"], 0), max_h // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        rgb = np.stack([full[0]] * 3, axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "duration_ms": 0,
        "sample_rate": None,
        "channels": 3 if len(full) > 1 else 1,
        "mean_value": float(rgb.astype(np.float64).mean()),
        "pixels": rgb,
    }


# -- progressive (SOF2) decode: scans accumulate DCT coefficients ----------


def _jpeg_geometry(w: int, h: int, comps: list[dict]):
    """(mcus_x, mcus_y, per-comp non-interleaved block dims).  Interleaved
    scans cover the MCU-padded grid; non-interleaved (single-component)
    scans cover only ceil(comp_size/8) blocks per T.81 A.2.2."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    nb = {}
    for c in comps:
        cw = -(-w * c["h"] // max_h)
        ch = -(-h * c["v"] // max_v)
        nb[c["id"]] = (-(-cw // 8), -(-ch // 8))
    return mcus_x, mcus_y, nb


def _init_coef_store(w: int, h: int, comps: list[dict]) -> dict[int, np.ndarray]:
    """Per-component (blocks_y, blocks_x, 64) int32 coefficient arrays in
    ZIGZAG index order, MCU-padded so interleaved DC scans fit."""
    mcus_x, mcus_y, _ = _jpeg_geometry(w, h, comps)
    return {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _entropy_end(buf: bytes, start: int) -> int:
    """First non-stuffed, non-RST marker position at/after ``start`` — the
    end of one scan's entropy-coded data."""
    i = start
    while True:
        i = buf.find(b"\xff", i)
        if i < 0 or i + 1 >= len(buf):
            return len(buf)
        nxt = buf[i + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return i
        i += 2


def _prog_dc(blk, reader, dc_tab, pred, cid, ah, al):
    """One block's DC pass: first (Huffman diff of the point-transformed
    value) or refinement (one raw bit ORed into position Al)."""
    if ah == 0:
        t = reader.decode_huff(dc_tab)
        diff = _extend(reader.read_bits(t), t)
        pred[cid] += diff
        blk[0] = pred[cid] << al
    elif reader.read_bit():
        blk[0] |= 1 << al
    return pred


def _prog_ac_first(blk, reader, ac_tab, ss, se, al, eobrun) -> int:
    """One block's first AC pass over band [ss, se] (T.81 G.1.2.2 /
    libjpeg decode_mcu_AC_first); returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1  # this block is part of the run
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
    return eobrun


def _prog_ac_refine(blk, reader, ac_tab, ss, se, al, eobrun) -> int:
    """One block's AC refinement pass (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine): newly-nonzero coefficients arrive as ±1<<Al;
    every nonzero-history coefficient passed over reads one correction
    bit.  Python's arbitrary-precision & matches C two's complement."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s:
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            while k <= se:
                if blk[k]:
                    if reader.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] and reader.read_bit() and (int(blk[k]) & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    raw, scan, ss, se, ah, al, store, huff, restart_interval, w, h, comps
) -> None:
    """Decode one progressive scan's entropy data into the coefficient
    store.  DC scans (ss==0) may interleave several components in MCU
    order; AC scans are single-component raster over the non-interleaved
    block grid.  Restart markers reset DC predictors and the EOB run."""
    segments = _split_entropy_segments(raw, restart_interval)
    mcus_x, mcus_y, nb = _jpeg_geometry(w, h, comps)
    reader = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    pred = {c["id"]: 0 for c in scan}
    interleaved = len(scan) > 1
    if ss == 0 and interleaved:
        units = mcus_x * mcus_y
    else:
        nb_x, nb_y = nb[scan[0]["id"]]
        units = nb_x * nb_y
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):  # keep the codec's ValueError contract
                raise ValueError("jpeg: restart marker count mismatch")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in scan}
            eobrun = 0
        if ss == 0 and interleaved:
            my, mx = divmod(u, mcus_x)
            for c in scan:
                # refinement passes read raw bits only — don't require a
                # DC table the file never defined (legal per T.81)
                tab = huff[(0, c["dc"])] if ah == 0 else None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = store[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                        _prog_dc(blk, reader, tab, pred, c["id"], ah, al)
        else:
            c = scan[0]
            by, bx = divmod(u, nb_x)
            blk = store[c["id"]][by, bx]
            if ss == 0:
                tab = huff[(0, c["dc"])] if ah == 0 else None
                _prog_dc(blk, reader, tab, pred, c["id"], ah, al)
            elif ah == 0:
                eobrun = _prog_ac_first(
                    blk, reader, huff[(1, c["ac"])], ss, se, al, eobrun
                )
            else:
                eobrun = _prog_ac_refine(
                    blk, reader, huff[(1, c["ac"])], ss, se, al, eobrun
                )


def _assemble_progressive(store, comps, qt, w, h) -> dict:
    """Dequantize the accumulated zigzag coefficients, batched IDCT per
    component, then the shared upsample/color-convert tail."""
    zz_rows, zz_cols = divmod(_ZIGZAG, 8)
    planes = {}
    for c in comps:
        coefs = store[c["id"]].astype(np.float64) * qt[c["tq"]][None, None, :]
        by, bx = coefs.shape[:2]
        nat = np.zeros((by * bx, 8, 8))
        nat[:, zz_rows, zz_cols] = coefs.reshape(-1, 64)
        blocks = np.einsum("ij,njk,kl->nil", _DCT_T.T, nat, _DCT_T) + 128.0
        planes[c["id"]] = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _jpeg_finish(comps, planes, w, h)


class _BitWriter:
    """MSB-first bit writer with T.81 byte stuffing (0x00 after 0xFF)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 restart alignment)."""
        pad = (8 - self.nbits % 8) % 8
        if pad:
            self.write((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (canonical code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K table (public formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit pattern) per T.81 F.1.2.1.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1) & ((1 << t) - 1)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Baseline JFIF encoder (Annex K tables, quality-scaled): (h, w, 3)
    RGB → 3-component 4:4:4 (or 4:2:0 with ``subsample=True``), (h, w)
    grayscale → single component.  ``progressive=True`` emits SOF2 with
    the libjpeg-shaped scan script (DC Al=1 → spectral-selection AC
    first passes → AC/DC refinement) — the SAME quantized coefficients
    entropy-coded progressively, so decode(progressive) must equal
    decode(baseline) bit-for-bit, which is what tests assert.  Exists so
    the decoder — the artifact production corpora need — can be driven
    end-to-end without external libraries."""
    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    if subsample and not gray:
        samp = [(2, 2), (1, 1), (1, 1)]
        # chroma planes average-pooled 2x2 (pad odd dims by edge replication)
        for i in (1, 2):
            p = planes[i]
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            planes[i] = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    else:
        samp = [(1, 1)] * len(planes)
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
    qtabs = [_scale_q(_K1_LUMA_Q, quality), _scale_q(_K2_CHROMA_Q, quality)]
    comp_q = [0] if gray else [0, 1, 1]
    enc_dc = [_huff_encode_table(*_DC_LUMA), _huff_encode_table(*_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*_AC_LUMA), _huff_encode_table(*_AC_CHROMA)]
    comp_t = [0] if gray else [0, 1, 1]

    # pad each plane to its own block grid (edge replicate)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    bw = _BitWriter()
    pred = [0] * len(planes)
    rst_n = 0
    zz_rows, zz_cols = divmod(_ZIGZAG, 8)
    # quant steps in ZIGZAG order — coefficients are zigzag-reordered before
    # quantization, and DQT/decoder both speak zigzag (caught by the random-
    # sinusoid property test: natural-order steps here quantized high
    # frequencies with the wrong divisor)
    qtabs_zz = [q.reshape(8, 8)[zz_rows, zz_cols] for q in qtabs]
    if progressive:
        if restart_interval:
            raise NotImplementedError(
                "jpeg: the progressive encoder emits no restart markers"
            )
        return _encode_progressive(
            w, h, padded, samp, qtabs, qtabs_zz, comp_q, comp_t, gray
        )
    for mcu_i in range(mcus_x * mcus_y):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bw.align()
            bw.out += bytes([0xFF, 0xD0 + rst_n % 8])
            rst_n += 1
            pred = [0] * len(planes)
        my, mx = divmod(mcu_i, mcus_x)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            q = qtabs_zz[comp_q[ci]]
            dc_t, ac_t = enc_dc[comp_t[ci]], enc_ac[comp_t[ci]]
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _DCT_T @ block @ _DCT_T.T
                    zz = np.round(coef[zz_rows, zz_cols] / q).astype(np.int64)
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t, bits = _magnitude(diff)
                    code, ln = dc_t[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(bits, t)
                    nz = np.nonzero(zz[1:])[0]
                    k_prev = 0
                    for k in nz + 1:
                        run = int(k) - k_prev - 1
                        while run >= 16:
                            code, ln = ac_t[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        t, bits = _magnitude(int(zz[k]))
                        code, ln = ac_t[(run << 4) | t]
                        bw.write(code, ln)
                        bw.write(bits, t)
                        k_prev = int(k)
                    if k_prev != 63:
                        code, ln = ac_t[0x00]  # EOB
                        bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(1 if gray else 2):
        # reuse the SAME zigzag table the quantization loop divided by —
        # re-deriving the reorder here risks desyncing DQT from the
        # applied steps (the class of bug the zigzag property test caught)
        out += seg(0xDB, bytes([tid]) + qtabs_zz[tid].astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_q[ci]])
    out += seg(0xC0, sof)
    tabs = [(_DC_LUMA, 0x00), (_AC_LUMA, 0x10)]
    if not gray:
        tabs += [(_DC_CHROMA, 0x01), (_AC_CHROMA, 0x11)]
    for (bits, vals), tid in tabs:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (comp_t[ci] << 4) | comp_t[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return bytes(out)


def _emit_eobrun_bits(bw, ac_t, eobrun: int, pending: list[int]) -> tuple[int, list]:
    """Flush a pending EOB run (EOBn symbol + extension bits, T.81 G.1.2.2)
    followed by the buffered correction bits of the blocks it covers."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_t[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun, nbits)
    for b in pending:
        bw.write(b, 1)
    return 0, []


def _encode_progressive(
    w, h, padded, samp, qtabs, qtabs_zz, comp_q, comp_t, gray
) -> bytes:
    """SOF2 entropy-coding of the SAME quantized coefficients the baseline
    path produces (libjpeg jcphuff.c is the public reference for the
    first/refine pass algorithms; scan script shaped like jcparam.c's
    default).  Covers every decoder path: interleaved DC first + refine,
    spectral-selection AC first with EOB runs, AC refinement with
    buffered correction bits."""
    ncomp = len(padded)
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
    zz_rows, zz_cols = divmod(_ZIGZAG, 8)
    store = []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p - 128.0).reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", _DCT_T, blocks, _DCT_T)
        store.append(
            np.round(coef[..., zz_rows, zz_cols] / qtabs_zz[comp_q[ci]]).astype(
                np.int64
            )
        )
    comps_meta = [
        {"id": ci + 1, "h": samp[ci][0], "v": samp[ci][1]} for ci in range(ncomp)
    ]
    _, _, nb = _jpeg_geometry(w, h, comps_meta)
    dc_enc = [_huff_encode_table(*_DC_LUMA), _huff_encode_table(*_DC_CHROMA)]
    ac_enc = _huff_encode_table(*_AC_PROG)

    def dc_blocks(cis):
        if len(cis) > 1:  # interleaved MCU order over the padded grid
            for u in range(mcus_x * mcus_y):
                my, mx = divmod(u, mcus_x)
                for ci in cis:
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, store[ci][my * sv + by, mx * sh + bx]
        else:  # non-interleaved raster over the component's real blocks
            ci = cis[0]
            nb_x, nb_y = nb[ci + 1]
            for u in range(nb_x * nb_y):
                by, bx = divmod(u, nb_x)
                yield ci, store[ci][by, bx]

    def enc_dc_first(bw, cis, al):
        pred = {ci: 0 for ci in cis}
        for ci, blk in dc_blocks(cis):
            val = int(blk[0]) >> al
            diff = val - pred[ci]
            pred[ci] = val
            t, bits = _magnitude(diff)
            code, ln = dc_enc[comp_t[ci]][t]
            bw.write(code, ln)
            if t:
                bw.write(bits, t)

    def enc_dc_refine(bw, cis, al):
        for _ci, blk in dc_blocks(cis):
            bw.write((int(blk[0]) >> al) & 1, 1)

    def enc_ac_first(bw, ci, ss, se, al):
        # first passes have no correction bits to buffer — only the
        # refinement pass threads a pending list through the EOB flush
        eobrun = 0
        nb_x, nb_y = nb[ci + 1]
        for u in range(nb_x * nb_y):
            blk = store[ci][u // nb_x, u % nb_x]
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                v = -((-v) >> al) if v < 0 else v >> al  # shift toward zero
                if v == 0:
                    r += 1
                    continue
                eobrun, _ = _emit_eobrun_bits(bw, ac_enc, eobrun, ())
                while r > 15:
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    r -= 16
                t, bits = _magnitude(v)
                code, ln = ac_enc[(r << 4) | t]
                bw.write(code, ln)
                bw.write(bits, t)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun, _ = _emit_eobrun_bits(bw, ac_enc, eobrun, ())
        _emit_eobrun_bits(bw, ac_enc, eobrun, ())

    def enc_ac_refine(bw, ci, ss, se, al):
        eobrun, pending = 0, []
        nb_x, nb_y = nb[ci + 1]
        for u in range(nb_x * nb_y):
            blk = store[ci][u // nb_x, u % nb_x]
            absval = [
                ((-int(v) if v < 0 else int(v)) >> al) for v in blk[ss : se + 1]
            ]
            eob = -1  # last NEWLY-nonzero position; later coefs join the EOB run
            for i, t in enumerate(absval):
                if t == 1:
                    eob = ss + i
            r, br = 0, []
            for k in range(ss, se + 1):
                temp = absval[k - ss]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    eobrun, pending = _emit_eobrun_bits(bw, ac_enc, eobrun, pending)
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if temp > 1:  # history-nonzero: buffer one correction bit
                    br.append(temp & 1)
                    continue
                eobrun, pending = _emit_eobrun_bits(bw, ac_enc, eobrun, pending)
                code, ln = ac_enc[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(blk[k]) >= 0 else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    eobrun, pending = _emit_eobrun_bits(bw, ac_enc, eobrun, pending)
        _emit_eobrun_bits(bw, ac_enc, eobrun, pending)

    if ncomp == 1:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(1 if gray else 2):
        # reuse the SAME zigzag table the quantization loop divided by —
        # re-deriving the reorder here risks desyncing DQT from the
        # applied steps (the class of bug the zigzag property test caught)
        out += seg(0xDB, bytes([tid]) + qtabs_zz[tid].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_q[ci]])
    out += seg(0xC2, sof)
    tabs = [(_DC_LUMA, 0x00), (_AC_PROG, 0x10)]
    if not gray:
        tabs.append((_DC_CHROMA, 0x01))
    for (bits, vals), tid in tabs:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    for cis, ss, se, ah, al in script:
        bw = _BitWriter()
        if ss == 0:
            if ah == 0:
                enc_dc_first(bw, cis, al)
            else:
                enc_dc_refine(bw, cis, al)
        elif ah == 0:
            enc_ac_first(bw, cis[0], ss, se, al)
        else:
            enc_ac_refine(bw, cis[0], ss, se, al)
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, (comp_t[ci] << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_pixels(payload: bytes) -> np.ndarray:
    """Decode any stdlib-decodable IMAGE payload to an (h, w, 3) uint8 RGB
    array: JPEG via the baseline decoder, PPM raw, BMP with bottom-up flip +
    BGR→RGB, PNG with palette expansion / gray replication / alpha drop.
    Raises NotImplementedError for non-image or undecodable formats."""
    fmt = sniff_format(payload or b"")
    if fmt == "jpeg":
        return decode_jpeg(payload)["pixels"]
    if fmt == "ppm":
        w, h, _maxval, off = _ppm_header(payload)
        return np.frombuffer(payload, np.uint8, w * h * 3, off).reshape(h, w, 3)
    if fmt == "bmp":
        pixel_off = struct.unpack_from("<I", payload, 10)[0]
        w, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if struct.unpack_from("<I", payload, 30)[0] != 0 or bpp not in (24, 32):
            raise NotImplementedError("BMP variant unsupported")
        n_ch, h = bpp // 8, abs(height)
        stride = (w * n_ch + 3) & ~3
        arr = np.frombuffer(payload, np.uint8, stride * h, pixel_off)
        px = arr.reshape(h, stride)[:, : w * n_ch].reshape(h, w, n_ch)
        if height > 0:  # bottom-up storage
            px = px[::-1]
        return px[..., 2::-1]  # BGRA/BGR → RGB
    if fmt == "png":
        return _png_rgb(payload)
    if fmt == "gif":
        return gif_pixels(payload)
    raise NotImplementedError(f"no stdlib pixel decode for format {fmt!r}")


def _png_rgb(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB (palette expanded, gray replicated, alpha
    dropped; 16-bit samples take their high byte) — shared decode core
    with decode_png, so Adam7/16-bit work here too."""
    px, ihdr, plte = _png_decode_samples(payload)
    color_type = ihdr[3]
    if px.dtype == np.uint16:
        px = (px >> 8).astype(np.uint8)
    if color_type == 3:
        return plte[px[..., 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=-1)
    if color_type == 4:
        return np.repeat(px[..., :1], 3, axis=-1)
    return px[..., :3]


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic bilinear resample with half-pixel centers (the
    convention of every mainstream image library), pure numpy."""
    h, w = img.shape[:2]
    x = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (x - x0)[None, :, None]
    wy = (y - y0)[:, None, None]
    p = img.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return np.clip(np.round(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — stdlib LZW decode (r4): header + palette parse, sub-block
# reassembly, variable-width LSB-first LZW with dictionary growth to 4096,
# Adam-style 4-pass de-interlacing, transparency-agnostic first frame.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW data exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def decode_gif(payload: bytes) -> dict:
    """GIF → first frame as dimensions + mean RGB (palette-expanded)."""
    d = gif_pixels(payload)
    return {
        "format": "gif",
        "width": d.shape[1],
        "height": d.shape[0],
        "duration_ms": 0,
        "sample_rate": None,
        "channels": 3,
        "mean_value": float(d.astype(np.float64).mean()),
    }


def gif_pixels(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("gif: no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            idx = _gif_lzw_decode(bytes(data), mcs, w * h).reshape(h, w)
            if iflags & 0x40:  # 4-pass interlace
                de = np.empty_like(idx)
                rows = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                de[rows] = idx
                idx = de
            return pal[idx]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02x} at {pos}")
    raise ValueError("gif: no image descriptor")


def encode_gif(
    width: int, height: int, pixels: np.ndarray, interlace: bool = False
) -> bytes:
    """GIF89a encoder for deterministic test payloads: builds an exact
    palette from the distinct colors (≤256), real variable-width LZW."""
    pixels = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    flat = pixels.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif: >256 distinct colors")
    depth = max(1, int(len(pal) - 1).bit_length())
    pal_n = 1 << depth
    pal_full = np.zeros((pal_n, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    idx = idx.reshape(height, width)
    if interlace:
        rows = np.concatenate(
            [np.arange(0, height, 8), np.arange(4, height, 8),
             np.arange(2, height, 4), np.arange(1, height, 2)]
        )
        idx = idx[rows]
    seq = idx.reshape(-1).astype(np.int64)

    mcs = max(2, depth)
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = [(clear, mcs + 1)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width_bits = eoi + 1, mcs + 1
    run = bytes([seq[0]])
    for px in seq[1:]:
        cand = run + bytes([int(px)])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width_bits))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width_bits) and width_bits < 12:
            width_bits += 1
        if next_code >= 4096:
            codes.append((clear, width_bits))
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code, width_bits = eoi + 1, mcs + 1
        run = bytes([int(px)])
    codes.append((table[run], width_bits))
    codes.append((eoi, width_bits))
    acc = nbits = 0
    body = bytearray()
    for code, wd in codes:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += pal_full.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(mcs)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_wav_sine(
    n_frames: int,
    k_periods: int,
    amplitude: int,
    rate: int = 8192,
    phase_frac: float = 0.31,
) -> bytes:
    """16-bit PCM sine with EXACTLY ``k_periods`` cycles over the clip
    (bin-aligned, so the FFT peak lands on bin k with zero leakage) and a
    fractional phase offset that keeps samples off exact zeros (making the
    sign-flip zero-crossing count exactly 2·k − 1: k whole periods give
    2k sign runs, hence 2k−1 transitions — the 2k-th crossing is the
    wrap-around that lands just before sample 0)."""
    n = np.arange(n_frames, dtype=np.float64)
    x = amplitude * np.sin(2 * np.pi * k_periods * (n + phase_frac) / n_frames)
    samples = np.floor(x + 0.5).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def audio_features(payload: bytes) -> dict:
    """Spectral audio analysis over PCM WAV (numpy only): duration, rate,
    channels, RMS, ZERO-CROSSING count (sign changes, first channel) and
    DOMINANT FREQUENCY in integer Hz (argmax of the rFFT magnitude above
    DC).  For a bin-aligned pure sine these are exact integers — the
    property the driver oracle checks arithmetically.  ONE parse/read of
    the payload via the shared _wav_samples helper (this runs per row in
    the Arrow-batched hot path); RMS over all interleaved samples matches
    decode_wav's mean_value by construction."""
    rate, channels, n_frames, samples = _wav_samples(payload)
    rms = float(np.sqrt(np.mean(samples * samples))) if samples.size else 0.0
    x = samples[::channels]  # first channel
    # Standard ZCR: samples quantized to exactly 0 carry no sign — drop
    # them, then count sign flips (a 0-sample between +/− still counts
    # once; counting products <0 over raw signs would miss it entirely).
    s = np.sign(x)
    s = s[s != 0]
    zc = int(np.count_nonzero(s[:-1] != s[1:])) if s.size else 0
    if len(x) >= 4:
        spec = np.abs(np.fft.rfft(x))
        dom_bin = int(np.argmax(spec[1:])) + 1
        dominant = int(round(dom_bin * rate / len(x)))
    else:
        dominant = 0
    return {
        "duration_ms": round(n_frames * 1000 / rate) if rate else 0,
        "sample_rate": rate,
        "channels": channels,
        "rms": rms,
        "zero_crossings": zc,
        "dominant_freq_hz": dominant,
    }


def dhash64(pixels: np.ndarray) -> int:
    """Perceptual difference hash (dHash, 64-bit) of a decoded image —
    the standard near-duplicate IMAGE signature (public algorithm: gray,
    downsample to an 8x9 grid, bit = right cell brighter than left).

    Exact integer arithmetic end to end, so the hash is bit-deterministic
    on every platform: gray = 299R + 587G + 114B (Rec.601 numerators,
    scale-invariant for comparisons, no division), images smaller than
    the grid upsample by integer ``np.repeat``, grid cells are the exact
    floor-boundary blocks, and adjacent cells compare via cross-
    multiplied Python-int sums (``sum_r·n_l > sum_l·n_r`` — no float
    means, no overflow).  Bit (r, c) of the result is ``1 << (8r + c)``;
    the value is returned in SIGNED 64-bit range so it stores in a Spark
    ``long`` (the simhash64 convention)."""
    px = np.asarray(pixels)
    if px.ndim == 3:
        c64 = px.astype(np.int64)
        gray = 299 * c64[..., 0] + 587 * c64[..., 1] + 114 * c64[..., 2]
    elif px.ndim == 2:
        gray = px.astype(np.int64) * 1000
    else:
        raise ValueError(f"dhash64: bad pixel array ndim={px.ndim}")
    h, w = gray.shape
    if h < 1 or w < 1:
        raise ValueError("dhash64: empty image")
    if h < 8:
        gray = np.repeat(gray, -(-8 // h), axis=0)
    if w < 9:
        gray = np.repeat(gray, -(-9 // w), axis=1)
    hh, ww = gray.shape
    rb = [hh * r // 8 for r in range(9)]
    cb = [ww * c // 9 for c in range(10)]
    sums = [
        [int(gray[rb[r]:rb[r + 1], cb[c]:cb[c + 1]].sum()) for c in range(9)]
        for r in range(8)
    ]
    ns = [
        [(rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]) for c in range(9)]
        for r in range(8)
    ]
    out = 0
    for r in range(8):
        for c in range(8):
            if sums[r][c + 1] * ns[r][c] > sums[r][c] * ns[r][c + 1]:
                out |= 1 << (8 * r + c)
    return out - (1 << 64) if out >= 1 << 63 else out


def encode_wav_pcm(samples: np.ndarray, rate: int = 8192) -> bytes:
    """16-bit mono PCM WAV from an explicit int16 sample array — lets a
    test construct EXACT sample-space transforms of another clip (e.g. a
    power-of-two amplitude scale, which commutes with float rounding and
    therefore preserves audio_fingerprint64 bit-for-bit)."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError("encode_wav_pcm: samples must be int16")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def wav_samples(payload: bytes) -> "tuple[np.ndarray, int]":
    """Decode a PCM WAV to (mono float64 samples, rate): multi-channel
    clips average their channels.  8-bit PCM is UNSIGNED with a 128
    midpoint per the RIFF spec (decoding it signed would wrap digital
    silence into a ±128 square wave — review finding; decode_wav already
    centers it the same way); 16/32-bit are signed little-endian."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, width, rate = (
            w.getnframes(),
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
        )
        raw = w.readframes(n)
    if width not in _WIDTHS:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if width == 1:
        arr = np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0
    else:
        arr = np.frombuffer(raw, _WIDTHS[width]).astype(np.float64)
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, rate


def audio_fingerprint64(payload: bytes) -> int:
    """Perceptual 64-bit audio fingerprint of a PCM WAV — the dhash64 of
    sound (Haitsma-Kalker-style band-energy differences): the mono
    signal splits into 8 equal time segments (floor boundaries), each
    segment's rFFT magnitude-squared folds into 9 frequency bands over
    bins 1..N/2 (DC excluded — level offsets are not content), and
    bit (t, f) = band f+1 louder than band f in segment t.

    Scale-invariant by construction: energies scale uniformly with
    amplitude, so every comparison survives a gain change (exactly so
    for power-of-two sample scaling, which commutes with float
    rounding).  Deterministic for fixed payload bytes: numpy rFFT is
    reproducible, and the comparisons consume energies derived from the
    same code path on every executor.  Requires ≥ 8 segments × 18 bins
    → 288 samples; shorter clips raise (a fingerprint of a click is not
    evidence)."""
    arr, _rate = wav_samples(payload)
    return audio_fingerprint64_from_samples(arr)


def audio_fingerprint64_from_samples(arr: np.ndarray) -> int:
    """audio_fingerprint64 over ALREADY-DECODED mono samples — the batch
    stage decodes once and feeds both the metadata columns and this
    kernel (review finding: taking bytes here made the hot mapInPandas
    loop decode every payload twice)."""
    n = arr.shape[0]
    if n < 288:
        raise ValueError(f"audio_fingerprint64: clip too short ({n} < 288 samples)")
    tb = [n * t // 8 for t in range(9)]
    out = 0
    for t in range(8):
        seg = arr[tb[t]:tb[t + 1]]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        nb = spec.shape[0] - 1  # usable bins 1..nb
        fb = [1 + nb * f // 9 for f in range(10)]
        e = [float(spec[fb[f]:fb[f + 1]].sum()) for f in range(9)]
        for f in range(8):
            if e[f + 1] > e[f]:
                out |= 1 << (8 * t + f)
    return out - (1 << 64) if out >= 1 << 63 else out


def video_fingerprint64(payload: bytes) -> int:
    """Perceptual 64-bit video fingerprint from the MP4 CONTAINER: the
    coded-frame BYTE-SIZE sequence (stsz) is a strong content signature —
    re-muxing, re-timestamping, or resizing metadata leaves it intact,
    and scene structure (I-frame spikes, motion-driven P-frame swell)
    shapes it — and it needs no pixel decode, so it works exactly where
    the coded-frame seam (H.264 decode) begins.

    dhash-style over the sequence: 65 floor-boundary blocks of the size
    array, bit f = block f+1 heavier than block f, compared by exact
    cross-multiplied Python-int sums (the dhash64 arithmetic — bit-
    deterministic, no float means).  Sequences shorter than 65 frames
    upsample by integer repeat.  Requires ≥ 2 frames."""
    return video_fingerprint64_from_sizes(parse_mp4(payload)["sizes"])


def video_fingerprint64_from_sizes(frame_sizes) -> int:
    """video_fingerprint64 over an ALREADY-PARSED frame-size sequence —
    the batch stage parses the container once for metadata and this
    kernel (review finding: taking bytes here parsed every payload
    twice)."""
    sizes = np.asarray(frame_sizes, dtype=np.int64)
    n = sizes.shape[0]
    if n < 2:
        raise ValueError(f"video_fingerprint64: need >= 2 frames, got {n}")
    if n < 65:
        sizes = np.repeat(sizes, -(-65 // n))
        n = sizes.shape[0]
    bb = [n * b // 65 for b in range(66)]
    sums = [int(sizes[bb[b]:bb[b + 1]].sum()) for b in range(65)]
    ns = [bb[b + 1] - bb[b] for b in range(65)]
    out = 0
    for b in range(64):
        if sums[b + 1] * ns[b] > sums[b] * ns[b + 1]:
            out |= 1 << b
    return out - (1 << 64) if out >= 1 << 63 else out
