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
    # coded-video-only formats stay behind the per-format seam (PNG/MP4/JPEG
    # are decodable since r4); unknown magic raises it, corrupt-but-known
    # magic raises ValueError from the real decoder instead
    with pytest.raises(NotImplementedError, match="external libraries"):
        codecs.decode_media(b"II*\x00tiff....")
    with pytest.raises(NotImplementedError):
        codecs.decode_media(b"")
    with pytest.raises(ValueError):
        codecs.decode_media(b"\xff\xd8\xff\xe0....")


def test_sniff():
    assert codecs.sniff_format(codecs.encode_wav(8, 1)) == "wav"
    assert codecs.sniff_format(codecs.encode_bmp(1, 1, (1, 1, 1))) == "bmp"
    assert codecs.sniff_format(codecs.encode_ppm(1, 1, (1, 1, 1))) == "ppm"
    assert codecs.sniff_format(b"\xff\xd8\xff") == "jpeg"  # decodable since r4
    assert codecs.sniff_format(b"GIF89a") == "gif"
    assert codecs.sniff_format(b"II*\x00") is None


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


def test_png_roundtrip_all_filters_all_color_types():
    """decode_png inverts encode_png for every scanline filter (0-4) and
    color shape (gray, gray+alpha, RGB, RGBA) on random pixels (r4,
    VERDICT item 4)."""
    import numpy as np

    from jsons_to_schema_spark.operators.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for shape in [(9, 4), (9, 4, 2), (9, 4, 3), (9, 4, 4)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in range(5):
            d = decode_png(encode_png(4, 9, pixels=px, filter_type=ft))
            assert (d["width"], d["height"]) == (4, 9)
            assert abs(d["mean_value"] - float(px.astype("float64").mean())) < 1e-9


def test_png_palette_and_unsupported_variants():
    import struct
    import zlib

    import numpy as np
    import pytest

    from jsons_to_schema_spark.operators.codecs import (
        _PNG_SIG,
        _png_chunk,
        decode_media,
        decode_png,
        encode_png,
        sniff_format,
    )

    # palette (color type 3): indices expand through PLTE before the mean
    plte = bytes((10, 20, 30)) + bytes((40, 50, 60))
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)  # 2x2, two entries each
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )
    d = decode_png(payload)
    assert d["channels"] == 3 and abs(d["mean_value"] - 35.0) < 1e-9

    assert sniff_format(encode_png(2, 2, rgb=(1, 2, 3))) == "png"
    assert decode_media(encode_png(2, 2, rgb=(9, 9, 9)))["mean_value"] == 9.0

    # 16-bit non-interlaced decodes since r4 (2x2 RGB zeros: 2 rows of
    # 1 + 12 bytes); sub-byte depths and unknown interlace modes still
    # raise the seam
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    ok16 = _PNG_SIG + _png_chunk(b"IHDR", ihdr16) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _png_chunk(b"IEND", b"")
    d16 = decode_png(ok16)
    assert d16["width"] == 2 and d16["mean_value"] == 0.0
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    bad4 = _PNG_SIG + _png_chunk(b"IHDR", ihdr4) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 4)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bad4)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
    bad_i = _PNG_SIG + _png_chunk(b"IHDR", ihdr_i) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 14)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bad_i)


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF structural demux (r4)
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_sample_tables():
    """Encoder → parser round-trip: geometry, duration, per-sample sizes,
    ABSOLUTE offsets (multi-chunk stsc/stco reconstruction), pts from stts,
    and stss keyframes — and the offsets really point at the frames (the
    deterministic mdat filler reads back byte-exact)."""
    sizes = [50 + ((7 * i + 3) % 32) for i in range(25)]
    p = codecs.encode_mp4(640, 480, sizes, samples_per_chunk=7, sync_every=5)
    t = codecs.mp4_frame_index(p)
    assert (t["width"], t["height"]) == (640, 480)
    assert t["n_frames"] == 25 and t["duration_ms"] == 1000
    assert t["sizes"].tolist() == sizes
    exp_off = 32 + np.concatenate([[0], np.cumsum(sizes[:-1])])
    assert t["offsets"].tolist() == exp_off.tolist()
    assert t["pts_ms"].tolist() == [40 * i for i in range(25)]
    assert t["sync"].tolist() == [0, 5, 10, 15, 20]
    for i in (0, 3, 24):  # range-read each frame straight out of the file
        o, s = int(t["offsets"][i]), int(t["sizes"][i])
        frame = np.frombuffer(p[o : o + s], dtype=np.uint8)
        assert (frame == (np.arange(s) + i) % 251).all()


def test_mp4_chunking_variants_and_sniff():
    for n, spc in [(3, 7), (40, 1), (14, 14), (1, 7)]:
        sizes = list(range(60, 60 + n))
        p = codecs.encode_mp4(64, 48, sizes, samples_per_chunk=spc)
        assert codecs.sniff_format(p) == "mp4"
        t = codecs.mp4_frame_index(p)
        exp_off = 32 + np.concatenate([[0], np.cumsum(sizes[:-1])])
        assert t["offsets"].tolist() == exp_off.tolist()


def test_mp4_decode_media_structural_features():
    d = codecs.decode_media(codecs.encode_mp4(64, 48, [50, 60, 70]))
    assert d == {
        "format": "mp4",
        "width": 64,
        "height": 48,
        "duration_ms": 120,
        "sample_rate": None,
        "channels": None,
        "mean_value": 60.0,
    }


def test_mp4_corrupt_and_missing_track():
    with pytest.raises(ValueError, match="no moov"):
        codecs.parse_mp4(b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2")
    # truncated box size → corrupt
    good = codecs.encode_mp4(64, 48, [50, 60])
    with pytest.raises(ValueError):
        codecs.parse_mp4(good[:-10] + b"\xff" * 10)


# ---------------------------------------------------------------------------
# JPEG baseline (r4)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_444_within_lossy_tolerance():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    d = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    assert (d["width"], d["height"], d["channels"]) == (40, 24, 3)
    mae = np.abs(d["pixels"].astype(float) - img.astype(float)).mean()
    assert mae < 3.0, mae


def test_jpeg_420_subsampling_and_odd_dims():
    yy, xx = np.mgrid[0:21, 0:37]
    img = np.stack([((xx + yy) * 2) % 256] * 3, axis=-1).astype(np.uint8)
    d = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, subsample=True))
    assert (d["width"], d["height"]) == (37, 21)
    mae = np.abs(d["pixels"].astype(float) - img.astype(float)).mean()
    assert mae < 6.0, mae


def test_jpeg_solid_color_bit_exact_q95():
    """Solid blocks carry only the DC coefficient, which survives q95
    quantization exactly — the property the driver oracle exploits."""
    for i in range(40):
        rgb = ((31 * i) % 256, (57 * i) % 256, (89 * i) % 256)
        img = np.full((8 + i % 7, 8 + i % 9, 3), rgb, dtype=np.uint8)
        d = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=95))
        assert (d["pixels"] == img).all(), rgb
        assert d["mean_value"] == img.astype(np.float64).mean()


def test_jpeg_grayscale_single_component():
    yy, xx = np.mgrid[0:16, 0:16]
    g = np.clip(xx * 3 + yy * 2, 0, 255).astype(np.uint8)
    d = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=90))
    assert d["channels"] == 1
    assert np.abs(d["pixels"][:, :, 0].astype(float) - g).mean() < 1.0


def test_jpeg_unsupported_and_corrupt():
    with pytest.raises(ValueError, match="not a JPEG"):
        codecs.decode_jpeg(b"\x00\x01")
    # lossless (SOF3) raises the remaining per-format seam (progressive
    # SOF2 decodes since late r4)
    img = np.zeros((8, 8), dtype=np.uint8)
    p = bytearray(codecs.encode_jpeg(img))
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        codecs.decode_jpeg(bytes(p))
    assert codecs.sniff_format(codecs.encode_jpeg(img)) == "jpeg"


def test_decode_pixels_all_formats_exact():
    yy, xx = np.mgrid[0:20, 0:30]
    img = np.stack(
        [(xx * 8) % 256, (yy * 11) % 256, ((xx + yy) * 5) % 256], axis=-1
    ).astype(np.uint8)
    assert (
        codecs.decode_pixels(codecs.encode_png(30, 20, pixels=img, filter_type=4))
        == img
    ).all()
    assert (
        codecs.decode_pixels(codecs.encode_ppm(3, 2, (9, 8, 7)))
        == np.full((2, 3, 3), (9, 8, 7), np.uint8)
    ).all()
    assert (
        codecs.decode_pixels(codecs.encode_bmp(5, 4, (10, 20, 30)))
        == np.full((4, 5, 3), (10, 20, 30), np.uint8)
    ).all()
    solid = np.full((8, 8, 3), (100, 50, 25), np.uint8)
    assert (
        codecs.decode_pixels(codecs.encode_jpeg(solid, quality=95)) == solid
    ).all()
    with pytest.raises(NotImplementedError):
        codecs.decode_pixels(codecs.encode_wav(10, 100))


def test_resize_bilinear_semantics():
    assert (codecs.resize_bilinear(np.full((40, 60, 3), 77, np.uint8), 15, 10) == 77).all()
    ramp = np.tile(np.arange(0, 240, 4, dtype=np.uint8)[None, :, None], (8, 1, 3))
    out = codecs.resize_bilinear(ramp, 20, 4)
    assert out.shape == (4, 20, 3)
    assert (np.diff(out[0, :, 0].astype(int)) >= 0).all()  # monotone preserved


# ---------------------------------------------------------------------------
# GIF / LZW (r4)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_including_interlace_and_dict_growth():
    yy, xx = np.mgrid[0:20, 0:30]
    img = np.stack(
        [(xx % 5) * 50, (yy % 4) * 60, ((xx + yy) % 6) * 40], axis=-1
    ).astype(np.uint8)
    for interlace in (False, True):
        p = codecs.encode_gif(30, 20, img, interlace=interlace)
        assert codecs.sniff_format(p) == "gif"
        assert (codecs.gif_pixels(p) == img).all()
        assert (codecs.decode_pixels(p) == img).all()
    # large image: LZW code width must grow past the initial size
    yy, xx = np.mgrid[0:80, 0:90]
    big = np.stack(
        [(xx % 4) * 60, (yy % 3) * 70, ((xx + yy) % 5) * 50], axis=-1
    ).astype(np.uint8)
    assert (codecs.gif_pixels(codecs.encode_gif(90, 80, big)) == big).all()


def test_gif_decode_media_and_errors():
    s = np.full((6, 9, 3), (10, 200, 30), np.uint8)
    d = codecs.decode_media(codecs.encode_gif(9, 6, s))
    assert (d["format"], d["width"], d["height"]) == ("gif", 9, 6)
    assert d["mean_value"] == 80.0
    with pytest.raises(ValueError, match="not a GIF"):
        codecs.gif_pixels(b"nope")
    with pytest.raises(ValueError):
        codecs.gif_pixels(b"GIF89a" + b"\x00" * 7 + b"\xff\xff")


# ---------------------------------------------------------------------------
# Property tests: random images through the codec round-trips
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    ncolors=st.integers(1, 8),
    interlace=st.booleans(),
)
def test_gif_lzw_property_roundtrip(w, h, seed, ncolors, interlace):
    """GIF is lossless for any ≤256-color image: encode∘decode == id."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(ncolors, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncolors, size=(h, w))]
    p = codecs.encode_gif(w, h, img, interlace=interlace)
    assert (codecs.gif_pixels(p) == img).all()


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 32),
    h=st.integers(8, 24),
    seed=st.integers(0, 2**31 - 1),
    subsample=st.booleans(),
)
def test_jpeg_property_bounded_error(w, h, seed, subsample):
    """JPEG is lossy but bounded: a random BAND-LIMITED image (two low-
    frequency sinusoids with random phase/amplitude — bounded slope, the
    content JPEG is designed for) survives q90 with small mean absolute
    error, exact dimensions, and a mean within 2 levels."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.empty((h, w, 3))
    for c in range(3):
        a1, a2 = rng.uniform(10, 50, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        # period ≥ 16 px keeps chroma below the 4:2:0 Nyquist limit — a
        # period-8 color sine is legitimately unrepresentable at half-res
        img[..., c] = (
            128
            + a1 * np.sin(2 * np.pi * xx / max(w, 16) + p1)
            + a2 * np.sin(2 * np.pi * yy / max(h, 16) + p2)
        )
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    d = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, subsample=subsample))
    assert (d["width"], d["height"]) == (w, h)
    mae = np.abs(d["pixels"].astype(float) - img.astype(float)).mean()
    # Calibrated against the measured worst over 300 seeds per size:
    # subsample=True peaks at 7.34 (12×16 — the 4:2:0 chroma plane is
    # tiny, so block-edge + upsample-replication error dominates);
    # subsample=False peaks at 1.88.  Random output would be ≈ 60+.
    assert mae < (9.0 if subsample else 4.0), mae
    assert abs(d["mean_value"] - img.astype(np.float64).mean()) < 2.0


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 60),
    spc=st.integers(1, 12),
    sync_every=st.integers(1, 9),
    delta=st.integers(1, 200),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_property_sample_table_roundtrip(n, spc, sync_every, delta, seed):
    """Any (sizes, chunking, cadence, sync) combination survives the
    stsc/stco/stts/stss round-trip with exact offsets and timestamps."""
    rng = np.random.RandomState(seed)
    sizes = rng.randint(1, 400, size=n).tolist()
    p = codecs.encode_mp4(
        32, 24, sizes, delta_units=delta, sync_every=sync_every,
        samples_per_chunk=spc,
    )
    t = codecs.mp4_frame_index(p)
    assert t["sizes"].tolist() == sizes
    exp_off = 32 + np.concatenate([[0], np.cumsum(sizes[:-1])])
    assert t["offsets"].tolist() == exp_off.tolist()
    assert t["pts_units"].tolist() == (delta * np.arange(n)).tolist()
    assert t["sync"].tolist() == list(range(0, n, sync_every))


def test_jpeg_restart_intervals_decode():
    """DRI/RSTn: byte-aligned restart markers with DC-predictor resets —
    the decoder path real camera JPEGs exercise constantly."""
    yy, xx = np.mgrid[0:40, 0:56]
    base = np.clip(128 + 40 * np.sin(2 * np.pi * xx / 28) + 30 * np.cos(2 * np.pi * yy / 20), 0, 255)
    img = np.stack([base] * 3, -1).astype(np.uint8)
    ref = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    for ri in (1, 3):
        for sub in (False, True):
            p = codecs.encode_jpeg(img, quality=90, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in p and b"\xff\xd0" in p  # DRI + RST0 present
            d = codecs.decode_jpeg(p)
            mae = np.abs(d["pixels"].astype(float) - img.astype(float)).mean()
            assert mae < 4.0, (ri, sub, mae)
    # restart segmentation must not change the 4:4:4 result materially
    drst = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, restart_interval=2))
    assert np.abs(drst["pixels"].astype(float) - ref["pixels"].astype(float)).mean() < 0.5


def test_gif_lzw_4096_dictionary_reset():
    """An image with enough distinct pixel runs forces the LZW dictionary
    past 4096 → clear-code reset mid-stream on BOTH sides."""
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 256, size=(100, 100))]
    p = codecs.encode_gif(100, 100, img)
    assert (codecs.gif_pixels(p) == img).all()


def test_audio_spectral_features_exact_integers():
    """Bin-aligned sines: ZCR = 2k−1 sign flips, dominant bin exact, RMS
    within quantization noise of amp/√2 (errors ≤0.5/sample)."""
    import math

    for n, k, amp, rate in [
        (1024, 3, 500, 8192),
        (2048, 17, 12000, 16384),
        (4096, 52, 30000, 32768),
        (4096, 64, 2, 8192),  # tiny amplitude: quantized-to-zero samples
    ]:
        f = codecs.audio_features(codecs.encode_wav_sine(n, k, amp, rate=rate))
        assert f["zero_crossings"] == 2 * k - 1, (n, k)
        assert f["dominant_freq_hz"] == round(k * rate / n)
        assert f["sample_rate"] == rate and f["channels"] == 1
        assert f["duration_ms"] == round(n * 1000 / rate)
        if amp >= 100:
            assert abs(f["rms"] - amp / math.sqrt(2)) < 1.0


def test_audio_spectral_features_stereo_and_silence():
    # stereo constant signal: first channel only for ZCR; no crossings
    p = codecs.encode_wav(n_frames=800, amplitude=1000, rate=8000, channels=2)
    f = codecs.audio_features(p)
    assert f["channels"] == 2 and f["zero_crossings"] == 0
    # all-zero signal: no nonzero samples -> 0 crossings, dominant 0-safe
    silent = codecs.encode_wav(n_frames=64, amplitude=0, rate=8000)
    fs = codecs.audio_features(silent)
    assert fs["zero_crossings"] == 0 and fs["rms"] == 0.0


def test_png_adam7_and_16bit_roundtrip():
    """Adam7 interlace × bit depth × color type × filter: decode inverts
    encode exactly, including ragged dimensions where late passes are
    empty (r4: the interlaced/16-bit seam closed)."""
    import numpy as np

    rng = np.random.default_rng(11)
    for bit_depth in (8, 16):
        hi = 1 << bit_depth
        dt = np.uint8 if bit_depth == 8 else np.uint16
        for interlace in (False, True):
            for n_ch in (1, 2, 3, 4):
                for h, w in [(1, 1), (3, 5), (9, 13), (2, 31)]:
                    ft = (h + w + n_ch) % 5
                    px = rng.integers(0, hi, size=(h, w, n_ch), dtype=dt)
                    p = codecs.encode_png(
                        w, h, pixels=px, filter_type=ft,
                        bit_depth=bit_depth, interlace=interlace,
                    )
                    samples, ihdr, _ = codecs._png_decode_samples(p)
                    assert np.array_equal(samples, px), (bit_depth, interlace, n_ch, h, w)
                    assert (ihdr[0], ihdr[1]) == (w, h)
    # decode_pixels handles interlaced 16-bit via high byte
    px = rng.integers(0, 65536, size=(9, 13, 3), dtype=np.uint16)
    p = codecs.encode_png(13, 9, pixels=px, filter_type=4, bit_depth=16, interlace=True)
    rgb = codecs.decode_pixels(p)
    assert np.array_equal(rgb, (px >> 8).astype(np.uint8))


def test_png_16bit_palette_rejected():
    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        codecs.encode_png(2, 2, rgb=(1, 2, 3), bit_depth=12)
    # 16-bit palette is forbidden by the spec: forge the header
    import struct
    import zlib

    body = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    payload = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", body)
        + codecs._png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codecs.decode_png(payload)


def test_jpeg_progressive_equals_baseline_bit_for_bit():
    """Progressive (SOF2) entropy-codes the SAME quantized coefficients as
    baseline, so decode(progressive) must equal decode(baseline) exactly —
    an encoder-independent oracle for every scan type: interleaved DC
    first/refine, spectral-selection AC first with EOB runs, AC refinement
    with buffered correction bits (r4: seam shrunk to coded video only)."""
    import numpy as np

    rng = np.random.RandomState(31)
    yy, xx = np.mgrid[0:40, 0:56]
    cases = [
        rng.randint(0, 256, size=(9, 13, 3)).astype(np.uint8),   # noise, odd dims
        np.full((24, 40, 3), (200, 3, 77), dtype=np.uint8),      # solid: max EOB runs
        np.stack([(yy * 2) % 256, (xx * 3) % 256, (xx + yy) % 256], -1).astype(np.uint8),
        rng.randint(0, 256, size=(16, 16)).astype(np.uint8),     # grayscale
    ]
    for px in cases:
        for q in (95, 50, 5):
            for sub in (False, True) if px.ndim == 3 else (False,):
                base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=q, subsample=sub))
                prog = codecs.decode_jpeg(
                    codecs.encode_jpeg(px, quality=q, subsample=sub, progressive=True)
                )
                assert np.array_equal(base["pixels"], prog["pixels"]), (px.shape, q, sub)
                assert base["mean_value"] == prog["mean_value"]


def test_jpeg_progressive_rejects_restart_and_sniffs():
    import numpy as np
    import pytest

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        codecs.encode_jpeg(px, progressive=True, restart_interval=2)
    p = codecs.encode_jpeg(px, progressive=True)
    assert codecs.sniff_format(p) == "jpeg"


def test_jpeg_fill_bytes_and_restart_mismatch():
    """T.81 B.1.1.2 fill bytes before markers decode transparently; a
    missing restart marker raises the codec's ValueError contract, never
    a bare IndexError (r4 review)."""
    import numpy as np
    import pytest

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(9, 13, 3)).astype(np.uint8)
    p = bytearray(codecs.encode_jpeg(px, quality=90))
    sof = p.find(b"\xff\xc0")
    p[sof:sof] = b"\xff"  # legal fill byte before SOF0
    d0 = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=90))
    d1 = codecs.decode_jpeg(bytes(p))
    assert np.array_equal(d0["pixels"], d1["pixels"])

    pr = bytearray(codecs.encode_jpeg(px, quality=90, restart_interval=1))
    i = pr.find(b"\xff\xd0")
    del pr[i : i + 2]
    with pytest.raises(ValueError, match="restart marker count"):
        codecs.decode_jpeg(bytes(pr))


def test_ppm_trailing_bytes_do_not_shift_channels():
    """decode_pixels reads PPM pixels from the header-derived offset —
    a trailing newline (ubiquitous in real P6 files) must not rotate the
    channels (r4 review: the tail slice silently did)."""
    import numpy as np

    p = codecs.encode_ppm(2, 2, (10, 20, 30)) + b"\n"
    assert codecs.decode_pixels(p)[0, 0].tolist() == [10, 20, 30]
    assert codecs.decode_ppm(p)["mean_value"] == 20.0


# ---------------------------------------------------------------------------
# dHash (perceptual image hash)
# ---------------------------------------------------------------------------

def test_dhash64_gradient_constant_and_sign():
    from jsons_to_schema_spark.operators.codecs import dhash64

    g = np.tile(np.arange(10, 190, 20, dtype=np.uint8), (8, 1))
    rising = np.stack([g] * 3, axis=-1)
    assert dhash64(rising) == -1  # all 64 bits set -> signed -1
    falling = rising[:, ::-1]
    assert dhash64(falling) == 0  # right cell never brighter
    assert dhash64(np.full((16, 16, 3), 99, np.uint8)) == 0
    with pytest.raises(ValueError, match="empty"):
        dhash64(np.zeros((0, 5), np.uint8))
    with pytest.raises(ValueError, match="ndim"):
        dhash64(np.zeros((2, 2, 3, 1), np.uint8))


def test_dhash64_invariances():
    from jsons_to_schema_spark.operators.codecs import (
        decode_pixels,
        dhash64,
        encode_png,
    )

    base = (np.add.outer(np.arange(64) * 3, np.arange(72) * 5) % 200 + 20)
    rgb = np.stack([base] * 3, -1).astype(np.uint8)
    h = dhash64(rgb)
    # encode/decode round trip preserves the hash exactly
    assert dhash64(decode_pixels(encode_png(72, 64, pixels=rgb))) == h
    # uniform brightness shift (no saturation) preserves every comparison
    shifted = (rgb.astype(np.int16) + 25).clip(0, 255).astype(np.uint8)
    assert dhash64(shifted) == h
    # 2x nearest-neighbor upscale preserves block structure exactly for
    # GRID-ALIGNED dims (8 | 64, 9 | 72)
    up = np.repeat(np.repeat(rgb, 2, axis=0), 2, axis=1)
    assert dhash64(up) == h
    # an unrelated pattern lands far away
    other = np.stack(
        [(np.add.outer(np.arange(64) * 7, -np.arange(72) * 2) % 200 + 20)] * 3,
        -1,
    ).astype(np.uint8)
    d = bin((dhash64(other) ^ h) & (2**64 - 1)).count("1")
    assert d > 10
    # tiny images upsample to the grid instead of failing
    assert isinstance(dhash64(np.arange(6, dtype=np.uint8).reshape(2, 3)), int)


def test_audio_fingerprint64_invariances():
    from jsons_to_schema_spark.operators.codecs import (
        audio_fingerprint64,
        encode_wav_pcm,
        wav_samples,
    )

    n = np.arange(2048, dtype=np.float64)
    # multi-band content: one tone per band with a distinct amplitude
    # profile (band-energy ORDERING is the fingerprint's signal)
    def clip(amps):
        x = np.zeros(2048)
        for f, a in enumerate(amps):
            # one tone per PER-SEGMENT band: segments are 256 samples, so
            # clip-bin k lands on segment-bin k/8; band f spans ~14
            # segment-bins starting at 1 + 128f//9
            k = 8 * (8 + 14 * f)
            x += a * np.sin(2 * np.pi * k * (n + 0.31) / 2048)
        return np.floor(x + 0.5).astype(np.int16)

    base = clip([900, 300, 1200, 500, 1500, 400, 2000, 700, 1100])
    p = encode_wav_pcm(base)
    h = audio_fingerprint64(p)
    # exact power-of-two gain: bit-identical fingerprint
    assert audio_fingerprint64(encode_wav_pcm((base * 2).astype(np.int16))) == h
    # monotone-increasing amplitude profile: the base's 4 'falling'
    # comparisons flip in every segment -> >= 32 bits away
    mono = clip([200, 400, 600, 800, 1000, 1200, 1400, 1600, 1800])
    d = bin((audio_fingerprint64(encode_wav_pcm(mono)) ^ h) & (2**64 - 1)).count("1")
    assert d >= 32
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(encode_wav_pcm(np.zeros(100, np.int16)))
    # decode helper: stereo averages channels
    samples, rate = wav_samples(p)
    assert samples.shape[0] == 2048 and rate == 8192


# ---------------------------------------------------------------------------
# dHash property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(2, 40),
    w=st.integers(2, 48),
    hf=st.integers(1, 5),
    wf=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
    shift=st.integers(1, 40),
)
def test_dhash64_properties(h, w, hf, wf, seed, shift):
    """Random images: uniform unsaturated brightness shifts never change
    the hash (any dims); integer nearest-neighbor upscales preserve it
    when the dims are GRID-ALIGNED (8 | h, 9 | w — unaligned dims shift
    the floor-boundary blocks, so no general upscale claim is made); the
    hash is a pure function of the pixels (recompute-equal)."""
    from jsons_to_schema_spark.operators.codecs import dhash64

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 215, size=(h, w, 3), dtype=np.uint8)  # headroom
    hh = dhash64(base)
    assert dhash64(base.copy()) == hh
    shifted = (base.astype(np.int16) + shift).clip(0, 255).astype(np.uint8)
    assert dhash64(shifted) == hh
    assert -(2**63) <= hh < 2**63  # stores in a Spark long
    aligned = rng.integers(0, 215, size=(8 * hf, 9 * wf, 3), dtype=np.uint8)
    up = np.repeat(np.repeat(aligned, 2, axis=0), 3, axis=1)
    assert dhash64(up) == dhash64(aligned)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(300, 3000))
def test_audio_fingerprint64_gain_property(seed, n):
    """Random int16 clips: an exact power-of-two gain never changes the
    fingerprint (scaling commutes with float rounding), and the value
    stores in a Spark long."""
    from jsons_to_schema_spark.operators.codecs import (
        audio_fingerprint64,
        encode_wav_pcm,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-8000, 8000, size=n, dtype=np.int16)
    f = audio_fingerprint64(encode_wav_pcm(s))
    assert audio_fingerprint64(encode_wav_pcm((s * 2).astype(np.int16))) == f
    assert audio_fingerprint64(encode_wav_pcm((s * 4).astype(np.int16))) == f
    assert -(2**63) <= f < 2**63


def test_wav_samples_8bit_unsigned_midpoint():
    """8-bit PCM is unsigned with a 128 midpoint (RIFF spec): digital
    silence must decode to zeros, not a sign-wrapped square wave
    (review finding)."""
    import io
    import wave

    from jsons_to_schema_spark.operators.codecs import wav_samples

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128] * 300 + [255, 1] * 50))
    arr, rate = wav_samples(buf.getvalue())
    assert rate == 8000 and arr.shape[0] == 400
    assert (arr[:300] == 0.0).all()
    assert arr[300] == 127.0 and arr[301] == -127.0


def test_validate_media_payloads_statuses_and_unclaimed(spark):
    """validate_media_payloads: every status arm, plus the claimed_col=None
    path where a sniffable valid payload is 'ok' regardless of kind and a
    NULL payload grades 'empty'."""
    import numpy as np

    from jsons_to_schema_spark.operators import multimodal
    from jsons_to_schema_spark.operators.codecs import encode_bmp, encode_png

    bmp = bytearray(encode_bmp(4, 3, (1, 2, 3)))
    png_trunc = bytearray(encode_png(5, 5, (9, 9, 9))[:18])
    rows = [
        ("a", "bmp", bmp),
        ("b", "png", bmp),          # mismatch
        ("c", "png", png_trunc),    # corrupt
        ("d", "wav", None),         # NULL payload -> empty
        ("e", "bin", bytearray(b"NOTAMAGIC###")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary"
    )
    out = {
        r.media_ref: r
        for r in multimodal.validate_media_payloads(
            df, "media_ref", "payload", "kind"
        ).collect()
    }
    assert out["a"].status == "ok" and out["a"].ok
    assert out["b"].status == "kind_mismatch" and out["b"].sniffed == "bmp"
    assert out["c"].status == "corrupt" and not out["c"].ok
    assert out["d"].status == "empty" and out["d"].sniffed is None
    assert out["e"].status == "unknown_magic"
    # no claimed column: the mismatch row becomes a plain successful decode
    free = {
        r.media_ref: r
        for r in multimodal.validate_media_payloads(
            df, "media_ref", "payload"
        ).collect()
    }
    assert free["b"].status == "ok" and free["b"].claimed is None
