"""Auto-split from the former queries.py monolith (scripts/split_queries.py, r5); see queries/__init__.py for the registry contract."""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, dedup, drift, joins, multimodal, resolve, sample, similarity, stats, temporal, text, validate
from ..operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
    infer_from_struct,
    infer_grouped,
)
from ..sources.jsonl import export_table_jsonl, infer_jsonl, read_jsonl, with_json_validity
from ..sources.spans import ensure_corpus
from ..sources.tables import load_media_catalog, load_spans, load_table
from ._registry import query
from ._shared import (
    _spans_corpus,
)


# ===========================================================================
# Multimodal plumbing (stub decoder — rows-only)
# ===========================================================================

@query(
    "multimodal_media_features",
    oracle="""
    WITH src AS (
      SELECT media_ref, media_kind, media_ref || ':payload' AS payload,
             sha256(media_ref || ':payload') AS h
      FROM read_parquet('__CATALOG_PQ__') WHERE media_ref < 'm-00000500'
    )
    SELECT media_ref, media_kind,
           CAST(strlen(payload) AS BIGINT) AS n_bytes,
           h AS content_sha256,
           CAST(16 + CAST('0x' || substr(h, 1, 2) AS INT) % 240 AS INT) AS width,
           CAST(16 + CAST('0x' || substr(h, 3, 2) AS INT) % 240 AS INT) AS height,
           CAST(CASE WHEN media_kind IN ('audio', 'video')
                     THEN CAST('0x' || substr(h, 5, 4) AS INT)
                     ELSE 0 END AS INT) AS duration_ms
    FROM src
    """,
)
def multimodal_media_features(spark, sf_dir) -> DataFrame:
    """Fake-decode features over synthetic binary payloads derived from the
    media catalog, exercising the real mapInPandas plumbing.  The stub
    decoder is a pure sha256-of-bytes function, so the whole stage is
    reproducible in DuckDB — a REAL value oracle for the plumbing (the
    codec call itself stays the documented NotImplementedError seam).
    Deterministic subset via a key predicate, not an unordered limit()."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(F.col("media_ref") < "m-00000500")
    with_payload = cat.select(
        "media_ref",
        "media_kind",
        F.encode(F.concat(F.col("media_ref"), F.lit(":payload")), "utf-8").alias(
            "payload"
        ),
    )
    return multimodal.media_features(
        with_payload, "media_ref", "payload", "media_kind", fake=True
    )


@query(
    "multimodal_resize_images",
    oracle="""
    WITH d AS (
      SELECT media_ref, media_ref || ':img' AS payload,
             16 + CAST('0x' || substr(sha256(media_ref || ':img'), 1, 2) AS INT) % 240 AS dw,
             16 + CAST('0x' || substr(sha256(media_ref || ':img'), 3, 2) AS INT) % 240 AS dh
      FROM read_parquet('__CATALOG_PQ__')
      WHERE media_kind = 'image' AND media_ref < 'm-00000600'
    ), s AS (
      SELECT media_ref, payload, dw, dh,
             least(CAST(1.0 AS DOUBLE), CAST(128 AS DOUBLE) / greatest(dw, dh)) AS scale
      FROM d
    )
    SELECT media_ref,
           CAST(floor(dw * scale) AS INT) AS width,
           CAST(floor(dh * scale) AS INT) AS height,
           CAST(greatest(1, floor(strlen(payload) * scale)) AS BIGINT) AS n_bytes_out
    FROM s
    """,
)
def multimodal_resize_images(spark, sf_dir) -> DataFrame:
    """Resize plumbing (binary→binary mapInPandas, stub codec) over synthetic
    payloads for the image-kind catalog entries.  The projection returns the
    resize METADATA (box + output byte count) so the fake-codec stage is
    fully value-oracled in DuckDB; the binary payload column itself stays an
    opaque pass-through (asserted in tests)."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "image") & (F.col("media_ref") < "m-00000600")
    )
    with_payload = cat.select(
        "media_ref",
        F.encode(F.concat(F.col("media_ref"), F.lit(":img")), "utf-8").alias("payload"),
    )
    resized = multimodal.resize_images(
        with_payload, "media_ref", "payload", max_side=128, fake=True
    )
    return resized.select(
        "media_ref",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes_out"),
    )


@query(
    "multimodal_frame_sample_plan",
    oracle="""
    SELECT media_ref, CAST(unnest(range(0, 10001, 1000)) AS INT) AS sample_at_ms
    FROM read_parquet('__CATALOG_PQ__')
    WHERE media_kind = 'audio' AND media_ref < 'm-00000300'
    """,
)
def multimodal_frame_sample_plan(spark, sf_dir) -> DataFrame:
    """Frame/segment-sampling work plan for time-media refs: pure built-ins
    (explode(sequence)) — no payload touched, so the planning stage is
    column-pruned to the ref column; the decode of each planned timestamp is
    the stubbed mapInPandas stage.  Fully oracled."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "audio") & (F.col("media_ref") < "m-00000300")
    )
    return multimodal.frame_sample_plan(cat, "media_ref", every_ms=1000)


@query(
    "multimodal_frame_features",
    oracle="""
    WITH plan AS (
      SELECT media_ref, media_ref || ':vid' AS payload,
             CAST(unnest(range(0, 10001, 2000)) AS INT) AS sample_at_ms
      FROM read_parquet('__CATALOG_PQ__')
      WHERE media_kind = 'audio' AND media_ref < 'm-00000150'
    )
    SELECT media_ref, sample_at_ms,
           sha256(payload || ':' || CAST(sample_at_ms AS VARCHAR)) AS frame_sha256,
           CAST(CAST('0x' || substr(
             sha256(payload || ':' || CAST(sample_at_ms AS VARCHAR)), 1, 2
           ) AS INT) AS INT) AS mean_luma
    FROM plan
    """,
)
def multimodal_frame_features(spark, sf_dir) -> DataFrame:
    """The full time-media pipeline shape: frame_sample_plan fans each ref
    into (ref, timestamp) work items, the payload joins in once per ref, and
    the stubbed frame decoder (sha256-pure, fake=True) emits per-frame
    features via mapInPandas — every row value-reproduced in SQL."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "audio") & (F.col("media_ref") < "m-00000150")
    )
    plan = multimodal.frame_sample_plan(cat, "media_ref", every_ms=2000)
    with_payload = plan.join(
        cat.select(
            "media_ref",
            F.encode(F.concat(F.col("media_ref"), F.lit(":vid")), "utf-8").alias(
                "payload"
            ),
        ),
        "media_ref",
    )
    return multimodal.frame_features(
        with_payload, "media_ref", "payload", "sample_at_ms", fake=True
    )


@query(
    "multimodal_real_codec_features",
    oracle="""
    WITH i AS (SELECT unnest(range(0, 40)) AS i)
    SELECT 'wav-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           'wav' AS format, CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(100 + 5 * i AS INT) AS duration_ms,
           CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           round(CAST(1000 + i AS DOUBLE), 6) AS mean_value
    FROM i
    UNION ALL
    SELECT 'bmp-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'bmp', CAST(4 + i % 8 AS INT), CAST(3 + i % 5 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round((i % 256 + (2 * i) % 256 + (3 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'ppm-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'ppm', CAST(2 + i % 6 AS INT), CAST(2 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round((i % 200 + (5 * i) % 200 + (7 * i) % 200) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'png-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'png', CAST(3 + i % 6 AS INT), CAST(2 + i % 4 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((11 * i) % 256 + (13 * i) % 256 + (17 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'pngx-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'png', CAST(5 + i % 9 AS INT), CAST(3 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((2571 * i) % 65536 + (4099 * i) % 65536 + (6733 * i) % 65536) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'mp4-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'mp4', CAST(64 + 16 * (i % 5) AS INT), CAST(48 + 16 * (i % 4) AS INT),
           CAST(40 * (10 + i % 20) AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
           (SELECT round(AVG(50 + (7 * f.j + i) % 32), 6)
            FROM (SELECT unnest(range(0, 10 + i % 20)) AS j) f)
    FROM i
    UNION ALL
    SELECT 'jpg-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'jpeg', CAST(8 + i % 9 AS INT), CAST(8 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((31 * i) % 256 + (57 * i) % 256 + (89 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'jpgp-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'jpeg', CAST(8 + i % 6 AS INT), CAST(8 + i % 5 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((41 * i) % 256 + (67 * i) % 256 + (101 * i) % 256) / 3.0, 6)
    FROM i
    """,
)
def multimodal_real_codec_features(spark, sf_dir) -> DataFrame:
    """REAL stdlib codecs end-to-end (r3, VERDICT item 2; PNG r4 item 4):
    320 synthesized payloads across eight arms (WAV/BMP/PPM/PNG/16-bit-
    interlaced-PNG/MP4/JPEG/progressive-JPEG) decode through the
    Arrow-batched mapInPandas stage (operators/codecs.py — wave/struct/
    zlib/numpy, no external libs) and every derived field is recomputed
    arithmetically by the DuckDB oracle from the synthesis parameters: WAV
    duration = frames/rate, RMS of a constant signal = its amplitude;
    BMP/PPM/PNG dimensions from planted headers, mean channel value =
    (r+g+b)/3.  Each PNG uses scanline filter i % 5, so all five unfilter
    branches (None/Sub/Up/Average/Paeth) run in the distributed stage;
    the pngx- arm (r4) is 16-bit Adam7-INTERLACED PNG — tiny dimensions
    exercise empty interlace passes, and means are over the native
    0–65535 sample range.
    MP4 (r4) decodes the CONTAINER: geometry/duration from tkhd/mdhd,
    mean_value = mean coded-frame size from stsz.  JPEG (r4) runs the FULL
    baseline pipeline — Huffman entropy decode, dequant, IDCT, YCbCr→RGB —
    on solid-color q95 payloads, where quantization is provably lossless,
    so the oracle's (r+g+b)/3 check is exact; the jpgp- arm (r4) runs the
    PROGRESSIVE (SOF2) decoder — multi-scan spectral selection +
    successive approximation accumulating into the coefficient store —
    over progressively-encoded payloads of the same solid-color family.
    All recomputed by the oracle from the synthesis arithmetic.
    NotImplementedError now marks only decode that genuinely needs
    external codec libraries (coded video frames, arithmetic coding)."""
    import numpy as np

    from ..operators.codecs import (
        encode_bmp,
        encode_jpeg,
        encode_mp4,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rows = []
    for i in range(40):
        rows.append(
            (
                f"jpg-{i:04d}",
                bytearray(
                    encode_jpeg(
                        np.full(
                            (8 + i % 7, 8 + i % 9, 3),
                            ((31 * i) % 256, (57 * i) % 256, (89 * i) % 256),
                            dtype=np.uint8,
                        ),
                        quality=95,
                    )
                ),
            )
        )
        rows.append(
            (
                f"jpgp-{i:04d}",
                bytearray(
                    encode_jpeg(
                        np.full(
                            (8 + i % 5, 8 + i % 6, 3),
                            ((41 * i) % 256, (67 * i) % 256, (101 * i) % 256),
                            dtype=np.uint8,
                        ),
                        quality=95,
                        progressive=True,
                    )
                ),
            )
        )
        rows.append(
            (
                f"mp4-{i:04d}",
                bytearray(
                    encode_mp4(
                        64 + 16 * (i % 5),
                        48 + 16 * (i % 4),
                        [50 + ((7 * j + i) % 32) for j in range(10 + i % 20)],
                    )
                ),
            )
        )
        rows.append((f"wav-{i:04d}", bytearray(encode_wav(800 + 40 * i, 1000 + i))))
        rows.append(
            (
                f"bmp-{i:04d}",
                bytearray(
                    encode_bmp(4 + i % 8, 3 + i % 5, (i % 256, (2 * i) % 256, (3 * i) % 256))
                ),
            )
        )
        rows.append(
            (
                f"ppm-{i:04d}",
                bytearray(
                    encode_ppm(2 + i % 6, 2 + i % 7, (i % 200, (5 * i) % 200, (7 * i) % 200))
                ),
            )
        )
        rows.append(
            (
                f"png-{i:04d}",
                bytearray(
                    encode_png(
                        3 + i % 6,
                        2 + i % 4,
                        ((11 * i) % 256, (13 * i) % 256, (17 * i) % 256),
                        filter_type=i % 5,
                    )
                ),
            )
        )
        rows.append(
            (
                f"pngx-{i:04d}",
                bytearray(
                    encode_png(
                        5 + i % 9,
                        3 + i % 7,
                        ((2571 * i) % 65536, (4099 * i) % 65536, (6733 * i) % 65536),
                        filter_type=(i + 2) % 5,
                        bit_depth=16,
                        interlace=True,
                    )
                ),
            )
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.decode_features(df, "media_ref", "payload")
    return feats.withColumn("mean_value", F.round("mean_value", 6))


@query(
    "multimodal_audio_spectral",
    oracle="""
    WITH i AS (SELECT CAST(unnest(range(0, 48)) AS INT) AS i),
         p AS (SELECT i,
                      1024 * (CASE i % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS n,
                      3 + (7 * i) % 50 AS k
               FROM i)
    SELECT 'sine-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           CAST(125 AS INT) AS duration_ms,
           CAST(8 * n AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(2 * k - 1 AS INT) AS zero_crossings,
           CAST(8 * k AS INT) AS dominant_freq_hz
    FROM p
    """,
)
def multimodal_audio_spectral(spark, sf_dir) -> DataFrame:
    """Spectral audio analysis (r4): 48 synthesized 16-bit PCM sines run
    through the Arrow-batched rFFT stage (multimodal.audio_spectral_features)
    and every output field is recomputed arithmetically by the oracle from
    the synthesis parameters: rate = 8·n so duration = n/(8n) s = 125 ms
    and the bin-k FFT peak sits at exactly 8·k Hz (zero leakage); k whole
    periods give 2k−1 sign-flip zero crossings (codecs.encode_wav_sine
    docstring derives both).  RMS ≈ amp/√2 is quantization-perturbed, so
    it is asserted with tolerance in pytest and projected out here."""
    from ..operators.codecs import encode_wav_sine

    rows = []
    for i in range(48):
        n = 1024 * (1 << (i % 3))
        k = 3 + (7 * i) % 50
        amp = 500 + 137 * i
        rows.append((f"sine-{i:04d}", bytearray(encode_wav_sine(n, k, amp, rate=8 * n))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.audio_spectral_features(df, "media_ref", "payload")
    return feats.drop("rms")


@query(
    "multimodal_mjpeg_frame_features",
    oracle="""
    WITH r AS (SELECT CAST(unnest(range(0, 12)) AS INT) AS r),
         t AS (SELECT r, CAST(unnest(range(0, 40 * (12 + r) + 1, 160)) AS INT)
                      AS sample_at_ms
               FROM r),
         pick AS (SELECT r, sample_at_ms,
                         LEAST(sample_at_ms // 40, 11 + r) AS i
                  FROM t)
    SELECT 'mjpeg-' || lpad(CAST(r AS VARCHAR), 4, '0') AS media_ref,
           sample_at_ms, CAST(i AS INT) AS frame_idx, (i % 5 = 0) AS keyframe,
           CAST(24 AS INT) AS frame_w, CAST(16 AS INT) AS frame_h,
           CAST((31 * (r + i)) % 256 AS DOUBLE) AS mean_r,
           CAST((57 * (r + i)) % 256 AS DOUBLE) AS mean_g,
           CAST((89 * (r + i)) % 256 AS DOUBLE) AS mean_b
    FROM pick
    """,
)
def multimodal_mjpeg_frame_features(spark, sf_dir) -> DataFrame:
    """FULLY REAL video pipeline, zero stubs (r4): 12 Motion-JPEG MP4s
    (solid-color baseline-JPEG frames at 40 ms cadence inside a real ISO
    BMFF container) are demuxed from their sample tables, each 160 ms
    target's frame bytes are RANGE-SLICED out of the payload, and the
    baseline JPEG decoder reconstructs the pixels — per-frame dims and
    per-channel means, all recomputed arithmetically by the oracle (frame
    j of video r is solid ((31(r+j))%256, (57(r+j))%256, (89(r+j))%256),
    exact at q95 because solid blocks survive quantization).  One Arrow-
    batched stage; decode cost scales with SAMPLED frames, not video
    length — the shape a 100-TB video corpus needs."""
    import numpy as np

    from ..operators.codecs import encode_jpeg, encode_mp4

    rows = []
    for r in range(12):
        frames = [
            encode_jpeg(
                np.full(
                    (16, 24, 3),
                    ((31 * (r + j)) % 256, (57 * (r + j)) % 256, (89 * (r + j)) % 256),
                    dtype=np.uint8,
                ),
                quality=95,
            )
            for j in range(12 + r)
        ]
        rows.append((f"mjpeg-{r:04d}", bytearray(encode_mp4(24, 16, frame_payloads=frames))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.frame_features_mp4(df, "media_ref", "payload", every_ms=160)


@query(
    "multimodal_validate_payloads",
    oracle="""
    WITH ids AS (SELECT CAST(unnest(range(0, 25)) AS BIGINT) AS i)
    SELECT 'ok-bmp-' || CAST(i AS VARCHAR) AS media_ref, 'bmp' AS claimed,
           'bmp' AS sniffed, 'ok' AS status, true AS ok FROM ids
    UNION ALL
    SELECT 'ok-gif-' || CAST(i AS VARCHAR), 'gif', 'gif', 'ok', true FROM ids
    UNION ALL
    SELECT 'corrupt-png-' || CAST(i AS VARCHAR), 'png', 'png', 'corrupt',
           false FROM ids
    UNION ALL
    SELECT 'mismatch-' || CAST(i AS VARCHAR), 'png', 'wav', 'kind_mismatch',
           false FROM ids
    UNION ALL
    SELECT 'empty-' || CAST(i AS VARCHAR), 'wav', NULL, 'empty', false
    FROM ids
    UNION ALL
    SELECT 'junk-' || CAST(i AS VARCHAR), 'bin', NULL, 'unknown_magic',
           false FROM ids
    UNION ALL
    SELECT 'wav24-' || CAST(i AS VARCHAR), 'wav', 'wav', 'unsupported',
           false FROM ids
    """,
)
def multimodal_validate_payloads(spark, sf_dir) -> DataFrame:
    """Payload-parses-as-claimed validation (multimodal.
    validate_media_payloads) — the binary-column arm of the constraint
    engine: 175 payloads across seven construction arms whose verdicts
    are provable from how each was built.  Valid BMP/GIF decode to 'ok';
    a PNG truncated inside its IHDR keeps perfect magic bytes but fails
    the full decode ('corrupt' — the arm a header-only check would pass);
    a valid WAV in a column claiming 'png' grades 'kind_mismatch' before
    any decode; empty and garbage payloads grade 'empty'/'unknown_magic';
    and a 24-bit WAV lands on the documented NotImplementedError seam
    ('unsupported'), distinguished from corruption.  The oracle is the
    construction itself, written as literal rows."""
    import io
    import wave

    import numpy as np

    from ..operators.codecs import encode_bmp, encode_gif, encode_png, encode_wav

    rows = []
    for i in range(25):
        rows.append(
            (
                f"ok-bmp-{i}",
                "bmp",
                bytearray(
                    encode_bmp(
                        4 + i % 5,
                        3 + i % 4,
                        (i % 256, (3 * i) % 256, (7 * i) % 256),
                    )
                ),
            )
        )
        px = np.full(
            (5, 4, 3),
            ((11 * i) % 256, (5 * i) % 256, (2 * i) % 256),
            dtype=np.uint8,
        )
        rows.append((f"ok-gif-{i}", "gif", bytearray(encode_gif(4, 5, px))))
        rows.append(
            (
                f"corrupt-png-{i}",
                "png",
                bytearray(
                    encode_png(6 + i % 3, 6, ((13 * i) % 256, 0, 255))[
                        : 16 + i % 5
                    ]
                ),
            )
        )
        rows.append(
            (f"mismatch-{i}", "png", bytearray(encode_wav(50 + i, 1000 + i)))
        )
        rows.append((f"empty-{i}", "wav", bytearray(b"")))
        rows.append(
            (f"junk-{i}", "bin", bytearray(b"XYZW" + bytes([i % 256]) * 8))
        )
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(bytes([i % 256, 1, 2]) * 60)
        w.close()
        rows.append((f"wav24-{i}", "wav", bytearray(buf.getvalue())))
    df = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary"
    )
    return multimodal.validate_media_payloads(
        df, "media_ref", "payload", "kind"
    )


@query(
    "multimodal_frame_plan_from_durations",
    oracle="""
    WITH i AS (SELECT unnest(range(0, 40)) AS i),
         d AS (SELECT 'wav-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
                      100 + 5 * i AS dur
               FROM i)
    SELECT media_ref, CAST(unnest(range(0, dur + 1, 25)) AS INT) AS sample_at_ms
    FROM d
    """,
)
def multimodal_frame_plan_from_durations(spark, sf_dir) -> DataFrame:
    """Frame planning driven by REAL decoded durations: WAV payloads decode
    through the stdlib codec stage, and the planner fans out one work item
    per 25 ms of actual audio (multimodal.frame_plan_from_durations) — the
    oracle recomputes every timestamp from the synthesis arithmetic
    (duration = frames/rate)."""
    from ..operators.codecs import encode_wav

    rows = [
        (f"wav-{i:04d}", bytearray(encode_wav(800 + 40 * i, 1000 + i)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.decode_features(df, "media_ref", "payload")
    return multimodal.frame_plan_from_durations(feats, every_ms=25)


@query(
    "multimodal_resize_real_images",
    oracle="""
    WITH i AS (SELECT CAST(unnest(range(0, 40)) AS INT) AS i),
         src AS (SELECT i,
                        ['bmp', 'ppm', 'png', 'jpeg', 'gif'][(i % 5) + 1] AS fmt,
                        20 + 4 * (i % 13) AS iw,
                        12 + 3 * (i % 9) AS ih
                 FROM i),
         scaled AS (SELECT i, fmt, iw, ih,
                           LEAST(1.0, 16.0 / GREATEST(iw, ih)) AS s
                    FROM src)
    SELECT fmt || '-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           CAST(GREATEST(1, FLOOR(iw * s + 0.5)) AS INT) AS width,
           CAST(GREATEST(1, FLOOR(ih * s + 0.5)) AS INT) AS height,
           round(((31 * i) % 256 + (57 * i) % 256 + (89 * i) % 256) / 3.0, 6)
             AS mean_value
    FROM scaled
    """,
)
def multimodal_resize_real_images(spark, sf_dir) -> DataFrame:
    """REAL image resize end-to-end (r4): 40 solid-color payloads across
    all five pixel-decodable formats (BMP/PPM/PNG/GIF and baseline JPEG at
    q95, where solid blocks survive quantization bit-exactly) decode,
    bilinear-downscale to a 16-px box (half-pixel centers; bilinear of a
    constant is the constant), and re-encode as lossless PNG; the output
    PNGs are then RE-DECODED by the shared feature stage, so the oracle's
    arithmetic mean check covers decode → resize → encode → decode.
    Dimension arithmetic is half-up rounding, matching SQL ROUND."""
    import numpy as np

    from ..operators.codecs import (
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_ppm,
    )

    rows = []
    for i in range(40):
        fmt = ["bmp", "ppm", "png", "jpeg", "gif"][i % 5]
        iw, ih = 20 + 4 * (i % 13), 12 + 3 * (i % 9)
        rgb = ((31 * i) % 256, (57 * i) % 256, (89 * i) % 256)
        if fmt == "bmp":
            p = encode_bmp(iw, ih, rgb)
        elif fmt == "ppm":
            p = encode_ppm(iw, ih, rgb)
        elif fmt == "png":
            p = encode_png(iw, ih, rgb, filter_type=i % 5)
        elif fmt == "gif":
            p = encode_gif(iw, ih, np.full((ih, iw, 3), rgb, dtype=np.uint8))
        else:
            p = encode_jpeg(np.full((ih, iw, 3), rgb, dtype=np.uint8), quality=95)
        rows.append((f"{fmt}-{i:04d}", bytearray(p)))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    resized = multimodal.resize_images(df, "media_ref", "payload", max_side=16)
    feats = multimodal.decode_features(resized, "media_ref", "payload")
    return resized.select("media_ref", "width", "height").join(
        feats.select("media_ref", F.round("mean_value", 6).alias("mean_value")),
        "media_ref",
    )


@query(
    "multimodal_mp4_frame_plan",
    oracle="""
    WITH r AS (SELECT CAST(unnest(range(0, 20)) AS INT) AS r),
         f AS (SELECT r, CAST(unnest(range(0, 24 + r)) AS INT) AS i FROM r),
         sz AS (SELECT r, i, 50 + (7 * i + r) % 32 AS n_bytes FROM f),
         off AS (SELECT r, i, n_bytes,
                        32 + COALESCE(SUM(n_bytes) OVER (
                          PARTITION BY r ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS byte_offset
                 FROM sz),
         t AS (SELECT r, CAST(unnest(range(0, 40 * (24 + r) + 1, 200)) AS INT)
                      AS sample_at_ms
               FROM r),
         pick AS (SELECT r, sample_at_ms,
                         LEAST(sample_at_ms // 40, 23 + r) AS i
                  FROM t)
    SELECT 'mp4-' || lpad(CAST(r AS VARCHAR), 4, '0') AS media_ref,
           sample_at_ms,
           CAST(i AS INT) AS frame_idx,
           CAST(40 * i AS INT) AS pts_ms,
           CAST(byte_offset AS BIGINT) AS byte_offset,
           CAST(n_bytes AS INT) AS n_bytes,
           (i % 5 = 0) AS keyframe,
           CAST(i - (i % 5) AS INT) AS seek_from_idx
    FROM pick JOIN off USING (r, i)
    """,
)
def multimodal_mp4_frame_plan(spark, sf_dir) -> DataFrame:
    """REAL MP4 frame-sampling plan (r4): 20 synthesized ISO BMFF files
    (mdat-first, per-sample stsz, 7-samples-per-chunk stsc/stco, stss
    keyframes every 5) demux through codecs.parse_mp4 inside the Arrow-
    batched planner, and every emitted field — frame index at each 200 ms
    target, its pts, ABSOLUTE byte range reconstructed from the chunk
    tables, keyframe flag, and the stss seek point — is recomputed
    arithmetically by the oracle from the synthesis parameters (frame j of
    file r is 50 + (7j + r) % 32 bytes at 40 ms cadence; mdat body starts
    at offset 32).  This is the operator a video pipeline uses to range-
    read frames from object storage without decoding or shipping files."""
    from ..operators.codecs import encode_mp4

    rows = [
        (
            f"mp4-{r:04d}",
            bytearray(
                encode_mp4(
                    64 + 16 * (r % 5),
                    48 + 16 * (r % 4),
                    [50 + ((7 * i + r) % 32) for i in range(24 + r)],
                )
            ),
        )
        for r in range(20)
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.frame_plan_mp4(df, "media_ref", "payload", every_ms=200)


@query(
    "multimodal_image_near_dup",
    oracle="""
    SELECT 'cpy-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'img-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(0, 25)) AS INT) AS i)
    """,
)
def multimodal_image_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual image dedup end to end (codecs.dhash64 →
    multimodal.image_dhash → dedup.hamming_near_dup_pairs): 75
    synthesized PNGs — 25 gradient families with distinct row/col slope
    pairs, each with a brightness-shifted near-copy and a mirrored
    distractor — run the full decode → signature → band-join →
    exact-verify pipeline.  The oracle is derived from the CONSTRUCTION:
    a uniform unsaturated brightness shift preserves every dHash block
    comparison (copy ⇒ Hamming 0), mirroring reverses the gradient
    (distractor ⇒ far), and the slope grid keeps families > 3 bits apart
    (verified property of these exact payloads; the hash itself is exact
    integer arithmetic, bit-deterministic at any partitioning) — so the
    output must be EXACTLY the 25 planted (cpy-i, img-i, 0) pairs."""
    import numpy as np

    from ..operators.codecs import encode_png

    rows = []
    for i in range(25):
        a = (i % 5) * 11 + 3
        b = (i // 5) * 13 + 5
        base = (
            (np.add.outer(np.arange(24) * a, np.arange(27) * b) // (1 + i % 3))
            % 180
            + 30
        ).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        copy = (rgb.astype(np.int16) + 15).clip(0, 255).astype(np.uint8)
        rows.append((f"img-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb))))
        rows.append((f"cpy-{i:02d}", bytearray(encode_png(27, 24, pixels=copy))))
        rows.append(
            (f"inv-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb[:, ::-1])))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "multimodal_audio_near_dup",
    oracle="""
    SELECT 'dup-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'src-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(1, 21)) AS INT) AS i)
    """,
)
def multimodal_audio_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual audio dedup end to end (codecs.audio_fingerprint64 →
    multimodal.audio_fingerprint → dedup.hamming_near_dup_pairs): 40
    synthesized multi-tone WAVs — 20 families whose per-band amplitude
    ladder REALIZES bit pattern i in every time segment (verified
    construction: the fingerprint equals the pattern replicated 8×, so
    distinct families sit ≥ 8 bits apart), each with an exact
    power-of-two-gain duplicate (scaling by 2 commutes with float
    rounding ⇒ Hamming 0).  The oracle is therefore derived from the
    construction: exactly the 20 planted (dup-i, src-i, 0) pairs."""
    import numpy as np

    from ..operators.codecs import encode_wav_pcm

    n = np.arange(2048, dtype=np.float64)
    rows = []
    for i in range(1, 21):
        amps = [300.0]
        for f in range(8):
            amps.append(amps[-1] * 1.5 if (i >> f) & 1 else amps[-1] / 1.5)
        x = np.zeros(2048)
        for f, a in enumerate(amps):
            k = 8 * (8 + 14 * f)
            x += a * np.sin(2 * np.pi * k * (n + 0.31) / 2048)
        s = np.floor(x + 0.5).astype(np.int16)
        rows.append((f"src-{i:02d}", bytearray(encode_wav_pcm(s))))
        rows.append(
            (f"dup-{i:02d}", bytearray(encode_wav_pcm((s * 2).astype(np.int16))))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.audio_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "multimodal_video_near_dup",
    oracle="""
    SELECT 'mux-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'vid-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(1, 21)) AS INT) AS i)
    """,
)
def multimodal_video_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual video dedup end to end (codecs.video_fingerprint64 →
    multimodal.video_fingerprint → dedup.hamming_near_dup_pairs): 40
    synthesized MP4s — 20 families whose coded-frame SIZE LADDER
    realizes bit pattern i across the 65 fingerprint blocks (families
    ≥ 8 bits apart by construction), each with a re-muxed copy (same
    sample table, different geometry metadata ⇒ identical size sequence
    ⇒ Hamming 0).  No pixel decode anywhere — the fingerprint reads the
    container sample table, which is exactly what survives the
    coded-frame (H.264) seam.  The oracle is the construction-derived
    planted (mux-i, vid-i, 0) list."""
    from ..operators.codecs import encode_mp4

    def sizes_for_pattern(p, frames=130):
        vals, v = [], 4000
        for b in range(65):
            vals += [v, v]
            v = int(v * 1.2) if (p >> (b % 8)) & 1 else max(int(v / 1.2), 10)
        return vals[:frames]

    rows = []
    for i in range(1, 21):
        s = sizes_for_pattern(i)
        rows.append((f"vid-{i:02d}", bytearray(encode_mp4(64, 48, s))))
        rows.append((f"mux-{i:02d}", bytearray(encode_mp4(128, 96, s))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.video_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "multimodal_image_dup_clusters",
    oracle="""
    SELECT p || '-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
           'a-' || lpad(CAST(i AS VARCHAR), 2, '0') AS cluster
    FROM (SELECT CAST(unnest(range(0, 15)) AS INT) AS i),
         (SELECT unnest(['a', 'b', 'c']) AS p)
    """,
)
def multimodal_image_dup_clusters(spark, sf_dir) -> DataFrame:
    """Image duplicate CLUSTERS end to end: dHash pairs
    (multimodal.image_near_dup_pairs) feed the large-star/small-star
    connected components (dedup.duplicate_clusters) — 15 gradient
    families × three brightness-shifted copies (a/b/c at +0/+15/+30,
    all Hamming 0 → a triangle per family) plus a mirrored distractor
    per family that pairs with nothing and therefore appears in NO
    cluster row.  The oracle is construction-derived: every family
    collapses to cluster 'a-i' with exactly its three members — 45
    rows."""
    import numpy as np

    from ..operators.codecs import encode_png

    rows = []
    for i in range(15):
        a = (i % 5) * 11 + 3
        b = (i // 5) * 13 + 5
        base = (
            (np.add.outer(np.arange(24) * a, np.arange(27) * b) // (1 + i % 3))
            % 180
            + 30
        ).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        for tag, shift in (("a", 0), ("b", 15), ("c", 30)):
            px = (rgb.astype(np.int16) + shift).clip(0, 255).astype(np.uint8)
            rows.append(
                (f"{tag}-{i:02d}", bytearray(encode_png(27, 24, pixels=px)))
            )
        rows.append(
            (f"x-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb[:, ::-1])))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    pairs = multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3)
    return dedup.duplicate_clusters(pairs)


def _cdc_blocks() -> list:
    """32 deterministic 256-byte blocks (sha256 chain) — the synthetic
    'shared segments' dictionary for the CDC dedup query."""
    import hashlib

    blocks = []
    for j in range(32):
        out = b""
        seed = f"cdc-block-{j}".encode()
        while len(out) < 256:
            seed = hashlib.sha256(seed).digest()
            out += seed
        blocks.append(out[:256])
    return blocks


@query("media_chunk_dedup")  # pinned-snapshot oracle (oracle_constants.json)
def media_chunk_dedup(spark, sf_dir) -> DataFrame:
    """Content-defined chunking dedup over synthetic media payloads
    (operators/binchunk): each media asset's payload is 8 blocks drawn
    deterministically (md5 of (ref, position)) from a 32-block
    dictionary — the same segments recur across assets at DIFFERENT byte
    offsets, exactly the sharing whole-payload hashing misses and CDC's
    shift-invariant boundaries recover.  Payload synthesis is pure
    Catalyst (binary literals + md5 index — no Python); chunking is one
    mapInArrow pass; the report is a chunk-hash groupBy.  Deterministic
    end-to-end → pinned determinism-guarded oracle; shift-invariance and
    planted-duplicate semantics are pytest-pinned (test_round4o_ops)."""
    from ..operators.binchunk import chunk_dedup_report, content_defined_chunks
    from ..sources.tables import load_media_catalog

    blocks = _cdc_blocks()
    cat = load_media_catalog(spark, _spans_corpus(spark)).select("media_ref")
    arr = F.array(*[F.lit(b) for b in blocks])
    parts = [
        F.element_at(
            arr,
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("-", F.col("media_ref"), F.lit(str(i)))),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 32
                + 1
            ).cast("int"),
        )
        for i in range(8)
    ]
    payloads = cat.select(
        "media_ref", F.concat(*parts).alias("payload")
    )
    chunks = content_defined_chunks(
        payloads, "payload", "media_ref", avg_bits=7, min_len=48, max_len=512
    )
    return chunk_dedup_report(chunks)
