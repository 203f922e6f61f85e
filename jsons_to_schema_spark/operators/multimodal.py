"""Multimodal column handling — binary payloads with typed metadata.

Images / audio / video are opaque ``binary`` columns plus a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

Codec status (r4): WAV, BMP, PPM, PNG, GIF and baseline JPEG decode for
REAL via stdlib-only codecs, and MP4 demuxes its full ISO BMFF sample
tables (operators/codecs.py — ``wave``/``struct``/``zlib``/numpy);
``decode_features`` is the rich real-codec stage, ``media_features(
fake=False)`` routes through the same codecs, ``resize_images(fake=False)``
really resizes (bilinear + lossless PNG re-encode), ``frame_plan_mp4``
emits real byte-range frame plans, and ``frame_features_mp4`` decodes
Motion-JPEG frames end-to-end.  ``NotImplementedError`` is a per-FORMAT
seam: it fires only for payloads (H.264/VP9 coded frames, arithmetic-
coded JPEG, ...) that genuinely require external libraries absent from
this container.  ``fake=True`` keeps the deterministic sha256 stub used by the
SQL-oracle plumbing queries.

Scale notes: binary payloads dominate row size, so stages that don't need
bytes must select them away (column pruning) BEFORE any shuffle; the
reference row-group size should cap ``maxRecordsPerBatch`` × avg payload to
executor memory.  ``media_features`` repartitions by a hash of the ref so
giant media files spread evenly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, "
    "content_sha256 string, width int, height int, duration_ms int"
)


def attach_media_metadata(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """Cheap metadata derivable without decoding — pure built-ins."""
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.length(F.col(bytes_col)).alias("n_bytes"),
        F.sha2(F.col(bytes_col), 256).alias("content_sha256"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake decoder: pseudo-dimensions from the content hash —
    stable across runs/partitions so tests can assert exact values."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + h[0] % 240,
        "height": 16 + h[1] % 240,
        "duration_ms": int.from_bytes(h[2:4], "big") if kind in ("audio", "video") else 0,
    }


def media_features(
    df: DataFrame,
    ref_col: str,
    bytes_col: str,
    kind_col: str,
    fake: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    fake=False decodes for REAL via the stdlib codecs (WAV/BMP/PPM/PNG/
    GIF/JPEG + MP4 container — operators/codecs.py), raising
    NotImplementedError per-row only for formats that genuinely need
    external libraries; fake=True runs the deterministic sha256 stub (the
    SQL-oracle plumbing path).
    """
    src = df.select(
        F.col(ref_col).alias("media_ref"),
        F.col(kind_col).alias("media_kind"),
        F.col(bytes_col).alias("_payload"),
    )
    if partitions:
        src = src.repartition(partitions, F.xxhash64("media_ref"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        def real_decode(p, k):
            d = codecs.decode_media(bytes(p or b""))
            return {
                "width": d["width"] or 0,
                "height": d["height"] or 0,
                "duration_ms": d["duration_ms"],
            }

        for pdf in batches:
            feats = [
                (_fake_decode if fake else real_decode)(p, k)
                for p, k in zip(pdf["_payload"], pdf["media_kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "media_kind": pdf["media_kind"].values,
                    "n_bytes": [len(p or b"") for p in pdf["_payload"]],
                    "content_sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["_payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                }
            )
            yield out

    return src.mapInPandas(extract, MEDIA_META_SCHEMA)


REAL_DECODE_SCHEMA = (
    "media_ref string, format string, width int, height int, "
    "duration_ms int, sample_rate int, channels int, mean_value double"
)


def decode_features(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """REAL-codec feature extraction: WAV duration/rate/channels/RMS,
    BMP/PPM/PNG/GIF/JPEG dimensions + mean channel value, MP4 geometry/
    duration/mean-frame-size — stdlib codecs only, one Arrow batch at a
    time.  Raises NotImplementedError for formats that need external
    libraries; callers with mixed corpora should pre-filter on sniffable
    magic bytes."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codecs.decode_media(bytes(p or b"")) for p in pdf["_payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "format": [f["format"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "mean_value": [f["mean_value"] for f in feats],
                }
            )

    return src.mapInPandas(extract, REAL_DECODE_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = (
    "media_ref string, duration_ms int, sample_rate int, channels int, "
    "rms double, zero_crossings int, dominant_freq_hz int"
)


def audio_spectral_features(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """Spectral analysis over PCM WAV payloads: RMS, zero-crossing count
    (sign flips over nonzero samples, first channel) and dominant
    frequency via numpy rFFT — one Arrow batch at a time, no per-row
    Python.  For bin-aligned sines every non-RMS field is an exact
    integer recomputable from the synthesis parameters, which is what the
    driver oracle checks (codecs.encode_wav_sine is the generator)."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codecs.audio_features(bytes(p or b"")) for p in pdf["_payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                    "zero_crossings": [f["zero_crossings"] for f in feats],
                    "dominant_freq_hz": [f["dominant_freq_hz"] for f in feats],
                }
            )

    return src.mapInPandas(extract, AUDIO_SPECTRAL_SCHEMA)


RESIZED_SCHEMA = "media_ref string, width int, height int, payload binary"


def resize_images(
    df: DataFrame,
    ref_col: str,
    bytes_col: str,
    max_side: int = 256,
    fake: bool = False,
) -> DataFrame:
    """Resize stage: binary in → binary out, Arrow-batched.  Output payload
    stays opaque binary (the downstream contract).  REAL path (r4): decode
    pixels with the stdlib codecs (BMP/PPM/PNG/JPEG), bilinear-resample to
    fit ``max_side`` (aspect preserved, never upscaled), re-encode as PNG
    (deterministic + lossless, so the output is value-reproducible);
    formats without a stdlib pixel decode raise per-row.  fake=True keeps
    the legacy stub (proportional truncation) for opaque payloads."""
    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            rows = {"media_ref": [], "width": [], "height": [], "payload": []}
            for ref, p in zip(pdf["media_ref"], pdf["_payload"]):
                if fake:
                    d = _fake_decode(p, "image")
                    scale = min(1.0, max_side / max(d["width"], d["height"]))
                    w, h = int(d["width"] * scale), int(d["height"] * scale)
                    out = bytes(p or b"")[: max(1, int(len(p or b"x") * scale))]
                else:
                    px = codecs.decode_pixels(bytes(p or b""))
                    ih, iw = px.shape[:2]
                    scale = min(1.0, max_side / max(iw, ih))
                    # half-UP (not banker's) so dimensions match SQL ROUND
                    w = max(1, int(iw * scale + 0.5))
                    h = max(1, int(ih * scale + 0.5))
                    if (w, h) != (iw, ih):
                        px = codecs.resize_bilinear(px, w, h)
                    out = codecs.encode_png(w, h, pixels=px)
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(out)
            yield pd.DataFrame(rows)

    return src.mapInPandas(do_resize, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, ref_col: str, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling work items for video refs (timestamps to decode)
    without touching payloads — pure built-ins; the decode itself is the
    stubbed stage above."""
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.explode(
            F.sequence(F.lit(0), F.lit(10_000), F.lit(every_ms))
        ).alias("sample_at_ms"),
    )


def frame_plan_from_durations(
    features: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling work items from REAL decoded durations (r3): one
    (media_ref, timestamp) row per ``every_ms`` across each media item's
    actual duration_ms — the planner the real-codec decode stage feeds,
    replacing frame_sample_plan's fixed horizon.  Pure built-ins (sequence
    + explode, JVM-side); the fan-out is row-local, so repartition the PLAN
    downstream, never the payloads."""
    return features.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("sample_at_ms"),
    )


FRAME_SCHEMA = "media_ref string, sample_at_ms int, frame_sha256 string, mean_luma int"


def frame_features(
    df: DataFrame,
    ref_col: str,
    bytes_col: str,
    ts_col: str,
    fake: bool = False,
) -> DataFrame:
    """Per-sampled-frame feature extraction: consumes frame_sample_plan's
    (ref, timestamp) work items joined with payloads, emits one feature row
    per frame via Arrow-batched mapInPandas.  The decode is the stubbed
    codec seam (NotImplementedError unless fake=True); the fake kernel is a
    pure sha256 of (payload ‖ ':' ‖ timestamp) so the whole stage is
    value-reproducible in SQL.  Frame rows amplify the input (one per
    sampled timestamp) — at scale repartition the PLAN, not the payloads:
    the payload joins in once per ref and fans out row-locally."""
    src = df.select(
        F.col(ref_col).alias("media_ref"),
        F.col(ts_col).alias("sample_at_ms"),
        F.col(bytes_col).alias("_payload"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame decode requires a video codec library (not in "
                    "this container); pass fake=True for the deterministic stub"
                )
            shas, lumas = [], []
            for p, ts in zip(pdf["_payload"], pdf["sample_at_ms"]):
                h = hashlib.sha256(bytes(p or b"") + b":" + str(int(ts)).encode())
                d = h.digest()
                shas.append(h.hexdigest())
                lumas.append(d[0])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "sample_at_ms": pdf["sample_at_ms"].values,
                    "frame_sha256": shas,
                    "mean_luma": lumas,
                }
            )

    return src.mapInPandas(extract, FRAME_SCHEMA)


MP4_PLAN_SCHEMA = (
    "media_ref string, sample_at_ms int, frame_idx int, pts_ms int, "
    "byte_offset long, n_bytes int, keyframe boolean, seek_from_idx int"
)


def frame_plan_mp4(
    df: DataFrame, ref_col: str, bytes_col: str, every_ms: int = 1000
) -> DataFrame:
    """REAL video frame-sampling plan from MP4 container structure (r4):
    codecs.parse_mp4 walks the ISO BMFF sample tables inside an Arrow-
    batched mapInPandas stage, and each target timestamp (0..duration step
    ``every_ms``) resolves to the last frame whose pts <= target, with its
    absolute byte range and the nearest preceding keyframe (stss sync
    sample) a decoder would seek from.  This is the plan a 100-TB video
    pipeline hands its frame-decode stage: byte ranges mean executors can
    range-read frames from object storage without shipping whole files,
    and the fan-out is row-local (no shuffle) — repartition the emitted
    PLAN downstream, never the payloads.  Pixel decode of the located
    frames stays the per-format codec seam."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_ref sample_at_ms frame_idx pts_ms byte_offset n_bytes "
            "keyframe seek_from_idx"
        ).split()
        for pdf in batches:
            rows: dict = {c: [] for c in cols}
            for ref, p in zip(pdf["media_ref"], pdf["_payload"]):
                t = codecs.mp4_frame_index(bytes(p or b""))
                pts, sync = t["pts_ms"], t["sync"]
                targets = np.arange(0, t["duration_ms"] + 1, every_ms)
                idx = np.searchsorted(pts, targets, side="right") - 1
                seek = sync[np.searchsorted(sync, idx, side="right") - 1]
                n = len(targets)
                rows["media_ref"].extend([ref] * n)
                rows["sample_at_ms"].extend(targets.tolist())
                rows["frame_idx"].extend(idx.tolist())
                rows["pts_ms"].extend(pts[idx].tolist())
                rows["byte_offset"].extend(t["offsets"][idx].tolist())
                rows["n_bytes"].extend(t["sizes"][idx].tolist())
                rows["keyframe"].extend(t["keyframe"][idx].tolist())
                rows["seek_from_idx"].extend(seek.tolist())
            yield pd.DataFrame(rows)

    return src.mapInPandas(plan, MP4_PLAN_SCHEMA)


MP4_FRAME_FEATURES_SCHEMA = (
    "media_ref string, sample_at_ms int, frame_idx int, keyframe boolean, "
    "frame_w int, frame_h int, mean_r double, mean_g double, mean_b double"
)


def frame_features_mp4(
    df: DataFrame, ref_col: str, bytes_col: str, every_ms: int = 1000
) -> DataFrame:
    """FULLY REAL video-frame feature extraction for Motion-JPEG-in-MP4
    (r4): demux the ISO BMFF sample tables, resolve each ``every_ms``
    target to its frame's byte range, slice those bytes out of the payload,
    and run the baseline JPEG decoder on each sampled frame — per-frame
    dimensions + per-channel means, end-to-end in one Arrow-batched
    mapInPandas stage with zero external libraries.  MJPEG is the one
    video flavor whose frames are stdlib-decodable; H.264/VP9 frames stay
    the per-format seam (the byte-range PLAN for them comes from
    frame_plan_mp4).  Only SAMPLED frames decode — cost scales with the
    plan, not the video length."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_ref sample_at_ms frame_idx keyframe frame_w frame_h "
            "mean_r mean_g mean_b"
        ).split()
        for pdf in batches:
            rows: dict = {c: [] for c in cols}
            for ref, p in zip(pdf["media_ref"], pdf["_payload"]):
                raw = bytes(p or b"")
                t = codecs.mp4_frame_index(raw)
                pts = t["pts_ms"]
                targets = np.arange(0, t["duration_ms"] + 1, every_ms)
                idx = np.searchsorted(pts, targets, side="right") - 1
                for ts, i in zip(targets.tolist(), idx.tolist()):
                    o, s = int(t["offsets"][i]), int(t["sizes"][i])
                    px = codecs.decode_pixels(raw[o : o + s])
                    rows["media_ref"].append(ref)
                    rows["sample_at_ms"].append(ts)
                    rows["frame_idx"].append(i)
                    rows["keyframe"].append(bool(t["keyframe"][i]))
                    rows["frame_h"].append(px.shape[0])
                    rows["frame_w"].append(px.shape[1])
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows["mean_r"].append(float(m[0]))
                    rows["mean_g"].append(float(m[1]))
                    rows["mean_b"].append(float(m[2]))
            yield pd.DataFrame(rows)

    return src.mapInPandas(extract, MP4_FRAME_FEATURES_SCHEMA)


IMAGE_DHASH_SCHEMA = "media_ref string, width int, height int, dhash long"


def image_dhash(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """Perceptual 64-bit dHash per image payload (codecs.dhash64 over the
    stdlib pixel decode — PNG/BMP/PPM/GIF/baseline-JPEG), one Arrow batch
    at a time: the image-dedup signature stage.  Raises
    NotImplementedError for non-image payloads (decode_features
    convention: pre-filter mixed corpora on magic bytes)."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, hashes = [], [], []
            for p in pdf["_payload"]:
                px = codecs.decode_pixels(bytes(p or b""))
                heights.append(int(px.shape[0]))
                widths.append(int(px.shape[1]))
                hashes.append(codecs.dhash64(px))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "dhash": pd.array(hashes, dtype="int64"),
                }
            )

    return src.mapInPandas(extract, IMAGE_DHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame, ref_col: str, bytes_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate IMAGE pairs: dHash signatures (one mapInPandas
    decode pass) → the shared 4×16-bit Hamming band join
    (dedup.hamming_near_dup_pairs, which pins the signature frame so the
    decode never runs twice).  The image twin of the text corpus's
    simhash near-dup stage — resized/re-encoded/brightness-shifted
    copies keep their block-gradient structure and land within a few
    bits, while distinct images scatter.  Output: (id_a < id_b,
    hamming), exact over the candidate set."""
    from . import dedup

    return dedup.hamming_near_dup_pairs(
        image_dhash(df, ref_col, bytes_col), "dhash", "media_ref", max_hamming
    )


AUDIO_FP_SCHEMA = "media_ref string, sample_rate int, n_samples int, fingerprint long"


def audio_fingerprint(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """Perceptual 64-bit audio fingerprint per WAV payload
    (codecs.audio_fingerprint64: 8 time segments × 9 band energies,
    Haitsma-Kalker-style difference bits), one Arrow batch at a time —
    the audio twin of image_dhash.  The bits encode band-profile SHAPE:
    gain changes never flip them, while content whose energy ordering
    differs in any adjacent band pair lands ≥ 8 bits away (one flip per
    segment).  Raises for non-WAV payloads and clips under 288 samples
    (decode_features convention: pre-filter on magic bytes)."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, fps = [], [], []
            for p in pdf["_payload"]:
                arr, rate = codecs.wav_samples(bytes(p or b""))
                rates.append(int(rate))
                counts.append(int(arr.shape[0]))
                fps.append(codecs.audio_fingerprint64_from_samples(arr))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": pd.array(counts, dtype="int32"),
                    "fingerprint": pd.array(fps, dtype="int64"),
                }
            )

    return src.mapInPandas(extract, AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(
    df: DataFrame, ref_col: str, bytes_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate AUDIO pairs: fingerprints (one mapInPandas decode
    pass) → the shared 4×16-bit Hamming band join (dedup.hamming_near_
    dup_pairs pins the signature frame, so the decode never runs twice).
    Catches re-gained / re-encoded-to-PCM copies; distinct band profiles
    scatter.  Output: (id_a < id_b, hamming), exact over the candidate
    set."""
    from . import dedup

    return dedup.hamming_near_dup_pairs(
        audio_fingerprint(df, ref_col, bytes_col),
        "fingerprint",
        "media_ref",
        max_hamming,
    )


VIDEO_FP_SCHEMA = "media_ref string, width int, height int, n_frames int, fingerprint long"


def video_fingerprint(df: DataFrame, ref_col: str, bytes_col: str) -> DataFrame:
    """Perceptual 64-bit video fingerprint per MP4 payload
    (codecs.video_fingerprint64: dhash over the coded-frame byte-size
    sequence from the container sample table — no pixel decode, so it
    works exactly where the coded-frame seam begins), one Arrow batch at
    a time.  Re-muxed / re-timestamped / geometry-relabelled copies keep
    their size sequence and land at Hamming 0."""
    from . import codecs

    src = df.select(
        F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, nf, fps = [], [], [], []
            for p in pdf["_payload"]:
                info = codecs.parse_mp4(bytes(p or b""))
                ws.append(int(info["width"]))
                hs.append(int(info["height"]))
                nf.append(int(info["n_frames"]))
                fps.append(codecs.video_fingerprint64_from_sizes(info["sizes"]))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_frames": pd.array(nf, dtype="int32"),
                    "fingerprint": pd.array(fps, dtype="int64"),
                }
            )

    return src.mapInPandas(extract, VIDEO_FP_SCHEMA)


def video_near_dup_pairs(
    df: DataFrame, ref_col: str, bytes_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate VIDEO pairs: container fingerprints (one
    mapInPandas parse pass) → the shared 4×16-bit Hamming band join
    (dedup.hamming_near_dup_pairs pins the signature frame).  Output:
    (id_a < id_b, hamming), exact over the candidate set."""
    from . import dedup

    return dedup.hamming_near_dup_pairs(
        video_fingerprint(df, ref_col, bytes_col),
        "fingerprint",
        "media_ref",
        max_hamming,
    )


MEDIA_VALIDATION_SCHEMA = (
    "media_ref string, claimed string, sniffed string, status string, "
    "ok boolean"
)


def validate_media_payloads(
    df: DataFrame, ref_col: str, bytes_col: str, claimed_col: str | None = None
) -> DataFrame:
    """Payload-parses-as-claimed validation — the binary-column arm of the
    constraint-validation engine: referential checks prove a media_ref
    RESOLVES; this proves the bytes behind it actually ARE what the row
    claims.  One Arrow-batched pass grades each payload:

    * ``empty``         — NULL or zero-length payload
    * ``unknown_magic`` — no known format signature in the header
    * ``kind_mismatch`` — sniffed format ≠ the row's claimed kind (graded
      BEFORE decoding: a valid JPEG in a column declared 'png' is a
      violation, and skipping the decode keeps the rejection cheap)
    * ``corrupt``       — magic bytes fine, full stdlib decode raised
      (truncated/damaged payloads)
    * ``unsupported``   — the decode hit the documented per-format seam
      (NotImplementedError: coded video frames etc.)
    * ``ok``            — full decode succeeded

    ok = (status == 'ok').  The full decode (not just a header parse) is
    deliberate: a PNG whose IDAT stream is truncated has a perfect header
    and is still useless to a training pipeline.

    Scale: mapInPandas over the payload column — decode cost is the
    irreducible term; rows carry only (ref, claimed) beside the bytes and
    the output is five narrow columns, so nothing payload-sized survives
    the stage.  Same per-batch decode budget as ``decode_features``.
    """
    from . import codecs

    cols = [F.col(ref_col).alias("media_ref"), F.col(bytes_col).alias("_payload")]
    cols.append(
        (F.col(claimed_col) if claimed_col else F.lit(None)).cast("string").alias(
            "claimed"
        )
    )
    src = df.select(*cols)

    def grade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sniffed, status = [], []
            for p, claimed in zip(pdf["_payload"], pdf["claimed"]):
                raw = bytes(p) if p is not None else b""
                if not raw:
                    sniffed.append(None)
                    status.append("empty")
                    continue
                fmt = codecs.sniff_format(raw)
                sniffed.append(fmt)
                if fmt is None:
                    status.append("unknown_magic")
                elif claimed is not None and claimed != fmt:
                    status.append("kind_mismatch")
                else:
                    try:
                        codecs.decode_media(raw)
                        status.append("ok")
                    except NotImplementedError:
                        status.append("unsupported")
                    except Exception:
                        status.append("corrupt")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "claimed": pdf["claimed"].values,
                    "sniffed": sniffed,
                    "status": status,
                    "ok": [s == "ok" for s in status],
                }
            )

    return src.mapInPandas(grade, MEDIA_VALIDATION_SCHEMA)
