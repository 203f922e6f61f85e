"""Unit tests for the training-data operators: dedup (planted duplicates),
similarity (numpy ground truth), HLL error bound, drift direction, multimodal
plumbing, text features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import dedup, drift, multimodal, similarity, stats
from jsons_to_schema_spark.sources.tables import load_table

from .conftest import SF_ORACLE

BASE = (
    "the quick brown fox jumps over the lazy dog while spark shuffles "
    "arrow batches across executor boundaries at web scale"
)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted exact + near duplicates."""
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE + " tail"),  # near dup of 1 (high shingle overlap)
        (4, "completely different text about quantile sketches and hyperloglog counters in distributed systems"),
        (5, "  the quick  brown fox jumps over the lazy dog while spark shuffles arrow batches across executor boundaries at web scale "),  # whitespace-normalized dup of 1
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_planted(spark, planted):
    clusters = dedup.exact_duplicate_clusters(planted, "text", "doc_id").collect()
    assert len(clusters) == 1
    assert clusters[0].cnt == 3 and clusters[0].keep_id == 1  # 1, 2, 5
    kept = dedup.dedup_exact(planted, "text", "doc_id")
    assert kept.count() == 4
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1, 3, 4, 6}


def test_minhash_finds_near_dup(spark, planted):
    pairs = dedup.minhash_lsh_pairs(
        planted, "text", "doc_id", min_jaccard=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # exact dups always collide; the near-dup (1,3) has jaccard ~0.85
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert all(a < b for a, b in got)
    assert not any(4 in p or 6 in p for p in got)


def test_simhash_near_dup(spark, planted):
    pairs = dedup.simhash_near_dup_pairs(
        planted, "text", "doc_id", max_hamming=3
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got  # identical text → hamming 0
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert ham[(1, 2)] == 0
    assert not any((4 in p) for p in got)


def test_ngram_jaccard_values(spark, planted):
    pairs = dedup.ngram_jaccard_pairs(planted, "text", "doc_id", min_jaccard=0.5)
    vals = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert vals[(1, 2)] == 1.0
    assert 0.7 < vals[(1, 3)] < 1.0


def test_ngram_stop_shingle_cap_bounds_candidates(spark):
    """A hot shingle shared by every doc must NOT create the quadratic
    candidate bucket: with max_shingle_df the stop shingle is dropped from
    the inverted index, so docs sharing ONLY it produce zero candidates,
    while true near-dups (sharing rare shingles too) are still paired."""
    hot = "alpha beta gamma"  # one shared 3-gram across ALL docs
    rows = [(i, f"{hot} filler{i}a filler{i}b filler{i}c") for i in range(50)]
    rows += [(100, f"{hot} rare shared tail one"), (101, f"{hot} rare shared tail two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", min_jaccard=0.1, max_shingle_df=10
    ).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    # the only pair sharing a NON-stop shingle ("rare shared tail" grams)
    assert got == {(100, 101)}

    uncapped = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", min_jaccard=0.1, max_shingle_df=None
    )
    # without the cap the hot shingle would make every doc a candidate of
    # every other (52·51/2 pairs pre-verification) — the planted pair is
    # still found either way, the cap only prunes the blowup
    assert {(r.id_a, r.id_b) for r in uncapped.collect()} >= {(100, 101)}


def test_brute_force_topk_matches_numpy(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 3)
    got = similarity.brute_force_topk(emb, queries, k=5).collect()
    rows = emb.orderBy("vec_id").collect()
    M = np.array([r.embedding for r in rows])
    ids = np.array([r.vec_id for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(3):
        sims = Mn @ Mn[q]
        sims[q] = -2
        top = ids[np.argsort(-sims)[:5]]
        got_q = sorted(
            [r for r in got if r.query_id == q], key=lambda r: r.rank
        )
        assert [r.neighbor_id for r in got_q] == top.tolist()


def test_lsh_topk_recall(spark):
    """Single-probe LSH top-k should recover a decent fraction of the exact
    top-10 at 4 bits (bucket ≈ 1/16 of corpus, random vectors → recall is
    modest by design; assert sane bounds + exact cosine values)."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.lsh_topk(emb, queries, k=10, bits=4, bands=1, dim=64).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(approx_set) > 0
    # approx results carry correct cosine values (verified against exact map)
    exact_cos = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(exact_cos[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    # multi-probe banding must beat (or match) single-probe recall
    banded = similarity.lsh_topk(
        emb, queries, k=10, bits=32, bands=8, dim=64
    ).collect()
    banded_set = {(r.query_id, r.neighbor_id) for r in banded}
    recall_single = len(exact_set & approx_set) / len(exact_set)
    recall_banded = len(exact_set & banded_set) / len(exact_set)
    assert recall_banded >= recall_single
    assert recall_banded >= 0.4, recall_banded


def test_ivf_topk_recall(spark):
    """IVF probe of 8/16 cells should recover most of the exact top-10 and
    report exact cosine values for everything it returns; results must be
    deterministic across invocations (fixed seed + deterministic init)."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.ivf_topk(
        emb, queries, k=10, n_cells=16, n_probe=8, iters=2
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    exact_cos = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(exact_cos[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
    again = similarity.ivf_topk(
        emb, queries, k=10, n_cells=16, n_probe=8, iters=2
    ).collect()
    assert {(r.query_id, r.neighbor_id) for r in again} == approx_set


def test_embedding_near_dup_planted(spark):
    rng = np.random.default_rng(7)
    v = rng.standard_normal(16)
    rows = [
        (1, (v / np.linalg.norm(v)).tolist()),
        (2, (v / np.linalg.norm(v) + 1e-4).tolist()),  # near-identical
        (3, rng.standard_normal(16).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = similarity.embedding_near_dup_pairs(
        df, min_cosine=0.99, bits=48, bands=8, dim=16
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_embedding_near_dup_banding_bounds_candidates(spark):
    """The banded self-join must stay candidate-bounded: with 8 bands of 6
    bits over N random vectors, candidates ≈ bands·N²/(2·64) — far below the
    all-pairs N²/2 — while planted near-identical pairs are still found."""
    rng = np.random.default_rng(11)
    n = 400
    base = rng.standard_normal((n, 16))
    rows = [(i, (v / np.linalg.norm(v)).tolist()) for i, v in enumerate(base)]
    # plant 5 near-dups of the first 5 vectors
    for j in range(5):
        v = base[j] / np.linalg.norm(base[j]) + 1e-4
        rows.append((1000 + j, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    planes = similarity._hyperplanes(16, 48, 42)
    keys_udf = similarity.band_keys_kernel(planes, 8)
    buckets = df.select(
        F.col("vec_id").alias("_id"), keys_udf("embedding").alias("_keys")
    ).select("_id", F.posexplode("_keys").alias("_band", "_key"))
    n_cand = (
        buckets.alias("l")
        .join(
            buckets.alias("r"),
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._key") == F.col("r._key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .count()
    )
    n_rows = len(rows)
    assert n_cand < 0.25 * n_rows * (n_rows - 1) / 2, n_cand

    pairs = similarity.embedding_near_dup_pairs(
        df, min_cosine=0.99, bits=48, bands=8, dim=16
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert {(j, 1000 + j) for j in range(5)} <= found


def test_ivf_index_persisted_probe(spark, tmp_path):
    """build_ivf_index writes the cell-partitioned table + centroid sidecar
    once; ivf_topk_indexed must then (a) never retrain, (b) reproduce the
    non-indexed ivf_topk results with the same parameters."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5)
    idx = tmp_path / "ivf_index"
    similarity.build_ivf_index(emb, idx, n_cells=16, iters=2, seed=42)
    assert (idx / "centroids.json").exists()
    assert any(p.name.startswith("cell=") for p in (idx / "cells").iterdir())

    direct = similarity.ivf_topk(
        emb, queries, k=10, n_cells=16, n_probe=8, iters=2, seed=42
    ).collect()
    # zero training jobs: corrupt the train path to prove it is not hit
    import unittest.mock as mock

    with mock.patch.object(
        similarity, "ivf_train_centroids", side_effect=AssertionError("retrained")
    ):
        indexed = similarity.ivf_topk_indexed(
            spark, idx, queries, k=10, n_probe=8
        ).collect()
    key = lambda rows: {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in rows}
    assert key(indexed) == key(direct)


def test_hll_error_bounded(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("hll"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).first()
    assert abs(row.hll - row.exact) / row.exact < 0.05
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_tdigest_quantiles_accurate_and_partition_invariant(spark):
    """Digest quantiles within tolerance of exact, and invariant to how the
    data is partitioned (mergeability — the property that licenses the
    per-partition build + driver merge)."""
    from jsons_to_schema_spark.operators import tdigest

    rng = np.random.default_rng(1)
    vals = rng.normal(100.0, 15.0, 100_000)
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    exact = np.quantile(vals, probs)
    rows = [(float(v),) for v in vals]
    ests = []
    for parts in (2, 16):
        df = spark.createDataFrame(rows, "x double").repartition(parts)
        est = tdigest.digest_quantiles(df, "x", probs)
        ests.append(est)
        for e, x in zip(est, exact):
            assert abs(e - x) < 1.0, (e, x)  # < 7% of sigma at the tails
    # partition invariance is approximate (different merge order) but tight
    for a, b in zip(*ests):
        assert abs(a - b) < 1.0


def test_tdigest_tree_merge_path(spark):
    """Executor-side tree level (driver_merge_max exceeded): accurate,
    deterministic across runs, and close to the driver-only merge — the
    path that keeps driver traffic bounded at 10^5+ partitions."""
    from jsons_to_schema_spark.operators import tdigest

    rng = np.random.default_rng(7)
    vals = rng.normal(50.0, 10.0, 60_000)
    probs = [0.05, 0.5, 0.95]
    exact = np.quantile(vals, probs)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    driver_only = tdigest.digest_quantiles(df, "x", probs, partitions=24, key="x")
    tree_a = tdigest.digest_quantiles(
        df, "x", probs, partitions=24, key="x", driver_merge_max=4
    )
    tree_b = tdigest.digest_quantiles(
        df, "x", probs, partitions=24, key="x", driver_merge_max=4
    )
    assert tree_a == tree_b  # deterministic: pid-ordered segmented fold
    for t, d, x in zip(tree_a, driver_only, exact):
        assert abs(t - x) < 0.7, (t, x)
        assert abs(t - d) < 0.7, (t, d)


def test_tdigest_drift_shift(spark):
    from jsons_to_schema_spark.operators import tdigest

    rng = np.random.default_rng(2)
    base = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 20_000)], "x double"
    )
    cur = spark.createDataFrame(
        [(float(v),) for v in rng.normal(5, 1, 20_000)], "x double"
    )
    rows = tdigest.tdigest_drift(base, cur, "x", [0.5])
    assert len(rows) == 1
    p, b, c, delta = rows[0]
    assert 4.5 < delta < 5.5


def test_drift_detects_shift(spark):
    base = spark.range(0, 10000).select((F.col("id") % 100).alias("v").cast("double"))
    cur = spark.range(0, 10000).select(((F.col("id") % 100) + 50).alias("v").cast("double"))
    d = drift.quantile_drift(base, cur, "v", [0.5], engine="approx")
    row = d.first()
    assert abs(row.delta - 50.0) < 2.0
    score = drift.drift_score(d).first()
    assert score.max_abs_delta > 45


def test_multimodal_fake_decode_deterministic(spark):
    rows = [("m-1", "image", b"payload-a"), ("m-2", "audio", b"payload-b")]
    df = spark.createDataFrame(rows, "ref string, kind string, payload binary")
    out1 = multimodal.media_features(df, "ref", "payload", "kind", fake=True).collect()
    out2 = multimodal.media_features(df, "ref", "payload", "kind", fake=True).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_ref = {r.media_ref: r for r in out1}
    assert by_ref["m-1"].n_bytes == 9
    assert by_ref["m-1"].duration_ms == 0  # images have no duration
    assert by_ref["m-2"].duration_ms > 0
    assert len(by_ref["m-1"].content_sha256) == 64


def test_multimodal_resize_stub(spark):
    rows = [("m-1", b"x" * 1000), ("m-2", b"y" * 10)]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = multimodal.resize_images(df, "media_ref", "payload", max_side=64, fake=True)
    got = {r.media_ref: r for r in out.collect()}
    assert set(got) == {"m-1", "m-2"}
    for r in got.values():
        assert 0 < r.width <= 64 and 0 < r.height <= 64
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) >= 1
    again = {
        r.media_ref: (r.width, r.height, bytes(r.payload))
        for r in multimodal.resize_images(
            df, "media_ref", "payload", max_side=64, fake=True
        ).collect()
    }
    assert again == {k: (v.width, v.height, bytes(v.payload)) for k, v in got.items()}


def test_multimodal_real_codecs_and_per_format_seam(spark):
    """r3: fake=False now REALLY decodes stdlib formats (WAV/BMP/PPM); the
    NotImplementedError seam fires only for formats needing external libs."""
    from jsons_to_schema_spark.operators import codecs

    rows = [
        ("m-wav", "audio", bytearray(codecs.encode_wav(1600, 500, rate=8000))),
        ("m-bmp", "image", bytearray(codecs.encode_bmp(7, 5, (10, 20, 30)))),
    ]
    df = spark.createDataFrame(rows, "ref string, kind string, payload binary")
    got = {
        r.media_ref: r
        for r in multimodal.media_features(
            df, "ref", "payload", "kind", fake=False
        ).collect()
    }
    assert got["m-wav"].duration_ms == 200
    assert (got["m-bmp"].width, got["m-bmp"].height) == (7, 5)

    bad = spark.createDataFrame(
        [("m-tif", "image", b"II*\x00 junk")],
        "ref string, kind string, payload binary",
    )
    with pytest.raises(Exception) as ei:
        multimodal.media_features(bad, "ref", "payload", "kind", fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "external libraries" in str(ei.value)


def test_multimodal_resize_real_roundtrip(spark):
    """r4: fake=False REALLY resizes — decode (any stdlib image format),
    bilinear downscale, lossless PNG re-encode; output payloads re-decode
    to the expected dimensions and (for solid fills) exact means."""
    from jsons_to_schema_spark.operators import codecs

    rows = [
        ("png-0", bytearray(codecs.encode_png(60, 40, (10, 20, 30)))),
        ("bmp-0", bytearray(codecs.encode_bmp(33, 50, (200, 100, 0)))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {
        r.media_ref: r
        for r in multimodal.resize_images(
            df, "media_ref", "payload", max_side=20, fake=False
        ).collect()
    }
    assert (out["png-0"].width, out["png-0"].height) == (20, 13)
    assert (out["bmp-0"].width, out["bmp-0"].height) == (13, 20)
    d = codecs.decode_media(bytes(out["png-0"].payload))
    assert (d["format"], d["width"], d["height"]) == ("png", 20, 13)
    assert d["mean_value"] == 20.0  # bilinear of a constant fill
    d2 = codecs.decode_media(bytes(out["bmp-0"].payload))
    assert d2["mean_value"] == 100.0


def test_multimodal_mjpeg_frame_features_real_decode(spark):
    """r4: MJPEG-in-MP4 end-to-end — demux, range-slice the sampled frame's
    bytes, baseline-JPEG-decode them; solid frames reconstruct exactly."""
    import numpy as np

    from jsons_to_schema_spark.operators import codecs

    frames = [
        codecs.encode_jpeg(np.full((16, 24, 3), (10 * j, 5 * j, j), np.uint8), quality=95)
        for j in range(8)
    ]
    df = spark.createDataFrame(
        [("v", bytearray(codecs.encode_mp4(24, 16, frame_payloads=frames)))],
        "media_ref string, payload binary",
    )
    out = {
        r.sample_at_ms: r
        for r in multimodal.frame_features_mp4(
            df, "media_ref", "payload", every_ms=120
        ).collect()
    }
    assert sorted(out) == [0, 120, 240]  # dur=320: targets 0,120,240
    r = out[240]
    assert (r.frame_idx, r.frame_w, r.frame_h) == (6, 24, 16)
    assert (r.mean_r, r.mean_g, r.mean_b) == (60.0, 30.0, 6.0)
    assert out[0].keyframe and not out[240].keyframe


def test_multimodal_mp4_frame_plan_seek_semantics(spark):
    """r4: the MP4 planner resolves each target to the last frame whose
    pts <= target, carries its REAL byte range, and points the decoder at
    the nearest PRECEDING stss keyframe — the seek a real demuxer does."""
    from jsons_to_schema_spark.operators import codecs

    sizes = [100 + i for i in range(12)]  # 12 frames @40ms, keyframes 0/5/10
    df = spark.createDataFrame(
        [("v-0", bytearray(codecs.encode_mp4(64, 48, sizes)))],
        "media_ref string, payload binary",
    )
    plan = {
        r.sample_at_ms: r
        for r in multimodal.frame_plan_mp4(
            df, "media_ref", "payload", every_ms=170
        ).collect()
    }
    # targets 0,170,340,480(dur=480): frame = floor(t/40) capped at 11
    assert sorted(plan) == [0, 170, 340]
    assert (plan[170].frame_idx, plan[170].pts_ms) == (4, 160)
    assert plan[170].seek_from_idx == 0 and not plan[170].keyframe
    assert (plan[340].frame_idx, plan[340].seek_from_idx) == (8, 5)
    assert plan[0].keyframe and plan[0].seek_from_idx == 0
    exp_off = 32 + sum(sizes[:8])
    assert (plan[340].byte_offset, plan[340].n_bytes) == (exp_off, 108)


def test_column_stats_single_pass_plan(spark):
    """The stats pass must be ONE aggregate over ONE scan — assert the plan
    contains a single scan node (no self-join/multiple passes)."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    plan = stats.column_stats(li, ["l_quantity", "l_discount"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_duplicate_clusters_min_label(spark):
    """Connected components over planted pair graphs: a chain, a star, a
    singleton pair — each component labeled by its min id, keep-one policy
    marks exactly the representative."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (10, 12), (10, 13),    # star around 10
         (20, 21)],                        # pair
        "id_a long, id_b long",
    )
    labels = {r.id: r.cluster for r in dedup.duplicate_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1,
                      10: 10, 11: 10, 12: 10, 13: 10,
                      20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 13, 20, 21, 99]], "doc_id long"
    )
    assigned = dedup.assign_duplicate_clusters(docs, pairs, "doc_id").collect()
    got = {r.doc_id: (r.cluster_id, r.keep) for r in assigned}
    assert got[99] == (99, True)      # isolated doc is its own cluster
    assert got[4] == (1, False)
    assert got[1] == (1, True)
    assert sum(1 for c, k in got.values() if k) == 4  # 3 components + singleton


def test_simhash_engines_identical(spark, planted):
    """The vectorized Arrow simhash kernel must produce bit-identical hashes
    to the pure-Catalyst expression on real text (including empty/weird)."""
    docs = load_table(spark, SF_ORACLE, "documents").limit(200)
    for frame in (planted, docs):
        expr = {
            r._id: r._h
            for r in frame.select(
                F.col("doc_id").alias("_id"), dedup.simhash64("text").alias("_h")
            ).collect()
        }
        from jsons_to_schema_spark.operators.text import tokens as _tokens

        kern = {
            r._id: r._h
            for r in frame.select(
                F.col("doc_id").alias("_id"),
                F.transform(_tokens("text"), lambda t: F.xxhash64(t)).alias("_hh"),
            )
            .select("_id", dedup.simhash64_kernel()(F.col("_hh")).alias("_h"))
            .collect()
        }
        assert kern == expr


def test_duplicate_clusters_random_graph_matches_union_find(spark):
    """1000-vertex random pair graph: distributed min-label propagation must
    produce exactly the components a driver-side union-find computes."""
    rng = np.random.default_rng(17)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 1000, size=(1500, 2))
        if a != b
    ]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )

    parent = list(range(1000))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for e in edges for v in e}
    expected = {v: find(v) for v in verts}

    got = {r.id: r.cluster for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == expected


def test_curate_documents_pipeline(spark):
    """Full curation funnel on a planted corpus: quality gate drops the
    short doc, language gate drops the non-matching doc, exact dedup keeps
    one of the identical pair, near-dup clustering keeps one per cluster."""
    from jsons_to_schema_spark.operators.curate import (
        curate_documents,
        curation_report,
    )

    en = "the cat and the dog ran to the house of the king for the gold"
    rows = [
        (1, en),
        (2, en),                                   # exact dup of 1
        (3, en + " extra tail words here today"),  # near dup (cluster w/ 1)
        (4, "short text"),                         # fails quality (< 5? use 10)
        (5, "uno dos tres " * 10),                 # 30 tokens, lang != en
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")

    kept = curate_documents(
        df, "text", "doc_id", min_tokens=10, allowed_langs=["en"],
        near_dup_pairs=pairs,
    )
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1}

    # without near-dup pairs, 1 and 3 both survive (not exact dups)
    kept2 = curate_documents(df, "text", "doc_id", min_tokens=10, allowed_langs=["en"])
    assert {r.doc_id for r in kept2.select("doc_id").collect()} == {1, 3}

    rep = curation_report(df, "text", "doc_id", min_tokens=10, allowed_langs=["en"]).first()
    assert rep.n_input == 5
    assert rep.dropped_quality == 1          # doc 4
    assert rep.dropped_lang == 1             # doc 5
    assert rep.survivors_pre_dedup == 3      # docs 1, 2, 3


def test_duplicate_clusters_long_chain_logarithmic(spark):
    """r3: star-contraction must converge on a 1000-long chain well inside
    the round budget (min-label propagation would need 1000 rounds)."""
    from jsons_to_schema_spark.operators import dedup

    n = 1000
    pairs = spark.createDataFrame(
        [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    labels = {r.id: r.cluster
              for r in dedup.duplicate_clusters(pairs, max_iters=12).collect()}
    assert len(labels) == n
    assert set(labels.values()) == {"d0000"}


def test_duplicate_clusters_nonconvergence_raises(spark):
    from jsons_to_schema_spark.operators import dedup
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(f"x{i:03d}", f"x{i + 1:03d}") for i in range(200)],
        "id_a string, id_b string",
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iters=1)


def test_lsh_band_autoscale_bounds_candidates(spark):
    """r3 (VERDICT item 4): with bits auto-scaled via required_band_bits the
    candidate count on RANDOM (non-duplicate) data stays ~linear in N, at
    two corpus sizes."""
    from jsons_to_schema_spark.operators import similarity

    # dim=64 matches the testdata embeddings table; at toy dims (≤16) the
    # documented Jensen inflation exceeds the 2x slack asserted below.
    dim, bands, cpr = 64, 4, 8.0
    counts = {}
    for n in (500, 2000):
        r = similarity.required_band_bits(n, bands, cpr)
        bits = bands * r
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((n, dim)).astype(float)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        planes = similarity._hyperplanes(dim, bits, 42)
        keys = similarity.band_keys_kernel(planes, bands)
        buckets = df.select(
            F.col("vec_id").alias("_id"),
            F.posexplode(keys(F.col("embedding"))).alias("_band", "_key"),
        )
        counts[n] = (
            buckets.alias("l")
            .join(
                buckets.alias("r"),
                (F.col("l._band") == F.col("r._band"))
                & (F.col("l._key") == F.col("r._key"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .select("l._id", "r._id")
            .distinct()
            .count()
        )
        # per-row bound with the documented Jensen slack (~1.5x at dim=16)
        assert counts[n] <= 2.0 * cpr * n, (n, bits, counts[n])
    # LINEAR shape across a 4x corpus growth: a fixed key space would grow
    # candidates 16x; the auto-scaled key space must stay ~4x.
    assert counts[2000] <= 6.0 * counts[500], counts


def test_similarity_dim_required(spark):
    from jsons_to_schema_spark.operators import similarity

    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim is required"):
        similarity.lsh_topk(df, df, k=1, bits=4, bands=1)
    with pytest.raises(ValueError, match="dim is required"):
        similarity.embedding_near_dup_pairs(df, bits=8, bands=2)


def test_semantic_dedup_planted_ground_truth(spark):
    """Planted +0.001 perturbations must be dropped against their originals
    (cos ≈ 1 ≫ 0.95); the random base vectors (max pairwise cos ≈ 0.51)
    must all survive."""
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    allv = emb.unionByName(pert)
    dropped = similarity.semantic_dedup(allv, n_cells=8, threshold=0.95).collect()
    assert {r.vec_id: r.kept_id for r in dropped} == {i + 10000: i for i in range(10)}
    assert all(r.cos_sim >= 0.99 for r in dropped)


def test_semantic_dedup_partition_invariant(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    a = similarity.semantic_dedup(
        emb.unionByName(pert).repartition(1), n_cells=8, threshold=0.95
    )
    b = similarity.semantic_dedup(
        emb.unionByName(pert).repartition(13), n_cells=8, threshold=0.95
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantic_dedup_far_from_centroid_policy(spark):
    """The SemDeDup-paper keep heuristic must keep exactly one member per
    planted pair too — only WHICH member may differ from min_id."""
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    dropped = similarity.semantic_dedup(
        emb.unionByName(pert), n_cells=8, threshold=0.95,
        keep_policy="far_from_centroid",
    ).collect()
    assert len(dropped) == 10
    pairs = {(min(r.vec_id, r.kept_id) % 10000, max(r.vec_id, r.kept_id) % 10000)
             for r in dropped}
    assert pairs == {(i, i) for i in range(10)}


def test_cell_kernels_agree_with_reference_expressions(spark):
    """The Arrow assignment/probe kernels must pick the same cells as the
    literal-expression reference forms (_argmax_cell/_topcells) on the
    driver embeddings."""
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    C = similarity.ivf_train_centroids(emb, n_cells=8, iters=2, seed=42)
    a = {r.vec_id: r.c for r in emb.select(
        "vec_id",
        similarity._argmax_cell(similarity._l2_normalize(F.col("embedding")), C).alias("c"),
    ).collect()}
    b = {r.vec_id: r.c for r in emb.select(
        "vec_id", similarity.assign_cells_kernel(C)(F.col("embedding")).alias("c")
    ).collect()}
    assert a == b
    ta = {r.vec_id: r.c for r in emb.select(
        "vec_id",
        similarity._topcells(similarity._l2_normalize(F.col("embedding")), C, 3).alias("c"),
    ).collect()}
    tb = {r.vec_id: r.c for r in emb.select(
        "vec_id", similarity.topcells_kernel(C, 3)(F.col("embedding")).alias("c")
    ).collect()}
    assert ta == tb


def test_l2_normalize_kernel_bit_identical(spark):
    """The Arrow normalize kernel must reproduce the expression form's
    doubles BIT-for-bit (cumsum sequential sum ≡ the JVM left fold) — the
    hash-smallest IVF sample and the pinned semantic-dedup oracles hash the
    stringified normalized values, so even 1-ulp drift would change them.
    Covers real embeddings plus a NULL row.  (A zero vector is untestable
    here: the ANSI-mode expression raises DIVIDE_BY_ZERO where the kernel
    yields IEEE nan — documented divergence.)"""
    import math

    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    extra = spark.createDataFrame(
        [(10**9 + 1, None)],
        "vec_id long, embedding array<float>",
    )
    both = emb.unionByName(extra)
    a = {r.vec_id: r.v for r in both.select(
        "vec_id", similarity._l2_normalize(F.col("embedding")).alias("v")
    ).collect()}
    b = {r.vec_id: r.v for r in both.select(
        "vec_id", similarity.l2_normalize_kernel()(F.col("embedding")).alias("v")
    ).collect()}
    assert a.keys() == b.keys()
    for k, va in a.items():
        vb = b[k]
        if va is None:
            assert vb is None
            continue
        assert len(va) == len(vb)
        for x, y in zip(va, vb):
            # nan == nan is False; compare raw bit patterns instead
            assert math.isnan(x) and math.isnan(y) or x == y, (k, x, y)


def test_image_dhash_stage_matches_pure_function(spark):
    from jsons_to_schema_spark.operators.codecs import dhash64, encode_png

    mats, rows = {}, []
    for i in range(12):
        base = (np.add.outer(np.arange(16) * (i + 1), np.arange(20) * 2) % 200
                + 20).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        mats[f"m-{i:02d}"] = rgb
        rows.append((f"m-{i:02d}", bytearray(encode_png(20, 16, pixels=rgb))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r.media_ref: r for r in multimodal.image_dhash(df, "media_ref", "payload").collect()}
    assert set(got) == set(mats)
    for ref, rgb in mats.items():
        r = got[ref]
        assert (r.width, r.height) == (20, 16)
        assert r.dhash == dhash64(rgb), ref


def test_hamming_near_dup_pairs_equals_brute_force(spark):
    import itertools
    import random

    rng = random.Random(5)
    base = [rng.getrandbits(63) for _ in range(12)]
    hashes = []
    for i, h in enumerate(base):
        hashes.append((f"h{i:02d}a", h))
        flip = 0
        for b in rng.sample(range(64), rng.randrange(0, 6)):
            flip |= 1 << b
        hashes.append((f"h{i:02d}b", (h ^ flip) - (1 << 64) if (h ^ flip) >= 1 << 63 else h ^ flip))
    df = spark.createDataFrame(hashes, "id string, h long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.hamming_near_dup_pairs(df, "h", "id", 3).collect()
    }
    vals = dict(hashes)
    expect = set()
    for (ia, ha), (ib, hb) in itertools.combinations(hashes, 2):
        d = bin((ha ^ hb) & (2**64 - 1)).count("1")
        if d <= 3:
            a, b = sorted((ia, ib))
            expect.add((a, b, d))
    assert got == expect and expect  # non-empty by construction
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.hamming_near_dup_pairs(df, "h", "id", 4)


def test_image_near_dup_pairs_planted_copies(spark):
    from jsons_to_schema_spark.operators.codecs import encode_png

    rows = []
    for i in range(10):
        base = (np.add.outer(np.arange(24) * (i + 2), np.arange(27) * 3) % 180
                + 30).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        # brightness-shifted copy: every block comparison survives
        copy = (rgb.astype(np.int16) + 15).clip(0, 255).astype(np.uint8)
        inverted = rgb[:, ::-1]  # unrelated distractor
        rows.append((f"img-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb))))
        rows.append((f"cpy-{i:02d}", bytearray(encode_png(27, 24, pixels=copy))))
        rows.append((f"inv-{i:02d}", bytearray(encode_png(27, 24, pixels=inverted))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    pairs = multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    for i in range(10):
        assert got[(f"cpy-{i:02d}", f"img-{i:02d}")] == 0
    # no inverted distractor pairs with its source family
    assert not any("inv-" in a and ("img-" in b or "cpy-" in b) or
                   ("img-" in a or "cpy-" in a) and "inv-" in b
                   for a, b in got)


def test_audio_near_dup_pairs_planted_duplicates(spark):
    from jsons_to_schema_spark.operators.codecs import encode_wav_pcm

    n = np.arange(2048, dtype=np.float64)

    def clip_for_pattern(p):
        amps = [300.0]
        for f in range(8):
            amps.append(amps[-1] * 1.5 if (p >> f) & 1 else amps[-1] / 1.5)
        x = np.zeros(2048)
        for f, a in enumerate(amps):
            k = 8 * (8 + 14 * f)
            x += a * np.sin(2 * np.pi * k * (n + 0.31) / 2048)
        return np.floor(x + 0.5).astype(np.int16)

    rows = []
    for i in range(1, 9):
        s = clip_for_pattern(i)
        rows.append((f"src-{i:02d}", bytearray(encode_wav_pcm(s))))
        rows.append(
            (f"dup-{i:02d}", bytearray(encode_wav_pcm((s * 2).astype(np.int16))))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    pairs = multimodal.audio_near_dup_pairs(df, "media_ref", "payload", 3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got == {(f"dup-{i:02d}", f"src-{i:02d}"): 0 for i in range(1, 9)}
    hashes = {
        r.media_ref: r.fingerprint
        for r in multimodal.audio_fingerprint(df, "media_ref", "payload").collect()
    }
    # the fingerprint is construction-predictable: pattern i in every segment
    for i in range(1, 9):
        expect = sum(((i >> f) & 1) << (8 * t + f) for t in range(8) for f in range(8))
        assert hashes[f"src-{i:02d}"] & (2**64 - 1) == expect


def test_video_near_dup_pairs_remux_invariance(spark):
    from jsons_to_schema_spark.operators.codecs import encode_mp4

    def sizes_for_pattern(p, frames=130):
        vals, v = [], 4000
        for b in range(65):
            vals += [v, v]
            v = int(v * 1.2) if (p >> (b % 8)) & 1 else max(int(v / 1.2), 10)
        return vals[:frames]

    rows = []
    for i in range(1, 9):
        s = sizes_for_pattern(i)
        rows.append((f"vid-{i:02d}", bytearray(encode_mp4(64, 48, s))))
        # re-mux: same coded frames, different geometry metadata
        rows.append((f"mux-{i:02d}", bytearray(encode_mp4(128, 96, s))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    pairs = multimodal.video_near_dup_pairs(df, "media_ref", "payload", 3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got == {(f"mux-{i:02d}", f"vid-{i:02d}"): 0 for i in range(1, 9)}
    fps = {
        r.media_ref: r
        for r in multimodal.video_fingerprint(df, "media_ref", "payload").collect()
    }
    assert fps["vid-01"].fingerprint == fps["mux-01"].fingerprint
    assert (fps["vid-01"].width, fps["mux-01"].width) == (64, 128)
