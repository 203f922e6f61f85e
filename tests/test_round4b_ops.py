"""Round-4 continuation operators: PSI drift, FD confidence, freshness,
table diff / reconciliation, temperature mixture sampling, bigram-LM
perplexity.  Planted ground truth + hand-computed expected values; the
cross-engine (DuckDB) value parity for the driver queries lives in
test_oracles.py."""

import math

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import drift, sample, stats, text, validate


# ---------------------------------------------------------------- PSI drift
def test_psi_identical_slices_is_zero(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    rep = drift.psi_report(df, df, "x", 0.0, 100.0, 10)
    rows = rep.collect()
    assert len(rows) == 10
    assert all(r["psi_term"] == 0.0 for r in rows)
    score = drift.psi_score(rep).collect()[0]
    assert score["psi"] == 0.0 and not score["moderate_shift"]


def test_psi_shifted_distribution_fires(spark):
    base = spark.range(1000).select((F.col("id") % 50).cast("double").alias("x"))
    cur = spark.range(1000).select((50 + F.col("id") % 50).cast("double").alias("x"))
    score = drift.psi_score(
        drift.psi_report(base, cur, "x", 0.0, 100.0, 10)
    ).collect()[0]
    assert score["psi"] > 0.25 and score["major_shift"]


def test_psi_hand_computed_two_buckets(spark):
    # base: 3 rows in bucket 0, 1 in bucket 1; cur: 1 and 3.  s=0.5, B=2.
    base = spark.createDataFrame([(0.1,), (0.2,), (0.3,), (1.5,)], ["x"])
    cur = spark.createDataFrame([(0.4,), (1.1,), (1.2,), (1.3,)], ["x"])
    rows = {
        r["bucket"]: r
        for r in drift.psi_report(base, cur, "x", 0.0, 2.0, 2).collect()
    }
    pb0, pc0 = (3 + 0.5) / (4 + 1.0), (1 + 0.5) / (4 + 1.0)
    expected0 = round((pc0 - pb0) * math.log(pc0 / pb0), 6)
    assert rows[0]["psi_term"] == pytest.approx(expected0, abs=1e-9)
    assert rows[0]["base_n"] == 3 and rows[0]["cur_n"] == 1
    # symmetric counts → symmetric terms
    assert rows[1]["psi_term"] == rows[0]["psi_term"]


def test_psi_empty_side_is_finite(spark):
    # NON-uniform base (all rows in bucket 0): an empty current side smooths
    # to uniform, so PSI must be finite AND positive.  (A uniform base vs an
    # empty side is legitimately PSI 0 — both smooth to uniform.)
    base = spark.range(100).select((F.col("id") % 2).cast("double").alias("x"))
    empty = base.filter(F.lit(False))
    rows = drift.psi_report(base, empty, "x", 0.0, 10.0, 5).collect()
    assert len(rows) == 5
    assert all(r["psi_term"] is not None for r in rows)
    assert drift.psi_score(drift.psi_report(base, empty, "x", 0.0, 10.0, 5)).collect()[
        0
    ]["psi"] > 0


# ---------------------------------------------------------- FD confidence
def test_fd_confidence_exact(spark):
    # a=1 -> {x:2 rows, y:1 row} kept 2; a=2 -> {x:1} kept 1 → 3/4
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x")], ["a", "b"]
    )
    r = stats.fd_confidence(df, ["a"], "b").collect()[0]
    assert r["n_rows"] == 4 and r["kept_rows"] == 3
    assert r["confidence"] == 0.75 and not r["holds"]


def test_fd_confidence_holds_and_null_dependent(spark):
    df = spark.createDataFrame([(1, "x"), (2, None), (2, None)], ["a", "b"])
    r = stats.fd_confidence(df, ["a"], "b").collect()[0]
    assert r["holds"] and r["confidence"] == 1.0
    # NULL disagreeing with a value is a violation
    df2 = spark.createDataFrame([(1, "x"), (1, None)], ["a", "b"])
    r2 = stats.fd_confidence(df2, ["a"], "b").collect()[0]
    assert not r2["holds"] and r2["kept_rows"] == 1


# -------------------------------------------------------------- freshness
def test_freshness_explicit_asof(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:10:00"),
         ("b", "2024-01-01 01:00:00")],
        ["g", "ts_s"],
    ).select("g", F.to_timestamp("ts_s").alias("ts"))
    as_of = df.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    out = {
        r["g"]: r
        for r in stats.freshness(
            df, "ts", max_lag_seconds=3600, as_of_epoch_us=as_of, group_col="g"
        ).collect()
    }
    assert out["b"]["lag_seconds"] == 0 and out["b"]["fresh"]
    assert out["a"]["lag_seconds"] == 3000 and out["a"]["fresh"]
    strict = stats.freshness(
        df, "ts", max_lag_seconds=600, as_of_epoch_us=as_of, group_col="g"
    )
    assert not {r["g"]: r for r in strict.collect()}["a"]["fresh"]


def test_freshness_self_asof_global(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], ["ts_s"]
    ).select(F.to_timestamp("ts_s").alias("ts"))
    r = stats.freshness(df, "ts", max_lag_seconds=0).collect()[0]
    assert r["lag_seconds"] == 0 and r["fresh"]


# -------------------------------------------------------------- table diff
def test_table_diff_planted(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        ["k", "s", "v"],
    )
    b = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 31.0), (4, "w", 40.0), (5, "n", 50.0)],
        ["k", "s", "v"],
    )
    rows = {r["k"]: r for r in validate.table_diff(a, b, ["k"]).collect()}
    assert rows[1]["status"] == "removed" and rows[1]["changed_cols"] is None
    assert 2 not in rows  # unchanged rows are dropped
    assert rows[3]["status"] == "changed" and rows[3]["changed_cols"] == ["v"]
    assert rows[4]["status"] == "changed" and rows[4]["changed_cols"] == ["s"]
    assert rows[5]["status"] == "added" and rows[5]["changed_cols"] is None
    summary = {
        r["status"]: r["n_rows"]
        for r in validate.table_diff_summary(
            validate.table_diff(a, b, ["k"])
        ).collect()
    }
    assert summary == {"removed": 1, "changed": 2, "added": 1}


def test_table_diff_all_null_payload_row_present(spark):
    a = spark.createDataFrame([(1, None)], "k int, v string")
    b = spark.createDataFrame([(1, None)], "k int, v string")
    assert validate.table_diff(a, b, ["k"]).count() == 0  # NULL == NULL here


def test_table_diff_identical_is_empty(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    assert validate.table_diff(a, a, ["k"]).count() == 0


# --------------------------------------------------------- mixture sample
def test_mixture_rates_flattening():
    counts = {"big": 90_000, "small": 10_000}
    thr = sample.mixture_rates(counts, alpha=0.5, target_total=10_000)
    # alpha<1 must give the small source a HIGHER acceptance rate
    assert thr["small"] > thr["big"] > 0
    # alpha=1 keeps natural proportions: equal rates
    thr1 = sample.mixture_rates(counts, alpha=1.0, target_total=10_000)
    assert abs(thr1["small"] - thr1["big"]) <= 1
    # clamp: a target bigger than the corpus keeps everything
    thr_all = sample.mixture_rates(counts, alpha=0.5, target_total=10**9)
    assert thr_all["big"] == thr_all["small"] == 2**20


def test_mixture_sample_hits_target_and_deterministic(spark):
    df = spark.range(100_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 10 < 9, "web").otherwise("books").alias("src"),
    )
    out = sample.mixture_sample(df, "key", "src", alpha=0.5, target_total=10_000)
    got = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    assert abs(total - 10_000) < 500  # hash noise only
    # temperature flattening: books (10% of corpus) gets ~25% of the sample
    # (sqrt(90000):sqrt(10000) = 3:1 share split)
    assert 0.19 < got["books"] / total < 0.31
    # deterministic under repartitioning
    a = set(r["key"] for r in out.collect())
    b = set(
        r["key"]
        for r in sample.mixture_sample(
            df.repartition(17), "key", "src", alpha=0.5, target_total=10_000
        ).collect()
    )
    assert a == b


def test_mixture_sample_matches_string_threshold_semantics(spark):
    # the numeric-compare path must agree with deterministic_sample when the
    # rate sits exactly on the dyadic grid (rate 0.25 = 2^18/2^20)
    df = spark.range(20_000).select(F.col("id").alias("key"), F.lit("s").alias("src"))
    thr = sample.mixture_rates({"s": 20_000}, alpha=1.0, target_total=5_000)
    assert thr["s"] == 2**18
    via_mix = set(
        r["key"]
        for r in sample.mixture_sample(df, "key", "src", 1.0, 5_000).collect()
    )
    via_det = set(
        r["key"] for r in sample.deterministic_sample(df, "key", 0.25).collect()
    )
    assert via_mix == via_det


# ------------------------------------------------------ bigram LM scoring
def test_lm_bigram_hand_computed(spark):
    # corpus: doc 1 = "a b", doc 2 = "a b", doc 3 = "a c", doc 4 = "a"
    # bigrams: (a,b) x2, (a,c) x1; C1(a)=3, V={a,b,c}=3, k=0.5
    df = spark.createDataFrame(
        [(1, "a b"), (2, "A B"), (3, "a c"), (4, "a")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in text.lm_bigram_scores(df, "text", "doc_id").collect()}
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ac = (1 + 0.5) / (3 + 0.5 * 3)
    assert out[1]["cross_entropy"] == pytest.approx(-math.log(p_ab), abs=1e-6)
    assert out[2]["cross_entropy"] == out[1]["cross_entropy"]  # lowercased
    assert out[3]["cross_entropy"] == pytest.approx(-math.log(p_ac), abs=1e-6)
    assert out[3]["perplexity"] == pytest.approx(1 / p_ac, abs=1e-4)
    # short doc: row kept, scores NULL
    assert out[4]["n_bigrams"] == 0 and out[4]["cross_entropy"] is None
    # repeated/common text scores LOWER than rare text
    assert out[1]["cross_entropy"] < out[3]["cross_entropy"]


def test_lm_bigram_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i + 1) % 5} w{i % 3} common common") for i in range(200)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, text.lm_bigram_scores(df, "text", "doc_id").collect()))
    b = sorted(
        map(tuple, text.lm_bigram_scores(df.repartition(13), "text", "doc_id").collect())
    )
    assert a == b


# -------------------------------------------------- semantic decontamination
def test_decontam_semantic_planted(spark):
    from jsons_to_schema_spark.operators.decontam import decontaminate_semantic

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # exact eval copy
            (2, [0.0, 1.0, 0.0]),   # near eval copy (cos ~0.995 vs e20)
            (3, [0.0, 0.0, 1.0]),   # clean
        ],
        ["vid", "v"],
    )
    eval_set = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (20, [0.1, 1.0, 0.0]), (30, [2.0, 0.0, 0.0])],
        ["eid", "ev"],
    )
    out = {
        r["vid"]: r
        for r in decontaminate_semantic(
            corpus, eval_set, "vid", "v", "eid", "ev", threshold=0.95
        ).collect()
    }
    # row 1 hits BOTH eid 10 (cos 1.0) and eid 30 (scaled copy, cos 1.0);
    # the tie breaks to the SMALLEST eval id
    assert out[1]["n_hits"] == 2 and out[1]["max_cos_sim"] == 1.0
    assert out[1]["nearest_eval_id"] == 10
    assert out[2]["n_hits"] == 1 and out[2]["nearest_eval_id"] == 20
    assert out[2]["max_cos_sim"] == pytest.approx(
        1 / math.sqrt(1.01), abs=1e-6
    )
    assert 3 not in out  # clean rows produce no row


def test_decontam_semantic_empty_eval(spark):
    from jsons_to_schema_spark.operators.decontam import decontaminate_semantic

    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vid", "v"])
    empty = spark.createDataFrame([], "eid long, ev array<double>")
    assert (
        decontaminate_semantic(
            corpus, empty, "vid", "v", "eid", "ev"
        ).count()
        == 0
    )


def test_hash_sample_stage_composition_seeds(spark):
    """Pipeline-stage composition: same-seed hash filters are fully NESTED
    (a later 0.9-rate filter after a ~0.4-rate mixture keeps everything);
    distinct seeds give independent draws (the run_curation.py rule)."""
    df = spark.range(50_000).select(
        F.col("id").alias("key"), F.lit("s").alias("src")
    )
    mixed = sample.mixture_sample(df, "key", "src", alpha=1.0, target_total=20_000)
    n_mixed = mixed.count()
    # same seed: no-op
    assert sample.deterministic_sample(mixed, "key", 0.9, seed=42).count() == n_mixed
    # distinct seed: independent draw, ~0.9 of the survivors
    n_indep = sample.deterministic_sample(mixed, "key", 0.9, seed=43).count()
    assert abs(n_indep - 0.9 * n_mixed) < 0.05 * n_mixed


# ----------------------------------------------------------- coverage gaps
def test_coverage_gaps_planted(spark):
    # hourly rows for buckets 100..109 except 103 and 107
    rows = [
        (b * 3600 * 1_000_000,) for b in range(100, 110) if b not in (103, 107)
    ]
    df = spark.createDataFrame(rows, "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    gaps = stats.coverage_gaps(df, "ts", 3600).collect()
    assert [(r["bucket"], r["bucket_start_epoch_s"]) for r in gaps] == [
        (103, 103 * 3600),
        (107, 107 * 3600),
    ]


def test_coverage_gaps_full_coverage_and_nulls(spark):
    rows = [(b * 3600 * 1_000_000,) for b in range(5, 9)] + [(None,)]
    df = spark.createDataFrame(rows, "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    assert stats.coverage_gaps(df, "ts", 3600).count() == 0
    # sub-bucket granularity: 4 hourly rows at 30-min buckets → 3 gaps
    assert stats.coverage_gaps(df, "ts", 1800).count() == 3


# ---------------------------------------------------------- Benford profile
def test_benford_profile_hand_computed(spark):
    # digits: 1 x3 (1, 12, 199), 2 x1 (25.7 → 25), 9 x1 (-9.2 → 9);
    # 0.5 and NULL excluded (|x| < 1 has no leading significant digit)
    df = spark.createDataFrame(
        [(1.0,), (12.0,), (199.0,), (25.7,), (-9.2,), (0.5,), (None,)],
        "x double",
    )
    rows = {r["digit"]: r for r in stats.benford_profile(df, "x").collect()}
    assert len(rows) == 9  # spine emits all digits
    assert rows[1]["n_rows"] == 3 and rows[1]["share"] == 0.6
    assert rows[2]["n_rows"] == 1 and rows[9]["n_rows"] == 1
    assert rows[3]["n_rows"] == 0 and rows[3]["share"] == 0.0
    assert rows[1]["benford_p"] == round(math.log10(2), 6)
    assert rows[1]["delta"] == round(0.6 - math.log10(2), 6)


def test_benford_profile_benford_data_small_delta(spark):
    # powers of 2 are Benford-distributed to good approximation; exponents
    # capped at 2^59 so values stay inside the documented < 10^18 domain
    df = spark.range(0, 1180).select(
        F.pow(F.lit(2.0), F.col("id") % 59).alias("x")
    )
    rows = stats.benford_profile(df, "x").collect()
    assert sum(r["n_rows"] for r in rows) == 1180
    assert all(abs(r["delta"]) < 0.06 for r in rows)


def test_benford_profile_excludes_saturating_magnitudes(spark):
    # a value past 2^63 must be EXCLUDED, never misread as digit 9
    df = spark.createDataFrame([(1e22,), (12.0,)], "x double")
    rows = {r["digit"]: r for r in stats.benford_profile(df, "x").collect()}
    assert rows[9]["n_rows"] == 0
    assert rows[1]["n_rows"] == 1 and rows[1]["share"] == 1.0


# ------------------------------------------------------------- grouped PSI
def test_psi_grouped_isolates_drifting_segment(spark):
    # segment "a" drifts (values shift by 50), segment "b" is stable
    rows = []
    for i in range(500):
        rows.append(("a", float(i % 50), i))          # base a: [0,50)
        rows.append(("b", float(i % 100), i))         # base b: [0,100)
    base = spark.createDataFrame(rows, ["g", "x", "i"])
    rows2 = []
    for i in range(500):
        rows2.append(("a", 50.0 + i % 50, i))         # cur a: [50,100) — drift
        rows2.append(("b", float((i + 7) % 100), i))  # cur b: same distribution
    cur = spark.createDataFrame(rows2, ["g", "x", "i"])
    rep = drift.psi_report_grouped(base, cur, "x", "g", 0.0, 100.0, 10)
    scores = {r["group"]: r for r in drift.psi_score_grouped(rep).collect()}
    assert scores["a"]["major_shift"] and scores["a"]["psi"] > 0.25
    assert not scores["b"]["moderate_shift"] and scores["b"]["psi"] < 0.05


def test_psi_grouped_one_sided_group_finite(spark):
    base = spark.createDataFrame([("only_base", 1.0)], ["g", "x"])
    cur = spark.createDataFrame([("only_cur", 2.0)], ["g", "x"])
    rep = drift.psi_report_grouped(base, cur, "x", "g", 0.0, 10.0, 5)
    rows = rep.collect()
    assert len(rows) == 10  # 2 groups x 5 buckets, both present in the spine
    assert all(r["psi_term"] is not None for r in rows)


def test_table_diff_key_only_membership(spark):
    # no compare columns: pure membership reconciliation, typed correctly
    a = spark.createDataFrame([(1,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    rows = {r["k"]: r for r in validate.table_diff(a, b, ["k"]).collect()}
    assert rows[1]["status"] == "removed" and rows[3]["status"] == "added"
    assert 2 not in rows
    diff = validate.table_diff(a, b, ["k"])
    assert dict(diff.dtypes)["changed_cols"] == "array<string>"


def test_psi_drift_stream_fires_on_planted_collapse(spark, tmp_path):
    from jsons_to_schema_spark.streaming.monitor import psi_drift_stream

    src = str(tmp_path / "src")
    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    baseline = {b: 10 for b in range(10)}  # uniform over [0, 100)
    # batch 0: same uniform distribution; batch 1: collapsed to [0, 10)
    base.select("x").write.mode("append").parquet(src)
    q = psi_drift_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        "x", 0.0, 100.0, 10, baseline, source_schema="x double",
    )
    q.awaitTermination()
    spark.range(1000).select((F.col("id") % 10).cast("double").alias("x")).write.mode(
        "append"
    ).parquet(src)
    q = psi_drift_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        "x", 0.0, 100.0, 10, baseline, source_schema="x double",
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    psi = {
        r["run_id"]: r["psi"]
        for r in out.groupBy("run_id")
        .agg(F.round(F.sum("psi_term"), 6).alias("psi"))
        .collect()
    }
    assert psi[0] == 0.0          # identical distribution → zero drift
    assert psi[1] > 0.25          # planted collapse → major shift


def test_psi_multi_matches_per_column(spark):
    """The melted multi-column report must equal per-column psi_report."""
    base = spark.range(2000).select(
        (F.col("id") % 50).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    cur = spark.range(2000).select(
        (25 + F.col("id") % 25).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    multi = drift.psi_report_multi(base, cur, {"a": (0.0, 50.0), "b": (0.0, 7.0)}, 10)
    got_a = sorted(
        (r["bucket"], r["base_n"], r["cur_n"], r["psi_term"])
        for r in multi.filter("column = 'a'").collect()
    )
    want_a = sorted(
        (r["bucket"], r["base_n"], r["cur_n"], r["psi_term"])
        for r in drift.psi_report(base, cur, "a", 0.0, 50.0, 10).collect()
    )
    assert got_a == want_a
    # stable column b scores ~0, drifted column a fires
    import collections
    psi = collections.defaultdict(float)
    for r in multi.collect():
        psi[r["column"]] += r["psi_term"]
    assert psi["a"] > 0.25 and abs(psi["b"]) < 0.01


# ---------------------------------------------------------------- IVF-PQ
def test_ivf_pq_recall_vs_brute_force(spark, tmp_path):
    """PQ-index probe (ADC over integer codes, JVM-side) with exact
    rerank: high recall vs brute force, full-precision reported scores."""
    from jsons_to_schema_spark.operators import similarity
    from jsons_to_schema_spark.sources.tables import load_table

    from .conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    idx = tmp_path / "ivf_pq"
    meta = similarity.build_ivf_pq_index(
        emb, idx, n_cells=8, m=4, n_codes=64, iters=2, pq_iters=6, seed=42
    )
    assert meta["pq"] and len(meta["codebooks"]) == 4
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.ivf_topk_indexed_pq(
        spark, idx, queries, emb, k=10, n_probe=8, oversample=16
    )
    exact = similarity.brute_force_topk(emb, queries, k=10)
    g = {(r.query_id, r.neighbor_id): r.cos_sim for r in got.collect()}
    e = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact.collect()}
    recall = len(g.keys() & e.keys()) / len(e)
    # random 16-dim vectors are PQ's worst case (no structure to code away;
    # 1.25 bits/dim here); the oversampled rerank recovers ≥0.85 — real
    # embedding corpora (clustered, higher dim) sit far above this
    assert recall >= 0.85, recall
    for key in g.keys() & e.keys():
        assert abs(g[key] - e[key]) < 1e-9  # rerank scores are exact


def test_pq_codes_shape_and_determinism(spark):
    from jsons_to_schema_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(200)]
        + [(999, None)],
        "vec_id long, embedding array<double>",
    )
    books = similarity.pq_train_codebooks(df, m=2, n_codes=8, sample_limit=500)
    assert len(books) == 2 and all(len(b) <= 8 for b in books)
    normed = df.select(
        "vec_id",
        similarity.l2_normalize_kernel()(F.col("embedding")).alias("nv"),
    )
    codes = normed.select(
        "vec_id", similarity.pq_encode_kernel(books)(F.col("nv")).alias("c")
    )
    rows = {r["vec_id"]: r["c"] for r in codes.collect()}
    assert rows[999] is None  # malformed/null rows → null codes
    assert all(
        v is None or (len(v) == 2 and all(0 <= x < 8 for x in v))
        for v in rows.values()
    )
    # bit-determinism across partitionings
    books2 = similarity.pq_train_codebooks(
        df.repartition(7), m=2, n_codes=8, sample_limit=500
    )
    assert books == books2


def test_pq_dim_not_divisible_raises(spark):
    from jsons_to_schema_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train_codebooks(df, m=2, n_codes=4)


# -------------------------------------------------- span-level contamination
def test_contamination_spans_island_merge_geometry(spark):
    """Hits at token positions {0, 3} merge (3 <= 0+5); a hit at exactly
    prev+n is ADJACENT coverage and merges; prev+n+1 starts a new span."""
    from jsons_to_schema_spark.operators import decontam

    # 30 tokens w0..w29; eval grams plant hits at positions 0, 5 (adjacent
    # to 0: 5 == 0+5 merges), and 11 (11 - 5 = 6 > 5: new span)
    words = [f"w{i}" for i in range(30)]
    doc = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")

    def gram(p):
        return " ".join(words[p : p + 5])

    ev = spark.createDataFrame(
        [(gram(0),), (gram(5),), (gram(11),)], "ngram string"
    )
    rows = sorted(
        decontam.contamination_spans(doc, ev, "text", "doc_id", n=5).collect(),
        key=lambda r: r.span_start,
    )
    assert [(r.span_start, r.span_end, r.n_tokens, r.n_hit_grams) for r in rows] == [
        (0, 10, 10, 2),   # 0 and 5 merged: coverage [0,5)+[5,10)
        (11, 16, 5, 1),   # isolated run
    ]


def test_contamination_spans_partition_invariance_and_no_hits(spark):
    from jsons_to_schema_spark.operators import decontam

    words = [f"t{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i % 3 :])) for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(" ".join(words[10:15]),)], "ngram string"
    )
    a = decontam.contamination_spans(docs, ev, "text", "doc_id", n=5)
    b = decontam.contamination_spans(
        docs.repartition(7), ev, "text", "doc_id", n=5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    none = decontam.contamination_spans(
        docs, spark.createDataFrame([("zz zz zz zz zz",)], "ngram string"),
        "text", "doc_id", n=5,
    )
    assert none.count() == 0


# -------------------------------------------------- embedding hygiene profile
def test_embedding_profile_counts_each_defect_class(spark):
    from jsons_to_schema_spark.operators.similarity import embedding_profile

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, None),
        (3, [3.0, 4.0]),                     # wrong dim
        (4, [float("nan"), 1.0, 1.0]),
        (5, [0.0, 0.0, 0.0]),                # zero vector
        (6, [float("inf"), 1.0, 1.0]),
        (7, [0.0, 3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_profile(df, "embedding", expected_dim=3).collect()[0]
    assert r.n_rows == 7 and r.n_null == 1
    assert r.dim_min == 2 and r.dim_max == 3 and r.n_wrong_dim == 1
    assert r.n_with_nan == 1 and r.n_with_inf == 1
    assert r.n_zero_vec == 1
    # clean vectors: norms 1.0, 5.0, 0.0, 5.0 -> min 0, max 5, mean 2.75
    assert r.norm_min == 0.0 and r.norm_max == 5.0
    assert r.norm_mean == 2.75


def test_embedding_profile_without_expected_dim(spark):
    from jsons_to_schema_spark.operators.similarity import embedding_profile

    df = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    r = embedding_profile(df, "embedding").collect()[0]
    assert "n_wrong_dim" not in r.asDict()
    assert r.dim_min == r.dim_max == 2


# -------------------------------------------------- sketch snapshot overlap
def test_distinct_overlap_known_sets(spark):
    """Small disjoint/overlapping sets: HLL is exact at these cardinalities,
    so the derived new/common estimates equal the true values."""
    from jsons_to_schema_spark.operators.stats import distinct_overlap

    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i,) for i in range(60, 160)], "k long")
    r = distinct_overlap(a, b, "k").collect()[0]
    assert r.n_a_est == 100 and r.n_b_est == 100
    assert r.n_union_est == 160
    assert r.n_new_in_a_est == 60 and r.n_common_est == 40
    # partition invariance of the CONTRACT (sketch estimates themselves are
    # partition-stable for identical input data under hll_union semantics)
    r2 = distinct_overlap(a.repartition(7), b.repartition(3), "k").collect()[0]
    assert abs(r2.n_union_est - 160) <= 8


def test_quantile_profile_exact_and_null_group_handling(spark):
    from jsons_to_schema_spark.operators.stats import quantile_profile

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", None)],
        "g string, v double",
    )
    rows = {
        (r.group_value, r.p): r.q
        for r in quantile_profile(df, "v", (0.5,), "g").collect()
    }
    assert rows[("a", 0.5)] == 2.5  # linear interpolation
    assert rows[("b", 0.5)] is None  # all-NULL group keeps its row
    whole = quantile_profile(df, "v", (0.0, 1.0)).collect()
    got = {r.p: r.q for r in whole}
    assert got[0.0] == 1.0 and got[1.0] == 4.0
    import pytest as _p

    with _p.raises(ValueError):
        quantile_profile(df, "v", ())
    with _p.raises(ValueError):
        quantile_profile(df, "v", (1.5,))


def test_format_profile_grades_known_values(spark):
    from jsons_to_schema_spark.operators.stats import format_profile

    df = spark.createDataFrame(
        [
            ("a@b.co", "550e8400-e29b-41d4-a716-446655440000"),
            ("no", "1.2.3.4"),
            (None, "2024-01-31"),
            ("http://x.io/p?q=1", "255.255.255.256"),
        ],
        "c1 string, c2 string",
    )
    rows = {
        (r.column, r.format): r
        for r in format_profile(df, ["c1", "c2"]).collect()
    }
    assert rows[("c1", "email")].n_match == 1
    assert rows[("c1", "url")].n_match == 1
    assert rows[("c1", "email")].n_nonnull == 3
    assert rows[("c1", "email")].match_rate == round(1 / 3, 6)
    assert rows[("c2", "uuid")].n_match == 1
    assert rows[("c2", "ipv4")].n_match == 1  # .256 octet must NOT match
    assert rows[("c2", "iso_date")].n_match == 1
    import pytest as _p

    with _p.raises(ValueError):
        format_profile(df, [])
    with _p.raises(ValueError):
        format_profile(df, ["c1"], formats=["nope"])


def test_corpus_composition_shares_and_null_weight(spark):
    from jsons_to_schema_spark.operators.stats import corpus_composition

    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("b", 30), (None, 60)],
        "src string, w int",
    )
    rows = {r.group_value: r for r in corpus_composition(df, "src", "w").collect()}
    assert rows["a"].n_docs == 2 and rows["a"].mass == 10.0
    assert rows["a"].doc_share == 0.5
    assert rows["a"].mass_share == 0.1
    assert rows[None].mass_share == 0.6  # NULL group is a real segment
    unweighted = {
        r.group_value: r for r in corpus_composition(df, "src").collect()
    }
    assert unweighted["b"].mass == 1.0 and unweighted["b"].doc_share == 0.25
