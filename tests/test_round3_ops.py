"""Round-3 operators: decontamination, sequence packing, split anomalies,
subschema decision procedure."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import decontam, pack, stats
from jsons_to_schema_spark.schema_algebra import (
    SchemaGenerationConfig,
    compat_report,
    is_subschema,
    jsons_to_schema,
    subschema_violations,
    unify,
    validate,
)
from jsons_to_schema_spark.sources.tables import load_table

from .conftest import SF_ORACLE


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_contamination_hits_planted(spark):
    """A doc sharing a 5-gram with the eval set is flagged; others are not;
    hit counts are exact distinct-overlap counts."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox jumps over a fence today"),  # shares 1 5-gram
            (3, "completely different words in this training document here"),
            (4, "the quick brown fox jumps again and again"),  # shares 1
            (5, "too short"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [("the quick brown fox jumps",), ("over the lazy dog now",)],
        "ngram string",
    )
    hits = {
        r.id: (r.n_hits, r.first_hit)
        for r in decontam.contamination_hits(
            docs, eval_df, "text", "doc_id", n=5
        ).collect()
    }
    assert set(hits) == {1, 4}
    assert hits[1] == (1, "the quick brown fox jumps")
    assert hits[4] == (1, "the quick brown fox jumps")

    clean = decontam.decontaminate(docs, eval_df, "text", "doc_id", n=5)
    assert {r.doc_id for r in clean.collect()} == {2, 3, 5}


def test_eval_ngrams_and_self_contamination(spark):
    """Eval n-grams built from docs flag those same docs (self-containment:
    an eval doc is always contaminated by its own n-grams)."""
    docs = load_table(spark, SF_ORACLE, "documents").limit(50)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    eval_ng = decontam.eval_ngrams_from_docs(eval_docs, "text", n=5)
    flagged = {
        r.id
        for r in decontam.contamination_hits(
            docs, eval_ng, "text", "doc_id", n=5
        ).collect()
    }
    must_flag = {
        r.doc_id
        for r in eval_docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
        if r.n >= 5
    }
    assert must_flag <= flagged


def test_decontaminate_short_docs_survive(spark):
    """Docs with fewer than n tokens produce no n-grams and must SURVIVE the
    anti-join (explode_outer, not explode)."""
    docs = spark.createDataFrame([(1, "a b"), (2, "x")], "doc_id long, text string")
    eval_df = spark.createDataFrame([("a b c d e",)], "ngram string")
    out = decontam.decontaminate(docs, eval_df, "text", "doc_id", n=5)
    assert out.count() == 2


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_exact_assignment(spark):
    """Concat-and-cut semantics: doc's sequence = floor(tokens-before /
    budget) within its shard, offset = remainder."""
    rows = [
        (1, "s", "a b c"),        # 3+1 sep = 4 tokens, start 0  -> seq 0 off 0
        (2, "s", "d e"),          # 3, start 4        -> seq 0 off 4
        (3, "s", "f g h i j"),    # 6, start 7        -> seq 0 off 7 (straddles)
        (4, "s", "k"),            # 2, start 13       -> seq 1 off 3
        (5, "t", "l m n"),        # 4, start 0        -> seq 0 off 0 (own shard)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {
        r.id: (r.seq_id, r.seq_offset, r.n_tokens)
        for r in pack.pack_sequences(
            df, "doc_id", "src", budget=10, text_col="text"
        ).collect()
    }
    assert out[1] == ("s#0", 0, 4)
    assert out[2] == ("s#0", 4, 3)
    assert out[3] == ("s#0", 7, 6)
    assert out[4] == ("s#1", 3, 2)
    assert out[5] == ("t#0", 0, 4)


def test_packing_stats_optimality(spark):
    """Concat-and-cut consumes exactly ceil(total/budget) sequences; doc
    starts can only cover a subset of them (long docs straddle)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    packed = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    st = pack.packing_stats(packed, budget=256).collect()
    assert len(st) > 0
    for r in st:
        assert r.n_sequences == -(-r.total_tokens // 256)
        assert r.n_doc_start_sequences <= r.n_sequences
        assert 0 < r.fill_ratio <= 1.0


def test_pack_partitioning_invariance(spark):
    """Same assignment under different input partitioning (window is keyed
    by shard + ordered by id — no partition-dependent state)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    a = pack.pack_sequences(docs, "doc_id", "source", budget=128).collect()
    b = pack.pack_sequences(
        docs.repartition(3, "n_chars"), "doc_id", "source", budget=128
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# split anomalies
# ---------------------------------------------------------------------------

def test_split_anomalies_detects_planted_outlier(spark):
    """A metric table with one wildly-short split flags exactly that split."""
    rows = [(f"f{i}", 1000 + (i % 7), 2) for i in range(30)] + [("bad", 3, 2)]
    m = spark.createDataFrame(rows, "split string, n_rows long, n_failed long")
    out = stats.split_anomalies(m, "split", ["n_rows", "n_failed"], z_threshold=3.0)
    flagged = {r.split for r in out.collect() if r.anomalous}
    assert flagged == {"bad"}
    zs = {r.split: r.z_n_failed for r in out.collect()}
    assert all(z == 0.0 for z in zs.values())  # constant metric -> z 0 via guard


def test_split_anomalies_partitioning_invariant(spark):
    """Exact-integer-sum arithmetic: identical z-scores under repartition."""
    rows = [(f"f{i}", 100 + 17 * (i % 5), i % 3) for i in range(40)]
    m = spark.createDataFrame(rows, "split string, n_rows long, n_failed long")
    a = sorted(map(tuple, stats.split_anomalies(m, "split", ["n_rows", "n_failed"]).collect()))
    b = sorted(
        map(
            tuple,
            stats.split_anomalies(
                m.repartition(7), "split", ["n_rows", "n_failed"]
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# subschema decision (pure — no Spark)
# ---------------------------------------------------------------------------

def _rand_val(rng, depth=0):
    r = rng.random()
    if depth > 2 or r < 0.3:
        return rng.choice([1, 2.5, "s", True, None, 7])
    if r < 0.6:
        ks = rng.sample("abcd", rng.randint(0, 3))
        return {k: _rand_val(rng, depth + 1) for k in ks}
    return [_rand_val(rng, depth + 1) for _ in range(rng.randint(0, 3))]


def test_subschema_reflexive_and_sound():
    rng = random.Random(7)
    n_true = 0
    for _ in range(400):
        A = [_rand_val(rng) for _ in range(rng.randint(1, 4))]
        B = [_rand_val(rng) for _ in range(rng.randint(1, 4))]
        sa, sb = jsons_to_schema(A), jsons_to_schema(B)
        assert is_subschema(sa, sa), json.dumps(sa)
        assert is_subschema(sb, sb)
        if is_subschema(sa, sb):
            n_true += 1
            # soundness spot check on the docs we can reach: every A-doc
            # valid under sa must be valid under sb
            for d in A:
                if not validate(d, sa):
                    assert not validate(d, sb), (d, sa, sb)
    assert n_true > 0  # the relation is not vacuously False


def test_subschema_doc_level_law():
    """The generator's real guarantee: docs of A validate under the unified
    schema of A ∪ B (NOT schema-level inclusion — see subschema_violations
    docstring for why that is strictly weaker)."""
    rng = random.Random(11)
    for cfg in (SchemaGenerationConfig(), SchemaGenerationConfig(seal_object_properties=True)):
        for _ in range(200):
            A = [_rand_val(rng) for _ in range(rng.randint(1, 4))]
            B = [_rand_val(rng) for _ in range(rng.randint(1, 4))]
            merged = jsons_to_schema(A + B, cfg)
            for d in A + B:
                assert not validate(d, merged), (d, merged)


def test_subschema_directed_cases():
    wide = {"type": ["integer", "string"]}
    assert is_subschema({"type": "integer"}, wide)
    assert not is_subschema(wide, {"type": "integer"})
    assert is_subschema({"type": "integer"}, {"type": "number"})
    assert not is_subschema({"type": "number"}, {"type": "integer"})
    assert is_subschema(
        {"type": "integer", "minimum": 5}, {"type": "integer", "minimum": 3}
    )
    assert not is_subschema(
        {"type": "integer", "minimum": 3}, {"type": "integer", "minimum": 5}
    )
    # exclusive flags: a [5, ...) is NOT inside b (5, ...)
    assert not is_subschema(
        {"type": "integer", "minimum": 5},
        {"type": "integer", "minimum": 5, "exclusiveMinimum": True},
    )
    assert is_subschema(
        {"type": "integer", "minimum": 5, "exclusiveMinimum": True},
        {"type": "integer", "minimum": 5},
    )
    # enum fast path is exact
    assert is_subschema({"enum": [1, 2]}, {"type": "integer"})
    assert not is_subschema({"enum": [1, "x"]}, {"type": "integer"})
    # sealed-object vacuity: a sealed without k ignores b's constraint on k
    sealed = {
        "type": "object",
        "properties": {"a": {"type": "integer"}},
        "additionalProperties": False,
    }
    constrains_k = {
        "type": "object",
        "properties": {"k": {"type": "string"}},
    }
    assert is_subschema(sealed, constrains_k)
    # open object does NOT prove it
    open_obj = {"type": "object", "properties": {"a": {"type": "integer"}}}
    assert not is_subschema(open_obj, constrains_k)


def test_compat_report_directions():
    old = jsons_to_schema([{"k": 1}])
    new = unify(old, jsons_to_schema([{"k": 2.5}]))  # k widens to number
    rep = compat_report(old, new)
    assert rep["backward_compatible"] is True  # int docs still valid
    assert rep["forward_compatible"] is False  # number docs break old readers
    assert rep["n_changes"] >= 1
    assert any("number" in r for r in rep["breaking_for_old_readers"])


# ---------------------------------------------------------------------------
# persisted MinHash index — incremental dedup
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_index_probe_planted(spark, tmp_path):
    """A new batch's near-dups of the indexed corpus are found (planted
    ground truth); unrelated docs are not; append extends the index."""
    from jsons_to_schema_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the old town square tonight under bright stars"
    )
    corpus = _mk_docs(
        spark,
        [
            (1, base),
            (2, "completely unrelated text about spark shuffle partitions and codegen stages here"),
            (3, "another independent document mentioning parquet row groups and column pruning"),
        ],
    )
    idx = tmp_path / "mh_idx"
    dedup.build_minhash_index(corpus, idx, num_hashes=32, bands=16, k=3)

    new = _mk_docs(
        spark,
        [
            (101, base.replace("tonight", "at dusk")),  # near-dup of 1
            (102, "fresh never seen words forming a genuinely novel document body"),
        ],
    )
    got = dedup.minhash_probe_index(spark, idx, new, min_jaccard=0.5).collect()
    pairs = {(r.new_id, r.corpus_id) for r in got}
    assert (101, 1) in pairs
    assert all(n != 102 for n, _ in pairs)
    for r in got:
        assert r.jaccard >= 0.5

    # append the clean doc; an exact copy probed later must hit jaccard 1.0
    dedup.append_to_minhash_index(
        new.filter(F.col("doc_id") == 102), idx
    )
    probe2 = _mk_docs(spark, [(201, "fresh never seen words forming a genuinely novel document body")])
    got2 = dedup.minhash_probe_index(spark, idx, probe2, min_jaccard=0.9).collect()
    assert {(r.new_id, r.corpus_id, r.jaccard) for r in got2} == {(201, 102, 1.0)}


def test_minhash_index_probe_agrees_with_batch_lsh(spark, tmp_path):
    """Index probe ≡ in-memory minhash_lsh_pairs on the same split: every
    (new, corpus) pair the batch engine reports across the split boundary is
    reported by the probe with the same jaccard (same hashes, same bands)."""
    from jsons_to_schema_spark.operators import dedup

    docs = load_table(spark, SF_ORACLE, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = tmp_path / "mh_idx2"
    dedup.build_minhash_index(corpus, idx, num_hashes=32, bands=8, k=3)
    probe = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in dedup.minhash_probe_index(spark, idx, new, min_jaccard=0.7).collect()
    }
    batch = dedup.minhash_lsh_pairs(docs, "text", "doc_id", 32, 8, 0.7, 3)
    cross = set()
    for r in batch.collect():
        a, b = r.id_a, r.id_b
        if (a % 5 == 0) != (b % 5 == 0):
            n, c = (a, b) if a % 5 == 0 else (b, a)
            cross.add((n, c, round(r.jaccard, 6)))
    assert probe == cross


# ---------------------------------------------------------------------------
# key skew report
# ---------------------------------------------------------------------------

def test_key_skew_report_detects_hot_key(spark):
    rows = [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "i long, k string")
    out = stats.key_skew_report(df, "k", top_k=3).collect()
    assert out[0].key == "hot" and out[0].cnt == 100
    assert out[0].share == 0.5 and out[0].max_share == 0.5
    assert out[0].skewed  # 100 > 8 * 200/101
    assert len(out) == 3
    assert out[0].total_rows == 200 and out[0].distinct_keys == 101


def test_key_skew_report_uniform_not_skewed(spark):
    rows = [(i, f"k{i % 20}") for i in range(200)]
    df = spark.createDataFrame(rows, "i long, k string")
    out = stats.key_skew_report(df, "k", top_k=5).collect()
    assert not any(r.skewed for r in out)
    # deterministic tie-break: all counts equal -> keys in ascending order
    assert [r.key for r in out] == sorted(r.key for r in out)


def test_key_skew_report_partitioning_invariant(spark):
    rows = [(i, f"k{i % 7}") for i in range(300)]
    df = spark.createDataFrame(rows, "i long, k string")
    a = [tuple(r) for r in stats.key_skew_report(df, "k").collect()]
    b = [tuple(r) for r in stats.key_skew_report(df.repartition(5), "k").collect()]
    assert a == b


# ---------------------------------------------------------------------------
# dead/constant column report + schema-apply
# ---------------------------------------------------------------------------

def test_dead_column_report_planted(spark):
    rows = [(i, None, "same", i % 3) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, dead_c string, const_c string, var_c long")
    out = {r.column: r for r in stats.dead_column_report(df).collect()}
    assert out["dead_c"].dead and not out["dead_c"].constant
    assert out["const_c"].constant and not out["const_c"].dead
    assert not out["var_c"].dead and not out["var_c"].constant
    assert not out["id"].constant
    assert out["dead_c"].n_nulls == 50 and out["id"].n_rows == 50


def test_apply_schema_typed_extraction(spark):
    from jsons_to_schema_spark.operators.infer import apply_schema
    from jsons_to_schema_spark.schema_algebra import jsons_to_schema

    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "a"}'), (2, '{"k": 9, "tag": "b"}'), (3, None)],
        "id long, doc string",
    )
    schema = jsons_to_schema([{"k": 7, "tag": "a"}, {"k": 9, "tag": "b"}])
    out = {r.id: (r.k, r.tag) for r in apply_schema(df, "doc", schema)
           .select("id", "parsed.k", "parsed.tag").collect()}
    assert out[1] == (7, "a") and out[2] == (9, "b")
    assert out[3] == (None, None)  # null text -> null struct, not an error


# ---------------------------------------------------------------------------
# per-stratum quota (domain balancing)
# ---------------------------------------------------------------------------

def test_quota_sample_caps_and_is_stable_under_growth(spark):
    from jsons_to_schema_spark.operators.sample import quota_sample

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string")
    kept = quota_sample(df, "id", "src", quota=7)
    by_src = {}
    for r in kept.collect():
        by_src.setdefault(r.src, set()).add(r.id)
    assert all(len(v) == 7 for v in by_src.values())

    # growth stability: doubling the corpus keeps the selection a superset-
    # consistent subset (old picks survive unless outranked by new rows ONLY)
    bigger = spark.createDataFrame(
        rows + [(i, f"s{i % 3}") for i in range(90, 180)], "id long, src string"
    )
    kept2 = {r.id for r in quota_sample(bigger, "id", "src", quota=7).collect()}
    # determinism under repartition
    kept3 = {r.id for r in quota_sample(bigger.repartition(5), "id", "src", 7).collect()}
    assert kept2 == kept3
    assert len(kept2) == 21


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_exact(spark):
    from jsons_to_schema_spark.operators.pack import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = sorted(
        (r.id, r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1).collect()
    )
    # doc 1: 7 tokens, stride 3 -> starts 0,3; start 6 is suppressed (its
    # window [6,10) adds no tokens beyond the chunk at 3, which ends at 7)
    assert out == [
        (1, 0, 4, "a b c d"),
        (1, 3, 4, "d e f g"),
        (2, 0, 2, "x y"),
    ]


def test_chunk_documents_covers_all_tokens(spark):
    """Every token position is inside >=1 chunk; consecutive chunks share
    exactly `overlap` tokens (except the tail)."""
    from jsons_to_schema_spark.operators.pack import chunk_documents

    docs = load_table(spark, SF_ORACLE, "documents").limit(40)
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=10, overlap=3)
    toks = {r.doc_id: r.n for r in docs.selectExpr(
        "doc_id", "size(filter(split(text, ' '), x -> x != '')) AS n").collect()}
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.id, []).append((r.chunk_start, r.n_chunk_tokens))
    for did, chunks in per_doc.items():
        chunks.sort()
        covered = max(s + n for s, n in chunks)
        assert covered == toks[did]
        for (s1, n1), (s2, n2) in zip(chunks, chunks[1:]):
            assert s2 == s1 + 7  # stride = 10 - 3
            assert s2 + 3 < s2 + n2  # every emitted chunk adds new tokens


# ---------------------------------------------------------------------------
# int8-quantized IVF index
# ---------------------------------------------------------------------------

def test_ivf_q8_recall_vs_brute_force(spark, tmp_path):
    """Quantized-index probe with exact rerank: high recall vs brute force,
    and every reported score equals the full-precision cosine (quantization
    only gates candidacy, never scores)."""
    from jsons_to_schema_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    idx = tmp_path / "ivf_q8"
    similarity.build_ivf_index_q8(emb, idx, n_cells=8, iters=2, seed=42)
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.ivf_topk_indexed_q8(
        spark, idx, queries, emb, k=10, n_probe=8, oversample=4
    )
    exact = similarity.brute_force_topk(emb, queries, k=10)
    g = {(r.query_id, r.neighbor_id): r.cos_sim for r in got.collect()}
    e = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact.collect()}
    # n_probe = n_cells -> candidacy limited only by oversample truncation
    recall = len(g.keys() & e.keys()) / len(e)
    assert recall >= 0.9, recall
    for key in g.keys() & e.keys():
        assert abs(g[key] - e[key]) < 1e-9  # scores are full precision


def test_q8_quantization_roundtrip(spark):
    """Codes reconstruct the normalized vector to within the 1/254 grid, and
    zero/null vectors yield null."""
    from jsons_to_schema_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.q
        for r in df.select(
            "vec_id",
            similarity.quantize_q8_kernel()(
                similarity.l2_normalize_kernel()(F.col("embedding"))
            ).alias("q"),
        ).collect()
    }
    q1 = out[1]
    assert q1 is not None
    recon = [c * q1.scale for c in q1.q8]
    assert abs(recon[0] - 0.6) < 1 / 127 and abs(recon[1] - 0.8) < 1 / 127
    assert out[2] is None or out[2].q8 is None
    assert out[3] is None or out[3].q8 is None


# ---------------------------------------------------------------------------
# rule DSL
# ---------------------------------------------------------------------------

def test_rule_verdicts_and_violation_rows(spark):
    from jsons_to_schema_spark.operators import validate as validate_ops

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "a"), (3, None, "b"), (4, 2.0, "b")],
        "id long, v double, g string",
    )
    rules = {
        "v_nonneg": F.col("v") >= 0,
        "v_present": F.col("v").isNotNull(),
    }
    out = {r.rule: r for r in validate_ops.rule_verdicts(df, rules).collect()}
    # null v counts as violation for BOTH rules (coalesce-to-False default)
    assert out["v_nonneg"].n_violations == 2 and not out["v_nonneg"].passed
    assert out["v_present"].n_violations == 1
    assert out["v_nonneg"].n_rows == 4

    grouped = {
        (r.g, r.rule): r.n_violations
        for r in validate_ops.rule_verdicts(df, rules, by="g").collect()
    }
    assert grouped[("a", "v_nonneg")] == 1 and grouped[("b", "v_nonneg")] == 1
    assert grouped[("b", "v_present")] == 1 and grouped[("a", "v_present")] == 0

    rows = {(r.id, r.rule) for r in
            validate_ops.rule_violation_rows(df, rules, "id").collect()}
    assert rows == {(2, "v_nonneg"), (3, "v_nonneg"), (3, "v_present")}


def test_rule_verdicts_single_scan(spark):
    from jsons_to_schema_spark.operators import validate as validate_ops
    from jsons_to_schema_spark.plans import audit

    events = load_table(spark, SF_ORACLE, "events")
    q = validate_ops.rule_verdicts(
        events, {"v": F.col("value") >= 0, "t": F.col("ts").isNotNull()}
    )
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_normalize_text_idempotent_and_bucketing(spark):
    from jsons_to_schema_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "École"), (2, "école"), (3, "ECOLE"), (4, None)],
        "doc_id long, text string",
    )
    out = {r.id: r.norm_text for r in text_ops.normalize_text(df, "text", "doc_id").collect()}
    # composed, decomposed, and case variants land in ONE dedup bucket
    assert out[1] == out[2] == out[3] == "ecole"
    assert out[4] is None
    # idempotence: normalizing the normalized form is a fixpoint
    df2 = spark.createDataFrame([(k, v) for k, v in out.items() if v], "doc_id long, text string")
    out2 = {r.id: r.norm_text for r in text_ops.normalize_text(df2, "text", "doc_id").collect()}
    assert all(out2[k] == out[k] for k in out2)


def test_l2_normalize_kernel_ragged_and_empty(spark):
    """Mixed-dimension batches and zero-length vectors take the per-row
    fallback and must still match the expression form bit-for-bit (the
    review-found crash case: vstack over ragged rows)."""
    from jsons_to_schema_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.0, 2.0, 2.0]), (3, []), (4, None)],
        "vec_id long, embedding array<double>",
    )
    a = {r.vec_id: r.v for r in df.select(
        "vec_id", similarity.l2_normalize_kernel()(F.col("embedding")).alias("v")
    ).collect()}
    assert a[1] == [0.6, 0.8]
    assert a[2] == [1.0 / 3, 2.0 / 3, 2.0 / 3]
    assert a[3] == []
    assert a[4] is None
    # expression-form agreement on the non-empty rows (empty array raises
    # ANSI DIVIDE_BY_ZERO in the expression — kernel is the more permissive
    # side there, documented)
    b = {r.vec_id: r.v for r in df.filter(F.size("embedding") > 0).select(
        "vec_id", similarity._l2_normalize(F.col("embedding")).alias("v")
    ).collect()}
    for k, vb in b.items():
        assert a[k] == vb, k


def test_schema_history_versions_and_transitions(tmp_path):
    from jsons_to_schema_spark.schema_algebra import jsons_to_schema
    from jsons_to_schema_spark.sources.sinks import SchemaHistory

    h = SchemaHistory(tmp_path / "hist")
    assert h.versions() == [] and h.transitions() == []
    v1 = h.append(jsons_to_schema([{"k": 1}]), 1)
    v2 = h.append(jsons_to_schema([{"k": 1}]), 2)
    assert (v1, v2) == (1, 2)
    assert [s["version"] for s in h.read()] == [1, 2]
    t = h.transitions()
    # identical consecutive snapshots: zero changes, compatible both ways
    assert len(t) == 1 and t[0]["n_changes"] == 0
    assert t[0]["backward_compatible"] and t[0]["forward_compatible"]


def test_repeated_span_report_planted(spark):
    from jsons_to_schema_spark.operators.text import repeated_span_report

    boiler = "this license text is identical across many documents in the corpus"
    rows = [
        (1, boiler + " alpha content here"),
        (2, boiler + " beta content there"),
        (3, "totally unrelated words that repeat in no other document at all"),
        (4, "prefix words then " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_span_report(df, "text", "doc_id", window=11, top_k=5).collect()
    assert out, "planted boilerplate not found"
    top = out[0]
    assert top.span == boiler and top.n_docs == 3 and top.example_id == 1
    assert all(r.n_docs >= 2 for r in out)


# ---------------------------------------------------------------------------
# third review pass regressions
# ---------------------------------------------------------------------------

def test_huge_integral_doubles_native_arrow_agree(spark):
    """|x| >= 2^63 integral doubles: FLOOR(double) saturates to a BIGINT, so
    the old native integrality check misclassified them as 'number' while
    arrow/pure said 'integer' — the modulo form agrees everywhere."""
    from jsons_to_schema_spark.operators.infer import infer_from_struct

    df = spark.createDataFrame([(1e19,), (2e20,), (5.0,)], "v double")
    schema, n = infer_from_struct(df)
    assert schema["properties"]["v"] == {"type": "integer"}, schema
    df2 = spark.createDataFrame([(1e19,), (2.5,)], "v double")
    schema2, _ = infer_from_struct(df2)
    assert schema2["properties"]["v"] == {"type": "number"}, schema2


def test_huge_decimal_classified_exactly(spark):
    """Non-integral decimals beyond float64 precision must classify as
    'number' (the old float64 round-trip rounded the .5 away)."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType, StructField, StructType

    from jsons_to_schema_spark.operators.infer import infer_from_struct

    st = StructType([StructField("d", DecimalType(38, 1))])
    df = spark.createDataFrame(
        [(Decimal("12345678901234567890.5"),), (Decimal("1.0"),)], st
    )
    schema, _ = infer_from_struct(df, engine="arrow")
    # the .5 value must classify as number (old float64 round-trip said
    # integer); per-partition drafts unify under the pinned no-absorption
    # rule, so with the integral 1.0 in another partition the result is
    # the union — 'number' must be IN it
    t = schema["properties"]["d"]["type"]
    assert "number" in (t if isinstance(t, list) else [t]), schema


def test_infer_grouped_integer_key_and_skip(spark):
    """Non-string group keys work (typed output DDL) and on_error='skip'
    drops malformed docs instead of failing the job."""
    from jsons_to_schema_spark.operators.infer import infer_grouped

    df = spark.createDataFrame(
        [(1, '{"k": 1}'), (1, "not json"), (2, '{"k": "s"}')],
        "gid long, doc string",
    )
    out = {r.gid: (r.unified_schema, r.n_docs) for r in
           infer_grouped(df, "gid", "doc", salt=2, on_error="skip").collect()}
    assert out[1][1] == 1 and '"integer"' in out[1][0]
    assert out[2][1] == 1 and '"string"' in out[2][0]
    import pytest as _pytest

    with _pytest.raises(Exception, match="malformed JSON"):
        infer_grouped(df, "gid", "doc", salt=1).count()


def test_empty_input_audit_raises(spark):
    """single_pass_audit / infer_from_struct on an EMPTY table must raise
    the NonEmpty error, not fabricate a schema with n_docs=None."""
    import pytest as _pytest

    from jsons_to_schema_spark.operators.audit_pass import single_pass_audit

    corpus = spark.createDataFrame(
        [], "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    with _pytest.raises(ValueError, match="no rows"):
        r = single_pass_audit(corpus, cap_per_check=5)
        _ = r.schema  # force evaluation if lazy


# ---------------------------------------------------------------------------
# fifth review pass regressions
# ---------------------------------------------------------------------------

def test_curate_cluster_representative_among_survivors(spark):
    """A near-dup cluster whose min-id member was gated out must still keep
    one surviving representative (old behavior dropped the whole cluster)."""
    from jsons_to_schema_spark.operators.curate import curate_documents

    docs = spark.createDataFrame(
        [
            (1, "too short"),  # min-id of the cluster, fails the gate
            (2, "the and of to in is that for the and of to in is that for"),
            (3, "the and of to in is that for the and of to in is that for x"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    kept = curate_documents(
        docs, "text", "doc_id", min_tokens=10, near_dup_pairs=pairs
    )
    ids = {r.doc_id for r in kept.collect()}
    assert 2 in ids  # surviving min becomes the representative
    assert 3 not in ids  # still deduped against the surviving rep
    assert 1 not in ids  # gated out


def test_curate_collapse_preserves_blank_lines(spark):
    from jsons_to_schema_spark.operators.curate import curate_documents

    text = "\n".join(
        ["the and of to in is that for paragraph one"] * 2
        + [""]
        + ["the and of to in is that for paragraph two"]
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = curate_documents(
        docs, "text", "doc_id", min_tokens=5, collapse_repeated_lines=True
    ).collect()[0].text
    assert out == (
        "the and of to in is that for paragraph one\n\n"
        "the and of to in is that for paragraph two"
    )


def test_compiled_enum_with_null_member_is_false_not_null(spark):
    from jsons_to_schema_spark.operators.validate import struct_conformance_flags

    df = spark.createDataFrame([("b",), ("a",)], "k string")
    schema = {"type": "object", "properties": {"k": {"enum": ["a", None]}}}
    out = {r.k: r.ok_schema for r in struct_conformance_flags(df, schema).collect()}
    assert out["a"] is True
    assert out["b"] is False  # was NULL (SQL IN with null member)


def test_json_validator_verdicts_bad_input(spark):
    from jsons_to_schema_spark.operators.validate import validate_json_against_schema

    df = spark.createDataFrame(
        [('{"k": 1}',), ('{"truncated',), (None,)], "doc string"
    )
    schema = {"type": "object", "properties": {"k": {"type": "integer"}},
              "required": ["k"]}
    rows = validate_json_against_schema(df, "doc", schema).collect()
    assert len(rows) == 3  # one verdict per input row, none dropped
    by_valid = sorted((r.valid, tuple(r.errors)) for r in rows)
    assert by_valid[0][0] is False and by_valid[1][0] is False
    assert any("invalid JSON" in e for _, errs in by_valid for e in errs)
    assert any("null document" in e for _, errs in by_valid for e in errs)


def test_quantile_drift_empty_slice_emits_null_rows(spark):
    from jsons_to_schema_spark.operators import drift

    base = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    empty = base.filter(F.col("v") < 0)
    out = drift.quantile_drift(base, empty, "v").collect()
    assert len(out) > 0  # rows still emit
    assert all(r.cur_q is None and r.delta is None for r in out)
    score = drift.drift_score(drift.quantile_drift(base, empty, "v")).collect()[0]
    assert score.max_abs_delta is None  # alert-shaped, not zero


def test_tdigest_empty_merge():
    from jsons_to_schema_spark.operators.tdigest import TDigest

    a, b = TDigest(100), TDigest(100)
    a.merge(b)  # must not raise
    import numpy as np

    c = TDigest(100)
    c.add_array(np.array([1.0, 2.0, 3.0]))
    c.merge(TDigest(100))
    assert abs(c.quantile(0.5) - 2.0) < 1.0


def test_get_spark_master_parsing():
    from jsons_to_schema_spark import session as sess

    # pure parsing check (no session build): replicate the branch
    def parts(master, cpus=32):
        import os as _os

        if master == "local":
            return 1
        if master.startswith("local["):
            inner = master[len("local["):-1].split(",")[0].strip()
            return (_os.cpu_count() or cpus) if inner == "*" else int(inner)
        return 2 * cpus

    assert parts("local") == 1
    assert parts("local[4]") == 4
    assert parts("local[4,2]") == 4  # retries syntax no longer crashes
    assert parts("local[*]") >= 1


def test_minhash_campaign_mode_equals_pair_mode(spark, tmp_path):
    """Campaign mode (pairs from the persisted signature/shingle index, r4
    VERDICT item 3) must be pair-for-pair identical to one-shot pair mode at
    the same parameters, build the index on first call, and reuse (not
    rebuild) it on the second; mismatched params must refuse to probe."""
    import pytest as _pytest

    from jsons_to_schema_spark.operators import dedup

    docs = load_table(spark, SF_ORACLE, "documents")
    direct = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", min_jaccard=0.5
        ).collect()
    }
    idx = tmp_path / "mh_campaign"
    from_index = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", min_jaccard=0.5, index_dir=idx
        ).collect()
    }
    assert from_index == direct and direct  # non-trivial corpus
    meta_mtime = (idx / "meta.json").stat().st_mtime
    again = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", min_jaccard=0.5, index_dir=idx
        ).collect()
    }
    assert again == direct
    assert (idx / "meta.json").stat().st_mtime == meta_mtime  # reused, not rebuilt
    with _pytest.raises(ValueError, match="built with"):
        dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4,
            min_jaccard=0.5, index_dir=idx,
        )


def test_curate_campaign_near_dup_index(spark, tmp_path):
    """curate_documents(near_dup_index_dir=...) drops near-dups through the
    persisted index exactly like passing the pair frame explicitly."""
    from jsons_to_schema_spark.operators import dedup
    from jsons_to_schema_spark.operators.curate import curate_documents

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the old town square tonight under bright stars"
    )
    docs = _mk_docs(
        spark,
        [
            (1, base),
            (2, base.replace("tonight", "at dusk")),  # near-dup of 1
            (3, "another independent document mentioning parquet row groups and column pruning today"),
        ],
    )
    explicit_pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", min_jaccard=0.5)
    want = {
        r.doc_id
        for r in curate_documents(
            docs, "text", "doc_id", min_tokens=3, near_dup_pairs=explicit_pairs
        ).collect()
    }
    got = {
        r.doc_id
        for r in curate_documents(
            docs, "text", "doc_id", min_tokens=3,
            near_dup_index_dir=tmp_path / "idx", near_dup_min_jaccard=0.5,
        ).collect()
    }
    assert got == want == {1, 3}


def test_constraint_suggestion_round_trip(spark):
    """suggest_constraints → rules_from_suggestions → rule_verdicts: every
    suggestion profiled from a snapshot must PASS as a rule on that same
    snapshot (the deequ-style closed loop), and suggestions must track
    planted nulls/duplicates/negatives correctly."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators import validate

    rows = [
        (1, "a", 5, None),
        (2, "b", 0, 1.5),
        (3, "a", 7, -2.0),
        (4, None, 3, 0.5),
        (5, "c", 5, 9.0),
    ]
    df = spark.createDataFrame(rows, "id long, cat string, n int, x double")
    sug = validate.suggest_constraints(df, ["id", "cat", "n", "x"])
    got = {(r["column"], r["suggestion"]) for r in sug.collect()}
    assert ("id", "NOT NULL") in got and ("id", "UNIQUE") in got
    assert ("id", "RANGE [1, 5]") in got
    assert ("cat", 'IS IN ("a", "b", "c")') in got  # nulls excluded from the set
    assert ("cat", "NOT NULL") not in got          # planted null
    assert ("n", "NON NEGATIVE") in got and ("n", "UNIQUE") not in got
    assert ("x", "NON NEGATIVE") not in got        # planted negative
    assert not any(c == "x" and s.startswith("RANGE") for c, s in got)

    rules = validate.rules_from_suggestions(sug)
    assert "id:range" in rules and "cat:isin" in rules
    assert not any(k.endswith(":unique") for k in rules)  # not row-local
    verdicts = validate.rule_verdicts(df, rules)
    vs = {r["rule"]: r for r in verdicts.collect()}
    assert vs and all(r["passed"] for r in vs.values())
    # NOT NULL rules only fire for columns without nulls, so violations
    # are 0 by construction on the SAME snapshot
    assert all(r["n_violations"] == 0 for r in vs.values())
    # but the compiled rules really do detect drift on a LATER batch
    later = spark.createDataFrame(
        [(6, "zz", -1, 1.0)], "id long, cat string, n int, x double"
    )
    drifted = {
        r["rule"]: r["n_violations"]
        for r in validate.rule_verdicts(later, rules).collect()
    }
    assert drifted["cat:isin"] == 1 and drifted["n:non_negative"] == 1
    assert drifted["id:range"] == 1

    # enum members containing the rendered ", " separator survive the
    # suggestion→rule round-trip (JSON quoting, r4 review finding)
    tricky = spark.createDataFrame(
        [(1, "pending, review"), (2, "done"), (3, 'say "hi"')], "id long, s string"
    )
    sug2 = validate.suggest_constraints(tricky, ["s"])
    rules2 = validate.rules_from_suggestions(sug2)
    v2 = {r["rule"]: r for r in validate.rule_verdicts(tricky, rules2).collect()}
    assert v2["s:isin"]["n_violations"] == 0 and v2["s:isin"]["passed"]


def test_histogram_and_top_values(spark):
    from jsons_to_schema_spark.operators import stats

    df = spark.createDataFrame(
        [(0.0,), (24.9,), (25.0,), (99.9,), (100.0,), (None,), (-5.0,), (120.0,)],
        "v double",
    )
    h = {r["bucket"]: r for r in stats.column_histogram(df, "v", 0.0, 100.0, 4).collect()}
    assert len(h) == 4                       # empty buckets still appear
    assert h[0]["n_rows"] == 2               # 0.0, 24.9
    assert h[1]["n_rows"] == 1               # 25.0 lands in its own bucket
    assert h[3]["n_rows"] == 2               # 99.9 + hi-edge 100.0 clamped in
    assert h[2]["n_rows"] == 0
    assert h[1]["bucket_lo"] == 25.0 and h[1]["bucket_hi"] == 50.0
    # -5 (below lo), 120 (above hi), NULL all excluded
    assert sum(r["n_rows"] for r in h.values()) == 5

    tv = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1 + [(None,)],
        "x string",
    )
    rows = stats.top_values(tv, "x", 2).collect()
    by_val = {r["value"]: r for r in rows}
    assert by_val["a"]["n_rows"] == 5 and not by_val["a"]["is_other"]
    assert by_val["b"]["n_rows"] == 3        # tie with c broken by value asc
    assert "c" not in by_val
    assert by_val["OTHER"]["n_rows"] == 4 and by_val["OTHER"]["is_other"]
    # k >= cardinality: no OTHER row
    rows_all = stats.top_values(tv, "x", 10).collect()
    assert all(not r["is_other"] for r in rows_all) and len(rows_all) == 4


def test_minhash_campaign_rejects_foreign_corpus(spark, tmp_path):
    """An index built from corpus A must refuse a pairs probe with corpus
    B (r4 review: pairs come entirely from the persisted tables, so the
    df argument was silently ignored); appending via
    append_to_minhash_index keeps the fingerprint current."""
    import pytest

    from jsons_to_schema_spark.operators import dedup

    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta zeta")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(7, "totally different words here now"), (8, "another unrelated doc body")],
        "doc_id long, text string",
    )
    idx = tmp_path / "idx"
    dedup.minhash_lsh_pairs(a, "text", "doc_id", min_jaccard=0.5, index_dir=idx)
    # same corpus: fine
    dedup.minhash_lsh_pairs(a, "text", "doc_id", min_jaccard=0.5, index_dir=idx)
    with pytest.raises(ValueError, match="DIFFERENT corpus"):
        dedup.minhash_lsh_pairs(b, "text", "doc_id", min_jaccard=0.5, index_dir=idx)
    # appending the batch updates the fingerprint, so corpus A+B passes
    dedup.append_to_minhash_index(b, idx)
    combined = a.unionByName(b)
    dedup.minhash_lsh_pairs(combined, "text", "doc_id", min_jaccard=0.5, index_dir=idx)


def test_contamination_share_graded(spark):
    """share = distinct overlapping 5-grams / distinct doc 5-grams; short
    docs are ungradeable (NULL, not 0.0); flagged at the threshold."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # 5 grams, 2 hits
            (2, "completely different words in this training document here"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            ("the quick brown fox jumps",),
            ("brown fox jumps over the",),
            ("brown fox jumps over the",),  # duplicate must not double-count
        ],
        "ngram string",
    )
    out = {
        r.id: r
        for r in decontam.contamination_share(
            docs, eval_df, "text", "doc_id", n=5, threshold=0.3
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert (r1.n_ngrams, r1.n_contaminated) == (5, 2)
    assert r1.share == 0.4 and r1.flagged is True
    r2 = out[2]
    assert (r2.n_ngrams, r2.n_contaminated, r2.share, r2.flagged) == (
        4, 0, 0.0, False)
    r3 = out[3]
    assert (r3.n_ngrams, r3.n_contaminated) == (0, 0)
    assert r3.share is None and r3.flagged is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold"):
        decontam.contamination_share(docs, eval_df, "text", "doc_id", threshold=0.0)


def test_contamination_share_agrees_with_hits(spark):
    """Every doc with a positive share is exactly the contamination_hits
    id set, with matching distinct-overlap counts."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common phrase core tail{i} extra words here now") for i in range(30)],
        "doc_id long, text string",
    )
    eval_df = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 5 == 0), "text", n=5
    )
    share = {
        r.id: r.n_contaminated
        for r in decontam.contamination_share(
            docs, eval_df, "text", "doc_id", n=5
        ).collect()
        if r.n_contaminated > 0
    }
    hits = {
        r.id: r.n_hits
        for r in decontam.contamination_hits(
            docs, eval_df, "text", "doc_id", n=5
        ).collect()
    }
    assert share == hits and hits  # non-empty by construction
