"""Unit tests for the round-4 seventh-continuation operators (wave 32+):
TF-IDF keyword extraction."""

import math

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.text import tfidf_top_terms


# --------------------------------------------------------------- tf-idf ----


def _docs(spark, parts=1):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
        (4, ""),  # token-less: counted in N, absent from output
    ]
    return spark.createDataFrame(rows, "id long, text string").repartition(parts)


def _expected(k=2, min_df=1):
    corpus = {
        1: ["apple", "apple", "banana"],
        2: ["banana", "cherry"],
        3: ["apple", "cherry", "cherry", "date"],
        4: [],
    }
    n = len(corpus)
    dfreq = {}
    for toks in corpus.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = []
    for d, toks in corpus.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = []
        for t, c in tf.items():
            if dfreq[t] < min_df:
                continue
            idf = round(math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0, 6)
            scored.append((t, c, round(c * idf, 6)))
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rank, (t, c, s) in enumerate(scored[:k], start=1):
            out.append((d, t, c, s, rank))
    return sorted(out)


def test_tfidf_hand_computed(spark):
    got = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark), "text", "id", k=2).collect()
    )
    assert got == _expected(k=2)


def test_tfidf_min_df_drops_rare_terms(spark):
    got = tfidf_top_terms(_docs(spark), "text", "id", k=4, min_df=2)
    terms = {r["term"] for r in got.collect()}
    assert "date" not in terms  # df=1 < 2
    assert {"apple", "banana", "cherry"} == terms
    assert sorted(tuple(r) for r in got.collect()) == _expected(k=4, min_df=2)


def test_tfidf_tie_breaks_on_term_asc(spark):
    # doc 2: banana and cherry both tf=1, both df=2 -> equal score;
    # rank 1 must be the lexicographically smaller term.
    rows = {
        (r["id"], r["rank"]): r["term"]
        for r in tfidf_top_terms(_docs(spark), "text", "id", k=2).collect()
        if r["id"] == 2
    }
    assert rows[(2, 1)] == "banana" and rows[(2, 2)] == "cherry"


def test_tfidf_partition_invariance(spark):
    a = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark, 1), "text", "id", k=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark, 9), "text", "id", k=3).collect()
    )
    assert a == b


def test_tfidf_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        tfidf_top_terms(_docs(spark), "text", "id", k=0)


# ----------------------------------------------------------------- dsir ----

import hashlib

from jsons_to_schema_spark.operators.text import dsir_select, importance_weights


def _bucket(gram, hexlen=3):
    return hashlib.md5(gram.encode()).hexdigest()[:hexlen]


def _grams(text):
    toks = [t for t in text.split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _dsir_expected(raw, target, hexlen=3, alpha=1.0):
    B = 16**hexlen
    rawc, tgtc = {}, {}
    for _, t in raw:
        for g in _grams(t):
            b = _bucket(g, hexlen)
            rawc[b] = rawc.get(b, 0) + 1
    for _, t in target:
        for g in _grams(t):
            b = _bucket(g, hexlen)
            tgtc[b] = tgtc.get(b, 0) + 1
    tr, tt = sum(rawc.values()), sum(tgtc.values())
    lrm = {
        b: int(
            round(
                1e6
                * (
                    math.log((tgtc.get(b, 0) + alpha) / (tt + alpha * B))
                    - math.log((cr + alpha) / (tr + alpha * B))
                )
            )
        )
        for b, cr in rawc.items()
    }
    out = {}
    for i, t in raw:
        out[i] = sum(lrm[_bucket(g, hexlen)] for g in _grams(t))
    return out


def _dsir_rows():
    return [
        (1, "alpha beta alpha"),
        (2, "gamma delta"),
        (3, "alpha beta"),
        (4, ""),  # no grams: weight exactly 0
        (5, "epsilon zeta eta"),
    ]


def test_dsir_weights_hand_computed(spark):
    rows = _dsir_rows()
    raw = spark.createDataFrame(rows, "id long, text string")
    target = raw.filter(F.col("id").isin(1, 3))  # alpha/beta-heavy slice
    got = {
        r["id"]: r["lr_micro"]
        for r in importance_weights(raw, target, "text", "id").collect()
    }
    exp = _dsir_expected(rows, [rows[0], rows[2]])
    exp[4] = 0
    assert got == exp
    # target-like docs must outscore off-target docs
    assert got[1] > got[2] and got[3] > got[2]


def test_dsir_select_threshold_and_ties(spark):
    rows = _dsir_rows()
    raw = spark.createDataFrame(rows, "id long, text string")
    target = raw.filter(F.col("id").isin(1, 3))
    out = dsir_select(raw, target, "text", "id", fraction=0.4).collect()
    sel = {r["id"] for r in out if r["selected"]}
    exp = _dsir_expected(rows, [rows[0], rows[2]])
    exp[4] = 0
    order = sorted(exp.values(), reverse=True)
    thr_expected = {i for i, v in exp.items() if v >= order[1]}  # top 2 of 5
    assert sel == thr_expected
    lw = {r["id"]: r["log_weight"] for r in out}
    assert lw[1] == round(exp[1] / 1e6, 6)


def test_dsir_partition_invariance(spark):
    rows = _dsir_rows()
    outs = []
    for parts in (1, 7):
        raw = spark.createDataFrame(rows, "id long, text string").repartition(parts)
        target = raw.filter(F.col("id").isin(1, 3))
        outs.append(
            sorted(tuple(r) for r in dsir_select(raw, target, "text", "id").collect())
        )
    assert outs[0] == outs[1]


def test_dsir_rejects_bad_fraction(spark):
    raw = spark.createDataFrame(_dsir_rows(), "id long, text string")
    with pytest.raises(ValueError):
        dsir_select(raw, raw, "text", "id", fraction=0.0)


# -------------------------------------------------------- pseudonymize ----

from jsons_to_schema_spark.operators.stats import pseudonym_key, pseudonymize


def _pk_rows(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k long, v string"
    )


def test_pseudonym_referential_consistency(spark):
    # same (secret, domain, value) -> same surrogate across two frames
    a = pseudonymize(_pk_rows(spark), {"k": "key"}, secret="s")
    b = pseudonymize(
        spark.createDataFrame([(1,), (2,)], "k long"), {"k": "key"}, secret="s"
    )
    sa = {r["v"]: r["k"] for r in a.collect()}
    sb = sorted(r["k"] for r in b.collect())
    assert sorted([sa["a"], sa["b"]]) == sb
    assert sa["c"] is None  # NULL stays NULL


def test_pseudonym_hand_computed_sha256(spark):
    import hashlib

    got = {r["v"]: r["k"] for r in
           pseudonymize(_pk_rows(spark), {"k": "key"}, secret="s").collect()}
    exp = hashlib.sha256("s\x1fkey\x1f1".encode()).hexdigest()[:32]
    assert got["a"] == exp


def test_pseudonym_domain_and_secret_separate_namespaces(spark):
    base = pseudonymize(_pk_rows(spark), {"k": "key"}, secret="s")
    other_dom = pseudonymize(_pk_rows(spark), {"k": "key2"}, secret="s")
    other_sec = pseudonymize(_pk_rows(spark), {"k": "key"}, secret="t")
    v = lambda df: {r["v"]: r["k"] for r in df.collect()}  # noqa: E731
    assert v(base)["a"] != v(other_dom)["a"]
    assert v(base)["a"] != v(other_sec)["a"]


def test_pseudonym_injective_on_range(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    out = pseudonymize(df, ["k"], secret="s", length=16)
    assert out.select("k").distinct().count() == 2000


def test_pseudonym_rejects_bad_args(spark):
    df = _pk_rows(spark)
    with pytest.raises(ValueError):
        pseudonymize(df, ["nope"], secret="s")
    with pytest.raises(ValueError):
        pseudonymize(df, ["k"], secret="")
    with pytest.raises(ValueError):
        pseudonymize(df, ["k"], secret="s", length=4)


# --------------------------------------------------------------- zorder ----

from jsons_to_schema_spark.sources.layout import (
    file_stat_ranges,
    fit_zorder_bounds,
    write_zordered,
    zorder_bucket_report,
    zorder_key_expr,
)


def _morton_py(vals, bounds, bits=16):
    scaled = []
    for v, (lo, hi) in zip(vals, bounds):
        scaled.append(0 if hi == lo else ((v - lo) * ((1 << bits) - 1)) // (hi - lo))
    out = 0
    for i, s in enumerate(scaled):
        for b in range(bits):
            out |= ((s >> b) & 1) << (b * len(vals) + i)
    return out


def _grid(spark, n=32, parts=1):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long").repartition(parts)


def test_zorder_key_hand_computed(spark):
    df = _grid(spark, 8)
    bounds = fit_zorder_bounds(df, ["x", "y"])
    assert bounds == {"x": (0, 7), "y": (0, 7)}
    got = {
        (r["x"], r["y"]): r["zk"]
        for r in df.selectExpr(
            "x", "y", zorder_key_expr(["x", "y"], bounds) + " AS zk"
        ).collect()
    }
    for x, y in [(0, 0), (1, 0), (0, 1), (7, 7), (3, 5)]:
        assert got[(x, y)] == _morton_py((x, y), [(0, 7), (0, 7)])


def test_zorder_null_dim_groups_separately(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, None), (None, 3)], "x long, y long"
    )
    rep = zorder_bucket_report(df, ["x", "y"], bits=8, bucket_bits=2).collect()
    by_bucket = {r["bucket"]: r["n_rows"] for r in rep}
    assert by_bucket.get(None) == 2


def test_zorder_buckets_bound_both_dims(spark):
    # on a 32x32 uniform grid, every 4-bit prefix bucket must span at most
    # ~1/4 of EACH dimension (the whole point vs a 1-D sort)
    rep = zorder_bucket_report(_grid(spark, 32), ["x", "y"], bucket_bits=4).collect()
    assert len(rep) == 16
    for r in rep:
        assert r["n_rows"] == 64  # equal-measure curve segments
        assert r["max_x"] - r["min_x"] <= 8
        assert r["max_y"] - r["min_y"] <= 8
        assert r["span_fraction"] <= 0.26


def test_zorder_partition_invariance(spark):
    a = sorted(
        tuple(r)
        for r in zorder_bucket_report(_grid(spark, 16, 1), ["x", "y"]).collect()
    )
    b = sorted(
        tuple(r)
        for r in zorder_bucket_report(_grid(spark, 16, 9), ["x", "y"]).collect()
    )
    assert a == b


def test_zorder_write_prunes_both_columns(spark, tmp_path):
    out = str(tmp_path / "z")
    write_zordered(_grid(spark, 32), out, ["x", "y"], n_files=8)
    # every file's footer must bound BOTH x and y well below the full span
    for col in ("x", "y"):
        spans = [hi - lo for lo, hi in file_stat_ranges(out, col)]
        assert len(spans) >= 4
        assert sum(spans) / len(spans) <= 20  # vs 31 for a random layout


def test_zorder_rejects_bad_args(spark):
    df = _grid(spark, 4)
    with pytest.raises(ValueError):
        zorder_key_expr(["x"], {"x": (0, 3)})
    with pytest.raises(ValueError):
        zorder_key_expr(["x", "y"], {"x": (0, 3), "y": (0, 3)}, bits=32)
    with pytest.raises(ValueError):
        fit_zorder_bounds(
            spark.createDataFrame([(None,)], "x long").selectExpr("x", "x AS y"),
            ["x", "y"],
        )


# ------------------------------------------------------------- pagerank ----

from jsons_to_schema_spark.operators.graph import pagerank


def _pagerank_py(edges, iterations=8, damping_pct=85):
    edges = sorted(set((s, d) for s, d in edges if s is not None and d is not None))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    rank = {v: 1_000_000 for v in nodes}
    teleport = (100 - damping_pct) * 10_000
    for _ in range(iterations):
        dm = sum(rank[v] for v in nodes if v not in outdeg) // n
        inb = {v: 0 for v in nodes}
        for s, d in edges:
            inb[d] += rank[s] // outdeg[s]
        rank = {
            v: teleport + (damping_pct * (inb[v] + dm)) // 100 for v in nodes
        }
    return rank


def _pr_edges():
    # a->b, a->c, b->c, c->a plus dangling sink d (c->d, d has no out-edges)
    return [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]


def test_pagerank_matches_reference_recurrence(spark):
    e = spark.createDataFrame(_pr_edges(), "src string, dst string")
    got = {r["node"]: r["rank_micro"] for r in pagerank(e, iterations=5).collect()}
    assert got == _pagerank_py(_pr_edges(), iterations=5)
    # c has two strong in-links; it must outrank the dangling sink
    assert got["c"] > got["d"]


def test_pagerank_ring_is_uniform(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    e = spark.createDataFrame(ring, "src long, dst long")
    ranks = {r["node"]: r["rank_micro"] for r in pagerank(e, iterations=4).collect()}
    assert len(set(ranks.values())) == 1  # symmetry preserved exactly


def test_pagerank_dedupes_multi_edges(spark):
    base = spark.createDataFrame(_pr_edges(), "src string, dst string")
    doubled = base.union(base)
    a = sorted(tuple(r) for r in pagerank(base, iterations=3).collect())
    b = sorted(tuple(r) for r in pagerank(doubled, iterations=3).collect())
    assert a == b


def test_pagerank_partition_invariance(spark):
    outs = []
    for parts in (1, 7):
        e = spark.createDataFrame(
            _pr_edges(), "src string, dst string"
        ).repartition(parts)
        outs.append(sorted(tuple(r) for r in pagerank(e, iterations=4).collect()))
    assert outs[0] == outs[1]


def test_pagerank_rejects_bad_args(spark):
    e = spark.createDataFrame(_pr_edges(), "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank(e.filter("src IS NULL"))


# ------------------------------------------------------------- rrf_fuse ----

from jsons_to_schema_spark.operators.similarity import rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id string, rank long"
    )


def test_rrf_hand_computed(spark):
    a = _ranking(spark, [(1, "x", 1), (1, "y", 2), (1, "z", 3)])
    b = _ranking(spark, [(1, "y", 1), (1, "w", 2)])
    got = {
        r["neighbor_id"]: (r["score_micro"], r["n_lists"], r["rank"])
        for r in rrf_fuse([a, b], k=4, k0=60).collect()
    }
    t = lambda r: 1_000_000_000 // (60 + r)  # noqa: E731
    exp_scores = {
        "x": t(1), "y": t(2) + t(1), "z": t(3), "w": t(2),
    }
    order = sorted(exp_scores, key=lambda i: (-exp_scores[i], i))
    for item, (score, n, rank) in got.items():
        assert score == exp_scores[item]
        assert rank == order.index(item) + 1
    assert got["y"][1] == 2  # retrieved by both lists
    assert got["y"][2] == 1  # consensus item wins


def test_rrf_single_list_preserves_order(spark):
    a = _ranking(spark, [(1, "x", 1), (1, "y", 2), (1, "z", 3)])
    got = sorted(
        (r["rank"], r["neighbor_id"]) for r in rrf_fuse([a], k=3).collect()
    )
    assert got == [(1, "x"), (2, "y"), (3, "z")]


def test_rrf_tie_breaks_on_item_asc(spark):
    a = _ranking(spark, [(1, "b", 1), (1, "a", 2)])
    b = _ranking(spark, [(1, "a", 1), (1, "b", 2)])
    got = {r["neighbor_id"]: r["rank"] for r in rrf_fuse([a, b], k=2).collect()}
    assert got == {"a": 1, "b": 2}  # equal scores, lexicographic wins


def test_rrf_partition_invariance(spark):
    rows_a = [(q, f"i{j}", j + 1) for q in (1, 2) for j in range(15)]
    rows_b = [(q, f"i{j}", 15 - j) for q in (1, 2) for j in range(15)]
    outs = []
    for parts in (1, 8):
        a = _ranking(spark, rows_a).repartition(parts)
        b = _ranking(spark, rows_b).repartition(parts)
        outs.append(sorted(tuple(r) for r in rrf_fuse([a, b], k=5).collect()))
    assert outs[0] == outs[1]


def test_rrf_rejects_bad_args(spark):
    a = _ranking(spark, [(1, "x", 1)])
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([a], k0=0)


# ----------------------------------------------------- kmv joinability ----

from jsons_to_schema_spark.operators.stats import (
    joinability_report,
    kmv_column_sketches,
)


def _kmv_py(values, k=128):
    hs = sorted({hashlib.md5(str(v).encode()).hexdigest() for v in values
                 if v is not None})
    return hs[:k]


def test_kmv_sketch_matches_python_bottom_k(spark):
    vals = list(range(500)) + [None, 3, 3]
    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(7)
    got = sorted(
        r["h"] for r in kmv_column_sketches(df, ["x"], k=64).collect()
    )
    assert got == _kmv_py(range(500), k=64)


def test_kmv_containment_exact_for_subset(spark):
    a = spark.createDataFrame([(v,) for v in range(200)], "ka long")
    b = spark.createDataFrame([(v,) for v in range(400)], "kb long")
    sk = kmv_column_sketches(a, ["ka"], k=64).unionAll(
        kmv_column_sketches(b, ["kb"], k=64)
    )
    row = joinability_report(sk, k=64).collect()[0]
    assert row["est_contain_a_in_b" if row["col_a"] == "ka" else "est_contain_b_in_a"] == 1.0
    assert 0.3 <= row["est_jaccard"] <= 0.7  # true jaccard 0.5


def test_kmv_disjoint_sets_report_zero(spark):
    a = spark.createDataFrame([(v,) for v in range(100)], "ka long")
    b = spark.createDataFrame([(v,) for v in range(1000, 1100)], "kb long")
    sk = kmv_column_sketches(a, ["ka"], k=32).unionAll(
        kmv_column_sketches(b, ["kb"], k=32)
    )
    row = joinability_report(sk).collect()[0]
    assert row["n_common"] == 0
    assert row["est_jaccard"] == 0.0
    assert row["est_contain_a_in_b"] == 0.0 and row["est_contain_b_in_a"] == 0.0


def test_kmv_partition_invariance(spark):
    outs = []
    for parts in (1, 9):
        a = spark.createDataFrame(
            [(v, v * 2) for v in range(300)], "x long, y long"
        ).repartition(parts)
        sk = kmv_column_sketches(a, ["x", "y"], k=48, table="t")
        outs.append(
            sorted(tuple(r) for r in joinability_report(sk, k=48).collect())
        )
    assert outs[0] == outs[1]


def test_kmv_rejects_bad_args(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        kmv_column_sketches(df, [], k=64)
    with pytest.raises(ValueError):
        kmv_column_sketches(df, ["x"], k=2)


# ----------------------------------------------------------------- bm25 ----

from jsons_to_schema_spark.operators.text import bm25_topk


def _bm25_corpus():
    return [
        (1, "apple banana apple"),
        (2, "banana cherry banana cherry"),
        (3, "apple"),
        (4, ""),
        (5, "cherry date elderberry fig grape"),
    ]


def _bm25_py(corpus, query, k1=1.2, b=0.75):
    docs = {i: [t for t in txt.split(" ") if t] for i, txt in corpus}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for i, toks in docs.items():
        s = 0
        for t in sorted(set(query.split(" ")) & set(toks)):
            tf = toks.count(t)
            idf = round(math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0), 6)
            term = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            s += int(round(1e6 * term))
        if s:
            scores[i] = s
    return scores


def test_bm25_hand_computed(spark):
    corpus = spark.createDataFrame(_bm25_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame([(0, "apple cherry")], "query_id long, qtext string")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(corpus, qs, "text", "doc_id", k=10).collect()
    }
    assert got == _bm25_py(_bm25_corpus(), "apple cherry")
    # rare term (date's doc has cherry too) and tf weighting sanity:
    # doc 3 (pure apple, short) must outscore doc 1 (apple diluted)
    assert got[3] > got[1]


def test_bm25_no_match_docs_absent(spark):
    corpus = spark.createDataFrame(_bm25_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame([(0, "zebra")], "query_id long, qtext string")
    assert bm25_topk(corpus, qs, "text", "doc_id").count() == 0


def test_bm25_rank_is_deterministic_topk(spark):
    corpus = spark.createDataFrame(_bm25_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, "apple banana cherry")], "query_id long, qtext string"
    )
    rows = bm25_topk(corpus, qs, "text", "doc_id", k=2).collect()
    exp = _bm25_py(_bm25_corpus(), "apple banana cherry")
    order = sorted(exp, key=lambda d: (-exp[d], d))[:2]
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == order


def test_bm25_partition_invariance(spark):
    outs = []
    for parts in (1, 8):
        corpus = spark.createDataFrame(
            _bm25_corpus(), "doc_id long, text string"
        ).repartition(parts)
        qs = spark.createDataFrame(
            [(0, "apple cherry"), (1, "banana")], "query_id long, qtext string"
        )
        outs.append(
            sorted(tuple(r) for r in bm25_topk(corpus, qs, "text", "doc_id").collect())
        )
    assert outs[0] == outs[1]


def test_bm25_rejects_bad_args(spark):
    corpus = spark.createDataFrame(_bm25_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame([(0, "x")], "query_id long, qtext string")
    with pytest.raises(ValueError):
        bm25_topk(corpus, qs, "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        bm25_topk(corpus.filter("doc_id < 0"), qs, "text", "doc_id")


# ----------------------------------------------------- incremental cc ----

from jsons_to_schema_spark.operators.dedup import duplicate_clusters
from jsons_to_schema_spark.operators.graph import incremental_components


def _pairs(spark, rows, parts=1):
    return spark.createDataFrame(rows, "id_a long, id_b long").repartition(parts)


def _cc_py(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        root = min(comp)
        for v in comp:
            label[v] = root
    return label


def test_incremental_cc_equals_batch(spark):
    base = [(1, 2), (3, 4), (10, 11), (20, 21)]
    new = [(2, 3), (11, 30), (40, 41)]  # merge, extend, brand-new component
    labels = duplicate_clusters(_pairs(spark, base))
    got = {
        r["id"]: r["cluster"]
        for r in incremental_components(labels, _pairs(spark, new)).collect()
    }
    assert got == _cc_py(base + new)


def test_incremental_cc_chain_of_merges_in_one_batch(spark):
    # the batch itself chains three existing components through a new node
    base = [(1, 2), (10, 11), (20, 21)]
    new = [(2, 99), (99, 10), (99, 20)]
    labels = duplicate_clusters(_pairs(spark, base))
    got = {
        r["id"]: r["cluster"]
        for r in incremental_components(labels, _pairs(spark, new)).collect()
    }
    assert got == _cc_py(base + new)
    assert set(got.values()) == {1}


def test_incremental_cc_no_op_batch_preserves_labels(spark):
    base = [(1, 2), (3, 4)]
    labels = duplicate_clusters(_pairs(spark, base))
    new = [(1, 2), (4, 3)]  # already-known edges, reversed too
    got = {
        r["id"]: r["cluster"]
        for r in incremental_components(labels, _pairs(spark, new)).collect()
    }
    assert got == _cc_py(base)


def test_incremental_cc_partition_invariance(spark):
    base = [(i, i + 100) for i in range(0, 40, 2)]
    new = [(i, i + 1) for i in range(0, 40, 4)]
    outs = []
    for parts in (1, 9):
        labels = duplicate_clusters(_pairs(spark, base, parts))
        outs.append(
            sorted(
                tuple(r)
                for r in incremental_components(
                    labels, _pairs(spark, new, parts)
                ).collect()
            )
        )
    assert outs[0] == outs[1]
    assert dict(outs[0]) == _cc_py(base + new)


def test_incremental_cc_rejects_bad_columns(spark):
    labels = duplicate_clusters(_pairs(spark, [(1, 2)]))
    with pytest.raises(ValueError):
        incremental_components(labels, _pairs(spark, [(1, 2)]), id_a="nope")


# --------------------------------------------------------- strip_markup ----

from jsons_to_schema_spark.operators.text import strip_markup


def test_strip_markup_hand_cases(spark):
    rows = [
        (1, "<p>hello <b>world</b></p>"),
        (2, "<script>var a = 1 < 2;</script>keep"),
        (3, "<style>p {x:1}</style>body<!-- note -->text"),
        (4, "a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
        (5, "plain text untouched"),
        (6, None),
        (7, "&amp;lt; stays half-decoded"),  # amp decoded LAST, exactly once
    ]
    df = spark.createDataFrame(rows, "id long, raw string")
    got = {r["id"]: (r["text"], r["n_tags_removed"]) for r in
           strip_markup(df, "raw", "id").collect()}
    assert got[1] == ("hello world", 4)
    assert got[2][0] == "keep"  # the bare '<' inside script never leaks
    assert got[3][0] == "body text"
    assert got[4] == ('a&b <tag> "q" \'s\' end', 0)
    assert got[5] == ("plain text untouched", 0)
    assert got[6] == (None, None)
    assert got[7][0] == "&lt; stays half-decoded"


def test_strip_markup_counts_and_lengths(spark):
    df = spark.createDataFrame([(1, "<div><p>ab</p></div>")], "id long, raw string")
    r = strip_markup(df, "raw", "id").collect()[0]
    assert r["n_tags_removed"] == 4
    assert r["text"] == "ab" and r["n_chars_clean"] == 2


def test_strip_markup_partition_invariance(spark):
    rows = [(i, f"<p>doc {i} &amp; more</p>") for i in range(40)]
    outs = []
    for parts in (1, 8):
        df = spark.createDataFrame(rows, "id long, raw string").repartition(parts)
        outs.append(sorted(tuple(r) for r in strip_markup(df, "raw", "id").collect()))
    assert outs[0] == outs[1]


# -------------------------------------------------------------- ab_test ----

from jsons_to_schema_spark.operators.stats import ab_test_report


def _welch_py(control, treatment):
    def moments(xs):
        q = [round(x * 1e6) for x in xs]
        n = float(len(q))
        s1, s2 = float(sum(q)), float(sum(v * v for v in q))
        mean = s1 / n / 1e6
        var = (s2 / 1e12 - (s1 / 1e6) * (s1 / 1e6) / n) / (n - 1.0)
        return n, mean, var

    nc, mc, vc = moments(control)
    nt, mt, vt = moments(treatment)
    sec, sett = vc / nc, vt / nt
    t = (mt - mc) / math.sqrt(sec + sett)
    dof = (sec + sett) ** 2 / (sec * sec / (nc - 1) + sett * sett / (nt - 1))
    return round(t, 6), round(dof, 6), abs(t) > 1.959964


def test_ab_test_hand_computed(spark):
    control = [10.0, 11.0, 9.5, 10.5, 10.2, 9.8]
    treatment = [12.0, 12.5, 11.8, 12.2, 13.0, 11.5]
    rows = [("control", v) for v in control] + [("treatment", v) for v in treatment]
    df = spark.createDataFrame(rows + [("treatment", None)], "arm string, m double")
    r = ab_test_report(df, "arm", "m", "control", "treatment").collect()[0]
    t, dof, sig = _welch_py(control, treatment)
    assert (r["n_control"], r["n_treatment"]) == (6, 6)  # NULL excluded
    assert r["t_stat"] == t and r["dof"] == dof and r["significant"] == sig
    assert sig is True
    assert r["abs_lift"] == round(
        sum(treatment) / 6 - sum(control) / 6, 6
    ) or abs(r["abs_lift"] - (sum(treatment) / 6 - sum(control) / 6)) < 2e-6


def test_ab_test_no_effect_not_significant(spark):
    vals = [float(v % 7) for v in range(200)]
    rows = [("control" if i % 2 == 0 else "treatment", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "arm string, m double")
    r = ab_test_report(df, "arm", "m", "control", "treatment").collect()[0]
    assert r["significant"] is False


def test_ab_test_zero_control_mean_rel_lift_null(spark):
    rows = [("control", 1.0), ("control", -1.0), ("treatment", 3.0),
            ("treatment", 5.0)]
    df = spark.createDataFrame(rows, "arm string, m double")
    r = ab_test_report(df, "arm", "m", "control", "treatment").collect()[0]
    assert r["mean_control"] == 0.0 and r["rel_lift"] is None


def test_ab_test_partition_invariance(spark):
    rows = [("control" if i % 2 else "treatment", float(i % 13) + (i % 2) * 0.7)
            for i in range(400)]
    outs = []
    for parts in (1, 9):
        df = spark.createDataFrame(rows, "arm string, m double").repartition(parts)
        outs.append(
            tuple(ab_test_report(df, "arm", "m", "control", "treatment").collect()[0])
        )
    assert outs[0] == outs[1]


# ---------------------------------------------------- transition profile ----

from jsons_to_schema_spark.operators.temporal import (
    anomalous_transitions,
    transition_profile,
)


def _seq_rows():
    # user 1: a->b->a->b->c   user 2: a->b->a->b   user 3: single event
    return (
        [(1, i, s) for i, s in enumerate(["a", "b", "a", "b", "c"])]
        + [(2, i, s) for i, s in enumerate(["a", "b", "a", "b"])]
        + [(3, 0, "z")]
    )


def test_transition_profile_hand_computed(spark):
    df = spark.createDataFrame(_seq_rows(), "k long, o long, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_profile(df, "k", "o", "s").collect()
    }
    # from a: 4x a->b;  from b: 2x b->a, 1x b->c;  z contributes nothing
    assert got[("a", "b")] == (4, 1.0)
    assert got[("b", "a")] == (2, round(2 / 3, 6))
    assert got[("b", "c")] == (1, round(1 / 3, 6))
    assert len(got) == 3


def test_transition_profile_orders_within_key_only(spark):
    # same order value, different keys: no cross-key transitions
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (2, 0, "x"), (2, 1, "y")],
        "k long, o long, s string",
    )
    got = {(r["from_state"], r["to_state"]) for r in
           transition_profile(df, "k", "o", "s").collect()}
    assert got == {("a", "b"), ("x", "y")}


def test_anomalous_transitions_floor_and_threshold(spark):
    rows = []
    # 100 users doing a->b (common), 1 user doing a->q (rare), and a
    # from-state 'tiny' with too few observations to ever be rare
    for u in range(100):
        rows += [(u, 0, "a"), (u, 1, "b")]
    rows += [(900, 0, "a"), (900, 1, "q")]
    rows += [(901, 0, "tiny"), (901, 1, "weird")]
    df = spark.createDataFrame(rows, "k long, o long, s string")
    out = anomalous_transitions(df, "k", "o", "s", max_p=0.02, min_from_total=50)
    got = [(r["key"], r["from_state"], r["to_state"], r["p"]) for r in out.collect()]
    assert got == [(900, "a", "q", round(1 / 101, 6))]


def test_transition_partition_invariance(spark):
    outs = []
    for parts in (1, 9):
        df = spark.createDataFrame(
            _seq_rows(), "k long, o long, s string"
        ).repartition(parts)
        outs.append(
            sorted(tuple(r) for r in transition_profile(df, "k", "o", "s").collect())
        )
    assert outs[0] == outs[1]


def test_anomalous_transitions_rejects_bad_p(spark):
    df = spark.createDataFrame(_seq_rows(), "k long, o long, s string")
    with pytest.raises(ValueError):
        anomalous_transitions(df, "k", "o", "s", max_p=0.0)


# ------------------------------------------------------ embedding drift ----

from jsons_to_schema_spark.operators.drift import embedding_drift


def _vec_df(spark, vecs, parts=1):
    return spark.createDataFrame(
        [(list(map(float, v)),) for v in vecs], "embedding array<double>"
    ).repartition(parts)


def test_embedding_drift_identical_snapshots(spark):
    vecs = [[1.0, 0.0, 2.0], [0.5, 1.5, -1.0], [2.0, 2.0, 2.0]]
    r = embedding_drift(_vec_df(spark, vecs), _vec_df(spark, vecs)).collect()[0]
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_shift_l2"] == 0.0
    assert (r["n_base"], r["n_current"], r["dim"]) == (3, 3, 3)


def test_embedding_drift_hand_computed_shift(spark):
    base = [[1.0, 0.0], [3.0, 0.0]]      # centroid (2, 0)
    cur = [[0.0, 1.0], [0.0, 3.0]]       # centroid (0, 2)
    r = embedding_drift(_vec_df(spark, base), _vec_df(spark, cur)).collect()[0]
    assert r["centroid_cosine"] == 0.0   # orthogonal centroids
    assert r["centroid_shift_l2"] == round(math.sqrt(8.0), 6)


def test_embedding_drift_scale_invariant_cosine(spark):
    base = [[1.0, 2.0, 3.0], [2.0, 4.0, 6.0]]
    cur = [[0.5, 1.0, 1.5]]              # same direction, different scale
    r = embedding_drift(_vec_df(spark, base), _vec_df(spark, cur)).collect()[0]
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_shift_l2"] > 0.0


def test_embedding_drift_validates_inputs(spark):
    ok = _vec_df(spark, [[1.0, 2.0]])
    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0],)], "embedding array<double>"
    )
    with pytest.raises(ValueError):
        embedding_drift(ok, ragged)
    with pytest.raises(ValueError):
        embedding_drift(ok, _vec_df(spark, [[1.0, 2.0, 3.0]]))
    with pytest.raises(ValueError):
        embedding_drift(ok, ok.filter("embedding IS NULL"))


def test_embedding_drift_partition_invariance(spark):
    vecs_a = [[float(i % 5), float(i % 3), 1.0] for i in range(60)]
    vecs_b = [[float(i % 7), float(i % 2), 0.5] for i in range(40)]
    outs = []
    for parts in (1, 9):
        outs.append(
            tuple(
                embedding_drift(
                    _vec_df(spark, vecs_a, parts), _vec_df(spark, vecs_b, parts)
                ).collect()[0]
            )
        )
    assert outs[0] == outs[1]


# ------------------------------------------------------ feature encoders ----

from jsons_to_schema_spark.operators.stats import (
    apply_encoding,
    fit_frequency_encoding,
    fit_target_encoding,
    target_prior,
    winsorize,
)


def _enc_rows():
    return [
        ("a", 10.0), ("a", 12.0), ("a", 14.0),
        ("b", 100.0),
        (None, 50.0), (None, 52.0),
        ("c", None),  # NULL target: no evidence for target encoding
    ]


def test_frequency_encoding_counts_null_category(spark):
    df = spark.createDataFrame(_enc_rows(), "cat string, y double")
    got = {r["value"]: (r["n"], r["freq"]) for r in
           fit_frequency_encoding(df, "cat").collect()}
    assert got["a"] == (3, round(3 / 7, 6))
    assert got[None] == (2, round(2 / 7, 6))
    assert got["c"] == (1, round(1 / 7, 6))


def test_target_encoding_hand_computed(spark):
    df = spark.createDataFrame(_enc_rows(), "cat string, y double")
    fit = {r["value"]: r["enc"] for r in
           fit_target_encoding(df, "cat", "y", smoothing=2.0).collect()}
    vals = {"a": [10.0, 12.0, 14.0], "b": [100.0], None: [50.0, 52.0]}
    s = sum(sum(v) for v in vals.values())
    n = sum(len(v) for v in vals.values())
    prior = s / n
    for cat, xs in vals.items():
        exp = (sum(xs) + 2.0 * prior) / (len(xs) + 2.0)
        assert abs(fit[cat] - exp) < 2e-6, cat
    assert "c" not in fit  # its only target was NULL
    # smoothing pulls the singleton hardest toward the prior
    assert abs(fit["b"] - prior) < abs(100.0 - prior)
    assert abs(target_prior(df, "y") - round(prior, 6)) < 2e-6


def test_apply_encoding_unseen_and_null_safe(spark):
    df = spark.createDataFrame(_enc_rows(), "cat string, y double")
    fit = fit_target_encoding(df, "cat", "y", smoothing=2.0)
    serve = spark.createDataFrame(
        [("a",), ("zz",), (None,)], "cat string"
    )
    got = {r["cat"]: r["enc_out"] for r in
           apply_encoding(serve, "cat", fit, "enc_out", default=7.5).collect()}
    fitted = {r["value"]: r["enc"] for r in fit.collect()}
    assert got["a"] == fitted["a"]
    assert got[None] == fitted[None]  # NULL category hits its fitted row
    assert got["zz"] == 7.5           # unseen falls back loudly
    no_default = apply_encoding(serve, "cat", fit, "enc_out").collect()
    assert {r["cat"]: r["enc_out"] for r in no_default}["zz"] is None


def test_winsorize_hand_computed(spark):
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    out = winsorize(df, "v", 0.10, 0.90).collect()
    lo = round(1 + 0.10 * 99, 6)   # percentile interpolation on 1..100
    hi = round(1 + 0.90 * 99, 6)
    for r in out:
        assert r["v_winsorized"] == min(max(r["v"], lo), hi)
        assert r["clipped"] == (r["v"] < lo or r["v"] > hi)
    assert sum(1 for r in out if r["clipped"]) == 20


def test_winsorize_null_passthrough_and_validation(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "i long, v double")
    got = {r["i"]: (r["v_winsorized"], r["clipped"]) for r in
           winsorize(df, "v", 0.0, 1.0).collect()}
    assert got[1] == (None, None)
    with pytest.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)
    with pytest.raises(ValueError):
        winsorize(df.filter("v IS NULL"), "v")


def test_encoders_partition_invariance(spark):
    rows = [(f"c{i % 11}", float(i % 17)) for i in range(500)]
    outs = []
    for parts in (1, 9):
        df = spark.createDataFrame(rows, "cat string, y double").repartition(parts)
        fit = fit_target_encoding(df, "cat", "y", smoothing=5.0)
        outs.append(sorted(tuple(r) for r in fit.collect()))
    assert outs[0] == outs[1]


# --------------------------------------------------- compression ratio ----

from jsons_to_schema_spark.operators.text import compression_ratio


def test_compression_ratio_orders_junk_prose_noise(spark):
    import hashlib as _h

    repeated = "spam ham " * 200
    prose = (
        "the quick brown fox jumps over a lazy dog while seventeen "
        "sparrows argue about parquet footers and shuffle partitions "
    ) * 12
    noise = "".join(
        _h.sha256(str(i).encode()).hexdigest() for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, repeated), (2, prose), (3, noise), (4, ""), (5, None)],
        "id long, text string",
    )
    got = {r["id"]: r["compression_ratio"] for r in
           compression_ratio(df, "text", "id").collect()}
    assert got[1] < got[2] < got[3]
    assert got[1] < 0.05          # pure repetition collapses
    assert got[3] > 0.5           # hex noise barely compresses
    assert got[4] is None and got[5] is None


def test_compression_ratio_exact_zlib(spark):
    import zlib

    s = "abcabcabc some text worth compressing " * 5
    df = spark.createDataFrame([(1, s)], "id long, text string")
    r = compression_ratio(df, "text", "id").collect()[0]
    raw = s.encode()
    assert r["compression_ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert r["n_chars"] == len(s)


def test_compression_ratio_partition_invariance(spark):
    rows = [(i, f"doc {i} " * (i % 9 + 1)) for i in range(60)]
    outs = []
    for parts in (1, 8):
        df = spark.createDataFrame(rows, "id long, text string").repartition(parts)
        outs.append(
            sorted(tuple(r) for r in compression_ratio(df, "text", "id").collect())
        )
    assert outs[0] == outs[1]


def test_compression_ratio_rejects_bad_level(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        compression_ratio(df, "text", "id", level=0)


# ------------------------------------------------------------ csv sniff ----

from jsons_to_schema_spark.sources.csvx import (
    read_csv_inferred,
    sniff_csv_dialect,
)


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return p


def test_sniff_detects_delimiters(tmp_path):
    cases = {
        ",": "a,b,c\n1,2,3\n4,5,6\n",
        ";": "a;b;c\n1;2;3\n4;5;6\n",
        "\t": "a\tb\tc\n1\t2\t3\n",
        "|": "a|b|c\n1|2|3\n",
    }
    for delim, content in cases.items():
        d = sniff_csv_dialect(_write(tmp_path, f"x{ord(delim)}.csv", content))
        assert d["delimiter"] == delim and d["n_fields"] == 3
        assert d["header"] is True


def test_sniff_quote_aware_and_headerless(tmp_path):
    # commas inside quotes are payload; ';' is the consistent delimiter
    p = _write(tmp_path, "q.csv", '1;"x, y";2\n3;"a, b";4\n')
    d = sniff_csv_dialect(p)
    assert d["delimiter"] == ";" and d["n_fields"] == 3
    assert d["header"] is False  # first line is numeric -> data, not header


def test_sniff_single_column_fallback(tmp_path):
    p = _write(tmp_path, "s.csv", "hello\nworld\nagain\n")
    d = sniff_csv_dialect(p)
    assert d["n_fields"] == 1


def test_read_csv_inferred_roundtrip(spark, tmp_path):
    p = _write(
        tmp_path, "t.csv", "id;name;score\n1;alpha;1.5\n2;beta;2.5\n3;gamma;-1.0\n"
    )
    df = read_csv_inferred(spark, p)
    assert df.columns == ["id", "name", "score"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -1.0)]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "string", "double",
    ]


def test_sniff_rejects_empty(tmp_path):
    p = _write(tmp_path, "e.csv", "")
    with pytest.raises(ValueError):
        sniff_csv_dialect(p)


# ------------------------------------------- Kaplan-Meier survival curve ----

from jsons_to_schema_spark.operators.temporal import rfm_report, survival_curve


def _km_expected(subjects):
    """Reference KM replay with the operator's exact rounding discipline:
    per-time round6 log terms, ordered cumulative sum, round6 exp;
    Greenwood terms round12."""
    cells = {}
    for dur, obs in subjects:
        if dur is None or obs is None:
            continue
        e, c = cells.get(dur, (0, 0))
        cells[dur] = (e + 1, c) if obs else (e, c + 1)
    total = sum(e + c for e, c in cells.values())
    out, seen, slog, sg, dead = [], 0, 0.0, 0.0, False
    for t in sorted(cells):
        e, c = cells[t]
        n_risk = total - seen
        seen += e + c
        if e >= n_risk:
            dead = True
        else:
            slog += round(math.log((n_risk - e) / n_risk), 6)
            sg += round(e / (n_risk * (n_risk - e)), 12)
        surv = 0.0 if dead else round(math.exp(slog), 6)
        se = round(surv * math.sqrt(sg), 6) if surv > 0 else None
        out.append((t, n_risk, e, c, surv, se))
    return out


def _subjects():
    # mixed events and censorings, ties at t=2, no event at t=4
    return [(1, True), (2, True), (2, False), (3, True), (4, False)]


def test_survival_hand_computed(spark):
    df = spark.createDataFrame(_subjects(), "dur long, obs boolean")
    got = sorted(tuple(r) for r in survival_curve(df, "dur", "obs").collect())
    assert got == _km_expected(_subjects())
    # sanity on the classic numbers: S(1)=4/5, S(2)=.8*3/4, S(3)=.6*1/2
    by_t = {r[0]: r[4] for r in got}
    assert abs(by_t[1] - 0.8) < 2e-6
    assert abs(by_t[2] - 0.6) < 2e-6
    assert abs(by_t[3] - 0.3) < 2e-6
    assert by_t[4] == by_t[3]  # censoring-only time leaves S unchanged


def test_survival_censored_stay_in_risk_set(spark):
    # the correction naive retention misses: censored at t=2 still count
    # in n_risk at t=2 but do NOT drop survival
    df = spark.createDataFrame(_subjects(), "dur long, obs boolean")
    rows = {r["t"]: r for r in survival_curve(df, "dur", "obs").collect()}
    assert rows[2]["n_risk"] == 4 and rows[2]["n_censored"] == 1
    assert rows[4]["n_event"] == 0 and rows[4]["survival"] > 0


def test_survival_extinction_pins_zero(spark):
    # t=1: n=3 d=1; t=2: n=2 d=2 -> every at-risk subject dies at t=2
    subj = [(1, True), (2, True), (2, True)]
    df = spark.createDataFrame(subj, "dur long, obs boolean")
    rows = {r["t"]: r for r in survival_curve(df, "dur", "obs").collect()}
    assert rows[2]["survival"] == 0.0 and rows[2]["std_err"] is None


def test_survival_nulls_excluded_and_partition_invariance(spark):
    subj = _subjects() + [(None, True), (5, None)]
    a = spark.createDataFrame(subj, "dur long, obs boolean")
    got1 = sorted(tuple(r) for r in survival_curve(a, "dur", "obs").collect())
    got8 = sorted(
        tuple(r)
        for r in survival_curve(a.repartition(8), "dur", "obs").collect()
    )
    assert got1 == got8 == _km_expected(_subjects())


# ---------------------------------------------------------- RFM report ----


def _purchases(spark, parts=1):
    import datetime as dt

    rows = []
    # key A: recent, frequent, big spender; key B: stale, rare, small;
    # key C: middle on all three axes
    base = dt.datetime(2024, 1, 1)
    for d, amt in [(98, 50.0), (99, 70.0), (100, 80.0)]:
        rows.append(("A", base + dt.timedelta(days=d), amt))
    rows.append(("B", base + dt.timedelta(days=10), 1.0))
    for d, amt in [(50, 10.0), (60, 12.0)]:
        rows.append(("C", base + dt.timedelta(days=d), amt))
    return spark.createDataFrame(
        rows, "k string, ts timestamp, amt double"
    ).repartition(parts)


def test_rfm_hand_computed(spark):
    out = {
        r["key"]: r
        for r in rfm_report(_purchases(spark), "k", "ts", "amt", k=2).collect()
    }
    # as-of = A's last purchase (day 100)
    assert out["A"]["recency_days"] == 0 and out["B"]["recency_days"] == 90
    assert out["C"]["recency_days"] == 40
    assert out["A"]["frequency"] == 3 and out["B"]["frequency"] == 1
    assert out["A"]["monetary"] == 200.0 and out["C"]["monetary"] == 22.0
    # k=2 median split: medians r=40, f=2, m=22 — equal-to-edge falls LOW
    assert out["A"]["segment"] == "2-2-2"  # best on all axes
    assert out["B"]["segment"] == "1-1-1"  # worst on all axes
    assert out["C"]["segment"] == "2-1-1"  # at the edge -> low -> r reversed
    for r in out.values():
        assert r["segment"] == f"{r['r_score']}-{r['f_score']}-{r['m_score']}"


def test_rfm_explicit_asof_shifts_recency_only(spark):
    import datetime as dt

    asof = int(dt.datetime(2024, 4, 20, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    base = {
        r["key"]: r
        for r in rfm_report(_purchases(spark), "k", "ts", "amt", k=2).collect()
    }
    shifted = {
        r["key"]: r
        for r in rfm_report(
            _purchases(spark), "k", "ts", "amt", k=2, asof_us=asof
        ).collect()
    }
    for k in base:
        assert shifted[k]["frequency"] == base[k]["frequency"]
        assert shifted[k]["monetary"] == base[k]["monetary"]
        assert shifted[k]["recency_days"] >= base[k]["recency_days"]


def test_rfm_partition_invariance(spark):
    a = sorted(
        tuple(r)
        for r in rfm_report(_purchases(spark, 1), "k", "ts", "amt", k=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in rfm_report(_purchases(spark, 7), "k", "ts", "amt", k=3).collect()
    )
    assert a == b


def test_rfm_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        rfm_report(_purchases(spark), "k", "ts", "amt", k=1)
