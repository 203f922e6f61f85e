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
    _REPO_ROOT,
    _source_fingerprint,
)


@query(
    "embedding_profile_embeddings",
    oracle="""
    WITH p AS (
      SELECT vec_id,
        CASE WHEN vec_id % 83 = 0 THEN NULL
             WHEN vec_id % 89 = 0 THEN embedding[1:32]
             WHEN vec_id % 97 = 0
               THEN list_append(embedding[1:63], CAST('nan' AS FLOAT))
             WHEN vec_id % 79 = 0
               THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
             WHEN vec_id % 73 = 0
               THEN list_append(embedding[1:63], CAST('inf' AS FLOAT))
             ELSE embedding END AS v
      FROM embeddings
    ), e AS (
      SELECT v,
        CASE WHEN v IS NULL THEN NULL
             ELSE len(list_filter(v, x -> isnan(x))) > 0 END AS has_nan,
        CASE WHEN v IS NULL THEN NULL
             ELSE len(list_filter(v, x -> isinf(x))) > 0 END AS has_inf,
        CASE WHEN v IS NULL THEN NULL
             ELSE list_sum(list_transform(v,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) END AS ss
      FROM p
    ), n AS (
      SELECT *,
        CASE WHEN v IS NOT NULL AND NOT has_nan AND NOT has_inf
             THEN round(sqrt(ss), 6) END AS norm
      FROM e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(v) AS BIGINT) AS n_null,
           CAST(min(len(v)) AS INT) AS dim_min,
           CAST(max(len(v)) AS INT) AS dim_max,
           CAST(sum(CASE WHEN v IS NOT NULL AND len(v) <> 64
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
           CAST(sum(CASE WHEN coalesce(has_nan, false)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_nan,
           CAST(sum(CASE WHEN coalesce(has_inf, false)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_inf,
           CAST(sum(CASE WHEN v IS NOT NULL AND NOT has_nan
                          AND NOT has_inf AND ss = 0.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vec,
           min(norm) AS norm_min,
           max(norm) AS norm_max,
           round(avg(norm), 6) AS norm_mean
    FROM n
    """,
)
def embedding_profile_embeddings(spark, sf_dir) -> DataFrame:
    """Vector-column hygiene audit (similarity.embedding_profile): the
    testdata embeddings are clean, so every defect class is PLANTED on
    disjoint id slices — NULL vectors (%83), truncated 32-dim re-embeds
    (%89), a NaN element (%97), zero vectors (%79), an Inf element
    (%73) — and the one-scan profile must count each class exactly while
    the norm stats ignore poisoned vectors (round-6 per-vector norms keep
    the fold order-proof).  The oracle replays the plants and every
    aggregate with DuckDB list lambdas."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    fzero = F.lit(0.0).cast("float")
    planted = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 83 == 0, F.lit(None))
        .when(F.col("vec_id") % 89 == 0, F.slice(v, 1, 32))
        .when(
            F.col("vec_id") % 97 == 0,
            F.concat(
                F.slice(v, 1, 63),
                F.array(F.lit(float("nan")).cast("float")),
            ),
        )
        .when(
            F.col("vec_id") % 79 == 0, F.transform(v, lambda x: fzero)
        )
        .when(
            F.col("vec_id") % 73 == 0,
            F.concat(
                F.slice(v, 1, 63),
                F.array(F.lit(float("inf")).cast("float")),
            ),
        )
        .otherwise(v)
        .alias("embedding"),
    )
    return similarity.embedding_profile(planted, "embedding", expected_dim=64)


# ===========================================================================
# Similarity search (oracled via DuckDB list_cosine_similarity)
# ===========================================================================

@query(
    "similarity_topk_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
                  round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
           FROM q, embeddings e WHERE e.vec_id <> q.query_id
         ),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id) AS rank
           FROM scored
         )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS int) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def similarity_topk_embeddings(spark, sf_dir) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries_df, k=10)


@query("similarity_lsh_topk_embeddings")
def similarity_lsh_topk_embeddings(spark, sf_dir) -> DataFrame:
    """Multi-probe banded LSH top-k (8 bands × 4 bits — shallow bands because
    the corpus is near-random, so exact top-k neighbors sit at cos≈0.4; deeper
    bands suit high-cosine regimes): recall measured vs
    brute force in tests/test_operators.py; deterministic → pinned oracle."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(emb, queries_df, k=10, bits=32, bands=8, dim=64)


@query("similarity_ivf_topk_embeddings")
def similarity_ivf_topk_embeddings(spark, sf_dir) -> DataFrame:
    """IVF with a PERSISTED index: first call trains + writes the
    cell-partitioned index table (build_ivf_index); subsequent calls probe
    it with zero training jobs (ivf_topk_indexed) — recall vs brute force
    asserted in tests/test_operators.py."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"ivf_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_index(emb, idx, n_cells=16, iters=2, seed=42)
    return similarity.ivf_topk_indexed(spark, idx, queries_df, k=10, n_probe=8)


@query("similarity_ivf_q8_topk_embeddings")
def similarity_ivf_q8_topk_embeddings(spark, sf_dir) -> DataFrame:
    """int8-QUANTIZED IVF probe with exact rerank (similarity.
    build_ivf_index_q8 / ivf_topk_indexed_q8): the index stores codes +
    scale (~8x less IO than float cells); approx integer-dot scores gate
    candidacy, the corpus join reranks at full precision — recall ≥0.9 vs
    brute force asserted in tests/test_round3_ops.py; deterministic →
    pinned oracle."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"ivfq8_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_index_q8(emb, idx, n_cells=16, iters=2, seed=42)
    return similarity.ivf_topk_indexed_q8(
        spark, idx, queries_df, emb, k=10, n_probe=8, oversample=4
    )


@query("similarity_ivf_pq_topk_embeddings")
def similarity_ivf_pq_topk_embeddings(spark, sf_dir) -> DataFrame:
    """PRODUCT-QUANTIZED IVF probe (similarity.build_ivf_pq_index /
    ivf_topk_indexed_pq): the index stores m=4 PQ codes per vector — the
    smallest index variant (bits, not floats) — and the probe scores
    candidates via ADC entirely in codegen (zip_with the code array
    against the per-query LUT rows; only integer codes are scanned),
    then reranks exactly against the corpus.  Recall ≥0.85 vs brute
    force asserted in tests/test_round4b_ops.py (0.96 measured at these
    parameters); bit-deterministic training → pinned oracle."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"ivfpq_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_m4_n64_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_pq_index(
            emb, idx, n_cells=16, m=4, n_codes=64, iters=2, pq_iters=6, seed=42
        )
    return similarity.ivf_topk_indexed_pq(
        spark, idx, queries_df, emb, k=10, n_probe=8, oversample=16
    )


@query(
    "decontam_semantic_embeddings",
    oracle="""
    WITH vd AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    ev AS (
      SELECT vec_id AS eid, v AS evec FROM vd WHERE vec_id % 25 = 0
      UNION ALL
      SELECT vec_id + 1000000, list_prepend(v[1] + 0.25, v[2:])
      FROM vd WHERE vec_id % 50 = 0
    ),
    h AS (
      SELECT vd.vec_id, ev.eid,
             round(list_cosine_similarity(vd.v, ev.evec), 6) AS cos
      FROM vd, ev
    ),
    f AS (SELECT * FROM h WHERE cos >= 0.95),
    r AS (
      SELECT vec_id, count(*) AS n_hits, max(cos) AS max_cos_sim
      FROM f GROUP BY 1
    ),
    b AS (
      SELECT vec_id, eid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, eid ASC) AS rk
      FROM f
    )
    SELECT r.vec_id, CAST(r.n_hits AS BIGINT) AS n_hits, r.max_cos_sim,
           b.eid AS nearest_eval_id
    FROM r JOIN b ON r.vec_id = b.vec_id AND b.rk = 1
    """,
)
def decontam_semantic_embeddings(spark, sf_dir) -> DataFrame:
    """Embedding-space decontamination (decontam.decontaminate_semantic):
    the leakage check n-gram overlap misses — paraphrased/reformatted
    eval copies.  The eval set plants both EXACT corpus copies (vec_id %
    25, cosine 1.0) and perturbed near-copies (vec_id % 50, first
    coordinate +0.25 → cosine ≈ 0.97), so hit counting, the max-cosine
    evidence, and the deterministic nearest-eval tie-break are all
    value-checked at threshold 0.95.  Eval broadcasts; the corpus never
    shuffles — only hits reach the per-item aggregate."""
    from jsons_to_schema_spark.operators.decontam import decontaminate_semantic

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("eid"), F.col("v").alias("evec")
    )
    perturbed = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("eid"),
        F.concat(
            F.array(F.element_at("v", 1) + F.lit(0.25)),
            F.slice("v", 2, F.size("v") - 1),
        ).alias("evec"),
    )
    eval_set = exact.unionByName(perturbed)
    return decontaminate_semantic(
        emb, eval_set, "vec_id", "v", "eid", "evec", threshold=0.95
    )


@query(
    "hybrid_rrf_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.query_id, q.qv, q.ql, e.vec_id AS neighbor_id,
             e.embedding AS ev, e.label AS el
      FROM q, embeddings e WHERE e.vec_id <> q.query_id
    ),
    sem AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
                     CAST(ev AS DOUBLE[])), 6) DESC, neighbor_id) AS r
      FROM pairs
    ),
    met AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               abs(el - ql), neighbor_id) AS r
      FROM pairs
    ),
    u AS (
      SELECT query_id, neighbor_id, 1000000000 // (60 + r) AS t
      FROM sem WHERE r <= 20
      UNION ALL
      SELECT query_id, neighbor_id, 1000000000 // (60 + r) AS t
      FROM met WHERE r <= 20
    ),
    f AS (
      SELECT query_id, neighbor_id, CAST(sum(t) AS BIGINT) AS score_micro,
             CAST(count(*) AS BIGINT) AS n_lists
      FROM u GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY score_micro DESC, neighbor_id) AS rank
      FROM f
    )
    SELECT query_id, neighbor_id, score_micro, n_lists,
           CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 10
    """,
)
def hybrid_rrf_embeddings(spark, sf_dir) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (similarity.rrf_fuse):
    for 5 query vectors, fuse (a) the exact cosine top-20
    (similarity.brute_force_topk — the semantic arm) with (b) a
    metadata-affinity top-20 (|label distance|, the filtered/keyword arm)
    into one top-10 per query.  Fusion uses only the RANKS — the classic
    1/(k0+r), k0=60, quantized to integer nano-units so the fused score is
    a sum of longs (exact, order-free, engine-identical); items retrieved
    by both arms carry n_lists=2 and dominate (both arms fire by
    construction).  The oracle replays both rankings and the quantized
    fusion — all 50 fused rows value-checked."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    sem = similarity.brute_force_topk(emb, queries_df, k=20)
    q = F.broadcast(
        queries_df.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
        )
    )
    pairs = q.crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_el"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.abs(F.col("_el") - F.col("_ql")).asc(), F.col("neighbor_id").asc()
    )
    met = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "neighbor_id", "rank")
    )
    return similarity.rrf_fuse([sem, met], k=10, k0=60)


@query(
    "embedding_drift_snapshots",
    oracle="""
    WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
               WHERE vec_id % 2 = 0 AND embedding IS NOT NULL),
    c AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x * CAST(1.1 AS DOUBLE) + CAST(0.05 AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id % 2 = 1 AND embedding IS NOT NULL),
    sb AS (SELECT i, sum(CAST(CAST(round(e[i] * 1e6) AS BIGINT) AS HUGEINT))
                    AS sb
           FROM b, unnest(range(1, len(e) + 1)) AS r(i) GROUP BY 1),
    sc AS (SELECT i, sum(CAST(CAST(round(e[i] * 1e6) AS BIGINT) AS HUGEINT))
                    AS sc
           FROM c, unnest(range(1, len(e) + 1)) AS r(i) GROUP BY 1),
    nn AS (SELECT (SELECT count(*) FROM b) AS nb,
                  (SELECT count(*) FROM c) AS nc,
                  (SELECT len(any_value(e)) FROM b) AS dim),
    j AS (SELECT sb.sb, sc.sc,
                 CAST(sb.sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1e6 AS cb,
                 CAST(sc.sc AS DOUBLE) / CAST(nc AS DOUBLE) / 1e6 AS cc
          FROM sb JOIN sc USING (i), nn),
    agg AS (SELECT sum(sb * sc) AS dot, sum(sb * sb) AS nb2,
                   sum(sc * sc) AS nc2,
                   sum(CAST(round(1e12 * ((cb - cc) * (cb - cc)))
                       AS BIGINT)) AS sh2
            FROM j)
    SELECT CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_current,
           CAST(dim AS INT) AS dim,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(nb2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))),
                 6) AS centroid_cosine,
           round(sqrt(sh2 / 1e12), 6) AS centroid_shift_l2
    FROM agg, nn
    """,
)
def embedding_drift_snapshots(spark, sf_dir) -> DataFrame:
    """Embedding drift (drift.embedding_drift): even vec_ids are the base
    snapshot; odd vec_ids get a planted affine drift (x·1.1 + 0.05 — a
    re-scaled encoder plus a bias shift) as the current snapshot.  Every
    component quantizes to 1e-6 at the scan; per-dim sums are exact
    decimal aggregates; centroid cosine comes from the integer sum
    vectors directly (scales cancel) and the L2 shift from per-dim
    pico-quantized squared diffs — zero floating-point accumulation, so
    both engines produce the identical report.  The oracle replays
    quantization, HUGEINT sums, and the final arithmetic — cosine < 1 and
    shift > 0 by construction, both value-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0).select("embedding")
    cur = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * F.lit(1.1) + F.lit(0.05),
        ).alias("embedding")
    )
    return drift.embedding_drift(base, cur)


@query(
    "embedding_covariance_profile",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64),
    idx AS (SELECT a.range AS i, b.range AS j
            FROM range(64) a, range(64) b WHERE a.range <= b.range),
    s AS (SELECT idx.i, idx.j,
                 sum(e[idx.i + 1] * e[idx.j + 1]) AS g,
                 sum(e[idx.i + 1]) AS si,
                 sum(e[idx.j + 1]) AS sj,
                 count(*) AS n
          FROM q, idx GROUP BY idx.i, idx.j)
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(n AS BIGINT) AS n,
           round((CAST(g AS DOUBLE) / n
                  - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n))
                 / 1000000000000.0, 6) + 0.0 AS cov
    FROM s
    """,
)
def embedding_covariance_profile(spark, sf_dir) -> DataFrame:
    """Exact population covariance of the 64-dim embedding column, one row
    per upper-triangle entry (linalg.embedding_covariance) — the PCA /
    whitening front-end.  The corpus pass is a single mapInArrow fold
    producing ONE (n, sums, Gram) partial per Arrow batch in exact int64
    micro-units (no d^2 row explode, no corpus shuffle); partials combine
    by decimal(38,0) sums.  The oracle replays the identical quantization
    and division order in DuckDB, so all 2,080 covariance entries
    value-match bit-for-bit."""
    from ..operators.linalg import embedding_covariance

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding", dim=64)


@query(
    "contrastive_pairs_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings
               WHERE vec_id < 8 AND label IS NOT NULL
                 AND embedding IS NOT NULL),
    scored AS (
      SELECT q.query_id,
             CASE WHEN e.label = q.ql THEN 'positive'
                  ELSE 'hard_negative' END AS role,
             e.vec_id AS neighbor_id, e.label AS neighbor_label,
             round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                   CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM q, embeddings e
      WHERE e.vec_id <> q.query_id AND e.label IS NOT NULL
        AND e.embedding IS NOT NULL),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id, role
                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, role, neighbor_id, neighbor_label, cos_sim,
           CAST(rank AS INT) AS rank
    FROM ranked
    WHERE (role = 'positive' AND rank <= 2)
       OR (role = 'hard_negative' AND rank <= 2)
    """,
)
def contrastive_pairs_embeddings(spark, sf_dir) -> DataFrame:
    """Contrastive pair mining (similarity.contrastive_pairs): for each of
    8 query vectors, the 2 most-similar same-label neighbors (positives)
    and the 2 most-similar different-label neighbors (hard negatives) —
    the mining step of metric learning, where near-miss negatives carry
    the gradient.  Exact cosine, broadcast query side, one corpus scan,
    per-(query, role) keyed window — value-checked row-for-row against
    DuckDB's list_cosine_similarity replay."""
    from ..operators.similarity import contrastive_pairs

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return contrastive_pairs(
        emb, emb.filter(F.col("vec_id") < 8), k_pos=2, k_neg=2
    )


@query("similarity_recall_report")  # pinned-snapshot oracle (deterministic)
def similarity_recall_report(spark, sf_dir) -> DataFrame:
    """Recall-vs-probes curve for the persisted IVF index
    (similarity.ivf_recall_report): mean and WORST-query recall@10 vs
    exact brute force at n_probe ∈ {1, 2, 4, 8, 16} — the tuning curve
    an ANN deployment actually reads, produced by the engine about its
    own index.  n_probe = 16 probes every cell, so its recall row must
    be exactly 1.0 (the self-check); deterministic end-to-end given the
    pinned index → pinned determinism-guarded oracle; the monotone-
    recall floor is pytest-asserted."""
    from pathlib import Path

    from ..operators.similarity import build_ivf_index, ivf_recall_report

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 16)
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"ivf_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        build_ivf_index(emb, idx, n_cells=16, iters=2, seed=42)
    return ivf_recall_report(
        spark, idx, emb, queries_df, k=10, n_probes=(1, 2, 4, 8, 16)
    )


@query(
    "dim_truncation_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 16),
    d AS (SELECT unnest([8, 16, 32, 64]) AS dim),
    scored AS (
      SELECT q.query_id, d.dim, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(
                   CAST(q.qv[1:d.dim] AS DOUBLE[]),
                   CAST(e.embedding[1:d.dim] AS DOUBLE[])), 6) AS cos_sim
      FROM q CROSS JOIN d JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id, dim
                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ),
    top AS (SELECT query_id, dim, neighbor_id FROM ranked WHERE rank <= 10),
    truth AS (SELECT query_id, neighbor_id FROM top WHERE dim = 64),
    hits AS (
      SELECT t.query_id, t.dim,
             sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS m
      FROM top t LEFT JOIN truth tr
        ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
      GROUP BY 1, 2
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           round(CAST(sum(m) AS DOUBLE) / 160.0, 6) AS mean_recall,
           round(CAST(min(m) AS DOUBLE) / 10.0, 6) AS worst_recall
    FROM hits GROUP BY 1
    """,
)
def dim_truncation_embeddings(spark, sf_dir) -> DataFrame:
    """Matryoshka dimensionality-ablation curve
    (similarity.dim_truncation_report): recall@10 of exact cosine top-k
    on the first 8/16/32 dims vs the 64-dim truth over 16 query vectors
    — what shrinking the index to half/quarter/eighth FLOPs and bytes
    costs in recall, measured by the engine itself.  One shared
    crossJoin scan for all cuts (query side exploded to slices and
    broadcast), (query, dim)-keyed ranking with the deterministic
    tie-break, zero-overlap cuts counted explicitly; the 64-dim row must
    come out exactly 1.0 (self-check).  All rows value-checked vs the
    DuckDB sliced list_cosine_similarity replay."""
    from ..operators.similarity import dim_truncation_report

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 16)
    return dim_truncation_report(
        emb, queries_df, k=10, dims=[8, 16, 32], full_dim=64
    )


@query(
    "cluster_quality_embeddings",
    oracle="""
    WITH src AS (
      SELECT CAST(vec_id % 4 AS VARCHAR) AS g, embedding AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    idx AS (SELECT unnest(range(64)) AS d),
    cells AS (
      SELECT g, d, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS HUGEINT)) AS s1,
             sum(CAST(CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS HUGEINT)
                 * CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                   AS BIGINT)) AS s2
      FROM src, idx GROUP BY 1, 2
    ),
    per_g AS (
      SELECT g, max(n) AS ng,
             sum(CAST(s2 AS DOUBLE) / 1e12
                 - (CAST(s1 AS DOUBLE) / 1000000.0)
                   * (CAST(s1 AS DOUBLE) / 1000000.0)
                   / CAST(n AS DOUBLE)) AS ssw_g
      FROM cells GROUP BY 1
    ),
    gtot AS (SELECT d, sum(s1) AS S1, CAST(sum(n) AS BIGINT) AS N
             FROM cells GROUP BY 1),
    ssb_d AS (
      SELECT c.d,
             sum((CAST(c.s1 AS DOUBLE) / 1000000.0)
                 * (CAST(c.s1 AS DOUBLE) / 1000000.0)
                 / CAST(c.n AS DOUBLE))
             - (CAST(any_value(gtot.S1) AS DOUBLE) / 1000000.0)
               * (CAST(any_value(gtot.S1) AS DOUBLE) / 1000000.0)
               / CAST(any_value(gtot.N) AS DOUBLE) AS b
      FROM cells c JOIN gtot ON gtot.d = c.d GROUP BY c.d
    ),
    tot_g AS (
      SELECT ssw, ntot, k FROM (
        SELECT sum(ssw_g) OVER w AS ssw,
               CAST(sum(ng) OVER w AS BIGINT) AS ntot,
               CAST(sum(1) OVER w AS BIGINT) AS k,
               row_number() OVER (ORDER BY g DESC) AS rn
        FROM per_g
        WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)) x
      WHERE rn = 1
    ),
    tot_b AS (
      SELECT ssb FROM (
        SELECT sum(b) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ssb,
               row_number() OVER (ORDER BY d DESC) AS rn
        FROM ssb_d) x
      WHERE rn = 1
    ),
    cent AS (SELECT g, d, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                          / 1000000.0 AS mu FROM cells),
    scat AS (SELECT g, sqrt(greatest(ssw_g / CAST(ng AS DOUBLE), 0.0))
                    AS sc FROM per_g),
    pd AS (
      SELECT a.g AS ga, b.g AS gb,
             sqrt(sum((a.mu - b.mu) * (a.mu - b.mu))) AS m
      FROM cent a JOIN cent b ON a.g < b.g AND a.d = b.d
      GROUP BY 1, 2
    ),
    sym AS (SELECT ga, gb, m FROM pd
            UNION ALL SELECT gb, ga, m FROM pd),
    ratio AS (
      SELECT sym.ga, max((sa.sc + sb.sc) / sym.m) AS worst
      FROM sym JOIN scat sa ON sa.g = sym.ga
               JOIN scat sb ON sb.g = sym.gb
      GROUP BY 1
    ),
    db AS (
      SELECT cdb / CAST(ck AS DOUBLE) AS v FROM (
        SELECT sum(worst) OVER w AS cdb, sum(1) OVER w AS ck,
               row_number() OVER (ORDER BY ga DESC) AS rn
        FROM ratio
        WINDOW w AS (ORDER BY ga ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)) x
      WHERE rn = 1
    )
    SELECT tot_g.k, tot_g.ntot AS n,
           CASE WHEN tot_g.k >= 2 AND tot_g.ssw > 0
                     AND CAST(tot_g.ntot AS DOUBLE) > CAST(tot_g.k AS DOUBLE)
                THEN round((tot_b.ssb / (CAST(tot_g.k AS DOUBLE) - 1.0))
                           / (tot_g.ssw / (CAST(tot_g.ntot AS DOUBLE)
                                           - CAST(tot_g.k AS DOUBLE))), 6)
           END AS calinski_harabasz,
           round(db.v, 6) AS davies_bouldin
    FROM tot_g, tot_b, db
    """,
)
def cluster_quality_embeddings(spark, sf_dir) -> DataFrame:
    """Calinski–Harabasz + Davies–Bouldin over the embeddings table with
    labels = vec_id % 4 (similarity.cluster_quality_report) — the
    NEGATIVE control on purpose: a random partition of a random vector
    cloud must score CH ≈ 1 and DB high, and this query pins that both
    engines compute exactly that (the positive direction — separated
    clusters → CH in the thousands, DB ≈ 0 — is pytest-pinned).  One
    map-side-partially-aggregated posexplode to per-(label, dim) exact
    sums (k·d shuffle rows, never corpus·d), bounded k² centroid pairs,
    ordered folds; the single row value-checked."""
    from ..operators.similarity import cluster_quality_report

    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 4).cast("string").alias("g"),
        F.col("embedding").alias("e"),
    )
    return cluster_quality_report(emb, "e", "g", dim=64)
