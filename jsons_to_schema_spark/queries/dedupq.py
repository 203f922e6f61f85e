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


_PLANT_CORPUS_LINES = (
    "concat(case when doc_id % 4 = 0 then "
    "concat('subscribe to our newsletter today friends', chr(10)) "
    "else '' end, text, chr(10), substring(text, 1, 30))"
)


@query(
    "corpus_line_dedup_documents",
    oracle=f"""
    WITH planted AS (SELECT doc_id, {_PLANT_CORPUS_LINES} AS text FROM documents),
    lx AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ls)),
                                   i -> {{'idx': i, 'line': ls[i]}}),
                    recursive := true)
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)
    ), hot AS (
      SELECT line FROM lx WHERE length(line) >= 10
      GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    ), kept AS (
      SELECT lx.* FROM lx ANTI JOIN hot USING (line)
    ), reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, count(*) AS n_lines FROM lx GROUP BY doc_id
    )
    SELECT tot.doc_id,
           cast(tot.n_lines AS bigint) AS n_lines,
           cast(tot.n_lines - coalesce(reb.n_kept, 0) AS bigint) AS n_removed_lines,
           coalesce(reb.text_dedup, '') AS text_dedup
    FROM tot LEFT JOIN reb USING (doc_id)
    """,
)
def corpus_line_dedup_documents(spark, sf_dir) -> DataFrame:
    """RefinedWeb-style corpus-LEVEL boilerplate removal: a planted
    newsletter line recurs in every 4th document (≥5-doc frequency) and must
    vanish from all of them, while document-unique lines survive in order
    (operators/text.py:corpus_line_dedup; oracle groups raw lines — also a
    collision canary for the engine's 8-byte line keys)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PLANT_CORPUS_LINES).alias("text")
    )
    return text.corpus_line_dedup(
        docs, "text", "doc_id", min_doc_freq=5, min_line_chars=10
    )


# ===========================================================================
# Deduplication (exact oracled; probabilistic ones rows-only + unit tests)
# ===========================================================================

@query(
    "dedup_exact_documents",
    oracle="""
    SELECT fp_exact, count(*) AS cnt, min(doc_id) AS keep_id
    FROM (SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_exact
          FROM documents)
    GROUP BY fp_exact HAVING count(*) > 1
    """,
)
def dedup_exact_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicate_clusters(docs, "text", "doc_id")


@query("dedup_minhash_documents")
def dedup_minhash_documents(spark, sf_dir) -> DataFrame:
    """CAMPAIGN mode (r4, VERDICT item 3): pairs computed from the persisted
    signature/shingle index table (built once, cached like the IVF index) —
    no localCheckpoint executor-storage pin, no re-tokenization on re-run.
    Output ≡ one-shot pair mode at the same params (tests/test_round3_ops)."""
    from pathlib import Path

    docs = load_table(spark, sf_dir, "documents")
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"mhall_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'documents')}_h32_b8_k3"
    )
    return dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", min_jaccard=0.5, index_dir=idx
    )


@query("dedup_simhash_documents")
def dedup_simhash_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3)


@query(
    "dedup_ngram_jaccard_documents",
    oracle="""
    WITH sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), inv AS (
      SELECT doc_id, unnest(g) AS s FROM sh
    ), keep AS (
      SELECT s FROM inv GROUP BY s HAVING count(*) <= 100
    ), kept AS (
      SELECT inv.doc_id, list(inv.s) AS gk FROM inv JOIN keep USING (s)
      GROUP BY inv.doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.g, b.g)) AS inter,
             len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN kept ka ON ka.doc_id = a.doc_id
      JOIN kept kb ON kb.doc_id = b.doc_id
      WHERE len(list_intersect(ka.gk, kb.gk)) > 0
    )
    SELECT id_a, id_b, round(inter * 1.0 / uni, 6) AS jaccard
    FROM pairs WHERE inter * 1.0 / uni >= 0.2
    """,
)
def dedup_ngram_jaccard_documents(spark, sf_dir) -> DataFrame:
    """Candidates share ≥1 non-stop shingle (document frequency ≤ 100 — the
    hot-shingle quadratic-blowup guard); Jaccard verified on full sets."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.2, max_shingle_df=100
    )


@query(
    "dedup_clusters_ngram_documents",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), inv AS (
      SELECT doc_id, unnest(g) AS s FROM sh
    ), nonstop AS (
      SELECT s FROM inv GROUP BY s HAVING count(*) <= 100
    ), kept AS (
      SELECT inv.doc_id, list(inv.s) AS gk FROM inv JOIN nonstop USING (s)
      GROUP BY inv.doc_id
    ), pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN kept ka ON ka.doc_id = a.doc_id
      JOIN kept kb ON kb.doc_id = b.doc_id
      WHERE len(list_intersect(ka.gk, kb.gk)) > 0
        AND len(list_intersect(a.g, b.g)) * 1.0 /
            (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.2
    ), e(src, dst) AS (
      SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr
    ), reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lbl) AS cluster_id, id = min(lbl) AS keep
    FROM reach GROUP BY id
    """,
)
def dedup_clusters_ngram_documents(spark, sf_dir) -> DataFrame:
    """Duplicate-CLUSTER assignment (what a real dedup pipeline consumes —
    pairs alone don't dedup anything): connected components over the n-gram
    Jaccard pair list via distributed min-label propagation, keep = the
    cluster's min-id representative.  Oracled end-to-end against a DuckDB
    recursive-CTE transitive closure over the identical pair pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.2, max_shingle_df=100
    )
    labels = dedup.duplicate_clusters(pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("cluster").alias("cluster_id"),
        (F.col("cluster") == F.col("id")).alias("keep"),
    )


@query(
    "dedup_embedding_near_dup",
    oracle="""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         pert AS (SELECT vec_id + 10000 AS vec_id,
                         list_transform(v, x -> x + 0.001) AS v
                  FROM base WHERE vec_id < 10),
         allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
         pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                          round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
                   FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.95
    """,
)
def dedup_embedding_near_dup(spark, sf_dir) -> DataFrame:
    """Banded-LSH near-dup at scale-representative parameters (48 hyperplane
    bits in 8 bands of 6; recall ≈1 at cos ≥ 0.95; per-band self-join stays
    candidate-bounded — the old bits=4 single bucket was ~N²/16).

    The synthetic embeddings have no true near-dups (max pairwise cos 0.51),
    so the query plants deterministic ones — a +0.001 perturbation of the
    first 10 vectors — and must recover exactly those pairs.  That makes
    the oracle REAL SQL: the exact all-pairs cosine ≥ 0.95 set."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    allv = emb.unionByName(pert)
    return similarity.embedding_near_dup_pairs(
        allv, min_cosine=0.95, bits=48, bands=8, dim=64
    )


@query("dedup_semantic_embeddings")
def dedup_semantic_embeddings(spark, sf_dir) -> DataFrame:
    """SemDeDup-style cluster-then-drop semantic dedup over the same planted
    +0.001 perturbations — the dropped set must be exactly the 10 perturbed
    vectors, each pointing at its original as kept_id (ground-truth-tested
    in tests/test_operators.py; k-means isn't SQL, so the driver oracle is
    the pinned determinism-guarded snapshot)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    allv = emb.unionByName(pert)
    return similarity.semantic_dedup(allv, n_cells=8, threshold=0.95)


@query("dedup_incremental_minhash")
def dedup_incremental_minhash(spark, sf_dir) -> DataFrame:
    """Incremental (cross-snapshot) dedup: probe a NEW ingest batch (doc_id
    % 5 == 0) against the PERSISTED MinHash index of the existing corpus —
    the batch-sized-not-corpus-sized shape every continuously-ingesting
    training pipeline needs (dedup.minhash_probe_index; index built once
    and cached like the IVF index).  Probe ≡ batch LSH on the same split is
    asserted in tests/test_round3_ops.py; deterministic seeded hashes →
    pinned oracle."""
    from pathlib import Path

    from ..operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = (
        _REPO_ROOT
        / ".cache"
        / f"mh_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'documents')}_h32_b8_k3"
    )
    if not (idx / "meta.json").exists():
        dedup_ops.build_minhash_index(
            corpus, idx, num_hashes=32, bands=8, k=3
        )
    return dedup_ops.minhash_probe_index(spark, idx, new, min_jaccard=0.7)


@query(
    "fuzzy_pairs_customer_names",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS text_a, b.c_name AS text_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_pairs_customer_names(spark, sf_dir) -> DataFrame:
    """Fuzzy record linkage (dedup.fuzzy_self_pairs): every customer-name
    pair within Levenshtein distance 1 — names differing in one digit.
    The oracle pays the all-pairs cross join (2.25M levenshtein calls at
    sf0.01, the thing the operator exists to avoid); the SymSpell
    deletion-variant blocking + exact verify must reproduce it verbatim
    (~19.5k pairs — a dense value-hash over ids, names, and distances)."""
    cu = load_table(spark, sf_dir, "customer")
    return dedup.fuzzy_self_pairs(cu, "c_custkey", "c_name", 1)


@query(
    "entity_clusters_customer_names",
    oracle="""
    WITH RECURSIVE cu AS (
      SELECT c_custkey,
             'e' || lpad(CAST(11 * (c_custkey % 300) AS VARCHAR), 4, '0')
                 || CASE CAST(floor(c_custkey / 300) AS BIGINT) % 5
                      WHEN 1 THEN 'x' WHEN 2 THEN 'xx'
                      WHEN 3 THEN 'y' WHEN 4 THEN 'z' ELSE '' END AS name
      FROM customer
    ), pr AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM cu a JOIN cu b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.name, b.name) <= 1
    ), e(src, dst) AS (
      SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr
    ), reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id
    ), lab AS (
      SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
    )
    SELECT c.c_custkey, c.name,
           coalesce(lab.cluster, c.c_custkey) AS cluster_id,
           coalesce(lab.cluster, c.c_custkey) = c.c_custkey AS keep
    FROM cu c LEFT JOIN lab ON lab.id = c.c_custkey
    """,
)
def entity_clusters_customer_names(spark, sf_dir) -> DataFrame:
    """Entity resolution end-to-end: the SymSpell-blocked fuzzy pair list
    composed with large-star/small-star connected components and the
    keep-one representative policy (dedup.assign_duplicate_clusters) —
    what a master-data pipeline consumes, since pairs alone resolve
    nothing.  Names are PLANTED with structure the raw customer names
    lack (those chain into one giant component): 300 entity bases that
    are pairwise Levenshtein ≥ 2 apart (multiples of 11 zero-padded —
    a single-digit edit changes the value by d·10^k ≢ 0 mod 11, so no
    one-substitution path between bases exists) each carrying five
    variant suffixes ('', x, xx, y, z) where 'xx' reaches '' only
    THROUGH 'x' — the components are genuinely multi-hop, so the CC
    rounds are exercised, not just echoed.  The oracle recomputes the
    closure from the all-pairs Levenshtein list with a recursive CTE and
    must match every row's cluster label AND representative flag."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    m = (F.floor(F.col("c_custkey") / 300).cast("long") % 5)
    suffix = (
        F.when(m == 1, F.lit("x"))
        .when(m == 2, F.lit("xx"))
        .when(m == 3, F.lit("y"))
        .when(m == 4, F.lit("z"))
        .otherwise(F.lit(""))
    )
    planted = cu.select(
        "c_custkey",
        F.concat(
            F.lit("e"),
            F.lpad((11 * (F.col("c_custkey") % 300)).cast("string"), 4, "0"),
            suffix,
        ).alias("name"),
    )
    pairs = dedup.fuzzy_self_pairs(planted, "c_custkey", "name", 1).select(
        "id_a", "id_b"
    )
    return dedup.assign_duplicate_clusters(planted, pairs, "c_custkey")


@query(
    "fuzzy_join_incoming_customers",
    oracle="""
    WITH inc AS (
      SELECT c_custkey AS ik,
             substr(c_name, 1, len(c_name) - 1) || 'X' AS iname
      FROM customer WHERE c_custkey % 15 = 0
    )
    SELECT inc.ik AS id_a, c.c_custkey AS id_b,
           inc.iname AS text_a, c.c_name AS text_b,
           CAST(levenshtein(inc.iname, c.c_name) AS INT) AS dist
    FROM inc JOIN customer c
      ON levenshtein(inc.iname, c.c_name) <= 1
    """,
)
def fuzzy_join_incoming_customers(spark, sf_dir) -> DataFrame:
    """Cross-table record linkage (dedup.fuzzy_join): an incoming batch of
    100 typo'd customer names (last character replaced by 'X') matched
    against the full master table at Levenshtein ≤ 1 — each typo links
    back to its source AND to every same-prefix sibling, so the match set
    is dense and multi-valued.  The oracle pays the 150k-call all-pairs
    join the SymSpell blocking exists to avoid and must be reproduced
    verbatim."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    incoming = cu.filter(F.col("c_custkey") % 15 == 0).select(
        F.col("c_custkey").alias("ik"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("iname"),
    )
    return dedup.fuzzy_join(
        incoming, cu, "ik", "iname", "c_custkey", "c_name", max_dist=1
    )


@query(
    "fingerprint_clusters_customer",
    oracle="""
    WITH src AS (
      SELECT CASE c_custkey % 3
               WHEN 0 THEN 'Customer#' || CAST(c_custkey // 3 AS VARCHAR)
               WHEN 1 THEN ' CUSTOMER ' || CAST(c_custkey // 3 AS VARCHAR)
                           || ' '
               ELSE 'customer--' || CAST(c_custkey // 3 AS VARCHAR)
             END AS v
      FROM customer
      UNION ALL
      SELECT 'solo-' || CAST(c_custkey AS VARCHAR) FROM customer
      WHERE c_custkey < 90
    ),
    pv AS (
      SELECT coalesce(array_to_string(list_sort(list_distinct(list_filter(
               string_split(regexp_replace(lower(trim(v)), '[^a-z0-9]+',
                                           ' ', 'g'), ' '),
               x -> x <> ''))), ' '), '') AS fingerprint,
             v, count(*) AS n
      FROM src WHERE v IS NOT NULL GROUP BY 1, 2
    )
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(n) AS BIGINT) AS n_rows,
           array_to_string(list_sort(list(v)), '|') AS members
    FROM pv GROUP BY 1 HAVING count(*) >= 2
    """,
)
def fingerprint_clusters_customer(spark, sf_dir) -> DataFrame:
    """Key-collision value clustering (resolve.fingerprint_clusters — the
    OpenRefine fingerprint method): three planted spellings per canonical
    value ('Customer#g', '  CUSTOMER g ', 'customer--g') fuse into 500
    three-member clusters, while 90 planted singletons ('solo-k') are
    demonstrably ABSENT at min_values=2 (a one-spelling key needs no
    cleaning).  Work is bounded by distinct raw values, never rows; the
    oracle replays the identical normalize→split→distinct→sort→rejoin
    pipeline in DuckDB (regexp_replace 'g' flag = Spark's global default;
    empty-list array_to_string coalesced to '' — the known DuckDB NULL
    gap), so every cluster key, member list, and count is value-checked."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    g = F.expr("CAST(c_custkey DIV 3 AS BIGINT)").cast("string")
    v = (
        F.when(k % 3 == 0, F.concat(F.lit("Customer#"), g))
        # single-space literal: the oracle registrar collapses whitespace
        # runs, so a two-space plant would diverge between engines
        .when(k % 3 == 1, F.concat(F.lit(" CUSTOMER "), g, F.lit(" ")))
        .otherwise(F.concat(F.lit("customer--"), g))
    )
    solo = cust.filter(k < 90).select(
        F.concat(F.lit("solo-"), k.cast("string")).alias("v")
    )
    src = cust.select(v.alias("v")).unionByName(solo)
    return resolve.fingerprint_clusters(src, "v", min_values=2)


@query(
    "sorted_neighborhood_customer",
    oracle="""
    WITH src AS (
      SELECT c_mktsegment AS block, c_custkey AS id, c_name AS key
      FROM customer
      WHERE c_mktsegment IS NOT NULL AND c_custkey IS NOT NULL
        AND c_name IS NOT NULL
    ),
    rk AS (
      SELECT block, id, key,
             row_number() OVER (PARTITION BY block ORDER BY key, id) AS r
      FROM src
    )
    SELECT a.block, a.id AS id_a, b.id AS id_b,
           a.key AS key_a, b.key AS key_b,
           CAST(b.r - a.r AS INT) AS rank_distance
    FROM rk a JOIN rk b
      ON a.block = b.block AND b.r - a.r BETWEEN 1 AND 2
    """,
)
def sorted_neighborhood_customer(spark, sf_dir) -> DataFrame:
    """Sorted-neighborhood candidate generation (resolve.
    sorted_neighborhood_pairs): customers blocked by market segment,
    sorted by name, window 2 — the classic third blocking strategy
    beside LSH and fingerprint keys, catching sort-adjacent near-misses
    exact blocking splits.  Per-block sort (one keyed exchange), pair
    fan-out rows × window by construction; ranks order by (key, id) so
    candidates are partition-stable.  The oracle replays the identical
    row_number + bounded-offset self-join; every pair, key, and rank
    distance is value-checked (outside the 50-window: the ER family
    carries fingerprint + survivorship in-window reps; this is
    parity-checked at the driver's own sf0.01 every CI run)."""
    cust = load_table(spark, sf_dir, "customer")
    return resolve.sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", "c_mktsegment", window=2
    )


@query(
    "resolve_entities_customer",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT c_custkey AS id,
             'b' || CAST((c_custkey // 3) % 17 AS VARCHAR) AS blk,
             'entity-' || CAST((c_custkey // 3) * 7 + 1000 AS VARCHAR)
               || CASE c_custkey % 3 WHEN 0 THEN '' WHEN 1 THEN 'x'
                  ELSE 'xy' END AS nm,
             CAST(c_custkey % 100 AS DOUBLE) AS acct,
             c_mktsegment AS seg
      FROM customer
    ),
    rk AS (
      SELECT blk, id, nm,
             row_number() OVER (PARTITION BY blk ORDER BY nm, id) AS r
      FROM src
    ),
    pr AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM rk a JOIN rk b ON a.blk = b.blk AND b.r - a.r BETWEEN 1 AND 2
      WHERE levenshtein(a.nm, b.nm) <= 2
    ),
    e(s, d) AS (SELECT id_a, id_b FROM pr
                UNION ALL SELECT id_b, id_a FROM pr),
    reach(id, lbl) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, r.lbl FROM reach r JOIN e ON e.s = r.id
    ),
    cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
    lab AS (
      SELECT coalesce(cl.cluster, src.id) AS cluster, src.*
      FROM src LEFT JOIN cl ON src.id = cl.id
    ),
    base AS (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS n_members,
             arg_max(nm, CASE WHEN nm IS NOT NULL THEN id END) AS nm,
             max(acct) AS acct
      FROM lab GROUP BY 1
    ),
    mc AS (SELECT cluster, seg, count(*) AS n FROM lab
           WHERE seg IS NOT NULL GROUP BY 1, 2),
    win AS (
      SELECT cluster, seg,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n DESC, seg ASC) AS rn
      FROM mc
    )
    SELECT b.cluster, b.n_members, b.nm, b.acct, w.seg
    FROM base b LEFT JOIN win w ON b.cluster = w.cluster AND w.rn = 1
    """,
)
def resolve_entities_customer(spark, sf_dir) -> DataFrame:
    """END-TO-END entity resolution (resolve.resolve_entities): planted
    three-spelling entities ('entity-N', 'entity-Nx', 'entity-Nxy' —
    sort-adjacent, pairwise edit distance ≤ 2) are blocked, candidate-
    paired by sorted neighborhood, matched by Levenshtein, clustered by
    connected components, and fused to golden records (latest non-NULL
    name by id, max account, modal segment).  Entity numbers step by 7
    so distinct entities in a block sit ≥ 3 edits apart.  The oracle
    replays the identical funnel: row_number SNM, DuckDB levenshtein
    (same edit-distance semantics as Spark's), a recursive-CTE
    transitive closure with min-label clusters, singleton fallback to
    the own id, and the arg_max/mode survivorship — every golden record
    value-checked at sf0.01."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ent = F.expr("CAST(c_custkey DIV 3 AS BIGINT)")
    nm = F.concat(
        F.lit("entity-"),
        (ent * 7 + 1000).cast("string"),
        F.when(k % 3 == 1, F.lit("x"))
        .when(k % 3 == 2, F.lit("xy"))
        .otherwise(F.lit("")),
    )
    src = cust.select(
        k.alias("id"),
        F.concat(F.lit("b"), (ent % 17).cast("string")).alias("blk"),
        nm.alias("nm"),
        (k % 100).cast("double").alias("acct"),
        F.col("c_mktsegment").alias("seg"),
    )
    return resolve.resolve_entities(
        src,
        "id",
        "nm",
        "blk",
        "id",
        {"nm": "latest", "acct": "max", "seg": "mode"},
        window=2,
        max_distance=2,
    )


@query(
    "similarity_join_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.tk, b.tk)) AS i,
                 len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
          FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, round(i * 1.0 / u, 6) AS jaccard
    FROM p WHERE u > 0 AND i * 1.0 / u >= 0.95
    """,
)
def similarity_join_documents(spark, sf_dir) -> DataFrame:
    """EXACT all-pairs Jaccard join at t=0.95 (dedup.jaccard_prefix_join)
    — prefix filtering over ascending-document-frequency token order, the
    lossless AllPairs/PPJoin counterpart of the MinHash pipeline.  The
    oracle is the naive quadratic join DuckDB can afford at sf-test; the
    Spark side generates candidates ONLY from rarest-first prefix tokens
    (plus the t-length filter) and must return the identical 1,887 pairs
    — a missed pair is a prefix-filter correctness bug, not noise."""
    from ..operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95)


@query(
    "containment_join_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    a AS (SELECT * FROM s WHERE doc_id % 5 = 0 AND len(tk) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.tk, b.tk)) * 1.0 / len(a.tk), 6)
             AS containment
    FROM a JOIN s b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.tk, b.tk)) * 1.0 / len(a.tk) >= 0.98
    """,
)
def containment_join_documents(spark, sf_dir) -> DataFrame:
    """Directional containment join at t=0.98 (dedup.containment_join):
    probe docs (doc_id % 5 = 0) whose word set is >= 98% inside another
    document's — the quote/boilerplate/subset detector Jaccard misses.
    Asymmetric prefix filtering: only the probe side prefixes (rarest-df
    tokens), joined against the full corpus token index; B is pruned by
    |B| >= ceil(t|A|) alone.  The oracle is the naive directed quadratic
    join — losslessness means identical pairs."""
    from ..operators.dedup import containment_join

    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 5 == 0)
    return containment_join(probe, docs, "text", "doc_id", min_containment=0.98)


@query(
    "dedup_pair_overlap_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.tk, b.tk)) AS i,
                  len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
           FROM s a JOIN s b ON a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b FROM pr
              WHERE u > 0 AND i * 1.0 / u >= 0.95),
    pt AS (SELECT p.id_a, p.id_b, da.text AS cand, db.text AS ref
           FROM pairs p
           JOIN documents da ON da.doc_id = p.id_a
           JOIN documents db ON db.doc_id = p.id_b),
    nn AS (SELECT unnest([1, 2]) AS n),
    ct AS (SELECT id_a, id_b, nn.n AS n,
                  list_filter(string_split(cand, ' '), x -> x <> '') AS toks
           FROM pt CROSS JOIN nn),
    rt AS (SELECT id_a, id_b, nn.n AS n,
                  list_filter(string_split(ref, ' '), x -> x <> '') AS toks
           FROM pt CROSS JOIN nn),
    cg AS (SELECT id_a, id_b, n,
                  unnest(list_transform(generate_series(1, len(toks) - n + 1),
                         i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
           FROM ct WHERE len(toks) >= n),
    rg AS (SELECT id_a, id_b, n,
                  unnest(list_transform(generate_series(1, len(toks) - n + 1),
                         i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
           FROM rt WHERE len(toks) >= n),
    cc AS (SELECT id_a, id_b, n, gram, count(*) AS c FROM cg GROUP BY 1,2,3,4),
    rc AS (SELECT id_a, id_b, n, gram, count(*) AS c FROM rg GROUP BY 1,2,3,4),
    j AS (SELECT coalesce(cc.id_a, rc.id_a) AS id_a,
                 coalesce(cc.id_b, rc.id_b) AS id_b,
                 coalesce(cc.n, rc.n) AS n,
                 coalesce(cc.c, 0) AS ccnt, coalesce(rc.c, 0) AS rcnt
          FROM cc FULL OUTER JOIN rc
            ON cc.id_a = rc.id_a AND cc.id_b = rc.id_b
           AND cc.n = rc.n AND cc.gram = rc.gram),
    per AS (SELECT id_a, id_b, n,
                   CAST(sum(ccnt) AS BIGINT) AS cand_ngrams,
                   CAST(sum(rcnt) AS BIGINT) AS ref_ngrams,
                   CAST(sum(least(ccnt, rcnt)) AS BIGINT) AS overlap
            FROM j GROUP BY 1, 2, 3),
    spine AS (SELECT p.id_a, p.id_b, nn.n FROM pairs p CROSS JOIN nn),
    f AS (SELECT s.id_a, s.id_b, CAST(s.n AS BIGINT) AS n,
                 coalesce(per.cand_ngrams, 0) AS cand_ngrams,
                 coalesce(per.ref_ngrams, 0) AS ref_ngrams,
                 coalesce(per.overlap, 0) AS overlap
          FROM spine s LEFT JOIN per
            ON per.id_a = s.id_a AND per.id_b = s.id_b AND per.n = s.n)
    SELECT id_a, id_b, n, cand_ngrams, ref_ngrams, overlap,
           CASE WHEN cand_ngrams > 0
                THEN round(CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE), 6)
           END AS precision,
           CASE WHEN ref_ngrams > 0
                THEN round(CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE), 6)
           END AS recall,
           CASE WHEN cand_ngrams > 0 AND ref_ngrams > 0 THEN
             CASE WHEN overlap > 0 THEN
               round(2.0 * (CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
                         * (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE))
                     / ((CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
                        + (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE))), 6)
             ELSE 0.0 END
           END AS f1
    FROM f
    """,
)
def dedup_pair_overlap_documents(spark, sf_dir) -> DataFrame:
    """Near-duplicate pair EXPLANATIONS — two engine operators composed
    end-to-end: the exact prefix-filtered Jaccard join finds the t=0.95
    pairs (dedup.jaccard_prefix_join — the lossless candidate set), then
    text.ngram_overlap_metrics reports per-pair clipped unigram/bigram
    precision/recall/F1 — WHAT the flagged pairs actually share, the
    review surface a dedup decision audit needs (a pair at Jaccard 0.95
    with bigram F1 0.3 is shuffled boilerplate, not a true near-copy).
    The oracle replays both stages (quadratic join + list-slicing
    overlap); every one of the ~3.8k rows value-checked."""
    from ..operators.dedup import jaccard_prefix_join
    from ..operators.text import ngram_overlap_metrics

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95).select(
        "id_a", "id_b"
    )
    texts = docs.select("doc_id", "text")
    pt = (
        pairs.join(texts.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("text", "cand")
        .join(
            texts.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "text", "ref"
            ),
            "id_b",
        )
    )
    return ngram_overlap_metrics(pt, ["id_a", "id_b"], "cand", "ref", n_max=2)


@query(
    "dedup_method_agreement_documents",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents WHERE text IS NOT NULL
    ),
    exact_flag AS (
      SELECT doc_id FROM fp
      WHERE f IN (SELECT f FROM fp GROUP BY f HAVING count(*) > 1)
    ),
    s AS (SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '),
                               x -> x <> '')) AS tk
          FROM documents WHERE text IS NOT NULL),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.tk, b.tk)) AS i,
                  len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
           FROM s a JOIN s b ON a.doc_id < b.doc_id),
    jac_flag AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM pr WHERE u > 0 AND i * 1.0 / u >= 0.95
        UNION ALL
        SELECT id_b FROM pr WHERE u > 0 AND i * 1.0 / u >= 0.95)
    ),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact_flag) AS ne,
             (SELECT CAST(count(*) AS BIGINT) FROM jac_flag) AS nj,
             (SELECT CAST(count(*) AS BIGINT)
              FROM exact_flag JOIN jac_flag USING (doc_id)) AS nb
    )
    SELECT ne AS n_exact, nj AS n_jaccard, nb AS n_both,
           CASE WHEN ne + nj - nb > 0
                THEN round(CAST(nb AS DOUBLE)
                           / CAST(ne + nj - nb AS DOUBLE), 6)
           END AS set_jaccard,
           CASE WHEN ne > 0
                THEN round(CAST(nb AS DOUBLE) / CAST(ne AS DOUBLE), 6)
           END AS exact_covered_by_jaccard
    FROM m
    """,
)
def dedup_method_agreement_documents(spark, sf_dir) -> DataFrame:
    """Agreement matrix between two dedup modalities — which documents
    the EXACT fingerprint flags vs the lossless Jaccard-0.95 join
    (text.fp_exact_key ∘ dedup.jaccard_prefix_join, both oracled
    operators composed): exact dups MUST be a subset of Jaccard dups
    (identical text ⟹ J = 1 — the containment ratio reads 1.0 as a
    built-in sanity check), and the set-Jaccard between the flag sets
    says how much extra near-dup mass the fuzzy stage adds.  The
    dedup-campaign audit: 'what does each stage buy'.  One row
    value-checked against the dual replay."""
    from ..operators.dedup import jaccard_prefix_join
    from ..operators.text import fp_exact_key

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    fp = docs.select("doc_id", fp_exact_key("text").alias("f"))
    dup_keys = fp.groupBy("f").count().filter(F.col("count") > 1).select("f")
    exact_flag = fp.join(dup_keys, "f").select("doc_id")
    pairs = jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95)
    jac_flag = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    ne = exact_flag.count()
    nj = jac_flag.count()
    nb = exact_flag.join(jac_flag, "doc_id").count()
    spark_ = docs.sparkSession
    union = ne + nj - nb
    return spark_.createDataFrame(
        [
            (
                ne,
                nj,
                nb,
                round(nb / union, 6) if union > 0 else None,
                round(nb / ne, 6) if ne > 0 else None,
            )
        ],
        "n_exact long, n_jaccard long, n_both long, set_jaccard double, "
        "exact_covered_by_jaccard double",
    )
