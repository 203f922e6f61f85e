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


_PAGERANK_EDGES_SQL = """
WITH x AS (SELECT doc_id, unnest(spans) AS sp FROM read_parquet('__SPANS_GLOB__'))
SELECT doc_id AS src, sp.media_ref AS dst FROM x WHERE sp.media_ref IS NOT NULL
UNION ALL
SELECT sp.media_ref AS src, doc_id AS dst FROM x WHERE sp.media_ref IS NOT NULL
"""


def _pagerank_oracle() -> str:
    from ..operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PAGERANK_EDGES_SQL, iterations=6, damping_pct=85)


@query("pagerank_spans_media", oracle=_pagerank_oracle())
def pagerank_spans_media(spark, sf_dir) -> DataFrame:
    """PageRank over the doc ↔ media_ref bipartite graph of the spans
    corpus (operators.graph.pagerank, 6 iterations, d=0.85): ranks shared
    media assets and hub documents for curation triage.  EXACT-INTEGER
    power iteration — ranks live in BIGINT micro-units, contributions are
    integer divisions, so the fixed-iteration result is bit-identical in
    both engines with zero floating-point accumulation; per iteration one
    edges⋈ranks shuffle + one groupBy(dst), ranks eagerly checkpointed so
    the plan stays constant-size (the connected-components discipline).
    The oracle is the recurrence itself, unrolled into a generated
    6-iteration CTE chain (graph.pagerank_oracle_sql) — every node's final
    rank value-checked, dangling-mass arm exercised structurally (zero
    here: every node in a bidirectional edge list has out-degree)."""
    from ..operators.graph import pagerank

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = spans.select("doc_id", F.explode("spans").alias("sp")).filter(
        F.col("sp.media_ref").isNotNull()
    )
    fwd = x.select(F.col("doc_id").alias("src"), F.col("sp.media_ref").alias("dst"))
    rev = x.select(F.col("sp.media_ref").alias("src"), F.col("doc_id").alias("dst"))
    return pagerank(fwd.union(rev), iterations=6)


@query(
    "triangles_spans_media",
    oracle="""
    WITH x AS (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS (SELECT DISTINCT l.m AS a, r.m AS b
          FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m < r.m),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    nodes AS (SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM nodes GROUP BY node
    """,
)
def triangles_spans_media(spark, sf_dir) -> DataFrame:
    """Per-media triangle counts over the media co-occurrence graph (two
    media are adjacent iff some document references both) —
    graph.triangle_counts, the degree-ordered-orientation algorithm whose
    wedge work is O(sqrt(m)) per vertex even under hub skew.  The oracle
    is the naive three-way self-join on canonical (a < b) edges DuckDB
    can afford at sf-test scale; Spark emits each triangle exactly once
    from its orientation-minimal corner, then explodes the three corners.
    Co-occurrence edges are bounded per document (spans per doc is
    schema-bounded), so the edge build is a keyed self-join on doc_id —
    never all-pairs across the corpus."""
    from ..operators.graph import triangle_counts

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left = x.alias("l")
    right = x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Generated, unrolled peeling replay (the pagerank-oracle pattern):
    round i keeps vertices with degree >= k over round i-1's surviving
    symmetric edge set.  ``rounds`` must be >= the Spark side's actual
    convergence depth — parity fails loudly if not, never silently."""
    # AS MATERIALIZED is load-bearing: round i references round i-1 three
    # times (the edge set and both endpoint filters), so default CTE
    # inlining expands 3^rounds copies of the corpus scan and DuckDB
    # falls over around 15 rounds; materialization keeps it linear
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e0 AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    a{i} AS MATERIALIZED (SELECT u FROM e{i-1} GROUP BY u
             HAVING count(*) >= {k}),
    e{i} AS MATERIALIZED (SELECT e.u, e.v FROM e{i-1} e
             JOIN a{i} p ON e.u = p.u JOIN a{i} q ON e.v = q.u)"""
        )
    parts.append(
        f"""
    SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY u HAVING count(*) >= {k}"""
    )
    return "".join(parts)


@query("kcore_spans_media", oracle=_kcore_oracle(3, 15))
def kcore_spans_media(spark, sf_dir) -> DataFrame:
    """3-core of the media co-occurrence graph (graph.kcore_members):
    iterative peeling to the greatest fixpoint — each round one keyed
    degree aggregate + semi-join filter over the shrinking edge list,
    localCheckpointed so the plan stays constant-size (the CC
    discipline); raises rather than returning a non-fixpoint.  The
    oracle is the peeling recurrence unrolled 15 rounds (generated, the
    pagerank-oracle pattern) — if Spark needed more rounds than the
    oracle replays, parity fails loudly.  Per-member in-core degrees
    value-checked."""
    from ..operators.graph import kcore_members

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return kcore_members(edges, k=3)


def _lpa_oracle(iterations: int) -> str:
    """Unrolled synchronous-LPA replay (MATERIALIZED — each round
    references the previous twice; the k-core lesson)."""
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    c{i} AS MATERIALIZED (SELECT e.v AS node, l.lbl, count(*) AS c
             FROM e JOIN l{i-1} l ON e.u = l.node GROUP BY 1, 2),
    l{i} AS MATERIALIZED (SELECT node, lbl FROM
             (SELECT node, lbl, row_number() OVER (PARTITION BY node
                     ORDER BY c DESC, lbl ASC) AS rn FROM c{i})
             WHERE rn = 1)"""
        )
    parts.append(f"""
    SELECT node, lbl AS label FROM l{iterations}""")
    return "".join(parts)


@query("communities_spans_media", oracle=_lpa_oracle(4))
def communities_spans_media(spark, sf_dir) -> DataFrame:
    """Fixed-iteration synchronous label propagation over the media
    co-occurrence graph (graph.label_propagation, 4 iterations):
    community labels for curation triage — which media cluster into one
    asset neighborhood.  Deterministic by construction (most-frequent
    neighbor label, ties to the SMALLEST — random-tie-break LPA is
    neither exact nor replayable) with fixed iterations as the contract
    (sync LPA can oscillate; a convergence loop would be wrong by
    design).  Per iteration one keyed join + count + per-node window
    argmax, labels localCheckpointed (the CC/k-core discipline); the
    oracle replays the recurrence unrolled with MATERIALIZED CTEs.
    Every node's label value-checked."""
    from ..operators.graph import label_propagation

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return label_propagation(edges, iterations=4)


@query(
    "path_profile_spans",
    oracle="""
    WITH t AS (SELECT doc_id, spans FROM read_parquet('__SPANS_GLOB__')),
    u AS (SELECT unnest(spans) AS s FROM t),
    base AS (
      SELECT 'doc_id' AS path, CAST(doc_id AS VARCHAR) AS value FROM t
      UNION ALL SELECT 'spans[].kind', s.kind FROM u
      UNION ALL SELECT 'spans[].text', s.text FROM u
      UNION ALL SELECT 'spans[].media_ref', s.media_ref FROM u
      UNION ALL SELECT 'spans[].offset', CAST(s.offset AS VARCHAR) FROM u
    ),
    agg AS (SELECT path, count(*) AS n,
                   count(*) - count(value) AS n_null,
                   count(DISTINCT value) AS n_distinct
            FROM base GROUP BY path),
    tk AS (SELECT path, value, c,
                  row_number() OVER (PARTITION BY path
                      ORDER BY c DESC, value ASC) AS rank
           FROM (SELECT path, value, count(*) AS c FROM base
                 WHERE value IS NOT NULL GROUP BY 1, 2))
    SELECT a.path, CAST(a.n AS BIGINT) AS n,
           CAST(a.n_null AS BIGINT) AS n_null,
           CAST(a.n_distinct AS BIGINT) AS n_distinct,
           CAST(tk.rank AS INT) AS rank, tk.value,
           CAST(tk.c AS BIGINT) AS value_count
    FROM agg a LEFT JOIN tk ON a.path = tk.path AND tk.rank <= 3
    """,
)
def path_profile_spans(spark, sf_dir) -> DataFrame:
    """Nested path profile of the spans corpus
    (stats.nested_path_profile): per leaf path — doc_id at row grain,
    kind/text/media_ref/offset at span-element grain — row count, NULL
    count, distinct count, and the top-3 values with counts (ties by
    value, exact).  The exploration surface that pairs with schema
    inference; leaves sharing a grain stack through ONE projection
    (F.stack), the element grain adds one explode, top-k is the keyed
    two-stage window.  All rows value-checked vs the DuckDB unnest
    replay."""
    from ..operators.stats import nested_path_profile

    df = load_spans(spark, _spans_corpus(spark))
    return nested_path_profile(df, top_k=3)


def _bfs_oracle(rounds: int) -> str:
    """Unrolled multi-source BFS level-set replay (MATERIALIZED — each
    level references the full visited set; the k-core lesson).  ``rounds``
    must be >= the true eccentricity from the seed set: a too-small unroll
    is missing the far rows and parity fails loudly on row count.  Extra
    rounds are harmless (empty levels)."""
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m),
    l0 AS MATERIALIZED (SELECT DISTINCT m AS node FROM x ORDER BY m LIMIT 3),
    v0 AS MATERIALIZED (SELECT node, 0 AS dist FROM l0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    l{i} AS MATERIALIZED (SELECT DISTINCT e.v AS node
             FROM e JOIN l{i-1} p ON e.u = p.node
             WHERE e.v NOT IN (SELECT node FROM v{i-1})),
    v{i} AS MATERIALIZED (SELECT node, dist FROM v{i-1}
             UNION ALL SELECT node, {i} AS dist FROM l{i})"""
        )
    parts.append(
        f"""
    SELECT node, CAST(dist AS BIGINT) AS dist FROM v{rounds}"""
    )
    return "".join(parts)


@query("bfs_distances_spans_media", oracle=_bfs_oracle(16))
def bfs_distances_spans_media(spark, sf_dir) -> DataFrame:
    """Exact hop distances over the media co-occurrence graph from the
    three lexicographically-smallest media refs (graph.bfs_distances) —
    the blast-radius / provenance-proximity probe: how many co-occurrence
    hops every reference sits from a trusted seed set, in ONE multi-source
    traversal.  Frontier expansion is a keyed join + anti-join per round
    over localCheckpointed frontiers (the CC discipline), terminating on
    an empty frontier — bounded by eccentricity, not vertex count;
    unreachable media are absent by design.  The oracle replays the
    level-set recurrence unrolled 16 rounds with MATERIALIZED CTEs; a
    deeper-than-unrolled graph fails parity loudly on row count.  Every
    (node, dist) row value-checked."""
    from ..operators.graph import bfs_distances

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    seeds = x.select(F.col("m").alias("node")).distinct().orderBy("node").limit(3)
    return bfs_distances(edges, seeds)


@query("msf_spans_media")  # pinned-snapshot oracle (oracle_constants.json)
def msf_spans_media(spark, sf_dir) -> DataFrame:
    """Maximum-similarity spanning forest of the media co-occurrence
    graph (graph.boruvka_msf with weight = −shared_doc_count): the
    minimal edge set keeping every media cluster connected through its
    STRONGEST co-occurrence links — the single-linkage dendrogram edges;
    thresholding it is single-linkage clustering without re-running the
    graph.  Distributed Borůvka: per round one per-component window min
    picks each component's best outgoing edge under the strict total
    order (weight, src, dst) — which makes the forest UNIQUE, Kruskal-
    parity-tested — then 2-cycle-broken pointer jumping contracts the
    merge trees; component count at least halves per round, so rounds ≤
    log2(V).  Deterministic output (partition-invariance pytest), hence
    the pinned snapshot; semantic correctness lives in the Kruskal
    parity tests (tests/test_round4r_ops.py)."""
    from ..operators.graph import boruvka_msf

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .groupBy(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .agg((-F.count(F.lit(1))).cast("double").alias("weight"))
    )
    msf = boruvka_msf(edges)
    return msf.select(
        "src", "dst", (-F.col("weight")).cast("long").alias("shared_docs")
    )


def _hits_edges_sql() -> str:
    return (
        "SELECT doc_id AS src, s.media_ref AS dst "
        "FROM (SELECT doc_id, unnest(spans) AS s "
        "FROM read_parquet('__SPANS_GLOB__')) WHERE s.media_ref IS NOT NULL"
    )


def _hits_oracle() -> str:
    from ..operators.graph import hits_oracle_sql

    return hits_oracle_sql(_hits_edges_sql(), iterations=4)


@query("hits_spans_media", oracle=_hits_oracle())
def hits_spans_media(spark, sf_dir) -> DataFrame:
    """HITS hubs & authorities over the BIPARTITE doc → media graph
    (graph.hits, 4 fixed iterations) — the two curation orderings
    pagerank's co-occurrence projection collapses into one: hub score
    ranks documents aggregating many authoritative assets, authority
    score ranks media anchored by many strong hub documents.
    Exact-integer recurrence (decimal product · integer-division L1
    rescale replaces float normalization), so the oracle replays it
    verbatim — unrolled MATERIALIZED CTE chain generated from the SAME
    definition (graph.hits_oracle_sql).  Every (node, side) score
    value-checked; python-replay parity + partition invariance in
    tests/test_round4u_ops.py."""
    from ..operators.graph import hits

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    edges = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select(
            F.col("doc_id").alias("src"), F.col("sp.media_ref").alias("dst")
        )
    )
    return hits(edges, iterations=4)


@query(
    "graph_summary_spans_media",
    oracle="""
    WITH x AS (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS (SELECT DISTINCT l.m AS a, r.m AS b
          FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m < r.m),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    ds AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                  CAST(sum(d) AS BIGINT) AS sd,
                  CAST(max(d) AS BIGINT) AS mx
           FROM deg),
    pr AS (SELECT du.d AS x, dv.d AS y
           FROM sym JOIN deg du ON du.u = sym.u
                    JOIN deg dv ON dv.u = sym.v),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n2,
                 CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
          FROM pr)
    SELECT ds.nn AS n_nodes,
           CAST(m.n2 / 2 AS BIGINT) AS n_edges,
           CASE WHEN ds.nn >= 2 THEN
             round(2.0 * (CAST(m.n2 AS DOUBLE) / 2.0)
                   / (CAST(ds.nn AS DOUBLE)
                      * (CAST(ds.nn AS DOUBLE) - 1.0)), 6)
           END AS density,
           round(CAST(ds.sd AS DOUBLE) / CAST(ds.nn AS DOUBLE), 6)
             AS avg_degree,
           ds.mx AS max_degree,
           CASE WHEN CAST(m.n2 AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(m.n2 AS DOUBLE) * syy - sy * sy > 0
                THEN round((CAST(m.n2 AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(m.n2 AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(m.n2 AS DOUBLE) * syy - sy * sy)), 6)
           END AS assortativity
    FROM ds, m
    """,
)
def graph_summary_spans_media(spark, sf_dir) -> DataFrame:
    """Structural summary of the media co-occurrence graph
    (graph.graph_summary): node/edge counts, density, degree moments,
    and the degree ASSORTATIVITY — the first thing to check before
    trusting the pagerank/HITS/community readouts over the same graph
    (hub-and-spoke r < 0 vs peer-clustered r > 0; star = −1 and
    regular-graph NULL contracts pytest-pinned).  Exact degrees,
    decimal moments over the symmetrized edge pairs, one round-6
    division.  The single row value-checked."""
    from ..operators.graph import graph_summary

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return graph_summary(edges)
