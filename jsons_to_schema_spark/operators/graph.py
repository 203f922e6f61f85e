"""Graph centrality over reference graphs (round-4 wave 36).

The corpus-curation graphs this engine already builds — duplicate-pair
graphs (dedup.connected_components), the doc ↔ media_ref bipartite graph
from span documents — support more than component labelling: PageRank over
the doc↔media graph ranks shared assets and hub documents for curation
triage (which media to validate first; which documents anchor a cluster).

Exact-integer semantics: every rank is a BIGINT in micro-units, every
update uses integer division, so the fixed-iteration result is
deterministic, partition-order-free, and bit-identical in any engine —
the DuckDB oracle replays the recurrence verbatim (generated, unrolled).
Floating-point power iteration would accumulate engine-specific low bits
over iterations; integers cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank with exact-integer arithmetic.

    Semantics (the recurrence IS the contract — the oracle replays it):

    - edges are DEDUPLICATED (multi-edges carry no extra weight);
    - nodes = distinct(src) ∪ distinct(dst); rank_0(v) = 1_000_000;
    - contribution(u) = rank(u) div outdeg(u)  (integer division);
    - dangling nodes (no out-edges) redistribute: dm = (Σ dangling ranks)
      div N;
    - rank_{i+1}(v) = (100 − d)·10_000 + (d · (Σ_{u→v} contribution(u)
      + dm)) div 100,  d = damping_pct.

    Integer remainders are dropped (total mass decays by < N per
    iteration — bounded, documented); with the default d = 85 the teleport
    term is exactly 150_000.  Returns (node, rank_micro: long,
    rank: double = round(rank_micro / 1e6, 6)).

    Scale shape: out-degrees and the node spine are one-time aggregates of
    the deduped edge list; each iteration is ranks ⋈ outdeg (node-aligned)
    → broadcast-free join to edges on src → groupBy dst — the canonical
    per-iteration shuffle.  Edges and outdeg are lazily pinned once and
    reused every iteration; ranks are eagerly localCheckpointed per
    iteration so the plan stays constant-size (same discipline as
    dedup.connected_components).  The dangling total is a one-scalar
    aggregate per iteration, never a data-sized collect.
    """
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, got {iterations}")
    if not 1 <= damping_pct <= 99:
        raise ValueError(
            f"pagerank: damping_pct must be in [1, 99], got {damping_pct}"
        )
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint(
        eager=False
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list")
    teleport = (100 - damping_pct) * 10_000
    ranks = nodes.select("node", F.lit(_UNIT).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["_s"], "left"
        ).select(
            ranks["node"],
            "rank_micro",
            "_deg",
            F.expr("rank_micro div _deg").alias("_contrib"),
        )
        dm = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).alias("_t"))
            .collect()[0]["_t"]
            // n_nodes
        )
        inbound = (
            e.join(with_deg.filter(F.col("_deg").isNotNull()),
                   e["_s"] == with_deg["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("_contrib").alias("_inb"))
        )
        ranks = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(_inb, 0) + {dm})) div 100"
                    )
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node",
        "rank_micro",
        F.round(F.col("rank_micro") / F.lit(float(_UNIT)), 6).alias("rank"),
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 8,
    damping_pct: int = 85,
) -> str:
    """The DuckDB replay of :func:`pagerank` — the recurrence unrolled into
    one CTE chain (generated here so both engines share one definition).
    ``edges_sql`` must select columns (src, dst)."""
    teleport = (100 - damping_pct) * 10_000
    parts = [
        f"WITH eraw AS ({edges_sql})",
        "e AS (SELECT DISTINCT src AS s, dst AS d FROM eraw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "outd AS (SELECT s, count(*) AS deg FROM e GROUP BY 1)",
        "nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({_UNIT} AS BIGINT) AS rank_micro FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"dm{i} AS (SELECT coalesce(sum(r.rank_micro), 0) // nn.n AS dm"
            f" FROM nn LEFT JOIN (SELECT r.* FROM r{p} r LEFT JOIN outd o"
            f" ON r.node = o.s WHERE o.s IS NULL) r ON true GROUP BY nn.n)"
        )
        parts.append(
            f"s{i} AS (SELECT e.d AS node,"
            f" sum(r.rank_micro // o.deg) AS inb"
            f" FROM e JOIN r{p} r ON e.s = r.node"
            f" JOIN outd o ON o.s = e.s GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({teleport} +"
            f" ({damping_pct} * (coalesce(s.inb, 0) + d.dm)) // 100"
            f" AS BIGINT) AS rank_micro"
            f" FROM nodes n LEFT JOIN s{i} s ON n.node = s.node, dm{i} d)"
        )
    body = ", ".join(parts[1:])
    return (
        f"{parts[0]}, {body} "
        f"SELECT node, rank_micro,"
        f" round(rank_micro / {float(_UNIT)!r}, 6) AS rank"
        f" FROM r{iterations}"
    )


# ---------------------------------------------------------------------------
# Incremental connected components (round-4 wave 40)
# ---------------------------------------------------------------------------


def incremental_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fold a BATCH of new edges into an existing min-label component
    assignment without re-running CC over the corpus — the daily-ingest
    move for a 10^12-node dedup campaign (the graph analogue of
    dedup's incremental MinHash probe):

    1. map each new-edge endpoint to its current label (unknown nodes
       label themselves);
    2. contract: distinct (label_a, label_b) pairs with label_a ≠ label_b
       form the REDUCED graph — bounded by the components the batch
       touches, never corpus-sized;
    3. run the full large-star/small-star CC on the reduced graph
       (dedup.duplicate_clusters — O(log² k) rounds on k touched labels);
    4. remap: any node whose old label gained a smaller root moves to it;
       new nodes take their own root.

    Because existing labels are component-minimum ids and new nodes label
    themselves, the contraction preserves minima EXACTLY:
    the output equals ``duplicate_clusters(old_pairs ∪ new_pairs)``
    bit-for-bit (property-tested; the driver oracle recomputes the batch
    answer from scratch via a recursive CTE).

    Scale shape: one labels⋈batch join per endpoint (batch-sized), the
    reduced CC (touched-labels-sized), then ONE labels⋈remap join — the
    corpus labels table shuffles once on the label key, and AQE broadcasts
    the remap when the batch is small.  Returns (id_col, cluster_col)
    covering old nodes ∪ new-edge endpoints.
    """
    for c, frame, fname in (
        (id_col, labels, "labels"),
        (cluster_col, labels, "labels"),
        (id_a, new_pairs, "new_pairs"),
        (id_b, new_pairs, "new_pairs"),
    ):
        if c not in frame.columns:
            raise ValueError(
                f"incremental_components: column {c!r} not in {fname}"
            )
    from .dedup import duplicate_clusters

    lab = labels.select(
        F.col(id_col).alias("_n"), F.col(cluster_col).alias("_l")
    ).localCheckpoint(eager=False)
    pairs = new_pairs.select(
        F.col(id_a).alias("_a"), F.col(id_b).alias("_b")
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    mapped = (
        pairs.join(lab.withColumnRenamed("_n", "_a"), "_a", "left")
        .withColumnRenamed("_l", "_la")
        .join(
            lab.select(F.col("_n").alias("_b"), F.col("_l").alias("_lb")),
            "_b",
            "left",
        )
        .select(
            F.coalesce(F.col("_la"), F.col("_a")).alias("_ra"),
            F.coalesce(F.col("_lb"), F.col("_b")).alias("_rb"),
        )
        .localCheckpoint(eager=False)
    )
    reduced = mapped.filter(F.col("_ra") != F.col("_rb"))
    # new-edge endpoints unknown to `labels` enter the output as themselves
    # (or via the remap when their label-root merged)
    new_nodes = (
        pairs.select(F.col("_a").alias("_n"))
        .union(pairs.select(F.col("_b").alias("_n")))
        .join(lab.select("_n"), "_n", "left_anti")
        .distinct()
        .select("_n", F.col("_n").alias("_l"))
    )
    universe = lab.unionByName(new_nodes)
    if reduced.isEmpty():
        return universe.select(
            F.col("_n").alias(id_col), F.col("_l").alias(cluster_col)
        )
    remap = duplicate_clusters(reduced, id_a="_ra", id_b="_rb").select(
        F.col("id").alias("_l"), F.col("cluster").alias("_newl")
    )
    return universe.join(remap, "_l", "left").select(
        F.col("_n").alias(id_col),
        F.coalesce(F.col("_newl"), F.col("_l")).alias(cluster_col),
    )


# ---------------------------------------------------------------------------
# Triangle counting — degree-ordered orientation (wave 39)
# ---------------------------------------------------------------------------

def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over an UNDIRECTED simple graph given as
    an edge list (any direction, multi-edges and self-loops tolerated —
    canonicalized and dropped up front).  Returns (node, triangles) for
    every vertex in >= 1 triangle; each triangle contributes exactly 1 to
    each of its three corners.

    Scale shape — the MapReduce-canonical algorithm (Suri-Vassilvitskii
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    orient every edge from its lower endpoint to its higher endpoint under
    the total order (degree, node).  Out-degrees under this orientation
    are O(sqrt(m)) regardless of skew — a celebrity vertex with 10^8
    followers generates NO wedges of its own because nearly all its edges
    point INTO it.  Wedges come from a self-join of the oriented list
    keyed on the low vertex; each wedge (v, w) closes iff the oriented
    edge v->w exists — one more keyed equi-join.  Every shuffle is keyed
    (vertex or vertex-pair); nothing is quadratic in a hub's degree and
    nothing sorts globally.  The struct comparison (deg, node) is Spark's
    native lexicographic struct ordering — ties on degree break by node,
    so the orientation is total and deterministic."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct()
    )
    deg = (
        canon.select(F.col("_a").alias("_n"))
        .unionAll(canon.select(F.col("_b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    withdeg = (
        canon.join(deg.withColumnRenamed("_n", "_a").withColumnRenamed("_d", "_da"), "_a")
        .join(deg.withColumnRenamed("_n", "_b").withColumnRenamed("_d", "_db"), "_b")
    )
    ka = F.struct(F.col("_da").alias("d"), F.col("_a").alias("n"))
    kb = F.struct(F.col("_db").alias("d"), F.col("_b").alias("n"))
    oriented = withdeg.select(
        F.when(ka < kb, F.col("_a")).otherwise(F.col("_b")).alias("u"),
        F.when(ka < kb, F.col("_b")).otherwise(F.col("_a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("vk"),
    ).localCheckpoint(eager=False)  # reused 3x below (wedge x2 + close)

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.vk") < F.col("e2.vk")),
    ).select(
        F.col("e1.u").alias("x"),
        F.col("e1.v").alias("y"),
        F.col("e2.v").alias("z"),
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("y"), F.col("v").alias("z")),
        ["y", "z"],
    )
    return (
        closed.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


# ---------------------------------------------------------------------------
# k-core decomposition — iterative peeling (wave 44)
# ---------------------------------------------------------------------------

def kcore_members(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Members of the k-core of an undirected simple graph — the maximal
    subgraph where every vertex keeps degree >= k — with each member's
    degree INSIDE the core.  The spam/boilerplate community filter for
    reference graphs: low-core vertices are peripheral, high-core sits in
    densely duplicated neighborhoods.

    Algorithm: iterative peeling to the greatest fixpoint — drop every
    vertex with current degree < k, recompute degrees over the surviving
    subgraph, repeat until no vertex drops.  Each round is one keyed
    degree aggregate + one semi-join filter over the (shrinking) edge
    list; the live edge set is localCheckpointed per round so the plan
    stays constant-size across rounds (the connected-components
    discipline).  Rounds are bounded by the peeling depth (<= graph
    degeneracy ladder, tiny in practice); ``max_rounds`` without
    convergence raises rather than returning a non-fixpoint.  Returns
    (node, degree) for the k-core; empty frame when the core is empty."""
    if k < 1:
        raise ValueError(f"kcore_members: k must be >= 1, got {k}")
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct()
    )
    sym = canon.select(F.col("_a").alias("u"), F.col("_b").alias("v")).unionAll(
        canon.select(F.col("_b").alias("u"), F.col("_a").alias("v"))
    )
    live = sym.localCheckpoint(eager=False)
    for _ in range(max_rounds):
        deg = live.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("u")
        nxt = (
            live.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        # fixpoint when no directed edge was dropped this round
        n_live, n_next = live.count(), nxt.count()
        if n_next == n_live:
            # degrees over the surviving subgraph ARE >= k by fixpoint
            return (
                live.groupBy(F.col("u").alias("node"))
                .agg(F.count(F.lit(1)).cast("long").alias("degree"))
                .filter(F.col("degree") >= k)
            )
        live = nxt
        if n_next == 0:
            return live.select(
                F.col("u").alias("node"), F.lit(0).cast("long").alias("degree")
            )
    raise RuntimeError(
        f"kcore_members: no fixpoint after {max_rounds} rounds — raise max_rounds"
    )


# ---------------------------------------------------------------------------
# Label propagation — fixed-iteration synchronous LPA (wave 45)
# ---------------------------------------------------------------------------

def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community labels by synchronous label propagation: every vertex
    starts as its own label; each iteration every vertex adopts the most
    frequent label among its neighbors, ties broken by SMALLEST label —
    the deterministic tie-break that makes fixed-iteration output exact
    and engine-replayable (free-running LPA with random tie-breaks is
    neither).  Fixed ``iterations`` IS the contract (the pagerank
    convention): synchronous LPA can oscillate on bipartite structures,
    so a convergence loop would be wrong by design.

    Per iteration: one keyed join (symmetric edges ⋈ labels on the
    neighbor end), one (node, label) count aggregate, one per-node
    window argmax — all keyed by vertex, nothing global; labels are
    localCheckpointed each round so the plan stays constant-size (the
    CC/k-core discipline).  Returns (node, label)."""
    if iterations < 1:
        raise ValueError(
            f"label_propagation: iterations must be >= 1, got {iterations}"
        )
    from pyspark.sql import Window

    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct()
    )
    sym = (
        canon.select(F.col("_a").alias("u"), F.col("_b").alias("v"))
        .unionAll(canon.select(F.col("_b").alias("u"), F.col("_a").alias("v")))
        .localCheckpoint(eager=False)  # reused every iteration
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("v").orderBy(F.desc("_c"), F.asc("label"))
    for _ in range(iterations):
        labels = (
            sym.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("v").alias("node"), "label")
            .localCheckpoint(eager=True)  # constant-size plan per round
        )
    return labels


# ---------------------------------------------------------------------------
# Multi-source BFS hop distances — wave 48
# ---------------------------------------------------------------------------

def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """Exact hop distance from a SEED SET to every reachable vertex of an
    undirected simple graph — the "how far is this asset from the trusted
    core" question (seed = verified/canonical media, distance = how many
    co-occurrence hops a reference sits from them; also the blast-radius
    probe for a corrupted asset).  Multi-source: distance is the MINIMUM
    over all seeds, computed in one traversal, not |seeds| traversals.

    Frontier expansion: round r joins the current frontier (nodes first
    reached at distance r) against the symmetric edge list, anti-joins the
    already-visited set, and stamps the survivors r+1.  Each round is one
    keyed join + one anti-join + one distinct over the (shrinking)
    frontier; visited/frontier are localCheckpointed so the plan stays
    constant-size across rounds (the CC/k-core discipline).  Terminates
    when the frontier empties — bounded by graph eccentricity, NOT by the
    vertex count; ``max_rounds`` without termination raises rather than
    returning a partial distance map.  Returns (node, dist) for every
    REACHED vertex (seeds at 0); unreachable vertices are absent, which
    keeps the output size proportional to the reached region.

    Seeds not present in the edge list still appear at distance 0 — a
    seed with no edges is trivially reached."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct()
    )
    sym = (
        canon.select(F.col("_a").alias("u"), F.col("_b").alias("v"))
        .unionAll(canon.select(F.col("_b").alias("u"), F.col("_a").alias("v")))
        .localCheckpoint(eager=False)  # reused every round
    )
    frontier = (
        seeds.select(F.col(seeds.columns[0]).cast("string").alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier.select("node", F.lit(0).cast("long").alias("dist"))
    visited = visited.localCheckpoint(eager=False)
    for r in range(1, max_rounds + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.rdd.isEmpty():
            return visited
        visited = visited.unionAll(
            nxt.select("node", F.lit(r).cast("long").alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(
        f"bfs_distances: frontier still non-empty after {max_rounds} rounds "
        "— raise max_rounds"
    )


# ---------------------------------------------------------------------------
# Borůvka minimum spanning forest — wave 48
# ---------------------------------------------------------------------------

def boruvka_msf(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 40,
) -> DataFrame:
    """Minimum spanning FOREST by distributed Borůvka — the similarity
    backbone: run on a near-duplicate or co-occurrence graph with
    weight = −similarity, the MSF is the maximum-similarity tree per
    component, i.e. the minimal edge set that keeps every cluster
    connected through its strongest links (single-linkage dendrogram
    edges; cutting it at a threshold IS single-linkage clustering).

    Determinism: edges are totally ordered by (weight, u, v) after
    canonicalizing u<v, so the MSF is UNIQUE even with duplicate weights
    — the classic tie-break-total-order argument; Kruskal under the same
    order produces the identical edge set (pytest parity).

    Per round (Borůvka halves the component count, so ≤ log2(V) rounds):
      1. one join stamps each edge with its endpoints' current component
         labels; intra-component edges drop out;
      2. one per-component window min picks each component's lightest
         outgoing edge under the total order — those edges join the
         forest (distinct: both endpoints may pick the same edge);
      3. the chosen edges form a pointer pseudo-forest on component
         labels whose only cycles are 2-cycles (mutual lightest choice —
         a strict total order forces both to pick the SAME edge); the
         smaller label of each 2-cycle becomes a root, then pointer
         jumping (parent ← parent[parent], ≤ log rounds each a self-join)
         contracts every merge tree to its root;
      4. component labels re-point at the roots.
    Everything is keyed joins/aggregates over the (shrinking) cross-
    component edge list; labels and survivors are localCheckpointed so
    the plan stays constant-size (the CC discipline).  Raises on
    ``max_rounds`` without a fixpoint instead of returning a partial
    forest.  Returns (src, dst, weight) with src<dst, exactly
    V − #components rows."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(
            a.cast("string").alias("eu"),
            b.cast("string").alias("ev"),
            F.col(weight).cast("double").alias("w"),
        )
        .filter(F.col("eu") != F.col("ev"))
        .filter(F.col("eu").isNotNull() & F.col("ev").isNotNull())
        .groupBy("eu", "ev")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the lightest
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    comp = (
        canon.select(F.col("eu").alias("node"))
        .unionAll(canon.select(F.col("ev").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("c"))
        .localCheckpoint(eager=False)
    )
    live = canon
    chosen_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        ec = (
            live.join(
                comp.select(F.col("node").alias("eu"), F.col("c").alias("cu")),
                "eu",
            )
            .join(
                comp.select(F.col("node").alias("ev"), F.col("c").alias("cv")),
                "ev",
            )
            .filter(F.col("cu") != F.col("cv"))
            .localCheckpoint(eager=True)
        )
        if ec.rdd.isEmpty():
            out = comp.sparkSession.createDataFrame(
                [], "src string, dst string, weight double"
            )
            for p in chosen_parts:
                out = out.unionAll(p)
            return out.distinct()
        sym = ec.select(
            F.col("cu").alias("c"), F.col("cv").alias("oc"), "w", "eu", "ev"
        ).unionAll(
            ec.select(
                F.col("cv").alias("c"), F.col("cu").alias("oc"), "w", "eu", "ev"
            )
        )
        wmin = Window.partitionBy("c").orderBy(
            F.asc("w"), F.asc("eu"), F.asc("ev")
        )
        picked = (
            sym.withColumn("_rn", F.row_number().over(wmin))
            .filter(F.col("_rn") == 1)
            .select("c", "oc", "w", "eu", "ev")
            .localCheckpoint(eager=True)
        )
        chosen_parts.append(
            picked.select(
                F.col("eu").alias("src"),
                F.col("ev").alias("dst"),
                F.col("w").alias("weight"),
            ).distinct()
        )
        # pointer graph on component labels: c → oc; only 2-cycles exist
        parent = picked.select("c", F.col("oc").alias("p"))
        two = parent.alias("x").join(
            parent.alias("y"),
            (F.col("x.p") == F.col("y.c")) & (F.col("y.p") == F.col("x.c")),
            "left",
        )
        parent = two.select(
            F.col("x.c").alias("c"),
            F.when(
                F.col("y.c").isNotNull() & (F.col("x.c") < F.col("x.p")),
                F.col("x.c"),  # smaller side of a 2-cycle roots itself
            )
            .otherwise(F.col("x.p"))
            .alias("p"),
        ).localCheckpoint(eager=True)
        # pointer jumping to the roots (≤ log depth; raises if not done)
        for _j in range(max_rounds):
            jumped = (
                parent.alias("x")
                .join(
                    parent.select(
                        F.col("c").alias("p"), F.col("p").alias("gp")
                    ).alias("y"),
                    "p",
                    "left",
                )
                .select(
                    "c", F.coalesce(F.col("gp"), F.col("p")).alias("p")
                )
                .localCheckpoint(eager=True)
            )
            if (
                jumped.alias("n")
                .join(parent.alias("o"), "c")
                .filter(F.col("n.p") != F.col("o.p"))
                .rdd.isEmpty()
            ):
                parent = jumped
                break
            parent = jumped
        else:
            raise RuntimeError("boruvka_msf: pointer jumping did not converge")
        comp = (
            comp.join(parent.select(F.col("c"), F.col("p")), "c", "left")
            .select("node", F.coalesce("p", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
        live = (
            live.join(
                comp.select(F.col("node").alias("eu"), F.col("c").alias("cu")),
                "eu",
            )
            .join(
                comp.select(F.col("node").alias("ev"), F.col("c").alias("cv")),
                "ev",
            )
            .filter(F.col("cu") != F.col("cv"))
            .select("eu", "ev", "w")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"boruvka_msf: no fixpoint after {max_rounds} rounds — raise max_rounds"
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities — wave 51
# ---------------------------------------------------------------------------

def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Fixed-iteration HITS with exact-integer arithmetic — the bipartite
    centrality pagerank throws away: on the doc → media graph, HUB score
    ranks documents that aggregate many authoritative assets and
    AUTHORITY score ranks media anchored by many strong hub documents —
    two DIFFERENT curation orderings from one pass (pagerank's projection
    collapses them into one).

    Semantics (the recurrence IS the contract — the oracle replays it):

    - edges deduplicated; hub side = distinct(src), authority side =
      distinct(dst) (a node id may appear on both sides; scores are
      per-side, keyed by the ``side`` output column);
    - h₀ = a₀ = 1_000_000;
    - a'ᵢ(v) = Σ_{u→v} hᵢ₋₁(u), then L1-rescale to the side's total mass:
      aᵢ(v) = a'ᵢ(v) · (N_auth · 1_000_000) div Σ a'ᵢ  (integer division,
      exact decimal(38,0) product — the rescale replaces float
      normalization and keeps every iteration bit-replayable);
    - hᵢ from aᵢ the same way with N_hub.  Floor remainders decay total
      mass by < N per rescale — bounded, documented (the pagerank
      convention).

    Scale shape: per iteration two keyed join+aggregate rounds over the
    pinned edge list; score frames are localCheckpointed per iteration
    (constant-size plans, the CC discipline); the rescale totals are
    one-scalar aggregates, never data-sized collects.

    Returns (node, side ∈ {hub, authority}, score_micro, score =
    round(micro/1e6, 6))."""
    if iterations < 1:
        raise ValueError(f"hits: iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    hn = e.select(F.col("_s").alias("node")).distinct().localCheckpoint(eager=False)
    an = e.select(F.col("_d").alias("node")).distinct().localCheckpoint(eager=False)
    ns, nd = hn.count(), an.count()
    if ns == 0:
        raise ValueError("hits: empty edge list")
    th, ta = ns * _UNIT, nd * _UNIT
    h = hn.select("node", F.lit(_UNIT).cast("long").alias("sc"))
    a = an.select("node", F.lit(_UNIT).cast("long").alias("sc"))

    def _step(scores: DataFrame, out_node: str, in_node: str, target: int):
        raw = (
            e.join(scores, e[in_node] == scores["node"])
            .groupBy(F.col(out_node).alias("node"))
            .agg(F.sum(F.col("sc").cast("decimal(38,0)")).alias("_raw"))
        )
        total = raw.agg(F.sum("_raw").alias("_t")).collect()[0]["_t"]
        if total is None or int(total) <= 0:
            raise RuntimeError("hits: zero total mass — degenerate graph")
        return raw.select(
            "node",
            F.expr(
                f"CAST(CAST(_raw AS DECIMAL(38,0)) * {target} DIV {int(total)} AS BIGINT)"
            ).alias("sc"),
        ).localCheckpoint()

    for _ in range(iterations):
        a = _step(h, "_d", "_s", ta)
        h = _step(a, "_s", "_d", th)
    out = h.select(
        "node", F.lit("hub").alias("side"), F.col("sc").alias("score_micro")
    ).unionAll(
        a.select("node", F.lit("authority").alias("side"), F.col("sc").alias("score_micro"))
    )
    return out.select(
        "node",
        "side",
        "score_micro",
        F.round(F.col("score_micro") / F.lit(float(_UNIT)), 6).alias("score"),
    )


def hits_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """DuckDB replay of :func:`hits` — the recurrence unrolled into one
    MATERIALIZED CTE chain (each score frame is referenced twice per
    round: the join and the rescale total — the k-core inlining lesson).
    ``edges_sql`` must select columns (src, dst)."""
    parts = [
        f"WITH eraw AS ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM eraw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "hn AS MATERIALIZED (SELECT DISTINCT s AS node FROM e)",
        "an AS MATERIALIZED (SELECT DISTINCT d AS node FROM e)",
        "cs AS (SELECT count(*) AS n FROM hn)",
        "cd AS (SELECT count(*) AS n FROM an)",
        f"h0 AS MATERIALIZED (SELECT node, CAST({_UNIT} AS BIGINT) AS sc FROM hn)",
        f"a0 AS MATERIALIZED (SELECT node, CAST({_UNIT} AS BIGINT) AS sc FROM an)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.d AS node,"
            f" CAST(sum(h.sc) AS HUGEINT) AS raw"
            f" FROM e JOIN h{p} h ON e.s = h.node GROUP BY 1)"
        )
        parts.append(f"at{i} AS (SELECT sum(raw) AS t FROM ar{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT ar.node,"
            f" CAST(ar.raw * (cd.n * {_UNIT}) // at.t AS BIGINT) AS sc"
            f" FROM ar{i} ar, at{i} at, cd)"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.s AS node,"
            f" CAST(sum(a.sc) AS HUGEINT) AS raw"
            f" FROM e JOIN a{i} a ON e.d = a.node GROUP BY 1)"
        )
        parts.append(f"ht{i} AS (SELECT sum(raw) AS t FROM hr{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT hr.node,"
            f" CAST(hr.raw * (cs.n * {_UNIT}) // ht.t AS BIGINT) AS sc"
            f" FROM hr{i} hr, ht{i} ht, cs)"
        )
    body = ", ".join(parts[1:])
    return (
        f"{parts[0]}, {body} "
        f"SELECT node, 'hub' AS side, sc AS score_micro,"
        f" round(sc / {float(_UNIT)!r}, 6) AS score FROM h{iterations}"
        f" UNION ALL "
        f"SELECT node, 'authority' AS side, sc AS score_micro,"
        f" round(sc / {float(_UNIT)!r}, 6) AS score FROM a{iterations}"
    )


# ---------------------------------------------------------------------------
# Graph summary + degree assortativity — wave 79
# ---------------------------------------------------------------------------

def graph_summary(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row structural summary of an undirected simple graph: node and
    edge counts, density, degree moments, and the DEGREE ASSORTATIVITY
    coefficient — the Pearson correlation of endpoint degrees over
    edges, the single number that separates hub-and-spoke reference
    graphs (r < 0: big assets link to small documents — typical media
    co-occurrence) from peer-clustered ones (r > 0), and the first thing
    to check before trusting a community or centrality readout.

    Exactness: degrees are exact longs; assortativity folds the degree
    pairs of the SYMMETRIZED edge list (each undirected edge contributes
    both orientations — the standard convention) through exact
    decimal(38,0) moments with one round-6 division; density and the
    degree moments likewise.  NULL/self-loop edges drop (simple-graph
    contract).  Shape: one dedup pass, one degree aggregate, one
    edge ⋈ degree join per endpoint, one moment fold — all keyed;
    assortativity is NULL for degree-regular graphs (zero variance).

    Output: one row (n_nodes, n_edges, density, avg_degree, max_degree,
    assortativity)."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    canon = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)  # feeds degrees AND the pair fold
    )
    sym = canon.select(F.col("_a").alias("u"), F.col("_b").alias("v")).unionAll(
        canon.select(F.col("_b").alias("u"), F.col("_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("_d"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("_nn"),
        F.sum("_d").cast("long").alias("_sd"),
        F.max("_d").alias("_mx"),
    )
    pairs = (
        sym.join(deg.select(F.col("u"), F.col("_d").alias("_du")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("_d").alias("_dv")), "v"
        )
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("_m2"),
        F.sum(dec(F.col("_du"))).alias("_sx"),
        F.sum(dec(F.col("_dv"))).alias("_sy"),
        F.sum(dec(F.col("_du")) * F.col("_du")).alias("_sxx"),
        F.sum(dec(F.col("_dv")) * F.col("_dv")).alias("_syy"),
        F.sum(dec(F.col("_du")) * F.col("_dv")).alias("_sxy"),
    )
    j = dstats.crossJoin(F.broadcast(mom))
    nn = F.col("_nn").cast("double")
    m = F.col("_m2").cast("double") / F.lit(2.0)  # undirected edge count
    n2 = F.col("_m2").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx, vy = n2 * sxx - sx * sx, n2 * syy - sy * sy
    r = F.when(
        (vx > 0.0) & (vy > 0.0),
        F.round((n2 * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 6),
    )
    return j.select(
        F.col("_nn").alias("n_nodes"),
        m.cast("long").alias("n_edges"),
        F.when(
            F.col("_nn") >= 2,
            F.round(
                F.lit(2.0) * m / (nn * (nn - F.lit(1.0))), 6
            ),
        ).alias("density"),
        F.round(F.col("_sd").cast("double") / nn, 6).alias("avg_degree"),
        F.col("_mx").alias("max_degree"),
        r.alias("assortativity"),
    )
