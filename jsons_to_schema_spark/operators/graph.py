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
