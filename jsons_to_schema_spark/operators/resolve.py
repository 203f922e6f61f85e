"""Golden-record survivorship: the MERGE step of entity resolution.

The dedup family finds duplicate clusters (``dedup.duplicate_clusters``,
``dedup.fuzzy_join``/``fuzzy_self_pairs``) and the curation funnel keeps a
representative row — but a real master-data pipeline does not keep ONE
member, it FUSES the cluster: the freshest status, the maximum observed
amount, the most frequently asserted category.  ``survivorship`` is that
fuse, with per-column rules, expressed as one skew-safe grouped aggregate
plus one bounded join per frequency-rule column.

Rules:

* ``latest`` / ``earliest`` — the column value from the cluster row with
  the max/min ``seq_col``, considering ONLY rows where the column is
  non-NULL (a fresher row with a missing attribute must not erase an
  older observed one — the completeness-beats-recency convention).
  Expressed as ``max_by(c, CASE WHEN c IS NOT NULL THEN seq END)``:
  NULL ordering keys never win in Spark's max_by, and DuckDB's arg_max
  ignores NULL-valued ordering rows identically (probed, not assumed).
  Contract: ``seq_col`` must be tie-free within a cluster among rows
  where the column is non-NULL (e.g. a unique event/record id) — a tie
  would make the winner engine-unspecified.
* ``max`` / ``min`` — plain null-skipping extremes.
* ``mode`` — the most frequent non-NULL value, ties broken by value
  ascending (deterministic under any partitioning).  Each mode column
  costs one extra groupBy bounded by the cluster×distinct-value
  cardinality (values collapse — never row-sized) and one keyed join
  back that reuses the cluster hash partitioning.

An all-NULL column within a cluster resolves to NULL under every rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

_RULES = ("latest", "earliest", "max", "min", "mode")


def survivorship(
    df: DataFrame,
    cluster_col: str,
    rules: "dict[str, str]",
    seq_col: "str | None" = None,
) -> DataFrame:
    """One golden record per cluster: ``rules`` maps column → rule (see
    module docstring).  Output: (cluster_col, n_members, *resolved columns
    under their original names), one row per cluster — clusters are the
    unit of output, so even a cluster of one row passes through its
    values verbatim.

    Shape: ONE corpus-sized shuffle (the grouped aggregate on the cluster
    key, map-side partial); mode columns add value-bounded groupBys and
    cluster-keyed joins that reuse the same partitioning.  Skewed giant
    clusters hit the same single-aggregate path the stats family uses —
    no per-cluster sort, no window over the corpus."""
    if not rules:
        raise ValueError("survivorship: rules must be non-empty")
    bad = {c: r for c, r in rules.items() if r not in _RULES}
    if bad:
        raise ValueError(f"survivorship: unknown rules {bad} (allowed {_RULES})")
    if cluster_col in rules:
        raise ValueError("survivorship: cluster_col cannot carry a rule")
    needs_seq = [c for c, r in rules.items() if r in ("latest", "earliest")]
    if needs_seq and not seq_col:
        raise ValueError(
            f"survivorship: columns {needs_seq} need seq_col for latest/earliest"
        )
    if seq_col in rules:
        raise ValueError("survivorship: seq_col cannot carry a rule")

    aggs = [F.count(F.lit(1)).alias("n_members")]
    for c, r in rules.items():
        if r == "latest":
            aggs.append(
                F.expr(
                    f"max_by({c}, CASE WHEN {c} IS NOT NULL THEN {seq_col} END)"
                ).alias(c)
            )
        elif r == "earliest":
            aggs.append(
                F.expr(
                    f"min_by({c}, CASE WHEN {c} IS NOT NULL THEN {seq_col} END)"
                ).alias(c)
            )
        elif r == "max":
            aggs.append(F.max(c).alias(c))
        elif r == "min":
            aggs.append(F.min(c).alias(c))
        else:  # mode: resolved separately, bounded by distinct values
            continue
    golden = df.groupBy(cluster_col).agg(*aggs)

    for c, r in rules.items():
        if r != "mode":
            continue
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("_n").desc(), F.col(c).asc()
        )
        winner = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(cluster_col, c)
        )
        golden = golden.join(winner, cluster_col, "left")

    # re-emit in a stable column order: cluster, n_members, rules order
    return golden.select(cluster_col, "n_members", *rules.keys())


def fingerprint_clusters(
    df: DataFrame, col: str, min_values: int = 2
) -> DataFrame:
    """Key-collision value clustering — the OpenRefine 'fingerprint'
    method, the standard first pass of interactive data cleaning: values
    that normalize to the same key (trim → lowercase → punctuation to
    spaces → whitespace-split → distinct → sort → rejoin) are spelling /
    formatting variants of one canonical value ('Acme Corp.', ' ACME
    corp', 'acme-corp' all key to 'acme corp').  Complements the
    similarity dedup family: exact on the normalized key, so zero
    false candidates and no banding parameters.

    Shape: everything is bounded by DISTINCT raw values, never rows —
    the first groupBy collapses the corpus to (fingerprint, value, count)
    with map-side partials, the second folds values per key.  The member
    list is the sorted distinct raw values joined by '|' (cross-engine
    comparable; a giant pathological cluster would be caught by the
    n_values count before the string could grow unbounded).

    NULL values carry no evidence; an all-punctuation value keys to the
    empty fingerprint and clusters with its like.  Only keys with at
    least ``min_values`` DISTINCT raw spellings are reported — a key with
    one spelling needs no cleaning.

    Output: (fingerprint, n_values, n_rows, members), one row per
    reported cluster."""
    if min_values < 1:
        raise ValueError("fingerprint_clusters: min_values must be >= 1")
    c = F.col(col)
    fp = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower(F.trim(c)), "[^a-z0-9]+", " "),
                        " ",
                    ),
                    lambda x: x != "",
                )
            )
        ),
        " ",
    )
    per_val = (
        df.filter(c.isNotNull())
        .select(fp.alias("fingerprint"), c.alias("_v"))
        .groupBy("fingerprint", "_v")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        per_val.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("_n").alias("n_rows"),
            F.array_join(F.array_sort(F.collect_list("_v")), "|").alias(
                "members"
            ),
        )
        .filter(F.col("n_values") >= F.lit(int(min_values)))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key_col: str,
    block_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate generation — the third classic
    blocking strategy beside LSH (``dedup``/``similarity``) and key
    collision (``fingerprint_clusters``): within each block, rows sort by
    a key (e.g. a name or a normalized address) and every pair within
    ``window`` rank positions becomes a candidate.  Catches near-misses
    that hash-exact blocking splits (``smith, john`` / ``smyth, john``
    sort adjacently but fingerprint apart).

    Scale contract: ``block_col`` is REQUIRED — the sort runs per block
    (one keyed exchange + within-partition sort), never globally; an
    unpartitioned sorted-neighborhood pass would serialize the corpus
    through one task.  Use a coarse prefix/soundex/segment block for a
    "global" pass.  Pair fan-out is rows × window by construction.

    Determinism: ranks order by (sort_key, id) — tie-free for unique ids
    — so candidate pairs are stable under any partitioning.  NULL ids,
    keys, or blocks carry no evidence and are excluded.

    Output: (block, id_a, id_b, key_a, key_b, rank_distance 1..window),
    where id_a is the lower-ranked (sort-order) member."""
    if window < 1:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 1")
    from pyspark.sql import Window as W

    src = df.filter(
        F.col(id_col).isNotNull()
        & F.col(sort_key_col).isNotNull()
        & F.col(block_col).isNotNull()
    ).select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("_id"),
        F.col(sort_key_col).alias("_key"),
    )
    w = W.partitionBy("block").orderBy(F.col("_key").asc(), F.col("_id").asc())
    ranked = src.select(
        "block", "_id", "_key", F.row_number().over(w).alias("_r")
    ).localCheckpoint(eager=False)  # feeds both sides of the rank join
    left = ranked.withColumn(
        "_off", F.explode(F.sequence(F.lit(1), F.lit(int(window))))
    ).select(
        "block",
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
        (F.col("_r") + F.col("_off")).alias("_tr"),
        F.col("_off").alias("rank_distance"),
    )
    right = ranked.select(
        "block",
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_r").alias("_tr"),
    )
    return left.join(right, ["block", "_tr"]).select(
        "block", "id_a", "id_b", "key_a", "key_b", "rank_distance"
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    seq_col: str,
    rules: "dict[str, str]",
    window: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """END-TO-END entity resolution — the full master-data funnel in one
    declarative plan, composing this module's stages: sorted-neighborhood
    candidates → Levenshtein match (edit distance ≤ ``max_distance`` on
    the sort key) → connected components (``dedup.duplicate_clusters``,
    large-star/small-star) → golden-record ``survivorship`` under
    ``rules``.  Rows matching nothing survive as their own singleton
    cluster (cluster id = own id — the resolve must not drop clean rows).

    Scale shape: inherits each stage's contract — per-block sort, rows ×
    window candidate fan-out, O(log² n) CC rounds, one grouped aggregate
    for the fuse.  Levenshtein runs only on the candidate pairs, never
    all-pairs.

    Output: the ``survivorship`` report keyed by ``cluster``."""
    if max_distance < 0:
        raise ValueError("resolve_entities: max_distance must be >= 0")
    from . import dedup

    pairs = sorted_neighborhood_pairs(df, id_col, name_col, block_col, window)
    matches = pairs.filter(
        F.levenshtein(F.col("key_a"), F.col("key_b")) <= F.lit(int(max_distance))
    )
    clusters = dedup.duplicate_clusters(matches, "id_a", "id_b")
    labeled = df.join(
        clusters.withColumnRenamed("id", id_col).withColumnRenamed(
            "cluster", "_cluster"
        ),
        id_col,
        "left",
    ).select(
        F.coalesce(F.col("_cluster"), F.col(id_col)).alias("cluster"),
        *[c for c in df.columns],
    )
    return survivorship(labeled, "cluster", rules, seq_col=seq_col)
