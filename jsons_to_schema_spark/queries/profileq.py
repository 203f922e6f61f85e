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


@query(
    "null_rate_embeddings",
    oracle="""
    SELECT count(*) AS n_rows,
           count(*) - count(embedding) AS nulls_embedding,
           count(*) - count(label) AS nulls_label,
           count(DISTINCT label) AS distinct_label
    FROM embeddings
    """,
)
def null_rate_embeddings(spark, sf_dir) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("embedding")).alias("nulls_embedding"),
        (F.count(F.lit(1)) - F.count("label")).alias("nulls_label"),
        F.countDistinct("label").alias("distinct_label"),
    )


# ===========================================================================
# Uniqueness + referential (oracled)
# ===========================================================================

@query(
    "uniqueness_documents_doc_id",
    oracle="""
    SELECT doc_id, count(*) AS cnt FROM documents
    GROUP BY doc_id HAVING count(*) > 1
    """,
)
def uniqueness_documents_doc_id(spark, sf_dir) -> DataFrame:
    """Partial+final HashAggregate = the two-stage salted count (map-side
    partials per scan partition); see validate.duplicate_doc_ids."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("cnt")).filter("cnt > 1")
    )


@query(
    "uniqueness_events_user_event",
    oracle="""
    SELECT user_id, event_type, count(*) AS cnt FROM events
    GROUP BY user_id, event_type HAVING count(*) > 1
    """,
)
def uniqueness_events_user_event(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt > 1")
    )


@query(
    "referential_customers_without_orders",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def referential_customers_without_orders(spark, sf_dir) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti")


@query(
    "referential_lineitem_dangling_orders",
    oracle="""
    SELECT count(*) AS dangling_cnt FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def referential_lineitem_dangling_orders(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return li.join(F.broadcast(o), "l_orderkey", "left_anti").agg(
        F.count(F.lit(1)).alias("dangling_cnt")
    )


@query(
    "referential_supplier_nation",
    oracle="""
    SELECT s_suppkey, s_nationkey FROM supplier
    WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)
    """,
)
def referential_supplier_nation(spark, sf_dir) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey")
    )
    return s.join(F.broadcast(n), "s_nationkey", "left_anti").select(
        "s_suppkey", "s_nationkey"
    )


@query(
    "join_suppliers_per_region",
    oracle="""
    SELECT r.r_name AS region, count(*) AS n_suppliers,
           count(DISTINCT n.n_nationkey) AS n_nations
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_suppliers_per_region(spark, sf_dir) -> DataFrame:
    """Multi-way dimension join chain (supplier ⋈ nation ⋈ region) with both
    dims broadcast — the fact side never shuffles for the joins; one
    partial/final aggregate after."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.countDistinct("n_nationkey").alias("n_nations"),
    )


@query(
    "uniqueness_part_partkey",
    oracle="""
    SELECT p_partkey, count(*) AS cnt FROM part
    GROUP BY p_partkey HAVING count(*) > 1
    """,
)
def uniqueness_part_partkey(spark, sf_dir) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_partkey").agg(F.count(F.lit(1)).alias("cnt")).filter("cnt > 1")
    )


@query(
    "mutual_information_events",
    oracle="""
    WITH t AS (
      SELECT event_type, user_id FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT 'event_type' AS col_a, 'user_id' AS col_b,
           round(entropy(event_type) + entropy(user_id)
                 - entropy(row(event_type, user_id)), 6) AS mi
    FROM t
    """,
)
def mutual_information_events(spark, sf_dir) -> DataFrame:
    """Mutual information between event_type and user_id
    (stats.mutual_information): MI = H(a) + H(b) − H(a,b), all three
    entropies folded from ONE joint count table — the raw data is
    scanned once, the marginals re-aggregate the bounded joint."""
    events = load_table(spark, sf_dir, "events")
    return stats.mutual_information(events, "event_type", "user_id")


@query(
    "entropy_events",
    oracle="""
    SELECT 'event_type' AS "column",
           round(entropy(event_type), 6) AS entropy FROM events
    UNION ALL
    SELECT 'user_id', round(entropy(user_id), 6) FROM events
    UNION ALL
    SELECT 'value', round(entropy(value), 6) FROM events
    """,
)
def entropy_events(spark, sf_dir) -> DataFrame:
    """Shannon entropy profile (stats.column_entropy, base 2 to match
    DuckDB's entropy()): per column, one bounded groupBy folded via
    H = log2(n) − (Σ c·log2 c)/n — never a join of the total back onto
    the counts."""
    events = load_table(spark, sf_dir, "events")
    return stats.column_entropy(events, ["event_type", "user_id", "value"])


@query(
    "candidate_keys_orders",
    oracle="""
    WITH w AS (
      SELECT count(*) AS n,
             count(DISTINCT o_orderkey) AS d1,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z1,
             count(DISTINCT o_custkey) AS d2,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z2,
             count(DISTINCT o_orderstatus) AS d3,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z3
      FROM orders
    )
    SELECT 'o_orderkey' AS "column", n AS n_rows, d1 AS n_distinct,
           z1 AS n_nulls, (n > 0 AND d1 = n AND z1 = 0) AS is_key FROM w
    UNION ALL
    SELECT 'o_custkey', n, d2, z2, (n > 0 AND d2 = n AND z2 = 0) FROM w
    UNION ALL
    SELECT 'o_orderstatus', n, d3, z3, (n > 0 AND d3 = n AND z3 = 0) FROM w
    """,
)
def candidate_keys_orders(spark, sf_dir) -> DataFrame:
    """Key discovery (stats.candidate_keys): one multi-aggregate scan over
    orders profiles three candidates at once — o_orderkey is certified a
    key (fully populated, distinct == rows), o_custkey and o_orderstatus
    are rejected, so both verdict arms are value-checked."""
    orders = load_table(spark, sf_dir, "orders")
    return stats.candidate_keys(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )


@query(
    "fd_orders_nation",
    oracle="""
    WITH g1 AS (
      SELECT n_nationkey,
             count(DISTINCT n_regionkey)
               + max(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS nd
      FROM nation GROUP BY 1
    ), g2 AS (
      SELECT o_custkey,
             count(DISTINCT o_orderpriority)
               + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nd
      FROM orders GROUP BY 1
    )
    SELECT 'n_nationkey' AS determinant, 'n_regionkey' AS dependent,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           (sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM g1
    UNION ALL
    SELECT 'o_custkey', 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0)
    FROM g2
    """,
)
def fd_orders_nation(spark, sf_dir) -> DataFrame:
    """Functional-dependency checks (stats.functional_dependency): one
    grouped scan per FD.  n_nationkey → n_regionkey holds;
    o_custkey → o_orderpriority is violated (repeat customers order at
    different priorities), so the verdict row carries a real violating
    group count — both outcomes value-checked."""
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    fd1 = stats.functional_dependency(nation, ["n_nationkey"], "n_regionkey")
    fd2 = stats.functional_dependency(orders, ["o_custkey"], "o_orderpriority")
    return fd1.unionByName(fd2)


@query(
    "datatype_profile_events",
    oracle="""
    WITH src AS (
      SELECT CAST(event_id AS VARCHAR) AS int_s,
             CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR)
                  ELSE CAST(event_id AS VARCHAR) || '.5' END AS num_s,
             CASE WHEN event_id % 5 = 0 THEN CAST(event_id AS VARCHAR)
                  WHEN event_id % 5 = 1 THEN CAST(event_id AS VARCHAR) || '.25'
                  WHEN event_id % 5 = 2 THEN
                       (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'False' END)
                  WHEN event_id % 5 = 3 THEN event_type
             END AS mixed_s
      FROM events
    ), w AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN int_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u1,
             CAST(sum(CASE WHEN regexp_matches(int_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b1,
             CAST(sum(CASE WHEN regexp_matches(int_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i1,
             CAST(sum(CASE WHEN regexp_matches(int_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN num_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u2,
             CAST(sum(CASE WHEN regexp_matches(num_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b2,
             CAST(sum(CASE WHEN regexp_matches(num_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i2,
             CAST(sum(CASE WHEN regexp_matches(num_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(CASE WHEN mixed_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f3
      FROM src
    )
    SELECT 'int_s' AS "column", n AS n_rows, u1 AS n_null, b1 AS n_boolean,
           i1 AS n_integral, f1 AS n_fractional,
           n - u1 - b1 - i1 - f1 AS n_other,
           CASE WHEN n - u1 = 0 THEN 'Unknown'
                WHEN b1 = n - u1 THEN 'Boolean'
                WHEN i1 = n - u1 THEN 'Integral'
                WHEN i1 + f1 = n - u1 THEN 'Fractional'
                ELSE 'String' END AS inferred_type
    FROM w
    UNION ALL
    SELECT 'num_s', n, u2, b2, i2, f2, n - u2 - b2 - i2 - f2,
           CASE WHEN n - u2 = 0 THEN 'Unknown'
                WHEN b2 = n - u2 THEN 'Boolean'
                WHEN i2 = n - u2 THEN 'Integral'
                WHEN i2 + f2 = n - u2 THEN 'Fractional'
                ELSE 'String' END
    FROM w
    UNION ALL
    SELECT 'mixed_s', n, u3, b3, i3, f3, n - u3 - b3 - i3 - f3,
           CASE WHEN n - u3 = 0 THEN 'Unknown'
                WHEN b3 = n - u3 THEN 'Boolean'
                WHEN i3 = n - u3 THEN 'Integral'
                WHEN i3 + f3 = n - u3 THEN 'Fractional'
                ELSE 'String' END
    FROM w
    """,
)
def datatype_profile_events(spark, sf_dir) -> DataFrame:
    """Datatype-consistency analyzer (stats.datatype_profile, deequ's
    dataType): three derived string columns exercise the inference
    lattice — int_s (clean digits → Integral), num_s (digits + decimals →
    Fractional), mixed_s (digits, decimals, booleans, words, NULLs →
    String).  All columns classified in ONE multi-aggregate scan with
    anchored Java∩RE2 regexes so the DuckDB oracle matches
    byte-for-byte."""
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    mixed = (
        F.when(eid % 5 == 0, eid.cast("string"))
        .when(eid % 5 == 1, F.concat(eid.cast("string"), F.lit(".25")))
        .when(
            eid % 5 == 2,
            F.when(eid % 2 == 0, F.lit("true")).otherwise(F.lit("False")),
        )
        .when(eid % 5 == 3, F.col("event_type"))
    )
    frame = events.select(
        eid.cast("string").alias("int_s"),
        F.when(eid % 2 == 0, eid.cast("string"))
        .otherwise(F.concat(eid.cast("string"), F.lit(".5")))
        .alias("num_s"),
        mixed.alias("mixed_s"),
    )
    return stats.datatype_profile(frame, ["int_s", "num_s", "mixed_s"])


@query(
    "uniqueness_profile_documents",
    oracle="""
    WITH pairs AS (
      SELECT 'lang' AS "column", CAST(lang AS VARCHAR) AS value FROM documents
      UNION ALL SELECT 'source', CAST(source AS VARCHAR) FROM documents
      UNION ALL SELECT 'doc_id', CAST(doc_id AS VARCHAR) FROM documents
    ), c AS (
      SELECT "column", value, count(*) AS cnt FROM pairs GROUP BY 1, 2
    )
    SELECT "column",
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           count(*) AS n_distinct,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / sum(cnt), 6)
             AS uniqueness,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS unique_value_ratio
    FROM c GROUP BY 1
    """,
)
def uniqueness_profile_documents(spark, sf_dir) -> DataFrame:
    """Uniqueness + unique-value-ratio profile (stats.uniqueness_profile,
    deequ's Uniqueness/UniqueValueRatio): three columns spanning the range
    — doc_id (every value unique), lang (few hot values, ratio ~0), source
    (in between) — from ONE melt scan and ONE pair-grouped shuffle whose
    size is the sum of column cardinalities, not the row count."""
    docs = load_table(spark, sf_dir, "documents")
    return stats.uniqueness_profile(docs, ["lang", "source", "doc_id"])


@query(
    "containment_lineitem_events",
    oracle="""
    WITH a1 AS (
      SELECT l_orderkey AS v, count(*) AS cnt FROM lineitem
      WHERE l_orderkey IS NOT NULL GROUP BY 1
    ), b1 AS (
      SELECT DISTINCT o_orderkey AS v FROM orders WHERE o_orderkey IS NOT NULL
    ), g1 AS (
      SELECT a1.cnt, CASE WHEN b1.v IS NOT NULL THEN 1 END AS hit
      FROM a1 LEFT JOIN b1 USING (v)
    ), a2 AS (
      SELECT user_id AS v, count(*) AS cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ), b2 AS (
      SELECT DISTINCT c_custkey AS v FROM customer WHERE c_custkey IS NOT NULL
    ), g2 AS (
      SELECT a2.cnt, CASE WHEN b2.v IS NOT NULL THEN 1 END AS hit
      FROM a2 LEFT JOIN b2 USING (v)
    )
    SELECT 'l_orderkey' AS from_col, 'o_orderkey' AS to_col,
           CAST(sum(cnt) AS BIGINT) AS rows_total,
           CAST(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0) AS BIGINT)
             AS rows_matched,
           round(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0)
                 / sum(cnt), 6) AS row_containment,
           count(*) AS distinct_total,
           CAST(coalesce(sum(hit), 0) AS BIGINT) AS distinct_matched,
           round(coalesce(sum(hit), 0) / count(*), 6) AS distinct_containment
    FROM g1
    UNION ALL
    SELECT 'user_id', 'c_custkey',
           CAST(sum(cnt) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0) AS BIGINT),
           round(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0)
                 / sum(cnt), 6),
           count(*),
           CAST(coalesce(sum(hit), 0) AS BIGINT),
           round(coalesce(sum(hit), 0) / count(*), 6)
    FROM g2
    """,
)
def containment_lineitem_events(spark, sf_dir) -> DataFrame:
    """Graded referential integrity (stats.containment): lineitem's
    l_orderkey fully resolves against orders (fraction 1.0 — the clean
    FK), events.user_id only partially resolves against customer keys —
    a real fractional grade, so both the matched and unmatched arithmetic
    are value-checked.  The probe shuffles A's distinct values (map-side
    pre-count), never its rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    c1 = stats.containment(li, "l_orderkey", orders, "o_orderkey")
    c2 = stats.containment(events, "user_id", customer, "c_custkey")
    return c1.unionByName(c2)


@query(
    "fd_confidence_events",
    oracle="""
    WITH j AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), p AS (
      SELECT user_id, sum(n) AS rows_, max(n) AS kept FROM j GROUP BY 1
    )
    SELECT 'user_id' AS determinant, 'event_type' AS dependent,
           CAST(sum(rows_) AS BIGINT) AS n_rows,
           CAST(sum(kept) AS BIGINT) AS kept_rows,
           round(CAST(sum(kept) AS BIGINT) / CAST(sum(rows_) AS BIGINT), 6)
             AS confidence,
           sum(kept) = sum(rows_) AS holds
    FROM p
    """,
)
def fd_confidence_events(spark, sf_dir) -> DataFrame:
    """Approximate functional dependency (stats.fd_confidence, the TANE
    g3 measure): user_id -> event_type genuinely does NOT hold, so the
    graded confidence (plurality-repair survivor fraction) is a real
    fraction — both the kept-rows arithmetic and the holds=false arm are
    value-checked.  One grouped count on the joint key, then folds over
    the bounded group table."""
    events = load_table(spark, sf_dir, "events")
    return stats.fd_confidence(events, ["user_id"], "event_type")


@query(
    "coverage_gaps_events",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS bucket,
             count(*) AS n
      FROM events
      WHERE ts IS NOT NULL
        AND CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) % 7 <> 3
      GROUP BY 1
    ),
    sp AS (
      SELECT CAST(unnest(range((SELECT min(bucket) FROM c),
                               (SELECT max(bucket) FROM c) + 1)) AS BIGINT)
               AS bucket
    )
    SELECT sp.bucket, sp.bucket * 3600 AS bucket_start_epoch_s
    FROM sp LEFT JOIN c USING (bucket)
    WHERE c.n IS NULL
    ORDER BY sp.bucket
    """,
)
def coverage_gaps_events(spark, sf_dir) -> DataFrame:
    """Calendar-completeness analyzer (stats.coverage_gaps): the events
    table covers 30 days with every hourly bucket populated, so gaps are
    PLANTED by dropping every 7th hour bucket (the identical bucket
    expression in both engines) — each reported gap row is value-checked,
    not vacuously absent.  One bounded groupBy; the spine generates from
    the count table's own min/max and anti-joins."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(
        stats._epoch_us_col(events, "ts") / F.lit(3600.0 * 1_000_000.0)
    ).cast("long")
    holed = events.filter(bucket % 7 != 3)
    return stats.coverage_gaps(holed, "ts", 3600)


@query(
    "null_cooccurrence_events",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN event_id % 14 = 0 THEN NULL ELSE props END AS props_n,
             CASE WHEN event_id % 35 = 0 THEN NULL ELSE user_id END AS user_n,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n
      FROM events
    ),
    a AS (
      SELECT count(*) - count(props_n) AS np,
             count(*) - count(user_n) AS nu,
             count(*) - count(value_n) AS nv,
             CAST(sum(CASE WHEN props_n IS NULL AND user_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_pu,
             CAST(sum(CASE WHEN props_n IS NULL AND value_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_pv,
             CAST(sum(CASE WHEN user_n IS NULL AND value_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_uv
      FROM t
    )
    SELECT 'props_n' AS col_a, 'user_n' AS col_b, np AS n_a_null,
           nu AS n_b_null, b_pu AS n_both_null,
           CASE WHEN np + nu - b_pu > 0
                THEN round(b_pu / (np + nu - b_pu), 6) END AS jaccard
    FROM a
    UNION ALL
    SELECT 'props_n', 'value_n', np, nv, b_pv,
           CASE WHEN np + nv - b_pv > 0
                THEN round(b_pv / (np + nv - b_pv), 6) END
    FROM a
    UNION ALL
    SELECT 'user_n', 'value_n', nu, nv, b_uv,
           CASE WHEN nu + nv - b_uv > 0
                THEN round(b_uv / (nu + nv - b_uv), 6) END
    FROM a
    """,
)
def null_cooccurrence_events(spark, sf_dir) -> DataFrame:
    """Missingness structure (stats.null_cooccurrence): whether columns go
    null TOGETHER.  The testdata carries no nulls, so three null patterns
    are PLANTED with known overlap structure — value null on event_id %
    7, props on % 14 (a strict subset: jaccard = |%14|/|%7|), user_id on
    % 35 (subset of value's, overlapping props only at % 70) — and the
    one-scan pairwise co-occurrence aggregate must recover exactly those
    containment/overlap fractions."""
    ev = load_table(spark, sf_dir, "events")
    planted = ev.select(
        F.when(F.col("event_id") % 14 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("props_n"),
        F.when(F.col("event_id") % 35 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("user_n"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value_n"),
    )
    return stats.null_cooccurrence(planted, ["props_n", "user_n", "value_n"])


@query(
    "completeness_by_segment_events",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CASE WHEN event_type = 'click' AND event_id % 5 = 0
                  THEN NULL ELSE value END AS value_n,
             CASE WHEN event_id % 10 = 0 THEN NULL ELSE props END AS props_n
      FROM events
    ),
    g AS (
      SELECT CAST(event_type AS VARCHAR) AS group_value,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(value_n) AS BIGINT) AS nv,
             CAST(count(*) - count(props_n) AS BIGINT) AS np
      FROM t GROUP BY 1
    )
    SELECT group_value, 'value_n' AS "column", n_rows, nv AS n_null,
           round((n_rows - nv) / n_rows, 6) AS completeness
    FROM g
    UNION ALL
    SELECT group_value, 'props_n', n_rows, np,
           round((n_rows - np) / n_rows, 6)
    FROM g
    """,
)
def completeness_by_segment_events(spark, sf_dir) -> DataFrame:
    """Per-segment completeness matrix (stats.completeness_profile): null
    rates per (event_type, column) from ONE grouped multi-aggregate scan.
    The testdata carries no nulls, so a segment-correlated outage is
    PLANTED — value goes null on every fifth click event (a broken feed
    localized to ONE segment) beside a uniform %10 props outage — and the
    profile must attribute ~20% incompleteness to the click segment
    alone while every other segment reads 1.0 for value."""
    ev = load_table(spark, sf_dir, "events")
    planted = ev.select(
        "event_type",
        F.when(
            (F.col("event_type") == "click") & (F.col("event_id") % 5 == 0),
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("value_n"),
        F.when(F.col("event_id") % 10 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("props_n"),
    )
    return stats.completeness_profile(
        planted, ["value_n", "props_n"], "event_type"
    )


@query(
    "sequence_integrity_lineitem",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, count(*) AS n_rows,
             count(DISTINCT l_linenumber) AS n_distinct,
             min(l_linenumber) AS seq_min, max(l_linenumber) AS seq_max
      FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey, n_rows, n_distinct, seq_min, seq_max,
           (n_distinct < n_rows) AS has_dups,
           ((CAST(seq_max AS BIGINT) - CAST(seq_min AS BIGINT) + 1)
              <> n_distinct) AS has_gaps,
           (CAST(seq_min AS BIGINT) <> 1) AS bad_start
    FROM a
    WHERE (n_distinct < n_rows)
       OR ((CAST(seq_max AS BIGINT) - CAST(seq_min AS BIGINT) + 1)
             <> n_distinct)
       OR (CAST(seq_min AS BIGINT) <> 1)
    """,
)
def sequence_integrity_lineitem(spark, sf_dir) -> DataFrame:
    """Per-key sequence audit (validate.sequence_integrity): orders whose
    line numbers are not exactly 1..n — duplicates, gaps, or a shifted
    start.  The synthetic lineitem assigns non-contiguous line numbers,
    so the violation set is large and every verdict arm (gaps and
    bad-start both fire, dups occur) carries real signal for the
    value-hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return validate.sequence_integrity(li, ["l_orderkey"], "l_linenumber")


@query(
    "heavy_hitters_events_user",
    oracle="""
    WITH t AS (
      SELECT CAST(user_id AS VARCHAR) AS value
      FROM events WHERE user_id IS NOT NULL
    ),
    n AS (SELECT count(*) AS total FROM t)
    SELECT value, count(*) AS n_rows,
           round(count(*) / (SELECT total FROM n), 6) AS frac
    FROM t GROUP BY value
    HAVING count(*) * 1000 >= 7 * (SELECT total FROM n)
    """,
)
def heavy_hitters_events_user(spark, sf_dir) -> DataFrame:
    """Exact θ-frequent values via Misra-Gries candidates + exact verify
    (stats.heavy_hitters): users holding ≥ 0.7% of the event stream.
    user row counts scatter around the 0.7% line (Poisson at ~0.67%
    uniform), so the threshold genuinely splits the key set and the
    boundary arithmetic (n_rows·1000 ≥ 7·N in exact longs — a double
    0.007·N product differs between engines in the last ulp) carries
    real signal.  The oracle is the plain exact GROUP BY the sketch
    must reproduce verbatim."""
    ev = load_table(spark, sf_dir, "events")
    return stats.heavy_hitters(ev, "user_id", 0.007)


@query(
    "inclusion_profile_orders_customer",
    oracle="""
    WITH a AS (
      SELECT 'o_custkey' AS col_a, CAST(o_custkey AS VARCHAR) AS value
      FROM orders WHERE o_custkey IS NOT NULL
      UNION
      SELECT 'o_orderstatus', o_orderstatus
      FROM orders WHERE o_orderstatus IS NOT NULL
    ),
    b AS (
      SELECT 'c_custkey' AS col_b, CAST(c_custkey AS VARCHAR) AS value
      FROM customer WHERE c_custkey IS NOT NULL
      UNION
      SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
      FROM customer WHERE c_nationkey IS NOT NULL
    ),
    tot AS (SELECT col_a, count(*) AS n_distinct_a FROM a GROUP BY 1),
    hit AS (
      SELECT a.col_a, b.col_b, count(*) AS n_contained
      FROM a JOIN b USING (value) GROUP BY 1, 2
    ),
    spine AS (
      SELECT col_a, n_distinct_a, col_b FROM tot
      CROSS JOIN (SELECT 'c_custkey' AS col_b UNION ALL SELECT 'c_nationkey')
    )
    SELECT col_a, col_b, n_distinct_a,
           CAST(coalesce(n_contained, 0) AS BIGINT) AS n_contained,
           round(coalesce(n_contained, 0) / n_distinct_a, 6) AS containment,
           coalesce(n_contained, 0) = n_distinct_a AS full_inclusion
    FROM spine LEFT JOIN hit USING (col_a, col_b)
    """,
)
def inclusion_profile_orders_customer(spark, sf_dir) -> DataFrame:
    """Inclusion-dependency discovery (stats.inclusion_profile): sweep
    (o_custkey, o_orderstatus) × (c_custkey, c_nationkey).  The four
    verdicts span the whole signal range: o_custkey ⊆ c_custkey is the
    true FK (full_inclusion), o_custkey vs c_nationkey overlaps only on
    the small shared integer prefix (a graded fraction), and the status
    column matches nothing (0.0 — the spine row that must not vanish)."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return stats.inclusion_profile(
        od, ["o_custkey", "o_orderstatus"], cu, ["c_custkey", "c_nationkey"]
    )


@query(
    "monotonicity_events_value",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             lag(value) OVER (
               PARTITION BY user_id ORDER BY event_id ASC, value ASC
             ) AS pv
      FROM events
    )
    SELECT user_id, count(*) AS n_rows,
           CAST(sum(CASE WHEN pv IS NOT NULL AND value < pv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks,
           CAST(0 AS BIGINT) AS n_null_rows
    FROM s GROUP BY 1
    HAVING sum(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END) > 0
    """,
)
def monotonicity_events_value(spark, sf_dir) -> DataFrame:
    """Per-key monotonicity audit (validate.monotonicity_audit): users
    whose metric value ever DECREASES along the event_id order — ~all
    keys violate on this synthetic stream, so the break counts carry a
    dense value-hash.  The testdata has no NULLs, so the oracle's plain
    lag() is the full ignore-nulls semantics (the null arms are
    unit-tested with planted NULL rows in
    tests/test_discovery_audits.py)."""
    ev = load_table(spark, sf_dir, "events")
    return validate.monotonicity_audit(ev, ["user_id"], "event_id", "value")


@query(
    "distinct_overlap_events_users",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 0),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1),
         u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
    SELECT true AS ok_a, true AS ok_b, true AS ok_union,
           CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
           CAST((SELECT count(*) FROM u) AS BIGINT) AS exact_union,
           CAST((SELECT count(*) FROM u) - (SELECT count(*) FROM b)
                AS BIGINT) AS exact_new_in_a,
           CAST((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
                - (SELECT count(*) FROM u) AS BIGINT) AS exact_common
    """,
)
def distinct_overlap_events_users(spark, sf_dir) -> DataFrame:
    """Sketch-grade snapshot overlap (stats.distinct_overlap): the user_id
    sets of the event_id-parity slices compared via three HLL sketches —
    new-keys / common-keys at KB sketch cost instead of an exact-distinct
    shuffle.  Raw sketch estimates are not partition-invariant, so the
    oracle-able output is the error CONTRACT (|est − exact| ≤ 5%·exact
    per primary estimate — the stats_distinct_hll pattern) beside exact
    counts computed as real SQL."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    est = stats.distinct_overlap(a, b, "user_id")
    ex = (
        a.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(
            b.select("user_id").distinct().agg(F.count(F.lit(1)).alias("exact_b"))
        )
        .crossJoin(
            a.select("user_id")
            .union(b.select("user_id"))
            .distinct()
            .agg(F.count(F.lit(1)).alias("exact_union"))
        )
    )
    j = est.crossJoin(ex)
    ok = lambda e, x: (  # noqa: E731
        F.abs(F.col(e) - F.col(x)) <= 0.05 * F.col(x)
    )
    return j.select(
        ok("n_a_est", "exact_a").alias("ok_a"),
        ok("n_b_est", "exact_b").alias("ok_b"),
        ok("n_union_est", "exact_union").alias("ok_union"),
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_union") - F.col("exact_b")).alias("exact_new_in_a"),
        (
            F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
        ).alias("exact_common"),
    )


@query(
    "categorical_association_events",
    oracle="""
    WITH src AS (
      SELECT event_type,
             CASE WHEN event_type IN ('click', 'view')
                  THEN 's' || CAST(event_id % 2 AS VARCHAR)
                  ELSE 't' || CAST(event_id % 3 AS VARCHAR) END AS seg,
             CAST(event_id % 2 AS VARCHAR) AS par
      FROM events
    ),
    m AS (
      SELECT 'event_type' AS col_a, 'seg' AS col_b,
             event_type AS va, seg AS vb FROM src
      UNION ALL
      SELECT 'event_type', 'par', event_type, par FROM src
    ),
    cells AS (
      SELECT col_a, col_b, va, vb, count(*) AS o FROM m GROUP BY 1, 2, 3, 4
    ),
    g AS (
      SELECT *,
             sum(o) OVER (PARTITION BY col_a, col_b, va) AS ra,
             sum(o) OVER (PARTITION BY col_a, col_b, vb) AS cb,
             sum(o) OVER (PARTITION BY col_a, col_b) AS n
      FROM cells
    ),
    t AS (
      SELECT col_a, col_b, n,
             round((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n)
                   - ra * cb / n, 6) AS term,
             va, vb
      FROM g
    ),
    agg AS (
      SELECT col_a, col_b,
             CAST(max(n) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT va)
                  + max(CASE WHEN va IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_levels,
             CAST(count(DISTINCT vb)
                  + max(CASE WHEN vb IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_levels,
             round(sum(term) + max(n), 6) AS chi2_raw
      FROM t GROUP BY 1, 2
    )
    SELECT col_a, col_b, n_rows, r_levels, c_levels,
           (r_levels - 1) * (c_levels - 1) AS dof,
           greatest(chi2_raw, 0.0) AS chi2,
           CASE WHEN (r_levels - 1) * (c_levels - 1) > 0 THEN
             round(sqrt(greatest(chi2_raw, 0.0)
                        / (n_rows * least(r_levels - 1, c_levels - 1))), 6)
           END AS cramers_v
    FROM agg
    """,
)
def categorical_association_events(spark, sf_dir) -> DataFrame:
    """Categorical association sweep (stats.categorical_association):
    chi-squared + Cramér's V for two planted pairs in ONE scan — a
    dependent pair (event_type vs a segment column whose prefix is
    derived FROM event_type, so V lands high) and a near-independent one
    (event_type vs event-id parity, V ≈ 0).  The oracle rebuilds the
    melt, the window margins, and the zero-cell-free χ² identity
    (Σ_all exp = n) relationally, so every level count, dof, χ² term sum,
    and the normalized V must agree to the shared round(6) grid."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat(F.lit("s"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string"))
        )
        .alias("seg"),
        (F.col("event_id") % 2).cast("string").alias("par"),
    )
    return stats.categorical_association(
        ev, [("event_type", "seg"), ("event_type", "par")]
    )


@query(
    "mutual_information_pairs_events",
    oracle="""
    WITH src AS (
      SELECT event_type,
             CASE WHEN event_type IN ('click', 'view')
                  THEN 's' || CAST(event_id % 2 AS VARCHAR)
                  ELSE 't' || CAST(event_id % 3 AS VARCHAR) END AS seg,
             CAST(event_id % 2 AS VARCHAR) AS par
      FROM events
    )
    SELECT 'event_type' AS col_a, 'seg' AS col_b,
           round(entropy(event_type) + entropy(seg)
                 - entropy(row(event_type, seg)), 6) AS mi
    FROM src WHERE event_type IS NOT NULL AND seg IS NOT NULL
    UNION ALL
    SELECT 'event_type', 'par',
           round(entropy(event_type) + entropy(par)
                 - entropy(row(event_type, par)), 6)
    FROM src WHERE event_type IS NOT NULL AND par IS NOT NULL
    """,
)
def mutual_information_pairs_events(spark, sf_dir) -> DataFrame:
    """MI sweep (stats.mutual_information_pairs): the same planted
    dependent/independent pairs as categorical_association_events,
    graded in bits from ONE corpus scan — the dependent (event_type,
    seg) pair carries real information (seg's prefix is a function of
    event_type) while (event_type, parity) lands at ~0; DuckDB's native
    base-2 entropy() aggregate recomputes all three terms per pair."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat(F.lit("s"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string"))
        )
        .alias("seg"),
        (F.col("event_id") % 2).cast("string").alias("par"),
    )
    return stats.mutual_information_pairs(
        ev, [("event_type", "seg"), ("event_type", "par")]
    )


@query(
    "frequent_pairs_events",
    oracle="""
    WITH memb AS (
      SELECT DISTINCT
             CAST(user_id AS VARCHAR) || '-'
               || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS b,
             event_type AS i
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL
    ),
    nb AS (SELECT count(DISTINCT b) AS n FROM memb),
    ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM memb GROUP BY 1),
    p AS (
      SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM memb l JOIN memb r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT p.item_a, p.item_b, p.n_ab, a.ni AS n_a, c.ni AS n_b,
           round(p.n_ab / nb.n, 6) AS support,
           round(p.n_ab / a.ni, 6) AS conf_a_b,
           round(p.n_ab / c.ni, 6) AS conf_b_a,
           round(p.n_ab * nb.n / (a.ni * c.ni), 6) AS lift
    FROM p JOIN ic a ON p.item_a = a.i JOIN ic c ON p.item_b = c.i, nb
    """,
)
def frequent_pairs_events(spark, sf_dir) -> DataFrame:
    """Market-basket association pairs (stats.frequent_pairs): baskets are
    user-DAYS (a user's whole history holds every type — support 1.0
    everywhere, a vacuous check; a user-day holds the 2-3 types actually
    fired together), items are event types — which types co-occur in the
    same day's activity far above chance (lift) is input-mix structure no
    per-column profile sees.  Support counting is over DISTINCT (basket,
    type) memberships, so hot users cost one membership per day; the
    oracle replays the identical basket construction (epoch_us //
    86400000000, all-positive) and self-join with the same integer counts
    and round(6) ratios (BIGINT/BIGINT is DOUBLE division in both
    engines), so support/confidence/lift are all value-checked with
    genuinely varied counts."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    day = ((us - F.pmod(us, F.lit(86400000000))) / F.lit(86400000000)).cast(
        "long"
    )
    basketed = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.concat_ws("-", F.col("user_id"), day).alias("basket"),
        "event_type",
    )
    return stats.frequent_pairs(basketed, "basket", "event_type", min_count=2)


@query(
    "arithmetic_consistency_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_quantity, l_extendedprice, l_discount,
             CAST(1.0 AS DOUBLE) + l_tax AS taxf
      FROM lineitem
    ),
    d AS (
      SELECT *,
        l_extendedprice * taxf
          + CASE WHEN l_orderkey % 97 = 0 THEN CAST(5.0 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END AS gross,
        l_quantity + l_discount AS total,
        l_extendedprice / l_quantity AS unit
      FROM src
    ),
    r AS (
      SELECT 'gross=l_extendedprice*taxf' AS rule,
             CAST(count(CASE WHEN gross IS NOT NULL
                              AND l_extendedprice IS NOT NULL
                              AND taxf IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_checked,
             CAST(count(CASE WHEN abs(gross - l_extendedprice * taxf)
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_extendedprice * taxf))
                         THEN 1 END) AS BIGINT) AS n_violations
      FROM d
      UNION ALL
      SELECT 'total=l_quantity+l_discount',
             CAST(count(CASE WHEN total IS NOT NULL
                              AND l_quantity IS NOT NULL
                              AND l_discount IS NOT NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(CASE WHEN abs(total - (l_quantity + l_discount))
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_quantity + l_discount))
                         THEN 1 END) AS BIGINT)
      FROM d
      UNION ALL
      SELECT 'unit=l_extendedprice/l_quantity',
             CAST(count(CASE WHEN unit IS NOT NULL
                              AND l_extendedprice IS NOT NULL
                              AND l_quantity IS NOT NULL
                              AND l_quantity <> 0 THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN l_quantity <> 0
                              AND abs(unit - l_extendedprice / l_quantity)
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_extendedprice
                                                    / l_quantity))
                         THEN 1 END) AS BIGINT)
      FROM d
    )
    SELECT rule, n_checked, n_violations,
           round(CAST(n_violations AS DOUBLE) / n_checked, 6)
             AS violation_rate,
           n_violations = 0 AS holds
    FROM r
    """,
)
def arithmetic_consistency_lineitem(spark, sf_dir) -> DataFrame:
    """Cross-field arithmetic invariants (stats.arithmetic_consistency):
    three rules over lineitem with both verdict arms planted — gross =
    extendedprice × (1+tax) is broken by +5.0 on every 97th order key
    (violates, rate value-checked), total = quantity + discount and
    unit = extendedprice / quantity hold exactly (same double ops in the
    same order in both engines, so the |observed − expected| comparisons
    are bit-stable; planted offsets sit 6 orders of magnitude above the
    tolerance boundary).  ONE corpus scan computes all six counts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        (F.lit(1.0) + F.col("l_tax")).alias("taxf"),
    )
    li = li.select(
        "*",
        (
            F.col("l_extendedprice") * F.col("taxf")
            + F.when(F.col("l_orderkey") % 97 == 0, F.lit(5.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("gross"),
        (F.col("l_quantity") + F.col("l_discount")).alias("total"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "unit"
        ),
    )
    return stats.arithmetic_consistency(
        li,
        [
            ("gross", "l_extendedprice", "mul", "taxf"),
            ("total", "l_quantity", "add", "l_discount"),
            ("unit", "l_extendedprice", "div", "l_quantity"),
        ],
    )


@query(
    "generalization_search_events",
    oracle="""
    WITH c AS (
      SELECT 'user=band10|value=band100' AS combo, 1 + 1 AS cost,
             user_id - user_id % 10 AS g0,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) AS g1
      FROM events
      UNION ALL
      SELECT 'user=exact|value=band100', 0 + 1, user_id,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=band10|value=any', 1 + 2, user_id - user_id % 10, 0
      FROM events
      UNION ALL
      SELECT 'user=exact|value=any', 0 + 2, user_id, 0 FROM events
      UNION ALL
      SELECT 'user=any|value=band100', 2 + 1, 0,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=any|value=any', 2 + 2, 0, 0 FROM events
      UNION ALL
      SELECT 'user=band10|value=exact', 1 + 0, user_id - user_id % 10,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=exact|value=exact', 0 + 0, user_id,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=any|value=exact', 2 + 0, 0,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
    ),
    g AS (
      SELECT combo, cost, g0, g1, count(*) AS n FROM c GROUP BY 1, 2, 3, 4
    ),
    rep AS (
      SELECT combo, CAST(cost AS INT) AS cost,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(n) AS BIGINT) AS min_group_size
      FROM g GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, (min_group_size >= 25) AS satisfies_k,
             row_number() OVER (
               ORDER BY CASE WHEN min_group_size >= 25 THEN 1 ELSE 0 END DESC,
                        cost ASC, combo ASC) AS rn
      FROM rep
    )
    SELECT combo, cost, n_groups, min_group_size, satisfies_k,
           (rn = 1 AND satisfies_k) AS chosen
    FROM rk
    """,
)
def generalization_search_events(spark, sf_dir) -> DataFrame:
    """k-anonymity enforcement search (stats.generalization_search): the
    (user_id, value) quasi-identifier with 3×3 generalization ladders —
    exact → band → suppressed on both axes — evaluated at k=25.  Exact
    combos demonstrably fail (singleton groups) while coarse ones pass,
    and exactly ONE k-satisfying, least-cost combo is marked chosen; the
    oracle replays all nine grouped counts with the identical level
    expressions and ranking (NULL values coalesce to a sentinel bucket
    on both sides so the group keys hash identically).  Nine bounded
    passes, each map-side partial; the report is combos-sized."""
    ev = load_table(spark, sf_dir, "events")
    ladders = {
        "user": [
            ("exact", F.col("user_id")),
            ("band10", F.col("user_id") - F.col("user_id") % 10),
            ("any", F.lit(0)),
        ],
        "value": [
            ("exact", F.floor(F.coalesce(F.col("value"), F.lit(-1.0))).cast("long")),
            (
                "band100",
                F.floor(
                    F.coalesce(F.col("value"), F.lit(-1.0)) / F.lit(100.0)
                ).cast("long"),
            ),
            ("any", F.lit(0)),
        ],
    }
    return stats.generalization_search(ev, ladders, k=25)


@query(
    "joinability_kmv_tpch",
    oracle="""
    WITH vals AS (
      SELECT DISTINCT 'customer.c_custkey' AS col,
             md5(CAST(c_custkey AS VARCHAR)) AS h
      FROM customer WHERE c_custkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'customer.c_nationkey', md5(CAST(c_nationkey AS VARCHAR))
      FROM customer WHERE c_nationkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'orders.o_custkey', md5(CAST(o_custkey AS VARCHAR))
      FROM orders WHERE o_custkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'orders.o_orderkey', md5(CAST(o_orderkey AS VARCHAR))
      FROM orders WHERE o_orderkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'lineitem.l_orderkey', md5(CAST(l_orderkey AS VARCHAR))
      FROM lineitem WHERE l_orderkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'nation.n_nationkey', md5(CAST(n_nationkey AS VARCHAR))
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    sk AS (SELECT col, h FROM (
             SELECT col, h,
                    row_number() OVER (PARTITION BY col ORDER BY h) AS r
             FROM vals) WHERE r <= 128),
    mx AS (SELECT col, max(h) AS mh FROM sk GROUP BY 1),
    pairs AS (SELECT a.col AS col_a, b.col AS col_b,
                     least(a.mh, b.mh) AS tau
              FROM mx a JOIN mx b ON a.col < b.col),
    sa AS (SELECT p.col_a, p.col_b, count(*) AS la FROM pairs p
           JOIN sk s ON s.col = p.col_a AND s.h <= p.tau GROUP BY 1, 2),
    sb AS (SELECT p.col_a, p.col_b, count(*) AS lb FROM pairs p
           JOIN sk s ON s.col = p.col_b AND s.h <= p.tau GROUP BY 1, 2),
    it AS (SELECT p.col_a, p.col_b, count(*) AS ni FROM pairs p
           JOIN sk x ON x.col = p.col_a AND x.h <= p.tau
           JOIN sk y ON y.col = p.col_b AND y.h = x.h GROUP BY 1, 2)
    SELECT p.col_a, p.col_b,
           CAST(coalesce(ni, 0) AS BIGINT) AS n_common,
           CASE WHEN coalesce(la, 0) + coalesce(lb, 0) - coalesce(ni, 0) = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(coalesce(la, 0)
                     + coalesce(lb, 0) - coalesce(ni, 0) AS DOUBLE), 6)
           END AS est_jaccard,
           CASE WHEN coalesce(la, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(la AS DOUBLE), 6)
           END AS est_contain_a_in_b,
           CASE WHEN coalesce(lb, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(lb AS DOUBLE), 6)
           END AS est_contain_b_in_a
    FROM pairs p
    LEFT JOIN sa USING (col_a, col_b)
    LEFT JOIN sb USING (col_a, col_b)
    LEFT JOIN it USING (col_a, col_b)
    """,
)
def joinability_kmv_tpch(spark, sf_dir) -> DataFrame:
    """Joinability DISCOVERY at sketch scale (stats.kmv_column_sketches +
    joinability_report): six key columns across four TPC-H tables reduce
    to 128-hash bottom-k (KMV) sketches — one scan per table, two-phase
    salted bottom-k so no column serializes its distinct set — then
    all 15 pairs get Jaccard/containment estimates from sketch-sized
    arithmetic (Cohen-Kaplan bottom-k estimators).  md5 makes the sketch
    bit-deterministic, so the oracle replays it EXACTLY — no error band
    needed, unlike HLL.  True foreign keys (o_custkey⊆c_custkey,
    l_orderkey≈o_orderkey, c_nationkey vs n_nationkey) surface with high
    containment; unrelated key pairs sit near zero — both arms
    value-checked across all 15 rows."""
    sk = None
    for tbl, cols in (
        ("customer", ["c_custkey", "c_nationkey"]),
        ("orders", ["o_custkey", "o_orderkey"]),
        ("lineitem", ["l_orderkey"]),
        ("nation", ["n_nationkey"]),
    ):
        part = stats.kmv_column_sketches(
            load_table(spark, sf_dir, tbl), cols, k=128, table=tbl
        )
        sk = part if sk is None else sk.unionAll(part)
    return stats.joinability_report(sk, k=128)
