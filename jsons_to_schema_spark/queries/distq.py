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


# ===========================================================================
# Column stats — single multi-aggregate pass (oracled)
# ===========================================================================

@query(
    "stats_lineitem",
    oracle="""
    SELECT count(*) AS n_rows,
           min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
           count(*) - count(l_quantity) AS nulls_l_quantity,
           min(l_extendedprice) AS min_l_extendedprice,
           max(l_extendedprice) AS max_l_extendedprice,
           count(*) - count(l_extendedprice) AS nulls_l_extendedprice,
           min(l_discount) AS min_l_discount, max(l_discount) AS max_l_discount,
           count(*) - count(l_discount) AS nulls_l_discount,
           min(l_returnflag) AS min_l_returnflag, max(l_returnflag) AS max_l_returnflag,
           count(*) - count(l_returnflag) AS nulls_l_returnflag,
           count(DISTINCT l_orderkey) AS distinct_l_orderkey,
           count(DISTINCT l_partkey) AS distinct_l_partkey,
           count(DISTINCT l_suppkey) AS distinct_l_suppkey
    FROM lineitem
    """,
)
def stats_lineitem(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
        ]
    for c in ["l_orderkey", "l_partkey", "l_suppkey"]:
        aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
    return li.agg(*aggs)


@query(
    "stats_events_by_type",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           min(value) AS min_value, max(value) AS max_value,
           count(*) - count(value) AS nulls_value
    FROM events GROUP BY event_type
    """,
)
def stats_events_by_type(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.count(F.lit(1)) - F.count("value")).alias("nulls_value"),
    )


@query(
    "stats_documents_rollup",
    oracle="""
    SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def stats_documents_rollup(spark, sf_dir) -> DataFrame:
    """Hierarchical aggregates via ROLLUP(lang, source) — subtotals and the
    grand total in one pass (Expand + partial/final HashAggregate; the
    grouping-set expansion happens map-side, so the shuffle carries
    per-(set,key) partials, not rows).  NULL subtotal keys surface as
    '<all>' so the output is total-orderable for the value compare."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    return out.select(
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        F.coalesce("source", F.lit("<all>")).alias("source"),
        "n_docs",
        "total_chars",
        "min_chars",
        "max_chars",
    )


@query(
    "stats_distinct_hll_lineitem",
    oracle="""
    SELECT true AS hll_ok_l_orderkey,
           true AS hll_ok_l_partkey,
           true AS hll_ok_l_suppkey,
           count(DISTINCT l_orderkey) AS exact_l_orderkey,
           count(DISTINCT l_partkey) AS exact_l_partkey,
           count(DISTINCT l_suppkey) AS exact_l_suppkey
    FROM lineitem
    """,
)
def stats_distinct_hll_lineitem(spark, sf_dir) -> DataFrame:
    """HLL-sketch distinct counts CHECKED against the exact counts in one
    multi-aggregate pass.  The raw estimate is not partition-count-invariant
    (a DataSketches hll_union of partials is a different sketch state than a
    single-sketch build), so the value-stable, oracle-able output is the
    semantic contract itself: |estimate − exact| ≤ 5% · exact per column,
    plus the exact counts as real SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    agg = li.agg(
        *[F.hll_sketch_estimate(F.hll_sketch_agg(c)).alias(f"est_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"exact_{c}") for c in cols],
    )
    return agg.select(
        *[
            (
                F.abs(F.col(f"est_{c}") - F.col(f"exact_{c}"))
                <= 0.05 * F.col(f"exact_{c}")
            ).alias(f"hll_ok_{c}")
            for c in cols
        ],
        *[F.col(f"exact_{c}") for c in cols],
    )


@query(
    "stats_orders_by_status",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
           count(*) - count(o_totalprice) AS nulls_price,
           count(DISTINCT o_custkey) AS distinct_custkeys
    FROM orders GROUP BY o_orderstatus
    """,
)
def stats_orders_by_status(spark, sf_dir) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("nulls_price"),
        F.countDistinct("o_custkey").alias("distinct_custkeys"),
    )


@query(
    "topk_documents_by_chars",
    oracle="""
    SELECT lang, doc_id, n_chars, CAST(rnk AS int) AS rnk FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 5
    """,
)
def topk_documents_by_chars(spark, sf_dir) -> DataFrame:
    """Bounded top-k per group: the window never funnels — one partition per
    lang key, and at scale the same shape runs as a two-stage top-k (local
    cap, then global) exactly like validate.row_violations."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "histogram_events_value",
    oracle="""
    WITH b AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bucket),
         c AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket,
                  count(*) AS n_rows
           FROM events
           WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         )
    SELECT b.bucket,
           0.0 + b.bucket * 25.0 AS bucket_lo,
           0.0 + (b.bucket + 1) * 25.0 AS bucket_hi,
           CAST(coalesce(c.n_rows, 0) AS BIGINT) AS n_rows
    FROM b LEFT JOIN c ON b.bucket = c.bucket
    """,
)
def histogram_events_value(spark, sf_dir) -> DataFrame:
    """Equi-width distribution profile (stats.column_histogram): 20
    buckets over [0, 500] for events.value — bucket ids from the
    identical double expression in both engines, empty buckets emitted
    via the broadcast spine join, col == hi clamped into the last
    bucket."""
    events = load_table(spark, sf_dir, "events")
    return stats.column_histogram(events, "value", 0.0, 500.0, 20)


@query(
    "top_values_documents_lang",
    oracle="""
    WITH c AS (
      SELECT CAST(lang AS VARCHAR) AS value, count(*) AS n_rows
      FROM documents WHERE lang IS NOT NULL GROUP BY 1
    ), r AS (
      SELECT value, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, value ASC) AS rk
      FROM c
    )
    SELECT value, n_rows, false AS is_other FROM r WHERE rk <= 3
    UNION ALL
    SELECT 'OTHER', (SELECT CAST(sum(n_rows) AS BIGINT) FROM r WHERE rk > 3),
           true
    WHERE EXISTS (SELECT 1 FROM r WHERE rk > 3)
    """,
)
def top_values_documents_lang(spark, sf_dir) -> DataFrame:
    """Categorical profile (stats.top_values): 3 most frequent languages
    plus the OTHER rollup, ties broken on value ascending — k chosen
    below the column's cardinality so the OTHER arm is value-checked,
    not vacuously absent.  Two-stage top-k keeps the global ordering's
    input at k × partitions."""
    docs = load_table(spark, sf_dir, "documents")
    return stats.top_values(docs, "lang", 3)


@query(
    "correlations_lineitem",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round(corr(l_quantity, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_tax',
           round(corr(l_extendedprice, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round(corr(l_discount, l_tax), 6) FROM lineitem
    """,
)
def correlations_lineitem(spark, sf_dir) -> DataFrame:
    """Pairwise Pearson correlation profile (stats.correlation_pairs):
    all 6 unordered pairs of 4 numeric lineitem columns in ONE
    multi-aggregate pass (co-moment map-side partials), rounded to 6
    decimals so the comparison is summation-order-independent across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.correlation_pairs(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@query(
    "equidepth_histogram_events_value",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS bounds,
             min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT len(list_filter(b.bounds, x -> x < e.value)) AS bucket,
             count(*) AS n
      FROM events e, b WHERE e.value IS NOT NULL GROUP BY 1
    ),
    sp AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS bucket)
    SELECT sp.bucket,
           round(CASE WHEN sp.bucket = 0 THEN b.mn
                      ELSE b.bounds[CAST(sp.bucket AS INT)] END, 6) AS lo,
           round(CASE WHEN sp.bucket = 3 THEN b.mx
                      ELSE b.bounds[CAST(sp.bucket AS INT) + 1] END, 6) AS hi,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
    FROM sp CROSS JOIN b LEFT JOIN c USING (bucket)
    """,
)
def equidepth_histogram_events_value(spark, sf_dir) -> DataFrame:
    """Equi-depth histogram (stats.equidepth_histogram): quartile-binned
    profile of events.value — the skew-robust companion to the equi-width
    histogram_events_value.  Exact percentile boundaries (quantile_cont
    parity), strict-below bucket assignment so boundary ties fall low in
    both engines, counts exact, edges round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.equidepth_histogram(ev, "value", 4)


@query(
    "quantile_profile_events",
    oracle="""
    WITH g AS (
      SELECT CAST(event_type AS VARCHAR) AS group_value,
             round(quantile_cont(value, 0.1), 6) AS q0,
             round(quantile_cont(value, 0.5), 6) AS q1,
             round(quantile_cont(value, 0.9), 6) AS q2
      FROM events GROUP BY 1
    )
    SELECT group_value, CAST(0.1 AS DOUBLE) AS p, q0 AS q FROM g
    UNION ALL SELECT group_value, CAST(0.5 AS DOUBLE), q1 FROM g
    UNION ALL SELECT group_value, CAST(0.9 AS DOUBLE), q2 FROM g
    """,
)
def quantile_profile_events(spark, sf_dir) -> DataFrame:
    """Exact grouped quantiles (stats.quantile_profile): the p10/p50/p90
    of events.value per event_type from ONE grouped percentile aggregate
    — exact because a certification threshold on an approximate quantile
    flips with the sketch seed.  Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the linear-interpolation definition, so every
    (segment, p, q) row is value-checked at round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.quantile_profile(
        ev, "value", probs=(0.1, 0.5, 0.9), group_col="event_type"
    )


@query(
    "quantile_bins_fit_apply_events",
    oracle="""
    WITH tr AS (SELECT value FROM events
                WHERE event_id % 2 = 0 AND value IS NOT NULL),
    ed AS (
      SELECT list_transform(
               quantile_cont(value, [0.25, 0.5, 0.75]),
               x -> round(x, 6)) AS b
      FROM tr
    ),
    sv AS (SELECT value FROM events WHERE event_id % 2 = 1),
    assigned AS (
      SELECT CASE WHEN value IS NULL THEN NULL
                  ELSE len(list_filter(ed.b, x -> x < value)) END AS bucket
      FROM sv, ed
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM assigned GROUP BY 1
    """,
)
def quantile_bins_fit_apply_events(spark, sf_dir) -> DataFrame:
    """Quantile-bucketizer fit/transform split (stats.fit_quantile_bins +
    apply_bins): quartile edges FIT on the even-id half of events.value
    and APPLIED to the odd half — the train-once-bucket-everywhere
    pattern (persisted round6 edges, the IVF-index shape applied to
    feature prep).  Assignment = count of boundaries strictly below x
    (the equidepth convention), edges ride as an array literal so the
    transform is pure codegen.  The oracle fits with quantile_cont (the
    percentile-equivalent interpolation) on the same half and replays
    the list-count assignment; every bucket count is value-checked —
    near-quartile counts with genuine train/serve drift."""
    ev = load_table(spark, sf_dir, "events")
    train = ev.filter(F.col("event_id") % 2 == 0).select("value")
    serve = ev.filter(F.col("event_id") % 2 == 1).select("value")
    edges = stats.fit_quantile_bins(train, "value", 4)
    out = stats.apply_bins(serve, "value", edges)
    return out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "rfm_orders",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS key,
             max(epoch_us(o_orderdate)) AS last_us,
             CAST(count(*) AS BIGINT) AS frequency,
             sum(CAST(CAST(round(o_totalprice * 1e6) AS BIGINT) AS HUGEINT))
               AS m_micro
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      GROUP BY 1),
    a AS (SELECT max(last_us) AS asof_us FROM per),
    en AS (SELECT key,
                  CAST(floor((asof_us - last_us) / 86400000000.0) AS BIGINT)
                    AS recency_days,
                  frequency,
                  round(CAST(m_micro AS DOUBLE) / 1e6, 6) AS monetary
           FROM per, a),
    ed AS (SELECT
      list_sort(list_distinct(list_transform(
        quantile_cont(CAST(recency_days AS DOUBLE),
                      [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)))) AS er,
      list_sort(list_distinct(list_transform(
        quantile_cont(CAST(frequency AS DOUBLE),
                      [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)))) AS ef,
      list_sort(list_distinct(list_transform(
        quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
        e -> round(e, 6)))) AS em
      FROM en),
    sc AS (SELECT key, recency_days, frequency, monetary,
             5 - len(list_filter(er, e -> e < CAST(recency_days AS DOUBLE)))
               AS r_score,
             len(list_filter(ef, e -> e < CAST(frequency AS DOUBLE))) + 1
               AS f_score,
             len(list_filter(em, e -> e < monetary)) + 1 AS m_score
           FROM en, ed)
    SELECT key, recency_days, frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           concat(r_score, '-', f_score, '-', m_score) AS segment
    FROM sc
    """,
)
def rfm_orders(spark, sf_dir) -> DataFrame:
    """RFM segmentation (temporal.rfm_report, k=5) over orders per
    customer: exact integer-day recency against the table's own last
    order (self-as-of), order counts, micro-unit-exact monetary totals;
    quantile edges fitted once (round-6, DEDUPED — frequency quantiles
    tie at small integer counts and a duplicated edge would double-count
    in the strictly-below assignment), scores 1..5 with recency reversed
    so higher is better, fused ','-free segment label.  All ~1,000
    customer rows value-checked against the quantile_cont + list_filter
    replay."""
    orders = load_table(spark, sf_dir, "orders")
    return temporal.rfm_report(
        orders, "o_custkey", "o_orderdate", "o_totalprice", k=5
    )


@query(
    "exact_quantiles_events_value",
    oracle="""
    WITH per AS (SELECT value AS v, count(*) AS cnt FROM events
                 WHERE value IS NOT NULL GROUP BY v),
    c AS (SELECT v, cnt,
                 sum(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT sum(cnt) AS n FROM per),
    p AS (SELECT CAST(unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
                      AS DOUBLE) AS prob),
    r AS (SELECT p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r.prob, CAST(r.n AS BIGINT) AS n, r.rank, c.v AS value
    FROM r JOIN c ON r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def exact_quantiles_events_value(spark, sf_dir) -> DataFrame:
    """EXACT quantiles of events.value at 7 probs (stats.exact_quantiles)
    — the exact counterpart of the t-digest estimates and the
    range-partitioner boundary planner, computed with NO global sort:
    distinct-value fold, bounded bin-prefix (the only single-partition
    exchange, <=1024 rows), keyed within-bin cumulative; each distinct
    value owns its exact rank interval and the broadcast probs frame
    probes those intervals.  Value-checked against DuckDB's ordered
    replay at every prob."""
    from ..operators.stats import exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(
        ev, "value", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
        lo=0.0, hi=500.0, bins=1 << 10,
    )


@query(
    "grouped_quantiles_events_value",
    oracle="""
    WITH per AS (SELECT event_type AS "group", value AS v, count(*) AS cnt
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    c AS (SELECT "group", v, cnt,
                 sum(cnt) OVER (PARTITION BY "group" ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT "group", sum(cnt) AS n FROM per GROUP BY 1),
    p AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS prob),
    r AS (SELECT t."group", p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r."group", r.prob, CAST(r.n AS BIGINT) AS n, r.rank,
           c.v AS value
    FROM r JOIN c ON r."group" = c."group"
                 AND r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def grouped_quantiles_events_value(spark, sf_dir) -> DataFrame:
    """Per-event-type EXACT p50/p95/p99 of value
    (stats.grouped_exact_quantiles) — the per-key latency-percentile
    shape, with NO single-partition exchange AT ALL: every stage of the
    bounded-prefix decomposition (distinct fold, bin prefix, within-bin
    cumulative, rank-interval probe) is keyed by the group, so the plan
    scales to any number of groups.  All 15 (group, prob) rows
    value-checked against DuckDB's per-group ordered replay."""
    from ..operators.stats import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    return grouped_exact_quantiles(
        ev, "value", "event_type", [0.5, 0.95, 0.99],
        lo=0.0, hi=500.0, bins=1 << 10,
    )


@query(
    "weighted_quantiles_documents",
    oracle="""
    WITH base AS (
      SELECT CAST(n_chars AS DOUBLE) AS v,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS w
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL),
    per AS (SELECT v, sum(w) AS cnt FROM base WHERE w > 0 GROUP BY v),
    c AS (SELECT v, cnt,
                 sum(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT sum(cnt) AS n FROM per),
    p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS prob),
    r AS (SELECT p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r.prob, CAST(r.n AS BIGINT) AS n, r.rank, c.v AS value
    FROM r JOIN c ON r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def weighted_quantiles_documents(spark, sf_dir) -> DataFrame:
    """Token-mass-weighted length percentiles (stats.exact_quantiles with
    weight_col): "below what character length does a quarter / half /
    three-quarters / 90% of the corpus's TOKEN MASS sit" — the packing /
    truncation planning question row-count percentiles answer wrongly
    (long docs dominate mass).  n is the total integer token weight;
    identical bounded-prefix plan, only the summed quantity changes.
    All 4 rows value-checked vs the weighted ordered replay."""
    from ..operators.stats import exact_quantiles

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")),
    )
    return exact_quantiles(
        docs, "n_chars", [0.25, 0.5, 0.75, 0.9],
        lo=0.0, hi=10000.0, bins=1 << 10, weight_col="toks",
    )


@query(
    "seasonal_decompose_events",
    oracle="""
    WITH src AS (
      SELECT event_type, epoch_us(ts) AS us, value FROM events
      WHERE ts IS NOT NULL
    ),
    cells AS (
      SELECT event_type, us - us % 86400000000 AS b,
             round(avg(value), 6) AS val
      FROM src GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(b) AS mn, max(b) AS mx FROM cells GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(mn, mx, 86400000000)) AS b
      FROM spans
    ),
    grid AS (
      SELECT s.event_type, s.b,
             last_value(c.val IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
      FROM spine s LEFT JOIN cells c
        ON c.event_type = s.event_type AND c.b = s.b
    ),
    q AS (
      SELECT event_type, b,
             CAST(round(val * 1000000) AS BIGINT) AS vm
      FROM grid
    ),
    w AS (
      SELECT event_type, b, vm,
             sum(vm) OVER win AS wsum,
             count(vm) OVER win AS wcnt,
             min(b) OVER (PARTITION BY event_type) AS mnb
      FROM q
      WINDOW win AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    t AS (
      SELECT event_type, b, vm,
             ((b - mnb) // 86400000000) % 7 AS pos,
             CASE WHEN wcnt = 7 AND vm IS NOT NULL
                  THEN CAST(round(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT)
             END AS tm
      FROM w
    ),
    d AS (SELECT *, vm - tm AS dm FROM t),
    pt AS (
      SELECT event_type, pos, sum(dm) AS s, count(*) AS c
      FROM d WHERE dm IS NOT NULL GROUP BY 1, 2
    ),
    tt AS (
      SELECT event_type, sum(s) AS st, sum(c) AS ct FROM pt GROUP BY 1
    ),
    sa AS (
      SELECT pt.event_type, pt.pos,
             CAST(round(CAST(pt.s AS DOUBLE) / CAST(pt.c AS DOUBLE)
                        - CAST(tt.st AS DOUBLE) / CAST(tt.ct AS DOUBLE))
                  AS BIGINT) AS sm
      FROM pt JOIN tt ON pt.event_type = tt.event_type
    )
    SELECT d.event_type, d.b AS bucket_us,
           round(d.vm / 1000000.0, 6) AS value,
           round(d.tm / 1000000.0, 6) AS trend,
           CASE WHEN d.tm IS NOT NULL
                THEN round(sa.sm / 1000000.0, 6) END AS seasonal,
           CASE WHEN d.tm IS NOT NULL
                THEN round((d.vm - d.tm - sa.sm) / 1000000.0, 6)
           END AS residual
    FROM d LEFT JOIN sa
      ON sa.event_type = d.event_type AND sa.pos = d.pos
    """,
)
def seasonal_decompose_events(spark, sf_dir) -> DataFrame:
    """Classical additive decomposition of the per-type daily mean value
    at period 7 (temporal.seasonal_decompose) — the fit stage between
    "ACF found weekly seasonality" and "alert on the residual": value =
    centered-MA trend + weighted-centered weekly seasonal + residual,
    every step exact-integer until the final round-6 division, trend
    NULL where the 7-bucket window is incomplete (never a partial
    average).  Every grid row's four components value-checked against
    the windowed-SQL replay."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.seasonal_decompose(
        ev, ["event_type"], "ts", "value", 86400, 7
    )


@query(
    "scale_mismatch_events",
    oracle="""
    WITH src AS (
      SELECT event_type AS grp,
             CASE WHEN event_type = 'error' THEN value * 1000.0
                  ELSE value END AS v
      FROM events
    ),
    mags AS (
      SELECT grp, round(log10(abs(v)), 6) AS m
      FROM src WHERE grp IS NOT NULL AND v IS NOT NULL AND v <> 0
    ),
    cnt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM mags GROUP BY 1),
    rk AS (SELECT mags.*, row_number() OVER (PARTITION BY grp ORDER BY m)
                  AS rn FROM mags),
    med AS (
      SELECT rk.grp, rk.m AS median_mag
      FROM rk JOIN cnt ON cnt.grp = rk.grp
      WHERE rk.rn = CAST(ceil(CAST(cnt.n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    p AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             a.median_mag AS median_mag_a, b.median_mag AS median_mag_b,
             CAST(round(b.median_mag - a.median_mag) AS BIGINT)
               AS decade_offset
      FROM med a JOIN med b ON a.grp < b.grp
    )
    SELECT group_a, group_b, median_mag_a, median_mag_b, decade_offset,
           (abs(decade_offset) >= 1
            AND abs((median_mag_b - median_mag_a)
                    - CAST(decade_offset AS DOUBLE)) <= 0.2) AS flagged
    FROM p
    """,
)
def scale_mismatch_events(spark, sf_dir) -> DataFrame:
    """Unit-scale mismatch detection across event types
    (stats.scale_mismatch_report) with a PLANTED cents-vs-dollars-style
    bug: the query scales 'error' values ×1000 before profiling, and the
    operator must flag exactly the error-vs-peer pairs as clean 3-decade
    shifts while the organic pairs stay offset 0 — the bug every schema
    and range check passes, betrayed only by the per-source median order
    of magnitude.  Type-1 rank medians of round-6 log10 magnitudes
    (exactly replayable), pairs over the bounded group table.  All 10
    pair rows value-checked."""
    from ..operators.stats import scale_mismatch_report

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.col("value") * 1000.0).otherwise(
            F.col("value")
        ),
    )
    return scale_mismatch_report(ev, "event_type", "v")


@query(
    "gini_documents_tokens",
    oracle="""
    WITH s AS (
      SELECT CAST(round(CAST(len(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM documents WHERE text IS NOT NULL
    ),
    o AS (SELECT vm, row_number() OVER (ORDER BY vm) AS i FROM s),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(sum(2 * CAST(i AS HUGEINT) * vm) AS DOUBLE) AS t2
      FROM o
    )
    SELECT n, round(sv / 1000000.0, 6) AS sum_value,
           CASE WHEN sv > 0
                THEN round((t2 - (CAST(n AS DOUBLE) + 1.0) * sv)
                           / (CAST(n AS DOUBLE) * sv), 6)
           END AS gini
    FROM agg
    """,
)
def gini_documents_tokens(spark, sf_dir) -> DataFrame:
    """Exact Gini concentration of the corpus's TOKEN MASS across
    documents (stats.gini_coefficient) — "is the corpus a handful of
    giant documents or an even spread", the diagnostic the mixture
    planner and dedup budget read.  NO global sort anywhere: each
    distinct token count's exact global rank interval comes from the
    bounded-prefix decomposition, and Σ rank·value folds through the
    closed form (b(b+1) − a(a+1))/2 per tie-run — tie order provably
    irrelevant, everything decimal-exact until one round-6 division.
    The oracle is the ordered replay; (n, mass, gini) value-checked."""
    from ..operators.stats import gini_coefficient
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        token_count("text").cast("double").alias("v")
    )
    return gini_coefficient(docs, "v", 0.0, 4096.0, bins=1 << 10)


@query(
    "spearman_lineitem",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS a, l_extendedprice AS b, l_discount AS c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    r AS (
      SELECT
        2 * (rank() OVER (ORDER BY a)) + (count(*) OVER (PARTITION BY a)) - 1 AS ra,
        2 * (rank() OVER (ORDER BY b)) + (count(*) OVER (PARTITION BY b)) - 1 AS rb,
        2 * (rank() OVER (ORDER BY c)) + (count(*) OVER (PARTITION BY c)) - 1 AS rc
      FROM base
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(ra AS HUGEINT)) AS DOUBLE) AS sa,
             CAST(sum(CAST(rb AS HUGEINT)) AS DOUBLE) AS sb,
             CAST(sum(CAST(rc AS HUGEINT)) AS DOUBLE) AS sc,
             CAST(sum(CAST(ra AS HUGEINT) * ra) AS DOUBLE) AS qa,
             CAST(sum(CAST(rb AS HUGEINT) * rb) AS DOUBLE) AS qb,
             CAST(sum(CAST(rc AS HUGEINT) * rc) AS DOUBLE) AS qc,
             CAST(sum(CAST(ra AS HUGEINT) * rb) AS DOUBLE) AS pab,
             CAST(sum(CAST(ra AS HUGEINT) * rc) AS DOUBLE) AS pac,
             CAST(sum(CAST(rb AS HUGEINT) * rc) AS DOUBLE) AS pbc
      FROM r
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
           CASE WHEN n >= 2 AND n * qa - sa * sa > 0 AND n * qb - sb * sb > 0
                THEN round((n * pab - sa * sb)
                     / (sqrt(n * qa - sa * sa) * sqrt(n * qb - sb * sb)), 6)
           END AS spearman
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount', n,
           CASE WHEN n >= 2 AND n * qa - sa * sa > 0 AND n * qc - sc * sc > 0
                THEN round((n * pac - sa * sc)
                     / (sqrt(n * qa - sa * sa) * sqrt(n * qc - sc * sc)), 6)
           END
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', n,
           CASE WHEN n >= 2 AND n * qb - sb * sb > 0 AND n * qc - sc * sc > 0
                THEN round((n * pbc - sb * sc)
                     / (sqrt(n * qb - sb * sb) * sqrt(n * qc - sc * sc)), 6)
           END
    FROM m
    """,
)
def spearman_lineitem(spark, sf_dir) -> DataFrame:
    """All-pairs Spearman rank correlation over (l_quantity,
    l_extendedprice, l_discount) (stats.spearman_pairs) — the monotone
    association the Pearson panel misses under heavy tails (one wild row
    drags Pearson, moves a rank by one; pytest-demonstrated).  Listwise
    sample, exact integer doubled-tie-ranks from the same bounded-prefix
    machinery as exact_quantiles (no corpus sort, no distinct-value
    single-partition window), decimal moments, ONE final aggregate for
    all three pairs.  Value-checked against DuckDB's rank-window
    replay."""
    from ..operators.stats import spearman_pairs

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("l_quantity"),
        F.col("l_extendedprice").alias("l_extendedprice"),
        F.col("l_discount").alias("l_discount"),
    )
    return spearman_pairs(
        li,
        ["l_quantity", "l_extendedprice", "l_discount"],
        0.0,
        120000.0,
        bins=1 << 10,
    )


@query(
    "gini_by_source_documents",
    oracle="""
    WITH s AS (
      SELECT source AS g,
             CAST(round(CAST(len(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    o AS (SELECT g, vm,
                 row_number() OVER (PARTITION BY g ORDER BY vm) AS i
          FROM s),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(sum(2 * CAST(i AS HUGEINT) * vm) AS DOUBLE) AS t2
      FROM o GROUP BY 1
    )
    SELECT g AS source, n, round(sv / 1000000.0, 6) AS sum_value,
           CASE WHEN sv > 0
                THEN round((t2 - (CAST(n AS DOUBLE) + 1.0) * sv)
                           / (CAST(n AS DOUBLE) * sv), 6)
           END AS gini
    FROM agg
    """,
)
def gini_by_source_documents(spark, sf_dir) -> DataFrame:
    """Per-source token-mass concentration (stats.grouped_gini) — "which
    SOURCE is a monoculture": the corpus-mixture diagnostic keyed by
    source, with the grouped_quantiles discipline applied to the Gini
    rank decomposition — every stage keys by the group, so the plan has
    ZERO single-partition exchanges (pytest-pinned) and scales to any
    source count.  All per-source rows value-checked vs the per-group
    ordered replay."""
    from ..operators.stats import grouped_gini
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").cast("double").alias("v")
    )
    return grouped_gini(docs, "v", "source", 0.0, 4096.0, bins=1 << 10)


@query(
    "skyline_lineitem",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DOUBLE) AS x,
             CAST(l_quantity AS DOUBLE) AS y
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    mx AS (SELECT x, max(y) AS my FROM t GROUP BY x),
    s AS (SELECT x, my,
                 max(my) OVER (ORDER BY x DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
          FROM mx),
    front AS (SELECT x, my FROM s WHERE m IS NULL OR my > m)
    SELECT t.l_orderkey, t.l_linenumber,
           t.x AS l_extendedprice, t.y AS l_quantity
    FROM t JOIN front f ON t.x = f.x AND t.y = f.my
    """,
)
def skyline_lineitem(spark, sf_dir) -> DataFrame:
    """2-D Pareto front of (l_extendedprice, l_quantity), both maximized
    (stats.skyline2d) — the rows no other line item beats in both price
    and quantity: the multi-objective selection a single-score top-k
    structurally misses.  No global sort: the exclusive cross-x suffix
    max runs the bounded-prefix decomposition in REVERSE (per-bin maxima
    suffix-folded over the ≤ bins-row bin table, keyed within-bin
    windows); only comparisons touch values, so parity is exact with no
    quantization.  Every front row value-checked vs the windowed
    staircase replay."""
    from ..operators.stats import skyline2d

    li = load_table(spark, sf_dir, "lineitem")
    return skyline2d(
        li,
        "l_extendedprice",
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
        0.0,
        120000.0,
        bins=1 << 10,
    )


@query(
    "rare_combinations_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 20011 = 7 THEN 'Q'
                  ELSE l_returnflag END AS returnflag,
             l_linestatus
      FROM lineitem
    ),
    c AS (SELECT returnflag, l_linestatus,
                 CAST(count(*) AS BIGINT) AS combo_count
          FROM src GROUP BY 1, 2
          HAVING count(*) <= 5)
    SELECT s.l_orderkey, s.l_linenumber, s.returnflag, s.l_linestatus,
           c.combo_count
    FROM src s JOIN c ON s.returnflag IS NOT DISTINCT FROM c.returnflag
                     AND s.l_linestatus IS NOT DISTINCT FROM c.l_linestatus
    """,
)
def rare_combinations_lineitem(spark, sf_dir) -> DataFrame:
    """Composite-rarity audit (stats.rare_combinations) with a PLANTED
    typo source: l_shipmode is corrupted to 'AIRR' for l_orderkey %
    20011 == 7 identically in both engines, producing category tuples
    that are individually plausible but nearly unique — the composite-
    typo class single-column enum checks pass by construction.  Every
    flagged row + its combo count value-checked."""
    from ..operators.stats import rare_combinations

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 20011 == 7, F.lit("Q"))
        .otherwise(F.col("l_returnflag"))
        .alias("returnflag"),
        "l_linestatus",
    )
    return rare_combinations(
        li, ["returnflag", "l_linestatus"], 5, ["l_orderkey", "l_linenumber"]
    )


@query(
    "ordinal_lineitem_quantity_price",
    oracle="""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS a,
             CAST(floor(l_extendedprice / 20000.0) AS BIGINT) AS b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1, 2),
    c AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
          FROM cells x JOIN cells y ON y.a > x.a AND y.b > x.b),
    d AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
          FROM cells x JOIN cells y ON y.a > x.a AND y.b < x.b),
    ta AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
           FROM cells x JOIN cells y ON y.a = x.a AND y.b > x.b),
    tb AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
           FROM cells x JOIN cells y ON y.b = x.b AND y.a > x.a),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS v FROM cells)
    SELECT nn.v AS n,
           CAST(c.v AS BIGINT) AS concordant,
           CAST(d.v AS BIGINT) AS discordant,
           CAST(ta.v AS BIGINT) AS ties_a,
           CAST(tb.v AS BIGINT) AS ties_b,
           CASE WHEN CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE) > 0
                THEN round((CAST(c.v AS DOUBLE) - CAST(d.v AS DOUBLE))
                           / (CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)), 6)
           END AS gamma,
           CASE WHEN CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)
                     + CAST(tb.v AS DOUBLE) > 0
                THEN round((CAST(c.v AS DOUBLE) - CAST(d.v AS DOUBLE))
                           / (CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)
                              + CAST(tb.v AS DOUBLE)), 6)
           END AS somers_d_ba
    FROM nn, c, d, ta, tb
    """,
)
def ordinal_lineitem_quantity_price(spark, sf_dir) -> DataFrame:
    """Goodman–Kruskal γ + Somers' D between quantity and the price
    band (stats.ordinal_association) — the MONOTONE-with-direction
    answer Cramér's V can't give (V sees unordered labels).  On this
    synthetic lineitem the generator draws the two INDEPENDENTLY, and
    γ = 0.0019 over 1.44 billion pairs is exactly the right readout —
    the negative control that shows the statistic doesn't invent
    monotonicity (the positive direction is pytest-pinned on
    constructed monotone data).  All
    pair counting runs over the bounded joint cell table (never rows),
    pair counts as exact decimals (they are O(n²) in magnitude — int64
    dies at corpus scale, documented).  One row value-checked."""
    from ..operators.stats import ordinal_association

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("a"),
        F.floor(F.col("l_extendedprice") / 20000.0).cast("long").alias("b"),
    )
    return ordinal_association(li, "a", "b")
