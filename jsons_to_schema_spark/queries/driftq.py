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
# Distribution drift (oracled via exact percentiles)
# ===========================================================================

@query(
    "drift_events_value",
    oracle="""
    WITH b AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) q FROM events
               WHERE user_id % 2 = 0),
         c AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) q FROM events
               WHERE user_id % 2 = 1),
         p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS p,
                      generate_subscripts([0.25, 0.5, 0.75, 0.95], 1) AS i)
    SELECT p.p AS p, round(b.q[p.i], 6) AS base_q, round(c.q[p.i], 6) AS cur_q,
           round(c.q[p.i] - b.q[p.i], 6) AS delta
    FROM p, b, c
    """,
)
def drift_events_value(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1)
    d = drift.quantile_drift(base, cur, "value", [0.25, 0.5, 0.75, 0.95], engine="exact")
    return d.select(
        "p",
        F.round("base_q", 6).alias("base_q"),
        F.round("cur_q", 6).alias("cur_q"),
        F.round(F.col("cur_q") - F.col("base_q"), 6).alias("delta"),
    )


@query(
    "drift_documents_nchars",
    oracle="""
    WITH b AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) q
               FROM documents WHERE doc_id % 2 = 0),
         c AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) q
               FROM documents WHERE doc_id % 2 = 1),
         p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS p,
                      generate_subscripts([0.25, 0.5, 0.75, 0.95], 1) AS i)
    SELECT p.p AS p, round(b.q[p.i], 6) AS base_q, round(c.q[p.i], 6) AS cur_q,
           round(c.q[p.i] - b.q[p.i], 6) AS delta
    FROM p, b, c
    """,
)
def drift_documents_nchars(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    d = drift.quantile_drift(
        base, cur, "n_chars", [0.25, 0.5, 0.75, 0.95], engine="exact"
    )
    return d.select(
        "p",
        F.round("base_q", 6).alias("base_q"),
        F.round("cur_q", 6).alias("cur_q"),
        F.round(F.col("cur_q") - F.col("base_q"), 6).alias("delta"),
    )


@query("drift_events_value_tdigest")
def drift_events_value_tdigest(spark, sf_dir) -> DataFrame:
    """Quantile drift via the mergeable t-digest UDAF (third engine, tail-
    accurate).  Partition membership is pinned (hash-repartition on
    event_id) and partials merge in pid order, so the sketch output is
    run- and core-count-deterministic — the oracle is a pinned snapshot
    (scripts/gen_constant_oracles.py); accuracy vs exact quantiles is
    asserted in tests/test_operators.py."""
    from jsons_to_schema_spark.operators import tdigest

    ev = load_table(spark, sf_dir, "events")
    rows = tdigest.tdigest_drift(
        ev.filter(F.col("user_id") % 2 == 0),
        ev.filter(F.col("user_id") % 2 == 1),
        "value",
        [0.25, 0.5, 0.75, 0.95],
        partitions=32,
        key="event_id",
    )
    return spark.createDataFrame(rows, "p double, base_q double, cur_q double, delta double")


# ===========================================================================
# Round-4 continuation: metric-history anomalies, key/FD discovery,
# datatype consistency, Bloom-prefilter decontamination
# ===========================================================================

@query(
    "metric_anomalies_events",
    oracle="""
    WITH base AS (
      SELECT event_id % 5 AS run_id,
             CASE WHEN event_id % 10 = 9 THEN NULL ELSE value END AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'maximum', maxv FROM wide
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history
      FROM m WHERE run_id < 4 GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 4
    )
    SELECT cur.dataset, cur.instance, cur.metric, cur.value,
           hist_mean, hist_stddev, hist_last,
           CAST(coalesce(n_history, 0) AS BIGINT) AS n_history,
           CASE WHEN coalesce(n_history, 0) >= 2
                THEN abs(cur.value - hist_mean) > 3.0 * hist_stddev
           END AS is_anomaly
    FROM cur LEFT JOIN hist USING (dataset, instance, metric)
    """,
)
def metric_anomalies_events(spark, sf_dir) -> DataFrame:
    """Metric-history anomaly detection (operators/metrics_repo.py, the
    deequ MetricsRepository + AnomalyDetection pattern): events split into
    5 deterministic "runs" (event_id % 5), per-run size / completeness /
    mean / min / max computed in ONE grouped scan, run 4 judged against
    runs 0-3 with the online-normal strategy (|value − mean| > 3σ).  Run 4
    has a planted quality regression — half its values nulled
    (event_id % 10 == 9) — so the completeness anomaly actually FIRES
    (zero-variance history, any deviation flags) while well-behaved
    metrics pass.  All comparisons on round-6 values for cross-engine
    bit-stability."""
    from ..operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 5).alias("run"),
        F.when(F.col("event_id") % 10 == 9, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["value"], dataset="events", run_col="run"
    )
    return metrics_repo.detect_metric_anomalies(
        m, current_run=4, strategy="online_normal", k=3.0, min_history=2
    )


@query(
    "drift_psi_events_value",
    oracle="""
    WITH sp AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bucket),
         cb AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket, count(*) AS n
           FROM events
           WHERE event_id % 2 = 0 AND value IS NOT NULL
             AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         ),
         cc AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket, count(*) AS n
           FROM events
           WHERE event_id % 2 = 1 AND value IS NOT NULL
             AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         ),
         h AS (
           SELECT sp.bucket,
                  CAST(coalesce(cb.n, 0) AS BIGINT) AS base_n,
                  CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
           FROM sp LEFT JOIN cb USING (bucket) LEFT JOIN cc USING (bucket)
         ),
         t AS (SELECT CAST(sum(base_n) AS BIGINT) AS bt,
                      CAST(sum(cur_n) AS BIGINT) AS ct FROM h)
    SELECT h.bucket,
           0.0 + h.bucket * 25.0 AS bucket_lo,
           0.0 + (h.bucket + 1) * 25.0 AS bucket_hi,
           h.base_n, h.cur_n,
           round(((cur_n + 0.5) / (ct + 10.0) - (base_n + 0.5) / (bt + 10.0))
                 * ln(((cur_n + 0.5) / (ct + 10.0))
                      / ((base_n + 0.5) / (bt + 10.0))), 6) AS psi_term
    FROM h, t
    """,
)
def drift_psi_events_value(spark, sf_dir) -> DataFrame:
    """Population Stability Index drift (drift.psi_report): the binned
    industry-standard drift number beside the quantile-vector comparison.
    Baseline/current slices derive deterministically from event_id parity;
    both sides bucket with the identical histogram expression, smoothed
    proportions (s=0.5) keep empty buckets finite, per-term round(6) makes
    the comparison summation-order-proof.  Each side is one bounded
    map-side-partial groupBy — never a data-sized shuffle."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    return drift.psi_report(base, cur, "value", 0.0, 500.0, 20)


@query(
    "drift_psi_grouped_events",
    oracle="""
    WITH cb AS (
      SELECT CAST(event_type AS VARCHAR) AS grp,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 0 AND event_type IS NOT NULL
        AND value IS NOT NULL AND value >= 0.0 AND value <= 500.0
      GROUP BY 1, 2
    ),
    cc AS (
      SELECT CAST(event_type AS VARCHAR) AS grp,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 1 AND event_type IS NOT NULL
        AND value IS NOT NULL AND value >= 0.0 AND value <= 500.0
      GROUP BY 1, 2
    ),
    g AS (SELECT grp FROM cb UNION SELECT grp FROM cc),
    sp AS (
      SELECT g.grp, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket FROM g
    ),
    j AS (
      SELECT sp.grp, sp.bucket,
             CAST(coalesce(cb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN cb USING (grp, bucket) LEFT JOIN cc USING (grp, bucket)
    ),
    t AS (
      SELECT grp, CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j.grp AS "group", j.bucket,
           0.0 + j.bucket * 50.0 AS bucket_lo,
           0.0 + (j.bucket + 1) * 50.0 AS bucket_hi,
           j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING (grp)
    """,
)
def drift_psi_grouped_events(spark, sf_dir) -> DataFrame:
    """Sliced PSI drift (drift.psi_report_grouped): per-event-type drift
    between the event_id-parity slices — "which segment drifted", the
    check a stable global distribution can hide a segment collapse from.
    One (group, bucket) aggregate per side (shuffle bounded by groups ×
    buckets), group-windowed totals, smoothed terms round(6)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    return drift.psi_report_grouped(
        base, cur, "value", "event_type", 0.0, 500.0, 10
    )


@query(
    "drift_psi_multi_lineitem",
    oracle="""
    WITH mb AS (
      SELECT 'l_quantity' AS col,
             least(CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT), 9)
               AS bucket, count(*) AS n
      FROM lineitem
      WHERE l_orderkey % 2 = 0 AND l_quantity IS NOT NULL
        AND l_quantity >= 0.0 AND l_quantity <= 50.0
      GROUP BY 2
      UNION ALL
      SELECT 'l_discount',
             least(CAST(floor((l_discount - 0.0) / 0.01) AS BIGINT), 9),
             count(*)
      FROM lineitem
      WHERE l_orderkey % 2 = 0 AND l_discount IS NOT NULL
        AND l_discount >= 0.0 AND l_discount <= 0.1
      GROUP BY 2
    ),
    mc AS (
      SELECT 'l_quantity' AS col,
             least(CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT), 9)
               AS bucket, count(*) AS n
      FROM lineitem
      WHERE l_orderkey % 2 = 1 AND l_quantity IS NOT NULL
        AND l_quantity >= 0.0 AND l_quantity <= 50.0
      GROUP BY 2
      UNION ALL
      SELECT 'l_discount',
             least(CAST(floor((l_discount - 0.0) / 0.01) AS BIGINT), 9),
             count(*)
      FROM lineitem
      WHERE l_orderkey % 2 = 1 AND l_discount IS NOT NULL
        AND l_discount >= 0.0 AND l_discount <= 0.1
      GROUP BY 2
    ),
    sp AS (
      SELECT col, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket,
             lo + CAST(unnest(range(0, 10)) AS BIGINT) * w AS bucket_lo,
             lo + (CAST(unnest(range(0, 10)) AS BIGINT) + 1) * w AS bucket_hi
      FROM (SELECT col, CAST(lo AS DOUBLE) AS lo, CAST(w AS DOUBLE) AS w
            FROM (VALUES ('l_quantity', 0.0, 5.0), ('l_discount', 0.0, 0.01))
                 v0(col, lo, w)) v
    ),
    j AS (
      SELECT sp.col AS "column", sp.bucket, sp.bucket_lo, sp.bucket_hi,
             CAST(coalesce(mb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(mc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN mb ON sp.col = mb.col AND sp.bucket = mb.bucket
              LEFT JOIN mc ON sp.col = mc.col AND sp.bucket = mc.bucket
    ),
    t AS (
      SELECT "column", CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j."column", j.bucket, j.bucket_lo, j.bucket_hi, j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING ("column")
    """,
)
def drift_psi_multi_lineitem(spark, sf_dir) -> DataFrame:
    """Multi-column PSI (drift.psi_report_multi): l_quantity and
    l_discount drift between the orderkey-parity slices in TWO scans
    total (one melt per side), not two per column — the
    single-multi-aggregate-pass ethos applied to drift monitoring."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 2 == 0)
    cur = li.filter(F.col("l_orderkey") % 2 == 1)
    return drift.psi_report_multi(
        base, cur, {"l_quantity": (0.0, 50.0), "l_discount": (0.0, 0.1)}, 10
    )


@query(
    "benford_lineitem_extendedprice",
    oracle="""
    WITH sp AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit),
         c AS (
           SELECT CAST(substring(CAST(CAST(floor(abs(l_extendedprice))
                        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                  count(*) AS n
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL
             AND abs(l_extendedprice) < 1e18
             AND floor(abs(l_extendedprice)) >= 1
           GROUP BY 1
         ),
         j AS (
           SELECT sp.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
           FROM sp LEFT JOIN c USING (digit)
         ),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM j)
    SELECT j.digit, j.n_rows,
           round(j.n_rows / t.total, 6) AS share,
           round(log10(1.0 + 1.0 / j.digit), 6) AS benford_p,
           round(j.n_rows / t.total - log10(1.0 + 1.0 / j.digit), 6) AS delta
    FROM j, t ORDER BY j.digit
    """,
)
def benford_lineitem_extendedprice(spark, sf_dir) -> DataFrame:
    """Benford first-digit profile (stats.benford_profile): the
    fabricated-/corrupted-numbers screen.  Digits are read from the
    FLOORED integer's decimal string (integer→string is byte-identical
    across engines; log10 digit extraction is boundary-hazardous at
    powers of ten), one 9-group map-side-partial aggregate + broadcast
    spine.  TPC-H prices are NOT Benford-distributed, so the delta
    column carries real signal to value-check."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.benford_profile(li, "l_extendedprice")


@query(
    "drift_divergence_events_value",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 0 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    c AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 1 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    sp AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bucket),
    j AS (
      SELECT sp.bucket,
             CAST(coalesce(b.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(c.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
    ),
    t AS (SELECT CAST(sum(base_n) AS BIGINT) AS bt,
                 CAST(sum(cur_n) AS BIGINT) AS ct FROM j),
    terms AS (
      SELECT j.bucket, j.base_n, j.cur_n, t.bt, t.ct,
             (j.base_n + 0.5) / (t.bt + 5.0) AS pb,
             (j.cur_n + 0.5) / (t.ct + 5.0) AS pc,
             CAST(sum(j.base_n) OVER (ORDER BY j.bucket) AS BIGINT) AS cb,
             CAST(sum(j.cur_n) OVER (ORDER BY j.bucket) AS BIGINT) AS cc
      FROM j, t
    ),
    per AS (
      SELECT round((pc - pb) * ln(pc / pb), 6) AS psi_term,
             round(0.5 * pb * ln(pb / ((pb + pc) / 2))
                   + 0.5 * pc * ln(pc / ((pb + pc) / 2)), 6) AS js_term,
             round(pow((cur_n + 0.5) - pb * (ct + 5.0), 2)
                   / (pb * (ct + 5.0)), 6) AS chi2_term,
             round(abs(cb / bt - cc / ct), 6) AS ks_term,
             round(abs(cb / bt - cc / ct) * 50.0, 6) AS emd_term
      FROM terms
    )
    SELECT round(sum(psi_term), 6) AS psi,
           round(sum(js_term), 6) AS js_divergence,
           round(sum(chi2_term), 6) AS chi2,
           max(ks_term) AS ks_stat,
           round(sum(emd_term), 6) AS wasserstein
    FROM per
    """,
)
def drift_divergence_events_value(spark, sf_dir) -> DataFrame:
    """Binned divergence panel (drift.divergence_report + score): PSI,
    Jensen-Shannon, chi-squared, binned KS, and Wasserstein-1 between the
    event_id-parity slices of events.value, all from the same two bounded
    histogram scans PSI alone costs — five drift metrics with different
    sensitivities for the price of one.  Every per-bucket term and every
    folded scalar is round(6) from exact long counts, recomputed
    relationally by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    rep = drift.divergence_report(base, cur, "value", 0.0, 500.0, 10)
    return drift.divergence_score(rep)


@query(
    "category_shift_documents_source",
    oracle="""
    WITH base AS (
      SELECT source AS category, count(*) AS base_n
      FROM documents WHERE doc_id % 2 = 0 AND source IS NOT NULL
      GROUP BY 1
    ),
    cur AS (
      SELECT CASE WHEN source = 'src0' THEN 'srcNEW' ELSE source END
               AS category,
             count(*) AS cur_n
      FROM documents WHERE doc_id % 2 = 1 AND source IS NOT NULL
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(base.category, cur.category) AS category,
             coalesce(base_n, 0) AS base_n, coalesce(cur_n, 0) AS cur_n
      FROM base FULL OUTER JOIN cur USING (category)
    ),
    t AS (SELECT sum(base_n) AS bt, sum(cur_n) AS ct FROM j)
    SELECT category, base_n, cur_n,
           CASE WHEN bt > 0 THEN round(base_n / bt, 6) ELSE 0.0 END
             AS base_share,
           CASE WHEN ct > 0 THEN round(cur_n / ct, 6) ELSE 0.0 END
             AS cur_share,
           round((CASE WHEN ct > 0 THEN round(cur_n / ct, 6) ELSE 0.0 END)
               - (CASE WHEN bt > 0 THEN round(base_n / bt, 6) ELSE 0.0 END),
               6) AS share_delta,
           CASE WHEN base_n = 0 THEN 'new'
                WHEN cur_n = 0 THEN 'vanished'
                ELSE 'stable' END AS status
    FROM j CROSS JOIN t
    """,
)
def category_shift_documents_source(spark, sf_dir) -> DataFrame:
    """Categorical domain drift (drift.category_shift): even-doc_id docs
    are the baseline snapshot, odd-doc_id docs the current slice with
    'src0' REMAPPED to 'srcNEW' — planting exactly one 'new' and one
    'vanished' member the report must name, with every other source
    graded 'stable' and its share delta computed from exact longs."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "source",
        F.when(F.col("source") == "src0", F.lit("srcNEW")).otherwise(
            F.col("source")
        ),
    )
    return drift.category_shift(base, cur, "source")


@query(
    "metric_anomalies_ewma_events",
    oracle="""
    WITH base AS (
      SELECT event_id % 8 AS run_id,
             value * (1.0 + 0.03 * (event_id % 8)) AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'maximum', maxv FROM wide
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY dataset, instance, metric
                                ORDER BY run_id) AS rn,
             count(*) OVER (PARTITION BY dataset, instance, metric) AS t
      FROM m WHERE run_id < 7 AND value IS NOT NULL
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history,
             round(sum(0.3 * pow(0.7, t - rn) * value)
                   + pow(0.7, count(value)) * avg(value), 6)
               AS hist_ewma,
             round(3.0 * round(coalesce(stddev_samp(value), 0.0), 6)
                   * sqrt(0.3 / 1.7
                          * (1 - pow(0.7, 2 * (count(value) + 1)))), 6)
               AS ewma_limit
      FROM ranked GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 7
    )
    SELECT cur.dataset, cur.instance, cur.metric, cur.value,
           hist_mean, hist_stddev, hist_last, hist_ewma,
           round(0.3 * cur.value + 0.7 * hist_ewma, 6) AS ewma_z,
           ewma_limit,
           CAST(coalesce(n_history, 0) AS BIGINT) AS n_history,
           CASE WHEN coalesce(n_history, 0) >= 2
                THEN abs(round(0.3 * cur.value + 0.7 * hist_ewma, 6)
                         - hist_mean) > ewma_limit
           END AS is_anomaly
    FROM cur LEFT JOIN hist USING (dataset, instance, metric)
    """,
)
def metric_anomalies_ewma_events(spark, sf_dir) -> DataFrame:
    """EWMA control chart over run history (metrics_repo strategy
    'ewma'): events split into 8 runs with a planted 3%-per-run creep in
    value scale, run 7 judged against runs 0-6 — the statistic
    z = α·value + (1−α)·EWMA(history) accumulates the drift while the
    constant metrics (size, completeness) sit exactly on their centers;
    every column (history EWMA, z, the variance-inflated limit, both
    verdict arms) is recomputed relationally by the oracle on the shared
    round-6 grid."""
    from ..operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 8).alias("run"),
        (F.col("value") * (1.0 + 0.03 * (F.col("event_id") % 8))).alias(
            "value"
        ),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["value"], dataset="events", run_col="run"
    )
    return metrics_repo.detect_metric_anomalies(
        m, current_run=7, strategy="ewma", k=3.0, alpha=0.3, min_history=2
    )


@query(
    "metric_anomalies_seasonal_events",
    oracle="""
    WITH m AS (
      SELECT CAST(event_id % 15 AS BIGINT) AS run_id,
             CASE WHEN event_id % 15 = 14 THEN 200.0
                  WHEN event_id % 15 % 7 = 0 THEN 100.0
                  ELSE 200.0 END AS sv,
             200.0 AS cv
      FROM events
    ), runs AS (
      SELECT run_id, round(avg(sv), 6) AS v_seasonal,
             round(avg(cv), 6) AS v_const
      FROM m GROUP BY 1
    ), hist AS (
      SELECT round(avg(v_seasonal), 6) AS mean_s,
             round(coalesce(stddev_samp(v_seasonal), 0.0), 6) AS sd_s,
             round(avg(v_const), 6) AS mean_c,
             round(coalesce(stddev_samp(v_const), 0.0), 6) AS sd_c,
             CAST(count(*) AS BIGINT) AS nh
      FROM runs WHERE run_id < 14 AND run_id % 7 = 14 % 7
    ), cur AS (SELECT v_seasonal, v_const FROM runs WHERE run_id = 14)
    SELECT 'events' AS dataset, 'v_seasonal' AS instance, 'mean' AS metric,
           cur.v_seasonal AS value, hist.mean_s AS hist_mean,
           hist.sd_s AS hist_stddev, hist.mean_s AS hist_last,
           hist.nh AS n_history,
           abs(cur.v_seasonal - hist.mean_s) > 3.0 * hist.sd_s AS is_anomaly
    FROM cur, hist
    UNION ALL
    SELECT 'events', 'v_const', 'mean', cur.v_const, hist.mean_c,
           hist.sd_c, hist.mean_c, hist.nh,
           abs(cur.v_const - hist.mean_c) > 3.0 * hist.sd_c
    FROM cur, hist
    """,
)
def metric_anomalies_seasonal_events(spark, sf_dir) -> DataFrame:
    """Seasonal anomaly strategy (metrics_repo.detect_metric_anomalies,
    strategy='seasonal_normal', season=7): a planted weekly pattern —
    history runs ≡ 0 mod 7 carry value 100, every other run 200 — and the
    CURRENT run 14 (phase 0, a "Sunday" slot) arrives with the WEEKDAY
    value 200.  Against the same-phase history {100, 100} the zero-stddev
    rule flags ANY deviation, so the seasonal strategy fires (is_anomaly
    true) while the constant companion metric stays quiet (false) — both
    verdict arms value-checked; the global-vs-seasonal discrimination is
    pinned separately in tests/test_metrics_bloom.py.  Size/completeness metrics are
    excluded (columns=) so both verdict rows are the planted means."""
    from ..operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 15).alias("run"),
        F.when(F.col("event_id") % 15 == 14, F.lit(200.0))
        .when((F.col("event_id") % 15) % 7 == 0, F.lit(100.0))
        .otherwise(F.lit(200.0))
        .alias("v_seasonal"),
        F.lit(200.0).alias("v_const"),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["v_seasonal", "v_const"], dataset="events", run_col="run"
    ).filter(F.col("metric") == "mean")
    return metrics_repo.detect_metric_anomalies(
        m,
        current_run=14,
        strategy="seasonal_normal",
        season=7,
        k=3.0,
        min_history=2,
    )


# Benford quantile thresholds: cumulative log10 digit boundaries, embedded
# as IDENTICAL shortest-round-trip double literals in the Spark plan and the
# DuckDB SQL so the planted CASE branches bit-agree in both engines.
_BENFORD_CUM = (
    0.3010299956639812,   # log10(2)
    0.47712125471966244,  # log10(3)
    0.6020599913279624,
    0.6989700043360189,
    0.7781512503836436,
    0.8450980400142568,
    0.9030899869919435,
    0.9542425094393249,   # log10(9)
)


@query(
    "benford_events",
    oracle="""
    WITH src AS (
      SELECT 'planted_benford' AS series,
             CASE
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.3010299956639812 AS DOUBLE) THEN 1
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.47712125471966244 AS DOUBLE) THEN 2
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.6020599913279624 AS DOUBLE) THEN 3
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.6989700043360189 AS DOUBLE) THEN 4
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.7781512503836436 AS DOUBLE) THEN 5
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.8450980400142568 AS DOUBLE) THEN 6
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.9030899869919435 AS DOUBLE) THEN 7
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.9542425094393249 AS DOUBLE) THEN 8
               ELSE 9
             END * pow(10, event_id % 3) AS v
      FROM events
      UNION ALL
      SELECT 'uniform', floor(value) + 1 FROM events WHERE value IS NOT NULL
    ),
    f AS (
      SELECT series, v FROM src
      WHERE v IS NOT NULL AND abs(v) >= 1 AND abs(v) < 9e18
    ),
    cnt AS (
      SELECT series,
             CAST(substr(CAST(CAST(floor(abs(v)) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2
    ),
    digits AS (
      SELECT series, CAST(unnest(range(1, 10)) AS INT) AS digit
      FROM (SELECT DISTINCT series FROM cnt)
    ),
    cells AS (
      SELECT d.series, d.digit, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n
      FROM digits d LEFT JOIN cnt USING (series, digit)
    ),
    calc AS (
      SELECT series, digit, n,
             CAST(sum(n) OVER (PARTITION BY series) AS DOUBLE) AS tot,
             log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit) AS ep
      FROM cells
    ),
    rep AS (
      SELECT series, digit, n,
             round(n / tot, 6) AS observed_p,
             round(ep, 6) AS expected_p,
             round(sum((n - tot * ep) * (n - tot * ep) / (tot * ep))
                   OVER (PARTITION BY series), 6) AS chi2
      FROM calc
    )
    SELECT series, digit, n, observed_p, expected_p, chi2,
           chi2 > CAST(15.507 AS DOUBLE) AS benford_violate
    FROM rep
    """,
)
def benford_events(spark, sf_dir) -> DataFrame:
    """Benford first-digit conformance (stats.benford_conformance) over two
    PLANTED series so both verdict arms demonstrably fire:
    'planted_benford' draws leading digits from the exact Benford
    quantile of event_id/10000 (uniform grid → per-digit counts within 1
    of expected → chi2 ≈ 0.02, conforming) scaled by a 1/10/100 decade
    mix, while 'uniform' takes floor(value)+1 (uniform 1..500 → digits
    1-4 overweighted → chi2 in the thousands, violating).  Digits come
    from exact BIGINT decimal rendering (never log10-of-double floors);
    the quantile thresholds are identical shortest-round-trip double
    literals in both engines, so every count, share, chi2, and verdict is
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("event_id") % 10000).cast("double") / F.lit(10000.0)
    d = F.lit(9)
    for digit in range(8, 0, -1):
        d = F.when(u < F.lit(_BENFORD_CUM[digit - 1]), digit).otherwise(d)
    benford_side = ev.select(
        F.lit("planted_benford").alias("series"),
        (d * F.pow(F.lit(10.0), (F.col("event_id") % 3).cast("double"))).alias(
            "v"
        ),
    )
    uniform_side = ev.filter(F.col("value").isNotNull()).select(
        F.lit("uniform").alias("series"),
        (F.floor("value") + 1).cast("double").alias("v"),
    )
    return stats.benford_conformance(
        benford_side.unionByName(uniform_side), "v", group_col="series"
    )


@query(
    "level_shift_events",
    oracle="""
    WITH cells AS (
      SELECT epoch_us(ts) - (epoch_us(ts) % 86400000000) AS bucket_us,
             round(avg(CASE WHEN epoch_us(ts) >= 1705795200000000
                            THEN value + CAST(150.0 AS DOUBLE)
                            ELSE value END), 6) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    scan AS (
      SELECT bucket_us,
             row_number() OVER (ORDER BY bucket_us) AS i,
             sum(m) OVER (ORDER BY bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(m) OVER () AS tot,
             count(*) OVER () AS n,
             stddev_samp(m) OVER () AS s,
             lead(bucket_us) OVER (ORDER BY bucket_us) AS nxt
      FROM cells
    ),
    st AS (
      SELECT bucket_us, nxt AS boundary_bucket_us,
             CAST(n AS BIGINT) AS n_buckets,
             round(cum / i, 6) AS mean_before,
             round((tot - cum) / (n - i), 6) AS mean_after,
             round((tot - cum) / (n - i) - cum / i, 6) AS shift,
             round(abs(cum / i - (tot - cum) / (n - i))
                   / (s * sqrt(CAST(1 AS DOUBLE) / i
                               + CAST(1 AS DOUBLE) / (n - i))), 6) AS stat
      FROM scan WHERE i >= 2 AND i <= n - 2
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY stat DESC, bucket_us ASC) AS rn
      FROM st
    )
    SELECT boundary_bucket_us, n_buckets, mean_before, mean_after, shift,
           stat, coalesce(stat > CAST(4.0 AS DOUBLE), false) AS shifted
    FROM rk WHERE rn = 1
    """,
)
def level_shift_events(spark, sf_dir) -> DataFrame:
    """Level-shift changepoint scan (drift.level_shift): daily means of
    events.value with a PLANTED +150 jump from epoch 1705795200
    (2024-01-21 UTC, integer epoch-µs comparison in both engines), so
    the scan demonstrably locates the boundary (stat ≈ 5+, shifted=true)
    instead of vacuously reporting quiet data.  The oracle replays the
    identical prefix-sum boundary scan over round(6) bucket means with
    the stat rounded BEFORE the argmax ranking (ties → earliest), so the
    located boundary, both segment means, and the verdict are all
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    planted = ev.filter(F.col("value").isNotNull()).select(
        "ts",
        F.when(
            us >= F.lit(1705795200000000), F.col("value") + F.lit(150.0)
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return drift.level_shift(planted, "ts", "v", 86400)


@query(
    "ks_drift_events_value",
    oracle="""
    WITH a AS (SELECT value AS v FROM events
               WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT value AS v FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT v, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT v, 0, 1 FROM b),
    per AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY v),
    c AS (SELECT v,
                 sum(na) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_a,
                 sum(nb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_b
          FROM per),
    t AS (SELECT (SELECT count(*) FROM a) AS ta,
                 (SELECT count(*) FROM b) AS tb),
    d AS (SELECT v, abs(cum_a * tb - cum_b * ta) AS diff FROM c, t),
    m AS (SELECT max(diff) AS md FROM d)
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           round(CAST(md AS DOUBLE) / CAST(ta * tb AS DOUBLE), 6) AS ks_d,
           (SELECT min(v) FROM d WHERE diff = md) AS ks_at
    FROM t, m
    """,
)
def ks_drift_events_value(spark, sf_dir) -> DataFrame:
    """Exact two-sample KS statistic between the click and purchase value
    distributions (drift.ks_drift): sup|F_a - F_b| maximized as the exact
    integer |cum_a*n_b - cum_b*n_a| and divided once — bit-identical to
    the DuckDB ordered replay, with NO corpus-wide sort on the Spark side
    (the roc_auc two-level bin/value prefix decomposition; the only
    single-partition exchange is the <=1024-row bin table)."""
    from ..operators.drift import ks_drift

    ev = load_table(spark, sf_dir, "events")
    return ks_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        lo=0.0,
        hi=500.0,
        bins=1 << 10,
    )


@query(
    "wasserstein_events_value",
    oracle="""
    WITH a AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
               FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT vm, 0, 1 FROM b),
    per AS (SELECT vm, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY vm),
    c AS (SELECT vm,
                 sum(na) OVER w AS cum_a,
                 sum(nb) OVER w AS cum_b,
                 lead(vm) OVER (ORDER BY vm) AS nxt
          FROM per
          WINDOW w AS (ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT (SELECT count(*) FROM a) AS ta,
                 (SELECT count(*) FROM b) AS tb),
    d AS (SELECT abs(CAST(cum_a AS HUGEINT) * tb
                     - CAST(cum_b AS HUGEINT) * ta) * (nxt - vm) AS term
          FROM c, t WHERE nxt IS NOT NULL)
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           round(CAST((SELECT sum(term) FROM d) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))
                 / 1000000.0, 6) AS w1
    FROM t
    """,
)
def wasserstein_events_value(spark, sf_dir) -> DataFrame:
    """Exact 1-Wasserstein distance between the click and purchase value
    distributions (drift.wasserstein_drift) — the drift number in the
    METRIC'S OWN UNITS ("the distribution moved N value-units"), where
    KS answers in probability mass and PSI in bits; a pure shift of δ
    reads exactly δ (pytest-pinned).  The area between the CDF
    staircases folds as exact integer Σ |cum_a·n_b − cum_b·n_a|·gap in
    decimal, divided once — bit-identical to the ordered replay, with
    the ks_drift bin/value prefix decomposition plus a bounded bin-table
    lead for the successor gap (no corpus sort).  Value-checked."""
    from ..operators.drift import wasserstein_drift

    ev = load_table(spark, sf_dir, "events")
    return wasserstein_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        lo=0.0,
        hi=500.0,
        bins=1 << 10,
    )


@query(
    "seasonal_residual_anomalies_events",
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
    q AS (SELECT event_type, b,
                 CAST(round(val * 1000000) AS BIGINT) AS vm FROM grid),
    w AS (
      SELECT event_type, b, vm,
             sum(vm) OVER win AS wsum, count(vm) OVER win AS wcnt,
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
    pt AS (SELECT event_type, pos, sum(dm) AS s, count(*) AS c
           FROM d WHERE dm IS NOT NULL GROUP BY 1, 2),
    tt AS (SELECT event_type, sum(s) AS st, sum(c) AS ct FROM pt GROUP BY 1),
    sa AS (SELECT pt.event_type, pt.pos,
                  CAST(round(CAST(pt.s AS DOUBLE) / CAST(pt.c AS DOUBLE)
                             - CAST(tt.st AS DOUBLE) / CAST(tt.ct AS DOUBLE))
                       AS BIGINT) AS sm
           FROM pt JOIN tt ON pt.event_type = tt.event_type),
    resid AS (
      SELECT d.event_type, d.b AS bucket_us,
             round((d.vm - d.tm - sa.sm) / 1000000.0, 6) AS r
      FROM d JOIN sa ON sa.event_type = d.event_type AND sa.pos = d.pos
      WHERE d.tm IS NOT NULL
    ),
    rv AS (SELECT event_type, bucket_us, r, round(r, 6) AS rr FROM resid),
    med AS (
      SELECT event_type, rr AS m FROM (
        SELECT event_type, rr,
               row_number() OVER (PARTITION BY event_type ORDER BY rr) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rv) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    dev AS (
      SELECT rv.event_type, rv.bucket_us, rv.r, rv.rr, med.m,
             round(abs(rv.rr - med.m), 6) AS dd
      FROM rv JOIN med ON med.event_type = rv.event_type
    ),
    mad AS (
      SELECT event_type, dd AS mad FROM (
        SELECT event_type, dd,
               row_number() OVER (PARTITION BY event_type ORDER BY dd) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    scored AS (
      SELECT dev.event_type, dev.bucket_us, dev.r AS residual,
             CASE WHEN mad.mad > 0
                  THEN round(0.6745 * (dev.rr - dev.m) / mad.mad, 6)
             END AS robust_z
      FROM dev JOIN mad ON mad.event_type = dev.event_type
    )
    SELECT * FROM scored WHERE abs(robust_z) > 2.5
    """,
)
def seasonal_residual_anomalies_events(spark, sf_dir) -> DataFrame:
    """The composition the seasonal machinery was built FOR: decompose
    the per-type daily series (temporal.seasonal_decompose, period 7),
    then robust-z the RESIDUALS (stats.robust_z_outliers at a 2.5 cut)
    — alerts that fire on genuinely anomalous days instead of
    re-discovering 'Mondays are low' every week, with the MAD scoring
    immune to the very anomalies it hunts.  Two oracled operators
    composed end-to-end; every flagged (type, day) with its residual
    and score value-checked against the stitched replay."""
    from ..operators.stats import robust_z_outliers
    from ..operators.temporal import seasonal_decompose

    ev = load_table(spark, sf_dir, "events")
    dec = seasonal_decompose(ev, ["event_type"], "ts", "value", 86400, 7)
    resid = dec.filter(F.col("residual").isNotNull()).select(
        "event_type", "bucket_us", F.col("residual").alias("r")
    )
    return robust_z_outliers(
        resid, "r", "event_type", ["bucket_us"], 2.5
    ).select(
        "event_type",
        "bucket_us",
        F.col("r").alias("residual"),
        "robust_z",
    )


@query(
    "wasserstein_grouped_events",
    oracle="""
    WITH a AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_id % 2 = 0 AND event_type IS NOT NULL
        AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type AS g,
             CAST(round((value + CASE WHEN event_type = 'error'
                                      THEN 5.0 ELSE 0.0 END)
                        * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_id % 2 = 1 AND event_type IS NOT NULL
        AND value IS NOT NULL
    ),
    u AS (SELECT g, vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT g, vm, 0, 1 FROM b),
    per AS (SELECT g, vm, sum(ca) AS na, sum(cb) AS nb
            FROM u GROUP BY g, vm),
    c AS (SELECT g, vm,
                 sum(na) OVER w AS cum_a, sum(nb) OVER w AS cum_b,
                 lead(vm) OVER (PARTITION BY g ORDER BY vm) AS nxt
          FROM per
          WINDOW w AS (PARTITION BY g ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT g,
                 CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb
          FROM per GROUP BY g),
    d AS (SELECT c.g,
                 abs(CAST(c.cum_a AS HUGEINT) * t.tb
                     - CAST(c.cum_b AS HUGEINT) * t.ta)
                 * (c.nxt - c.vm) AS term
          FROM c JOIN t ON t.g = c.g WHERE c.nxt IS NOT NULL),
    area AS (SELECT g, sum(term) AS ar FROM d GROUP BY g)
    SELECT t.g AS event_type, t.ta AS n_a, t.tb AS n_b,
           CASE WHEN t.ta > 0 AND t.tb > 0 THEN
             round(CAST(coalesce(area.ar, 0) AS DOUBLE)
                   / (CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE))
                   / 1000000.0, 6)
           END AS w1
    FROM t LEFT JOIN area ON area.g = t.g
    """,
)
def wasserstein_grouped_events(spark, sf_dir) -> DataFrame:
    """Per-type exact 1-Wasserstein drift between two event snapshots
    (drift.wasserstein_drift_grouped): even-id vs odd-id values with a
    PLANTED +5.0 shift on 'error' only — the per-key drift panel in the
    metric's own units: peers read 1.5–4 units (the even/odd sampling
    noise floor at n≈1000 per side) and error reads 8.6 — the noise
    floor PLUS the planted 5, exactly the separation a drift triage
    needs,
    with every stage keyed by the group (ZERO single-partition
    exchanges — pytest-pinned; single-support groups report explicit
    rows, found by test).  All 5 rows value-checked against the
    per-group ordered replay."""
    from ..operators.drift import wasserstein_drift_grouped

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("event_type", "value")
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_type",
        (
            F.col("value")
            + F.when(F.col("event_type") == "error", F.lit(5.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("value"),
    )
    return wasserstein_drift_grouped(
        a, b, "value", "event_type", 0.0, 510.0, bins=1 << 10
    )


@query(
    "mix_conformance_events",
    oracle="""
    WITH counts AS (
      SELECT CAST(event_type AS VARCHAR) AS category,
             CAST(count(*) AS BIGINT) AS observed
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    decl AS (
      SELECT category, CAST(expected_share AS DOUBLE) AS expected_share
      FROM (VALUES
        ('click', 0.25), ('error', 0.1), ('purchase', 0.2),
        ('signup', 0.2), ('view', 0.2), ('refund', 0.05))
        AS t(category, expected_share)
    ),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM counts),
    j AS (
      SELECT coalesce(d.category, c.category) AS category,
             coalesce(c.observed, 0) AS observed,
             d.expected_share
      FROM decl d FULL OUTER JOIN counts c ON c.category = d.category
    )
    SELECT j.category, j.observed, j.expected_share,
           CASE WHEN j.expected_share IS NOT NULL
                THEN round(j.expected_share * CAST(tot.n AS DOUBLE), 6)
           END AS expected_n,
           CASE WHEN j.expected_share IS NOT NULL THEN
             round((CAST(j.observed AS DOUBLE)
                    - j.expected_share * CAST(tot.n AS DOUBLE))
                   * (CAST(j.observed AS DOUBLE)
                      - j.expected_share * CAST(tot.n AS DOUBLE))
                   / (j.expected_share * CAST(tot.n AS DOUBLE)), 6)
           END AS chi2_term,
           j.expected_share IS NULL AS undeclared
    FROM j, tot
    """,
)
def mix_conformance_events(spark, sf_dir) -> DataFrame:
    """Declared-mix conformance (stats.mix_conformance): the event
    stream checked against a CONTRACT mix that deliberately disagrees
    with reality — it declares error at 10% (actual ~20%) and a
    'refund' type that doesn't exist — so the report must show error's
    chi² term dominating AND the declared-but-absent refund carrying
    its full expected mass (declared-but-absent and observed-but-
    undeclared are the two loudest contract violations, never silently
    pooled).  All 6 rows value-checked."""
    from ..operators.stats import mix_conformance

    ev = load_table(spark, sf_dir, "events")
    return mix_conformance(
        ev,
        "event_type",
        {
            "click": 0.25,
            "error": 0.10,
            "purchase": 0.20,
            "signup": 0.20,
            "view": 0.20,
            "refund": 0.05,
        },
    )


@query(
    "detected_period_events",
    oracle="""
    WITH src AS (
      SELECT event_type, ts,
             value + CASE WHEN event_type = 'click'
                          AND (epoch_us(ts) // 86400000000) % 7 = 2
                          THEN 20.0
                     ELSE 0.0 END AS v
      FROM events
    ),
    cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(v), 6) * 1000000) AS BIGINT) AS vm
      FROM src
      WHERE ts IS NOT NULL AND v IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest(range(2, 11)) AS lag),
    p AS (
      SELECT x.event_type, l.lag, x.vm AS xv, y.vm AS yv
      FROM cells x CROSS JOIN l
      JOIN cells y ON y.event_type IS NOT DISTINCT FROM x.event_type
                  AND y.b = x.b + l.lag * 86400000000
    ),
    m AS (
      SELECT event_type, lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(xv AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(yv AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(xv AS HUGEINT) * xv) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yv AS HUGEINT) * yv) AS DOUBLE) AS syy,
             CAST(sum(CAST(xv AS HUGEINT) * yv) AS DOUBLE) AS sxy
      FROM p GROUP BY 1, 2
    ),
    acf AS (
      SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
             CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                       AND n_pairs * syy - sy * sy > 0
                  THEN round((n_pairs * sxy - sx * sy)
                       / (sqrt(n_pairs * sxx - sx * sx)
                          * sqrt(n_pairs * syy - sy * sy)), 6)
             END AS acf
      FROM m
    ),
    best AS (
      SELECT * FROM acf
      QUALIFY row_number() OVER (PARTITION BY event_type
        ORDER BY acf DESC NULLS LAST, lag ASC) = 1
    )
    SELECT event_type,
           CASE WHEN acf IS NOT NULL AND acf > 0 THEN lag END AS period,
           CASE WHEN acf IS NOT NULL AND acf > 0 THEN acf END
             AS period_acf,
           n_pairs
    FROM best
    """,
)
def detected_period_events(spark, sf_dir) -> DataFrame:
    """Detected period per event type (temporal.detected_period_report,
    lags 2–10) with a PLANTED weekly cycle on 'click' (+20 on every
    epoch-day ≡ 2 mod 7 — pure integer arithmetic, because Spark and
    DuckDB NUMBER dayofweek differently (1–7 Sunday-first vs 0–6) and
    a calendar plant would diverge, found by parity) — 'ACF finds the
    period' made literal: click reports period 7 at ACF 0.71 while
    peers report only noise lags.  max_lag capped below the first
    harmonic: on a 30-day window the lag-14 harmonic has HIGHER noisy
    ACF than the fundamental (17 vs 23 pairs — found by running it),
    the known ACF-period caveat, documented rather than hidden.  All 5
    rows value-checked."""
    from ..operators.temporal import detected_period_report

    raw = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(raw, "ts")
    epoch_day = F.floor(us / F.lit(86400000000.0)).cast("long")
    ev = raw.select(
        "event_type",
        "ts",
        (
            F.col("value")
            + F.when(
                (F.col("event_type") == "click")
                & (F.pmod(epoch_day, F.lit(7)) == 2),
                F.lit(20.0),
            ).otherwise(F.lit(0.0))
        ).alias("v"),
    )
    return detected_period_report(
        ev, ["event_type"], "ts", "v", 86400, max_lag=10
    )
