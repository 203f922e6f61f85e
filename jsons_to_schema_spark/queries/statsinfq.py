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
    "outliers_events_value",
    oracle="""
    WITH m AS (
      SELECT quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT (SELECT med FROM m) AS med,
             quantile_cont(abs(value - (SELECT med FROM m)), 0.5) AS mad
      FROM events WHERE value IS NOT NULL
    )
    SELECT e.event_id, e.value AS value,
           round(0.6745 * (e.value - s.med) / s.mad, 6) AS score
    FROM events e, s
    WHERE e.value IS NOT NULL AND s.mad > 0
      AND abs(0.6745 * (e.value - s.med) / s.mad) > 5.0
    """,
)
def outliers_events_value(spark, sf_dir) -> DataFrame:
    """Robust outlier rows (stats.outlier_report, MAD method): events
    whose value has a modified z-score beyond 5.0 — the row-level
    anomaly check beside the split-level split_anomalies.  Median and
    MAD are exact (percentile ≡ quantile_cont interpolation) so the
    fences are engine-identical; the cutoff compares the unrounded score
    in both engines and the reported score is round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.outlier_report(ev, "value", ["event_id"], method="mad", cutoff=5.0)


@query(
    "outliers_grouped_events_value",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 499 = 0 THEN value * 50 + 5000
                  ELSE value END AS x
      FROM events
    ), med AS (
      SELECT event_type, quantile_cont(x, 0.5) AS center
      FROM src GROUP BY 1
    ), mad AS (
      SELECT s.event_type, max(m.center) AS center,
             quantile_cont(abs(s.x - m.center), 0.5) AS spread
      FROM src s JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT s.event_type, s.event_id, s.x AS value,
           round(0.6745 * (s.x - center) / spread, 6) AS score
    FROM src s JOIN mad USING (event_type)
    WHERE spread > 0 AND abs(0.6745 * (s.x - center) / spread) > 3.5
    """,
)
def outliers_grouped_events_value(spark, sf_dir) -> DataFrame:
    """Per-group robust outliers (stats.outlier_report_grouped): MAD
    fences computed INSIDE each event_type — spikes planted on
    event_id % 499 (50× + 5000) must flag against their own segment's
    scale; the oracle recomputes group medians and MADs with
    quantile_cont (the percentile ≡ quantile_cont interpolation parity
    the global outlier_report established) and the identical unrounded
    cutoff expression."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 499 == 0, F.col("value") * 50 + 5000
        )
        .otherwise(F.col("value"))
        .alias("x"),
    )
    return stats.outlier_report_grouped(
        ev, "x", ["event_id"], ["event_type"], method="mad", cutoff=3.5
    )


def _ab_oracle_block(metric_sql: str, label: str) -> str:
    """One comparison of the ab_test oracle: integer-quantized moment sums
    (HUGEINT — exact, matching Spark's decimal(38,0)) then the Welch
    arithmetic in EXACTLY the operator's expression order."""
    vm = f"CAST(round(({metric_sql}) * 1e6) AS BIGINT)"
    keep_c = f"event_id % 2 = 0 AND ({metric_sql}) IS NOT NULL"
    keep_t = f"event_id % 2 = 1 AND ({metric_sql}) IS NOT NULL"
    return f"""
    SELECT '{label}' AS comparison, n_control, n_treatment,
           round(mc, 6) AS mean_control, round(mt, 6) AS mean_treatment,
           round(mt - mc, 6) AS abs_lift,
           CASE WHEN mc = 0e0 THEN NULL
                ELSE round((mt - mc) / mc, 6) END AS rel_lift,
           round((mt - mc) / sqrt(sec + sett), 6) AS t_stat,
           round((sec + sett) * (sec + sett)
                 / (sec * sec / (nc - 1e0) + sett * sett / (nt - 1e0)),
                 6) AS dof,
           abs((mt - mc) / sqrt(sec + sett)) > CAST(1.959964 AS DOUBLE)
             AS significant
    FROM (
      SELECT n_control, n_treatment, nc, nt, mc, mt, vc / nc AS sec,
             vt / nt AS sett
      FROM (
        SELECT n_control, n_treatment,
               CAST(n_control AS DOUBLE) AS nc, CAST(n_treatment AS DOUBLE) AS nt,
               CAST(s1c AS DOUBLE) / CAST(n_control AS DOUBLE) / 1e6 AS mc,
               CAST(s1t AS DOUBLE) / CAST(n_treatment AS DOUBLE) / 1e6 AS mt,
               (CAST(s2c AS DOUBLE) / 1e12
                - (CAST(s1c AS DOUBLE) / 1e6) * (CAST(s1c AS DOUBLE) / 1e6)
                  / CAST(n_control AS DOUBLE))
               / (CAST(n_control AS DOUBLE) - 1e0) AS vc,
               (CAST(s2t AS DOUBLE) / 1e12
                - (CAST(s1t AS DOUBLE) / 1e6) * (CAST(s1t AS DOUBLE) / 1e6)
                  / CAST(n_treatment AS DOUBLE))
               / (CAST(n_treatment AS DOUBLE) - 1e0) AS vt
        FROM (
          SELECT CAST(sum(CASE WHEN {keep_c} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_control,
                 CAST(sum(CASE WHEN {keep_t} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treatment,
                 coalesce(sum(CASE WHEN {keep_c}
                   THEN CAST({vm} AS HUGEINT) END), 0) AS s1c,
                 coalesce(sum(CASE WHEN {keep_t}
                   THEN CAST({vm} AS HUGEINT) END), 0) AS s1t,
                 coalesce(sum(CASE WHEN {keep_c}
                   THEN CAST({vm} AS HUGEINT) * {vm} END), 0) AS s2c,
                 coalesce(sum(CASE WHEN {keep_t}
                   THEN CAST({vm} AS HUGEINT) * {vm} END), 0) AS s2t
          FROM events
        )
      )
    )
    """


@query(
    "ab_test_events",
    oracle=(
        _ab_oracle_block("value + CASE WHEN event_id % 2 = 1 THEN 5e-1 ELSE 0e0 END",
                         "planted_lift")
        + " UNION ALL "
        + _ab_oracle_block("value", "no_effect")
    ),
)
def ab_test_events(spark, sf_dir) -> DataFrame:
    """A/B experiment readout (stats.ab_test_report, Welch two-sample):
    arms = event_id parity over events.value, run twice — once with a
    planted +0.5 treatment lift (t ≈ 2.2 → significant) and once on the
    raw metric (the natural parity diff lands at t ≈ 1.7 → NOT
    significant at the 1.959964 two-sided gate) — both verdict arms fire
    and every statistic is value-checked.  Determinism: the metric is
    quantized to integer micro-units at the scan, so both moment sums are
    EXACT decimal aggregates (no partition-order noise) and the Welch
    t / Welch–Satterthwaite dof derive from identical doubles in both
    engines (the oracle replays the operator's expression order, HUGEINT
    for Spark's decimal(38,0)).  One conditional-aggregate corpus scan
    per comparison."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    arm = F.when(F.col("event_id") % 2 == 0, F.lit("control")).otherwise(
        F.lit("treatment")
    )
    planted = ev.select(
        arm.alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 1, F.lit(0.5)).otherwise(F.lit(0.0))
        ).alias("m"),
    )
    plain = ev.select(arm.alias("arm"), F.col("value").alias("m"))
    r1 = stats.ab_test_report(planted, "arm", "m", "control", "treatment")
    r2 = stats.ab_test_report(plain, "arm", "m", "control", "treatment")
    return r1.select(F.lit("planted_lift").alias("comparison"), "*").unionByName(
        r2.select(F.lit("no_effect").alias("comparison"), "*")
    )


@query(
    "frequency_encoding_events",
    oracle="""
    SELECT event_type AS value, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST((SELECT count(*) FROM events) AS DOUBLE), 6)
             AS freq
    FROM events GROUP BY 1
    """,
)
def frequency_encoding_events(spark, sf_dir) -> DataFrame:
    """Frequency encoding fit table (stats.fit_frequency_encoding): one
    grouped scan over event_type; NULL would be a real category.  All
    category rows value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return stats.fit_frequency_encoding(ev, "event_type")


@query(
    "target_encoding_events",
    oracle="""
    WITH train AS (SELECT event_type, value FROM events
                   WHERE event_id % 2 = 0 AND value IS NOT NULL),
    per AS (SELECT event_type AS v,
                   sum(CAST(CAST(round(value * 1e6) AS BIGINT) AS HUGEINT))
                     AS s1,
                   count(*) AS n
            FROM train GROUP BY 1),
    pri AS (SELECT CAST(sum(s1) AS DOUBLE) / CAST(sum(n) AS DOUBLE) / 1e6
                     AS prior
            FROM per),
    fit AS (SELECT v, round((CAST(s1 AS DOUBLE) / 1e6 + 1e1 * prior)
                            / (CAST(n AS DOUBLE) + 1e1), 6) AS enc
            FROM per, pri),
    serve AS (SELECT event_id,
                     CASE WHEN event_id % 997 = 1 THEN 'unseen_cat'
                          ELSE event_type END AS cat
              FROM events WHERE event_id % 2 = 1)
    SELECT s.event_id, s.cat,
           coalesce(fit.enc, round(pri.prior, 6)) AS value_encoded
    FROM serve s LEFT JOIN fit ON s.cat IS NOT DISTINCT FROM fit.v, pri
    """,
)
def target_encoding_events(spark, sf_dir) -> DataFrame:
    """Smoothed target encoding, fit/transform split (stats.
    fit_target_encoding m=10 + apply_encoding + target_prior): fit on the
    even event_id half (category=event_type, target=value), apply to the
    odd half where every 997th id carries a planted 'unseen_cat' — the
    unseen arm falls back to the fitted prior (loudly passed as default,
    never silent zero).  Exact decimal moment sums make prior and every
    encoding bit-identical across engines; the fit table broadcasts,
    applied null-safe.  All 5,000 serve rows value-checked, both arms
    populated."""
    ev = load_table(spark, sf_dir, "events")
    train = ev.filter(F.col("event_id") % 2 == 0)
    fit = stats.fit_target_encoding(train, "event_type", "value", smoothing=10.0)
    prior = stats.target_prior(train, "value")
    serve = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.when(F.col("event_id") % 997 == 1, F.lit("unseen_cat"))
        .otherwise(F.col("event_type"))
        .alias("cat"),
    )
    return stats.apply_encoding(
        serve, "cat", fit, "value_encoded", default=prior
    )


@query(
    "winsorize_events",
    oracle="""
    WITH ed AS (SELECT round(quantile_cont(CAST(value AS DOUBLE),
                              CAST(0.05 AS DOUBLE)), 6) AS lo,
                       round(quantile_cont(CAST(value AS DOUBLE),
                              CAST(0.95 AS DOUBLE)), 6) AS hi
                FROM events)
    SELECT event_id, value,
           CASE WHEN value IS NULL THEN NULL
                ELSE least(greatest(CAST(value AS DOUBLE), lo), hi)
           END AS value_winsorized,
           CASE WHEN value IS NULL THEN NULL
                ELSE CAST(value AS DOUBLE) < lo OR CAST(value AS DOUBLE) > hi
           END AS clipped
    FROM events, ed
    """,
)
def winsorize_events(spark, sf_dir) -> DataFrame:
    """Percentile clipping (stats.winsorize at [p05, p95]): round-6
    persistable edges fitted in one percentile aggregate (the
    fit_quantile_bins contract), then a pure least/greatest projection —
    ~10% of rows clip by construction, so both ``clipped`` arms fire.
    The oracle fits quantile_cont (the percentile-equivalent
    interpolation) and replays the clip — all 10,000 rows value-checked."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return stats.winsorize(ev, "value", lower_q=0.05, upper_q=0.95)


@query(
    "roc_auc_events",
    oracle="""
    WITH base AS (SELECT value AS s, (event_type = 'purchase') AS y
                  FROM events
                  WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT s,
                   count(*) FILTER (WHERE y) AS np,
                   count(*) FILTER (WHERE NOT y) AS nn
            FROM base GROUP BY s),
    r AS (SELECT np, nn,
                 coalesce(sum(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nb
          FROM per)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST((SELECT count(*) FROM events
                 WHERE value IS NULL OR event_type IS NULL) AS BIGINT)
             AS n_null,
           round(sum(np * (2 * nb + nn))
                 / (2.0 * sum(np) * sum(nn)), 6) AS auc,
           round(2.0 * round(sum(np * (2 * nb + nn))
                 / (2.0 * sum(np) * sum(nn)), 6) - 1.0, 6) AS gini
    FROM r
    """,
)
def roc_auc_events(spark, sf_dir) -> DataFrame:
    """Exact tie-aware ROC AUC of `value` as a purchase-propensity score
    (modeleval.roc_auc).  The oracle is the textbook ranked replay over
    DISTINCT scores in DuckDB; the Spark side computes the identical
    integer rank statistic with NO corpus-wide global sort — the
    two-level bin/score prefix decomposition keeps the only ordered
    single-partition window on a bounded 1024-row bin table."""
    from ..operators.modeleval import roc_auc

    ev = load_table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").alias("y")
    )
    return roc_auc(ev, "value", "y", lo=0.0, hi=500.0, bins=1 << 10)


@query(
    "calibration_events",
    oracle="""
    WITH base AS (
      SELECT least(greatest(CAST(floor((value / 500.0) / 0.1) AS BIGINT),
                            0), 9) AS bin,
             CAST(round(value / 500.0 * 1000000) AS BIGINT) AS sq,
             (event_type = 'purchase') AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT bin, count(*) AS n,
                   CAST(sum(sq) AS BIGINT) AS ssum,
                   count(*) FILTER (WHERE y) AS n_pos
            FROM base GROUP BY bin),
    tot AS (SELECT sum(n) AS t FROM per)
    SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           round(ssum / 1000000.0 / n, 6) AS mean_pred,
           round(n_pos / CAST(n AS DOUBLE), 6) AS frac_pos,
           round(abs(round(ssum / 1000000.0 / n, 6)
                     - round(n_pos / CAST(n AS DOUBLE), 6)), 6) AS abs_gap,
           round((n / CAST(t AS DOUBLE))
                 * round(abs(round(ssum / 1000000.0 / n, 6)
                         - round(n_pos / CAST(n AS DOUBLE), 6)), 6), 6)
             AS ece_contrib
    FROM per, tot
    """,
)
def calibration_events(spark, sf_dir) -> DataFrame:
    """Reliability table of the normalized `value` score against the
    purchase label (modeleval.calibration_table): per-decile n, mean
    predicted score (micro-unit integer quantized so the mean is
    bit-identical across engines and partitionings), observed positive
    rate, |gap|, and ECE contribution.  One grouped aggregate; the
    grand total rides a broadcast single-row join."""
    from ..operators.modeleval import calibration_table

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("value") / F.lit(500.0)).alias("score"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return calibration_table(ev, "score", "y", lo=0.0, hi=1.0, bins=10)


@query(
    "gains_lift_events",
    oracle="""
    WITH base AS (
      SELECT least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9)
               AS band,
             (event_type = 'purchase') AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT band, count(*) AS n,
                   count(*) FILTER (WHERE y) AS n_pos
            FROM base GROUP BY band),
    tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM per),
    cum AS (SELECT band, n, n_pos,
                   sum(n) OVER (ORDER BY band DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_n,
                   sum(n_pos) OVER (ORDER BY band DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_pos
            FROM per)
    SELECT band, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CASE WHEN tp > 0
                THEN round(cum_pos / CAST(tp AS DOUBLE), 6) END
             AS capture_rate,
           CASE WHEN tp > 0 AND cum_n > 0
                THEN round((cum_pos / CAST(cum_n AS DOUBLE))
                           / (tp / CAST(tn AS DOUBLE)), 6) END
             AS cum_lift
    FROM cum, tot
    """,
)
def gains_lift_events(spark, sf_dir) -> DataFrame:
    """Gains/lift by descending score band (modeleval.gains_table):
    cumulative rows and positives from the top band down, positive
    capture rate, and cumulative lift vs the base rate.  The ordered
    cumulative runs over the bounded 10-row band aggregate — never the
    corpus — and every ratio divides exact integers."""
    from ..operators.modeleval import gains_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return gains_table(ev, "score", "y", lo=0.0, hi=500.0, bands=10)


@query(
    "mahalanobis_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             l_quantity, l_extendedprice, l_discount,
             CAST(round(l_quantity * 1000000.0) AS BIGINT) AS q0,
             CAST(round(l_extendedprice * 1000000.0) AS BIGINT) AS q1,
             CAST(round(l_discount * 1000000.0) AS BIGINT) AS q2
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(q0 AS HUGEINT)) AS DOUBLE) AS s0,
             CAST(sum(CAST(q1 AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(q2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(sum(CAST(q0 AS HUGEINT) * q0) AS DOUBLE) AS s00,
             CAST(sum(CAST(q0 AS HUGEINT) * q1) AS DOUBLE) AS s01,
             CAST(sum(CAST(q0 AS HUGEINT) * q2) AS DOUBLE) AS s02,
             CAST(sum(CAST(q1 AS HUGEINT) * q1) AS DOUBLE) AS s11,
             CAST(sum(CAST(q1 AS HUGEINT) * q2) AS DOUBLE) AS s12,
             CAST(sum(CAST(q2 AS HUGEINT) * q2) AS DOUBLE) AS s22
      FROM src
    ),
    c AS (
      SELECT n, s0, s1, s2,
             (n * s00 - s0 * s0) / (n * (n - 1.0)) / 1e12 AS c11,
             (n * s01 - s0 * s1) / (n * (n - 1.0)) / 1e12 AS c12,
             (n * s02 - s0 * s2) / (n * (n - 1.0)) / 1e12 AS c13,
             (n * s11 - s1 * s1) / (n * (n - 1.0)) / 1e12 AS c22,
             (n * s12 - s1 * s2) / (n * (n - 1.0)) / 1e12 AS c23,
             (n * s22 - s2 * s2) / (n * (n - 1.0)) / 1e12 AS c33
      FROM m
    ),
    a AS (
      SELECT *,
             c11 * (c22 * c33 - c23 * c23)
               - c12 * (c12 * c33 - c13 * c23)
               + c13 * (c12 * c23 - c13 * c22) AS det,
             c22 * c33 - c23 * c23 AS a11,
             c11 * c33 - c13 * c13 AS a22,
             c11 * c22 - c12 * c12 AS a33,
             -(c12 * c33 - c13 * c23) AS a12,
             c12 * c23 - c13 * c22 AS a13,
             -(c11 * c23 - c12 * c13) AS a23
      FROM c
    ),
    scored AS (
      SELECT s.l_orderkey, s.l_linenumber,
             s.l_quantity, s.l_extendedprice, s.l_discount,
             round((a.a11 * z0 * z0 + a.a22 * z1 * z1 + a.a33 * z2 * z2
                    + 2.0 * (a.a12 * z0 * z1 + a.a13 * z0 * z2
                             + a.a23 * z1 * z2)) / a.det, 6) AS dist2
      FROM (
        SELECT src.*,
               src.q0 / 1000000.0 - a.s0 / a.n / 1000000.0 AS z0,
               src.q1 / 1000000.0 - a.s1 / a.n / 1000000.0 AS z1,
               src.q2 / 1000000.0 - a.s2 / a.n / 1000000.0 AS z2
        FROM src CROSS JOIN a
      ) s CROSS JOIN a
    )
    SELECT * FROM scored WHERE dist2 > 8.0
    """,
)
def mahalanobis_lineitem(spark, sf_dir) -> DataFrame:
    """Joint-distribution outliers over (l_quantity, l_extendedprice,
    l_discount) above dist² 8.0 — the empirical
    99.9th percentile on this data; uniform TPC-H marginals have bounded
    support, so the chi² tail never fires (stats.mahalanobis_outliers) — rows whose COMBINATION is
    off-manifold even when every per-column z-band passes (the case
    outlier_report structurally misses).  Closed-form adjugate inverse
    keeps the whole statistic one declarative expression; micro-unit
    quantization makes the moment sums exact decimals, so the round-6
    distance and the flagged row SET are bit-reproducible across engines
    (one moment scan + one scoring projection, no corpus shuffle).
    Every flagged row's distance value-checked."""
    from ..operators.stats import mahalanobis_outliers

    li = load_table(spark, sf_dir, "lineitem")
    return mahalanobis_outliers(
        li,
        ["l_quantity", "l_extendedprice", "l_discount"],
        8.0,
        ["l_orderkey", "l_linenumber"],
    )


@query(
    "woe_iv_events",
    oracle="""
    WITH base AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             (event_type = 'error') AS bad
      FROM events
      WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
        AND event_type IS NOT NULL
    ),
    counts AS (
      SELECT bucket,
             CAST(sum(CASE WHEN NOT bad THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      FROM base GROUP BY 1
    ),
    spine AS (SELECT unnest(range(10)) AS bucket),
    binned AS (
      SELECT s.bucket,
             coalesce(c.n_good, 0) AS n_good,
             coalesce(c.n_bad, 0) AS n_bad
      FROM spine s LEFT JOIN counts c USING (bucket)
    ),
    t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
                 CAST(sum(n_bad) AS BIGINT) AS tb
          FROM binned)
    SELECT b.bucket,
           0.0 + b.bucket * 50.0 AS bucket_lo,
           0.0 + (b.bucket + 1) * 50.0 AS bucket_hi,
           b.n_good, b.n_bad,
           CASE WHEN b.n_good > 0 AND b.n_bad > 0 AND t.tg > 0 AND t.tb > 0
                THEN round(ln((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE))
                             / (CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))), 6)
           END AS woe,
           CASE WHEN b.n_good > 0 AND b.n_bad > 0 AND t.tg > 0 AND t.tb > 0
                THEN round((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE)
                            - CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))
                           * ln((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE))
                               / (CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))), 6)
           END AS iv_term
    FROM binned b CROSS JOIN t
    """,
)
def woe_iv_events(spark, sf_dir) -> DataFrame:
    """Weight-of-evidence / information-value profile of events.value
    against the error label (stats.woe_iv_profile, 10 equi-width bins
    over [0, 500]) — the pre-model predictive-power screen: per-bin WoE
    says which way a value band separates error from non-error traffic,
    the IV terms sum to the feature's ranking score.  Identical
    floor-binning to column_histogram, exact long counts, WoE/IV derived
    in identical expression order (NULL for one-sided bins — no invented
    smoothing observations); every bucket row value-checked including
    the empty-bucket spine rows."""
    from ..operators.stats import woe_iv_profile

    ev = load_table(spark, sf_dir, "events")
    return woe_iv_profile(
        ev, "value", F.col("event_type") == "error", 0.0, 500.0, 10
    )


@query(
    "robust_z_events",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 997 = 0 THEN value * 50.0
                  ELSE value END AS v
      FROM events
    ),
    base AS (
      SELECT event_id, event_type, v, round(v, 6) AS rv FROM src
      WHERE v IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS (
      SELECT event_type, rv AS m FROM (
        SELECT event_type, rv,
               row_number() OVER (PARTITION BY event_type ORDER BY rv) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    dev AS (
      SELECT b.event_id, b.event_type, b.v, b.rv, med.m,
             round(abs(b.rv - med.m), 6) AS d
      FROM base b JOIN med ON med.event_type = b.event_type
    ),
    mad AS (
      SELECT event_type, d AS mad FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    scored AS (
      SELECT dev.event_id, dev.event_type, dev.v,
             CASE WHEN mad.mad > 0
                  THEN round(0.6745 * (dev.rv - dev.m) / mad.mad, 6)
             END AS robust_z
      FROM dev JOIN mad ON mad.event_type = dev.event_type
    )
    SELECT * FROM scored WHERE abs(robust_z) > 3.5
    """,
)
def robust_z_events(spark, sf_dir) -> DataFrame:
    """MAD robust z-score outliers per event type at the canonical
    Iglewicz–Hoaglin 3.5 cut (stats.robust_z_outliers) over a PLANTED
    contamination (every 997th event's value ×50, identical in both
    engines) — the detector that defeats MASKING: the classical
    mean/std score lets wild values inflate the std enough to hide
    themselves (pytest-demonstrated); median and MAD barely move.
    Both statistics are exact type-1 rank picks on round-6 values;
    every flagged row's score value-checked."""
    from ..operators.stats import robust_z_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 997 == 0, F.col("value") * 50.0)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return robust_z_outliers(ev, "v", "event_type", ["event_id"], 3.5)


@query("isotonic_calibration_events")  # pinned-snapshot oracle
def isotonic_calibration_events(spark, sf_dir) -> DataFrame:
    """Isotonic calibration of P(error | value) by pool-adjacent-
    violators (modeleval.fit_isotonic): the best monotone map from the
    value score to the error probability — no bin grid to choose, the
    standard post-hoc calibrator where calibration_table only
    diagnoses.  One corpus pass folds exact (n, Σlabel) per round-6
    distinct score; PAV runs driver-side on the bounded distinct-score
    table with CROSS-MULTIPLIED integer mean comparisons, so the block
    table is exact and deterministic (double-run-guarded pin); block
    monotonicity and brute-PAV parity live in
    tests/test_round4ae_ops.py."""
    from ..operators.modeleval import fit_isotonic

    ev = load_table(spark, sf_dir, "events")
    return fit_isotonic(
        ev.select(
            F.col("value").alias("score"),
            (F.col("event_type") == "error").alias("label"),
        ),
        "score",
        "label",
    )


@query(
    "bootstrap_mean_events",
    oracle="""
    WITH base AS (
      SELECT event_id AS id,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    reps AS (SELECT unnest(range(16)) AS r),
    drawn AS (
      SELECT r,
             (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'boot-42',
                    CAST(r AS VARCHAR), CAST(id AS VARCHAR))), 1, 8)
                   AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u,
             vm
      FROM base CROSS JOIN reps
    ),
    weighted AS (
      SELECT r,
             CASE WHEN u < 0.367879441 THEN 0
                  WHEN u < 0.735758882 THEN 1
                  WHEN u < 0.919698603 THEN 2
                  WHEN u < 0.980988305 THEN 3
                  WHEN u < 0.996323929 THEN 4
                  WHEN u < 0.999405870 THEN 5
                  WHEN u < 0.999917320 THEN 6
                  WHEN u < 0.999990409 THEN 7
                  ELSE 8 END AS w,
             vm
      FROM drawn
    ),
    rm AS (
      SELECT r,
             round(CAST(sum(CAST(w AS HUGEINT) * vm) AS DOUBLE)
                   / CAST(sum(w) AS DOUBLE) / 1000000.0, 6) AS m
      FROM weighted GROUP BY r HAVING sum(w) > 0
    ),
    nr AS (SELECT CAST(count(*) AS BIGINT) AS c FROM rm),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM rm),
    o AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mean
      FROM base
    )
    SELECT o.n, o.mean,
           (SELECT m FROM ranked, nr
            WHERE rn = greatest(CAST(ceil(0.025 * CAST(nr.c AS DOUBLE)
                                          - 1e-9) AS BIGINT), 1)) AS ci_lo,
           (SELECT m FROM ranked, nr
            WHERE rn = greatest(CAST(ceil(0.975 * CAST(nr.c AS DOUBLE)
                                          - 1e-9) AS BIGINT), 1)) AS ci_hi,
           CAST(16 AS BIGINT) AS replicates,
           CAST(0.05 AS DOUBLE) AS alpha
    FROM o
    """,
)
def bootstrap_mean_events(spark, sf_dir) -> DataFrame:
    """Percentile-bootstrap CI for the mean event value via the seeded
    Poisson bootstrap (stats.bootstrap_mean_ci, 16 replicates) — the
    error bar every profiling number lacks, computed in ONE pass: each
    replicate reweights rows by a Poisson(1) draw derived from the
    md5-prefix uniform through a fixed 9-decimal inverse-CDF table, so
    every replicate is exact, partition-order-free, and bit-replayable.
    CI bounds are type-1 rank picks over the replicate means.  The
    single output row value-checked field by field."""
    from ..operators.stats import bootstrap_mean_ci

    ev = load_table(spark, sf_dir, "events")
    return bootstrap_mean_ci(ev, "value", "event_id", replicates=16, seed=42)


@query(
    "cuped_events",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
             value + CASE WHEN event_id % 2 = 0 THEN 0.0 ELSE 0.5 END AS y,
             value * 0.8 + (event_id % 100) * 0.1 AS x
      FROM events
    ),
    q AS (
      SELECT arm,
             CAST(round(y * 1000000.0) AS BIGINT) AS ym,
             CAST(round(x * 1000000.0) AS BIGINT) AS xm
      FROM src WHERE y IS NOT NULL AND x IS NOT NULL
    ),
    m AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) END), 0) AS DOUBLE) AS sxc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) END), 0) AS DOUBLE) AS sxt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(ym AS HUGEINT) END), 0) AS DOUBLE) AS syc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(ym AS HUGEINT) END), 0) AS DOUBLE) AS syt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) * xm END), 0) AS DOUBLE) AS sxxc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) * xm END), 0) AS DOUBLE) AS sxxt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(ym AS HUGEINT) * ym END), 0) AS DOUBLE) AS syyc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(ym AS HUGEINT) * ym END), 0) AS DOUBLE) AS syyt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) * ym END), 0) AS DOUBLE) AS sxyc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) * ym END), 0) AS DOUBLE) AS sxyt
      FROM q
    ),
    c AS (
      SELECT m.*,
             CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE) AS n,
             sxc + sxt AS sx, syc + syt AS sy,
             sxxc + sxxt AS sxx, sxyc + sxyt AS sxy
      FROM m
    ),
    th AS (
      SELECT c.*,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
      FROM c
    ),
    arms AS (
      SELECT th.*,
             syc / CAST(nc AS DOUBLE) / 1000000.0
               - theta * (sxc / CAST(nc AS DOUBLE) / 1000000.0
                          - sx / n / 1000000.0) AS mac,
             syt / CAST(nt AS DOUBLE) / 1000000.0
               - theta * (sxt / CAST(nt AS DOUBLE) / 1000000.0
                          - sx / n / 1000000.0) AS mat,
             (syyc / 1e12 - (syc / 1000000.0) * (syc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS vyc,
             (syyt / 1e12 - (syt / 1000000.0) * (syt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS vyt,
             (sxxc / 1e12 - (sxc / 1000000.0) * (sxc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS vxc,
             (sxxt / 1e12 - (sxt / 1000000.0) * (sxt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS vxt,
             (sxyc / 1e12 - (sxc / 1000000.0) * (syc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS cvc,
             (sxyt / 1e12 - (sxt / 1000000.0) * (syt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS cvt
      FROM th
    ),
    fin AS (
      SELECT arms.*,
             vyc - 2.0 * theta * cvc + theta * theta * vxc AS vac,
             vyt - 2.0 * theta * cvt + theta * theta * vxt AS vat
      FROM arms
    )
    SELECT nc AS n_control, nt AS n_treatment,
           round(theta, 6) AS theta,
           round(mac, 6) AS mean_control_adj,
           round(mat, 6) AS mean_treatment_adj,
           round(mat - mac, 6) AS abs_lift_adj,
           round((mat - mac) / sqrt(vac / CAST(nc AS DOUBLE)
                                    + vat / CAST(nt AS DOUBLE)), 6)
             AS t_stat_adj,
           round((1.0 - (vac + vat) / (vyc + vyt)) * 100.0, 6)
             AS var_reduction_pct,
           abs((mat - mac) / sqrt(vac / CAST(nc AS DOUBLE)
                                  + vat / CAST(nt AS DOUBLE))) > 1.959964
             AS significant
    FROM fin
    """,
)
def cuped_events(spark, sf_dir) -> DataFrame:
    """CUPED-adjusted experiment readout (stats.cuped_ab_report) on the
    ab_test_events setup — parity arms with a PLANTED +0.5 treatment
    lift — plus a deterministic value-correlated covariate (0.8·value +
    id%100·0.1).  The plain Welch test barely resolves the lift; CUPED
    removes the variance the covariate explains (var_reduction ≥ ~60%
    here) and the SAME lift turns decisively significant — the
    sensitivity boost in one conditional-aggregate pass (the adjusted
    moments are algebraic in the joint moments, no second scan).  All
    nine fields value-checked against the mirrored closed form."""
    from ..operators.stats import cuped_ab_report

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(0.5))
        ).alias("y"),
        (F.col("value") * 0.8 + (F.col("event_id") % 100) * 0.1).alias("x"),
    )
    return cuped_ab_report(ev, "arm", "y", "x", "control", "treatment")


@query(
    "trimmed_mean_events",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    r AS (SELECT g, vm,
                 row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM s),
    k AS (SELECT *, CAST(floor(0.1 * n + 1e-9) AS BIGINT) AS k FROM r)
    SELECT g AS event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
           round(CAST(sum(CASE WHEN rn > k AND rn <= n - k
                               THEN CAST(vm AS HUGEINT) END) AS DOUBLE)
                 / sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END)
                 / 1000000.0, 6) AS trimmed_mean
    FROM k GROUP BY g
    """,
)
def trimmed_mean_events(spark, sf_dir) -> DataFrame:
    """Per-type 10% trimmed mean of value (stats.trimmed_mean) — the
    robust center that keeps the metric's units where robust_z only
    scores: mean value without the tail spikes.  Kept mass per distinct
    value is the pure-integer overlap of its exact rank interval with
    [k+1, n−k] (the grouped bounded-prefix machinery — ZERO single-
    partition exchanges, tie order provably irrelevant); the floor
    guard +1e-9 pins k against float wobble (0.3·10 → 3, pytest).
    All 5 rows value-checked vs the per-group rank replay."""
    from ..operators.stats import trimmed_mean

    ev = load_table(spark, sf_dir, "events")
    return trimmed_mean(
        ev, "value", "event_type", 0.0, 500.0, trim=0.1, bins=1 << 10
    )


@query(
    "anova_events_value",
    oracle="""
    WITH q AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) AS s2,
             CAST(sum(CAST(vm AS HUGEINT)) AS HUGEINT) AS s1i
      FROM q GROUP BY 1
    ),
    acc AS (
      SELECT g,
             sum(s2 - s1 * s1 / CAST(n AS DOUBLE)) OVER w AS cw,
             sum(s1 * s1 / CAST(n AS DOUBLE)) OVER w AS cb,
             sum(n) OVER w AS cn,
             CAST(sum(s1i) OVER w AS DOUBLE) AS cs,
             sum(1) OVER w AS ck,
             row_number() OVER (ORDER BY g DESC) AS rn
      FROM per
      WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT CAST(ck AS BIGINT) AS k, CAST(cn AS BIGINT) AS n,
           CAST(CAST(ck AS DOUBLE) - 1.0 AS BIGINT) AS df_between,
           CAST(CAST(cn AS DOUBLE) - CAST(ck AS DOUBLE) AS BIGINT)
             AS df_within,
           round(((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12
                  / (CAST(ck AS DOUBLE) - 1.0))
                 / ((cw / 1e12)
                    / (CAST(cn AS DOUBLE) - CAST(ck AS DOUBLE))), 6)
             AS f_stat,
           round(((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12)
                 / (((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12)
                    + (cw / 1e12)), 6) AS eta_sq
    FROM acc WHERE rn = 1
    """,
)
def anova_events_value(spark, sf_dir) -> DataFrame:
    """One-way ANOVA of value across all five event types
    (stats.anova_report) — the k-arm gate BEFORE pairwise Welch tests
    (C(k,2) uncorrected pair tests are the multiple-testing trap).
    Per-group exact quantized moments in one pass; SSB/SSW algebraic in
    them, accumulated through an ORDERED fold over the bounded group
    table so the doubles land identically in both engines; emits F and
    η² (an F critical value is k-dependent — gating is the caller's
    job, documented rather than faked).  The single row value-checked."""
    from ..operators.stats import anova_report

    ev = load_table(spark, sf_dir, "events")
    return anova_report(ev, "event_type", "value")


@query(
    "proportions_events",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'control'
                  ELSE 'treatment' END AS arm,
             (event_type = 'error')
               OR (event_id % 2 = 1 AND event_id % 25 = 1) AS conv
      FROM events
    ),
    m AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'control' AND conv IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        CAST(sum(CASE WHEN arm = 'treatment' AND conv IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(sum(CASE WHEN arm = 'control' AND conv THEN 1 ELSE 0 END)
             AS BIGINT) AS xc,
        CAST(sum(CASE WHEN arm = 'treatment' AND conv THEN 1 ELSE 0 END)
             AS BIGINT) AS xt
      FROM src
    )
    SELECT nc AS n_control, nt AS n_treatment,
           round(CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS rate_control,
           round(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS rate_treatment,
           round(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                 - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS abs_diff,
           round((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                 / sqrt(((CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                         / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 - (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                           / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 / CAST(nc AS DOUBLE)
                           + 1.0 / CAST(nt AS DOUBLE))), 6) AS z_stat,
           coalesce(abs((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                 / sqrt(((CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                         / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 - (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                           / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 / CAST(nc AS DOUBLE)
                           + 1.0 / CAST(nt AS DOUBLE)))) > 1.959964,
                 false) AS significant
    FROM m
    """,
)
def proportions_events(spark, sf_dir) -> DataFrame:
    """Two-proportion z-test (stats.proportions_ab_report) on parity
    arms with a PLANTED conversion lift: treatment converts on error
    OR every 25th odd event id, so the rate moves ~2pp and the pooled
    z fires — the conversion-rate counterpart of the continuous Welch
    readout, exact by nature (counts need no quantization).  All seven
    fields value-checked against the mirrored closed form."""
    from ..operators.stats import proportions_ab_report

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        (
            (F.col("event_type") == "error")
            | ((F.col("event_id") % 2 == 1) & (F.col("event_id") % 25 == 1))
        ).alias("conv"),
    )
    return proportions_ab_report(ev, "arm", "conv", "control", "treatment")


@query(
    "kappa_events_raters",
    oracle="""
    WITH r AS (
      SELECT event_type AS a,
             CASE WHEN event_id % 7 = 0 THEN 'click'
                  ELSE event_type END AS b
      FROM events WHERE event_type IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
      FROM r
    ),
    marg AS (
      SELECT l AS lbl, sum(ca) AS na, sum(cb) AS nb FROM (
        SELECT a AS l, 1 AS ca, 0 AS cb FROM r
        UNION ALL SELECT b, 0, 1 FROM r)
      GROUP BY 1
    ),
    pe AS (
      SELECT lbl,
             sum((CAST(na AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * (CAST(nb AS DOUBLE) / CAST(tot.n AS DOUBLE)))
               OVER (ORDER BY lbl ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cpe,
             row_number() OVER (ORDER BY lbl DESC) AS rn
      FROM marg, tot
    )
    SELECT tot.n,
           round(CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
             AS p_observed,
           round(pe.cpe, 6) AS p_expected,
           CASE WHEN pe.cpe < 1.0 THEN
             round((CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE)
                    - pe.cpe) / (1.0 - pe.cpe), 6) END AS kappa
    FROM tot, pe WHERE pe.rn = 1
    """,
)
def kappa_events_raters(spark, sf_dir) -> DataFrame:
    """Cohen's kappa (stats.cohens_kappa) between two synthetic raters —
    rater B relabels every 7th event 'click', identically in both
    engines — the labeling-QA number raw agreement fakes (independent
    raters over a skewed label set still agree ~40% by luck;
    pytest-demonstrated).  Exact diagonal/marginal counts, chance
    agreement folded in LABEL ORDER over the bounded label table (the
    anova ordered-fold discipline).  The single row value-checked."""
    from ..operators.stats import cohens_kappa

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.when(F.col("event_id") % 7 == 0, F.lit("click"))
        .otherwise(F.col("event_type"))
        .alias("b"),
    )
    return cohens_kappa(ev, "a", "b")


@query(
    "mwu_events_value",
    oracle="""
    WITH a AS (SELECT value AS v FROM events
               WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT value AS v FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT v, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT v, 0, 1 FROM b),
    per AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY v),
    c AS (SELECT v, na, nb, na + nb AS t,
                 sum(na + nb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    agg AS (
      SELECT CAST(sum(na) AS BIGINT) AS ta,
             CAST(sum(nb) AS BIGINT) AS tb,
             CAST(sum(CAST(na AS HUGEINT)
                      * (2 * (cum - t) + t + 1)) AS DOUBLE) AS ra2,
             CAST(sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT))
                  AS DOUBLE) AS ties
      FROM c
    )
    SELECT ta AS n_a, tb AS n_b,
           round(ra2 / 2.0 - CAST(ta AS DOUBLE)
                 * (CAST(ta AS DOUBLE) + 1.0) / 2.0, 6) AS u_a,
           round((ra2 / 2.0 - CAST(ta AS DOUBLE)
                  * (CAST(ta AS DOUBLE) + 1.0) / 2.0
                  - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 2.0)
                 / sqrt(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12.0
                        * ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) + 1.0)
                           - ties / ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                              * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) - 1.0)))),
                 6) AS z_stat,
           coalesce(abs((ra2 / 2.0 - CAST(ta AS DOUBLE)
                  * (CAST(ta AS DOUBLE) + 1.0) / 2.0
                  - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 2.0)
                 / sqrt(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12.0
                        * ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) + 1.0)
                           - ties / ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                              * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) - 1.0)))))
                 > 1.959964, false) AS significant
    FROM agg
    """,
)
def mwu_events_value(spark, sf_dir) -> DataFrame:
    """Exact Mann–Whitney U between the click and purchase value
    distributions (stats.mann_whitney_u) — the distribution-free "does
    one stochastically dominate" companion to the KS and Wasserstein
    rows over the same pair: rank sums from the pooled doubled
    tie-ranks (the spearman bounded-prefix machinery, no corpus sort),
    tie-corrected normal variance from the exact Σ(t³−t), one round-6
    division.  The single row value-checked."""
    from ..operators.stats import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_u(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        0.0,
        500.0,
        bins=1 << 10,
    )


@query(
    "kruskal_events_value",
    oracle="""
    WITH src AS (SELECT event_type AS g, value AS v FROM events
                 WHERE event_type IS NOT NULL AND value IS NOT NULL),
    pooled AS (SELECT v, count(*) AS t FROM src GROUP BY v),
    rk AS (SELECT v, t,
                  2 * (sum(t) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - t) + t + 1 AS r2
           FROM pooled),
    per AS (SELECT g, v, count(*) AS c FROM src GROUP BY 1, 2),
    per_g AS (
      SELECT per.g, CAST(sum(per.c) AS BIGINT) AS ng,
             CAST(sum(CAST(per.c AS HUGEINT) * rk.r2) AS DOUBLE) AS rg2
      FROM per JOIN rk ON rk.v = per.v GROUP BY 1
    ),
    acc AS (
      SELECT g,
             sum((rg2 / 2.0) * (rg2 / 2.0) / CAST(ng AS DOUBLE)) OVER w
               AS hsum,
             sum(ng) OVER w AS cn,
             sum(1) OVER w AS ck,
             row_number() OVER (ORDER BY g DESC) AS rn
      FROM per_g
      WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tie AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t
                            - CAST(t AS HUGEINT)) AS DOUBLE) AS ties
            FROM pooled)
    SELECT CAST(ck AS BIGINT) AS k, CAST(cn AS BIGINT) AS n,
           round((12.0 / (CAST(cn AS DOUBLE) * (CAST(cn AS DOUBLE) + 1.0))
                  * hsum - 3.0 * (CAST(cn AS DOUBLE) + 1.0))
                 / (1.0 - ties / (CAST(cn AS DOUBLE) * CAST(cn AS DOUBLE)
                                  * CAST(cn AS DOUBLE) - CAST(cn AS DOUBLE))),
                 6) AS h_stat,
           CAST(ck - 1 AS BIGINT) AS df
    FROM acc, tie WHERE rn = 1
    """,
)
def kruskal_events_value(spark, sf_dir) -> DataFrame:
    """Exact Kruskal–Wallis H across all five event types
    (stats.kruskal_wallis) — the distribution-free k-group gate beside
    anova_events_value's mean-based F: same pooled-rank machinery as
    the U test, standard tie correction from the exact Σ(t³−t), H +
    df emitted with χ²(k−1) gating documented as the caller's job (the
    anova convention).  The single row value-checked."""
    from ..operators.stats import kruskal_wallis

    ev = load_table(spark, sf_dir, "events")
    return kruskal_wallis(ev, "event_type", "value", 0.0, 500.0, bins=1 << 10)


@query(
    "randomization_events",
    oracle="""
    WITH src AS (
      SELECT event_id AS id,
             CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 't' END AS arm,
             CAST(round((value + CASE WHEN event_id % 2 = 0 THEN 0.0
                                      ELSE 0.5 END) * 1000000.0) AS BIGINT)
               AS ym
      FROM events WHERE value IS NOT NULL
    ),
    o AS (
      SELECT CAST(sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN arm = 'c' THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS sc,
             CAST(sum(CASE WHEN arm = 't' THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS st
      FROM src
    ),
    dob AS (SELECT nc, nt,
                   round(abs(st / CAST(nt AS DOUBLE) / 1000000.0
                             - sc / CAST(nc AS DOUBLE) / 1000000.0), 6)
                     AS d_obs,
                   CAST(nt AS DOUBLE) / (CAST(nc AS DOUBLE)
                                         + CAST(nt AS DOUBLE)) AS p_hat
            FROM o),
    reps AS (SELECT unnest(range(40)) AS r),
    drawn AS (
      SELECT r,
             ((CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'perm-42',
                    CAST(r AS VARCHAR), CAST(id AS VARCHAR))), 1, 8)
                   AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0
              < (SELECT p_hat FROM dob)) AS pt,
             ym
      FROM src CROSS JOIN reps
    ),
    per AS (
      SELECT r,
             CAST(sum(CASE WHEN pt THEN 1 ELSE 0 END) AS BIGINT) AS dnt,
             CAST(sum(CASE WHEN NOT pt THEN 1 ELSE 0 END) AS BIGINT) AS dnc,
             CAST(sum(CASE WHEN pt THEN CAST(ym AS HUGEINT) END) AS DOUBLE)
               AS dst,
             CAST(sum(CASE WHEN NOT pt THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS dsc
      FROM drawn GROUP BY r
    ),
    ds AS (
      SELECT round(abs(dst / CAST(dnt AS DOUBLE)
                       - dsc / CAST(dnc AS DOUBLE)) / 1000000.0, 6) AS d
      FROM per WHERE dnt > 0 AND dnc > 0
    ),
    hits AS (
      SELECT CAST(count(*) AS BIGINT) AS used,
             CAST(sum(CASE WHEN d >= (SELECT d_obs FROM dob)
                           THEN 1 ELSE 0 END) AS BIGINT) AS ge
      FROM ds
    )
    SELECT dob.nc AS n_control, dob.nt AS n_treatment,
           dob.d_obs AS abs_diff_observed,
           round((1.0 + CAST(hits.ge AS DOUBLE))
                 / (CAST(hits.used AS DOUBLE) + 1.0), 6) AS p_value,
           hits.used AS permutations
    FROM dob, hits
    """,
)
def randomization_events(spark, sf_dir) -> DataFrame:
    """Randomization-inference p-value (stats.randomization_test, 40
    seeded re-draws) for the ab_test setup's planted +0.5 lift — the
    assumption-free test that re-runs the experiment under the design's
    Bernoulli coin instead of trusting a variance formula; the lift
    survives (p = 1/41, no chance draw matches it).  Draws derive from
    the md5-prefix uniform (the bootstrap convention), per-draw means
    are exact integer ratios, and the whole null distribution replays
    bit-for-bit.  The single row value-checked."""
    from ..operators.stats import randomization_test

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit("c"))
        .otherwise(F.lit("t"))
        .alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(0.5))
        ).alias("y"),
    )
    return randomization_test(
        ev, "arm", "y", "c", "t", "event_id", permutations=40, seed=42
    )


@query(
    "fdr_metric_battery",
    oracle="""
    WITH t AS (SELECT unnest(range(20)) AS i),
    ps AS (
      SELECT 'metric_' || CAST(i AS VARCHAR) AS test,
             CASE WHEN i % 7 = 3 THEN
               ((CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'fdr-42',
                      CAST(i AS VARCHAR))), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                / 4294967296.0) / 1000.0
             ELSE
               (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'fdr-42',
                      CAST(i AS VARCHAR))), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                / 4294967296.0
             END AS p
      FROM t
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM ps),
    rk AS (SELECT ps.*, row_number() OVER (ORDER BY p, test) AS r FROM ps),
    q AS (
      SELECT rk.*, m.mm,
             least(min(p * CAST(m.mm AS DOUBLE) / CAST(r AS DOUBLE))
                   OVER (ORDER BY r DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   1.0) AS qv,
             max(CASE WHEN p * CAST(m.mm AS DOUBLE)
                           <= CAST(r AS DOUBLE) * 0.05 THEN r END)
               OVER () AS kstar
      FROM rk, m
    )
    SELECT test, p AS p_value, CAST(r AS BIGINT) AS rank,
           round(qv, 6) AS q_value,
           coalesce(r <= kstar, false) AS rejected
    FROM q
    """,
)
def fdr_metric_battery(spark, sf_dir) -> DataFrame:
    """Benjamini–Hochberg FDR correction (stats.fdr_correct) over a
    20-test battery of seeded p-values with three PLANTED discoveries
    (tests i%7==3 get their uniform p divided by 1000, identically in
    both engines) — the meta-test the engine's own growing test
    battery needs: naive per-test 5% admits ~1 false discovery per 20
    metrics; BH rejects exactly the planted trio.  Ranks, monotone
    q-values, and the k* cutoff all fold over the bounded p-table;
    every row value-checked."""
    from ..operators.stats import fdr_correct

    spine = spark.range(20).select(
        F.concat(F.lit("metric_"), F.col("id").cast("string")).alias("test"),
        F.col("id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit("fdr-42"), F.col("id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    ps = spine.select(
        "test",
        F.when(F.col("id") % 7 == 3, u / F.lit(1000.0)).otherwise(u).alias("p"),
    )
    return fdr_correct(ps, ["test"], "p", alpha=0.05)


@query(
    "wilcoxon_events_paired",
    oracle="""
    WITH src AS (
      SELECT value AS b,
             value + 0.25
               + (((CAST(CAST('0x' || substring(md5(concat_ws(chr(31),
                      'pair-42', CAST(event_id AS VARCHAR))), 1, 8)
                     AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0) - 0.5)
               AS a
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT CAST(round(a * 1000000.0) AS BIGINT)
             - CAST(round(b * 1000000.0) AS BIGINT) AS dm
      FROM src
    ),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM d),
    nz AS (SELECT abs(dm) AS ad, dm > 0 AS pos FROM d WHERE dm <> 0),
    per AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p
            FROM nz GROUP BY 1),
    c AS (SELECT ad, t, p,
                 sum(t) OVER (ORDER BY ad
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    agg AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(CAST(p AS HUGEINT)
                      * (2 * (cum - t) + t + 1)) AS DOUBLE) AS wp2,
             CAST(sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT))
                  AS DOUBLE) AS ties
      FROM c
    )
    SELECT np.n_pairs, agg.n AS n_nonzero,
           round(wp2 / 2.0, 6) AS w_plus,
           round((wp2 / 2.0 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                  / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                        - ties / 48.0), 6) AS z_stat,
           coalesce(abs((wp2 / 2.0 - CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) + 1.0) / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                        - ties / 48.0)) > 1.959964, false) AS significant
    FROM np, agg
    """,
)
def wilcoxon_events_paired(spark, sf_dir) -> DataFrame:
    """Exact Wilcoxon signed-rank (stats.wilcoxon_signed_rank) on PAIRED
    before/after scores: after = value + 0.25 + seeded-uniform noise in
    [−0.5, 0.5) — the same-row re-scoring scenario where the pairing
    carries the power an unpaired test throws away; the +0.25 median
    shift fires decisively.  Round-6 micro diffs, zero-diff drop,
    doubled tie-ranks from the bounded-prefix machinery, exact tie
    correction.  The single row value-checked."""
    from ..operators.stats import wilcoxon_signed_rank

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit("pair-42"), F.col("event_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        F.col("value").alias("b"),
        (F.col("value") + F.lit(0.25) + (u - F.lit(0.5))).alias("a"),
    )
    return wilcoxon_signed_rank(ev, "b", "a", 0.0, 2.0, bins=1 << 10)


@query(
    "effect_sizes_events",
    oracle="""
    WITH a AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
               FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
             (SELECT CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) FROM a) AS s1a,
             (SELECT CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) FROM b) AS s1b,
             (SELECT CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) FROM a) AS s2a,
             (SELECT CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) FROM b) AS s2b
    ),
    u AS (SELECT vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT vm, 0, 1 FROM b),
    per AS (SELECT vm, sum(ca) AS pa, sum(cb) AS pb FROM u GROUP BY vm),
    c AS (SELECT vm, pa, pb, pa + pb AS t,
                 sum(pa + pb) OVER (ORDER BY vm
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    rb AS (SELECT CAST(sum(CAST(pb AS HUGEINT)
                  * (2 * (cum - t) + t + 1)) AS DOUBLE) AS rb2 FROM c),
    f AS (
      SELECT m.*, rb.rb2,
             s1a / CAST(na AS DOUBLE) / 1000000.0 AS ma,
             s1b / CAST(nb AS DOUBLE) / 1000000.0 AS mb,
             (s2a / 1e12 - (s1a / 1000000.0) * (s1a / 1000000.0)
                / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
             (s2b / 1e12 - (s1b / 1000000.0) * (s1b / 1000000.0)
                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb
      FROM m, rb
    ),
    g AS (
      SELECT f.*,
             sqrt(((CAST(na AS DOUBLE) - 1.0) * va
                   + (CAST(nb AS DOUBLE) - 1.0) * vb)
                  / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)) AS pooled,
             (rb2 / 2.0 - CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) + 1.0)
              / 2.0) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cles
      FROM f
    )
    SELECT na AS n_a, nb AS n_b,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           CASE WHEN pooled > 0 THEN round((mb - ma) / pooled, 6) END
             AS cohens_d,
           round(2.0 * cles - 1.0, 6) AS cliffs_delta,
           round(cles, 6) AS cles
    FROM g
    """,
)
def effect_sizes_events(spark, sf_dir) -> DataFrame:
    """Effect sizes for click vs purchase values
    (stats.effect_size_report) — the panel's capstone beside the KS /
    Wasserstein / U-test rows over the same pair: at this engine's
    target scale every test reports p ≈ 0 for ANY nonzero gap, so
    Cohen's d, Cliff's δ (monotone-invariant, pytest-shown), and the
    common-language P(B > A) are the numbers a decision actually
    reads.  Exact moments + the U-test rank machinery; one row
    value-checked field by field."""
    from ..operators.stats import effect_size_report

    ev = load_table(spark, sf_dir, "events")
    return effect_size_report(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        0.0,
        500.0,
        bins=1 << 10,
    )


@query(
    "quantile_ci_events_value",
    oracle="""
    WITH s AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
    o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    r AS (
      SELECT n,
             greatest(CAST(ceil(0.5 * CAST(n AS DOUBLE) - 1e-9) AS BIGINT),
                      1) AS rpt,
             greatest(CAST(floor(0.5 * CAST(n AS DOUBLE)
                     - 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.5 * 0.5))
                     AS BIGINT), 1) AS rlo,
             least(CAST(ceil(0.5 * CAST(n AS DOUBLE)
                   + 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.5 * 0.5))
                   AS BIGINT), n) AS rhi
      FROM t
    )
    SELECT CAST(0.5 AS DOUBLE) AS prob, r.n, r.rpt AS rank,
           (SELECT v FROM o WHERE rn = r.rpt) AS value,
           r.rlo AS rank_lo,
           (SELECT v FROM o WHERE rn = r.rlo) AS ci_lo,
           r.rhi AS rank_hi,
           (SELECT v FROM o WHERE rn = r.rhi) AS ci_hi
    FROM r
    """,
)
def quantile_ci_events_value(spark, sf_dir) -> DataFrame:
    """Distribution-free 95% CI for the median event value
    (stats.quantile_ci) — the error bar for every median this engine
    reports, from the classic order-statistic construction (the
    binomial count below the true quantile is what's normal, never the
    data): three exact rank probes of the same bounded-prefix rank
    intervals, no bootstrap replication.  The single row — point
    estimate, both CI ranks and values — value-checked against the
    ordered replay."""
    from ..operators.stats import quantile_ci

    ev = load_table(spark, sf_dir, "events")
    return quantile_ci(ev, "value", 0.5, 0.0, 500.0, bins=1 << 10)


@query(
    "error_rate_ci_events",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    )
    SELECT g AS event_type, n, x,
           round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           round(greatest(
             (CAST(x AS DOUBLE) + 1.959964 * 1.959964 / 2.0)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964)
             - 1.959964
               * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)
                      + 1.959964 * 1.959964
                        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               * CAST(n AS DOUBLE)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964), 0.0), 6)
             AS ci_lo,
           round(least(
             (CAST(x AS DOUBLE) + 1.959964 * 1.959964 / 2.0)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964)
             + 1.959964
               * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)
                      + 1.959964 * 1.959964
                        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               * CAST(n AS DOUBLE)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964), 1.0), 6)
             AS ci_hi
    FROM c
    """,
)
def error_rate_ci_events(spark, sf_dir) -> DataFrame:
    """Wilson 95% interval per event type for the is-this-an-error rate
    (stats.proportion_ci) — the deliberately degenerate-by-construction
    fixture: each type's rate is exactly 0 or exactly 1, where the
    naive Wald interval collapses to zero width and Wilson keeps honest
    nonzero uncertainty (the '0 errors in 50 rows ≠ certainty' case,
    pytest-pinned at [0, 7.1%]).  Exact counts, closed form in
    identical operand order; all 5 rows value-checked."""
    from ..operators.stats import proportion_ci

    ev = load_table(spark, sf_dir, "events")
    return proportion_ci(
        ev, F.col("event_type") == "error", "event_type"
    )


@query(
    "correlation_ci_lineitem",
    oracle="""
    WITH q AS (
      SELECT CAST(round(l_quantity * 1000000.0) AS BIGINT) AS am,
             CAST(round(l_extendedprice * 1000000.0) AS BIGINT) AS bm
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(am AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(bm AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(am AS HUGEINT) * am) AS DOUBLE) AS sxx,
             CAST(sum(CAST(bm AS HUGEINT) * bm) AS DOUBLE) AS syy,
             CAST(sum(CAST(am AS HUGEINT) * bm) AS DOUBLE) AS sxy
      FROM q
    ),
    c AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS r,
             1.959964 / sqrt(CAST(n AS DOUBLE) - 3.0) AS se
      FROM m
    ),
    f AS (
      SELECT n, r, se,
             0.5 * ln((1.0 + r) / (1.0 - r)) AS zf,
             (n >= 4 AND abs(round(r, 6)) < 1.0) AS ok
      FROM c
    )
    SELECT n, round(r, 6) AS r,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf - se)) - 1.0)
                   / (exp(2.0 * (zf - se)) + 1.0), 6) END AS ci_lo,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf + se)) - 1.0)
                   / (exp(2.0 * (zf + se)) + 1.0), 6) END AS ci_hi
    FROM f
    """,
)
def correlation_ci_lineitem(spark, sf_dir) -> DataFrame:
    """Fisher-z 95% interval for corr(l_quantity, l_extendedprice)
    (stats.correlation_ci) — completing the engine's error-bar trio
    (quantile_ci: location, proportion_ci: rates, this: association):
    the generator draws the two independently, so the interval must
    STRADDLE ZERO — the 'is 0.01 real?' reading this CI exists to give.
    Exact decimal moments; atanh/tanh written explicitly as ln/exp
    compositions evaluated in identical order; the degeneracy gate
    compares the ROUND-6 r (a perfect line's double r slips past
    |r| < 1 — caught by test).  The single row value-checked."""
    from ..operators.stats import correlation_ci

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_ci(li, "l_quantity", "l_extendedprice")


@query(
    "correlation_ci_by_flag_lineitem",
    oracle="""
    WITH q AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity * 1000000.0) AS BIGINT) AS am,
             CAST(round(l_discount * 1000000.0) AS BIGINT) AS bm
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(am AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(bm AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(am AS HUGEINT) * am) AS DOUBLE) AS sxx,
             CAST(sum(CAST(bm AS HUGEINT) * bm) AS DOUBLE) AS syy,
             CAST(sum(CAST(am AS HUGEINT) * bm) AS DOUBLE) AS sxy
      FROM q GROUP BY 1
    ),
    c AS (
      SELECT g, n,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS r,
             1.959964 / sqrt(CAST(n AS DOUBLE) - 3.0) AS se
      FROM m
    ),
    f AS (
      SELECT g, n, r, se,
             0.5 * ln((1.0 + r) / (1.0 - r)) AS zf,
             (n >= 4 AND abs(round(r, 6)) < 1.0) AS ok
      FROM c
    )
    SELECT g AS l_returnflag, n, round(r, 6) AS r,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf - se)) - 1.0)
                   / (exp(2.0 * (zf - se)) + 1.0), 6) END AS ci_lo,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf + se)) - 1.0)
                   / (exp(2.0 * (zf + se)) + 1.0), 6) END AS ci_hi
    FROM f
    """,
)
def correlation_ci_by_flag_lineitem(spark, sf_dir) -> DataFrame:
    """Per-returnflag Fisher-z CI for corr(l_quantity, l_discount)
    (stats.grouped_correlation_ci) — the association error-bar PANEL.
    A/N straddle zero; R's interval EXCLUDES it at r = −0.021
    ([−0.035, −0.007]) — at n = 20k even a trivial association is
    statistically distinguishable from zero, which is precisely the
    large-n phenomenon the effect-size wave documents: the CI says
    'real', Cliff's-δ-sized reasoning says 'negligible', and a reader
    needs both.  Grouped ≡ ungrouped-per-slice pytest-pinned, along
    with the small-n-mirage demonstration.  All 3 rows
    value-checked."""
    from ..operators.stats import grouped_correlation_ci

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_correlation_ci(
        li, "l_quantity", "l_discount", "l_returnflag"
    )
