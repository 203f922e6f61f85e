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
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    )
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the batch twin of a
    streaming session window; lag+sum over a per-user window, partitioned by
    the (high-cardinality) user key so it scales with users."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the testdata; epoch via ltz (session TZ pinned
    # UTC) — only gaps matter, so any fixed offset cancels.
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.select("user_id", new_s.alias("new_s"))
        .groupBy("user_id")
        .agg(
            F.sum("new_s").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "rolling_stats_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(value) OVER w AS BIGINT) AS n_window,
           round(avg(value) OVER w, 6) AS mean_value,
           min(value) OVER w AS min_value,
           max(value) OVER w AS max_value,
           round(stddev_samp(value) OVER w, 6) AS stddev_value,
           round(value - avg(value) OVER w, 6) AS deviation
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 48 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def rolling_stats_events(spark, sf_dir) -> DataFrame:
    """Trailing-window profile (temporal.rolling_stats): every event's
    48-hour same-user trailing count/mean/min/max/stddev and its
    deviation from the trailing mean — exact integer-microsecond range
    frames, so Spark's rangeBetween over unix_micros and DuckDB's
    RANGE BETWEEN INTERVAL must agree on every frame boundary (ties
    included) across all 10k rows."""
    ev = load_table(spark, sf_dir, "events")
    out = temporal.rolling_stats(ev, ["user_id"], "ts", "value", 48 * 3600)
    return out.select(
        "event_id",
        "user_id",
        "n_window",
        "mean_value",
        "min_value",
        "max_value",
        "stddev_value",
        "deviation",
    )


@query(
    "cohort_retention_events",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS bucket
      FROM events WHERE ts IS NOT NULL
    ),
    wc AS (
      SELECT user_id, bucket,
             min(bucket) OVER (PARTITION BY user_id) AS cohort_d
      FROM act
    ),
    cells AS (
      SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
             CAST(date_diff('day', cohort_d, bucket) // 7 AS INT) AS "offset",
             CAST(count(*) AS BIGINT) AS n_active
      FROM wc GROUP BY 1, 2
    )
    SELECT cohort, "offset", n_active,
           max(CASE WHEN "offset" = 0 THEN n_active END)
             OVER (PARTITION BY cohort) AS cohort_size,
           round(n_active / max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort), 6) AS retention
    FROM cells
    """,
)
def cohort_retention_events(spark, sf_dir) -> DataFrame:
    """Weekly cohort retention (temporal.cohort_retention): users cohorted
    by the ISO-Monday week of their first event; each (cohort, offset)
    cell counts users of that cohort active `offset` weeks later.  Both
    engines truncate weeks to Monday (Spark date_trunc('week') ≡ DuckDB
    date_trunc('week')) and offsets divide day-diffs of aligned Mondays
    exactly by 7, so every cell, cohort size, and round(6) retention is
    value-checked — including the offset-0 retention=1.0 sanity rows."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.cohort_retention(ev, "user_id", "ts", unit="week")


@query(
    "survivorship_orders",
    oracle="""
    WITH src AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 7 <> 0 THEN o_orderpriority END AS pri,
             o_totalprice, o_orderstatus
      FROM orders
    ),
    base AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_members,
             arg_max(pri, CASE WHEN pri IS NOT NULL THEN o_orderkey END)
               AS o_orderpriority,
             max(o_totalprice) AS o_totalprice
      FROM src GROUP BY 1
    ),
    mc AS (
      SELECT o_custkey, o_orderstatus, count(*) AS n FROM src
      WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2
    ),
    win AS (
      SELECT o_custkey, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY n DESC, o_orderstatus ASC) AS rn
      FROM mc
    )
    SELECT b.o_custkey, b.n_members, b.o_orderpriority, b.o_totalprice,
           w.o_orderstatus
    FROM base b LEFT JOIN win w ON b.o_custkey = w.o_custkey AND w.rn = 1
    """,
)
def survivorship_orders(spark, sf_dir) -> DataFrame:
    """Golden-record survivorship (resolve.survivorship): each customer's
    orders fused to one master row — priority from the LATEST order
    (seq = o_orderkey, globally unique → tie-free), max total price, and
    the modal order status (ties broken by value ascending).  The
    completeness-beats-recency rule is PLANTED: priority is NULLed for
    every 7th order key, so customers whose freshest order is a %7 key
    demonstrably resolve to the latest NON-NULL priority (DuckDB arg_max
    ignores NULL ordering keys identically — probed).  One grouped
    aggregate plus one value-bounded mode join; every resolved column is
    value-checked."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        "o_totalprice",
        "o_orderstatus",
    )
    return resolve.survivorship(
        orders,
        "o_custkey",
        {
            "o_orderpriority": "latest",
            "o_totalprice": "max",
            "o_orderstatus": "mode",
        },
        seq_col="o_orderkey",
    )


@query(
    "funnel_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS k, epoch_us(ts) AS us, event_type AS s FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    s1 AS (SELECT k, min(us) AS t FROM ev WHERE s = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.k, min(e.us) AS t FROM ev e JOIN s1 ON e.k = s1.k
      WHERE e.s = 'click' AND e.us > s1.t AND e.us <= s1.t + 172800000000
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.k, min(e.us) AS t FROM ev e JOIN s2 ON e.k = s2.k
      WHERE e.s = 'purchase' AND e.us > s2.t AND e.us <= s2.t + 172800000000
      GROUP BY 1
    ),
    c AS (
      SELECT 1 AS step, 'view' AS step_name,
             CAST(count(*) AS BIGINT) AS n_keys FROM s1
      UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
    )
    SELECT step, step_name, n_keys,
      CASE WHEN first_value(n_keys) OVER (ORDER BY step) > 0
           THEN round(n_keys / first_value(n_keys) OVER (ORDER BY step), 6)
      END AS conv_from_first,
      CASE WHEN lag(n_keys) OVER (ORDER BY step) > 0
           THEN round(n_keys / lag(n_keys) OVER (ORDER BY step), 6)
      END AS conv_from_prev
    FROM c
    """,
)
def funnel_events(spark, sf_dir) -> DataFrame:
    """Ordered funnel conversion (temporal.funnel): view → click →
    purchase per user, each hop strictly after the previous step's first
    completion and within a 2-day conversion window — where the sequence
    leaks is the events analytic sessionization and retention can't
    answer.  The window binds (unwindowed, nearly every user completes —
    a vacuous funnel): counts drop hop over hop at sf0.01.  The oracle
    replays the identical min-time chained joins on integer epoch-µs, so
    every step count and round(6) conversion ratio is value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.funnel(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        within_seconds=2 * 86400,
    )


@query(
    "attribution_events",
    oracle="""
    WITH src AS (
      SELECT user_id AS k, event_id AS id, epoch_us(ts) AS us,
             event_type AS t
      FROM events
      WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
    ),
    conv AS (SELECT k, id AS cid, us AS cus FROM src WHERE t = 'purchase'),
    touch AS (SELECT k, id AS tid, us AS tus, t AS touch_type FROM src
              WHERE t IN ('view', 'click')),
    pairs AS (
      SELECT c.k, c.cid, tch.touch_type, tch.tus, tch.tid
      FROM conv c JOIN touch tch
        ON c.k = tch.k AND tch.tus < c.cus
       AND tch.tus >= c.cus - 21600000000
    ),
    credited AS (
      SELECT k, cid, touch_type,
             round(CAST(1.0 AS DOUBLE)
                   / count(*) OVER (PARTITION BY k, cid), 6) AS credit
      FROM pairs
    ),
    by_type AS (
      SELECT touch_type,
             CAST(count(DISTINCT (k, cid)) AS BIGINT) AS conversions,
             round(sum(credit), 6) AS credit
      FROM credited GROUP BY 1
    ),
    none_row AS (
      SELECT '(none)' AS touch_type,
             CAST(count(*) AS BIGINT) AS conversions,
             CAST(0.0 AS DOUBLE) AS credit
      FROM conv c
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.k = c.k AND p.cid = c.cid)
    )
    SELECT * FROM by_type UNION ALL SELECT * FROM none_row
    """,
)
def attribution_events(spark, sf_dir) -> DataFrame:
    """Linear touch attribution (temporal.attribution): purchases credited
    across the same user's view/click touches within a 6-hour lookback,
    each touch taking 1/n — the marketing analytic funnel (ordered
    completion) and as-of join (single nearest) cannot answer.  The
    6-hour window BINDS at sf0.01 (unattributed purchases exist → the
    '(none)' row is non-trivial).  Conversions probe exactly two
    lookback-sized (key, band) buckets — never the key's whole history;
    the oracle replays the window join directly (sf-scale) with the same
    per-credit AND final round(6), so every type's conversion count and
    credit mass is value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.attribution(
        ev,
        "user_id",
        "event_id",
        "ts",
        "event_type",
        ["view", "click"],
        "purchase",
        lookback_seconds=6 * 3600,
        model="linear",
    )


@query(
    "transition_profile_events",
    oracle="""
    WITH st AS (SELECT user_id, event_id,
           CASE WHEN event_id % 1009 = 0 THEN 'rare_state'
                ELSE event_type END AS s
         FROM events),
    pr AS (SELECT s AS to_state,
             lag(s) OVER (PARTITION BY user_id ORDER BY event_id, s)
               AS from_state
           FROM st)
    SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER (PARTITION BY from_state)
                        AS DOUBLE), 6) AS p
    FROM pr WHERE from_state IS NOT NULL GROUP BY 1, 2
    """,
)
def transition_profile_events(spark, sf_dir) -> DataFrame:
    """First-order Markov transition matrix (temporal.transition_profile)
    over per-user event sequences ordered by event_id, with a planted
    'rare_state' on every 1009th event so the matrix carries both common
    (~0.2) and rare (~0.001) conditional probabilities.  One window
    shuffle on user_id → a states²-sized aggregate; (order, state)
    tie-break makes equal-order rows deterministic.  The oracle replays
    lag + conditional normalization — every cell's count AND probability
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 1009 == 0, F.lit("rare_state"))
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    return temporal.transition_profile(st, "user_id", "event_id", "s")


@query(
    "anomalous_transitions_events",
    oracle="""
    WITH st AS (SELECT user_id, event_id,
           CASE WHEN event_id % 1009 = 0 THEN 'rare_state'
                ELSE event_type END AS s
         FROM events),
    pr AS (SELECT user_id AS key, event_id AS order_at, s AS to_state,
             lag(s) OVER (PARTITION BY user_id ORDER BY event_id, s)
               AS from_state
           FROM st),
    cnt AS (SELECT from_state, to_state, count(*) AS n FROM pr
            WHERE from_state IS NOT NULL GROUP BY 1, 2),
    prof AS (SELECT from_state, to_state,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE),
                     6) AS p,
               sum(n) OVER (PARTITION BY from_state) AS ft
             FROM cnt),
    rare AS (SELECT from_state, to_state, p FROM prof
             WHERE p <= CAST(0.01 AS DOUBLE) AND ft >= 50)
    SELECT pr.key, pr.order_at, pr.from_state, pr.to_state, rare.p
    FROM pr JOIN rare ON pr.from_state = rare.from_state
                     AND pr.to_state = rare.to_state
    """,
)
def anomalous_transitions_events(spark, sf_dir) -> DataFrame:
    """Row-level rare-transition audit (temporal.anomalous_transitions,
    max_p=0.01, min_from_total=50): the planted 'rare_state' rows surface
    as transitions INTO rare_state (p ≈ 0.001 under well-measured
    from-states), while transitions OUT of rare_state are correctly
    SUPPRESSED by the min_from_total floor (its total ≈ 10 observations —
    a p=0.3 'rarity' from 10 samples is noise, and that arm is exactly
    what the floor exists for).  Returns the offending rows, not the
    matrix; oracle replays profile + floor + row join."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 1009 == 0, F.lit("rare_state"))
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    return temporal.anomalous_transitions(
        st, "user_id", "event_id", "s", max_p=0.01, min_from_total=50
    )


@query(
    "survival_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t0,
             max(CASE WHEN rn = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs
      FROM ranked GROUP BY user_id),
    cells AS (SELECT t0 AS t,
                     CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_event,
                     CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_censored
              FROM per GROUP BY 1),
    tot AS (SELECT sum(n_event + n_censored) AS n FROM cells),
    risk AS (SELECT t, n_event, n_censored,
                    CAST(n - coalesce(sum(n_event + n_censored) OVER
                      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             FROM cells, tot),
    lg AS (SELECT t, n_event, n_censored, n_risk,
            CASE WHEN n_event < n_risk
                 THEN round(ln(CAST(n_risk - n_event AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)), 6) END AS lt,
            CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END AS z,
            CASE WHEN n_event < n_risk
                 THEN round(CAST(n_event AS DOUBLE)
                            / (CAST(n_risk AS DOUBLE)
                               * CAST(n_risk - n_event AS DOUBLE)), 12)
            END AS g
           FROM risk),
    cum AS (SELECT t, n_risk, n_event, n_censored,
                   sum(z) OVER w AS zc, sum(lt) OVER w AS sl,
                   sum(g) OVER w AS sg
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
    SELECT t, n_risk, n_event, n_censored,
           CASE WHEN zc > 0 THEN 0.0 ELSE round(exp(sl), 6) END AS survival,
           CASE WHEN zc > 0 THEN NULL
                WHEN round(exp(sl), 6) > 0
                THEN round(round(exp(sl), 6) * sqrt(sg), 6) END AS std_err
    FROM cum
    """,
)
def survival_users_events(spark, sf_dir) -> DataFrame:
    """Kaplan-Meier survival curve (temporal.survival_curve) over per-user
    lifetimes derived from events: duration = exact integer HOUR floor
    between a user's first and last event (hours, not days — the sf
    generator packs lifetimes into ~1 month, day floors would collapse the
    curve to four times), observed = the user's FINAL event is an 'error'
    (churned-with-error; the deterministic tie-break is the unique
    event_id riding inside a struct max, row_number DESC in the oracle).
    "Every user ever errors" made the naive proxy degenerate — final-event
    gives ~20% observed, so BOTH arms are populated at sf0.01: users whose
    last sighting is benign are CENSORED there and stay in the risk set,
    the correction naive retention queries miss.  Log-space product with
    per-term round6 + ordered cumulative windows keeps every survival
    value bit-identical across engines; Greenwood terms round at 12
    (1e-6-scale magnitudes).  Every curve row — risk set, events,
    censorings, survival, std_err — value-checked against the full
    relational replay."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("duration_hours"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("observed"),
        )
    )
    return temporal.survival_curve(per, "duration_hours", "observed")


@query(
    "acf_events_value",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest([1, 2, 3, 7]) AS lag),
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
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                     / (sqrt(n_pairs * sxx - sx * sx)
                        * sqrt(n_pairs * syy - sy * sy)), 6)
           END AS acf
    FROM m
    """,
)
def acf_events_value(spark, sf_dir) -> DataFrame:
    """Per-event-type autocorrelation of the daily mean value at lags
    1/2/3/7 (temporal.autocorrelation) — the seasonality detector that
    FINDS the period the seasonal anomaly monitor assumes.  Cell values
    quantize to integer micro-units so all five moment sums are exact
    decimal aggregates (the ab_test_report determinism contract); the
    correlation derives from identical operands in identical expression
    order and is round-6 value-checked across engines.  One grid-sized
    lag self-join keyed by (type, lag); the corpus collapses to cells in
    a single map-side-partial pass."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.autocorrelation(
        ev, ["event_type"], "ts", "value", 86400, [1, 2, 3, 7]
    )


@query(
    "xcorr_events_value_volume",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS xm,
             CAST(count(value) * 1000000 AS BIGINT) AS ym
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest([-3, -1, 0, 1, 3]) AS lag),
    p AS (
      SELECT x.event_type, l.lag, x.xm AS xv, y.ym AS yv
      FROM cells x CROSS JOIN l
      JOIN cells y ON y.event_type = x.event_type
                  AND y.b = x.b + l.lag * 86400000000
      WHERE x.xm IS NOT NULL AND y.ym IS NOT NULL
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
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                     / (sqrt(n_pairs * sxx - sx * sx)
                        * sqrt(n_pairs * syy - sy * sy)), 6)
           END AS xcorr
    FROM m
    """,
)
def xcorr_events_value_volume(spark, sf_dir) -> DataFrame:
    """Per-event-type lead–lag cross-correlation between the daily mean
    value and the daily event VOLUME at lags −3/−1/0/+1/+3
    (temporal.cross_correlation, y_agg='count') — the causal-direction
    probe ACF can't answer: does the metric move before volume does, or
    after?  Same exact-decimal-moment determinism contract as
    acf_events_value, with the count side exact by construction; every
    (type, lag) row value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.cross_correlation(
        ev,
        ["event_type"],
        "ts",
        "value",
        "value",
        86400,
        [-3, -1, 0, 1, 3],
        x_agg="avg",
        y_agg="count",
    )


@query(
    "theil_sen_events",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type,
             CAST((b - min(b) OVER (PARTITION BY event_type))
                  // 86400000000 AS BIGINT) AS x,
             y
      FROM cells
    ),
    p AS (
      SELECT a.event_type, a.x AS x1, bb.x AS x2,
             round((bb.y - a.y) / 1000000.0 / (bb.x - a.x), 6) AS s
      FROM x a JOIN x bb
        ON bb.event_type = a.event_type AND a.x < bb.x
    ),
    np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
           FROM p GROUP BY 1),
    rs AS (SELECT p.*, row_number() OVER (PARTITION BY p.event_type
                     ORDER BY s, x1, x2) AS rn FROM p),
    ms AS (
      SELECT rs.event_type, np.n_pairs, rs.s AS slope
      FROM rs JOIN np ON np.event_type = rs.event_type
      WHERE rs.rn = CAST(ceil(CAST(np.n_pairs AS DOUBLE) / 2.0 - 1e-9)
                         AS BIGINT)
    ),
    nc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
           FROM x GROUP BY 1),
    r AS (
      SELECT x.event_type, ms.n_pairs, ms.slope,
             round(x.y / 1000000.0 - ms.slope * x.x, 6) AS res,
             row_number() OVER (PARTITION BY x.event_type
               ORDER BY round(x.y / 1000000.0 - ms.slope * x.x, 6), x.x)
               AS rn
      FROM x JOIN ms ON ms.event_type = x.event_type
    )
    SELECT r.event_type, nc.n_points, r.n_pairs, r.slope,
           r.res AS intercept
    FROM r JOIN nc ON nc.event_type = r.event_type
    WHERE r.rn = CAST(ceil(CAST(nc.n_points AS DOUBLE) / 2.0 - 1e-9)
                      AS BIGINT)
    """,
)
def theil_sen_events(spark, sf_dir) -> DataFrame:
    """Theil–Sen robust trend of the per-type daily mean value
    (temporal.theil_sen): slope = median pairwise slope, intercept =
    median residual — the drift estimate a level shift or outlier burst
    cannot drag (~29% contamination tolerance; the robust companion to
    the seasonal-decompose MA trend).  Round-6 slopes from exact
    integer differences, medians as the engine's type-1 rank statistic
    under a pinned total order; pairwise work is quadratic in the GRID,
    never the corpus.  All 5 per-type rows value-checked vs the
    ordered-rank DuckDB replay."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.theil_sen(ev, ["event_type"], "ts", "value", 86400)


@query(
    "logrank_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn_last,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) ASC, event_id ASC)
               AS rn_first
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t,
             max(CASE WHEN rn_last = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs,
             CASE WHEN max(CASE WHEN rn_first = 1 AND event_type = 'error'
                                THEN 1 ELSE 0 END) = 1
                  THEN 'error_start' ELSE 'clean_start' END AS g
      FROM ranked GROUP BY user_id),
    cells AS (
      SELECT t,
             CAST(sum(CASE WHEN g = 'clean_start' AND obs THEN 1 ELSE 0 END) AS BIGINT) AS da,
             CAST(sum(CASE WHEN g = 'error_start' AND obs THEN 1 ELSE 0 END) AS BIGINT) AS db,
             CAST(sum(CASE WHEN g = 'clean_start' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g = 'error_start' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM per GROUP BY 1),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM cells),
    risk AS (
      SELECT c.*, tot.na, tot.nb,
             tot.na - coalesce(sum(ca) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ra,
             tot.nb - coalesce(sum(cb) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb
      FROM cells c, tot),
    ev AS (SELECT * FROM risk WHERE da + db > 0),
    terms AS (
      SELECT t, na, nb, da, db,
             CAST(ra AS DOUBLE) * CAST(da + db AS DOUBLE)
               / CAST(ra + rb AS DOUBLE) AS et,
             CASE WHEN ra + rb > 1 THEN
               CAST(da + db AS DOUBLE)
               * (CAST(ra AS DOUBLE) / CAST(ra + rb AS DOUBLE))
               * (1.0 - CAST(ra AS DOUBLE) / CAST(ra + rb AS DOUBLE))
               * ((CAST(ra + rb AS DOUBLE) - CAST(da + db AS DOUBLE))
                  / (CAST(ra + rb AS DOUBLE) - 1.0))
             ELSE 0.0 END AS vt
      FROM ev),
    cum AS (
      SELECT t, na, nb,
             sum(da) OVER w AS oa, sum(db) OVER w AS ob,
             sum(et) OVER w AS ea, sum(vt) OVER w AS v,
             row_number() OVER (ORDER BY t DESC) AS rn
      FROM terms
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT 'clean_start' AS group_a, 'error_start' AS group_b,
           na AS n_a, nb AS n_b,
           CAST(oa AS BIGINT) AS o_a, round(ea, 6) AS e_a,
           CAST(ob AS BIGINT) AS o_b,
           round(CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE) - ea, 6) AS e_b,
           CASE WHEN v > 0 THEN
             round((CAST(oa AS DOUBLE) - ea) * (CAST(oa AS DOUBLE) - ea) / v, 6)
           END AS chi2,
           coalesce(CASE WHEN v > 0 THEN
             (CAST(oa AS DOUBLE) - ea) * (CAST(oa AS DOUBLE) - ea) / v
               > 3.841459 END, false) AS significant
    FROM cum WHERE rn = 1
    """,
)
def logrank_users_events(spark, sf_dir) -> DataFrame:
    """Two-group log-rank test (temporal.survival_logrank) between users
    whose FIRST event is an error ('error_start') and the rest
    ('clean_start'), on the same per-user lifetimes as the Kaplan–Meier
    query (hour-floor durations, final-event-error observed flag) — the
    hypothesis test that says whether the two churn curves actually
    differ.  Exact integer risk sets from prefix windows over the
    bounded duration table; E/V accumulate through ORDERED cumulative
    windows so the double fold is bit-identical across engines (the
    survival_curve discipline).  The single output row value-checked
    field by field."""
    from ..operators.temporal import survival_logrank

    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("t"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("obs"),
            F.min(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("_first_err"),
        )
        .select(
            "t",
            "obs",
            F.when(F.col("_first_err"), F.lit("error_start"))
            .otherwise(F.lit("clean_start"))
            .alias("grp"),
        )
    )
    return survival_logrank(per, "t", "obs", "grp")


@query(
    "rmst_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t0,
             max(CASE WHEN rn = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs
      FROM ranked GROUP BY user_id),
    cells AS (SELECT t0 AS t,
                     CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_event,
                     CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_censored
              FROM per GROUP BY 1),
    tot AS (SELECT sum(n_event + n_censored) AS n FROM cells),
    risk AS (SELECT t, n_event, n_censored,
                    CAST(n - coalesce(sum(n_event + n_censored) OVER
                      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             FROM cells, tot),
    lg AS (SELECT t, n_risk,
            CASE WHEN n_event < n_risk
                 THEN round(ln(CAST(n_risk - n_event AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)), 6) END AS lt,
            CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END AS z
           FROM risk),
    cum AS (SELECT t, n_risk,
                   sum(z) OVER w AS zc, sum(lt) OVER w AS sl
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
    curve AS (SELECT t, n_risk,
                     CASE WHEN zc > 0 THEN 0.0
                          ELSE round(exp(sl), 6) END AS survival
              FROM cum),
    seg AS (
      SELECT CAST(t AS DOUBLE) AS t, n_risk, survival,
             coalesce(lead(CAST(t AS DOUBLE)) OVER (ORDER BY t), 700.0)
               AS nxt,
             first_value(CAST(t AS DOUBLE)) OVER (ORDER BY t) AS t0,
             first_value(n_risk) OVER (ORDER BY t) AS n0
      FROM curve
    )
    SELECT CAST(700.0 AS DOUBLE) AS tau,
           CAST(max(n0) AS BIGINT) AS n,
           round(max(least(t0, 700.0))
                 + sum(survival * greatest(least(nxt, 700.0)
                                           - least(t, 700.0), 0.0)), 6)
             AS rmst
    FROM seg
    """,
)
def rmst_users_events(spark, sf_dir) -> DataFrame:
    """Restricted mean survival time at τ = 700 hours
    (temporal.survival_rmst) over the same per-user lifetimes as the
    Kaplan–Meier query — 'expected active hours within the first 700',
    the scalar that stays meaningful when hazards cross and median
    survival is undefined.  Area under the engine's own round-6 KM
    steps, folded in duration order (the survival_curve discipline),
    τ-clamped segments, flat extension past the last duration.  The
    single row value-checked against the windowed replay."""
    from ..operators.temporal import survival_rmst
    from ..operators import stats as _stats

    ev = load_table(spark, sf_dir, "events")
    us = _stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("t"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("obs"),
        )
    )
    return survival_rmst(per, "t", "obs", 700.0)


@query(
    "interarrival_users_events",
    oracle="""
    WITH base AS (
      SELECT user_id AS k, epoch_us(ts) AS us, event_id AS tb
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    g AS (
      SELECT k, us - lag(us) OVER (PARTITION BY k ORDER BY us, tb) AS gap
      FROM base
    ),
    agg AS (
      SELECT k,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS s2,
             CAST(max(gap) AS BIGINT) AS mx
      FROM g GROUP BY k
    )
    SELECT k AS user_id, n_events, n_gaps,
           CASE WHEN n_gaps >= 1
                THEN round(s1 / CAST(n_gaps AS DOUBLE) / 1e6, 6)
           END AS mean_gap_s,
           CASE WHEN n_gaps >= 2 AND s1 / CAST(n_gaps AS DOUBLE) > 0
                THEN round(sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)), 6)
           END AS cv_gap,
           CASE WHEN n_gaps >= 2 AND s1 / CAST(n_gaps AS DOUBLE) > 0
                THEN round((sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)) - 1.0)
                    / (sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)) + 1.0), 6)
           END AS burstiness,
           CASE WHEN n_gaps >= 1
                THEN round(CAST(mx AS DOUBLE) / 1e6, 6)
           END AS max_gap_s
    FROM agg
    """,
)
def interarrival_users_events(spark, sf_dir) -> DataFrame:
    """Per-user inter-arrival burstiness (temporal.interarrival_profile)
    — the temporal-behavior axis lateness (disorder_profile) and
    staleness (freshness) don't measure: Goh–Barabási burstiness near
    −1 betrays scripted metronome traffic, near +1 session-bursty
    humans (both directions are anomaly signals).  Exact integer
    microsecond gaps from a keyed (ts, event_id)-ordered lag, decimal
    moments, round-6 CV/B; degenerate-key NULL contracts pinned.  All
    150 user rows value-checked."""
    from ..operators.temporal import interarrival_profile

    ev = load_table(spark, sf_dir, "events")
    return interarrival_profile(ev, "user_id", "ts", "event_id")
