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


@query(
    "sample_documents",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE substring(md5(concat_ws(chr(31), '42', cast(doc_id AS string))), 1, 8)
          < '33333333'
    """,
)
def sample_documents(spark, sf_dir) -> DataFrame:
    """Deterministic 20% corpus sample: membership is a pure function of
    (seed, doc_id) via an md5 hex prefix vs threshold string — identical
    under any partitioning/retry/engine, growth-stable, exactly SQL-oracled
    (operators/sample.py; threshold 0x33333333/16^8 = 0.2)."""
    from jsons_to_schema_spark.operators.sample import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.2).select(
        "doc_id", "source", "lang"
    )


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(concat_ws(chr(31), '42', cast(doc_id AS string))), 1, 8)
          < CASE WHEN lang = 'en' THEN '80000000'
                 WHEN lang = 'de' THEN '1999999a'
                 ELSE '051eb852' END
    """,
)
def stratified_sample_documents(spark, sf_dir) -> DataFrame:
    """Training-mixture sampling: keep 50% of 'en', 10% of 'de', 2% of the
    rest — one narrow filter, per-stratum hex thresholds, decision hash on
    the key alone so equal rates admit identical key sets
    (operators/sample.py:stratified_sample)."""
    from jsons_to_schema_spark.operators.sample import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.02
    ).select("doc_id", "lang")


@query(
    "quota_sample_documents",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substring(md5(concat_ws(chr(31), '42',
                          cast(doc_id AS VARCHAR))), 1, 8),
                        cast(doc_id AS VARCHAR)
             ) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def quota_sample_documents(spark, sf_dir) -> DataFrame:
    """Domain balancing: at most 10 documents per source, selected by
    deterministic hash order (sample.quota_sample) — the count-cap mixture
    rule where a rate is the wrong tool because stratum sizes vary by
    orders of magnitude; growth-stable and engine-portable, hence the
    exact window-SQL oracle."""
    from ..operators.sample import quota_sample

    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, "doc_id", "source", quota=10).select(
        "doc_id", "source"
    )


_SPLIT_METRICS_SQL = """
    WITH t AS (SELECT filename AS split,
                      spans, list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__', filename=true)),
         v AS (SELECT split,
                      CASE WHEN NOT (offs = list_sort(offs)
                                     AND len(list_distinct(offs)) = len(offs))
                           THEN 1 ELSE 0 END
                    + CASE WHEN len(list_filter(spans,
                               s -> s.kind = 'text' AND s.text IS NULL)) > 0
                           THEN 1 ELSE 0 END
                    + CASE WHEN len(list_filter(spans,
                               s -> s.kind <> 'text' AND s.media_ref IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f
               FROM t),
         pv AS (SELECT split, count(*) AS n_rows,
                       CAST(sum(f) AS BIGINT) AS n_failed
                FROM v GROUP BY split),
         g AS (SELECT count(*) AS n,
                      CAST(sum(n_rows) AS BIGINT) AS s_r,
                      CAST(sum(n_rows * n_rows) AS BIGINT) AS s2_r,
                      CAST(sum(n_failed) AS BIGINT) AS s_f,
                      CAST(sum(n_failed * n_failed) AS BIGINT) AS s2_f
               FROM pv),
         z AS (SELECT split, n_rows, n_failed,
                      CASE WHEN n > 1 AND
                             (CAST(s2_r AS DOUBLE) - CAST(s_r AS DOUBLE)
                              * CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0) > 0
                           THEN round((CAST(n_rows AS DOUBLE)
                                  - CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE))
                               / sqrt((CAST(s2_r AS DOUBLE)
                                  - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / (CAST(n AS DOUBLE) - 1.0)), 6)
                           ELSE 0.0 END AS z_n_rows,
                      CASE WHEN n > 1 AND
                             (CAST(s2_f AS DOUBLE) - CAST(s_f AS DOUBLE)
                              * CAST(s_f AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0) > 0
                           THEN round((CAST(n_failed AS DOUBLE)
                                  - CAST(s_f AS DOUBLE) / CAST(n AS DOUBLE))
                               / sqrt((CAST(s2_f AS DOUBLE)
                                  - CAST(s_f AS DOUBLE) * CAST(s_f AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / (CAST(n AS DOUBLE) - 1.0)), 6)
                           ELSE 0.0 END AS z_n_failed
               FROM pv, g)
    SELECT split, CAST(n_rows AS BIGINT) AS n_rows, n_failed,
           z_n_rows, z_n_failed,
           (abs(z_n_rows) > 3.0 OR abs(z_n_failed) > 3.0) AS anomalous
    FROM z
"""


@query("split_anomaly_verdicts", oracle=_SPLIT_METRICS_SQL)
def split_anomaly_verdicts(spark, sf_dir) -> DataFrame:
    """Outlier data files: z-score every split's (row count, failure count)
    against the corpus of splits — the "which of my 10^6 input files look
    broken" triage view over the verdict table.  Exact-integer-sum z
    arithmetic makes the verdict bit-stable across engines and partitionings
    (stats.split_anomalies)."""
    from ..operators import stats as stats_ops

    df = load_spans(spark, _spans_corpus(spark))
    pv = validate.split_verdicts(df).select("split", "n_rows", "n_failed")
    return stats_ops.split_anomalies(
        pv, "split", ["n_rows", "n_failed"], z_threshold=3.0
    )


@query(
    "mixture_sample_documents",
    oracle="""
    WITH c AS (
      SELECT source AS s, count(*) AS n FROM documents
      WHERE source IS NOT NULL GROUP BY 1
    ),
    d AS (SELECT sum(sqrt(n)) AS denom FROM c),
    t AS (
      SELECT s,
             CAST(floor(least(1.0, (150 * sqrt(n)) / denom / n)
                        * 1048576.0) AS BIGINT) * 4096 AS thr
      FROM c, d
    )
    SELECT doc_id, source FROM documents JOIN t ON documents.source = t.s
    WHERE CAST(concat('0x', substring(md5(concat_ws(chr(31), '42',
                 CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) < t.thr
    """,
)
def mixture_sample_documents(spark, sf_dir) -> DataFrame:
    """Temperature-weighted source rebalancing (sample.mixture_sample,
    alpha=0.5): the multilingual-T5 data-mixing rule — sample source s
    ∝ n_s^0.5, flattening the head so minority sources are over-
    represented relative to natural proportions.  Rates quantize to the
    dyadic 2^-20 grid and alpha=0.5 computes via sqrt (correctly rounded
    where pow need not be), so the oracle reproduces the exact membership
    decision from the same integer counts; denominator summation order is
    the one ulp-level cross-engine freedom (bounded by the handful of
    sources, grid-absorbed).  One bounded groupBy + one narrow filter —
    the corpus itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return sample.mixture_sample(
        docs, "doc_id", "source", alpha=0.5, target_total=150
    ).select("doc_id", "source")


@query(
    "weighted_sample_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             round(ln((CAST('0x' || substr(md5('11' || chr(31)
                        || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       + 0.5) / 4294967296.0) / n_chars, 6) AS es_key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, n_chars, es_key FROM t
    ORDER BY es_key DESC, doc_id ASC LIMIT 75
    """,
)
def weighted_sample_documents(spark, sf_dir) -> DataFrame:
    """Weighted sampling without replacement (sample.weighted_sample,
    Efraimidis-Spirakis): 75 documents drawn ∝ n_chars — longer docs
    proportionally likelier, decided by the same md5-derived uniform
    both engines compute, with the round-6 log-key ordering and doc_id
    tie-break making the selected SET (not just its size) exact; the
    oracle replays the identical key arithmetic and top-k."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sample.weighted_sample(docs, "doc_id", "n_chars", 75, seed=11)


@query(
    "weighted_quota_sample_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             round(ln((CAST('0x' || substr(md5('13' || chr(31)
                        || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       + 0.5) / 4294967296.0) / n_chars, 6) AS es_key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY source
        ORDER BY es_key DESC, CAST(doc_id AS VARCHAR) ASC) AS rk
      FROM t
    )
    SELECT doc_id, source, n_chars, es_key FROM r WHERE rk <= 20
    """,
)
def weighted_quota_sample_documents(spark, sf_dir) -> DataFrame:
    """Per-stratum weighted draw (sample.weighted_quota_sample): the 20
    highest-ES-key documents per source, weighted by n_chars — the
    "top-N per domain, quality-weighted" mixture rule; the oracle
    replays the identical key arithmetic and per-stratum rank with the
    same tie-break."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return sample.weighted_quota_sample(
        docs, "doc_id", "source", "n_chars", 20, seed=13
    )


@query(
    "resample_events_daily",
    oracle="""
    WITH src AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND (epoch_us(ts) // 86400000000) % 5 <> 2
    ),
    cells AS (
      SELECT user_id, us - (us % 86400000000) AS bucket_us,
             round(avg(value), 6) AS val
      FROM src GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(bucket_us) AS mn, max(bucket_us) AS mx
      FROM cells GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, 86400000000)) AS bucket_us
      FROM spans
    ),
    grid AS (
      SELECT s.user_id, s.bucket_us, c.val,
             (c.user_id IS NULL) AS filled
      FROM spine s LEFT JOIN cells c USING (user_id, bucket_us)
    )
    SELECT user_id, bucket_us,
           last_value(val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           filled
    FROM grid
    """,
)
def resample_events_daily(spark, sf_dir) -> DataFrame:
    """Fixed-grid resampling with forward fill (temporal.resample): each
    user's event values snapped to daily buckets (avg), emitted on a
    COMPLETE per-user grid with gaps forward-filled.  Gaps are PLANTED by
    dropping every 5th epoch day (identical integer bucket arithmetic in
    both engines — epoch_us // 86400000000, all-positive), so the spine
    generation, the `filled` flags, and the carried ffill values are all
    value-checked, not vacuously absent.  events.value is never NULL at
    this SF, so the oracle's last_value-IGNORE-NULLS replay is exactly
    the operator's observed-cells-win rule."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    day = ((us - F.pmod(us, F.lit(86400000000))) / F.lit(86400000000)).cast(
        "long"
    )
    holed = ev.filter(day % 5 != 2)
    return temporal.resample(
        holed, ["user_id"], "ts", "value", 86400, agg="avg", fill="ffill"
    )


@query(
    "split_assign_documents",
    oracle="""
    SELECT doc_id,
           CASE WHEN substring(md5(concat_ws(chr(31), '42', fp)), 1, 8)
                     < 'cccccccd' THEN 'train'
                WHEN substring(md5(concat_ws(chr(31), '42', fp)), 1, 8)
                     < 'e6666666' THEN 'val'
                ELSE 'test' END AS split,
           fp AS group_key
    FROM (SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
          FROM documents)
    """,
)
def split_assign_documents(spark, sf_dir) -> DataFrame:
    """Leakage-safe train/val/test split (sample.assign_splits keyed on a
    GROUP column, 80/10/10): the split decision hashes the
    exact-duplicate fingerprint (text.fp_exact_key), NOT the row id —
    identical documents land in the same split BY CONSTRUCTION, so the
    train/test contamination row-hash splitting commits whenever
    duplicates straddle the boundary cannot happen.  (The pair-list /
    connected-components variant is leakage_safe_split_documents.)
    Deterministic under any partitioning/engine (md5-prefix convention),
    growth-stable (frozen eval sets survive corpus refreshes), zero
    shuffles — the group key rides each row."""
    from ..operators.sample import assign_splits
    from ..operators.text import fp_exact_key

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "group_key", fp_exact_key("text")
    )
    out = assign_splits(
        docs, "group_key", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "split", "group_key")


def _mixture_weights_ppm() -> dict:
    """src0/src1 get 30% each (forcing saturation at the query's budget);
    the remaining 18 sources share 40% with the ppm remainder spread over
    the alphabetically-first four — integers summing exactly to 1e6."""
    rest = [f"src{i}" for i in range(2, 20)]
    w = {"src0": 300_000, "src1": 300_000}
    base, rem = divmod(400_000, len(rest))
    for i, s in enumerate(sorted(rest)):
        w[s] = base + (1 if i < rem else 0)
    assert sum(w.values()) == 1_000_000
    return w


def _mixture_oracle() -> str:
    vals = ", ".join(
        f"('{s}', {w})" for s, w in sorted(_mixture_weights_ppm().items())
    )
    return f"""
    WITH tok AS (SELECT source,
                        CAST(sum(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS BIGINT) AS t
                 FROM documents GROUP BY source),
    w(source, w) AS (VALUES {vals}),
    tot AS (SELECT tok.source, tok.t, coalesce(w.w, 0) AS w
            FROM tok LEFT JOIN w USING (source)),
    f AS (SELECT *, t * 1000000.0 / w AS kappa
          FROM tot WHERE w > 0 AND t > 0),
    seg AS (SELECT *,
                   coalesce(sum(t) OVER (ORDER BY kappa, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumt_prev,
                   sum(w) OVER (ORDER BY kappa, source
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS wsuf,
                   coalesce(lag(kappa) OVER (ORDER BY kappa, source), 0.0)
                     AS kprev
            FROM f),
    lamr AS (SELECT min((12000.0 - cumt_prev) * 1000000.0 / wsuf) AS lam
             FROM seg
             WHERE (12000.0 - cumt_prev) * 1000000.0 / wsuf < kappa
               AND (12000.0 - cumt_prev) * 1000000.0 / wsuf >= kprev),
    rated AS (SELECT tot.source, tot.t, tot.w,
                     CASE WHEN tot.w > 0 AND tot.t > 0 THEN
                       CASE WHEN lamr.lam IS NULL THEN 1.0
                            ELSE least(1.0, round(lamr.lam * tot.w
                                       / 1000000.0 / tot.t, 6)) END
                     ELSE 0.0 END AS rate
              FROM tot, lamr)
    SELECT source, t AS tokens_total,
           round(w / 1000000.0, 6) AS weight, rate,
           CAST(round(rate * t) AS BIGINT) AS planned_tokens,
           rate = 1.0 AS saturated
    FROM rated
    """


@query("mixture_plan_documents", oracle=_mixture_oracle())
def mixture_plan_documents(spark, sf_dir) -> DataFrame:
    """Water-filling token-budget mixture plan over the 20 document
    sources (sample.mixture_waterfill_plan): src0/src1 are weighted 30%
    each but can only supply ~1.4k tokens, so at the 12k-token budget
    they SATURATE at rate 1 and their unmet share spills into the 18
    remaining sources — the correction naive proportional allocation
    misses (it would silently under-deliver the budget).  Integer ppm
    weights + exact long token totals make the segment search (bounded
    per-source frame) integer arithmetic; the oracle replays the
    identical windows and every per-source rate/planned-token row
    value-matches."""
    from ..operators.sample import mixture_waterfill_plan

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")),
    )
    return mixture_waterfill_plan(
        docs, "source", "toks", _mixture_weights_ppm(), budget_tokens=12_000
    )


@query(
    "neyman_allocation_events",
    oracle="""
    WITH q AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS s1,
                 CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) AS s2
          FROM q GROUP BY 1),
    sd AS (SELECT g, n,
                  CASE WHEN n >= 2 THEN
                    sqrt(greatest((s2 / 1e12
                          - (s1 / 1000000.0) * (s1 / 1000000.0)
                            / CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1.0), 0.0))
                  ELSE 0.0 END AS std
           FROM m),
    w AS (SELECT g, n, std, CAST(n AS DOUBLE) * std AS wgt FROM sd),
    t AS (SELECT sum(wgt) AS tw FROM w),
    sh AS (SELECT g, n, std,
                  CASE WHEN tw > 0 THEN wgt / tw ELSE 0.0 END AS share
           FROM w, t),
    fl AS (SELECT *,
                  CAST(floor(share * 1000.0 + 1e-9) AS BIGINT) AS base,
                  share * 1000.0 - CAST(CAST(floor(share * 1000.0 + 1e-9)
                        AS BIGINT) AS DOUBLE) AS frac
           FROM sh),
    sp AS (SELECT sum(base) AS spent FROM fl),
    rk AS (SELECT fl.*, row_number() OVER (ORDER BY frac DESC, g ASC) AS rk
           FROM fl)
    SELECT g AS event_type, n, round(std, 6) AS std,
           round(share, 6) AS weight,
           CAST(base + CASE WHEN rk <= 1000 - spent THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rk, sp
    """,
)
def neyman_allocation_events(spark, sf_dir) -> DataFrame:
    """Variance-optimal Neyman allocation of a 1,000-row sampling budget
    across event types (stats.neyman_allocation) — sample ∝ N_h·s_h,
    the allocation that minimizes the stratified-mean variance where
    quota_sample's proportional split is only optimal for equal-variance
    strata.  Exact quantized moments; integer allocations by the
    LARGEST-REMAINDER method with the stratum name as deterministic
    tie-break, summing EXACTLY to the budget (pytest-pinned across
    budgets 10/97/1234).  All 5 rows value-checked."""
    from ..operators.stats import neyman_allocation

    ev = load_table(spark, sf_dir, "events")
    return neyman_allocation(ev, "event_type", "value", 1000)
