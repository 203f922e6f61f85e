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
    _SPANS_STRUCT_SCHEMA,
    _spans_corpus,
    _stream_tmp,
)


# ===========================================================================
# Streaming under the driver contract (r3, VERDICT item 1): each streaming
# operator is driven to a DETERMINISTIC batch result via
# trigger(availableNow=True) over the deterministic corpus + a memory /
# foreachBatch sink, so the driver's DuckDB oracle checks it like any batch
# query.  Results are written batching-AGNOSTIC (lifetime maxes, complete-
# mode windows, snapshot files) so micro-batch boundaries can never change
# the checked values.
# ===========================================================================

_SPANS_DDL = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _spans_stream(spark, corpus):
    return (
        spark.readStream.format("parquet")
        .schema(_SPANS_DDL)
        .load(str(corpus / "documents_spans"))
    )


@query(
    "stream_incremental_schema",
    oracle=f"""
    SELECT '{_SPANS_STRUCT_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM read_parquet('__SPANS_GLOB__')
    """,
)
def stream_incremental_schema(spark, sf_dir) -> DataFrame:
    """Streaming incremental schema unification (EP2's streaming face,
    streaming/incremental.py): readStream over the corpus → foreachBatch
    fold+unify → atomic snapshot file, drained with availableNow.  The
    snapshot after the drain must equal the batch-engine schema REGARDLESS
    of micro-batch boundaries (unify associativity), which is exactly what
    the constant-schema + real-count oracle checks."""
    from ..schema_algebra import canonical_json
    from ..streaming.incremental import SchemaSnapshot, incremental_schema_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_inc_")
    q = incremental_schema_stream(
        spark,
        str(corpus / "documents_spans"),
        tmp / "snapshot.json",
        str(tmp / "ckpt"),
        source_schema=_SPANS_DDL,
    )
    q.awaitTermination()
    schema, n_docs, _n_batches, _last = SchemaSnapshot(tmp / "snapshot.json").read()
    return spark.createDataFrame(
        [(canonical_json(schema), n_docs)], "unified_schema string, n_docs long"
    )


@query(
    "stream_violation_window_counts",
    oracle="""
    WITH t AS (SELECT CAST(substr(doc_id, 5) AS BIGINT) % 60 AS m,
                      spans, list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__')),
         v AS (SELECT 1767225600 + m * 60 AS window_start,
                      CASE WHEN NOT (offs = list_sort(offs)
                                     AND len(list_distinct(offs)) = len(offs))
                           THEN 1 ELSE 0 END AS f_mono,
                      CASE WHEN len(list_filter(spans,
                               s -> s.kind = 'text' AND s.text IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f_text,
                      CASE WHEN len(list_filter(spans,
                               s -> s.kind <> 'text' AND s.media_ref IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f_media
               FROM t)
    SELECT window_start, window_start + 60 AS window_end,
           'monotonic_offsets' AS "check",
           count(*) AS n_rows, CAST(sum(f_mono) AS BIGINT) AS n_failed
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'text_present',
           count(*), CAST(sum(f_text) AS BIGINT)
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'media_ref_present',
           count(*), CAST(sum(f_media) AS BIGINT)
    FROM v GROUP BY window_start
    """,
)
def stream_violation_window_counts(spark, sf_dir) -> DataFrame:
    """Watermarked windowed violation monitor (streaming/monitor.py) driven
    to a batch answer: a deterministic event-time is derived from the doc
    index (minute m = doc-index mod 60 after a fixed epoch), the stream is
    drained with availableNow into a COMPLETE-mode memory sink (complete =
    every window re-emitted, so append-mode watermark finalization can never
    hide the tail windows), and window bounds are output as epoch seconds
    (timestamps are excluded from oracles per the hygiene notes)."""
    import uuid

    from ..streaming.monitor import violation_counts_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_vwc_")
    stream = _spans_stream(spark, corpus).withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1767225600)
            + (F.substring("doc_id", 5, 12).cast("long") % 60) * 60
        ),
    )
    counts = violation_counts_stream(
        stream, window_duration="1 minute", watermark="2 minutes"
    )
    name = f"svwc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start"),
        F.col("window_end").cast("long").alias("window_end"),
        "check",
        "n_rows",
        "n_failed",
    )


@query(
    "stream_duplicate_doc_ids",
    oracle="""
    SELECT doc_id, count(*) AS cnt
    FROM read_parquet('__SPANS_GLOB__')
    GROUP BY doc_id HAVING count(*) > 1
    """,
)
def stream_duplicate_doc_ids(spark, sf_dir) -> DataFrame:
    """Cross-batch stateful uniqueness (streaming/stateful.py,
    applyInPandasWithState): drained with availableNow into an update-mode
    memory sink.  A doc_id re-emits each time its lifetime count grows, so
    the batching-agnostic reduction max(cnt) per doc_id equals the batch
    groupBy count — which is exactly the oracle."""
    import uuid

    from ..streaming.stateful import duplicate_doc_ids_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_dup_")
    dups = duplicate_doc_ids_stream(_spans_stream(spark, corpus))
    name = f"sdup_{uuid.uuid4().hex[:8]}"
    q = (
        dups.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("doc_id").agg(F.max("cnt").alias("cnt"))


@query(
    "stream_rule_window_counts",
    oracle="""
    WITH t AS (SELECT CAST(substr(doc_id, 5) AS BIGINT) % 60 AS m,
                      doc_id, spans
               FROM read_parquet('__SPANS_GLOB__')),
         v AS (SELECT 1767225600 + m * 60 AS window_start,
                      CASE WHEN NOT coalesce(len(spans) > 0, false)
                           THEN 1 ELSE 0 END AS f_has,
                      CASE WHEN NOT coalesce(
                               regexp_matches(doc_id, '^(doc|hot)-[0-9]{12}$'),
                               false)
                           THEN 1 ELSE 0 END AS f_id,
                      CASE WHEN NOT coalesce(
                               len(list_filter(spans, s -> s.offset < 0)) = 0,
                               false)
                           THEN 1 ELSE 0 END AS f_off
               FROM t)
    SELECT window_start, window_start + 60 AS window_end,
           'has_spans' AS rule, count(*) AS n_rows,
           CAST(sum(f_has) AS BIGINT) AS n_violations
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'id_wellformed',
           count(*), CAST(sum(f_id) AS BIGINT)
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'offsets_nonneg',
           count(*), CAST(sum(f_off) AS BIGINT)
    FROM v GROUP BY window_start
    """,
)
def stream_rule_window_counts(spark, sf_dir) -> DataFrame:
    """Streaming twin of the rule DSL (streaming/monitor.py::
    rule_counts_stream): three USER-DEFINED rules — an array-size check, a
    regex id-format check, and a forall-over-elements check — scored per
    event-time window; same derived-event-time / availableNow /
    complete-mode-memory-sink harness as stream_violation_window_counts."""
    import uuid

    from ..streaming.monitor import rule_counts_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_rwc_")
    stream = _spans_stream(spark, corpus).withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1767225600)
            + (F.substring("doc_id", 5, 12).cast("long") % 60) * 60
        ),
    )
    rules = {
        "has_spans": F.size("spans") > 0,
        "id_wellformed": F.col("doc_id").rlike(r"^(doc|hot)-[0-9]{12}$"),
        "offsets_nonneg": F.forall("spans", lambda s: s["offset"] >= 0),
    }
    counts = rule_counts_stream(
        stream, rules, window_duration="1 minute", watermark="2 minutes"
    )
    name = f"srwc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start"),
        F.col("window_end").cast("long").alias("window_end"),
        "rule",
        "n_rows",
        "n_violations",
    )


@query(
    "stream_metric_anomalies",
    oracle="""
    WITH base AS (
      SELECT event_id % 3 AS run_id,
             CASE WHEN event_id % 6 = 2 THEN NULL ELSE value END AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events_stream' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'maximum', maxv FROM wide
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history
      FROM m WHERE run_id < 2 GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 2
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
def stream_metric_anomalies(spark, sf_dir) -> DataFrame:
    """Continuous data-quality monitoring (streaming/monitor.py
    metrics_stream): three deterministic micro-batches of events
    (event_id % 3, drained one availableNow pass each so Spark's
    checkpoint assigns batch ids 0/1/2), each batch stamped into a
    MetricsRepository as its batch id and judged against earlier batches.
    Batch 2 carries a planted null-rate regression (event_id % 6 == 2 —
    half its rows), so the streamed completeness verdict FIRES while
    stable metrics pass; the oracle recomputes the whole batch history
    relationally."""
    from ..streaming.monitor import metrics_stream

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 6 == 2, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    tmp = _stream_tmp("stream_metrics_")
    src = str(tmp / "src")
    for b in range(3):
        events.filter(F.col("event_id") % 3 == b).write.mode("append").parquet(
            src
        )
        q = metrics_stream(
            spark,
            src,
            str(tmp / "repo"),
            str(tmp / "ckpt"),
            dataset="events_stream",
            columns=["value"],
            anomalies_path=str(tmp / "anoms"),
            source_schema="event_id long, value double",
        )
        q.awaitTermination()
    return spark.read.parquet(str(tmp / "anoms")).filter("run_id = 2").select(
        "dataset",
        "instance",
        "metric",
        "value",
        "hist_mean",
        "hist_stddev",
        "hist_last",
        "n_history",
        "is_anomaly",
    )


@query(
    "stream_psi_drift_events",
    oracle="""
    WITH bb AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 3 = 0 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    runs AS (
      SELECT 0 AS run_id,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket
      FROM events
      WHERE event_id % 3 = 1 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      UNION ALL
      SELECT 1,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9)
      FROM events
      WHERE event_id % 3 = 2 AND value > 250.0 AND value <= 500.0
    ),
    cc AS (SELECT run_id, bucket, count(*) AS n FROM runs GROUP BY 1, 2),
    sp AS (
      SELECT r.run_id, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket
      FROM (SELECT DISTINCT run_id FROM runs) r
    ),
    j AS (
      SELECT sp.run_id, sp.bucket,
             CAST(coalesce(bb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN bb USING (bucket)
              LEFT JOIN cc ON sp.run_id = cc.run_id AND sp.bucket = cc.bucket
    ),
    t AS (
      SELECT run_id, CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j.run_id, j.bucket, j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING (run_id)
    """,
)
def stream_psi_drift_events(spark, sf_dir) -> DataFrame:
    """Continuous drift monitoring (streaming/monitor.psi_drift_stream):
    the baseline histogram is profiled ONCE from the event_id%3==0 slice
    and pinned as bucket→count literals; two deterministic micro-batches
    then stream through — batch 0 (event_id%3==1) carries the same
    distribution, batch 1 (event_id%3==2, values clamped to > 250) is a
    planted support collapse, so the streamed PSI verdict FIRES on batch
    1 while batch 0 stays quiet.  Replay-safe per-batch stamping (dynamic
    run_id partition overwrite); the oracle recomputes both batches'
    reports relationally."""
    from jsons_to_schema_spark.operators import stats as _stats
    from ..streaming.monitor import psi_drift_stream

    events = load_table(spark, sf_dir, "events")
    baseline = {
        r["bucket"]: r["n_rows"]
        for r in _stats.column_histogram(
            events.filter(F.col("event_id") % 3 == 0), "value", 0.0, 500.0, 10
        ).collect()
    }
    tmp = _stream_tmp("stream_psi_")
    src = str(tmp / "src")
    batches = [
        events.filter(F.col("event_id") % 3 == 1),
        events.filter((F.col("event_id") % 3 == 2) & (F.col("value") > 250.0)),
    ]
    for b in batches:
        b.select("event_id", "value").write.mode("append").parquet(src)
        q = psi_drift_stream(
            spark,
            src,
            str(tmp / "out"),
            str(tmp / "ckpt"),
            "value",
            0.0,
            500.0,
            10,
            baseline,
            source_schema="event_id long, value double",
        )
        q.awaitTermination()
    return spark.read.parquet(str(tmp / "out")).select(
        "run_id", "bucket", "base_n", "cur_n", "psi_term"
    )


@query(
    "stream_new_category_alerts",
    oracle="""
    SELECT category, count(*) AS n_rows FROM (
      SELECT CASE WHEN event_id % 101 = 0 THEN 'beta_signup'
                  WHEN event_id % 103 = 1 THEN 'promo_click'
                  ELSE event_type END AS category
      FROM events
    )
    WHERE category NOT IN ('click', 'view', 'purchase', 'error', 'signup')
    GROUP BY 1
    """,
)
def stream_new_category_alerts(spark, sf_dir) -> DataFrame:
    """Streaming domain monitor (streaming/stateful.py::
    new_category_alerts_stream): two planted novel categories
    ('beta_signup' on event_id%101==0, 'promo_click' on %103==1 — CASE
    order matters and matches the oracle) trickle across TWO separate
    stream runs sharing one checkpoint (the second run resumes the first
    run's state store, proving cross-batch state survival); lifetime
    counts re-emit on growth, so max(n_rows) per category equals the
    batch GROUP BY over the novel slice."""
    from ..streaming.stateful import new_category_alerts_stream

    baseline = {"click", "view", "purchase", "error", "signup"}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 101 == 0, F.lit("beta_signup"))
        .when(F.col("event_id") % 103 == 1, F.lit("promo_click"))
        .otherwise(F.col("event_type"))
        .alias("category"),
    )
    tmp = _stream_tmp("stream_newcat_")
    src = str(tmp / "src")
    for half in (0, 1):
        ev.filter(F.col("event_id") % 2 == half).write.mode("append").parquet(
            src
        )
        stream = spark.readStream.schema(
            "event_id long, category string"
        ).parquet(src)
        alerts = new_category_alerts_stream(stream, "category", baseline)
        q = (
            alerts.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp / "out"))
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(str(tmp / "out"))
        .groupBy("category")
        .agg(F.max("n_rows").alias("n_rows"))
    )


@query(
    "stream_attribution_join_events",
    oracle="""
    SELECT i.event_id AS imp_id, c.event_id AS conv_id, i.user_id,
           date_diff('microsecond', i.ts, c.ts) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'view') i
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
      ON i.user_id = c.user_id AND c.ts >= i.ts
     AND c.ts <= i.ts + INTERVAL 4 HOUR
    """,
)
def stream_attribution_join_events(spark, sf_dir) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py::
    attribution_join_stream): every purchase pairs with the same user's
    views from the preceding 4 hours, with watermarked join state on
    BOTH sides.  Drained with availableNow into a memory sink; since no
    row is late past its watermark in the drain, the streaming inner
    join's output must EQUAL the batch inequality join — which is
    exactly what the oracle computes.  Cross-micro-batch state survival
    is pinned separately (tests/test_streaming.py, maxFilesPerTrigger
    harness)."""
    import uuid

    from ..streaming.joins import attribution_join_stream

    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    def _stream():
        # the file stream source requires a DIRECTORY path — glob-filter
        # the one events file out of the shared sf_dir
        return (
            spark.readStream.format("parquet")
            .schema(ddl)
            .option("pathGlobFilter", "events.parquet")
            .option("recursiveFileLookup", "false")
            .load(sf_dir)
        )

    imp = _stream().filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("imp_id"),
        "user_id",
        F.col("ts").alias("imp_ts"),
    )
    conv = _stream().filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    pairs = attribution_join_stream(
        imp, conv, "user_id", "imp_ts", "conv_ts", max_delay="4 hours"
    )
    tmp = _stream_tmp("stream_attr_")
    name = f"sattr_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("imp_id", "conv_id", "user_id", "delay_us")


@query(
    "stream_session_windows_events",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, min(us) AS session_start_us,
           max(us) + 1800000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_windows_events(spark, sf_dir) -> DataFrame:
    """Streaming sessionization via the NATIVE session_window aggregation
    (streaming/monitor.py::session_stream): per-user 30-min-gap sessions
    over the events stream, closed for a finite drain by a sentinel flush
    row 10 days past the data (second micro-batch advances the watermark
    past every real session end; the sentinel user is filtered back out).
    The emitted sessions must EQUAL the batch lag+cumsum sessionizer —
    which is exactly what the oracle computes, including the
    end = last event + gap convention."""
    import uuid

    from ..streaming.monitor import session_stream

    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = load_table(spark, sf_dir, "events")
    tmp = _stream_tmp("stream_sess_")
    src = str(tmp / "src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    flush = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts")
    ).select(
        F.lit(-1).cast("long").alias("event_id"),
        "ts",
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("").alias("props"),
    )
    flush.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sessions = session_stream(stream, "user_id", "ts", gap="30 minutes")
    name = f"ssess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)
