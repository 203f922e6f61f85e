"""Streaming constraint monitor — watermarked windowed violation rates.

The batch constraint suite (operators/validate.py) has a streaming twin: a
Structured Streaming query that scores each arriving document against the
row-local checks and emits per-event-time-window violation counts, tolerating
late data via a watermark.  State is bounded: the watermark lets Spark drop
window state once no later-arriving data can change it.

This is the standard Spark shape for "continuously validate the firehose":
``readStream → withWatermark → groupBy(window, check) → count`` — no custom
stateful operator needed because the aggregation is windowed counts; a custom
``applyInPandasWithState`` operator would only be warranted for per-key state
machines (e.g. cross-document sequence constraints), which the reference has
no analog of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.validate import ROW_CHECKS


def violation_counts_stream(
    spans_stream: DataFrame,
    event_time_col: str = "event_time",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed per-check violation counts over a streaming spans table.

    spans_stream must carry an event-time timestamp column; rows later than
    the watermark are dropped (counted by Spark's metrics, not silently
    wrong).  Output mode: append (finalized windows only) or update.
    """
    flagged = spans_stream.withWatermark(event_time_col, watermark)
    # NULL check results (e.g. spans IS NULL makes every check NULL) count
    # as violations — without the coalesce a malformed row lands in n_rows
    # but in no check's n_failed (r3 review; matches the rule DSL default)
    checks_arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.coalesce(make_expr(), F.lit(False)).alias("ok"),
            )
            for name, make_expr in ROW_CHECKS.items()
        ]
    )
    per_check = flagged.select(
        F.col(event_time_col),
        F.explode(checks_arr).alias("_c"),
    ).select(event_time_col, F.col("_c.check").alias("check"), F.col("_c.ok").alias("ok"))
    return (
        per_check.groupBy(
            F.window(event_time_col, window_duration).alias("w"), "check"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "check",
            "n_rows",
            "n_failed",
        )
    )


def rule_counts_stream(
    stream: DataFrame,
    rules: dict,
    event_time_col: str = "event_time",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming twin of the batch rule DSL (validate.rule_verdicts): per
    event-time window and USER-DEFINED rule, row and violation counts —
    the same watermark-bounded windowed-aggregation shape as
    violation_counts_stream, generalized from the built-in span checks to
    arbitrary Catalyst-expression rules.  NULL rule values count as
    violations (coalesce-to-False, matching the batch DSL's documented
    default)."""
    flagged = stream.withWatermark(event_time_col, watermark)
    checks_arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(pred, F.lit(False)).alias("ok"),
            )
            for name, pred in rules.items()
        ]
    )
    per_rule = flagged.select(
        F.col(event_time_col), F.explode(checks_arr).alias("_c")
    ).select(
        event_time_col, F.col("_c.rule").alias("rule"), F.col("_c.ok").alias("ok")
    )
    return (
        per_rule.groupBy(
            F.window(event_time_col, window_duration).alias("w"), "rule"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("ok")).cast("long")).alias("n_violations"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule",
            "n_rows",
            "n_violations",
        )
    )


def metrics_stream(
    spark,
    source_dir: str,
    repo_path: str,
    checkpoint_dir: str,
    dataset: str = "stream",
    columns: "list[str] | None" = None,
    anomalies_path: "str | None" = None,
    source_format: str = "parquet",
    source_schema: "str | None" = None,
    strategy: str = "online_normal",
    k: float = 3.0,
    min_history: int = 2,
    available_now: bool = True,
):
    """Continuous data-quality monitoring: every micro-batch stamps its
    metrics into a MetricsRepository as run_id = BATCH ID and is judged
    against all earlier batches — the streaming twin of
    metrics_repo.stamp_run, so a null-rate creep or size collapse in the
    firehose raises within one micro-batch of appearing.

    Replay safety comes from the same two mechanisms as the batch side:
    Spark's checkpoint gives stable batch ids across restarts, and both
    the metric store and the anomaly sink are parquet partitioned by
    run_id with DYNAMIC partition overwrite — an at-least-once replayed
    batch re-stamps the same numbers instead of duplicating history
    (the foreachBatch idempotence rule every sink in streaming/ follows).

    The per-batch work is one aggregate scan of the micro-batch plus a
    KB-scale history join; nothing grows with stream lifetime except the
    metric store itself (one row set per batch)."""
    from ..operators.metrics_repo import (
        MetricsRepository,
        compute_metrics,
        detect_metric_anomalies,
    )

    def _fn(bdf: DataFrame, batch_id: int) -> None:
        sess = bdf.sparkSession
        repo = MetricsRepository(sess, repo_path)
        repo.save(
            compute_metrics(bdf, columns, dataset=dataset, run_id=batch_id)
        )
        if anomalies_path is not None:
            verdicts = detect_metric_anomalies(
                repo.load(),
                current_run=int(batch_id),
                strategy=strategy,
                k=k,
                min_history=min_history,
            ).withColumn("run_id", F.lit(int(batch_id)).cast("bigint"))
            (
                verdicts.repartition(1, "run_id")
                .write.mode("overwrite")
                .partitionBy("run_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(anomalies_path)
            )

    reader = spark.readStream.format(source_format)
    if source_schema:
        reader = reader.schema(source_schema)
    writer = (
        reader.load(source_dir)
        .writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def psi_drift_stream(
    spark,
    source_dir: str,
    out_path: str,
    checkpoint_dir: str,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int,
    baseline_counts: "dict[int, int]",
    smoothing: float = 0.5,
    source_format: str = "parquet",
    source_schema: "str | None" = None,
    available_now: bool = True,
):
    """Continuous distribution-drift monitoring: every micro-batch's PSI
    report against a PINNED baseline histogram (profiled once from the
    accepted corpus, shipped as bucket→count literals — the baseline data
    is never re-scanned).  The per-batch work is one bounded histogram
    aggregate of the micro-batch; per-batch rows land partitioned by
    run_id = batch id with dynamic partition overwrite, so an
    at-least-once replayed batch re-stamps identical rows instead of
    duplicating them (the foreachBatch idempotence rule every sink in
    streaming/ follows).  Read the sink and alert on Σ psi_term per run
    (the conventional 0.1 / 0.25 PSI bands)."""
    from ..operators.drift import psi_from_baseline_counts

    def _fn(bdf: DataFrame, batch_id: int) -> None:
        report = psi_from_baseline_counts(
            bdf, column, lo, hi, n_buckets, baseline_counts, smoothing
        ).withColumn("run_id", F.lit(int(batch_id)).cast("bigint"))
        (
            report.repartition(1, "run_id")
            .write.mode("overwrite")
            .partitionBy("run_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_path)
        )

    reader = spark.readStream.format(source_format)
    if source_schema:
        reader = reader.schema(source_schema)
    writer = (
        reader.load(source_dir)
        .writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_stream(
    stream: DataFrame,
    key_col: str,
    event_time_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's NATIVE
    ``session_window`` aggregation — the streaming twin of the batch
    lag+cumsum sessionizer, with the window-merge logic (two sessions
    fusing when a bridging event arrives, across micro-batches) done by
    the engine's session state store rather than reimplemented.

    Append mode emits a session only once the watermark passes its end
    (last event + gap), so a finite drain holds back every session still
    open at end of input; the driver query closes them with a SENTINEL
    flush row far in the future (filtered back out) — the documented
    finite-drain pattern, same trap family as the stream-stream outer
    join.  Output: (key, session_start_us, session_end_us = last event
    + gap, n_events), epoch microseconds."""
    w = F.session_window(F.col(event_time_col), gap).alias("_w")
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.col(key_col), w)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.unix_micros(F.col("_w.start")).alias("session_start_us"),
            F.unix_micros(F.col("_w.end")).alias("session_end_us"),
            "n_events",
        )
    )
