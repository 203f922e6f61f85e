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
