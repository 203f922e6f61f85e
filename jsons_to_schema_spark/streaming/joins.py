"""Stream-stream interval join: event-pair attribution with watermarked
state cleanup — the last Structured Streaming join surface the engine
lacked (windowed aggs, foreachBatch merges, and applyInPandasWithState
stateful ops live in monitor.py / incremental.py / stateful.py).

The canonical use is attribution: pair every conversion with the
impressions that preceded it within a bounded delay (click→purchase,
crawl→recrawl, alert→ack).  Spark's stream-stream inner join keeps BOTH
sides in the state store; without a time bound that state grows forever,
so the operator REQUIRES watermarks on both inputs plus a range condition
on the pair of event times — exactly what lets the state manager evict an
impression once the watermark passes ``imp_time + max_delay`` (no
conversion can legally match it any more).  State is therefore bounded by
(arrival rate × max_delay), independent of stream lifetime — the 100-TB
property.

Scale shape: the join keys hash-partition both streams once; matching is
per-key state lookups, never a rescan.  Skewed keys behave like any
hash join on the key — salt upstream if one user is 10^6 rows/hour.

Batch equivalence: after an availableNow drain where no input row is late
past its watermark, the inner join's output EQUALS the batch inequality
join — which is the driver-query oracle (DuckDB computes the plain range
join over the same slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(
    impressions: DataFrame,
    conversions: DataFrame,
    key: str,
    imp_time: str,
    conv_time: str,
    max_delay: str = "30 minutes",
    imp_watermark: str = "1 hour",
    conv_watermark: str = "1 hour",
) -> DataFrame:
    """Pair each conversion with every impression of the same ``key``
    whose ``imp_time`` falls in ``[conv_time - max_delay, conv_time]``
    (equality included on both ends — a conversion in the same
    microsecond as its impression attributes).

    Both inputs must be streaming DataFrames; both get event-time
    watermarks here (Spark refuses the join without them, because
    unbounded join state would otherwise leak).  ``max_delay`` and the
    watermarks are SQL interval strings.

    Inner join only, by design: a streaming LEFT outer emits its
    unmatched rows when the watermark expires their state, so a finite
    availableNow drain silently withholds the tail — a correctness trap
    for batch-parity checks.  Callers wanting "unattributed impressions"
    should anti-join the drained output against the impression log in
    batch.

    Output: all impression columns, all conversion columns, plus
    ``delay_us`` (conv − imp in exact integer microseconds)."""
    if not impressions.isStreaming or not conversions.isStreaming:
        raise ValueError("attribution_join_stream: both inputs must be streaming")
    overlap = set(impressions.columns) & set(conversions.columns) - {key}
    if overlap:
        raise ValueError(
            f"attribution_join_stream: ambiguous columns {sorted(overlap)}; "
            "rename before joining"
        )
    i = impressions.withWatermark(imp_time, imp_watermark).alias("i")
    c = conversions.withWatermark(conv_time, conv_watermark).alias("c")
    cond = (
        (F.col(f"i.{key}") == F.col(f"c.{key}"))
        & (F.col(f"c.{conv_time}") >= F.col(f"i.{imp_time}"))
        & (
            F.col(f"c.{conv_time}")
            <= F.col(f"i.{imp_time}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = i.join(c, cond, "inner")
    out_cols = [F.col(f"i.{n}") for n in impressions.columns] + [
        F.col(f"c.{n}") for n in conversions.columns if n != key
    ]
    return joined.select(
        *out_cols,
        F.expr(
            f"timestampdiff(MICROSECOND, i.{imp_time}, c.{conv_time})"
        ).alias("delay_us"),
    )
