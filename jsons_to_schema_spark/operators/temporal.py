"""Temporal join operators: as-of join and interval-overlap join.

Two operators Spark's join catalogue lacks natively, both re-expressed as
compositions of existing DataFrame ops so Catalyst keeps optimizing them
(SURVEY §2.3 "custom operators" rule: composition first, UDF never needed
here):

* ``asof_join`` — for each left row, the most recent right row at or before
  its timestamp (per join key).  The naive formulation is an inequality
  join (quadratic per key); the scale-correct shape is the UNION + keyed
  window scan: tag both sides, union them, and carry the last-seen right
  payload forward with ``last(..., ignorenulls=True)`` over a window
  partitioned by the (high-cardinality) join key.  ONE shuffle on the key,
  memory bounded per key, no range explosion — the same distribution
  strategy Flink's temporal join and pandas' merge_asof use, expressed
  declaratively so whole-stage codegen keeps the scan JVM-side.

* ``interval_overlap_join`` — all pairs of intervals that overlap.  The
  naive formulation is a cross join with a range predicate (Spark would
  pick BroadcastNestedLoopJoin — quadratic); the scale-correct shape is
  the bucketed range join: explode each interval into the fixed-width
  buckets it covers, equi-join on the bucket id, and keep each true
  overlap exactly ONCE by accepting it only in the bucket that contains
  the overlap's start (``bucket == floor(max(starts)/width)``) — the
  classic dedup-free spatial-join trick, so no distinct pass is needed.
  Shuffle is bounded by (rows × buckets-per-interval); the caller sizes
  ``bucket_width`` against typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: "list[str]",
    left_ts: str,
    right_ts: str,
    value_cols: "list[str]",
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: attach to each left row the right-side ``value_cols``
    from the most recent right row with ``right_ts <= left_ts`` (direction
    ``"backward"``, equality included — DuckDB/pandas semantics) or the
    earliest with ``right_ts >= left_ts`` (``"forward"``), matched within
    the same ``keys``.

    Returns every left row (left outer semantics) with all its original
    columns plus one ``<col><suffix>`` column per value col and
    ``<right_ts><suffix>`` carrying the matched right timestamp (NULL when
    no right row qualifies).  Apply a tolerance by filtering/nulling on
    ``left_ts - <right_ts><suffix>`` afterwards — the matched timestamp is
    exactly what a tolerance needs, so it is returned rather than baked in.

    Precondition: ``right`` is unique per (keys, right_ts); with duplicates
    the carried row among ties is unspecified (pre-aggregate the right side
    if its grain is finer).

    Scale: both sides are scanned once, unioned, and shuffled ONCE on
    ``keys``; the per-key window is a linear scan in timestamp order with
    O(1) carried state (``last`` with ignorenulls), so executor memory is
    bounded by the largest single key's row count — the same bound any
    keyed window already accepts, with no inequality-join blowup.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be 'backward' or 'forward'")
    if not keys:
        raise ValueError("asof_join: keys must be non-empty (global as-of is a "
                         "single-partition sort — slice first)")
    for c in value_cols:
        if c in (right_ts,):
            raise ValueError("asof_join: value_cols must not repeat right_ts")

    out_vals = [f"{c}{suffix}" for c in value_cols]
    matched_ts = f"{right_ts}{suffix}"
    left_payload = [c for c in left.columns]
    collide = set(out_vals + [matched_ts]) & set(left_payload)
    if collide:
        raise ValueError(f"asof_join: suffixed output collides with left columns: "
                         f"{sorted(collide)}")

    # Align both sides to one schema: left rows carry NULL right-payload,
    # right rows carry NULL left-payload.  `_side` orders right (0) before
    # left (1) at EQUAL timestamps so the boundary row is visible to the
    # left row that shares its timestamp (the >= / <= in the contract).
    l2 = left.select(
        *[F.col(c) for c in left_payload],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(o)
          for c, o in zip(value_cols, out_vals)],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(matched_ts),
    )
    r2 = right.select(
        *[F.col(k) if k in right.columns else F.lit(None).alias(k) for k in keys],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left_payload if c not in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
        F.col(right_ts).alias(matched_ts),
    ).select(*l2.columns)  # positional alignment by name

    # A right row with NULL right_ts can satisfy neither <= nor >= — drop
    # it BEFORE the union, or (sorting NULLS FIRST/LAST) its payload would
    # leak into left rows that match nothing (review finding).
    u = l2.unionByName(r2.filter(F.col("_ts").isNotNull()))
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    # Carry the matched right row as ONE struct, not per-column
    # last(ignorenulls) calls: independent per-column carries would skip a
    # matched row's genuinely-NULL value and return a STALE value from an
    # older right row — mixing columns from different right rows (review
    # finding).  The struct is non-null exactly on right rows, so one
    # ignorenulls carry picks the matched ROW atomically and its NULL
    # fields stay NULL.
    pay = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(matched_ts).alias("_mts"),
            *[F.col(o).alias(o) for o in out_vals],
        ),
    )
    u = u.withColumn("_pay", pay)
    # A left row with NULL left_ts matches nothing in either direction
    # (comparisons with NULL are never true) — mask its carry rather than
    # trusting its engine-dependent sort position.
    matched = F.when(
        F.col("_ts").isNotNull(), F.last("_pay", ignorenulls=True).over(w)
    )
    carried = u.select(
        *left_payload,
        "_side",
        *[matched[o].alias(o) for o in out_vals],
        matched["_mts"].alias(matched_ts),
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: "list[str]",
    right_id: "list[str]",
    bounds: "tuple[str, str]" = ("i_start", "i_end"),
    bucket_width: int = 3600,
    antisymmetric: bool = False,
) -> DataFrame:
    """All pairs of overlapping intervals (closed-interval overlap:
    ``l.start <= r.end AND r.start <= l.end``) between two interval
    frames — the range join Spark lacks as a first-class operator.

    Both inputs carry integer interval bounds named by ``bounds``
    (e.g. epoch seconds or microseconds — any integer grid) plus the id
    columns; ``bucket_width`` is in the same unit.  Output: one row per
    overlapping pair — left ids (prefixed ``l_``), right ids (prefixed
    ``r_``), both bounds pairs, and ``overlap`` = ``min(ends) -
    max(starts)`` (0 for point-touching intervals).

    ``antisymmetric=True`` keeps only pairs with ``l_id < r_id``
    (lexicographic over the id struct) — the self-join form that reports
    each unordered pair once and drops self-pairs.

    Scale: each side explodes into the buckets its interval covers
    (``sequence(floor(start/w), floor(end/w))`` — rows × ceil(len/width)
    fan-out, sized by the caller), then ONE equi-join on the bucket id.
    A pair spanning several shared buckets is accepted only in the bucket
    containing ``max(starts)``, so every true overlap survives exactly
    once with NO distinct/dedup shuffle afterwards.  Skewed buckets fall
    out of AQE's skew-join handling since this is a plain shuffled
    equi-join.
    """
    s_col, e_col = bounds
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("interval_overlap_join: bucket_width must be positive")

    def _explode(df: DataFrame, ids: "list[str]", pfx: str) -> DataFrame:
        s = F.col(s_col).cast("long")
        e = F.col(e_col).cast("long")
        return df.select(
            *[F.col(c).alias(f"{pfx}{c}") for c in ids],
            s.alias(f"{pfx}start"),
            e.alias(f"{pfx}end"),
            F.explode(
                F.sequence(F.floor(s / w).cast("long"), F.floor(e / w).cast("long"))
            ).alias("_bucket"),
        )

    le = _explode(left, left_id, "l_")
    re_ = _explode(right, right_id, "r_")
    joined = le.join(re_, "_bucket")
    overlap = (F.col("l_start") <= F.col("r_end")) & (
        F.col("r_start") <= F.col("l_end")
    )
    # accept each pair only in the bucket holding the overlap's start
    once = F.col("_bucket") == F.floor(
        F.greatest("l_start", "r_start") / w
    ).cast("long")
    out = joined.filter(overlap & once)
    if antisymmetric:
        lid = F.struct(*[F.col(f"l_{c}") for c in left_id])
        rid = F.struct(*[F.col(f"r_{c}") for c in right_id])
        out = out.filter(lid < rid)
    return out.select(
        *[f"l_{c}" for c in left_id],
        *[f"r_{c}" for c in right_id],
        "l_start",
        "l_end",
        "r_start",
        "r_end",
        (F.least("l_end", "r_end") - F.greatest("l_start", "r_start")).alias(
            "overlap"
        ),
    )


def rolling_stats(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    window_seconds: int,
) -> DataFrame:
    """Trailing-window profile: for every row, the count / mean / min /
    max / sample-stddev of ``value_col`` over the SAME key's rows in the
    closed interval ``[ts − window_seconds, ts]``, plus the row's
    deviation from that trailing mean — the per-entity drift signal the
    corpus-level drift family (PSI, divergence) aggregates away.

    ONE Exchange on the keys + one sort: a range-frame window over exact
    integer epoch microseconds (``stats._epoch_us_col`` — timezone-proof
    for TIMESTAMP and TIMESTAMP_NTZ alike, never a float or a session-TZ
    cast, the freshness rule), so the frame boundary is
    engine-identical.  RANGE frames include event-time ties (peers) on
    both engines.  NULL values stay out of the moments (SQL aggregate
    semantics) but still anchor their own output row — n_window counts
    VALUE rows, so an all-NULL window reports 0 with NULL moments.
    round(6) on every float keeps the cross-engine hash summation-order-
    independent.  A NULL timestamp sorts to an engine-dependent end and
    its epoch is outside every numeric range frame, so such rows are
    MASKED (all six outputs NULL) rather than trusted — the asof_join
    stance — and they never enter another row's frame.

    Output: all input columns plus (n_window, mean_value round6,
    min_value, max_value, stddev_value round6, deviation round6)."""
    from pyspark.sql import Window

    if window_seconds <= 0:
        raise ValueError("rolling_stats: window_seconds must be positive")
    if not keys:
        raise ValueError("rolling_stats: keys must be non-empty")
    from .stats import _epoch_us_col

    w = (
        Window.partitionBy(*keys)
        .orderBy(_epoch_us_col(df, ts_col))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    ok = F.col(ts_col).isNotNull()
    v = F.col(value_col)
    mean = F.avg(v).over(w)
    return df.select(
        "*",
        F.when(ok, F.count(v).over(w)).alias("n_window"),
        F.when(ok, F.round(mean, 6)).alias("mean_value"),
        F.when(ok, F.min(v).over(w)).alias("min_value"),
        F.when(ok, F.max(v).over(w)).alias("max_value"),
        F.when(ok, F.round(F.stddev_samp(v).over(w), 6)).alias("stddev_value"),
        F.when(ok, F.round(v - mean, 6)).alias("deviation"),
    )
