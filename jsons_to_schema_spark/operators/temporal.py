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


_COHORT_UNITS = ("day", "week", "month")


def cohort_retention(
    df: DataFrame, key_col: str, ts_col: str, unit: str = "week"
) -> DataFrame:
    """Cohort retention matrix — the user-lifecycle analytic every events
    pipeline eventually needs: keys are cohorted by the ``unit`` bucket of
    their FIRST activity, and each (cohort, offset) cell counts how many
    of that cohort were active ``offset`` buckets later.  A corpus whose
    week-3 retention collapses after an ingestion change is drifting in a
    way no per-column profile shows.

    ONE data-sized shuffle: groupBy key folds each key's activity to
    (first bucket, collect_set of distinct buckets) — the set is bounded
    by the calendar (a year of weekly buckets is 52 entries), NOT by the
    key's row count, so hot keys cost map-side dedup only.  The explode
    and the (cohort, offset) count run over the per-key frame (keys-sized,
    already tiny), and cohort_size rides a window over the bounded matrix
    instead of a second corpus pass.

    Offsets are exact integers by construction: buckets are truncated to
    ``unit`` starts, so day/week offsets divide evenly and month offsets
    are whole months.  NULL timestamps carry no activity evidence and are
    excluded; a key with only NULL timestamps drops entirely.  Every key
    is active in its own first bucket, so offset 0 exists for every
    cohort and retention(0) = 1.0 — the sanity row.  Cohorts render as
    'yyyy-MM-dd' strings (the oracled-timestamp formatting rule).

    Output: (cohort, offset, n_active, cohort_size, retention round6),
    one row per observed (cohort, offset)."""
    if unit not in _COHORT_UNITS:
        raise ValueError(f"cohort_retention: unit must be one of {_COHORT_UNITS}")
    from .stats import _epoch_us_col  # tz-proof guard: reject non-timestamp

    _ = _epoch_us_col(df, ts_col)
    bucket = F.to_date(F.date_trunc(unit, F.col(ts_col)))
    per_key = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.min(bucket).alias("_cohort"),
            F.collect_set(bucket).alias("_active"),
        )
    )
    act = per_key.select(
        "_cohort", F.explode("_active").alias("_bucket")
    )
    if unit == "month":
        offset = F.months_between(F.col("_bucket"), F.col("_cohort")).cast("int")
    else:
        days = F.datediff(F.col("_bucket"), F.col("_cohort"))
        offset = (days / (7 if unit == "week" else 1)).cast("int")
    cells = act.select(
        F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
        offset.alias("offset"),
    ).groupBy("cohort", "offset").agg(F.count(F.lit(1)).alias("n_active"))
    w = Window.partitionBy("cohort")
    size = F.max(F.when(F.col("offset") == 0, F.col("n_active"))).over(w)
    return cells.select(
        "cohort",
        "offset",
        "n_active",
        size.alias("cohort_size"),
        F.round(F.col("n_active") / size, 6).alias("retention"),
    )


_RESAMPLE_AGGS = ("avg", "sum", "min", "max", "count")


def resample(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    every_seconds: int,
    agg: str = "avg",
    fill: str = "ffill",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Fixed-grid resampling with gap fill — snap each key's event stream
    to ``every_seconds`` buckets, aggregate the value per bucket, emit a
    COMPLETE per-key grid from the key's first to last bucket (gaps
    included), and optionally forward-fill gap values.  This is the
    regularization step before any per-entity time-series comparison
    (rolling_stats and the drift family assume aligned grids).

    Scale shape, three keyed exchanges — each justified: (1) the corpus
    collapses to (key, bucket) cells via one map-side-partial groupBy, so
    everything after is grid-sized, not row-sized; (2) the per-key spine
    generates buckets DISTRIBUTED via sequence()+explode over the per-key
    min/max (never a driver-side calendar); (3) the left join back and
    the forward-fill window both run keyed on the grid.  A key whose span
    would exceed ``max_buckets_per_key`` raises inside the executor
    (raise_error) instead of silently exploding the spine — the sequence
    guard.

    Bucket = epoch_us − pmod(epoch_us, every_us): exact integer floor at
    any epoch sign (never a double division — 1e15-scale microseconds
    lose low bits in float64).  NULL timestamps carry no evidence and are
    excluded.  ``filled`` marks grid rows with no observed cell; ffill
    carries the last OBSERVED aggregate forward (leading gaps stay NULL —
    there is nothing to carry), fill='none' leaves gaps NULL.

    Output: (*keys, bucket_us, value round6 for avg/sum, filled)."""
    if agg not in _RESAMPLE_AGGS:
        raise ValueError(f"resample: agg must be one of {_RESAMPLE_AGGS}")
    if fill not in ("ffill", "none"):
        raise ValueError("resample: fill must be 'ffill' or 'none'")
    if every_seconds <= 0:
        raise ValueError("resample: every_seconds must be positive")
    if not keys:
        raise ValueError("resample: keys must be non-empty")
    from .stats import _epoch_us_col

    every_us = every_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    bucket = (us - F.pmod(us, F.lit(every_us))).alias("bucket_us")
    agg_fn = {
        "avg": lambda c: F.round(F.avg(c), 6),
        "sum": lambda c: F.round(F.sum(c), 6),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "count": lambda c: F.count(c),
    }[agg]
    cells = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, bucket, F.col(value_col).alias("_v"))
        .groupBy(*keys, "bucket_us")
        .agg(agg_fn(F.col("_v")).alias("_val"))
        # cells feeds both the span bounds and the grid join; without this
        # the corpus is scanned twice (measured) — the frame is grid-sized
        .localCheckpoint(eager=False)
    )
    spans = cells.groupBy(*keys).agg(
        F.min("bucket_us").alias("_mn"), F.max("bucket_us").alias("_mx")
    )
    spine = spans.select(
        *keys,
        F.explode(
            F.expr(
                f"CASE WHEN (_mx - _mn) DIV {every_us} >= {max_buckets_per_key} "
                f"THEN raise_error('resample: key exceeds max_buckets_per_key') "
                f"ELSE sequence(_mn, _mx, CAST({every_us} AS BIGINT)) END"
            )
        ).alias("bucket_us"),
    )
    # presence must come from the join, not the value: an observed cell can
    # itself aggregate to NULL (all-NULL values under avg/min/max), and such
    # a cell is NOT a gap — it keeps its NULL and is never forward-filled.
    cells_flag = cells.withColumn("_present", F.lit(True))
    grid = spine.join(cells_flag, [*keys, "bucket_us"], "left")
    present = F.coalesce(F.col("_present"), F.lit(False))
    if fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket_us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        val = F.when(present, F.col("_val")).otherwise(
            F.last("_val", ignorenulls=True).over(w)
        )
    else:
        val = F.col("_val")
    return grid.select(
        *keys,
        "bucket_us",
        val.alias("value"),
        (~present).alias("filled"),
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: "list[str]",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Ordered funnel conversion — for a step sequence (e.g. view → click
    → purchase), count the keys that reach each step IN ORDER, each step
    STRICTLY after the previous one's first completion (same-instant
    events do not count as progression), optionally within a conversion
    window of ``within_seconds`` per hop.  The events analytic that
    sessionization and retention don't answer: where does the sequence
    leak.

    Shape: stage 1 is one filtered keys-sized groupBy (min event time per
    key); each later stage joins the (shrinking) survivor frame back to
    that step's filtered events on the key and takes the min qualifying
    time — k−1 keyed joins for k steps, every frame keys-sized, the
    corpus itself is scanned once per step WITH the step filter pushed
    down (never materialized whole).  Step counts are k tiny single-row
    aggregates unioned and windowed for the conversion ratios — no
    corpus-sized work after stage frames exist.

    Timestamps compare as integer epoch-µs (`_epoch_us_col`, tz-proof).
    NULL keys/timestamps carry no evidence and are excluded.

    Output: (step int 1-based, step_name, n_keys, conv_from_first round6,
    conv_from_prev round6), one row per step; an empty first stage yields
    n_keys=0 rows with NULL ratios."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be distinct")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("funnel: within_seconds must be positive")
    from .stats import _epoch_us_col

    us = _epoch_us_col(df, ts_col)
    ev = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), us.alias("_us"), F.col(step_col).alias("_s"))
    )
    # each stage frame feeds BOTH its count aggregate and the next stage's
    # join; the lazy checkpoint stops the per-step corpus scan from running
    # twice per stage (measured 2k−1 scans for k steps without it) — the
    # frames are keys-sized and shrinking
    cur = (
        ev.filter(F.col("_s") == steps[0])
        .groupBy("_k")
        .agg(F.min("_us").alias("_t"))
        .localCheckpoint(eager=False)
    )
    stage_counts = [
        cur.agg(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("step_name"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        cond = F.col("_us") > F.col("_t")
        if within_seconds is not None:
            cond = cond & (
                F.col("_us") <= F.col("_t") + F.lit(within_seconds * 1_000_000)
            )
        cur = (
            ev.filter(F.col("_s") == s)
            .join(cur.select("_k", "_t"), "_k")
            .filter(cond)
            .groupBy("_k")
            .agg(F.min("_us").alias("_t"))
            .localCheckpoint(eager=False)
        )
        stage_counts.append(
            cur.agg(
                F.lit(i).alias("step"),
                F.lit(s).alias("step_name"),
                F.count(F.lit(1)).alias("n_keys"),
            )
        )
    out = stage_counts[0]
    for sc in stage_counts[1:]:
        out = out.unionByName(sc)
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    first_n = F.first("n_keys").over(w)
    prev_n = F.lag("n_keys").over(Window.orderBy("step"))
    return out.select(
        "step",
        "step_name",
        "n_keys",
        F.when(first_n > 0, F.round(F.col("n_keys") / first_n, 6)).alias(
            "conv_from_first"
        ),
        F.when(prev_n > 0, F.round(F.col("n_keys") / prev_n, 6)).alias(
            "conv_from_prev"
        ),
    )


_ATTRIBUTION_MODELS = ("last", "first", "linear")


def attribution(
    df: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str,
    type_col: str,
    touch_types: "list[str]",
    conversion_type: str,
    lookback_seconds: int,
    model: str = "last",
) -> DataFrame:
    """Touch attribution — credit each conversion to the same key's touch
    events within ``lookback_seconds`` STRICTLY before it (a touch at the
    conversion instant is not a cause), under the three standard models:
    ``last`` / ``first`` (the extreme touch takes credit 1, ties broken
    by ``id_col`` — contract: unique ids) and ``linear`` (each of the n
    touches takes 1/n).  Complements ``funnel`` (ordered completion) and
    ``asof_join`` (single nearest record): attribution needs EVERY touch
    in the window.

    Scale shape: conversions and touches join on (key, time band) — the
    lookback window spans at most two lookback-sized bands, so each
    conversion probes exactly two buckets instead of the key's whole
    history (the banding trick the overlap join uses); per-conversion
    work is bounded by touches-per-window.  NULL keys/ids/timestamps
    carry no evidence and are excluded.

    Output: one row per touch type plus '(none)' for unattributed
    conversions — (touch_type, conversions, credit round6); conversions
    counts the conversions in which the type participates (for linear)
    or wins (for first/last)."""
    if model not in _ATTRIBUTION_MODELS:
        raise ValueError(f"attribution: model must be one of {_ATTRIBUTION_MODELS}")
    if lookback_seconds <= 0:
        raise ValueError("attribution: lookback_seconds must be positive")
    if not touch_types or conversion_type in touch_types:
        raise ValueError(
            "attribution: touch_types must be non-empty and exclude the "
            "conversion type"
        )
    from .stats import _epoch_us_col

    w_us = lookback_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    src = df.filter(
        F.col(key_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.col(type_col).alias("_t"),
    )
    conv = src.filter(F.col("_t") == conversion_type).select(
        "_k", F.col("_id").alias("_cid"), F.col("_us").alias("_cus")
    ).localCheckpoint(eager=False)  # feeds the pair join AND the unattributed count
    touch = src.filter(F.col("_t").isin(list(touch_types))).select(
        "_k",
        F.col("_id").alias("_tid"),
        F.col("_us").alias("_tus"),
        F.col("_t").alias("touch_type"),
        (F.col("_us") - F.pmod(F.col("_us"), F.lit(w_us))).alias("_tb"),
    )
    probes = conv.withColumn(
        "_tb",
        F.explode(
            F.array(
                (F.col("_cus") - F.pmod(F.col("_cus"), F.lit(w_us))),
                (F.col("_cus") - F.pmod(F.col("_cus"), F.lit(w_us)) - F.lit(w_us)),
            )
        ),
    )
    pairs = probes.join(touch, ["_k", "_tb"]).filter(
        (F.col("_tus") < F.col("_cus"))
        & (F.col("_tus") >= F.col("_cus") - F.lit(w_us))
    )
    if model == "linear":
        per_conv = Window.partitionBy("_k", "_cid")
        credited = pairs.select(
            "_k",
            "_cid",
            "touch_type",
            (F.lit(1.0) / F.count(F.lit(1)).over(per_conv)).alias("_credit"),
        )
        by_type = credited.groupBy("touch_type").agg(
            F.countDistinct("_cid", "_k").alias("conversions"),
            F.round(F.sum(F.round(F.col("_credit"), 6)), 6).alias("credit"),
        )
    else:
        direction = [F.col("_tus").desc(), F.col("_tid").desc()] if model == "last" \
            else [F.col("_tus").asc(), F.col("_tid").asc()]
        rn = F.row_number().over(
            Window.partitionBy("_k", "_cid").orderBy(*direction)
        )
        winners = pairs.withColumn("_rn", rn).filter(F.col("_rn") == 1)
        by_type = winners.groupBy("touch_type").agg(
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.count(F.lit(1)).cast("double"), 6).alias("credit"),
        )
    attributed = pairs.select("_k", "_cid").distinct()
    none_row = (
        conv.join(attributed, ["_k", "_cid"], "left_anti")
        .agg(F.count(F.lit(1)).alias("conversions"))
        .select(
            F.lit("(none)").alias("touch_type"),
            "conversions",
            F.lit(0.0).alias("credit"),
        )
    )
    return by_type.select("touch_type", "conversions", "credit").unionByName(
        none_row
    )


# ---------------------------------------------------------------------------
# Markov transition profile (round-4 wave 43)
# ---------------------------------------------------------------------------


def transition_profile(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered event
    sequences — the behavioral-sequence profile (what follows what, how
    often) that sessionize/funnel/attribution all implicitly assume and
    none of them reports:

    - sequences order by (order_col, state_col) WITHIN each key — the
      state tie-break makes equal-timestamp rows deterministic (the quota
      sampler's rule);
    - adjacent pairs (lag) → one (from_state, to_state) hash aggregate;
    - p = round(n / Σ_to n, 6) — row probability given the from-state;
    - keys with a single event contribute nothing; NULL states are real
      states only if present in the data (no imputation).

    Scale shape: ONE window shuffle keyed on key_col (per-key sequences —
    a mega-key serializes its own sequence through one task, same caveat
    as sorted-neighborhood: pre-bound per-key history if keys are
    heavy-tailed), then a transition-matrix-sized aggregate (states², not
    corpus).  Returns (from_state, to_state, n, p).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(state_col).asc()
    )
    pairs = (
        df.select(
            F.col(key_col),
            F.col(order_col),
            F.col(state_col).alias("_to"),
            F.lag(F.col(state_col)).over(w).alias("_from"),
        )
        .filter(F.col("_from").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("_from").alias("from_state"), F.col("_to").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


def anomalous_transitions(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    max_p: float = 0.01,
    min_from_total: int = 50,
) -> DataFrame:
    """Row-level complement of :func:`transition_profile`: every observed
    transition whose conditional probability sits below ``max_p`` — the
    "this user did something this corpus almost never does" audit.
    ``min_from_total`` suppresses noise from barely-observed from-states
    (a 1-observation state makes every transition p=1.0, never rare; a
    3-observation state makes everything 0.33 — rarity needs a measured
    base).  Returns (key, order, from_state, to_state, p) — the rows, not
    the matrix, so the verdict is actionable."""
    if not 0.0 < max_p < 1.0:
        raise ValueError(f"anomalous_transitions: max_p must be in (0,1), got {max_p}")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(state_col).asc()
    )
    pairs = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(order_col).alias("order_at"),
            F.col(state_col).alias("to_state"),
            F.lag(F.col(state_col)).over(w).alias("from_state"),
        )
        .filter(F.col("from_state").isNotNull())
    )
    prof = transition_profile(df, key_col, order_col, state_col)
    totals = prof.groupBy("from_state").agg(F.sum("n").alias("_ft"))
    rare = (
        prof.join(totals, "from_state")
        .filter((F.col("p") <= max_p) & (F.col("_ft") >= min_from_total))
        .select("from_state", "to_state", "p")
    )
    return pairs.join(F.broadcast(rare), ["from_state", "to_state"]).select(
        "key", "order_at", "from_state", "to_state", "p"
    )


# ---------------------------------------------------------------------------
# Survival analysis — Kaplan-Meier product-limit estimator (round-4 wave 37)
# ---------------------------------------------------------------------------

def survival_curve(
    df: DataFrame, duration_col: str, observed_col: str
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate — the churn/retention
    readout ``cohort_retention`` cannot give once subjects enter at
    different times and leave the observation window alive: censored
    subjects (``observed`` false) stay in the risk set up to their
    duration and then drop out WITHOUT counting as an event, which is
    exactly the correction naive "share still active after t days"
    queries get wrong.

    Input contract: ONE row per subject; ``duration_col`` numeric time
    from the subject's origin to its event or censoring; ``observed_col``
    boolean (true = the event happened at ``duration``, false = censored
    there).  Rows with a NULL duration or NULL observed flag carry no
    risk-set evidence and are excluded (the ``transition_profile``
    NULL-mask stance).

    Output: one row per distinct duration ``t`` with ``n_risk`` (subjects
    still at risk just before t), ``n_event``, ``n_censored``, the KM
    ``survival`` S(t) and the Greenwood standard error ``std_err``.

    Exactness discipline: S(t) = Π(1 − d_i/n_i) is computed in LOG space
    — per-time term round6(ln((n_i−d_i)/n_i)) summed by an ORDERED
    cumulative window, then round6(exp(·)) — so the doubles fold in the
    same order from identical inputs in both correctness engines (the
    bigram-LM / tfidf idf-rounding rule).  Greenwood terms
    d/(n·(n−d)) are round(·, 12), not 6: their magnitude is 1e-6..1e-3
    and a 6-digit grid would zero the sum; 12 keeps them exact on the
    shared grid while the final ``std_err`` lands on the usual round-6
    grid.  A time where EVERY at-risk subject dies (d == n) has factor 0:
    the log term is undefined there, so a cumulative died-out flag pins
    ``survival`` to exactly 0.0 from that time on (std_err NULL —
    Greenwood is undefined at S=0).

    Scale shape: the corpus-sized work is ONE map-side-partial grouped
    count on duration; everything after is windows over the cell table,
    bounded by DISTINCT durations (calendar-bounded in practice — the
    ``level_shift`` precedent for a global ordered window over a bounded
    frame)."""
    d, o = F.col(duration_col), F.col(observed_col)
    cells = (
        df.filter(d.isNotNull() & o.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.sum(F.when(o, 1).otherwise(0)).cast("long").alias("n_event"),
            F.sum(F.when(o, 0).otherwise(1)).cast("long").alias("n_censored"),
        )
    )
    w_all = Window.partitionBy(F.lit(1))
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    at = F.col("n_event") + F.col("n_censored")
    risk = cells.withColumn(
        "n_risk",
        (
            F.sum(at).over(w_all)
            - F.coalesce(F.sum(at).over(w_prior), F.lit(0))
        ).cast("long"),
    )
    nr, ne = F.col("n_risk"), F.col("n_event")
    alive = (nr - ne).cast("double")
    lg = risk.select(
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        F.when(ne < nr, F.round(F.log(alive / nr.cast("double")), 6)).alias("_lt"),
        F.when(ne >= nr, 1).otherwise(0).alias("_z"),
        F.when(
            ne < nr,
            F.round(ne.cast("double") / (nr.cast("double") * alive), 12),
        ).alias("_g"),
    )
    surv = F.when(F.sum("_z").over(w_cum) > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum("_lt").over(w_cum)), 6)
    )
    out = lg.select(
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        surv.alias("survival"),
        F.sum("_g").over(w_cum).alias("_sg"),
    )
    return out.select(
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        "survival",
        F.when(
            F.col("survival") > 0,
            F.round(F.col("survival") * F.sqrt(F.col("_sg")), 6),
        ).alias("std_err"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round-4 wave 37)
# ---------------------------------------------------------------------------

def rfm_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    k: int = 5,
    asof_us: "int | None" = None,
) -> DataFrame:
    """Recency / Frequency / Monetary segmentation — the behavioral
    profile master-data teams run right after entity resolution: per key,
    days since last activity, activity count, and exact monetary total,
    each scored into k quantile buckets and fused into an ``segment``
    label.  Scores are 1..k with k best: recency is REVERSED (most recent
    → k) so every score reads "higher is better", the classic RFM
    convention.

    Exactness: monetary folds as micro-unit longs (the ab_test scan
    quantization) and only becomes a round-6 double for scoring; recency
    is an exact integer day floor against ``asof_us`` (given, or the
    table's own max — a self-as-of report, the ``freshness`` stance);
    quantile edges are fitted ONCE on the per-key frame (one multi-array
    percentile aggregate), round-6, and ride into the plan as array
    literals (``stats.apply_bins`` — strictly-below count, boundary ties
    fall LOW in both engines).  NULL keys / NULL timestamps carry no
    evidence and are excluded; NULL amounts count activity but add 0
    monetary.

    Scale shape: ONE corpus-sized shuffle (the per-key aggregate); the
    per-key frame is pinned (lazy localCheckpoint — the double-scan sweep
    rule) because the edge fit and the scored output both read it; the
    edge row collects k-bounded floats to the driver exactly like every
    other persisted-model read (IVF centroids, quantile bins)."""
    from .stats import _epoch_us_col, apply_bins

    if k < 2:
        raise ValueError("rfm_report: need k >= 2 score buckets")
    key, amt = F.col(key_col), F.col(amount_col)
    us = _epoch_us_col(df, ts_col)
    per = (
        df.filter(key.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(
            F.max(us).alias("_last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.coalesce(F.round(amt * 1e6).cast("long"), F.lit(0))
            ).alias("_m_micro"),
        )
    )
    # pinned: the frame feeds the asof fold, the edge fit AND the scored
    # output — unpinned, the corpus aggregate would run three times
    per = per.localCheckpoint(eager=False)
    if asof_us is None:
        asof_row = per.agg(F.max("_last_us").alias("a")).first()
        asof_val = asof_row["a"] if asof_row is not None else None
        if asof_val is None:
            asof_us = 0  # empty input: curve below is empty anyway
        else:
            asof_us = int(asof_val)
    en = per.select(
        "key",
        F.floor((F.lit(int(asof_us)) - F.col("_last_us")) / F.lit(86400000000.0))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        F.round(F.col("_m_micro") / 1e6, 6).alias("monetary"),
    )
    probs = F.array(*[F.lit(i / k) for i in range(1, k)])
    edge_row = en.agg(
        F.percentile(F.col("recency_days").cast("double"), probs).alias("r"),
        F.percentile(F.col("frequency").cast("double"), probs).alias("f"),
        F.percentile(F.col("monetary"), probs).alias("m"),
    ).first()
    if edge_row is None or edge_row["r"] is None:
        return en.select(
            "key", "recency_days", "frequency", "monetary",
            F.lit(None).cast("long").alias("r_score"),
            F.lit(None).cast("long").alias("f_score"),
            F.lit(None).cast("long").alias("m_score"),
            F.lit(None).cast("string").alias("segment"),
        )

    def _edges(vals):
        out, last = [], None
        for v in vals:
            r = round(float(v), 6)
            if last is None or r > last:  # deduped: equal edges collapse
                out.append(r)
            last = r
        return out

    scored = apply_bins(en, "recency_days", _edges(edge_row["r"]), "_rb")
    scored = apply_bins(scored, "frequency", _edges(edge_row["f"]), "_fb")
    scored = apply_bins(scored, "monetary", _edges(edge_row["m"]), "_mb")
    r_s = (F.lit(k) - F.col("_rb")).cast("long")
    f_s = (F.col("_fb") + 1).cast("long")
    m_s = (F.col("_mb") + 1).cast("long")
    return scored.select(
        "key",
        "recency_days",
        "frequency",
        "monetary",
        r_s.alias("r_score"),
        f_s.alias("f_score"),
        m_s.alias("m_score"),
        F.concat_ws("-", r_s, f_s, m_s).alias("segment"),
    )


def disorder_profile(
    df: DataFrame,
    ts_col: str,
    order_col: str,
    block_size: int = 1 << 20,
    percentiles: "tuple[float, float, float]" = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Event-time disorder audit + watermark advisor: how out-of-order is
    a feed, measured EXACTLY, without a global sort.

    For every row, lateness = (max event time over all rows whose ingest
    position ``order_col`` is <= this row's) - this row's event time: the
    amount a streaming watermark would have had to lag to not drop it.
    The naive formulation is a running max over the GLOBAL ingest order —
    an ``Exchange SinglePartition`` window, the one shape this engine
    plan-asserts against.  The scale-correct re-expression is two-level:

    * rows bucket into contiguous ingest BLOCKS (``floor(order/block)`` —
      order-preserving, so block ids are monotone in ingest position);
      the within-block running max is a keyed window (one hash exchange,
      parallel across blocks);
    * block-level maxima are a BOUNDED table (n_rows / block_size rows;
      size ``block_size`` so this stays ~10^6 at the target corpus — the
      default 2^20 gives 10^6 blocks at 10^12 rows); the
      exclusive prefix max over it is a window on that bounded table
      only, broadcast-joined back;
    * exact global running max = greatest(within-block running max,
      previous-blocks prefix max) — provably, because blocks partition
      the ingest prefix.

    The block maxima fold from the SAME keyed window exchange (max of the
    running max per block), so the corpus is scanned ONCE (ReusedExchange
    — plan-asserted).  The RANGE window frame (not ROWS) makes ties in
    ``order_col`` deterministic in both engines; rows with NULL order or
    NULL timestamp are excluded from the running max (their window
    position is engine-dependent) and surface in ``n_null`` instead of
    vanishing.

    Returns ONE row: n_rows, n_null, n_late, late_fraction (round-6),
    max_late_us, p{50,95,99}_late_us over LATE rows only (exact
    percentile, round-6; NULL when nothing is late), and
    ``watermark_seconds`` = ceil(p99 lateness) — the delay that would
    retain 99% of late rows (0 when nothing is late, never NULL: a clean
    feed is an answer, not a missing value).
    """
    from .stats import _epoch_us_col

    us_raw = _epoch_us_col(df, ts_col)
    seq = F.col(order_col).cast("long")
    base = df.select(
        seq.alias("_seq"),
        F.when(seq.isNotNull(), us_raw).alias("_us"),
    )
    base = base.withColumn(
        "_blk", F.floor(F.col("_seq") / F.lit(int(block_size))).cast("long")
    )

    w_in = (
        Window.partitionBy("_blk")
        .orderBy("_seq")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win = base.withColumn("_run_in", F.max("_us").over(w_in))

    blk = win.groupBy("_blk").agg(F.max("_run_in").alias("_bmax"))
    w_blk = (
        Window.orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # bounded table: n/block_size rows — the single-partition window is
    # over the aggregate, never the corpus
    prefix = blk.select(
        "_blk", F.max("_bmax").over(w_blk).alias("_prev_max")
    )

    rows = win.join(F.broadcast(prefix), on="_blk", how="left")
    late = F.when(
        F.col("_us").isNotNull(),
        F.greatest(F.col("_run_in"), F.col("_prev_max")) - F.col("_us"),
    )
    rows = rows.select(late.alias("_late_us"))

    p50, p95, p99 = percentiles
    late_only = F.when(F.col("_late_us") > 0, F.col("_late_us"))
    pct = F.percentile(
        late_only, F.array(F.lit(p50), F.lit(p95), F.lit(p99))
    )
    agg = rows.agg(
        F.count("_late_us").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("_late_us")).alias("n_null"),
        F.count(late_only).alias("n_late"),
        F.max("_late_us").alias("max_late_us"),
        pct.alias("_pct"),
    )
    return agg.select(
        "n_rows",
        "n_null",
        "n_late",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_late").cast("double") / F.col("n_rows"), 6),
        ).alias("late_fraction"),
        "max_late_us",
        F.round(F.element_at("_pct", 1), 6).alias("p50_late_us"),
        F.round(F.element_at("_pct", 2), 6).alias("p95_late_us"),
        F.round(F.element_at("_pct", 3), 6).alias("p99_late_us"),
        F.coalesce(
            F.ceil(F.element_at("_pct", 3) / F.lit(1000000.0)), F.lit(0)
        ).cast("long").alias("watermark_seconds"),
    )


def autocorrelation(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    every_seconds: int,
    lags: "list[int]",
    agg: str = "avg",
) -> DataFrame:
    """Exact per-key autocorrelation (ACF) of the fixed-grid resampled
    series at the given bucket ``lags`` — the seasonality detector that
    tells a pipeline "this metric repeats on a 7-bucket cycle" and feeds
    lag choice for the seasonal anomaly monitor (metric_anomalies'
    seasonal mode assumes a period; ACF is how you FIND the period).

    Series = the same (key, bucket) cells temporal.resample aggregates
    (identical bucket arithmetic and round-6 value), gaps simply produce
    no pair at a given lag — no spine or fill is materialized.  ACF(lag)
    = Pearson correlation of (x_t, x_{t+lag}) over buckets where both
    endpoints are observed.

    Determinism contract (the ab_test_report convention): cell values are
    quantized to integer micro-units at the cell, so all five moment sums
    are EXACT decimal(38,0) aggregates — no float accumulation, no
    partition-order noise; the correlation then derives from identical
    operands in an identical expression order and is round-6
    reproducible across engines.

    Scale shape: one map-side-partial groupBy collapses the corpus to
    grid cells; the lag list explodes on the PROBE side only (|lags| ×
    grid, all bounded); the self-join and moment aggregate are keyed by
    (key, lag) — nothing global, nothing on the driver.  ACF is NULL
    when fewer than 2 pairs or either endpoint series is constant.

    Output: (*keys, lag, n_pairs, acf)."""
    if every_seconds <= 0:
        raise ValueError("autocorrelation: every_seconds must be positive")
    if not keys:
        raise ValueError("autocorrelation: keys must be non-empty")
    if not lags or any(l <= 0 for l in lags):
        raise ValueError("autocorrelation: lags must be positive")
    if agg not in _RESAMPLE_AGGS:
        raise ValueError(f"autocorrelation: agg must be one of {_RESAMPLE_AGGS}")
    from .stats import _epoch_us_col

    every_us = every_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    bucket = (us - F.pmod(us, F.lit(every_us))).alias("_b")
    agg_fn = {
        "avg": lambda c: F.round(F.avg(c), 6),
        "sum": lambda c: F.round(F.sum(c), 6),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "count": lambda c: F.count(c),
    }[agg]
    cells = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(*keys, bucket, F.col(value_col).alias("_v"))
        .groupBy(*keys, "_b")
        .agg(agg_fn(F.col("_v")).alias("_val"))
        .filter(F.col("_val").isNotNull())
        .select(
            *keys,
            "_b",
            F.round(F.col("_val") * F.lit(1000000.0)).cast("long").alias("_vm"),
        )
        # feeds both sides of the lag self-join; without this the corpus
        # aggregation runs twice (the resample lesson)
        .localCheckpoint(eager=False)
    )
    probe = cells.withColumn(
        "lag", F.explode(F.array(*[F.lit(int(l)) for l in lags]))
    ).withColumn("_bj", F.col("_b") + F.col("lag").cast("long") * F.lit(every_us))
    right = cells.select(
        *keys, F.col("_b").alias("_bj"), F.col("_vm").alias("_ym")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        probe.join(right, [*keys, "_bj"])
        .groupBy(*keys, "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(dec(F.col("_vm"))).alias("_sx"),
            F.sum(dec(F.col("_ym"))).alias("_sy"),
            F.sum(dec(F.col("_vm")) * F.col("_vm")).alias("_sxx"),
            F.sum(dec(F.col("_ym")) * F.col("_ym")).alias("_syy"),
            F.sum(dec(F.col("_vm")) * F.col("_ym")).alias("_sxy"),
        )
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    acf = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0.0) & (vy > 0.0),
        F.round((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 6),
    )
    return m.select(
        *keys, F.col("lag").cast("long").alias("lag"), "n_pairs", acf.alias("acf")
    )


def cross_correlation(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    x_col: str,
    y_col,
    every_seconds: int,
    lags: "list[int]",
    x_agg: str = "avg",
    y_agg: str = "avg",
) -> DataFrame:
    """Exact per-key lead–lag cross-correlation between two metrics of the
    same stream on the fixed bucket grid: xcorr(lag) = Pearson
    correlation of (x_t, y_{t+lag}) — positive lags ask "does x LEAD y by
    lag buckets", negative lags ask the reverse, lag 0 is the
    contemporaneous correlation.  The causal-direction probe ACF can't
    answer: "do error spikes precede volume drops, or follow them?"

    Same machinery and determinism contract as :func:`autocorrelation`
    (identical bucket arithmetic, round-6 cell aggregates quantized to
    integer micro-units, exact decimal(38,0) moment sums, identical
    expression order) with one widening: the cell pass aggregates BOTH
    metrics in one map-side-partial groupBy (``x_agg``/``y_agg`` from the
    resample vocabulary, so x can be the daily mean while y is the daily
    row count).  A cell NULL on one side only drops that side's pairs.

    ``lags`` may be any nonempty list of integers (any sign, 0 allowed).
    Output: (*keys, lag, n_pairs, xcorr) — NULL when fewer than 2 pairs
    or either paired series is constant.

    ``y_col`` may be a column name or a Column expression (e.g. an
    indicator)."""
    if every_seconds <= 0:
        raise ValueError("cross_correlation: every_seconds must be positive")
    if not keys:
        raise ValueError("cross_correlation: keys must be non-empty")
    if not lags:
        raise ValueError("cross_correlation: lags must be non-empty")
    for nm, ag in (("x_agg", x_agg), ("y_agg", y_agg)):
        if ag not in _RESAMPLE_AGGS:
            raise ValueError(
                f"cross_correlation: {nm} must be one of {_RESAMPLE_AGGS}"
            )
    from .stats import _epoch_us_col

    every_us = every_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    bucket = (us - F.pmod(us, F.lit(every_us))).alias("_b")

    def _fn(ag):
        return {
            "avg": lambda c: F.round(F.avg(c), 6),
            "sum": lambda c: F.round(F.sum(c), 6),
            "min": lambda c: F.min(c),
            "max": lambda c: F.max(c),
            "count": lambda c: F.count(c),
        }[ag]

    ycol = F.col(y_col) if isinstance(y_col, str) else y_col
    cells = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, bucket, F.col(x_col).alias("_x"), ycol.alias("_y"))
        .groupBy(*keys, "_b")
        .agg(
            _fn(x_agg)(F.col("_x")).alias("_xv"),
            _fn(y_agg)(F.col("_y")).alias("_yv"),
        )
        .select(
            *keys,
            "_b",
            F.round(F.col("_xv") * F.lit(1000000.0)).cast("long").alias("_xm"),
            F.round(F.col("_yv") * F.lit(1000000.0)).cast("long").alias("_ym"),
        )
        # feeds both sides of the lag join (the autocorrelation lesson)
        .localCheckpoint(eager=False)
    )
    probe = (
        cells.filter(F.col("_xm").isNotNull())
        .select(*keys, "_b", "_xm")  # drop _ym: the join supplies the y side
        .withColumn("lag", F.explode(F.array(*[F.lit(int(l)) for l in lags])))
        .withColumn(
            "_bj", F.col("_b") + F.col("lag").cast("long") * F.lit(every_us)
        )
    )
    right = cells.filter(F.col("_ym").isNotNull()).select(
        *keys, F.col("_b").alias("_bj"), "_ym"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        probe.join(right, [*keys, "_bj"])
        .groupBy(*keys, "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(dec(F.col("_xm"))).alias("_sx"),
            F.sum(dec(F.col("_ym"))).alias("_sy"),
            F.sum(dec(F.col("_xm")) * F.col("_xm")).alias("_sxx"),
            F.sum(dec(F.col("_ym")) * F.col("_ym")).alias("_syy"),
            F.sum(dec(F.col("_xm")) * F.col("_ym")).alias("_sxy"),
        )
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    xc = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0.0) & (vy > 0.0),
        F.round((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 6),
    )
    return m.select(
        *keys,
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        xc.alias("xcorr"),
    )


def seasonal_decompose(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    every_seconds: int,
    period: int,
) -> DataFrame:
    """Classical additive seasonal decomposition on the fixed bucket grid:
    value = trend + seasonal + residual, per key — the step AFTER the ACF
    has found the period: subtract the weekly shape from a daily metric
    and alert on the residual instead of re-deriving "Mondays are low"
    every week (the seasonal anomaly monitor's missing fit stage).

    Contract (every step exact-integer until a final round-6 division —
    the ACF/ab_test determinism discipline):

    - series = temporal.resample grid (avg cells, ffill) quantized to
      micro-units; leading unfilled gaps stay NULL;
    - trend = centered moving average over ``period`` buckets (period
      must be ODD so the window centers; the classical 2×period variant
      for even periods is out of contract), NULL wherever the window is
      incomplete (series edges / NULL cells) — never a partial average;
    - seasonal(p) for position p = bucket_index mod period is the mean
      detrended value at p minus the GLOBAL mean detrended value (both
      from exact integer sums over the bounded per-position table;
      weighted centering — Σ seasonal·count = 0 exactly — rather than the
      unweighted mean-of-means, which is not exactly representable);
    - residual = value − trend − seasonal on the micro-unit integers.

    Scale shape: the resample grid collapses the corpus; trend and
    position are keyed windows over the grid; the seasonal fit is one
    aggregate to a ≤ period·keys-row table re-joined keyed — nothing
    global, nothing on the driver.

    Output: (*keys, bucket_us, value, trend, seasonal, residual)."""
    if period < 3 or period % 2 == 0:
        raise ValueError(
            f"seasonal_decompose: period must be odd and >= 3, got {period}"
        )
    half = period // 2
    grid = resample(
        df, keys, ts_col, value_col, every_seconds, agg="avg", fill="ffill"
    ).select(
        *keys,
        "bucket_us",
        F.round(F.col("value") * F.lit(1000000.0)).cast("long").alias("_vm"),
    )
    wtr = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(-half, half)
    )
    wmin = Window.partitionBy(*keys)
    g = (
        grid.withColumn("_wsum", F.sum("_vm").over(wtr))
        .withColumn("_wcnt", F.count("_vm").over(wtr))
        .withColumn("_mn", F.min("bucket_us").over(wmin))
        .withColumn(
            "_idx",
            ((F.col("bucket_us") - F.col("_mn")) / F.lit(every_seconds * 1_000_000))
            .cast("long"),
        )
        .withColumn("_pos", F.pmod(F.col("_idx"), F.lit(period)).cast("long"))
        .withColumn(
            "_trend_m",
            F.when(
                (F.col("_wcnt") == period) & F.col("_vm").isNotNull(),
                F.round(
                    F.col("_wsum").cast("double") / F.lit(float(period))
                ).cast("long"),
            ),
        )
        .withColumn("_dm", F.col("_vm") - F.col("_trend_m"))
        # grid cells feed the seasonal fit AND the output join
        .localCheckpoint(eager=False)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pos_tab = (
        g.filter(F.col("_dm").isNotNull())
        .groupBy(*keys, "_pos")
        .agg(
            F.sum(dec(F.col("_dm"))).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("_c"),
        )
    )
    tot = pos_tab.groupBy(*keys).agg(
        F.sum("_s").alias("_st"), F.sum("_c").cast("long").alias("_ct")
    )
    seas = pos_tab.join(tot, keys).select(
        *keys,
        "_pos",
        F.round(
            (
                F.col("_s").cast("double") / F.col("_c").cast("double")
                - F.col("_st").cast("double") / F.col("_ct").cast("double")
            )
        ).cast("long").alias("_seas_m"),
    )
    out = g.join(seas, [*keys, "_pos"], "left")
    trend = F.round(F.col("_trend_m") / F.lit(1000000.0), 6)
    seasonal = F.when(
        F.col("_trend_m").isNotNull(),
        F.round(F.col("_seas_m") / F.lit(1000000.0), 6),
    )
    residual = F.when(
        F.col("_trend_m").isNotNull(),
        F.round(
            (F.col("_vm") - F.col("_trend_m") - F.col("_seas_m"))
            / F.lit(1000000.0),
            6,
        ),
    )
    return out.select(
        *keys,
        "bucket_us",
        F.round(F.col("_vm") / F.lit(1000000.0), 6).alias("value"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        residual.alias("residual"),
    )


def theil_sen(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    every_seconds: int,
) -> DataFrame:
    """Per-key Theil–Sen robust trend over the fixed bucket grid: slope =
    the MEDIAN of all pairwise slopes (y_j − y_i)/(x_j − x_i), intercept
    = the median of (y_i − slope·x_i) — the trend estimate a level shift
    or a burst of outlier days cannot drag (OLS breaks at one bad day;
    Theil–Sen tolerates ~29% contamination).  The robust companion to
    seasonal_decompose's moving-average trend and level_shift's
    changepoint: "what is the underlying drift, ignoring the incidents".

    Exactness contract: cells are the engine's round-6 avg buckets in
    micro-units (the ACF convention); each pairwise slope derives from
    exact integer differences in identical expression order and is
    rounded at 6; the median is the engine's type-1 order statistic
    (value at rank ⌈n/2⌉ under (slope, x_i, x_j) total order — the
    exact_quantiles convention), so both medians are value-replayable.
    x is the BUCKET INDEX (slope = units per bucket), so irregular
    gaps weight by time, not by sample count.

    Scale shape: the corpus collapses to grid cells once; the pairwise
    frame is quadratic IN THE GRID (n·(n−1)/2 per key — the operator is
    for resampled series, bounded by buckets-per-key, never raw rows),
    keyed joins and keyed windows throughout.  Keys with fewer than 2
    cells report NULL slope.

    Output: (*keys, n_points, n_pairs, slope, intercept)."""
    if every_seconds <= 0:
        raise ValueError("theil_sen: every_seconds must be positive")
    if not keys:
        raise ValueError("theil_sen: keys must be non-empty")
    from .stats import _epoch_us_col

    every_us = every_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    bucket = (us - F.pmod(us, F.lit(every_us))).alias("_b")
    wmin = Window.partitionBy(*keys)
    cells = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(*keys, bucket, F.col(value_col).alias("_v"))
        .groupBy(*keys, "_b")
        .agg(F.round(F.avg("_v"), 6).alias("_val"))
        .filter(F.col("_val").isNotNull())
        .select(
            *keys,
            "_b",
            F.round(F.col("_val") * F.lit(1000000.0)).cast("long").alias("_y"),
        )
        .withColumn("_mn", F.min("_b").over(wmin))
        .withColumn(
            "_x", ((F.col("_b") - F.col("_mn")) / F.lit(every_us)).cast("long")
        )
        .select(*keys, "_x", "_y")
        # feeds both sides of the pair join AND the intercept pass
        .localCheckpoint(eager=False)
    )
    right = cells.select(
        *keys, F.col("_x").alias("_x2"), F.col("_y").alias("_y2")
    )
    pairs = (
        cells.join(right, keys)
        .filter(F.col("_x") < F.col("_x2"))
        .select(
            *keys,
            "_x",
            F.col("_x2").alias("_xj"),
            F.round(
                (F.col("_y2") - F.col("_y")).cast("double")
                / F.lit(1000000.0)
                / (F.col("_x2") - F.col("_x")).cast("double"),
                6,
            ).alias("_slope"),
        )
    )
    wrank = Window.partitionBy(*keys).orderBy("_slope", "_x", "_xj")
    ranked = pairs.withColumn("_rn", F.row_number().over(wrank))
    npairs = pairs.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    med_slope = (
        ranked.join(npairs, keys)
        .filter(
            F.col("_rn")
            == F.ceil(F.col("n_pairs").cast("double") / 2.0 - 1e-9).cast("long")
        )
        .select(*keys, "n_pairs", F.col("_slope").alias("slope"))
    )
    resid = cells.join(med_slope, keys).select(
        *keys,
        "n_pairs",
        "slope",
        F.round(
            F.col("_y").cast("double") / F.lit(1000000.0)
            - F.col("slope") * F.col("_x").cast("double"),
            6,
        ).alias("_r"),
        F.col("_x"),
    )
    wr = Window.partitionBy(*keys).orderBy("_r", "_x")
    npts = cells.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    med_int = (
        resid.withColumn("_rn", F.row_number().over(wr))
        .join(npts, keys)
        .filter(
            F.col("_rn")
            == F.ceil(F.col("n_points").cast("double") / 2.0 - 1e-9).cast("long")
        )
        .select(*keys, "n_points", "n_pairs", "slope", F.col("_r").alias("intercept"))
    )
    # keys with a single cell: no pairs — report NULL slope/intercept
    singles = (
        npts.filter(F.col("n_points") < 2)
        .select(
            *keys,
            "n_points",
            F.lit(0).cast("long").alias("n_pairs"),
            F.lit(None).cast("double").alias("slope"),
            F.lit(None).cast("double").alias("intercept"),
        )
    )
    return med_int.unionByName(singles)


def survival_logrank(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
) -> DataFrame:
    """Two-group log-rank test — the hypothesis test that completes the
    Kaplan–Meier readout: "are these two survival curves actually
    different, or is the gap churn noise?"  Same input contract as
    survival_curve (one row per subject, duration + observed flag, NULLs
    excluded), plus a group column with EXACTLY two distinct values
    (raises otherwise — a k-group generalization is a different
    statistic).

    At each distinct event time t: O₁ accumulates group-1 events, E₁
    accumulates the null expectation r₁ₜ·dₜ/nₜ, V the hypergeometric
    variance dₜ·(r₁ₜ/nₜ)(1−r₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1) (0 where nₜ = 1);
    χ² = (O₁−E₁)²/V, gated at the 5% χ²(1) critical value 3.841459.

    Determinism: risk sets are exact integer suffix counts over the
    bounded distinct-duration cell table (one corpus-sized grouped count;
    the survival_curve/level_shift bounded-frame precedent); the E₁/V
    accumulations are ORDERED cumulative windows over that table, so the
    double fold happens in duration order from identical operands in
    both engines — no aggregate-order noise (the survival_curve
    discipline), round-6 only at the output.

    Output: one row (group_a, group_b, n_a, n_b, o_a, e_a, o_b, e_b,
    chi2, significant).  The arity precheck collects at most 3 distinct
    group values (limit 3), so misuse with a high-cardinality group
    column raises without a driver-sized materialization."""
    d, o, g = F.col(duration_col), F.col(observed_col), F.col(group_col)
    base = df.filter(d.isNotNull() & o.isNotNull() & g.isNotNull()).select(
        d.alias("_t"), o.cast("boolean").alias("_o"), g.cast("string").alias("_g")
    )
    # limit(3): three rows already prove "not exactly 2" — never materialize
    # a high-cardinality group column on the driver just to raise (r4 verdict).
    groups = [
        r["_g"]
        for r in base.select("_g").distinct().orderBy("_g").limit(3).collect()
    ]
    if len(groups) != 2:
        raise ValueError(
            f"survival_logrank: need exactly 2 groups, got {groups}"
        )
    ga, gb = groups
    cells = base.groupBy("_t").agg(
        F.sum(F.when((F.col("_g") == ga) & F.col("_o"), 1).otherwise(0))
        .cast("long").alias("_da"),
        F.sum(F.when((F.col("_g") == gb) & F.col("_o"), 1).otherwise(0))
        .cast("long").alias("_db"),
        F.sum(F.when(F.col("_g") == ga, 1).otherwise(0)).cast("long").alias("_ca"),
        F.sum(F.when(F.col("_g") == gb, 1).otherwise(0)).cast("long").alias("_cb"),
    )
    w_pref = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    tot = cells.agg(
        F.sum("_ca").cast("long").alias("_na"), F.sum("_cb").cast("long").alias("_nb")
    )
    risk = (
        cells.crossJoin(F.broadcast(tot))
        .withColumn("_ra", F.col("_na") - F.coalesce(F.sum("_ca").over(w_pref), F.lit(0)))
        .withColumn("_rb", F.col("_nb") - F.coalesce(F.sum("_cb").over(w_pref), F.lit(0)))
        .filter((F.col("_da") + F.col("_db")) > 0)
    )
    dt = (F.col("_da") + F.col("_db")).cast("double")
    nt = (F.col("_ra") + F.col("_rb")).cast("double")
    ra = F.col("_ra").cast("double")
    e_term = ra * dt / nt
    v_term = F.when(
        (F.col("_ra") + F.col("_rb")) > 1,
        dt * (ra / nt) * (F.lit(1.0) - ra / nt)
        * ((nt - dt) / (nt - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    w_cum = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = (
        risk.withColumn("_oa", F.sum("_da").over(w_cum))
        .withColumn("_ob", F.sum("_db").over(w_cum))
        .withColumn("_ea", F.sum(e_term).over(w_cum))  # ordered double fold
        .withColumn("_v", F.sum(v_term).over(w_cum))
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.desc("_t"))))
        .filter(F.col("_rn") == 1)
    )
    oa, ob = F.col("_oa").cast("double"), F.col("_ob").cast("double")
    ea = F.col("_ea")
    v = F.col("_v")
    chi2 = F.when(v > 0.0, (oa - ea) * (oa - ea) / v)
    # acc already carries _na/_nb from the risk-set crossJoin
    return acc.select(
        F.lit(ga).alias("group_a"),
        F.lit(gb).alias("group_b"),
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.col("_oa").cast("long").alias("o_a"),
        F.round(ea, 6).alias("e_a"),
        F.col("_ob").cast("long").alias("o_b"),
        F.round(oa + ob - ea, 6).alias("e_b"),
        F.round(chi2, 6).alias("chi2"),
        F.coalesce(chi2 > F.lit(3.841459), F.lit(False)).alias("significant"),
    )


def survival_rmst(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    tau: float,
) -> DataFrame:
    """Restricted mean survival time — the area under the Kaplan–Meier
    curve up to horizon τ: "expected active time within the first τ
    units", the estimand that stays meaningful when hazards cross and
    median survival is undefined (both routine in churn curves).  The
    scalar summary the full survival_curve table feeds a dashboard.

    Built ON the engine's own KM output (same input contract): RMST =
    Σ over curve steps of S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ) plus the leading
    1·min(t₀, τ) segment (S = 1 before the first distinct duration);
    the fold runs as an ORDERED cumulative window over the bounded
    curve table (the survival_curve discipline), from the curve's
    round-6 survival values, round-6 at the end.  τ beyond the last
    duration extends the final S flat to τ — the standard convention.

    Output: one row (tau, n, rmst)."""
    if not tau > 0:
        raise ValueError(f"survival_rmst: tau must be positive, got {tau}")
    curve = survival_curve(df, duration_col, observed_col)
    w_lead = Window.orderBy("t")
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tt = F.col("t").cast("double")
    nxt = F.coalesce(F.lead(tt).over(w_lead), F.lit(float(tau)))
    seg = F.greatest(
        F.least(nxt, F.lit(float(tau))) - F.least(tt, F.lit(float(tau))),
        F.lit(0.0),
    )
    first_t = F.first(tt).over(
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    n_tot = F.first((F.col("n_risk")).cast("long")).over(
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    acc = (
        curve.withColumn("_seg", F.col("survival") * seg)
        .withColumn("_cum", F.sum("_seg").over(w_cum))
        .withColumn("_lead_in", F.least(first_t, F.lit(float(tau))))
        .withColumn("_n0", n_tot)
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.desc("t"))))
        .filter(F.col("_rn") == 1)
    )
    return acc.select(
        F.lit(float(tau)).alias("tau"),
        F.col("_n0").alias("n"),
        F.round(F.col("_lead_in") + F.col("_cum"), 6).alias("rmst"),
    )


def interarrival_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key inter-arrival (gap) statistics — the BURSTINESS of each
    entity's event stream, the temporal axis disorder_profile (lateness)
    and freshness (staleness) don't measure: a Poisson-regular entity
    has gap CV ≈ 1, a session-bursty one ≫ 1, a metronome (bot,
    heartbeat, synthetic feed) ≪ 1 — so LOW burstiness is as much an
    anomaly signal as high (scripted traffic betrays itself by
    regularity).  Also emits Goh–Barabási burstiness B = (CV−1)/(CV+1)
    ∈ (−1, 1) (0 = Poisson) for the bounded-range version monitors
    prefer.

    Exactness + shape: gaps are exact integer microsecond differences
    from a KEYED lag window ordered by (ts, tiebreak) — the tiebreak
    makes equal timestamps deterministic; moments fold as exact
    decimals per key; CV/B are round-6 divisions.  Keys with fewer than
    3 events report NULL cv (a single gap has no dispersion).  One
    keyed window + one keyed aggregate — nothing global.

    Output: (key, n_events, n_gaps, mean_gap_s, cv_gap, burstiness,
    max_gap_s)."""
    from .stats import _epoch_us_col

    k = F.col(key_col)
    us = _epoch_us_col(df, ts_col)
    base = df.filter(k.isNotNull() & F.col(ts_col).isNotNull()).select(
        k.alias("_k"), us.alias("_us"), F.col(tiebreak_col).alias("_tb")
    )
    w = Window.partitionBy("_k").orderBy("_us", "_tb")
    gaps = base.withColumn("_prev", F.lag("_us").over(w)).withColumn(
        "_gap", F.col("_us") - F.col("_prev")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = gaps.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("_gap").cast("long").alias("n_gaps"),
        F.sum(dec(F.col("_gap"))).alias("_s1"),
        F.sum(dec(F.col("_gap")) * F.col("_gap")).alias("_s2"),
        F.max("_gap").alias("_mx"),
    )
    n = F.col("n_gaps").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    cv = F.when(
        (F.col("n_gaps") >= 2) & (mean > 0.0),
        F.sqrt(F.greatest(var, F.lit(0.0))) / mean,
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n_events",
        "n_gaps",
        F.when(
            F.col("n_gaps") >= 1, F.round(mean / F.lit(1e6), 6)
        ).alias("mean_gap_s"),
        F.round(cv, 6).alias("cv_gap"),
        F.round((cv - F.lit(1.0)) / (cv + F.lit(1.0)), 6).alias("burstiness"),
        F.when(
            F.col("n_gaps") >= 1,
            F.round(F.col("_mx").cast("double") / F.lit(1e6), 6),
        ).alias("max_gap_s"),
    )


def detected_period_report(
    df: DataFrame,
    keys: "list[str]",
    ts_col: str,
    value_col: str,
    every_seconds: int,
    max_lag: int = 14,
) -> DataFrame:
    """Per-key DETECTED period: the lag in [2, max_lag] with the highest
    autocorrelation — "ACF finds the period" made literal, closing the
    loop the seasonal machinery opened (autocorrelation measures →
    THIS picks → seasonal_decompose fits → robust-z alerts).  Lag 1 is
    excluded by design: trend autocorrelation dominates lag 1 on almost
    any drifting series and is not a PERIOD.

    Rides autocorrelation verbatim (same exact-decimal contract); the
    argmax is a keyed window with (acf DESC, lag ASC) — the smallest
    lag wins ties, so a period-3 cycle reports 3, not its harmonic 6
    (pytest-pinned).  Keys whose best ACF is NULL or ≤ 0 report NULL
    period (no positive periodicity evidence ≠ period max_lag).

    Output: (*keys, period, period_acf, n_pairs)."""
    if max_lag < 2:
        raise ValueError(f"detected_period_report: max_lag must be >= 2, got {max_lag}")
    from pyspark.sql import Window

    acf = autocorrelation(
        df, keys, ts_col, value_col, every_seconds, list(range(2, max_lag + 1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc_nulls_last("acf"), F.asc("lag")
    )
    best = acf.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    ok = F.col("acf").isNotNull() & (F.col("acf") > 0.0)
    return best.select(
        *keys,
        F.when(ok, F.col("lag")).alias("period"),
        F.when(ok, F.col("acf")).alias("period_acf"),
        "n_pairs",
    )
