"""Skew-mitigated equi-join: explicit hot-key salting.

AQE's runtime skew-join split (``spark.sql.adaptive.skewJoin``) only fires
for sort-merge joins whose runtime partition stats cross its thresholds,
and it cannot help when ONE key alone exceeds a single task's memory —
every row of that key still hashes to one reducer on each side.  The
classic fix Spark lacks as a first-class operator is SALTING: split the
known-hot keys across ``salt`` sub-keys on the fact side and replicate the
matching dimension rows across all sub-keys, so a key that used to pin one
straggler task fans out over ``salt`` tasks.  This module provides it as a
composition of DataFrame ops (SURVEY §2.3 custom-operator rule) whose
result is provably EQUAL to the plain join — the driver oracle for
``salted_join_events`` IS the plain SQL join, so equivalence is
value-checked at every CI run, and the brute-force property test covers
inner/left joins with NULL keys, unmatched rows and duplicate right rows.

Scale shape:

* hot-key detection is ONE grouped count on the fact side truncated by the
  threshold — the hot set is bounded by construction (n_rows / threshold
  keys at most) and is asserted ≤ ``max_hot_keys`` before it is collected
  and broadcast as an isin literal (the heavy_hitters contract: a hot set
  too large to broadcast means the threshold is wrong, and silently
  shuffling it would mis-certify the plan — raise instead);
* the salt column is DETERMINISTIC — ``xxhash64`` of caller-named columns
  (default: all fact columns) modulo ``salt`` — never ``rand()`` or
  ``monotonically_increasing_id()``, so retried/recomputed tasks place
  every row in the same sub-key and the operator stays idempotent under
  speculative execution (identical duplicate rows share a salt: correct,
  merely less spread — documented trade for determinism);
* the dimension side replicates ONLY its hot-key rows ``salt`` times
  (explode of a literal array); cold keys join untouched, so total
  replication cost is |hot dim rows| × salt, not |dim| × salt;
* both branches stay ordinary equi-joins (cold on key, hot on
  (key, salt)) that Catalyst plans independently — broadcast if small,
  SMJ otherwise; the union is the final result.  No CartesianProduct, no
  per-row Python (plan-asserted in tests/test_round4h_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def detect_hot_keys(
    df: DataFrame,
    key: str,
    threshold: int,
    max_hot_keys: int = 10_000,
) -> DataFrame:
    """Keys of ``df`` whose row count is ≥ ``threshold`` (the salting
    candidates), as a bounded DataFrame of (key, n_rows).

    One grouped count (map-side partial combine); NULL keys are never hot
    (an equi-join drops them anyway, and salting them would only spread
    rows that match nothing).  Raises if more than ``max_hot_keys``
    survive — a hot set that large means the threshold is mis-sized, and
    broadcasting it would be the real scale bug.
    """
    hot = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= F.lit(int(threshold)))
    )
    n = hot.limit(max_hot_keys + 1).count()
    if n > max_hot_keys:
        raise ValueError(
            f"detect_hot_keys: >{max_hot_keys} keys exceed threshold="
            f"{threshold}; raise the threshold (a hot set this large is "
            "not a skew problem, it is the join's normal shape)"
        )
    return hot


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
    hot_keys: "list | None" = None,
    hot_threshold: "int | None" = None,
    salt_on: "list[str] | None" = None,
    max_hot_keys: int = 10_000,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with hot keys salted ``salt``
    ways; result equals ``fact.join(dim, key, how)`` row-for-row.

    ``hot_keys`` may be passed explicitly (values of ``key``); otherwise
    they are detected on the fact side with ``hot_threshold`` (required in
    that case).  ``how`` ∈ {inner, left}: the dimension side is replicated,
    so right/outer forms would duplicate dim-only rows — refused loudly.
    ``salt_on`` names the fact columns hashed into the deterministic salt
    (default: every fact column).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if int(salt) < 2:
        raise ValueError("salt must be >= 2 (salt=1 is a plain join)")
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_keys or hot_threshold")
        hot_keys = [
            r[0]
            for r in detect_hot_keys(
                fact, key, hot_threshold, max_hot_keys=max_hot_keys
            ).select(key).collect()
        ]
    hot_keys = sorted(set(hot_keys))
    if not hot_keys:
        return fact.join(dim, on=key, how=how)
    if len(hot_keys) > max_hot_keys:
        raise ValueError(
            f"salted_join: {len(hot_keys)} hot keys > max_hot_keys="
            f"{max_hot_keys}"
        )

    out_cols = fact.columns + [c for c in dim.columns if c != key]
    is_hot = F.col(key).isin(hot_keys)

    salt_cols = salt_on if salt_on is not None else fact.columns
    salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(int(salt)))

    fact_cold = fact.filter(~is_hot | F.col(key).isNull())
    fact_hot = fact.filter(is_hot).withColumn(_SALT, salt_expr.cast("int"))

    dim_cold = dim.filter(~is_hot)
    dim_hot = dim.filter(is_hot).withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(int(salt))]))
    )

    cold = fact_cold.join(dim_cold, on=key, how=how).select(*out_cols)
    hot = fact_hot.join(dim_hot, on=[key, _SALT], how=how).select(*out_cols)
    return cold.unionByName(hot)


# ------------------------------------------------------ interval overlap ----


def _interval_us(df: DataFrame, col: str) -> Column:
    """Normalize a timestamp/date/numeric column to a LONG axis value
    (epoch microseconds for temporal types, plain cast otherwise) so the
    bucketing arithmetic is exact integer math in both engines."""
    dt = dict(df.dtypes).get(col)
    c = F.col(col)
    if dt == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    if dt == "timestamp":
        return F.unix_micros(c)
    if dt == "date":
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def _bucket_explode(
    df: DataFrame, start: Column, end: Column, bucket_us: int, cap: int
) -> DataFrame:
    lo = F.floor(F.col("_s_us") / F.lit(bucket_us)).cast("long")
    hi = F.floor((F.col("_e_us") - 1) / F.lit(bucket_us)).cast("long")
    # the cap guard is fused INTO the sequence bound (not a dropped side
    # column Catalyst would prune away), so it provably evaluates on the
    # executor before any explosion happens
    hi_guarded = F.when(
        hi - lo + F.lit(1) > F.lit(int(cap)),
        F.raise_error(
            F.lit(
                "interval_join: an interval spans more than "
                f"{cap} buckets (bucket_us={bucket_us}); widen "
                "bucket_us or raise max_buckets_per_row"
            )
        ).cast("long"),
    ).otherwise(hi)
    return (
        df.withColumn("_s_us", start)
        .withColumn("_e_us", end)
        .filter(F.col("_e_us") > F.col("_s_us"))  # empty/inverted: no overlap
        .withColumn("_bkt", F.explode(F.sequence(lo, hi_guarded)))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_span: "tuple[str, str]",
    right_span: "tuple[str, str]",
    on: "list[str] | None" = None,
    bucket_us: int = 3_600_000_000,
    max_buckets_per_row: int = 4_096,
) -> DataFrame:
    """Inner join of half-open intervals ``[start, end)`` that OVERLAP,
    with optional equi-keys ``on`` — the range join Spark lacks as a
    first-class operator, expressed so it never degenerates into a
    cross product.

    The naive plan for ``l.join(r, ls < re AND rs < le)`` is a
    BroadcastNestedLoopJoin or CartesianProduct — O(|L|x|R|) and the
    single most common scale cliff in hand-written Spark.  The bucketed
    re-expression: each interval explodes to the coarse time buckets it
    touches (``floor(t / bucket_us)``), the join becomes an ordinary
    equi-join on ``on + [bucket]`` (hash-partitioned, AQE/skew eligible,
    broadcast-able), the true overlap predicate filters inside the
    matched bucket, and each overlapping pair survives EXACTLY ONCE
    without any distinct: it is kept only in the bucket containing
    ``greatest(ls, rs)`` — the overlap's first instant, which lies in
    exactly one bucket.  Replication cost is span/bucket_us per row,
    guarded by ``max_buckets_per_row`` via an executor-side
    ``raise_error`` (no extra pass; a silent explosion would be the
    real bug).  Empty and inverted intervals match nothing, NULL
    endpoints match nothing, and touching intervals ([0,10) vs [10,20))
    do not overlap — all pinned in tests.

    Output columns: ``on`` keys, then left columns, then right columns,
    plus ``overlap_us`` (exact integer overlap length).  Left/right
    non-key column names must be disjoint — renamed-by-caller beats
    silent suffixing.  Timestamp/date endpoint columns are normalized
    to epoch microseconds; numeric endpoints are used as-is (then
    ``bucket_us`` is in the same unit).
    """
    on = list(on or [])
    l_cols = [c for c in left.columns if c not in on]
    r_cols = [c for c in right.columns if c not in on]
    clash = sorted(set(l_cols) & set(r_cols))
    if clash:
        raise ValueError(
            f"interval_join: rename clashing non-key columns {clash}"
        )
    bucket_us = int(bucket_us)
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")

    ls, le = (_interval_us(left, c) for c in left_span)
    rs, re_ = (_interval_us(right, c) for c in right_span)

    lx = _bucket_explode(left, ls, le, bucket_us, max_buckets_per_row)
    lx = lx.select(
        *on, *l_cols, F.col("_s_us").alias("_ls"), F.col("_e_us").alias("_le"), "_bkt"
    )
    rx = _bucket_explode(right, rs, re_, bucket_us, max_buckets_per_row)
    rx = rx.select(
        *[F.col(c).alias(f"_r_{c}") for c in on],
        *r_cols,
        F.col("_s_us").alias("_rs"),
        F.col("_e_us").alias("_re"),
        F.col("_bkt").alias("_r_bkt"),
    )

    cond = F.col("_bkt") == F.col("_r_bkt")
    for k in on:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    overlap_start = F.greatest(F.col("_ls"), F.col("_rs"))
    cond = (
        cond
        & (F.col("_ls") < F.col("_re"))
        & (F.col("_rs") < F.col("_le"))
        # exactly-once: only the bucket holding the overlap's first instant
        & (F.floor(overlap_start / F.lit(bucket_us)).cast("long") == F.col("_bkt"))
    )
    joined = lx.join(rx, cond, "inner")
    overlap = F.least(F.col("_le"), F.col("_re")) - overlap_start
    return joined.select(
        *on, *l_cols, *r_cols, overlap.alias("overlap_us")
    )
