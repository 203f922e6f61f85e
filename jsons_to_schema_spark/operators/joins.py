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
