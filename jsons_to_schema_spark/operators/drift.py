"""Distribution-drift detection vs a baseline snapshot (north_rule check #4).

Quantile-vector comparison: take Q quantiles of a numeric column on the
baseline slice and the current slice, report per-quantile deltas and a
max-abs-delta drift score.

Two quantile engines:

* ``approx`` — ``percentile_approx`` (Greenwald-Khanna in Spark): mergeable,
  single-pass, constant memory — the 100 TB path.  Accuracy set by
  ``accuracy`` (default 10_000 ≈ 0.01% rank error).
* ``exact``  — ``percentile``: exact interpolated quantiles, used for the
  DuckDB oracle comparison at test scale.

A t-digest sketch (cf. PAPERS.md quantile-sketch refs) would add mergeable
*relative*-error quantiles; GK via percentile_approx already satisfies the
single-multi-aggregate-pass requirement, so t-digest is kept as a pandas-UDAF
extension point, not the default path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PROBS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _quantiles(col: str, probs: list[float], engine: str, accuracy: int) -> Column:
    if engine == "exact":
        return F.percentile(col, F.array(*[F.lit(p) for p in probs]))
    return F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy))


def quantile_drift(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    probs: list[float] | None = None,
    engine: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-quantile drift between two slices of the same column.

    Returns (p, base_q, cur_q, delta) — one row per requested quantile.
    Each side is one aggregate pass (partial+final); the two tiny result rows
    are cross-joined, never the data.
    """
    probs = probs or DEFAULT_PROBS
    b = baseline.agg(_quantiles(column, probs, engine, accuracy).alias("bq"))
    c = current.agg(_quantiles(column, probs, engine, accuracy).alias("cq"))
    joined = b.crossJoin(c)
    # an EMPTY/all-null slice aggregates to a NULL quantile array, and
    # posexplode(NULL zip) would emit ZERO rows — the highest-drift event
    # possible (the data vanished) read as "no drift" (r3 review).  A null
    # array of the right length keeps one row per quantile with NULL
    # base_q/cur_q/delta, which a monitor can distinguish from delta=0.
    null_arr = F.array(*[F.lit(None).cast("double") for _ in probs])
    joined = joined.select(
        F.coalesce(F.col("bq"), null_arr).alias("bq"),
        F.coalesce(F.col("cq"), null_arr).alias("cq"),
    )
    exploded = joined.select(
        F.posexplode(F.arrays_zip("bq", "cq")).alias("i", "q")
    ).select(
        F.element_at(F.array(*[F.lit(p) for p in probs]), F.col("i") + 1).alias("p"),
        F.col("q.bq").alias("base_q"),
        F.col("q.cq").alias("cur_q"),
        (F.col("q.cq") - F.col("q.bq")).alias("delta"),
    )
    return exploded


def drift_score(drift_df: DataFrame) -> DataFrame:
    """Collapse a quantile-drift frame to one row: max |delta| and L1.
    NULL outputs mean a slice was EMPTY (see quantile_drift) — treat as an
    alert, never as zero drift."""
    return drift_df.agg(
        F.max(F.abs("delta")).alias("max_abs_delta"),
        F.sum(F.abs("delta")).alias("l1_delta"),
    )
