"""Per-column statistics — ONE multi-aggregate pass (north_star requirement).

min / max / null-count / row-count / distinct (exact or HyperLogLog sketch)
for any set of columns are computed in a single ``agg`` over a single scan:
Catalyst plans partial (map-side) + final aggregation, so the shuffle carries
one partial row per partition regardless of table size, and whole-stage
codegen keeps the hot loop JVM-side.  This is the engine-side generalization
of the reference's U6 range union / U3 required tracking (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    distinct: str | None = None,  # None | "exact" | "approx" | "hll"
) -> DataFrame:
    """One-row wide stats frame: n_rows + per-column min_/max_/nulls_
    (+ distinct_).  ``approx`` uses HLL++ (mergeable, constant memory);
    ``hll`` uses sketch-agg producing a reusable binary sketch column;
    ``exact`` is oracle-friendly but shuffles per-column hash sets.
    """
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"nulls_{c}"))
        if distinct == "exact":
            aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(c).alias(f"distinct_{c}"))
        elif distinct == "hll":
            aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.agg(*aggs)


def group_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped min/max/count/nulls — same single-pass shape, keyed."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.sum(F.isnull(value_col).cast("long")).alias(f"nulls_{value_col}"),
    )


def hll_merge(sketch_df: DataFrame, cols: list[str]) -> DataFrame:
    """Merge HLL sketch columns from independent stats passes (e.g. one per
    Iceberg snapshot) — the mergeability that makes distinct counts
    incremental at 10^12 docs."""
    return sketch_df.agg(
        *[
            F.hll_sketch_estimate(F.hll_union_agg(c)).alias(f"distinct_{c}")
            for c in cols
        ]
    )
