"""The single multi-aggregate audit pass (north-star core).

ONE full-width scan of the interleaved-docs table computes, per scan
partition: every schema-inference aggregate (NativeInferencePlan's count /
sum(size(array_compact(...))) / every(...) expressions), the per-check fail
counts, AND capped violation-doc_id samples.  The per-partition output is
tiny (one row per partition), so:

* the unified schema is assembled by merging the partial rows driver-side —
  legal because every aggregate is associative (counts sum, every ANDs),
  exactly the treeAggregate argument from SURVEY.md §2 (U8);
* per-partition verdicts are the partial rows themselves;
* violation rows are the exploded samples, re-capped globally.

The only other scans in a full audit are NARROW by construction: doc_id
uniqueness (reads one string column) and the media_ref anti-join (reads one
nested subfield) — both column-pruned to a few percent of the table bytes.

Why fuse: each full-width pass over 10^12 docs is the dominant cost at scale
(and, measured locally, per-row span processing is allocation-bound — two
fused passes anti-scale worse than one).  Fusing inference + verdicts +
violation sampling into one GroupBy(partition) job halves the engine's
full-width scans per audit.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema_algebra import DEFAULT_CONFIG, Schema, SchemaGenerationConfig
from .infer_native import NativeInferencePlan, merge_partial_rows
from .validate import ROW_CHECKS, with_check_flags


class AuditResult:
    """Everything one full-width scan (plus driver merge) produced."""

    def __init__(
        self,
        schema: Schema,
        n_docs: int,
        verdicts: DataFrame,
        violations: DataFrame,
    ):
        self.schema = schema
        self.n_docs = n_docs
        self.verdicts = verdicts
        self.violations = violations


def single_pass_audit(
    spans_df: DataFrame,
    cap_per_check: Optional[int] = 1000,
    config: SchemaGenerationConfig = DEFAULT_CONFIG,
) -> AuditResult:
    """Unified schema + per-partition verdicts + capped violation rows from
    ONE scan.  See module docstring for the mechanics.

    Float-element arrays would need explode jobs for integrality; the plan
    raises UnsupportedSchema there (same contract as infer_from_struct_native)
    — callers fall back to separate passes.
    """
    spark = spans_df.sparkSession
    plan = NativeInferencePlan(spans_df, config)
    if plan.explode_aggs:
        from .infer_native import UnsupportedSchema

        raise UnsupportedSchema(
            "single_pass_audit: float-element arrays need explode jobs — "
            "run inference and validation as separate passes"
        )

    flagged = with_check_flags(spans_df)
    aggs = list(plan.builder.exprs)
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    for name in ROW_CHECKS:
        fail = ~F.col(f"ok_{name}")
        aggs.append(F.sum(fail.cast("long")).alias(f"fail_{name}"))
        aggs.append(
            F.slice(
                F.array_sort(F.collect_list(F.when(fail, F.col("doc_id")))),
                1,
                cap_per_check if cap_per_check is not None else 2147483647,
            ).alias(f"sample_{name}")
        )

    partials = (
        flagged.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(*aggs)
        .collect()
    )
    rows = [r.asDict() for r in partials]

    schema, n_docs = plan.finalize(merge_partial_rows(rows, plan.builder.merges))

    verdict_rows = []
    for r in rows:
        n_failed = sum(r[f"fail_{name}"] for name in ROW_CHECKS)
        verdict_rows.append(
            (
                r["partition_id"],
                r["n_rows"],
                *[r[f"fail_{name}"] for name in ROW_CHECKS],
                n_failed,
                n_failed == 0,
            )
        )
    verdict_schema = (
        "partition_id int, n_rows long, "
        + ", ".join(f"fail_{name} long" for name in ROW_CHECKS)
        + ", n_failed long, passed boolean"
    )
    verdicts = spark.createDataFrame(verdict_rows, verdict_schema)

    viol_rows = []
    for name in ROW_CHECKS:
        ids = sorted(d for r in rows for d in r[f"sample_{name}"])
        if cap_per_check is not None:
            ids = ids[:cap_per_check]
        viol_rows.extend((d, name) for d in ids)
    violations = spark.createDataFrame(
        viol_rows or [], "doc_id string, check string"
    )
    return AuditResult(schema, n_docs, verdicts, violations)
