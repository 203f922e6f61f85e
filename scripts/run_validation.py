#!/usr/bin/env python
"""spark-submit entry point: schema-infer + validate an interleaved-docs
table, resumably, writing the unified schema + lineage + violation outputs.

Cluster:
    spark-submit --py-files dist/jsons_to_schema_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.executor.extraJavaOptions="-XX:+UseG1GC -XX:NewRatio=1" \\
        scripts/run_validation.py \\
        --data  <iceberg-table-or-parquet-path> \\
        --catalog <media-catalog-path> \\
        --state-dir /shared/state --output /shared/out

Local smoke:
    spark-submit --master local[8] --py-files dist/jsons_to_schema_spark.zip \\
        scripts/run_validation.py --data .cache/spans_n5000_seed42/documents_spans \\
        --catalog .cache/spans_n5000_seed42/media_catalog.parquet \\
        --state-dir /tmp/state --output /tmp/out

The session comes from spark-submit's conf (getOrCreate) — the engine does
not override cluster settings here.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# --py-files puts the package on the path on a cluster; this fallback makes
# the local smoke invocation work from a bare checkout too (run_curation.py
# convention).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="spans table (parquet dir / iceberg)")
    ap.add_argument("--catalog", required=True, help="media catalog path")
    ap.add_argument("--state-dir", required=True, help="resume state directory")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--cap-per-check", type=int, default=1000)
    ap.add_argument(
        "--metrics-repo",
        default=None,
        help="metrics-repository path; when set, this run's table metrics "
        "are appended there and judged against the stored history "
        "(operators/metrics_repo.py) — anomaly verdicts land in "
        "<output>/metric_anomalies",
    )
    ap.add_argument(
        "--run-id",
        type=int,
        default=None,
        help="metrics run id (default: latest stored + 1)",
    )
    ap.add_argument(
        "--diff-against",
        default=None,
        help="previous snapshot of the SAME table (parquet path); when "
        "set, a doc_id-keyed reconciliation (validate.table_diff) is "
        "written to <output>/snapshot_diff — added/removed/changed rows "
        "with changed-column attribution (span arrays compare null-safe "
        "JVM-side), the backfill/migration audit",
    )
    args = ap.parse_args()

    from jsons_to_schema_spark.checkpoint import checkpointed_validate
    from jsons_to_schema_spark.operators.validate import all_violations
    from jsons_to_schema_spark.schema_algebra import canonical_json

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # correctness-critical (perf confs stay with spark-submit): size(NULL)
    # must be NULL, never -1 — the inference aggregates are also guarded
    # expression-level (infer_native._size0), this is defense in depth.
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")

    result = checkpointed_validate(spark, args.data, args.state_dir)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "unified_schema.json").write_text(canonical_json(result["schema"]))
    (out / "run_summary.json").write_text(
        json.dumps(
            {
                "n_rows": result["n_rows"],
                "fails": result["fails"],
                "splits_total": result["splits_total"],
                "splits_computed_this_run": result["splits_computed_this_run"],
            },
            indent=1,
            sort_keys=True,
        )
    )
    spark.createDataFrame(result["lineage"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out / "lineage"))

    cat = spark.read.parquet(args.catalog)
    df = spark.read.parquet(args.data)
    from pyspark.sql import functions as _F

    from jsons_to_schema_spark.sources.sinks import write_table_observed

    viol_metrics = write_table_observed(
        all_violations(df, cat, cap_per_check=args.cap_per_check),
        out / "violations",
        {
            "n_violation_rows": _F.count(_F.lit(1)),
            "n_violating_docs": _F.approx_count_distinct("doc_id"),
        },
    )
    (out / "violation_metrics.json").write_text(
        json.dumps(viol_metrics, sort_keys=True)
    )

    if args.metrics_repo:
        from pyspark.sql import functions as F

        from jsons_to_schema_spark.operators.metrics_repo import stamp_run

        # per-check violation counts ride the same run partition, so a
        # violation-count spike alarms exactly like a size collapse
        viol_rows = spark.read.parquet(str(out / "violations"))
        per_check = viol_rows.groupBy("check").agg(
            F.count(F.lit(1)).cast("double").alias("value")
        ).select(
            F.lit("violations").alias("dataset"),
            F.col("check").alias("instance"),
            F.lit("count").alias("metric"),
            "value",
        )
        run_id, anomalies = stamp_run(
            spark,
            df.select("doc_id", F.size("spans").alias("n_spans")),
            args.metrics_repo,
            dataset="spans",
            run_id=args.run_id,
            extra_metrics=per_check,
        )
        if anomalies is None:
            print(f"metrics stamped as run {run_id} (first run, no history)")
        else:
            anomalies.write.mode("overwrite").parquet(
                str(out / "metric_anomalies")
            )
            n_flagged = anomalies.filter("is_anomaly").count()
            print(
                f"metrics stamped as run {run_id}; "
                f"{n_flagged} metric(s) anomalous vs history"
            )

    if args.diff_against:
        from jsons_to_schema_spark.operators.validate import (
            table_diff,
            table_diff_summary,
        )

        prev = spark.read.parquet(args.diff_against)
        diff = table_diff(prev, df, ["doc_id"])
        diff.write.mode("overwrite").parquet(str(out / "snapshot_diff"))
        summary = {
            r["status"]: r["n_rows"] for r in table_diff_summary(diff).collect()
        }
        print(f"snapshot diff vs {args.diff_against}: {summary or 'reconciled'}")

    print(
        f"validated {result['n_rows']} rows across {result['splits_total']} splits "
        f"({result['splits_computed_this_run']} computed this run); "
        f"outputs in {out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
