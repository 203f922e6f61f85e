"""Audit-output sinks: verdicts, violations, schema snapshot as TABLES.

Locally everything is parquet (+ a canonical-JSON text file for the unified
schema); at cluster scale the same writes target Iceberg tables — the writer
seam is format-agnostic (`fmt` param) so `spark-submit --packages iceberg`
flips the format string without touching callers.  Violations partition by
`check` (bounded cardinality, the natural predicate for triage queries);
verdicts are a single small table (one row per split/partition).

The checkpoint/lineage/metrics table has its own MERGE-shaped sink
(checkpoint.TableStateStore) because it needs row-level upsert; these sinks
are append/overwrite batch outputs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from ..schema_algebra import Schema, canonical_json


def write_table(
    df: DataFrame,
    path: str | Path,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(str(path))


def write_audit_outputs(result, out_dir: str | Path) -> dict[str, str]:
    """Materialize one AuditResult as a table directory:

    * ``verdicts/``   — per-split/partition pass/fail table,
    * ``violations/`` — (doc_id, check) rows partitioned by check,
    * ``unified_schema.json`` — the canonical schema snapshot (atomic write).

    Returns the written paths.  The snapshot file is what a later run feeds
    back as the drift baseline (drift.quantile_drift / schema_diff)."""
    import os

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {
        "verdicts": str(out / "verdicts"),
        "violations": str(out / "violations"),
        "schema": str(out / "unified_schema.json"),
    }
    write_table(result.verdicts, paths["verdicts"])
    write_table(result.violations, paths["violations"], partition_by=["check"])
    tmp = out / "unified_schema.json.tmp"
    tmp.write_text(canonical_json(result.schema))
    os.replace(tmp, out / "unified_schema.json")
    return paths
