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


def write_table_observed(
    df: DataFrame,
    path: str | Path,
    metrics: "dict[str, object]",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict:
    """Write a table AND collect aggregate metrics from the SAME pass via
    Spark's native Observation API — the validated-write primitive: "write
    the verdicts and tell me the violation total" without re-scanning what
    was just written (at 100 TB the naive write-then-recount doubles the
    job; observed metrics ride the write job's own tasks for free).

    ``metrics`` maps name → aggregate Column (e.g. ``F.count(F.lit(1))``,
    ``F.sum(F.col("n_violations"))``).  Returns the observed values as a
    dict after the write completes.  Works for batch writes; streaming
    sinks use the query-progress surface instead.
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError(
            "write_table_observed: metrics must be non-empty (use "
            "write_table for a plain write)"
        )
    obs = Observation()
    named = {}
    for name, col in metrics.items():
        named[name] = col.alias(name) if hasattr(col, "alias") else col
    observed = df.observe(obs, *named.values())
    w = observed.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(str(path))
    return dict(obs.get)


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


class SchemaHistory:
    """Append-only versioned log of unified-schema snapshots — the chain a
    governance process reads: every run appends its schema, and each
    consecutive transition is classified by the subschema procedure
    (backward: old data stays valid; forward: old readers keep working).

    Locally one JSON file per version, written atomically (tmp + rename);
    at cluster scale an Iceberg table appended per run — the version is the
    snapshot id.  Reading is driver-side (schemas are KB-scale; the history
    has one row per RUN, not per data row)."""

    def __init__(self, history_dir):
        self.dir = Path(history_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def versions(self) -> list[int]:
        return sorted(
            int(p.stem.split("-")[1]) for p in self.dir.glob("schema-*.json")
        )

    def append(self, schema: Schema, n_docs: int) -> int:
        """Append the next version.  The final name is CLAIMED with an
        atomic os.link (r3 review: tmp+replace let two concurrent appenders
        compute the same version and silently overwrite one snapshot);
        losing the claim retries at the next version, so concurrent runs
        serialize into consecutive versions with nothing lost."""
        import json
        import os

        while True:
            v = (self.versions() or [0])[-1] + 1
            tmp = self.dir / f"schema-{v:06d}.json.{os.getpid()}.tmp"
            tmp.write_text(
                json.dumps(
                    {"version": v, "schema": canonical_json(schema),
                     "n_docs": n_docs},
                    sort_keys=True,
                )
            )
            try:
                os.link(tmp, self.dir / f"schema-{v:06d}.json")
            except FileExistsError:
                os.unlink(tmp)
                continue
            os.unlink(tmp)
            return v

    def read(self) -> list[dict]:
        import json

        return [
            json.loads((self.dir / f"schema-{v:06d}.json").read_text())
            for v in self.versions()
        ]

    def transitions(self) -> list[dict]:
        """Consecutive-version compat classification: one record per
        (v, v+1) with the diff count and both compat verdicts."""
        from ..schema_algebra import compat_report, parse_schema

        snaps = self.read()
        out = []
        for a, b in zip(snaps, snaps[1:]):
            rep = compat_report(parse_schema(a["schema"]), parse_schema(b["schema"]))
            out.append(
                {
                    "from_version": a["version"],
                    "to_version": b["version"],
                    "n_changes": rep["n_changes"],
                    "backward_compatible": rep["backward_compatible"],
                    "forward_compatible": rep["forward_compatible"],
                }
            )
        return out
