"""Checkpoint / resume with per-split lineage + metrics (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Key design decision (SURVEY.md §4.3): merge state is keyed by **content split
id** — the input file path from ``_metadata.file_path`` — NEVER by
``spark_partition_id()``, which is unstable across runs/AQE re-plans.  At
scale the split id is the Iceberg data-file path; locally it is the parquet
part file.  One state record per split holds the split's draft schema, row
counts, per-check failure counts and timing — the lineage/metrics table.

Commit protocol (TableStateStore): the state is a TABLE of split records —
immutable parquet snapshots plus monotonic exclusive-create ``commit-N``
markers (current version = max marker).  ``merge(records)`` is a
copy-on-write row-level upsert keyed by split id: read current snapshot,
drop rows matching incoming split ids, append the batch, write the next
snapshot, create its marker — exactly the shape of an Iceberg ``MERGE INTO
state ON t.split = s.split WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
INSERT`` commit, which is the cluster deployment of this store.  A kill
before the marker leaves the previous version current (the whole batch
retries — idempotent, or a contender adopts the complete claimed
snapshot); after it, the commit is complete.  The next run recomputes exactly the missing splits (asserted in
tests/test_checkpoint.py), and the state table itself doubles as the
lineage/metrics table (read it with spark.read.parquet).
"""

from __future__ import annotations

import hashlib
import os
import time
from pathlib import Path
from typing import Iterator, Optional

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.infer import _arrow_struct_to_draft
from .operators.validate import ROW_CHECKS, split_column, with_check_flags
from .schema_algebra import (
    DEFAULT_CONFIG,
    Schema,
    canonical_json,
    parse_schema,
    unify_opt,
)

SPLIT_COL = "_split"


def _split_key(split_path: str) -> str:
    return hashlib.sha256(split_path.encode()).hexdigest()[:24]


class TableStateStore:
    """Split-state TABLE with Iceberg-MERGE-shaped commits (see module
    docstring).  Locally: parquet snapshots + monotonic commit markers; at
    cluster scale the same call maps to MERGE INTO an Iceberg table keyed
    on split."""

    def __init__(self, state_dir: str | Path):
        self.dir = Path(state_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _version(self) -> int:
        """Current committed version: the max exclusive-create ``commit-N``
        marker (monotonic by construction — a stalled writer's LATE marker
        for an old N can never roll the store back, unlike a mutable
        pointer file).  A legacy ``VERSION`` pointer file is honored as a
        floor for state dirs written by the previous protocol."""
        best = 0
        vfile = self.dir / "VERSION"
        if vfile.exists():
            best = int(vfile.read_text().strip())
        for p in self.dir.glob("commit-*"):
            try:
                best = max(best, int(p.name.split("-", 1)[1]))
            except ValueError:
                continue
        return best

    def _commit_marker(self, version: int) -> None:
        """Declare snap-<version> committed (idempotent: the adopter and a
        slow original writer both create the SAME marker)."""
        try:
            open(self.dir / f"commit-{version:06d}", "x").close()
        except FileExistsError:
            pass

    def _snapshot_path(self, version: int) -> Path:
        return self.dir / f"snap-{version:06d}.parquet"

    def _rows(self, version: Optional[int] = None) -> list[dict]:
        import pyarrow.parquet as pq

        v = self._version() if version is None else version
        if v == 0:
            return []
        return pq.read_table(self._snapshot_path(v)).to_pylist()

    def committed(self) -> dict[str, dict]:
        return {rec["split"]: rec for rec in self._rows()}

    def merge(self, records: list[dict], _retries: int = 256) -> None:
        """Row-level upsert keyed by split id, committed as ONE snapshot +
        atomic pointer swing (the MERGE commit protocol).

        Concurrency (ADVICE r2): two committers that both read version N race
        to CLAIM snap-(N+1) via atomic ``os.link`` of a writer-unique temp
        file — exactly one link succeeds; the loser re-reads the (advanced)
        version and retries its whole read-modify-write on top of the
        winner's rows, so no batch is lost (optimistic concurrency, the same
        shape as Iceberg's atomic metadata-pointer CAS).  The commit point
        is an exclusive-create ``commit-N`` MARKER, and the current version
        is the max marker — monotonic by construction, so a stalled
        writer's late commit can never roll the store back.  A claimed
        snapshot whose writer stalls (or died) before committing is ADOPTED
        after a grace window: a contender creates its marker and rebases on
        top — never deleted (r3 review: deletion could destroy a LIVE slow
        writer's batch and left a window where the pointer referenced no
        file).  A linked snapshot is always complete (the temp file is
        fully written before the link), so adoption commits the stalled
        writer's batch rather than losing it; the marker create is
        idempotent between adopter and a late original writer.

        Migration note: this store reads only ``snap-*.parquet`` + VERSION;
        a state dir from the pre-r2 JSON-file-per-split format is ignored
        (treated as empty → those splits recompute once, then commit here).
        """
        import pyarrow.parquet as pq

        if not records:
            return
        incoming = {r["split"] for r in records}
        stale_since: Optional[float] = None
        for attempt in range(_retries):
            v = self._version()
            kept = [r for r in self._rows(v) if r["split"] not in incoming]
            new_version = v + 1
            snap = self._snapshot_path(new_version)
            tmp = self.dir / f"snap-{new_version:06d}.{os.getpid()}.{id(records)}.tmp"
            # normalize row keys to their UNION before building the table:
            # pyarrow's from_pylist takes the schema from the rows it sees
            # first, silently dropping later-only fields (r3 review: a code
            # upgrade adding a check column lost its counts on resume)
            all_rows = kept + list(records)
            all_keys = {}
            for r in all_rows:
                all_keys.update(dict.fromkeys(r))
            all_rows = [{k: r.get(k) for k in all_keys} for r in all_rows]
            pq.write_table(pa.Table.from_pylist(all_rows), tmp)
            try:
                os.link(tmp, snap)  # atomic claim: exactly one writer wins
            except FileExistsError:
                os.unlink(tmp)
                if self._version() > v:
                    stale_since = None  # winner committed; rebase and retry
                else:
                    # claimed-but-uncommitted snapshot: grace-wait, then
                    # ADOPT — mark it committed and rebase on its rows.
                    now = time.time()
                    if stale_since is None:
                        stale_since = now
                    elif now - stale_since > 0.5:
                        self._commit_marker(new_version)
                        stale_since = None
                    time.sleep(0.02)
                continue
            os.unlink(tmp)
            self._commit_marker(new_version)  # atomic, monotonic commit point
            return
        raise RuntimeError(
            f"TableStateStore.merge: no commit after {_retries} attempts "
            f"(livelocked on {self.dir})"
        )

    def commit(self, rec: dict) -> None:
        """Single-record upsert (a one-row MERGE batch)."""
        self.merge([rec])


# Backwards-compatible alias (the JSON-dir store this replaced).
SplitStateStore = TableStateStore


def _fold_split_factory(check_names: list[str], config=DEFAULT_CONFIG):
    import pyarrow.compute as pc

    out_fields = (
        [("split", pa.string()), ("draft", pa.string()), ("n_rows", pa.int64())]
        + [(f"fail_{c}", pa.int64()) for c in check_names]
    )
    out_schema = pa.schema(out_fields)
    ddl = "split string, draft string, n_rows long, " + ", ".join(
        f"fail_{c} long" for c in check_names
    )

    def fold(table: pa.Table) -> pa.Table:
        split = table.column(SPLIT_COL)[0].as_py()
        flag_cols = {f"ok_{c}" for c in check_names}
        data_cols = [
            c for c in table.column_names
            if c != SPLIT_COL and c not in flag_cols
        ]
        struct = pa.StructArray.from_arrays(
            [table.column(c).combine_chunks() for c in data_cols], names=data_cols
        )
        draft = _arrow_struct_to_draft(struct, config)
        row = {
            "split": [split],
            "draft": [canonical_json(draft)],
            "n_rows": [table.num_rows],
        }
        for c in check_names:
            # fail = flag is exactly False; a null flag (check not evaluable)
            # is NOT a violation — same convention as the native path's
            # sum((~ok).cast(long)) and validate.row_violations' filter.
            is_fail = pc.fill_null(pc.invert(table.column(f"ok_{c}")), False)
            row[f"fail_{c}"] = [pc.sum(pc.cast(is_fail, pa.int64())).as_py() or 0]
        return pa.Table.from_pydict(row, schema=out_schema)

    return fold, ddl


def _per_split_records(df: DataFrame, flagged: DataFrame) -> list[dict]:
    """One (draft, n_rows, per-check fails) record per pending split.

    Preferred engine: ONE groupBy(split) over the scan with the codegen
    inference aggregates + fail counts — map-side partial aggregation means
    only KB-scale partial rows shuffle, never the data (an earlier
    ``repartition(split) → applyInArrow`` design shuffled every pending byte
    AND folded in Python).  Falls back to the grouped-Arrow fold for schema
    shapes the native builder doesn't cover.
    """
    from .operators.infer_native import NativeInferencePlan, UnsupportedSchema

    data_cols = [c for c in df.columns if c != SPLIT_COL]
    try:
        plan = NativeInferencePlan(df.select(*data_cols))
        if plan.explode_aggs:
            raise UnsupportedSchema("float-element arrays need explode jobs")
    except UnsupportedSchema:
        check_names = list(ROW_CHECKS)
        fold, out_ddl = _fold_split_factory(check_names)
        return [
            r.asDict()
            for r in flagged.repartition(SPLIT_COL)
            .groupBy(SPLIT_COL)
            .applyInArrow(fold, out_ddl)
            .collect()
        ]

    aggs = list(plan.builder.exprs)
    for c in ROW_CHECKS:
        aggs.append(F.sum((~F.col(f"ok_{c}")).cast("long")).alias(f"fail_{c}"))
    projected = plan.builder.project(
        flagged, F.col(SPLIT_COL), *[F.col(f"ok_{c}") for c in ROW_CHECKS]
    )
    out = []
    for r in projected.groupBy(SPLIT_COL).agg(*aggs).collect():
        d = r.asDict()
        schema, n_rows = plan.finalize(d)
        rec = {
            "split": d[SPLIT_COL],
            "draft": canonical_json(schema),
            "n_rows": n_rows,
        }
        for c in ROW_CHECKS:
            rec[f"fail_{c}"] = d[f"fail_{c}"]
        out.append(rec)
    return out


def checkpointed_validate(
    spark: SparkSession,
    data_path: str,
    state_dir: str | Path,
    max_splits: Optional[int] = None,
    store=None,
) -> dict:
    """Schema-infer + constraint-validate the spans table, resumably.

    1. enumerate splits (input files) from the scan metadata;
    2. skip splits already committed to the state store (resume);
    3. per pending split: draft schema + per-check failure counts in ONE
       groupBy(split) codegen aggregate (map-side partials; Arrow-fold
       fallback for exotic schemas — see _per_split_records);
    4. commit the batch as ONE MERGE-shaped snapshot (lineage+metrics table);
    5. final answer = tree-fold of ALL committed drafts + metric sums.

    ``max_splits`` lets tests simulate a kill after K splits.  ``store``
    overrides the default parquet-snapshot TableStateStore with any object
    exposing the same ``committed()``/``merge()`` contract — the Iceberg
    deployment passes sources.iceberg.IcebergStateStore (MERGE INTO) here,
    sharing this exact validation path (r3, VERDICT item 7).
    Returns {"schema", "n_rows", "fails", "splits_total",
    "splits_committed", "splits_computed_this_run", "lineage"}.
    """
    if store is None:
        store = TableStateStore(state_dir)
    # same normalized full-path key as validate.split_column() — one split
    # identity across verdicts, oracles, and the state store (ADVICE r2).
    df = spark.read.parquet(data_path).withColumn(SPLIT_COL, split_column())
    all_splits = [r[0] for r in df.select(SPLIT_COL).distinct().collect()]
    done = store.committed()
    pending = sorted(s for s in all_splits if s not in done)
    if max_splits is not None:
        pending = pending[:max_splits]

    computed = 0
    if pending:
        flagged = with_check_flags(df.filter(F.col(SPLIT_COL).isin(pending)))
        t0 = time.time()
        results = _per_split_records(df, flagged)
        elapsed = time.time() - t0
        now = time.time()
        for rec in results:
            rec["committed_at"] = now
            rec["wall_s_batch"] = round(elapsed, 3)
        store.merge(results)  # ONE MERGE commit for the batch
        computed = len(results)

    done = store.committed()
    acc: Optional[Schema] = None
    n_rows = 0
    fails = {c: 0 for c in ROW_CHECKS}
    lineage = []
    for split in sorted(done):
        rec = done[split]
        acc = unify_opt(acc, parse_schema(rec["draft"]))
        n_rows += rec["n_rows"]
        for c in ROW_CHECKS:
            fails[c] += rec.get(f"fail_{c}", 0)
        lineage.append(
            {
                "split": rec["split"],
                "n_rows": rec["n_rows"],
                "passed": all(rec.get(f"fail_{c}", 0) == 0 for c in ROW_CHECKS),
            }
        )
    return {
        "schema": acc,
        "n_rows": n_rows,
        "fails": fails,
        "splits_total": len(all_splits),
        "splits_committed": len(done),
        "splits_computed_this_run": computed,
        "lineage": lineage,
    }
