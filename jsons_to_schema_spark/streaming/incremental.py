"""Structured-Streaming wrapper: incremental schema unification.

The reference's ``schemasToSchema`` (EP2 — fold existing schemas) maps
naturally onto a streaming merge: each micro-batch folds its documents to one
draft schema, which is then unified with the persisted snapshot — legal
because unify is associative and the snapshot is a left-fold prefix.

``foreachBatch`` is the right tool (not a stateful operator): the state is a
single KB-scale schema value, not per-key state, so a driver-side snapshot
file + atomic replace beats ``applyInPandasWithState`` on every axis.  The
micro-batch fold reuses the exact batch engine (mapInArrow + treeAggregate)
from operators/infer.py.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.infer import infer_from_json_column, infer_from_struct
from ..schema_algebra import (
    DEFAULT_CONFIG,
    Schema,
    canonical_json,
    parse_schema,
    unify_opt,
)


class SchemaSnapshot:
    """Persisted unified-schema state: {schema, n_docs, n_batches,
    last_batch_id}.  The batch id makes the foreachBatch fold IDEMPOTENT
    under Spark's at-least-once replay (r3 review: without it a crash
    between snapshot write and checkpoint commit double-counted
    n_docs/n_batches on replay — unify itself is idempotent, the counters
    are not)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def read(self) -> tuple[Optional[Schema], int, int, int]:
        if not self.path.exists():
            return None, 0, 0, -1
        d = json.loads(self.path.read_text())
        return d["schema"], d["n_docs"], d["n_batches"], d.get("last_batch_id", -1)

    def write(
        self, schema: Schema, n_docs: int, n_batches: int, last_batch_id: int
    ) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(
            json.dumps(
                {
                    "schema": schema,
                    "n_docs": n_docs,
                    "n_batches": n_batches,
                    "last_batch_id": last_batch_id,
                },
                sort_keys=True,
            )
        )
        os.replace(tmp, self.path)


def make_schema_merge_batch_fn(
    snapshot: SchemaSnapshot,
    json_column: Optional[str] = None,
    config=DEFAULT_CONFIG,
):
    """foreachBatch callback: fold the micro-batch, unify with the snapshot,
    atomically persist.  json_column=None → structured (Arrow-native) mode."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev, prev_n, prev_b, last = snapshot.read()
        if batch_id <= last:
            return  # at-least-once replay of an already-applied batch
        if batch_df.isEmpty():
            return
        if json_column is not None:
            batch_schema, n = infer_from_json_column(batch_df, json_column, config)
        else:
            batch_schema, n = infer_from_struct(batch_df, config)
        merged = unify_opt(prev, batch_schema)
        snapshot.write(merged, prev_n + n, prev_b + 1, batch_id)

    return on_batch


def incremental_schema_stream(
    spark: SparkSession,
    source_dir: str,
    snapshot_path: str | Path,
    checkpoint_dir: str,
    source_format: str = "parquet",
    source_schema: Optional[str] = None,
    json_column: Optional[str] = None,
    available_now: bool = True,
):
    """readStream(source_dir) → foreachBatch schema merge → snapshot.

    With available_now=True this drains existing files and stops (the batch
    analog used in tests); on a cluster the same query tails the Iceberg/file
    source continuously.  Spark's checkpoint gives stable batch ids, and the
    snapshot records the last APPLIED id, so a replayed batch (foreachBatch
    is at-least-once) is skipped — unify is idempotent for the schema, and
    the id guard extends that to the n_docs/n_batches counters.
    """
    reader = spark.readStream.format(source_format)
    if source_schema:
        reader = reader.schema(source_schema)
    stream = reader.load(source_dir)
    snap = SchemaSnapshot(snapshot_path)
    writer = (
        stream.writeStream.foreachBatch(
            make_schema_merge_batch_fn(snap, json_column=json_column)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def schema_drift_alert_stream(
    spark: SparkSession,
    source_dir: str,
    snapshot_path: str | Path,
    alerts_path: str | Path,
    checkpoint_dir: str,
    source_format: str = "parquet",
    source_schema: Optional[str] = None,
    json_column: Optional[str] = None,
    available_now: bool = True,
    config=DEFAULT_CONFIG,
):
    """Streaming schema-DRIFT monitor: the incremental merge stream, plus an
    alert record whenever a micro-batch WIDENS the unified schema (new
    property, type widening, required drop, …) — the live twin of the batch
    drift checks.  Alerts are JSON lines {batch_id, n_docs, changes:[...],
    backward_compatible, forward_compatible}; the change list is
    schema_algebra.schema_diff(prev, merged) — an alert names exactly the
    paths that moved — and the compat booleans come from the subschema
    decision procedure (r3), so a consumer can gate on "safe widening" vs
    "reader-breaking change" instead of eyeballing the diff.  Batches that
    fit the known schema produce no alert — steady state writes nothing.
    Replay contract: applied batches are skipped via the snapshot's
    last_batch_id; a crash between the alert append and the snapshot write
    can re-append ONE alert with the same batch_id — alerts are
    at-least-once, keyed by batch_id for consumer dedupe.

    State is the same KB-scale snapshot as incremental_schema_stream
    (foreachBatch + atomic file replace — not per-key state, so
    applyInPandasWithState would be the wrong tool); exactly-once batch ids
    come from the stream checkpoint."""
    from ..schema_algebra import compat_report, schema_diff

    snap = SchemaSnapshot(snapshot_path)
    alerts = Path(alerts_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev, prev_n, prev_b, last = snap.read()
        if batch_id <= last:
            return  # replay of an applied batch: no re-fold, no dup alert
        if batch_df.isEmpty():
            return
        if json_column is not None:
            batch_schema, n = infer_from_json_column(batch_df, json_column, config)
        else:
            batch_schema, n = infer_from_struct(batch_df, config)
        merged = unify_opt(prev, batch_schema)
        if prev is None or canonical_json(merged) != canonical_json(prev):
            changes = schema_diff(prev, merged)
            # actionable verdicts, not just a change list: does the widened
            # snapshot still accept all OLD data (backward), and do NEW docs
            # still satisfy the old contract readers may be pinned to
            # (forward)?  Decided by the sound subschema procedure — a
            # "widening" that adds a typed property to an open object is
            # backward-INCOMPATIBLE, which a diff list alone never shows.
            rep = compat_report(prev, merged)
            with alerts.open("a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "batch_id": batch_id,
                            "n_docs": n,
                            "changes": changes,
                            "backward_compatible": rep["backward_compatible"],
                            "forward_compatible": rep["forward_compatible"],
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
        snap.write(merged, prev_n + n, prev_b + 1, batch_id)

    reader = spark.readStream.format(source_format)
    if source_schema:
        reader = reader.schema(source_schema)
    stream = reader.load(source_dir)
    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    source_schema: str = "doc_id long, text string",
    min_jaccard: float = 0.7,
    available_now: bool = True,
):
    """The continuously-ingesting dedup loop: every micro-batch is probed
    against the persisted corpus MinHash index (dedup.minhash_probe_index),
    near-duplicates of ANY already-accepted document are dropped, survivors
    are appended to both the accepted table and the index — so a duplicate
    arriving hours after its original (in a later batch) is still caught.

    Why foreachBatch and not a stateful operator: the "state" here is the
    corpus index — far too large for the state store, already persisted,
    and shared with the batch engine.

    Replay safety (foreachBatch is AT-LEAST-once, so every write must be
    replay-tolerant): the accepted table is written as one
    ``batch_id=<id>`` partition with OVERWRITE — a replayed batch replaces
    its own partition, never appends a second copy; the probe excludes
    self-matches (``new_id != corpus_id``), so a replay whose earlier
    attempt already appended this batch's rows to the index does not drop
    the batch as a "duplicate" of itself; and the index append is
    idempotent at the cost of duplicate bucket rows (probe results are
    distinct-ed, so verdicts stay correct — same tolerance the batch
    engine has for re-committed splits).  The one residual anomaly is
    duplicate index bucket/shingle rows after a crash between the two
    writes — extra candidate rows, never wrong verdicts.

    Within-batch duplicates: the batch is ALSO probed against itself via
    the batch LSH engine, keeping the min-id representative — so two copies
    arriving in one micro-batch don't both pass."""
    import json as _json
    from pathlib import Path as _Path

    from pyspark.sql import functions as F

    from ..operators import dedup

    # within-batch dedup must judge with the SAME parameters (and columns)
    # as the index probe (r3 review: hardcoded defaults made a duplicate's
    # fate depend on which micro-batch it arrived in)
    meta = _json.loads((_Path(index_dir) / "meta.json").read_text())

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # 1. within-batch: keep one representative per near-dup cluster
        pairs = dedup.minhash_lsh_pairs(
            batch_df,
            meta["col"],
            meta["id_col"],
            num_hashes=meta["num_hashes"],
            bands=meta["bands"],
            min_jaccard=min_jaccard,
            k=meta["k"],
        )
        local = dedup.assign_duplicate_clusters(batch_df, pairs, meta["id_col"])
        survivors = local.filter(F.col("keep")).select(*batch_df.columns)
        # 2. cross-batch: drop anything near-duplicating the accepted corpus.
        # new_id != corpus_id is the replay guard: after a crash between the
        # index append and the checkpoint advance, the re-run batch's own
        # rows are already in the index and must not reject the batch.
        hits = dedup.minhash_probe_index(
            spark, index_dir, survivors, min_jaccard=min_jaccard
        ).filter(F.col("new_id") != F.col("corpus_id"))
        clean = survivors.join(
            hits.select(F.col("new_id").alias(meta["id_col"])).distinct(),
            meta["id_col"],
            "left_anti",
        ).localCheckpoint(eager=True)  # used twice: table write + index append
        # 3. accept: idempotent per-batch partition overwrite, then index
        clean.write.mode("overwrite").parquet(
            f"{accepted_dir}/batch_id={batch_id}"
        )
        dedup.append_to_minhash_index(clean, index_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(source_schema)
        .load(source_dir)
    )
    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
