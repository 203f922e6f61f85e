"""Structured-Streaming incremental schema merge: drain a directory source,
assert the snapshot equals the batch answer; then append new files and assert
incremental widening without refolding old data."""

import json

import pytest

from jsons_to_schema_spark.schema_algebra import canonical_json, jsons_to_schema
from jsons_to_schema_spark.streaming.incremental import (
    SchemaSnapshot,
    incremental_schema_stream,
)

DOCS_A = [{"a": 1}, {"a": 2, "b": "x"}] * 50
DOCS_B = [{"a": 2.5, "c": True}] * 30


def _write_json_parquet(spark, docs, path):
    spark.createDataFrame([(json.dumps(d),) for d in docs], "doc string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_incremental_stream_merges(spark, tmp_path):
    src = str(tmp_path / "src")
    snap_path = tmp_path / "snapshot.json"
    ckpt = str(tmp_path / "ckpt")

    _write_json_parquet(spark, DOCS_A, src)
    q = incremental_schema_stream(
        spark, src, snap_path, ckpt, source_schema="doc string", json_column="doc"
    )
    q.awaitTermination(120)
    snap = SchemaSnapshot(snap_path)
    schema, n, b = snap.read()
    assert n == len(DOCS_A)
    assert canonical_json(schema) == canonical_json(jsons_to_schema(DOCS_A))

    # append more files; resume stream from checkpoint — only new files fold
    _write_json_parquet(spark, DOCS_B, src)
    q2 = incremental_schema_stream(
        spark, src, snap_path, ckpt, source_schema="doc string", json_column="doc"
    )
    q2.awaitTermination(120)
    schema2, n2, b2 = snap.read()
    assert n2 == len(DOCS_A) + len(DOCS_B)
    assert b2 == b + 1
    assert canonical_json(schema2) == canonical_json(
        jsons_to_schema(DOCS_A + DOCS_B)
    )
