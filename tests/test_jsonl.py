"""JSONL source: EP1 file-ingest front-end agreement + export determinism."""

import hashlib

from jsons_to_schema_spark.operators.infer import infer_from_struct
from jsons_to_schema_spark.schema_algebra import canonical_json
from jsons_to_schema_spark.sources.jsonl import (
    export_table_jsonl,
    infer_jsonl,
    read_jsonl,
)
from jsons_to_schema_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_jsonl_frontend_agrees_with_struct_frontend(spark):
    """The JSON-file front-end and the parquet-struct front-end must unify
    to the SAME schema over the same rows — two entries into one algebra."""
    path = export_table_jsonl(SF, "documents", "doc_id")
    s_json, n_json = infer_jsonl(spark, path)
    docs = load_table(spark, SF, "documents")
    s_struct, n_struct = infer_from_struct(docs)
    assert n_json == n_struct == docs.count()
    assert canonical_json(s_json) == canonical_json(s_struct)


def test_jsonl_scan_is_distributed(spark):
    """Line scan parallelizes: no single-partition collapse, no Python eval
    below the inference kernel."""
    path = export_table_jsonl(SF, "documents", "doc_id")
    df = read_jsonl(spark, path)
    assert df.count() == load_table(spark, SF, "documents").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan text" in plan


def test_export_is_idempotent_and_deterministic(tmp_path):
    p1 = export_table_jsonl(SF, "documents", "doc_id")
    h1 = hashlib.md5(p1.read_bytes()).hexdigest()
    p2 = export_table_jsonl(SF, "documents", "doc_id")  # cached: same file
    assert p1 == p2
    # regenerate from scratch in an isolated cache → identical bytes
    import jsons_to_schema_spark.sources.jsonl as j

    old = j._CACHE_BASE
    j._CACHE_BASE = tmp_path
    try:
        p3 = export_table_jsonl(SF, "documents", "doc_id")
    finally:
        j._CACHE_BASE = old
    assert p3 != p1
    assert hashlib.md5(p3.read_bytes()).hexdigest() == h1


def test_with_json_validity_quarantine_arms(spark):
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.sources.jsonl import with_json_validity

    df = spark.createDataFrame(
        [
            ('{"a": 1}',),
            ("42",),            # bare scalar IS valid JSON
            ("[1, 2]",),
            ("{broken",),
            ("",),
            (None,),
        ],
        "json string",
    )
    rows = with_json_validity(df).collect()
    got = {r.json: r.is_valid for r in rows}
    assert got['{"a": 1}'] and got["42"] and got["[1, 2]"]
    assert not got["{broken"] and not got[""] and not got[None]
    # JVM-side: no Python stage in the plan
    plan = with_json_validity(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
