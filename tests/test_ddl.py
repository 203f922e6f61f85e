"""Pure DDL-generation tests (no Spark session) + one Spark round-trip:
the generated CREATE TABLE types must be parseable by Spark and accept the
documents the schema was inferred from."""

from __future__ import annotations

from jsons_to_schema_spark import ddl
from jsons_to_schema_spark.schema_algebra import (
    json_to_schema,
    jsons_to_schema,
    unify,
)


def test_draft_to_spark_type_scalars_and_mixed():
    assert ddl.draft_to_spark_type({"type": "integer"}) == "BIGINT"
    assert ddl.draft_to_spark_type({"type": "number"}) == "DOUBLE"
    assert ddl.draft_to_spark_type({"type": ["integer", "number"]}) == "DOUBLE"
    assert ddl.draft_to_spark_type({"type": ["integer", "null"]}) == "BIGINT"
    assert ddl.draft_to_spark_type({"type": "null"}) == "STRING"
    assert ddl.draft_to_spark_type({}) == "STRING"
    # heterogeneous degrades to STRING (canonical-JSON storage convention)
    assert ddl.draft_to_spark_type({"type": ["integer", "string"]}) == "STRING"


def test_draft_to_spark_type_nested():
    s = jsons_to_schema([{"a": 1, "b": {"c": [1.5]}, "d": ["x"]}])
    assert ddl.draft_to_spark_type(s) == (
        "STRUCT<`a`: BIGINT, `b`: STRUCT<`c`: ARRAY<DOUBLE>>, `d`: ARRAY<STRING>>"
    )
    # tuple-mode items widen into one element type
    t = {"type": "array", "items": [{"type": "integer"}, {"type": "number"}]}
    assert ddl.draft_to_spark_type(t) == "ARRAY<DOUBLE>"
    # empty object -> map (no property evidence)
    assert ddl.draft_to_spark_type({"type": "object"}) == "MAP<STRING,STRING>"


def test_create_table_ddl_required_not_null():
    s = jsons_to_schema([{"k": 1, "opt": "x"}, {"k": 2}])
    out = ddl.create_table_ddl(s, "local.db.t", partition_by=["k"])
    assert "`k` BIGINT NOT NULL" in out
    assert "`opt` STRING" in out and "`opt` STRING NOT NULL" not in out
    assert out.startswith("CREATE TABLE local.db.t (")
    assert out.endswith("USING iceberg PARTITIONED BY (`k`)")


def test_evolution_ddl_add_widen_dropnotnull():
    old = jsons_to_schema([{"k": 1, "tag": "a"}])
    new = unify(old, json_to_schema({"k": 2.5, "src": "web"}))
    stmts = ddl.evolution_ddl(old, new, "local.db.t")
    assert "ALTER TABLE local.db.t ALTER COLUMN k TYPE DOUBLE" in stmts
    assert "ALTER TABLE local.db.t ADD COLUMN src STRING" in stmts
    # tag/src requireds dropped (intersection) -> DROP NOT NULL for tag
    assert "ALTER TABLE local.db.t ALTER COLUMN tag DROP NOT NULL" in stmts
    # deterministic order on repeat
    assert stmts == ddl.evolution_ddl(old, new, "local.db.t")


def test_evolution_ddl_inexpressible_changes_become_comments():
    old = {"type": "object", "properties": {"k": {"type": "integer"}},
           "required": ["k"], "additionalProperties": False}
    new = {"type": "object", "properties": {"k": {"type": "string"}},
           "required": ["k"]}
    stmts = ddl.evolution_ddl(old, new, "t")
    assert any(s.startswith("-- no DDL:") and "k" in s for s in stmts)
    assert any("unsealed" in s for s in stmts)


def test_nested_evolution_paths():
    old = jsons_to_schema([{"meta": {"v": 1}}])
    new = unify(old, json_to_schema({"meta": {"v": 1, "lang": "en"}}))
    stmts = ddl.evolution_ddl(old, new, "t")
    assert "ALTER TABLE t ADD COLUMN meta.lang STRING" in stmts


def test_create_table_types_parse_and_accept_docs(spark):
    """Round-trip: every generated column type parses as a Spark DDL type
    and a DataFrame of the source docs can be created against it."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    docs = [
        {"k": 1, "name": "a", "scores": [1.5, 2.25], "meta": {"lang": "en"}},
        {"k": 2, "name": "b", "scores": [], "meta": {"lang": "de"}},
    ]
    s = jsons_to_schema(docs)
    fields = []
    for n, t, req in ddl.draft_to_columns(s):
        dt = _parse_datatype_string(t)  # raises on malformed DDL
        fields.append((n, dt, not req))
    st = StructType()
    for n, dt, nullable in fields:
        st = st.add(n, dt, nullable)
    df = spark.createDataFrame([tuple(d[n] for n, _, _ in fields) for d in docs], st)
    assert df.count() == 2
