"""Native-aggregate inference must be byte-identical to the Arrow
accumulator on every corpus, plus edge cases the builder must get right."""

import pytest

from pyspark.sql import Row, functions as F

from jsons_to_schema_spark.operators.infer import infer_from_struct
from jsons_to_schema_spark.operators.infer_native import (
    UnsupportedSchema,
    infer_from_struct_native,
)
from jsons_to_schema_spark.schema_algebra import SchemaGenerationConfig, canonical_json
from jsons_to_schema_spark.sources.spans import ensure_corpus
from jsons_to_schema_spark.sources.tables import load_spans, load_table

from .conftest import SF_ORACLE


def _assert_engines_agree(df, config=None):
    cfg = config or SchemaGenerationConfig()
    native = infer_from_struct(df, cfg, engine="native")
    arrow = infer_from_struct(df, cfg, engine="arrow")
    assert canonical_json(native[0]) == canonical_json(arrow[0])
    assert native[1] == arrow[1]
    return native[0]


def test_agree_on_spans_corpus(spark):
    df = load_spans(spark, ensure_corpus(5000))
    schema = _assert_engines_agree(df)
    assert "doc_id" in schema["required"]


def test_agree_on_driver_tables(spark):
    for t in ("documents", "events", "embeddings", "lineitem"):
        _assert_engines_agree(load_table(spark, SF_ORACLE, t))


def test_agree_sealed_config(spark):
    df = load_spans(spark, ensure_corpus(2000))
    _assert_engines_agree(df, SchemaGenerationConfig(seal_object_properties=True))


def test_edge_cases(spark):
    rows = [
        Row(a=1.0, b=None, c=[1, None, 3], d=Row(x=None, y="s"), e=[]),
        Row(a=2.0, b=None, c=None, d=None, e=[]),
    ]
    df = spark.createDataFrame(
        rows,
        "a double, b string, c array<long>, d struct<x:long, y:string>, e array<string>",
    )
    schema = _assert_engines_agree(df)
    # integral doubles → integer; all-null b → absent; null array element →
    # items type gains null; d present once, x never → only y; empty e → no items
    assert schema["properties"]["a"] == {"type": "integer"}
    assert "b" not in schema["properties"]
    assert schema["properties"]["c"]["items"]["type"] == ["integer", "null"]
    assert schema["properties"]["d"]["properties"] == {"y": {"type": "string"}}
    assert schema["properties"]["d"]["required"] == ["y"]
    assert "items" not in schema["properties"]["e"]
    assert sorted(schema["required"]) == ["a", "e"]


def test_non_integral_floats(spark):
    df = spark.createDataFrame([(1.5,), (2.0,)], "v double")
    schema, _ = infer_from_struct_native(df)
    assert schema["properties"]["v"] == {"type": "number"}


def test_all_null_array_elements(spark):
    df = spark.createDataFrame([([None, None],)], "v array<string>")
    schema = _assert_engines_agree(df)
    assert schema["properties"]["v"]["items"] == {"type": "null"}


def test_unsupported_falls_back(spark):
    df = spark.createDataFrame([([[1, 2], [3]],)], "v array<array<long>>")
    with pytest.raises(UnsupportedSchema):
        infer_from_struct_native(df)
    schema, n = infer_from_struct(df)  # auto → arrow fallback
    assert n == 1
    assert schema["properties"]["v"]["items"]["type"] == "array"


def test_native_plan_is_codegen_only(spark):
    from jsons_to_schema_spark.operators.infer_native import NativeInferencePlan
    from jsons_to_schema_spark.plans import audit

    df = load_spans(spark, ensure_corpus(2000))
    plan = NativeInferencePlan(df)
    # spans has no float elements → element stats fold into the row-level
    # multi-aggregate (sum(size(array_compact(...)))); NO explode job at all
    assert len(plan.explode_aggs) == 0
    # a float-element array still needs its integrality explode job
    fdf = spark.createDataFrame([([1.0, 2.5],)], "xs array<double>")
    assert len(NativeInferencePlan(fdf).explode_aggs) == 1
    for agg_df in [plan.row_agg, *plan.explode_aggs]:
        assert audit.scan_count(agg_df) == 1
        assert audit.has_partial_aggregate(agg_df)
        p = audit.executed_plan(agg_df)
        assert "EvalPython" not in p  # zero Python
        # The only lambdas allowed are array_compact's internal null-filter
        # (a single-pass, single-allocation HOF — measured fine); the
        # multi-allocation HOF shapes (transform/slice/zip_with chains) that
        # killed scaling must never reappear.
        for banned in ("zip_with", "transform(", "slice("):
            assert banned not in p, banned


def test_size_of_null_legacy_conf_regression(spark):
    """Under ansi=false + spark.sql.legacy.sizeOfNull=true (the Spark 3.x
    default stack), size(NULL) is -1 — the element-count aggregates must not
    let null array rows subtract from the counts (each null row would
    otherwise silently erase one element, dropping `items` entirely on
    [null, null, [1]])."""
    df = spark.createDataFrame([(None,), (None,), ([1],)], "xs array<long>")
    confs = {"spark.sql.ansi.enabled": "false", "spark.sql.legacy.sizeOfNull": "true"}
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        schema = _assert_engines_agree(df)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert schema["properties"]["xs"] == {
        "type": "array",
        "items": {"type": "integer"},
    }


def test_spark_side_merge_equals_pure_merge(spark):
    """r3: the audit's Spark-side sum/bool_and re-aggregate must equal the
    pure merge_partial_rows fold over the same per-partition report rows
    (and both must equal the global single-agg run)."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators.infer_native import (
        NativeInferencePlan,
        merge_partial_rows,
    )
    from jsons_to_schema_spark.sources.spans import ensure_corpus
    from jsons_to_schema_spark.sources.tables import load_spans

    spans_df = load_spans(spark, ensure_corpus(5000))

    plan = NativeInferencePlan(spans_df)
    per_part = (
        plan.builder.project(spans_df, F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(*plan.builder.exprs)
    )
    rows = [r.asDict() for r in per_part.collect()]
    pure = merge_partial_rows(rows, plan.builder.merges)

    spark_merged = (
        per_part.agg(
            *[
                (F.sum(a) if op == "sum" else F.bool_and(F.col(a))).alias(a)
                for a, op in plan.builder.merges.items()
            ]
        )
        .first()
        .asDict()
    )
    assert plan.finalize(spark_merged) == plan.finalize(pure) == plan.run()
