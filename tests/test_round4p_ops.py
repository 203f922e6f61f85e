"""Wave-46 operator tests: nested path profile."""

import pytest
from pyspark.sql import Row

from jsons_to_schema_spark.operators.stats import nested_path_profile
from jsons_to_schema_spark.plans import audit


def _profile(spark, rows, schema, top_k=3):
    df = spark.createDataFrame(rows, schema).repartition(3)
    out = nested_path_profile(df, top_k=top_k).collect()
    byp = {}
    for r in out:
        byp.setdefault(r["path"], {"n": r["n"], "n_null": r["n_null"],
                                   "n_distinct": r["n_distinct"], "top": {}})
        if r["rank"] is not None:
            byp[r["path"]]["top"][r["rank"]] = (r["value"], r["value_count"])
    return byp


def test_profile_deep_struct_and_array(spark):
    schema = (
        "id long, meta struct<lang:string, src:struct<site:string>>, "
        "tags array<string>"
    )
    rows = [
        (1, ("en", ("a.com",)), ["x", "y"]),
        (2, ("en", ("b.com",)), ["x"]),
        (3, ("de", (None,)), []),
        (4, (None, None), None),
    ]
    got = _profile(spark, rows, schema)
    assert got["id"]["n"] == 4 and got["id"]["n_distinct"] == 4
    assert got["meta.lang"]["n"] == 4 and got["meta.lang"]["n_null"] == 1
    assert got["meta.lang"]["top"][1] == ("en", 2)
    # struct-of-struct descent; NULL parent struct yields NULL leaf
    assert got["meta.src.site"]["n_null"] == 2
    # array leaf at ELEMENT grain: 3 elements total (empty/NULL arrays gone)
    assert got["tags[]"]["n"] == 3
    assert got["tags[]"]["top"][1] == ("x", 2)
    assert got["tags[]"]["top"][2] == ("y", 1)


def test_profile_all_null_leaf_keeps_aggregate_row(spark):
    rows = [(1, None), (2, None)]
    got = _profile(spark, rows, "id long, dead string")
    assert got["dead"] == {"n": 2, "n_null": 2, "n_distinct": 0, "top": {}}


def test_profile_tie_break_by_value(spark):
    rows = [(1, "b"), (2, "a"), (3, "a"), (4, "b"), (5, "c")]
    got = _profile(spark, rows, "id long, v string", top_k=2)
    assert got["v"]["top"][1] == ("a", 2)  # tie with b -> value asc
    assert got["v"]["top"][2] == ("b", 2)
    assert 3 not in got["v"]["top"]


def test_profile_array_of_struct_grain(spark):
    schema = "id long, xs array<struct<k:string, n:long>>"
    rows = [(1, [("p", 10), ("q", None)]), (2, [("p", 30)])]
    got = _profile(spark, rows, schema)
    assert got["xs[].k"]["n"] == 3 and got["xs[].k"]["top"][1] == ("p", 2)
    assert got["xs[].n"]["n_null"] == 1
    assert got["xs[].n"]["top"][1] == ("10", 1)  # string-canonical values


def test_profile_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError):
        nested_path_profile(df, top_k=0)
    plan = audit.formatted_plan(nested_path_profile(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
