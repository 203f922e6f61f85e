"""Wave-65 operator tests: rare combinations and mirror columns."""

import hashlib
import random

import pytest

from jsons_to_schema_spark.operators.stats import (
    mirror_columns_report,
    rare_combinations,
)


def _cdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id bigint, a string, b string",
    ).repartition(parts)


def _rare(spark, rows, max_count=1):
    out = rare_combinations(
        _cdf(spark, rows), ["a", "b"], max_count, ["id"]
    ).collect()
    return {r["id"]: (r["a"], r["b"], r["combo_count"]) for r in out}


def test_rare_combinations_flags_composite_typos(spark):
    rows = [("R", "O")] + [("R", "F")] * 50 + [("N", "O")] * 50
    got = _rare(spark, rows, max_count=1)
    assert got == {0: ("R", "O", 1)}  # valid values, contradictory tuple


def test_rare_combinations_null_is_a_category(spark):
    rows = [("x", None)] * 2 + [("x", "y")] * 30 + [(None, None)]
    got = _rare(spark, rows, max_count=2)
    assert set(got.values()) == {("x", None, 2), (None, None, 1)}
    assert len(got) == 3


def test_rare_combinations_threshold(spark):
    rows = [("a", "1")] * 3 + [("b", "2")] * 5
    assert _rare(spark, rows, max_count=2) == {}
    assert len(_rare(spark, rows, max_count=3)) == 3
    with pytest.raises(ValueError):
        _rare(spark, rows, max_count=0)


def _mdf(spark, rows, schema, parts=4):
    return spark.createDataFrame(rows, schema).repartition(parts)


def test_mirror_columns_detects_copies(spark):
    rows = [(i, f"v{i}", f"v{i}", f"w{i}", None if i % 3 else f"v{i}")
            for i in range(50)]
    df = _mdf(spark, rows, "k bigint, c1 string, c2 string, c3 string, c4 string")
    got = {(r["col_a"], r["col_b"]) for r in
           mirror_columns_report(df, "k").collect()}
    assert got == {("c1", "c2")}  # c4 differs where NULL


def test_mirror_columns_null_vs_null_string(spark):
    rows = [(1, None, "\x00<NULL>\x00"), (2, "x", "x")]
    df = _mdf(spark, rows, "k bigint, c1 string, c2 string")
    # the reserved-token coalesce must NOT alias a real string to NULL:
    # n_null differs, so the triple check rejects the pair
    assert mirror_columns_report(df, "k").count() == 0


def test_mirror_columns_numeric_same_values(spark):
    rows = [(i, float(i % 7), float(i % 7), float(i % 5)) for i in range(60)]
    df = _mdf(spark, rows, "k bigint, x double, y double, z double")
    got = {(r["col_a"], r["col_b"]) for r in
           mirror_columns_report(df, "k").collect()}
    assert got == {("x", "y")}


def test_mirror_columns_order_free(spark):
    rng = random.Random(6501)
    rows = [(i, str(rng.randrange(100)), None) for i in range(200)]
    rows = [(k, v, v) for k, v, _ in rows]
    for parts in (1, 8):
        df = _mdf(spark, rows, "k bigint, p string, q string", parts=parts)
        out = mirror_columns_report(df, "k").collect()
        assert len(out) == 1 and out[0]["n"] == 200
