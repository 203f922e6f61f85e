"""Wave-82 operator tests: declared-mix conformance."""

import random

import pytest

from jsons_to_schema_spark.operators.stats import mix_conformance


def _df(spark, cats, parts=4):
    return spark.createDataFrame([(c,) for c in cats], "c string").repartition(parts)


def _mc(spark, cats, expected):
    out = mix_conformance(_df(spark, cats), "c", expected).collect()
    return {
        r["category"]: (
            r["observed"], r["expected_share"], r["expected_n"],
            r["chi2_term"], r["undeclared"],
        )
        for r in out
    }


def test_conforming_mix_small_chi2(spark):
    cats = ["a"] * 500 + ["b"] * 300 + ["c"] * 200
    got = _mc(spark, cats, {"a": 0.5, "b": 0.3, "c": 0.2})
    assert all(v[3] == 0.0 for v in got.values())
    assert got["a"] == (500, 0.5, 500.0, 0.0, False)


def test_deviating_and_missing_and_undeclared(spark):
    cats = ["a"] * 700 + ["b"] * 200 + ["ghost"] * 100
    got = _mc(spark, cats, {"a": 0.5, "b": 0.3, "c": 0.2})
    # declared but absent: full expected mass is the deviation
    assert got["c"][0] == 0 and got["c"][3] == 200.0
    # undeclared category: flagged, chi2 undefined
    assert got["ghost"] == (100, None, None, None, True)
    # deviation terms replay exactly
    assert got["a"][3] == round((700 - 500.0) ** 2 / 500.0, 6)
    assert got["b"][3] == round((200 - 300.0) ** 2 / 300.0, 6)


def test_brute_parity_random(spark):
    rng = random.Random(8201)
    cats = [rng.choice("abcd") for _ in range(1000)]
    exp = {"a": 0.25, "b": 0.25, "c": 0.25, "d": 0.25}
    got = _mc(spark, cats, exp)
    from collections import Counter

    cnt = Counter(cats)
    n = len(cats)
    for c, share in exp.items():
        e = share * n
        assert got[c][3] == round((cnt[c] - e) ** 2 / e, 6)


def test_validation(spark):
    with pytest.raises(ValueError):
        mix_conformance(_df(spark, ["a"]), "c", {})
    with pytest.raises(ValueError):
        mix_conformance(_df(spark, ["a"]), "c", {"a": 0.7})
    with pytest.raises(ValueError):
        mix_conformance(_df(spark, ["a"]), "c", {"a": 1.5, "b": -0.5})
