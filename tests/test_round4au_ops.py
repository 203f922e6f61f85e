"""Wave-80 operator tests: grouped Wasserstein drift."""

import random

import pytest

from jsons_to_schema_spark.operators.drift import (
    wasserstein_drift,
    wasserstein_drift_grouped,
)


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, None if v is None else float(v)) for g, v in rows],
        "g string, v double",
    ).repartition(parts)


def _gw1(spark, a, b, bins=64, lo=0.0, hi=1000.0):
    out = wasserstein_drift_grouped(
        _df(spark, a), _df(spark, b), "v", "g", lo, hi, bins
    ).collect()
    return {r["g"]: (r["n_a"], r["n_b"], r["w1"]) for r in out}


def test_grouped_matches_global_per_group(spark):
    rng = random.Random(8001)
    a, b = [], []
    per_group = {}
    for g, shift in (("x", 0.0), ("y", 7.5), ("z", 30.0)):
        va = [round(rng.uniform(0, 500), 2) for _ in range(120)]
        vb = [v + shift for v in va]
        per_group[g] = (va, vb)
        a += [(g, v) for v in va]
        b += [(g, v) for v in vb]
    got = _gw1(spark, a, b)
    # each group's W1 equals the GLOBAL operator run on that group alone
    for g, (va, vb) in per_group.items():
        solo = wasserstein_drift(
            _df(spark, [(g, v) for v in va]).select("v"),
            _df(spark, [(g, v) for v in vb]).select("v"),
            "v", 0.0, 1000.0, 64,
        ).collect()[0]
        assert got[g] == (solo["n_a"], solo["n_b"], solo["w1"]), g
    # equal-n pure shifts read exactly in metric units
    assert got["x"][2] == 0.0
    assert got["y"][2] == 7.5
    assert got["z"][2] == 30.0


def test_grouped_one_sided_group_null(spark):
    a = [("only_a", 5.0), ("both", 1.0)]
    b = [("both", 2.0), ("only_b", 9.0)]
    got = _gw1(spark, a, b)
    assert got["only_a"] == (1, 0, None)
    assert got["only_b"] == (0, 1, None)
    assert got["both"] == (1, 1, 1.0)


def test_grouped_zero_single_partition(spark):
    from jsons_to_schema_spark.plans import audit

    rng = random.Random(8002)
    a = [(f"g{i % 4}", rng.uniform(0, 100)) for i in range(200)]
    b = [(f"g{i % 4}", rng.uniform(0, 100)) for i in range(200)]
    q = wasserstein_drift_grouped(
        _df(spark, a), _df(spark, b), "v", "g", 0.0, 100.0, 32
    )
    assert "SinglePartition" not in audit.formatted_plan(q)
