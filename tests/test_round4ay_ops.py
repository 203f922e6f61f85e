"""Wave-84 operator tests: order-statistic quantile CI."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import quantile_ci


def _df(spark, vals, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v),) for v in vals], "v double"
    ).repartition(parts)


def _ci(spark, vals, prob, bins=64, lo=0.0, hi=1000.0):
    return quantile_ci(_df(spark, vals), "v", prob, lo, hi, bins).collect()[0].asDict()


def _brute(vals, prob, z=1.959964):
    xs = sorted(v for v in vals if v is not None)
    n = len(xs)
    se = math.sqrt(n * prob * (1 - prob))
    r_pt = max(math.ceil(prob * n - 1e-9), 1)
    r_lo = max(math.floor(prob * n - z * se), 1)
    r_hi = min(math.ceil(prob * n + z * se), n)
    return n, r_pt, xs[r_pt - 1], int(r_lo), xs[int(r_lo) - 1], int(r_hi), xs[int(r_hi) - 1]


def test_ci_brackets_the_quantile(spark):
    rng = random.Random(8401)
    vals = [rng.gauss(500, 100) for _ in range(2000)]
    vals = [max(0.0, min(v, 999.0)) for v in vals]
    got = _ci(spark, vals, 0.5)
    assert got["ci_lo"] <= got["value"] <= got["ci_hi"]
    # at n=2000 the median CI is tight: a few percent of the IQR
    assert got["ci_hi"] - got["ci_lo"] < 25
    # and the true distribution median (500) sits inside it
    assert got["ci_lo"] < 500 < got["ci_hi"]


def test_ci_brute_parity(spark):
    rng = random.Random(8402)
    for prob in (0.25, 0.5, 0.9):
        vals = [round(rng.uniform(0, 900), 2) for _ in range(500)] + [None]
        got = _ci(spark, vals, prob)
        n, r_pt, v, r_lo, v_lo, r_hi, v_hi = _brute(vals, prob)
        assert (got["n"], got["rank"], got["value"]) == (n, r_pt, v)
        assert (got["rank_lo"], got["ci_lo"]) == (r_lo, v_lo)
        assert (got["rank_hi"], got["ci_hi"]) == (r_hi, v_hi)


def test_ci_clamps_at_edges(spark):
    vals = [float(i) for i in range(10)]
    got = _ci(spark, vals, 0.9)
    assert got["rank_hi"] == 10 and got["ci_hi"] == 9.0  # clamped to max
    got2 = _ci(spark, vals, 0.1)
    assert got2["rank_lo"] == 1 and got2["ci_lo"] == 0.0


def test_ci_validation(spark):
    with pytest.raises(ValueError):
        _ci(spark, [1.0], 0.0)
    with pytest.raises(ValueError):
        _ci(spark, [1.0], 1.0)
