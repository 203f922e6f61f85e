"""Wave-61 operator tests: exact 1-Wasserstein drift."""

import random

import pytest

from jsons_to_schema_spark.operators.drift import wasserstein_drift


def _df(spark, vals, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v),) for v in vals], "v double"
    ).repartition(parts)


def _w1(spark, a, b, lo=0.0, hi=1000.0, bins=64):
    r = wasserstein_drift(_df(spark, a), _df(spark, b), "v", lo, hi, bins).collect()[0]
    return r["n_a"], r["n_b"], r["w1"]


def _brute_w1(a, b):
    am = sorted(round(round(v, 6) * 1e6) for v in a if v is not None)
    bm = sorted(round(round(v, 6) * 1e6) for v in b if v is not None)
    na, nb = len(am), len(bm)
    pooled = sorted(set(am) | set(bm))
    area = 0
    for v, nxt in zip(pooled, pooled[1:]):
        ca = sum(1 for x in am if x <= v)
        cb = sum(1 for x in bm if x <= v)
        area += abs(ca * nb - cb * na) * (nxt - v)
    return na, nb, round(area / (na * nb) / 1e6, 6)


def test_w1_identical_zero_and_pure_shift(spark):
    vals = [1.0, 5.0, 7.5, 20.0, 100.0] * 10
    assert _w1(spark, vals, vals)[2] == 0.0
    shifted = [v + 12.25 for v in vals]
    # equal-n pure shift: W1 == the shift, exactly
    assert _w1(spark, vals, shifted)[2] == 12.25


def test_w1_hand_example(spark):
    # F_a jumps at 0, F_b at 10: area = 1.0 * 10 = 10
    assert _w1(spark, [0.0], [10.0]) == (1, 1, 10.0)
    # half the mass moved by 10 → W1 = 5
    assert _w1(spark, [0.0, 0.0], [0.0, 10.0])[2] == 5.0


@pytest.mark.parametrize("seed,bins", [(6101, 4), (6102, 64), (6103, 1024)])
def test_w1_brute_parity_and_bin_invariance(spark, seed, bins):
    rng = random.Random(seed)
    a = [round(rng.uniform(0, 900), 2) for _ in range(300)] + [None]
    b = [round(rng.expovariate(0.01), 2) for _ in range(200)]
    b = [v for v in b if v < 1000]
    assert _w1(spark, a, b, bins=bins) == _brute_w1(a, b)


def test_w1_units_are_metric_units(spark):
    # the defining property vs KS: doubling the shift doubles W1
    vals = [float(i) for i in range(100)]
    w_small = _w1(spark, vals, [v + 3.0 for v in vals])[2]
    w_big = _w1(spark, vals, [v + 6.0 for v in vals])[2]
    assert w_small == 3.0 and w_big == 6.0


def test_w1_validation(spark):
    with pytest.raises(ValueError):
        _w1(spark, [1.0], [2.0], lo=5.0, hi=1.0)
