"""Wave-67 operator tests: Cohen's kappa and capture-recapture."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import capture_recapture, cohens_kappa


def _kdf(spark, rows, parts=4):
    return spark.createDataFrame(rows, "a string, b string").repartition(parts)


def _kappa(spark, rows):
    return cohens_kappa(_kdf(spark, rows), "a", "b").collect()[0].asDict()


def test_kappa_perfect_and_chance(spark):
    rows = [(l, l) for l in "xyxyxyzz" * 10]
    got = _kappa(spark, [(a, b) for a, b in rows])
    assert got["kappa"] == 1.0 and got["p_observed"] == 1.0
    # independent raters: kappa near 0 despite decent raw agreement
    rng = random.Random(6701)
    rows2 = [(rng.choice("xy"), rng.choice("xy")) for _ in range(2000)]
    got2 = _kappa(spark, rows2)
    assert abs(got2["kappa"]) < 0.1
    assert got2["p_observed"] > 0.4  # raw agreement looks fine — the trap


def test_kappa_constant_raters_undefined(spark):
    rows = [("ok", "ok")] * 50
    got = _kappa(spark, rows)
    assert got["p_expected"] == 1.0 and got["kappa"] is None


def test_kappa_brute_parity_with_nulls(spark):
    rng = random.Random(6702)
    labels = ["a", "b", "c", None]
    rows = [(rng.choice(labels), rng.choice(labels)) for _ in range(500)]
    got = _kappa(spark, rows)
    keep = [(a, b) for a, b in rows if a is not None and b is not None]
    n = len(keep)
    po = sum(1 for a, b in keep if a == b) / n
    cats = sorted({x for p in keep for x in p})
    pe = sum(
        (sum(1 for a, _ in keep if a == c) / n)
        * (sum(1 for _, b in keep if b == c) / n)
        for c in cats
    )
    assert got["n"] == n
    assert got["p_observed"] == round(po, 6)
    assert abs(got["p_expected"] - pe) < 1e-6
    assert abs(got["kappa"] - (po - pe) / (1 - pe)) < 1e-5


def _cdf(spark, keys, parts=4):
    return spark.createDataFrame([(k,) for k in keys], "k string").repartition(parts)


def test_capture_recapture_recovers_population(spark):
    rng = random.Random(6703)
    population = [f"doc{i}" for i in range(5000)]
    a = rng.sample(population, 1200)
    b = rng.sample(population, 1500)
    got = capture_recapture(_cdf(spark, a), _cdf(spark, b), "k").collect()[0]
    assert got["n_a"] == 1200 and got["n_b"] == 1500
    m = len(set(a) & set(b))
    assert got["n_overlap"] == m
    est = (1201 * 1501) / (m + 1) - 1
    assert got["n_est"] == round(est, 6)
    # the estimate lands near the truth (within ~4 SE)
    assert abs(est - 5000) < 4 * got["std_err"] + 1


def test_capture_recapture_dups_and_nulls_collapse(spark):
    a = ["x", "x", "y", None]
    b = ["y", "z", None, None]
    got = capture_recapture(_cdf(spark, a), _cdf(spark, b), "k").collect()[0]
    assert (got["n_a"], got["n_b"], got["n_overlap"]) == (2, 2, 1)
    assert got["n_est"] == round(3 * 3 / 2 - 1, 6)


def test_capture_recapture_zero_overlap(spark):
    got = capture_recapture(
        _cdf(spark, ["a", "b"]), _cdf(spark, ["c", "d"]), "k"
    ).collect()[0]
    assert got["n_overlap"] == 0
    assert got["n_est"] == 8.0  # 3*3/1 - 1
    assert got["std_err"] == round(math.sqrt(3 * 3 * 2 * 2 / (1 * 1 * 2)), 6)
    assert got["std_err"] > got["n_est"] / 2  # honest wide uncertainty
