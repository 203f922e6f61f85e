"""Wave-73 operator tests: effect-size report."""

import math
import random
import statistics

import pytest

from jsons_to_schema_spark.operators.stats import effect_size_report


def _df(spark, vals, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v),) for v in vals], "v double"
    ).repartition(parts)


def _es(spark, a, b, lo=0.0, hi=1000.0, bins=64):
    return effect_size_report(
        _df(spark, a), _df(spark, b), "v", lo, hi, bins
    ).collect()[0].asDict()


def _brute_es(a, b):
    a = [round(round(v, 6) * 1e6) for v in a if v is not None]
    b = [round(round(v, 6) * 1e6) for v in b if v is not None]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na / 1e6, sum(b) / nb / 1e6
    va = statistics.variance([x / 1e6 for x in a])
    vb = statistics.variance([x / 1e6 for x in b])
    pooled = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = (mb - ma) / pooled
    wins = sum(
        1.0 if y > x else (0.5 if y == x else 0.0) for x in a for y in b
    )
    cles = wins / (na * nb)
    return na, nb, round(d, 6), round(2 * cles - 1, 6), round(cles, 6)


def test_effect_size_known_shift(spark):
    rng = random.Random(7301)
    a = [rng.gauss(50, 10) for _ in range(400)]
    b = [rng.gauss(55, 10) for _ in range(400)]  # half-sigma shift
    got = _es(spark, a, b)
    assert 0.3 < got["cohens_d"] < 0.7     # d ≈ 0.5
    assert 0.15 < got["cliffs_delta"] < 0.4
    assert got["cles"] > 0.55              # P(B > A) ≈ 0.64 at d = 0.5


def test_effect_size_brute_parity_with_ties(spark):
    rng = random.Random(7302)
    a = [float(rng.randint(0, 15)) for _ in range(70)] + [None]
    b = [float(rng.randint(3, 18)) for _ in range(55)]
    got = _es(spark, a, b, bins=5)
    na, nb, d, delta, cles = _brute_es(a, b)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["cohens_d"] - d) < 2e-6
    assert got["cliffs_delta"] == delta and got["cles"] == cles


def test_effect_size_identical_zero(spark):
    vals = [float(v) for v in range(50)]
    got = _es(spark, vals, list(vals))
    assert got["cohens_d"] == 0.0
    assert got["cliffs_delta"] == 0.0 and got["cles"] == 0.5


def test_effect_size_scale_free_rank_metrics(spark):
    # Cliff's delta is invariant under monotone transforms; d is not
    rng = random.Random(7303)
    a = [rng.uniform(1, 10) for _ in range(100)]
    b = [rng.uniform(2, 11) for _ in range(100)]
    base = _es(spark, a, b, hi=20.0)
    warped = _es(spark, [v ** 3 for v in a], [v ** 3 for v in b], hi=2000.0)
    assert base["cliffs_delta"] == warped["cliffs_delta"]
    assert base["cohens_d"] != warped["cohens_d"]
