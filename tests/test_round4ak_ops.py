"""Wave-68 operator tests: Mann-Whitney U and Kruskal-Wallis."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import kruskal_wallis, mann_whitney_u


def _vdf(spark, vals, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v),) for v in vals], "v double"
    ).repartition(parts)


def _mwu(spark, a, b, bins=64, lo=0.0, hi=1000.0):
    return mann_whitney_u(
        _vdf(spark, a), _vdf(spark, b), "v", lo, hi, bins
    ).collect()[0].asDict()


def _brute_mwu(a, b):
    a = [v for v in a if v is not None]
    b = [v for v in b if v is not None]
    na, nb = len(a), len(b)
    u = 0.0
    for x in a:
        for y in b:
            u += 1.0 if x > y else (0.5 if x == y else 0.0)
    pooled = sorted(a + b)
    from collections import Counter

    tie = sum(t ** 3 - t for t in Counter(pooled).values())
    n = na + nb
    var = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var) if var > 0 else None
    return na, nb, round(u, 6), None if z is None else round(z, 6)


def test_mwu_shifted_distributions_significant(spark):
    rng = random.Random(6801)
    a = [rng.expovariate(0.05) for _ in range(150)]
    b = [v + 10 for v in (rng.expovariate(0.05) for _ in range(150))]
    got = _mwu(spark, a, b)
    # u_a counts A's cross-pair wins; B shifted UP → z strongly negative
    assert got["significant"] is True and got["z_stat"] < -3


def test_mwu_brute_parity_with_ties(spark):
    rng = random.Random(6802)
    a = [float(rng.randint(0, 20)) for _ in range(60)] + [None]
    b = [float(rng.randint(5, 25)) for _ in range(45)]
    got = _mwu(spark, a, b, bins=7)
    na, nb, u, z = _brute_mwu(a, b)
    assert (got["n_a"], got["n_b"], got["u_a"], got["z_stat"]) == (na, nb, u, z)


def test_mwu_identical_sets_u_half(spark):
    vals = [float(v) for v in range(40)]
    got = _mwu(spark, vals, list(vals))
    assert got["u_a"] == 40 * 40 / 2  # perfect symmetry
    assert got["significant"] is False


def test_mwu_outlier_robustness_vs_welch(spark):
    # one wild value shifts the MEAN but barely the ranks
    a = [10.0 + i * 0.01 for i in range(100)]
    b = [10.05 + i * 0.01 for i in range(99)] + [100000.0]
    got = _mwu(spark, a, b, hi=200000.0)
    z_with = got["z_stat"]
    b2 = [10.05 + i * 0.01 for i in range(100)]
    z_without = _mwu(spark, a, b2, hi=200000.0)["z_stat"]
    assert abs(z_with - z_without) < 0.5  # the outlier moved one rank


def _kdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    ).repartition(parts)


def _brute_kw(rows):
    from collections import Counter

    vals = sorted(v for _, v in rows)
    n = len(vals)
    cnt = Counter(vals)
    # average ranks
    r = {}
    start = 1
    for v in sorted(cnt):
        t = cnt[v]
        r[v] = start + (t - 1) / 2
        start += t
    groups = sorted({g for g, _ in rows})
    hsum = 0.0
    for g in groups:
        vs = [v for gg, v in rows if gg == g]
        rg = sum(r[v] for v in vs)
        hsum += rg * rg / len(vs)
    h = 12 / (n * (n + 1)) * hsum - 3 * (n + 1)
    tie = sum(t ** 3 - t for t in cnt.values())
    corr = 1 - tie / (n ** 3 - n)
    return len(groups), n, round(h / corr, 6) if corr > 0 else None


def test_kw_brute_parity(spark):
    rng = random.Random(6803)
    rows = [
        (rng.choice(["a", "b", "c", "d"]), float(rng.randint(0, 30)))
        for _ in range(300)
    ]
    got = kruskal_wallis(_kdf(spark, rows), "g", "v", 0.0, 50.0, 16).collect()[0]
    k, n, h = _brute_kw(rows)
    assert (got["k"], got["n"], got["h_stat"], got["df"]) == (k, n, h, k - 1)


def test_kw_separated_groups_large_h(spark):
    rng = random.Random(6804)
    rows = [("lo", rng.uniform(0, 10)) for _ in range(80)] + [
        ("hi", rng.uniform(50, 60)) for _ in range(80)
    ]
    got = kruskal_wallis(_kdf(spark, rows), "g", "v", 0.0, 100.0, 64).collect()[0]
    assert got["h_stat"] > 100  # total separation; chi2(1) 5% is 3.84


def test_kw_bin_invariance(spark):
    rng = random.Random(6805)
    rows = [(rng.choice("ab"), round(rng.uniform(0, 99), 1)) for _ in range(200)]
    outs = [
        kruskal_wallis(_kdf(spark, rows), "g", "v", 0.0, 100.0, b).collect()[0]["h_stat"]
        for b in (2, 64, 1024)
    ]
    assert outs[0] == outs[1] == outs[2]
