"""Wave-66 operator tests: one-way ANOVA and two-proportion z-test."""

import math
import random
import statistics

import pytest

from jsons_to_schema_spark.operators.stats import anova_report, proportions_ab_report


def _adf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    ).repartition(parts)


def _anova(spark, rows):
    return anova_report(_adf(spark, rows), "g", "v").collect()[0].asDict()


def _brute_anova(rows):
    q = [(g, round(round(v, 6) * 1e6)) for g, v in rows]
    groups = sorted({g for g, _ in q})
    k, n = len(groups), len(q)
    ssw = ssb = 0.0
    tot = sum(v for _, v in q)
    for g in groups:
        vs = [v for gg, v in q if gg == g]
        s1, s2, ng = sum(vs), sum(v * v for v in vs), len(vs)
        ssw += s2 - s1 * s1 / ng
        ssb += s1 * s1 / ng
    ssb -= tot * tot / n
    ssw /= 1e12
    ssb /= 1e12
    f = (ssb / (k - 1)) / (ssw / (n - k)) if k > 1 and n > k and ssw > 0 else None
    eta = ssb / (ssb + ssw) if ssb + ssw > 0 else None
    return k, n, None if f is None else round(f, 6), None if eta is None else round(eta, 6)


def test_anova_equal_groups_small_f(spark):
    rng = random.Random(6601)
    rows = [(g, rng.gauss(50, 5)) for g in "abcd" for _ in range(100)]
    got = _anova(spark, rows)
    assert got["k"] == 4 and got["df_between"] == 3 and got["df_within"] == 396
    assert got["f_stat"] < 4  # no real separation
    assert got["eta_sq"] < 0.05


def test_anova_separated_groups_large_f(spark):
    rng = random.Random(6602)
    rows = [("lo", rng.gauss(10, 1)) for _ in range(50)] + [
        ("hi", rng.gauss(50, 1)) for _ in range(50)
    ] + [("mid", rng.gauss(30, 1)) for _ in range(50)]
    got = _anova(spark, rows)
    assert got["f_stat"] > 1000 and got["eta_sq"] > 0.95


def test_anova_brute_parity(spark):
    rng = random.Random(6603)
    rows = [
        (rng.choice(["a", "b", "c"]), round(rng.uniform(0, 100), 3))
        for _ in range(200)
    ]
    got = _anova(spark, rows)
    k, n, f, eta = _brute_anova(rows)
    assert (got["k"], got["n"], got["f_stat"], got["eta_sq"]) == (k, n, f, eta)


def test_proportions_detects_rate_shift(spark):
    rows = [("control", i % 10 == 0) for i in range(2000)] + [
        ("treat", i % 5 == 0) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "arm string, conv boolean").repartition(4)
    got = proportions_ab_report(df, "arm", "conv", "control", "treat").collect()[0]
    assert got["rate_control"] == 0.1 and got["rate_treatment"] == 0.2
    assert got["significant"] is True and got["z_stat"] > 8


def test_proportions_null_flags_and_no_shift(spark):
    rows = [("control", i % 7 == 0) for i in range(700)] + [
        ("treat", i % 7 == 0) for i in range(700)
    ] + [("treat", None)] * 5
    df = spark.createDataFrame(rows, "arm string, conv boolean").repartition(4)
    got = proportions_ab_report(df, "arm", "conv", "control", "treat").collect()[0]
    assert got["n_treatment"] == 700  # NULL flags excluded
    assert got["abs_diff"] == 0.0 and got["significant"] is False


def test_proportions_replay(spark):
    rng = random.Random(6604)
    rows = [(rng.choice(["control", "treat"]), rng.random() < 0.3) for _ in range(600)]
    df = spark.createDataFrame(rows, "arm string, conv boolean").repartition(4)
    got = proportions_ab_report(df, "arm", "conv", "control", "treat").collect()[0]
    nc = sum(1 for a, _ in rows if a == "control")
    nt = len(rows) - nc
    xc = sum(1 for a, c in rows if a == "control" and c)
    xt = sum(1 for a, c in rows if a == "treat" and c)
    pc, pt = xc / nc, xt / nt
    pool = (xc + xt) / (nc + nt)
    se = math.sqrt(pool * (1 - pool) * (1 / nc + 1 / nt))
    assert got["z_stat"] == round((pt - pc) / se, 6)
