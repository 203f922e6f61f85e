"""Wave-86 operator tests: Fisher-z correlation CI."""

import math

from pyspark.sql import functions as F
import random

import pytest

from jsons_to_schema_spark.operators.stats import correlation_ci


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in rows], "a double, b double"
    ).repartition(parts)


def _ci(spark, rows):
    return correlation_ci(_df(spark, rows), "a", "b").collect()[0].asDict()


def _brute(rows, z=1.959964):
    q = [(round(round(a, 6) * 1e6), round(round(b, 6) * 1e6)) for a, b in rows]
    n = len(q)
    sx = sum(a for a, _ in q)
    sy = sum(b for _, b in q)
    sxx = sum(a * a for a, _ in q)
    syy = sum(b * b for _, b in q)
    sxy = sum(a * b for a, b in q)
    r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    zf = 0.5 * math.log((1 + r) / (1 - r))
    se = z / math.sqrt(n - 3)

    def back(v):
        e2 = math.exp(2 * v)
        return (e2 - 1) / (e2 + 1)

    return round(r, 6), round(back(zf - se), 6), round(back(zf + se), 6)


def test_ci_brackets_true_correlation(spark):
    rng = random.Random(8601)
    rows = [(x, 0.6 * x + rng.gauss(0, 0.8)) for x in
            (rng.gauss(0, 1) for _ in range(500))]
    got = _ci(spark, rows)
    assert got["ci_lo"] < got["r"] < got["ci_hi"]
    # true r = 0.6/sqrt(0.36+0.64) = 0.6: inside the interval
    assert got["ci_lo"] < 0.6 < got["ci_hi"]
    assert got["ci_hi"] - got["ci_lo"] < 0.25  # n=500: tight


def test_ci_brute_parity(spark):
    rng = random.Random(8602)
    rows = [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(200)]
    got = _ci(spark, rows)
    r, lo, hi = _brute(rows)
    assert got["r"] == r
    assert abs(got["ci_lo"] - lo) <= 1e-6 and abs(got["ci_hi"] - hi) <= 1e-6


def test_ci_degenerate_contracts(spark):
    # perfect correlation: atanh diverges → NULL bounds, r intact
    rows = [(float(i), 2.0 * i) for i in range(20)]
    got = _ci(spark, rows)
    assert got["r"] == 1.0
    assert got["ci_lo"] is None and got["ci_hi"] is None
    # n < 4
    got2 = _ci(spark, [(1.0, 5.0), (2.0, 3.0), (3.0, 4.0)])
    assert got2["ci_lo"] is None


def test_grouped_ci_panel(spark):
    from jsons_to_schema_spark.operators.stats import grouped_correlation_ci

    rng = random.Random(8603)
    rows = []
    # 'real': strong association; 'mirage': weak with tiny n; 'null': none
    for _ in range(300):
        x = rng.gauss(0, 1)
        rows.append(("real", x, 0.8 * x + rng.gauss(0, 0.5)))
        rows.append(("null", rng.gauss(0, 1), rng.gauss(0, 1)))
    for _ in range(12):
        x = rng.gauss(0, 1)
        rows.append(("mirage", x, 0.3 * x + rng.gauss(0, 1)))
    df = spark.createDataFrame(rows, "g string, a double, b double").repartition(4)
    got = {
        r["g"]: (r["n"], r["r"], r["ci_lo"], r["ci_hi"])
        for r in grouped_correlation_ci(df, "a", "b", "g").collect()
    }
    assert got["real"][2] > 0.7              # decisively positive
    assert got["null"][2] < 0 < got["null"][3]   # straddles zero
    assert got["mirage"][2] < 0 < got["mirage"][3]  # small-n: honest doubt
    # per-group parity vs the ungrouped operator on the slice
    from jsons_to_schema_spark.operators.stats import correlation_ci

    solo = correlation_ci(
        df.filter(F.col("g") == "real"), "a", "b"
    ).collect()[0]
    assert got["real"] == (solo["n"], solo["r"], solo["ci_lo"], solo["ci_hi"])
