"""Wave-85 operator tests: Wilson proportion CI."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import proportion_ci


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, f) for g, f in rows], "g string, f boolean"
    ).repartition(parts)


def _ci(spark, rows):
    out = proportion_ci(_df(spark, rows), "f", "g").collect()
    return {r["g"]: (r["n"], r["x"], r["rate"], r["ci_lo"], r["ci_hi"]) for r in out}


def _wilson(n, x, z=1.959964):
    p = x / n
    z2 = z * z
    center = (x + z2 / 2) / (n + z2)
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) * n / (n + z2)
    return round(max(center - half, 0.0), 6), round(min(center + half, 1.0), 6)


def test_zero_events_nonzero_interval(spark):
    rows = [("clean", False)] * 50
    got = _ci(spark, rows)
    n, x, rate, lo, hi = got["clean"]
    assert (n, x, rate, lo) == (50, 0, 0.0, 0.0)
    assert 0.05 < hi < 0.10  # "0 errors in 50" is NOT certainty — ~[0, 7%]
    lo_w, hi_w = _wilson(50, 0)
    assert (lo, hi) == (lo_w, hi_w)


def test_brute_parity_and_nulls(spark):
    rng = random.Random(8501)
    rows = [
        (rng.choice("abc"), rng.random() < 0.3) for _ in range(600)
    ] + [("a", None)] * 3
    got = _ci(spark, rows)
    from collections import Counter

    n_by = Counter(g for g, f in rows if f is not None)
    x_by = Counter(g for g, f in rows if f)
    for g in "abc":
        n, x, rate, lo, hi = got[g]
        assert (n, x) == (n_by[g], x_by[g])
        assert rate == round(x / n, 6)
        assert (lo, hi) == _wilson(n, x)
        assert lo <= rate <= hi


def test_all_true_clamps_at_one(spark):
    rows = [("hot", True)] * 30
    got = _ci(spark, rows)
    assert got["hot"][2] == 1.0 and got["hot"][4] == 1.0
    assert got["hot"][3] < 1.0  # lower bound honestly below 1
