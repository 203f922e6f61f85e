"""Wave-59 operator tests: exact Gini and Spearman rank correlation."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import gini_coefficient, spearman_pairs


def _vdf(spark, vals, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v),) for v in vals], "v double"
    ).repartition(parts)


def _gini(spark, vals, lo=0.0, hi=1000.0, bins=64):
    r = gini_coefficient(_vdf(spark, vals), "v", lo, hi, bins).collect()[0]
    return r["n"], r["sum_value"], r["gini"]


def _brute_gini(vals):
    xs = sorted(round(round(v, 6) * 1e6) for v in vals if v is not None)
    n, s = len(xs), sum(xs)
    if s == 0:
        return n, 0.0, None
    t2 = sum(2 * (i + 1) * x for i, x in enumerate(xs))
    return n, round(s / 1e6, 6), round((t2 - (n + 1) * s) / (n * s), 6)


def test_gini_extremes(spark):
    n, s, g = _gini(spark, [5.0] * 50)          # perfectly even
    assert g == 0.0
    n, s, g = _gini(spark, [0.0] * 49 + [100.0])  # one row holds everything
    assert abs(g - (1.0 - 1 / 50)) < 1e-9       # finite-n max = 1 − 1/n
    assert _gini(spark, [0.0] * 10)[2] is None  # all-zero → NULL


def test_gini_brute_parity_and_bin_invariance(spark):
    rng = random.Random(5901)
    vals = [round(rng.expovariate(0.01), 3) for _ in range(500)] + [None] * 3
    want = _brute_gini(vals)
    for bins in (4, 64, 1024):
        assert _gini(spark, vals, bins=bins) == want


def test_gini_negative_raises(spark):
    with pytest.raises(Exception, match="negative"):
        _gini(spark, [1.0, -2.0, 3.0])


# ---------------------------------------------------------------------------
# Spearman
# ---------------------------------------------------------------------------


def _xdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [tuple(None if v is None else float(v) for v in r) for r in rows],
        "a double, b double, c double",
    ).repartition(parts)


def _spear(spark, rows, lo=-1000.0, hi=1000.0, bins=64):
    out = spearman_pairs(_xdf(spark, rows), ["a", "b", "c"], lo, hi, bins).collect()
    return {(r["col_a"], r["col_b"]): (r["n"], r["spearman"]) for r in out}


def _brute_spear(rows):
    keep = [r for r in rows if all(v is not None for v in r)]
    n = len(keep)

    def r2(vals):
        out = []
        for v in vals:
            less = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            out.append(2 * less + eq + 1)
        return out

    cols = list(zip(*keep)) if keep else [[], [], []]
    ranks = [r2([round(v, 9) for v in c]) for c in cols]
    names = ["a", "b", "c"]
    res = {}
    for i in range(3):
        for j in range(i + 1, 3):
            ra, rb = ranks[i], ranks[j]
            sa, sb = sum(ra), sum(rb)
            qa = sum(x * x for x in ra)
            qb = sum(x * x for x in rb)
            p = sum(x * y for x, y in zip(ra, rb))
            va, vb = n * qa - sa * sa, n * qb - sb * sb
            if n < 2 or va <= 0 or vb <= 0:
                res[(names[i], names[j])] = (n, None)
            else:
                res[(names[i], names[j])] = (
                    n,
                    round((n * p - sa * sb) / (math.sqrt(va) * math.sqrt(vb)), 6),
                )
    return res


def test_spearman_monotone_transform_invariance(spark):
    rng = random.Random(5902)
    xs = [rng.uniform(0, 10) for _ in range(100)]
    rows = [(x, math.exp(x / 3), -x ** 3) for x in xs]  # monotone up / down
    got = _spear(spark, rows)
    assert got[("a", "b")][1] == 1.0
    assert got[("a", "c")][1] == -1.0
    assert got[("b", "c")][1] == -1.0


def test_spearman_heavy_tail_robustness(spark):
    rng = random.Random(5903)
    rows = [(x, x + rng.gauss(0, 0.1), rng.uniform(0, 1)) for x in
            [rng.uniform(0, 10) for _ in range(80)]]
    rows.append((5.0, 900.0, 0.5))  # one wild row: Pearson would crater
    got = _spear(spark, rows)
    assert got[("a", "b")][1] > 0.95
    assert got == _brute_spear(rows)


def test_spearman_ties_and_nulls_brute_parity(spark):
    rng = random.Random(5904)
    rows = []
    for _ in range(200):
        rows.append(
            (
                rng.choice([1.0, 2.0, 3.0, None]),
                float(rng.randrange(5)),
                round(rng.uniform(-5, 5), 1),
            )
        )
    got = _spear(spark, rows)
    assert got == _brute_spear(rows)
    # constant column (after listwise deletion ties could collapse): NULL rho
    rows2 = [(1.0, float(i), 7.0) for i in range(10)]
    got2 = _spear(spark, rows2)
    assert got2[("a", "b")][1] is None and got2[("a", "c")][1] is None


def test_spearman_validation(spark):
    df = _xdf(spark, [(1.0, 2.0, 3.0)])
    with pytest.raises(ValueError):
        spearman_pairs(df, ["a"], 0.0, 1.0)
    with pytest.raises(ValueError):
        spearman_pairs(df, ["a", "b"], 5.0, 1.0)
