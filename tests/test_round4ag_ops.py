"""Wave-64 operator tests: exact trimmed mean and Neyman allocation."""

import math
import random
import statistics

import pytest

from jsons_to_schema_spark.operators.stats import neyman_allocation, trimmed_mean


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, None if v is None else float(v)) for g, v in rows],
        "g string, v double",
    ).repartition(parts)


def _tm(spark, rows, trim=0.1, bins=64, lo=0.0, hi=1000.0):
    out = trimmed_mean(_df(spark, rows), "v", "g", lo, hi, trim, bins).collect()
    return {r["g"]: (r["n"], r["n_trimmed_each_side"], r["trimmed_mean"]) for r in out}


def _brute_tm(vals, trim):
    xs = sorted(round(round(v, 6) * 1e6) for v in vals if v is not None)
    n = len(xs)
    k = int(math.floor(trim * n + 1e-9))
    kept = xs[k:n - k] if n - 2 * k > 0 else []
    return (n, k, round(sum(kept) / len(kept) / 1e6, 6) if kept else None)


def test_trimmed_mean_kills_outliers(spark):
    vals = [10.0] * 18 + [9000.0, 0.0]
    rows = [("a", v) for v in vals]
    got = _tm(spark, rows, trim=0.1, hi=10000.0)
    n, k, m = got["a"]
    assert (n, k) == (20, 2)
    assert m == 10.0  # both extremes trimmed; plain mean would be ~459


@pytest.mark.parametrize("trim,bins", [(0.0, 16), (0.1, 4), (0.25, 1024), (0.3, 64)])
def test_trimmed_mean_brute_parity(spark, trim, bins):
    rng = random.Random(6401)
    per = {
        "a": [round(rng.uniform(0, 900), 2) for _ in range(137)],
        "b": [round(rng.expovariate(0.01), 2) for _ in range(60)],
        "tiny": [5.0],
    }
    per["b"] = [v for v in per["b"] if v < 1000]
    rows = [(g, v) for g, vs in per.items() for v in vs]
    got = _tm(spark, rows, trim=trim, bins=bins)
    for g, vs in per.items():
        assert got[g] == _brute_tm(vs, trim), (g, trim, bins)


def test_trimmed_mean_floor_guard(spark):
    # 0.3 * 10 floats to 2.9999999999999996: the +1e-9 keeps k = 3
    rows = [("a", float(i)) for i in range(10)]
    got = _tm(spark, rows, trim=0.3)
    assert got["a"][1] == 3
    assert got["a"][2] == statistics.mean([3.0, 4.0, 5.0, 6.0])


def test_trimmed_mean_validation(spark):
    with pytest.raises(ValueError):
        trimmed_mean(_df(spark, [("a", 1.0)]), "v", "g", 0.0, 1.0, trim=0.5)


# ---------------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------------


def _alloc(spark, rows, budget):
    out = neyman_allocation(_df(spark, rows), "g", "v", budget).collect()
    return {r["g"]: (r["n"], r["std"], r["weight"], r["alloc"]) for r in out}


def test_neyman_favors_variable_strata(spark):
    rng = random.Random(6402)
    rows = [("noisy", rng.gauss(50, 30)) for _ in range(300)] + [
        ("calm", rng.gauss(50, 1)) for _ in range(300)
    ]
    got = _alloc(spark, rows, 1000)
    assert got["noisy"][3] + got["calm"][3] == 1000  # exact budget
    # equal sizes → allocation ratio tracks the std ratio (~30:1)
    assert got["noisy"][3] > 900


def test_neyman_largest_remainder_sums_exactly(spark):
    rng = random.Random(6403)
    rows = []
    for i in range(7):
        for _ in range(50 + i * 13):
            rows.append((f"s{i}", rng.uniform(0, 10 + i)))
    for budget in (10, 97, 1234):
        got = _alloc(spark, rows, budget)
        assert sum(a for *_, a in got.values()) == budget


def test_neyman_degenerate_strata(spark):
    rows = [("solo", 5.0)] + [("flat", 3.0)] * 40 + [
        ("varied", float(v)) for v in range(40)
    ]
    got = _alloc(spark, rows, 100)
    assert got["solo"][3] == 0     # single row: no variance evidence
    assert got["flat"][3] == 0     # zero variance: mean needs no sample
    assert got["varied"][3] == 100
    assert got["flat"][1] == 0.0


def test_neyman_validation(spark):
    with pytest.raises(ValueError):
        neyman_allocation(_df(spark, [("a", 1.0)]), "g", "v", 0)
