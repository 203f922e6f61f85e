"""Wave-74 operator tests: ordinal association (gamma / Somers' D)."""

import random

import pytest

from jsons_to_schema_spark.operators.stats import ordinal_association


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(a, b) for a, b in rows], "a int, b int"
    ).repartition(parts)


def _oa(spark, rows):
    return ordinal_association(_df(spark, rows), "a", "b").collect()[0].asDict()


def _brute(rows):
    keep = [(a, b) for a, b in rows if a is not None and b is not None]
    c = d = ta = tb = 0
    for i in range(len(keep)):
        for j in range(i + 1, len(keep)):
            (a1, b1), (a2, b2) = keep[i], keep[j]
            if a1 == a2 and b1 == b2:
                continue
            if a1 == a2:
                ta += 1
            elif b1 == b2:
                tb += 1
            elif (a1 - a2) * (b1 - b2) > 0:
                c += 1
            else:
                d += 1
    n = len(keep)
    gamma = round((c - d) / (c + d), 6) if c + d else None
    somers = round((c - d) / (c + d + tb), 6) if c + d + tb else None
    return n, c, d, ta, tb, gamma, somers


def test_perfect_monotone(spark):
    rows = [(i, i * 2) for i in range(1, 6)] * 10
    got = _oa(spark, rows)
    assert got["gamma"] == 1.0 and got["somers_d_ba"] == 1.0
    assert got["discordant"] == 0


def test_perfect_reverse(spark):
    rows = [(i, 10 - i) for i in range(1, 6)] * 5
    got = _oa(spark, rows)
    assert got["gamma"] == -1.0


def test_brute_parity_with_ties(spark):
    rng = random.Random(7401)
    rows = [(rng.randint(1, 4), rng.randint(1, 5)) for _ in range(120)]
    got = _oa(spark, rows)
    n, c, d, ta, tb, gamma, somers = _brute(rows)
    assert (
        got["n"], got["concordant"], got["discordant"],
        got["ties_a"], got["ties_b"], got["gamma"], got["somers_d_ba"],
    ) == (n, c, d, ta, tb, gamma, somers)


def test_independent_near_zero(spark):
    rng = random.Random(7402)
    rows = [(rng.randint(1, 5), rng.randint(1, 5)) for _ in range(2000)]
    got = _oa(spark, rows)
    assert abs(got["gamma"]) < 0.05


def test_somers_penalizes_dependent_ties(spark):
    # b constant within each a-level pair block: many b-ties drag D but not gamma
    rows = [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3)] * 8
    got = _oa(spark, rows)
    assert got["gamma"] == 1.0               # no discordant pairs at all
    assert got["somers_d_ba"] < got["gamma"]  # b-ties penalized
