"""Wave-79 operator tests: graph summary + assortativity."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.graph import graph_summary


def _df(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _gs(spark, pairs):
    return graph_summary(_df(spark, pairs)).collect()[0].asDict()


def _brute(pairs):
    es = {tuple(sorted((str(a), str(b)))) for a, b in pairs if str(a) != str(b)}
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    nn, m = len(deg), len(es)
    xy = [(deg[u], deg[v]) for u, v in es] + [(deg[v], deg[u]) for u, v in es]
    n2 = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    vx, vy = n2 * sxx - sx * sx, n2 * syy - sy * sy
    r = (
        round((n2 * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)), 6)
        if vx > 0 and vy > 0
        else None
    )
    return (
        nn, m,
        round(2 * m / (nn * (nn - 1)), 6) if nn >= 2 else None,
        round(sum(deg.values()) / nn, 6),
        max(deg.values()),
        r,
    )


def test_star_is_disassortative(spark):
    star = [("hub", f"x{i}") for i in range(8)]
    got = _gs(spark, star)
    assert got["n_nodes"] == 9 and got["n_edges"] == 8
    assert got["max_degree"] == 8
    assert got["assortativity"] == -1.0  # pure hub-and-spoke


def test_regular_graph_null_assortativity(spark):
    cycle = [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)]
    got = _gs(spark, cycle)
    assert got["assortativity"] is None  # degree-regular → zero variance
    assert got["density"] == round(2 * 6 / (6 * 5), 6)


def test_brute_parity_random(spark):
    rng = random.Random(7901)
    pairs = [
        (f"n{rng.randrange(25)}", f"n{rng.randrange(25)}") for _ in range(70)
    ] + [("n0", "n0")]  # self-loop drops
    got = _gs(spark, pairs)
    nn, m, dens, avg, mx, r = _brute(pairs)
    assert (
        got["n_nodes"], got["n_edges"], got["density"],
        got["avg_degree"], got["max_degree"], got["assortativity"],
    ) == (nn, m, dens, avg, mx, r)


def test_assortative_construction(spark):
    # two cliques of equal degree joined by a chain of low-degree nodes:
    # high-degree ends attach to high-degree, low to low → r > 0
    k5a = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
    k5b = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("p1", "p2"), ("p2", "p3")]
    got = _gs(spark, k5a + k5b + chain)
    assert got["assortativity"] > 0.5
