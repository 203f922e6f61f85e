"""Wave-48 operator tests: multi-source BFS distances and Borůvka MSF."""

import heapq
import random

import pytest

from jsons_to_schema_spark.operators.graph import bfs_distances, boruvka_msf


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _wedges(spark, triples, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in triples],
        "src string, dst string, weight double",
    ).repartition(parts)


def _seeds(spark, nodes):
    return spark.createDataFrame([(str(n),) for n in nodes], "node string")


def _bfs(spark, pairs, seeds, **kw):
    return {
        r["node"]: r["dist"]
        for r in bfs_distances(_edges(spark, pairs), _seeds(spark, seeds), **kw).collect()
    }


def _brute_bfs(pairs, seeds):
    adj = {}
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {str(s): 0 for s in seeds}
    frontier = set(dist)
    d = 0
    while frontier:
        d += 1
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_path_graph(spark):
    path = [(f"p{i}", f"p{i+1}") for i in range(6)]
    got = _bfs(spark, path, ["p0"])
    assert got == {f"p{i}": i for i in range(7)}


def test_bfs_multi_source_takes_min(spark):
    path = [(f"p{i}", f"p{i+1}") for i in range(6)]
    got = _bfs(spark, path, ["p0", "p6"])
    # distance is the min over both ends of the path
    assert got == {f"p{i}": min(i, 6 - i) for i in range(7)}


def test_bfs_unreachable_absent_and_isolated_seed(spark):
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    got = _bfs(spark, pairs, ["a", "lonely"])
    # x/y unreachable → absent; seed with no edges still present at 0
    assert got == {"a": 0, "b": 1, "c": 2, "lonely": 0}


def test_bfs_brute_parity_random(spark):
    rng = random.Random(4801)
    nodes = [f"n{i}" for i in range(60)]
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    seeds = ["n0", "n1", "n2"]
    assert _bfs(spark, pairs, seeds) == _brute_bfs(pairs, seeds)


def test_bfs_partition_invariance(spark):
    rng = random.Random(4802)
    nodes = [f"n{i}" for i in range(40)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    outs = []
    for parts in (1, 2, 8):
        got = {
            r["node"]: r["dist"]
            for r in bfs_distances(
                _edges(spark, pairs, parts=parts), _seeds(spark, ["n0"])
            ).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]


# ---------------------------------------------------------------------------
# Borůvka MSF
# ---------------------------------------------------------------------------


def _kruskal(triples):
    """Reference MSF under the SAME strict total order (w, u, v) after
    canonicalizing u<v and collapsing parallel edges to the lightest."""
    best = {}
    for a, b, w in triples:
        a, b, w = str(a), str(b), float(w)
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def _msf(spark, triples, **kw):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in boruvka_msf(_wedges(spark, triples), **kw).collect()
    }


def test_msf_triangle_drops_heaviest(spark):
    tri = [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 3.0)]
    assert _msf(spark, tri) == {("a", "b", 1.0), ("b", "c", 2.0)}


def test_msf_forest_on_disconnected(spark):
    tri = [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 3.0)]
    other = [("x", "y", 5.0)]
    got = _msf(spark, tri + other)
    assert got == {("a", "b", 1.0), ("b", "c", 2.0), ("x", "y", 5.0)}
    # V − #components rows: 5 vertices, 2 components → 3 edges
    assert len(got) == 3


def test_msf_duplicate_weights_unique_under_total_order(spark):
    # all weights equal: tie-break (u, v) makes the MSF unique
    quad = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
        ("d", "a", 1.0), ("a", "c", 1.0), ("b", "d", 1.0),
    ]
    assert _msf(spark, quad) == _kruskal(quad)


def test_msf_parallel_edges_keep_lightest(spark):
    dup = [("a", "b", 9.0), ("b", "a", 2.0), ("b", "c", 1.0)]
    assert _msf(spark, dup) == {("a", "b", 2.0), ("b", "c", 1.0)}


@pytest.mark.parametrize("seed,n,m", [(4803, 30, 60), (4804, 50, 200), (4805, 25, 24)])
def test_msf_kruskal_parity_random(spark, seed, n, m):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(n)]
    triples = [
        (rng.choice(nodes), rng.choice(nodes), rng.choice([1.0, 2.0, 3.0, 4.5]))
        for _ in range(m)
    ]
    assert _msf(spark, triples) == _kruskal(triples)


def test_msf_partition_invariance(spark):
    rng = random.Random(4806)
    nodes = [f"n{i}" for i in range(30)]
    triples = [
        (rng.choice(nodes), rng.choice(nodes), float(rng.randint(1, 5)))
        for _ in range(70)
    ]
    outs = []
    for parts in (1, 3, 8):
        got = {
            (r["src"], r["dst"], r["weight"])
            for r in boruvka_msf(_wedges(spark, triples, parts=parts)).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2] == _kruskal(triples)
