"""Wave-44 operator tests: k-core peeling and weighted exact quantiles."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.graph import kcore_members
from jsons_to_schema_spark.operators.stats import exact_quantiles


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _kcore(spark, pairs, k, **kw):
    return {
        r["node"]: r["degree"]
        for r in kcore_members(_edges(spark, pairs, **kw), k).collect()
    }


def _brute_kcore(pairs, k):
    adj = {}
    es = {tuple(sorted((str(a), str(b)))) for a, b in pairs if str(a) != str(b)}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(vs) for n, vs in adj.items()}


def test_kcore_k4_complete(spark):
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    assert _kcore(spark, k4, 3) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_star_and_path_cascade(spark):
    star = [("hub", f"x{i}") for i in range(6)]
    assert _kcore(spark, star, 2) == {}  # leaves peel, then the hub
    path = [(f"p{i}", f"p{i+1}") for i in range(8)]
    assert _kcore(spark, path, 2) == {}  # cascading end-peel to empty
    got1 = _kcore(spark, path, 1)
    assert set(got1) == {f"p{i}" for i in range(9)}


def test_kcore_clique_sheds_pendant(spark):
    clique = [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)]
    pairs = clique + [("c0", "pendant")]
    got = _kcore(spark, pairs, 3)
    assert "pendant" not in got
    assert got == {f"c{i}": 3 for i in range(4)}


def test_kcore_matches_brute_force_random(spark):
    rng = random.Random(61)
    pairs = [(rng.randrange(16), rng.randrange(16)) for _ in range(80)]
    for k in (2, 3, 4):
        assert _kcore(spark, pairs, k) == _brute_kcore(pairs, k), k


def test_kcore_partition_invariance(spark):
    rng = random.Random(4)
    pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(50)]
    want = _brute_kcore(pairs, 3)
    for p in (1, 3, 7):
        assert _kcore(spark, pairs, 3, parts=p) == want


def test_kcore_validation(spark):
    with pytest.raises(ValueError):
        kcore_members(_edges(spark, [("a", "b")]), 0)


# ---------------------------------------------------------------------------
# weighted exact_quantiles
# ---------------------------------------------------------------------------

def _wdf(spark, rows, parts=4):
    return spark.createDataFrame(rows, "value double, w long").repartition(parts)


def test_weighted_quantiles_match_replay(spark):
    rng = random.Random(71)
    rows = [
        (rng.randrange(0, 15) / 15.0, rng.randrange(1, 9)) for _ in range(120)
    ]
    probs = [0.25, 0.5, 0.9]
    got = {
        r["prob"]: (r["n"], r["rank"], r["value"])
        for r in exact_quantiles(
            _wdf(spark, rows), "value", probs, 0.0, 1.0, bins=16, weight_col="w"
        ).collect()
    }
    # brute: expand by weight, take rank ceil(p*W)
    expanded = sorted(v for v, w in rows for _ in range(w))
    W = len(expanded)
    for p in probs:
        rank = max(math.ceil(p * W - 1e-9), 1)
        assert got[p] == (W, rank, expanded[rank - 1]), p


def test_weighted_all_ones_equals_unweighted(spark):
    rng = random.Random(12)
    rows = [(rng.random(), 1) for _ in range(70)]
    a = sorted(
        tuple(r)
        for r in exact_quantiles(
            _wdf(spark, rows), "value", [0.5, 0.9], 0.0, 1.0, weight_col="w"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in exact_quantiles(
            _wdf(spark, rows), "value", [0.5, 0.9], 0.0, 1.0
        ).collect()
    )
    assert a == b


def test_weighted_nonpositive_and_null_weights_excluded(spark):
    rows = [(0.1, 5), (0.9, 0), (0.5, -3), (0.7, None)]
    got = exact_quantiles(
        _wdf(spark, rows), "value", [1.0], 0.0, 1.0, weight_col="w"
    ).collect()
    assert len(got) == 1
    assert got[0]["n"] == 5 and got[0]["value"] == 0.1
