"""Wave-78 operator tests: cluster-quality report (CH + DB)."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.similarity import cluster_quality_report


def _df(spark, rows, dim, parts=4):
    return spark.createDataFrame(
        [(g, [float(x) for x in v]) for g, v in rows],
        "g string, emb array<double>",
    ).repartition(parts)


def _cq(spark, rows, dim):
    return cluster_quality_report(
        _df(spark, rows, dim), "emb", "g", dim
    ).collect()[0].asDict()


def _brute(rows):
    import collections

    q = [(g, [round(round(x, 6) * 1e6) for x in v]) for g, v in rows]
    dim = len(q[0][1])
    groups = collections.defaultdict(list)
    for g, v in q:
        groups[g].append(v)
    n = len(q)
    k = len(groups)
    glob_mu = [
        sum(v[d] for _, v in q) / n / 1e6 for d in range(dim)
    ]
    ssw = ssb = 0.0
    scat = {}
    cent = {}
    for g, vs in groups.items():
        ng = len(vs)
        mu = [sum(v[d] for v in vs) / ng / 1e6 for d in range(dim)]
        cent[g] = mu
        w = sum(
            sum((v[d] / 1e6 - mu[d]) ** 2 for v in vs) for d in range(dim)
        )
        ssw += w
        scat[g] = math.sqrt(w / ng)
        ssb += ng * sum((mu[d] - glob_mu[d]) ** 2 for d in range(dim))
    ch = (ssb / (k - 1)) / (ssw / (n - k)) if k >= 2 and ssw > 0 and n > k else None
    db = 0.0
    for g in groups:
        worst = max(
            (scat[g] + scat[h])
            / math.sqrt(sum((cent[g][d] - cent[h][d]) ** 2 for d in range(dim)))
            for h in groups
            if h != g
        )
        db += worst
    db /= k
    return k, n, ch, db


def test_separated_clusters_score_well(spark):
    rng = random.Random(7801)
    rows = []
    for g, center in (("a", 0.0), ("b", 50.0), ("c", -50.0)):
        for _ in range(60):
            rows.append((g, [center + rng.gauss(0, 1) for _ in range(8)]))
    got = _cq(spark, rows, 8)
    assert got["calinski_harabasz"] > 1000
    assert got["davies_bouldin"] < 0.1


def test_random_labels_score_poorly(spark):
    rng = random.Random(7802)
    rows = [
        (rng.choice("abc"), [rng.gauss(0, 1) for _ in range(8)])
        for _ in range(240)
    ]
    got = _cq(spark, rows, 8)
    assert got["calinski_harabasz"] < 3     # ≈ 1 under the null
    assert got["davies_bouldin"] > 3        # compactness ≈ separation noise


def test_brute_parity(spark):
    rng = random.Random(7803)
    rows = [
        (rng.choice(["x", "y", "z"]),
         [round(rng.uniform(-5, 5), 3) for _ in range(6)])
        for _ in range(90)
    ]
    got = _cq(spark, rows, 6)
    k, n, ch, db = _brute(rows)
    assert (got["k"], got["n"]) == (k, n)
    assert abs(got["calinski_harabasz"] - ch) < 1e-4
    assert abs(got["davies_bouldin"] - db) < 1e-4


def test_partition_invariance(spark):
    rng = random.Random(7804)
    rows = [
        (rng.choice("ab"), [rng.uniform(0, 10) for _ in range(4)])
        for _ in range(80)
    ]
    outs = [
        cluster_quality_report(_df(spark, rows, 4, parts=p), "emb", "g", 4)
        .collect()[0].asDict()
        for p in (1, 8)
    ]
    assert outs[0] == outs[1]
