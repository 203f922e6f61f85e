"""Wave-39 operator tests: degree-ordered triangle counting, exact
two-sample KS without a global sort, exact-integer embedding covariance +
PCA basis/projection."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.drift import ks_drift
from jsons_to_schema_spark.operators.graph import triangle_counts
from jsons_to_schema_spark.operators.linalg import (
    covariance_matrix,
    embedding_covariance,
    pca_basis,
    pca_project,
)
from jsons_to_schema_spark.plans import audit


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _tri(spark, pairs, **kw):
    return {
        r["node"]: r["triangles"]
        for r in triangle_counts(_edges(spark, pairs, **kw)).collect()
    }


def _brute_tri(pairs):
    """Per-vertex triangle counts by brute force over the canonical set."""
    es = {tuple(sorted((str(a), str(b)))) for a, b in pairs if str(a) != str(b)}
    nodes = sorted({n for e in es for n in e})
    out = {}
    for i, x in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            for k in range(j + 1, len(nodes)):
                y, z = nodes[j], nodes[k]
                if ((x, y) in es) and ((y, z) in es) and ((x, z) in es):
                    for n in (x, y, z):
                        out[n] = out.get(n, 0) + 1
    return out


def test_triangles_k4(spark):
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    got = _tri(spark, k4)
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}  # K4: C(3,2)=3 each


def test_triangles_none_in_cycle4_and_star(spark):
    assert _tri(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]) == {}
    assert _tri(spark, [("hub", x) for x in "abcdefg"]) == {}


def test_triangles_canonicalization(spark):
    """Reversed directions, duplicate edges, and self-loops must not change
    the count — one triangle, counted once per corner."""
    messy = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("c", "b"), ("a", "c"), ("a", "a"),
    ]
    assert _tri(spark, messy) == {"a": 1, "b": 1, "c": 1}


def test_triangles_match_brute_force_random(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(14), rng.randrange(14)) for _ in range(70)]
    assert _tri(spark, pairs) == _brute_tri(pairs)


def test_triangles_partition_invariance_and_hub_skew(spark):
    """A hub fan plus a clique: the orientation must push all wedge work
    away from the hub, and the answer must not depend on partitioning."""
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    fan = [("hub", f"leaf{i}") for i in range(40)]
    # hub touches the clique at one vertex -> no new triangles
    pairs = clique + fan + [("hub", "c0")]
    expect = _brute_tri(pairs)
    for p in (1, 3, 11):
        assert _tri(spark, pairs, parts=p) == expect
    assert "hub" not in expect


def test_triangles_plan_no_cartesian(spark):
    plan = audit.formatted_plan(
        triangle_counts(_edges(spark, [("a", "b"), ("b", "c"), ("a", "c")]))
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# ks_drift
# ---------------------------------------------------------------------------

def _ks_brute(xs, ys):
    """Exact two-sample KS over the pooled distinct points."""
    if not xs or not ys:
        return None
    pts = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best = 0
    for v in pts:
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        best = max(best, abs(ca * nb - cb * na))
    return round(best / (na * nb), 6)


def _ks_row(spark, xs, ys, bins=64, lo=0.0, hi=1.0):
    a = spark.createDataFrame([(float(v),) for v in xs], "value double")
    b = spark.createDataFrame([(float(v),) for v in ys], "value double")
    return ks_drift(a, b, "value", lo, hi, bins=bins).collect()[0].asDict()


def test_ks_matches_brute_force_with_ties(spark):
    rng = random.Random(5)
    xs = [rng.randrange(0, 25) / 25.0 for _ in range(180)]
    ys = [min(1.0, rng.randrange(0, 25) / 25.0 + 0.12) for _ in range(140)]
    got = _ks_row(spark, xs, ys)
    assert got["ks_d"] == _ks_brute(xs, ys)
    assert got["n_a"] == 180 and got["n_b"] == 140


@pytest.mark.parametrize("bins", [1, 2, 37, 4096])
def test_ks_invariant_to_bin_count(spark, bins):
    rng = random.Random(9)
    xs = [rng.gauss(0.4, 0.5) for _ in range(120)]  # spills outside [0,1)
    ys = [rng.gauss(0.7, 0.3) for _ in range(90)]
    assert _ks_row(spark, xs, ys, bins=bins)["ks_d"] == _ks_brute(xs, ys)


def test_ks_identical_samples_zero(spark):
    xs = [i / 50.0 for i in range(50)]
    got = _ks_row(spark, xs, list(xs))
    assert got["ks_d"] == 0.0


def test_ks_disjoint_supports_one(spark):
    got = _ks_row(spark, [0.1, 0.2, 0.3], [0.7, 0.8, 0.9])
    assert got["ks_d"] == 1.0
    assert got["ks_at"] == 0.3  # smallest value attaining the supremum


def test_ks_empty_side_undefined(spark):
    a = spark.createDataFrame([(0.5,), (0.6,)], "value double")
    b = spark.createDataFrame([], "value double")
    row = ks_drift(a, b, "value", 0.0, 1.0).collect()[0]
    assert row["ks_d"] is None


def test_ks_plan_bounded_single_partition_only(spark):
    a = spark.createDataFrame([(0.1,), (0.9,)], "value double").repartition(4)
    b = spark.createDataFrame([(0.4,), (0.5,)], "value double").repartition(4)
    plan = audit.formatted_plan(ks_drift(a, b, "value", 0.0, 1.0, bins=8))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(_bin" in plan  # the keyed within-bin window


# ---------------------------------------------------------------------------
# linalg: covariance + PCA
# ---------------------------------------------------------------------------

def _emb_df(spark, mat, parts=4, ids=None):
    rows = [
        (int(i if ids is None else ids[i]), [float(v) for v in row])
        for i, row in enumerate(mat)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(21)
    mat = rng.normal(0, 0.5, size=(200, 6)).astype(np.float32)
    cov_df = embedding_covariance(_emb_df(spark, mat), "embedding", dim=6)
    got = covariance_matrix(cov_df, 6)
    want = np.cov(mat.astype(np.float64).T, bias=True)
    assert np.abs(got - want).max() < 2e-6  # round-6 + micro-quantization
    assert cov_df.count() == 21  # 6*7/2 upper-triangle entries
    assert cov_df.select("n").distinct().collect()[0]["n"] == 200


def test_covariance_excludes_malformed_rows(spark):
    good = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    df = _emb_df(spark, good).unionByName(
        spark.createDataFrame(
            [(90, None), (91, [1.0])], "vec_id long, embedding array<float>"
        )
    )
    cov_df = embedding_covariance(df, "embedding", dim=2)
    assert cov_df.select("n").distinct().collect()[0]["n"] == 3


def test_covariance_partition_invariance(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(0, 1, size=(90, 4)).astype(np.float32)
    frames = [
        sorted(
            tuple(r)
            for r in embedding_covariance(
                _emb_df(spark, mat, parts=p), "embedding", dim=4
            ).collect()
        )
        for p in (1, 2, 9)
    ]
    assert frames[0] == frames[1] == frames[2]


def test_pca_recovers_planted_direction(spark):
    rng = np.random.default_rng(7)
    direction = np.array([0.6, 0.8, 0.0, 0.0])
    coef = rng.normal(0, 3.0, size=400)
    noise = rng.normal(0, 0.05, size=(400, 4))
    mat = (np.outer(coef, direction) + noise).astype(np.float32)
    cov_df = embedding_covariance(_emb_df(spark, mat), "embedding", dim=4)
    vals, comps = pca_basis(cov_df, dim=4, k=2)
    assert vals[0] > 20 * vals[1]  # planted variance dominates
    top = np.asarray(comps[0])
    assert abs(abs(top @ direction) - 1.0) < 0.01
    assert top[int(np.argmax(np.abs(top)))] > 0  # sign convention


def test_pca_project_matches_numpy(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(0, 1, size=(50, 5)).astype(np.float32)
    basis = [[1.0, 0, 0, 0, 0], [0, 0, 1.0, 0, 0]]
    out = pca_project(
        _emb_df(spark, mat), "embedding", 5, basis, id_col="vec_id"
    )
    got = {r["vec_id"]: r["pc"] for r in out.collect()}
    for i, row in enumerate(mat.astype(np.float64)):
        want = [row[0], row[2]]
        assert max(abs(g - w) for g, w in zip(got[i], want)) < 1e-6
    assert len(got) == 50


def test_covariance_plan_no_corpus_shuffle_before_kernel(spark):
    from jsons_to_schema_spark.operators.linalg import _gram_partials

    rng = np.random.default_rng(2)
    mat = rng.normal(0, 1, size=(40, 3)).astype(np.float32)
    # the corpus pass (audited unpinned — the localCheckpoint pin in
    # embedding_covariance truncates explain output): Arrow-batched fold,
    # no shuffle before the kernel, never row-at-a-time Python
    pplan = audit.formatted_plan(_gram_partials(_emb_df(spark, mat), "embedding", 3))
    assert "MapInArrow" in pplan or "PythonMapInArrow" in pplan
    assert "BatchEvalPython" not in pplan
    df = embedding_covariance(_emb_df(spark, mat), "embedding", dim=3)
    assert "BatchEvalPython" not in audit.formatted_plan(df)
