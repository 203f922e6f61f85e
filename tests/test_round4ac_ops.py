"""Wave-60 operator tests: grouped Gini and 2-D skyline."""

import random

import pytest

from jsons_to_schema_spark.operators.stats import grouped_gini, skyline2d


def _gdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, None if v is None else float(v)) for g, v in rows],
        "g string, v double",
    ).repartition(parts)


def _brute_gini(vals):
    xs = sorted(round(round(v, 6) * 1e6) for v in vals)
    n, s = len(xs), sum(xs)
    if s == 0:
        return n, 0.0, None
    t2 = sum(2 * (i + 1) * x for i, x in enumerate(xs))
    return n, round(s / 1e6, 6), round((t2 - (n + 1) * s) / (n * s), 6)


def test_grouped_gini_matches_per_group_brute(spark):
    rng = random.Random(6001)
    rows = []
    per_group = {}
    for g, lam in (("even", None), ("skewed", 0.005), ("mono", None)):
        vals = []
        for _ in range(200):
            if g == "even":
                vals.append(7.0)
            elif g == "mono":
                vals.append(0.0)
            else:
                vals.append(round(rng.expovariate(lam), 3))
        per_group[g] = vals
        rows += [(g, v) for v in vals]
    per_group["mono"][0] = 500.0
    rows = [(g, v) for g, vs in per_group.items() for v in vs]
    got = {
        r["g"]: (r["n"], r["sum_value"], r["gini"])
        for r in grouped_gini(_gdf(spark, rows), "v", "g", 0.0, 1000.0, 64).collect()
    }
    for g, vals in per_group.items():
        assert got[g] == _brute_gini(vals), g
    assert got["even"][2] == 0.0
    assert got["mono"][2] == round(1.0 - 1 / 200, 6)


def test_grouped_gini_zero_single_partition(spark):
    from jsons_to_schema_spark.plans import audit

    rng = random.Random(6002)
    rows = [(f"g{i % 5}", rng.uniform(0, 100)) for i in range(300)]
    q = grouped_gini(_gdf(spark, rows), "v", "g", 0.0, 100.0, 32)
    assert "SinglePartition" not in audit.formatted_plan(q)


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def _sdf(spark, pts, parts=4):
    return spark.createDataFrame(
        [(i, None if x is None else float(x), None if y is None else float(y))
         for i, (x, y) in enumerate(pts)],
        "id bigint, x double, y double",
    ).repartition(parts)


def _sky(spark, pts, bins=16):
    out = skyline2d(_sdf(spark, pts), "x", "y", ["id"], 0.0, 100.0, bins).collect()
    return {r["id"] for r in out}


def _brute_sky(pts):
    keep = set()
    for i, (x, y) in enumerate(pts):
        if x is None or y is None:
            continue
        dominated = any(
            xx is not None and yy is not None
            and xx >= x and yy >= y and (xx > x or yy > y)
            for j, (xx, yy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            keep.add(i)
    return keep


def test_skyline_hand_example(spark):
    pts = [(1, 9), (5, 5), (9, 1), (3, 3), (5, 9), (9, 9)]
    # (9,9) dominates everything else
    assert _sky(spark, pts) == {5}
    pts2 = [(1, 9), (5, 5), (9, 1), (3, 3)]
    assert _sky(spark, pts2) == {0, 1, 2}  # the classic staircase


def test_skyline_duplicates_all_survive(spark):
    pts = [(5, 5), (5, 5), (1, 9)]
    assert _sky(spark, pts) == {0, 1, 2}


def test_skyline_same_x_strict_y(spark):
    pts = [(5, 5), (5, 7), (4, 6)]
    # (5,5) dominated by (5,7); (4,6) dominated by (5,7)
    assert _sky(spark, pts) == {1}


@pytest.mark.parametrize("seed,n,bins", [(6003, 120, 4), (6004, 300, 64), (6005, 80, 1024)])
def test_skyline_brute_parity_random(spark, seed, n, bins):
    rng = random.Random(seed)
    pts = [
        (round(rng.uniform(0, 100), 1), round(rng.uniform(0, 100), 1))
        for _ in range(n)
    ] + [(None, 5.0), (5.0, None)]
    assert _sky(spark, pts, bins=bins) == _brute_sky(pts)


def test_skyline_validation(spark):
    with pytest.raises(ValueError):
        skyline2d(_sdf(spark, [(1, 2)]), "x", "y", ["id"], 5.0, 1.0)
