"""Wave-42 operator tests: exact no-sort quantiles and the water-filling
mixture planner."""

import math
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.sample import mixture_waterfill_plan
from jsons_to_schema_spark.operators.stats import exact_quantiles
from jsons_to_schema_spark.plans import audit


# ---------------------------------------------------------------------------
# exact_quantiles
# ---------------------------------------------------------------------------

def _vals_df(spark, vals, parts=5):
    return spark.createDataFrame([(float(v),) for v in vals], "value double").repartition(parts)


def _brute_q(vals, p):
    s = sorted(vals)
    rank = max(math.ceil(p * len(s) - 1e-9), 1)
    return rank, s[rank - 1]


def _run_q(spark, vals, probs, bins=64, lo=0.0, hi=1.0, parts=5):
    return {
        r["prob"]: (r["n"], r["rank"], r["value"])
        for r in exact_quantiles(
            _vals_df(spark, vals, parts), "value", probs, lo, hi, bins=bins
        ).collect()
    }


def test_quantiles_match_brute_force_with_ties(spark):
    rng = random.Random(41)
    vals = [rng.randrange(0, 30) / 30.0 for _ in range(237)]  # heavy ties
    probs = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = _run_q(spark, vals, probs)
    for p in probs:
        rank, v = _brute_q(vals, p)
        assert got[p] == (237, rank, v), p


@pytest.mark.parametrize("bins", [1, 2, 17, 4096])
def test_quantiles_invariant_to_bin_count(spark, bins):
    rng = random.Random(8)
    vals = [rng.gauss(0.5, 0.7) for _ in range(150)]  # spills past [0,1)
    got = _run_q(spark, vals, [0.25, 0.5, 0.75], bins=bins)
    for p in (0.25, 0.5, 0.75):
        rank, v = _brute_q(vals, p)
        assert got[p] == (150, rank, v), (bins, p)


def test_quantiles_float_boundary_rank(spark):
    """p·n landing on an exact integer must not wobble up a rank."""
    vals = [i / 1000.0 for i in range(1000)]
    got = _run_q(spark, vals, [0.5])
    assert got[0.5][1] == 500  # ceil(0.5*1000) == 500, not 501
    assert got[0.5][2] == sorted(vals)[499]


def test_quantiles_partition_invariance(spark):
    rng = random.Random(2)
    vals = [rng.randrange(0, 12) / 12.0 for _ in range(90)]
    runs = [
        _run_q(spark, vals, [0.1, 0.5, 0.9], parts=p) for p in (1, 3, 11)
    ]
    assert runs[0] == runs[1] == runs[2]


def test_quantiles_validation(spark):
    df = _vals_df(spark, [0.5])
    with pytest.raises(ValueError):
        exact_quantiles(df, "value", [], 0.0, 1.0)
    with pytest.raises(ValueError):
        exact_quantiles(df, "value", [0.0], 0.0, 1.0)
    with pytest.raises(ValueError):
        exact_quantiles(df, "value", [0.5], 1.0, 0.0)


def test_quantiles_plan_bounded_single_partition_only(spark):
    plan = audit.formatted_plan(
        exact_quantiles(_vals_df(spark, [0.1, 0.9]), "value", [0.5], 0.0, 1.0, bins=8)
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(_bin" in plan


def test_quantiles_as_range_boundaries(spark):
    """probs = k/N give boundary keys splitting into N equal-count ranges."""
    rng = random.Random(5)
    vals = [rng.random() for _ in range(400)]
    n_parts = 4
    probs = [k / n_parts for k in range(1, n_parts)]
    got = _run_q(spark, vals, probs)
    bounds = [got[p][2] for p in probs]
    assert bounds == sorted(bounds)
    counts = [sum(1 for v in vals if v <= bounds[0])]
    assert 90 <= counts[0] <= 110  # ~100 of 400 below the first boundary


# ---------------------------------------------------------------------------
# mixture_waterfill_plan
# ---------------------------------------------------------------------------

def _src_df(spark, totals, parts=4):
    """One row per (source, tokens) chunk; totals dict -> two rows each."""
    rows = []
    for s, t in totals.items():
        rows.append((s, t // 2))
        rows.append((s, t - t // 2))
    return spark.createDataFrame(rows, "source string, toks long").repartition(parts)


def _plan(spark, totals, weights, budget):
    return {
        r["source"]: r.asDict()
        for r in mixture_waterfill_plan(
            _src_df(spark, totals), "source", "toks", weights, budget
        ).collect()
    }


def test_waterfill_no_saturation_is_proportional(spark):
    totals = {"a": 10_000, "b": 10_000, "c": 10_000}
    weights = {"a": 500_000, "b": 300_000, "c": 200_000}
    got = _plan(spark, totals, weights, 6_000)
    # lambda = 6000: rates = lambda*w/T
    assert got["a"]["rate"] == round(6000 * 0.5 / 10000, 6)
    assert got["b"]["rate"] == round(6000 * 0.3 / 10000, 6)
    assert got["c"]["rate"] == round(6000 * 0.2 / 10000, 6)
    assert sum(g["planned_tokens"] for g in got.values()) == 6_000
    assert not any(g["saturated"] for g in got.values())


def test_waterfill_saturation_spills(spark):
    totals = {"small": 1_000, "big1": 50_000, "big2": 50_000}
    weights = {"small": 500_000, "big1": 250_000, "big2": 250_000}
    got = _plan(spark, totals, weights, 21_000)
    # small can only give 1000 of its 10500 share; the rest spills
    assert got["small"]["rate"] == 1.0 and got["small"]["saturated"]
    # remaining 20000 split evenly over big1/big2 -> rate 10000/50000
    assert got["big1"]["rate"] == round(10000 / 50000, 6)
    assert got["big2"]["rate"] == got["big1"]["rate"]
    planned = sum(g["planned_tokens"] for g in got.values())
    assert abs(planned - 21_000) <= 2  # round-6 rate quantization


def test_waterfill_budget_exceeds_supply(spark):
    totals = {"a": 100, "b": 200}
    weights = {"a": 500_000, "b": 500_000}
    got = _plan(spark, totals, weights, 10_000)
    assert all(g["rate"] == 1.0 and g["saturated"] for g in got.values())
    assert sum(g["planned_tokens"] for g in got.values()) == 300


def test_waterfill_unweighted_source_reported_zero(spark):
    totals = {"a": 1_000, "ghost": 5_000}
    weights = {"a": 1_000_000}
    got = _plan(spark, totals, weights, 500)
    assert got["ghost"]["rate"] == 0.0 and got["ghost"]["planned_tokens"] == 0
    assert got["ghost"]["weight"] == 0.0
    assert got["a"]["rate"] == 0.5


def test_waterfill_matches_scalar_reference(spark):
    """Random instance vs a scalar bisection solver."""
    rng = random.Random(77)
    totals = {f"s{i}": rng.randrange(500, 20_000) for i in range(9)}
    raw = [rng.randrange(1, 100) for _ in range(9)]
    scale = 1_000_000 / sum(raw)
    weights = {f"s{i}": int(raw[i] * scale) for i in range(9)}
    weights["s0"] += 1_000_000 - sum(weights.values())
    budget = int(0.55 * sum(totals.values()))

    def g(lam):
        return sum(
            min(totals[s], lam * weights[s] / 1e6) for s in totals
        )

    lo_b, hi_b = 0.0, 1e12
    for _ in range(200):
        mid = (lo_b + hi_b) / 2
        if g(mid) < budget:
            lo_b = mid
        else:
            hi_b = mid
    lam = (lo_b + hi_b) / 2
    got = _plan(spark, totals, weights, budget)
    for s in totals:
        want = min(1.0, lam * weights[s] / 1e6 / totals[s])
        assert abs(got[s]["rate"] - want) < 1e-4, s
    planned = sum(g2["planned_tokens"] for g2 in got.values())
    assert abs(planned - budget) <= len(totals)


def test_waterfill_validation(spark):
    df = _src_df(spark, {"a": 10})
    with pytest.raises(ValueError):
        mixture_waterfill_plan(df, "source", "toks", {"a": 999_999}, 10)
    with pytest.raises(ValueError):
        mixture_waterfill_plan(df, "source", "toks", {"a": 1_000_000}, 0)
    with pytest.raises(ValueError):
        mixture_waterfill_plan(
            df, "source", "toks", {"a": 1_500_000, "b": -500_000}, 10
        )
