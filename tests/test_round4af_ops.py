"""Wave-63 operator tests: Poisson bootstrap CI and CUPED report."""

import hashlib
import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import (
    _POIS1_CUM,
    bootstrap_mean_ci,
    cuped_ab_report,
)


def _bdf(spark, vals, parts=4):
    return spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
        "id bigint, v double",
    ).repartition(parts)


def _boot(spark, vals, replicates=32, seed=42, alpha=0.05, parts=4):
    return bootstrap_mean_ci(
        _bdf(spark, vals, parts=parts), "v", "id", replicates, seed, alpha
    ).collect()[0].asDict()


def _pois(u):
    for k, c in enumerate(_POIS1_CUM):
        if u < c:
            return k
    return len(_POIS1_CUM)


def _brute_boot(vals, replicates=32, seed=42, alpha=0.05):
    rows = [(i, round(round(v, 6) * 1e6)) for i, v in enumerate(vals) if v is not None]
    means = []
    for r in range(replicates):
        sw = swv = 0
        for i, vm in rows:
            h = hashlib.md5(f"boot-{seed}\x1f{r}\x1f{i}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 0.5) / 16**8
            w = _pois(u)
            sw += w
            swv += w * vm
        if sw > 0:
            means.append((round(swv / sw / 1e6, 6), r))
    means.sort()
    nr = len(means)
    lo = means[max(math.ceil(alpha / 2 * nr - 1e-9), 1) - 1][0]
    hi = means[max(math.ceil((1 - alpha / 2) * nr - 1e-9), 1) - 1][0]
    n = len(rows)
    mean = round(sum(vm for _, vm in rows) / n / 1e6, 6)
    return n, mean, lo, hi


def test_bootstrap_replay_parity(spark):
    rng = random.Random(6301)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(200)] + [None]
    got = _boot(spark, vals, replicates=16)
    n, mean, lo, hi = _brute_boot(vals, replicates=16)
    assert (got["n"], got["mean"], got["ci_lo"], got["ci_hi"]) == (n, mean, lo, hi)
    assert lo <= mean <= hi


def test_bootstrap_partition_invariance_and_width(spark):
    rng = random.Random(6302)
    vals = [rng.gauss(50, 10) for _ in range(500)]
    outs = [_boot(spark, vals, parts=p) for p in (1, 8)]
    assert outs[0] == outs[1]
    # CI width should be in the right ballpark of 2*1.96*sd/sqrt(n)
    width = outs[0]["ci_hi"] - outs[0]["ci_lo"]
    expect = 2 * 1.96 * 10 / math.sqrt(500)
    assert 0.3 * expect < width < 3 * expect


def test_bootstrap_validation(spark):
    with pytest.raises(ValueError):
        _boot(spark, [1.0], replicates=2)
    with pytest.raises(ValueError):
        _boot(spark, [1.0], alpha=1.5)


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def _cdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, float(y), float(x)) for g, y, x in rows],
        "arm string, y double, x double",
    ).repartition(parts)


def test_cuped_tightens_when_covariate_explains(spark):
    rng = random.Random(6303)
    rows = []
    for _ in range(400):
        pre = rng.gauss(100, 20)          # pre-period usage
        rows.append(("control", pre * 0.9 + rng.gauss(0, 2), pre))
        pre = rng.gauss(100, 20)
        rows.append(("treat", pre * 0.9 + 1.0 + rng.gauss(0, 2), pre))
    out = cuped_ab_report(
        _cdf(spark, rows), "arm", "y", "x", "control", "treat"
    ).collect()[0].asDict()
    assert out["var_reduction_pct"] > 90    # covariate explains almost all
    assert abs(out["theta"] - 0.9) < 0.05
    assert out["significant"] is True       # the 1.0 lift is now visible
    assert 0.5 < out["abs_lift_adj"] < 1.5


def test_cuped_useless_covariate_matches_welch_direction(spark):
    rng = random.Random(6304)
    rows = []
    for _ in range(300):
        rows.append(("control", rng.gauss(10, 3), rng.uniform(0, 1)))
        rows.append(("treat", rng.gauss(10.2, 3), rng.uniform(0, 1)))
    out = cuped_ab_report(
        _cdf(spark, rows), "arm", "y", "x", "control", "treat"
    ).collect()[0].asDict()
    assert abs(out["theta"]) < 0.5
    assert out["var_reduction_pct"] < 5


def test_cuped_brute_parity(spark):
    rng = random.Random(6305)
    rows = [
        (rng.choice(["control", "treat"]), round(rng.uniform(0, 50), 3),
         round(rng.uniform(0, 30), 3))
        for _ in range(300)
    ]
    out = cuped_ab_report(
        _cdf(spark, rows), "arm", "y", "x", "control", "treat"
    ).collect()[0].asDict()
    # python replay on the quantized micro values
    q = [(g, round(round(y, 6) * 1e6), round(round(x, 6) * 1e6)) for g, y, x in rows]
    n = len(q)
    sx = sum(x for _, _, x in q)
    sy = sum(y for _, y, _ in q)
    sxx = sum(x * x for _, _, x in q)
    sxy = sum(x * y for _, y, x in q)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(out["theta"] - round(theta, 6)) <= 1e-6
    for g, key in (("control", "mean_control_adj"), ("treat", "mean_treatment_adj")):
        arm = [(y, x) for gg, y, x in q if gg == g]
        my = sum(y for y, _ in arm) / len(arm) / 1e6
        mx = sum(x for _, x in arm) / len(arm) / 1e6
        gx = sx / n / 1e6
        assert abs(out[key] - (my - theta * (mx - gx))) < 1e-5
