"""Wave-69 operator tests: randomization test and RMST."""

import hashlib
import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import randomization_test
from jsons_to_schema_spark.operators.temporal import survival_rmst


def _rdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)],
        "id bigint, arm string, v double",
    ).repartition(parts)


def _rt(spark, rows, permutations=30, seed=42):
    return randomization_test(
        _rdf(spark, rows), "arm", "v", "c", "t", "id", permutations, seed
    ).collect()[0].asDict()


def _brute_rt(rows, permutations=30, seed=42):
    q = [(i, g, round(round(v, 6) * 1e6)) for i, (g, v) in enumerate(rows)]
    nc = sum(1 for _, g, _ in q if g == "c")
    nt = sum(1 for _, g, _ in q if g == "t")
    p_hat = nt / (nc + nt)
    sc = sum(v for _, g, v in q if g == "c")
    st = sum(v for _, g, v in q if g == "t")
    d_obs = math.floor(abs(st / nt / 1e6 - sc / nc / 1e6) * 1e6 + 0.5) / 1e6
    ge = used = 0
    for r in range(permutations):
        dnc = dnt = dsc = dst = 0
        for i, _, v in q:
            h = hashlib.md5(f"perm-{seed}\x1f{r}\x1f{i}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 0.5) / 16**8
            if u < p_hat:
                dnt += 1
                dst += v
            else:
                dnc += 1
                dsc += v
        if dnc == 0 or dnt == 0:
            continue
        used += 1
        d = round(abs(dst / dnt / 1e6 - dsc / dnc / 1e6), 6)
        if d >= d_obs:
            ge += 1
    return nc, nt, d_obs, round((1 + ge) / (used + 1), 6), used


def test_randomization_replay_parity_null_case(spark):
    rng = random.Random(6901)
    rows = [(rng.choice("ct"), rng.uniform(0, 100)) for _ in range(300)]
    got = _rt(spark, rows)
    nc, nt, d, p, used = _brute_rt(rows)
    assert (got["n_control"], got["n_treatment"]) == (nc, nt)
    assert got["abs_diff_observed"] == d
    assert got["p_value"] == p and got["permutations"] == used
    assert got["p_value"] > 0.05  # no real effect


def test_randomization_planted_effect_small_p(spark):
    rng = random.Random(6902)
    rows = [("c", rng.gauss(50, 5)) for _ in range(200)] + [
        ("t", rng.gauss(58, 5)) for _ in range(200)
    ]
    got = _rt(spark, rows, permutations=50)
    assert got["p_value"] == round(1 / 51, 6)  # no draw beats an 8-sigma-ish lift


def test_randomization_validation(spark):
    with pytest.raises(ValueError):
        _rt(spark, [("c", 1.0), ("t", 2.0)], permutations=5)
    with pytest.raises(ValueError, match="non-empty"):
        _rt(spark, [("c", 1.0), ("c", 2.0)])


# ---------------------------------------------------------------------------
# RMST
# ---------------------------------------------------------------------------


def _sdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(float(t), bool(o)) for t, o in rows], "t double, obs boolean"
    ).repartition(parts)


def _rmst(spark, rows, tau):
    return survival_rmst(_sdf(spark, rows), "t", "obs", tau).collect()[0].asDict()


def test_rmst_hand_example(spark):
    rows = [(2.0, True), (5.0, True)]
    got = _rmst(spark, rows, 10.0)
    # S=1 on [0,2), 0.5 on [2,5), 0 on [5,10): 2 + 1.5 + 0 = 3.5
    assert got["rmst"] == 3.5 and got["n"] == 2


def test_rmst_censoring_extends_survival(spark):
    rows = [(2.0, True), (5.0, False)]  # second subject censored at 5
    got = _rmst(spark, rows, 10.0)
    # S=1 on [0,2), 0.5 on [2,5), and STAYS 0.5 to tau (censor, no event)
    assert got["rmst"] == 2 + 0.5 * 3 + 0.5 * 5


def test_rmst_tau_clamps(spark):
    rows = [(8.0, True), (9.0, True)]
    got = _rmst(spark, rows, 5.0)  # tau before any event
    assert got["rmst"] == 5.0
    got2 = _rmst(spark, rows, 8.5)
    assert got2["rmst"] == 8.0 + 0.5 * 0.5


def test_rmst_python_km_replay(spark):
    rng = random.Random(6903)
    rows = [(float(rng.randint(1, 20)), rng.random() < 0.7) for _ in range(120)]
    tau = 15.0
    got = _rmst(spark, rows, tau)
    # python KM replay with the engine's round-6 survival convention
    from collections import Counter

    times = sorted({t for t, _ in rows})
    at_risk = len(rows)
    s = 1.0
    logs = 0.0
    curve = []
    died_out = False
    for t in times:
        d = sum(1 for tt, o in rows if tt == t and o)
        c = sum(1 for tt, o in rows if tt == t and not o)
        if d >= at_risk:
            died_out = True
        if not died_out:
            if d > 0:
                logs += round(math.log((at_risk - d) / at_risk), 6)
            sv = round(math.exp(logs), 6)
        else:
            sv = 0.0
        curve.append((t, sv))
        at_risk -= d + c
    rmst = min(curve[0][0], tau)
    for (t, sv), (t2, _) in zip(curve, curve[1:] + [(tau, None)]):
        seg = max(min(t2, tau) - min(t, tau), 0.0)
        rmst += sv * seg
    assert abs(got["rmst"] - round(rmst, 6)) < 1e-6
