"""Wave-62 operator tests: log-rank test and isotonic calibration."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.modeleval import apply_isotonic, fit_isotonic
from jsons_to_schema_spark.operators.temporal import survival_logrank


def _surv_df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(float(t), bool(o), g) for t, o, g in rows],
        "t double, obs boolean, g string",
    ).repartition(parts)


def _logrank(spark, rows):
    return survival_logrank(_surv_df(spark, rows), "t", "obs", "g").collect()[0].asDict()


def _brute_logrank(rows):
    rows = [(float(t), bool(o), g) for t, o, g in rows]
    groups = sorted({g for _, _, g in rows})
    ga, gb = groups
    times = sorted({t for t, o, _ in rows if o})
    oa = ea = v = 0.0
    for t in times:
        ra = sum(1 for tt, _, g in rows if g == ga and tt >= t)
        rb = sum(1 for tt, _, g in rows if g == gb and tt >= t)
        da = sum(1 for tt, o, g in rows if g == ga and o and tt == t)
        db = sum(1 for tt, o, g in rows if g == gb and o and tt == t)
        n, d = ra + rb, da + db
        if d == 0:
            continue
        oa += da
        ea += ra * d / n
        if n > 1:
            v += d * (ra / n) * (1 - ra / n) * ((n - d) / (n - 1))
    chi2 = (oa - ea) ** 2 / v if v > 0 else None
    return oa, round(ea, 6), None if chi2 is None else round(chi2, 6)


def test_logrank_identical_groups_not_significant(spark):
    rng = random.Random(6201)
    rows = []
    for g in ("a", "b"):
        for _ in range(100):
            rows.append((rng.expovariate(0.1), rng.random() < 0.8, g))
    got = _logrank(spark, rows)
    assert got["significant"] is False
    assert got["chi2"] < 3.841459


def test_logrank_separated_groups_significant(spark):
    rng = random.Random(6202)
    rows = [(rng.expovariate(0.5), True, "fast") for _ in range(80)] + [
        (rng.expovariate(0.05), True, "slow") for _ in range(80)
    ]
    got = _logrank(spark, rows)
    assert got["significant"] is True and got["chi2"] > 20


def test_logrank_brute_parity_with_censoring_and_ties(spark):
    rng = random.Random(6203)
    rows = [
        (float(rng.randint(1, 15)), rng.random() < 0.7, rng.choice(["a", "b"]))
        for _ in range(150)
    ]
    got = _logrank(spark, rows)
    oa, ea, chi2 = _brute_logrank(rows)
    assert got["o_a"] == oa and got["e_a"] == ea and got["chi2"] == chi2
    # bookkeeping identities: e_a + e_b == total observed events
    assert round(got["e_a"] + got["e_b"], 6) == round(float(got["o_a"] + got["o_b"]), 6)


def test_logrank_validation(spark):
    with pytest.raises(ValueError, match="exactly 2"):
        _logrank(spark, [(1.0, True, "a")])
    with pytest.raises(ValueError, match="exactly 2"):
        _logrank(spark, [(1.0, True, g) for g in "abc"])


# ---------------------------------------------------------------------------
# Isotonic
# ---------------------------------------------------------------------------


def _iso_df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(float(s), bool(y)) for s, y in rows], "s double, y boolean"
    ).repartition(parts)


def _brute_pav(rows):
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for s, y in rows:
        k = round(s, 6)
        cells[k][0] += 1
        cells[k][1] += int(y)
    blocks = []
    for s in sorted(cells):
        n, y = cells[s]
        blocks.append([s, s, n, y])
        while len(blocks) >= 2 and blocks[-2][3] * blocks[-1][2] >= blocks[-1][3] * blocks[-2][2]:
            b = blocks.pop()
            a = blocks[-1]
            blocks[-1] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
    return [(b[0], b[1], b[2], b[3], round(b[3] / b[2], 6)) for b in blocks]


def test_isotonic_perfectly_monotone_data_keeps_blocks(spark):
    rows = [(1.0, False)] * 5 + [(2.0, False), (2.0, True)] + [(3.0, True)] * 4
    model = fit_isotonic(_iso_df(spark, rows), "s", "y").collect()
    fits = [(r["score_lo"], r["fitted"]) for r in model]
    assert fits == [(1.0, 0.0), (2.0, 0.5), (3.0, 1.0)]


def test_isotonic_violation_pools(spark):
    # rate DECREASES from score 1 to 2 → PAV pools them
    rows = [(1.0, True)] * 3 + [(1.0, False)] + [(2.0, True)] + [(2.0, False)] * 3
    model = fit_isotonic(_iso_df(spark, rows), "s", "y").collect()
    assert len(model) == 1
    assert model[0]["fitted"] == 0.5 and model[0]["n"] == 8


def test_isotonic_brute_parity_and_monotone(spark):
    rng = random.Random(6204)
    rows = [
        (round(rng.uniform(0, 10), 1), rng.random() < min(0.95, s / 12 + rng.uniform(-0.2, 0.2)))
        for s in [rng.uniform(0, 10) for _ in range(400)]
    ]
    rows = [(s, y) for (s, y) in rows]
    got = [
        (r["score_lo"], r["score_hi"], r["n"], r["n_pos"], r["fitted"])
        for r in fit_isotonic(_iso_df(spark, rows), "s", "y").collect()
    ]
    assert got == _brute_pav(rows)
    fitted = [g[4] for g in got]
    assert fitted == sorted(fitted)  # provably monotone
    assert all(f2 > f1 for f1, f2 in zip(fitted, fitted[1:]))  # strictly, post-PAV


def test_isotonic_apply_step_and_clamp(spark):
    fit_rows = [(1.0, False)] * 4 + [(3.0, True), (3.0, False)] + [(5.0, True)] * 4
    model = fit_isotonic(_iso_df(spark, fit_rows), "s", "y")
    apply_df = spark.createDataFrame(
        [(0.0,), (1.0,), (2.0,), (3.0,), (4.9,), (99.0,), (None,)], "s double"
    )
    out = {r["s"]: r["calibrated"] for r in
           apply_isotonic(apply_df, "s", model).collect()}
    assert out[0.0] == 0.0     # below range clamps to first block
    assert out[1.0] == 0.0
    assert out[2.0] == 0.0     # step: last block with lo <= s
    assert out[3.0] == 0.5
    assert out[4.9] == 0.5
    assert out[99.0] == 1.0    # above range clamps to last block
    assert out[None] is None
