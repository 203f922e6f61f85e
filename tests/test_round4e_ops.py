"""Unit tests for the round-4 fifth-continuation operators: ordered funnel
conversion, Benford first-digit profiling, and level-shift changepoint
scanning — brute-force reference comparisons plus the edge cases the driver
oracle can't plant."""

import math
import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import drift, stats, temporal


# ---------------------------------------------------------------- funnel ----


def _ts(h):
    return datetime(2024, 1, 1) + timedelta(hours=h)


def _funnel_rows():
    rng = random.Random(44)
    rows = []
    for u in range(60):
        for _ in range(rng.randint(1, 8)):
            rows.append(
                (f"u{u}", _ts(rng.randint(0, 200)), rng.choice(list("ABC")))
            )
    rows += [(None, _ts(1), "A"), ("uX", None, "A")]
    return rows


def _brute_funnel(rows, steps, within_h=None):
    by_u = defaultdict(list)
    for u, t, s in rows:
        if u is None or t is None:
            continue
        by_u[u].append((t, s))
    counts = []
    survivors = {}
    for i, step in enumerate(steps):
        nxt = {}
        for u, evs in by_u.items():
            if i > 0 and u not in survivors:
                continue
            prev_t = survivors.get(u)
            cands = [
                t
                for t, s in evs
                if s == step
                and (i == 0 or t > prev_t)
                and (
                    i == 0
                    or within_h is None
                    or t <= prev_t + timedelta(hours=within_h)
                )
            ]
            if cands:
                nxt[u] = min(cands)
        survivors = nxt
        counts.append(len(nxt))
    return counts


def test_funnel_matches_brute_force(spark):
    rows = _funnel_rows()
    df = spark.createDataFrame(rows, "u string, ts timestamp, s string")
    out = temporal.funnel(df, "u", "ts", "s", ["A", "B", "C"]).collect()
    expect = _brute_funnel(rows, ["A", "B", "C"])
    got = {r.step: r.n_keys for r in out}
    assert got == {i + 1: n for i, n in enumerate(expect)}
    by_step = {r.step: r for r in out}
    assert by_step[1].conv_from_first == 1.0
    assert by_step[1].conv_from_prev is None
    for i in (2, 3):
        assert by_step[i].conv_from_first == round(
            by_step[i].n_keys / by_step[1].n_keys, 6
        )
        assert by_step[i].conv_from_prev == round(
            by_step[i].n_keys / by_step[i - 1].n_keys, 6
        )


def test_funnel_within_window_tightens(spark):
    rows = _funnel_rows()
    df = spark.createDataFrame(rows, "u string, ts timestamp, s string")
    base = {
        r.step: r.n_keys
        for r in temporal.funnel(df, "u", "ts", "s", ["A", "B", "C"]).collect()
    }
    tight = {
        r.step: r.n_keys
        for r in temporal.funnel(
            df, "u", "ts", "s", ["A", "B", "C"], within_seconds=24 * 3600
        ).collect()
    }
    expect = _brute_funnel(rows, ["A", "B", "C"], within_h=24)
    assert tight == {i + 1: n for i, n in enumerate(expect)}
    assert tight[1] == base[1]  # window applies to hops, not entry
    assert tight[2] <= base[2] and tight[3] <= base[3]


def test_funnel_strictly_after_and_order(spark):
    t = _ts(5)
    df = spark.createDataFrame(
        [
            ("u1", t, "A"),
            ("u1", t, "B"),          # same instant: NOT a progression
            ("u2", _ts(3), "B"),
            ("u2", _ts(4), "A"),     # B before A: u2 never reaches step 2
            ("u3", _ts(1), "A"),
            ("u3", _ts(2), "B"),
        ],
        "u string, ts timestamp, s string",
    )
    got = {r.step: r.n_keys for r in temporal.funnel(df, "u", "ts", "s", ["A", "B"]).collect()}
    assert got == {1: 3, 2: 1}


def test_funnel_empty_first_stage(spark):
    df = spark.createDataFrame([("u", _ts(0), "Z")], "u string, ts timestamp, s string")
    out = temporal.funnel(df, "u", "ts", "s", ["A", "B"]).collect()
    got = {r.step: (r.n_keys, r.conv_from_first) for r in out}
    assert got == {1: (0, None), 2: (0, None)}


def test_funnel_validates(spark):
    df = spark.createDataFrame([("u", _ts(0), "A")], "u string, ts timestamp, s string")
    with pytest.raises(ValueError, match="2 steps"):
        temporal.funnel(df, "u", "ts", "s", ["A"])
    with pytest.raises(ValueError, match="distinct"):
        temporal.funnel(df, "u", "ts", "s", ["A", "A"])
    with pytest.raises(ValueError, match="within_seconds"):
        temporal.funnel(df, "u", "ts", "s", ["A", "B"], within_seconds=0)


# --------------------------------------------------------------- benford ----


def _brute_benford(values, critical=15.507):
    c = Counter()
    for v in values:
        if v is None or abs(v) < 1 or abs(v) >= 9.0e18:
            continue
        c[int(str(int(abs(v)))[0])] += 1
    n = sum(c.values())
    chi2 = sum(
        (c.get(d, 0) - n * math.log10(1 + 1 / d)) ** 2
        / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    return c, n, round(chi2, 6), round(chi2, 6) > critical


def test_benford_profile_matches_brute_force(spark):
    rng = random.Random(45)
    values = [float(rng.randint(1, 99999)) for _ in range(600)]
    values += [None, 0.5, -273.0, 9.5e18]  # excluded: null, <1, overflow; kept: -273
    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = stats.benford_conformance(df, "v").collect()
    c, n, chi2, violate = _brute_benford(values)
    assert len(out) == 9
    for r in out:
        assert r.n == c.get(r.digit, 0)
        assert r.observed_p == round(r.n / n, 6)
        assert r.expected_p == round(math.log10(1 + 1 / r.digit), 6)
        assert r.chi2 == chi2
        assert r.benford_violate == violate


def test_benford_zero_observed_digit_still_counts(spark):
    # all values lead with 1: digits 2-9 unobserved but contribute n*p to chi2
    df = spark.createDataFrame([(float(10 + i),) for i in range(10)], "v double")
    out = {r.digit: r for r in stats.benford_conformance(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n == 10 and out[9].n == 0
    c, n, chi2, violate = _brute_benford([float(10 + i) for i in range(10)])
    assert out[5].chi2 == chi2 and violate and out[5].benford_violate


def test_benford_grouped_and_negative(spark):
    rows = [("a", float(v)) for v in range(1, 400)] + [
        ("b", -float(10 ** (i % 4) * d)) for i, d in enumerate([1, 2, 3] * 50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.benford_conformance(df, "v", group_col="g").collect()
    assert len(out) == 18  # 9 digits per group
    ga = [r for r in out if r.g == "a"]
    gb = [r for r in out if r.g == "b"]
    _, _, chi2_a, _ = _brute_benford([float(v) for v in range(1, 400)])
    _, _, chi2_b, _ = _brute_benford(
        [-float(10 ** (i % 4) * d) for i, d in enumerate([1, 2, 3] * 50)]
    )
    assert ga[0].chi2 == chi2_a and gb[0].chi2 == chi2_b


def test_benford_empty_source_empty_report(spark):
    df = spark.createDataFrame([(0.2,), (None,)], "v double")
    assert stats.benford_conformance(df, "v").count() == 0


# ----------------------------------------------------------- level shift ----


def _shift_rows(jump=150.0, cut=20, days=30, per_day=8):
    rng = random.Random(46)
    rows = []
    for d in range(days):
        for _ in range(per_day):
            v = 100.0 + rng.random() * 10.0 + (jump if d >= cut else 0.0)
            rows.append((datetime(2024, 1, 1) + timedelta(days=d, hours=rng.randint(0, 23)), v))
    return rows


def _brute_level_shift(rows, every_s=86400, min_side=2):
    cells = defaultdict(list)
    for t, v in rows:
        us = int((t - datetime(1970, 1, 1)).total_seconds()) * 1_000_000
        cells[us - us % (every_s * 1_000_000)].append(v)
    buckets = sorted(cells)
    means = [round(sum(cells[b]) / len(cells[b]), 6) for b in buckets]
    n = len(means)
    mu = sum(means) / n
    s = math.sqrt(sum((m - mu) ** 2 for m in means) / (n - 1))
    best = None
    for i in range(min_side, n - min_side + 1):
        ml = sum(means[:i]) / i
        mr = sum(means[i:]) / (n - i)
        stat = round(abs(ml - mr) / (s * math.sqrt(1 / i + 1 / (n - i))), 6)
        key = (stat, -buckets[i - 1])
        if best is None or key > best[0]:
            best = (key, buckets[i], n, round(ml, 6), round(mr, 6), round(mr - ml, 6), stat)
    return best[1:]


def test_level_shift_finds_planted_boundary(spark):
    rows = _shift_rows()
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    r = drift.level_shift(df, "ts", "v", 86400).collect()
    assert len(r) == 1
    r = r[0]
    bb, n, ml, mr, sh, st = _brute_level_shift(rows)
    assert (r.boundary_bucket_us, r.n_buckets) == (bb, n)
    assert (r.mean_before, r.mean_after, r.shift, r.stat) == (ml, mr, sh, st)
    assert r.shifted
    # the planted boundary is day 20
    assert r.boundary_bucket_us == int(
        (datetime(2024, 1, 21) - datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000


def test_level_shift_quiet_series_not_shifted(spark):
    rows = _shift_rows(jump=0.0)
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    r = drift.level_shift(df, "ts", "v", 86400).collect()[0]
    assert not r.shifted and r.stat < 4.0


def test_level_shift_constant_series_false_verdict(spark):
    rows = [(datetime(2024, 1, 1) + timedelta(days=d), 5.0) for d in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    r = drift.level_shift(df, "ts", "v", 86400).collect()[0]
    assert r.shifted is False and r.stat is None


def test_level_shift_too_few_buckets_empty(spark):
    rows = [(datetime(2024, 1, 1) + timedelta(days=d), float(d)) for d in range(3)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    assert drift.level_shift(df, "ts", "v", 86400, min_side=2).count() == 0


def test_level_shift_partition_invariance(spark):
    rows = _shift_rows()
    base = None
    for k in (1, 9):
        df = spark.createDataFrame(rows, "ts timestamp, v double").repartition(k)
        got = [tuple(r) for r in drift.level_shift(df, "ts", "v", 86400).collect()]
        base = got if base is None else base
        assert got == base


def test_level_shift_validates(spark):
    df = spark.createDataFrame([(datetime(2024, 1, 1), 1.0)], "ts timestamp, v double")
    with pytest.raises(ValueError, match="every_seconds"):
        drift.level_shift(df, "ts", "v", 0)
    with pytest.raises(ValueError, match="min_side"):
        drift.level_shift(df, "ts", "v", 60, min_side=0)
