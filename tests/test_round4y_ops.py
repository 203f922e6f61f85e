"""Wave-55 operator tests: Theil–Sen robust trend."""

import datetime as dt
import math
import random

import pytest

from jsons_to_schema_spark.operators.temporal import theil_sen

EPOCH = dt.datetime(2024, 1, 1)


def _sdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(days=d), float(v)) for k, d, v in rows],
        "k string, ts timestamp, v double",
    ).repartition(parts)


def _ts(spark, rows):
    out = theil_sen(_sdf(spark, rows), ["k"], "ts", "v", 86400).collect()
    return {
        r["k"]: (r["n_points"], r["n_pairs"], r["slope"], r["intercept"])
        for r in out
    }


def _brute_ts(rows):
    cells = {}
    for k, d, v in rows:
        cells.setdefault(k, {}).setdefault(d, []).append(float(v))
    out = {}
    for k, by_day in cells.items():
        days = sorted(by_day)
        mn = days[0]
        pts = [
            (d - mn, round(round(sum(vs) / len(vs), 6) * 1e6))
            for d, vs in sorted(by_day.items())
        ]
        n = len(pts)
        if n < 2:
            out[k] = (n, 0, None, None)
            continue
        slopes = sorted(
            round((y2 - y1) / 1e6 / (x2 - x1), 6)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
        )
        m = len(slopes)
        slope = slopes[math.ceil(m / 2 - 1e-9) - 1]
        resid = sorted(round(y / 1e6 - slope * x, 6) for x, y in pts)
        intercept = resid[math.ceil(n / 2 - 1e-9) - 1]
        out[k] = (n, m, slope, intercept)
    return out


def test_theil_sen_exact_line(spark):
    rows = [("a", d, 3.5 * d + 10.0) for d in range(20)]
    got = _ts(spark, rows)
    n, m, slope, intercept = got["a"]
    assert (n, m) == (20, 190)
    assert slope == 3.5 and intercept == 10.0


def test_theil_sen_resists_outliers(spark):
    rows = [("a", d, 2.0 * d + 5.0) for d in range(30)]
    # corrupt 5 of 30 days with wild spikes: OLS would bend, Theil–Sen not
    rows = [
        (k, d, v + (1000.0 if d in (3, 11, 17, 23, 29) else 0.0))
        for k, d, v in rows
    ]
    got = _ts(spark, rows)
    _, _, slope, intercept = got["a"]
    assert abs(slope - 2.0) < 0.2
    assert got == _brute_ts(rows)


def test_theil_sen_brute_parity_random_multikey(spark):
    rng = random.Random(5501)
    rows = []
    for k in ("a", "b", "c"):
        for d in range(25):
            if rng.random() < 0.8:
                for _ in range(rng.randint(1, 2)):
                    rows.append((k, d, round(rng.uniform(-50, 50), 3)))
    got = _ts(spark, rows)
    assert got == _brute_ts(rows)


def test_theil_sen_single_point_and_gaps(spark):
    rows = [("lone", 5, 7.0)] + [("g", d, float(d)) for d in (0, 10, 20)]
    got = _ts(spark, rows)
    assert got["lone"] == (1, 0, None, None)
    n, m, slope, intercept = got["g"]
    assert (n, m) == (3, 3)
    assert slope == 1.0 and intercept == 0.0  # gaps weight by time, not rank


def test_theil_sen_validation(spark):
    df = _sdf(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        theil_sen(df, [], "ts", "v", 86400)
    with pytest.raises(ValueError):
        theil_sen(df, ["k"], "ts", "v", 0)
