"""Wave-51 operator tests: HITS hubs/authorities and cross-correlation."""

import datetime as dt
import math
import random

import pytest

from jsons_to_schema_spark.operators.graph import hits
from jsons_to_schema_spark.operators.temporal import cross_correlation

UNIT = 1_000_000


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _hits(spark, pairs, iterations=4, parts=4):
    out = hits(_edges(spark, pairs, parts=parts), iterations=iterations).collect()
    return {(r["side"], r["node"]): r["score_micro"] for r in out}


def _brute_hits(pairs, iterations=4):
    e = sorted({(str(a), str(b)) for a, b in pairs})
    hn = sorted({s for s, _ in e})
    an = sorted({d for _, d in e})
    th, ta = len(hn) * UNIT, len(an) * UNIT
    h = {n: UNIT for n in hn}
    a = {n: UNIT for n in an}
    for _ in range(iterations):
        raw = {n: 0 for n in an}
        for s, d in e:
            raw[d] += h[s]
        t = sum(raw.values())
        a = {n: raw[n] * ta // t for n in an}
        raw = {n: 0 for n in hn}
        for s, d in e:
            raw[s] += a[d]
        t = sum(raw.values())
        h = {n: raw[n] * th // t for n in hn}
    out = {("hub", n): v for n, v in h.items()}
    out.update({("authority", n): v for n, v in a.items()})
    return out


def test_hits_star_ranks_hub_and_authority(spark):
    pairs = [("d1", "m1"), ("d1", "m2"), ("d1", "m3"), ("d2", "m1"), ("d3", "m1")]
    got = _hits(spark, pairs)
    assert got == _brute_hits(pairs)
    # d1 links everything -> top hub; m1 linked by everyone -> top authority
    hubs = {n: v for (s, n), v in got.items() if s == "hub"}
    auths = {n: v for (s, n), v in got.items() if s == "authority"}
    assert max(hubs, key=hubs.get) == "d1"
    assert max(auths, key=auths.get) == "m1"


def test_hits_node_on_both_sides(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    got = _hits(spark, pairs)
    assert got == _brute_hits(pairs)
    # b appears as hub AND authority, scored independently per side
    assert ("hub", "b") in got and ("authority", "b") in got


@pytest.mark.parametrize("seed,nd,nm,ne", [(5101, 12, 8, 40), (5102, 30, 10, 90)])
def test_hits_brute_parity_random(spark, seed, nd, nm, ne):
    rng = random.Random(seed)
    pairs = [
        (f"d{rng.randrange(nd)}", f"m{rng.randrange(nm)}") for _ in range(ne)
    ]
    assert _hits(spark, pairs) == _brute_hits(pairs)


def test_hits_partition_invariance(spark):
    rng = random.Random(5103)
    pairs = [(f"d{rng.randrange(10)}", f"m{rng.randrange(6)}") for _ in range(30)]
    outs = [_hits(spark, pairs, parts=p) for p in (1, 3, 8)]
    assert outs[0] == outs[1] == outs[2]


def test_hits_validation(spark):
    with pytest.raises(ValueError):
        hits(_edges(spark, [("a", "b")]), iterations=0)


# ---------------------------------------------------------------------------
# Cross-correlation
# ---------------------------------------------------------------------------

EPOCH = dt.datetime(2024, 1, 1)


def _xdf(spark, rows, parts=4):
    # rows: (key, day, x, y)
    return spark.createDataFrame(
        [
            (
                k,
                EPOCH + dt.timedelta(days=d),
                None if x is None else float(x),
                None if y is None else float(y),
            )
            for k, d, x, y in rows
        ],
        "k string, ts timestamp, x double, y double",
    ).repartition(parts)


def _xcorr(spark, rows, lags, **kw):
    out = cross_correlation(
        _xdf(spark, rows), ["k"], "ts", "x", "y", 86400, lags, **kw
    ).collect()
    return {(r["k"], r["lag"]): (r["n_pairs"], r["xcorr"]) for r in out}


def _brute_xcorr(rows, lags, x_agg="avg", y_agg="avg"):
    cells = {}
    for k, d, x, y in rows:
        cells.setdefault((k, d), ([], []))
        if x is not None:
            cells[(k, d)][0].append(float(x))
        if y is not None:
            cells[(k, d)][1].append(float(y))

    def _agg(vals, ag):
        if ag == "count":
            return len(vals)
        if not vals:
            return None
        return round(sum(vals) / len(vals), 6) if ag == "avg" else None

    xm, ym = {}, {}
    for (k, d), (xs, ys) in cells.items():
        xv, yv = _agg(xs, x_agg), _agg(ys, y_agg)
        if xv is not None:
            xm[(k, d)] = round(xv * 1e6)
        if yv is not None:
            ym[(k, d)] = round(yv * 1e6)
    out = {}
    for k in {k for k, _ in cells}:
        for lag in lags:
            pairs = [
                (xm[(k, d)], ym[(k, d + lag)])
                for (kk, d) in xm
                if kk == k and (k, d + lag) in ym
            ]
            n = len(pairs)
            if n < 2:
                out[(k, lag)] = (n, None)
                continue
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxx = sum(p[0] * p[0] for p in pairs)
            syy = sum(p[1] * p[1] for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            out[(k, lag)] = (
                (n, None)
                if vx <= 0 or vy <= 0
                else (n, round((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)), 6))
            )
    return out


def test_xcorr_shifted_copy_peaks_at_shift(spark):
    vals = [1.0, 4.0, 2.0, 8.0, 5.0, 9.0, 3.0, 7.0, 6.0, 0.0] * 3
    rows = [("a", d, vals[d], vals[d - 2] if d >= 2 else None) for d in range(30)]
    got = _xcorr(spark, rows, [-2, 0, 2])
    n2, c2 = got[("a", 2)]
    assert c2 == 1.0  # y_t = x_{t-2}: x leads y by exactly 2
    assert got[("a", 0)][1] < 1.0
    assert got == _brute_xcorr(rows, [-2, 0, 2])


def test_xcorr_negative_lag_mirrors_swapped_series(spark):
    rng = random.Random(5104)
    rows = [
        ("a", d, rng.uniform(0, 10), rng.uniform(0, 10)) for d in range(25)
    ]
    fwd = _xcorr(spark, rows, [3])
    swapped = [(k, d, y, x) for k, d, x, y in rows]
    rev = _xcorr(spark, swapped, [-3])
    assert fwd[("a", 3)] == rev[("a", -3)]


def test_xcorr_count_agg_and_gaps_brute_parity(spark):
    rng = random.Random(5105)
    rows = []
    for k in ("a", "b"):
        for d in range(40):
            if rng.random() < 0.75:
                for _ in range(rng.randint(1, 4)):
                    rows.append((k, d, round(rng.uniform(0, 50), 3), 1.0))
    got = _xcorr(spark, rows, [-2, 0, 1], y_agg="count")
    assert got == _brute_xcorr(rows, [-2, 0, 1], y_agg="count")


def test_xcorr_one_sided_null_cells(spark):
    # days where x is NULL still supply y pairs, and vice versa
    rows = [("a", d, None if d % 3 == 0 else d * 1.0 + (d % 5),
             None if d % 4 == 0 else (d % 7) * 2.0) for d in range(24)]
    got = _xcorr(spark, rows, [1])
    assert got == _brute_xcorr(rows, [1])


def test_xcorr_validation(spark):
    df = _xdf(spark, [("a", 0, 1.0, 2.0)])
    with pytest.raises(ValueError):
        cross_correlation(df, [], "ts", "x", "y", 86400, [1])
    with pytest.raises(ValueError):
        cross_correlation(df, ["k"], "ts", "x", "y", 86400, [])
    with pytest.raises(ValueError):
        cross_correlation(df, ["k"], "ts", "x", "y", 86400, [1], x_agg="median")
