"""Wave-81 operator tests: inter-arrival burstiness profile."""

import datetime as dt
import math
import random
import statistics

import pytest

from jsons_to_schema_spark.operators.temporal import interarrival_profile

EPOCH = dt.datetime(2024, 1, 1)


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rows)],
        "k string, ts timestamp, eid bigint",
    ).repartition(parts)


def _ia(spark, rows):
    out = interarrival_profile(_df(spark, rows), "k", "ts", "eid").collect()
    return {
        r["k"]: (
            r["n_events"], r["n_gaps"], r["mean_gap_s"],
            r["cv_gap"], r["burstiness"], r["max_gap_s"],
        )
        for r in out
    }


def test_metronome_vs_bursty(spark):
    rows = [("bot", 10.0 * i) for i in range(50)]
    bursty = []
    t = 0.0
    rng = random.Random(8101)
    for _ in range(10):  # sessions of rapid fire, long silences between
        for _ in range(5):
            t += rng.uniform(0.1, 0.5)
            bursty.append(("human", t))
        t += rng.uniform(500, 2000)
    got = _ia(spark, rows + bursty)
    assert got["bot"][3] == 0.0          # perfect metronome: CV 0
    assert got["bot"][4] == -1.0         # burstiness floor
    assert got["human"][3] > 1.5         # session-bursty
    assert got["human"][4] > 0.2


def test_brute_parity_and_ties(spark):
    rng = random.Random(8102)
    rows = []
    for k in ("a", "b"):
        t = 0.0
        for _ in range(40):
            t += rng.choice([0.0, 1.0, 2.5, 60.0])  # exact ties included
            rows.append((k, t))
    got = _ia(spark, rows)
    for k in ("a", "b"):
        ts = sorted(
            (s, i) for i, (kk, s) in enumerate(rows) if kk == k
        )
        gaps = [
            round((b[0] - a[0]) * 1e6) for a, b in zip(ts, ts[1:])
        ]
        n = len(gaps)
        mean = sum(gaps) / n
        var = (sum(g * g for g in gaps) - sum(gaps) ** 2 / n) / (n - 1)
        cv = math.sqrt(max(var, 0.0)) / mean
        assert got[k][0] == n + 1 and got[k][1] == n
        assert got[k][2] == round(mean / 1e6, 6)
        assert abs(got[k][3] - cv) < 1e-6
        assert got[k][5] == round(max(gaps) / 1e6, 6)


def test_degenerate_keys(spark):
    rows = [("solo", 5.0), ("pair", 1.0), ("pair", 7.0)]
    got = _ia(spark, rows)
    assert got["solo"] == (1, 0, None, None, None, None)
    n_e, n_g, mean, cv, b, mx = got["pair"]
    assert (n_e, n_g, mean, mx) == (2, 1, 6.0, 6.0)
    assert cv is None and b is None  # one gap: no dispersion
