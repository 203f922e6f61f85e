"""Wave-83 operator tests: blocklist scan and detected period."""

import datetime as dt
import random

import pytest

from jsons_to_schema_spark.operators.temporal import detected_period_report
from jsons_to_schema_spark.operators.text import blocklist_scan

EPOCH = dt.datetime(2024, 1, 1)


def _tdf(spark, texts, parts=2):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def test_blocklist_token_exact_no_scunthorpe(spark):
    texts = [
        "the class was about mass spectrometry",   # substrings must NOT hit
        "buy Viagra now and SPAM everyone",
        "clean text entirely",
        "spam spam spam viagra",
    ]
    got = {
        r["doc_id"]: (r["n_hits"], r["n_terms_hit"], r["terms_hit"])
        for r in blocklist_scan(
            _tdf(spark, texts), "text", "doc_id", ["ass", "spam", "VIAGRA"]
        ).collect()
    }
    assert 0 not in got          # Scunthorpe guard: no substring hits
    assert 2 not in got          # clean doc not returned
    assert got[1] == (2, 2, ["spam", "viagra"])  # case-insensitive
    assert got[3] == (4, 2, ["spam", "viagra"])


def test_blocklist_validation(spark):
    with pytest.raises(ValueError):
        blocklist_scan(_tdf(spark, ["x"]), "text", "doc_id", [])


def _sdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(days=d), float(v)) for k, d, v in rows],
        "k string, ts timestamp, v double",
    ).repartition(parts)


def test_detected_period_finds_planted_cycles(spark):
    pat3 = [1.0, 9.0, 4.0]
    pat7 = [2.0, 8.0, 3.0, 9.0, 1.0, 7.0, 5.0]
    rng = random.Random(8301)
    rows = (
        [("three", d, pat3[d % 3]) for d in range(42)]
        + [("seven", d, pat7[d % 7]) for d in range(42)]
        + [("noise", d, rng.uniform(0, 10)) for d in range(42)]
    )
    got = {
        r["k"]: (r["period"], r["period_acf"])
        for r in detected_period_report(
            _sdf(spark, rows), ["k"], "ts", "v", 86400, max_lag=14
        ).collect()
    }
    # smallest-lag tie-break: period 3 reports 3, not its harmonics 6/9/12
    assert got["three"][0] == 3 and got["three"][1] == 1.0
    assert got["seven"][0] == 7 and got["seven"][1] == 1.0
    # white noise: whatever lag wins is weak; no strong periodicity claim
    assert got["noise"][1] is None or got["noise"][1] < 0.5


def test_detected_period_trend_without_cycle_null_or_weak(spark):
    rows = [("trend", d, 2.0 * d) for d in range(30)]
    got = detected_period_report(
        _sdf(spark, rows), ["k"], "ts", "v", 86400, max_lag=10
    ).collect()[0]
    # a pure linear trend has high ACF at EVERY lag; the report still
    # returns the smallest lag 2 — the caller sees acf≈1 across the board
    # and must deseasonalize/detrend first; the contract documents lag-1
    # exclusion, not trend removal
    assert got["period"] == 2


def test_detected_period_validation(spark):
    df = _sdf(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        detected_period_report(df, ["k"], "ts", "v", 86400, max_lag=1)
