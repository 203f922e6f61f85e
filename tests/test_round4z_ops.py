"""Wave-56 operator tests: scale-mismatch report and relationship profile."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import (
    relationship_profile,
    scale_mismatch_report,
)


def _vdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(g, None if v is None else float(v)) for g, v in rows],
        "src string, v double",
    ).repartition(parts)


def _scale(spark, rows):
    out = scale_mismatch_report(_vdf(spark, rows), "src", "v").collect()
    return {
        (r["group_a"], r["group_b"]): (
            r["median_mag_a"], r["median_mag_b"], r["decade_offset"], r["flagged"]
        )
        for r in out
    }


def test_scale_mismatch_detects_cents_source(spark):
    rng = random.Random(5601)
    rows = []
    for _ in range(300):
        base = rng.uniform(5, 500)          # dollars
        rows.append(("dollars_a", base))
        rows.append(("dollars_b", base * rng.uniform(0.8, 1.2)))
        rows.append(("cents", base * 100))  # the unit bug
    got = _scale(spark, rows)
    ab = got[("dollars_a", "dollars_b")]
    assert ab[3] is False and ab[2] == 0
    ac = got[("cents", "dollars_a")]       # pairs ordered by group name
    assert ac[2] == -2 and ac[3] is True   # cents sits 2 decades above
    bc = got[("cents", "dollars_b")]
    assert bc[2] == -2 and bc[3] is True


def test_scale_mismatch_wide_but_organic_not_flagged(spark):
    rng = random.Random(5602)
    # medians ~1.5 decades apart but NOT a clean integer shift
    rows = [("a", rng.uniform(1, 10)) for _ in range(200)] + [
        ("b", rng.uniform(30, 300)) for _ in range(200)
    ]
    got = _scale(spark, rows)
    (ma, mb, off, flagged) = got[("a", "b")]
    resid = abs((mb - ma) - off)
    assert flagged == (abs(off) >= 1 and resid <= 0.2)


def test_scale_mismatch_median_replay(spark):
    rows = [("a", v) for v in (1.0, 10.0, 100.0, 0.0, None)] + [
        ("b", v) for v in (1000.0, 10000.0)
    ]
    got = _scale(spark, rows)
    ma, mb, off, flagged = got[("a", "b")]
    # a: mags [0,1,2] (zero/NULL excluded) → rank 2 → 1.0
    # b: mags [3,4] → rank 1 → 3.0
    assert ma == 1.0 and mb == 3.0
    assert off == 2 and flagged is True


# ---------------------------------------------------------------------------
# Relationship profile
# ---------------------------------------------------------------------------


def _kdf(spark, keys, parts=4):
    return spark.createDataFrame(
        [(k,) for k in keys], "k string"
    ).repartition(parts)


def _rel(spark, a_keys, b_keys):
    row = relationship_profile(
        _kdf(spark, a_keys), "k", _kdf(spark, b_keys), "k"
    ).collect()[0]
    return row.asDict()


def test_relationship_one_to_one(spark):
    got = _rel(spark, ["a", "b", "c"], ["b", "c", "d"])
    assert got["relationship"] == "one_to_one"
    assert got["n_matched_keys"] == 2
    assert got["a_unmatched"] == 1 and got["b_unmatched"] == 1


def test_relationship_many_to_one_and_degradation(spark):
    # classic orders → customer: many orders per customer, customer unique
    got = _rel(spark, ["c1", "c1", "c2", "c2", "c2"], ["c1", "c2", "c3"])
    assert got["relationship"] == "many_to_one"
    assert got["max_per_key_a"] == 3 and got["max_per_key_b"] == 1
    # a duplicated customer row degrades it to many_to_many — the bug class
    got2 = _rel(spark, ["c1", "c1"], ["c1", "c1"])
    assert got2["relationship"] == "many_to_many"


def test_relationship_one_to_many_and_nulls(spark):
    got = _rel(spark, ["k1", "k2", None, None], ["k1", "k1", "k1", None])
    assert got["relationship"] == "one_to_many"
    assert got["null_a"] == 2 and got["null_b"] == 1
    assert got["n_a"] == 2 and got["n_b"] == 3  # nulls excluded from counts
    assert got["a_unmatched"] == 1  # k2


def test_relationship_fanout_only_over_matched(spark):
    # a's heaviest key is unmatched; matched fan-out decides the class
    got = _rel(spark, ["x", "x", "x", "y"], ["y", "z"])
    assert got["max_per_key_a"] == 1  # only y is matched
    assert got["relationship"] == "one_to_one"
    assert got["a_unmatched"] == 3 and got["b_unmatched"] == 1
