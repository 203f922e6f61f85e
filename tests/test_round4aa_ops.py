"""Wave-57 operator tests: median imputer fit/apply and MAD robust z."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import (
    apply_imputer,
    fit_imputer,
    robust_z_outliers,
)


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        [(i, g, None if v is None else float(v)) for i, (g, v) in enumerate(rows)],
        "id bigint, g string, v double",
    ).repartition(parts)


def _t1_median(vals):
    s = sorted(round(v, 6) for v in vals)
    return s[math.ceil(len(s) / 2 - 1e-9) - 1] if s else None


def test_fit_imputer_medians_and_global_row(spark):
    rows = [("a", 1.0), ("a", 5.0), ("a", 100.0), ("b", 7.0), ("b", None), (None, 3.0)]
    model = {r["group"]: r["median"] for r in
             fit_imputer(_df(spark, rows), "v", "g").collect()}
    assert model["a"] == 5.0            # type-1 median, outlier-robust
    assert model["b"] == 7.0
    assert model[None] == _t1_median([1.0, 5.0, 100.0, 7.0, 3.0])  # global over ALL values


def test_apply_imputer_fill_fallback_flag(spark):
    fit_rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    model = fit_imputer(_df(spark, fit_rows), "v", "g")
    apply_rows = [("a", None), ("b", 2.0), ("unseen", None), (None, None)]
    out = {
        r["id"]: (r["v"], r["imputed"])
        for r in apply_imputer(_df(spark, apply_rows), "v", model, "g").collect()
    }
    assert out[0] == (1.0, True)        # group median (type-1 of [1,3] = 1)
    assert out[1] == (2.0, False)       # observed value untouched
    glob = _t1_median([1.0, 3.0, 10.0])
    assert out[2] == (glob, True)       # unseen group → global fallback
    assert out[3] == (glob, True)       # NULL group → global fallback


def test_apply_imputer_out_col_preserves_original(spark):
    model = fit_imputer(_df(spark, [("a", 4.0), ("a", 6.0)]), "v", "g")
    out = apply_imputer(
        _df(spark, [("a", None)]), "v", model, "g", out_col="v_filled"
    ).collect()[0]
    assert out["v"] is None and out["v_filled"] == 4.0 and out["imputed"] is True


def test_robust_z_catches_masked_outlier(spark):
    # classical z: two wild values inflate std so neither exceeds 3.5σ
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 10.2, 11.8, 10.9, 500.0, 480.0]
    rows = [("a", v) for v in vals]
    import statistics

    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert all(abs(v - mu) / sd < 3.5 for v in vals)  # masking confirmed
    got = {r["id"]: r["robust_z"] for r in
           robust_z_outliers(_df(spark, rows), "v", "g", ["id"]).collect()}
    assert set(got) == {8, 9}  # robust z flags exactly the two plants


def test_robust_z_replay_and_zero_mad(spark):
    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)] + [
        ("const", 5.0)
    ] * 6 + [("const", 99.0)]
    got = {r["id"]: r["robust_z"] for r in
           robust_z_outliers(_df(spark, rows), "v", "g", ["id"]).collect()}
    med = _t1_median([1.0, 2.0, 3.0, 4.0, 100.0])          # 3.0
    mad = _t1_median([abs(v - med) for v in (1.0, 2.0, 3.0, 4.0, 100.0)])
    z100 = round(0.6745 * (100.0 - med) / mad, 6)
    assert got[4] == z100
    # 'const' group: median 5, MAD 0 → degenerate, nothing flagged
    assert all(i <= 4 for i in got)


def test_robust_z_grouped_independence(spark):
    rng = random.Random(5701)
    rows = [("a", rng.gauss(0, 1)) for _ in range(100)] + [
        ("b", rng.gauss(1000, 1)) for _ in range(100)
    ] + [("a", 50.0), ("b", 950.0)]
    got = robust_z_outliers(_df(spark, rows), "v", "g", ["id"]).collect()
    flagged = {(r["g"], r["v"]) for r in got}
    assert ("a", 50.0) in flagged and ("b", 950.0) in flagged
    # group b's scale does not leak into group a's scoring
    assert all(abs(r["robust_z"]) > 3.5 for r in got)
