"""Unit tests for the wave-8 analyzers: categorical domain shift,
pattern-mask profiling, and k-anonymity risk."""

import pytest

from jsons_to_schema_spark.operators import drift, stats


def test_category_shift_statuses(spark):
    base = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("gone",)] * 1, "c string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 6 + [("fresh",)] * 2 + [(None,)], "c string"
    )
    got = {
        r.category: (r.base_n, r.cur_n, r.base_share, r.cur_share,
                     r.share_delta, r.status)
        for r in drift.category_shift(base, cur, "c").collect()
    }
    assert got["a"] == (6, 2, 0.6, 0.2, -0.4, "stable")
    assert got["b"] == (3, 6, 0.3, 0.6, 0.3, "stable")
    assert got["gone"] == (1, 0, 0.1, 0.0, -0.1, "vanished")
    assert got["fresh"] == (0, 2, 0.0, 0.2, 0.2, "new")
    assert len(got) == 4  # the NULL row is not a domain member


def test_category_shift_empty_side(spark):
    base = spark.createDataFrame([], "c string")
    cur = spark.createDataFrame([("x",)], "c string")
    r = drift.category_shift(base, cur, "c").collect()[0]
    assert (r.category, r.base_share, r.cur_share, r.status) == ("x", 0.0, 1.0, "new")


def test_mask_profile_masks_and_ranks(spark):
    rows = (
        [("AB-12",)] * 5 + [("ZZ-99",)] * 2  # same mask AA-99 -> 7
        + [("x7",)] * 3                       # A9
        + [("##",)] * 1                       # literal passthrough
        + [(None,)]
    )
    df = spark.createDataFrame(rows, "s string")
    out = stats.mask_profile(df, "s", k=2).orderBy("rk").collect()
    assert [(r.mask, r.n_rows, r.rk) for r in out] == [("AA-99", 7, 1), ("A9", 3, 2)]
    assert out[0].share == round(7 / 11, 6)
    with pytest.raises(ValueError, match="k must be"):
        stats.mask_profile(df, "s", k=0)


def test_mask_profile_tie_break_on_mask(spark):
    df = spark.createDataFrame([("a1",), ("1a",)], "s string")
    out = stats.mask_profile(df, "s", k=2).orderBy("rk").collect()
    assert [(r.mask, r.rk) for r in out] == [("9A", 1), ("A9", 2)]


def test_k_anonymity_report(spark):
    rows = [
        ("US", "a"), ("US", "a"), ("US", "a"),   # group of 3
        ("FR", "b"), ("FR", "b"),                # group of 2
        ("DE", "c"),                             # singleton -> at risk
    ]
    df = spark.createDataFrame(rows, "nat string, seg string")
    r = stats.k_anonymity(df, ["nat", "seg"], 2).collect()[0]
    assert (r.k, r.n_rows, r.n_groups) == (2, 6, 3)
    assert (r.groups_below_k, r.rows_below_k) == (1, 1)
    assert r.risk_fraction == round(1 / 6, 6)
    assert (r.min_group_size, r.k_anonymous) == (1, False)
    r3 = stats.k_anonymity(df, ["nat", "seg"], 3).collect()[0]
    assert (r3.groups_below_k, r3.rows_below_k, r3.k_anonymous) == (2, 3, False)
    ok = stats.k_anonymity(df.filter("nat = 'US'"), ["nat"], 3).collect()[0]
    assert (ok.k_anonymous, ok.risk_fraction) == (True, 0.0)
    with pytest.raises(ValueError, match="quasi_cols"):
        stats.k_anonymity(df, [], 2)
    with pytest.raises(ValueError, match="k must be"):
        stats.k_anonymity(df, ["nat"], 1)
