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


def _chi2_ref(rows, a_idx, b_idx):
    # textbook chi-squared over the full r x c contingency table
    from collections import Counter

    cells = Counter((r[a_idx], r[b_idx]) for r in rows)
    ra = Counter(r[a_idx] for r in rows)
    cb = Counter(r[b_idx] for r in rows)
    n = len(rows)
    chi2 = 0.0
    for av in ra:
        for bv in cb:
            e = ra[av] * cb[bv] / n
            o = cells.get((av, bv), 0)
            chi2 += (o - e) ** 2 / e
    return chi2


def test_categorical_association_matches_textbook_chi2(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(400):
        a = rng.choice(["x", "y", "z"])
        # b depends on a for a correlated pair; c is independent
        b = a.upper() if rng.random() < 0.7 else rng.choice(["X", "Y", "Z"])
        c = rng.choice(["p", "q"])
        rows.append((i, a, b, c))
    df = spark.createDataFrame(rows, "i long, a string, b string, c string")
    got = {
        (r.col_a, r.col_b): r
        for r in stats.categorical_association(
            df, [("a", "b"), ("a", "c")]
        ).collect()
    }
    for (ai, bi), key in [((1, 2), ("a", "b")), ((1, 3), ("a", "c"))]:
        ref = _chi2_ref(rows, ai, bi)
        r = got[key]
        assert abs(r.chi2 - ref) < 1e-4, (key, r.chi2, ref)
        assert r.n_rows == 400
        import math

        v = math.sqrt(ref / (400 * (min(r.r_levels, r.c_levels) - 1)))
        assert abs(r.cramers_v - v) < 1e-4
    # the dependent pair must score far above the independent one
    assert got[("a", "b")].cramers_v > 0.5 > got[("a", "c")].cramers_v


def test_categorical_association_null_level_and_constant_column(spark):
    df = spark.createDataFrame(
        [("x", None, "k"), ("x", "u", "k"), ("y", None, "k"), ("y", "v", "k")],
        "a string, b string, c string",
    )
    rows = {
        (r.col_a, r.col_b): r
        for r in stats.categorical_association(df, [("a", "b"), ("a", "c")]).collect()
    }
    ab = rows[("a", "b")]
    assert (ab.r_levels, ab.c_levels) == (2, 3)  # NULL is a real b level
    assert ab.chi2 >= 0.0
    ac = rows[("a", "c")]
    assert (ac.dof, ac.cramers_v) == (0, None)  # constant side: undefined
    assert ac.chi2 == 0.0
    with pytest.raises(ValueError, match="self-pair"):
        stats.categorical_association(df, [("a", "a")])
    with pytest.raises(ValueError, match="at least one"):
        stats.categorical_association(df, [])


def test_categorical_association_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, str(i % 5), str(i % 3)) for i in range(200)],
        "i long, a string, b string",
    )
    one = stats.categorical_association(df, [("a", "b")]).collect()
    many = stats.categorical_association(
        df.repartition(17), [("a", "b")]
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_l_diversity_report(spark):
    # group (1): sensitive {s1,s2} -> diverse at l=2
    # group (2): sensitive {s1} twice + NULL -> diversity 1, flags
    # group (3): all NULL -> diversity 0, flags
    df = spark.createDataFrame(
        [
            (1, "s1"), (1, "s2"),
            (2, "s1"), (2, "s1"), (2, None),
            (3, None),
        ],
        "q long, s string",
    )
    r = stats.l_diversity(df, ["q"], "s", 2).collect()[0]
    assert (r.l, r.n_rows, r.n_groups) == (2, 6, 3)
    assert (r.groups_below_l, r.rows_below_l) == (2, 4)
    assert r.risk_fraction == round(4 / 6, 6)
    assert (r.min_diversity, r.l_diverse) == (0, False)
    with pytest.raises(ValueError, match="quasi_cols"):
        stats.l_diversity(df, [], "s", 2)
    with pytest.raises(ValueError, match="sensitive_col"):
        stats.l_diversity(df, ["s"], "s", 2)
    with pytest.raises(ValueError, match=">= 2"):
        stats.l_diversity(df, ["q"], "s", 1)


def test_t_closeness_skewness_attack(spark):
    # Group A is l-diverse at l=2 (two distinct values) yet 90% one value
    # while the corpus mixes ~55/44 — the skewness attack only
    # t-closeness sees.  Group C's support is disjoint from the rest, so
    # it exercises the absent-value side of the fold identity
    # tv = ½(1 + Σ_observed(|p−q| − q)); expected values below replay
    # the operator's own per-term round(6) arithmetic by hand.
    rows = (
        [("A", "x")] * 90 + [("A", "y")] * 10
        + [("B", "x")] * 300 + [("B", "y")] * 300
        + [("C", "z")] * 10
    )
    df = spark.createDataFrame(rows, "q string, s string")
    qx, qy, qz = 390 / 710, 310 / 710, 10 / 710

    def tv(ps):  # ps: {value: in-group share} over observed cells
        total = sum(
            round(abs(p - {"x": qx, "y": qy, "z": qz}[v]) -
                  {"x": qx, "y": qy, "z": qz}[v], 6)
            for v, p in ps.items()
        )
        return round((1.0 + total) / 2.0, 6)

    tv_a, tv_b, tv_c = (
        tv({"x": 0.9, "y": 0.1}),
        tv({"x": 0.5, "y": 0.5}),
        tv({"z": 1.0}),
    )
    assert tv_a > 0.2 > tv_b  # the discrimination the plant relies on
    assert abs(tv_c - (1.0 - qz)) < 1e-6  # disjoint support ⇒ tv = 1 − q_z
    r = stats.t_closeness(df, ["q"], "s", 0.2).collect()[0]
    assert (r.t, r.n_rows, r.n_groups) == (0.2, 710, 3)
    # 1e-6 tolerance: tv_c lands exactly on a .xxxxxx5 tie, where Spark's
    # HALF_UP and Python's banker's rounding differ in the last decimal
    assert abs(r.max_tv - max(tv_a, tv_b, tv_c)) <= 1.5e-6
    assert (r.groups_above_t, r.rows_above_t) == (2, 110)
    assert r.risk_fraction == round(110 / 710, 6)
    assert r.t_close is False
    # same report from any partitioning (per-term round(6) keeps the
    # group fold summation-order-proof)
    r17 = stats.t_closeness(df.repartition(17), ["q"], "s", 0.2).collect()[0]
    assert tuple(r) == tuple(r17)
    # a table whose every group mirrors itself is t-close at any t
    ok = stats.t_closeness(df.filter("q = 'B'"), ["q"], "s", 0.05).collect()[0]
    assert ok.t_close is True and ok.max_tv == 0.0
    with pytest.raises(ValueError, match="quasi_cols"):
        stats.t_closeness(df, [], "s", 0.2)
    with pytest.raises(ValueError, match="sensitive_col"):
        stats.t_closeness(df, ["s"], "s", 0.2)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        stats.t_closeness(df, ["q"], "s", 1.5)


def test_mutual_information_pairs_matches_single_pair(spark):
    import random

    rng = random.Random(3)
    rows = [
        (str(rng.randrange(4)), str(rng.randrange(3)), rng.randrange(2),
         None if rng.random() < 0.2 else str(rng.randrange(3)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a string, b string, c long, d string")
    sweep = {
        (r.col_a, r.col_b): r.mi
        for r in stats.mutual_information_pairs(
            df, [("a", "b"), ("a", "c"), ("a", "d")]
        ).collect()
    }
    for a, b in [("a", "b"), ("a", "c"), ("a", "d")]:
        single = stats.mutual_information(df, a, b).collect()[0].mi
        assert sweep[(a, b)] == single, (a, b)


def test_mutual_information_pairs_bounds_and_empty_pair(spark):
    # perfect dependence: MI(a, a_copy) == H(a); independence: MI ~ 0;
    # an all-NULL side yields a NULL mi row, not a missing one
    rows = [(str(i % 4), str(i % 4), str((i // 4) % 2), None) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, acopy string, ind string, dead string")
    got = {
        (r.col_a, r.col_b): r.mi
        for r in stats.mutual_information_pairs(
            df, [("a", "acopy"), ("a", "ind"), ("a", "dead")]
        ).collect()
    }
    assert got[("a", "acopy")] == 2.0  # H(uniform 4 levels) = 2 bits
    assert abs(got[("a", "ind")]) < 1e-9
    assert got[("a", "dead")] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="self-pair"):
        stats.mutual_information_pairs(df, [("a", "a")])
