"""Unit tests for the wave-7 analyzers: heavy hitters (Misra-Gries
candidates + exact verify), inclusion-dependency discovery, and the
per-key monotonicity audit."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import stats, validate


def test_heavy_hitters_exact_counts(spark):
    # 60×a, 25×b, 15 singletons -> θ=0.2 keeps a and b (b exactly at 20%),
    # θ just above 0.2 drops b: the boundary must be EXACT long arithmetic
    rows = [("a",)] * 60 + [("b",)] * 25 + [(f"u{i}",) for i in range(15)]
    df = spark.createDataFrame(rows, "v string").repartition(7)
    got = {
        r.value: (r.n_rows, r.frac)
        for r in stats.heavy_hitters(df, "v", 0.25).collect()
    }
    assert got == {"a": (60, 0.6), "b": (25, 0.25)}
    above = stats.heavy_hitters(df, "v", 0.251).collect()
    assert {r.value for r in above} == {"a"}


def test_heavy_hitters_mg_reduce_under_pressure(spark):
    # 500 distinct light values + one 30% heavy value, state of only
    # ceil(1/0.2)=5 counters per partition: the MG reduce must still
    # surface the heavy value (superset guarantee) and the exact verify
    # must reject every light candidate that sneaks through
    rows = [("HOT",)] * 300 + [(f"u{i}",) for i in range(500)] * 1
    rows += [(f"w{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = stats.heavy_hitters(df, "v", 0.2).collect()
    assert [(r.value, r.n_rows) for r in out] == [("HOT", 300)]
    assert out[0].frac == 0.3


def test_heavy_hitters_nulls_and_errors(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "v string")
    got = {r.value: r.n_rows for r in stats.heavy_hitters(df, "v", 0.5).collect()}
    assert got == {"a": 2}  # N_nonnull = 3, threshold = 1.5 -> a only
    with pytest.raises(ValueError, match="threshold"):
        stats.heavy_hitters(df, "v", 0.0)
    with pytest.raises(ValueError, match="state_size"):
        stats.heavy_hitters(df, "v", 0.1, state_size=5)
    with pytest.raises(ValueError, match="too small"):
        stats.heavy_hitters(df, "v", 1e-9)


def test_inclusion_profile_structure(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (3, "z")], "k int, s string"
    )
    b = spark.createDataFrame(
        [("1", 9.0), ("2", 8.0), ("9", 7.0)], "ks string, junk double"
    )
    got = {
        (r.col_a, r.col_b): (r.n_distinct_a, r.n_contained, r.containment,
                             r.full_inclusion)
        for r in stats.inclusion_profile(a, ["k", "s"], b, ["ks", "junk"]).collect()
    }
    # k={1,2,3} vs ks={'1','2','9'}: 2/3 via the cast-string domain
    assert got[("k", "ks")] == (3, 2, round(2 / 3, 6), False)
    assert got[("k", "junk")] == (3, 0, 0.0, False)
    assert got[("s", "ks")] == (3, 0, 0.0, False)
    assert got[("s", "junk")] == (3, 0, 0.0, False)
    assert len(got) == 4
    with pytest.raises(ValueError, match="non-empty"):
        stats.inclusion_profile(a, [], b, ["ks"])


def test_inclusion_profile_full_inclusion_and_nulls(spark):
    a = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    b = spark.createDataFrame([(1,), (2,), (3,)], "k2 int")
    r = stats.inclusion_profile(a, ["k"], b, ["k2"]).collect()[0]
    # NULL is not a value: distinct_a = 2, fully contained
    assert (r.n_distinct_a, r.n_contained, r.containment, r.full_inclusion) == (
        2, 2, 1.0, True,
    )


def test_monotonicity_audit_verdicts(spark):
    rows = [
        (1, 1, 10.0), (1, 2, 10.0), (1, 3, 11.0),   # clean (non-strict)
        (2, 1, 5.0), (2, 2, 4.0), (2, 3, 6.0), (2, 4, 2.0),  # 2 breaks
        (3, 1, 1.0), (3, 2, None), (3, 3, 2.0),     # null row, chain clean
        (4, None, 1.0), (4, 1, 0.5),                # null order row
        (5, 1, None), (5, 2, None),                 # every row null
    ]
    df = spark.createDataFrame(rows, "k int, o int, v double")
    got = {
        r.k: (r.n_rows, r.n_breaks, r.n_null_rows)
        for r in validate.monotonicity_audit(df, ["k"], "o", "v").collect()
    }
    assert 1 not in got
    assert got[2] == (4, 2, 0)
    assert got[3] == (2, 0, 1)   # the null row surfaces, the chain is clean
    assert got[4] == (1, 0, 1)
    assert got[5] == (0, 0, 2)   # an all-null key cannot vanish
    # strict mode: the tie in key 1 becomes a break
    strict = {
        r.k: r.n_breaks
        for r in validate.monotonicity_audit(df, ["k"], "o", "v", strict=True).collect()
    }
    assert strict[1] == 1
    with pytest.raises(ValueError, match="key_cols"):
        validate.monotonicity_audit(df, [], "o", "v")


def test_monotonicity_audit_partition_invariance(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 12), rng.randint(1, 50), float(rng.randint(0, 9)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k int, o int, v double")
    a = validate.monotonicity_audit(df, ["k"], "o", "v")
    b = validate.monotonicity_audit(df.repartition(17), ["k"], "o", "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fuzzy_self_pairs_exact_vs_bruteforce(spark):
    """SymSpell blocking + exact verify must equal the brute-force
    all-pairs answer — at both supported distances, over strings
    exercising substitution/insertion/deletion/duplicate cases."""
    import itertools

    from jsons_to_schema_spark.operators import dedup

    words = ["cat", "car", "cart", "dog", "cat", "zebra", "ct", "coat",
             "start", "smart", "itch", "pitch"]
    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "id int, w string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    for d in (1, 2):
        want = sorted(
            (i, j, a, b, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if lev(a, b) <= d
        )
        got = sorted(
            map(tuple, dedup.fuzzy_self_pairs(df, "id", "w", d).collect())
        )
        assert got == want, (d, got, want)


def test_fuzzy_self_pairs_guard_and_nulls(spark):
    from jsons_to_schema_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "short"), (2, None), (3, "x" * 80)], "id int, w string"
    )
    # the in-plan raise_error guard fires during the pinned subtree's
    # materialization; Spark may aggregate multi-partition failures into a
    # STAGE_MATERIALIZATION wrapper that elides the USER_RAISED message,
    # so assert the refusal itself and accept either message form
    with pytest.raises(Exception) as ei:
        dedup.fuzzy_self_pairs(df, "id", "w", 1).collect()
    assert "max_len" in str(ei.value) or "MATERIALIZATION" in str(ei.value)
    ok = dedup.fuzzy_self_pairs(
        df.filter("id < 3"), "id", "w", 1
    ).collect()
    assert ok == []  # the NULL row is excluded, not a crash
    with pytest.raises(ValueError, match="max_dist"):
        dedup.fuzzy_self_pairs(df, "id", "w", 3)


def test_inclusion_profile_all_null_a_column_reported_not_dropped(spark):
    # an all-NULL A column must appear with n_distinct_a=0 and NULL grades,
    # not vanish from the spine (review finding)
    a = spark.createDataFrame([(None, 1), (None, 2)], "dead int, live int")
    b = spark.createDataFrame([(1,), (2,)], "r int")
    rows = {
        (r.col_a, r.col_b): r
        for r in stats.inclusion_profile(a, ["dead", "live"], b, ["r"]).collect()
    }
    assert set(rows) == {("dead", "r"), ("live", "r")}
    dead = rows[("dead", "r")]
    assert (dead.n_distinct_a, dead.n_contained) == (0, 0)
    assert dead.containment is None and dead.full_inclusion is None
    live = rows[("live", "r")]
    assert (live.n_distinct_a, live.containment, live.full_inclusion) == (
        2, 1.0, True)


def test_fuzzy_join_matches_bruteforce_both_distances(spark):
    import itertools

    from jsons_to_schema_spark.operators.dedup import fuzzy_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names_a = ["kitten", "sitting", "abc", "abd", "xyz", "ab", "kitte"]
    names_b = ["kitten", "sittin", "abcd", "abe", "zzz", "a"]
    a = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names_a)], "ka long, ta string"
    )
    b = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names_b)], "kb long, tb string"
    )
    for d in (1, 2):
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_join(a, b, "ka", "ta", "kb", "tb", max_dist=d).collect()
        )
        want = sorted(
            (i, j, lev(x, y))
            for (i, x), (j, y) in itertools.product(
                enumerate(names_a), enumerate(names_b)
            )
            if lev(x, y) <= d
        )
        assert got == want, d


def test_fuzzy_join_null_and_guard(spark):
    import pytest as _pytest

    from jsons_to_schema_spark.operators.dedup import fuzzy_join

    a = spark.createDataFrame([(1, None), (2, "ok")], "ka long, ta string")
    b = spark.createDataFrame([(1, "ok")], "kb long, tb string")
    rows = fuzzy_join(a, b, "ka", "ta", "kb", "tb").collect()
    assert [(r.id_a, r.id_b, r.dist) for r in rows] == [(2, 1, 0)]
    long = spark.createDataFrame([(1, "x" * 99)], "ka long, ta string")
    with _pytest.raises(Exception):
        fuzzy_join(long, b, "ka", "ta", "kb", "tb", max_len=8).collect()
