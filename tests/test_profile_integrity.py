"""Unit tests for the wave-6 analyzers: equi-depth histogram, null
co-occurrence (missingness structure), and per-key sequence integrity."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import stats, validate


def test_equidepth_histogram_uniform_counts(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    rows = stats.equidepth_histogram(df, "x", 4).orderBy("bucket").collect()
    assert [r.bucket for r in rows] == [0, 1, 2, 3]
    # quartiles of 1..100: boundaries 25.75 / 50.5 / 75.25 -> 25/25/25/25
    assert [r.n_rows for r in rows] == [25, 25, 25, 25]
    assert rows[0].lo == 1.0 and rows[3].hi == 100.0
    assert rows[0].hi == 25.75 and rows[1].hi == 50.5 and rows[2].hi == 75.25


def test_equidepth_boundary_tie_falls_low(spark):
    # median of [1,1,1,3] is 1.0 -> the three 1s must all land in bucket 0
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,), (3.0,)], "x double")
    rows = stats.equidepth_histogram(df, "x", 2).orderBy("bucket").collect()
    assert [r.n_rows for r in rows] == [3, 1]


def test_equidepth_empty_and_bad_k(spark):
    df = spark.createDataFrame([(None,)], "x double")
    rows = stats.equidepth_histogram(df, "x", 3).collect()
    assert [r.n_rows for r in rows] == [0, 0, 0]
    assert all(r.lo is None and r.hi is None for r in rows)
    with pytest.raises(ValueError, match="k >= 2"):
        stats.equidepth_histogram(df, "x", 1)


def test_null_cooccurrence_structure(spark):
    rows = [
        (None, None, 1.0),   # a+b together
        (None, None, None),  # all three
        (None, 1.0, 1.0),    # a alone
        (1.0, 1.0, None),    # c alone
        (1.0, 1.0, 1.0),     # clean
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r.col_a, r.col_b): (r.n_a_null, r.n_b_null, r.n_both_null, r.jaccard)
        for r in stats.null_cooccurrence(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == (3, 2, 2, round(2 / 3, 6))
    assert got[("a", "c")] == (3, 2, 1, 0.25)
    assert got[("b", "c")] == (2, 2, 1, round(1 / 3, 6))


def test_null_cooccurrence_no_nulls_is_null_not_zero(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    r = stats.null_cooccurrence(df, ["a", "b"]).collect()[0]
    assert (r.n_a_null, r.n_b_null, r.n_both_null) == (0, 0, 0)
    assert r.jaccard is None  # nothing missing != disjoint misses
    with pytest.raises(ValueError, match="2 columns"):
        stats.null_cooccurrence(df, ["a"])


def test_sequence_integrity_verdict_arms(spark):
    rows = [
        (1, 1), (1, 2), (1, 3),          # clean
        (2, 1), (2, 2), (2, 2),          # dup (and span 2 != distinct 2? no — gap-free)
        (3, 1), (3, 3),                  # gap
        (4, 2), (4, 3),                  # bad start
        (5, None), (5, 1),               # NULL seq -> surfaces as dup-style anomaly
    ]
    df = spark.createDataFrame(rows, "k int, s int")
    got = {
        r.k: (r.has_dups, r.has_gaps, r.bad_start)
        for r in validate.sequence_integrity(df, ["k"], "s").collect()
    }
    assert 1 not in got
    assert got[2] == (True, False, False)
    assert got[3] == (False, True, False)
    assert got[4] == (False, False, True)
    assert got[5][0] is True  # the NULL row can't silently vanish
    # start_at honors a 0-based contract
    zero = spark.createDataFrame([(1, 0), (1, 1)], "k int, s int")
    assert validate.sequence_integrity(zero, ["k"], "s", start_at=0).count() == 0
    assert validate.sequence_integrity(zero, ["k"], "s").count() == 1
    with pytest.raises(ValueError, match="key_cols"):
        validate.sequence_integrity(df, [], "s")


def test_sequence_integrity_partition_invariance(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randint(1, 20), rng.randint(1, 8)) for _ in range(300)]
    df = spark.createDataFrame(rows, "k int, s int")
    a = validate.sequence_integrity(df, ["k"], "s")
    b = validate.sequence_integrity(df.repartition(13), ["k"], "s")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_null_cooccurrence_underscore_names_do_not_collide(spark):
    # ['a','b_c'] and ['a_b','c'] produced the same name-joined internal
    # alias before the index-based fix (review finding)
    df = spark.createDataFrame(
        [(None, 1, None, None), (1, None, 2, 3)],
        "a long, b_c long, a_b long, c long",
    )
    rows = stats.null_cooccurrence(df, ["a", "b_c", "a_b", "c"]).collect()
    assert len(rows) == 6
    by_pair = {(r.col_a, r.col_b): r.n_both_null for r in rows}
    assert by_pair[("a", "a_b")] == 1
    assert by_pair[("a", "b_c")] == 0


def test_completeness_profile_grouped(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("a", None, "y"),
            ("a", None, None),
            ("b", 4, "z"),
        ],
        "g string, v int, s string",
    )
    rows = {
        (r.group_value, r.column): r
        for r in stats.completeness_profile(df, ["v", "s"], "g").collect()
    }
    assert rows[("a", "v")].n_rows == 3 and rows[("a", "v")].n_null == 2
    assert rows[("a", "v")].completeness == round(1 / 3, 6)
    assert rows[("a", "s")].n_null == 1
    assert rows[("b", "v")].completeness == 1.0
    assert rows[("b", "s")].completeness == 1.0


def test_completeness_profile_ungrouped_and_null_group(spark):
    df = spark.createDataFrame(
        [(None, None), ("g1", 1)], "g string, v int"
    )
    whole = stats.completeness_profile(df, ["v"]).collect()
    assert len(whole) == 1
    assert whole[0].group_value == "_all"
    assert whole[0].n_rows == 2 and whole[0].n_null == 1
    # a NULL segment tag is a real segment, not a dropped row
    grouped = {
        r.group_value: r
        for r in stats.completeness_profile(df, ["v"], "g").collect()
    }
    assert None in grouped and grouped[None].n_null == 1
    assert grouped["g1"].completeness == 1.0
    with pytest.raises(ValueError):
        stats.completeness_profile(df, [])


def test_completeness_profile_single_scan(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id")).alias("v"),
        F.col("id").cast("string").alias("s"),
    )
    plan = stats.completeness_profile(df, ["v", "s"], "g")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Range") == 1  # one corpus scan feeds the whole matrix


def test_pattern_profile_masks_ranks_and_spine(spark):
    rows = (
        [("12-345", "Customer#001")] * 5
        + [("98-760", "Customer#777")] * 3   # same masks as above
        + [("abc", "Customer#9")] * 4        # second mask family
        + [("ABC", None)] * 2                # NULL excluded from name masks
        + [(None, "x1")]                     # NULL excluded from code masks
    )
    df = spark.createDataFrame(rows, "code string, name string").withColumn(
        "empty", F.lit(None).cast("string")
    )
    out = stats.pattern_profile(df, ["code", "name", "empty"], top_k=2)
    got = {(r.column, r.rank): r for r in out.collect()}
    # code: '99-999' x8, 'aaa' x4 beats 'AAA' x2 on count; top_k=2 drops AAA
    assert got[("code", 1)].mask == "99-999" and got[("code", 1)].n == 8
    assert got[("code", 2)].mask == "aaa" and got[("code", 2)].n == 4
    assert got[("code", 1)].share == round(8 / 14, 6)
    # name: 'Aaaaaaaa#999' x8 (5+3 collapse into ONE mask), then '#9' family
    assert got[("name", 1)].mask == "Aaaaaaaa#999" and got[("name", 1)].n == 8
    assert got[("name", 2)].mask == "Aaaaaaaa#9" and got[("name", 2)].n == 4
    # the all-NULL column keeps its spine row instead of vanishing
    assert got[("empty", None)].mask is None
    assert got[("empty", None)].n == 0 and got[("empty", None)].share is None
    assert len(got) == 5


def test_pattern_profile_tie_break_and_contracts(spark):
    # equal counts -> deterministic mask-ascending order
    df = spark.createDataFrame(
        [("a1",), ("1a",), ("b2",), ("2b",)], "v string"
    )
    rows = stats.pattern_profile(df, ["v"], top_k=10).orderBy("rank").collect()
    assert [(r.rank, r.mask, r.n) for r in rows] == [
        (1, "9a", 2), (2, "a9", 2)
    ]
    with pytest.raises(ValueError, match="non-empty"):
        stats.pattern_profile(df, [])
    with pytest.raises(ValueError, match="top_k"):
        stats.pattern_profile(df, ["v"], top_k=0)
    with pytest.raises(ValueError, match="not a string column"):
        stats.pattern_profile(df.select(F.length("v").alias("n")), ["n"])


def test_pattern_profile_partition_invariance_and_one_scan(spark):
    df = spark.range(300).select(
        F.concat(
            F.lit("u"), (F.col("id") % 7).cast("string"),
            F.lit("-"), F.upper(F.hex(F.col("id") % 19)),
        ).alias("tag"),
        F.col("id").cast("string").alias("sid"),
    )
    a = stats.pattern_profile(df, ["tag", "sid"], 3).collect()
    b = stats.pattern_profile(df.repartition(17), ["tag", "sid"], 3).collect()
    key = lambda r: (r.column, r.rank if r.rank is not None else -1)
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1] or 0)) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[1] or 0)
    )
    plan = stats.pattern_profile(df, ["tag", "sid"], 3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Range") == 1  # the melt feeds every column's profile
