"""Unit tests for the round-4 eighth-continuation operators: skew-salted
equi-join (joins.salted_join) and the event-time disorder / watermark
advisor (temporal.disorder_profile)."""

import math

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.joins import detect_hot_keys, salted_join
from jsons_to_schema_spark.operators.temporal import disorder_profile
from jsons_to_schema_spark.plans import audit

# ---------------------------------------------------------- salted join ----


def _fact(spark, parts=4):
    # key 1 is hot (6 rows incl. an exact duplicate row), key 2 cold,
    # key 9 unmatched in dim, NULL key present
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "d"), (1, "e"), (1, "e"),
        (2, "f"), (2, "g"),
        (9, "h"),
        (None, "i"),
    ]
    return spark.createDataFrame(rows, "k int, fv string").repartition(parts)


def _dim(spark):
    # duplicate right rows for key 2 (join multiplies), hot key 1 matched,
    # key 7 dim-only, NULL key on dim side too
    rows = [(1, "X"), (2, "Y1"), (2, "Y2"), (7, "Z"), (None, "N")]
    return spark.createDataFrame(rows, "k int, dv string")


def _ms(df):
    # None-safe total order (left joins emit NULL dim columns)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda r: tuple(
            (v is None, type(v).__name__, v if v is not None else 0)
            for v in r
        ),
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("saltn", [2, 5])
def test_salted_join_equals_plain_join(spark, how, saltn):
    fact, dim = _fact(spark), _dim(spark)
    plain = fact.join(dim, on="k", how=how)
    salted = salted_join(
        fact, dim, "k", how=how, salt=saltn, hot_threshold=3
    )
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _ms(salted.select(*plain.columns)) == _ms(plain)


def test_salted_join_explicit_hot_keys(spark):
    fact, dim = _fact(spark), _dim(spark)
    plain = fact.join(dim, on="k", how="inner")
    got = salted_join(fact, dim, "k", salt=4, hot_keys=[1, 2, 7])
    assert _ms(got.select(*plain.columns)) == _ms(plain)


def test_salted_join_no_hot_keys_is_plain(spark):
    fact, dim = _fact(spark), _dim(spark)
    got = salted_join(fact, dim, "k", salt=4, hot_keys=[])
    assert _ms(got) == _ms(fact.join(dim, on="k", how="inner"))


def test_salted_join_deterministic(spark):
    fact, dim = _fact(spark, parts=7), _dim(spark)
    a = salted_join(fact, dim, "k", salt=3, hot_threshold=2)
    b = salted_join(fact, dim, "k", salt=3, hot_threshold=2)
    assert _ms(a) == _ms(b)


def test_salted_join_refusals(spark):
    fact, dim = _fact(spark), _dim(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="right", hot_keys=[1])
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(fact, dim, "k", salt=1, hot_keys=[1])
    with pytest.raises(ValueError, match="hot_keys or hot_threshold"):
        salted_join(fact, dim, "k")


def test_detect_hot_keys(spark):
    fact = _fact(spark)
    hot = {r[0] for r in detect_hot_keys(fact, "k", 3).collect()}
    assert hot == {1}
    # NULL keys never hot even when frequent
    nulls = spark.createDataFrame([(None, i) for i in range(20)], "k int, v int")
    assert detect_hot_keys(nulls, "k", 2).count() == 0
    with pytest.raises(ValueError, match="keys exceed threshold"):
        detect_hot_keys(fact, "k", 1, max_hot_keys=1)


def test_salted_join_plan_shape(spark):
    """No CartesianProduct, no per-row Python; the hot dim replication is
    an explode of a literal array, and both branches stay equi-joins."""
    fact, dim = _fact(spark), _dim(spark)
    plan = audit.formatted_plan(
        salted_join(fact, dim, "k", salt=4, hot_keys=[1])
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------- disorder profile ----


def _brute(rows, percentiles=(0.5, 0.95, 0.99)):
    """Reference implementation: lateness vs the running max over all rows
    whose ingest position is <= this row's (RANGE semantics: peers of a
    tied order value see each other's timestamps)."""
    valid = [(s, u) for s, u in rows if s is not None and u is not None]
    lates = []
    for s, u in valid:
        rm = max(uu for ss, uu in valid if ss <= s)
        lates.append(rm - u)
    n_rows = len(lates)
    n_null = len(rows) - n_rows
    pos = sorted(l for l in lates if l > 0)

    def q_cont(p):
        if not pos:
            return None
        idx = p * (len(pos) - 1)
        lo, hi = math.floor(idx), math.ceil(idx)
        return round(pos[lo] + (pos[hi] - pos[lo]) * (idx - lo), 6)

    p50, p95, p99 = (q_cont(p) for p in percentiles)
    return {
        "n_rows": n_rows,
        "n_null": n_null,
        "n_late": len(pos),
        "late_fraction": round(len(pos) / n_rows, 6) if n_rows else None,
        "max_late_us": max(lates) if lates else None,
        "p50_late_us": p50,
        "p95_late_us": p95,
        "p99_late_us": p99,
        "watermark_seconds": math.ceil(p99 / 1e6) if p99 is not None else 0,
    }


def _run(spark, rows, block_size=4, parts=5):
    df = spark.createDataFrame(rows, "seq long, ts timestamp").repartition(parts)
    got = disorder_profile(df, "ts", "seq", block_size=block_size).collect()[0]
    return got.asDict()


def _ts_rows(pairs):
    import datetime as dt

    out = []
    for s, sec in pairs:
        ts = (
            None
            if sec is None
            else dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)
        )
        out.append((s, ts))
    return out


def _us(pairs):
    # brute-force wants epoch-us; offsets from a common origin are enough
    return [
        (s, None if sec is None else int(sec * 1_000_000))
        for s, sec in pairs
    ]


def test_disorder_multiblock_exact(spark):
    # 17 rows over block_size=4 -> 5 blocks; heavy disorder crossing block
    # boundaries (row at seq=13 is 90s late vs the max set back at seq=2)
    pairs = [
        (0, 10.0), (1, 50.0), (2, 100.0), (3, 20.0),
        (4, 30.0), (5, 110.0), (6, 40.0), (7, 115.0),
        (8, 25.0), (9, 120.0), (10, 60.0), (11, 118.0),
        (12, 130.0), (13, 40.0), (14, 140.0), (15, 139.5),
        (16, 141.0),
    ]
    got = _run(spark, _ts_rows(pairs), block_size=4)
    exp = _brute(_us(pairs))
    assert got == exp


def test_disorder_single_block_matches_multiblock(spark):
    pairs = [(i, float((i * 37) % 50)) for i in range(40)]
    a = _run(spark, _ts_rows(pairs), block_size=1 << 20)
    b = _run(spark, _ts_rows(pairs), block_size=3)
    assert a == b == _brute(_us(pairs))


def test_disorder_ties_use_range_frame(spark):
    # two rows share seq=5: RANGE frame makes each see the other's ts, so
    # the earlier-timestamped peer is late by the difference
    pairs = [(0, 0.0), (5, 100.0), (5, 40.0), (6, 50.0)]
    got = _run(spark, _ts_rows(pairs), block_size=2)
    assert got == _brute(_us(pairs))
    assert got["n_late"] == 2  # the 40s peer AND the 50s successor


def test_disorder_nulls_counted_not_dropped(spark):
    pairs = [(0, 10.0), (None, 99.0), (1, 5.0), (2, None), (3, 20.0)]
    got = _run(spark, _ts_rows(pairs), block_size=2)
    exp = _brute(_us(pairs))
    assert got == exp
    assert got["n_null"] == 2 and got["n_rows"] == 3


def test_disorder_clean_feed_zero_watermark(spark):
    pairs = [(i, float(i)) for i in range(10)]
    got = _run(spark, _ts_rows(pairs), block_size=3)
    assert got["n_late"] == 0
    assert got["watermark_seconds"] == 0  # an answer, not NULL
    assert got["p99_late_us"] is None


def test_disorder_plan_no_global_sort_over_corpus(spark):
    """The only single-partition window is over the bounded block-maxima
    table; the corpus itself gets a hash exchange on _blk, reused for the
    block-maxima fold (one scan)."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=(i * 37) % 50))
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "seq long, ts timestamp").repartition(8)
    plan = audit.formatted_plan(disorder_profile(df, "ts", "seq", block_size=8))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # corpus-side window is keyed by block, not globally sorted
    assert "hashpartitioning(_blk" in plan


# -------------------------------------------------------- interval join ----


def _brute_overlap(lrows, rrows, keyed=True):
    """Naive O(n*m) half-open overlap join: (key, id, s, e) tuples."""
    out = []
    for lk, lid, ls, le in lrows:
        if ls is None or le is None or le <= ls:
            continue
        for rk, rid, rs, re in rrows:
            if rs is None or re is None or re <= rs:
                continue
            if keyed and lk != rk:
                continue
            if ls < re and rs < le:
                out.append((lk, lid, rid, min(le, re) - max(ls, rs)))
    return sorted(out)


def _ij(spark, lrows, rrows, bucket_us=10, on=True, **kw):
    from jsons_to_schema_spark.operators.joins import interval_join

    l = spark.createDataFrame(lrows, "k int, lid int, ls long, le long")
    r = spark.createDataFrame(rrows, "k int, rid int, rs long, re long")
    got = interval_join(
        l.repartition(4), r.repartition(3),
        ("ls", "le"), ("rs", "re"),
        on=["k"] if on else None, bucket_us=bucket_us, **kw
    )
    return sorted(
        tuple(x) for x in got.select("k", "lid", "rid", "overlap_us").collect()
    ) if on else got


L_EDGE = [
    (1, 10, 0, 10),     # touches R [10,20) -> NOT overlapping (half-open)
    (1, 11, 5, 25),     # spans 3 buckets, overlaps two right rows
    (1, 12, 30, 31),    # sub-bucket sliver
    (1, 13, 40, 40),    # empty interval: matches nothing
    (1, 14, 50, 45),    # inverted: matches nothing
    (1, 15, None, 60),  # NULL endpoint: matches nothing
    (2, 16, 5, 25),     # same span, different key: no cross-key matches
]
R_EDGE = [
    (1, 20, 10, 20),
    (1, 21, 0, 100),    # long interval covering everything on key 1
    (1, 22, 30, 32),
    (2, 23, 90, 95),
    (1, 24, 60, None),  # NULL endpoint
]


def test_interval_join_edges_match_brute_force(spark):
    got = _ij(spark, L_EDGE, R_EDGE, bucket_us=10)
    assert got == _brute_overlap(L_EDGE, R_EDGE)
    # exactly-once: no pair appears twice even when sharing many buckets
    assert len(got) == len(set((k, a, b) for k, a, b, _ in got))


def test_interval_join_randomized_vs_brute(spark):
    import random

    rng = random.Random(42)
    lrows = [
        (rng.randrange(3), i, s := rng.randrange(0, 200), s + rng.randrange(0, 60))
        for i in range(60)
    ]
    rrows = [
        (rng.randrange(3), 100 + i, s := rng.randrange(0, 200), s + rng.randrange(0, 60))
        for i in range(60)
    ]
    for b in (7, 64, 1000):  # sub-span, ~span, and super-span buckets
        assert _ij(spark, lrows, rrows, bucket_us=b) == _brute_overlap(lrows, rrows)


def test_interval_join_span_cap_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception), match="spans more than"):
        _ij(
            spark,
            [(1, 1, 0, 10_000)],
            [(1, 2, 0, 10)],
            bucket_us=10,
            max_buckets_per_row=8,
        )


def test_interval_join_column_contract(spark):
    from jsons_to_schema_spark.operators.joins import interval_join

    l = spark.createDataFrame([(1, 0, 10)], "k int, s long, e long")
    r = spark.createDataFrame([(1, 0, 10)], "k int, s long, e long")
    with pytest.raises(ValueError, match="clashing"):
        interval_join(l, r, ("s", "e"), ("s", "e"), on=["k"])
    with pytest.raises(ValueError, match="bucket_us"):
        interval_join(
            l,
            r.selectExpr("k", "s as rs", "e as re"),
            ("s", "e"),
            ("rs", "re"),
            on=["k"],
            bucket_us=0,
        )


def test_interval_join_plan_is_equi_join(spark):
    """The 100-TB property: no CartesianProduct / BroadcastNestedLoopJoin —
    the overlap join is an equi-join on (key, bucket)."""
    l = spark.createDataFrame(L_EDGE, "k int, lid int, ls long, le long")
    r = spark.createDataFrame(R_EDGE, "k int, rid int, rs long, re long")
    from jsons_to_schema_spark.operators.joins import interval_join

    plan = audit.formatted_plan(
        interval_join(l, r, ("ls", "le"), ("rs", "re"), on=["k"], bucket_us=10)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
