"""Unit tests for temporal joins (asof, interval-overlap), CDC compaction,
the binned-divergence panel, and robust outlier rows — brute-force
reference comparisons plus the edge cases the driver oracle can't plant."""

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import cdc, drift, stats, temporal


def _asof_rows(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, 1),
            ("a", 5, 2),
            ("a", 20, 3),
            ("b", 7, 4),
            ("b", 6, 5),
            ("c", 100, 6),  # key with no right rows at all
        ],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", 5, 50.0),   # equality boundary for lid=2
            ("a", 12, 120.0),
            ("b", 7, 70.0),   # equality boundary for lid=4
            ("b", 9, 90.0),   # later than every b left row
        ],
        "k string, t long, v double",
    )
    return left, right


def test_asof_backward_matches_reference(spark):
    left, right = _asof_rows(spark)
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["v"], suffix="_m")
    got = {r.lid: (r.v_m, r.t_m) for r in out.collect()}
    assert got == {
        1: (50.0, 5),     # a@10 -> a@5
        2: (50.0, 5),     # equality included
        3: (120.0, 12),   # a@20 -> a@12
        4: (70.0, 7),     # equality included
        5: (None, None),  # b@6 predates every b snapshot
        6: (None, None),  # no c snapshots
    }
    # left outer: every left row survives with all original columns
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_asof_forward_matches_reference(spark):
    left, right = _asof_rows(spark)
    out = temporal.asof_join(
        left, right, ["k"], "t", "t", ["v"], direction="forward", suffix="_m"
    )
    got = {r.lid: (r.v_m, r.t_m) for r in out.collect()}
    assert got == {
        1: (120.0, 12),   # a@10 -> next a@12
        2: (50.0, 5),     # equality included forward too
        3: (None, None),  # nothing at/after a@20
        4: (70.0, 7),
        5: (70.0, 7),     # b@6 -> next b@7
        6: (None, None),
    }


def test_asof_partition_invariance(spark):
    left, right = _asof_rows(spark)
    base = temporal.asof_join(left, right, ["k"], "t", "t", ["v"])
    shuffled = temporal.asof_join(
        left.repartition(7), right.repartition(5), ["k"], "t", "t", ["v"]
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_asof_rejects_bad_args(spark):
    left, right = _asof_rows(spark)
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(left, right, ["k"], "t", "t", ["v"], direction="x")
    with pytest.raises(ValueError, match="keys"):
        temporal.asof_join(left, right, [], "t", "t", ["v"])
    with pytest.raises(ValueError, match="collides"):
        temporal.asof_join(
            left.withColumn("v_asof", F.lit(1)), right, ["k"], "t", "t", ["v"]
        )


def test_interval_overlap_matches_brute_force(spark):
    rng = random.Random(42)
    # intervals spanning 0-20 buckets of width 10, incl. zero-length points
    ivs = []
    for i in range(120):
        s = rng.randint(0, 200)
        ivs.append((i, s, s + rng.choice([0, 1, 3, 7, 25, 60])))
    df = spark.createDataFrame(ivs, "iid long, i_start long, i_end long")
    out = temporal.interval_overlap_join(
        df, df, ["iid"], ["iid"], ("i_start", "i_end"), 10, antisymmetric=True
    )
    got = sorted((r.l_iid, r.r_iid, r.overlap) for r in out.collect())
    exp = sorted(
        (a[0], b[0], min(a[2], b[2]) - max(a[1], b[1]))
        for a, b in itertools.combinations(ivs, 2)
        if a[1] <= b[2] and b[1] <= a[2]
    )
    assert got == exp  # exact multiset: no duplicates, no losses


def test_interval_overlap_two_frames_and_point_touch(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid long, i_start long, i_end long")
    right = spark.createDataFrame(
        [(1, 10, 20), (2, 11, 20), (3, 5, 7)],
        "rid long, i_start long, i_end long",
    )
    out = temporal.interval_overlap_join(
        left, right, ["lid"], ["rid"], ("i_start", "i_end"), 4
    )
    got = {(r.l_lid, r.r_rid): r.overlap for r in out.collect()}
    # point-touch at 10 overlaps with length 0; disjoint (11,20) does not
    assert got == {(1, 1): 0, (1, 3): 2}


def test_interval_overlap_rejects_bad_width(spark):
    df = spark.createDataFrame([(1, 0, 1)], "iid long, i_start long, i_end long")
    with pytest.raises(ValueError, match="bucket_width"):
        temporal.interval_overlap_join(df, df, ["iid"], ["iid"], bucket_width=0)


def _changelog(spark):
    return spark.createDataFrame(
        [
            # key 1: upsert then delete LAST -> dropped (no resurrection)
            (1, 10, 1, "upsert", 1.0),
            (1, 20, 2, "delete", 2.0),
            # key 2: delete then upsert LAST -> latest upsert wins
            (2, 10, 3, "delete", 3.0),
            (2, 30, 4, "upsert", 4.0),
            # key 3: tie on ts broken by id
            (3, 10, 5, "upsert", 5.0),
            (3, 10, 6, "upsert", 6.0),
            # key 4: NULL ts never beats a real timestamp
            (4, None, 8, "upsert", 8.0),
            (4, 5, 7, "upsert", 7.0),
        ],
        "k long, t long, i long, op string, v double",
    )


def test_cdc_compact_matches_window_reference(spark):
    log = _changelog(spark)
    out = cdc.compact_changelog(
        log, ["k"], ["t", "i"], ["t", "i", "v"], op_col="op", delete_ops=("delete",)
    )
    got = {r.k: (r.t, r.i, r.v) for r in out.collect()}
    assert got == {2: (30, 4, 4.0), 3: (10, 6, 6.0), 4: (5, 7, 7.0)}
    assert "op" not in out.columns  # op not requested in payload -> dropped


def test_cdc_compact_without_ops_keeps_every_key(spark):
    log = _changelog(spark)
    out = cdc.compact_changelog(log, ["k"], ["t", "i"], ["v"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 2.0, 2: 4.0, 3: 6.0, 4: 7.0}


def test_cdc_compact_partition_invariance(spark):
    log = _changelog(spark)
    a = cdc.compact_changelog(log, ["k"], ["t", "i"], ["v"])
    b = cdc.compact_changelog(log.repartition(9), ["k"], ["t", "i"], ["v"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cdc_compact_rejects_empty_specs(spark):
    log = _changelog(spark)
    with pytest.raises(ValueError):
        cdc.compact_changelog(log, [], ["t"], ["v"])


def test_divergence_report_matches_numpy(spark):
    base = spark.createDataFrame([(float(x),) for x in [1, 1, 2, 5, 9]], "x double")
    cur = spark.createDataFrame([(float(x),) for x in [1, 8, 8, 9]], "x double")
    rep = drift.divergence_report(base, cur, "x", 0.0, 10.0, 5).orderBy("bucket")
    rows = rep.collect()
    bn = [r.base_n for r in rows]
    cn = [r.cur_n for r in rows]
    assert bn == [2, 1, 1, 0, 1] and cn == [1, 0, 0, 0, 3]
    s, B = 0.5, 5
    bt, ct = sum(bn), sum(cn)
    psi = js = chi2 = emd = 0.0
    ks = 0.0
    cb = cc = 0
    for i in range(B):
        pb = (bn[i] + s) / (bt + s * B)
        pc = (cn[i] + s) / (ct + s * B)
        m = (pb + pc) / 2
        psi_t = round((pc - pb) * math.log(pc / pb), 6)
        js_t = round(0.5 * pb * math.log(pb / m) + 0.5 * pc * math.log(pc / m), 6)
        e = pb * (ct + s * B)
        chi_t = round((cn[i] + s - e) ** 2 / e, 6)
        cb += bn[i]
        cc += cn[i]
        ks_t = round(abs(cb / bt - cc / ct), 6)
        emd_t = round(abs(cb / bt - cc / ct) * 2.0, 6)  # width = 10/5
        r = rows[i]
        assert (r.psi_term, r.js_term, r.chi2_term, r.ks_term, r.emd_term) == (
            psi_t,
            js_t,
            chi_t,
            ks_t,
            emd_t,
        ), i
        psi, js, chi2, ks, emd = (
            psi + psi_t,
            js + js_t,
            chi2 + chi_t,
            max(ks, ks_t),
            emd + emd_t,
        )
    score = drift.divergence_score(rep).collect()[0]
    assert score.psi == round(psi, 6)
    assert score.js_divergence == round(js, 6)
    assert score.chi2 == round(chi2, 6)
    assert score.ks_stat == ks
    assert score.wasserstein == round(emd, 6)


def test_wasserstein_is_magnitude_aware_where_ks_saturates(spark):
    """A one-bucket nudge and a four-bucket jump both saturate KS at 1.0;
    only the Wasserstein scalar ranks them — the reason the panel carries
    both CDF metrics."""
    base = spark.createDataFrame([(0.5,)] * 4, "x double")
    near = spark.createDataFrame([(2.5,)] * 4, "x double")
    far = spark.createDataFrame([(8.5,)] * 4, "x double")
    s_near = drift.divergence_score(
        drift.divergence_report(base, near, "x", 0.0, 10.0, 5)
    ).collect()[0]
    s_far = drift.divergence_score(
        drift.divergence_report(base, far, "x", 0.0, 10.0, 5)
    ).collect()[0]
    assert s_near.ks_stat == s_far.ks_stat == 1.0
    assert s_near.wasserstein == 2.0  # one bucket × width 2
    assert s_far.wasserstein == 8.0  # four buckets × width 2


def test_divergence_empty_side_yields_null_ks_not_zero(spark):
    base = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    cur = base.filter(F.lit(False))
    rows = drift.divergence_report(base, cur, "x", 0.0, 10.0, 4).collect()
    assert all(r.ks_term is None for r in rows)  # alert, never "no drift"
    assert all(r.emd_term is None for r in rows)  # same CDF-property stance
    assert all(r.psi_term is not None for r in rows)  # smoothed stays finite


def test_outlier_report_mad_and_zscore(spark):
    vals = [10.0] * 4 + [11.0, 9.0, 12.0, 8.0, 100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    )
    out = stats.outlier_report(df, "x", ["i"], method="mad", cutoff=3.5)
    rows = out.collect()
    assert [(r.i, r.value) for r in rows] == [(8, 100.0)]
    # med=10, mad=1 -> score 0.6745*90
    assert rows[0].score == round(0.6745 * 90.0, 6)
    z = stats.outlier_report(df, "x", ["i"], method="zscore", cutoff=2.0)
    assert [r.i for r in z.collect()] == [8]


def test_outlier_report_constant_column_is_silent(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(10)], "i long, x double")
    assert stats.outlier_report(df, "x", ["i"], method="mad").count() == 0
    assert stats.outlier_report(df, "x", ["i"], method="zscore").count() == 0
    with pytest.raises(ValueError, match="method"):
        stats.outlier_report(df, "x", ["i"], method="iqr")


def test_asof_null_timestamps_and_atomic_carry(spark):
    # Three review findings in one scenario:
    # (1) right rows with NULL ts must match nothing (not leak payload),
    # (2) a matched right row's genuinely-NULL value must stay NULL rather
    #     than falling back to a STALE value from an older right row,
    # (3) a left row with NULL ts matches nothing.
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", None, 3)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [("a", 5, 50.0), ("a", 15, None), ("a", None, 999.0)],
        "k string, t long, v double",
    )
    rows = {
        r.lid: (r.v_asof, r.t_asof)
        for r in temporal.asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    }
    assert rows[1] == (50.0, 5)       # normal backward match
    assert rows[2] == (None, 15)      # matched row at t=15; its NULL v stays NULL
    assert rows[3] == (None, None)    # NULL left ts -> no match at all
    fwd = {
        r.lid: (r.v_asof, r.t_asof)
        for r in temporal.asof_join(
            left, right, ["k"], "t", "t", ["v"], direction="forward"
        ).collect()
    }
    assert fwd[1] == (None, 15)       # nearest forward is t=15 with NULL v
    assert fwd[3] == (None, None)


def test_cdc_compact_null_op_is_not_a_tombstone(spark):
    # snapshot/backfill rows carry op=NULL; ~isin would evaluate NULL and
    # silently drop the key (review finding)
    df = spark.createDataFrame(
        [("k1", 1, "x", None), ("k2", 1, "y", "upsert"), ("k3", 1, "z", "delete")],
        "id string, ts long, val string, op string",
    )
    out = cdc.compact_changelog(df, ["id"], ["ts"], ["val"], op_col="op")
    got = {(r.id, r.val) for r in out.collect()}
    assert got == {("k1", "x"), ("k2", "y")}


def test_rolling_stats_matches_brute_force(spark):
    import datetime as dt
    import statistics

    base = dt.datetime(2024, 1, 1)
    rows = []
    rng = random.Random(11)
    for k in ["a", "b"]:
        for i in range(40):
            ts = base + dt.timedelta(seconds=rng.randrange(0, 600))
            rows.append((k, len(rows), ts, float(rng.randrange(0, 100))))
    # edge rows: a tie pair, a NULL value, a NULL timestamp
    rows += [
        ("a", 100, base + dt.timedelta(seconds=50), 7.0),
        ("a", 101, base + dt.timedelta(seconds=50), 9.0),
        ("a", 102, base + dt.timedelta(seconds=51), None),
        ("a", 103, None, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp, v double")
    got = {r.rid: r for r in temporal.rolling_stats(df, ["k"], "ts", "v", 60).collect()}

    for k, rid, ts, v in rows:
        r = got[rid]
        if ts is None:
            assert all(
                getattr(r, c) is None
                for c in ["n_window", "mean_value", "min_value", "max_value",
                          "stddev_value", "deviation"]
            )
            continue
        in_win = [
            v2 for k2, _, ts2, v2 in rows
            if k2 == k and ts2 is not None and v2 is not None
            and ts - dt.timedelta(seconds=60) <= ts2 <= ts
        ]
        assert r.n_window == len(in_win), rid
        if in_win:
            assert r.mean_value == round(statistics.fmean(in_win), 6), rid
            assert (r.min_value, r.max_value) == (min(in_win), max(in_win))
            if len(in_win) >= 2:
                assert abs(r.stddev_value - statistics.stdev(in_win)) < 1e-6
            else:
                assert r.stddev_value is None
        if v is not None and in_win:
            assert r.deviation == round(v - statistics.fmean(in_win), 6)
        elif v is None:
            assert r.deviation is None

    with pytest.raises(ValueError, match="window_seconds"):
        temporal.rolling_stats(df, ["k"], "ts", "v", 0)
    with pytest.raises(ValueError, match="keys"):
        temporal.rolling_stats(df, [], "ts", "v", 60)


def test_rolling_stats_partition_invariance(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k%d" % (i % 3), i, base + dt.timedelta(seconds=i * 7 % 300), float(i))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp, v double")
    one = temporal.rolling_stats(df, ["k"], "ts", "v", 45).collect()
    many = temporal.rolling_stats(df.repartition(13), ["k"], "ts", "v", 45).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_outlier_report_grouped_per_group_fences(spark):
    # group 'a' is tight around 10 (spike 100 flags); group 'b' lives at
    # scale 1000 where 100 would be a LOW value — a global fence gets both
    # wrong; NULL group keys form their own group (null-safe join)
    rows = (
        [(i, "a", v) for i, v in enumerate(
            [10.0, 10.0, 10.0, 10.0, 11.0, 9.0, 12.0, 8.0, 100.0])]
        + [(100 + i, "b", v) for i, v in enumerate(
            [1000.0, 1000.0, 1000.0, 1000.0, 1010.0, 990.0, 1020.0, 980.0,
             5000.0])]
        + [(200, None, 5.0), (201, None, 5.0), (202, None, 5.0),
           (203, None, 6.0), (204, None, 4.0), (205, None, 99.0)]
    )
    df = spark.createDataFrame(rows, "i long, g string, x double")
    out = stats.outlier_report_grouped(df, "x", ["i"], ["g"], method="mad")
    got = {(r.g, r.i, r.value) for r in out.collect()}
    assert got == {("a", 8, 100.0), ("b", 108, 5000.0), (None, 205, 99.0)}
    # zscore arm + guards
    z = stats.outlier_report_grouped(df, "x", ["i"], ["g"], method="zscore", cutoff=2.0)
    assert {(r.g, r.i) for r in z.collect()} == {("a", 8), ("b", 108), (None, 205)}
    with pytest.raises(ValueError, match="group_cols"):
        stats.outlier_report_grouped(df, "x", ["i"], [])
    with pytest.raises(ValueError, match="method"):
        stats.outlier_report_grouped(df, "x", ["i"], ["g"], method="iqr")


def test_outlier_report_grouped_matches_global_on_one_group(spark):
    vals = [10.0] * 4 + [11.0, 9.0, 12.0, 8.0, 100.0]
    df = spark.createDataFrame(
        [(i, "only", v) for i, v in enumerate(vals)], "i long, g string, x double"
    )
    grouped = stats.outlier_report_grouped(df, "x", ["i"], ["g"]).collect()
    global_ = stats.outlier_report(df, "x", ["i"]).collect()
    assert [(r.i, r.value, r.score) for r in grouped] == [
        (r.i, r.value, r.score) for r in global_
    ]


def _scd2_log(spark):
    # one key's life: insert A, no-op A (collapses), update B, delete,
    # re-insert B (equal to pre-delete payload -> STILL a new version),
    # update to NULL payload (null-safe change), back to C
    rows = [
        ("k1", 1, "upsert", "A"),
        ("k1", 2, "upsert", "A"),      # identical consecutive -> collapse
        ("k1", 3, "upsert", "B"),
        ("k1", 4, "delete", None),
        ("k1", 5, "upsert", "B"),      # resurrect after tombstone
        ("k1", 6, "upsert", None),     # value -> NULL opens a version
        ("k1", 7, "upsert", "C"),
        ("k2", 1, "upsert", "X"),      # still-open single version
        ("k3", 1, "delete", None),     # key that only ever died
    ]
    return spark.createDataFrame(rows, "k string, seq long, op string, state string")


def test_scd2_versions_intervals_tombstones(spark):
    from jsons_to_schema_spark.operators import cdc

    out = cdc.scd2_from_changelog(
        _scd2_log(spark), ["k"], "seq", ["state"], op_col="op"
    )
    got = sorted(
        (r.k, r.version, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert got == [
        ("k1", 1, "A", 1, 3, False),
        ("k1", 2, "B", 3, 4, False),   # closed BY the delete's seq
        ("k1", 3, "B", 5, 6, False),   # re-insert = fresh version
        ("k1", 4, None, 6, 7, False),  # NULL payload is a real state
        ("k1", 5, "C", 7, None, True),
        ("k2", 1, "X", 1, None, True),
    ]  # k3 never has a surviving version


def test_scd2_null_op_is_not_tombstone_and_no_op_col(spark):
    from jsons_to_schema_spark.operators import cdc

    df = spark.createDataFrame(
        [("k", 1, None, "A"), ("k", 2, None, "B")],
        "k string, seq long, op string, state string",
    )
    rows = cdc.scd2_from_changelog(
        df, ["k"], "seq", ["state"], op_col="op"
    ).orderBy("version").collect()
    assert [(r.version, r.state, r.is_current) for r in rows] == [
        (1, "A", False), (2, "B", True)
    ]
    # without op_col everything is an upsert
    rows2 = cdc.scd2_from_changelog(df, ["k"], "seq", ["state"]).collect()
    assert len(rows2) == 2


def test_scd2_partition_invariance_and_contracts(spark):
    from jsons_to_schema_spark.operators import cdc

    log = _scd2_log(spark)
    a = cdc.scd2_from_changelog(log, ["k"], "seq", ["state"], op_col="op")
    b = cdc.scd2_from_changelog(
        log.repartition(17), ["k"], "seq", ["state"], op_col="op"
    )
    none_safe = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, a.collect()), key=none_safe) == sorted(
        map(tuple, b.collect()), key=none_safe
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        cdc.scd2_from_changelog(log, [], "seq", ["state"])
    with _pt.raises(ValueError, match="overlaps"):
        cdc.scd2_from_changelog(log, ["k"], "state", ["state"])
    with _pt.raises(ValueError, match="op_col inside"):
        cdc.scd2_from_changelog(log, ["k"], "seq", ["op"], op_col="op")


def test_scd2_single_exchange(spark):
    # the boundary filter, lead, and row_number windows all reuse the ONE
    # hash partitioning on the key — the docstring's single-shuffle claim
    from jsons_to_schema_spark.operators import cdc

    plan = cdc.scd2_from_changelog(
        _scd2_log(spark), ["k"], "seq", ["state"], op_col="op"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
