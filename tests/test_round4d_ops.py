"""Unit tests for the round-4 fourth-continuation operators: market-basket
frequent pairs, cohort retention, fixed-grid resampling, and golden-record
survivorship — brute-force reference comparisons plus the edge cases the
driver oracle can't plant."""

import itertools
import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import stats, temporal
from jsons_to_schema_spark.operators.resolve import survivorship


# ---------------------------------------------------------------- pairs ----


def _basket_rows():
    rng = random.Random(41)
    items = list("abcdef")
    rows = []
    for b in range(40):
        picked = rng.sample(items, rng.randint(1, 4))
        for i in picked:
            # duplicates within a basket must collapse to one membership
            for _ in range(rng.randint(1, 3)):
                rows.append((f"b{b}", i))
    rows += [(None, "a"), ("b0", None)]  # NULLs carry no evidence
    return rows


def _brute_pairs(rows, min_count):
    memb = {(b, i) for b, i in rows if b is not None and i is not None}
    baskets = defaultdict(set)
    for b, i in memb:
        baskets[b].add(i)
    nb = len(baskets)
    item_n = Counter(i for _, i in memb)
    pair_n = Counter()
    for b, its in baskets.items():
        for a, c in itertools.combinations(sorted(its), 2):
            pair_n[(a, c)] += 1
    out = {}
    for (a, c), n_ab in pair_n.items():
        if n_ab < min_count:
            continue
        na, ncc = item_n[a], item_n[c]
        out[(a, c)] = (
            n_ab,
            na,
            ncc,
            round(n_ab / nb, 6),
            round(n_ab / na, 6),
            round(n_ab / ncc, 6),
            round(n_ab * nb / (na * ncc), 6),
        )
    return out


def test_frequent_pairs_matches_brute_force(spark):
    rows = _basket_rows()
    df = spark.createDataFrame(rows, "b string, i string")
    got = {
        (r.item_a, r.item_b): (
            r.n_ab, r.n_a, r.n_b, r.support, r.conf_a_b, r.conf_b_a, r.lift
        )
        for r in stats.frequent_pairs(df, "b", "i", min_count=2).collect()
    }
    assert got == _brute_pairs(rows, 2)


def test_frequent_pairs_min_count_and_ordering(spark):
    df = spark.createDataFrame(
        [("b1", "x"), ("b1", "y"), ("b2", "y"), ("b2", "x"), ("b3", "x")],
        "b string, i string",
    )
    out = stats.frequent_pairs(df, "b", "i", min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    # item_a < item_b always
    assert (r.item_a, r.item_b) == ("x", "y")
    assert r.n_ab == 2 and r.n_a == 3 and r.n_b == 2
    # lift = 2*3/(3*2) = 1.0
    assert r.lift == 1.0
    # min_count above the max pair count -> empty
    assert stats.frequent_pairs(df, "b", "i", min_count=3).count() == 0


def test_frequent_pairs_basket_cap_drops_wide_baskets(spark):
    rows = [("wide", i) for i in "abcdefgh"] + [
        ("n1", "a"), ("n1", "b"), ("n2", "a"), ("n2", "b"),
    ]
    df = spark.createDataFrame(rows, "b string, i string")
    capped = stats.frequent_pairs(df, "b", "i", 2, max_items_per_basket=4)
    got = {(r.item_a, r.item_b): r.n_ab for r in capped.collect()}
    # the 8-item basket is dropped entirely: only the narrow pair survives,
    # and n_baskets excludes the dropped basket (support = 2/2)
    assert got == {("a", "b"): 2}
    sup = capped.collect()[0].support
    assert sup == 1.0


def test_frequent_pairs_validates(spark):
    df = spark.createDataFrame([("b", "i")], "b string, i string")
    with pytest.raises(ValueError, match="min_count"):
        stats.frequent_pairs(df, "b", "i", min_count=0)


# -------------------------------------------------------------- cohorts ----


def _ts(d):
    return datetime(2024, 1, 1) + timedelta(hours=d * 24)


def _cohort_rows():
    rng = random.Random(42)
    rows = []
    for u in range(30):
        first = rng.randint(0, 20)
        rows.append((f"u{u}", _ts(first)))
        for _ in range(rng.randint(0, 5)):
            rows.append((f"u{u}", _ts(first + rng.randint(0, 40))))
    rows.append(("ghost", None))  # all-NULL key drops entirely
    return rows


def _brute_cohort(rows, unit_days):
    per_key = defaultdict(set)
    for u, t in rows:
        if t is None:
            continue
        epoch = (t - datetime(1970, 1, 1)).days
        bucket = epoch - epoch % unit_days if unit_days == 1 else None
        if unit_days == 7:
            # ISO Monday truncation: 1970-01-01 was a Thursday (weekday 3)
            dow = (epoch + 3) % 7
            bucket = epoch - dow
        per_key[u].add(bucket)
    cells = Counter()
    for u, buckets in per_key.items():
        c = min(buckets)
        for b in buckets:
            cells[(c, (b - c) // unit_days)] += 1
    sizes = {c: n for (c, o), n in cells.items() if o == 0}
    return {
        (
            (datetime(1970, 1, 1) + timedelta(days=c)).strftime("%Y-%m-%d"),
            o,
        ): (n, sizes[c], round(n / sizes[c], 6))
        for (c, o), n in cells.items()
    }


@pytest.mark.parametrize("unit,unit_days", [("day", 1), ("week", 7)])
def test_cohort_retention_matches_brute_force(spark, unit, unit_days):
    rows = _cohort_rows()
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    got = {
        (r.cohort, r.offset): (r.n_active, r.cohort_size, r.retention)
        for r in temporal.cohort_retention(df, "u", "ts", unit).collect()
    }
    assert got == _brute_cohort(rows, unit_days)
    # offset-0 sanity rows: retention == 1.0 for every cohort
    assert all(v[2] == 1.0 for (c, o), v in got.items() if o == 0)


def test_cohort_retention_month_offsets(spark):
    df = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 15)),
            ("u1", datetime(2024, 3, 2)),   # +2 months from Jan bucket
            ("u2", datetime(2024, 1, 31)),
            ("u2", datetime(2024, 2, 1)),   # +1 month
        ],
        "u string, ts timestamp",
    )
    got = {
        (r.cohort, r.offset): r.n_active
        for r in temporal.cohort_retention(df, "u", "ts", "month").collect()
    }
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1}


def test_cohort_retention_partition_invariance(spark):
    rows = _cohort_rows()
    base = None
    for k in (1, 7):
        df = spark.createDataFrame(rows, "u string, ts timestamp").repartition(k)
        got = sorted(
            (r.cohort, r.offset, r.n_active, r.cohort_size, r.retention)
            for r in temporal.cohort_retention(df, "u", "ts", "week").collect()
        )
        base = got if base is None else base
        assert got == base


def test_cohort_retention_validates(spark):
    df = spark.createDataFrame([("u", datetime(2024, 1, 1))], "u string, ts timestamp")
    with pytest.raises(ValueError, match="unit"):
        temporal.cohort_retention(df, "u", "ts", "quarter")


# ------------------------------------------------------------- resample ----


def test_resample_grid_gap_fill_reference(spark):
    h = 3_600_000_000  # one hour in us
    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 10), 2.0),
            ("k", datetime(2024, 1, 1, 0, 50), 4.0),   # same bucket -> avg 3.0
            ("k", datetime(2024, 1, 1, 3, 5), 9.0),    # two-bucket gap before
            ("q", datetime(2024, 1, 1, 5, 0), 7.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = temporal.resample(df, ["k"], "ts", "v", 3600).collect()
    got = {(r.k, r.bucket_us): (r.value, r.filled) for r in out}
    t0 = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert got == {
        ("k", t0 + 0 * h): (3.0, False),
        ("k", t0 + 1 * h): (3.0, True),   # ffill carries 3.0
        ("k", t0 + 2 * h): (3.0, True),
        ("k", t0 + 3 * h): (9.0, False),
        ("q", t0 + 5 * h): (7.0, False),  # single-bucket key: grid of one
    }


def test_resample_observed_null_cell_is_not_a_gap(spark):
    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0), 5.0),
            ("k", datetime(2024, 1, 1, 1, 0), None),  # observed, all-NULL avg
            ("k", datetime(2024, 1, 1, 2, 0), None),
        ],
        "k string, ts timestamp, v double",
    )
    out = {r.bucket_us: (r.value, r.filled)
           for r in temporal.resample(df, ["k"], "ts", "v", 3600).collect()}
    t0 = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    h = 3_600_000_000
    # the NULL-aggregate cells keep their NULL (never forward-filled) and
    # are marked observed
    assert out[t0 + h] == (None, False)
    assert out[t0 + 2 * h] == (None, False)
    assert out[t0] == (5.0, False)


def test_resample_fill_none_and_leading_gap(spark):
    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0), 1.0),
            ("k", datetime(2024, 1, 1, 2, 0), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = {r.bucket_us: (r.value, r.filled)
           for r in temporal.resample(df, ["k"], "ts", "v", 3600, fill="none").collect()}
    t0 = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    h = 3_600_000_000
    assert out[t0 + h] == (None, True)  # gap stays NULL under fill='none'


def test_resample_agg_variants_and_null_ts(spark):
    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0), 5.0),
            ("k", datetime(2024, 1, 1, 0, 30), 1.0),
            ("k", None, 100.0),  # NULL ts excluded entirely
        ],
        "k string, ts timestamp, v double",
    )
    mn = temporal.resample(df, ["k"], "ts", "v", 3600, agg="min").collect()
    assert len(mn) == 1 and mn[0].value == 1.0
    ct = temporal.resample(df, ["k"], "ts", "v", 3600, agg="count").collect()
    assert ct[0].value == 2


def test_resample_bucket_guard_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1), 1.0),
            ("k", datetime(2026, 1, 1), 2.0),
        ],
        "k string, ts timestamp, v double",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="max_buckets_per_key"):
        temporal.resample(
            df, ["k"], "ts", "v", 3600, max_buckets_per_key=100
        ).collect()


def test_resample_validates(spark):
    df = spark.createDataFrame([("k", datetime(2024, 1, 1), 1.0)],
                               "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="agg"):
        temporal.resample(df, ["k"], "ts", "v", 60, agg="median")
    with pytest.raises(ValueError, match="fill"):
        temporal.resample(df, ["k"], "ts", "v", 60, fill="bfill")
    with pytest.raises(ValueError, match="every_seconds"):
        temporal.resample(df, ["k"], "ts", "v", 0)
    with pytest.raises(ValueError, match="keys"):
        temporal.resample(df, [], "ts", "v", 60)


# --------------------------------------------------------- survivorship ----


def _surv_rows():
    rng = random.Random(43)
    rows = []
    seq = 0
    for c in range(25):
        for _ in range(rng.randint(1, 6)):
            seq += 1
            rows.append(
                (
                    c,
                    seq,
                    rng.choice(["x", "y", "z", None]),
                    rng.choice([1.0, 2.5, 7.0, None]),
                    rng.choice(["red", "blue", None]),
                )
            )
    return rows


def _brute_surv(rows):
    by_c = defaultdict(list)
    for r in rows:
        by_c[r[0]].append(r)
    out = {}
    for c, rs in by_c.items():
        named = [(s, n) for _, s, n, _, _ in rs if n is not None]
        latest = max(named)[1] if named else None
        amts = [a for _, _, _, a, _ in rs if a is not None]
        mx = max(amts) if amts else None
        cols = Counter(col for _, _, _, _, col in rs if col is not None)
        mode = (
            min(cols, key=lambda v: (-cols[v], v)) if cols else None
        )
        out[c] = (len(rs), latest, mx, mode)
    return out


def test_survivorship_matches_brute_force(spark):
    rows = _surv_rows()
    df = spark.createDataFrame(
        rows, "c int, seq int, name string, amt double, color string"
    )
    out = survivorship(
        df, "c", {"name": "latest", "amt": "max", "color": "mode"}, seq_col="seq"
    )
    assert out.columns == ["c", "n_members", "name", "amt", "color"]
    got = {r.c: (r.n_members, r.name, r.amt, r.color) for r in out.collect()}
    assert got == _brute_surv(rows)


def test_survivorship_latest_skips_null_values(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, None)], "c int, seq int, name string"
    )
    r = survivorship(df, "c", {"name": "latest"}, seq_col="seq").collect()[0]
    # completeness beats recency: the fresher NULL must not erase 'old'
    assert r.name == "old"
    r = survivorship(df, "c", {"name": "earliest"}, seq_col="seq").collect()[0]
    assert r.name == "old"


def test_survivorship_mode_tiebreak_ascending(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "a"), (1, "b"), (1, None)],
        "c int, color string",
    )
    r = survivorship(df, "c", {"color": "mode"}).collect()[0]
    assert r.color == "a"  # tie 2-2 broken by value ascending


def test_survivorship_all_null_column_resolves_null(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None)], "c int, seq int, name string"
    )
    out = survivorship(
        df, "c", {"name": "mode"}
    ).collect()[0]
    assert out.name is None
    out = survivorship(df, "c", {"name": "latest"}, seq_col="seq").collect()[0]
    assert out.name is None


def test_survivorship_partition_invariance(spark):
    rows = _surv_rows()
    base = None
    for k in (1, 8):
        df = spark.createDataFrame(
            rows, "c int, seq int, name string, amt double, color string"
        ).repartition(k)
        got = sorted(
            tuple(r)
            for r in survivorship(
                df, "c", {"name": "latest", "color": "mode"}, seq_col="seq"
            ).collect()
        )
        base = got if base is None else base
        assert got == base


def test_survivorship_validates(spark):
    df = spark.createDataFrame([(1, 1, "a")], "c int, seq int, name string")
    with pytest.raises(ValueError, match="non-empty"):
        survivorship(df, "c", {})
    with pytest.raises(ValueError, match="unknown rules"):
        survivorship(df, "c", {"name": "newest"})
    with pytest.raises(ValueError, match="seq_col"):
        survivorship(df, "c", {"name": "latest"})
    with pytest.raises(ValueError, match="cluster_col"):
        survivorship(df, "c", {"c": "max"})
    with pytest.raises(ValueError, match="seq_col cannot"):
        survivorship(df, "c", {"seq": "max", "name": "latest"}, seq_col="seq")


# ------------------------------------------------------------ attribution ----


def _attr_rows():
    rng = random.Random(49)
    rows = []
    eid = 0
    for u in range(25):
        for _ in range(rng.randint(2, 12)):
            eid += 1
            rows.append(
                (f"u{u}", eid, _ts_h(rng.randint(0, 300)),
                 rng.choice(["view", "click", "buy", "noise"]))
            )
    rows.append((None, 9000, _ts_h(1), "buy"))
    rows.append(("uX", 9001, None, "view"))
    return rows


def _ts_h(h):
    return datetime(2024, 1, 1) + timedelta(hours=h)


def _brute_attr(rows, lookback_h, model):
    from collections import defaultdict

    evs = [
        (u, i, t, ty) for u, i, t, ty in rows if u is not None and t is not None
    ]
    convs = [(u, i, t) for u, i, t, ty in evs if ty == "buy"]
    per_type = defaultdict(lambda: [set(), 0.0])  # type -> [conv set, credit]
    none_count = 0
    for u, cid, ct in convs:
        touches = [
            (t, i, ty)
            for (uu, i, t, ty) in evs
            if uu == u and ty in ("view", "click")
            and t < ct and t >= ct - timedelta(hours=lookback_h)
        ]
        if not touches:
            none_count += 1
            continue
        if model == "linear":
            n = len(touches)
            for _, _, ty in touches:
                per_type[ty][0].add((u, cid))
                per_type[ty][1] += round(1.0 / n, 6)
        else:
            win = max(touches) if model == "last" else min(touches)
            per_type[win[2]][0].add((u, cid))
            per_type[win[2]][1] += 1.0
    out = {
        ty: (len(s), round(c, 6)) for ty, (s, c) in per_type.items()
    }
    out["(none)"] = (none_count, 0.0)
    return out


@pytest.mark.parametrize("model", ["last", "first", "linear"])
def test_attribution_matches_brute_force(spark, model):
    rows = _attr_rows()
    df = spark.createDataFrame(rows, "u string, id long, ts timestamp, t string")
    got = {
        r.touch_type: (r.conversions, r.credit)
        for r in temporal.attribution(
            df, "u", "id", "ts", "t", ["view", "click"], "buy",
            lookback_seconds=48 * 3600, model=model,
        ).collect()
    }
    expect = _brute_attr(rows, 48, model)
    # credit sums are rounded doubles: compare with tolerance, counts exact
    assert set(got) == set(expect)
    for ty in expect:
        assert got[ty][0] == expect[ty][0], (ty, got[ty], expect[ty])
        assert abs(got[ty][1] - expect[ty][1]) < 1e-6, ty


def test_attribution_conservation_and_validates(spark):
    rows = _attr_rows()
    df = spark.createDataFrame(rows, "u string, id long, ts timestamp, t string")
    out = temporal.attribution(
        df, "u", "id", "ts", "t", ["view", "click"], "buy",
        lookback_seconds=48 * 3600, model="linear",
    ).collect()
    n_conv = df.filter("t = 'buy' AND u IS NOT NULL AND ts IS NOT NULL").count()
    total_credit = sum(r.credit for r in out)
    none = [r for r in out if r.touch_type == "(none)"][0]
    # linear credits conserve: credit mass + unattributed = conversions
    assert abs(total_credit + none.conversions - n_conv) < 1e-3
    with pytest.raises(ValueError, match="model"):
        temporal.attribution(df, "u", "id", "ts", "t", ["view"], "buy", 60, model="ushape")
    with pytest.raises(ValueError, match="lookback"):
        temporal.attribution(df, "u", "id", "ts", "t", ["view"], "buy", 0)
    with pytest.raises(ValueError, match="touch_types"):
        temporal.attribution(df, "u", "id", "ts", "t", ["buy"], "buy", 60)
