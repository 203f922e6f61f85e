"""Unit tests for the round-4 sixth-continuation operators: OpenRefine-style
fingerprint value clustering and cross-field arithmetic consistency."""

import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.resolve import fingerprint_clusters
from jsons_to_schema_spark.operators.stats import (
    arithmetic_consistency,
    arithmetic_violations,
)


# ---------------------------------------------------------- fingerprints ----


def _fp(s):
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", s.strip().lower()).split(" ") if t]
    return " ".join(sorted(set(toks)))


def _fp_rows():
    return [
        ("Acme Corp.",),
        (" ACME corp",),
        ("acme-corp",),
        ("acme corp",),          # 4 spellings, one key
        ("Beta LLC",),
        ("beta  llc",),          # 2 spellings
        ("Gamma",),              # singleton: filtered at min_values=2
        ("Gamma",),              # same spelling twice: still 1 value
        ("###",),                # all punctuation -> empty fingerprint
        ("...",),
        (None,),                 # no evidence
    ]


def _brute_clusters(rows, min_values):
    vals = Counter(v for (v,) in rows if v is not None)
    by_key = defaultdict(Counter)
    for v, n in vals.items():
        by_key[_fp(v)][v] = n
    out = {}
    for k, c in by_key.items():
        if len(c) >= min_values:
            out[k] = (len(c), sum(c.values()), "|".join(sorted(c)))
    return out


def test_fingerprint_clusters_matches_brute_force(spark):
    rows = _fp_rows()
    df = spark.createDataFrame(rows, "v string")
    got = {
        r.fingerprint: (r.n_values, r.n_rows, r.members)
        for r in fingerprint_clusters(df, "v").collect()
    }
    assert got == _brute_clusters(rows, 2)
    # the acme cluster fuses 4 spellings; gamma (1 spelling) is absent
    assert got["acme corp"][0] == 4
    assert "gamma" not in got
    # the all-punctuation values cluster under the empty fingerprint
    assert got[""] == (2, 2, "###|...")


def test_fingerprint_clusters_min_values_one_reports_singletons(spark):
    df = spark.createDataFrame(_fp_rows(), "v string")
    got = {r.fingerprint for r in fingerprint_clusters(df, "v", min_values=1).collect()}
    assert "gamma" in got
    with pytest.raises(ValueError, match="min_values"):
        fingerprint_clusters(df, "v", min_values=0)


def test_fingerprint_clusters_partition_invariance(spark):
    rows = [(f"Val {i % 7} variant-{i % 3}",) for i in range(60)]
    base = None
    for k in (1, 8):
        df = spark.createDataFrame(rows, "v string").repartition(k)
        got = sorted(tuple(r) for r in fingerprint_clusters(df, "v").collect())
        base = got if base is None else base
        assert got == base


# ------------------------------------------------------------ arithmetic ----


def _arith_df(spark):
    rows = []
    for k in range(200):
        left = float(k + 1)
        right = 2.0 + (k % 5)
        gross = left * right + (5.0 if k % 10 == 0 else 0.0)  # planted breaks
        total = left + right
        ratio_den = float(k % 4)  # zeros: div rows not checked
        rows.append((k, left, right, gross, total, ratio_den))
    rows.append((999, None, 1.0, 1.0, 1.0, 1.0))  # NULL left: not checked
    return spark.createDataFrame(
        rows, "k long, left double, right double, gross double, total double, den double"
    )


def test_arithmetic_consistency_report(spark):
    df = _arith_df(spark)
    out = {
        r.rule: r
        for r in arithmetic_consistency(
            df,
            [
                ("gross", "left", "mul", "right"),
                ("total", "left", "add", "right"),
                ("gross", "gross", "div", "den"),
            ],
        ).collect()
    }
    mul = out["gross=left*right"]
    assert mul.n_checked == 200 and mul.n_violations == 20
    assert mul.violation_rate == 0.1 and not mul.holds
    add = out["total=left+right"]
    assert add.n_checked == 200 and add.n_violations == 0 and add.holds
    # div: rows with den == 0 (k % 4 == 0 -> 50 rows) are not checked;
    # row 999 (gross/den both present) IS checked -> 150 + 1
    div = out["gross=gross/den"]
    assert div.n_checked == 151


def test_arithmetic_tolerance_regimes(spark):
    # |expected| >= 1: relative tolerance; |expected| < 1: absolute
    df = spark.createDataFrame(
        [
            (100.0, 100.0 + 2e-5, 1.0),   # rel 2e-7 < 1e-6: holds
            (100.0, 100.0 + 2e-4, 2.0),   # rel 2e-6 > 1e-6: violates
            (0.5, 0.5 + 2e-6, 3.0),       # abs 2e-6 > 1e-6: violates
            (0.5, 0.5 + 5e-7, 4.0),       # abs 5e-7 < 1e-6: holds
        ],
        "expected double, target double, k double",
    )
    out = arithmetic_consistency(
        df.selectExpr("target", "expected AS l", "CAST(1.0 AS DOUBLE) AS r"),
        [("target", "l", "mul", "r")],
    ).collect()[0]
    assert out.n_checked == 4 and out.n_violations == 2


def test_arithmetic_violations_rows(spark):
    df = _arith_df(spark)
    out = arithmetic_violations(
        df, ("gross", "left", "mul", "right"), keep=["k"]
    ).collect()
    assert len(out) == 20
    assert all(r.k % 10 == 0 for r in out)
    assert all(r.delta == 5.0 for r in out)
    assert all(r.observed == r.expected + 5.0 for r in out)


def test_arithmetic_validates(spark):
    df = _arith_df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        arithmetic_consistency(df, [])
    with pytest.raises(ValueError, match="bad rule"):
        arithmetic_consistency(df, [("a", "b", "pow", "c")])
    with pytest.raises(ValueError, match="tolerance"):
        arithmetic_consistency(df, [("gross", "left", "mul", "right")], tolerance=0)
    with pytest.raises(ValueError, match="bad rule"):
        arithmetic_violations(df, ("a", "b", "pow", "c"))


# ------------------------------------------------------------ stats merge ----


def test_merge_column_stats_law(spark):
    from jsons_to_schema_spark.operators.stats import column_stats, merge_column_stats

    rows = [(i, float(i % 7) if i % 5 else None, f"s{i % 11}") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v double, s string")
    cols = ["v", "s"]
    whole = column_stats(df, cols).collect()[0]
    for nparts in (2, 5):
        parts = None
        for i in range(nparts):
            b = column_stats(df.filter(F.col("k") % nparts == i), cols)
            parts = b if parts is None else parts.unionByName(b)
        merged = merge_column_stats(parts, cols).collect()[0]
        assert tuple(merged) == tuple(whole), (nparts, merged, whole)


def test_merge_column_stats_hll_and_all_null_batch(spark):
    from jsons_to_schema_spark.operators.stats import column_stats, merge_column_stats

    df = spark.createDataFrame(
        [(i, f"u{i % 40}") for i in range(200)], "k long, s string"
    )
    allnull = spark.createDataFrame([(None,)], "s string").selectExpr(
        "CAST(1 AS LONG) AS k", "s"
    )
    a = column_stats(df.filter("k < 100").drop("k"), ["s"], distinct="hll")
    b = column_stats(df.filter("k >= 100").drop("k"), ["s"], distinct="hll")
    c = column_stats(allnull.drop("k"), ["s"], distinct="hll")
    merged = merge_column_stats(
        a.unionByName(b).unionByName(c), ["s"], distinct="hll"
    ).collect()[0]
    assert merged.n_rows == 201 and merged.nulls_s == 1
    assert merged.min_s == "u0" and merged.max_s == "u9"
    # HLL estimate error contract: within 5% of the exact 40
    assert abs(merged.distinct_s - 40) <= 2


# --------------------------------------------------------- join explosion ----


def test_join_explosion_report_brute_force(spark):
    from itertools import product

    from jsons_to_schema_spark.operators.stats import join_explosion_report

    import random
    rng = random.Random(47)
    lkeys = [rng.choice([None, *range(8)]) for _ in range(120)]
    rkeys = [rng.choice([None, *range(5, 12)]) for _ in range(90)]
    ldf = spark.createDataFrame([(k,) for k in lkeys], "k long")
    rdf = spark.createDataFrame([(k,) for k in rkeys], "j long")
    r = join_explosion_report(ldf, rdf, "k", "j").collect()[0]

    ln = Counter(k for k in lkeys if k is not None)
    rn = Counter(k for k in rkeys if k is not None)
    matched = set(ln) & set(rn)
    join_rows = sum(ln[k] * rn[k] for k in matched)
    assert r.n_left == 120 and r.n_right == 90
    assert r.left_null_keys == sum(1 for k in lkeys if k is None)
    assert r.right_null_keys == sum(1 for k in rkeys if k is None)
    assert r.left_keys == len(ln) and r.right_keys == len(rn)
    assert r.matched_keys == len(matched)
    assert r.left_only_keys == len(set(ln) - matched)
    assert r.right_only_keys == len(set(rn) - matched)
    assert r.join_rows == join_rows
    assert r.max_left_mult == max(ln.values())
    assert r.max_pair_product == max((ln[k] * rn[k] for k in matched), default=0)
    assert r.explosion_factor == round(join_rows / 120, 6)
    # ground truth: the report's join_rows equals the materialized join
    assert r.join_rows == ldf.join(rdf, ldf.k == rdf.j).count()


def test_join_explosion_disjoint_and_empty(spark):
    from jsons_to_schema_spark.operators.stats import join_explosion_report

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(9,)], "k long")
    r = join_explosion_report(a, b, "k", "k").collect()[0]
    assert r.join_rows == 0 and r.matched_keys == 0
    assert r.left_only_keys == 2 and r.right_only_keys == 1
    assert r.max_pair_product == 0 and r.explosion_factor == 0.0


# ------------------------------------------------- sorted neighborhood ----


def test_sorted_neighborhood_matches_brute_force(spark):
    import random

    from jsons_to_schema_spark.operators.resolve import sorted_neighborhood_pairs

    rng = random.Random(48)
    rows = [
        (i, f"name{rng.randint(0, 30):02d}", rng.choice("AB"))
        for i in range(80)
    ] + [(None, "x", "A"), (900, None, "A"), (901, "y", None)]
    df = spark.createDataFrame(rows, "id long, key string, blk string")
    for w in (1, 3):
        got = {
            (r.block, r.id_a, r.id_b, r.rank_distance)
            for r in sorted_neighborhood_pairs(df, "id", "key", "blk", w).collect()
        }
        expect = set()
        for blk in "AB":
            ordered = sorted(
                (k, i) for i, k, b in rows
                if b == blk and i is not None and k is not None
            )
            for x in range(len(ordered)):
                for off in range(1, w + 1):
                    if x + off < len(ordered):
                        expect.add((blk, ordered[x][1], ordered[x + off][1], off))
        assert got == expect, (w, len(got), len(expect))


def test_sorted_neighborhood_adjacent_spellings_pair(spark):
    from jsons_to_schema_spark.operators.resolve import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "smith john", "S"), (2, "smyth john", "S"), (3, "zzz", "S")],
        "id long, key string, blk string",
    )
    out = sorted_neighborhood_pairs(df, "id", "key", "blk", window=1).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs  # the near-miss fingerprinting would split
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "key", "blk", window=0)


def test_sorted_neighborhood_partition_invariance(spark):
    from jsons_to_schema_spark.operators.resolve import sorted_neighborhood_pairs

    rows = [(i, f"k{i % 13}", f"b{i % 3}") for i in range(60)]
    base = None
    for k in (1, 8):
        df = spark.createDataFrame(rows, "id long, key string, blk string").repartition(k)
        got = sorted(
            tuple(r)
            for r in sorted_neighborhood_pairs(df, "id", "key", "blk", 2).collect()
        )
        base = got if base is None else base
        assert got == base


# -------------------------------------------------------- resolve funnel ----


def test_resolve_entities_end_to_end(spark):
    from jsons_to_schema_spark.operators.resolve import resolve_entities

    rows = [
        # entity A: three spellings, fused; latest non-NULL name wins
        (1, "acme corp", "B1", 10.0, "red"),
        (2, "acme corpx", "B1", 30.0, "blue"),
        (3, None, "B1", 20.0, "blue"),       # NULL name: no SNM evidence
        # entity B: two spellings in another block
        (7, "beta llc", "B2", 5.0, "red"),
        (8, "beta llcz", "B2", 6.0, None),
        # singleton: survives as its own cluster
        (9, "unrelated name", "B2", 1.0, "red"),
    ]
    df = spark.createDataFrame(rows, "id long, nm string, blk string, amt double, col string")
    out = {
        r.cluster: (r.n_members, r.nm, r.amt, r.col)
        for r in resolve_entities(
            df, "id", "nm", "blk", "id",
            {"nm": "latest", "amt": "max", "col": "mode"},
            window=2, max_distance=2,
        ).collect()
    }
    # row 3 has a NULL name: it is never a candidate, so it stays a singleton
    assert out[1] == (2, "acme corpx", 30.0, "blue")
    assert out[3] == (1, None, 20.0, "blue")
    assert out[7] == (2, "beta llcz", 6.0, "red")
    assert out[9] == (1, "unrelated name", 1.0, "red")
    assert len(out) == 4


def test_resolve_entities_no_matches_all_singletons(spark):
    from jsons_to_schema_spark.operators.resolve import resolve_entities

    df = spark.createDataFrame(
        [(1, "aaaaaaaa", "B", 1.0), (2, "zzzzzzzz", "B", 2.0)],
        "id long, nm string, blk string, amt double",
    )
    out = resolve_entities(
        df, "id", "nm", "blk", "id", {"amt": "max"}, max_distance=1
    ).collect()
    assert {r.cluster: r.amt for r in out} == {1: 1.0, 2: 2.0}


# ------------------------------------------------- generalization search ----


def test_generalization_search_picks_minimal_satisfying(spark):
    from jsons_to_schema_spark.operators.stats import generalization_search

    # 60 rows: ids 0..59, attr = id % 6
    df = spark.createDataFrame([(i, i % 6) for i in range(60)], "id long, a long")
    ladders = {
        "id": [("exact", F.col("id")), ("band10", F.col("id") - F.col("id") % 10),
               ("any", F.lit("*"))],
        "a": [("exact", F.col("a")), ("any", F.lit("*"))],
    }
    out = {r.combo: r for r in generalization_search(df, ladders, k=10).collect()}
    assert len(out) == 6
    # exact x exact: every group is a single row
    assert out["a=exact|id=exact"].min_group_size == 1
    assert not out["a=exact|id=exact"].satisfies_k
    # id banded to 10s with a suppressed: groups of 10 -> satisfies
    assert out["a=any|id=band10"].min_group_size == 10
    assert out["a=any|id=band10"].satisfies_k
    chosen = [c for c, r in out.items() if r.chosen]
    # minimal cost satisfying combo wins; exactly one chosen
    assert len(chosen) == 1
    ch = out[chosen[0]]
    assert ch.satisfies_k
    assert all(
        r.cost > ch.cost or not r.satisfies_k or r.combo >= ch.combo
        for r in out.values()
    )


def test_generalization_search_nothing_satisfies(spark):
    from jsons_to_schema_spark.operators.stats import generalization_search

    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    ladders = {"id": [("exact", F.col("id"))]}
    out = generalization_search(df, ladders, k=10).collect()
    assert len(out) == 1 and not out[0].chosen and not out[0].satisfies_k


def test_generalization_search_validates(spark):
    from jsons_to_schema_spark.operators.stats import generalization_search

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="k must"):
        generalization_search(df, {"id": [("e", F.col("id"))]}, k=0)
    with pytest.raises(ValueError, match="ladder"):
        generalization_search(df, {"id": []}, k=2)
    with pytest.raises(ValueError, match="combos exceeds"):
        generalization_search(df, {f"c{i}": [("a", F.col("id")), ("b", F.lit(1))] for i in range(8)}, k=2)


# ------------------------------------------- batch partition invariance ----


def test_wave19_29_partition_invariance_batch(spark):
    """Every new analyzer must produce identical results at 1 and 9 input
    partitions — the distributed-correctness floor."""
    from datetime import datetime, timedelta

    from jsons_to_schema_spark.operators import drift, stats, temporal
    from jsons_to_schema_spark.operators.resolve import resolve_entities

    ev_rows = [
        (i, datetime(2024, 1, 1) + timedelta(hours=i % 400),
         float((i * 37) % 500), f"u{i % 21}", ["view", "click", "purchase"][i % 3])
        for i in range(400)
    ]
    base = {}
    for k in (1, 9):
        ev = spark.createDataFrame(
            ev_rows, "id long, ts timestamp, v double, u string, t string"
        ).repartition(k)
        outs = {
            "benford": stats.benford_conformance(ev, "v"),
            "funnel": temporal.funnel(ev, "u", "ts", "t", ["view", "click"]),
            "pairs": stats.frequent_pairs(ev, "u", "t"),
            "shift": drift.level_shift(ev, "ts", "v", 86400),
            "explode": stats.join_explosion_report(ev, ev.selectExpr("u AS u2"), "u", "u2"),
            "gen": stats.generalization_search(
                ev, {"u": [("e", F.col("u")), ("any", F.lit("*"))]}, k=15
            ),
        }
        got = {name: sorted(tuple(r) for r in df.collect()) for name, df in outs.items()}
        if not base:
            base = got
        else:
            for name in got:
                assert got[name] == base[name], name


# ------------------------------------------------------- bin fit/transform ----


def test_fit_apply_bins_cross_dataset(spark):
    from jsons_to_schema_spark.operators.stats import apply_bins, fit_quantile_bins

    train = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    serve = spark.createDataFrame(
        [(float(i) + 0.5,) for i in range(100)] + [(None,), (-50.0,), (500.0,)],
        "v double",
    )
    edges = fit_quantile_bins(train, "v", 4)
    bl = [r.boundary for r in edges.orderBy("idx").collect()]
    assert len(bl) == 3 and bl == sorted(bl)
    out = apply_bins(serve, "v", edges)
    got = {r.v: r.bucket for r in out.collect()}
    for v, b in got.items():
        if v is None:
            assert b is None
        else:
            assert b == sum(1 for x in bl if x < v)
    # out-of-range values clamp to the extreme buckets by construction
    assert got[-50.0] == 0 and got[500.0] == 3
    # equal-to-boundary falls in the LOWER bucket
    eq = apply_bins(
        spark.createDataFrame([(bl[0],)], "v double"), "v", bl
    ).collect()[0]
    assert eq.bucket == 0


def test_fit_apply_bins_validates(spark):
    from jsons_to_schema_spark.operators.stats import apply_bins, fit_quantile_bins

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="k >= 2"):
        fit_quantile_bins(df, "v", 1)
    with pytest.raises(ValueError, match="ascending"):
        apply_bins(df, "v", [3.0, 1.0])
    with pytest.raises(ValueError, match="ascending"):
        apply_bins(df, "v", [])
