"""Deterministic sampling: reproducibility, growth stability, rate accuracy,
stratified thresholds, nested-sample subset property."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.sample import (
    _hex_threshold,
    deterministic_sample,
    stratified_sample,
)
from jsons_to_schema_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_hex_threshold_bounds():
    assert _hex_threshold(0.0) == "00000000"
    # keep-all must be the "g" sentinel: "100000000" is 9 chars and sorts
    # BELOW "2..."-prefixes lexicographically
    assert _hex_threshold(1.0) == "g"
    assert all(d < "g" for d in "0123456789abcdef")
    with pytest.raises(ValueError):
        _hex_threshold(1.5)


def test_rate_and_determinism(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.2).collect()}
    b = {r.k for r in deterministic_sample(df.repartition(7), "k", 0.2).collect()}
    assert a == b  # partitioning-invariant
    assert abs(len(a) / 20_000 - 0.2) < 0.01  # uniformity at ±1%


def test_growth_stability_and_subset(spark):
    small = spark.range(5_000).withColumnRenamed("id", "k")
    big = spark.range(20_000).withColumnRenamed("id", "k")
    s_small = {r.k for r in deterministic_sample(small, "k", 0.2).collect()}
    s_big = {r.k for r in deterministic_sample(big, "k", 0.2).collect()}
    # adding rows never changes an existing row's membership
    assert s_small == {k for k in s_big if k < 5_000}
    # a lower rate is a SUBSET of a higher rate (same seed)
    s_10 = {r.k for r in deterministic_sample(big, "k", 0.1).collect()}
    assert s_10 <= s_big


def test_full_and_zero(spark):
    df = spark.range(1_000).withColumnRenamed("id", "k")
    assert deterministic_sample(df, "k", 1.0).count() == 1_000
    assert deterministic_sample(df, "k", 0.0).count() == 0


def test_stratified_rates(spark):
    docs = load_table(spark, SF, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.5
    )
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    tot = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got["en"] == tot["en"]  # keep-all stratum
    assert "de" not in got  # drop-all stratum
    other = sum(v for k, v in tot.items() if k not in ("en", "de"))
    other_got = sum(v for k, v in got.items() if k != "en")
    assert abs(other_got / max(other, 1) - 0.5) < 0.1


def test_stratified_equal_rates_equal_keys(spark):
    """The decision hash excludes the stratum: equal fractions admit the
    same key set regardless of labels."""
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    strat = {r.k for r in stratified_sample(
        df, "k", "s", {"0": 0.3, "1": 0.3, "2": 0.3}
    ).collect()}
    flat = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert strat == flat


def test_weighted_sample_exact_top_k_and_bias(spark):
    import hashlib
    import math

    from jsons_to_schema_spark.operators import sample as S

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = S.weighted_sample(df, "id", "w", 50, seed=7).collect()
    assert len(out) == 50

    # brute-force reference: identical md5-derived u and rounded log key
    def key(i, w):
        h = hashlib.md5(f"7\x1f{i}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 16**8
        return round(math.log(u) / w, 6)

    expect = sorted(rows, key=lambda r: (-key(*r), r[0]))[:50]
    assert sorted((r.id, r.w) for r in out) == sorted(expect)
    for r in out:
        assert r.es_key == key(r.id, r.w)
    # heavy weights must dominate: 100 of 1000 rows carry w=100 and should
    # win the large majority of 50 slots
    heavy = sum(1 for r in out if r.w == 100.0)
    assert heavy >= 40

    # determinism under partitioning; exclusion of null/zero weights
    again = S.weighted_sample(df.repartition(17), "id", "w", 50, seed=7).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    dirty = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -1.0), (4, 5.0)], "id long, w double"
    )
    kept = S.weighted_sample(dirty, "id", "w", 10).collect()
    assert [r.id for r in kept] == [4]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        S.weighted_sample(df, "id", "w", 0)


def test_weighted_quota_sample_per_stratum(spark):
    import hashlib
    import math

    from jsons_to_schema_spark.operators import sample as S

    rows = [(i, "s%d" % (i % 3), float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = S.weighted_quota_sample(df, "id", "g", "w", 10, seed=5).collect()
    from collections import Counter

    assert Counter(r.g for r in out) == {"s0": 10, "s1": 10, "s2": 10}

    def key(i, w):
        h = hashlib.md5(f"5\x1f{i}".encode()).hexdigest()[:8]
        return round(math.log((int(h, 16) + 0.5) / 16**8) / w, 6)

    for g in ["s0", "s1", "s2"]:
        expect = sorted(
            (r for r in rows if r[1] == g), key=lambda r: (-key(r[0], r[2]), str(r[0]))
        )[:10]
        got = sorted((r.id, r.g, r.w) for r in out if r.g == g)
        assert got == sorted(expect)
    # partition invariance
    again = S.weighted_quota_sample(df.repartition(13), "id", "g", "w", 10, seed=5)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out))


def test_leakage_safe_split_clusters_never_straddle(spark):
    from jsons_to_schema_spark.operators.sample import leakage_safe_split

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    # chains linking each doc below 800 to the head of its group of 4
    pairs = (
        spark.range(800)
        .filter(F.col("id") % 4 != 0)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") - F.col("id") % 4).alias("id_b"),
        )
    )
    out = leakage_safe_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, pairs, seed=7
    )
    rows = out.collect()
    assert len(rows) == 2000
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # no cluster straddles a split
    assert all(len(s) == 1 for s in by_cluster.values())
    # clustered docs inherit the head's cluster
    m = {r.doc_id: r for r in rows}
    for i in range(800):
        assert m[i].cluster_id == i - i % 4
    for i in range(800, 2000):
        assert m[i].cluster_id == i
    # fractions roughly honored over the ~1400 clusters
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_leakage_safe_split_partition_and_pairless(spark):
    from jsons_to_schema_spark.operators.sample import leakage_safe_split

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = leakage_safe_split(docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=3)
    b = leakage_safe_split(
        docs.repartition(13), "doc_id", {"a": 0.5, "b": 0.5}, seed=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # pairless == deterministic hash split of the row key itself
    import hashlib

    for r in a.collect():
        h = hashlib.md5(f"3\x1f{r.doc_id}".encode()).hexdigest()[:8]
        assert r.split == ("a" if h < _hex_threshold(0.5) else "b")


def test_leakage_safe_split_validates(spark):
    from jsons_to_schema_spark.operators.sample import leakage_safe_split

    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "doc_id", {})
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
