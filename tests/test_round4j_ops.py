"""Wave-40 operator tests: exact prefix-filtering Jaccard join (lossless
AllPairs) and deterministic leakage-safe splits."""

import hashlib
import itertools
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.dedup import jaccard_prefix_join
from jsons_to_schema_spark.operators.sample import assign_splits
from jsons_to_schema_spark.plans import audit


# ---------------------------------------------------------------------------
# jaccard_prefix_join
# ---------------------------------------------------------------------------

def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def _brute_pairs(texts, t):
    sets = {i: set(w for w in txt.split(" ") if w) for i, txt in enumerate(texts)}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        u = len(sa | sb)
        if u and len(sa & sb) / u >= t:
            out.add((a, b, round(len(sa & sb) / u, 6)))
    return out


def _spark_pairs(spark, texts, t, parts=4):
    return {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_prefix_join(
            _docs(spark, texts, parts), "text", "doc_id", t
        ).collect()
    }


def test_prefix_join_matches_brute_force_random(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.sample(vocab, rng.randrange(3, 12))) for _ in range(40)
    ]
    for t in (0.3, 0.5, 0.8):
        assert _spark_pairs(spark, texts, t) == _brute_pairs(texts, t), t


def test_prefix_join_lossless_at_integer_boundaries(spark):
    """t*n landing exactly on an integer is where a float-wobbled ceil
    would shorten the prefix and drop pairs: J exactly == t must survive."""
    # |A| = |B| = 4, intersection 3 -> J = 3/5 = 0.6; t = 0.6 exactly
    texts = ["a b c d", "a b c e", "x y z q"]
    got = _spark_pairs(spark, texts, 0.6)
    assert (0, 1, 0.6) in got
    # J exactly 0.5: |A|=2,|B|=4, inter 2 -> 2/4
    texts2 = ["p q", "p q r s"]
    assert (0, 1, 0.5) in _spark_pairs(spark, texts2, 0.5)


def test_prefix_join_identical_and_empty_docs(spark):
    texts = ["same same words here", "words same here", "", "   "]
    got = _spark_pairs(spark, texts, 1.0)
    # doc0 tokens {same, words, here} == doc1 tokens -> J = 1.0
    assert got == {(0, 1, 1.0)}


def test_prefix_join_partition_invariance(spark):
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(15)]
    texts = [" ".join(rng.sample(vocab, rng.randrange(2, 8))) for _ in range(25)]
    want = _brute_pairs(texts, 0.4)
    for p in (1, 3, 9):
        assert _spark_pairs(spark, texts, 0.4, parts=p) == want


def test_prefix_join_rejects_bad_threshold(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        jaccard_prefix_join(df, "text", "doc_id", 0.0)
    with pytest.raises(ValueError):
        jaccard_prefix_join(df, "text", "doc_id", 1.5)


def test_prefix_join_plan_no_cartesian_no_python(spark):
    plan = audit.formatted_plan(
        jaccard_prefix_join(_docs(spark, ["a b c", "a b d"]), "text", "doc_id", 0.5)
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# assign_splits / leakage_safe_split
# ---------------------------------------------------------------------------

def _hash_prefix(seed, key):
    return hashlib.md5(f"{seed}\x1f{key}".encode()).hexdigest()[:8]


def test_assign_splits_matches_reference_hash(spark):
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "k string"
    ).repartition(5)
    out = {
        r["k"]: r["split"]
        for r in assign_splits(
            df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    t1, t2 = format(round(0.8 * 16**8), "08x"), format(round(0.9 * 16**8), "08x")
    for i in range(400):
        h = _hash_prefix(42, f"k{i}")
        want = "train" if h < t1 else ("val" if h < t2 else "test")
        assert out[f"k{i}"] == want
    # rough proportion sanity on 400 uniform keys
    counts = {s: sum(1 for v in out.values() if v == s) for s in ("train", "val", "test")}
    assert counts["train"] > 250 and counts["val"] > 10 and counts["test"] > 10


def test_assign_splits_growth_stable(spark):
    """Adding rows never moves an existing row's split."""
    small = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    big = spark.createDataFrame([(f"k{i}",) for i in range(200)], "k string")
    sp = {"train": 0.5, "test": 0.5}
    a = {r["k"]: r["split"] for r in assign_splits(small, "k", sp).collect()}
    b = {r["k"]: r["split"] for r in assign_splits(big, "k", sp).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_assign_splits_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        assign_splits(df, "k", {"train": 1.0})  # < 2 splits
    with pytest.raises(ValueError):
        assign_splits(df, "k", {"a": 0.5, "b": 0.6})  # sums past 1
    with pytest.raises(ValueError):
        assign_splits(df, "k", {"a": 1.5, "b": -0.5})  # negative


def test_group_keyed_splits_never_straddle(spark):
    """assign_splits keyed on a GROUP column: every member of a duplicate
    group gets the group's split — zero straddle, by construction, under
    any partitioning (the leakage-safe convention; the pair-list CC
    variant is sample.leakage_safe_split, tested in test_round4f)."""
    rows = [
        (i, f"g{i % 7}") for i in range(140)  # 7 groups, 20 members each
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string").repartition(6)
    out = assign_splits(df, "grp", {"train": 0.6, "val": 0.2, "test": 0.2})
    straddle = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0


def test_assign_splits_plan_no_shuffle(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(8)], "k string")
    plan = audit.formatted_plan(
        assign_splits(df, "k", {"a": 0.5, "b": 0.5})
    )
    assert "Exchange" not in plan  # a pure projection
    assert "BatchEvalPython" not in plan
