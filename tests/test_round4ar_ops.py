"""Wave-77 operator tests: vocabulary growth (Heaps) and Zipf profile."""

import math
import random
from collections import Counter

import pytest

from jsons_to_schema_spark.operators.text import vocab_growth_report, zipf_report


def _df(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def _brute_growth(texts, deciles=10):
    toks = [
        (i, w)
        for i, t in enumerate(texts)
        if t is not None
        for w in t.split(" ")
        if w
    ]
    mx = max(i for i, _ in toks)
    out = {}
    for d in range(1, deciles + 1):
        cutoff = math.ceil(d * mx / deciles)
        pre = [(i, w) for i, w in toks if i <= cutoff]
        out[d] = (cutoff, len(pre), len({w for _, w in pre}))
    return out


def test_growth_dup_corpus_flattens(spark):
    rng = random.Random(7701)
    fresh = [
        " ".join(f"w{rng.randrange(10000)}" for _ in range(30)) for _ in range(100)
    ]
    dup = [fresh[0]] * 100
    g_fresh = {
        r["decile"]: r["vocab_cum"]
        for r in vocab_growth_report(_df(spark, fresh), "text", "doc_id").collect()
    }
    g_dup = {
        r["decile"]: r["vocab_cum"]
        for r in vocab_growth_report(_df(spark, dup), "text", "doc_id").collect()
    }
    # fresh corpus keeps growing; duplicated corpus is flat after decile 1
    assert g_fresh[10] > g_fresh[5] > g_fresh[1]
    assert g_dup[10] == g_dup[1]


def test_growth_brute_parity(spark):
    rng = random.Random(7702)
    texts = [
        " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randint(0, 20)))
        for _ in range(40)
    ] + [None]
    got = {
        r["decile"]: (r["cutoff_id"], r["n_tokens_cum"], r["vocab_cum"])
        for r in vocab_growth_report(_df(spark, texts), "text", "doc_id").collect()
    }
    assert got == _brute_growth(texts)


def test_zipf_profile_exact(spark):
    texts = ["a a a a b b b c c d"] * 7
    got = [tuple(r) for r in zipf_report(_df(spark, texts), "text", k=4).collect()]
    assert [(g[0], g[1], g[2]) for g in got] == [
        (1, "a", 28), (2, "b", 21), (3, "c", 14), (4, "d", 7),
    ]
    assert got[0][3] == 0.0  # log2(1)
    assert got[1][4] == round(math.log2(21), 6)


def test_zipf_brute_parity_and_ties(spark):
    rng = random.Random(7703)
    vocab = ["z%d" % i for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for _ in range(50)
    ]
    got = [tuple(r) for r in zipf_report(_df(spark, texts), "text", k=15).collect()]
    tf = Counter(w for t in texts for w in t.split(" ") if w)
    rows = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    expect = [
        (i + 1, w, c, round(math.log2(i + 1), 6), round(math.log2(c), 6))
        for i, (w, c) in enumerate(rows)
    ]
    assert got == expect
