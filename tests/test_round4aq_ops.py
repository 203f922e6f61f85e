"""Wave-76 operator tests: collocation PMI and term dispersion."""

import math
import random
from collections import Counter

import pytest

from jsons_to_schema_spark.operators.text import (
    collocation_report,
    term_dispersion_report,
)


def _df(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def _brute_colloc(texts, min_count, k):
    uni, big = Counter(), Counter()
    for t in texts:
        ws = [w for w in (t or "").split(" ") if w]
        uni.update(ws)
        big.update(" ".join(p) for p in zip(ws, ws[1:]))
    n = sum(uni.values())
    rows = []
    for bg, cb in big.items():
        if cb < min_count:
            continue
        l, r = bg.split(" ")
        pmi = round(math.log2(n * cb / (uni[l] * uni[r])), 6)
        rows.append((bg, cb, uni[l], uni[r], pmi))
    rows.sort(key=lambda x: (-x[4], x[0]))
    return rows[:k]


def test_collocation_finds_the_phrase(spark):
    filler = "the cat sat on the mat and the dog ran around the yard"
    texts = [filler] * 20 + ["new york city is busy"] * 8
    got = [tuple(r) for r in
           collocation_report(_df(spark, texts), "text", 5, 5).collect()]
    assert got == _brute_colloc(texts, 5, 5)
    top_bigrams = [g[0] for g in got]
    # the rare-but-exclusive phrase pair outranks the common fillers
    assert top_bigrams[0] in ("new york", "york city", "city is", "is busy")


def test_collocation_min_count_floors_hapax(spark):
    texts = ["unique singleton pair here"] + ["a b"] * 10
    got = collocation_report(_df(spark, texts), "text", 2, 10).collect()
    bigrams = {r["bigram"] for r in got}
    assert "unique singleton" not in bigrams  # hapax pair floored out
    assert "a b" in bigrams


def test_collocation_brute_parity_random(spark):
    rng = random.Random(7601)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(60)
    ]
    got = [tuple(r) for r in
           collocation_report(_df(spark, texts), "text", 3, 8).collect()]
    assert got == _brute_colloc(texts, 3, 8)


def test_term_dispersion_flags_bursty_spam(spark):
    spam = " ".join(["viagra"] * 50)
    texts = [spam, spam] + ["normal words about normal things"] * 100
    got = [tuple(r) for r in
           term_dispersion_report(_df(spark, texts), "text", "doc_id", 10, 3).collect()]
    assert got[0][0] == "viagra"
    assert got[0][1] == 100 and got[0][2] == 2  # tf=100, df=2
    assert got[0][3] == 50.0


def test_term_dispersion_brute_parity(spark):
    rng = random.Random(7602)
    vocab = ["w%d" % i for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(50)
    ]
    got = [tuple(r) for r in
           term_dispersion_report(_df(spark, texts), "text", "doc_id", 5, 10).collect()]
    tf, dfc = Counter(), Counter()
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        tf.update(ws)
        dfc.update(set(ws))
    rows = [
        (w, tf[w], dfc[w], round(tf[w] / dfc[w], 6))
        for w in tf if tf[w] >= 5
    ]
    rows.sort(key=lambda x: (-x[1] / x[2], x[0]))
    assert got == rows[:10]
