"""Wave-71 operator tests: n-gram novelty scores."""

import random

import pytest

from jsons_to_schema_spark.operators.text import novelty_scores


def _df(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def _nov(spark, texts, k=3):
    out = novelty_scores(_df(spark, texts), "text", "doc_id", k).collect()
    return {r["doc_id"]: (r["n_shingles"], r["n_unique"], r["novelty"]) for r in out}


def _brute_nov(texts, k=3):
    def sh(t):
        toks = [w for w in (t or "").split(" ") if w]
        return {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }

    all_sh = [sh(t) for t in texts]
    out = {}
    for i, s in enumerate(all_sh):
        uniq = sum(
            1 for g in s if not any(g in o for j, o in enumerate(all_sh) if j != i)
        )
        n = len(s)
        out[i] = (n, uniq, round(uniq / n, 6) if n else None)
    return out


def test_novelty_duplicate_scores_zero_original_scores_one(spark):
    orig = "a wholly original sentence about rare topics never repeated"
    dup = "the same boilerplate footer text appears again and again"
    texts = [orig, dup, dup, "totally different unique content lives right here"]
    got = _nov(spark, texts)
    assert got[0][2] == 1.0          # nothing shared
    assert got[1][2] == 0.0          # every shingle appears in the copy
    assert got[2][2] == 0.0
    assert got[3][2] == 1.0


def test_novelty_partial_overlap(spark):
    texts = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta gamma delta epsilon",  # shares the 'gamma delta epsilon' shingle
    ]
    got = _nov(spark, texts)
    assert got == _brute_nov(texts)
    assert 0.0 < got[0][2] < 1.0


def test_novelty_short_docs_null(spark):
    texts = ["one two", "", None, "three words here"]
    got = _nov(spark, texts)
    assert got[0] == (0, 0, None)
    assert got[1] == (0, 0, None)
    assert got[2] == (0, 0, None)
    assert got[3] == (1, 1, 1.0)


def test_novelty_brute_parity_random(spark):
    rng = random.Random(7101)
    vocab = ["tok%d" % i for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        for _ in range(40)
    ]
    assert _nov(spark, texts) == _brute_nov(texts)
    assert _nov(spark, texts, k=2) == _brute_nov(texts, k=2)
