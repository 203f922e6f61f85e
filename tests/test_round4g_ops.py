"""Unit tests for the round-4 seventh-continuation operators (wave 32+):
TF-IDF keyword extraction."""

import math

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.text import tfidf_top_terms


# --------------------------------------------------------------- tf-idf ----


def _docs(spark, parts=1):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
        (4, ""),  # token-less: counted in N, absent from output
    ]
    return spark.createDataFrame(rows, "id long, text string").repartition(parts)


def _expected(k=2, min_df=1):
    corpus = {
        1: ["apple", "apple", "banana"],
        2: ["banana", "cherry"],
        3: ["apple", "cherry", "cherry", "date"],
        4: [],
    }
    n = len(corpus)
    dfreq = {}
    for toks in corpus.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = []
    for d, toks in corpus.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = []
        for t, c in tf.items():
            if dfreq[t] < min_df:
                continue
            idf = round(math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0, 6)
            scored.append((t, c, round(c * idf, 6)))
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rank, (t, c, s) in enumerate(scored[:k], start=1):
            out.append((d, t, c, s, rank))
    return sorted(out)


def test_tfidf_hand_computed(spark):
    got = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark), "text", "id", k=2).collect()
    )
    assert got == _expected(k=2)


def test_tfidf_min_df_drops_rare_terms(spark):
    got = tfidf_top_terms(_docs(spark), "text", "id", k=4, min_df=2)
    terms = {r["term"] for r in got.collect()}
    assert "date" not in terms  # df=1 < 2
    assert {"apple", "banana", "cherry"} == terms
    assert sorted(tuple(r) for r in got.collect()) == _expected(k=4, min_df=2)


def test_tfidf_tie_breaks_on_term_asc(spark):
    # doc 2: banana and cherry both tf=1, both df=2 -> equal score;
    # rank 1 must be the lexicographically smaller term.
    rows = {
        (r["id"], r["rank"]): r["term"]
        for r in tfidf_top_terms(_docs(spark), "text", "id", k=2).collect()
        if r["id"] == 2
    }
    assert rows[(2, 1)] == "banana" and rows[(2, 2)] == "cherry"


def test_tfidf_partition_invariance(spark):
    a = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark, 1), "text", "id", k=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in tfidf_top_terms(_docs(spark, 9), "text", "id", k=3).collect()
    )
    assert a == b


def test_tfidf_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        tfidf_top_terms(_docs(spark), "text", "id", k=0)
