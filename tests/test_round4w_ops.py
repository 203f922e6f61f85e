"""Wave-53 operator tests: readability features and script profile."""

import random
import re

import pytest

from jsons_to_schema_spark.operators.text import (
    readability_features,
    script_profile,
)


def _df(spark, texts, parts=2):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(parts)


def _read(spark, texts):
    out = readability_features(_df(spark, texts), "text", "doc_id").collect()
    return {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"],
            r["flesch"], r["fk_grade"],
        )
        for r in out
    }


def _brute_read(texts):
    out = {}
    for i, t in enumerate(texts):
        t = t or ""
        w = len([x for x in t.split(" ") if x])
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        y = len(re.findall(r"[aeiouyAEIOUY]+", t))
        if w > 0:
            fl = round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 6)
            fk = round(0.39 * (w / s) + 11.8 * (y / w) - 15.59, 6)
        else:
            fl = fk = None
        out[i] = (w, s, y, fl, fk)
    return out


def test_readability_hand_example(spark):
    texts = ["The cat sat. The dog ran!"]
    got = _read(spark, texts)
    w, s, y, fl, fk = got[0]
    assert (w, s, y) == (6, 2, 6)  # one vowel run per word here
    assert fl == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 6)
    assert fk == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 6)


def test_readability_edge_cases(spark):
    texts = ["", None, "no terminator here", "...!!!", "xyz zzz"]
    assert _read(spark, texts) == _brute_read(texts)
    got = _read(spark, texts)
    assert got[0][3] is None            # empty → NULL scores
    assert got[2][1] == 1               # fragment → one sentence
    assert got[4][2] == 1               # 'xyz zzz': one vowel run (the y)


def test_readability_brute_parity_random(spark):
    rng = random.Random(5301)
    words = ["alpha", "bee", "cccc", "dy", "!", "it.", "Ups!", "12"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 15)))
        for _ in range(40)
    ]
    assert _read(spark, texts) == _brute_read(texts)


# ---------------------------------------------------------------------------
# Script profile
# ---------------------------------------------------------------------------


def _script(spark, texts):
    out = script_profile(_df(spark, texts), "text", "doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_script_profile_pure_and_mixed(spark):
    texts = ["hello world", "你好 world 123", "Привет мир", ""]
    got = _script(spark, texts)
    r0 = got[0]
    assert r0["latin_chars"] == 10 and r0["whitespace_chars"] == 1
    assert r0["latin_ratio"] == round(10 / 11, 6)
    r1 = got[1]
    assert r1["cjk_chars"] == 2 and r1["latin_chars"] == 5 and r1["digit_chars"] == 3
    r2 = got[2]
    assert r2["cyrillic_chars"] == 9 and r2["latin_chars"] == 0
    r3 = got[3]
    assert r3["n_chars"] == 0 and r3["latin_ratio"] is None


def test_script_profile_counts_sum_to_n_chars(spark):
    texts = ["héllo wörld 你好 мир ١٢٣ x!?", None, "a\tb\nc"]
    got = _script(spark, texts)
    for r in got.values():
        total = (
            r["latin_chars"] + r["digit_chars"] + r["cjk_chars"]
            + r["cyrillic_chars"] + r["arabic_chars"]
            + r["whitespace_chars"] + r["other_chars"]
        )
        assert total == r["n_chars"]
    # é and ö are not [A-Za-z] — they land in other
    assert got[0]["other_chars"] >= 2
    assert got[0]["arabic_chars"] == 3  # Arabic-Indic digits ١٢٣
    assert got[2]["whitespace_chars"] == 2  # tab + newline


def test_script_profile_brute_parity_random(spark):
    rng = random.Random(5302)
    alphabet = "abzABZ019 你好犬 ПривЖ سلام \t.!é€"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(30)
    ]
    got = _script(spark, texts)
    classes = {
        "latin": r"[A-Za-z]",
        "digit": r"[0-9]",
        "cjk": "[一-鿿]",
        "cyrillic": "[Ѐ-ӿ]",
        "arabic": "[؀-ۿ]",
        "whitespace": r"\s",
    }
    for i, t in enumerate(texts):
        r = got[i]
        assert r["n_chars"] == len(t)
        for name, pat in classes.items():
            assert r[f"{name}_chars"] == len(re.findall(pat, t)), (i, name)
