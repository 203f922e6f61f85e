"""Distributed BPE vocabulary learning: hand-computed merges on the classic
Sennrich example, merge-rank encoding, Arrow-kernel counts, partition
invariance."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import bpe


def test_bpe_merges_hand_computed():
    # Sennrich et al. running example: pair counts weighted by word freq.
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.bpe_merges_pure(wf, num_merges=4)
    # es/st tie at 9 breaks to the lexicographically smaller (e,s);
    # then (es,t) 9; then lo/ow tie at 7 breaks to (l,o); then (lo,w) 7.
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_bpe_merges_min_pair_count_stops():
    wf = {"ab": 1, "cd": 1}
    assert bpe.bpe_merges_pure(wf, num_merges=10, min_pair_count=2) == []
    assert bpe.bpe_merges_pure(wf, num_merges=10, min_pair_count=1) == [
        ("a", "b"),
        ("c", "d"),
    ]


def test_bpe_encode_word_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lowest", ranks) == ("low", "est")
    assert bpe.encode_word("low", ranks) == ("low",)
    assert bpe.encode_word("xyz", ranks) == ("x", "y", "z")
    assert bpe.encode_word("", ranks) == ()


def test_bpe_pieces_rebuild_words():
    # encoding is a partition of the word: concatenating pieces rebuilds it
    wf = {"internationalization": 4, "international": 3, "nation": 9}
    merges = bpe.bpe_merges_pure(wf, num_merges=12, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wf:
        assert "".join(bpe.encode_word(w, ranks)) == w


def test_learn_bpe_vocab_partition_invariant(spark):
    rows = [(i, f"alpha beta gamma delta w{i % 9}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = bpe.learn_bpe_vocab(df, "text", num_merges=15, max_words=1000)
    b = bpe.learn_bpe_vocab(
        df.repartition(13), "text", num_merges=15, max_words=1000
    )
    assert a == b and len(a) == 15


def test_bpe_count_udf_matches_pure(spark):
    df = spark.createDataFrame(
        [(1, "Lowest lower LOW"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.bpe_count_udf(merges)(F.col("text")).alias("n")
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    expect1 = sum(
        len(bpe.encode_word(w, ranks)) for w in "lowest lower low".split()
    )
    assert out[1] == expect1
    assert out[2] == 0 and out[3] == 0


def test_word_frequencies_topk_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "aa bb aa cc") for i in range(50)], ["doc_id", "text"]
    )
    top = bpe.word_frequencies(df, "text", max_words=2).collect()
    assert [(r["word"], r["n"]) for r in top] == [("aa", 100), ("bb", 50)]


def test_pinned_sf001_merges_match_live_learning(spark):
    """Tripwire for the pack_sequences_bpe_documents oracle: its pinned
    merge list must equal what learn_bpe_vocab produces at sf0.01 today —
    if learning (or the corpus) drifts, fail HERE before the driver's
    hash does."""
    from jsons_to_schema_spark.operators import bpe
    from jsons_to_schema_spark.queries.tokenq import PINNED_BPE_MERGES_SF001

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    live = bpe.learn_bpe_vocab(docs, "text", num_merges=40, max_words=10_000)
    assert tuple(tuple(p) for p in live) == PINNED_BPE_MERGES_SF001


def test_single_leftmost_merge_equals_classic_encoder():
    """The pack_sequences_bpe_documents oracle merges ONE leftmost
    lowest-rank pair per recursive-CTE step; encode_word merges ALL
    occurrences of the chosen pair per iteration.  The docstring's proof
    (a pair containing a just-created symbol was learned later, so no new
    pair can undercut remaining occurrences of the current best) makes
    them equal FOR LEARNED merge lists.  Property-check it: learn real
    merge lists from varied random corpora, then compare both encoders on
    adversarial words (heavy repetition, overlapping pairs)."""
    import random

    from jsons_to_schema_spark.operators.bpe import bpe_merges_pure, encode_word

    def encode_single_step(word, ranks):
        sym = list(word)
        while len(sym) >= 2:
            best = None  # (rank, i)
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            i = best[1]
            sym[i:i + 2] = [sym[i] + sym[i + 1]]
        return tuple(sym)

    rng = random.Random(42)
    alphabets = ["ab", "abc", "abcd", "aab"]
    for trial in range(40):
        alpha = alphabets[trial % len(alphabets)]
        words = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))):
                rng.randint(1, 9)
            for _ in range(30)
        }
        merges = bpe_merges_pure(words, num_merges=15, min_pair_count=1)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        probes = list(words) + [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 20)))
            for _ in range(50)
        ]
        for w in probes:
            assert encode_word(w, ranks) == encode_single_step(w, ranks), (
                w, merges,
            )
