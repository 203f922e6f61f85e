"""Pinned-vocab subword tokenizer (r4, VERDICT item 5): kernel semantics,
chunker boundary conventions, and subword-mode decontamination."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.subword import (
    MAX_PIECE,
    SUBWORD_VOCAB,
    split_word,
    subword_count,
)


def test_vocab_is_pinned_and_wellformed():
    assert len(SUBWORD_VOCAB) == len(set(SUBWORD_VOCAB))
    assert all(1 <= len(p) <= MAX_PIECE and " " not in p for p in SUBWORD_VOCAB)
    # single-char ASCII fallback layer present
    assert all(chr(c) in SUBWORD_VOCAB for c in range(33, 127))


def test_split_word_greedy_longest_prefix():
    assert split_word("the") == ("the",)
    # greedy: 'ing' wins over 'in'+'g' at the suffix
    assert split_word("going")[-1] == "ing"
    # non-ASCII falls back to one token per character
    assert split_word("über")[0] == "ü"
    assert split_word("") == ()
    # concatenation invariant: pieces rebuild the word exactly
    for w in ["internationalization", "hello,world", "Zürich", "x" * 30]:
        assert "".join(split_word(w)) == w


def test_subword_count_column_matches_kernel(spark):
    rows = [
        (1, "the internationalization of preprocessing"),
        (2, "a  b"),  # double space: empty token dropped
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", subword_count("text").alias("n")
    ).collect()}
    def py(t):
        return sum(len(split_word(w)) for w in (t or "").split(" ") if w)
    assert got == {i: py(t) for i, t in rows}


def test_chunk_documents_subword_boundaries(spark):
    from jsons_to_schema_spark.operators.pack import chunk_documents_subword

    df = spark.createDataFrame(
        [(1, "the internationalization of preprocessing pipelines")],
        "doc_id long, text string",
    )
    out = sorted(
        chunk_documents_subword(df, "doc_id", "text", 5).collect(),
        key=lambda r: r.chunk_start,
    )
    # per-word counts: the=1 internationalization=7 of=1 preprocessing=5
    # pipelines=6; prefix 0,1,8,9,14 → cuts at words 0,2,4
    assert [(r.chunk_start, r.n_chunk_tokens, r.chunk_text) for r in out] == [
        (0, 8, "the internationalization"),
        (8, 6, "of preprocessing"),
        (14, 6, "pipelines"),
    ]
    # chunk texts concatenate back to the original document
    assert " ".join(r.chunk_text for r in out) == df.first().text


def test_pack_sequences_subword_budget(spark):
    from jsons_to_schema_spark.operators.pack import pack_sequences

    df = spark.createDataFrame(
        [(1, "s", "the internationalization"), (2, "s", "of preprocessing")],
        "doc_id long, src string, text string",
    )
    out = {r.id: r for r in pack_sequences(
        df, "doc_id", "src", budget=9, tokenizer="subword"
    ).collect()}
    assert out[1].n_tokens == 8 + 1 and out[1].seq_id == "s#0"
    # doc 2 starts at offset 9 → second sequence under the 9-token budget
    assert out[2].n_tokens == 6 + 1 and out[2].seq_id == "s#1"
    with pytest.raises(ValueError, match="tokenizer"):
        pack_sequences(df, "doc_id", "src", budget=9, tokenizer="bpe")


def test_decontam_subword_mode(spark):
    from jsons_to_schema_spark.operators.decontam import (
        contamination_hits,
        decontaminate,
        eval_ngrams_from_docs,
    )

    evald = spark.createDataFrame(
        [(100, "the internationalization of preprocessing pipelines")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "report on the internationalization of preprocessing pipelines today"),
            (2, "completely unrelated words about spark shuffles and parquet row groups"),
        ],
        "doc_id long, text string",
    )
    ng = eval_ngrams_from_docs(evald, "text", n=5, tokenizer="subword")
    hits = contamination_hits(docs, ng, "text", "doc_id", n=5, tokenizer="subword")
    assert {r.id for r in hits.collect()} == {1}
    clean = decontaminate(docs, ng, "text", "doc_id", n=5, tokenizer="subword")
    assert {r.doc_id for r in clean.collect()} == {2}
    # mismatched-mode guard
    with pytest.raises(ValueError, match="tokenizer"):
        eval_ngrams_from_docs(evald, "text", tokenizer="wordpiece")
