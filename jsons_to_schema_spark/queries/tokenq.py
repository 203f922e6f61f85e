"""Auto-split from the former queries.py monolith (scripts/split_queries.py, r5); see queries/__init__.py for the registry contract."""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, dedup, drift, joins, multimodal, resolve, sample, similarity, stats, temporal, text, validate
from ..operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
    infer_from_struct,
    infer_grouped,
)
from ..sources.jsonl import export_table_jsonl, infer_jsonl, read_jsonl, with_json_validity
from ..sources.spans import ensure_corpus
from ..sources.tables import load_media_catalog, load_spans, load_table
from ._registry import ORACLES, query


# ===========================================================================
# Text analysis (oracled)
# ===========================================================================

@query(
    "token_count_documents",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


@query(
    "top_token_documents",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
    agg AS (SELECT doc_id, max({'c': c, 't': t}) AS b, sum(c) AS n
            FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           b.t AS top_token,
           cast(b.c AS bigint) AS top_token_count,
           round(b.c / n, 6) AS top_token_frac
    FROM agg
    """,
)
def top_token_documents(spark, sf_dir) -> DataFrame:
    """Most-frequent-token share per document (top-n-gram repetition
    signal), computed the distributed way: explode → two-stage hash
    aggregate with map-side combine (operators/text.py:top_token_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.top_token_stats(docs, "text", "doc_id")


@query(
    "pack_sequences_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source AS shard,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           shard || '#' || CAST(CAST(floor(s / 256) AS BIGINT) AS VARCHAR)
             AS seq_id,
           s % 256 AS seq_offset
    FROM c
    """,
)
def pack_sequences_documents(spark, sf_dir) -> DataFrame:
    """Training-sequence packing (concat-and-cut at a 256-token budget,
    packed per source shard — never a global window; pack.py scale notes)."""
    from ..operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    return out.select(
        F.col("id").alias("doc_id"), "shard", "n_tokens", "seq_id", "seq_offset"
    )


@query(
    "packing_stats_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source AS shard,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    ), p AS (
      SELECT shard, n_tokens,
             shard || '#' || CAST(CAST(floor(s / 256) AS BIGINT) AS VARCHAR)
               AS seq_id
      FROM c
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(CAST(sum(n_tokens) AS BIGINT) / 256) AS BIGINT)
             AS n_sequences,
           count(DISTINCT seq_id) AS n_doc_start_sequences,
           round(CAST(sum(n_tokens) AS BIGINT)
                 / (ceil(CAST(sum(n_tokens) AS BIGINT) / 256) * 256), 6)
             AS fill_ratio
    FROM p GROUP BY shard
    """,
)
def packing_stats_documents(spark, sf_dir) -> DataFrame:
    """Per-shard packing report over the packed documents (pack.packing_
    stats): exact sequence count ceil(total/budget), doc-start coverage,
    final-sequence fill ratio — all integer-derived, exactly SQL-oracled."""
    from ..operators import pack

    docs = load_table(spark, sf_dir, "documents")
    packed = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    return pack.packing_stats(packed, budget=256)


@query(
    "chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), s0 AS (
      SELECT doc_id, tk, unnest(range(0, len(tk), 12)) AS cs
      FROM t WHERE len(tk) > 0
    ), s AS (
      SELECT doc_id, tk, cs FROM s0 WHERE cs = 0 OR cs + 4 < len(tk)
    )
    SELECT doc_id AS id, CAST(cs AS BIGINT) AS chunk_start,
           CAST(len(tk[cs + 1 : cs + 16]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[cs + 1 : cs + 16], ' ') AS chunk_text
    FROM s
    """,
)
def chunk_documents(spark, sf_dir) -> DataFrame:
    """Token-budget document chunking with overlap (pack.chunk_documents:
    16-token chunks, 4-token overlap → stride 12) — the upstream complement
    of sequence packing; row-local JVM fan-out, exactly SQL-oracled."""
    from ..operators import pack

    docs = load_table(spark, sf_dir, "documents")
    return pack.chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=4)


# ===========================================================================
# Round-4 additions: pinned-vocab subword tokenization (VERDICT item 5) —
# budgets in LLM tokens, each oracled EXACTLY by a recursive-CTE DuckDB
# reproduction of the greedy longest-prefix tokenizer.
# ===========================================================================

def _subword_wcounts_prefix() -> str:
    """Shared oracle prelude: per-document word list + per-distinct-word
    subword counts via the pinned-vocab recursive CTE."""
    from ..operators.subword import subword_step_cte

    return f"""
    WITH RECURSIVE
    wlist AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    words(key, w) AS (SELECT DISTINCT 0 AS key, w FROM wlist),
    {subword_step_cte()}
    """


@query(
    "subword_token_count_documents",
    oracle=None,  # resolved below — needs the vocab inlined
)
def subword_token_count_documents(spark, sf_dir) -> DataFrame:
    """Per-document PINNED-VOCAB subword token counts (operators/subword.py
    — greedy longest-prefix WordPiece-style inference, Arrow-batched
    pandas_udf kernel with process-wide word memoization).  The oracle
    reproduces the tokenizer EXACTLY in SQL: a recursive CTE that greedily
    consumes the longest matching vocab piece (single-char fallback) over
    the same pinned vocabulary — so the driver checks exact LLM-token
    counts, not word counts."""
    from ..operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", subword_count(F.col("text")).alias("n_subwords")
    )


ORACLES["subword_token_count_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(dc.ns, 0) AS BIGINT) AS n_subwords
    FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    """
    ).split()
)


@query(
    "pack_sequences_subword_documents",
    oracle=None,
)
def pack_sequences_subword_documents(spark, sf_dir) -> DataFrame:
    """pack_sequences with the budget in SUBWORD tokens (tokenizer=
    "subword", 320-token sequences, per-source shards) — training budgets
    that mean LLM tokens.  Same window arithmetic as the word-mode packer;
    the oracle recomputes every count through the recursive-CTE tokenizer."""
    from ..operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.pack_sequences(
        docs, "doc_id", "source", budget=320, tokenizer="subword"
    )
    return out.select(
        F.col("id").alias("doc_id"), "shard", "n_tokens", "seq_id", "seq_offset"
    )


ORACLES["pack_sequences_subword_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    ), t AS (
      SELECT d.doc_id, d.source AS shard,
             CAST(coalesce(dc.ns, 0) + 1 AS BIGINT) AS n_tokens
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           shard || '#' || CAST(CAST(floor(s / 320) AS BIGINT) AS VARCHAR)
             AS seq_id,
           s % 320 AS seq_offset
    FROM c
    """
    ).split()
)


@query(
    "chunk_subword_documents",
    oracle=None,
)
def chunk_subword_documents(spark, sf_dir) -> DataFrame:
    """chunk_documents_subword: 64-SUBWORD-token chunks cut at word
    boundaries (a straddling word lands in the chunk its first subword
    falls in).  The Spark side is row-local array arithmetic over ONE
    kernel call per document (no explode-then-window, no shuffle); the
    oracle rebuilds chunk assignment from the recursive-CTE per-word
    counts with a window prefix-sum."""
    from ..operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.chunk_documents_subword(docs, "doc_id", "text", chunk_tokens=64)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_start", "n_chunk_tokens", "chunk_text"
    )


ORACLES["chunk_subword_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), e AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM toks
    ), wp AS (
      SELECT e.doc_id, e.pos, e.t[e.pos] AS w, c.n
      FROM e JOIN wcounts c ON e.t[e.pos] = c.w
    ), cum AS (
      SELECT doc_id, pos, w, n,
             CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY pos) - n
                  AS BIGINT) AS s
      FROM wp
    )
    SELECT doc_id,
           CAST(min(s) AS BIGINT) AS chunk_start,
           CAST(sum(n) AS BIGINT) AS n_chunk_tokens,
           string_agg(w, ' ' ORDER BY pos) AS chunk_text
    FROM cum GROUP BY doc_id, floor(s / 64)
    """
    ).split()
)


@query("bpe_vocab_documents")  # pinned-snapshot oracle (oracle_constants.json)
def bpe_vocab_documents(spark, sf_dir) -> DataFrame:
    """Distributed BPE vocabulary learning (operators/bpe.py): the
    rank-ordered merge list trained on the documents corpus — the
    tokenizer artifact a real pipeline persists.  The distributed half is
    the Zipf-bounded word count (groupBy word + TakeOrderedAndProject
    top-K); merge learning folds the bounded table driver-side with exact
    integer counts and lexicographic tie-breaks, so the output is
    bit-deterministic at any partitioning (pinned oracle; semantic
    correctness is established by the hand-computed Sennrich-example and
    invariance tests in tests/test_bpe.py)."""
    from jsons_to_schema_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe_vocab(docs, "text", num_merges=40, max_words=10_000)
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, piece string"
    )


@query(
    "tokenizer_fertility_documents",
    oracle=None,  # resolved below — needs the pinned vocab inlined
)
def tokenizer_fertility_documents(spark, sf_dir) -> DataFrame:
    """Tokenizer FERTILITY by language (chars per subword token) — the
    multilingual tokenizer-quality metric: a vocab trained on English
    spends ~3-5 chars/token there but shatters CJK into near-char
    pieces; per-language fertility is how a pipeline SEES that before
    training pays for it.  Composition of two oracled components: the
    pinned-vocab subword counts (exact recursive-CTE-replayable kernel)
    rolled up with exact char sums per documents.lang; fertility =
    Σchars/Σtokens as one round-6 division of exact longs.  All
    per-lang rows value-checked."""
    from ..operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    per = docs.select(
        "lang",
        F.length("text").cast("long").alias("_chars"),
        subword_count(F.col("text")).cast("long").alias("_toks"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_toks").cast("long").alias("n_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_chars",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("fertility"),
    )


ORACLES["tokenizer_fertility_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
           CAST(sum(coalesce(dc.ns, 0)) AS BIGINT) AS n_tokens,
           CASE WHEN sum(coalesce(dc.ns, 0)) > 0
                THEN round(CAST(sum(length(d.text)) AS DOUBLE)
                           / CAST(sum(coalesce(dc.ns, 0)) AS DOUBLE), 6)
           END AS fertility
    FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    WHERE d.lang IS NOT NULL AND d.text IS NOT NULL
    GROUP BY d.lang
    """
    ).split()
)


@query(
    "context_fit_documents",
    oracle=None,  # resolved below — needs the pinned vocab inlined
)
def context_fit_documents(spark, sf_dir) -> DataFrame:
    """Context-window fit report — per candidate window {64, 128, 256}
    subword tokens: the share of DOCUMENTS that fit whole and the share
    of TOKEN MASS that survives truncation (min(tokens, T) summed) —
    the two numbers a context-length decision actually weighs (docs-fit
    flatters small windows; mass-survives is what training sees).
    Composition of the pinned-vocab subword counts with exact long
    arithmetic; every row value-checked via the shared recursive-CTE
    oracle prelude."""
    from ..operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    per = docs.select(subword_count(F.col("text")).cast("long").alias("_t"))
    per = per.localCheckpoint(eager=False)  # feeds all three window rows
    spine = docs.sparkSession.createDataFrame(
        [(64,), (128,), (256,)], "window long"
    )
    joined = spine.crossJoin(per)
    return (
        joined.groupBy("window")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("_t") <= F.col("window"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_fit"),
            F.sum("_t").cast("long").alias("n_tokens"),
            F.sum(F.least(F.col("_t"), F.col("window")))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .select(
            "window",
            "n_docs",
            "n_docs_fit",
            F.round(
                F.col("n_docs_fit").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("docs_fit_share"),
            "n_tokens",
            "n_tokens_kept",
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("tokens_kept_share"),
        )
    )


ORACLES["context_fit_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    ),
    per AS (
      SELECT d.doc_id, CAST(coalesce(dc.ns, 0) AS BIGINT) AS t
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
      WHERE d.text IS NOT NULL
    ),
    w AS (SELECT unnest([64, 128, 256]) AS win)
    SELECT CAST(win AS BIGINT) AS "window",
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN t <= win THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_fit,
           round(CAST(sum(CASE WHEN t <= win THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS docs_fit_share,
           CAST(sum(t) AS BIGINT) AS n_tokens,
           CAST(sum(least(t, win)) AS BIGINT) AS n_tokens_kept,
           round(CAST(sum(least(t, win)) AS DOUBLE)
                 / CAST(sum(t) AS DOUBLE), 6) AS tokens_kept_share
    FROM per CROSS JOIN w
    GROUP BY win
    """
    ).split()
)


# ---------------------------------------------------------------------------
# r5 (r4 verdict item 6): the LEARNED BPE vocabulary driving a budget path.
# bpe.py learned real merges since r4 but nothing consumed them; this wires
# learn_bpe_vocab -> pack_sequences(tokenizer="bpe") end-to-end and oracles
# the result with the same recursive-CTE discipline as the pinned-vocab
# subword family — except the CTE applies merges by RANK (classic BPE
# inference), not greedy longest-prefix.
#
# The merge list below is the sf0.01 learning output (num_merges=40,
# max_words=10000, lowercase), pinned so the oracle SQL is static; the
# SPARK side learns live from sf_dir, so any drift in the distributed
# word-count or the merge fold breaks the driver hash (tests/test_bpe.py
# asserts pinned == live at sf0.01 as the faster CI tripwire).  Pinning is
# sf0.01-scoped — the driver's and parity's correctness SF, same
# convention as the schema constants in queries/schema.py.
# ---------------------------------------------------------------------------

PINNED_BPE_MERGES_SF001: tuple = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"),
)


def _bpe_merges_values_sql() -> str:
    return ", ".join(
        f"({i}, '{l}', '{r}')" for i, (l, r) in enumerate(PINNED_BPE_MERGES_SF001)
    )


@query(
    "pack_sequences_bpe_documents",
    oracle=None,  # resolved below — needs the pinned merge list inlined
)
def pack_sequences_bpe_documents(spark, sf_dir) -> DataFrame:
    """pack_sequences with the budget in LEARNED-BPE tokens: learn the
    merge list from THIS corpus (bpe.learn_bpe_vocab — Zipf-bounded
    distributed word count + deterministic driver fold), then pack 320-
    token sequences per source shard with bpe_count_udf as the budget
    meter.  End-to-end this is the real tokenizer-artifact path a training
    pipeline runs: vocabulary from the data, budgets in that vocabulary's
    tokens.  The oracle re-derives every per-document count in DuckDB by
    applying the pinned (sf0.01) merge list rank-by-rank in a recursive
    CTE — merging one leftmost lowest-rank pair per step, which provably
    equals the merge-all-occurrences classic encoder because any pair
    containing a just-created symbol was learned later and so ranks
    strictly higher."""
    from ..operators import bpe, pack

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe_vocab(docs, "text", num_merges=40, max_words=10_000)
    out = pack.pack_sequences(
        docs, "doc_id", "source", budget=320, tokenizer="bpe", bpe_merges=merges
    )
    return out.select(
        F.col("id").alias("doc_id"), "shard", "n_tokens", "seq_id", "seq_offset"
    )


ORACLES["pack_sequences_bpe_documents"] = " ".join(
    f"""
    WITH RECURSIVE
    merges(rank, l, r) AS (
      SELECT * FROM (VALUES {_bpe_merges_values_sql()}) t(rank, l, r)
    ),
    wlist AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS w
      FROM documents
    ),
    words(w) AS (SELECT DISTINCT w FROM wlist),
    enc(w, syms, it) AS (
      SELECT w, string_split(w, ''), 0 FROM words
      UNION ALL
      SELECT e.w,
             list_concat(
               list_concat(e.syms[1:b.i-1], [e.syms[b.i] || e.syms[b.i+1]]),
               e.syms[b.i+2:len(e.syms)]),
             e.it + 1
      FROM enc e
      JOIN LATERAL (
        SELECT t.i, m.rank
        FROM (SELECT unnest(range(1, len(e.syms))) AS i) t(i)
        JOIN merges m ON m.l = e.syms[t.i] AND m.r = e.syms[t.i+1]
        ORDER BY m.rank, t.i LIMIT 1
      ) b ON true
    ),
    wcounts AS (
      SELECT w, CAST(len(syms) AS BIGINT) AS n FROM enc
      QUALIFY row_number() OVER (PARTITION BY w ORDER BY it DESC) = 1
    ),
    dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    ),
    t AS (
      SELECT d.doc_id, d.source AS shard,
             CAST(coalesce(dc.ns, 0) + 1 AS BIGINT) AS n_tokens
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           shard || '#' || CAST(CAST(floor(s / 320) AS BIGINT) AS VARCHAR)
             AS seq_id,
           s % 320 AS seq_offset
    FROM c
    """.split()
)
