"""Pinned-vocabulary subword tokenizer (r4, VERDICT item 5).

Word-level token counts (text.token_count) are the wrong unit for LLM
training budgets — packing 4096 "words" overshoots a 4096-token context by
~30-60%.  This module provides a deterministic greedy longest-prefix-match
subword tokenizer (WordPiece-style inference with single-character
fallback) over a PINNED vocabulary, so ``pack_sequences`` /
``chunk_documents`` / decontamination n-grams can budget in subword tokens.

Design constraints, in order:

1. **Deterministic + engine-portable.**  Greedy longest-prefix over a fixed
   vocab has no RNG and no training state; the DuckDB oracle reproduces it
   exactly with a recursive CTE over the same vocab
   (``subword_vocab_sql`` + ``SUBWORD_STEP_CTE``) — so the driver's
   correctness gate checks EXACT subword counts, not just row counts.
2. **No per-row Python.**  The kernel is an Arrow-batched ``pandas_udf``
   (same pattern as dedup.simhash64_kernel): one Python call per ~10k-row
   batch.  Inside the batch, per-WORD results are memoized process-wide
   (``lru_cache`` on the word) — natural-language corpora repeat words
   heavily (Zipf), so steady-state cost is a dict hit per word, not a
   char-level scan.
3. **Word-aligned.**  Words are ``text.tokens`` semantics (split on single
   space, drop empties); pieces never cross a word boundary — which keeps
   chunking at word granularity exact (chunk boundaries are word
   boundaries, budgets are subword counts).

The vocabulary is an embedded, versioned constant: ~190 high-frequency
English subwords/affixes (author-curated from public letter-frequency
knowledge) + printable-ASCII single characters.  Any character not in the
vocab consumes one fallback token (the ``<byte>`` convention).  Real
deployments would swap in their model's vocab file; every operator takes
the vocab through this module so that swap is one constant.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MAX_PIECE = 8

# Multi-character pieces: common English words, affixes, and bigrams.
# Order is irrelevant (matching is by longest prefix); content is pinned —
# changing it changes every persisted subword count downstream, so treat it
# like a schema version (bump _VOCAB_VERSION).
_VOCAB_VERSION = 1
_MULTI = (
    # frequent whole words
    "the and for that with this have from they were been said each which "
    "their will about would there what when your them then some time more "
    "these than into could other just also people over only year first "
    "because after through most where much before should those must while "
    # affixes / suffixes
    "ing tion ation ment ness able ible ally ful less est ers ied ies ily "
    "ify ise ize ous ive ant ent ism ist ity ure age ship hood ward wise "
    "pre pro con com dis mis non sub under inter trans super anti auto "
    # frequent bigrams/trigrams
    "th he in er an re on at en nd ti es or te of ed is it al ar st to nt "
    "ng se ha as ou io le ve co me de hi ri ro ic ne ea ra ce li ch ll be "
    "ma si om ur ca el ta la ns di fo ho pe ec pr no ct us ac ot il tr ly "
    "nc et ut ss so rs un lo wa ge ie wh ee wi em ad ol rt po we na ul ni "
    "ts mo ow pa im mi ai sh ir su id os iv ia am fi ci vi pl ig tu ev ld "
).split()
_SINGLES = tuple(chr(c) for c in range(33, 127))  # printable ASCII minus space
SUBWORD_VOCAB: tuple[str, ...] = tuple(dict.fromkeys(_MULTI)) + _SINGLES

_VOCAB_SET = frozenset(SUBWORD_VOCAB)
assert all(1 <= len(p) <= MAX_PIECE and " " not in p for p in SUBWORD_VOCAB)


@lru_cache(maxsize=1 << 20)
def split_word(word: str) -> tuple[str, ...]:
    """Greedy longest-prefix-match pieces of one word; characters outside
    the vocab consume one fallback token each.  Cached process-wide — the
    Zipf head of any corpus hits the cache, the long tail pays one scan."""
    pieces = []
    pos, n = 0, len(word)
    while pos < n:
        for ln in range(min(MAX_PIECE, n - pos), 0, -1):
            cand = word[pos : pos + ln]
            if cand in _VOCAB_SET:
                pieces.append(cand)
                pos += ln
                break
        else:  # single-char fallback (non-ASCII etc.): 1 token
            pieces.append(word[pos])
            pos += 1
    return tuple(pieces)


def _words(text: str) -> list[str]:
    # EXACTLY text.tokens semantics: split on single space, drop empties
    return [w for w in (text or "").split(" ") if w]


def subword_count_udf() -> Column:
    """pandas_udf: text column → total subword tokens (long)."""

    @pandas_udf("long")
    def _count(texts):
        return texts.map(
            lambda t: sum(len(split_word(w)) for w in _words(t))
        ).astype("int64")

    return _count


def word_subword_counts_udf() -> Column:
    """pandas_udf: text column → array<int> of per-WORD subword counts,
    aligned with text.tokens order — the column chunk_documents' subword
    mode runs its word-boundary prefix-sum over."""

    @pandas_udf("array<int>")
    def _counts(texts):
        return texts.map(lambda t: [len(split_word(w)) for w in _words(t)])

    return _counts


def subword_pieces_udf() -> Column:
    """pandas_udf: text column → array<string> of pieces flattened across
    words (for subword-level decontamination n-grams)."""

    @pandas_udf("array<string>")
    def _pieces(texts):
        return texts.map(
            lambda t: [p for w in _words(t) for p in split_word(w)]
        )

    return _pieces


def subword_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return subword_count_udf()(c)


# ---------------------------------------------------------------------------
# The DuckDB oracle's side of the contract
# ---------------------------------------------------------------------------

def subword_vocab_sql() -> str:
    """The pinned vocab as a SQL list literal (single quotes escaped)."""
    return ", ".join("'" + p.replace("'", "''") + "'" for p in SUBWORD_VOCAB)


# Recursive-CTE template reproducing split_word for a (key, w) word table
# named `words`: greedy longest prefix via a LEFT LATERAL pick of the
# longest vocab piece matching the remaining suffix; no match consumes one
# character (the fallback token).  Yields (key, w, n) subword counts in
# `wcounts`.  The caller prepends a `words` CTE and appends the final
# SELECT.
SUBWORD_STEP_CTE = """
    vocab(piece) AS (SELECT unnest([__VOCAB__])),
    step(key, w, rest, n) AS (
        SELECT key, w, w, 0 FROM words
        UNION ALL
        SELECT s.key, s.w, substring(s.rest, coalesce(length(m.piece), 1) + 1),
               s.n + 1
        FROM step s
        LEFT JOIN LATERAL (
            SELECT v.piece FROM vocab v
            WHERE starts_with(s.rest, v.piece)
            ORDER BY length(v.piece) DESC LIMIT 1
        ) m ON true
        WHERE s.rest <> ''
    ),
    wcounts AS (
        SELECT key, w, n FROM step WHERE rest = ''
    )
""".replace("__VOCAB__", "%s")


def subword_step_cte() -> str:
    """SUBWORD_STEP_CTE with the pinned vocab inlined."""
    return SUBWORD_STEP_CTE % subword_vocab_sql()
