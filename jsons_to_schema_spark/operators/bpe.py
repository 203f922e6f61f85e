"""Distributed BPE vocabulary learning + merge-rank subword encoding.

operators/subword.py tokenizes with a PINNED author-curated vocabulary;
real pipelines learn the vocabulary from the corpus.  This module learns a
byte-pair-encoding merge list the standard way (Sennrich et al. 2016:
start from characters, repeatedly merge the most frequent adjacent symbol
pair, frequency weighted by word count), with the Spark split that scales:

* the DISTRIBUTED pass is the word-frequency count — one tokenize +
  explode + groupBy(word) whose shuffle is bounded by the distinct-word
  vocabulary (Zipf-bounded, never corpus-sized), then a deterministic
  top-``max_words`` cut via TakeOrderedAndProject (count desc, word asc —
  never a global sort);
* merge LEARNING runs driver-side over that bounded table — the same
  bounded-sample-training pattern as the IVF index (similarity.py): pure
  integer counting, bit-deterministic, no RNG.  At 10^12 docs the word
  table is still ~10^6-10^8 rows and the top-K cut is the standard
  SentencePiece-style truncation.

Determinism contract (what makes the driver query pinnable): exact integer
pair counts; ties break to the lexicographically smallest pair; merge
application scans left-to-right non-overlapping.  Two runs over the same
corpus produce byte-identical merge lists at any partitioning.

Encoding uses the classic merge-RANK algorithm (GPT-2 style: repeatedly
apply the learned merge with the lowest rank), as an Arrow-batched
pandas_udf with per-word memoization — same no-per-row-Python budget as
subword.py.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import tokens


def bpe_merges_pure(
    word_freqs: "dict[str, int]",
    num_merges: int,
    min_pair_count: int = 2,
) -> "list[tuple[str, str]]":
    """Learn up to ``num_merges`` BPE merges from a word→count table.

    Pure Python, exact integer arithmetic, deterministic: the best pair is
    the highest-count one, ties to the lexicographically smallest.  Stops
    early when no pair reaches ``min_pair_count``.  Incremental pair-count
    maintenance (only words containing the merged pair are re-scanned), so
    cost is O(merges × affected-word symbols), not O(merges × corpus)."""
    words: "list[list[str]]" = []
    freqs: "list[int]" = []
    for w in sorted(word_freqs):
        if w:
            words.append(list(w))
            freqs.append(int(word_freqs[w]))

    pair_counts: Counter = Counter()
    pair_words: "defaultdict[tuple[str, str], set[int]]" = defaultdict(set)

    def _add_word_pairs(wi: int, sign: int) -> None:
        sym, f = words[wi], freqs[wi]
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] += sign * f
            if sign > 0:
                pair_words[p].add(wi)

    for wi in range(len(words)):
        _add_word_pairs(wi, +1)

    merges: "list[tuple[str, str]]" = []
    for _ in range(num_merges):
        best_count = 0
        for p, c in pair_counts.items():
            if c > best_count:
                best_count = c
        if best_count < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        for wi in sorted(pair_words[best]):
            sym = words[wi]
            if len(sym) < 2:
                continue
            _add_word_pairs(wi, -1)
            out, i = [], 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            _add_word_pairs(wi, +1)
        # drop exhausted entries so the scan stays proportional to LIVE pairs
        pair_counts = Counter({p: c for p, c in pair_counts.items() if c > 0})
        dead = [p for p in pair_words if p not in pair_counts]
        for p in dead:
            del pair_words[p]
    return merges


def word_frequencies(
    df: DataFrame,
    col: str,
    max_words: int = 50_000,
    lowercase: bool = True,
) -> DataFrame:
    """The distributed half: (word, n) for the top-``max_words`` most
    frequent words — groupBy bounded by the distinct-word vocabulary,
    deterministic cut via orderBy(count desc, word asc).limit (per-task
    partial top-k merged on the driver, never a global sort)."""
    c = F.col(col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(tokens(c)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
    )


def learn_bpe_vocab(
    df: DataFrame,
    col: str,
    num_merges: int,
    max_words: int = 50_000,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> "list[tuple[str, str]]":
    """End-to-end vocabulary learning: distributed word count → bounded
    driver-side merge learning.  Returns the rank-ordered merge list;
    feed it to ``bpe_count_udf`` / ``bpe_pieces_udf`` (or persist it — the
    merge list IS the tokenizer artifact)."""
    wf = {
        r["word"]: r["n"]
        for r in word_frequencies(df, col, max_words, lowercase).collect()
    }
    return bpe_merges_pure(wf, num_merges, min_pair_count)


def encode_word(word: str, ranks: "dict[tuple[str, str], int]") -> "tuple[str, ...]":
    """Classic merge-rank BPE encoding of one word: repeatedly apply the
    present pair with the LOWEST learned rank until none applies."""
    sym = list(word)
    while len(sym) >= 2:
        best_rank, best = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (sym[i], sym[i + 1])
        if best is None:
            break
        merged = best[0] + best[1]
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


from functools import lru_cache


@lru_cache(maxsize=64)
def _encoder_for(merges_t: "tuple[tuple[str, str], ...]"):
    """Per-process memoizing encoder for one merge list.  Module-level and
    keyed by the (hashable) merge tuple so the pandas_udf closures below
    carry only PLAIN DATA across the pickle boundary — an lru_cache-wrapped
    closure in the task closure fails to pickle; resolving the cache lazily
    inside the worker process sidesteps that and shares the word memo
    across batches of the same executor (Zipf head hits the cache)."""
    ranks = {p: i for i, p in enumerate(merges_t)}

    @lru_cache(maxsize=1 << 20)
    def enc(word: str) -> "tuple[str, ...]":
        return encode_word(word, ranks)

    return enc


def bpe_count_udf(merges: "list[tuple[str, str]]", lowercase: bool = True) -> Column:
    """pandas_udf factory: text column → total learned-BPE tokens (long).
    The merge list ships in the task closure as a plain tuple."""
    merges_t = tuple(tuple(p) for p in merges)

    @pandas_udf("long")
    def _count(texts):
        enc = _encoder_for(merges_t)

        def one(t):
            s = (t or "")
            if lowercase:
                s = s.lower()
            return sum(len(enc(w)) for w in s.split(" ") if w)

        return texts.map(one).astype("int64")

    return _count


def bpe_pieces_udf(merges: "list[tuple[str, str]]", lowercase: bool = True) -> Column:
    """pandas_udf factory: text column → array<string> of learned-BPE
    pieces flattened across words."""
    merges_t = tuple(tuple(p) for p in merges)

    @pandas_udf("array<string>")
    def _pieces(texts):
        enc = _encoder_for(merges_t)

        def one(t):
            s = (t or "")
            if lowercase:
                s = s.lower()
            return [p for w in s.split(" ") if w for p in enc(w)]

        return texts.map(one)

    return _pieces
