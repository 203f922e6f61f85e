"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (whole-stage
codegen, no Python).  Every operator here is oracle-checkable: the same
semantics are expressible in ANSI SQL (see queries.py ORACLES).

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword / digit ratios), language ID (stopword-hit
heuristic), document fingerprinting (normalized-text digest + rolling-window
shingle fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal stopword inventories for the language-ID heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "por"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "von"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "une"],
    "it": ["il", "la", "di", "che", "e", "per", "non", "una"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokens (empty strings filtered — ''.split semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex (JVM regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def quality_features(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per-document quality scores — one narrow projection, no shuffle."""
    c = F.col(col)
    n_chars = F.length(c)
    toks = token_count(col)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_text"),
        toks.alias("n_tokens"),
        bpe_token_count(col).alias("n_bpe_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(upper / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
        (toks >= 5).cast("boolean").alias("length_ok"),
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Stopword-hit count per language over the token array (set-semantics:
    each matching token counts once — array_intersect)."""
    toks = tokens(col)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """n-gram/stopword heuristic language ID.  Deterministic tie-break:
    highest score wins, ties resolve alphabetically; all-zero → 'und'."""
    scores = lang_scores(col)
    pairs = [
        F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        for lang, score in sorted(scores.items())
    ]
    best = F.array_max(F.array(*pairs))  # max by (score, lang DESC)... see note
    # array_max on struct compares field-by-field: score first, then lang —
    # ties pick the LAST language alphabetically; pin that and mirror in SQL.
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].cast("int").alias("lang_score"),
    )


def fingerprint(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) + a rolling content signature = md5 of the sorted set of
    word 3-gram shingles (order-insensitive near-dup key)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))
    sh = shingles(col, 3)
    rolling = F.md5(F.concat_ws("\x00", F.array_sort(F.array_distinct(sh))))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_exact"),
        rolling.alias("fp_shingle"),
    )


def shingles(col: str | Column, k: int = 3) -> Column:
    """Word k-gram shingle array (empty when fewer than k tokens).

    Built entirely from higher-order array functions — transform over a
    sequence of start positions, concat_ws of the k-token window.
    """
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
