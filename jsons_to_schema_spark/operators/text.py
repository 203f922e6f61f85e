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
    base = df.select(
        F.col(id_col),
        F.length(c).alias("n_chars_text"),
        token_count(col).cast("long").alias("n_tokens"),
        bpe_token_count(col).cast("long").alias("n_bpe_tokens"),
        F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).alias("_punct"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).alias("_digits"),
        F.length(F.regexp_replace(c, r"[^A-Z]", "")).alias("_upper"),
    )
    denom = F.greatest(F.col("n_chars_text"), F.lit(1))
    return base.select(
        F.col(id_col),
        "n_chars_text",
        "n_tokens",
        "n_bpe_tokens",
        F.round(F.col("_punct") / denom, 6).alias("punct_ratio"),
        F.round(F.col("_digits") / denom, 6).alias("digit_ratio"),
        F.round(F.col("_upper") / denom, 6).alias("upper_ratio"),
        (F.col("n_tokens") >= 5).cast("boolean").alias("length_ok"),
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
    array_max on (score, lang) structs — ties pick the LAST language
    alphabetically (struct comparison is field-by-field); all-zero → 'und'.

    Layered selects so the tokenizer runs once per row and the best-struct
    aggregate once, instead of once per language / per output column."""
    toked = df.select(F.col(id_col), tokens(col).alias("_t"))
    pairs = [
        F.struct(
            F.size(
                F.array_intersect("_t", F.array(*[F.lit(w) for w in words]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = toked.select(F.col(id_col), F.array_max(F.array(*pairs)).alias("_best"))
    return scored.select(
        F.col(id_col),
        F.when(F.col("_best.score") > 0, F.col("_best.lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        F.col("_best.score").cast("int").alias("lang_score"),
    )


def fp_exact_key(col: str | Column) -> Column:
    """THE exact-duplicate key: md5 of whitespace-normalized lowercase
    text.  One definition — dedup.dedup_exact, dedup.exact_duplicate_
    clusters, and fingerprint all use this (r3 review: three verbatim
    copies could silently desynchronize dup groups across operators)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def fingerprint(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) + a rolling content signature = md5 of the sorted set of
    word 3-gram shingles (order-insensitive near-dup key)."""
    base = df.select(F.col(id_col), fp_exact_key(col).alias("fp_exact"), tokens(col).alias("_t"))
    sh = shingles_from_tokens(F.col("_t"), 3)
    return base.select(
        F.col(id_col),
        "fp_exact",
        F.md5(F.concat_ws("\x00", F.array_sort(F.array_distinct(sh)))).alias(
            "fp_shingle"
        ),
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingle array from a token-array column (empty when fewer
    than k tokens).

    Built from k aligned slices zipped with concat — the token array is
    referenced k+2 times but NEVER inside a per-element lambda.  (The naive
    form — transform over positions with element_at(toks, i+j) — re-embeds
    the tokenizer inside the lambda, re-evaluating it per shingle position:
    measured ~100x slower on real documents.)  Pass an attribute column
    (layered select) so the k+2 references are cheap reads.
    """
    n = F.size(toks)
    m = n - (k - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(n >= k, acc).otherwise(F.array().cast("array<string>"))


def shingles(col: str | Column, k: int = 3) -> Column:
    """Word k-gram shingles of a raw text column.  NOTE: tokenizes inline
    (k+2 split/filter evaluations per row) — for hot paths, materialize
    ``tokens(col)`` in a select first and use :func:`shingles_from_tokens`.
    """
    return shingles_from_tokens(tokens(col), k)


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher/RefinedWeb-style quality signals)
# ---------------------------------------------------------------------------

def lines_array(col: str | Column) -> Column:
    """Non-empty lines of a text column (split on newline, empties dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\n"), lambda x: x != "")


def dedup_consecutive(arr: Column) -> Column:
    """Drop consecutive duplicate elements from an array column.

    keep[i] ⇔ i == 0 or arr[i] != arr[i-1].  The (element, index) filter
    lambda reads the PREVIOUS element via 1-based element_at(arr, i) — pass an
    attribute column (layered select), not an expression, so the k references
    inside the lambda are cheap reads rather than re-evaluations (same
    pitfall as shingles_from_tokens).  The greatest(i, 1) clamp keeps the
    i==0 branch from ever building element_at(arr, 0), which is an ANSI-mode
    error — correctness does not depend on Or short-circuiting."""
    return F.filter(
        arr,
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(arr, F.greatest(i, F.lit(1)))),
    )


def _line_char_sum(arr: Column) -> Column:
    return F.coalesce(
        F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)),
        F.lit(0).cast("long"),
    )


def dup_line_char_frac(lines: Column) -> Column:
    """Fraction of line characters inside repeated line occurrences —
    the Gopher duplicate-line-character-fraction signal, as a reusable
    Column over a materialized lines array (see lines_array)."""
    return (_line_char_sum(lines) - _line_char_sum(F.array_distinct(lines))) / (
        F.greatest(_line_char_sum(lines), F.lit(1))
    )


def repetition_features(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per-document repetition signals for corpus curation — one narrow
    codegen projection, no shuffle, no Python:

    - n_lines / n_dup_lines: non-empty lines and how many are repeats of an
      earlier line (multiset minus set).
    - dup_line_char_frac: fraction of line characters inside repeated line
      OCCURRENCES — the Gopher "duplicate line character fraction" signal.
    - fp_line_dedup: md5 of the text rebuilt with CONSECUTIVE duplicate
      lines collapsed (the boilerplate-stripping transform, fingerprinted so
      verdict rows stay KB-scale).
    - n_consecutive_removed: lines removed by that collapse.

    All semantics are exactly expressible in DuckDB list functions — see the
    repetition_documents oracle in queries.py.
    """
    base = df.select(F.col(id_col), lines_array(col).alias("_l"))
    # layer the collapse as its own attribute: referencing the filter HOF
    # from two output columns re-evaluates the interpreted O(lines) lambda
    # per column (review r3) — CollapseProject keeps the layer because the
    # expression is non-cheap, so the collapse runs once per row.
    layered = base.select(
        F.col(id_col), F.col("_l"), dedup_consecutive(F.col("_l")).alias("_kept")
    )
    return layered.select(
        F.col(id_col),
        F.size("_l").cast("long").alias("n_lines"),
        (F.size("_l") - F.size(F.array_distinct("_l"))).cast("long").alias(
            "n_dup_lines"
        ),
        F.round(dup_line_char_frac(F.col("_l")), 6).alias("dup_line_char_frac"),
        F.md5(F.concat_ws("\n", F.col("_kept"))).alias("fp_line_dedup"),
        (F.size("_l") - F.size("_kept")).cast("long").alias(
            "n_consecutive_removed"
        ),
    )


def top_token_stats(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Most-frequent-token share per document — see top_ngram_stats (n=1)."""
    return top_ngram_stats(df, col, id_col, n=1)


def top_ngram_stats(df: DataFrame, col: str, id_col: str, n: int = 1) -> DataFrame:
    """Most-frequent word-n-gram share per document — the Gopher "fraction
    of tokens in the most common n-gram" repetition signal, computed the
    DISTRIBUTED way: explode → two-stage hash aggregate (map-side partial
    combine on (doc, gram)), never an O(tokens²) per-row lambda.  Ties break
    to the lexicographically greatest gram via max(struct(count, gram)) —
    deterministic in both engines.  Documents with fewer than n tokens are
    absent from the output (same in the oracle).  Output columns keep the
    top_token_* names for n=1 compatibility."""
    if n == 1:
        grams = df.select(F.col(id_col), F.explode(tokens(col)).alias("_t"))
    else:
        grams = df.select(F.col(id_col), tokens(col).alias("_tk")).select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("_tk"), n)).alias("_t"),
        )
    cnt = grams.groupBy(id_col, "_t").agg(F.count("*").alias("_c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("_c"), F.col("_t"))).alias("_b"),
            F.sum("_c").alias("_n"),
        )
        .select(
            F.col(id_col),
            F.col("_b._t").alias("top_token"),
            F.col("_b._c").cast("long").alias("top_token_count"),
            F.round(F.col("_b._c") / F.col("_n"), 6).alias("top_token_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# Patterns deliberately restricted to syntax valid AND equivalent in both
# Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}
# Redaction order matters: emails first (their local parts may contain
# digit runs), then IPs, then phone shapes.
PII_ORDER = ("email", "ipv4", "phone")


def pii_counts(col: str | Column) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(col: str | Column) -> Column:
    """Replace every PII match with a <KIND> tag (regexp_replace is
    replace-all in Spark; the DuckDB oracle needs the explicit 'g' flag)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def pii_scrub(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Counts per PII kind + fingerprint of the scrubbed text (KB-scale
    output rows; the full redacted text is one select away for a sink)."""
    counts = pii_counts(col)
    return df.select(
        F.col(id_col),
        *[counts[k].cast("long").alias(f"n_{k}") for k in PII_ORDER],
        F.md5(redact_pii(col)).alias("fp_redacted"),
    )


def corpus_line_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    min_doc_freq: int = 5,
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-LEVEL line dedup (RefinedWeb/CCNet-style boilerplate removal):
    delete every line that occurs in ≥ min_doc_freq DISTINCT documents,
    keeping all other lines in their original order.  Returns one row per
    input document: (id, n_lines, n_removed_lines, text_dedup).

    Lines shorter than min_line_chars are never candidates (empty lines and
    short connectors occur everywhere and are structure, not boilerplate).

    Distribution shape, 100 TB-safe:
    - posexplode → count_distinct per 8-byte xxhash64 line key (partial+
      final aggregate; the shuffle carries hashes, not line bytes);
    - the hot-line table only contains lines ABOVE the frequency cutoff —
      orders of magnitude smaller than the corpus — and joins back as a
      LEFT join carrying a hot FLAG (broadcast when small, AQE otherwise):
      flagging instead of anti-joining lets ONE aggregate produce both the
      total line count and the kept-line rebuild, so the corpus explodes
      exactly twice (freq pass + rebuild pass — the honest minimum; the
      anti-join form needed a third pass for totals, measured in the r4
      double-scan sweep);
    - ineligible lines get a NULL key, and a NULL key never joins, so
      eligibility needs no second pass;
    - per-document rebuild is sort_array(collect_list(struct(idx, line))) —
      bounded by single-document size, never corpus size; removed lines
      enter the collect as NULL structs, which collect_list drops.

    A 64-bit hash collision could delete a rare line that collides with a
    hot one (probability ~n_hot·n_lines/2^64); the doc-freq count itself is
    also per-hash.  The DuckDB oracle groups on the raw line string — it
    agrees exactly unless a collision occurs, so the oracle doubles as a
    collision canary at test scale.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), "\n")).alias("_idx", "_line"),
    ).withColumn(
        "_key",
        F.when(
            F.length("_line") >= min_line_chars, F.xxhash64(F.col("_line"))
        ),
    )
    hot = (
        lines.filter(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_key", F.lit(True).alias("_hot"))
    )
    flagged = lines.join(hot, "_key", "left")
    keep = F.col("_hot").isNull()
    rebuilt = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(keep.cast("long")).alias("_n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("_idx", "_line")))
                ),
                lambda s: s["_line"],
            ),
        ).alias("text_dedup"),
    )
    return rebuilt.select(
        F.col(id_col),
        "n_lines",
        (F.col("n_lines") - F.col("_n_kept")).cast("long").alias(
            "n_removed_lines"
        ),
        "text_dedup",
    )


# ---------------------------------------------------------------------------
# Unicode normalization (dedup-key canonicalization)
# ---------------------------------------------------------------------------

def normalize_text_kernel(lower: bool = True, strip_accents: bool = True):
    """Arrow-batched unicode canonicalization: lower → NFC → accent strip
    (NFD, drop combining marks Mn, recompose NFC) — the composition DuckDB's
    ``strip_accents(nfc_normalize(lower(s)))`` computes, which is what makes
    the operator exactly cross-engine-oracle-able.  Canonicalizing BEFORE
    hashing/shingling is what keeps 'École', 'école' and the decomposed
    'e\\u0301cole' in one dedup bucket.

    This is a Python (Arrow) stage — unicodedata has no JVM builtin — so it
    is the documented slow path: run it once to materialize a normalized
    column, not inline inside hot per-query expressions; ASCII-dominated
    corpora can gate it on ``rlike('[^\\x00-\\x7f]')`` to keep the Python
    cost proportional to the non-ASCII fraction."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def one(s):
        if s is None:
            return None
        t = s.lower() if lower else s
        t = unicodedata.normalize("NFC", t)
        if strip_accents:
            t = unicodedata.normalize(
                "NFC",
                "".join(
                    c
                    for c in unicodedata.normalize("NFD", t)
                    if unicodedata.category(c) != "Mn"
                ),
            )
        return t

    @pandas_udf("string", PandasUDFType.SCALAR_ITER)
    def kern(it):
        for s in it:
            yield pd.Series([one(v) for v in s], dtype=object)

    return kern


def normalize_text(
    df: DataFrame, col: str, id_col: str, lower: bool = True,
    strip_accents: bool = True,
) -> DataFrame:
    """(id, norm_text) — canonicalized text for dedup keys / shingles."""
    return df.select(
        F.col(id_col).alias("id"),
        normalize_text_kernel(lower, strip_accents)(F.col(col)).alias("norm_text"),
    )


# ---------------------------------------------------------------------------
# Repeated long-span detection (exact-substring duplication signal)
# ---------------------------------------------------------------------------

def repeated_span_report(
    df: DataFrame,
    col: str,
    id_col: str,
    window: int = 50,
    min_docs: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """The corpus's most-duplicated long token spans: every ``window``-token
    sliding window (aligned-slice shingles — token windows cross line
    boundaries, unlike corpus_line_dedup's line keys), counted by DISTINCT
    document frequency, top-k hottest returned with an example document.

    This is the reporting half of suffix-array exact-substring dedup (Lee
    et al.'s "Deduplicating Training Data" signal) in Spark-native form:
    the windows explode map-side off one tokenize, the df count is a
    partial+final aggregate over (window-text, doc) pairs, and top-k is
    TakeOrderedAndProject — no suffix array, no global sort.  The report
    names WHAT to cut (boilerplate, licenses, templates); the cut itself is
    corpus_line_dedup for line-shaped spans or a doc-level drop for whole
    templates.  At 10^12 docs hash the window (xxhash64) for the count and
    keep only the top-k raw strings via a second targeted pass."""
    spans = df.select(
        F.col(id_col).alias("id"), tokens(F.col(col)).alias("_t")
    ).select(
        "id",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("_t"), window))
        ).alias("span"),
    )
    counts = spans.groupBy("span").agg(
        F.countDistinct("id").alias("n_docs"),
        F.min("id").alias("example_id"),
    )
    return (
        counts.filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("span").asc())
        .limit(top_k)
    )


def lm_bigram_scores(
    df: DataFrame, col: str, id_col: str, k: float = 0.5
) -> DataFrame:
    """CCNet-style statistical quality signal: score every document's
    cross-entropy under a bigram language model TRAINED ON THE CORPUS
    ITSELF (add-k smoothed), so boilerplate/template text (high-probability
    n-grams) scores LOW and lorem-ipsum/garbled text scores HIGH — the
    perplexity-bucket filter of CCNet/RedPajama pipelines, self-contained
    (no external LM artifact, which also makes it exactly SQL-oracle-able).

    Model: P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V) where C(w1) is the
    bigram-CONTEXT count (Σ_w C(w1,w)) and V the bigram vocabulary size
    (distinct tokens appearing in any bigram slot) — the standard add-k
    estimator, every count derived from ONE tokenize+pair pass.

    Plan shape (all JVM-side, no Python): tokenize once (lowercased
    whitespace tokens, same kernel as token_count), pair via two array
    slices zipped (no self-join), compress to per-doc bigram counts
    map-side (groupBy doc,w1,w2 — repeated bigrams inside a doc collapse
    before any join), fold the GLOBAL model tables from that bounded
    table, then one join keyed on (w1,w2) + one on w1 (AQE handles
    hot-bigram skew) and a per-doc aggregate.  The model tables are
    bigram-vocabulary-sized, never corpus-sized; at campaign scale they
    persist and re-score new batches without retraining.

    Output per document: (id, n_bigrams, cross_entropy [nats/bigram,
    round 6], perplexity [e^ce, round 6]).  Docs with < 2 tokens keep a
    row with n_bigrams = 0 and NULL scores (unknown, never a silent
    pass)."""
    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.lower(F.col(col))).alias("_t")
    )
    n = F.size("_t")
    pairs = (
        toks.filter(n >= 2)
        .select(
            "_id",
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, n - 1).alias("w1"),
                    F.slice("_t", 2, n - 1).alias("w2"),
                )
            ).alias("_p"),
        )
        .select("_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    dpair = pairs.groupBy("_id", "w1", "w2").agg(F.count(F.lit(1)).alias("m"))
    # Pin the MODEL table before its three derived uses (c1, vocab, and the
    # scoring join): each would otherwise re-derive the corpus-sized dpair
    # lineage — and with divergent column pruning ReusedExchange never
    # fires, so the corpus tokenized SIX times per action (measured).  c2
    # is bounded by the bigram vocabulary (the artifact a campaign would
    # persist), so the lazy localCheckpoint (dedup._materialize_once
    # precedent) costs KB-to-GB of executor storage, never corpus scale;
    # the honest minimum of TWO tokenize passes remains (train + score).
    c2 = (
        dpair.groupBy("w1", "w2")
        .agg(F.sum("m").alias("c2"))
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        c2.select(F.col("w1").alias("w"))
        .union(c2.select(F.col("w2").alias("w")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    terms = (
        dpair.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            "m",
            (
                F.col("m")
                * F.log(
                    (F.col("c1") + F.lit(float(k)) * F.col("_v"))
                    / (F.col("c2") + F.lit(float(k)))
                )
            ).alias("_term"),
        )
    )
    per_doc = terms.groupBy("_id").agg(
        F.sum("m").alias("n_bigrams"),
        (F.sum("_term") / F.sum("m")).alias("_ce"),
    )
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("_ce", 6).alias("cross_entropy"),
            F.round(F.exp("_ce"), 6).alias("perplexity"),
        )
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020, §2.2 — the published
    heuristics, not a port): line level, keep only lines that end in a
    terminal punctuation mark (``. ! ? "``), carry at least
    ``min_words_per_line`` whitespace-separated words, and do not mention
    ``javascript`` (case-insensitive); document level, drop pages
    containing ``lorem ipsum`` or a curly brace, and pages with fewer
    than ``min_kept_lines`` surviving lines.

    Entirely Catalyst higher-order functions over the split-lines array
    (filter/transform/size — whole-stage codegen, zero Python, no
    shuffle): the narrow-projection shape of quality_features.  NULL text
    is treated as empty (0 lines → ``too_few_lines``), never a NULL
    verdict.  Word counts split on ``\\s+`` AFTER trimming, so the count
    is engine-identical; the emptiness guard keeps ``split('') == ['']``
    from counting one word.

    Output: (id, n_lines, n_kept_lines, doc_kept, drop_reason —
    ``lorem_ipsum`` | ``brace`` | ``too_few_lines`` | NULL, clean_text —
    the kept lines re-joined, NULL for dropped docs)."""
    if min_words_per_line < 1 or min_kept_lines < 1:
        raise ValueError("c4_clean: thresholds must be >= 1")
    text = F.coalesce(F.col(text_col), F.lit(""))
    nonempty = F.filter(
        F.split(text, "\n"), lambda x: F.length(F.trim(x)) > 0
    )

    def _keeps(x):
        t = F.trim(x)
        words = F.size(F.split(t, r"\s+"))
        return (
            F.substring(t, -1, 1).isin(".", "!", "?", '"')
            & (words >= F.lit(min_words_per_line))
            & ~F.lower(t).contains("javascript")
        )

    base = df.select(
        F.col(id_col),
        text.alias("_t"),
        F.size(nonempty).alias("n_lines"),
        F.transform(
            F.filter(nonempty, _keeps), lambda x: F.trim(x)
        ).alias("_kept"),
    )
    has_lorem = F.lower(F.col("_t")).contains("lorem ipsum")
    has_brace = F.col("_t").contains("{")
    enough = F.size("_kept") >= F.lit(min_kept_lines)
    reason = (
        F.when(has_lorem, F.lit("lorem_ipsum"))
        .when(has_brace, F.lit("brace"))
        .when(~enough, F.lit("too_few_lines"))
    )
    return base.select(
        F.col(id_col),
        "n_lines",
        F.size("_kept").alias("n_kept_lines"),
        reason.isNull().alias("doc_kept"),
        reason.alias("drop_reason"),
        F.when(reason.isNull(), F.array_join("_kept", "\n")).alias(
            "clean_text"
        ),
    )


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    §A1.1 — thresholds verbatim, not a port), as ONE narrow projection of
    Catalyst higher-order functions beside c4_clean:

    * 50 ≤ word count ≤ 100,000
    * 3 ≤ mean word length ≤ 10
    * symbol-to-word ratio ≤ 0.1 for EACH of ``#`` and the ellipsis
      (``...``/``…``) — tested separately, as published (review finding:
      summing them dropped pages the paper keeps)
    * ≤ 90% of lines start with a bullet (``-``, ``*``, ``•``)
    * ≤ 30% of lines end with an ellipsis
    * ≥ 80% of words contain an alphabetic character
    * ≥ 2 distinct members of the Gopher stop-word list present

    (The paper's repetition clauses live in repetition_features — they
    need the lines/shingle machinery, not these scalar signals.)

    All ratios round(6); counting uses the length-difference-after-
    replace idiom for substrings so both correctness engines share
    non-overlapping-match semantics.  NULL text counts zero words and
    fails the word-count rule (never a NULL verdict).  Output: id, the
    seven signals, ``keep`` boolean, and ``drop_reason`` — the FIRST
    failing rule in the order above, NULL when kept."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda x: x != "")
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(F.trim(x)) > 0)

    def _count_sub(col, sub):
        return (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit("")))) / len(sub)

    base = df.select(
        F.col(id_col),
        words.alias("_w"),
        lines.alias("_l"),
        _count_sub(text, "#").alias("_hash"),
        (_count_sub(text, "...") + _count_sub(text, "…")).alias("_ell"),
    )
    n_words = F.size("_w")
    n_lines = F.size("_l")
    sig = base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(
            n_words > 0,
            F.round(
                F.aggregate(
                    "_w", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
                )
                / n_words,
                6,
            ),
        ).alias("mean_word_len"),
        F.when(n_words > 0, F.round(F.col("_hash") / n_words, 6)).alias(
            "hash_word_ratio"
        ),
        F.when(n_words > 0, F.round(F.col("_ell") / n_words, 6)).alias(
            "ellipsis_word_ratio"
        ),
        F.when(
            n_lines > 0,
            F.round(
                F.size(
                    F.filter(
                        "_l",
                        lambda x: F.substring(F.trim(x), 1, 1).isin("-", "*", "•"),
                    )
                )
                / n_lines,
                6,
            ),
        ).alias("frac_bullet_lines"),
        F.when(
            n_lines > 0,
            F.round(
                F.size(
                    F.filter(
                        "_l",
                        lambda x: F.trim(x).endswith("...")
                        | F.trim(x).endswith("…"),
                    )
                )
                / n_lines,
                6,
            ),
        ).alias("frac_ellipsis_lines"),
        F.when(
            n_words > 0,
            F.round(
                F.size(F.filter("_w", lambda x: x.rlike("[A-Za-z]"))) / n_words,
                6,
            ),
        ).alias("frac_alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.transform("_w", lambda x: F.lower(x))),
                F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
            )
        ).alias("n_stop_hits"),
    )
    reason = (
        F.when(
            (F.col("n_words") < 50) | (F.col("n_words") > 100_000),
            F.lit("word_count"),
        )
        .when(
            (F.col("mean_word_len") < 3) | (F.col("mean_word_len") > 10),
            F.lit("mean_word_length"),
        )
        .when(
            (F.col("hash_word_ratio") > 0.1)
            | (F.col("ellipsis_word_ratio") > 0.1),
            F.lit("symbol_ratio"),
        )
        .when(F.col("frac_bullet_lines") > 0.9, F.lit("bullet_lines"))
        .when(F.col("frac_ellipsis_lines") > 0.3, F.lit("ellipsis_lines"))
        .when(F.col("frac_alpha_words") < 0.8, F.lit("alpha_words"))
        .when(F.col("n_stop_hits") < 2, F.lit("stop_words"))
    )
    return sig.select(
        "*",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def excise_repeated_spans(
    df: DataFrame,
    col: str,
    id_col: str,
    window: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """The CUT half of repeated-span dedup (Lee et al., "Deduplicating
    Training Data"): remove from every document the token ranges covered
    by any ``window``-token span appearing in ≥ ``min_docs`` DISTINCT
    documents — boilerplate, licenses, templates excised in place, the
    document's unique content kept (dropping whole docs over one shared
    license header throws away the corpus).

    Two corpus scans — the honest train+apply minimum (the bigram-LM
    precedent): scan 1 counts distinct-doc frequency per span, scan 2
    re-derives positional windows and joins the hot-span table.  Hit
    positions merge into maximal ranges by the islands rule (coverage
    [p, p+window); later start ≤ earlier + window merges — the
    contamination_spans geometry), and the rebuild keeps exactly the
    uncovered tokens via array-local HOFs.  Only HIT positions shuffle
    (per-doc islands windows); clean documents take the left-join fast
    path.  At campaign scale count on xxhash64(span) instead of the raw
    string to keep the count shuffle narrow (64-bit collision excises an
    innocent span — at 10^12 spans choose 128-bit); this implementation
    counts raw spans so the semantics are engine-replayable.

    Output text is the token rebuild (single-space joined) for EVERY row
    — one consistent normalization whether or not anything was excised.
    Returns (id, text, n_tokens, n_tokens_removed, n_spans_excised).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(col)).alias("_t")
    )
    pos_spans = toks.select(
        "id",
        F.posexplode(shingles_from_tokens(F.col("_t"), window)).alias(
            "pos", "span"
        ),
    )
    hot = (
        pos_spans.groupBy("span")
        .agg(F.countDistinct("id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("span")
    )
    hits = pos_spans.join(hot, "span").select(
        "id", F.col("pos").cast("long").alias("pos")
    )
    w_doc = Window.partitionBy("id").orderBy("pos")
    w_cum = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranges = (
        hits.withColumn(
            "_new",
            F.when(
                F.lag("pos").over(w_doc).isNull()
                | (F.col("pos") - F.lag("pos").over(w_doc) > window),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_new").over(w_cum))
        .groupBy("id", "_island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + window).alias("e"),  # exclusive, 0-based
        )
        .groupBy("id")
        .agg(
            F.collect_list(F.struct("s", "e")).alias("_ranges"),
            F.count(F.lit(1)).alias("n_spans_excised"),
        )
    )
    joined = toks.join(ranges, "id", "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_ranges"), lambda r: (i >= r["s"]) & (i < r["e"])
    )
    kept = F.when(
        F.col("_ranges").isNull(), F.col("_t")
    ).otherwise(
        F.transform(
            F.filter(
                F.transform(
                    F.col("_t"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
                ),
                lambda e: ~covered(e["i"].cast("long")),
            ),
            lambda e: e["t"],
        )
    )
    return joined.select(
        "id",
        F.array_join(kept, " ").alias("text"),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("long").alias("n_tokens_removed"),
        F.coalesce(F.col("n_spans_excised"), F.lit(0)).cast("long").alias(
            "n_spans_excised"
        ),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (round-4 wave 32)
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    col: str,
    id_col: str,
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF — the
    corpus-keyword primitive behind topic tagging, mixture labelling, and
    near-dup *explanation* (which terms make two docs cluster).

    Semantics (engine-portable, exactly reproducible in ANSI SQL):

    - terms = whitespace tokens (``tokens()``; empty strings dropped);
    - tf(d, t)  = raw count of t in d;
    - df(t)     = number of DISTINCT documents containing t — derived from
      the (doc, term) aggregate itself (rows-per-term), never a second
      corpus scan;
    - idf(t)    = round(ln((1 + N) / (1 + df)) + 1, 6)  (scikit-style
      smoothing; N = total documents in ``df`` including token-less ones),
      rounded BEFORE the multiply so both engines rank identical doubles;
    - score     = round(tf * idf, 6); top-k per doc by
      (score DESC, term ASC) — fully deterministic tie-break;
    - terms with df < min_df are dropped before ranking (noise floor).

    Scale shape: one corpus scan → explode → two-stage hash aggregate on
    (doc, term); the doc-frequency table folds from that aggregate
    (groupBy term), so the expensive explode runs ONCE (lazy localCheckpoint
    pins the (doc, term) frame feeding both sides); the tf⋈df join
    shuffles on term — vocabulary-sized, AQE broadcasts it when small.
    Ranking is a per-doc window over ≤ vocabulary rows, never the corpus.
    """
    if k < 1:
        raise ValueError(f"tfidf_top_terms: k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    n_docs = df.count()  # one job over the narrow id column; N is a scalar
    tf = (
        df.select(F.col(id_col), F.explode(tokens(col)).alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds both the df() fold and the join
    )
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("_df") >= min_df)
    idf = F.round(
        F.log((1.0 + F.lit(float(n_docs))) / (1.0 + F.col("_df"))) + 1.0, 6
    )
    scored = tf.join(dfreq, "_t").select(
        F.col(id_col),
        F.col("_t").alias("term"),
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weighting (round-4 wave 33)
# ---------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023, public
# arXiv 2302.03169): score every raw document by how much more likely its
# hashed n-gram profile is under a TARGET distribution (e.g. wiki/books/"en")
# than under the RAW distribution, then keep the top fraction.  The classic
# lever for steering a 100-TB crawl toward a quality domain without training
# a classifier.

_DSIR_MICRO = 1_000_000


def hashed_gram_buckets(col: str | Column, hexlen: int = 3) -> Column:
    """Unigram + bigram hash buckets for a text column: each gram maps to
    substring(md5(gram), 1, hexlen) — a 16^hexlen-ary feature space that is
    byte-identical in every engine (the DuckDB oracle replays it verbatim).
    Buckets, not raw grams, bound the model table at 16^hexlen rows no
    matter how large the corpus vocabulary grows."""
    toks = tokens(col)
    grams = F.concat(toks, shingles_from_tokens(toks, 2))
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, hexlen))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    col: str,
    id_col: str,
    hexlen: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight over ``raw``:

        log w(d) = Σ_b count_d(b) · [ln p_target(b) − ln p_raw(b)]

    with Laplace-α smoothed bucket probabilities p(b) = (c_b + α)/(T + α·B),
    B = 16^hexlen.  The per-bucket log-ratio is rounded to INTEGER
    micro-units (×1e6) once, in the B-row model table — so the per-document
    score is a SUM OF LONGS: exact, partition-order-free, and bit-identical
    across engines (no floating-point accumulation anywhere).  Output:
    (id_col, lr_micro: long, log_weight: double = round(lr_micro/1e6, 6)).
    Documents with no grams score exactly 0.

    Scale shape: one raw scan and one target scan build the two bucket-count
    aggregates (explode → two-stage hash aggregate, map-side partial); the
    model table is ≤ B rows and BROADCAST into the scoring scan, so scoring
    is explode → broadcast-join → per-doc sum — the raw corpus shuffles only
    on doc id for the final narrow aggregate, and nothing data-sized is ever
    pinned or collected (the two count frames collected for totals are
    ≤ B rows each).
    """
    import math

    B = 16**hexlen
    bucket = hashed_gram_buckets(col, hexlen)
    rawb = raw.select(F.col(id_col), F.explode(bucket).alias("_b"))
    rawc = (
        rawb.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
        .localCheckpoint(eager=False)  # ≤ B rows; feeds the total and the model
    )
    tgtc = (
        target.select(F.explode(bucket).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_ct"))
        .localCheckpoint(eager=False)
    )
    tr = rawc.agg(F.sum("_cr")).collect()[0][0] or 0
    tt = tgtc.agg(F.sum("_ct")).collect()[0][0] or 0
    lr = rawc.join(tgtc, "_b", "left").select(
        "_b",
        F.round(
            F.lit(float(_DSIR_MICRO))
            * (
                F.log((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha))
                      / F.lit(float(tt + alpha * B)))
                - F.log((F.col("_cr") + F.lit(alpha)) / F.lit(float(tr + alpha * B)))
            )
        ).cast("long").alias("_lrm"),
    )
    scored = (
        rawb.join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(F.sum("_lrm").alias("lr_micro"))
    )
    return raw.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("lr_micro"), F.lit(0)).cast("long").alias("lr_micro"),
        F.round(
            F.coalesce(F.col("lr_micro"), F.lit(0)) / F.lit(float(_DSIR_MICRO)), 6
        ).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    col: str,
    id_col: str,
    fraction: float = 0.25,
    hexlen: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """``importance_weights`` plus a ``selected`` flag: keep the documents
    whose lr_micro is at or above the (1 − fraction) quantile — a
    THRESHOLD, never a global sort (at 10^12 docs a rank would serialize
    through one task; a quantile of the narrow weight column is one
    aggregate).  Ties at the threshold all keep (the kept count may exceed
    round(fraction·N) — documented over-admission, never a nondeterministic
    drop).  The quantile interpolates between exact integers, so both
    engines compute the identical threshold double."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"dsir_select: fraction must be in (0, 1], got {fraction}")
    w = importance_weights(raw, target, col, id_col, hexlen, alpha).localCheckpoint(
        eager=False
    )
    thr = w.agg(
        F.expr(f"percentile(cast(lr_micro as double), {1.0 - fraction!r})").alias("_t")
    )
    return w.crossJoin(F.broadcast(thr)).select(
        id_col,
        "lr_micro",
        "log_weight",
        (F.col("lr_micro") >= F.col("_t")).alias("selected"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (round-4 wave 39)
# ---------------------------------------------------------------------------


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Exact BM25 top-k (Robertson; the Lucene-style +1 idf that never goes
    negative) — the keyword arm a hybrid retrieval stack fuses with ANN
    (see similarity.rrf_fuse):

        score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) /
                                     (tf + k1·(1 − b + b·|d|/avgdl))
        idf(t)      = round(ln((N − df + 0.5)/(df + 0.5) + 1), 6)

    with N = |corpus| (token-less docs included), |d| = token count,
    avgdl = total tokens / N.  EVERY per-term score is quantized to
    integer micro-units before summing, so the per-(query, doc) score is a
    sum of LONGS — exact, partition-order-free, engine-identical (the
    session-wide integer-scoring discipline: DSIR, RRF, PageRank).
    Top-k per query by (score DESC, doc ASC).

    Scale shape: ONE corpus explode → (doc, term, tf) hash aggregate
    (lazily pinned); doc lengths AND document frequencies both fold from
    that aggregate — never a second corpus scan; the query-term list is
    tiny and broadcasts into the term join; ranking is a per-query window
    over matched candidates only.  Returns (qid, doc, score_micro, rank).
    """
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1, got {k}")
    from pyspark.sql import Window

    n_docs = corpus.count()
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    tf = (
        corpus.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy(id_col).agg(F.sum("_tf").alias("_dl"))
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    avgdl = (tf.agg(F.sum("_tf")).collect()[0][0] or 0) / n_docs
    if avgdl == 0:
        raise ValueError("bm25_topk: corpus has no tokens")
    qt = F.broadcast(
        queries.select(
            F.col(qid_col), F.explode(tokens(qtext_col)).alias("_t")
        ).distinct()
    )
    idf6 = F.round(
        F.log(
            (F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            + 1.0
        ),
        6,
    )
    denom = F.col("_tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(float(avgdl))
    )
    term_micro = F.round(
        F.lit(1_000_000.0) * (idf6 * (F.col("_tf") * F.lit(k1 + 1.0)) / denom)
    ).cast("long")
    scored = (
        qt.join(tf, "_t")
        .join(dfreq, "_t")
        .join(dl, id_col)
        .groupBy(qid_col, id_col)
        .agg(F.sum(term_micro).alias("score_micro"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# HTML/markup stripping (round-4 wave 41)
# ---------------------------------------------------------------------------
#
# Crawled corpora arrive as markup; every downstream signal here (C4 rules,
# Gopher quality, dedup shingles, BM25) assumes PLAIN TEXT.  This is the
# trafilatura-lite front step: drop script/style payloads and comments,
# flatten tags, decode the six entities that dominate real pages, collapse
# whitespace.  All patterns live in the Java∩RE2∩re dialect (no lookaround,
# no backrefs; inline (?is) flags only) and are single constants injected
# into BOTH engines — the PII-scrub contract.

MARKUP_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
MARKUP_COMMENT_RE = r"(?s)<!--.*?-->"
MARKUP_TAG_RE = r"(?s)<[^>]*>"
# decode order matters: &amp; LAST, or "&amp;lt;" would double-decode
MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup_col(col: str | Column) -> Column:
    """Plain text from a markup column: script/style/comment payloads
    removed, tags flattened to spaces (block boundaries must not glue
    words), entities decoded, whitespace runs collapsed, ends trimmed.
    NULL stays NULL.  One chain of JVM regexp/replace expressions —
    whole-stage codegen, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, MARKUP_BLOCK_RE, " ")
    c = F.regexp_replace(c, MARKUP_COMMENT_RE, " ")
    c = F.regexp_replace(c, MARKUP_TAG_RE, " ")
    for ent, ch in MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_markup(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per-document markup stripping with audit counters: returns
    (id_col, text, n_tags_removed, n_chars_clean) — the counters make a
    one-pass markup-prevalence report (how much of the corpus was tag
    overhead) without a second scan."""
    raw = F.col(col)
    return df.select(
        F.col(id_col),
        strip_markup_col(col).alias("text"),
        F.when(raw.isNull(), F.lit(None).cast("long")).otherwise(
            F.regexp_count(raw, F.lit(MARKUP_TAG_RE))
        ).alias("n_tags_removed"),
        F.length(strip_markup_col(col)).cast("long").alias("n_chars_clean"),
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (round-4 wave 46)
# ---------------------------------------------------------------------------


def compression_ratio_kernel(level: int = 6):
    """Arrow-batched DEFLATE probe: round(compressed_len / raw_utf8_len, 6)
    per document (zlib, fixed level — deterministic bytes for a given zlib
    build).  The classic cheap junk detector (RefinedWeb/Dolma gating):
    templated/repetitive text compresses far below prose, random noise
    sits near (or above) 1.0.  NULL → NULL; empty text → NULL (no
    evidence, avoids 8/0)."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.SCALAR_ITER)
    def ratio(it):
        for s in it:
            out = []
            for v in s:
                if v is None or len(v) == 0:
                    out.append(None)
                else:
                    raw = v.encode("utf-8")
                    out.append(round(len(zlib.compress(raw, level)) / len(raw), 6))
            yield pd.Series(out, dtype="float64")

    return ratio


def compression_ratio(
    df: DataFrame, col: str, id_col: str, level: int = 6
) -> DataFrame:
    """(id, n_chars, compression_ratio) per document — one Arrow-batched
    projection, no shuffle, no per-row Python (SCALAR_ITER kernel, the
    simhash/normalize discipline).  The ratio is a pure function of the
    text bytes, so the output is deterministic under any partitioning —
    driver-checkable via the pinned-snapshot oracle (the LSH/BPE
    convention; semantic claims — repetitive < prose < noise — are
    pytest-asserted, not pinned)."""
    if not 1 <= level <= 9:
        raise ValueError(f"compression_ratio: level must be in [1, 9], got {level}")
    return df.select(
        F.col(id_col),
        F.length(F.col(col)).cast("long").alias("n_chars"),
        compression_ratio_kernel(level)(F.col(col)).alias("compression_ratio"),
    )


def ngram_overlap_metrics(
    pairs: DataFrame,
    id_cols: "list[str]",
    cand_col: str,
    ref_col: str,
    n_max: int = 2,
) -> DataFrame:
    """BLEU/ROUGE-style clipped n-gram overlap between paired texts — the
    pairwise text metric a pipeline needs wherever two versions of a
    document meet: candidate vs reference in distillation eval, raw vs
    cleaned text ("how much content survived the scrubber"), adjacent
    near-duplicates ("WHAT do these two actually share").  Per pair and
    per n ∈ 1..n_max:

    - overlap = Σ_g min(count_cand(g), count_ref(g)) — BLEU's CLIPPED
      match count (a candidate repeating one reference word does not
      farm precision);
    - precision = overlap / #cand n-grams (BLEU-style modified
      precision), recall = overlap / #ref n-grams (ROUGE-n), f1 their
      harmonic mean — NULL where the denominator side has no n-grams.

    Tokens are the engine's whitespace convention (text.tokens — split
    on ' ', empties filtered, case preserved); n-grams join tokens with
    a single space.  Counts are exact longs; the three ratios derive
    from identical integer operands, round-6 reproducible.

    Scale shape: n-grams explode per side (corpus-token-sized, the
    shingle cost every dedup operator already pays) into ONE per-(pair,
    n, gram) count aggregate per side, a keyed full-outer join, and a
    keyed roll-up back to pairs — everything keyed by the pair id,
    nothing global.  The pair frame itself comes from the caller (this
    operator does not choose the pairing).

    Output: (*id_cols, n, cand_ngrams, ref_ngrams, overlap, precision,
    recall, f1)."""
    if n_max < 1:
        raise ValueError(f"ngram_overlap_metrics: n_max must be >= 1, got {n_max}")

    def _grams(col: str):
        toks = tokens(col)
        # positions 1 .. size-n+1, one n-gram each (empty when size < n)
        # sequence(1, 0) DESCENDS in Spark (never empty) — guard short
        # texts with an explicit empty array instead
        empty = F.array().cast("array<struct<n:int,gram:string>>")
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(n_max)),
                lambda n: F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.struct(
                            n.cast("int").alias("n"),
                            F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
                        ),
                    ),
                ).otherwise(empty),
            )
        )

    base = pairs.select(*id_cols, _grams(cand_col).alias("_cg"), _grams(ref_col).alias("_rg"))

    def _counts(col: str, out: str):
        return (
            base.select(*id_cols, F.explode(col).alias("_g"))
            .groupBy(*id_cols, F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    cc = _counts("_cg", "_cc")
    rc = _counts("_rg", "_rc")
    j = cc.join(rc, [*id_cols, "n", "gram"], "full_outer").select(
        *id_cols,
        "n",
        F.coalesce("_cc", F.lit(0)).alias("_cc"),
        F.coalesce("_rc", F.lit(0)).alias("_rc"),
    )
    per = j.groupBy(*id_cols, "n").agg(
        F.sum("_cc").cast("long").alias("cand_ngrams"),
        F.sum("_rc").cast("long").alias("ref_ngrams"),
        F.sum(F.least(F.col("_cc"), F.col("_rc"))).cast("long").alias("overlap"),
    )
    # spine: every (pair, n) appears even when BOTH sides lack n-grams
    spine = pairs.select(*id_cols).crossJoin(
        F.broadcast(
            pairs.sparkSession.range(1, n_max + 1).select(
                F.col("id").cast("int").alias("n")
            )
        )
    )
    full = spine.join(per, [*id_cols, "n"], "left").select(
        *id_cols,
        F.col("n").cast("long").alias("n"),
        F.coalesce("cand_ngrams", F.lit(0)).cast("long").alias("cand_ngrams"),
        F.coalesce("ref_ngrams", F.lit(0)).cast("long").alias("ref_ngrams"),
        F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
    )
    p = F.col("overlap").cast("double") / F.col("cand_ngrams").cast("double")
    r = F.col("overlap").cast("double") / F.col("ref_ngrams").cast("double")
    prec = F.when(F.col("cand_ngrams") > 0, F.round(p, 6))
    rec = F.when(F.col("ref_ngrams") > 0, F.round(r, 6))
    f1 = F.when(
        (F.col("cand_ngrams") > 0) & (F.col("ref_ngrams") > 0) & (F.col("overlap") > 0),
        F.round(F.lit(2.0) * p * r / (p + r), 6),
    ).otherwise(
        F.when(
            (F.col("cand_ngrams") > 0) & (F.col("ref_ngrams") > 0), F.lit(0.0)
        )
    )
    return full.select(
        *id_cols, "n", "cand_ngrams", "ref_ngrams", "overlap",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def readability_features(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    readability axis of quality filtering (Gopher/C4-style heuristics
    gate on length and repetition; readability separates fluent prose
    from keyword soup at equal length).  Pure-Catalyst counting contract,
    chosen for exact cross-engine replay rather than linguistic
    perfection (syllable counting without a dictionary is a heuristic in
    EVERY implementation):

    - words = the engine's whitespace tokens;
    - sentences = runs of [.!?] (``greatest(count, 1)`` so fragment-only
      documents divide by one sentence, the classical tools' behavior);
    - syllables = vowel-letter runs [aeiouyAEIOUY]+ over the raw text
      (runs never span whitespace, so this is the per-word vowel-group
      sum marched over the whole document in ONE regexp).

    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
    fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59;
    both NULL for word-less documents, round-6 from exact long counts in
    identical expression order.  One narrow projection — no shuffle, no
    Python.

    Output: (id, n_words, n_sentences, n_syllables, flesch, fk_grade)."""
    c = F.coalesce(F.col(col), F.lit(""))  # NULL text counts as empty
    base = df.select(
        F.col(id_col),
        token_count(c).cast("long").alias("n_words"),
        F.greatest(F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1))
        .cast("long")
        .alias("n_sentences"),
        F.regexp_count(c, F.lit(r"[aeiouyAEIOUY]+")).cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    has = F.col("n_words") > 0
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            has,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ),
        ).alias("flesch"),
        F.when(
            has,
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
            ),
        ).alias("fk_grade"),
    )


_SCRIPT_CLASSES = (
    ("latin", r"[^A-Za-z]"),
    ("digit", r"[^0-9]"),
    ("cjk", "[^一-鿿]"),
    ("cyrillic", "[^Ѐ-ӿ]"),
    ("arabic", "[^؀-ۿ]"),
    ("whitespace", r"[^\s]"),
)


def script_profile(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per-document Unicode script composition — the language-agnostic
    complement to the n-gram language ID: character counts and ratios
    for Latin / digits / CJK / Cyrillic / Arabic / whitespace plus the
    residual ``other`` bucket.  Mixed-script documents (spam, mojibake,
    bilingual boilerplate) show up as ratio anomalies before any
    language model sees them.

    Counting is the strip-and-measure idiom (length of the text with
    everything OUTSIDE the class removed — the quality_features
    convention), one narrow no-shuffle projection, each ratio a round-6
    division of exact longs; ``other`` is the exact remainder, so the
    counts always sum to n_chars.

    Output: (id, n_chars, {script}_chars..., other_chars,
    {script}_ratio..., other_ratio)."""
    c = F.coalesce(F.col(col), F.lit(""))
    counts = [
        F.length(F.regexp_replace(c, pat, "")).cast("long").alias(f"{name}_chars")
        for name, pat in _SCRIPT_CLASSES
    ]
    base = df.select(F.col(id_col), F.length(c).cast("long").alias("n_chars"), *counts)
    known = None
    for name, _ in _SCRIPT_CLASSES:
        col_ = F.col(f"{name}_chars")
        known = col_ if known is None else known + col_
    base = base.withColumn("other_chars", (F.col("n_chars") - known).cast("long"))
    nz = F.col("n_chars") > 0
    ratios = [
        F.when(
            nz,
            F.round(
                F.col(f"{name}_chars").cast("double")
                / F.col("n_chars").cast("double"),
                6,
            ),
        ).alias(f"{name}_ratio")
        for name, _ in _SCRIPT_CLASSES
    ] + [
        F.when(
            nz,
            F.round(
                F.col("other_chars").cast("double") / F.col("n_chars").cast("double"),
                6,
            ),
        ).alias("other_ratio")
    ]
    return base.select(
        id_col,
        "n_chars",
        *[f"{name}_chars" for name, _ in _SCRIPT_CLASSES],
        "other_chars",
        *ratios,
    )


def novelty_scores(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document n-gram NOVELTY — the cross-corpus inverse of the
    repetition signals: what share of a document's distinct word
    k-shingles appears NOWHERE else in the corpus.  Boilerplate and
    template pages score near 0 (everything they say, the corpus says
    elsewhere), genuinely original text near 1 — the ranking signal a
    curation funnel wants BETWEEN exact-dedup (novelty of duplicates is
    exactly 0 on the duplicated span) and quality scoring (which cannot
    see other documents at all).

    Shape: one shingle pass (the zip_with kernel — no per-element
    lambda re-evaluation), per-doc DISTINCT shingles, a corpus document-
    frequency aggregate over the hashed shingle space, and a keyed join
    back — the corpus_line_dedup plan shape at shingle grain.  Exact
    long counts; novelty = n_unique/n_shingles round-6; documents with
    fewer than k tokens keep a row with zero counts and NULL novelty
    (no shingle evidence ≠ novelty 0).

    Output: (id, n_shingles, n_unique, novelty)."""
    if k < 1:
        raise ValueError(f"novelty_scores: k must be >= 1, got {k}")
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    toks = tokens("_t")
    sh = (
        base.select(F.col(id_col), shingles_from_tokens(toks, k).alias("_sh"))
        .select(F.col(id_col), F.explode(F.array_distinct("_sh")).alias("_g"))
    )
    dfreq = sh.groupBy("_g").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    per = (
        sh.join(dfreq, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
    )
    return (
        base.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(
                    F.col("n_unique").cast("double")
                    / F.col("n_shingles").cast("double"),
                    6,
                ),
            ).alias("novelty"),
        )
    )


def collocation_report(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — adjacent word
    pairs that co-occur far beyond chance (PMI = log₂(n·c(ab) /
    (c(a)·c(b))) over corpus bigram/unigram counts): natural prose is
    DENSE with strong collocations, keyword-stuffed spam and shuffled
    boilerplate are not, and the top of this table is the corpus's
    phrasebook (entity names, idioms, templates) — the triage view the
    raw top_bigram counts bury under 'of the'.

    ``min_count`` floors the bigram count (PMI's known pathology:
    hapax pairs score arbitrarily high); ties in the top-k break by
    (bigram) for determinism.  Exact long counts; PMI = round-6 log₂ of
    a ratio of exact integers (n·c_ab and c_a·c_b as exact decimals —
    identical operands, identical order).  One token pass builds both
    the unigram and bigram tables (the zip_with shingle kernel); the
    PMI join is keyed on the two words.

    Output: (bigram, n_pair, n_left, n_right, pmi) — top k by PMI."""
    if min_count < 1:
        raise ValueError("collocation_report: min_count must be >= 1")
    if k < 1:
        raise ValueError("collocation_report: k must be >= 1")
    from pyspark.sql import Window

    base = df.select(F.col(text_col).alias("_t")).filter(F.col("_t").isNotNull())
    toks = tokens("_t")
    uni = (
        base.select(F.explode(toks).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("_cw"))
        .localCheckpoint(eager=False)  # feeds both ends of the PMI join
    )
    n_tab = uni.agg(F.sum("_cw").cast("long").alias("_n"))
    big = (
        base.select(F.explode(shingles_from_tokens(toks, 2)).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_cb"))
        .filter(F.col("_cb") >= min_count)
        .withColumn("_l", F.split(F.col("_b"), " ").getItem(0))
        .withColumn("_r", F.split(F.col("_b"), " ").getItem(1))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = (
        big.join(uni.select(F.col("_w").alias("_l"), F.col("_cw").alias("_cl")), "_l")
        .join(uni.select(F.col("_w").alias("_r"), F.col("_cw").alias("_cr")), "_r")
        .crossJoin(F.broadcast(n_tab))
    )
    pmi = F.round(
        F.log2(
            (dec(F.col("_n")) * F.col("_cb")).cast("double")
            / (dec(F.col("_cl")) * F.col("_cr")).cast("double")
        ),
        6,
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("bigram"))
    return (
        j.select(
            F.col("_b").alias("bigram"),
            F.col("_cb").alias("n_pair"),
            F.col("_cl").alias("n_left"),
            F.col("_cr").alias("n_right"),
            pmi.alias("pmi"),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def term_dispersion_report(
    df: DataFrame, text_col: str, id_col: str, min_tf: int = 10, k: int = 20
) -> DataFrame:
    """Top-k BURSTY terms — highest term-frequency-to-document-frequency
    ratio among terms with tf ≥ ``min_tf``: a term appearing 1,000×
    inside three documents (burstiness 333) is template/spam/markup
    residue; the same mass across 800 documents (1.25) is ordinary
    vocabulary.  The spam-term triage the plain frequency table can't
    rank — raw tf puts 'the' first, burstiness puts the anomaly first.

    Exact long tf (total occurrences) and df (distinct docs) from one
    melt pass; burstiness = round-6 tf/df; top-k ties break by term.
    Output: (term, tf, df, burstiness)."""
    if min_tf < 1:
        raise ValueError("term_dispersion_report: min_tf must be >= 1")
    from pyspark.sql import Window

    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_w"))
    )
    per = toks.groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("_id").cast("long").alias("df"),
    ).filter(F.col("tf") >= min_tf)
    w = Window.orderBy(
        F.desc(F.col("tf").cast("double") / F.col("df").cast("double")),
        F.asc("_w"),
    )
    return (
        per.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            F.col("_w").alias("term"),
            "tf",
            "df",
            F.round(F.col("tf").cast("double") / F.col("df").cast("double"), 6)
            .alias("burstiness"),
        )
    )


def vocab_growth_report(
    df: DataFrame, text_col: str, id_col: str, deciles: int = 10
) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct vocabulary vs
    cumulative token mass at corpus prefixes (id-ordered deciles) — the
    curve that says whether a corpus is still TEACHING new vocabulary
    or re-treading itself (a flattening curve is the diminishing-returns
    signal a data-acquisition budget reads; natural corpora follow
    V ≈ K·nᵝ with β ≈ 0.4–0.6, duplicated corpora flatten hard).

    Exact with NO sequential scan: a token's first appearance is
    min(id) over its occurrences, so vocab at cutoff c = |{w :
    first(w) ≤ c}| — one melt pass to (token → first id, doc → token
    count), then a bounded cutoff spine joins both.  Cutoffs are
    ceil(d·max_id/deciles) (the id space, not row percentiles — ids
    ARE the ingest order here).  Exact long counts.

    Output: (decile, cutoff_id, n_tokens_cum, vocab_cum)."""
    if deciles < 2:
        raise ValueError("vocab_growth_report: need >= 2 deciles")
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_w"))
        .localCheckpoint(eager=False)  # feeds firsts AND per-doc counts
    )
    firsts = toks.groupBy("_w").agg(F.min("_id").alias("_first"))
    per_doc = toks.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("_nt"))
    mx = toks.agg(F.max("_id").alias("_mx"))
    spine = (
        mx.crossJoin(
            F.broadcast(
                toks.sparkSession.range(1, deciles + 1).select(
                    F.col("id").cast("long").alias("decile")
                )
            )
        )
        .select(
            "decile",
            F.ceil(
                F.col("decile").cast("double")
                * F.col("_mx").cast("double")
                / F.lit(float(deciles))
            ).cast("long").alias("cutoff_id"),
        )
    )
    v = spine.join(
        firsts, firsts["_first"] <= spine["cutoff_id"], "left"
    ).groupBy("decile", "cutoff_id").agg(
        F.count("_w").cast("long").alias("vocab_cum")
    )
    t = spine.join(
        per_doc, per_doc["_id"] <= spine["cutoff_id"], "left"
    ).groupBy("decile", "cutoff_id").agg(
        F.coalesce(F.sum("_nt"), F.lit(0)).cast("long").alias("n_tokens_cum")
    )
    return (
        v.join(t, ["decile", "cutoff_id"])
        .select("decile", "cutoff_id", "n_tokens_cum", "vocab_cum")
    )


def zipf_report(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Zipf rank–frequency profile: the top-k terms with their exact
    frequency rank and round-6 log₂ coordinates — natural language
    tracks log f ≈ C − s·log r with s ≈ 1; a corpus whose top ranks
    flatten (s ≪ 1) is template-heavy, one whose tail collapses is
    vocabulary-starved.  The fit itself (Theil–Sen over the emitted
    points) is a downstream one-liner; this report pins the exact
    points.  Rank ties break by term; exact long counts.

    Output: (rank, term, tf, log2_rank, log2_tf)."""
    if k < 2:
        raise ValueError("zipf_report: k must be >= 2")
    from pyspark.sql import Window

    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = Window.orderBy(F.desc("tf"), F.asc("_w"))
    return (
        tf.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            F.col("_w").alias("term"),
            "tf",
            F.round(F.log2(F.col("rank").cast("double")), 6).alias("log2_rank"),
            F.round(F.log2(F.col("tf").cast("double")), 6).alias("log2_tf"),
        )
    )


def blocklist_scan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: "list[str]",
) -> DataFrame:
    """Per-document blocklist hit profile — the content-policy triage
    scan: exact whitespace-token matches against a curated term list
    (case-insensitive), with per-doc total hits, distinct terms hit,
    and the hit terms themselves (sorted — deterministic evidence for a
    review queue).  Token-exact matching is the CONTRACT (substring
    matching flags 'class' for 'ass' — the classic Scunthorpe failure;
    a caller wanting stemming/fuzzing normalizes upstream).

    The term list broadcasts as an array literal (bounded by contract —
    policy lists are thousands, not millions); matching is one
    array_intersect / filter projection per row, no shuffle, no Python;
    only documents with ≥1 hit return (the review queue, not the
    corpus).

    Output: (id, n_hits, n_terms_hit, terms_hit)."""
    if not terms:
        raise ValueError("blocklist_scan: terms must be non-empty")
    lowered = sorted({t.lower() for t in terms})
    tl = F.array(*[F.lit(t) for t in lowered])
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    hits = F.filter(toks, lambda t: F.array_contains(tl, t))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.size(hits).cast("long").alias("n_hits"),
            F.size(F.array_distinct(hits)).cast("long").alias("n_terms_hit"),
            F.array_sort(F.array_distinct(hits)).alias("terms_hit"),
        )
        .filter(F.col("n_hits") > 0)
    )
