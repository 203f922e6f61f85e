"""Benchmark decontamination — flag training documents that overlap an
evaluation set by shared word n-grams.

The standard contamination rule (used by the GPT-3 / PaLM / Llama training
pipelines): a training document is CONTAMINATED when it contains any word
n-gram that also appears in a held-out evaluation benchmark.  Training on
such documents inflates benchmark scores, so the curation funnel must drop
(or at least mark) them before mixing.

Spark shape — chosen for the 100 TB corpus / small eval-set asymmetry:

* the eval side is tiny by construction (benchmarks are 10^4-10^7 n-grams,
  MBs not TBs), so it broadcasts: the corpus-side probe is a map-side
  BroadcastHashJoin — the 100 TB corpus NEVER shuffles;
* the corpus side explodes each document's distinct n-grams; the explode
  amplifies rows ~x(tokens) but stays pipelined inside the scan stage
  (project → generate → broadcast-probe, one WholeStageCodegen span) —
  nothing amplified hits a shuffle;
* only the HITS (rare by definition: contamination rates are well under 1%)
  reach the per-document aggregation, so the one real shuffle in the plan
  carries KB-scale data;
* the n-grams themselves use the aligned-slice shingle kernel
  (text.shingles_from_tokens — no per-element lambda re-evaluation).

``eval_ngrams_from_docs`` builds the eval set from a documents table (the
deterministic synthetic eval set used by tests and the driver query);
production would load the benchmark file and tokenize it identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_from_tokens, tokens


def _tok(col, tokenizer: str):
    """Shared tokenizer dispatch: "words" (split-on-space kernel) or
    "subword" (pinned-vocab pieces, operators/subword.py — r4 VERDICT item
    5, n-grams over LLM tokens).  BOTH sides of a decontamination check
    must use the same mode — mismatched tokenizers silently miss overlaps,
    which is why it is one function."""
    if tokenizer == "subword":
        from .subword import subword_pieces_udf

        return subword_pieces_udf()(F.col(col) if isinstance(col, str) else col)
    if tokenizer != "words":
        raise ValueError(f"tokenizer must be 'words' or 'subword', got {tokenizer!r}")
    return tokens(col)


def eval_ngrams_from_docs(
    docs: DataFrame, col: str, n: int = 5, tokenizer: str = "words"
) -> DataFrame:
    """Distinct word n-grams of an evaluation-set documents table → one
    ``ngram`` column.  Tokenization is identical to the corpus side (same
    ``_tok`` dispatch) — a decontamination check with mismatched
    tokenizers silently misses overlaps."""
    t = docs.select(_tok(F.col(col), tokenizer).alias("_t"))
    return (
        t.select(F.explode(shingles_from_tokens(F.col("_t"), n)).alias("ngram"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    eval_ngrams: DataFrame,
    col: str,
    id_col: str,
    n: int = 5,
    tokenizer: str = "words",
) -> DataFrame:
    """Per-document contamination report: (id, n_hits, first_hit) for every
    document sharing ≥1 word n-gram with the eval set.

    ``n_hits`` counts DISTINCT overlapping n-grams; ``first_hit`` is the
    lexicographically smallest one (deterministic evidence row for review
    queues).  Documents with zero overlap produce no row — at real
    contamination rates the output is ~10^-3 of the corpus."""
    probe = docs.select(
        F.col(id_col).alias("id"), _tok(F.col(col), tokenizer).alias("_t")
    ).select(
        "id",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("_t"), n))
        ).alias("ngram"),
    )
    # defensive distinct: n_hits counts DISTINCT overlaps only if the join
    # is 1:1 per (doc, ngram) — an eval set unioned from several benchmark
    # files carries duplicate n-grams and would multiply every hit row.
    hits = probe.join(F.broadcast(eval_ngrams.select("ngram").distinct()), "ngram")
    return hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits"),  # distinct by construction
        F.min("ngram").alias("first_hit"),
    )


def decontaminate(
    docs: DataFrame,
    eval_ngrams: DataFrame,
    col: str,
    id_col: str,
    n: int = 5,
    tokenizer: str = "words",
) -> DataFrame:
    """The corpus minus contaminated documents — a broadcast LEFT ANTI join
    against the exploded probe (same no-corpus-shuffle plan; the anti join
    is evaluated per-ngram map-side, a document survives only if none of its
    n-grams match)."""
    probe = docs.select(
        F.col(id_col).alias("_did"), _tok(F.col(col), tokenizer).alias("_t")
    ).select(
        "_did",
        F.explode_outer(
            F.array_distinct(shingles_from_tokens(F.col("_t"), n))
        ).alias("ngram"),
    )
    dirty = (
        probe.join(F.broadcast(eval_ngrams.select("ngram").distinct()), "ngram")
        .select("_did")
        .distinct()
    )
    return docs.join(
        dirty, docs[id_col] == dirty["_did"], "left_anti"
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_ngrams: DataFrame,
    col: str,
    id_col: str,
    n: int = 5,
    tokenizer: str = "words",
    fpp: float = 0.01,
    num_bits: int | None = None,
) -> DataFrame:
    """Decontamination for eval sets TOO LARGE TO BROADCAST as a join hash
    table — EXACT results via a Bloom prefilter plus exact verification.

    The broadcast semi-join in ``decontaminate`` is the right plan while
    the eval n-gram set is MBs; a combined benchmark registry at 10^9
    n-grams would cost tens of GB per executor as a broadcast hash table.
    This variant:

    1. folds the eval n-grams into a Bloom bitmap (operators/bloom.py —
       ~1.2 GB at 10^9 keys / 1% fpp, vs ~60+ GB of hash-table rows);
    2. probes every corpus n-gram against the bitmap in a vectorized
       Arrow kernel — the corpus still never shuffles, and at real
       contamination rates ~99% of n-grams are rejected by the bitmap;
    3. joins ONLY the surviving candidates (true hits + the fpp-sized
       false-positive tail) against the real eval set — a shuffle join
       whose left side is ~(contamination + fpp) of the corpus n-grams,
       so Bloom false positives are REMOVED and the result is exactly
       ``decontaminate``'s.

    The verification join is deliberately not broadcast-hinted: the
    premise is that the eval side is big, so AQE picks the join strategy
    from the real sizes.
    """
    from . import bloom as _bloom

    # The eval frame is read three times (count, bitmap build, verification
    # join — the last lazily, from the plan this function returns), so
    # materialize the distinct n-grams once instead of re-deriving them
    # from text each pass — same rationale and mechanism as dedup.py's
    # _materialize_once (localCheckpoint: eager, lineage-truncating, safe
    # to reference from the returned lazy plan).
    ev = eval_ngrams.select("ngram").distinct().localCheckpoint()
    n_items = ev.count()
    if n_items == 0:
        return docs
    bits = num_bits or _bloom.bloom_num_bits(n_items, fpp)
    k = _bloom.bloom_num_hashes(bits, n_items)
    bitmap = _bloom.build_bloom(ev, "ngram", bits, k)

    probe = docs.select(
        F.col(id_col).alias("_did"), _tok(F.col(col), tokenizer).alias("_t")
    ).select(
        "_did",
        F.explode(F.array_distinct(shingles_from_tokens(F.col("_t"), n))).alias(
            "ngram"
        ),
    )
    candidates = probe.where(_bloom.bloom_contains("ngram", bitmap, bits, k))
    dirty = candidates.join(ev, "ngram").select("_did").distinct()
    return docs.join(dirty, docs[id_col] == dirty["_did"], "left_anti")


def decontaminate_semantic(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    vec_col: str,
    eval_id_col: str,
    eval_vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-space decontamination — the third member of the family
    (exact n-gram ``decontaminate``, Bloom-scale ``decontaminate_bloom``,
    and this): flag training items whose embedding is NEAR an evaluation
    item even when no n-gram matches (paraphrases, translations,
    format-shuffled copies — the leakage n-gram checks miss; the
    Llama-2/GSM8K-style embedding-similarity contamination audit).

    Same asymmetry as the n-gram path: the eval side is small by
    construction and BROADCASTS; the corpus is scanned once through a
    broadcast nested-loop cosine probe (all JVM codegen — the zip/
    aggregate kernel of similarity.py), and only rows whose ROUNDED
    cosine clears the threshold reach the per-item aggregate, so the one
    real shuffle carries hits, not the corpus.  Rounding (6 dp) happens
    BEFORE thresholding so both engines gate on the identical grid value.

    At eval sets too large to broadcast, pre-bucket both sides with
    ``similarity.band_keys_kernel`` (the embedding_near_dup LSH) and run
    this probe per bucket — the threshold semantics stay identical.

    Output per contaminated item: (id, n_hits, max_cos_sim,
    nearest_eval_id) — n_hits counts eval items at/above threshold,
    nearest_eval_id breaks cosine ties on the smallest eval id
    (deterministic review evidence; the tie-break negates the id inside
    a struct max, so eval ids must be NUMERIC — map string ids to a
    surrogate first).  Clean items produce no row."""
    from .similarity import cosine

    ev = eval_set.select(
        F.col(eval_id_col).alias("_eid"), F.col(eval_vec_col).alias("_ev")
    )
    hits = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_cv"))
        .crossJoin(F.broadcast(ev))
        .select(
            "_id",
            "_eid",
            F.round(cosine(F.col("_cv"), F.col("_ev")), 6).alias("_cos"),
        )
        .filter(F.col("_cos") >= float(threshold))
    )
    best = hits.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max(
            F.struct(F.col("_cos").alias("c"), (-F.col("_eid")).alias("nid"))
        ).alias("_best"),
    )
    return best.select(
        F.col("_id").alias(id_col),
        "n_hits",
        F.col("_best.c").alias("max_cos_sim"),
        (-F.col("_best.nid")).alias("nearest_eval_id"),
    )


def contamination_spans(
    docs: DataFrame,
    eval_ngrams: DataFrame,
    col: str,
    id_col: str,
    n: int = 5,
    tokenizer: str = "words",
) -> DataFrame:
    """Span-level contamination evidence: the MAXIMAL token ranges of each
    document covered by eval-set n-grams — what you need to surgically
    EXCISE a leaked passage instead of dropping the whole document (the
    doc-level verdicts of ``contamination_hits`` can only drop; a 50k-token
    page quoting one benchmark question is mostly salvageable).

    Positions come free from the aligned-slice shingle kernel: element i
    of the shingle array starts at token i, so ``posexplode`` yields
    (start_token, ngram) with no second tokenization.  Hit positions
    merge into maximal runs by the islands rule — hit p covers
    [p, p+n), and two hits merge iff the later start is ≤ the earlier
    start + n (overlapping or exactly adjacent coverage) — via one
    lag + running-sum window pair per document.

    Plan shape: same broadcast probe as ``contamination_hits`` (the
    corpus never shuffles; the positional explode pipelines inside the
    scan stage), then ONE hash Exchange on doc id carrying only the HIT
    positions (rare by definition) for the island windows.

    Returns (id, span_start, span_end, n_tokens, n_hit_grams): token
    index range [span_start, span_end) in the document's own token
    sequence, n_hit_grams = how many eval n-grams the run contains.
    """
    from pyspark.sql import Window

    probe = docs.select(
        F.col(id_col).alias("id"), _tok(F.col(col), tokenizer).alias("_t")
    ).select(
        "id",
        F.posexplode(shingles_from_tokens(F.col("_t"), n)).alias(
            "pos", "ngram"
        ),
    )
    hits = probe.join(
        F.broadcast(eval_ngrams.select("ngram").distinct()), "ngram"
    ).select("id", F.col("pos").cast("long").alias("pos"))
    w = Window.partitionBy("id").orderBy("pos")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_island = hits.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > n),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_island", F.sum("_new").over(w_cum))
    return (
        with_island.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_hit_grams"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
            "n_hit_grams",
        )
    )


def contamination_share(
    docs: DataFrame,
    eval_ngrams: DataFrame,
    col: str,
    id_col: str,
    n: int = 5,
    tokenizer: str = "words",
    threshold: float = 0.05,
) -> DataFrame:
    """Graded contamination: the FRACTION of each document's distinct word
    n-grams that appear in the eval set — the review-queue companion to
    the binary ``decontaminate`` gate.  A doc quoting one benchmark
    sentence scores ~1%, a near-copy of an eval item scores ~100%; the
    binary rule treats both identically, this operator ranks them.

    ONE corpus scan: the distinct-shingle array is built once in a layered
    select (the dedup_consecutive lambda rule), its size becomes the
    denominator inline, and explode_outer + broadcast LEFT join against
    the eval set marks hits — the per-doc groupBy is map-side combined,
    so the shuffle carries ~one row per document, not per n-gram (and the
    corpus never reshuffles; the eval side broadcasts by the module-head
    asymmetry argument).

    Docs with zero n-grams (shorter than n tokens) are ungradeable: share
    and flagged are NULL, never 0.0 (the inclusion_profile stance).
    Output: (id, n_ngrams, n_contaminated, share round6,
    flagged = share >= threshold)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("contamination_share: threshold must be in (0, 1]")
    # tokenize in its OWN layer so the shingle expression's n+2 references
    # read a cheap attribute, not n+2 re-evaluations of the tokenizer (the
    # contamination_hits/decontaminate pattern; with tokenizer='subword'
    # the unlayered form ran the UDF n+2 times per row — review finding)
    toks = docs.select(
        F.col(id_col).alias("id"), _tok(F.col(col), tokenizer).alias("_t")
    )
    arr = toks.select(
        "id",
        F.array_distinct(shingles_from_tokens(F.col("_t"), n)).alias("_g"),
    )
    probe = arr.select(
        "id",
        F.coalesce(F.size("_g"), F.lit(0)).alias("n_ngrams"),
        F.explode_outer("_g").alias("ngram"),
    )
    marked = probe.join(
        F.broadcast(
            eval_ngrams.select("ngram").distinct().withColumn("_hit", F.lit(1))
        ),
        "ngram",
        "left",
    )
    counts = marked.groupBy("id").agg(
        F.max("n_ngrams").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    gradable = F.col("n_ngrams") > 0
    share = F.when(
        gradable, F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6)
    )
    return counts.select(
        "id",
        "n_ngrams",
        "n_contaminated",
        share.alias("share"),
        (share >= F.lit(float(threshold))).alias("flagged"),
    )
