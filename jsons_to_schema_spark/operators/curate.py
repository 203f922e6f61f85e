"""End-to-end corpus curation — the composition a training-data pipeline
actually runs: quality gate → language gate → exact-dedup keep-one →
(optional) near-dup cluster keep-one.

Every stage reuses the engine's oracled operator EXPRESSIONS
(text.token_count, the lang_id scoring structs, dedup.dedup_exact /
assign_duplicate_clusters), so the whole pipeline is one declarative plan
Catalyst optimizes end-to-end: the gates are narrow projections + filters
(no join — lang_pred is computed in place), the dedup keep is a
groupBy(min) + semi join, and nothing leaves the JVM.

Scale notes: gates SHRINK the data before any shuffle (filter-first —
quality/lang are per-row projections the scan evaluates in place); exact
dedup shuffles only the surviving rows' fingerprints; near-dup clustering
(the expensive stage) therefore sees the minimal candidate corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import assign_duplicate_clusters, dedup_exact
from .text import (
    LANG_STOPWORDS,
    dedup_consecutive,
    dup_line_char_frac,
    lines_array,
    redact_pii,
    token_count,
    tokens,
)


def _with_lang_pred(df: DataFrame, text_col: str) -> DataFrame:
    """Append lang_pred WITHOUT a join: the same layered-projection trick as
    text.lang_id (tokenizer materialized once — HOF lambdas block codegen
    subexpression elimination, so inlining tokens() into the five per-lang
    intersects would re-tokenize 5x), but carrying the full row so the gate
    is a narrow projection instead of a shuffle join on the id."""
    pairs = [
        F.struct(
            F.size(
                F.array_intersect("_t", F.array(*[F.lit(w) for w in words]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    return (
        df.withColumn("_t", tokens(text_col))
        .withColumn("_best", F.array_max(F.array(*pairs)))
        .withColumn(
            "lang_pred",
            F.when(F.col("_best.score") > 0, F.col("_best.lang")).otherwise(
                F.lit("und")
            ),
        )
        .drop("_t", "_best")
    )


def curate_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    allowed_langs: Optional[list[str]] = None,
    near_dup_pairs: Optional[DataFrame] = None,
    near_dup_index_dir=None,
    near_dup_min_jaccard: float = 0.7,
    max_dup_line_frac: Optional[float] = None,
    collapse_repeated_lines: bool = False,
    scrub_pii: bool = False,
) -> DataFrame:
    """Curated corpus: rows surviving every gate, one representative per
    duplicate group.  Returns the input columns plus the gate columns
    (n_tokens, lang_pred) for lineage.

    * quality gate: ≥ min_tokens whitespace tokens;
    * repetition gate: duplicate-line character fraction ≤
      max_dup_line_frac (None disables) — the Gopher boilerplate filter;
    * language gate: predicted language ∈ allowed_langs (None disables);
    * exact dedup: whitespace-normalized text groups keep min-id;
    * near-dup dedup: if a pair DataFrame (id_a, id_b) is supplied —
      typically minhash_lsh_pairs output — keep only each connected
      component's min-id representative; alternatively pass
      ``near_dup_index_dir`` (campaign mode, r4 VERDICT item 3) and the
      pairs are computed from the PERSISTED signature/shingle index —
      built once over the input corpus, reused by every later stage and
      ingest probe, no executor-storage localCheckpoint pin;
    * transforms (applied to the SURVIVORS, after all gates, so dedup
      fingerprints see the original bytes): collapse_repeated_lines
      rewrites text_col with consecutive duplicate lines removed
      (blank lines preserved; runs of blanks collapse to one);
      scrub_pii redacts emails/IPs/phones in place.

    The gates stay narrow projections + filters the scan evaluates in
    place; the transforms are projections over the (much smaller)
    survivor set — filter-first ordering preserved.
    """
    if near_dup_index_dir is not None:
        if near_dup_pairs is not None:
            raise ValueError(
                "curate_documents: pass near_dup_pairs OR near_dup_index_dir"
            )
        from .dedup import minhash_lsh_pairs

        near_dup_pairs = minhash_lsh_pairs(
            df, text_col, id_col,
            min_jaccard=near_dup_min_jaccard, index_dir=near_dup_index_dir,
        )
    gated = df.withColumn("n_tokens", token_count(text_col).cast("long")).filter(
        F.col("n_tokens") >= min_tokens
    )
    if max_dup_line_frac is not None:
        gated = (
            gated.withColumn("_lines", lines_array(text_col))
            .filter(dup_line_char_frac(F.col("_lines")) <= max_dup_line_frac)
            .drop("_lines")
        )
    gated = _with_lang_pred(gated, text_col)
    if allowed_langs is not None:
        gated = gated.filter(F.col("lang_pred").isin(list(allowed_langs)))
    kept = dedup_exact(gated, text_col, id_col)
    if near_dup_pairs is not None:
        # restrict the pair graph to SURVIVING ids first: the cluster
        # representative (min id) must be chosen among survivors — with
        # the raw graph, a cluster whose min-id member was removed by a
        # gate or exact dedup had NO surviving representative and every
        # remaining member was silently dropped (r3 review).  Filtering
        # edges may split a cluster whose only link was a removed doc;
        # keeping both halves is the conservative semantics (their
        # similarity was only ever transitive through the removed doc).
        ids = kept.select(F.col(id_col).alias("_kid"))
        pairs_kept = near_dup_pairs.join(
            ids.withColumnRenamed("_kid", "id_a"), "id_a", "left_semi"
        ).join(ids.withColumnRenamed("_kid", "id_b"), "id_b", "left_semi")
        assigned = assign_duplicate_clusters(kept, pairs_kept, id_col)
        kept = assigned.filter(F.col("keep")).drop("cluster_id", "keep")
    if collapse_repeated_lines:
        # RAW newline split (not lines_array, which drops empties): the
        # collapse must remove only consecutive DUPLICATE lines — blank
        # lines are preserved (runs of blanks collapse to one, as equal
        # consecutive lines), so paragraph structure survives (r3 review:
        # the old form deleted every blank line corpus-wide).
        kept = (
            kept.withColumn("_lines", F.split(F.col(text_col), "\n"))
            .withColumn(text_col, F.concat_ws("\n", dedup_consecutive(F.col("_lines"))))
            .drop("_lines")
        )
    if scrub_pii:
        kept = kept.withColumn(text_col, redact_pii(text_col))
    return kept


def curation_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    allowed_langs: Optional[list[str]] = None,
) -> DataFrame:
    """One-row funnel report: how many documents each gate removed.  One
    multi-aggregate pass over the gate columns (no curation materialized,
    no shuffle — the gates are narrow projections the scan evaluates)."""
    flags = (
        _with_lang_pred(
            df.withColumn("n_tokens", token_count(text_col).cast("long")), text_col
        )
        .select(
            (F.col("n_tokens") >= min_tokens).alias("q_ok"),
            (
                F.col("lang_pred").isin(list(allowed_langs))
                if allowed_langs is not None
                else F.lit(True)
            ).alias("l_ok"),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum((~F.col("q_ok")).cast("long")).alias("dropped_quality"),
        F.sum((F.col("q_ok") & ~F.col("l_ok")).cast("long")).alias("dropped_lang"),
        F.sum((F.col("q_ok") & F.col("l_ok")).cast("long")).alias("survivors_pre_dedup"),
    )
