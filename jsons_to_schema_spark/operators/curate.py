"""End-to-end corpus curation — the composition a training-data pipeline
actually runs: quality gate → language gate → exact-dedup keep-one →
(optional) near-dup cluster keep-one.

Every stage reuses the engine's oracled operators (text.token_count,
text.lang_id, dedup.dedup_exact / assign_duplicate_clusters), so the whole
pipeline is one declarative plan Catalyst optimizes end-to-end: the gates
are pushed filters over one narrow projection, the dedup keep is a
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
from .text import lang_id, token_count


def curate_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    allowed_langs: Optional[list[str]] = None,
    near_dup_pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Curated corpus: rows surviving every gate, one representative per
    duplicate group.  Returns the input columns plus the gate columns
    (n_tokens, lang_pred) for lineage.

    * quality gate: ≥ min_tokens whitespace tokens;
    * language gate: predicted language ∈ allowed_langs (None disables);
    * exact dedup: whitespace-normalized text groups keep min-id;
    * near-dup dedup: if a pair DataFrame (id_a, id_b) is supplied —
      typically minhash_lsh_pairs output — keep only each connected
      component's min-id representative.
    """
    gated = df.withColumn("n_tokens", token_count(text_col).cast("long")).filter(
        F.col("n_tokens") >= min_tokens
    )
    preds = lang_id(gated, text_col, id_col)
    gated = gated.join(preds.select(id_col, "lang_pred"), id_col)
    if allowed_langs is not None:
        gated = gated.filter(F.col("lang_pred").isin(list(allowed_langs)))
    kept = dedup_exact(gated, text_col, id_col)
    if near_dup_pairs is not None:
        assigned = assign_duplicate_clusters(kept, near_dup_pairs, id_col)
        kept = assigned.filter(F.col("keep")).drop("cluster_id", "keep")
    return kept


def curation_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    allowed_langs: Optional[list[str]] = None,
) -> DataFrame:
    """One-row funnel report: how many documents each gate removed.  One
    multi-aggregate pass over the gate columns (no curation materialized)."""
    preds = lang_id(df, text_col, id_col).select(id_col, "lang_pred")
    flags = (
        df.withColumn("n_tokens", token_count(text_col).cast("long"))
        .join(preds, id_col)
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
