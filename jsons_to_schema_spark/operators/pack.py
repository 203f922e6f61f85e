"""Sequence packing — assign documents to fixed-token-budget training
sequences.

LLM pre-training consumes fixed-length sequences (e.g. 4096 tokens); the
corpus is variable-length documents.  The standard streaming packer
concatenates documents in a deterministic order and cuts every ``budget``
tokens — a document's sequence is decided purely by the running token count
before it.  That is a prefix-sum, which Spark expresses as a window
cumulative sum.

Scale design — the one decision that matters: the window is partitioned by
a SHARD column (source / input file / date bucket), never global.  An
unpartitioned orderBy window is a single-task bottleneck — at 100 TB it
serializes the whole corpus through one executor.  Real training pipelines
pack within shards anyway (shards are shuffled at the data-loader level),
so per-shard packing is the semantically-right AND scale-right shape: each
shard's cumsum runs independently after one hash-partition-by-shard
shuffle, and skewed shards can be pre-split by a salt column folded into
the shard key.

Everything is integer arithmetic over a deterministic (shard, id) order —
bit-identical on any engine/partitioning, so the driver query is exactly
SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    shard_col: str,
    budget: int,
    n_tokens: Column | None = None,
    text_col: str = "text",
    sep_tokens: int = 1,
) -> DataFrame:
    """Per-document sequence assignment: (id, shard, n_tokens, seq_id,
    seq_offset).

    ``seq_id`` = ``shard#k`` where k = floor(tokens-before-this-doc /
    budget) within the shard's (id-ordered) document stream; ``seq_offset``
    is the document's start position inside that sequence.  ``sep_tokens``
    models the EOS/separator appended after each document (count it the way
    the tokenizer will, or packing drifts from reality).  Documents longer
    than ``budget`` span multiple sequences — they are assigned to the
    sequence their first token lands in, same as the streaming packer.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = (n_tokens if n_tokens is not None else token_count(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        (toks + F.lit(sep_tokens)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("id")
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("_start")
    return base.select(
        "id",
        "shard",
        "n_tokens",
        start,
    ).select(
        "id",
        "shard",
        "n_tokens",
        F.concat_ws(
            "#", F.col("shard"), F.floor(F.col("_start") / budget).cast("string")
        ).alias("seq_id"),
        (F.col("_start") % budget).cast("long").alias("seq_offset"),
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing report.  The concat-and-cut packer consumes exactly
    ceil(total_tokens/budget) sequences (it never leaves a mid-stream gap),
    so ``n_sequences`` is that exact count and ``fill_ratio`` ∈ (0, 1]
    measures only the final partial sequence.  ``n_doc_start_sequences``
    counts sequences where at least one document BEGINS — the gap vs
    n_sequences is how many sequences are fully inside one long document
    (a high gap means budget ≪ document length: revisit chunking).  The
    report exists to catch budget/sep misconfiguration, not to tune the
    packer (it is already token-optimal)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("seq_id").alias("n_doc_start_sequences"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / budget).cast("long").alias("n_sequences"),
            "n_doc_start_sequences",
            F.round(
                F.col("total_tokens")
                / (F.ceil(F.col("total_tokens") / budget) * budget),
                6,
            ).alias("fill_ratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into token-budget chunks with optional overlap —
    the upstream complement of pack_sequences (chunk first so no single
    document exceeds the context budget, then pack the chunks).

    One JVM projection per row: tokenize once (layered select so the token
    array is an attribute, not re-evaluated), explode the chunk-start
    offsets (sequence with stride chunk_tokens - overlap), slice each
    chunk out of the token array.  The fan-out is row-local — no shuffle —
    and bounded by ceil(n/stride) rows per doc.  Output (id, chunk_start,
    n_chunk_tokens, chunk_text); empty documents yield no chunks.  A tail
    start whose window adds NO new tokens (start + overlap >= n, i.e. the
    chunk is fully contained in its predecessor) is suppressed — emitting
    it would duplicate up to ``overlap`` tokens as a standalone chunk.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    from .text import tokens

    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).select("id", "_t", F.size("_t").alias("_n")).filter(F.col("_n") > 0)
    exploded = base.select(
        "id",
        "_t",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
                lambda s: (s == 0) | (s + overlap < F.col("_n")),
            )
        ).alias("chunk_start"),
    )
    chunk = F.slice(F.col("_t"), F.col("chunk_start") + 1, chunk_tokens)
    return exploded.select(
        "id",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
