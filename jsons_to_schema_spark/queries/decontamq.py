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
from ._registry import query


# ===========================================================================
# Round-3 additions: decontamination, sequence packing, split anomalies,
# snapshot-compat verdicts
# ===========================================================================

@query(
    "decontam_documents",
    oracle="""
    WITH ng AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 5
             THEN list_transform(generate_series(1, len(t) - 4),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                       t[i+3] || ' ' || t[i+4])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), ev AS (
      SELECT DISTINCT unnest(g) AS ngram FROM ng WHERE doc_id % 83 = 0
    ), probe AS (
      SELECT doc_id, unnest(g) AS ngram FROM ng
    )
    SELECT doc_id, count(*) AS n_hits, min(ngram) AS first_hit
    FROM probe JOIN ev USING (ngram)
    GROUP BY doc_id
    """,
)
def decontam_documents(spark, sf_dir) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing a
    word 5-gram with the (synthetic) eval set — docs with doc_id % 83 == 0
    stand in for the benchmark.  Broadcast semi-join probe: the corpus side
    never shuffles; only hits reach the per-doc aggregate (decontam.py)."""
    from ..operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    hits = decontam.contamination_hits(docs, ev, "text", "doc_id", n=5)
    return hits.select(
        F.col("id").alias("doc_id"), F.col("n_hits"), F.col("first_hit")
    )


@query(
    "contamination_spans_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), ev AS (
      SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                      t[i+3] || ' ' || t[i+4] AS ngram
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM toks WHERE doc_id % 83 = 0 AND len(t) >= 5)
    ), probe AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
             t[i+3] || ' ' || t[i+4] AS ngram
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM toks WHERE len(t) >= 5)
    ), hits AS (
      SELECT p.doc_id, p.pos FROM probe p JOIN ev USING (ngram)
    ), lagged AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM hits
    ), isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 5
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM lagged
    )
    SELECT doc_id, min(pos) AS span_start, max(pos) + 5 AS span_end,
           max(pos) + 5 - min(pos) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM isl GROUP BY doc_id, island
    """,
)
def contamination_spans_documents(spark, sf_dir) -> DataFrame:
    """Span-level contamination evidence (decontam.contamination_spans):
    the maximal token ranges of each training document covered by eval
    5-grams (eval = the %83 doc slice) — the surgical-excision companion
    to the doc-level verdicts.  Eval members report their full text as
    one span; incidental sharers report short interior runs.  The oracle
    replays the positional probe and the islands merge relationally, so
    every span boundary and per-run gram count is value-checked."""
    from ..operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    sp = decontam.contamination_spans(docs, ev, "text", "doc_id", n=5)
    return sp.select(
        F.col("id").alias("doc_id"),
        "span_start",
        "span_end",
        "n_tokens",
        "n_hit_grams",
    )


@query(
    "decontam_bloom_documents",
    oracle="""
    WITH ng AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 5
             THEN list_transform(generate_series(1, len(t) - 4),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                       t[i+3] || ' ' || t[i+4])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), ev AS (
      SELECT DISTINCT unnest(g) AS ngram FROM ng WHERE doc_id % 83 = 0
    ), dirty AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest(g) AS ngram FROM ng) p
      JOIN ev USING (ngram)
    )
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
)
def decontam_bloom_documents(spark, sf_dir) -> DataFrame:
    """Bloom-prefilter decontamination (decontam.decontaminate_bloom +
    operators/bloom.py): same synthetic eval set as decontam_documents
    (doc_id % 83), but the corpus probes a Bloom BITMAP of the eval
    n-grams instead of a broadcast row set — the plan that survives a
    10^9-n-gram benchmark registry.  Exact verification of the bitmap's
    candidates removes false positives, so survivors equal the exact
    anti-join's survivors — which is precisely what the oracle checks."""
    from ..operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    clean = decontam.decontaminate_bloom(
        docs, ev, "text", "doc_id", n=5, fpp=0.01
    )
    return clean.select("doc_id", "source", "n_chars")


@query(
    "contamination_share_documents",
    oracle="""
    WITH ng AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 5
             THEN list_transform(generate_series(1, len(t) - 4),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                       t[i+3] || ' ' || t[i+4])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), ev AS (
      SELECT DISTINCT unnest(g) AS ngram FROM ng WHERE doc_id % 83 = 0
    ), probe AS (
      SELECT doc_id, unnest(g) AS ngram FROM ng
    ), h AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM probe JOIN ev USING (ngram) GROUP BY 1
    ), base AS (
      SELECT doc_id, CAST(len(g) AS INT) AS n_ngrams FROM ng
    )
    SELECT b.doc_id, b.n_ngrams,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN b.n_ngrams > 0
                THEN round(coalesce(h.n_contaminated, 0) / b.n_ngrams, 6)
           END AS share,
           CASE WHEN b.n_ngrams > 0
                THEN round(coalesce(h.n_contaminated, 0) / b.n_ngrams, 6)
                     >= CAST(0.5 AS DOUBLE)
           END AS flagged
    FROM base b LEFT JOIN h USING (doc_id)
    """,
)
def contamination_share_documents(spark, sf_dir) -> DataFrame:
    """Graded contamination (decontam.contamination_share): the fraction
    of each training document's distinct 5-grams found in the synthetic
    eval set (doc_id % 83, the decontam_documents convention) — eval
    members themselves grade 1.0 and flag at the 0.5 near-copy
    threshold, incidental single-shingle overlaps grade ~0.03 and pass;
    every doc gets a row (the binary gate only reports hits).  The
    threshold compares against CAST(0.5 AS DOUBLE) in the oracle — DuckDB
    would otherwise parse the literal as DECIMAL and flip boundary
    values (the heavy_hitters rule)."""
    from ..operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    out = decontam.contamination_share(
        docs, ev, "text", "doc_id", n=5, threshold=0.5
    )
    return out.withColumnRenamed("id", "doc_id")


@query(
    "leakage_safe_split_documents",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id < 200 THEN doc_id - doc_id % 4
                  ELSE doc_id END AS cluster_id
      FROM documents
    )
    SELECT doc_id, lang, cluster_id,
           CASE WHEN substr(md5('7' || chr(31)
                     || CAST(cluster_id AS VARCHAR)), 1, 8) < 'cccccccd'
                THEN 'train'
                WHEN substr(md5('7' || chr(31)
                     || CAST(cluster_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'val'
                ELSE 'test' END AS split
    FROM c
    """,
)
def leakage_safe_split_documents(spark, sf_dir) -> DataFrame:
    """Leakage-safe train/val/test split (sample.leakage_safe_split):
    every doc below 200 is linked to the head of its group of four, so
    the connected components are 50 four-doc clusters plus 300
    singletons, and the 80/10/10 decision hashes the CLUSTER
    representative — near-duplicates can never straddle the train/eval
    boundary.  The oracle derives the same cluster ids from the planted
    construction and replays the identical md5-interval assignment, so a
    hash match proves the CC labels AND the split decision row-for-row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = docs.filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 4 != 0)
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") - F.col("doc_id") % 4).alias("id_b"),
    )
    return sample.leakage_safe_split(
        docs,
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        pairs,
        seed=7,
    )


@query(
    "blocklist_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split(text, ' '),
                            x -> x <> ''), t -> lower(t)) AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    h AS (
      SELECT doc_id,
             list_filter(tk, t -> list_contains(
               ['ghostword', 'join', 'merge'], t)) AS hits
      FROM toks
    )
    SELECT doc_id,
           CAST(len(hits) AS BIGINT) AS n_hits,
           CAST(len(list_distinct(hits)) AS BIGINT) AS n_terms_hit,
           list_sort(list_distinct(hits)) AS terms_hit
    FROM h WHERE len(hits) > 0
    """,
)
def blocklist_documents(spark, sf_dir) -> DataFrame:
    """Blocklist hit profile (text.blocklist_scan) over terms chosen to
    exercise both arms: 'join'/'merge' occur throughout the corpus,
    'ghostword' never — and matching is TOKEN-exact by contract (the
    Scunthorpe guard: substring scanning flags 'class' for 'ass',
    pytest-pinned).  One broadcast-literal filter projection, no
    shuffle; only hit documents return (the review queue).  Every row
    including the sorted evidence arrays value-checked."""
    from ..operators.text import blocklist_scan

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_scan(
        docs, "text", "doc_id", ["ghostword", "join", "merge"]
    )
