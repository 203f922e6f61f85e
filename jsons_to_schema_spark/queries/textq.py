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


@query(
    "quality_documents",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_text,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 / greatest(length(text), 1), 6) AS digit_ratio,
           (len(list_filter(string_split(text, ' '), x -> x <> '')) >= 5) AS length_ok
    FROM documents
    """,
)
def quality_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_features(docs, "text", "doc_id")
    return q.select(
        "doc_id",
        F.col("n_chars_text").cast("long").alias("n_chars_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "punct_ratio",
        "digit_ratio",
        "length_ok",
    )


@query(
    "lang_id_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), best AS (
      SELECT doc_id, list_max([
        {'score': len(list_intersect(t, ['der','die','das','und','nicht','ist','ich','von'])), 'lang': 'de'},
        {'score': len(list_intersect(t, ['the','and','of','to','in','is','that','for'])), 'lang': 'en'},
        {'score': len(list_intersect(t, ['el','la','de','que','y','los','en','por'])), 'lang': 'es'},
        {'score': len(list_intersect(t, ['le','la','les','de','et','est','que','une'])), 'lang': 'fr'},
        {'score': len(list_intersect(t, ['il','la','di','che','e','per','non','una'])), 'lang': 'it'}
      ]) AS b FROM toks
    )
    SELECT doc_id,
           CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
           CAST(b.score AS int) AS lang_score
    FROM best
    """,
)
def lang_id_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs, "text", "doc_id")


@query(
    "fingerprint_documents",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_exact,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id, fp_exact,
           md5(list_aggregate(list_sort(list_distinct(
             CASE WHEN len(t) >= 3
                  THEN list_transform(generate_series(1, len(t) - 2),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [] END)), 'string_agg', chr(0))) AS fp_shingle
    FROM sh
    """,
)
def fingerprint_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "text", "doc_id")


# The driver documents are single-line and PII-free, so the repetition and
# PII operators would be exercised on degenerate input.  Both queries plant
# structure with ONE SQL expression evaluated identically by Spark (F.expr)
# and DuckDB (inlined in the oracle) — engine-portable SQL (chr/substring/
# lpad/case), deterministic per doc_id, no synthesized side data.
_PLANT_REPETITION = (
    "concat(text, chr(10), substring(text, 1, 20 + cast(doc_id % 30 as int)), "
    "chr(10), case when doc_id % 3 = 0 then "
    "concat(substring(text, 1, 20 + cast(doc_id % 30 as int)), chr(10)) "
    "else '' end, text)"
)


_PLANT_PII = (
    "concat(text, ' reach user', cast(doc_id as string), '@example.com or 10.', "
    "cast(doc_id % 256 as string), '.0.1 tel 555-010-', "
    "lpad(cast(doc_id % 10000 as string), 4, '0'), "
    "case when doc_id % 5 = 0 then ' cc admin@test.org' else '' end)"
)


@query(
    "repetition_documents",
    oracle=f"""
    WITH planted AS (SELECT doc_id, {_PLANT_REPETITION} AS t FROM documents),
    lx AS (SELECT doc_id,
                  list_filter(string_split(t, chr(10)), x -> x <> '') AS l
           FROM planted),
    kx AS (SELECT doc_id, l,
                  list_filter(l, (x, i) -> i = 1 OR x <> l[i-1]) AS kept
           FROM lx)
    SELECT doc_id,
           cast(len(l) AS bigint) AS n_lines,
           cast(len(l) - len(list_distinct(l)) AS bigint) AS n_dup_lines,
           round((cast(coalesce(list_aggregate(list_transform(l, x -> length(x)), 'sum'), 0) AS bigint)
                  - cast(coalesce(list_aggregate(list_transform(list_distinct(l), x -> length(x)), 'sum'), 0) AS bigint))
                 / greatest(cast(coalesce(list_aggregate(list_transform(l, x -> length(x)), 'sum'), 0) AS bigint), 1),
                 6) AS dup_line_char_frac,
           md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)), '')) AS fp_line_dedup,
           cast(len(l) - len(kept) AS bigint) AS n_consecutive_removed
    FROM kx
    """,
)
def repetition_documents(spark, sf_dir) -> DataFrame:
    """Gopher-style intra-document repetition signals + consecutive-dup-line
    collapse over planted multi-line documents.  Pure codegen projection —
    no shuffle, no Python (operators/text.py:repetition_features)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PLANT_REPETITION).alias("text")
    )
    return text.repetition_features(docs, "text", "doc_id")


@query(
    "top_bigram_documents",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS t
                 FROM documents),
    g AS (SELECT doc_id,
                 unnest(CASE WHEN len(t) >= 2
                        THEN list_transform(generate_series(1, len(t) - 1),
                                            i -> t[i] || ' ' || t[i+1])
                        ELSE [] END) AS t
          FROM tok),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM g GROUP BY doc_id, t),
    agg AS (SELECT doc_id, max({'c': c, 't': t}) AS b, sum(c) AS n
            FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           b.t AS top_token,
           cast(b.c AS bigint) AS top_token_count,
           round(b.c / n, 6) AS top_token_frac
    FROM agg
    """,
)
def top_bigram_documents(spark, sf_dir) -> DataFrame:
    """Top word-2-gram share (the Gopher top-n-gram repetition signal at
    n=2): aligned-slice shingles (no per-element lambda re-evaluation) →
    explode → two-stage aggregate (operators/text.py:top_ngram_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.top_ngram_stats(docs, "text", "doc_id", n=2)


@query(
    "pii_scrub_documents",
    oracle=rf"""
    WITH planted AS (SELECT doc_id, {_PLANT_PII} AS t FROM documents)
    SELECT doc_id,
           cast(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS bigint) AS n_email,
           cast(len(regexp_extract_all(t, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS bigint) AS n_ipv4,
           cast(len(regexp_extract_all(t, '\b\d{{3}}-\d{{3}}-\d{{4}}\b')) AS bigint) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IPV4>', 'g'),
                 '\b\d{{3}}-\d{{3}}-\d{{4}}\b', '<PHONE>', 'g')) AS fp_redacted
    FROM planted
    """,
)
def pii_scrub_documents(spark, sf_dir) -> DataFrame:
    """PII detection + redaction over planted emails/IPs/phones.  Patterns
    restricted to the Java-regex ∩ RE2 common dialect so Spark and the
    DuckDB oracle redact byte-identically (operators/text.py:pii_scrub)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PLANT_PII).alias("text")
    )
    return text.pii_scrub(docs, "text", "doc_id")


@query(
    "curation_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), best AS (
      SELECT doc_id, list_max([
        {'score': len(list_intersect(t, ['der','die','das','und','nicht','ist','ich','von'])), 'lang': 'de'},
        {'score': len(list_intersect(t, ['the','and','of','to','in','is','that','for'])), 'lang': 'en'},
        {'score': len(list_intersect(t, ['el','la','de','que','y','los','en','por'])), 'lang': 'es'},
        {'score': len(list_intersect(t, ['le','la','les','de','et','est','que','une'])), 'lang': 'fr'},
        {'score': len(list_intersect(t, ['il','la','di','che','e','per','non','una'])), 'lang': 'it'}
      ]) AS b FROM toks
    ), flags AS (
      SELECT toks.doc_id, toks.text, len(t) AS n_tokens,
             CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred
      FROM toks JOIN best ON toks.doc_id = best.doc_id
    ), gated AS (
      SELECT * FROM flags WHERE n_tokens >= 40 AND lang_pred IN ('en')
    ), fp AS (
      SELECT doc_id, n_tokens, lang_pred,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM gated
    ), keep AS (
      SELECT f, min(doc_id) AS m FROM fp GROUP BY f
    )
    SELECT fp.doc_id, CAST(fp.n_tokens AS BIGINT) AS n_tokens, fp.lang_pred
    FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.m
    """,
)
def curation_documents(spark, sf_dir) -> DataFrame:
    """The end-to-end curation funnel a training-data pipeline runs —
    quality gate (≥40 tokens) → language gate (predicted 'en') → exact-dedup
    keep-one — as ONE declarative plan over the engine's oracled operators
    (operators/curate.py).  Fully reproduced in SQL."""
    from jsons_to_schema_spark.operators.curate import curate_documents

    docs = load_table(spark, sf_dir, "documents")
    kept = curate_documents(
        docs, "text", "doc_id", min_tokens=40, allowed_langs=["en"]
    )
    return kept.select("doc_id", "n_tokens", "lang_pred")


# Full-funnel planting: line 1 carries a planted email (PII stage), lines
# 2..k replay the repetition planting (repetition gate + collapse stage).
_PLANT_FULL = (
    "concat(text, ' reach user', cast(doc_id as string), '@example.com', "
    "chr(10), substring(text, 1, 20 + cast(doc_id % 30 as int)), chr(10), "
    "case when doc_id % 3 = 0 then "
    "concat(substring(text, 1, 20 + cast(doc_id % 30 as int)), chr(10)) "
    "else '' end, text)"
)


@query(
    "curation_full_documents",
    oracle=rf"""
    WITH planted AS (SELECT doc_id, {_PLANT_FULL} AS text FROM documents),
    toks AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS t,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS l
      FROM planted
    ), best AS (
      SELECT doc_id, list_max([
        {{'score': len(list_intersect(t, ['der','die','das','und','nicht','ist','ich','von'])), 'lang': 'de'}},
        {{'score': len(list_intersect(t, ['the','and','of','to','in','is','that','for'])), 'lang': 'en'}},
        {{'score': len(list_intersect(t, ['el','la','de','que','y','los','en','por'])), 'lang': 'es'}},
        {{'score': len(list_intersect(t, ['le','la','les','de','et','est','que','une'])), 'lang': 'fr'}},
        {{'score': len(list_intersect(t, ['il','la','di','che','e','per','non','una'])), 'lang': 'it'}}
      ]) AS b FROM toks
    ), flags AS (
      SELECT toks.doc_id, toks.text, toks.l, len(t) AS n_tokens,
             CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
             (cast(coalesce(list_aggregate(list_transform(l, x -> length(x)), 'sum'), 0) AS bigint)
              - cast(coalesce(list_aggregate(list_transform(list_distinct(l), x -> length(x)), 'sum'), 0) AS bigint))
             / greatest(cast(coalesce(list_aggregate(list_transform(l, x -> length(x)), 'sum'), 0) AS bigint), 1)
               AS dlf
      FROM toks JOIN best ON toks.doc_id = best.doc_id
    ), gated AS (
      SELECT * FROM flags
      WHERE n_tokens >= 40 AND dlf <= 0.05 AND lang_pred IN ('en')
    ), fp AS (
      SELECT doc_id, text, l, n_tokens, lang_pred,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
      FROM gated
    ), keep AS (
      SELECT f, min(doc_id) AS m FROM fp GROUP BY f
    ), surv AS (
      SELECT fp.doc_id, fp.n_tokens, fp.lang_pred,
             coalesce(list_aggregate(
               list_filter(string_split(fp.text, chr(10)),
                           (x, i) -> i = 1 OR x <> string_split(fp.text, chr(10))[i-1]),
               'string_agg', chr(10)), '') AS collapsed
      FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.m
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, lang_pred,
           md5(regexp_replace(regexp_replace(regexp_replace(collapsed,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IPV4>', 'g'),
                 '\b\d{{3}}-\d{{3}}-\d{{4}}\b', '<PHONE>', 'g')) AS fp_curated
    FROM surv
    """,
)
def curation_full_documents(spark, sf_dir) -> DataFrame:
    """The COMPLETE curation funnel — quality gate → Gopher repetition gate
    (dup-line char fraction ≤ 0.05) → language gate → exact-dedup keep-one →
    consecutive-dup-line collapse → PII redaction — as one declarative plan
    over planted multi-line + planted-email documents, every stage
    reproduced in the SQL oracle (operators/curate.py)."""
    from jsons_to_schema_spark.operators.curate import curate_documents

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PLANT_FULL).alias("text")
    )
    kept = curate_documents(
        docs,
        "text",
        "doc_id",
        min_tokens=40,
        allowed_langs=["en"],
        max_dup_line_frac=0.05,
        collapse_repeated_lines=True,
        scrub_pii=True,
    )
    return kept.select(
        "doc_id", "n_tokens", "lang_pred", F.md5("text").alias("fp_curated")
    )


@query(
    "repeated_spans_documents",
    oracle="""
    WITH sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 8
             THEN list_transform(generate_series(1, len(t) - 7),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                       t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                       t[i+6] || ' ' || t[i+7])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), s AS (
      SELECT doc_id, unnest(g) AS span FROM sh
    ), c AS (
      SELECT span, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS example_id
      FROM s GROUP BY span
    )
    SELECT span, n_docs, example_id FROM c
    WHERE n_docs >= 2 ORDER BY n_docs DESC, span LIMIT 20
    """,
)
def repeated_spans_documents(spark, sf_dir) -> DataFrame:
    """Most-duplicated long token spans corpus-wide (text.
    repeated_span_report, 8-token windows) — the Spark-native reporting
    half of suffix-array exact-substring dedup: names the boilerplate /
    template spans worth cutting; exact SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repeated_span_report(
        docs, "text", "doc_id", window=8, min_docs=2, top_k=20
    )


@query(
    "excise_repeated_spans_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), p AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             array_to_string(t[i:i+7], ' ') AS span
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
            FROM toks WHERE len(t) >= 8)
    ), hot AS (
      SELECT span FROM p GROUP BY span HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT p.doc_id, p.pos FROM p JOIN hot USING (span)
    ), lagged AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM hits
    ), isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 8
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM lagged
    ), rg AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
      FROM isl GROUP BY doc_id, island
    ), rga AS (
      SELECT doc_id, list({'s': s, 'e': e}) AS ranges,
             CAST(count(*) AS BIGINT) AS n_spans_excised
      FROM rg GROUP BY doc_id
    ), built AS (
      SELECT toks.doc_id,
             CASE WHEN rga.doc_id IS NULL
                  THEN t
                  ELSE list_transform(
                         list_filter(generate_series(1, len(t)),
                           i -> len(list_filter(rga.ranges,
                                  r -> i - 1 >= r.s AND i - 1 < r.e)) = 0),
                         i -> t[i]) END AS kept,
             t, coalesce(rga.n_spans_excised, 0) AS n_spans_excised
      FROM toks LEFT JOIN rga USING (doc_id)
    )
    SELECT doc_id AS id,
           coalesce(array_to_string(kept, ' '), '') AS text,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_removed,
           n_spans_excised
    FROM built
    """,
)
def excise_repeated_spans_documents(spark, sf_dir) -> DataFrame:
    """Repeated-span EXCISION (text.excise_repeated_spans) — the cut half
    of Lee-et-al exact-substring dedup: every token range covered by an
    8-gram shared across ≥2 documents is removed in place (1,015 hot
    spans occur naturally at sf0.01, so the excision set is dense), the
    unique remainder kept under one consistent token-rebuild
    normalization.  The oracle replays windows → hot set → islands →
    range-filtered rebuild relationally, value-checking every rebuilt
    document string and removal count."""
    docs = load_table(spark, sf_dir, "documents")
    return text.excise_repeated_spans(
        docs, "text", "doc_id", window=8, min_docs=2
    )


_UNICODE_PLANTS = [
    (1, "École"),
    (2, "café au lait"),
    (3, "naïve APPROACH"),
    (4, "école"),  # decomposed: e + combining acute
    (5, "ZÜRICH and ångström"),
    (6, "plain ascii stays put"),
    (7, None),
]


@query(
    "normalize_text_unicode",
    oracle="""
    SELECT id, strip_accents(nfc_normalize(lower(s))) AS norm_text
    FROM (VALUES (1, 'École'), (2, 'café au lait'), (3, 'naïve APPROACH'),
                 (4, 'e' || chr(769) || 'cole'),
                 (5, 'ZÜRICH and ångström'),
                 (6, 'plain ascii stays put'),
                 (7, CAST(NULL AS VARCHAR))) AS t(id, s)
    """,
)
def normalize_text_unicode(spark, sf_dir) -> DataFrame:
    """Unicode canonicalization parity on PLANTED non-ASCII strings
    (composed, decomposed, mixed-case, null): the Arrow kernel
    (text.normalize_text) must agree byte-for-byte with DuckDB's
    strip_accents(nfc_normalize(lower(s))) — the property that makes
    normalized dedup keys engine-portable."""
    df = spark.createDataFrame(_UNICODE_PLANTS, "id long, text string")
    return text.normalize_text(df, "text", "id")


@query(
    "lm_perplexity_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    ),
    prs AS (
      SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
    ),
    dpair AS (
      SELECT doc_id, w1, w2, count(*) AS m FROM prs GROUP BY 1, 2, 3
    ),
    c2 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c2 FROM dpair GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (
      SELECT count(*) AS v FROM (
        SELECT w1 AS w FROM c2 UNION SELECT w2 FROM c2
      )
    ),
    terms AS (
      SELECT d.doc_id, d.m,
             d.m * ln((c1.c1 + 0.5 * v.v) / (c2.c2 + 0.5)) AS term
      FROM dpair d
      JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
    ),
    per AS (
      SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             sum(term) / sum(m) AS ce
      FROM terms GROUP BY 1
    )
    SELECT ids.doc_id,
           CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           round(per.ce, 6) AS cross_entropy,
           round(exp(per.ce), 6) AS perplexity
    FROM (SELECT DISTINCT doc_id FROM documents) ids
    LEFT JOIN per USING (doc_id)
    """,
)
def lm_perplexity_documents(spark, sf_dir) -> DataFrame:
    """CCNet-style statistical quality scoring (text.lm_bigram_scores):
    every document's cross-entropy under an add-k bigram LM trained on
    the corpus itself — template/boilerplate text scores low, garbled
    text high.  Tokenize once, pair via array slices (no self-join),
    per-doc bigram counts compress map-side before the model joins; the
    model tables are bigram-vocabulary-sized, never corpus-sized.  The
    oracle retrains the identical model in SQL; per-doc round(6) keeps
    the comparison summation-order-proof."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lm_bigram_scores(docs, "text", "doc_id")


@query(
    "corpus_composition_documents",
    oracle="""
    WITH g AS (
      SELECT CAST(source AS VARCHAR) AS group_value,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(n_chars, 0)) AS DOUBLE) AS mass
      FROM documents GROUP BY 1
    ), t AS (SELECT sum(n_docs) AS td, sum(mass) AS tm FROM g)
    SELECT g.group_value, g.n_docs, g.mass,
           round(g.n_docs / t.td, 6) AS doc_share,
           CASE WHEN t.tm > 0 THEN round(g.mass / t.tm, 6) END AS mass_share
    FROM g, t
    """,
)
def corpus_composition_documents(spark, sf_dir) -> DataFrame:
    """Corpus composition (stats.corpus_composition): per-source document
    counts and char-mass with round-6 shares — the one-scan readout every
    mixture decision starts from; shares fold via a window over the
    bounded group table (the corpus never rescans)."""
    docs = load_table(spark, sf_dir, "documents")
    return stats.corpus_composition(docs, "source", "n_chars")


@query(
    "c4_clean_documents",
    oracle=r"""
    WITH src AS (
      SELECT doc_id,
        'This opening sentence has plenty of words.' || chr(10) ||
        substr(text, 1, 40) || chr(10) ||
        CASE WHEN doc_id % 7 = 0
             THEN 'Please enable javascript to continue browsing now.'
             ELSE 'Another fine sentence appears right here.' END
        || chr(10) ||
        CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum dolor sit amet.'
             ELSE 'Closing sentence ends with a period.' END ||
        CASE WHEN doc_id % 13 = 0 THEN chr(10) || '{ code block }'
             ELSE '' END AS t
      FROM documents
    ),
    l AS (
      SELECT doc_id, t,
        list_filter(string_split(t, chr(10)),
                    x -> len(trim(x)) > 0) AS nonempty
      FROM src
    ),
    k AS (
      SELECT doc_id, t, len(nonempty) AS n_lines,
        list_transform(
          list_filter(nonempty, x ->
            right(trim(x), 1) IN ('.', '!', '?', '"')
            AND len(regexp_split_to_array(trim(x), '\s+')) >= 5
            AND NOT contains(lower(trim(x)), 'javascript')),
          x -> trim(x)) AS kept
      FROM l
    ),
    v AS (
      SELECT doc_id, n_lines, len(kept) AS n_kept_lines,
        CASE WHEN contains(lower(t), 'lorem ipsum') THEN 'lorem_ipsum'
             WHEN contains(t, '{') THEN 'brace'
             WHEN len(kept) < 3 THEN 'too_few_lines' END AS drop_reason,
        kept
      FROM k
    )
    SELECT doc_id,
           CAST(n_lines AS INT) AS n_lines,
           CAST(n_kept_lines AS INT) AS n_kept_lines,
           drop_reason IS NULL AS doc_kept,
           drop_reason,
           CASE WHEN drop_reason IS NULL
                THEN array_to_string(kept, chr(10)) END AS clean_text
    FROM v
    """,
)
def c4_clean_documents(spark, sf_dir) -> DataFrame:
    """C4 cleaning rules (text.c4_clean) over planted multi-line pages:
    every doc gets one always-kept sentence, one terminal-punct-less
    line (always dropped), a javascript line on doc_id%7 (line-dropped),
    a lorem-ipsum line on %11 (page-dropped), and a brace tail on %13
    (page-dropped) — so all four verdict arms (kept / lorem_ipsum /
    brace / too_few_lines) appear and the oracle re-derives the line
    filters with DuckDB list lambdas."""
    docs = load_table(spark, sf_dir, "documents")
    base = F.concat_ws(
        "\n",
        F.lit("This opening sentence has plenty of words."),
        F.substring(F.col("text"), 1, 40),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("Please enable javascript to continue browsing now."),
        ).otherwise(F.lit("Another fine sentence appears right here.")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("lorem ipsum dolor sit amet."),
        ).otherwise(F.lit("Closing sentence ends with a period.")),
    )
    txt = F.concat(
        base,
        F.when(F.col("doc_id") % 13 == 0, F.lit("\n{ code block }")).otherwise(
            F.lit("")
        ),
    )
    planted = docs.select("doc_id", txt.alias("t"))
    return text.c4_clean(planted, "doc_id", "t")


@query(
    "gopher_quality_documents",
    oracle=r"""
    WITH src AS (
      SELECT doc_id,
        CASE doc_id % 8
          WHEN 1 THEN 'the cat and the dog have fun with that ball of yarn to be sure '
                      || substr(text, 1, 200) || ' ' || repeat('#### ', 30)
          WHEN 2 THEN trim(repeat('12345 ', 60))
          WHEN 3 THEN 'tiny doc.'
          WHEN 4 THEN trim(repeat('aa ', 60))
          WHEN 5 THEN repeat('- bullet item words listed here' || chr(10), 10)
          WHEN 6 THEN repeat('the cat and the dog have fun with that ball of yarn...' || chr(10), 4)
                      || 'the clean tail line of words here'
          WHEN 7 THEN trim(repeat('giraffe elephant zebra lion tiger ', 13))
          ELSE 'the cat and the dog have fun with that ball of yarn to be sure '
               || substr(text, 1, 200)
        END AS t
      FROM documents
    ), parts AS (
      SELECT doc_id, t,
        list_filter(regexp_split_to_array(t, '\s+'), x -> x <> '') AS w,
        list_filter(string_split(t, chr(10)), x -> len(trim(x)) > 0) AS l,
        (len(t) - len(replace(t, '#', ''))) / 1.0 AS hsh,
        (len(t) - len(replace(t, '...', ''))) / 3.0
          + (len(t) - len(replace(t, '…', ''))) / 1.0 AS ell
      FROM src
    ), sig AS (
      SELECT doc_id,
        CAST(len(w) AS INT) AS n_words,
        CASE WHEN len(w) > 0 THEN
          round(list_sum(list_transform(w, x -> len(x))) / len(w), 6)
        END AS mean_word_len,
        CASE WHEN len(w) > 0 THEN round(hsh / len(w), 6) END
          AS hash_word_ratio,
        CASE WHEN len(w) > 0 THEN round(ell / len(w), 6) END
          AS ellipsis_word_ratio,
        CASE WHEN len(l) > 0 THEN
          round(len(list_filter(l, x ->
            substr(trim(x), 1, 1) = '-' OR substr(trim(x), 1, 1) = '*'
            OR substr(trim(x), 1, 1) = '•')) / len(l), 6)
        END AS frac_bullet_lines,
        CASE WHEN len(l) > 0 THEN
          round(len(list_filter(l, x ->
            trim(x) LIKE '%...' OR trim(x) LIKE '%…')) / len(l), 6)
        END AS frac_ellipsis_lines,
        CASE WHEN len(w) > 0 THEN
          round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                / len(w), 6)
        END AS frac_alpha_words,
        CAST(len(list_intersect(
          list_distinct(list_transform(w, x -> lower(x))),
          ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
          AS INT) AS n_stop_hits
      FROM parts
    )
    SELECT doc_id, n_words, mean_word_len, hash_word_ratio,
           ellipsis_word_ratio,
           frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
           n_stop_hits, drop_reason IS NULL AS keep, drop_reason FROM (
      SELECT doc_id, n_words, mean_word_len, hash_word_ratio,
             ellipsis_word_ratio,
             frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
             n_stop_hits,
             CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
                  WHEN mean_word_len < 3 OR mean_word_len > 10
                    THEN 'mean_word_length'
                  WHEN hash_word_ratio > 0.1 OR ellipsis_word_ratio > 0.1
                    THEN 'symbol_ratio'
                  WHEN frac_bullet_lines > 0.9 THEN 'bullet_lines'
                  WHEN frac_ellipsis_lines > 0.3 THEN 'ellipsis_lines'
                  WHEN frac_alpha_words < 0.8 THEN 'alpha_words'
                  WHEN n_stop_hits < 2 THEN 'stop_words'
             END AS drop_reason
      FROM sig
    )
    """,
)
def gopher_quality_documents(spark, sf_dir) -> DataFrame:
    """The published Gopher quality rules (text.gopher_quality_filter)
    over planted pages exercising every rule arm: doc_id % 7 selects
    keep / symbol-flood / digit-words / too-short / one-letter-words /
    all-bullets / ellipsis-lines / no-stop-words variants (doc_id % 8) (each constructed to pass the
    rules ORDERED BEFORE its target, so the first-failing-rule
    attribution is value-checked, not just the boolean); the oracle
    re-derives all seven signals with DuckDB list lambdas and the same
    length-difference substring counting."""
    docs = load_table(spark, sf_dir, "documents")
    keepbase = F.concat(
        F.lit(
            "the cat and the dog have fun with that ball of yarn to be sure "
        ),
        F.substring(F.col("text"), 1, 200),
    )
    arm = F.col("doc_id") % 8
    t = (
        F.when(arm == 1, F.concat(keepbase, F.lit(" "), F.repeat(F.lit("#### "), 30)))
        .when(arm == 2, F.trim(F.repeat(F.lit("12345 "), 60)))
        .when(arm == 3, F.lit("tiny doc."))
        .when(arm == 4, F.trim(F.repeat(F.lit("aa "), 60)))
        .when(arm == 5, F.repeat(F.lit("- bullet item words listed here\n"), 10))
        .when(
            arm == 6,
            F.concat(
                F.repeat(
                    F.lit(
                        "the cat and the dog have fun with that ball of yarn...\n"
                    ),
                    4,
                ),
                F.lit("the clean tail line of words here"),
            ),
        )
        .when(arm == 7, F.trim(F.repeat(F.lit("giraffe elephant zebra lion tiger "), 13)))
        .otherwise(keepbase)
    )
    planted = docs.select("doc_id", t.alias("t"))
    return text.gopher_quality_filter(planted, "doc_id", "t")


@query(
    "tfidf_top_terms_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1 HAVING count(*) >= 2),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(CAST(tf.tf AS DOUBLE)
                   * round(ln((1.0 + n.n) / (1.0 + dfreq.dfc)) + 1.0, 6),
                   6) AS score
      FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
      SELECT doc_id, term, tf, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def tfidf_top_terms_documents(spark, sf_dir) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF
    (text.tfidf_top_terms, k=3, min_df=2): one explode → two-stage hash
    aggregate on (doc, term); document frequency folds from that aggregate
    (rows-per-term — never a second corpus scan); idf is rounded to 6
    digits BEFORE the multiply so both engines rank identical doubles; the
    (score DESC, term ASC) tie-break is fully deterministic.  The oracle
    replays every step — tokenization, the df >= 2 noise floor, the
    smoothed-idf arithmetic, and the window rank — so all 1,500 rows at
    sf0.01 are value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, "text", "doc_id", k=3, min_df=2)


@query(
    "dsir_importance_documents",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, unnest(tk) AS gram FROM docs
      UNION ALL
      SELECT doc_id, lang, tk[i] || ' ' || tk[i + 1] AS gram
      FROM docs, unnest(range(1, len(tk))) AS r(i)
    ),
    b AS (SELECT doc_id, lang, substr(md5(gram), 1, 3) AS bucket FROM grams),
    rawc AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
    tgtc AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
    tot AS (SELECT (SELECT count(*) FROM b) AS tr,
                   (SELECT count(*) FROM b WHERE lang = 'en') AS tt),
    lr AS (
      SELECT rawc.bucket,
             CAST(round(1000000.0 * (
               ln((coalesce(ct, 0) + 1.0) / (tt + 4096.0))
               - ln((cr + 1.0) / (tr + 4096.0)))) AS BIGINT) AS lrm
      FROM rawc LEFT JOIN tgtc USING (bucket), tot
    ),
    dw AS (SELECT b.doc_id, sum(lrm) AS lr_micro
           FROM b JOIN lr USING (bucket) GROUP BY 1),
    alld AS (
      SELECT d.doc_id, CAST(coalesce(dw.lr_micro, 0) AS BIGINT) AS lr_micro
      FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
    ),
    thr AS (SELECT quantile_cont(CAST(lr_micro AS DOUBLE),
                                 CAST(0.75 AS DOUBLE)) AS t FROM alld)
    SELECT doc_id, lr_micro,
           round(lr_micro / 1000000.0, 6) AS log_weight,
           lr_micro >= thr.t AS selected
    FROM alld, thr
    """,
)
def dsir_importance_documents(spark, sf_dir) -> DataFrame:
    """DSIR importance resampling (text.dsir_select, arXiv 2302.03169):
    every document scored by how much likelier its hashed unigram+bigram
    profile is under the lang='en' TARGET slice than under the raw corpus,
    top 25% selected by quantile threshold.  The per-bucket log-ratio is
    rounded to integer micro-units in the 4096-row model table, so the
    per-doc score is a sum of LONGS — exact, partition-order-free,
    bit-identical in both engines; the model table broadcasts into the
    scoring scan and selection is a threshold, never a global sort.  The
    oracle replays tokenization, md5 bucketing, Laplace smoothing, the
    micro-int rounding, and the quantile threshold — all 500 rows
    value-checked, with both selected arms populated."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return text.dsir_select(docs, target, "text", "doc_id", fraction=0.25)


@query(
    "bm25_topk_documents",
    oracle="""
    WITH q(query_id, qtext) AS (VALUES
      (CAST(0 AS BIGINT), 'table scan filter'),
      (CAST(1 AS BIGINT), 'hash join merge'),
      (CAST(2 AS BIGINT), 'window agg sort')),
    tok AS (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS term
            FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    ad AS (SELECT sum(tf) / any_value(nn.n) AS avgdl FROM tf, nn),
    qt AS (SELECT DISTINCT query_id,
                  unnest(list_filter(string_split(qtext, ' '), t -> t <> ''))
                  AS term
           FROM q),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             sum(CAST(round(CAST(1000000.0 AS DOUBLE) * (
               round(ln((nn.n - dfc + CAST(0.5 AS DOUBLE))
                        / (dfc + CAST(0.5 AS DOUBLE))
                        + CAST(1.0 AS DOUBLE)), 6)
               * (tf * CAST(2.2 AS DOUBLE))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl / avgdl))
             )) AS BIGINT)) AS score_micro
      FROM qt JOIN tf USING (term)
      JOIN dfq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id, nn, ad
      GROUP BY 1, 2
    ),
    rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY score_micro DESC, doc_id) AS rank
           FROM scored)
    SELECT query_id, doc_id, score_micro, CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 10
    """,
)
def bm25_topk_documents(spark, sf_dir) -> DataFrame:
    """Exact BM25 top-10 (text.bm25_topk, k1=1.2, b=0.75, Lucene-style +1
    idf) for three keyword queries over the documents corpus — the keyword
    retrieval arm beside TF-IDF and the RRF fusion.  One corpus explode →
    (doc, term, tf) aggregate; doc lengths and document frequencies both
    fold from that aggregate; query terms broadcast.  Every per-term score
    quantizes to integer micro-units before the per-(query, doc) sum — a
    sum of longs, exact and engine-identical.  The oracle replays the full
    scoring pipeline (idf rounding, length normalization, quantization,
    ranking) with every decimal constant cast to DOUBLE — all 30 rows
    value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(0, "table scan filter"), (1, "hash join merge"), (2, "window agg sort")],
        "query_id long, qtext string",
    )
    return text.bm25_topk(docs, qs, "text", "doc_id", k=10)


_MARKUP_PREFIX = (
    '<html><head><script type="text/javascript">var x = 1 < 2;</script>'
    "<style>p {color:red}</style></head><body><div class=main><p>"
)


_MARKUP_SUFFIX = (
    "</p><br><!-- footer -->&amp;copy 2026 &lt;Corp&gt;&nbsp;&#39;q&quot;"
    "</div></body></html>"
)


@query(
    "strip_markup_documents",
    oracle=f"""
    WITH wrapped AS (
      SELECT doc_id, '{_MARKUP_PREFIX}' || text || '{_MARKUP_SUFFIX}' AS raw
      FROM documents
    ),
    s1 AS (SELECT doc_id, raw, regexp_replace(raw,
             '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t
           FROM wrapped),
    s2 AS (SELECT doc_id, raw,
             regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s1),
    s3 AS (SELECT doc_id, raw,
             regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s2),
    s4 AS (SELECT doc_id, raw,
             replace(replace(replace(replace(replace(replace(t,
               '&lt;', '<'), '&gt;', '>'), '&quot;', chr(34)),
               '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS t
           FROM s3),
    s5 AS (SELECT doc_id, raw,
             trim(regexp_replace(t, '\\s+', ' ', 'g')) AS t FROM s4)
    SELECT doc_id, t AS text,
           CASE WHEN raw IS NULL THEN NULL
                ELSE CAST(len(regexp_extract_all(raw, '(?s)<[^>]*>'))
                     AS BIGINT) END AS n_tags_removed,
           CAST(length(t) AS BIGINT) AS n_chars_clean
    FROM s5
    """,
)
def strip_markup_documents(spark, sf_dir) -> DataFrame:
    """Markup stripping (text.strip_markup): every document wrapped in a
    deterministic HTML shell — script AND style payloads (the script body
    contains a bare '<' that naive tag-stripping would corrupt), a
    comment, block tags, and all six supported entities — then stripped
    back to plain text.  Removal order is the contract: script/style
    blocks first, comments, then tags flattened to spaces, entities
    decoded LAST (so decoded '<Corp>' in user text survives), whitespace
    collapsed.  One chain of codegen regexp/replace expressions, no
    Python; the oracle replays the identical constants stage by stage —
    clean text, tag counts, and clean lengths value-checked for all 500
    docs."""
    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(_MARKUP_PREFIX), F.col("text"), F.lit(_MARKUP_SUFFIX)
        ).alias("raw"),
    )
    return text.strip_markup(wrapped, "raw", "doc_id")


@query("compression_ratio_documents")  # pinned-snapshot oracle (oracle_constants.json)
def compression_ratio_documents(spark, sf_dir) -> DataFrame:
    """DEFLATE compression-ratio quality signal (text.compression_ratio,
    zlib level 6) over every document — the classic cheap junk detector
    (templated text compresses far below prose; noise sits near 1.0).
    One Arrow-batched projection, no shuffle, no per-row Python.  The
    ratio is a pure function of the text bytes — deterministic under any
    partitioning — so the driver check uses the pinned-snapshot oracle
    (double-run guard, the LSH/BPE convention); the ordering claims
    (repeated text < prose < incompressible hex noise) are asserted in
    tests/test_round4g_ops.py rather than pinned."""
    docs = load_table(spark, sf_dir, "documents")
    return text.compression_ratio(docs, "text", "doc_id")


@query(
    "ngram_overlap_adjacent_documents",
    oracle="""
    WITH p AS (
      SELECT a.doc_id AS pid, a.text AS cand, b.text AS ref
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id < 200
    ),
    nn AS (SELECT unnest([1, 2]) AS n),
    ct AS (SELECT pid, nn.n AS n,
                  list_filter(string_split(cand, ' '), x -> x <> '') AS toks
           FROM p CROSS JOIN nn),
    rt AS (SELECT pid, nn.n AS n,
                  list_filter(string_split(ref, ' '), x -> x <> '') AS toks
           FROM p CROSS JOIN nn),
    cg AS (
      SELECT pid, n,
             unnest(list_transform(generate_series(1, len(toks) - n + 1),
                    i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
      FROM ct WHERE len(toks) >= n
    ),
    rg AS (
      SELECT pid, n,
             unnest(list_transform(generate_series(1, len(toks) - n + 1),
                    i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
      FROM rt WHERE len(toks) >= n
    ),
    cc AS (SELECT pid, n, gram, count(*) AS c FROM cg GROUP BY 1, 2, 3),
    rc AS (SELECT pid, n, gram, count(*) AS c FROM rg GROUP BY 1, 2, 3),
    j AS (
      SELECT coalesce(cc.pid, rc.pid) AS pid,
             coalesce(cc.n, rc.n) AS n,
             coalesce(cc.c, 0) AS ccnt,
             coalesce(rc.c, 0) AS rcnt
      FROM cc FULL OUTER JOIN rc
        ON cc.pid = rc.pid AND cc.n = rc.n AND cc.gram = rc.gram
    ),
    per AS (
      SELECT pid, n,
             CAST(sum(ccnt) AS BIGINT) AS cand_ngrams,
             CAST(sum(rcnt) AS BIGINT) AS ref_ngrams,
             CAST(sum(least(ccnt, rcnt)) AS BIGINT) AS overlap
      FROM j GROUP BY 1, 2
    ),
    spine AS (SELECT p.pid, nn.n FROM p CROSS JOIN nn),
    f AS (
      SELECT s.pid, CAST(s.n AS BIGINT) AS n,
             coalesce(per.cand_ngrams, 0) AS cand_ngrams,
             coalesce(per.ref_ngrams, 0) AS ref_ngrams,
             coalesce(per.overlap, 0) AS overlap
      FROM spine s LEFT JOIN per ON per.pid = s.pid AND per.n = s.n
    )
    SELECT pid, n, cand_ngrams, ref_ngrams, overlap,
           CASE WHEN cand_ngrams > 0
                THEN round(CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE), 6)
           END AS precision,
           CASE WHEN ref_ngrams > 0
                THEN round(CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE), 6)
           END AS recall,
           CASE WHEN cand_ngrams > 0 AND ref_ngrams > 0 THEN
             CASE WHEN overlap > 0 THEN
               round(2.0 * (CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
                         * (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE))
                     / ((CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
                        + (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE))), 6)
             ELSE 0.0 END
           END AS f1
    FROM f
    """,
)
def ngram_overlap_adjacent_documents(spark, sf_dir) -> DataFrame:
    """Clipped n-gram overlap (BLEU-style modified precision, ROUGE-n
    recall, F1) between each document and its doc_id successor for the
    first 200 ids (text.ngram_overlap_metrics, n ∈ {1, 2}) — the
    pairwise metric that says WHAT neighboring documents share, with
    BLEU's clipping so repetition can't farm matches.  Exact long
    counts, round-6 ratios from identical integer operands; pairs with
    an n-gram-less side get explicit spine rows (NULL-denominator
    contract).  All 400 rows value-checked."""
    from ..operators.text import ngram_overlap_metrics

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("pid"), F.col("text").alias("cand")
    ).filter(F.col("pid") < 200)
    b = docs.select(
        (F.col("doc_id") - 1).alias("pid"), F.col("text").alias("ref")
    )
    pairs = a.join(b, "pid")
    return ngram_overlap_metrics(pairs, ["pid"], "cand", "ref", n_max=2)


@query(
    "readability_documents",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(coalesce(text, ''),
                  '[.!?]+')), 1) AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(coalesce(text, ''),
                  '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
           END AS flesch,
           CASE WHEN n_words > 0 THEN
             round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                   - 15.59, 6)
           END AS fk_grade
    FROM base
    """,
)
def readability_documents(spark, sf_dir) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document
    (text.readability_features) — the readability axis of quality
    filtering: fluent prose vs keyword soup at equal length.  Counting
    contract chosen for exact cross-engine replay (whitespace words,
    [.!?]+ sentence runs with a floor of one, vowel-letter runs as
    syllables); round-6 scores from exact long counts in identical
    expression order; one narrow no-shuffle projection.  Every
    document's five fields value-checked."""
    from ..operators.text import readability_features

    docs = load_table(spark, sf_dir, "documents")
    return readability_features(docs, "text", "doc_id")


@query(
    "script_profile_documents",
    oracle="""
    WITH b AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
    c AS (
      SELECT doc_id,
             CAST(length(t) AS BIGINT) AS n_chars,
             CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS BIGINT) AS latin_chars,
             CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS BIGINT) AS digit_chars,
             CAST(length(regexp_replace(t, '[^一-鿿]', '', 'g')) AS BIGINT) AS cjk_chars,
             CAST(length(regexp_replace(t, '[^Ѐ-ӿ]', '', 'g')) AS BIGINT) AS cyrillic_chars,
             CAST(length(regexp_replace(t, '[^؀-ۿ]', '', 'g')) AS BIGINT) AS arabic_chars,
             CAST(length(regexp_replace(t, '[^\\s]', '', 'g')) AS BIGINT) AS whitespace_chars
      FROM b
    )
    SELECT doc_id, n_chars, latin_chars, digit_chars, cjk_chars,
           cyrillic_chars, arabic_chars, whitespace_chars,
           n_chars - (latin_chars + digit_chars + cjk_chars
                      + cyrillic_chars + arabic_chars + whitespace_chars)
             AS other_chars,
           CASE WHEN n_chars > 0 THEN round(CAST(latin_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS latin_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(digit_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS digit_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(cjk_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS cjk_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(cyrillic_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS cyrillic_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(arabic_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS arabic_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(whitespace_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS whitespace_ratio,
           CASE WHEN n_chars > 0 THEN round(CAST(n_chars - (latin_chars + digit_chars + cjk_chars + cyrillic_chars + arabic_chars + whitespace_chars) AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS other_ratio
    FROM c
    """,
)
def script_profile_documents(spark, sf_dir) -> DataFrame:
    """Unicode script composition per document (text.script_profile) —
    the language-agnostic complement to n-gram language ID: Latin /
    digit / CJK / Cyrillic / Arabic / whitespace counts and ratios plus
    the exact ``other`` remainder (counts always sum to n_chars,
    pytest-pinned).  Mixed-script anomalies (spam, mojibake, bilingual
    boilerplate) surface as ratio outliers before any language model
    runs.  Strip-and-measure counting (the quality_features idiom), one
    narrow no-shuffle projection; every row value-checked."""
    from ..operators.text import script_profile

    docs = load_table(spark, sf_dir, "documents")
    return script_profile(docs, "text", "doc_id")


@query(
    "capture_recapture_documents",
    oracle="""
    WITH a AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 7 < 3),
    b AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 5 < 2),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
             (SELECT CAST(count(*) AS BIGINT)
              FROM a JOIN b USING (doc_id)) AS mm
    )
    SELECT na AS n_a, nb AS n_b, mm AS n_overlap,
           round((CAST(na AS DOUBLE) + 1.0) * (CAST(nb AS DOUBLE) + 1.0)
                 / (CAST(mm AS DOUBLE) + 1.0) - 1.0, 6) AS n_est,
           round(sqrt((CAST(na AS DOUBLE) + 1.0) * (CAST(nb AS DOUBLE) + 1.0)
                      * (CAST(na AS DOUBLE) - CAST(mm AS DOUBLE))
                      * (CAST(nb AS DOUBLE) - CAST(mm AS DOUBLE))
                      / ((CAST(mm AS DOUBLE) + 1.0)
                         * (CAST(mm AS DOUBLE) + 1.0)
                         * (CAST(mm AS DOUBLE) + 2.0))), 6) AS std_err
    FROM m
    """,
)
def capture_recapture_documents(spark, sf_dir) -> DataFrame:
    """Chapman capture–recapture estimate (stats.capture_recapture) of
    the documents population from two deterministic overlapping
    'crawls' (doc_id residue samples, ~43% and ~40%) — the corpus-size
    estimator a dedup-budget planner wants before crawling the long
    tail; the estimate must land near the true 500 (it does, within
    the reported SE).  Exact distinct/overlap counts; estimate and
    Chapman SE from exact longs in identical order.  Value-checked."""
    from ..operators.stats import capture_recapture

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 7 < 3)
    b = docs.filter(F.col("doc_id") % 5 < 2)
    return capture_recapture(a, b, "doc_id")


@query(
    "novelty_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 2),
                      i -> array_to_string(tk[i:i+2], ' '))) AS gram
        FROM toks WHERE len(tk) >= 3)
    ),
    dfq AS (SELECT gram, count(*) AS c FROM sh GROUP BY 1),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
      FROM sh JOIN dfq USING (gram) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(per.n_shingles, 0) AS n_shingles,
           coalesce(per.n_unique, 0) AS n_unique,
           CASE WHEN coalesce(per.n_shingles, 0) > 0
                THEN round(CAST(per.n_unique AS DOUBLE)
                           / CAST(per.n_shingles AS DOUBLE), 6)
           END AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def novelty_documents(spark, sf_dir) -> DataFrame:
    """Per-document 3-gram novelty (text.novelty_scores) — the share of
    a document's distinct shingles appearing NOWHERE else: boilerplate
    scores ~0, original text ~1 — the cross-corpus curation signal that
    sits between exact dedup and single-doc quality scoring.  One
    zip_with shingle pass, per-doc distinct, corpus document-frequency
    aggregate, keyed join back; sub-3-token docs keep a row with NULL
    novelty (no evidence ≠ novelty 0).  All 500 rows value-checked."""
    from ..operators.text import novelty_scores

    docs = load_table(spark, sf_dir, "documents")
    return novelty_scores(docs, "text", "doc_id", k=3)


@query(
    "collocations_documents",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
            FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
    nn AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM uni),
    big AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cb FROM (
        SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
               i -> array_to_string(tk[i:i+1], ' '))) AS b
        FROM toks WHERE len(tk) >= 2)
      GROUP BY 1 HAVING count(*) >= 5
    ),
    j AS (
      SELECT big.b, big.cb, ul.cw AS cl, ur.cw AS cr,
             round(log2(CAST(CAST(nn.n AS HUGEINT) * big.cb AS DOUBLE)
                        / CAST(CAST(ul.cw AS HUGEINT) * ur.cw AS DOUBLE)), 6)
               AS pmi
      FROM big
      JOIN uni ul ON ul.w = string_split(big.b, ' ')[1]
      JOIN uni ur ON ur.w = string_split(big.b, ' ')[2], nn
    )
    SELECT b AS bigram, cb AS n_pair, cl AS n_left, cr AS n_right, pmi
    FROM j QUALIFY row_number() OVER (ORDER BY pmi DESC, b ASC) <= 20
    """,
)
def collocations_documents(spark, sf_dir) -> DataFrame:
    """Top-20 collocations by PMI over the documents corpus
    (text.collocation_report, min bigram count 5) — the corpus
    phrasebook the raw bigram counts bury under 'of the': PMI = log₂ of
    a ratio of exact integer products (decimal intermediates), hapax
    pathology floored by min_count, ties broken by bigram for a
    deterministic top-k.  All 20 rows value-checked."""
    from ..operators.text import collocation_report

    docs = load_table(spark, sf_dir, "documents")
    return collocation_report(docs, "text", min_count=5, k=20)


@query(
    "bursty_terms_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
             x -> x <> '')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    per AS (
      SELECT w, CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY 1 HAVING count(*) >= 10
    )
    SELECT w AS term, tf, df,
           round(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness
    FROM per
    QUALIFY row_number() OVER (
      ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, w ASC) <= 20
    """,
)
def bursty_terms_documents(spark, sf_dir) -> DataFrame:
    """Top-20 BURSTY terms (text.term_dispersion_report, tf ≥ 10) — the
    spam/template triage the plain frequency table can't rank: raw tf
    puts function words first, tf/df puts the term that stacks inside
    few documents first (markup residue, repeated boilerplate tokens).
    Exact tf/df counts from one melt pass; all 20 rows
    value-checked."""
    from ..operators.text import term_dispersion_report

    docs = load_table(spark, sf_dir, "documents")
    return term_dispersion_report(docs, "text", "doc_id", min_tf=10, k=20)


@query(
    "vocab_growth_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
             x -> x <> '')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    firsts AS (SELECT w, min(doc_id) AS f FROM toks GROUP BY 1),
    per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
                FROM toks GROUP BY 1),
    mx AS (SELECT max(doc_id) AS m FROM toks),
    spine AS (
      SELECT CAST(d AS BIGINT) AS decile,
             CAST(ceil(CAST(d AS DOUBLE) * CAST(mx.m AS DOUBLE) / 10.0)
                  AS BIGINT) AS cutoff_id
      FROM (SELECT unnest(range(1, 11)) AS d), mx
    )
    SELECT s.decile, s.cutoff_id,
           (SELECT CAST(coalesce(sum(nt), 0) AS BIGINT) FROM per_doc
            WHERE doc_id <= s.cutoff_id) AS n_tokens_cum,
           (SELECT CAST(count(*) AS BIGINT) FROM firsts
            WHERE f <= s.cutoff_id) AS vocab_cum
    FROM spine s
    """,
)
def vocab_growth_documents(spark, sf_dir) -> DataFrame:
    """Heaps'-law vocabulary growth over id-ordered corpus deciles
    (text.vocab_growth_report) — is the corpus still TEACHING new
    vocabulary or re-treading itself (the diminishing-returns curve a
    data-acquisition budget reads; a duplicated corpus flattens hard —
    pytest-demonstrated).  Exact with NO sequential scan: vocab at
    cutoff c = tokens whose FIRST doc id ≤ c, one melt pass + a bounded
    cutoff spine.  All 10 decile rows value-checked.  At this SF the
    curve is FLAT at 31 words from decile 1 — the synthetic generator
    draws from a 31-word vocabulary, and the report saying 'this corpus
    teaches nothing new after the first tenth' is precisely the finding
    it exists to make."""
    from ..operators.text import vocab_growth_report

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth_report(docs, "text", "doc_id", deciles=10)


@query(
    "zipf_documents",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    tf AS (SELECT w, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1),
    rk AS (SELECT w, tf,
                  CAST(row_number() OVER (ORDER BY tf DESC, w ASC) AS BIGINT)
                    AS rank
           FROM tf)
    SELECT rank, w AS term, tf,
           round(log2(CAST(rank AS DOUBLE)), 6) AS log2_rank,
           round(log2(CAST(tf AS DOUBLE)), 6) AS log2_tf
    FROM rk WHERE rank <= 100
    """,
)
def zipf_documents(spark, sf_dir) -> DataFrame:
    """Zipf rank–frequency profile, top-100 terms
    (text.zipf_report) — natural text tracks log f ≈ C − s·log r with
    s ≈ 1; flattened top ranks are the template-heavy signature.  Exact
    ranks with deterministic tie-break, round-6 log₂ coordinates (the
    downstream slope fit is a Theil–Sen one-liner over these points).
    All 100 rows value-checked."""
    from ..operators.text import zipf_report

    docs = load_table(spark, sf_dir, "documents")
    return zipf_report(docs, "text", k=100)
