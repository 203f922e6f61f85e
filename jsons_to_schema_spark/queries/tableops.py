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
from ._shared import (
    _SPANS_STRUCT_SCHEMA,
    _csv_events_path,
    _footer_audit_dir,
    _spans_corpus,
)


@query(
    "jsonl_quarantine_documents",
    oracle="""
    WITH raw AS (
      SELECT unnest(string_split(content, chr(10))) AS json
      FROM read_text('__JSONL_DOCS__')
    ), lines AS (
      SELECT json FROM raw WHERE json <> ''
      UNION ALL
      SELECT '{"doc_id": ' || CAST(i AS VARCHAR) || ' broken'
      FROM (SELECT unnest(range(0, 25)) AS i)
    )
    SELECT json_valid(json) AS is_valid,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(len(json)) AS BIGINT) AS min_len,
           CAST(max(len(json)) AS BIGINT) AS max_len
    FROM lines GROUP BY 1
    """,
)
def jsonl_quarantine_documents(spark, sf_dir) -> DataFrame:
    """JSONL ingest quarantine (sources.jsonl.with_json_validity): 25
    structurally broken lines are unioned into the exported documents
    JSONL, and the JVM-side try_parse_json verdict must quarantine
    exactly them — two independent JSON parsers (Spark variant, DuckDB
    json_valid) must agree line-for-line on the whole file for the
    grouped counts and length ranges to hash-match."""
    lines = read_jsonl(
        spark, export_table_jsonl(sf_dir, "documents", "doc_id")
    )
    bad = spark.range(25).select(
        F.concat(
            F.lit('{"doc_id": '), F.col("id").cast("string"), F.lit(" broken")
        ).alias("json")
    )
    v = with_json_validity(lines.unionByName(bad))
    return v.groupBy("is_valid").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min(F.length("json")).cast("long").alias("min_len"),
        F.max(F.length("json")).cast("long").alias("max_len"),
    )


# ===========================================================================
# Canonical spans table — constraint validation (synthetic input → rows-only;
# exact-count assertions live in tests/test_validate_spans.py)
# ===========================================================================

_SPLIT_FAILS_SQL = """
    WITH t AS (SELECT filename AS split,
                      spans, list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__', filename=true)),
         v AS (SELECT split,
                      CASE WHEN NOT (offs = list_sort(offs)
                                     AND len(list_distinct(offs)) = len(offs))
                           THEN 1 ELSE 0 END AS f_mono,
                      CASE WHEN len(list_filter(spans,
                               s -> s.kind = 'text' AND s.text IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f_text,
                      CASE WHEN len(list_filter(spans,
                               s -> s.kind <> 'text' AND s.media_ref IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f_media
               FROM t)
    SELECT split, count(*) AS n_rows,
           CAST(sum(f_mono) AS BIGINT) AS fail_monotonic_offsets,
           CAST(sum(f_text) AS BIGINT) AS fail_text_present,
           CAST(sum(f_media) AS BIGINT) AS fail_media_ref_present,
           CAST(sum(f_mono) + sum(f_text) + sum(f_media) AS BIGINT) AS n_failed,
           (sum(f_mono) + sum(f_text) + sum(f_media)) = 0 AS passed
    FROM v GROUP BY split
"""


@query("spans_partition_verdicts", oracle=_SPLIT_FAILS_SQL)
def spans_partition_verdicts(spark, sf_dir) -> DataFrame:
    """Per-partition pass/fail verdicts keyed by the STABLE content split
    (input file) — the run-invariant meaning of "partition" at scale (an
    Iceberg data file), identical across core counts and AQE re-plans, which
    is what makes the verdict table SQL-oracle-checkable.  The
    spark_partition_id-keyed variant remains available as
    validate.partition_verdicts for in-job diagnostics."""
    df = load_spans(spark, _spans_corpus(spark))
    return validate.split_verdicts(df)


@query(
    "spans_repair",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             list_filter(spans, s -> CASE WHEN s.kind = 'text'
                                          THEN s.text IS NOT NULL
                                          ELSE s.media_ref IS NOT NULL END)
               AS k,
             len(spans) AS n0
      FROM read_parquet('__SPANS_GLOB__')
    ), idx AS (
      SELECT doc_id, CAST(n0 - len(k) AS BIGINT) AS n_dropped,
             list_sort(list_transform(generate_series(1, len(k)),
               i -> {'k1': coalesce(k[i]."offset", -1), 'k2': i,
                     'sp': k[i]})) AS srt
      FROM src
    ), pos AS (
      SELECT doc_id, n_dropped,
             unnest(list_transform(generate_series(1, len(srt)),
               i -> {'oidx': i - 1, 'e': srt[i]})) AS u
      FROM idx
    )
    SELECT doc_id AS id, CAST(u.oidx AS BIGINT) AS span_idx,
           u.e.sp.kind AS kind, u.e.sp.text AS text,
           u.e.sp.media_ref AS media_ref, u.e.sp."offset" AS "offset",
           n_dropped
    FROM pos
    """,
)
def spans_repair(spark, sf_dir) -> DataFrame:
    """Span repair (validate.repair_spans) — the FIX side of the row-local
    checks: presence-violating spans dropped (the generator plants null-
    text and null-media_ref spans), offsets restored by a stable
    (coalesce(offset,−1), original-position) sort, repaired sequences
    emitted as rows with their new positions.  Entirely array-local (zero
    shuffle, one scan); the oracle replays filter + indexed struct sort +
    positional unnest with DuckDB list lambdas, so every output position
    of every repaired document is value-checked — including the planted
    non-monotonic doc's re-ordering."""
    df = load_spans(spark, _spans_corpus(spark))
    return validate.repair_spans(df)


@query(
    "parquet_footer_audit_spans",
    oracle="""
    WITH m AS (
      SELECT file_name, num_rows, num_row_groups
      FROM parquet_file_metadata('__FOOTER_AUDIT_DIR__/*.parquet')
    ), s AS (
      SELECT file_name,
             string_agg(name || ':' || type, ';' ORDER BY name, type) AS fp
      FROM parquet_schema('__FOOTER_AUDIT_DIR__/*.parquet')
      WHERE type IS NOT NULL GROUP BY file_name
    ), c AS (
      SELECT fp, count(*) AS nf FROM s GROUP BY fp
    ), t AS (SELECT count(*) AS total FROM s)
    SELECT regexp_extract(m.file_name, '[^/\\\\]+$') AS file,
           CAST(m.num_rows AS BIGINT) AS n_rows,
           CAST(m.num_row_groups AS INT) AS n_row_groups,
           round(c.nf / t.total, 6) AS schema_group_share,
           c.nf / t.total > 0.5 AS is_majority_schema
    FROM m JOIN s USING (file_name) JOIN c ON s.fp = c.fp, t
    """,
)
def parquet_footer_audit_spans(spark, sf_dir) -> DataFrame:
    """Distributed parquet metadata audit (sources.layout.
    parquet_footer_audit): executor-side footer reads over the 33-file
    audit dir — the 32 corpus files plus ONE divergent file with an extra
    column — must grade the 32 as the majority schema group (share
    32/33) and isolate the outlier (share 1/33, is_majority false).
    Engine-specific schema fingerprints are excluded from the compared
    output; the GROUPING they induce (share + verdict per file) must
    agree, along with per-file row and row-group counts."""
    from ..sources.layout import parquet_footer_audit

    d = _footer_audit_dir()
    return parquet_footer_audit(spark, d).select(
        "file", "n_rows", "n_row_groups", "schema_group_share",
        "is_majority_schema",
    )


@query(
    "small_files_report_spans",
    oracle="""
    WITH f AS (
      SELECT file_name, CAST(sum(row_group_bytes) AS BIGINT) AS bytes
      FROM (SELECT DISTINCT file_name, row_group_id, row_group_bytes
            FROM parquet_metadata('__FOOTER_AUDIT_DIR__/*.parquet'))
      GROUP BY file_name
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN bytes < 524288 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           round(avg(bytes), 6) AS avg_file_bytes,
           greatest(1, CAST(ceil(sum(bytes) / 524288.0) AS BIGINT))
             AS suggested_files
    FROM f
    """,
)
def small_files_report_spans(spark, sf_dir) -> DataFrame:
    """Small-files audit (sources.layout.small_files_report): the 33-file
    audit dir summed by executor-side footer reads against a 512 KiB
    target — every file is tiny, so the report must say so and suggest
    the compaction count; both engines sum the same uncompressed
    row-group byte totals from the same footers."""
    from ..sources.layout import small_files_report

    return small_files_report(spark, _footer_audit_dir(), 524288)


@query(
    "spans_kind_mismatch_refs",
    oracle="""
    SELECT t.doc_id, t.s.media_ref AS media_ref,
           t.s.kind AS span_kind, cat.media_kind AS catalog_kind
    FROM (SELECT doc_id, unnest(spans) AS s
          FROM read_parquet('__SPANS_GLOB__')) t
    JOIN read_parquet('__CATALOG_PQ__') cat
      ON t.s.media_ref = cat.media_ref
    WHERE t.s.kind <> cat.media_kind
    """,
)
def spans_kind_mismatch_refs(spark, sf_dir) -> DataFrame:
    """Semantic referential check (validate.kind_mismatch_refs): media
    spans whose ref resolves to a catalog entry of a DIFFERENT kind — the
    corruption dangling-ref checks can't see.  The synthetic corpus
    assigns refs independently of span kinds, so ~⅔ of resolving media
    spans mismatch (≈5k evidence rows), making the value-hash a dense
    check of the exploded join.  Nested pruning reads only the
    (kind, media_ref) subfields; the catalog broadcasts."""
    corpus = _spans_corpus(spark)
    df = load_spans(spark, corpus)
    cat = load_media_catalog(spark, corpus)
    return validate.kind_mismatch_refs(df, cat)


@query(
    "spans_render_documents",
    oracle="""
    WITH idx AS (
      SELECT doc_id,
             list_sort(list_transform(generate_series(1, len(spans)),
               i -> {'k1': coalesce(spans[i]."offset", -1), 'k2': i,
                     'sp': spans[i]})) AS srt,
             CAST(len(spans) AS BIGINT) AS n_spans,
             CAST(len(list_filter(spans, s -> s.kind <> 'text'))
                  AS BIGINT) AS n_media
      FROM read_parquet('__SPANS_GLOB__')
    )
    SELECT doc_id AS id,
           array_to_string(list_transform(srt,
             e -> CASE WHEN e.sp.kind = 'text'
                       THEN coalesce(e.sp.text, '')
                       ELSE '<media:' || coalesce(e.sp.media_ref, '')
                            || '>' END), '') AS text,
           n_spans, n_media
    FROM idx
    """,
)
def spans_render_documents(spark, sf_dir) -> DataFrame:
    """Interleaved-document rendering (validate.render_documents): every
    doc's spans linearized to text in stable offset order with inline
    media placeholders — what the tokenizer eats and the per-row
    span-sequence invariant made READABLE (kind, text, media_ref, order
    all fold into the rendered string, so the value-hash over 5,005
    rendered documents checks the whole sequence at once).  Array-local,
    zero shuffle; oracle replays the indexed struct sort and the
    placeholder rendering with DuckDB list lambdas."""
    df = load_spans(spark, _spans_corpus(spark))
    return validate.render_documents(df)


@query(
    "spans_violation_rows",
    oracle="""
    WITH t AS (SELECT doc_id, spans,
                      list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__'))
    SELECT doc_id, 'monotonic_offsets' AS "check" FROM t
    WHERE NOT (offs = list_sort(offs) AND len(list_distinct(offs)) = len(offs))
    UNION ALL
    SELECT doc_id, 'text_present' FROM t
    WHERE len(list_filter(spans, s -> s.kind = 'text' AND s.text IS NULL)) > 0
    UNION ALL
    SELECT doc_id, 'media_ref_present' FROM t
    WHERE len(list_filter(spans, s -> s.kind <> 'text' AND s.media_ref IS NULL)) > 0
    """,
)
def spans_violation_rows(spark, sf_dir) -> DataFrame:
    df = load_spans(spark, _spans_corpus(spark))
    return validate.row_violations(validate.with_check_flags(df))


@query(
    "spans_duplicate_doc_ids",
    oracle="""
    SELECT doc_id, count(*) AS cnt
    FROM read_parquet('__SPANS_GLOB__')
    GROUP BY doc_id HAVING count(*) > 1
    """,
)
def spans_duplicate_doc_ids(spark, sf_dir) -> DataFrame:
    df = load_spans(spark, _spans_corpus(spark))
    return validate.duplicate_doc_ids(df)


@query(
    "spans_dangling_media_refs",
    oracle="""
    WITH refs AS (
      SELECT doc_id, unnest(spans).media_ref AS media_ref
      FROM read_parquet('__SPANS_GLOB__')
    )
    SELECT media_ref, doc_id FROM refs
    WHERE media_ref IS NOT NULL
      AND media_ref NOT IN (SELECT media_ref FROM read_parquet('__CATALOG_PQ__')
                            WHERE media_ref IS NOT NULL)
    """,
)
def spans_dangling_media_refs(spark, sf_dir) -> DataFrame:
    corpus = _spans_corpus(spark)
    df = load_spans(spark, corpus)
    cat = load_media_catalog(spark, corpus)
    return validate.dangling_media_refs(df, cat)


@query(
    "spans_single_pass_audit",
    oracle=_SPLIT_FAILS_SQL.replace(
        "(sum(f_mono) + sum(f_text) + sum(f_media)) = 0 AS passed",
        "(sum(f_mono) + sum(f_text) + sum(f_media)) = 0 AS passed, '"
        + _SPANS_STRUCT_SCHEMA
        + "' AS unified_schema",
    ),
)
def spans_single_pass_audit(spark, sf_dir) -> DataFrame:
    """North-star single multi-aggregate pass: schema inference + verdicts +
    violation samples from ONE scan (equality vs separate passes asserted in
    tests/test_validate_spans.py), keyed by the stable content split so the
    verdict half of the audit is real-SQL-oracled; the unified schema is the
    deterministic constant column the fold produces (golden-tested)."""
    from jsons_to_schema_spark.operators.audit_pass import single_pass_audit
    from jsons_to_schema_spark.schema_algebra import canonical_json

    df = load_spans(spark, _spans_corpus(spark))
    res = single_pass_audit(df, cap_per_check=100, by="split")
    return res.verdicts.withColumn(
        "unified_schema", F.lit(canonical_json(res.schema))
    )


@query(
    "dead_columns_documents",
    oracle="""
    SELECT 'doc_id' AS "column", count(*) AS n_rows,
           count(*) - count(doc_id) AS n_nulls,
           count(doc_id) = 0 AS dead,
           count(*) - count(doc_id) = 0
             AND min(CAST(doc_id AS VARCHAR)) = max(CAST(doc_id AS VARCHAR))
             AS constant
    FROM documents
    UNION ALL
    SELECT 'text', count(*), count(*) - count(text), count(text) = 0,
           count(*) - count(text) = 0 AND min(text) = max(text)
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(lang) = 0,
           count(*) - count(lang) = 0 AND min(lang) = max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source), count(source) = 0,
           count(*) - count(source) = 0 AND min(source) = max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars), count(n_chars) = 0,
           count(*) - count(n_chars) = 0
             AND min(CAST(n_chars AS VARCHAR)) = max(CAST(n_chars AS VARCHAR))
    FROM documents
    """,
)
def dead_columns_documents(spark, sf_dir) -> DataFrame:
    """Column-hygiene report (stats.dead_column_report): dead / constant
    column verdicts from ONE multi-aggregate scan, pivoted to per-column
    rows with an inline array-of-structs explode."""
    from ..operators import stats as stats_ops

    docs = load_table(spark, sf_dir, "documents")
    return stats_ops.dead_column_report(docs)


@query(
    "skew_report_media_refs",
    oracle="""
    WITH nn AS (
      SELECT unnest(spans).media_ref AS key
      FROM read_parquet('__SPANS_GLOB__')
    ), c AS (
      SELECT key, count(*) AS cnt FROM nn WHERE key IS NOT NULL GROUP BY key
    ), g AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS dk,
             CAST(max(cnt) AS BIGINT) AS mx
      FROM c
    )
    SELECT key, cnt, round(cnt / total, 6) AS share,
           total AS total_rows, dk AS distinct_keys,
           round(mx / total, 6) AS max_share,
           mx > 8.0 * total / dk AS skewed
    FROM (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 10), g
    """,
)
def skew_report_media_refs(spark, sf_dir) -> DataFrame:
    """Join-key skew diagnostics over the corpus's Zipf(1.2)-skewed media
    refs — the pre-pass a planner reads before picking salting / AQE
    skew-join settings for the referential check (stats.key_skew_report:
    map-side-partial count, TakeOrderedAndProject top-k, 1-row broadcast
    context; costs what one pre-pass of the real join costs)."""
    from ..operators import stats as stats_ops

    df = load_spans(spark, _spans_corpus(spark))
    refs = df.select(
        F.explode("spans.media_ref").alias("media_ref")
    ).filter(F.col("media_ref").isNotNull())
    return stats_ops.key_skew_report(refs, "media_ref", top_k=10)


@query(
    "freshness_events",
    oracle="""
    WITH m AS (SELECT max(epoch_us(ts)) AS as_of FROM events),
         g AS (
           SELECT event_type, max(epoch_us(ts)) AS max_ts_epoch_us
           FROM events GROUP BY 1
         )
    SELECT g.event_type, g.max_ts_epoch_us,
           CAST(floor((m.as_of - g.max_ts_epoch_us) / 1000000.0) AS BIGINT)
             AS lag_seconds,
           CAST(floor((m.as_of - g.max_ts_epoch_us) / 1000000.0) AS BIGINT)
             <= 86400 AS fresh
    FROM g, m
    """,
)
def freshness_events(spark, sf_dir) -> DataFrame:
    """Recency analyzer (stats.freshness): per-event-type lag behind the
    feed head, judged against a 24 h budget.  All arithmetic is integer
    epoch-microseconds (unix_micros / epoch_us) — absolute instants, no
    session-timezone or formatting ambiguity, exact cross-engine
    comparison.  The as-of instant is the table's own global max so the
    check is deterministic and oracle-able (pass an explicit epoch for
    wall-clock monitoring)."""
    events = load_table(spark, sf_dir, "events")
    return stats.freshness(
        events, "ts", max_lag_seconds=86400, group_col="event_type"
    )


@query(
    "table_diff_orders",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         b AS (
           SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 97 <> 0
           UNION ALL
           SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 103 = 0
         ),
         j AS (
           SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                  CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                       WHEN a.o_orderkey IS NULL THEN 'added'
                       WHEN (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                         OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                       THEN 'changed' END AS status,
                  array_to_string(list_sort(list_filter([
                    CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                         THEN 'o_orderstatus' END,
                    CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                         THEN 'o_totalprice' END
                  ], x -> x IS NOT NULL)), ',') AS diffs
           FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
         )
    SELECT o_orderkey, status,
           CASE WHEN status = 'changed' THEN diffs END AS changed_cols
    FROM j WHERE status IS NOT NULL
    """,
)
def table_diff_orders(spark, sf_dir) -> DataFrame:
    """Snapshot reconciliation (validate.table_diff): orders vs a
    deterministically perturbed second snapshot (keys %97 dropped, %101
    repriced, %103 re-added under shifted keys — both engines derive the
    same snapshot), so added/removed/changed and the changed-column
    attribution are all value-checked.  ONE full outer join keyed like
    any downstream merge; unchanged rows never materialize.  changed_cols
    is rendered as a comma-joined string for the value-hash compare."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snapshot = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 103 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1_000_000_000
            )
        )
    )
    diff = validate.table_diff(orders, snapshot, ["o_orderkey"])
    return diff.select(
        "o_orderkey",
        "status",
        F.when(
            F.col("status") == "changed", F.array_join("changed_cols", ",")
        ).alias("changed_cols"),
    )


@query(
    "aggregate_reconciliation_orders",
    oracle="""
    WITH s AS (
      SELECT l_orderkey, round(sum(CAST(l_extendedprice AS DOUBLE)), 6) AS t,
             CAST(count(*) AS BIGINT) AS n_children
      FROM lineitem GROUP BY 1
    ), p AS (
      SELECT l_orderkey,
             CASE WHEN l_orderkey % 2 = 1 THEN round(t + 5.0, 6)
                  ELSE t END AS expected
      FROM s
    )
    SELECT p.l_orderkey, p.expected, s.t AS actual,
           round(abs(p.expected - s.t), 6) AS abs_diff, s.n_children
    FROM p JOIN s USING (l_orderkey)
    WHERE round(abs(p.expected - s.t), 6) > 0.000001
    """,
)
def aggregate_reconciliation_orders(spark, sf_dir) -> DataFrame:
    """Cross-table aggregate reconciliation (validate.
    aggregate_reconciliation): every parent's stored total must equal the
    sum of its children — the warehouse invariant dangling-ref checks
    can't see.  The parent table is derived from lineitem itself with
    every odd order's total corrupted by +5, so the violation set is
    exactly the odd orderkeys, each with its expected/actual/diff
    value-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    parent = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("double")), 6).alias("_t"))
        .select(
            "l_orderkey",
            F.when(
                F.col("l_orderkey") % 2 == 1, F.round(F.col("_t") + 5.0, 6)
            )
            .otherwise(F.col("_t"))
            .alias("total"),
        )
    )
    return validate.aggregate_reconciliation(
        parent, li, ["l_orderkey"], "total", "l_extendedprice", tolerance=1e-6
    )


@query(
    "join_explosion_orders_customer",
    oracle="""
    WITH l AS (
      SELECT CASE WHEN o_orderkey % 127 = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders
    ),
    r AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 1400),
    lc AS (SELECT k, CAST(count(*) AS BIGINT) AS nl FROM l
           WHERE k IS NOT NULL GROUP BY 1),
    rc AS (SELECT k, CAST(count(*) AS BIGINT) AS nr FROM r
           WHERE k IS NOT NULL GROUP BY 1),
    m AS (SELECT * FROM lc FULL JOIN rc USING (k)),
    a AS (
      SELECT
        CAST(coalesce(sum(nl), 0) AS BIGINT) AS n_left_nn,
        CAST(coalesce(sum(nr), 0) AS BIGINT) AS n_right_nn,
        CAST(count(nl) AS BIGINT) AS left_keys,
        CAST(count(nr) AS BIGINT) AS right_keys,
        CAST(count(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL THEN 1 END)
             AS BIGINT) AS matched_keys,
        CAST(count(CASE WHEN nr IS NULL THEN 1 END) AS BIGINT)
          AS left_only_keys,
        CAST(count(CASE WHEN nl IS NULL THEN 1 END) AS BIGINT)
          AS right_only_keys,
        CAST(coalesce(sum(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                               THEN nl * nr END), 0) AS BIGINT) AS join_rows,
        max(nl) AS max_left_mult,
        max(nr) AS max_right_mult,
        CAST(coalesce(max(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                               THEN nl * nr END), 0) AS BIGINT)
          AS max_pair_product
      FROM m
    ),
    nl2 AS (SELECT CAST(count(CASE WHEN k IS NULL THEN 1 END) AS BIGINT)
              AS left_null_keys FROM l),
    nr2 AS (SELECT CAST(count(CASE WHEN k IS NULL THEN 1 END) AS BIGINT)
              AS right_null_keys FROM r)
    SELECT a.n_left_nn + nl2.left_null_keys AS n_left,
           a.n_right_nn + nr2.right_null_keys AS n_right,
           nl2.left_null_keys, nr2.right_null_keys,
           a.left_keys, a.right_keys, a.matched_keys,
           a.left_only_keys, a.right_only_keys,
           a.join_rows, a.max_left_mult, a.max_right_mult,
           a.max_pair_product,
           round(CAST(a.join_rows AS DOUBLE)
                 / greatest(a.n_left_nn + nl2.left_null_keys,
                            a.n_right_nn + nr2.right_null_keys), 6)
             AS explosion_factor
    FROM a, nl2, nr2
    """,
)
def join_explosion_orders_customer(spark, sf_dir) -> DataFrame:
    """Pre-join blast-radius profile (stats.join_explosion_report):
    orders ⋈ customer on custkey WITHOUT materializing the join — exact
    Σ n_l(k)·n_r(k) output size, per-side cardinalities/multiplicities,
    match/only splits, hottest-key contribution, and the explosion
    factor.  Plants cover every report arm at sf0.01: o_custkey NULLed
    on every 127th order key (NULL keys never match — counted, excluded
    from match arithmetic) and customers ≥ 1400 dropped from the right
    side (those custkeys' orders become left-only).  Two key-bounded
    groupBys + one count-frame join; every cell value-checked."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 127 == 0, F.lit(None).cast("long")
        )
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 1400
    ).select("c_custkey")
    return stats.join_explosion_report(orders, cust, "k", "c_custkey")


# Morton interleave replayed in DuckDB dialect (<< >> & | operators); the
# Spark side builds the same terms with shiftleft/shiftright in
# sources.layout.zorder_key_expr — both are exact BIGINT arithmetic.
_ZORDER_TERMS = " | ".join(
    f"(((s{i} >> {b}) & 1) << {b * 2 + i})" for i in (0, 1) for b in range(16)
)


@query(
    "zorder_bucket_report_events",
    oracle=f"""
    WITH bnd AS (
      SELECT min(user_id) AS lo0, max(user_id) AS hi0,
             min(event_id) AS lo1, max(event_id) AS hi1
      FROM events
    ),
    scaled AS (
      SELECT user_id, event_id,
             CASE WHEN hi0 = lo0 THEN 0
                  ELSE ((user_id - lo0) * 65535) // (hi0 - lo0) END AS s0,
             CASE WHEN hi1 = lo1 THEN 0
                  ELSE ((event_id - lo1) * 65535) // (hi1 - lo1) END AS s1
      FROM events, bnd
    ),
    keyed AS (
      SELECT user_id, event_id,
             CASE WHEN user_id IS NULL OR event_id IS NULL THEN NULL
                  ELSE ({_ZORDER_TERMS}) END AS zk
      FROM scaled
    ),
    rep AS (
      SELECT zk >> 28 AS bucket, count(*) AS n_rows,
             min(user_id) AS min_user_id, max(user_id) AS max_user_id,
             min(event_id) AS min_event_id, max(event_id) AS max_event_id
      FROM keyed GROUP BY 1
    )
    SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(min_user_id AS BIGINT) AS min_user_id,
           CAST(max_user_id AS BIGINT) AS max_user_id,
           CAST(min_event_id AS BIGINT) AS min_event_id,
           CAST(max_event_id AS BIGINT) AS max_event_id,
           round(((max_user_id - min_user_id) / CAST(hi0 - lo0 AS DOUBLE)
                  + (max_event_id - min_event_id) / CAST(hi1 - lo1 AS DOUBLE))
                 / 2, 6) AS span_fraction
    FROM rep, bnd
    """,
)
def zorder_bucket_report_events(spark, sf_dir) -> DataFrame:
    """Z-order (Morton) layout evidence (sources.layout.zorder_bucket_report):
    events bucketed by the top 4 bits of the 32-bit Morton key over
    (user_id, event_id) — exactly the prefix ranges write_zordered would cut
    into files — reporting per-bucket row count, per-dimension (min, max),
    and span_fraction (bucket span / global span averaged over dims: the
    footer-stat tightness a box predicate would prune against; ~0.25 per
    prefix bucket here vs ~1.0 for a random layout).  Scaling and
    interleaving are exact BIGINT ops (one scan, one 16-ary groupBy, no
    skew: buckets are equal-measure curve segments); the oracle replays
    bound-fitting, scaling, all 32 bit terms, and the span arithmetic —
    every bucket value-checked."""
    ev = load_table(spark, sf_dir, "events")
    from ..sources.layout import zorder_bucket_report

    return zorder_bucket_report(ev, ["user_id", "event_id"], bits=16, bucket_bits=4)


@query(
    "csv_ingest_events",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
             AS value_sum_micro
    FROM read_csv('__CSV_EVENTS__', delim=';', header=true)
    GROUP BY 1
    """,
)
def csv_ingest_events(spark, sf_dir) -> DataFrame:
    """CSV ingest with dialect sniffing (sources.csvx): three events
    columns exported as a ';'-delimited, headered CSV fixture (lazy,
    source-fingerprinted), then read back with NO options given —
    sniff_csv_dialect detects the delimiter by quote-aware field-count
    consistency over a bounded driver-side prefix and the header by the
    type-disagreement test, and read_csv_inferred hands the dialect to
    Spark's splittable CSV scan with schema inference.  The aggregate
    quantizes value to exact integer micro-units (sum of longs — parsing
    the same decimal strings yields identical doubles in both engines, so
    quantization is bit-identical).  The oracle reads the SAME bytes with
    DuckDB's CSV reader under the explicit dialect — per-type counts and
    exact sums value-checked."""
    from ..sources.csvx import read_csv_inferred

    path = _csv_events_path()
    df = read_csv_inferred(spark, path)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * F.lit(1000000.0)).cast("long")).alias(
            "value_sum_micro"
        ),
    )


@query(
    "disorder_profile_orders",
    oracle="""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS seq,
             CASE WHEN o_orderkey IS NOT NULL
                  THEN epoch_us(o_orderdate) END AS us
      FROM orders),
    run AS (
      SELECT us,
             max(us) OVER (ORDER BY seq
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS rm
      FROM base),
    late AS (
      SELECT CASE WHEN us IS NOT NULL THEN rm - us END AS late_us
      FROM run)
    SELECT CAST(count(late_us) AS BIGINT) AS n_rows,
           CAST(count(*) - count(late_us) AS BIGINT) AS n_null,
           CAST(count(CASE WHEN late_us > 0 THEN 1 END) AS BIGINT)
             AS n_late,
           CASE WHEN count(late_us) > 0 THEN
             round(CAST(count(CASE WHEN late_us > 0 THEN 1 END) AS DOUBLE)
                   / count(late_us), 6) END AS late_fraction,
           max(late_us) AS max_late_us,
           round(quantile_cont(CASE WHEN late_us > 0 THEN late_us END,
                               0.5), 6) AS p50_late_us,
           round(quantile_cont(CASE WHEN late_us > 0 THEN late_us END,
                               0.95), 6) AS p95_late_us,
           round(quantile_cont(CASE WHEN late_us > 0 THEN late_us END,
                               0.99), 6) AS p99_late_us,
           coalesce(CAST(ceil(quantile_cont(
             CASE WHEN late_us > 0 THEN late_us END, 0.99)
             / 1000000.0) AS BIGINT), 0) AS watermark_seconds
    FROM late
    """,
)
def disorder_profile_orders(spark, sf_dir) -> DataFrame:
    """Event-time disorder audit + watermark advisor
    (temporal.disorder_profile) over orders in o_orderkey ingest order:
    exact per-row lateness vs the running event-time max WITHOUT a global
    sort — contiguous ingest blocks get a keyed running-max window, the
    bounded block-maxima table carries the only ordered (single-partition)
    window, and the exclusive block-prefix max broadcasts back
    (greatest(within-block, previous-blocks) is exactly the global running
    max because blocks partition the ingest prefix).  block_size=1024
    exercises ~15 blocks at sf0.01 / ~147 at sf0.1; orders is genuinely
    disordered by orderkey (14,990/15,000 rows late at sf0.01).  Exact
    percentiles over LATE rows only (round-6) and the ceil-seconds p99
    watermark recommendation are value-checked against the full
    running-max window replay."""
    orders = load_table(spark, sf_dir, "orders")
    return temporal.disorder_profile(
        orders, "o_orderdate", "o_orderkey", block_size=1024
    )


@query(
    "salted_join_orders_customer",
    oracle="""
    SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def salted_join_orders_customer(spark, sf_dir) -> DataFrame:
    """Skew-mitigated equi-join (joins.salted_join): fact-side hot keys
    (>= 16 orders per customer: 70 keys at sf0.01) are split across 8
    deterministic xxhash64 salt sub-keys and the matching dimension rows
    replicated, so one hot key fans out over 8 tasks instead of pinning
    one reducer; cold keys join untouched and the union is the result.
    The driver oracle IS the plain SQL join — the operator's contract
    (salted result == unsalted join, row for row) is value-checked over
    all 15,000 joined rows every round.  No CartesianProduct, no per-row
    Python, deterministic under task retry (hash salt, never rand():
    tests/test_round4h_ops.py)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fact = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        "o_totalprice",
    )
    dim = cust.select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return joins.salted_join(
        fact, dim, "custkey", how="inner", salt=8, hot_threshold=16
    )


@query(
    "compaction_plan_spans",
    oracle="""
    WITH f AS (
      SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file_name,
             CAST(sum(row_group_bytes) AS BIGINT) AS bytes
      FROM (SELECT DISTINCT file_name, row_group_id, row_group_bytes
            FROM parquet_metadata('__FOOTER_AUDIT_DIR__/*.parquet'))
      GROUP BY 1
    )
    SELECT file_name, bytes,
           CAST(floor(coalesce(sum(bytes) OVER (ORDER BY bytes DESC,
                    file_name ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) / 262144.0) AS BIGINT) AS bucket
    FROM f
    """,
)
def compaction_plan_spans(spark, sf_dir) -> DataFrame:
    """Next-fit-decreasing compaction assignment over the 33-file audit
    dir at a 256 KiB target (sources.layout.compaction_plan) — the
    actionable half of small_files_report: every file lands in the
    bucket whose rewrite yields ~target-sized outputs, cut where the
    size-descending running total crosses a target multiple.  Footer
    bytes come from the same executor-side fan-out as the audit (the
    driver never opens a footer); the ordering window runs over file
    METADATA only.  Every (file, bytes, bucket) row value-checked
    against DuckDB's parquet_metadata replay."""
    from ..sources.layout import compaction_plan

    return compaction_plan(spark, _footer_audit_dir(), 262144)


@query(
    "relationship_orders_customer",
    oracle="""
    WITH ca AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS na
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    ),
    cb AS (
      SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS nb
      FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1
    ),
    j AS (
      SELECT na, nb, (na IS NOT NULL AND nb IS NOT NULL) AS bth
      FROM ca FULL OUTER JOIN cb USING (k)
    ),
    agg AS (
      SELECT CAST(coalesce(sum(na), 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(nb), 0) AS BIGINT) AS n_b,
             CAST(count(na) AS BIGINT) AS n_keys_a,
             CAST(count(nb) AS BIGINT) AS n_keys_b,
             CAST(sum(CASE WHEN bth THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched_keys,
             CAST(coalesce(max(CASE WHEN bth THEN na END), 0) AS BIGINT)
               AS max_per_key_a,
             CAST(coalesce(max(CASE WHEN bth THEN nb END), 0) AS BIGINT)
               AS max_per_key_b,
             CAST(sum(CASE WHEN nb IS NULL THEN na ELSE 0 END) AS BIGINT)
               AS a_unmatched,
             CAST(sum(CASE WHEN na IS NULL THEN nb ELSE 0 END) AS BIGINT)
               AS b_unmatched
      FROM j
    )
    SELECT agg.*,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey IS NULL) AS null_a,
           (SELECT CAST(count(*) AS BIGINT) FROM customer
            WHERE c_custkey IS NULL) AS null_b,
           CASE WHEN max_per_key_a <= 1 AND max_per_key_b <= 1
                  THEN 'one_to_one'
                WHEN max_per_key_a <= 1 AND max_per_key_b > 1
                  THEN 'one_to_many'
                WHEN max_per_key_a > 1 AND max_per_key_b <= 1
                  THEN 'many_to_one'
                ELSE 'many_to_many' END AS relationship
    FROM agg
    """,
)
def relationship_orders_customer(spark, sf_dir) -> DataFrame:
    """Join-relationship classification of orders.o_custkey vs
    customer.c_custkey (stats.relationship_profile) — the data-contract
    primitive that pins 'orders is N:1 to customer': exact max fan-out
    per direction over MATCHED keys, unmatched-key residue each side,
    NULL-key counts, and the class label whose silent degradation
    (N:1 → N:M via a duplicated dimension row) is how join explosions
    enter pipelines.  Two per-key aggregates + a full-outer join on
    bounded key tables + one roll-up row, value-checked field by
    field."""
    from ..operators.stats import relationship_profile

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return relationship_profile(orders, "o_custkey", customer, "c_custkey")


@query(
    "impute_events_value",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    base AS (SELECT * FROM src WHERE v IS NOT NULL),
    pm AS (
      SELECT g, rv AS m FROM (
        SELECT event_type AS g, round(v, 6) AS rv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(v, 6)) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base WHERE event_type IS NOT NULL) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    gm AS (
      SELECT rv AS m FROM (
        SELECT round(v, 6) AS rv,
               row_number() OVER (ORDER BY round(v, 6)) AS rn,
               count(*) OVER () AS n
        FROM base) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    )
    SELECT s.event_id, s.event_type,
           CASE WHEN s.v IS NOT NULL THEN s.v
                ELSE coalesce(pm.m, gm.m) END AS v,
           (s.v IS NULL AND coalesce(pm.m, gm.m) IS NOT NULL) AS imputed
    FROM src s LEFT JOIN pm ON pm.g = s.event_type CROSS JOIN gm
    """,
)
def impute_events_value(spark, sf_dir) -> DataFrame:
    """Median imputation with provenance (stats.fit_imputer /
    apply_imputer) over a PLANTED missingness pattern (every 13th
    event's value nulled identically in both engines): fit per-type
    type-1 medians plus a global fallback on the surviving rows, fill
    the holes, and FLAG every filled row — imputation without
    provenance poisons downstream drift checks.  The model is
    groups+1 rows broadcast into one join; medians are exact rank
    statistics on round-6 values.  All 10k rows (fills, flags, and
    untouched values) value-checked."""
    from ..operators.stats import apply_imputer, fit_imputer

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    model = fit_imputer(ev, "v", "event_type")
    return apply_imputer(ev, "v", model, "event_type")


@query(
    "mirror_columns_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey * 10 + l_linenumber AS k,
             l_returnflag, l_returnflag AS flag_copy,
             l_linestatus,
             CAST(l_linenumber AS BIGINT) AS l_linenumber
      FROM lineitem
    ),
    melted AS (
      SELECT CAST(k AS VARCHAR) AS k, 'l_returnflag' AS c,
             CAST(l_returnflag AS VARCHAR) AS v FROM src
      UNION ALL SELECT CAST(k AS VARCHAR), 'flag_copy',
             CAST(flag_copy AS VARCHAR) FROM src
      UNION ALL SELECT CAST(k AS VARCHAR), 'l_linestatus',
             CAST(l_linestatus AS VARCHAR) FROM src
      UNION ALL SELECT CAST(k AS VARCHAR), 'l_linenumber',
             CAST(l_linenumber AS VARCHAR) FROM src
    ),
    fp AS (
      SELECT c, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS nn,
             sum(CAST(CAST('0x' || substring(md5(concat_ws(chr(31), k,
                   coalesce(v, chr(0) || '<NULL>' || chr(0)))), 1, 8)
                 AS BIGINT) AS HUGEINT)) AS f
      FROM melted GROUP BY 1
    )
    SELECT a.c AS col_a, b.c AS col_b, a.n, a.nn AS n_null,
           CAST(a.f AS VARCHAR) AS fingerprint
    FROM fp a JOIN fp b
      ON a.c < b.c AND a.f = b.f AND a.n = b.n AND a.nn = b.nn
    """,
)
def mirror_columns_lineitem(spark, sf_dir) -> DataFrame:
    """Duplicate-column detection (stats.mirror_columns_report) over a
    frame carrying a PLANTED copy (flag_copy ≡ l_returnflag): each column
    folds to one order-free exact fingerprint Σ uint32(md5(key ⊕
    value)) + (n, n_null) in a single melt scan; columns pair iff the
    full triple matches (a false positive needs an md5 AND a sum
    collision — documented).  String/integer columns only in this
    fixture: cross-engine double→string rendering is not part of the
    contract.  The one detected pair value-checked."""
    from ..operators.stats import mirror_columns_report

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        "l_returnflag",
        F.col("l_returnflag").alias("flag_copy"),
        "l_linestatus",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
    )
    return mirror_columns_report(li, "k")
