"""Driver-contract query registry.

Each entry: name → callable(spark, sf_dir) → DataFrame with a matching
DuckDB oracle in ORACLES using IDENTICAL output column names.  Every query
is oracled, three ways:

* real SQL where the semantics are SQL-expressible (stats, joins, windows,
  text, split verdicts via read_parquet(filename=true), clustering via a
  recursive-CTE closure, multimodal via sha256 hex-byte math);
* deterministic-output operators whose COMPUTATION is not SQL (schema
  folds, seeded-hash LSH pipelines, pinned-partition t-digest) carry a
  constant-select / snapshot oracle — regenerate with
  scripts/gen_constant_oracles.py (double-run determinism guard); their
  semantic correctness lives in tests/ (golden, hypothesis, planted,
  recall);
* approximations whose raw values are legitimately run-varying (HLL union)
  expose their error CONTRACT as the oracled output.

Cross-engine value-hash hygiene (learned the hard way, keep it):
* never compare raw double AGGREGATION results (sum order differs) — use
  counts, min/max (no arithmetic), or round(x, 6);
* Spark ``size``/``count`` int widths are cast to long to match DuckDB BIGINT;
* DuckDB ``sum`` returns HUGEINT — use ``count(*) - count(col)`` for null
  counts instead;
* timestamps are excluded from oracled min/max (formatting ambiguity).
"""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import cdc, dedup, drift, joins, multimodal, resolve, sample, similarity, stats, temporal, text, validate
from .operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
    infer_from_struct,
    infer_grouped,
)
from .sources.jsonl import export_table_jsonl, infer_jsonl, read_jsonl, with_json_validity
from .sources.spans import ensure_corpus
from .sources.tables import load_media_catalog, load_spans, load_table

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def _source_fingerprint(sf_dir, table: str) -> str:
    """Short content fingerprint (path+size+mtime) of a driver parquet
    table — the cache key component that makes persisted-index caches
    (IVF/q8/MinHash) track their SOURCE data: a regenerated testdata dir
    or a same-basename foreign corpus gets a fresh index instead of stale
    probes (r3 review; same scheme as sources/jsonl.py)."""
    import hashlib
    from pathlib import Path as _P

    src = _P(sf_dir) / f"{table}.parquet"
    st = src.stat()
    return hashlib.sha256(
        f"{src.resolve()}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]


def _spans_corpus(spark: SparkSession = None):
    """Deterministic synthetic canonical table for spans-based operators.
    Generation is idempotent and cached on disk; first caller pays it."""
    return ensure_corpus(5000)


# Oracle SQL references the corpus parquet through placeholder tokens so that
# importing this registry never touches disk; resolve_oracles() substitutes
# the real paths (generating the corpus if needed) only when the oracles are
# actually consumed.  Plain str.replace — the SQL contains literal braces.
_SPANS_GLOB_TOKEN = "__SPANS_GLOB__"
_CATALOG_PQ_TOKEN = "__CATALOG_PQ__"
# JSONL export of the sf0.01 documents table (the driver's correctness SF,
# same pinning convention as the schema constants below); substituted lazily
# so importing the registry never touches disk.
_JSONL_DOCS_TOKEN = "__JSONL_DOCS__"


_FOOTER_DIR_TOKEN = "__FOOTER_AUDIT_DIR__"
# ';'-delimited CSV export of three events columns (the CSV-ingest fixture;
# lazily exported, source-fingerprinted — the JSONL convention)
_CSV_EVENTS_TOKEN = "__CSV_EVENTS__"


def _csv_events_path() -> str:
    from .sources.csvx import export_table_csv

    return str(
        export_table_csv(
            "/root/testdata/sf0.01",
            "events",
            "event_id",
            ["event_id", "event_type", "value"],
            delimiter=";",
        )
    )


def _footer_audit_dir() -> str:
    """Deterministic mixed-writer audit directory: the 32 spans corpus
    files plus ONE divergent file carrying an extra column — built once,
    cache-keyed to the corpus, so the footer-audit query and its oracle
    read the same bytes."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = _spans_corpus()
    src = Path(corpus) / "documents_spans"
    out = Path(corpus) / "footer_audit"
    marker = out / "_COMPLETE"
    if marker.exists():
        return str(out)
    tmp = Path(corpus) / "footer_audit.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for f in sorted(src.glob("*.parquet")):
        shutil.copy(f, tmp / f.name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["zz-1"], pa.string()),
                "extra": pa.array([1.5], pa.float64()),
            }
        ),
        tmp / "part-divergent.parquet",
    )
    shutil.rmtree(out, ignore_errors=True)
    try:
        tmp.rename(out)
    except OSError:
        pass  # concurrent builder won the rename — same bytes
    (out / "_COMPLETE").touch()
    return str(out)


def resolve_oracles() -> dict:
    """ORACLES with corpus-path tokens substituted (lazy corpus creation)."""
    out = dict(ORACLES)
    if any(_FOOTER_DIR_TOKEN in sql for sql in out.values()):
        d = _footer_audit_dir()
        out = {
            name: sql.replace(_FOOTER_DIR_TOKEN, d) for name, sql in out.items()
        }
    if any(
        _SPANS_GLOB_TOKEN in sql or _CATALOG_PQ_TOKEN in sql for sql in out.values()
    ):
        corpus = _spans_corpus()
        glob = f"{corpus}/documents_spans/*.parquet"
        cat = f"{corpus}/media_catalog.parquet"
        out = {
            name: sql.replace(_SPANS_GLOB_TOKEN, glob).replace(_CATALOG_PQ_TOKEN, cat)
            for name, sql in out.items()
        }
    if any(_CSV_EVENTS_TOKEN in sql for sql in out.values()):
        p = _csv_events_path()
        out = {
            name: sql.replace(_CSV_EVENTS_TOKEN, p) for name, sql in out.items()
        }
    if any(_JSONL_DOCS_TOKEN in sql for sql in out.values()):
        p = export_table_jsonl("/root/testdata/sf0.01", "documents", "doc_id")
        out = {
            name: sql.replace(_JSONL_DOCS_TOKEN, str(p)) for name, sql in out.items()
        }
    return out


# ===========================================================================
# Schema inference (flagship).  The fold itself is not SQL-expressible, but
# its OUTPUT at a fixed input is a deterministic constant (golden- and
# property-tested in tests/), so the oracle is a constant-select for the
# schema column joined with a REAL SQL document count — the driver can then
# value-check the flagship end-to-end instead of recording rows-only.
# Schema constants are sf0.01-pinned (the driver's correctness SF).
# ===========================================================================

_EVENTS_PROPS_SCHEMA = (
    '{"properties":{"k":{"type":"integer"}},"required":["k"],"type":"object"}'
)
_DOCUMENTS_STRUCT_SCHEMA = (
    '{"properties":{"doc_id":{"type":"integer"},"lang":{"type":"string"},'
    '"n_chars":{"type":"integer"},"source":{"type":"string"},'
    '"text":{"type":"string"}},"required":["doc_id","lang","n_chars",'
    '"source","text"],"type":"object"}'
)
_SPANS_STRUCT_SCHEMA = (
    '{"properties":{"doc_id":{"type":"string"},"spans":{"items":{"properties":'
    '{"kind":{"type":"string"},"media_ref":{"type":"string"},"offset":'
    '{"type":"integer"},"text":{"type":"string"}},"required":["kind","offset"],'
    '"type":"object"},"type":"array"}},"required":["doc_id","spans"],'
    '"type":"object"}'
)


@query(
    "schema_infer_events_props",
    oracle=f"""
    SELECT '{_EVENTS_PROPS_SCHEMA}' AS unified_schema,
           count(props) AS n_docs FROM events
    """,
)
def schema_infer_events_props(spark, sf_dir) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    schema, n = infer_from_json_column(events, "props")
    return infer_as_dataframe(spark, schema, n)


@query(
    "schema_infer_documents_struct",
    oracle=f"""
    SELECT '{_DOCUMENTS_STRUCT_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM documents
    """,
)
def schema_infer_documents_struct(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    schema, n = infer_from_struct(docs)
    return infer_as_dataframe(spark, schema, n)


@query(
    "schema_infer_jsonl_documents",
    oracle=f"""
    SELECT '{_DOCUMENTS_STRUCT_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM read_json_auto('{_JSONL_DOCS_TOKEN}')
    """,
)
def schema_infer_jsonl_documents(spark, sf_dir) -> DataFrame:
    """EP1 file-ingest analog: the documents table exported as JSONL, read
    back as a splittable text scan, unified by the same Arrow JSON kernel.
    Must agree with schema_infer_documents_struct — the parquet-struct and
    JSON-file front-ends are two faces of one algebra (sources/jsonl.py)."""
    path = export_table_jsonl(sf_dir, "documents", "doc_id")
    schema, n = infer_jsonl(spark, path)
    return infer_as_dataframe(spark, schema, n)


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


@query(
    "schema_infer_spans_struct",
    oracle=f"""
    SELECT '{_SPANS_STRUCT_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM read_parquet('__SPANS_GLOB__')
    """,
)
def schema_infer_spans_struct(spark, sf_dir) -> DataFrame:
    df = load_spans(spark, _spans_corpus(spark))
    schema, n = infer_from_struct(df)
    return infer_as_dataframe(spark, schema, n)


@query(
    "schema_infer_grouped_event_type",
    oracle=f"""
    SELECT event_type, '{_EVENTS_PROPS_SCHEMA}' AS unified_schema,
           count(props) AS n_docs FROM events GROUP BY event_type
    """,
)
def schema_infer_grouped_event_type(spark, sf_dir) -> DataFrame:
    """Per-group unified schema.  Every sf0.01 event_type's props share one
    shape, so the schema column is the same constant for all groups — the
    per-group doc counts are the data-dependent part the oracle checks."""
    events = load_table(spark, sf_dir, "events")
    return infer_grouped(events, "event_type", "props")


@query("schema_infer_spans_tuple_mode")
def schema_infer_spans_tuple_mode(spark, sf_dir) -> DataFrame:
    """G5 tuple typing end-to-end: the spans rows are re-encoded as JSON
    documents (to_json drops null fields → absent-key semantics) and folded
    with typeArraysAsTuples=True — items become a positional list,
    zip-unified across documents (U4 list×list).  Tuple mode has no Catalyst
    analog (Spark arrays are homogeneous) so this runs the JSON front-end's
    Python fold (the fast path declines tuple config by design).
    Deterministic output → pinned snapshot oracle."""
    from jsons_to_schema_spark.schema_algebra import SchemaGenerationConfig

    df = load_spans(spark, _spans_corpus(spark)).select(
        F.to_json(F.struct("doc_id", "spans")).alias("doc")
    )
    schema, n = infer_from_json_column(
        df, "doc", SchemaGenerationConfig(type_arrays_as_tuples=True)
    )
    return infer_as_dataframe(spark, schema, n)


_DOCUMENTS_SEALED_SCHEMA = (
    '{"additionalProperties":false,"properties":{"doc_id":{"type":"integer"},'
    '"lang":{"type":"string"},"n_chars":{"type":"integer"},'
    '"source":{"type":"string"},"text":{"type":"string"}},'
    '"required":["doc_id","lang","n_chars","source","text"],"type":"object"}'
)


@query(
    "schema_infer_documents_sealed",
    oracle=f"""
    SELECT '{_DOCUMENTS_SEALED_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM documents
    """,
)
def schema_infer_documents_sealed(spark, sf_dir) -> DataFrame:
    """G3 sealing knob (sealObjectProperties=True): every generated object
    schema carries additionalProperties:false.  Same deterministic shape as
    schema_infer_documents_struct plus the seal — the oracle is the sealed
    constant with a real SQL count."""
    from jsons_to_schema_spark.schema_algebra import SchemaGenerationConfig

    docs = load_table(spark, sf_dir, "documents")
    schema, n = infer_from_struct(
        docs, SchemaGenerationConfig(seal_object_properties=True)
    )
    return infer_as_dataframe(spark, schema, n)


# ===========================================================================
# Column stats — single multi-aggregate pass (oracled)
# ===========================================================================

@query(
    "stats_lineitem",
    oracle="""
    SELECT count(*) AS n_rows,
           min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
           count(*) - count(l_quantity) AS nulls_l_quantity,
           min(l_extendedprice) AS min_l_extendedprice,
           max(l_extendedprice) AS max_l_extendedprice,
           count(*) - count(l_extendedprice) AS nulls_l_extendedprice,
           min(l_discount) AS min_l_discount, max(l_discount) AS max_l_discount,
           count(*) - count(l_discount) AS nulls_l_discount,
           min(l_returnflag) AS min_l_returnflag, max(l_returnflag) AS max_l_returnflag,
           count(*) - count(l_returnflag) AS nulls_l_returnflag,
           count(DISTINCT l_orderkey) AS distinct_l_orderkey,
           count(DISTINCT l_partkey) AS distinct_l_partkey,
           count(DISTINCT l_suppkey) AS distinct_l_suppkey
    FROM lineitem
    """,
)
def stats_lineitem(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
        ]
    for c in ["l_orderkey", "l_partkey", "l_suppkey"]:
        aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
    return li.agg(*aggs)


@query(
    "stats_events_by_type",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           min(value) AS min_value, max(value) AS max_value,
           count(*) - count(value) AS nulls_value
    FROM events GROUP BY event_type
    """,
)
def stats_events_by_type(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.count(F.lit(1)) - F.count("value")).alias("nulls_value"),
    )


@query(
    "stats_documents_rollup",
    oracle="""
    SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def stats_documents_rollup(spark, sf_dir) -> DataFrame:
    """Hierarchical aggregates via ROLLUP(lang, source) — subtotals and the
    grand total in one pass (Expand + partial/final HashAggregate; the
    grouping-set expansion happens map-side, so the shuffle carries
    per-(set,key) partials, not rows).  NULL subtotal keys surface as
    '<all>' so the output is total-orderable for the value compare."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    return out.select(
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        F.coalesce("source", F.lit("<all>")).alias("source"),
        "n_docs",
        "total_chars",
        "min_chars",
        "max_chars",
    )


@query(
    "stats_distinct_hll_lineitem",
    oracle="""
    SELECT true AS hll_ok_l_orderkey,
           true AS hll_ok_l_partkey,
           true AS hll_ok_l_suppkey,
           count(DISTINCT l_orderkey) AS exact_l_orderkey,
           count(DISTINCT l_partkey) AS exact_l_partkey,
           count(DISTINCT l_suppkey) AS exact_l_suppkey
    FROM lineitem
    """,
)
def stats_distinct_hll_lineitem(spark, sf_dir) -> DataFrame:
    """HLL-sketch distinct counts CHECKED against the exact counts in one
    multi-aggregate pass.  The raw estimate is not partition-count-invariant
    (a DataSketches hll_union of partials is a different sketch state than a
    single-sketch build), so the value-stable, oracle-able output is the
    semantic contract itself: |estimate − exact| ≤ 5% · exact per column,
    plus the exact counts as real SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    agg = li.agg(
        *[F.hll_sketch_estimate(F.hll_sketch_agg(c)).alias(f"est_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"exact_{c}") for c in cols],
    )
    return agg.select(
        *[
            (
                F.abs(F.col(f"est_{c}") - F.col(f"exact_{c}"))
                <= 0.05 * F.col(f"exact_{c}")
            ).alias(f"hll_ok_{c}")
            for c in cols
        ],
        *[F.col(f"exact_{c}") for c in cols],
    )


@query(
    "null_rate_embeddings",
    oracle="""
    SELECT count(*) AS n_rows,
           count(*) - count(embedding) AS nulls_embedding,
           count(*) - count(label) AS nulls_label,
           count(DISTINCT label) AS distinct_label
    FROM embeddings
    """,
)
def null_rate_embeddings(spark, sf_dir) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("embedding")).alias("nulls_embedding"),
        (F.count(F.lit(1)) - F.count("label")).alias("nulls_label"),
        F.countDistinct("label").alias("distinct_label"),
    )


@query(
    "embedding_profile_embeddings",
    oracle="""
    WITH p AS (
      SELECT vec_id,
        CASE WHEN vec_id % 83 = 0 THEN NULL
             WHEN vec_id % 89 = 0 THEN embedding[1:32]
             WHEN vec_id % 97 = 0
               THEN list_append(embedding[1:63], CAST('nan' AS FLOAT))
             WHEN vec_id % 79 = 0
               THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
             WHEN vec_id % 73 = 0
               THEN list_append(embedding[1:63], CAST('inf' AS FLOAT))
             ELSE embedding END AS v
      FROM embeddings
    ), e AS (
      SELECT v,
        CASE WHEN v IS NULL THEN NULL
             ELSE len(list_filter(v, x -> isnan(x))) > 0 END AS has_nan,
        CASE WHEN v IS NULL THEN NULL
             ELSE len(list_filter(v, x -> isinf(x))) > 0 END AS has_inf,
        CASE WHEN v IS NULL THEN NULL
             ELSE list_sum(list_transform(v,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) END AS ss
      FROM p
    ), n AS (
      SELECT *,
        CASE WHEN v IS NOT NULL AND NOT has_nan AND NOT has_inf
             THEN round(sqrt(ss), 6) END AS norm
      FROM e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(v) AS BIGINT) AS n_null,
           CAST(min(len(v)) AS INT) AS dim_min,
           CAST(max(len(v)) AS INT) AS dim_max,
           CAST(sum(CASE WHEN v IS NOT NULL AND len(v) <> 64
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
           CAST(sum(CASE WHEN coalesce(has_nan, false)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_nan,
           CAST(sum(CASE WHEN coalesce(has_inf, false)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_inf,
           CAST(sum(CASE WHEN v IS NOT NULL AND NOT has_nan
                          AND NOT has_inf AND ss = 0.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vec,
           min(norm) AS norm_min,
           max(norm) AS norm_max,
           round(avg(norm), 6) AS norm_mean
    FROM n
    """,
)
def embedding_profile_embeddings(spark, sf_dir) -> DataFrame:
    """Vector-column hygiene audit (similarity.embedding_profile): the
    testdata embeddings are clean, so every defect class is PLANTED on
    disjoint id slices — NULL vectors (%83), truncated 32-dim re-embeds
    (%89), a NaN element (%97), zero vectors (%79), an Inf element
    (%73) — and the one-scan profile must count each class exactly while
    the norm stats ignore poisoned vectors (round-6 per-vector norms keep
    the fold order-proof).  The oracle replays the plants and every
    aggregate with DuckDB list lambdas."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    fzero = F.lit(0.0).cast("float")
    planted = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 83 == 0, F.lit(None))
        .when(F.col("vec_id") % 89 == 0, F.slice(v, 1, 32))
        .when(
            F.col("vec_id") % 97 == 0,
            F.concat(
                F.slice(v, 1, 63),
                F.array(F.lit(float("nan")).cast("float")),
            ),
        )
        .when(
            F.col("vec_id") % 79 == 0, F.transform(v, lambda x: fzero)
        )
        .when(
            F.col("vec_id") % 73 == 0,
            F.concat(
                F.slice(v, 1, 63),
                F.array(F.lit(float("inf")).cast("float")),
            ),
        )
        .otherwise(v)
        .alias("embedding"),
    )
    return similarity.embedding_profile(planted, "embedding", expected_dim=64)


# ===========================================================================
# Uniqueness + referential (oracled)
# ===========================================================================

@query(
    "uniqueness_documents_doc_id",
    oracle="""
    SELECT doc_id, count(*) AS cnt FROM documents
    GROUP BY doc_id HAVING count(*) > 1
    """,
)
def uniqueness_documents_doc_id(spark, sf_dir) -> DataFrame:
    """Partial+final HashAggregate = the two-stage salted count (map-side
    partials per scan partition); see validate.duplicate_doc_ids."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("cnt")).filter("cnt > 1")
    )


@query(
    "uniqueness_events_user_event",
    oracle="""
    SELECT user_id, event_type, count(*) AS cnt FROM events
    GROUP BY user_id, event_type HAVING count(*) > 1
    """,
)
def uniqueness_events_user_event(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt > 1")
    )


@query(
    "referential_customers_without_orders",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def referential_customers_without_orders(spark, sf_dir) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti")


@query(
    "referential_lineitem_dangling_orders",
    oracle="""
    SELECT count(*) AS dangling_cnt FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def referential_lineitem_dangling_orders(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return li.join(F.broadcast(o), "l_orderkey", "left_anti").agg(
        F.count(F.lit(1)).alias("dangling_cnt")
    )


# ===========================================================================
# Distribution drift (oracled via exact percentiles)
# ===========================================================================

@query(
    "drift_events_value",
    oracle="""
    WITH b AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) q FROM events
               WHERE user_id % 2 = 0),
         c AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) q FROM events
               WHERE user_id % 2 = 1),
         p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS p,
                      generate_subscripts([0.25, 0.5, 0.75, 0.95], 1) AS i)
    SELECT p.p AS p, round(b.q[p.i], 6) AS base_q, round(c.q[p.i], 6) AS cur_q,
           round(c.q[p.i] - b.q[p.i], 6) AS delta
    FROM p, b, c
    """,
)
def drift_events_value(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1)
    d = drift.quantile_drift(base, cur, "value", [0.25, 0.5, 0.75, 0.95], engine="exact")
    return d.select(
        "p",
        F.round("base_q", 6).alias("base_q"),
        F.round("cur_q", 6).alias("cur_q"),
        F.round(F.col("cur_q") - F.col("base_q"), 6).alias("delta"),
    )


@query(
    "stats_orders_by_status",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
           count(*) - count(o_totalprice) AS nulls_price,
           count(DISTINCT o_custkey) AS distinct_custkeys
    FROM orders GROUP BY o_orderstatus
    """,
)
def stats_orders_by_status(spark, sf_dir) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("nulls_price"),
        F.countDistinct("o_custkey").alias("distinct_custkeys"),
    )


@query(
    "referential_supplier_nation",
    oracle="""
    SELECT s_suppkey, s_nationkey FROM supplier
    WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)
    """,
)
def referential_supplier_nation(spark, sf_dir) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey")
    )
    return s.join(F.broadcast(n), "s_nationkey", "left_anti").select(
        "s_suppkey", "s_nationkey"
    )


@query(
    "join_suppliers_per_region",
    oracle="""
    SELECT r.r_name AS region, count(*) AS n_suppliers,
           count(DISTINCT n.n_nationkey) AS n_nations
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_suppliers_per_region(spark, sf_dir) -> DataFrame:
    """Multi-way dimension join chain (supplier ⋈ nation ⋈ region) with both
    dims broadcast — the fact side never shuffles for the joins; one
    partial/final aggregate after."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.countDistinct("n_nationkey").alias("n_nations"),
    )


@query(
    "uniqueness_part_partkey",
    oracle="""
    SELECT p_partkey, count(*) AS cnt FROM part
    GROUP BY p_partkey HAVING count(*) > 1
    """,
)
def uniqueness_part_partkey(spark, sf_dir) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_partkey").agg(F.count(F.lit(1)).alias("cnt")).filter("cnt > 1")
    )


@query(
    "topk_documents_by_chars",
    oracle="""
    SELECT lang, doc_id, n_chars, CAST(rnk AS int) AS rnk FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 5
    """,
)
def topk_documents_by_chars(spark, sf_dir) -> DataFrame:
    """Bounded top-k per group: the window never funnels — one partition per
    lang key, and at scale the same shape runs as a two-stage top-k (local
    cap, then global) exactly like validate.row_violations."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    )
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the batch twin of a
    streaming session window; lag+sum over a per-user window, partitioned by
    the (high-cardinality) user key so it scales with users."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the testdata; epoch via ltz (session TZ pinned
    # UTC) — only gaps matter, so any fixed offset cancels.
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.select("user_id", new_s.alias("new_s"))
        .groupBy("user_id")
        .agg(
            F.sum("new_s").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "drift_documents_nchars",
    oracle="""
    WITH b AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) q
               FROM documents WHERE doc_id % 2 = 0),
         c AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) q
               FROM documents WHERE doc_id % 2 = 1),
         p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS p,
                      generate_subscripts([0.25, 0.5, 0.75, 0.95], 1) AS i)
    SELECT p.p AS p, round(b.q[p.i], 6) AS base_q, round(c.q[p.i], 6) AS cur_q,
           round(c.q[p.i] - b.q[p.i], 6) AS delta
    FROM p, b, c
    """,
)
def drift_documents_nchars(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    d = drift.quantile_drift(
        base, cur, "n_chars", [0.25, 0.5, 0.75, 0.95], engine="exact"
    )
    return d.select(
        "p",
        F.round("base_q", 6).alias("base_q"),
        F.round("cur_q", 6).alias("cur_q"),
        F.round(F.col("cur_q") - F.col("base_q"), 6).alias("delta"),
    )


@query("drift_events_value_tdigest")
def drift_events_value_tdigest(spark, sf_dir) -> DataFrame:
    """Quantile drift via the mergeable t-digest UDAF (third engine, tail-
    accurate).  Partition membership is pinned (hash-repartition on
    event_id) and partials merge in pid order, so the sketch output is
    run- and core-count-deterministic — the oracle is a pinned snapshot
    (scripts/gen_constant_oracles.py); accuracy vs exact quantiles is
    asserted in tests/test_operators.py."""
    from jsons_to_schema_spark.operators import tdigest

    ev = load_table(spark, sf_dir, "events")
    rows = tdigest.tdigest_drift(
        ev.filter(F.col("user_id") % 2 == 0),
        ev.filter(F.col("user_id") % 2 == 1),
        "value",
        [0.25, 0.5, 0.75, 0.95],
        partitions=32,
        key="event_id",
    )
    return spark.createDataFrame(rows, "p double, base_q double, cur_q double, delta double")


# ===========================================================================
# Text analysis (oracled)
# ===========================================================================

@query(
    "token_count_documents",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


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
    "top_token_documents",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
    agg AS (SELECT doc_id, max({'c': c, 't': t}) AS b, sum(c) AS n
            FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           b.t AS top_token,
           cast(b.c AS bigint) AS top_token_count,
           round(b.c / n, 6) AS top_token_frac
    FROM agg
    """,
)
def top_token_documents(spark, sf_dir) -> DataFrame:
    """Most-frequent-token share per document (top-n-gram repetition
    signal), computed the distributed way: explode → two-stage hash
    aggregate with map-side combine (operators/text.py:top_token_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.top_token_stats(docs, "text", "doc_id")


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
    "sample_documents",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE substring(md5(concat_ws(chr(31), '42', cast(doc_id AS string))), 1, 8)
          < '33333333'
    """,
)
def sample_documents(spark, sf_dir) -> DataFrame:
    """Deterministic 20% corpus sample: membership is a pure function of
    (seed, doc_id) via an md5 hex prefix vs threshold string — identical
    under any partitioning/retry/engine, growth-stable, exactly SQL-oracled
    (operators/sample.py; threshold 0x33333333/16^8 = 0.2)."""
    from jsons_to_schema_spark.operators.sample import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.2).select(
        "doc_id", "source", "lang"
    )


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(concat_ws(chr(31), '42', cast(doc_id AS string))), 1, 8)
          < CASE WHEN lang = 'en' THEN '80000000'
                 WHEN lang = 'de' THEN '1999999a'
                 ELSE '051eb852' END
    """,
)
def stratified_sample_documents(spark, sf_dir) -> DataFrame:
    """Training-mixture sampling: keep 50% of 'en', 10% of 'de', 2% of the
    rest — one narrow filter, per-stratum hex thresholds, decision hash on
    the key alone so equal rates admit identical key sets
    (operators/sample.py:stratified_sample)."""
    from jsons_to_schema_spark.operators.sample import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.02
    ).select("doc_id", "lang")


_PLANT_CORPUS_LINES = (
    "concat(case when doc_id % 4 = 0 then "
    "concat('subscribe to our newsletter today friends', chr(10)) "
    "else '' end, text, chr(10), substring(text, 1, 30))"
)


@query(
    "corpus_line_dedup_documents",
    oracle=f"""
    WITH planted AS (SELECT doc_id, {_PLANT_CORPUS_LINES} AS text FROM documents),
    lx AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ls)),
                                   i -> {{'idx': i, 'line': ls[i]}}),
                    recursive := true)
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)
    ), hot AS (
      SELECT line FROM lx WHERE length(line) >= 10
      GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    ), kept AS (
      SELECT lx.* FROM lx ANTI JOIN hot USING (line)
    ), reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, count(*) AS n_lines FROM lx GROUP BY doc_id
    )
    SELECT tot.doc_id,
           cast(tot.n_lines AS bigint) AS n_lines,
           cast(tot.n_lines - coalesce(reb.n_kept, 0) AS bigint) AS n_removed_lines,
           coalesce(reb.text_dedup, '') AS text_dedup
    FROM tot LEFT JOIN reb USING (doc_id)
    """,
)
def corpus_line_dedup_documents(spark, sf_dir) -> DataFrame:
    """RefinedWeb-style corpus-LEVEL boilerplate removal: a planted
    newsletter line recurs in every 4th document (≥5-doc frequency) and must
    vanish from all of them, while document-unique lines survive in order
    (operators/text.py:corpus_line_dedup; oracle groups raw lines — also a
    collision canary for the engine's 8-byte line keys)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PLANT_CORPUS_LINES).alias("text")
    )
    return text.corpus_line_dedup(
        docs, "text", "doc_id", min_doc_freq=5, min_line_chars=10
    )


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


# ===========================================================================
# Deduplication (exact oracled; probabilistic ones rows-only + unit tests)
# ===========================================================================

@query(
    "dedup_exact_documents",
    oracle="""
    SELECT fp_exact, count(*) AS cnt, min(doc_id) AS keep_id
    FROM (SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_exact
          FROM documents)
    GROUP BY fp_exact HAVING count(*) > 1
    """,
)
def dedup_exact_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicate_clusters(docs, "text", "doc_id")


@query("dedup_minhash_documents")
def dedup_minhash_documents(spark, sf_dir) -> DataFrame:
    """CAMPAIGN mode (r4, VERDICT item 3): pairs computed from the persisted
    signature/shingle index table (built once, cached like the IVF index) —
    no localCheckpoint executor-storage pin, no re-tokenization on re-run.
    Output ≡ one-shot pair mode at the same params (tests/test_round3_ops)."""
    from pathlib import Path

    docs = load_table(spark, sf_dir, "documents")
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"mhall_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'documents')}_h32_b8_k3"
    )
    return dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", min_jaccard=0.5, index_dir=idx
    )


@query("dedup_simhash_documents")
def dedup_simhash_documents(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3)


@query(
    "dedup_ngram_jaccard_documents",
    oracle="""
    WITH sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), inv AS (
      SELECT doc_id, unnest(g) AS s FROM sh
    ), keep AS (
      SELECT s FROM inv GROUP BY s HAVING count(*) <= 100
    ), kept AS (
      SELECT inv.doc_id, list(inv.s) AS gk FROM inv JOIN keep USING (s)
      GROUP BY inv.doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.g, b.g)) AS inter,
             len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN kept ka ON ka.doc_id = a.doc_id
      JOIN kept kb ON kb.doc_id = b.doc_id
      WHERE len(list_intersect(ka.gk, kb.gk)) > 0
    )
    SELECT id_a, id_b, round(inter * 1.0 / uni, 6) AS jaccard
    FROM pairs WHERE inter * 1.0 / uni >= 0.2
    """,
)
def dedup_ngram_jaccard_documents(spark, sf_dir) -> DataFrame:
    """Candidates share ≥1 non-stop shingle (document frequency ≤ 100 — the
    hot-shingle quadratic-blowup guard); Jaccard verified on full sets."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.2, max_shingle_df=100
    )


@query(
    "dedup_clusters_ngram_documents",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS g
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents)
    ), inv AS (
      SELECT doc_id, unnest(g) AS s FROM sh
    ), nonstop AS (
      SELECT s FROM inv GROUP BY s HAVING count(*) <= 100
    ), kept AS (
      SELECT inv.doc_id, list(inv.s) AS gk FROM inv JOIN nonstop USING (s)
      GROUP BY inv.doc_id
    ), pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN kept ka ON ka.doc_id = a.doc_id
      JOIN kept kb ON kb.doc_id = b.doc_id
      WHERE len(list_intersect(ka.gk, kb.gk)) > 0
        AND len(list_intersect(a.g, b.g)) * 1.0 /
            (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.2
    ), e(src, dst) AS (
      SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr
    ), reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lbl) AS cluster_id, id = min(lbl) AS keep
    FROM reach GROUP BY id
    """,
)
def dedup_clusters_ngram_documents(spark, sf_dir) -> DataFrame:
    """Duplicate-CLUSTER assignment (what a real dedup pipeline consumes —
    pairs alone don't dedup anything): connected components over the n-gram
    Jaccard pair list via distributed min-label propagation, keep = the
    cluster's min-id representative.  Oracled end-to-end against a DuckDB
    recursive-CTE transitive closure over the identical pair pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.2, max_shingle_df=100
    )
    labels = dedup.duplicate_clusters(pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("cluster").alias("cluster_id"),
        (F.col("cluster") == F.col("id")).alias("keep"),
    )


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
    "dedup_embedding_near_dup",
    oracle="""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         pert AS (SELECT vec_id + 10000 AS vec_id,
                         list_transform(v, x -> x + 0.001) AS v
                  FROM base WHERE vec_id < 10),
         allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
         pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                          round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
                   FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.95
    """,
)
def dedup_embedding_near_dup(spark, sf_dir) -> DataFrame:
    """Banded-LSH near-dup at scale-representative parameters (48 hyperplane
    bits in 8 bands of 6; recall ≈1 at cos ≥ 0.95; per-band self-join stays
    candidate-bounded — the old bits=4 single bucket was ~N²/16).

    The synthetic embeddings have no true near-dups (max pairwise cos 0.51),
    so the query plants deterministic ones — a +0.001 perturbation of the
    first 10 vectors — and must recover exactly those pairs.  That makes
    the oracle REAL SQL: the exact all-pairs cosine ≥ 0.95 set."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    allv = emb.unionByName(pert)
    return similarity.embedding_near_dup_pairs(
        allv, min_cosine=0.95, bits=48, bands=8, dim=64
    )


@query("dedup_semantic_embeddings")
def dedup_semantic_embeddings(spark, sf_dir) -> DataFrame:
    """SemDeDup-style cluster-then-drop semantic dedup over the same planted
    +0.001 perturbations — the dropped set must be exactly the 10 perturbed
    vectors, each pointing at its original as kept_id (ground-truth-tested
    in tests/test_operators.py; k-means isn't SQL, so the driver oracle is
    the pinned determinism-guarded snapshot)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    allv = emb.unionByName(pert)
    return similarity.semantic_dedup(allv, n_cells=8, threshold=0.95)


# ===========================================================================
# Similarity search (oracled via DuckDB list_cosine_similarity)
# ===========================================================================

@query(
    "similarity_topk_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
                  round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
           FROM q, embeddings e WHERE e.vec_id <> q.query_id
         ),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id) AS rank
           FROM scored
         )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS int) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def similarity_topk_embeddings(spark, sf_dir) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries_df, k=10)


@query("similarity_lsh_topk_embeddings")
def similarity_lsh_topk_embeddings(spark, sf_dir) -> DataFrame:
    """Multi-probe banded LSH top-k (8 bands × 4 bits — shallow bands because
    the corpus is near-random, so exact top-k neighbors sit at cos≈0.4; deeper
    bands suit high-cosine regimes): recall measured vs
    brute force in tests/test_operators.py; deterministic → pinned oracle."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(emb, queries_df, k=10, bits=32, bands=8, dim=64)


@query("similarity_ivf_topk_embeddings")
def similarity_ivf_topk_embeddings(spark, sf_dir) -> DataFrame:
    """IVF with a PERSISTED index: first call trains + writes the
    cell-partitioned index table (build_ivf_index); subsequent calls probe
    it with zero training jobs (ivf_topk_indexed) — recall vs brute force
    asserted in tests/test_operators.py."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"ivf_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_index(emb, idx, n_cells=16, iters=2, seed=42)
    return similarity.ivf_topk_indexed(spark, idx, queries_df, k=10, n_probe=8)


@query("similarity_ivf_q8_topk_embeddings")
def similarity_ivf_q8_topk_embeddings(spark, sf_dir) -> DataFrame:
    """int8-QUANTIZED IVF probe with exact rerank (similarity.
    build_ivf_index_q8 / ivf_topk_indexed_q8): the index stores codes +
    scale (~8x less IO than float cells); approx integer-dot scores gate
    candidacy, the corpus join reranks at full precision — recall ≥0.9 vs
    brute force asserted in tests/test_round3_ops.py; deterministic →
    pinned oracle."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"ivfq8_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_index_q8(emb, idx, n_cells=16, iters=2, seed=42)
    return similarity.ivf_topk_indexed_q8(
        spark, idx, queries_df, emb, k=10, n_probe=8, oversample=4
    )


@query("similarity_ivf_pq_topk_embeddings")
def similarity_ivf_pq_topk_embeddings(spark, sf_dir) -> DataFrame:
    """PRODUCT-QUANTIZED IVF probe (similarity.build_ivf_pq_index /
    ivf_topk_indexed_pq): the index stores m=4 PQ codes per vector — the
    smallest index variant (bits, not floats) — and the probe scores
    candidates via ADC entirely in codegen (zip_with the code array
    against the per-query LUT rows; only integer codes are scanned),
    then reranks exactly against the corpus.  Recall ≥0.85 vs brute
    force asserted in tests/test_round4b_ops.py (0.96 measured at these
    parameters); bit-deterministic training → pinned oracle."""
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"ivfpq_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_m4_n64_s42"
    )
    if not (idx / "centroids.json").exists():
        similarity.build_ivf_pq_index(
            emb, idx, n_cells=16, m=4, n_codes=64, iters=2, pq_iters=6, seed=42
        )
    return similarity.ivf_topk_indexed_pq(
        spark, idx, queries_df, emb, k=10, n_probe=8, oversample=16
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
    from .sources.layout import parquet_footer_audit

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
    from .sources.layout import small_files_report

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
    "spans_schema_validation_verdicts",
    oracle="""
    SELECT (json_type(props::JSON) = 'OBJECT'
            AND json_type(props::JSON, '$.k') IN ('BIGINT', 'UBIGINT')) AS valid,
           count(*) AS n_docs
    FROM events WHERE props IS NOT NULL GROUP BY 1
    """,
)
def spans_schema_validation_verdicts(spark, sf_dir) -> DataFrame:
    """Reference V1 loop at the engine level: infer the unified schema of the
    events JSON docs, then validate every doc against it (verdict rows).
    The inferred sf0.01 schema is {type:object, properties:{k:integer},
    required:[k]} — the oracle re-expresses exactly that Draft-4 validation
    in DuckDB JSON functions (object + k present + k integer)."""
    events = load_table(spark, sf_dir, "events")
    schema, _ = infer_from_json_column(events, "props")
    v = validate.validate_json_against_schema(events, "props", schema)
    return v.groupBy("valid").agg(F.count(F.lit(1)).alias("n_docs"))


# ===========================================================================
# Multimodal plumbing (stub decoder — rows-only)
# ===========================================================================

@query(
    "multimodal_media_features",
    oracle="""
    WITH src AS (
      SELECT media_ref, media_kind, media_ref || ':payload' AS payload,
             sha256(media_ref || ':payload') AS h
      FROM read_parquet('__CATALOG_PQ__') WHERE media_ref < 'm-00000500'
    )
    SELECT media_ref, media_kind,
           CAST(strlen(payload) AS BIGINT) AS n_bytes,
           h AS content_sha256,
           CAST(16 + CAST('0x' || substr(h, 1, 2) AS INT) % 240 AS INT) AS width,
           CAST(16 + CAST('0x' || substr(h, 3, 2) AS INT) % 240 AS INT) AS height,
           CAST(CASE WHEN media_kind IN ('audio', 'video')
                     THEN CAST('0x' || substr(h, 5, 4) AS INT)
                     ELSE 0 END AS INT) AS duration_ms
    FROM src
    """,
)
def multimodal_media_features(spark, sf_dir) -> DataFrame:
    """Fake-decode features over synthetic binary payloads derived from the
    media catalog, exercising the real mapInPandas plumbing.  The stub
    decoder is a pure sha256-of-bytes function, so the whole stage is
    reproducible in DuckDB — a REAL value oracle for the plumbing (the
    codec call itself stays the documented NotImplementedError seam).
    Deterministic subset via a key predicate, not an unordered limit()."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(F.col("media_ref") < "m-00000500")
    with_payload = cat.select(
        "media_ref",
        "media_kind",
        F.encode(F.concat(F.col("media_ref"), F.lit(":payload")), "utf-8").alias(
            "payload"
        ),
    )
    return multimodal.media_features(
        with_payload, "media_ref", "payload", "media_kind", fake=True
    )


@query(
    "multimodal_resize_images",
    oracle="""
    WITH d AS (
      SELECT media_ref, media_ref || ':img' AS payload,
             16 + CAST('0x' || substr(sha256(media_ref || ':img'), 1, 2) AS INT) % 240 AS dw,
             16 + CAST('0x' || substr(sha256(media_ref || ':img'), 3, 2) AS INT) % 240 AS dh
      FROM read_parquet('__CATALOG_PQ__')
      WHERE media_kind = 'image' AND media_ref < 'm-00000600'
    ), s AS (
      SELECT media_ref, payload, dw, dh,
             least(CAST(1.0 AS DOUBLE), CAST(128 AS DOUBLE) / greatest(dw, dh)) AS scale
      FROM d
    )
    SELECT media_ref,
           CAST(floor(dw * scale) AS INT) AS width,
           CAST(floor(dh * scale) AS INT) AS height,
           CAST(greatest(1, floor(strlen(payload) * scale)) AS BIGINT) AS n_bytes_out
    FROM s
    """,
)
def multimodal_resize_images(spark, sf_dir) -> DataFrame:
    """Resize plumbing (binary→binary mapInPandas, stub codec) over synthetic
    payloads for the image-kind catalog entries.  The projection returns the
    resize METADATA (box + output byte count) so the fake-codec stage is
    fully value-oracled in DuckDB; the binary payload column itself stays an
    opaque pass-through (asserted in tests)."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "image") & (F.col("media_ref") < "m-00000600")
    )
    with_payload = cat.select(
        "media_ref",
        F.encode(F.concat(F.col("media_ref"), F.lit(":img")), "utf-8").alias("payload"),
    )
    resized = multimodal.resize_images(
        with_payload, "media_ref", "payload", max_side=128, fake=True
    )
    return resized.select(
        "media_ref",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes_out"),
    )


@query(
    "schema_validation_documents_struct",
    oracle="""
    SELECT (lang IN ('de','en','es','fr') AND n_chars <= 400) AS valid,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def schema_validation_documents_struct(spark, sf_dir) -> DataFrame:
    """Schema-COMPILED validation (reference V1 over structured rows): a
    tightened Draft-4 schema — enum on lang, maximum on n_chars — compiles
    to pure-Catalyst boolean checks (validate.struct_conformance_flags);
    verdict aggregation is whole-stage codegen end-to-end.  The oracle is
    the equivalent SQL predicate."""
    docs = load_table(spark, sf_dir, "documents")
    schema = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer"},
            "lang": {"type": "string", "enum": ["de", "en", "es", "fr"]},
            "n_chars": {"type": "integer", "maximum": 400},
            "source": {"type": "string"},
            "text": {"type": "string"},
        },
        "required": ["doc_id", "lang", "n_chars", "source", "text"],
    }
    return validate.struct_conformance_report(docs, schema)


@query(
    "multimodal_frame_sample_plan",
    oracle="""
    SELECT media_ref, CAST(unnest(range(0, 10001, 1000)) AS INT) AS sample_at_ms
    FROM read_parquet('__CATALOG_PQ__')
    WHERE media_kind = 'audio' AND media_ref < 'm-00000300'
    """,
)
def multimodal_frame_sample_plan(spark, sf_dir) -> DataFrame:
    """Frame/segment-sampling work plan for time-media refs: pure built-ins
    (explode(sequence)) — no payload touched, so the planning stage is
    column-pruned to the ref column; the decode of each planned timestamp is
    the stubbed mapInPandas stage.  Fully oracled."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "audio") & (F.col("media_ref") < "m-00000300")
    )
    return multimodal.frame_sample_plan(cat, "media_ref", every_ms=1000)


@query(
    "multimodal_frame_features",
    oracle="""
    WITH plan AS (
      SELECT media_ref, media_ref || ':vid' AS payload,
             CAST(unnest(range(0, 10001, 2000)) AS INT) AS sample_at_ms
      FROM read_parquet('__CATALOG_PQ__')
      WHERE media_kind = 'audio' AND media_ref < 'm-00000150'
    )
    SELECT media_ref, sample_at_ms,
           sha256(payload || ':' || CAST(sample_at_ms AS VARCHAR)) AS frame_sha256,
           CAST(CAST('0x' || substr(
             sha256(payload || ':' || CAST(sample_at_ms AS VARCHAR)), 1, 2
           ) AS INT) AS INT) AS mean_luma
    FROM plan
    """,
)
def multimodal_frame_features(spark, sf_dir) -> DataFrame:
    """The full time-media pipeline shape: frame_sample_plan fans each ref
    into (ref, timestamp) work items, the payload joins in once per ref, and
    the stubbed frame decoder (sha256-pure, fake=True) emits per-frame
    features via mapInPandas — every row value-reproduced in SQL."""
    corpus = _spans_corpus(spark)
    cat = load_media_catalog(spark, corpus).filter(
        (F.col("media_kind") == "audio") & (F.col("media_ref") < "m-00000150")
    )
    plan = multimodal.frame_sample_plan(cat, "media_ref", every_ms=2000)
    with_payload = plan.join(
        cat.select(
            "media_ref",
            F.encode(F.concat(F.col("media_ref"), F.lit(":vid")), "utf-8").alias(
                "payload"
            ),
        ),
        "media_ref",
    )
    return multimodal.frame_features(
        with_payload, "media_ref", "payload", "sample_at_ms", fake=True
    )


@query(
    "multimodal_real_codec_features",
    oracle="""
    WITH i AS (SELECT unnest(range(0, 40)) AS i)
    SELECT 'wav-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           'wav' AS format, CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(100 + 5 * i AS INT) AS duration_ms,
           CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           round(CAST(1000 + i AS DOUBLE), 6) AS mean_value
    FROM i
    UNION ALL
    SELECT 'bmp-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'bmp', CAST(4 + i % 8 AS INT), CAST(3 + i % 5 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round((i % 256 + (2 * i) % 256 + (3 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'ppm-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'ppm', CAST(2 + i % 6 AS INT), CAST(2 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round((i % 200 + (5 * i) % 200 + (7 * i) % 200) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'png-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'png', CAST(3 + i % 6 AS INT), CAST(2 + i % 4 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((11 * i) % 256 + (13 * i) % 256 + (17 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'pngx-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'png', CAST(5 + i % 9 AS INT), CAST(3 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((2571 * i) % 65536 + (4099 * i) % 65536 + (6733 * i) % 65536) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'mp4-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'mp4', CAST(64 + 16 * (i % 5) AS INT), CAST(48 + 16 * (i % 4) AS INT),
           CAST(40 * (10 + i % 20) AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
           (SELECT round(AVG(50 + (7 * f.j + i) % 32), 6)
            FROM (SELECT unnest(range(0, 10 + i % 20)) AS j) f)
    FROM i
    UNION ALL
    SELECT 'jpg-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'jpeg', CAST(8 + i % 9 AS INT), CAST(8 + i % 7 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((31 * i) % 256 + (57 * i) % 256 + (89 * i) % 256) / 3.0, 6)
    FROM i
    UNION ALL
    SELECT 'jpgp-' || lpad(CAST(i AS VARCHAR), 4, '0'),
           'jpeg', CAST(8 + i % 6 AS INT), CAST(8 + i % 5 AS INT),
           CAST(0 AS INT), CAST(NULL AS INT), CAST(3 AS INT),
           round(((41 * i) % 256 + (67 * i) % 256 + (101 * i) % 256) / 3.0, 6)
    FROM i
    """,
)
def multimodal_real_codec_features(spark, sf_dir) -> DataFrame:
    """REAL stdlib codecs end-to-end (r3, VERDICT item 2; PNG r4 item 4):
    320 synthesized payloads across eight arms (WAV/BMP/PPM/PNG/16-bit-
    interlaced-PNG/MP4/JPEG/progressive-JPEG) decode through the
    Arrow-batched mapInPandas stage (operators/codecs.py — wave/struct/
    zlib/numpy, no external libs) and every derived field is recomputed
    arithmetically by the DuckDB oracle from the synthesis parameters: WAV
    duration = frames/rate, RMS of a constant signal = its amplitude;
    BMP/PPM/PNG dimensions from planted headers, mean channel value =
    (r+g+b)/3.  Each PNG uses scanline filter i % 5, so all five unfilter
    branches (None/Sub/Up/Average/Paeth) run in the distributed stage;
    the pngx- arm (r4) is 16-bit Adam7-INTERLACED PNG — tiny dimensions
    exercise empty interlace passes, and means are over the native
    0–65535 sample range.
    MP4 (r4) decodes the CONTAINER: geometry/duration from tkhd/mdhd,
    mean_value = mean coded-frame size from stsz.  JPEG (r4) runs the FULL
    baseline pipeline — Huffman entropy decode, dequant, IDCT, YCbCr→RGB —
    on solid-color q95 payloads, where quantization is provably lossless,
    so the oracle's (r+g+b)/3 check is exact; the jpgp- arm (r4) runs the
    PROGRESSIVE (SOF2) decoder — multi-scan spectral selection +
    successive approximation accumulating into the coefficient store —
    over progressively-encoded payloads of the same solid-color family.
    All recomputed by the oracle from the synthesis arithmetic.
    NotImplementedError now marks only decode that genuinely needs
    external codec libraries (coded video frames, arithmetic coding)."""
    import numpy as np

    from .operators.codecs import (
        encode_bmp,
        encode_jpeg,
        encode_mp4,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rows = []
    for i in range(40):
        rows.append(
            (
                f"jpg-{i:04d}",
                bytearray(
                    encode_jpeg(
                        np.full(
                            (8 + i % 7, 8 + i % 9, 3),
                            ((31 * i) % 256, (57 * i) % 256, (89 * i) % 256),
                            dtype=np.uint8,
                        ),
                        quality=95,
                    )
                ),
            )
        )
        rows.append(
            (
                f"jpgp-{i:04d}",
                bytearray(
                    encode_jpeg(
                        np.full(
                            (8 + i % 5, 8 + i % 6, 3),
                            ((41 * i) % 256, (67 * i) % 256, (101 * i) % 256),
                            dtype=np.uint8,
                        ),
                        quality=95,
                        progressive=True,
                    )
                ),
            )
        )
        rows.append(
            (
                f"mp4-{i:04d}",
                bytearray(
                    encode_mp4(
                        64 + 16 * (i % 5),
                        48 + 16 * (i % 4),
                        [50 + ((7 * j + i) % 32) for j in range(10 + i % 20)],
                    )
                ),
            )
        )
        rows.append((f"wav-{i:04d}", bytearray(encode_wav(800 + 40 * i, 1000 + i))))
        rows.append(
            (
                f"bmp-{i:04d}",
                bytearray(
                    encode_bmp(4 + i % 8, 3 + i % 5, (i % 256, (2 * i) % 256, (3 * i) % 256))
                ),
            )
        )
        rows.append(
            (
                f"ppm-{i:04d}",
                bytearray(
                    encode_ppm(2 + i % 6, 2 + i % 7, (i % 200, (5 * i) % 200, (7 * i) % 200))
                ),
            )
        )
        rows.append(
            (
                f"png-{i:04d}",
                bytearray(
                    encode_png(
                        3 + i % 6,
                        2 + i % 4,
                        ((11 * i) % 256, (13 * i) % 256, (17 * i) % 256),
                        filter_type=i % 5,
                    )
                ),
            )
        )
        rows.append(
            (
                f"pngx-{i:04d}",
                bytearray(
                    encode_png(
                        5 + i % 9,
                        3 + i % 7,
                        ((2571 * i) % 65536, (4099 * i) % 65536, (6733 * i) % 65536),
                        filter_type=(i + 2) % 5,
                        bit_depth=16,
                        interlace=True,
                    )
                ),
            )
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.decode_features(df, "media_ref", "payload")
    return feats.withColumn("mean_value", F.round("mean_value", 6))


@query(
    "multimodal_audio_spectral",
    oracle="""
    WITH i AS (SELECT CAST(unnest(range(0, 48)) AS INT) AS i),
         p AS (SELECT i,
                      1024 * (CASE i % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS n,
                      3 + (7 * i) % 50 AS k
               FROM i)
    SELECT 'sine-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           CAST(125 AS INT) AS duration_ms,
           CAST(8 * n AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(2 * k - 1 AS INT) AS zero_crossings,
           CAST(8 * k AS INT) AS dominant_freq_hz
    FROM p
    """,
)
def multimodal_audio_spectral(spark, sf_dir) -> DataFrame:
    """Spectral audio analysis (r4): 48 synthesized 16-bit PCM sines run
    through the Arrow-batched rFFT stage (multimodal.audio_spectral_features)
    and every output field is recomputed arithmetically by the oracle from
    the synthesis parameters: rate = 8·n so duration = n/(8n) s = 125 ms
    and the bin-k FFT peak sits at exactly 8·k Hz (zero leakage); k whole
    periods give 2k−1 sign-flip zero crossings (codecs.encode_wav_sine
    docstring derives both).  RMS ≈ amp/√2 is quantization-perturbed, so
    it is asserted with tolerance in pytest and projected out here."""
    from .operators.codecs import encode_wav_sine

    rows = []
    for i in range(48):
        n = 1024 * (1 << (i % 3))
        k = 3 + (7 * i) % 50
        amp = 500 + 137 * i
        rows.append((f"sine-{i:04d}", bytearray(encode_wav_sine(n, k, amp, rate=8 * n))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.audio_spectral_features(df, "media_ref", "payload")
    return feats.drop("rms")


@query(
    "multimodal_mjpeg_frame_features",
    oracle="""
    WITH r AS (SELECT CAST(unnest(range(0, 12)) AS INT) AS r),
         t AS (SELECT r, CAST(unnest(range(0, 40 * (12 + r) + 1, 160)) AS INT)
                      AS sample_at_ms
               FROM r),
         pick AS (SELECT r, sample_at_ms,
                         LEAST(sample_at_ms // 40, 11 + r) AS i
                  FROM t)
    SELECT 'mjpeg-' || lpad(CAST(r AS VARCHAR), 4, '0') AS media_ref,
           sample_at_ms, CAST(i AS INT) AS frame_idx, (i % 5 = 0) AS keyframe,
           CAST(24 AS INT) AS frame_w, CAST(16 AS INT) AS frame_h,
           CAST((31 * (r + i)) % 256 AS DOUBLE) AS mean_r,
           CAST((57 * (r + i)) % 256 AS DOUBLE) AS mean_g,
           CAST((89 * (r + i)) % 256 AS DOUBLE) AS mean_b
    FROM pick
    """,
)
def multimodal_mjpeg_frame_features(spark, sf_dir) -> DataFrame:
    """FULLY REAL video pipeline, zero stubs (r4): 12 Motion-JPEG MP4s
    (solid-color baseline-JPEG frames at 40 ms cadence inside a real ISO
    BMFF container) are demuxed from their sample tables, each 160 ms
    target's frame bytes are RANGE-SLICED out of the payload, and the
    baseline JPEG decoder reconstructs the pixels — per-frame dims and
    per-channel means, all recomputed arithmetically by the oracle (frame
    j of video r is solid ((31(r+j))%256, (57(r+j))%256, (89(r+j))%256),
    exact at q95 because solid blocks survive quantization).  One Arrow-
    batched stage; decode cost scales with SAMPLED frames, not video
    length — the shape a 100-TB video corpus needs."""
    import numpy as np

    from .operators.codecs import encode_jpeg, encode_mp4

    rows = []
    for r in range(12):
        frames = [
            encode_jpeg(
                np.full(
                    (16, 24, 3),
                    ((31 * (r + j)) % 256, (57 * (r + j)) % 256, (89 * (r + j)) % 256),
                    dtype=np.uint8,
                ),
                quality=95,
            )
            for j in range(12 + r)
        ]
        rows.append((f"mjpeg-{r:04d}", bytearray(encode_mp4(24, 16, frame_payloads=frames))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.frame_features_mp4(df, "media_ref", "payload", every_ms=160)


@query(
    "multimodal_validate_payloads",
    oracle="""
    WITH ids AS (SELECT CAST(unnest(range(0, 25)) AS BIGINT) AS i)
    SELECT 'ok-bmp-' || CAST(i AS VARCHAR) AS media_ref, 'bmp' AS claimed,
           'bmp' AS sniffed, 'ok' AS status, true AS ok FROM ids
    UNION ALL
    SELECT 'ok-gif-' || CAST(i AS VARCHAR), 'gif', 'gif', 'ok', true FROM ids
    UNION ALL
    SELECT 'corrupt-png-' || CAST(i AS VARCHAR), 'png', 'png', 'corrupt',
           false FROM ids
    UNION ALL
    SELECT 'mismatch-' || CAST(i AS VARCHAR), 'png', 'wav', 'kind_mismatch',
           false FROM ids
    UNION ALL
    SELECT 'empty-' || CAST(i AS VARCHAR), 'wav', NULL, 'empty', false
    FROM ids
    UNION ALL
    SELECT 'junk-' || CAST(i AS VARCHAR), 'bin', NULL, 'unknown_magic',
           false FROM ids
    UNION ALL
    SELECT 'wav24-' || CAST(i AS VARCHAR), 'wav', 'wav', 'unsupported',
           false FROM ids
    """,
)
def multimodal_validate_payloads(spark, sf_dir) -> DataFrame:
    """Payload-parses-as-claimed validation (multimodal.
    validate_media_payloads) — the binary-column arm of the constraint
    engine: 175 payloads across seven construction arms whose verdicts
    are provable from how each was built.  Valid BMP/GIF decode to 'ok';
    a PNG truncated inside its IHDR keeps perfect magic bytes but fails
    the full decode ('corrupt' — the arm a header-only check would pass);
    a valid WAV in a column claiming 'png' grades 'kind_mismatch' before
    any decode; empty and garbage payloads grade 'empty'/'unknown_magic';
    and a 24-bit WAV lands on the documented NotImplementedError seam
    ('unsupported'), distinguished from corruption.  The oracle is the
    construction itself, written as literal rows."""
    import io
    import wave

    import numpy as np

    from .operators.codecs import encode_bmp, encode_gif, encode_png, encode_wav

    rows = []
    for i in range(25):
        rows.append(
            (
                f"ok-bmp-{i}",
                "bmp",
                bytearray(
                    encode_bmp(
                        4 + i % 5,
                        3 + i % 4,
                        (i % 256, (3 * i) % 256, (7 * i) % 256),
                    )
                ),
            )
        )
        px = np.full(
            (5, 4, 3),
            ((11 * i) % 256, (5 * i) % 256, (2 * i) % 256),
            dtype=np.uint8,
        )
        rows.append((f"ok-gif-{i}", "gif", bytearray(encode_gif(4, 5, px))))
        rows.append(
            (
                f"corrupt-png-{i}",
                "png",
                bytearray(
                    encode_png(6 + i % 3, 6, ((13 * i) % 256, 0, 255))[
                        : 16 + i % 5
                    ]
                ),
            )
        )
        rows.append(
            (f"mismatch-{i}", "png", bytearray(encode_wav(50 + i, 1000 + i)))
        )
        rows.append((f"empty-{i}", "wav", bytearray(b"")))
        rows.append(
            (f"junk-{i}", "bin", bytearray(b"XYZW" + bytes([i % 256]) * 8))
        )
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(bytes([i % 256, 1, 2]) * 60)
        w.close()
        rows.append((f"wav24-{i}", "wav", bytearray(buf.getvalue())))
    df = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary"
    )
    return multimodal.validate_media_payloads(
        df, "media_ref", "payload", "kind"
    )


@query(
    "multimodal_frame_plan_from_durations",
    oracle="""
    WITH i AS (SELECT unnest(range(0, 40)) AS i),
         d AS (SELECT 'wav-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
                      100 + 5 * i AS dur
               FROM i)
    SELECT media_ref, CAST(unnest(range(0, dur + 1, 25)) AS INT) AS sample_at_ms
    FROM d
    """,
)
def multimodal_frame_plan_from_durations(spark, sf_dir) -> DataFrame:
    """Frame planning driven by REAL decoded durations: WAV payloads decode
    through the stdlib codec stage, and the planner fans out one work item
    per 25 ms of actual audio (multimodal.frame_plan_from_durations) — the
    oracle recomputes every timestamp from the synthesis arithmetic
    (duration = frames/rate)."""
    from .operators.codecs import encode_wav

    rows = [
        (f"wav-{i:04d}", bytearray(encode_wav(800 + 40 * i, 1000 + i)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = multimodal.decode_features(df, "media_ref", "payload")
    return multimodal.frame_plan_from_durations(feats, every_ms=25)


@query(
    "multimodal_resize_real_images",
    oracle="""
    WITH i AS (SELECT CAST(unnest(range(0, 40)) AS INT) AS i),
         src AS (SELECT i,
                        ['bmp', 'ppm', 'png', 'jpeg', 'gif'][(i % 5) + 1] AS fmt,
                        20 + 4 * (i % 13) AS iw,
                        12 + 3 * (i % 9) AS ih
                 FROM i),
         scaled AS (SELECT i, fmt, iw, ih,
                           LEAST(1.0, 16.0 / GREATEST(iw, ih)) AS s
                    FROM src)
    SELECT fmt || '-' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_ref,
           CAST(GREATEST(1, FLOOR(iw * s + 0.5)) AS INT) AS width,
           CAST(GREATEST(1, FLOOR(ih * s + 0.5)) AS INT) AS height,
           round(((31 * i) % 256 + (57 * i) % 256 + (89 * i) % 256) / 3.0, 6)
             AS mean_value
    FROM scaled
    """,
)
def multimodal_resize_real_images(spark, sf_dir) -> DataFrame:
    """REAL image resize end-to-end (r4): 40 solid-color payloads across
    all five pixel-decodable formats (BMP/PPM/PNG/GIF and baseline JPEG at
    q95, where solid blocks survive quantization bit-exactly) decode,
    bilinear-downscale to a 16-px box (half-pixel centers; bilinear of a
    constant is the constant), and re-encode as lossless PNG; the output
    PNGs are then RE-DECODED by the shared feature stage, so the oracle's
    arithmetic mean check covers decode → resize → encode → decode.
    Dimension arithmetic is half-up rounding, matching SQL ROUND."""
    import numpy as np

    from .operators.codecs import (
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_ppm,
    )

    rows = []
    for i in range(40):
        fmt = ["bmp", "ppm", "png", "jpeg", "gif"][i % 5]
        iw, ih = 20 + 4 * (i % 13), 12 + 3 * (i % 9)
        rgb = ((31 * i) % 256, (57 * i) % 256, (89 * i) % 256)
        if fmt == "bmp":
            p = encode_bmp(iw, ih, rgb)
        elif fmt == "ppm":
            p = encode_ppm(iw, ih, rgb)
        elif fmt == "png":
            p = encode_png(iw, ih, rgb, filter_type=i % 5)
        elif fmt == "gif":
            p = encode_gif(iw, ih, np.full((ih, iw, 3), rgb, dtype=np.uint8))
        else:
            p = encode_jpeg(np.full((ih, iw, 3), rgb, dtype=np.uint8), quality=95)
        rows.append((f"{fmt}-{i:04d}", bytearray(p)))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    resized = multimodal.resize_images(df, "media_ref", "payload", max_side=16)
    feats = multimodal.decode_features(resized, "media_ref", "payload")
    return resized.select("media_ref", "width", "height").join(
        feats.select("media_ref", F.round("mean_value", 6).alias("mean_value")),
        "media_ref",
    )


@query(
    "multimodal_mp4_frame_plan",
    oracle="""
    WITH r AS (SELECT CAST(unnest(range(0, 20)) AS INT) AS r),
         f AS (SELECT r, CAST(unnest(range(0, 24 + r)) AS INT) AS i FROM r),
         sz AS (SELECT r, i, 50 + (7 * i + r) % 32 AS n_bytes FROM f),
         off AS (SELECT r, i, n_bytes,
                        32 + COALESCE(SUM(n_bytes) OVER (
                          PARTITION BY r ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS byte_offset
                 FROM sz),
         t AS (SELECT r, CAST(unnest(range(0, 40 * (24 + r) + 1, 200)) AS INT)
                      AS sample_at_ms
               FROM r),
         pick AS (SELECT r, sample_at_ms,
                         LEAST(sample_at_ms // 40, 23 + r) AS i
                  FROM t)
    SELECT 'mp4-' || lpad(CAST(r AS VARCHAR), 4, '0') AS media_ref,
           sample_at_ms,
           CAST(i AS INT) AS frame_idx,
           CAST(40 * i AS INT) AS pts_ms,
           CAST(byte_offset AS BIGINT) AS byte_offset,
           CAST(n_bytes AS INT) AS n_bytes,
           (i % 5 = 0) AS keyframe,
           CAST(i - (i % 5) AS INT) AS seek_from_idx
    FROM pick JOIN off USING (r, i)
    """,
)
def multimodal_mp4_frame_plan(spark, sf_dir) -> DataFrame:
    """REAL MP4 frame-sampling plan (r4): 20 synthesized ISO BMFF files
    (mdat-first, per-sample stsz, 7-samples-per-chunk stsc/stco, stss
    keyframes every 5) demux through codecs.parse_mp4 inside the Arrow-
    batched planner, and every emitted field — frame index at each 200 ms
    target, its pts, ABSOLUTE byte range reconstructed from the chunk
    tables, keyframe flag, and the stss seek point — is recomputed
    arithmetically by the oracle from the synthesis parameters (frame j of
    file r is 50 + (7j + r) % 32 bytes at 40 ms cadence; mdat body starts
    at offset 32).  This is the operator a video pipeline uses to range-
    read frames from object storage without decoding or shipping files."""
    from .operators.codecs import encode_mp4

    rows = [
        (
            f"mp4-{r:04d}",
            bytearray(
                encode_mp4(
                    64 + 16 * (r % 5),
                    48 + 16 * (r % 4),
                    [50 + ((7 * i + r) % 32) for i in range(24 + r)],
                )
            ),
        )
        for r in range(20)
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.frame_plan_mp4(df, "media_ref", "payload", every_ms=200)


# ===========================================================================
# Streaming under the driver contract (r3, VERDICT item 1): each streaming
# operator is driven to a DETERMINISTIC batch result via
# trigger(availableNow=True) over the deterministic corpus + a memory /
# foreachBatch sink, so the driver's DuckDB oracle checks it like any batch
# query.  Results are written batching-AGNOSTIC (lifetime maxes, complete-
# mode windows, snapshot files) so micro-batch boundaries can never change
# the checked values.
# ===========================================================================

_SPANS_DDL = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _stream_tmp(prefix: str):
    import tempfile
    from pathlib import Path

    return Path(tempfile.mkdtemp(prefix=prefix))


def _spans_stream(spark, corpus):
    return (
        spark.readStream.format("parquet")
        .schema(_SPANS_DDL)
        .load(str(corpus / "documents_spans"))
    )


@query(
    "stream_incremental_schema",
    oracle=f"""
    SELECT '{_SPANS_STRUCT_SCHEMA}' AS unified_schema,
           count(*) AS n_docs FROM read_parquet('__SPANS_GLOB__')
    """,
)
def stream_incremental_schema(spark, sf_dir) -> DataFrame:
    """Streaming incremental schema unification (EP2's streaming face,
    streaming/incremental.py): readStream over the corpus → foreachBatch
    fold+unify → atomic snapshot file, drained with availableNow.  The
    snapshot after the drain must equal the batch-engine schema REGARDLESS
    of micro-batch boundaries (unify associativity), which is exactly what
    the constant-schema + real-count oracle checks."""
    from .schema_algebra import canonical_json
    from .streaming.incremental import SchemaSnapshot, incremental_schema_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_inc_")
    q = incremental_schema_stream(
        spark,
        str(corpus / "documents_spans"),
        tmp / "snapshot.json",
        str(tmp / "ckpt"),
        source_schema=_SPANS_DDL,
    )
    q.awaitTermination()
    schema, n_docs, _n_batches, _last = SchemaSnapshot(tmp / "snapshot.json").read()
    return spark.createDataFrame(
        [(canonical_json(schema), n_docs)], "unified_schema string, n_docs long"
    )


@query(
    "stream_violation_window_counts",
    oracle="""
    WITH t AS (SELECT CAST(substr(doc_id, 5) AS BIGINT) % 60 AS m,
                      spans, list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__')),
         v AS (SELECT 1767225600 + m * 60 AS window_start,
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
    SELECT window_start, window_start + 60 AS window_end,
           'monotonic_offsets' AS "check",
           count(*) AS n_rows, CAST(sum(f_mono) AS BIGINT) AS n_failed
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'text_present',
           count(*), CAST(sum(f_text) AS BIGINT)
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'media_ref_present',
           count(*), CAST(sum(f_media) AS BIGINT)
    FROM v GROUP BY window_start
    """,
)
def stream_violation_window_counts(spark, sf_dir) -> DataFrame:
    """Watermarked windowed violation monitor (streaming/monitor.py) driven
    to a batch answer: a deterministic event-time is derived from the doc
    index (minute m = doc-index mod 60 after a fixed epoch), the stream is
    drained with availableNow into a COMPLETE-mode memory sink (complete =
    every window re-emitted, so append-mode watermark finalization can never
    hide the tail windows), and window bounds are output as epoch seconds
    (timestamps are excluded from oracles per the hygiene notes)."""
    import uuid

    from .streaming.monitor import violation_counts_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_vwc_")
    stream = _spans_stream(spark, corpus).withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1767225600)
            + (F.substring("doc_id", 5, 12).cast("long") % 60) * 60
        ),
    )
    counts = violation_counts_stream(
        stream, window_duration="1 minute", watermark="2 minutes"
    )
    name = f"svwc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start"),
        F.col("window_end").cast("long").alias("window_end"),
        "check",
        "n_rows",
        "n_failed",
    )


@query(
    "stream_duplicate_doc_ids",
    oracle="""
    SELECT doc_id, count(*) AS cnt
    FROM read_parquet('__SPANS_GLOB__')
    GROUP BY doc_id HAVING count(*) > 1
    """,
)
def stream_duplicate_doc_ids(spark, sf_dir) -> DataFrame:
    """Cross-batch stateful uniqueness (streaming/stateful.py,
    applyInPandasWithState): drained with availableNow into an update-mode
    memory sink.  A doc_id re-emits each time its lifetime count grows, so
    the batching-agnostic reduction max(cnt) per doc_id equals the batch
    groupBy count — which is exactly the oracle."""
    import uuid

    from .streaming.stateful import duplicate_doc_ids_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_dup_")
    dups = duplicate_doc_ids_stream(_spans_stream(spark, corpus))
    name = f"sdup_{uuid.uuid4().hex[:8]}"
    q = (
        dups.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("doc_id").agg(F.max("cnt").alias("cnt"))


@query(
    "stream_schema_drift_alerts",
    oracle="""
    SELECT CAST(alert_seq AS BIGINT) AS alert_seq, change, path,
           backward_compatible, forward_compatible
    FROM (VALUES (0, 'new_schema', '$', true, false),
                 (1, 'new_property', '$.extra', false, true))
         AS t(alert_seq, change, path, backward_compatible, forward_compatible)
    """,
)
def stream_schema_drift_alerts(spark, sf_dir) -> DataFrame:
    """Streaming schema-drift alerts (streaming/incremental.py): two
    availableNow drains over a growing JSON-docs source sharing one stream
    checkpoint + snapshot.  Drain 1 ({"k":int} docs) must alert new_schema
    at $; drain 2 (docs gaining an "extra" key) must alert exactly one
    new_property at $.extra (required stays ["k"] — intersection semantics —
    so no required_dropped).  The compat verdicts are forced too: alert 0
    (no previous snapshot) is backward-true/forward-false by definition;
    alert 1 is backward-FALSE (adding a typed property to an OPEN object
    narrows it — the Draft-4 non-lattice corner subschema_violations
    documents) and forward-true (new docs still satisfy the old contract).
    The oracle is that HAND-DERIVED constant: the semantics force it, no
    snapshot pinning involved."""
    import json as _json

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from .streaming.incremental import schema_drift_alert_stream

    tmp = _stream_tmp("stream_drift_")
    src = tmp / "src"
    src.mkdir()
    _pq.write_table(
        _pa.table({"doc": [f'{{"k":{i}}}' for i in range(100)]}),
        src / "b1.parquet",
    )
    kwargs = dict(
        snapshot_path=tmp / "snap.json",
        alerts_path=tmp / "alerts.jsonl",
        checkpoint_dir=str(tmp / "ckpt"),
        source_schema="doc string",
        json_column="doc",
    )
    schema_drift_alert_stream(spark, str(src), **kwargs).awaitTermination()
    _pq.write_table(
        _pa.table({"doc": [f'{{"extra":"x{i}","k":{i}}}' for i in range(50)]}),
        src / "b2.parquet",
    )
    schema_drift_alert_stream(spark, str(src), **kwargs).awaitTermination()
    rows = []
    seen_batches = set()
    seq = -1
    for line in (tmp / "alerts.jsonl").read_text().splitlines():
        rec = _json.loads(line)
        if rec["batch_id"] in seen_batches:
            continue  # at-least-once alert replay: consumer-side dedupe
        seen_batches.add(rec["batch_id"])
        seq += 1
        for ch in rec["changes"]:
            rows.append(
                (
                    seq,
                    ch["change"],
                    ch["path"],
                    rec["backward_compatible"],
                    rec["forward_compatible"],
                )
            )
    return spark.createDataFrame(
        rows,
        "alert_seq long, change string, path string, "
        "backward_compatible boolean, forward_compatible boolean",
    )


# ===========================================================================
# Checkpoint / resume under the driver contract (r3, VERDICT item 2)
# ===========================================================================

@query(
    "checkpoint_resume_state",
    oracle="""
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
           (sum(f_mono) + sum(f_text) + sum(f_media)) = 0 AS passed,
           true AS zero_recompute_on_resume
    FROM v GROUP BY split
    """,
)
def checkpoint_resume_state(spark, sf_dir) -> DataFrame:
    """The north-rule resume, driver-checkable: a killed run (max_splits=3),
    a resume, and an idempotent re-run against one state store; the output
    is the final per-split lineage/metrics table (split, n_rows, passed)
    with a zero_recompute_on_resume flag asserting the split arithmetic
    (run1 computed 3, run2 computed total-3, run3 computed 0).  The oracle
    recomputes the lineage from the raw files via read_parquet(filename) —
    if resume double-counted or skipped a split, n_rows/passed diverge."""
    from .checkpoint import checkpointed_validate

    corpus = _spans_corpus(spark)
    data = str(corpus / "documents_spans")
    state = _stream_tmp("ckpt_state_") / "state"
    r1 = checkpointed_validate(spark, data, state, max_splits=3)
    r2 = checkpointed_validate(spark, data, state)
    r3 = checkpointed_validate(spark, data, state)
    zero = (
        r1["splits_computed_this_run"] == 3
        and r2["splits_computed_this_run"] == r1["splits_total"] - 3
        and r3["splits_computed_this_run"] == 0
    )
    rows = [
        (rec["split"], rec["n_rows"], rec["passed"], zero)
        for rec in r3["lineage"]
    ]
    return spark.createDataFrame(
        rows, "split string, n_rows long, passed boolean, zero_recompute_on_resume boolean"
    )


@query(
    "schema_merge_checkpoint_snapshots",
    oracle=f"""
    SELECT '{_SPANS_STRUCT_SCHEMA}' AS unified_schema,
           count(DISTINCT filename) AS n_splits
    FROM read_parquet('__SPANS_GLOB__', filename=true)
    """,
)
def schema_merge_checkpoint_snapshots(spark, sf_dir) -> DataFrame:
    """EP2 (schemasToSchema) as the checkpoint-merge workflow (r3, VERDICT
    item 9): run the resumable validation to completion, read the persisted
    per-split DRAFT schemas back from the state table, and fold them with
    the pure n-ary unify — the exact upstream entry point operating on
    persisted snapshots rather than live documents.  The folded schema must
    equal the batch-engine constant and n_splits the distinct-file count."""
    from .checkpoint import TableStateStore, checkpointed_validate
    from .schema_algebra import canonical_json, parse_schema, schemas_to_schema

    corpus = _spans_corpus(spark)
    data = str(corpus / "documents_spans")
    state = _stream_tmp("ckpt_merge_") / "state"
    checkpointed_validate(spark, data, state)
    recs = TableStateStore(state).committed()
    drafts = [parse_schema(rec["draft"]) for _, rec in sorted(recs.items())]
    unified = schemas_to_schema(drafts)
    return spark.createDataFrame(
        [(canonical_json(unified), len(drafts))],
        "unified_schema string, n_splits long",
    )


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
    from .operators import decontam

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
    from .operators import decontam

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
    "pack_sequences_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source AS shard,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           shard || '#' || CAST(CAST(floor(s / 256) AS BIGINT) AS VARCHAR)
             AS seq_id,
           s % 256 AS seq_offset
    FROM c
    """,
)
def pack_sequences_documents(spark, sf_dir) -> DataFrame:
    """Training-sequence packing (concat-and-cut at a 256-token budget,
    packed per source shard — never a global window; pack.py scale notes)."""
    from .operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    return out.select(
        F.col("id").alias("doc_id"), "shard", "n_tokens", "seq_id", "seq_offset"
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


@query(
    "schema_history_transitions",
    oracle="""
    SELECT * FROM (VALUES
      (1, 2, 1, false, true),
      (2, 3, 1, true, false)
    ) AS t(from_version, to_version, n_changes,
           backward_compatible, forward_compatible)
    """,
)
def schema_history_transitions(spark, sf_dir) -> DataFrame:
    """Versioned schema-snapshot log with compat-classified transitions
    (sinks.SchemaHistory): three planted runs — base, +typed property,
    +type widening — produce the two hand-derivable transition verdicts:
    adding a typed property to an OPEN object is backward-INCOMPATIBLE but
    forward-compatible; widening int→number is backward-compatible but
    breaks old readers.  The oracle is that forced constant."""
    from .schema_algebra import jsons_to_schema, unify_opt
    from .sources.sinks import SchemaHistory

    hist = SchemaHistory(_stream_tmp("schema_hist_"))
    acc = None
    for batch in ([{"k": 1}], [{"k": 2, "s": "x"}], [{"k": 2.5}]):
        acc = unify_opt(acc, jsons_to_schema(batch))
        hist.append(acc, len(batch))
    return spark.createDataFrame(
        [
            (
                t["from_version"],
                t["to_version"],
                t["n_changes"],
                t["backward_compatible"],
                t["forward_compatible"],
            )
            for t in hist.transitions()
        ],
        "from_version long, to_version long, n_changes long, "
        "backward_compatible boolean, forward_compatible boolean",
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
    "rule_verdicts_events",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS n_rows,
             CAST(sum(CASE WHEN NOT coalesce(value >= 0, false)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_nonneg,
             CAST(sum(CASE WHEN NOT coalesce(ts IS NOT NULL, false)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
             CAST(sum(CASE WHEN NOT coalesce(
                             event_type <> 'purchase' OR value > 0, false)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_purchase
      FROM events GROUP BY event_type
    )
    SELECT event_type, 'value_nonneg' AS rule, n_rows,
           v_nonneg AS n_violations, v_nonneg = 0 AS passed FROM g
    UNION ALL
    SELECT event_type, 'ts_present', n_rows, v_ts, v_ts = 0 FROM g
    UNION ALL
    SELECT event_type, 'purchase_value_positive', n_rows, v_purchase,
           v_purchase = 0 FROM g
    """,
)
def rule_verdicts_events(spark, sf_dir) -> DataFrame:
    """User-definable rule DSL (validate.rule_verdicts): three declarative
    rules — a range check, a presence check, and a CONDITIONAL implication
    — evaluated per event_type in ONE multi-aggregate scan; adding a rule
    adds an aggregate expression, never a pass over the data."""
    events = load_table(spark, sf_dir, "events")
    rules = {
        "value_nonneg": F.col("value") >= 0,
        "ts_present": F.col("ts").isNotNull(),
        "purchase_value_positive": (F.col("event_type") != "purchase")
        | (F.col("value") > 0),
    }
    return validate.rule_verdicts(events, rules, by="event_type")


@query(
    "rule_violation_rows_events",
    oracle="""
    SELECT id, rule FROM (
      SELECT event_id AS id, 'value_under_100' AS rule,
             row_number() OVER (ORDER BY event_id) AS rk
      FROM events WHERE NOT coalesce(value < 100, false)
      UNION ALL
      SELECT event_id, 'no_error_events',
             row_number() OVER (ORDER BY event_id)
      FROM events WHERE NOT coalesce(event_type <> 'error', false)
    ) WHERE rk <= 50
    """,
)
def rule_violation_rows_events(spark, sf_dir) -> DataFrame:
    """Row-level companion of the rule DSL (validate.rule_violation_rows):
    capped per-rule violating-row samples, smallest ids first — the review
    queue behind the verdict counts.  Rules chosen to actually FIRE on the
    driver tables (values reach 490; 'error' events exist) so the cap and
    ordering are value-checked, not vacuously green."""
    events = load_table(spark, sf_dir, "events")
    rules = {
        "value_under_100": F.col("value") < 100,
        "no_error_events": F.col("event_type") != "error",
    }
    return validate.rule_violation_rows(events, rules, "event_id", cap_per_rule=50)


@query(
    "constraint_suggestions_events",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n,
             count(event_id) AS nn1, count(DISTINCT event_id) AS nd1,
             min(event_id) AS mn1, max(event_id) AS mx1,
             count(user_id) AS nn2, count(DISTINCT user_id) AS nd2,
             min(user_id) AS mn2, max(user_id) AS mx2,
             count(event_type) AS nn3, count(DISTINCT event_type) AS nd3,
             count(value) AS nn4, count(DISTINCT value) AS nd4,
             min(value) AS mn4
      FROM events
    ), ev AS (
      SELECT string_agg(to_json(v), ', ' ORDER BY v) AS vals
      FROM (SELECT DISTINCT event_type AS v FROM events
            WHERE event_type IS NOT NULL)
    )
    SELECT 'event_id' AS "column", 'NOT NULL' AS suggestion,
           n AS n_rows, nn1 AS n_nonnull, nd1 AS n_distinct
    FROM s WHERE n > 0 AND nn1 = n
    UNION ALL SELECT 'event_id', 'UNIQUE', n, nn1, nd1 FROM s
      WHERE nn1 > 0 AND nd1 = nn1
    UNION ALL SELECT 'event_id', 'NON NEGATIVE', n, nn1, nd1 FROM s
      WHERE mn1 >= 0
    UNION ALL SELECT 'event_id',
      'RANGE [' || CAST(mn1 AS VARCHAR) || ', ' || CAST(mx1 AS VARCHAR) || ']',
      n, nn1, nd1 FROM s WHERE mn1 IS NOT NULL
    UNION ALL SELECT 'user_id', 'NOT NULL', n, nn2, nd2 FROM s
      WHERE n > 0 AND nn2 = n
    UNION ALL SELECT 'user_id', 'UNIQUE', n, nn2, nd2 FROM s
      WHERE nn2 > 0 AND nd2 = nn2
    UNION ALL SELECT 'user_id', 'NON NEGATIVE', n, nn2, nd2 FROM s
      WHERE mn2 >= 0
    UNION ALL SELECT 'user_id',
      'RANGE [' || CAST(mn2 AS VARCHAR) || ', ' || CAST(mx2 AS VARCHAR) || ']',
      n, nn2, nd2 FROM s WHERE mn2 IS NOT NULL
    UNION ALL SELECT 'event_type', 'NOT NULL', n, nn3, nd3 FROM s
      WHERE n > 0 AND nn3 = n
    UNION ALL SELECT 'event_type', 'UNIQUE', n, nn3, nd3 FROM s
      WHERE nn3 > 0 AND nd3 = nn3
    UNION ALL SELECT 'event_type', 'IS IN (' || ev.vals || ')', n, nn3, nd3
      FROM s, ev WHERE nd3 BETWEEN 1 AND 16
    UNION ALL SELECT 'value', 'NOT NULL', n, nn4, nd4 FROM s
      WHERE n > 0 AND nn4 = n
    UNION ALL SELECT 'value', 'UNIQUE', n, nn4, nd4 FROM s
      WHERE nn4 > 0 AND nd4 = nn4
    UNION ALL SELECT 'value', 'NON NEGATIVE', n, nn4, nd4 FROM s
      WHERE mn4 >= 0
    """,
)
def constraint_suggestions_events(spark, sf_dir) -> DataFrame:
    """Constraint SUGGESTION (validate.suggest_constraints) — the
    deequ-style profiling loop-closer: one multi-aggregate scan derives
    per-column counters, a second bounded scan collects sorted value sets
    for only the proved-low-cardinality string columns, and the output
    rows (NOT NULL / UNIQUE / IS IN / NON NEGATIVE / RANGE with their
    supporting counts) compile back into executable rule_verdicts
    predicates via validate.rules_from_suggestions (round-trip asserted
    in pytest).  The DuckDB oracle re-derives every suggestion — and its
    firing CONDITION — from the same aggregates."""
    events = load_table(spark, sf_dir, "events")
    return validate.suggest_constraints(
        events, ["event_id", "user_id", "event_type", "value"]
    )


@query(
    "histogram_events_value",
    oracle="""
    WITH b AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bucket),
         c AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket,
                  count(*) AS n_rows
           FROM events
           WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         )
    SELECT b.bucket,
           0.0 + b.bucket * 25.0 AS bucket_lo,
           0.0 + (b.bucket + 1) * 25.0 AS bucket_hi,
           CAST(coalesce(c.n_rows, 0) AS BIGINT) AS n_rows
    FROM b LEFT JOIN c ON b.bucket = c.bucket
    """,
)
def histogram_events_value(spark, sf_dir) -> DataFrame:
    """Equi-width distribution profile (stats.column_histogram): 20
    buckets over [0, 500] for events.value — bucket ids from the
    identical double expression in both engines, empty buckets emitted
    via the broadcast spine join, col == hi clamped into the last
    bucket."""
    events = load_table(spark, sf_dir, "events")
    return stats.column_histogram(events, "value", 0.0, 500.0, 20)


@query(
    "top_values_documents_lang",
    oracle="""
    WITH c AS (
      SELECT CAST(lang AS VARCHAR) AS value, count(*) AS n_rows
      FROM documents WHERE lang IS NOT NULL GROUP BY 1
    ), r AS (
      SELECT value, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, value ASC) AS rk
      FROM c
    )
    SELECT value, n_rows, false AS is_other FROM r WHERE rk <= 3
    UNION ALL
    SELECT 'OTHER', (SELECT CAST(sum(n_rows) AS BIGINT) FROM r WHERE rk > 3),
           true
    WHERE EXISTS (SELECT 1 FROM r WHERE rk > 3)
    """,
)
def top_values_documents_lang(spark, sf_dir) -> DataFrame:
    """Categorical profile (stats.top_values): 3 most frequent languages
    plus the OTHER rollup, ties broken on value ascending — k chosen
    below the column's cardinality so the OTHER arm is value-checked,
    not vacuously absent.  Two-stage top-k keeps the global ordering's
    input at k × partitions."""
    docs = load_table(spark, sf_dir, "documents")
    return stats.top_values(docs, "lang", 3)


@query(
    "correlations_lineitem",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round(corr(l_quantity, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_tax',
           round(corr(l_extendedprice, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round(corr(l_discount, l_tax), 6) FROM lineitem
    """,
)
def correlations_lineitem(spark, sf_dir) -> DataFrame:
    """Pairwise Pearson correlation profile (stats.correlation_pairs):
    all 6 unordered pairs of 4 numeric lineitem columns in ONE
    multi-aggregate pass (co-moment map-side partials), rounded to 6
    decimals so the comparison is summation-order-independent across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.correlation_pairs(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@query(
    "mutual_information_events",
    oracle="""
    WITH t AS (
      SELECT event_type, user_id FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT 'event_type' AS col_a, 'user_id' AS col_b,
           round(entropy(event_type) + entropy(user_id)
                 - entropy(row(event_type, user_id)), 6) AS mi
    FROM t
    """,
)
def mutual_information_events(spark, sf_dir) -> DataFrame:
    """Mutual information between event_type and user_id
    (stats.mutual_information): MI = H(a) + H(b) − H(a,b), all three
    entropies folded from ONE joint count table — the raw data is
    scanned once, the marginals re-aggregate the bounded joint."""
    events = load_table(spark, sf_dir, "events")
    return stats.mutual_information(events, "event_type", "user_id")


@query(
    "entropy_events",
    oracle="""
    SELECT 'event_type' AS "column",
           round(entropy(event_type), 6) AS entropy FROM events
    UNION ALL
    SELECT 'user_id', round(entropy(user_id), 6) FROM events
    UNION ALL
    SELECT 'value', round(entropy(value), 6) FROM events
    """,
)
def entropy_events(spark, sf_dir) -> DataFrame:
    """Shannon entropy profile (stats.column_entropy, base 2 to match
    DuckDB's entropy()): per column, one bounded groupBy folded via
    H = log2(n) − (Σ c·log2 c)/n — never a join of the total back onto
    the counts."""
    events = load_table(spark, sf_dir, "events")
    return stats.column_entropy(events, ["event_type", "user_id", "value"])


@query(
    "packing_stats_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source AS shard,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    ), p AS (
      SELECT shard, n_tokens,
             shard || '#' || CAST(CAST(floor(s / 256) AS BIGINT) AS VARCHAR)
               AS seq_id
      FROM c
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(CAST(sum(n_tokens) AS BIGINT) / 256) AS BIGINT)
             AS n_sequences,
           count(DISTINCT seq_id) AS n_doc_start_sequences,
           round(CAST(sum(n_tokens) AS BIGINT)
                 / (ceil(CAST(sum(n_tokens) AS BIGINT) / 256) * 256), 6)
             AS fill_ratio
    FROM p GROUP BY shard
    """,
)
def packing_stats_documents(spark, sf_dir) -> DataFrame:
    """Per-shard packing report over the packed documents (pack.packing_
    stats): exact sequence count ceil(total/budget), doc-start coverage,
    final-sequence fill ratio — all integer-derived, exactly SQL-oracled."""
    from .operators import pack

    docs = load_table(spark, sf_dir, "documents")
    packed = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    return pack.packing_stats(packed, budget=256)


@query(
    "chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), s0 AS (
      SELECT doc_id, tk, unnest(range(0, len(tk), 12)) AS cs
      FROM t WHERE len(tk) > 0
    ), s AS (
      SELECT doc_id, tk, cs FROM s0 WHERE cs = 0 OR cs + 4 < len(tk)
    )
    SELECT doc_id AS id, CAST(cs AS BIGINT) AS chunk_start,
           CAST(len(tk[cs + 1 : cs + 16]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[cs + 1 : cs + 16], ' ') AS chunk_text
    FROM s
    """,
)
def chunk_documents(spark, sf_dir) -> DataFrame:
    """Token-budget document chunking with overlap (pack.chunk_documents:
    16-token chunks, 4-token overlap → stride 12) — the upstream complement
    of sequence packing; row-local JVM fan-out, exactly SQL-oracled."""
    from .operators import pack

    docs = load_table(spark, sf_dir, "documents")
    return pack.chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=4)


@query(
    "quota_sample_documents",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substring(md5(concat_ws(chr(31), '42',
                          cast(doc_id AS VARCHAR))), 1, 8),
                        cast(doc_id AS VARCHAR)
             ) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def quota_sample_documents(spark, sf_dir) -> DataFrame:
    """Domain balancing: at most 10 documents per source, selected by
    deterministic hash order (sample.quota_sample) — the count-cap mixture
    rule where a rate is the wrong tool because stratum sizes vary by
    orders of magnitude; growth-stable and engine-portable, hence the
    exact window-SQL oracle."""
    from .operators.sample import quota_sample

    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, "doc_id", "source", quota=10).select(
        "doc_id", "source"
    )


@query(
    "schema_apply_events_props",
    oracle="""
    SELECT event_id, CAST(props::JSON ->> '$.k' AS BIGINT) AS k
    FROM events WHERE props IS NOT NULL
    """,
)
def schema_apply_events_props(spark, sf_dir) -> DataFrame:
    """Schema-on-read enforcement (infer.apply_schema): parse the JSON
    column into TYPED columns using the engine's own inferred schema —
    infer → enforce-on-read, all JVM-side (from_json with the
    draft-derived Spark type; ddl.py is the enforce-on-write half)."""
    from .operators.infer import apply_schema

    events = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    schema, _ = infer_from_json_column(events, "props")
    typed = apply_schema(events, "props", schema)
    return typed.select("event_id", F.col("parsed.k").alias("k"))


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
    from .operators import stats as stats_ops

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
    from .operators import stats as stats_ops

    df = load_spans(spark, _spans_corpus(spark))
    refs = df.select(
        F.explode("spans.media_ref").alias("media_ref")
    ).filter(F.col("media_ref").isNotNull())
    return stats_ops.key_skew_report(refs, "media_ref", top_k=10)


@query(
    "schema_evolution_ddl",
    oracle="""
    SELECT CAST(stmt_no AS BIGINT) AS stmt_no, stmt FROM (VALUES
      (1, 'ALTER TABLE local.db.events_props ADD COLUMN src STRING'),
      (2, 'ALTER TABLE local.db.events_props ALTER COLUMN k TYPE DOUBLE')
    ) AS t(stmt_no, stmt)
    """,
)
def schema_evolution_ddl(spark, sf_dir) -> DataFrame:
    """Enforcement bridge (ddl.py): infer the current snapshot's unified
    schema, unify in a drifted batch (k becomes fractional, src appears),
    and emit the Iceberg ALTER TABLE statements that evolve the table to
    the new contract.  Oracle = the hand-derived statements forced by the
    sf0.01 events schema constant ({k: integer}) + the engine's pinned
    unify semantics — any drift in inference, diff walk, or DDL rendering
    breaks the value hash."""
    from . import ddl as ddl_mod
    from .schema_algebra import json_to_schema, unify

    events = load_table(spark, sf_dir, "events")
    old, _ = infer_from_json_column(events, "props")
    new = unify(old, json_to_schema({"k": 2.5, "src": "web"}))
    stmts = ddl_mod.evolution_ddl(old, new, "local.db.events_props")
    return spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stmts)], "stmt_no long, stmt string"
    )


@query(
    "stream_rule_window_counts",
    oracle="""
    WITH t AS (SELECT CAST(substr(doc_id, 5) AS BIGINT) % 60 AS m,
                      doc_id, spans
               FROM read_parquet('__SPANS_GLOB__')),
         v AS (SELECT 1767225600 + m * 60 AS window_start,
                      CASE WHEN NOT coalesce(len(spans) > 0, false)
                           THEN 1 ELSE 0 END AS f_has,
                      CASE WHEN NOT coalesce(
                               regexp_matches(doc_id, '^(doc|hot)-[0-9]{12}$'),
                               false)
                           THEN 1 ELSE 0 END AS f_id,
                      CASE WHEN NOT coalesce(
                               len(list_filter(spans, s -> s.offset < 0)) = 0,
                               false)
                           THEN 1 ELSE 0 END AS f_off
               FROM t)
    SELECT window_start, window_start + 60 AS window_end,
           'has_spans' AS rule, count(*) AS n_rows,
           CAST(sum(f_has) AS BIGINT) AS n_violations
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'id_wellformed',
           count(*), CAST(sum(f_id) AS BIGINT)
    FROM v GROUP BY window_start
    UNION ALL
    SELECT window_start, window_start + 60, 'offsets_nonneg',
           count(*), CAST(sum(f_off) AS BIGINT)
    FROM v GROUP BY window_start
    """,
)
def stream_rule_window_counts(spark, sf_dir) -> DataFrame:
    """Streaming twin of the rule DSL (streaming/monitor.py::
    rule_counts_stream): three USER-DEFINED rules — an array-size check, a
    regex id-format check, and a forall-over-elements check — scored per
    event-time window; same derived-event-time / availableNow /
    complete-mode-memory-sink harness as stream_violation_window_counts."""
    import uuid

    from .streaming.monitor import rule_counts_stream

    corpus = _spans_corpus(spark)
    tmp = _stream_tmp("stream_rwc_")
    stream = _spans_stream(spark, corpus).withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1767225600)
            + (F.substring("doc_id", 5, 12).cast("long") % 60) * 60
        ),
    )
    rules = {
        "has_spans": F.size("spans") > 0,
        "id_wellformed": F.col("doc_id").rlike(r"^(doc|hot)-[0-9]{12}$"),
        "offsets_nonneg": F.forall("spans", lambda s: s["offset"] >= 0),
    }
    counts = rule_counts_stream(
        stream, rules, window_duration="1 minute", watermark="2 minutes"
    )
    name = f"srwc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start"),
        F.col("window_end").cast("long").alias("window_end"),
        "rule",
        "n_rows",
        "n_violations",
    )


@query("dedup_incremental_minhash")
def dedup_incremental_minhash(spark, sf_dir) -> DataFrame:
    """Incremental (cross-snapshot) dedup: probe a NEW ingest batch (doc_id
    % 5 == 0) against the PERSISTED MinHash index of the existing corpus —
    the batch-sized-not-corpus-sized shape every continuously-ingesting
    training pipeline needs (dedup.minhash_probe_index; index built once
    and cached like the IVF index).  Probe ≡ batch LSH on the same split is
    asserted in tests/test_round3_ops.py; deterministic seeded hashes →
    pinned oracle."""
    from pathlib import Path

    from .operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"mh_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'documents')}_h32_b8_k3"
    )
    if not (idx / "meta.json").exists():
        dedup_ops.build_minhash_index(
            corpus, idx, num_hashes=32, bands=8, k=3
        )
    return dedup_ops.minhash_probe_index(spark, idx, new, min_jaccard=0.7)


_SPLIT_METRICS_SQL = """
    WITH t AS (SELECT filename AS split,
                      spans, list_transform(spans, s -> s.offset) AS offs
               FROM read_parquet('__SPANS_GLOB__', filename=true)),
         v AS (SELECT split,
                      CASE WHEN NOT (offs = list_sort(offs)
                                     AND len(list_distinct(offs)) = len(offs))
                           THEN 1 ELSE 0 END
                    + CASE WHEN len(list_filter(spans,
                               s -> s.kind = 'text' AND s.text IS NULL)) > 0
                           THEN 1 ELSE 0 END
                    + CASE WHEN len(list_filter(spans,
                               s -> s.kind <> 'text' AND s.media_ref IS NULL)) > 0
                           THEN 1 ELSE 0 END AS f
               FROM t),
         pv AS (SELECT split, count(*) AS n_rows,
                       CAST(sum(f) AS BIGINT) AS n_failed
                FROM v GROUP BY split),
         g AS (SELECT count(*) AS n,
                      CAST(sum(n_rows) AS BIGINT) AS s_r,
                      CAST(sum(n_rows * n_rows) AS BIGINT) AS s2_r,
                      CAST(sum(n_failed) AS BIGINT) AS s_f,
                      CAST(sum(n_failed * n_failed) AS BIGINT) AS s2_f
               FROM pv),
         z AS (SELECT split, n_rows, n_failed,
                      CASE WHEN n > 1 AND
                             (CAST(s2_r AS DOUBLE) - CAST(s_r AS DOUBLE)
                              * CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0) > 0
                           THEN round((CAST(n_rows AS DOUBLE)
                                  - CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE))
                               / sqrt((CAST(s2_r AS DOUBLE)
                                  - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / (CAST(n AS DOUBLE) - 1.0)), 6)
                           ELSE 0.0 END AS z_n_rows,
                      CASE WHEN n > 1 AND
                             (CAST(s2_f AS DOUBLE) - CAST(s_f AS DOUBLE)
                              * CAST(s_f AS DOUBLE) / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0) > 0
                           THEN round((CAST(n_failed AS DOUBLE)
                                  - CAST(s_f AS DOUBLE) / CAST(n AS DOUBLE))
                               / sqrt((CAST(s2_f AS DOUBLE)
                                  - CAST(s_f AS DOUBLE) * CAST(s_f AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / (CAST(n AS DOUBLE) - 1.0)), 6)
                           ELSE 0.0 END AS z_n_failed
               FROM pv, g)
    SELECT split, CAST(n_rows AS BIGINT) AS n_rows, n_failed,
           z_n_rows, z_n_failed,
           (abs(z_n_rows) > 3.0 OR abs(z_n_failed) > 3.0) AS anomalous
    FROM z
"""


@query("split_anomaly_verdicts", oracle=_SPLIT_METRICS_SQL)
def split_anomaly_verdicts(spark, sf_dir) -> DataFrame:
    """Outlier data files: z-score every split's (row count, failure count)
    against the corpus of splits — the "which of my 10^6 input files look
    broken" triage view over the verdict table.  Exact-integer-sum z
    arithmetic makes the verdict bit-stable across engines and partitionings
    (stats.split_anomalies)."""
    from .operators import stats as stats_ops

    df = load_spans(spark, _spans_corpus(spark))
    pv = validate.split_verdicts(df).select("split", "n_rows", "n_failed")
    return stats_ops.split_anomalies(
        pv, "split", ["n_rows", "n_failed"], z_threshold=3.0
    )


@query(
    "schema_compat_splits",
    oracle="""
    SELECT DISTINCT filename AS split,
           true AS backward_compatible, true AS forward_compatible,
           CAST(0 AS BIGINT) AS n_changes
    FROM read_parquet('__SPANS_GLOB__', filename=true)
    """,
)
def schema_compat_splits(spark, sf_dir) -> DataFrame:
    """Snapshot-compatibility verdicts: is each split's persisted draft
    schema SEMANTICALLY contained in the corpus-unified schema (and vice
    versa)?  Decided by the sound subschema procedure
    (schema_algebra.subschema_violations) — NOT by unify(a,b)==b, which is
    wrong on Draft-4 (see its docstring).  The decision runs DISTRIBUTED
    over the drafts table (mapInPandas, global schema broadcast as a
    closure constant) — at 10^6 splits this stays a narrow KB-per-row scan.
    Oracle: the spans corpus is structurally uniform, so every split draft
    equals the global schema — both directions hold with zero diffs; any
    engine regression (a draft or the decision procedure drifting) breaks
    the value hash."""
    import pandas as pd

    from .checkpoint import TableStateStore, checkpointed_validate
    from .schema_algebra import (
        canonical_json,
        parse_schema,
        schema_diff,
        schemas_to_schema,
        subschema_violations,
    )

    corpus = _spans_corpus(spark)
    data = str(corpus / "documents_spans")
    state = _stream_tmp("compat_") / "state"
    checkpointed_validate(spark, data, state)
    recs = TableStateStore(state).committed()
    drafts = sorted((s, rec["draft"]) for s, rec in recs.items())
    gj = canonical_json(
        schemas_to_schema([parse_schema(d) for _, d in drafts])
    )

    def check(batches):
        g = parse_schema(gj)
        for pdf in batches:
            subs = [parse_schema(d) for d in pdf["draft"]]
            yield pd.DataFrame(
                {
                    "split": pdf["split"],
                    "backward_compatible": [
                        not subschema_violations(s, g) for s in subs
                    ],
                    "forward_compatible": [
                        not subschema_violations(g, s) for s in subs
                    ],
                    "n_changes": [len(schema_diff(s, g)) for s in subs],
                }
            )

    ddf = spark.createDataFrame(drafts, "split string, draft string")
    return ddf.mapInPandas(
        check,
        "split string, backward_compatible boolean, "
        "forward_compatible boolean, n_changes long",
    )


# ===========================================================================
# Pinned constant oracles — deterministic, non-SQL-expressible operators
# (seeded-hash LSH dedup/ANN).  scripts/gen_constant_oracles.py regenerates
# oracle_constants.json from a double-run determinism-guarded snapshot at
# sf0.01; semantic correctness of the pinned values is established by the
# planted/recall tests in tests/test_operators.py.  Loading is pure JSON —
# no Spark at import time.
# ===========================================================================

def _constant_oracle_sql(spec: dict) -> str:
    cols = spec["columns"]
    names = ", ".join(f"c{i}" for i in range(len(cols)))

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in spec["rows"]
    )
    select = ", ".join(
        f"CAST(c{i} AS {dtype}) AS {name}" for i, (name, dtype) in enumerate(cols)
    )
    return f"SELECT {select} FROM (VALUES {values}) AS t({names})"


# ===========================================================================
# Round-4 additions: pinned-vocab subword tokenization (VERDICT item 5) —
# budgets in LLM tokens, each oracled EXACTLY by a recursive-CTE DuckDB
# reproduction of the greedy longest-prefix tokenizer.
# ===========================================================================

def _subword_wcounts_prefix() -> str:
    """Shared oracle prelude: per-document word list + per-distinct-word
    subword counts via the pinned-vocab recursive CTE."""
    from .operators.subword import subword_step_cte

    return f"""
    WITH RECURSIVE
    wlist AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    words(key, w) AS (SELECT DISTINCT 0 AS key, w FROM wlist),
    {subword_step_cte()}
    """


@query(
    "subword_token_count_documents",
    oracle=None,  # resolved below — needs the vocab inlined
)
def subword_token_count_documents(spark, sf_dir) -> DataFrame:
    """Per-document PINNED-VOCAB subword token counts (operators/subword.py
    — greedy longest-prefix WordPiece-style inference, Arrow-batched
    pandas_udf kernel with process-wide word memoization).  The oracle
    reproduces the tokenizer EXACTLY in SQL: a recursive CTE that greedily
    consumes the longest matching vocab piece (single-char fallback) over
    the same pinned vocabulary — so the driver checks exact LLM-token
    counts, not word counts."""
    from .operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", subword_count(F.col("text")).alias("n_subwords")
    )


ORACLES["subword_token_count_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(dc.ns, 0) AS BIGINT) AS n_subwords
    FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    """
    ).split()
)


@query(
    "pack_sequences_subword_documents",
    oracle=None,
)
def pack_sequences_subword_documents(spark, sf_dir) -> DataFrame:
    """pack_sequences with the budget in SUBWORD tokens (tokenizer=
    "subword", 320-token sequences, per-source shards) — training budgets
    that mean LLM tokens.  Same window arithmetic as the word-mode packer;
    the oracle recomputes every count through the recursive-CTE tokenizer."""
    from .operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.pack_sequences(
        docs, "doc_id", "source", budget=320, tokenizer="subword"
    )
    return out.select(
        F.col("id").alias("doc_id"), "shard", "n_tokens", "seq_id", "seq_offset"
    )


ORACLES["pack_sequences_subword_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    ), t AS (
      SELECT d.doc_id, d.source AS shard,
             CAST(coalesce(dc.ns, 0) + 1 AS BIGINT) AS n_tokens
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS s
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           shard || '#' || CAST(CAST(floor(s / 320) AS BIGINT) AS VARCHAR)
             AS seq_id,
           s % 320 AS seq_offset
    FROM c
    """
    ).split()
)


@query(
    "chunk_subword_documents",
    oracle=None,
)
def chunk_subword_documents(spark, sf_dir) -> DataFrame:
    """chunk_documents_subword: 64-SUBWORD-token chunks cut at word
    boundaries (a straddling word lands in the chunk its first subword
    falls in).  The Spark side is row-local array arithmetic over ONE
    kernel call per document (no explode-then-window, no shuffle); the
    oracle rebuilds chunk assignment from the recursive-CTE per-word
    counts with a window prefix-sum."""
    from .operators import pack

    docs = load_table(spark, sf_dir, "documents")
    out = pack.chunk_documents_subword(docs, "doc_id", "text", chunk_tokens=64)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_start", "n_chunk_tokens", "chunk_text"
    )


ORACLES["chunk_subword_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), e AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM toks
    ), wp AS (
      SELECT e.doc_id, e.pos, e.t[e.pos] AS w, c.n
      FROM e JOIN wcounts c ON e.t[e.pos] = c.w
    ), cum AS (
      SELECT doc_id, pos, w, n,
             CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY pos) - n
                  AS BIGINT) AS s
      FROM wp
    )
    SELECT doc_id,
           CAST(min(s) AS BIGINT) AS chunk_start,
           CAST(sum(n) AS BIGINT) AS n_chunk_tokens,
           string_agg(w, ' ' ORDER BY pos) AS chunk_text
    FROM cum GROUP BY doc_id, floor(s / 64)
    """
    ).split()
)


# ===========================================================================
# Round-4 continuation: metric-history anomalies, key/FD discovery,
# datatype consistency, Bloom-prefilter decontamination
# ===========================================================================

@query(
    "metric_anomalies_events",
    oracle="""
    WITH base AS (
      SELECT event_id % 5 AS run_id,
             CASE WHEN event_id % 10 = 9 THEN NULL ELSE value END AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'maximum', maxv FROM wide
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history
      FROM m WHERE run_id < 4 GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 4
    )
    SELECT cur.dataset, cur.instance, cur.metric, cur.value,
           hist_mean, hist_stddev, hist_last,
           CAST(coalesce(n_history, 0) AS BIGINT) AS n_history,
           CASE WHEN coalesce(n_history, 0) >= 2
                THEN abs(cur.value - hist_mean) > 3.0 * hist_stddev
           END AS is_anomaly
    FROM cur LEFT JOIN hist USING (dataset, instance, metric)
    """,
)
def metric_anomalies_events(spark, sf_dir) -> DataFrame:
    """Metric-history anomaly detection (operators/metrics_repo.py, the
    deequ MetricsRepository + AnomalyDetection pattern): events split into
    5 deterministic "runs" (event_id % 5), per-run size / completeness /
    mean / min / max computed in ONE grouped scan, run 4 judged against
    runs 0-3 with the online-normal strategy (|value − mean| > 3σ).  Run 4
    has a planted quality regression — half its values nulled
    (event_id % 10 == 9) — so the completeness anomaly actually FIRES
    (zero-variance history, any deviation flags) while well-behaved
    metrics pass.  All comparisons on round-6 values for cross-engine
    bit-stability."""
    from .operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 5).alias("run"),
        F.when(F.col("event_id") % 10 == 9, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["value"], dataset="events", run_col="run"
    )
    return metrics_repo.detect_metric_anomalies(
        m, current_run=4, strategy="online_normal", k=3.0, min_history=2
    )


@query(
    "candidate_keys_orders",
    oracle="""
    WITH w AS (
      SELECT count(*) AS n,
             count(DISTINCT o_orderkey) AS d1,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z1,
             count(DISTINCT o_custkey) AS d2,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z2,
             count(DISTINCT o_orderstatus) AS d3,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS z3
      FROM orders
    )
    SELECT 'o_orderkey' AS "column", n AS n_rows, d1 AS n_distinct,
           z1 AS n_nulls, (n > 0 AND d1 = n AND z1 = 0) AS is_key FROM w
    UNION ALL
    SELECT 'o_custkey', n, d2, z2, (n > 0 AND d2 = n AND z2 = 0) FROM w
    UNION ALL
    SELECT 'o_orderstatus', n, d3, z3, (n > 0 AND d3 = n AND z3 = 0) FROM w
    """,
)
def candidate_keys_orders(spark, sf_dir) -> DataFrame:
    """Key discovery (stats.candidate_keys): one multi-aggregate scan over
    orders profiles three candidates at once — o_orderkey is certified a
    key (fully populated, distinct == rows), o_custkey and o_orderstatus
    are rejected, so both verdict arms are value-checked."""
    orders = load_table(spark, sf_dir, "orders")
    return stats.candidate_keys(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )


@query(
    "fd_orders_nation",
    oracle="""
    WITH g1 AS (
      SELECT n_nationkey,
             count(DISTINCT n_regionkey)
               + max(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS nd
      FROM nation GROUP BY 1
    ), g2 AS (
      SELECT o_custkey,
             count(DISTINCT o_orderpriority)
               + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nd
      FROM orders GROUP BY 1
    )
    SELECT 'n_nationkey' AS determinant, 'n_regionkey' AS dependent,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           (sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM g1
    UNION ALL
    SELECT 'o_custkey', 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0)
    FROM g2
    """,
)
def fd_orders_nation(spark, sf_dir) -> DataFrame:
    """Functional-dependency checks (stats.functional_dependency): one
    grouped scan per FD.  n_nationkey → n_regionkey holds;
    o_custkey → o_orderpriority is violated (repeat customers order at
    different priorities), so the verdict row carries a real violating
    group count — both outcomes value-checked."""
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    fd1 = stats.functional_dependency(nation, ["n_nationkey"], "n_regionkey")
    fd2 = stats.functional_dependency(orders, ["o_custkey"], "o_orderpriority")
    return fd1.unionByName(fd2)


@query(
    "datatype_profile_events",
    oracle="""
    WITH src AS (
      SELECT CAST(event_id AS VARCHAR) AS int_s,
             CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR)
                  ELSE CAST(event_id AS VARCHAR) || '.5' END AS num_s,
             CASE WHEN event_id % 5 = 0 THEN CAST(event_id AS VARCHAR)
                  WHEN event_id % 5 = 1 THEN CAST(event_id AS VARCHAR) || '.25'
                  WHEN event_id % 5 = 2 THEN
                       (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'False' END)
                  WHEN event_id % 5 = 3 THEN event_type
             END AS mixed_s
      FROM events
    ), w AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN int_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u1,
             CAST(sum(CASE WHEN regexp_matches(int_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b1,
             CAST(sum(CASE WHEN regexp_matches(int_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i1,
             CAST(sum(CASE WHEN regexp_matches(int_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN num_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u2,
             CAST(sum(CASE WHEN regexp_matches(num_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b2,
             CAST(sum(CASE WHEN regexp_matches(num_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i2,
             CAST(sum(CASE WHEN regexp_matches(num_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(CASE WHEN mixed_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s,
                  '^(true|false|TRUE|FALSE|True|False)$') THEN 1 ELSE 0 END)
                  AS BIGINT) AS b3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s, '^[+-]?[0-9]+$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS i3,
             CAST(sum(CASE WHEN regexp_matches(mixed_s,
                  '^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f3
      FROM src
    )
    SELECT 'int_s' AS "column", n AS n_rows, u1 AS n_null, b1 AS n_boolean,
           i1 AS n_integral, f1 AS n_fractional,
           n - u1 - b1 - i1 - f1 AS n_other,
           CASE WHEN n - u1 = 0 THEN 'Unknown'
                WHEN b1 = n - u1 THEN 'Boolean'
                WHEN i1 = n - u1 THEN 'Integral'
                WHEN i1 + f1 = n - u1 THEN 'Fractional'
                ELSE 'String' END AS inferred_type
    FROM w
    UNION ALL
    SELECT 'num_s', n, u2, b2, i2, f2, n - u2 - b2 - i2 - f2,
           CASE WHEN n - u2 = 0 THEN 'Unknown'
                WHEN b2 = n - u2 THEN 'Boolean'
                WHEN i2 = n - u2 THEN 'Integral'
                WHEN i2 + f2 = n - u2 THEN 'Fractional'
                ELSE 'String' END
    FROM w
    UNION ALL
    SELECT 'mixed_s', n, u3, b3, i3, f3, n - u3 - b3 - i3 - f3,
           CASE WHEN n - u3 = 0 THEN 'Unknown'
                WHEN b3 = n - u3 THEN 'Boolean'
                WHEN i3 = n - u3 THEN 'Integral'
                WHEN i3 + f3 = n - u3 THEN 'Fractional'
                ELSE 'String' END
    FROM w
    """,
)
def datatype_profile_events(spark, sf_dir) -> DataFrame:
    """Datatype-consistency analyzer (stats.datatype_profile, deequ's
    dataType): three derived string columns exercise the inference
    lattice — int_s (clean digits → Integral), num_s (digits + decimals →
    Fractional), mixed_s (digits, decimals, booleans, words, NULLs →
    String).  All columns classified in ONE multi-aggregate scan with
    anchored Java∩RE2 regexes so the DuckDB oracle matches
    byte-for-byte."""
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    mixed = (
        F.when(eid % 5 == 0, eid.cast("string"))
        .when(eid % 5 == 1, F.concat(eid.cast("string"), F.lit(".25")))
        .when(
            eid % 5 == 2,
            F.when(eid % 2 == 0, F.lit("true")).otherwise(F.lit("False")),
        )
        .when(eid % 5 == 3, F.col("event_type"))
    )
    frame = events.select(
        eid.cast("string").alias("int_s"),
        F.when(eid % 2 == 0, eid.cast("string"))
        .otherwise(F.concat(eid.cast("string"), F.lit(".5")))
        .alias("num_s"),
        mixed.alias("mixed_s"),
    )
    return stats.datatype_profile(frame, ["int_s", "num_s", "mixed_s"])


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
    from .operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    clean = decontam.decontaminate_bloom(
        docs, ev, "text", "doc_id", n=5, fpp=0.01
    )
    return clean.select("doc_id", "source", "n_chars")


@query(
    "uniqueness_profile_documents",
    oracle="""
    WITH pairs AS (
      SELECT 'lang' AS "column", CAST(lang AS VARCHAR) AS value FROM documents
      UNION ALL SELECT 'source', CAST(source AS VARCHAR) FROM documents
      UNION ALL SELECT 'doc_id', CAST(doc_id AS VARCHAR) FROM documents
    ), c AS (
      SELECT "column", value, count(*) AS cnt FROM pairs GROUP BY 1, 2
    )
    SELECT "column",
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           count(*) AS n_distinct,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / sum(cnt), 6)
             AS uniqueness,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS unique_value_ratio
    FROM c GROUP BY 1
    """,
)
def uniqueness_profile_documents(spark, sf_dir) -> DataFrame:
    """Uniqueness + unique-value-ratio profile (stats.uniqueness_profile,
    deequ's Uniqueness/UniqueValueRatio): three columns spanning the range
    — doc_id (every value unique), lang (few hot values, ratio ~0), source
    (in between) — from ONE melt scan and ONE pair-grouped shuffle whose
    size is the sum of column cardinalities, not the row count."""
    docs = load_table(spark, sf_dir, "documents")
    return stats.uniqueness_profile(docs, ["lang", "source", "doc_id"])


@query(
    "stream_metric_anomalies",
    oracle="""
    WITH base AS (
      SELECT event_id % 3 AS run_id,
             CASE WHEN event_id % 6 = 2 THEN NULL ELSE value END AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events_stream' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events_stream', 'value', 'maximum', maxv FROM wide
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history
      FROM m WHERE run_id < 2 GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 2
    )
    SELECT cur.dataset, cur.instance, cur.metric, cur.value,
           hist_mean, hist_stddev, hist_last,
           CAST(coalesce(n_history, 0) AS BIGINT) AS n_history,
           CASE WHEN coalesce(n_history, 0) >= 2
                THEN abs(cur.value - hist_mean) > 3.0 * hist_stddev
           END AS is_anomaly
    FROM cur LEFT JOIN hist USING (dataset, instance, metric)
    """,
)
def stream_metric_anomalies(spark, sf_dir) -> DataFrame:
    """Continuous data-quality monitoring (streaming/monitor.py
    metrics_stream): three deterministic micro-batches of events
    (event_id % 3, drained one availableNow pass each so Spark's
    checkpoint assigns batch ids 0/1/2), each batch stamped into a
    MetricsRepository as its batch id and judged against earlier batches.
    Batch 2 carries a planted null-rate regression (event_id % 6 == 2 —
    half its rows), so the streamed completeness verdict FIRES while
    stable metrics pass; the oracle recomputes the whole batch history
    relationally."""
    from .streaming.monitor import metrics_stream

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 6 == 2, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    tmp = _stream_tmp("stream_metrics_")
    src = str(tmp / "src")
    for b in range(3):
        events.filter(F.col("event_id") % 3 == b).write.mode("append").parquet(
            src
        )
        q = metrics_stream(
            spark,
            src,
            str(tmp / "repo"),
            str(tmp / "ckpt"),
            dataset="events_stream",
            columns=["value"],
            anomalies_path=str(tmp / "anoms"),
            source_schema="event_id long, value double",
        )
        q.awaitTermination()
    return spark.read.parquet(str(tmp / "anoms")).filter("run_id = 2").select(
        "dataset",
        "instance",
        "metric",
        "value",
        "hist_mean",
        "hist_stddev",
        "hist_last",
        "n_history",
        "is_anomaly",
    )


@query(
    "stream_psi_drift_events",
    oracle="""
    WITH bb AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 3 = 0 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    runs AS (
      SELECT 0 AS run_id,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket
      FROM events
      WHERE event_id % 3 = 1 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      UNION ALL
      SELECT 1,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9)
      FROM events
      WHERE event_id % 3 = 2 AND value > 250.0 AND value <= 500.0
    ),
    cc AS (SELECT run_id, bucket, count(*) AS n FROM runs GROUP BY 1, 2),
    sp AS (
      SELECT r.run_id, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket
      FROM (SELECT DISTINCT run_id FROM runs) r
    ),
    j AS (
      SELECT sp.run_id, sp.bucket,
             CAST(coalesce(bb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN bb USING (bucket)
              LEFT JOIN cc ON sp.run_id = cc.run_id AND sp.bucket = cc.bucket
    ),
    t AS (
      SELECT run_id, CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j.run_id, j.bucket, j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING (run_id)
    """,
)
def stream_psi_drift_events(spark, sf_dir) -> DataFrame:
    """Continuous drift monitoring (streaming/monitor.psi_drift_stream):
    the baseline histogram is profiled ONCE from the event_id%3==0 slice
    and pinned as bucket→count literals; two deterministic micro-batches
    then stream through — batch 0 (event_id%3==1) carries the same
    distribution, batch 1 (event_id%3==2, values clamped to > 250) is a
    planted support collapse, so the streamed PSI verdict FIRES on batch
    1 while batch 0 stays quiet.  Replay-safe per-batch stamping (dynamic
    run_id partition overwrite); the oracle recomputes both batches'
    reports relationally."""
    from jsons_to_schema_spark.operators import stats as _stats
    from .streaming.monitor import psi_drift_stream

    events = load_table(spark, sf_dir, "events")
    baseline = {
        r["bucket"]: r["n_rows"]
        for r in _stats.column_histogram(
            events.filter(F.col("event_id") % 3 == 0), "value", 0.0, 500.0, 10
        ).collect()
    }
    tmp = _stream_tmp("stream_psi_")
    src = str(tmp / "src")
    batches = [
        events.filter(F.col("event_id") % 3 == 1),
        events.filter((F.col("event_id") % 3 == 2) & (F.col("value") > 250.0)),
    ]
    for b in batches:
        b.select("event_id", "value").write.mode("append").parquet(src)
        q = psi_drift_stream(
            spark,
            src,
            str(tmp / "out"),
            str(tmp / "ckpt"),
            "value",
            0.0,
            500.0,
            10,
            baseline,
            source_schema="event_id long, value double",
        )
        q.awaitTermination()
    return spark.read.parquet(str(tmp / "out")).select(
        "run_id", "bucket", "base_n", "cur_n", "psi_term"
    )


@query(
    "containment_lineitem_events",
    oracle="""
    WITH a1 AS (
      SELECT l_orderkey AS v, count(*) AS cnt FROM lineitem
      WHERE l_orderkey IS NOT NULL GROUP BY 1
    ), b1 AS (
      SELECT DISTINCT o_orderkey AS v FROM orders WHERE o_orderkey IS NOT NULL
    ), g1 AS (
      SELECT a1.cnt, CASE WHEN b1.v IS NOT NULL THEN 1 END AS hit
      FROM a1 LEFT JOIN b1 USING (v)
    ), a2 AS (
      SELECT user_id AS v, count(*) AS cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ), b2 AS (
      SELECT DISTINCT c_custkey AS v FROM customer WHERE c_custkey IS NOT NULL
    ), g2 AS (
      SELECT a2.cnt, CASE WHEN b2.v IS NOT NULL THEN 1 END AS hit
      FROM a2 LEFT JOIN b2 USING (v)
    )
    SELECT 'l_orderkey' AS from_col, 'o_orderkey' AS to_col,
           CAST(sum(cnt) AS BIGINT) AS rows_total,
           CAST(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0) AS BIGINT)
             AS rows_matched,
           round(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0)
                 / sum(cnt), 6) AS row_containment,
           count(*) AS distinct_total,
           CAST(coalesce(sum(hit), 0) AS BIGINT) AS distinct_matched,
           round(coalesce(sum(hit), 0) / count(*), 6) AS distinct_containment
    FROM g1
    UNION ALL
    SELECT 'user_id', 'c_custkey',
           CAST(sum(cnt) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0) AS BIGINT),
           round(coalesce(sum(CASE WHEN hit = 1 THEN cnt END), 0)
                 / sum(cnt), 6),
           count(*),
           CAST(coalesce(sum(hit), 0) AS BIGINT),
           round(coalesce(sum(hit), 0) / count(*), 6)
    FROM g2
    """,
)
def containment_lineitem_events(spark, sf_dir) -> DataFrame:
    """Graded referential integrity (stats.containment): lineitem's
    l_orderkey fully resolves against orders (fraction 1.0 — the clean
    FK), events.user_id only partially resolves against customer keys —
    a real fractional grade, so both the matched and unmatched arithmetic
    are value-checked.  The probe shuffles A's distinct values (map-side
    pre-count), never its rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    c1 = stats.containment(li, "l_orderkey", orders, "o_orderkey")
    c2 = stats.containment(events, "user_id", customer, "c_custkey")
    return c1.unionByName(c2)


@query(
    "drift_psi_events_value",
    oracle="""
    WITH sp AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bucket),
         cb AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket, count(*) AS n
           FROM events
           WHERE event_id % 2 = 0 AND value IS NOT NULL
             AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         ),
         cc AS (
           SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19)
                    AS bucket, count(*) AS n
           FROM events
           WHERE event_id % 2 = 1 AND value IS NOT NULL
             AND value >= 0.0 AND value <= 500.0
           GROUP BY 1
         ),
         h AS (
           SELECT sp.bucket,
                  CAST(coalesce(cb.n, 0) AS BIGINT) AS base_n,
                  CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
           FROM sp LEFT JOIN cb USING (bucket) LEFT JOIN cc USING (bucket)
         ),
         t AS (SELECT CAST(sum(base_n) AS BIGINT) AS bt,
                      CAST(sum(cur_n) AS BIGINT) AS ct FROM h)
    SELECT h.bucket,
           0.0 + h.bucket * 25.0 AS bucket_lo,
           0.0 + (h.bucket + 1) * 25.0 AS bucket_hi,
           h.base_n, h.cur_n,
           round(((cur_n + 0.5) / (ct + 10.0) - (base_n + 0.5) / (bt + 10.0))
                 * ln(((cur_n + 0.5) / (ct + 10.0))
                      / ((base_n + 0.5) / (bt + 10.0))), 6) AS psi_term
    FROM h, t
    """,
)
def drift_psi_events_value(spark, sf_dir) -> DataFrame:
    """Population Stability Index drift (drift.psi_report): the binned
    industry-standard drift number beside the quantile-vector comparison.
    Baseline/current slices derive deterministically from event_id parity;
    both sides bucket with the identical histogram expression, smoothed
    proportions (s=0.5) keep empty buckets finite, per-term round(6) makes
    the comparison summation-order-proof.  Each side is one bounded
    map-side-partial groupBy — never a data-sized shuffle."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    return drift.psi_report(base, cur, "value", 0.0, 500.0, 20)


@query(
    "fd_confidence_events",
    oracle="""
    WITH j AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), p AS (
      SELECT user_id, sum(n) AS rows_, max(n) AS kept FROM j GROUP BY 1
    )
    SELECT 'user_id' AS determinant, 'event_type' AS dependent,
           CAST(sum(rows_) AS BIGINT) AS n_rows,
           CAST(sum(kept) AS BIGINT) AS kept_rows,
           round(CAST(sum(kept) AS BIGINT) / CAST(sum(rows_) AS BIGINT), 6)
             AS confidence,
           sum(kept) = sum(rows_) AS holds
    FROM p
    """,
)
def fd_confidence_events(spark, sf_dir) -> DataFrame:
    """Approximate functional dependency (stats.fd_confidence, the TANE
    g3 measure): user_id -> event_type genuinely does NOT hold, so the
    graded confidence (plurality-repair survivor fraction) is a real
    fraction — both the kept-rows arithmetic and the holds=false arm are
    value-checked.  One grouped count on the joint key, then folds over
    the bounded group table."""
    events = load_table(spark, sf_dir, "events")
    return stats.fd_confidence(events, ["user_id"], "event_type")


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
    "mixture_sample_documents",
    oracle="""
    WITH c AS (
      SELECT source AS s, count(*) AS n FROM documents
      WHERE source IS NOT NULL GROUP BY 1
    ),
    d AS (SELECT sum(sqrt(n)) AS denom FROM c),
    t AS (
      SELECT s,
             CAST(floor(least(1.0, (150 * sqrt(n)) / denom / n)
                        * 1048576.0) AS BIGINT) * 4096 AS thr
      FROM c, d
    )
    SELECT doc_id, source FROM documents JOIN t ON documents.source = t.s
    WHERE CAST(concat('0x', substring(md5(concat_ws(chr(31), '42',
                 CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) < t.thr
    """,
)
def mixture_sample_documents(spark, sf_dir) -> DataFrame:
    """Temperature-weighted source rebalancing (sample.mixture_sample,
    alpha=0.5): the multilingual-T5 data-mixing rule — sample source s
    ∝ n_s^0.5, flattening the head so minority sources are over-
    represented relative to natural proportions.  Rates quantize to the
    dyadic 2^-20 grid and alpha=0.5 computes via sqrt (correctly rounded
    where pow need not be), so the oracle reproduces the exact membership
    decision from the same integer counts; denominator summation order is
    the one ulp-level cross-engine freedom (bounded by the handful of
    sources, grid-absorbed).  One bounded groupBy + one narrow filter —
    the corpus itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return sample.mixture_sample(
        docs, "doc_id", "source", alpha=0.5, target_total=150
    ).select("doc_id", "source")


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
    "decontam_semantic_embeddings",
    oracle="""
    WITH vd AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    ev AS (
      SELECT vec_id AS eid, v AS evec FROM vd WHERE vec_id % 25 = 0
      UNION ALL
      SELECT vec_id + 1000000, list_prepend(v[1] + 0.25, v[2:])
      FROM vd WHERE vec_id % 50 = 0
    ),
    h AS (
      SELECT vd.vec_id, ev.eid,
             round(list_cosine_similarity(vd.v, ev.evec), 6) AS cos
      FROM vd, ev
    ),
    f AS (SELECT * FROM h WHERE cos >= 0.95),
    r AS (
      SELECT vec_id, count(*) AS n_hits, max(cos) AS max_cos_sim
      FROM f GROUP BY 1
    ),
    b AS (
      SELECT vec_id, eid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, eid ASC) AS rk
      FROM f
    )
    SELECT r.vec_id, CAST(r.n_hits AS BIGINT) AS n_hits, r.max_cos_sim,
           b.eid AS nearest_eval_id
    FROM r JOIN b ON r.vec_id = b.vec_id AND b.rk = 1
    """,
)
def decontam_semantic_embeddings(spark, sf_dir) -> DataFrame:
    """Embedding-space decontamination (decontam.decontaminate_semantic):
    the leakage check n-gram overlap misses — paraphrased/reformatted
    eval copies.  The eval set plants both EXACT corpus copies (vec_id %
    25, cosine 1.0) and perturbed near-copies (vec_id % 50, first
    coordinate +0.25 → cosine ≈ 0.97), so hit counting, the max-cosine
    evidence, and the deterministic nearest-eval tie-break are all
    value-checked at threshold 0.95.  Eval broadcasts; the corpus never
    shuffles — only hits reach the per-item aggregate."""
    from jsons_to_schema_spark.operators.decontam import decontaminate_semantic

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("eid"), F.col("v").alias("evec")
    )
    perturbed = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("eid"),
        F.concat(
            F.array(F.element_at("v", 1) + F.lit(0.25)),
            F.slice("v", 2, F.size("v") - 1),
        ).alias("evec"),
    )
    eval_set = exact.unionByName(perturbed)
    return decontaminate_semantic(
        emb, eval_set, "vec_id", "v", "eid", "evec", threshold=0.95
    )


@query(
    "coverage_gaps_events",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS bucket,
             count(*) AS n
      FROM events
      WHERE ts IS NOT NULL
        AND CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) % 7 <> 3
      GROUP BY 1
    ),
    sp AS (
      SELECT CAST(unnest(range((SELECT min(bucket) FROM c),
                               (SELECT max(bucket) FROM c) + 1)) AS BIGINT)
               AS bucket
    )
    SELECT sp.bucket, sp.bucket * 3600 AS bucket_start_epoch_s
    FROM sp LEFT JOIN c USING (bucket)
    WHERE c.n IS NULL
    ORDER BY sp.bucket
    """,
)
def coverage_gaps_events(spark, sf_dir) -> DataFrame:
    """Calendar-completeness analyzer (stats.coverage_gaps): the events
    table covers 30 days with every hourly bucket populated, so gaps are
    PLANTED by dropping every 7th hour bucket (the identical bucket
    expression in both engines) — each reported gap row is value-checked,
    not vacuously absent.  One bounded groupBy; the spine generates from
    the count table's own min/max and anti-joins."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(
        stats._epoch_us_col(events, "ts") / F.lit(3600.0 * 1_000_000.0)
    ).cast("long")
    holed = events.filter(bucket % 7 != 3)
    return stats.coverage_gaps(holed, "ts", 3600)


@query(
    "drift_psi_grouped_events",
    oracle="""
    WITH cb AS (
      SELECT CAST(event_type AS VARCHAR) AS grp,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 0 AND event_type IS NOT NULL
        AND value IS NOT NULL AND value >= 0.0 AND value <= 500.0
      GROUP BY 1, 2
    ),
    cc AS (
      SELECT CAST(event_type AS VARCHAR) AS grp,
             least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 1 AND event_type IS NOT NULL
        AND value IS NOT NULL AND value >= 0.0 AND value <= 500.0
      GROUP BY 1, 2
    ),
    g AS (SELECT grp FROM cb UNION SELECT grp FROM cc),
    sp AS (
      SELECT g.grp, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket FROM g
    ),
    j AS (
      SELECT sp.grp, sp.bucket,
             CAST(coalesce(cb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(cc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN cb USING (grp, bucket) LEFT JOIN cc USING (grp, bucket)
    ),
    t AS (
      SELECT grp, CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j.grp AS "group", j.bucket,
           0.0 + j.bucket * 50.0 AS bucket_lo,
           0.0 + (j.bucket + 1) * 50.0 AS bucket_hi,
           j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING (grp)
    """,
)
def drift_psi_grouped_events(spark, sf_dir) -> DataFrame:
    """Sliced PSI drift (drift.psi_report_grouped): per-event-type drift
    between the event_id-parity slices — "which segment drifted", the
    check a stable global distribution can hide a segment collapse from.
    One (group, bucket) aggregate per side (shuffle bounded by groups ×
    buckets), group-windowed totals, smoothed terms round(6)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    return drift.psi_report_grouped(
        base, cur, "value", "event_type", 0.0, 500.0, 10
    )


@query(
    "drift_psi_multi_lineitem",
    oracle="""
    WITH mb AS (
      SELECT 'l_quantity' AS col,
             least(CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT), 9)
               AS bucket, count(*) AS n
      FROM lineitem
      WHERE l_orderkey % 2 = 0 AND l_quantity IS NOT NULL
        AND l_quantity >= 0.0 AND l_quantity <= 50.0
      GROUP BY 2
      UNION ALL
      SELECT 'l_discount',
             least(CAST(floor((l_discount - 0.0) / 0.01) AS BIGINT), 9),
             count(*)
      FROM lineitem
      WHERE l_orderkey % 2 = 0 AND l_discount IS NOT NULL
        AND l_discount >= 0.0 AND l_discount <= 0.1
      GROUP BY 2
    ),
    mc AS (
      SELECT 'l_quantity' AS col,
             least(CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT), 9)
               AS bucket, count(*) AS n
      FROM lineitem
      WHERE l_orderkey % 2 = 1 AND l_quantity IS NOT NULL
        AND l_quantity >= 0.0 AND l_quantity <= 50.0
      GROUP BY 2
      UNION ALL
      SELECT 'l_discount',
             least(CAST(floor((l_discount - 0.0) / 0.01) AS BIGINT), 9),
             count(*)
      FROM lineitem
      WHERE l_orderkey % 2 = 1 AND l_discount IS NOT NULL
        AND l_discount >= 0.0 AND l_discount <= 0.1
      GROUP BY 2
    ),
    sp AS (
      SELECT col, CAST(unnest(range(0, 10)) AS BIGINT) AS bucket,
             lo + CAST(unnest(range(0, 10)) AS BIGINT) * w AS bucket_lo,
             lo + (CAST(unnest(range(0, 10)) AS BIGINT) + 1) * w AS bucket_hi
      FROM (SELECT col, CAST(lo AS DOUBLE) AS lo, CAST(w AS DOUBLE) AS w
            FROM (VALUES ('l_quantity', 0.0, 5.0), ('l_discount', 0.0, 0.01))
                 v0(col, lo, w)) v
    ),
    j AS (
      SELECT sp.col AS "column", sp.bucket, sp.bucket_lo, sp.bucket_hi,
             CAST(coalesce(mb.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(mc.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN mb ON sp.col = mb.col AND sp.bucket = mb.bucket
              LEFT JOIN mc ON sp.col = mc.col AND sp.bucket = mc.bucket
    ),
    t AS (
      SELECT "column", CAST(sum(base_n) AS BIGINT) AS bt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM j GROUP BY 1
    )
    SELECT j."column", j.bucket, j.bucket_lo, j.bucket_hi, j.base_n, j.cur_n,
           round(((cur_n + 0.5) / (ct + 5.0) - (base_n + 0.5) / (bt + 5.0))
                 * ln(((cur_n + 0.5) / (ct + 5.0))
                      / ((base_n + 0.5) / (bt + 5.0))), 6) AS psi_term
    FROM j JOIN t USING ("column")
    """,
)
def drift_psi_multi_lineitem(spark, sf_dir) -> DataFrame:
    """Multi-column PSI (drift.psi_report_multi): l_quantity and
    l_discount drift between the orderkey-parity slices in TWO scans
    total (one melt per side), not two per column — the
    single-multi-aggregate-pass ethos applied to drift monitoring."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 2 == 0)
    cur = li.filter(F.col("l_orderkey") % 2 == 1)
    return drift.psi_report_multi(
        base, cur, {"l_quantity": (0.0, 50.0), "l_discount": (0.0, 0.1)}, 10
    )


@query(
    "benford_lineitem_extendedprice",
    oracle="""
    WITH sp AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit),
         c AS (
           SELECT CAST(substring(CAST(CAST(floor(abs(l_extendedprice))
                        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                  count(*) AS n
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL
             AND abs(l_extendedprice) < 1e18
             AND floor(abs(l_extendedprice)) >= 1
           GROUP BY 1
         ),
         j AS (
           SELECT sp.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
           FROM sp LEFT JOIN c USING (digit)
         ),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM j)
    SELECT j.digit, j.n_rows,
           round(j.n_rows / t.total, 6) AS share,
           round(log10(1.0 + 1.0 / j.digit), 6) AS benford_p,
           round(j.n_rows / t.total - log10(1.0 + 1.0 / j.digit), 6) AS delta
    FROM j, t ORDER BY j.digit
    """,
)
def benford_lineitem_extendedprice(spark, sf_dir) -> DataFrame:
    """Benford first-digit profile (stats.benford_profile): the
    fabricated-/corrupted-numbers screen.  Digits are read from the
    FLOORED integer's decimal string (integer→string is byte-identical
    across engines; log10 digit extraction is boundary-hazardous at
    powers of ten), one 9-group map-side-partial aggregate + broadcast
    spine.  TPC-H prices are NOT Benford-distributed, so the delta
    column carries real signal to value-check."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.benford_profile(li, "l_extendedprice")


@query("bpe_vocab_documents")  # pinned-snapshot oracle (oracle_constants.json)
def bpe_vocab_documents(spark, sf_dir) -> DataFrame:
    """Distributed BPE vocabulary learning (operators/bpe.py): the
    rank-ordered merge list trained on the documents corpus — the
    tokenizer artifact a real pipeline persists.  The distributed half is
    the Zipf-bounded word count (groupBy word + TakeOrderedAndProject
    top-K); merge learning folds the bounded table driver-side with exact
    integer counts and lexicographic tie-breaks, so the output is
    bit-deterministic at any partitioning (pinned oracle; semantic
    correctness is established by the hand-computed Sennrich-example and
    invariance tests in tests/test_bpe.py)."""
    from jsons_to_schema_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe_vocab(docs, "text", num_merges=40, max_words=10_000)
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, piece string"
    )


@query(
    "asof_events_snapshots",
    oracle="""
    WITH r AS (
      SELECT event_type, ts AS snap_ts, value AS snap_value,
             event_id AS snap_id
      FROM events WHERE event_id % 97 = 0
    )
    SELECT e.event_id, e.event_type, e.value,
           r.snap_value AS snap_value_asof,
           r.snap_id AS snap_id_asof,
           date_diff('microsecond', r.snap_ts, e.ts) AS snap_age_us,
           (date_diff('microsecond', r.snap_ts, e.ts) <= 86400000000)
             AS within_1d
    FROM events e ASOF LEFT JOIN r
      ON e.event_type = r.event_type AND e.ts >= r.snap_ts
    """,
)
def asof_events_snapshots(spark, sf_dir) -> DataFrame:
    """As-of join (temporal.asof_join): every event picks up the most
    recent reference snapshot at or before its timestamp per event_type —
    the point-in-time enrichment (rate tables, config versions, model
    snapshots) Spark has no native join for.  The engine's union+keyed-
    window shape is oracled against DuckDB's NATIVE ASOF LEFT JOIN, so
    the two independent as-of implementations must agree row-for-row,
    including the no-match NULLs and the >= boundary (an event that IS a
    snapshot matches itself).  The sparse snapshot table is
    parity-derived (event_id % 97); the age and the 24h-tolerance verdict
    are recomputed from the matched timestamp (NULL when unmatched)."""
    ev = load_table(spark, sf_dir, "events")
    right = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_type",
        F.col("ts").alias("snap_ts"),
        F.col("value").alias("snap_value"),
        F.col("event_id").alias("snap_id"),
    )
    joined = temporal.asof_join(
        ev, right, ["event_type"], "ts", "snap_ts", ["snap_value", "snap_id"]
    )
    age = F.expr("timestampdiff(MICROSECOND, snap_ts_asof, ts)")
    return joined.select(
        "event_id",
        "event_type",
        "value",
        "snap_value_asof",
        "snap_id_asof",
        age.alias("snap_age_us"),
        (age <= F.lit(86_400_000_000)).alias("within_1d"),
    )


@query(
    "session_overlap_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR
                       lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS sess
      FROM g
    ),
    iv AS (
      SELECT user_id, CAST(sess AS BIGINT) AS sess,
             epoch_us(min(ts)) AS s0, epoch_us(max(ts)) AS s1
      FROM s GROUP BY 1, 2
    )
    SELECT a.user_id AS user_a, a.sess AS sess_a,
           b.user_id AS user_b, b.sess AS sess_b,
           least(a.s1, b.s1) - greatest(a.s0, b.s0) AS overlap_us
    FROM iv a JOIN iv b
      ON (a.user_id, a.sess) < (b.user_id, b.sess)
     AND a.s0 <= b.s1 AND b.s0 <= a.s1
    """,
)
def session_overlap_events(spark, sf_dir) -> DataFrame:
    """Interval-overlap join (temporal.interval_overlap_join): which user
    sessions were concurrently active — the range join Spark lacks.  The
    engine's bucketed shape (explode to hour buckets, equi-join, accept
    each pair only in the bucket holding max(starts) so no dedup pass
    exists) is oracled against DuckDB's plain inequality self-join, so
    the bucketing must introduce no duplicates and lose no pairs.
    Sessions are the sessionize_events intervals (30-min gap) on the
    integer epoch-microsecond grid."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select("user_id", "ts", "event_id", us.alias("us"))
    gap = F.col("us") - F.lag("us").over(w)
    sess = (
        base.withColumn(
            "ns", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
        )
        .withColumn(
            "sess",
            F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess")
        .agg(F.min("us").alias("i_start"), F.max("us").alias("i_end"))
        # the interval frame feeds BOTH sides of the self-join — pin the
        # bounded (sessions-count-sized) table or the corpus-sized window+
        # aggregate lineage executes twice (r4 double-scan sweep rule;
        # dedup._materialize_once precedent).
        .localCheckpoint(eager=False)
    )
    ov = temporal.interval_overlap_join(
        sess,
        sess,
        ["user_id", "sess"],
        ["user_id", "sess"],
        ("i_start", "i_end"),
        3_600_000_000,
        antisymmetric=True,
    )
    return ov.select(
        F.col("l_user_id").alias("user_a"),
        F.col("l_sess").alias("sess_a"),
        F.col("r_user_id").alias("user_b"),
        F.col("r_sess").alias("sess_b"),
        F.col("overlap").alias("overlap_us"),
    )


@query(
    "cdc_compact_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, ts_us, event_id, event_type, value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_compact_events(spark, sf_dir) -> DataFrame:
    """Changelog compaction (cdc.compact_changelog): latest state per key
    from an event log with tombstone semantics — events is read as a CDC
    stream keyed by user_id, ordered by (ts, event_id), and a key whose
    LATEST entry is an 'error' is dropped entirely (planted tombstone
    op).  The engine's skew-safe max_by(payload, seq) single aggregate is
    oracled against the textbook row_number()-window formulation, so the
    O(1)-per-key shape must reproduce the sort-based answer exactly."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    log = ev.select(
        "user_id", us.alias("ts_us"), "event_id", "event_type", "value"
    )
    return cdc.compact_changelog(
        log,
        ["user_id"],
        ["ts_us", "event_id"],
        ["ts_us", "event_id", "event_type", "value"],
        op_col="event_type",
        delete_ops=("error",),
    )


@query(
    "drift_divergence_events_value",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 0 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    c AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             count(*) AS n
      FROM events
      WHERE event_id % 2 = 1 AND value IS NOT NULL
        AND value >= 0.0 AND value <= 500.0
      GROUP BY 1
    ),
    sp AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bucket),
    j AS (
      SELECT sp.bucket,
             CAST(coalesce(b.n, 0) AS BIGINT) AS base_n,
             CAST(coalesce(c.n, 0) AS BIGINT) AS cur_n
      FROM sp LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
    ),
    t AS (SELECT CAST(sum(base_n) AS BIGINT) AS bt,
                 CAST(sum(cur_n) AS BIGINT) AS ct FROM j),
    terms AS (
      SELECT j.bucket, j.base_n, j.cur_n, t.bt, t.ct,
             (j.base_n + 0.5) / (t.bt + 5.0) AS pb,
             (j.cur_n + 0.5) / (t.ct + 5.0) AS pc,
             CAST(sum(j.base_n) OVER (ORDER BY j.bucket) AS BIGINT) AS cb,
             CAST(sum(j.cur_n) OVER (ORDER BY j.bucket) AS BIGINT) AS cc
      FROM j, t
    ),
    per AS (
      SELECT round((pc - pb) * ln(pc / pb), 6) AS psi_term,
             round(0.5 * pb * ln(pb / ((pb + pc) / 2))
                   + 0.5 * pc * ln(pc / ((pb + pc) / 2)), 6) AS js_term,
             round(pow((cur_n + 0.5) - pb * (ct + 5.0), 2)
                   / (pb * (ct + 5.0)), 6) AS chi2_term,
             round(abs(cb / bt - cc / ct), 6) AS ks_term,
             round(abs(cb / bt - cc / ct) * 50.0, 6) AS emd_term
      FROM terms
    )
    SELECT round(sum(psi_term), 6) AS psi,
           round(sum(js_term), 6) AS js_divergence,
           round(sum(chi2_term), 6) AS chi2,
           max(ks_term) AS ks_stat,
           round(sum(emd_term), 6) AS wasserstein
    FROM per
    """,
)
def drift_divergence_events_value(spark, sf_dir) -> DataFrame:
    """Binned divergence panel (drift.divergence_report + score): PSI,
    Jensen-Shannon, chi-squared, binned KS, and Wasserstein-1 between the
    event_id-parity slices of events.value, all from the same two bounded
    histogram scans PSI alone costs — five drift metrics with different
    sensitivities for the price of one.  Every per-bucket term and every
    folded scalar is round(6) from exact long counts, recomputed
    relationally by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    rep = drift.divergence_report(base, cur, "value", 0.0, 500.0, 10)
    return drift.divergence_score(rep)


@query(
    "outliers_events_value",
    oracle="""
    WITH m AS (
      SELECT quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT (SELECT med FROM m) AS med,
             quantile_cont(abs(value - (SELECT med FROM m)), 0.5) AS mad
      FROM events WHERE value IS NOT NULL
    )
    SELECT e.event_id, e.value AS value,
           round(0.6745 * (e.value - s.med) / s.mad, 6) AS score
    FROM events e, s
    WHERE e.value IS NOT NULL AND s.mad > 0
      AND abs(0.6745 * (e.value - s.med) / s.mad) > 5.0
    """,
)
def outliers_events_value(spark, sf_dir) -> DataFrame:
    """Robust outlier rows (stats.outlier_report, MAD method): events
    whose value has a modified z-score beyond 5.0 — the row-level
    anomaly check beside the split-level split_anomalies.  Median and
    MAD are exact (percentile ≡ quantile_cont interpolation) so the
    fences are engine-identical; the cutoff compares the unrounded score
    in both engines and the reported score is round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.outlier_report(ev, "value", ["event_id"], method="mad", cutoff=5.0)


@query(
    "equidepth_histogram_events_value",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS bounds,
             min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT len(list_filter(b.bounds, x -> x < e.value)) AS bucket,
             count(*) AS n
      FROM events e, b WHERE e.value IS NOT NULL GROUP BY 1
    ),
    sp AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS bucket)
    SELECT sp.bucket,
           round(CASE WHEN sp.bucket = 0 THEN b.mn
                      ELSE b.bounds[CAST(sp.bucket AS INT)] END, 6) AS lo,
           round(CASE WHEN sp.bucket = 3 THEN b.mx
                      ELSE b.bounds[CAST(sp.bucket AS INT) + 1] END, 6) AS hi,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
    FROM sp CROSS JOIN b LEFT JOIN c USING (bucket)
    """,
)
def equidepth_histogram_events_value(spark, sf_dir) -> DataFrame:
    """Equi-depth histogram (stats.equidepth_histogram): quartile-binned
    profile of events.value — the skew-robust companion to the equi-width
    histogram_events_value.  Exact percentile boundaries (quantile_cont
    parity), strict-below bucket assignment so boundary ties fall low in
    both engines, counts exact, edges round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.equidepth_histogram(ev, "value", 4)


@query(
    "null_cooccurrence_events",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN event_id % 14 = 0 THEN NULL ELSE props END AS props_n,
             CASE WHEN event_id % 35 = 0 THEN NULL ELSE user_id END AS user_n,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n
      FROM events
    ),
    a AS (
      SELECT count(*) - count(props_n) AS np,
             count(*) - count(user_n) AS nu,
             count(*) - count(value_n) AS nv,
             CAST(sum(CASE WHEN props_n IS NULL AND user_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_pu,
             CAST(sum(CASE WHEN props_n IS NULL AND value_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_pv,
             CAST(sum(CASE WHEN user_n IS NULL AND value_n IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_uv
      FROM t
    )
    SELECT 'props_n' AS col_a, 'user_n' AS col_b, np AS n_a_null,
           nu AS n_b_null, b_pu AS n_both_null,
           CASE WHEN np + nu - b_pu > 0
                THEN round(b_pu / (np + nu - b_pu), 6) END AS jaccard
    FROM a
    UNION ALL
    SELECT 'props_n', 'value_n', np, nv, b_pv,
           CASE WHEN np + nv - b_pv > 0
                THEN round(b_pv / (np + nv - b_pv), 6) END
    FROM a
    UNION ALL
    SELECT 'user_n', 'value_n', nu, nv, b_uv,
           CASE WHEN nu + nv - b_uv > 0
                THEN round(b_uv / (nu + nv - b_uv), 6) END
    FROM a
    """,
)
def null_cooccurrence_events(spark, sf_dir) -> DataFrame:
    """Missingness structure (stats.null_cooccurrence): whether columns go
    null TOGETHER.  The testdata carries no nulls, so three null patterns
    are PLANTED with known overlap structure — value null on event_id %
    7, props on % 14 (a strict subset: jaccard = |%14|/|%7|), user_id on
    % 35 (subset of value's, overlapping props only at % 70) — and the
    one-scan pairwise co-occurrence aggregate must recover exactly those
    containment/overlap fractions."""
    ev = load_table(spark, sf_dir, "events")
    planted = ev.select(
        F.when(F.col("event_id") % 14 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("props_n"),
        F.when(F.col("event_id") % 35 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("user_n"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value_n"),
    )
    return stats.null_cooccurrence(planted, ["props_n", "user_n", "value_n"])


@query(
    "completeness_by_segment_events",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CASE WHEN event_type = 'click' AND event_id % 5 = 0
                  THEN NULL ELSE value END AS value_n,
             CASE WHEN event_id % 10 = 0 THEN NULL ELSE props END AS props_n
      FROM events
    ),
    g AS (
      SELECT CAST(event_type AS VARCHAR) AS group_value,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(value_n) AS BIGINT) AS nv,
             CAST(count(*) - count(props_n) AS BIGINT) AS np
      FROM t GROUP BY 1
    )
    SELECT group_value, 'value_n' AS "column", n_rows, nv AS n_null,
           round((n_rows - nv) / n_rows, 6) AS completeness
    FROM g
    UNION ALL
    SELECT group_value, 'props_n', n_rows, np,
           round((n_rows - np) / n_rows, 6)
    FROM g
    """,
)
def completeness_by_segment_events(spark, sf_dir) -> DataFrame:
    """Per-segment completeness matrix (stats.completeness_profile): null
    rates per (event_type, column) from ONE grouped multi-aggregate scan.
    The testdata carries no nulls, so a segment-correlated outage is
    PLANTED — value goes null on every fifth click event (a broken feed
    localized to ONE segment) beside a uniform %10 props outage — and the
    profile must attribute ~20% incompleteness to the click segment
    alone while every other segment reads 1.0 for value."""
    ev = load_table(spark, sf_dir, "events")
    planted = ev.select(
        "event_type",
        F.when(
            (F.col("event_type") == "click") & (F.col("event_id") % 5 == 0),
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("value_n"),
        F.when(F.col("event_id") % 10 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("props_n"),
    )
    return stats.completeness_profile(
        planted, ["value_n", "props_n"], "event_type"
    )


@query(
    "sequence_integrity_lineitem",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, count(*) AS n_rows,
             count(DISTINCT l_linenumber) AS n_distinct,
             min(l_linenumber) AS seq_min, max(l_linenumber) AS seq_max
      FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey, n_rows, n_distinct, seq_min, seq_max,
           (n_distinct < n_rows) AS has_dups,
           ((CAST(seq_max AS BIGINT) - CAST(seq_min AS BIGINT) + 1)
              <> n_distinct) AS has_gaps,
           (CAST(seq_min AS BIGINT) <> 1) AS bad_start
    FROM a
    WHERE (n_distinct < n_rows)
       OR ((CAST(seq_max AS BIGINT) - CAST(seq_min AS BIGINT) + 1)
             <> n_distinct)
       OR (CAST(seq_min AS BIGINT) <> 1)
    """,
)
def sequence_integrity_lineitem(spark, sf_dir) -> DataFrame:
    """Per-key sequence audit (validate.sequence_integrity): orders whose
    line numbers are not exactly 1..n — duplicates, gaps, or a shifted
    start.  The synthetic lineitem assigns non-contiguous line numbers,
    so the violation set is large and every verdict arm (gaps and
    bad-start both fire, dups occur) carries real signal for the
    value-hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return validate.sequence_integrity(li, ["l_orderkey"], "l_linenumber")


@query(
    "heavy_hitters_events_user",
    oracle="""
    WITH t AS (
      SELECT CAST(user_id AS VARCHAR) AS value
      FROM events WHERE user_id IS NOT NULL
    ),
    n AS (SELECT count(*) AS total FROM t)
    SELECT value, count(*) AS n_rows,
           round(count(*) / (SELECT total FROM n), 6) AS frac
    FROM t GROUP BY value
    HAVING count(*) * 1000 >= 7 * (SELECT total FROM n)
    """,
)
def heavy_hitters_events_user(spark, sf_dir) -> DataFrame:
    """Exact θ-frequent values via Misra-Gries candidates + exact verify
    (stats.heavy_hitters): users holding ≥ 0.7% of the event stream.
    user row counts scatter around the 0.7% line (Poisson at ~0.67%
    uniform), so the threshold genuinely splits the key set and the
    boundary arithmetic (n_rows·1000 ≥ 7·N in exact longs — a double
    0.007·N product differs between engines in the last ulp) carries
    real signal.  The oracle is the plain exact GROUP BY the sketch
    must reproduce verbatim."""
    ev = load_table(spark, sf_dir, "events")
    return stats.heavy_hitters(ev, "user_id", 0.007)


@query(
    "inclusion_profile_orders_customer",
    oracle="""
    WITH a AS (
      SELECT 'o_custkey' AS col_a, CAST(o_custkey AS VARCHAR) AS value
      FROM orders WHERE o_custkey IS NOT NULL
      UNION
      SELECT 'o_orderstatus', o_orderstatus
      FROM orders WHERE o_orderstatus IS NOT NULL
    ),
    b AS (
      SELECT 'c_custkey' AS col_b, CAST(c_custkey AS VARCHAR) AS value
      FROM customer WHERE c_custkey IS NOT NULL
      UNION
      SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
      FROM customer WHERE c_nationkey IS NOT NULL
    ),
    tot AS (SELECT col_a, count(*) AS n_distinct_a FROM a GROUP BY 1),
    hit AS (
      SELECT a.col_a, b.col_b, count(*) AS n_contained
      FROM a JOIN b USING (value) GROUP BY 1, 2
    ),
    spine AS (
      SELECT col_a, n_distinct_a, col_b FROM tot
      CROSS JOIN (SELECT 'c_custkey' AS col_b UNION ALL SELECT 'c_nationkey')
    )
    SELECT col_a, col_b, n_distinct_a,
           CAST(coalesce(n_contained, 0) AS BIGINT) AS n_contained,
           round(coalesce(n_contained, 0) / n_distinct_a, 6) AS containment,
           coalesce(n_contained, 0) = n_distinct_a AS full_inclusion
    FROM spine LEFT JOIN hit USING (col_a, col_b)
    """,
)
def inclusion_profile_orders_customer(spark, sf_dir) -> DataFrame:
    """Inclusion-dependency discovery (stats.inclusion_profile): sweep
    (o_custkey, o_orderstatus) × (c_custkey, c_nationkey).  The four
    verdicts span the whole signal range: o_custkey ⊆ c_custkey is the
    true FK (full_inclusion), o_custkey vs c_nationkey overlaps only on
    the small shared integer prefix (a graded fraction), and the status
    column matches nothing (0.0 — the spine row that must not vanish)."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return stats.inclusion_profile(
        od, ["o_custkey", "o_orderstatus"], cu, ["c_custkey", "c_nationkey"]
    )


@query(
    "monotonicity_events_value",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             lag(value) OVER (
               PARTITION BY user_id ORDER BY event_id ASC, value ASC
             ) AS pv
      FROM events
    )
    SELECT user_id, count(*) AS n_rows,
           CAST(sum(CASE WHEN pv IS NOT NULL AND value < pv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks,
           CAST(0 AS BIGINT) AS n_null_rows
    FROM s GROUP BY 1
    HAVING sum(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END) > 0
    """,
)
def monotonicity_events_value(spark, sf_dir) -> DataFrame:
    """Per-key monotonicity audit (validate.monotonicity_audit): users
    whose metric value ever DECREASES along the event_id order — ~all
    keys violate on this synthetic stream, so the break counts carry a
    dense value-hash.  The testdata has no NULLs, so the oracle's plain
    lag() is the full ignore-nulls semantics (the null arms are
    unit-tested with planted NULL rows in
    tests/test_discovery_audits.py)."""
    ev = load_table(spark, sf_dir, "events")
    return validate.monotonicity_audit(ev, ["user_id"], "event_id", "value")


@query(
    "category_shift_documents_source",
    oracle="""
    WITH base AS (
      SELECT source AS category, count(*) AS base_n
      FROM documents WHERE doc_id % 2 = 0 AND source IS NOT NULL
      GROUP BY 1
    ),
    cur AS (
      SELECT CASE WHEN source = 'src0' THEN 'srcNEW' ELSE source END
               AS category,
             count(*) AS cur_n
      FROM documents WHERE doc_id % 2 = 1 AND source IS NOT NULL
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(base.category, cur.category) AS category,
             coalesce(base_n, 0) AS base_n, coalesce(cur_n, 0) AS cur_n
      FROM base FULL OUTER JOIN cur USING (category)
    ),
    t AS (SELECT sum(base_n) AS bt, sum(cur_n) AS ct FROM j)
    SELECT category, base_n, cur_n,
           CASE WHEN bt > 0 THEN round(base_n / bt, 6) ELSE 0.0 END
             AS base_share,
           CASE WHEN ct > 0 THEN round(cur_n / ct, 6) ELSE 0.0 END
             AS cur_share,
           round((CASE WHEN ct > 0 THEN round(cur_n / ct, 6) ELSE 0.0 END)
               - (CASE WHEN bt > 0 THEN round(base_n / bt, 6) ELSE 0.0 END),
               6) AS share_delta,
           CASE WHEN base_n = 0 THEN 'new'
                WHEN cur_n = 0 THEN 'vanished'
                ELSE 'stable' END AS status
    FROM j CROSS JOIN t
    """,
)
def category_shift_documents_source(spark, sf_dir) -> DataFrame:
    """Categorical domain drift (drift.category_shift): even-doc_id docs
    are the baseline snapshot, odd-doc_id docs the current slice with
    'src0' REMAPPED to 'srcNEW' — planting exactly one 'new' and one
    'vanished' member the report must name, with every other source
    graded 'stable' and its share delta computed from exact longs."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "source",
        F.when(F.col("source") == "src0", F.lit("srcNEW")).otherwise(
            F.col("source")
        ),
    )
    return drift.category_shift(base, cur, "source")


@query(
    "mask_profile_events_props",
    oracle="""
    WITH m AS (
      SELECT regexp_replace(
               regexp_replace(props, '[A-Za-z]', 'A', 'g'),
               '[0-9]', '9', 'g') AS mask
      FROM events WHERE props IS NOT NULL
    ),
    c AS (SELECT mask, count(*) AS n_rows FROM m GROUP BY 1),
    t AS (SELECT sum(n_rows) AS total FROM c),
    r AS (
      SELECT mask, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, mask ASC) AS rk
      FROM c
    )
    SELECT mask, n_rows, round(n_rows / (SELECT total FROM t), 6) AS share,
           CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 5
    """,
)
def mask_profile_events_props(spark, sf_dir) -> DataFrame:
    """Pattern-mask profile (stats.mask_profile): the top-5 character-
    class masks of the raw JSON props strings — every '{"plan": "gold",
    "seats": 12}' collapses to one shared mask per shape, so the profile
    recovers the generator's few JSON layouts with exact counts.  ASCII
    classes only (Unicode letter classes differ between regex engines);
    ties break on mask ascending in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return stats.mask_profile(ev, "props", k=5)


@query(
    "k_anonymity_customer",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(5 AS INT) AS k,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
             AS rows_below_k,
           round(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) / sum(n), 6)
             AS risk_fraction,
           min(n) AS min_group_size,
           min(n) >= 5 AS k_anonymous
    FROM g
    """,
)
def k_anonymity_customer(spark, sf_dir) -> DataFrame:
    """k-anonymity risk (stats.k_anonymity): treating (c_nationkey,
    c_mktsegment) as the quasi-identifier, the 5-anonymity report — at
    sf0.01 the ~125 equivalence groups scatter around size 12, so both
    at-risk and safe groups exist and every output column carries
    signal."""
    cu = load_table(spark, sf_dir, "customer")
    return stats.k_anonymity(cu, ["c_nationkey", "c_mktsegment"], 5)


@query(
    "stream_new_category_alerts",
    oracle="""
    SELECT category, count(*) AS n_rows FROM (
      SELECT CASE WHEN event_id % 101 = 0 THEN 'beta_signup'
                  WHEN event_id % 103 = 1 THEN 'promo_click'
                  ELSE event_type END AS category
      FROM events
    )
    WHERE category NOT IN ('click', 'view', 'purchase', 'error', 'signup')
    GROUP BY 1
    """,
)
def stream_new_category_alerts(spark, sf_dir) -> DataFrame:
    """Streaming domain monitor (streaming/stateful.py::
    new_category_alerts_stream): two planted novel categories
    ('beta_signup' on event_id%101==0, 'promo_click' on %103==1 — CASE
    order matters and matches the oracle) trickle across TWO separate
    stream runs sharing one checkpoint (the second run resumes the first
    run's state store, proving cross-batch state survival); lifetime
    counts re-emit on growth, so max(n_rows) per category equals the
    batch GROUP BY over the novel slice."""
    from .streaming.stateful import new_category_alerts_stream

    baseline = {"click", "view", "purchase", "error", "signup"}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 101 == 0, F.lit("beta_signup"))
        .when(F.col("event_id") % 103 == 1, F.lit("promo_click"))
        .otherwise(F.col("event_type"))
        .alias("category"),
    )
    tmp = _stream_tmp("stream_newcat_")
    src = str(tmp / "src")
    for half in (0, 1):
        ev.filter(F.col("event_id") % 2 == half).write.mode("append").parquet(
            src
        )
        stream = spark.readStream.schema(
            "event_id long, category string"
        ).parquet(src)
        alerts = new_category_alerts_stream(stream, "category", baseline)
        q = (
            alerts.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp / "out"))
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(str(tmp / "out"))
        .groupBy("category")
        .agg(F.max("n_rows").alias("n_rows"))
    )


@query(
    "fuzzy_pairs_customer_names",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS text_a, b.c_name AS text_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_pairs_customer_names(spark, sf_dir) -> DataFrame:
    """Fuzzy record linkage (dedup.fuzzy_self_pairs): every customer-name
    pair within Levenshtein distance 1 — names differing in one digit.
    The oracle pays the all-pairs cross join (2.25M levenshtein calls at
    sf0.01, the thing the operator exists to avoid); the SymSpell
    deletion-variant blocking + exact verify must reproduce it verbatim
    (~19.5k pairs — a dense value-hash over ids, names, and distances)."""
    cu = load_table(spark, sf_dir, "customer")
    return dedup.fuzzy_self_pairs(cu, "c_custkey", "c_name", 1)


@query(
    "entity_clusters_customer_names",
    oracle="""
    WITH RECURSIVE cu AS (
      SELECT c_custkey,
             'e' || lpad(CAST(11 * (c_custkey % 300) AS VARCHAR), 4, '0')
                 || CASE CAST(floor(c_custkey / 300) AS BIGINT) % 5
                      WHEN 1 THEN 'x' WHEN 2 THEN 'xx'
                      WHEN 3 THEN 'y' WHEN 4 THEN 'z' ELSE '' END AS name
      FROM customer
    ), pr AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM cu a JOIN cu b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.name, b.name) <= 1
    ), e(src, dst) AS (
      SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr
    ), reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id
    ), lab AS (
      SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
    )
    SELECT c.c_custkey, c.name,
           coalesce(lab.cluster, c.c_custkey) AS cluster_id,
           coalesce(lab.cluster, c.c_custkey) = c.c_custkey AS keep
    FROM cu c LEFT JOIN lab ON lab.id = c.c_custkey
    """,
)
def entity_clusters_customer_names(spark, sf_dir) -> DataFrame:
    """Entity resolution end-to-end: the SymSpell-blocked fuzzy pair list
    composed with large-star/small-star connected components and the
    keep-one representative policy (dedup.assign_duplicate_clusters) —
    what a master-data pipeline consumes, since pairs alone resolve
    nothing.  Names are PLANTED with structure the raw customer names
    lack (those chain into one giant component): 300 entity bases that
    are pairwise Levenshtein ≥ 2 apart (multiples of 11 zero-padded —
    a single-digit edit changes the value by d·10^k ≢ 0 mod 11, so no
    one-substitution path between bases exists) each carrying five
    variant suffixes ('', x, xx, y, z) where 'xx' reaches '' only
    THROUGH 'x' — the components are genuinely multi-hop, so the CC
    rounds are exercised, not just echoed.  The oracle recomputes the
    closure from the all-pairs Levenshtein list with a recursive CTE and
    must match every row's cluster label AND representative flag."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    m = (F.floor(F.col("c_custkey") / 300).cast("long") % 5)
    suffix = (
        F.when(m == 1, F.lit("x"))
        .when(m == 2, F.lit("xx"))
        .when(m == 3, F.lit("y"))
        .when(m == 4, F.lit("z"))
        .otherwise(F.lit(""))
    )
    planted = cu.select(
        "c_custkey",
        F.concat(
            F.lit("e"),
            F.lpad((11 * (F.col("c_custkey") % 300)).cast("string"), 4, "0"),
            suffix,
        ).alias("name"),
    )
    pairs = dedup.fuzzy_self_pairs(planted, "c_custkey", "name", 1).select(
        "id_a", "id_b"
    )
    return dedup.assign_duplicate_clusters(planted, pairs, "c_custkey")


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
    "format_profile_documents",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN doc_id % 4 = 0
                  THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  WHEN doc_id % 4 = 1 THEN 'not-an-email'
                  WHEN doc_id % 4 = 2 THEN NULL
                  ELSE 'https://example.com/d/' || CAST(doc_id AS VARCHAR)
             END AS contact,
             CASE WHEN doc_id % 3 = 0 THEN '1234'
                  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 21, 12)
             END AS token_id
      FROM documents
    ), a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(contact) AS BIGINT) AS nn_c,
             CAST(count(token_id) AS BIGINT) AS nn_t,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_email,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^https?://[A-Za-z0-9._~:/?#@!$&''()*+,;=%-]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_url,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_uuid,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_email,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^https?://[A-Za-z0-9._~:/?#@!$&''()*+,;=%-]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_url,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_uuid
      FROM t
    )
    SELECT 'contact' AS "column", 'email' AS format, n AS n_rows,
           nn_c AS n_nonnull, c_email AS n_match,
           CASE WHEN nn_c > 0 THEN round(c_email / nn_c, 6) END AS match_rate
    FROM a
    UNION ALL SELECT 'contact', 'url', n, nn_c, c_url,
           CASE WHEN nn_c > 0 THEN round(c_url / nn_c, 6) END FROM a
    UNION ALL SELECT 'contact', 'uuid', n, nn_c, c_uuid,
           CASE WHEN nn_c > 0 THEN round(c_uuid / nn_c, 6) END FROM a
    UNION ALL SELECT 'token_id', 'email', n, nn_t, t_email,
           CASE WHEN nn_t > 0 THEN round(t_email / nn_t, 6) END FROM a
    UNION ALL SELECT 'token_id', 'url', n, nn_t, t_url,
           CASE WHEN nn_t > 0 THEN round(t_url / nn_t, 6) END FROM a
    UNION ALL SELECT 'token_id', 'uuid', n, nn_t, t_uuid,
           CASE WHEN nn_t > 0 THEN round(t_uuid / nn_t, 6) END FROM a
    """,
)
def format_profile_documents(spark, sf_dir) -> DataFrame:
    """String-format discovery grid (stats.format_profile): two planted
    columns — a mixed email/garbage/NULL/url feed and a mostly-UUID key
    with a corrupted %3 slice — profiled against the email/url/uuid
    patterns in ONE codegen scan.  The patterns are the Java ∩ RE2 ∩
    DuckDB dialect, so both engines grade every value identically and
    each of the six (column, format) cells value-checks exactly."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m = F.md5(did)
    planted = docs.select(
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("user"), did, F.lit("@example.com")),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("not-an-email"))
        .when(F.col("doc_id") % 4 == 2, F.lit(None))
        .otherwise(F.concat(F.lit("https://example.com/d/"), did))
        .alias("contact"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("1234"))
        .otherwise(
            F.concat_ws(
                "-",
                m.substr(1, 8),
                m.substr(9, 4),
                m.substr(13, 4),
                m.substr(17, 4),
                m.substr(21, 12),
            )
        )
        .alias("token_id"),
    )
    return stats.format_profile(
        planted, ["contact", "token_id"], formats=["email", "url", "uuid"]
    )


@query(
    "quantile_profile_events",
    oracle="""
    WITH g AS (
      SELECT CAST(event_type AS VARCHAR) AS group_value,
             round(quantile_cont(value, 0.1), 6) AS q0,
             round(quantile_cont(value, 0.5), 6) AS q1,
             round(quantile_cont(value, 0.9), 6) AS q2
      FROM events GROUP BY 1
    )
    SELECT group_value, CAST(0.1 AS DOUBLE) AS p, q0 AS q FROM g
    UNION ALL SELECT group_value, CAST(0.5 AS DOUBLE), q1 FROM g
    UNION ALL SELECT group_value, CAST(0.9 AS DOUBLE), q2 FROM g
    """,
)
def quantile_profile_events(spark, sf_dir) -> DataFrame:
    """Exact grouped quantiles (stats.quantile_profile): the p10/p50/p90
    of events.value per event_type from ONE grouped percentile aggregate
    — exact because a certification threshold on an approximate quantile
    flips with the sketch seed.  Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the linear-interpolation definition, so every
    (segment, p, q) row is value-checked at round(6)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.quantile_profile(
        ev, "value", probs=(0.1, 0.5, 0.9), group_col="event_type"
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
    "distinct_overlap_events_users",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 0),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1),
         u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
    SELECT true AS ok_a, true AS ok_b, true AS ok_union,
           CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
           CAST((SELECT count(*) FROM u) AS BIGINT) AS exact_union,
           CAST((SELECT count(*) FROM u) - (SELECT count(*) FROM b)
                AS BIGINT) AS exact_new_in_a,
           CAST((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
                - (SELECT count(*) FROM u) AS BIGINT) AS exact_common
    """,
)
def distinct_overlap_events_users(spark, sf_dir) -> DataFrame:
    """Sketch-grade snapshot overlap (stats.distinct_overlap): the user_id
    sets of the event_id-parity slices compared via three HLL sketches —
    new-keys / common-keys at KB sketch cost instead of an exact-distinct
    shuffle.  Raw sketch estimates are not partition-invariant, so the
    oracle-able output is the error CONTRACT (|est − exact| ≤ 5%·exact
    per primary estimate — the stats_distinct_hll pattern) beside exact
    counts computed as real SQL."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    est = stats.distinct_overlap(a, b, "user_id")
    ex = (
        a.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(
            b.select("user_id").distinct().agg(F.count(F.lit(1)).alias("exact_b"))
        )
        .crossJoin(
            a.select("user_id")
            .union(b.select("user_id"))
            .distinct()
            .agg(F.count(F.lit(1)).alias("exact_union"))
        )
    )
    j = est.crossJoin(ex)
    ok = lambda e, x: (  # noqa: E731
        F.abs(F.col(e) - F.col(x)) <= 0.05 * F.col(x)
    )
    return j.select(
        ok("n_a_est", "exact_a").alias("ok_a"),
        ok("n_b_est", "exact_b").alias("ok_b"),
        ok("n_union_est", "exact_union").alias("ok_union"),
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_union") - F.col("exact_b")).alias("exact_new_in_a"),
        (
            F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
        ).alias("exact_common"),
    )


@query(
    "fuzzy_join_incoming_customers",
    oracle="""
    WITH inc AS (
      SELECT c_custkey AS ik,
             substr(c_name, 1, len(c_name) - 1) || 'X' AS iname
      FROM customer WHERE c_custkey % 15 = 0
    )
    SELECT inc.ik AS id_a, c.c_custkey AS id_b,
           inc.iname AS text_a, c.c_name AS text_b,
           CAST(levenshtein(inc.iname, c.c_name) AS INT) AS dist
    FROM inc JOIN customer c
      ON levenshtein(inc.iname, c.c_name) <= 1
    """,
)
def fuzzy_join_incoming_customers(spark, sf_dir) -> DataFrame:
    """Cross-table record linkage (dedup.fuzzy_join): an incoming batch of
    100 typo'd customer names (last character replaced by 'X') matched
    against the full master table at Levenshtein ≤ 1 — each typo links
    back to its source AND to every same-prefix sibling, so the match set
    is dense and multi-valued.  The oracle pays the 150k-call all-pairs
    join the SymSpell blocking exists to avoid and must be reproduced
    verbatim."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    incoming = cu.filter(F.col("c_custkey") % 15 == 0).select(
        F.col("c_custkey").alias("ik"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("iname"),
    )
    return dedup.fuzzy_join(
        incoming, cu, "ik", "iname", "c_custkey", "c_name", max_dist=1
    )


@query(
    "categorical_association_events",
    oracle="""
    WITH src AS (
      SELECT event_type,
             CASE WHEN event_type IN ('click', 'view')
                  THEN 's' || CAST(event_id % 2 AS VARCHAR)
                  ELSE 't' || CAST(event_id % 3 AS VARCHAR) END AS seg,
             CAST(event_id % 2 AS VARCHAR) AS par
      FROM events
    ),
    m AS (
      SELECT 'event_type' AS col_a, 'seg' AS col_b,
             event_type AS va, seg AS vb FROM src
      UNION ALL
      SELECT 'event_type', 'par', event_type, par FROM src
    ),
    cells AS (
      SELECT col_a, col_b, va, vb, count(*) AS o FROM m GROUP BY 1, 2, 3, 4
    ),
    g AS (
      SELECT *,
             sum(o) OVER (PARTITION BY col_a, col_b, va) AS ra,
             sum(o) OVER (PARTITION BY col_a, col_b, vb) AS cb,
             sum(o) OVER (PARTITION BY col_a, col_b) AS n
      FROM cells
    ),
    t AS (
      SELECT col_a, col_b, n,
             round((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n)
                   - ra * cb / n, 6) AS term,
             va, vb
      FROM g
    ),
    agg AS (
      SELECT col_a, col_b,
             CAST(max(n) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT va)
                  + max(CASE WHEN va IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_levels,
             CAST(count(DISTINCT vb)
                  + max(CASE WHEN vb IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_levels,
             round(sum(term) + max(n), 6) AS chi2_raw
      FROM t GROUP BY 1, 2
    )
    SELECT col_a, col_b, n_rows, r_levels, c_levels,
           (r_levels - 1) * (c_levels - 1) AS dof,
           greatest(chi2_raw, 0.0) AS chi2,
           CASE WHEN (r_levels - 1) * (c_levels - 1) > 0 THEN
             round(sqrt(greatest(chi2_raw, 0.0)
                        / (n_rows * least(r_levels - 1, c_levels - 1))), 6)
           END AS cramers_v
    FROM agg
    """,
)
def categorical_association_events(spark, sf_dir) -> DataFrame:
    """Categorical association sweep (stats.categorical_association):
    chi-squared + Cramér's V for two planted pairs in ONE scan — a
    dependent pair (event_type vs a segment column whose prefix is
    derived FROM event_type, so V lands high) and a near-independent one
    (event_type vs event-id parity, V ≈ 0).  The oracle rebuilds the
    melt, the window margins, and the zero-cell-free χ² identity
    (Σ_all exp = n) relationally, so every level count, dof, χ² term sum,
    and the normalized V must agree to the shared round(6) grid."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat(F.lit("s"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string"))
        )
        .alias("seg"),
        (F.col("event_id") % 2).cast("string").alias("par"),
    )
    return stats.categorical_association(
        ev, [("event_type", "seg"), ("event_type", "par")]
    )


@query(
    "l_diversity_events",
    oracle="""
    WITH src AS (
      SELECT event_type, user_id % 25 AS bucket,
             CASE WHEN event_type = 'error' THEN 'E'
                  ELSE 'v' || CAST(event_id % 7 AS VARCHAR) END AS sensitive
      FROM events
    ),
    g AS (
      SELECT event_type, bucket, count(*) AS n,
             count(DISTINCT sensitive) AS d
      FROM src GROUP BY 1, 2
    )
    SELECT CAST(2 AS INT) AS l,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l,
           CAST(coalesce(sum(CASE WHEN d < 2 THEN n END), 0) AS BIGINT)
             AS rows_below_l,
           round(coalesce(sum(CASE WHEN d < 2 THEN n END), 0) / sum(n), 6)
             AS risk_fraction,
           min(d) AS min_diversity,
           min(d) >= 2 AS l_diverse
    FROM g
    """,
)
def l_diversity_events(spark, sf_dir) -> DataFrame:
    """l-diversity risk (stats.l_diversity) — the homogeneity-attack
    check k_anonymity cannot see: quasi-identifier (event_type, user
    bucket), sensitive column planted so every 'error' group is
    single-valued (diversity 1, flags at l=2) while other groups carry
    ~7 values (safe) — both verdict arms present and every column of the
    one-row report value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 25).alias("bucket"),
        F.when(F.col("event_type") == "error", F.lit("E"))
        .otherwise(
            F.concat(F.lit("v"), (F.col("event_id") % 7).cast("string"))
        )
        .alias("sensitive"),
    )
    return stats.l_diversity(ev, ["event_type", "bucket"], "sensitive", 2)


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
    from .operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    out = decontam.contamination_share(
        docs, ev, "text", "doc_id", n=5, threshold=0.5
    )
    return out.withColumnRenamed("id", "doc_id")


@query(
    "stream_attribution_join_events",
    oracle="""
    SELECT i.event_id AS imp_id, c.event_id AS conv_id, i.user_id,
           date_diff('microsecond', i.ts, c.ts) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'view') i
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
      ON i.user_id = c.user_id AND c.ts >= i.ts
     AND c.ts <= i.ts + INTERVAL 4 HOUR
    """,
)
def stream_attribution_join_events(spark, sf_dir) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py::
    attribution_join_stream): every purchase pairs with the same user's
    views from the preceding 4 hours, with watermarked join state on
    BOTH sides.  Drained with availableNow into a memory sink; since no
    row is late past its watermark in the drain, the streaming inner
    join's output must EQUAL the batch inequality join — which is
    exactly what the oracle computes.  Cross-micro-batch state survival
    is pinned separately (tests/test_streaming.py, maxFilesPerTrigger
    harness)."""
    import uuid

    from .streaming.joins import attribution_join_stream

    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    def _stream():
        # the file stream source requires a DIRECTORY path — glob-filter
        # the one events file out of the shared sf_dir
        return (
            spark.readStream.format("parquet")
            .schema(ddl)
            .option("pathGlobFilter", "events.parquet")
            .option("recursiveFileLookup", "false")
            .load(sf_dir)
        )

    imp = _stream().filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("imp_id"),
        "user_id",
        F.col("ts").alias("imp_ts"),
    )
    conv = _stream().filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    pairs = attribution_join_stream(
        imp, conv, "user_id", "imp_ts", "conv_ts", max_delay="4 hours"
    )
    tmp = _stream_tmp("stream_attr_")
    name = f"sattr_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("imp_id", "conv_id", "user_id", "delay_us")


@query(
    "rolling_stats_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(value) OVER w AS BIGINT) AS n_window,
           round(avg(value) OVER w, 6) AS mean_value,
           min(value) OVER w AS min_value,
           max(value) OVER w AS max_value,
           round(stddev_samp(value) OVER w, 6) AS stddev_value,
           round(value - avg(value) OVER w, 6) AS deviation
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 48 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def rolling_stats_events(spark, sf_dir) -> DataFrame:
    """Trailing-window profile (temporal.rolling_stats): every event's
    48-hour same-user trailing count/mean/min/max/stddev and its
    deviation from the trailing mean — exact integer-microsecond range
    frames, so Spark's rangeBetween over unix_micros and DuckDB's
    RANGE BETWEEN INTERVAL must agree on every frame boundary (ties
    included) across all 10k rows."""
    ev = load_table(spark, sf_dir, "events")
    out = temporal.rolling_stats(ev, ["user_id"], "ts", "value", 48 * 3600)
    return out.select(
        "event_id",
        "user_id",
        "n_window",
        "mean_value",
        "min_value",
        "max_value",
        "stddev_value",
        "deviation",
    )


@query(
    "mutual_information_pairs_events",
    oracle="""
    WITH src AS (
      SELECT event_type,
             CASE WHEN event_type IN ('click', 'view')
                  THEN 's' || CAST(event_id % 2 AS VARCHAR)
                  ELSE 't' || CAST(event_id % 3 AS VARCHAR) END AS seg,
             CAST(event_id % 2 AS VARCHAR) AS par
      FROM events
    )
    SELECT 'event_type' AS col_a, 'seg' AS col_b,
           round(entropy(event_type) + entropy(seg)
                 - entropy(row(event_type, seg)), 6) AS mi
    FROM src WHERE event_type IS NOT NULL AND seg IS NOT NULL
    UNION ALL
    SELECT 'event_type', 'par',
           round(entropy(event_type) + entropy(par)
                 - entropy(row(event_type, par)), 6)
    FROM src WHERE event_type IS NOT NULL AND par IS NOT NULL
    """,
)
def mutual_information_pairs_events(spark, sf_dir) -> DataFrame:
    """MI sweep (stats.mutual_information_pairs): the same planted
    dependent/independent pairs as categorical_association_events,
    graded in bits from ONE corpus scan — the dependent (event_type,
    seg) pair carries real information (seg's prefix is a function of
    event_type) while (event_type, parity) lands at ~0; DuckDB's native
    base-2 entropy() aggregate recomputes all three terms per pair."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat(F.lit("s"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string"))
        )
        .alias("seg"),
        (F.col("event_id") % 2).cast("string").alias("par"),
    )
    return stats.mutual_information_pairs(
        ev, [("event_type", "seg"), ("event_type", "par")]
    )


@query(
    "metric_anomalies_ewma_events",
    oracle="""
    WITH base AS (
      SELECT event_id % 8 AS run_id,
             value * (1.0 + 0.03 * (event_id % 8)) AS value
      FROM events
    ), wide AS (
      SELECT run_id, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls,
             avg(value) AS meanv, min(value) AS minv, max(value) AS maxv
      FROM base GROUP BY run_id
    ), m AS (
      SELECT run_id, 'events' AS dataset, '*' AS instance,
             'size' AS metric, CAST(n AS DOUBLE) AS value FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'completeness',
             1.0 - CAST(nulls AS DOUBLE) / n FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'mean', meanv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'minimum', minv FROM wide
      UNION ALL SELECT run_id, 'events', 'value', 'maximum', maxv FROM wide
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY dataset, instance, metric
                                ORDER BY run_id) AS rn,
             count(*) OVER (PARTITION BY dataset, instance, metric) AS t
      FROM m WHERE run_id < 7 AND value IS NOT NULL
    ), hist AS (
      SELECT dataset, instance, metric,
             round(avg(value), 6) AS hist_mean,
             round(coalesce(stddev_samp(value), 0.0), 6) AS hist_stddev,
             round(arg_max(value, run_id), 6) AS hist_last,
             count(value) AS n_history,
             round(sum(0.3 * pow(0.7, t - rn) * value)
                   + pow(0.7, count(value)) * avg(value), 6)
               AS hist_ewma,
             round(3.0 * round(coalesce(stddev_samp(value), 0.0), 6)
                   * sqrt(0.3 / 1.7
                          * (1 - pow(0.7, 2 * (count(value) + 1)))), 6)
               AS ewma_limit
      FROM ranked GROUP BY 1, 2, 3
    ), cur AS (
      SELECT dataset, instance, metric, round(value, 6) AS value
      FROM m WHERE run_id = 7
    )
    SELECT cur.dataset, cur.instance, cur.metric, cur.value,
           hist_mean, hist_stddev, hist_last, hist_ewma,
           round(0.3 * cur.value + 0.7 * hist_ewma, 6) AS ewma_z,
           ewma_limit,
           CAST(coalesce(n_history, 0) AS BIGINT) AS n_history,
           CASE WHEN coalesce(n_history, 0) >= 2
                THEN abs(round(0.3 * cur.value + 0.7 * hist_ewma, 6)
                         - hist_mean) > ewma_limit
           END AS is_anomaly
    FROM cur LEFT JOIN hist USING (dataset, instance, metric)
    """,
)
def metric_anomalies_ewma_events(spark, sf_dir) -> DataFrame:
    """EWMA control chart over run history (metrics_repo strategy
    'ewma'): events split into 8 runs with a planted 3%-per-run creep in
    value scale, run 7 judged against runs 0-6 — the statistic
    z = α·value + (1−α)·EWMA(history) accumulates the drift while the
    constant metrics (size, completeness) sit exactly on their centers;
    every column (history EWMA, z, the variance-inflated limit, both
    verdict arms) is recomputed relationally by the oracle on the shared
    round-6 grid."""
    from .operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 8).alias("run"),
        (F.col("value") * (1.0 + 0.03 * (F.col("event_id") % 8))).alias(
            "value"
        ),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["value"], dataset="events", run_col="run"
    )
    return metrics_repo.detect_metric_anomalies(
        m, current_run=7, strategy="ewma", k=3.0, alpha=0.3, min_history=2
    )


@query(
    "metric_anomalies_seasonal_events",
    oracle="""
    WITH m AS (
      SELECT CAST(event_id % 15 AS BIGINT) AS run_id,
             CASE WHEN event_id % 15 = 14 THEN 200.0
                  WHEN event_id % 15 % 7 = 0 THEN 100.0
                  ELSE 200.0 END AS sv,
             200.0 AS cv
      FROM events
    ), runs AS (
      SELECT run_id, round(avg(sv), 6) AS v_seasonal,
             round(avg(cv), 6) AS v_const
      FROM m GROUP BY 1
    ), hist AS (
      SELECT round(avg(v_seasonal), 6) AS mean_s,
             round(coalesce(stddev_samp(v_seasonal), 0.0), 6) AS sd_s,
             round(avg(v_const), 6) AS mean_c,
             round(coalesce(stddev_samp(v_const), 0.0), 6) AS sd_c,
             CAST(count(*) AS BIGINT) AS nh
      FROM runs WHERE run_id < 14 AND run_id % 7 = 14 % 7
    ), cur AS (SELECT v_seasonal, v_const FROM runs WHERE run_id = 14)
    SELECT 'events' AS dataset, 'v_seasonal' AS instance, 'mean' AS metric,
           cur.v_seasonal AS value, hist.mean_s AS hist_mean,
           hist.sd_s AS hist_stddev, hist.mean_s AS hist_last,
           hist.nh AS n_history,
           abs(cur.v_seasonal - hist.mean_s) > 3.0 * hist.sd_s AS is_anomaly
    FROM cur, hist
    UNION ALL
    SELECT 'events', 'v_const', 'mean', cur.v_const, hist.mean_c,
           hist.sd_c, hist.mean_c, hist.nh,
           abs(cur.v_const - hist.mean_c) > 3.0 * hist.sd_c
    FROM cur, hist
    """,
)
def metric_anomalies_seasonal_events(spark, sf_dir) -> DataFrame:
    """Seasonal anomaly strategy (metrics_repo.detect_metric_anomalies,
    strategy='seasonal_normal', season=7): a planted weekly pattern —
    history runs ≡ 0 mod 7 carry value 100, every other run 200 — and the
    CURRENT run 14 (phase 0, a "Sunday" slot) arrives with the WEEKDAY
    value 200.  Against the same-phase history {100, 100} the zero-stddev
    rule flags ANY deviation, so the seasonal strategy fires (is_anomaly
    true) while the constant companion metric stays quiet (false) — both
    verdict arms value-checked; the global-vs-seasonal discrimination is
    pinned separately in tests/test_metrics_bloom.py.  Size/completeness metrics are
    excluded (columns=) so both verdict rows are the planted means."""
    from .operators import metrics_repo

    events = load_table(spark, sf_dir, "events")
    runs = events.select(
        (F.col("event_id") % 15).alias("run"),
        F.when(F.col("event_id") % 15 == 14, F.lit(200.0))
        .when((F.col("event_id") % 15) % 7 == 0, F.lit(100.0))
        .otherwise(F.lit(200.0))
        .alias("v_seasonal"),
        F.lit(200.0).alias("v_const"),
    )
    m = metrics_repo.compute_metrics(
        runs, columns=["v_seasonal", "v_const"], dataset="events", run_col="run"
    ).filter(F.col("metric") == "mean")
    return metrics_repo.detect_metric_anomalies(
        m,
        current_run=14,
        strategy="seasonal_normal",
        season=7,
        k=3.0,
        min_history=2,
    )


@query(
    "multimodal_image_near_dup",
    oracle="""
    SELECT 'cpy-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'img-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(0, 25)) AS INT) AS i)
    """,
)
def multimodal_image_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual image dedup end to end (codecs.dhash64 →
    multimodal.image_dhash → dedup.hamming_near_dup_pairs): 75
    synthesized PNGs — 25 gradient families with distinct row/col slope
    pairs, each with a brightness-shifted near-copy and a mirrored
    distractor — run the full decode → signature → band-join →
    exact-verify pipeline.  The oracle is derived from the CONSTRUCTION:
    a uniform unsaturated brightness shift preserves every dHash block
    comparison (copy ⇒ Hamming 0), mirroring reverses the gradient
    (distractor ⇒ far), and the slope grid keeps families > 3 bits apart
    (verified property of these exact payloads; the hash itself is exact
    integer arithmetic, bit-deterministic at any partitioning) — so the
    output must be EXACTLY the 25 planted (cpy-i, img-i, 0) pairs."""
    import numpy as np

    from .operators.codecs import encode_png

    rows = []
    for i in range(25):
        a = (i % 5) * 11 + 3
        b = (i // 5) * 13 + 5
        base = (
            (np.add.outer(np.arange(24) * a, np.arange(27) * b) // (1 + i % 3))
            % 180
            + 30
        ).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        copy = (rgb.astype(np.int16) + 15).clip(0, 255).astype(np.uint8)
        rows.append((f"img-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb))))
        rows.append((f"cpy-{i:02d}", bytearray(encode_png(27, 24, pixels=copy))))
        rows.append(
            (f"inv-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb[:, ::-1])))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "multimodal_audio_near_dup",
    oracle="""
    SELECT 'dup-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'src-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(1, 21)) AS INT) AS i)
    """,
)
def multimodal_audio_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual audio dedup end to end (codecs.audio_fingerprint64 →
    multimodal.audio_fingerprint → dedup.hamming_near_dup_pairs): 40
    synthesized multi-tone WAVs — 20 families whose per-band amplitude
    ladder REALIZES bit pattern i in every time segment (verified
    construction: the fingerprint equals the pattern replicated 8×, so
    distinct families sit ≥ 8 bits apart), each with an exact
    power-of-two-gain duplicate (scaling by 2 commutes with float
    rounding ⇒ Hamming 0).  The oracle is therefore derived from the
    construction: exactly the 20 planted (dup-i, src-i, 0) pairs."""
    import numpy as np

    from .operators.codecs import encode_wav_pcm

    n = np.arange(2048, dtype=np.float64)
    rows = []
    for i in range(1, 21):
        amps = [300.0]
        for f in range(8):
            amps.append(amps[-1] * 1.5 if (i >> f) & 1 else amps[-1] / 1.5)
        x = np.zeros(2048)
        for f, a in enumerate(amps):
            k = 8 * (8 + 14 * f)
            x += a * np.sin(2 * np.pi * k * (n + 0.31) / 2048)
        s = np.floor(x + 0.5).astype(np.int16)
        rows.append((f"src-{i:02d}", bytearray(encode_wav_pcm(s))))
        rows.append(
            (f"dup-{i:02d}", bytearray(encode_wav_pcm((s * 2).astype(np.int16))))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.audio_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "multimodal_video_near_dup",
    oracle="""
    SELECT 'mux-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_a,
           'vid-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id_b,
           CAST(0 AS INT) AS hamming
    FROM (SELECT CAST(unnest(range(1, 21)) AS INT) AS i)
    """,
)
def multimodal_video_near_dup(spark, sf_dir) -> DataFrame:
    """Perceptual video dedup end to end (codecs.video_fingerprint64 →
    multimodal.video_fingerprint → dedup.hamming_near_dup_pairs): 40
    synthesized MP4s — 20 families whose coded-frame SIZE LADDER
    realizes bit pattern i across the 65 fingerprint blocks (families
    ≥ 8 bits apart by construction), each with a re-muxed copy (same
    sample table, different geometry metadata ⇒ identical size sequence
    ⇒ Hamming 0).  No pixel decode anywhere — the fingerprint reads the
    container sample table, which is exactly what survives the
    coded-frame (H.264) seam.  The oracle is the construction-derived
    planted (mux-i, vid-i, 0) list."""
    from .operators.codecs import encode_mp4

    def sizes_for_pattern(p, frames=130):
        vals, v = [], 4000
        for b in range(65):
            vals += [v, v]
            v = int(v * 1.2) if (p >> (b % 8)) & 1 else max(int(v / 1.2), 10)
        return vals[:frames]

    rows = []
    for i in range(1, 21):
        s = sizes_for_pattern(i)
        rows.append((f"vid-{i:02d}", bytearray(encode_mp4(64, 48, s))))
        rows.append((f"mux-{i:02d}", bytearray(encode_mp4(128, 96, s))))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    return multimodal.video_near_dup_pairs(df, "media_ref", "payload", 3)


@query(
    "stream_session_windows_events",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, min(us) AS session_start_us,
           max(us) + 1800000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_windows_events(spark, sf_dir) -> DataFrame:
    """Streaming sessionization via the NATIVE session_window aggregation
    (streaming/monitor.py::session_stream): per-user 30-min-gap sessions
    over the events stream, closed for a finite drain by a sentinel flush
    row 10 days past the data (second micro-batch advances the watermark
    past every real session end; the sentinel user is filtered back out).
    The emitted sessions must EQUAL the batch lag+cumsum sessionizer —
    which is exactly what the oracle computes, including the
    end = last event + gap convention."""
    import uuid

    from .streaming.monitor import session_stream

    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = load_table(spark, sf_dir, "events")
    tmp = _stream_tmp("stream_sess_")
    src = str(tmp / "src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    flush = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts")
    ).select(
        F.lit(-1).cast("long").alias("event_id"),
        "ts",
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("").alias("props"),
    )
    flush.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sessions = session_stream(stream, "user_id", "ts", gap="30 minutes")
    name = f"ssess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


@query(
    "multimodal_image_dup_clusters",
    oracle="""
    SELECT p || '-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
           'a-' || lpad(CAST(i AS VARCHAR), 2, '0') AS cluster
    FROM (SELECT CAST(unnest(range(0, 15)) AS INT) AS i),
         (SELECT unnest(['a', 'b', 'c']) AS p)
    """,
)
def multimodal_image_dup_clusters(spark, sf_dir) -> DataFrame:
    """Image duplicate CLUSTERS end to end: dHash pairs
    (multimodal.image_near_dup_pairs) feed the large-star/small-star
    connected components (dedup.duplicate_clusters) — 15 gradient
    families × three brightness-shifted copies (a/b/c at +0/+15/+30,
    all Hamming 0 → a triangle per family) plus a mirrored distractor
    per family that pairs with nothing and therefore appears in NO
    cluster row.  The oracle is construction-derived: every family
    collapses to cluster 'a-i' with exactly its three members — 45
    rows."""
    import numpy as np

    from .operators.codecs import encode_png

    rows = []
    for i in range(15):
        a = (i % 5) * 11 + 3
        b = (i // 5) * 13 + 5
        base = (
            (np.add.outer(np.arange(24) * a, np.arange(27) * b) // (1 + i % 3))
            % 180
            + 30
        ).astype(np.uint8)
        rgb = np.stack([base] * 3, -1)
        for tag, shift in (("a", 0), ("b", 15), ("c", 30)):
            px = (rgb.astype(np.int16) + shift).clip(0, 255).astype(np.uint8)
            rows.append(
                (f"{tag}-{i:02d}", bytearray(encode_png(27, 24, pixels=px)))
            )
        rows.append(
            (f"x-{i:02d}", bytearray(encode_png(27, 24, pixels=rgb[:, ::-1])))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    pairs = multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3)
    return dedup.duplicate_clusters(pairs)


@query(
    "outliers_grouped_events_value",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 499 = 0 THEN value * 50 + 5000
                  ELSE value END AS x
      FROM events
    ), med AS (
      SELECT event_type, quantile_cont(x, 0.5) AS center
      FROM src GROUP BY 1
    ), mad AS (
      SELECT s.event_type, max(m.center) AS center,
             quantile_cont(abs(s.x - m.center), 0.5) AS spread
      FROM src s JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT s.event_type, s.event_id, s.x AS value,
           round(0.6745 * (s.x - center) / spread, 6) AS score
    FROM src s JOIN mad USING (event_type)
    WHERE spread > 0 AND abs(0.6745 * (s.x - center) / spread) > 3.5
    """,
)
def outliers_grouped_events_value(spark, sf_dir) -> DataFrame:
    """Per-group robust outliers (stats.outlier_report_grouped): MAD
    fences computed INSIDE each event_type — spikes planted on
    event_id % 499 (50× + 5000) must flag against their own segment's
    scale; the oracle recomputes group medians and MADs with
    quantile_cont (the percentile ≡ quantile_cont interpolation parity
    the global outlier_report established) and the identical unrounded
    cutoff expression."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 499 == 0, F.col("value") * 50 + 5000
        )
        .otherwise(F.col("value"))
        .alias("x"),
    )
    return stats.outlier_report_grouped(
        ev, "x", ["event_id"], ["event_type"], method="mad", cutoff=3.5
    )


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
    "weighted_sample_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             round(ln((CAST('0x' || substr(md5('11' || chr(31)
                        || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       + 0.5) / 4294967296.0) / n_chars, 6) AS es_key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, n_chars, es_key FROM t
    ORDER BY es_key DESC, doc_id ASC LIMIT 75
    """,
)
def weighted_sample_documents(spark, sf_dir) -> DataFrame:
    """Weighted sampling without replacement (sample.weighted_sample,
    Efraimidis-Spirakis): 75 documents drawn ∝ n_chars — longer docs
    proportionally likelier, decided by the same md5-derived uniform
    both engines compute, with the round-6 log-key ordering and doc_id
    tie-break making the selected SET (not just its size) exact; the
    oracle replays the identical key arithmetic and top-k."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sample.weighted_sample(docs, "doc_id", "n_chars", 75, seed=11)


@query(
    "weighted_quota_sample_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             round(ln((CAST('0x' || substr(md5('13' || chr(31)
                        || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       + 0.5) / 4294967296.0) / n_chars, 6) AS es_key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY source
        ORDER BY es_key DESC, CAST(doc_id AS VARCHAR) ASC) AS rk
      FROM t
    )
    SELECT doc_id, source, n_chars, es_key FROM r WHERE rk <= 20
    """,
)
def weighted_quota_sample_documents(spark, sf_dir) -> DataFrame:
    """Per-stratum weighted draw (sample.weighted_quota_sample): the 20
    highest-ES-key documents per source, weighted by n_chars — the
    "top-N per domain, quality-weighted" mixture rule; the oracle
    replays the identical key arithmetic and per-stratum rank with the
    same tie-break."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return sample.weighted_quota_sample(
        docs, "doc_id", "source", "n_chars", 20, seed=13
    )


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
    "t_closeness_events",
    oracle="""
    WITH src AS (
      SELECT event_type, user_id % 25 AS bucket,
             CASE WHEN event_type = 'error' THEN 'E'
                  ELSE 'v' || CAST(event_id % 7 AS VARCHAR) END AS sensitive
      FROM events
    ),
    cells AS (
      SELECT event_type, bucket, sensitive, count(*) AS n
      FROM src GROUP BY 1, 2, 3
    ),
    terms AS (
      SELECT event_type, bucket, n,
             round(abs(CAST(n AS DOUBLE)
                       / sum(n) OVER (PARTITION BY event_type, bucket)
                     - CAST(sum(n) OVER (PARTITION BY sensitive) AS DOUBLE)
                       / sum(n) OVER ())
                   - CAST(sum(n) OVER (PARTITION BY sensitive) AS DOUBLE)
                     / sum(n) OVER (), 6) AS term
      FROM cells
    ),
    g AS (
      SELECT event_type, bucket, sum(n) AS gn,
             round((1.0 + sum(term)) / 2.0, 6) AS tv
      FROM terms GROUP BY 1, 2
    )
    SELECT CAST(0.5 AS DOUBLE) AS t,
           CAST(sum(gn) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN tv > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_above_t,
           CAST(coalesce(sum(CASE WHEN tv > 0.5 THEN gn END), 0) AS BIGINT)
             AS rows_above_t,
           round(coalesce(sum(CASE WHEN tv > 0.5 THEN gn END), 0)
                 / sum(gn), 6) AS risk_fraction,
           max(tv) AS max_tv,
           max(tv) <= 0.5 AS t_close
    FROM g
    """,
)
def t_closeness_events(spark, sf_dir) -> DataFrame:
    """t-closeness risk (stats.t_closeness) — the skewness-attack check
    the other two privacy analyzers cannot see: the quasi-identifier is
    (event_type, user bucket) and the sensitive plant makes every
    'error' group single-valued 'E' (its distribution sits ~1−e total
    variation from the corpus mixture → above t=0.5) while the other
    groups are near-uniform over 7 values (tv ≈ the corpus error share
    ≈ 0.2 → below t) — both verdict arms present, and the oracle replays
    the observed-cell fold identity tv = ½(1 + Σ(|p−q| − q)) with the
    same per-cell round(6), so every column of the one-row report is
    value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 25).alias("bucket"),
        F.when(F.col("event_type") == "error", F.lit("E"))
        .otherwise(
            F.concat(F.lit("v"), (F.col("event_id") % 7).cast("string"))
        )
        .alias("sensitive"),
    )
    return stats.t_closeness(ev, ["event_type", "bucket"], "sensitive", 0.5)


@query(
    "cdc_scd2_events",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id AS valid_from,
             (event_type = 'error') AS del,
             CAST(floor(value / 100.0) AS BIGINT) AS state
      FROM events
    ),
    chg AS (
      SELECT *,
        (lag(valid_from) OVER w IS NULL
         OR del IS DISTINCT FROM lag(del) OVER w
         OR state IS DISTINCT FROM lag(state) OVER w) AS is_chg
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
    ),
    bounds AS (
      SELECT user_id, del, state, valid_from,
             lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from) AS valid_to
      FROM chg WHERE is_chg
    )
    SELECT user_id, state, valid_from, valid_to,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY valid_from) AS INT) AS version,
           (valid_to IS NULL) AS is_current
    FROM bounds WHERE NOT del
    """,
)
def cdc_scd2_events(spark, sf_dir) -> DataFrame:
    """SCD Type-2 history build (cdc.scd2_from_changelog): events replayed
    as a per-user changelog ordered by event_id (globally unique →
    tie-free seq), payload = the value quintile (floor(value/100), 5
    states → real consecutive-identical collapses), 'error' rows as
    tombstones that CLOSE the open version.  Completes the CDC pair:
    cdc_compact_events keeps only the final state; this emits every
    surviving version with [valid_from, valid_to) and is_current.  The
    oracle replays the identical boundary-detection window formulation in
    DuckDB (IS DISTINCT FROM = Spark's eqNullSafe negation), so collapse,
    tombstone-close, and resurrect-after-delete semantics are all
    value-checked at sf0.01."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("value") / 100.0).cast("long").alias("state"),
    )
    return cdc.scd2_from_changelog(
        log,
        ["user_id"],
        "event_id",
        ["state"],
        op_col="event_type",
        delete_ops=("error",),
    )


@query(
    "pattern_profile_customer",
    oracle="""
    WITH src AS (
      SELECT c_name,
             c_mktsegment,
             CASE WHEN c_custkey % 3 = 0
                  THEN 'ID-' || CAST(c_custkey AS VARCHAR)
                  ELSE lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS ckey
      FROM customer
    ),
    cells AS (
      SELECT col AS "column", mask, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'c_name' AS col,
               regexp_replace(regexp_replace(regexp_replace(
                 c_name, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g') AS mask
        FROM src WHERE c_name IS NOT NULL
        UNION ALL
        SELECT 'c_mktsegment',
               regexp_replace(regexp_replace(regexp_replace(
                 c_mktsegment, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g')
        FROM src WHERE c_mktsegment IS NOT NULL
        UNION ALL
        SELECT 'ckey',
               regexp_replace(regexp_replace(regexp_replace(
                 ckey, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g')
        FROM src WHERE ckey IS NOT NULL
      ) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT "column", mask, n,
             round(CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY "column"), 6) AS share,
             CAST(row_number() OVER (PARTITION BY "column"
                    ORDER BY n DESC, mask ASC) AS INT) AS rank
      FROM cells
    )
    SELECT "column", rank, mask, n, share FROM ranked WHERE rank <= 5
    """,
)
def pattern_profile_customer(spark, sf_dir) -> DataFrame:
    """Shape-mask pattern profile (stats.pattern_profile): top-5 format
    masks per string column over customer, with a PLANTED mixed-format
    key — c_custkey rendered 'ID-<n>' for every third customer and
    zero-padded to 9 digits otherwise — so the profiler demonstrably
    surfaces the upstream-export format split ('AA-9…' family vs
    '999999999') that datatype_profile's type classifier cannot see.
    c_name collapses 1,500 values into ONE mask ('Aaaaaaaa#999999999'),
    evidencing that the shuffle is bounded by distinct-mask cardinality,
    not rows.  Oracle replays the identical ASCII-only mask chain in
    DuckDB RE2 (the Java∩RE2 dialect rule from the PII scrubber) with the
    same (n desc, mask asc) tie-break and round(6) share."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_name",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("ID-"), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
        .alias("ckey"),
    )
    return stats.pattern_profile(
        cust, ["c_name", "c_mktsegment", "ckey"], top_k=5
    )


@query(
    "frequent_pairs_events",
    oracle="""
    WITH memb AS (
      SELECT DISTINCT
             CAST(user_id AS VARCHAR) || '-'
               || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS b,
             event_type AS i
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL
    ),
    nb AS (SELECT count(DISTINCT b) AS n FROM memb),
    ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM memb GROUP BY 1),
    p AS (
      SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM memb l JOIN memb r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT p.item_a, p.item_b, p.n_ab, a.ni AS n_a, c.ni AS n_b,
           round(p.n_ab / nb.n, 6) AS support,
           round(p.n_ab / a.ni, 6) AS conf_a_b,
           round(p.n_ab / c.ni, 6) AS conf_b_a,
           round(p.n_ab * nb.n / (a.ni * c.ni), 6) AS lift
    FROM p JOIN ic a ON p.item_a = a.i JOIN ic c ON p.item_b = c.i, nb
    """,
)
def frequent_pairs_events(spark, sf_dir) -> DataFrame:
    """Market-basket association pairs (stats.frequent_pairs): baskets are
    user-DAYS (a user's whole history holds every type — support 1.0
    everywhere, a vacuous check; a user-day holds the 2-3 types actually
    fired together), items are event types — which types co-occur in the
    same day's activity far above chance (lift) is input-mix structure no
    per-column profile sees.  Support counting is over DISTINCT (basket,
    type) memberships, so hot users cost one membership per day; the
    oracle replays the identical basket construction (epoch_us //
    86400000000, all-positive) and self-join with the same integer counts
    and round(6) ratios (BIGINT/BIGINT is DOUBLE division in both
    engines), so support/confidence/lift are all value-checked with
    genuinely varied counts."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    day = ((us - F.pmod(us, F.lit(86400000000))) / F.lit(86400000000)).cast(
        "long"
    )
    basketed = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.concat_ws("-", F.col("user_id"), day).alias("basket"),
        "event_type",
    )
    return stats.frequent_pairs(basketed, "basket", "event_type", min_count=2)


@query(
    "cohort_retention_events",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS bucket
      FROM events WHERE ts IS NOT NULL
    ),
    wc AS (
      SELECT user_id, bucket,
             min(bucket) OVER (PARTITION BY user_id) AS cohort_d
      FROM act
    ),
    cells AS (
      SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
             CAST(date_diff('day', cohort_d, bucket) // 7 AS INT) AS "offset",
             CAST(count(*) AS BIGINT) AS n_active
      FROM wc GROUP BY 1, 2
    )
    SELECT cohort, "offset", n_active,
           max(CASE WHEN "offset" = 0 THEN n_active END)
             OVER (PARTITION BY cohort) AS cohort_size,
           round(n_active / max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort), 6) AS retention
    FROM cells
    """,
)
def cohort_retention_events(spark, sf_dir) -> DataFrame:
    """Weekly cohort retention (temporal.cohort_retention): users cohorted
    by the ISO-Monday week of their first event; each (cohort, offset)
    cell counts users of that cohort active `offset` weeks later.  Both
    engines truncate weeks to Monday (Spark date_trunc('week') ≡ DuckDB
    date_trunc('week')) and offsets divide day-diffs of aligned Mondays
    exactly by 7, so every cell, cohort size, and round(6) retention is
    value-checked — including the offset-0 retention=1.0 sanity rows."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.cohort_retention(ev, "user_id", "ts", unit="week")


@query(
    "resample_events_daily",
    oracle="""
    WITH src AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND (epoch_us(ts) // 86400000000) % 5 <> 2
    ),
    cells AS (
      SELECT user_id, us - (us % 86400000000) AS bucket_us,
             round(avg(value), 6) AS val
      FROM src GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(bucket_us) AS mn, max(bucket_us) AS mx
      FROM cells GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, 86400000000)) AS bucket_us
      FROM spans
    ),
    grid AS (
      SELECT s.user_id, s.bucket_us, c.val,
             (c.user_id IS NULL) AS filled
      FROM spine s LEFT JOIN cells c USING (user_id, bucket_us)
    )
    SELECT user_id, bucket_us,
           last_value(val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           filled
    FROM grid
    """,
)
def resample_events_daily(spark, sf_dir) -> DataFrame:
    """Fixed-grid resampling with forward fill (temporal.resample): each
    user's event values snapped to daily buckets (avg), emitted on a
    COMPLETE per-user grid with gaps forward-filled.  Gaps are PLANTED by
    dropping every 5th epoch day (identical integer bucket arithmetic in
    both engines — epoch_us // 86400000000, all-positive), so the spine
    generation, the `filled` flags, and the carried ffill values are all
    value-checked, not vacuously absent.  events.value is never NULL at
    this SF, so the oracle's last_value-IGNORE-NULLS replay is exactly
    the operator's observed-cells-win rule."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    day = ((us - F.pmod(us, F.lit(86400000000))) / F.lit(86400000000)).cast(
        "long"
    )
    holed = ev.filter(day % 5 != 2)
    return temporal.resample(
        holed, ["user_id"], "ts", "value", 86400, agg="avg", fill="ffill"
    )


@query(
    "survivorship_orders",
    oracle="""
    WITH src AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 7 <> 0 THEN o_orderpriority END AS pri,
             o_totalprice, o_orderstatus
      FROM orders
    ),
    base AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_members,
             arg_max(pri, CASE WHEN pri IS NOT NULL THEN o_orderkey END)
               AS o_orderpriority,
             max(o_totalprice) AS o_totalprice
      FROM src GROUP BY 1
    ),
    mc AS (
      SELECT o_custkey, o_orderstatus, count(*) AS n FROM src
      WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2
    ),
    win AS (
      SELECT o_custkey, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY n DESC, o_orderstatus ASC) AS rn
      FROM mc
    )
    SELECT b.o_custkey, b.n_members, b.o_orderpriority, b.o_totalprice,
           w.o_orderstatus
    FROM base b LEFT JOIN win w ON b.o_custkey = w.o_custkey AND w.rn = 1
    """,
)
def survivorship_orders(spark, sf_dir) -> DataFrame:
    """Golden-record survivorship (resolve.survivorship): each customer's
    orders fused to one master row — priority from the LATEST order
    (seq = o_orderkey, globally unique → tie-free), max total price, and
    the modal order status (ties broken by value ascending).  The
    completeness-beats-recency rule is PLANTED: priority is NULLed for
    every 7th order key, so customers whose freshest order is a %7 key
    demonstrably resolve to the latest NON-NULL priority (DuckDB arg_max
    ignores NULL ordering keys identically — probed).  One grouped
    aggregate plus one value-bounded mode join; every resolved column is
    value-checked."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        "o_totalprice",
        "o_orderstatus",
    )
    return resolve.survivorship(
        orders,
        "o_custkey",
        {
            "o_orderpriority": "latest",
            "o_totalprice": "max",
            "o_orderstatus": "mode",
        },
        seq_col="o_orderkey",
    )


@query(
    "funnel_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS k, epoch_us(ts) AS us, event_type AS s FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    s1 AS (SELECT k, min(us) AS t FROM ev WHERE s = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.k, min(e.us) AS t FROM ev e JOIN s1 ON e.k = s1.k
      WHERE e.s = 'click' AND e.us > s1.t AND e.us <= s1.t + 172800000000
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.k, min(e.us) AS t FROM ev e JOIN s2 ON e.k = s2.k
      WHERE e.s = 'purchase' AND e.us > s2.t AND e.us <= s2.t + 172800000000
      GROUP BY 1
    ),
    c AS (
      SELECT 1 AS step, 'view' AS step_name,
             CAST(count(*) AS BIGINT) AS n_keys FROM s1
      UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
    )
    SELECT step, step_name, n_keys,
      CASE WHEN first_value(n_keys) OVER (ORDER BY step) > 0
           THEN round(n_keys / first_value(n_keys) OVER (ORDER BY step), 6)
      END AS conv_from_first,
      CASE WHEN lag(n_keys) OVER (ORDER BY step) > 0
           THEN round(n_keys / lag(n_keys) OVER (ORDER BY step), 6)
      END AS conv_from_prev
    FROM c
    """,
)
def funnel_events(spark, sf_dir) -> DataFrame:
    """Ordered funnel conversion (temporal.funnel): view → click →
    purchase per user, each hop strictly after the previous step's first
    completion and within a 2-day conversion window — where the sequence
    leaks is the events analytic sessionization and retention can't
    answer.  The window binds (unwindowed, nearly every user completes —
    a vacuous funnel): counts drop hop over hop at sf0.01.  The oracle
    replays the identical min-time chained joins on integer epoch-µs, so
    every step count and round(6) conversion ratio is value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.funnel(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        within_seconds=2 * 86400,
    )


# Benford quantile thresholds: cumulative log10 digit boundaries, embedded
# as IDENTICAL shortest-round-trip double literals in the Spark plan and the
# DuckDB SQL so the planted CASE branches bit-agree in both engines.
_BENFORD_CUM = (
    0.3010299956639812,   # log10(2)
    0.47712125471966244,  # log10(3)
    0.6020599913279624,
    0.6989700043360189,
    0.7781512503836436,
    0.8450980400142568,
    0.9030899869919435,
    0.9542425094393249,   # log10(9)
)


@query(
    "benford_events",
    oracle="""
    WITH src AS (
      SELECT 'planted_benford' AS series,
             CASE
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.3010299956639812 AS DOUBLE) THEN 1
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.47712125471966244 AS DOUBLE) THEN 2
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.6020599913279624 AS DOUBLE) THEN 3
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.6989700043360189 AS DOUBLE) THEN 4
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.7781512503836436 AS DOUBLE) THEN 5
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.8450980400142568 AS DOUBLE) THEN 6
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.9030899869919435 AS DOUBLE) THEN 7
               WHEN CAST(event_id % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
                    < CAST(0.9542425094393249 AS DOUBLE) THEN 8
               ELSE 9
             END * pow(10, event_id % 3) AS v
      FROM events
      UNION ALL
      SELECT 'uniform', floor(value) + 1 FROM events WHERE value IS NOT NULL
    ),
    f AS (
      SELECT series, v FROM src
      WHERE v IS NOT NULL AND abs(v) >= 1 AND abs(v) < 9e18
    ),
    cnt AS (
      SELECT series,
             CAST(substr(CAST(CAST(floor(abs(v)) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2
    ),
    digits AS (
      SELECT series, CAST(unnest(range(1, 10)) AS INT) AS digit
      FROM (SELECT DISTINCT series FROM cnt)
    ),
    cells AS (
      SELECT d.series, d.digit, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n
      FROM digits d LEFT JOIN cnt USING (series, digit)
    ),
    calc AS (
      SELECT series, digit, n,
             CAST(sum(n) OVER (PARTITION BY series) AS DOUBLE) AS tot,
             log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit) AS ep
      FROM cells
    ),
    rep AS (
      SELECT series, digit, n,
             round(n / tot, 6) AS observed_p,
             round(ep, 6) AS expected_p,
             round(sum((n - tot * ep) * (n - tot * ep) / (tot * ep))
                   OVER (PARTITION BY series), 6) AS chi2
      FROM calc
    )
    SELECT series, digit, n, observed_p, expected_p, chi2,
           chi2 > CAST(15.507 AS DOUBLE) AS benford_violate
    FROM rep
    """,
)
def benford_events(spark, sf_dir) -> DataFrame:
    """Benford first-digit conformance (stats.benford_conformance) over two
    PLANTED series so both verdict arms demonstrably fire:
    'planted_benford' draws leading digits from the exact Benford
    quantile of event_id/10000 (uniform grid → per-digit counts within 1
    of expected → chi2 ≈ 0.02, conforming) scaled by a 1/10/100 decade
    mix, while 'uniform' takes floor(value)+1 (uniform 1..500 → digits
    1-4 overweighted → chi2 in the thousands, violating).  Digits come
    from exact BIGINT decimal rendering (never log10-of-double floors);
    the quantile thresholds are identical shortest-round-trip double
    literals in both engines, so every count, share, chi2, and verdict is
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("event_id") % 10000).cast("double") / F.lit(10000.0)
    d = F.lit(9)
    for digit in range(8, 0, -1):
        d = F.when(u < F.lit(_BENFORD_CUM[digit - 1]), digit).otherwise(d)
    benford_side = ev.select(
        F.lit("planted_benford").alias("series"),
        (d * F.pow(F.lit(10.0), (F.col("event_id") % 3).cast("double"))).alias(
            "v"
        ),
    )
    uniform_side = ev.filter(F.col("value").isNotNull()).select(
        F.lit("uniform").alias("series"),
        (F.floor("value") + 1).cast("double").alias("v"),
    )
    return stats.benford_conformance(
        benford_side.unionByName(uniform_side), "v", group_col="series"
    )


@query(
    "level_shift_events",
    oracle="""
    WITH cells AS (
      SELECT epoch_us(ts) - (epoch_us(ts) % 86400000000) AS bucket_us,
             round(avg(CASE WHEN epoch_us(ts) >= 1705795200000000
                            THEN value + CAST(150.0 AS DOUBLE)
                            ELSE value END), 6) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    scan AS (
      SELECT bucket_us,
             row_number() OVER (ORDER BY bucket_us) AS i,
             sum(m) OVER (ORDER BY bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(m) OVER () AS tot,
             count(*) OVER () AS n,
             stddev_samp(m) OVER () AS s,
             lead(bucket_us) OVER (ORDER BY bucket_us) AS nxt
      FROM cells
    ),
    st AS (
      SELECT bucket_us, nxt AS boundary_bucket_us,
             CAST(n AS BIGINT) AS n_buckets,
             round(cum / i, 6) AS mean_before,
             round((tot - cum) / (n - i), 6) AS mean_after,
             round((tot - cum) / (n - i) - cum / i, 6) AS shift,
             round(abs(cum / i - (tot - cum) / (n - i))
                   / (s * sqrt(CAST(1 AS DOUBLE) / i
                               + CAST(1 AS DOUBLE) / (n - i))), 6) AS stat
      FROM scan WHERE i >= 2 AND i <= n - 2
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY stat DESC, bucket_us ASC) AS rn
      FROM st
    )
    SELECT boundary_bucket_us, n_buckets, mean_before, mean_after, shift,
           stat, coalesce(stat > CAST(4.0 AS DOUBLE), false) AS shifted
    FROM rk WHERE rn = 1
    """,
)
def level_shift_events(spark, sf_dir) -> DataFrame:
    """Level-shift changepoint scan (drift.level_shift): daily means of
    events.value with a PLANTED +150 jump from epoch 1705795200
    (2024-01-21 UTC, integer epoch-µs comparison in both engines), so
    the scan demonstrably locates the boundary (stat ≈ 5+, shifted=true)
    instead of vacuously reporting quiet data.  The oracle replays the
    identical prefix-sum boundary scan over round(6) bucket means with
    the stat rounded BEFORE the argmax ranking (ties → earliest), so the
    located boundary, both segment means, and the verdict are all
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    planted = ev.filter(F.col("value").isNotNull()).select(
        "ts",
        F.when(
            us >= F.lit(1705795200000000), F.col("value") + F.lit(150.0)
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return drift.level_shift(planted, "ts", "v", 86400)


# Planted format columns over customer, expressed identically in Spark and
# DuckDB (exact integer/hex/lpad string construction — no float rendering):
# 90%-valid emails, synthetic uuids from zero-padded hex keys, ipv4s that
# ALSO syntactically satisfy hostname (the priority case), and calendar-safe
# dates.
_FMT_SRC_SQL = """
  SELECT
    CASE WHEN c_custkey % 10 = 0 THEN 'not-an-email'
         ELSE 'user' || CAST(c_custkey AS VARCHAR) || '@example.com'
    END AS cemail,
    lpad(hex(c_custkey), 8, '0') || '-' || lpad(hex(c_custkey), 4, '0')
      || '-' || lpad(hex(c_custkey), 4, '0') || '-'
      || lpad(hex(c_custkey), 4, '0') || '-'
      || lpad(hex(c_custkey), 12, '0') AS cuuid,
    '10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.'
      || CAST((c_custkey * 7) % 256 AS VARCHAR) AS cip,
    '2024-' || lpad(CAST((c_custkey % 12) + 1 AS VARCHAR), 2, '0') || '-'
      || lpad(CAST((c_custkey % 28) + 1 AS VARCHAR), 2, '0') AS cdate,
    c_custkey
  FROM customer
"""


def _fmt_planted_frame(spark, sf_dir) -> DataFrame:
    from .operators import formats as _fm  # noqa: F401 (module must import)

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    hx = F.hex(k)
    return cust.select(
        F.when(k % 10 == 0, F.lit("not-an-email"))
        .otherwise(F.concat(F.lit("user"), k.cast("string"), F.lit("@example.com")))
        .alias("cemail"),
        F.concat_ws(
            "-",
            F.lpad(hx, 8, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 12, "0"),
        ).alias("cuuid"),
        F.concat(
            F.lit("10.0."),
            (k % 256).cast("string"),
            F.lit("."),
            ((k * 7) % 256).cast("string"),
        ).alias("cip"),
        F.concat(
            F.lit("2024-"),
            F.lpad(((k % 12) + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(((k % 28) + 1).cast("string"), 2, "0"),
        ).alias("cdate"),
        "c_custkey",
    )


def _fmt_values_sql() -> str:
    from .operators.formats import FORMAT_PATTERNS

    return ", ".join(
        f"('{fmt}', {j}, '{pat}')"
        for j, (fmt, pat) in enumerate(FORMAT_PATTERNS.items())
    )


@query(
    "format_inference_customer",
    oracle=f"""
    WITH src AS ({_FMT_SRC_SQL}),
    fmts(format, priority, pat) AS (VALUES {_fmt_values_sql()}),
    cols AS (
      SELECT 'cemail' AS "column", cemail AS v FROM src
      UNION ALL SELECT 'cuuid', cuuid FROM src
      UNION ALL SELECT 'cip', cip FROM src
      UNION ALL SELECT 'cdate', cdate FROM src
    ),
    cnt AS (
      SELECT "column", format, priority,
             CAST(count(v) AS BIGINT) AS n_nonnull,
             CAST(count(CASE WHEN regexp_matches(v, pat) THEN 1 END)
                  AS BIGINT) AS n_match
      FROM cols CROSS JOIN fmts GROUP BY 1, 2, 3
    ),
    rep AS (
      SELECT "column", format, priority, n_nonnull, n_match,
             round(CAST(n_match AS DOUBLE) / n_nonnull, 6) AS match_rate,
             (n_nonnull >= 1
              AND round(CAST(n_match AS DOUBLE) / n_nonnull, 6)
                  >= CAST(1.0 AS DOUBLE)) AS qualifies
      FROM cnt
    )
    SELECT "column", format, priority, n_nonnull, n_match, match_rate,
           qualifies,
           (qualifies AND priority = min(CASE WHEN qualifies THEN priority
                                         END) OVER (PARTITION BY "column"))
             AS inferred
    FROM rep
    """,
)
def format_inference_customer(spark, sf_dir) -> DataFrame:
    """Draft-4 ``format`` inference (formats.infer_formats — ENGINE
    EXTENSION, the reference never generates format): one multi-aggregate
    corpus scan counts every column × format rlike match, then the
    one-row result unpivots to the report.  Plants cover all the report's
    arms: cuuid/cdate infer cleanly, cip satisfies BOTH ipv4 and hostname
    but only the higher-priority ipv4 is inferred (specific beats
    general), and cemail at 90% valid qualifies for nothing at
    threshold 1.0 (match_rate 0.9 value-checked).  The patterns are the
    SAME constant strings in both engines (Java∩RE2∩re dialect, injected
    from FORMAT_PATTERNS at registration), so every count, rate, and
    verdict is value-checked."""
    from .operators.formats import infer_formats

    return infer_formats(
        _fmt_planted_frame(spark, sf_dir),
        ["cemail", "cuuid", "cip", "cdate"],
    )


def _email_pat() -> str:
    from .operators.formats import FORMAT_PATTERNS

    return FORMAT_PATTERNS["email"]


@query(
    "format_violations_customer",
    oracle=f"""
    WITH src AS ({_FMT_SRC_SQL})
    SELECT c_custkey, 'cemail' AS "column", 'email' AS format,
           cemail AS value
    FROM src
    WHERE cemail IS NOT NULL
      AND NOT regexp_matches(cemail, '{_email_pat()}')
    """,
)
def format_violations_customer(spark, sf_dir) -> DataFrame:
    """Format violation rows (formats.format_violations): the 10% planted
    invalid emails surface as (key, column, format, value) rows — the
    row-level complement of the profile's aggregate verdict, same pattern
    constant on both sides, 150 rows value-checked at sf0.01.  NULLs are
    absent, not invalid (Draft-4 format applies to present instances
    only)."""
    from .operators.formats import format_violations

    return format_violations(
        _fmt_planted_frame(spark, sf_dir),
        "cemail",
        "email",
        keep=["c_custkey"],
    )


@query(
    "fingerprint_clusters_customer",
    oracle="""
    WITH src AS (
      SELECT CASE c_custkey % 3
               WHEN 0 THEN 'Customer#' || CAST(c_custkey // 3 AS VARCHAR)
               WHEN 1 THEN ' CUSTOMER ' || CAST(c_custkey // 3 AS VARCHAR)
                           || ' '
               ELSE 'customer--' || CAST(c_custkey // 3 AS VARCHAR)
             END AS v
      FROM customer
      UNION ALL
      SELECT 'solo-' || CAST(c_custkey AS VARCHAR) FROM customer
      WHERE c_custkey < 90
    ),
    pv AS (
      SELECT coalesce(array_to_string(list_sort(list_distinct(list_filter(
               string_split(regexp_replace(lower(trim(v)), '[^a-z0-9]+',
                                           ' ', 'g'), ' '),
               x -> x <> ''))), ' '), '') AS fingerprint,
             v, count(*) AS n
      FROM src WHERE v IS NOT NULL GROUP BY 1, 2
    )
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(n) AS BIGINT) AS n_rows,
           array_to_string(list_sort(list(v)), '|') AS members
    FROM pv GROUP BY 1 HAVING count(*) >= 2
    """,
)
def fingerprint_clusters_customer(spark, sf_dir) -> DataFrame:
    """Key-collision value clustering (resolve.fingerprint_clusters — the
    OpenRefine fingerprint method): three planted spellings per canonical
    value ('Customer#g', '  CUSTOMER g ', 'customer--g') fuse into 500
    three-member clusters, while 90 planted singletons ('solo-k') are
    demonstrably ABSENT at min_values=2 (a one-spelling key needs no
    cleaning).  Work is bounded by distinct raw values, never rows; the
    oracle replays the identical normalize→split→distinct→sort→rejoin
    pipeline in DuckDB (regexp_replace 'g' flag = Spark's global default;
    empty-list array_to_string coalesced to '' — the known DuckDB NULL
    gap), so every cluster key, member list, and count is value-checked."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    g = F.expr("CAST(c_custkey DIV 3 AS BIGINT)").cast("string")
    v = (
        F.when(k % 3 == 0, F.concat(F.lit("Customer#"), g))
        # single-space literal: the oracle registrar collapses whitespace
        # runs, so a two-space plant would diverge between engines
        .when(k % 3 == 1, F.concat(F.lit(" CUSTOMER "), g, F.lit(" ")))
        .otherwise(F.concat(F.lit("customer--"), g))
    )
    solo = cust.filter(k < 90).select(
        F.concat(F.lit("solo-"), k.cast("string")).alias("v")
    )
    src = cust.select(v.alias("v")).unionByName(solo)
    return resolve.fingerprint_clusters(src, "v", min_values=2)


@query(
    "arithmetic_consistency_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_quantity, l_extendedprice, l_discount,
             CAST(1.0 AS DOUBLE) + l_tax AS taxf
      FROM lineitem
    ),
    d AS (
      SELECT *,
        l_extendedprice * taxf
          + CASE WHEN l_orderkey % 97 = 0 THEN CAST(5.0 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END AS gross,
        l_quantity + l_discount AS total,
        l_extendedprice / l_quantity AS unit
      FROM src
    ),
    r AS (
      SELECT 'gross=l_extendedprice*taxf' AS rule,
             CAST(count(CASE WHEN gross IS NOT NULL
                              AND l_extendedprice IS NOT NULL
                              AND taxf IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_checked,
             CAST(count(CASE WHEN abs(gross - l_extendedprice * taxf)
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_extendedprice * taxf))
                         THEN 1 END) AS BIGINT) AS n_violations
      FROM d
      UNION ALL
      SELECT 'total=l_quantity+l_discount',
             CAST(count(CASE WHEN total IS NOT NULL
                              AND l_quantity IS NOT NULL
                              AND l_discount IS NOT NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(CASE WHEN abs(total - (l_quantity + l_discount))
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_quantity + l_discount))
                         THEN 1 END) AS BIGINT)
      FROM d
      UNION ALL
      SELECT 'unit=l_extendedprice/l_quantity',
             CAST(count(CASE WHEN unit IS NOT NULL
                              AND l_extendedprice IS NOT NULL
                              AND l_quantity IS NOT NULL
                              AND l_quantity <> 0 THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN l_quantity <> 0
                              AND abs(unit - l_extendedprice / l_quantity)
                              > 1e-6 * greatest(CAST(1.0 AS DOUBLE),
                                                abs(l_extendedprice
                                                    / l_quantity))
                         THEN 1 END) AS BIGINT)
      FROM d
    )
    SELECT rule, n_checked, n_violations,
           round(CAST(n_violations AS DOUBLE) / n_checked, 6)
             AS violation_rate,
           n_violations = 0 AS holds
    FROM r
    """,
)
def arithmetic_consistency_lineitem(spark, sf_dir) -> DataFrame:
    """Cross-field arithmetic invariants (stats.arithmetic_consistency):
    three rules over lineitem with both verdict arms planted — gross =
    extendedprice × (1+tax) is broken by +5.0 on every 97th order key
    (violates, rate value-checked), total = quantity + discount and
    unit = extendedprice / quantity hold exactly (same double ops in the
    same order in both engines, so the |observed − expected| comparisons
    are bit-stable; planted offsets sit 6 orders of magnitude above the
    tolerance boundary).  ONE corpus scan computes all six counts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        (F.lit(1.0) + F.col("l_tax")).alias("taxf"),
    )
    li = li.select(
        "*",
        (
            F.col("l_extendedprice") * F.col("taxf")
            + F.when(F.col("l_orderkey") % 97 == 0, F.lit(5.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("gross"),
        (F.col("l_quantity") + F.col("l_discount")).alias("total"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "unit"
        ),
    )
    return stats.arithmetic_consistency(
        li,
        [
            ("gross", "l_extendedprice", "mul", "taxf"),
            ("total", "l_quantity", "add", "l_discount"),
            ("unit", "l_extendedprice", "div", "l_quantity"),
        ],
    )


@query(
    "draft4_keywords_events",
    oracle="""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 13 = 0 THEN 'X1' ELSE event_type END
               AS event_type,
             CASE WHEN event_id % 17 = 0 THEN CAST(250.0 AS DOUBLE)
                  ELSE value END AS value,
             CASE WHEN event_id % 101 = 0 THEN NULL ELSE user_id END
               AS user_id
      FROM events
    ),
    flags AS (
      SELECT (
        event_id IS NOT NULL
        AND event_type IS NOT NULL
        AND regexp_matches(event_type, '^[a-z]+$')
        AND length(event_type) >= 3
        AND (value IS NULL OR (
          value >= CAST(0 AS DOUBLE) AND value <= CAST(500 AS DOUBLE)
          AND (CASE WHEN value >= CAST(250 AS DOUBLE) THEN 1 ELSE 0 END
               + CASE WHEN value <= CAST(250 AS DOUBLE) THEN 1 ELSE 0 END)
              = 1))
        AND (user_id IS NULL OR user_id <= 100 OR user_id % 2 = 0)
        AND (value IS NULL OR user_id IS NOT NULL)
      ) AS valid
      FROM src
    )
    SELECT valid, CAST(count(*) AS BIGINT) AS n_docs
    FROM flags GROUP BY 1
    """,
)
def draft4_keywords_events(spark, sf_dir) -> DataFrame:
    """Full-vocabulary Draft-4 validation (validate.struct_conformance_
    report): a hand-authored schema exercising pattern, minLength,
    required, anyOf, oneOf, and dependencies over events rows with a
    planted failure in EVERY arm — event_type 'X1' every 13th id (pattern
    + minLength), value exactly 250.0 every 17th (matches BOTH oneOf
    branches → invalid), user_id NULLed every 101st (the schema-
    dependency value → user_id fires; the anyOf over user_id passes
    vacuously on absent).  The oracle replays the compiled boolean in SQL
    under the same null-means-absent convention, so both verdict counts
    are value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.lit("X1"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 17 == 0, F.lit(250.0))
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % 101 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
    )
    schema = {
        "type": "object",
        "properties": {
            "event_id": {"type": "integer"},
            "event_type": {
                "type": "string",
                "pattern": "^[a-z]+$",
                "minLength": 3,
            },
            "value": {
                "type": "number",
                "minimum": 0,
                "maximum": 500,
                "oneOf": [{"minimum": 250}, {"maximum": 250}],
            },
            "user_id": {
                "type": "integer",
                "anyOf": [{"maximum": 100}, {"multipleOf": 2}],
            },
        },
        "required": ["event_id", "event_type"],
        "dependencies": {"value": ["user_id"]},
    }
    return validate.struct_conformance_report(ev, schema)


@query(
    "stats_merge_incremental_events",
    oracle="""
    WITH src AS (
      SELECT event_type, user_id,
             CASE WHEN event_id % 19 = 0 THEN NULL ELSE value END AS value
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(value) AS min_value, max(value) AS max_value,
           CAST(count(*) - count(value) AS BIGINT) AS nulls_value,
           min(user_id) AS min_user_id, max(user_id) AS max_user_id,
           CAST(count(*) - count(user_id) AS BIGINT) AS nulls_user_id,
           min(event_type) AS min_event_type,
           max(event_type) AS max_event_type,
           CAST(count(*) - count(event_type) AS BIGINT) AS nulls_event_type
    FROM src
    """,
)
def stats_merge_incremental_events(spark, sf_dir) -> DataFrame:
    """Mergeable-stats maintenance (stats.merge_column_stats): the corpus
    is profiled as THREE independent batches (event_id mod 3 — the
    incremental-snapshot shape) and the three one-row stats frames are
    folded WITHOUT rescanning any data; the oracle computes the same
    stats over the whole table in one pass, so the merge law
    stats(A∪B∪C) = merge(stats(A), stats(B), stats(C)) is value-checked
    on min/max/null-count/row-count across double, bigint, and string
    columns (NULLs planted on every 19th value so the null fold is
    non-trivial).  This is the accumulator algebra the 10^12-doc
    checkpoint/resume path relies on, proven exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.when(F.col("event_id") % 19 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    cols = ["value", "user_id", "event_type"]
    parts = None
    for i in range(3):
        batch = stats.column_stats(
            ev.filter(F.col("event_id") % 3 == i).drop("event_id"), cols
        )
        parts = batch if parts is None else parts.unionByName(batch)
    return stats.merge_column_stats(parts, cols)


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


@query(
    "sorted_neighborhood_customer",
    oracle="""
    WITH src AS (
      SELECT c_mktsegment AS block, c_custkey AS id, c_name AS key
      FROM customer
      WHERE c_mktsegment IS NOT NULL AND c_custkey IS NOT NULL
        AND c_name IS NOT NULL
    ),
    rk AS (
      SELECT block, id, key,
             row_number() OVER (PARTITION BY block ORDER BY key, id) AS r
      FROM src
    )
    SELECT a.block, a.id AS id_a, b.id AS id_b,
           a.key AS key_a, b.key AS key_b,
           CAST(b.r - a.r AS INT) AS rank_distance
    FROM rk a JOIN rk b
      ON a.block = b.block AND b.r - a.r BETWEEN 1 AND 2
    """,
)
def sorted_neighborhood_customer(spark, sf_dir) -> DataFrame:
    """Sorted-neighborhood candidate generation (resolve.
    sorted_neighborhood_pairs): customers blocked by market segment,
    sorted by name, window 2 — the classic third blocking strategy
    beside LSH and fingerprint keys, catching sort-adjacent near-misses
    exact blocking splits.  Per-block sort (one keyed exchange), pair
    fan-out rows × window by construction; ranks order by (key, id) so
    candidates are partition-stable.  The oracle replays the identical
    row_number + bounded-offset self-join; every pair, key, and rank
    distance is value-checked (outside the 50-window: the ER family
    carries fingerprint + survivorship in-window reps; this is
    parity-checked at the driver's own sf0.01 every CI run)."""
    cust = load_table(spark, sf_dir, "customer")
    return resolve.sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", "c_mktsegment", window=2
    )


@query(
    "resolve_entities_customer",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT c_custkey AS id,
             'b' || CAST((c_custkey // 3) % 17 AS VARCHAR) AS blk,
             'entity-' || CAST((c_custkey // 3) * 7 + 1000 AS VARCHAR)
               || CASE c_custkey % 3 WHEN 0 THEN '' WHEN 1 THEN 'x'
                  ELSE 'xy' END AS nm,
             CAST(c_custkey % 100 AS DOUBLE) AS acct,
             c_mktsegment AS seg
      FROM customer
    ),
    rk AS (
      SELECT blk, id, nm,
             row_number() OVER (PARTITION BY blk ORDER BY nm, id) AS r
      FROM src
    ),
    pr AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM rk a JOIN rk b ON a.blk = b.blk AND b.r - a.r BETWEEN 1 AND 2
      WHERE levenshtein(a.nm, b.nm) <= 2
    ),
    e(s, d) AS (SELECT id_a, id_b FROM pr
                UNION ALL SELECT id_b, id_a FROM pr),
    reach(id, lbl) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, r.lbl FROM reach r JOIN e ON e.s = r.id
    ),
    cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
    lab AS (
      SELECT coalesce(cl.cluster, src.id) AS cluster, src.*
      FROM src LEFT JOIN cl ON src.id = cl.id
    ),
    base AS (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS n_members,
             arg_max(nm, CASE WHEN nm IS NOT NULL THEN id END) AS nm,
             max(acct) AS acct
      FROM lab GROUP BY 1
    ),
    mc AS (SELECT cluster, seg, count(*) AS n FROM lab
           WHERE seg IS NOT NULL GROUP BY 1, 2),
    win AS (
      SELECT cluster, seg,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n DESC, seg ASC) AS rn
      FROM mc
    )
    SELECT b.cluster, b.n_members, b.nm, b.acct, w.seg
    FROM base b LEFT JOIN win w ON b.cluster = w.cluster AND w.rn = 1
    """,
)
def resolve_entities_customer(spark, sf_dir) -> DataFrame:
    """END-TO-END entity resolution (resolve.resolve_entities): planted
    three-spelling entities ('entity-N', 'entity-Nx', 'entity-Nxy' —
    sort-adjacent, pairwise edit distance ≤ 2) are blocked, candidate-
    paired by sorted neighborhood, matched by Levenshtein, clustered by
    connected components, and fused to golden records (latest non-NULL
    name by id, max account, modal segment).  Entity numbers step by 7
    so distinct entities in a block sit ≥ 3 edits apart.  The oracle
    replays the identical funnel: row_number SNM, DuckDB levenshtein
    (same edit-distance semantics as Spark's), a recursive-CTE
    transitive closure with min-label clusters, singleton fallback to
    the own id, and the arg_max/mode survivorship — every golden record
    value-checked at sf0.01."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ent = F.expr("CAST(c_custkey DIV 3 AS BIGINT)")
    nm = F.concat(
        F.lit("entity-"),
        (ent * 7 + 1000).cast("string"),
        F.when(k % 3 == 1, F.lit("x"))
        .when(k % 3 == 2, F.lit("xy"))
        .otherwise(F.lit("")),
    )
    src = cust.select(
        k.alias("id"),
        F.concat(F.lit("b"), (ent % 17).cast("string")).alias("blk"),
        nm.alias("nm"),
        (k % 100).cast("double").alias("acct"),
        F.col("c_mktsegment").alias("seg"),
    )
    return resolve.resolve_entities(
        src,
        "id",
        "nm",
        "blk",
        "id",
        {"nm": "latest", "acct": "max", "seg": "mode"},
        window=2,
        max_distance=2,
    )


@query(
    "generalization_search_events",
    oracle="""
    WITH c AS (
      SELECT 'user=band10|value=band100' AS combo, 1 + 1 AS cost,
             user_id - user_id % 10 AS g0,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) AS g1
      FROM events
      UNION ALL
      SELECT 'user=exact|value=band100', 0 + 1, user_id,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=band10|value=any', 1 + 2, user_id - user_id % 10, 0
      FROM events
      UNION ALL
      SELECT 'user=exact|value=any', 0 + 2, user_id, 0 FROM events
      UNION ALL
      SELECT 'user=any|value=band100', 2 + 1, 0,
             CAST(floor(coalesce(value, -1) / 100.0) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=any|value=any', 2 + 2, 0, 0 FROM events
      UNION ALL
      SELECT 'user=band10|value=exact', 1 + 0, user_id - user_id % 10,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=exact|value=exact', 0 + 0, user_id,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user=any|value=exact', 2 + 0, 0,
             CAST(floor(coalesce(value, -1)) AS BIGINT) FROM events
    ),
    g AS (
      SELECT combo, cost, g0, g1, count(*) AS n FROM c GROUP BY 1, 2, 3, 4
    ),
    rep AS (
      SELECT combo, CAST(cost AS INT) AS cost,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(n) AS BIGINT) AS min_group_size
      FROM g GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, (min_group_size >= 25) AS satisfies_k,
             row_number() OVER (
               ORDER BY CASE WHEN min_group_size >= 25 THEN 1 ELSE 0 END DESC,
                        cost ASC, combo ASC) AS rn
      FROM rep
    )
    SELECT combo, cost, n_groups, min_group_size, satisfies_k,
           (rn = 1 AND satisfies_k) AS chosen
    FROM rk
    """,
)
def generalization_search_events(spark, sf_dir) -> DataFrame:
    """k-anonymity enforcement search (stats.generalization_search): the
    (user_id, value) quasi-identifier with 3×3 generalization ladders —
    exact → band → suppressed on both axes — evaluated at k=25.  Exact
    combos demonstrably fail (singleton groups) while coarse ones pass,
    and exactly ONE k-satisfying, least-cost combo is marked chosen; the
    oracle replays all nine grouped counts with the identical level
    expressions and ranking (NULL values coalesce to a sentinel bucket
    on both sides so the group keys hash identically).  Nine bounded
    passes, each map-side partial; the report is combos-sized."""
    ev = load_table(spark, sf_dir, "events")
    ladders = {
        "user": [
            ("exact", F.col("user_id")),
            ("band10", F.col("user_id") - F.col("user_id") % 10),
            ("any", F.lit(0)),
        ],
        "value": [
            ("exact", F.floor(F.coalesce(F.col("value"), F.lit(-1.0))).cast("long")),
            (
                "band100",
                F.floor(
                    F.coalesce(F.col("value"), F.lit(-1.0)) / F.lit(100.0)
                ).cast("long"),
            ),
            ("any", F.lit(0)),
        ],
    }
    return stats.generalization_search(ev, ladders, k=25)


@query(
    "attribution_events",
    oracle="""
    WITH src AS (
      SELECT user_id AS k, event_id AS id, epoch_us(ts) AS us,
             event_type AS t
      FROM events
      WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
    ),
    conv AS (SELECT k, id AS cid, us AS cus FROM src WHERE t = 'purchase'),
    touch AS (SELECT k, id AS tid, us AS tus, t AS touch_type FROM src
              WHERE t IN ('view', 'click')),
    pairs AS (
      SELECT c.k, c.cid, tch.touch_type, tch.tus, tch.tid
      FROM conv c JOIN touch tch
        ON c.k = tch.k AND tch.tus < c.cus
       AND tch.tus >= c.cus - 21600000000
    ),
    credited AS (
      SELECT k, cid, touch_type,
             round(CAST(1.0 AS DOUBLE)
                   / count(*) OVER (PARTITION BY k, cid), 6) AS credit
      FROM pairs
    ),
    by_type AS (
      SELECT touch_type,
             CAST(count(DISTINCT (k, cid)) AS BIGINT) AS conversions,
             round(sum(credit), 6) AS credit
      FROM credited GROUP BY 1
    ),
    none_row AS (
      SELECT '(none)' AS touch_type,
             CAST(count(*) AS BIGINT) AS conversions,
             CAST(0.0 AS DOUBLE) AS credit
      FROM conv c
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.k = c.k AND p.cid = c.cid)
    )
    SELECT * FROM by_type UNION ALL SELECT * FROM none_row
    """,
)
def attribution_events(spark, sf_dir) -> DataFrame:
    """Linear touch attribution (temporal.attribution): purchases credited
    across the same user's view/click touches within a 6-hour lookback,
    each touch taking 1/n — the marketing analytic funnel (ordered
    completion) and as-of join (single nearest) cannot answer.  The
    6-hour window BINDS at sf0.01 (unattributed purchases exist → the
    '(none)' row is non-trivial).  Conversions probe exactly two
    lookback-sized (key, band) buckets — never the key's whole history;
    the oracle replays the window join directly (sf-scale) with the same
    per-credit AND final round(6), so every type's conversion count and
    credit mass is value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.attribution(
        ev,
        "user_id",
        "event_id",
        "ts",
        "event_type",
        ["view", "click"],
        "purchase",
        lookback_seconds=6 * 3600,
        model="linear",
    )


@query(
    "quantile_bins_fit_apply_events",
    oracle="""
    WITH tr AS (SELECT value FROM events
                WHERE event_id % 2 = 0 AND value IS NOT NULL),
    ed AS (
      SELECT list_transform(
               quantile_cont(value, [0.25, 0.5, 0.75]),
               x -> round(x, 6)) AS b
      FROM tr
    ),
    sv AS (SELECT value FROM events WHERE event_id % 2 = 1),
    assigned AS (
      SELECT CASE WHEN value IS NULL THEN NULL
                  ELSE len(list_filter(ed.b, x -> x < value)) END AS bucket
      FROM sv, ed
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM assigned GROUP BY 1
    """,
)
def quantile_bins_fit_apply_events(spark, sf_dir) -> DataFrame:
    """Quantile-bucketizer fit/transform split (stats.fit_quantile_bins +
    apply_bins): quartile edges FIT on the even-id half of events.value
    and APPLIED to the odd half — the train-once-bucket-everywhere
    pattern (persisted round6 edges, the IVF-index shape applied to
    feature prep).  Assignment = count of boundaries strictly below x
    (the equidepth convention), edges ride as an array literal so the
    transform is pure codegen.  The oracle fits with quantile_cont (the
    percentile-equivalent interpolation) on the same half and replays
    the list-count assignment; every bucket count is value-checked —
    near-quartile counts with genuine train/serve drift."""
    ev = load_table(spark, sf_dir, "events")
    train = ev.filter(F.col("event_id") % 2 == 0).select("value")
    serve = ev.filter(F.col("event_id") % 2 == 1).select("value")
    edges = stats.fit_quantile_bins(train, "value", 4)
    out = stats.apply_bins(serve, "value", edges)
    return out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))


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
    "pseudonymize_customer_orders",
    oracle="""
    WITH c AS (
      SELECT substr(sha256('s3cr3t' || chr(31) || 'custkey' || chr(31)
                    || CAST(c_custkey AS VARCHAR)), 1, 32) AS pk
      FROM customer
    ),
    o AS (
      SELECT substr(sha256('s3cr3t' || chr(31) || 'custkey' || chr(31)
                    || CAST(o_custkey AS VARCHAR)), 1, 32) AS pk
      FROM orders
    )
    SELECT c.pk AS pseudo_custkey, CAST(count(o.pk) AS BIGINT) AS n_orders
    FROM c LEFT JOIN o ON c.pk = o.pk
    GROUP BY 1
    """,
)
def pseudonymize_customer_orders(spark, sf_dir) -> DataFrame:
    """Keyed pseudonymization preserving referential integrity
    (stats.pseudonymize): customer.c_custkey and orders.o_custkey are
    replaced by 128-bit keyed sha256 surrogates under the SHARED 'custkey'
    domain, then the foreign key is joined ON THE SURROGATES — per-customer
    order counts must equal the plaintext join's.  Row-local projection
    (no shuffle beyond the join itself); NULL keys stay NULL; the oracle
    recomputes the identical sha256 surrogate per row, so every one of the
    1,500 surrogate values AND the join preservation are value-checked
    (customers without orders appear with n_orders = 0 via the left
    join — both arms populated)."""
    cust = stats.pseudonymize(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        {"c_custkey": "custkey"},
        secret="s3cr3t",
    )
    ords = stats.pseudonymize(
        load_table(spark, sf_dir, "orders").select("o_custkey"),
        {"o_custkey": "custkey"},
        secret="s3cr3t",
    )
    return (
        cust.join(ords, cust["c_custkey"] == ords["o_custkey"], "left")
        .groupBy(cust["c_custkey"].alias("pseudo_custkey"))
        .agg(F.count(ords["o_custkey"]).alias("n_orders"))
    )


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
    from .sources.layout import zorder_bucket_report

    return zorder_bucket_report(ev, ["user_id", "event_id"], bits=16, bucket_bits=4)


_PAGERANK_EDGES_SQL = """
WITH x AS (SELECT doc_id, unnest(spans) AS sp FROM read_parquet('__SPANS_GLOB__'))
SELECT doc_id AS src, sp.media_ref AS dst FROM x WHERE sp.media_ref IS NOT NULL
UNION ALL
SELECT sp.media_ref AS src, doc_id AS dst FROM x WHERE sp.media_ref IS NOT NULL
"""


def _pagerank_oracle() -> str:
    from .operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PAGERANK_EDGES_SQL, iterations=6, damping_pct=85)


@query("pagerank_spans_media", oracle=_pagerank_oracle())
def pagerank_spans_media(spark, sf_dir) -> DataFrame:
    """PageRank over the doc ↔ media_ref bipartite graph of the spans
    corpus (operators.graph.pagerank, 6 iterations, d=0.85): ranks shared
    media assets and hub documents for curation triage.  EXACT-INTEGER
    power iteration — ranks live in BIGINT micro-units, contributions are
    integer divisions, so the fixed-iteration result is bit-identical in
    both engines with zero floating-point accumulation; per iteration one
    edges⋈ranks shuffle + one groupBy(dst), ranks eagerly checkpointed so
    the plan stays constant-size (the connected-components discipline).
    The oracle is the recurrence itself, unrolled into a generated
    6-iteration CTE chain (graph.pagerank_oracle_sql) — every node's final
    rank value-checked, dangling-mass arm exercised structurally (zero
    here: every node in a bidirectional edge list has out-degree)."""
    from .operators.graph import pagerank

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = spans.select("doc_id", F.explode("spans").alias("sp")).filter(
        F.col("sp.media_ref").isNotNull()
    )
    fwd = x.select(F.col("doc_id").alias("src"), F.col("sp.media_ref").alias("dst"))
    rev = x.select(F.col("sp.media_ref").alias("src"), F.col("doc_id").alias("dst"))
    return pagerank(fwd.union(rev), iterations=6)


@query(
    "hybrid_rrf_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.query_id, q.qv, q.ql, e.vec_id AS neighbor_id,
             e.embedding AS ev, e.label AS el
      FROM q, embeddings e WHERE e.vec_id <> q.query_id
    ),
    sem AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
                     CAST(ev AS DOUBLE[])), 6) DESC, neighbor_id) AS r
      FROM pairs
    ),
    met AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               abs(el - ql), neighbor_id) AS r
      FROM pairs
    ),
    u AS (
      SELECT query_id, neighbor_id, 1000000000 // (60 + r) AS t
      FROM sem WHERE r <= 20
      UNION ALL
      SELECT query_id, neighbor_id, 1000000000 // (60 + r) AS t
      FROM met WHERE r <= 20
    ),
    f AS (
      SELECT query_id, neighbor_id, CAST(sum(t) AS BIGINT) AS score_micro,
             CAST(count(*) AS BIGINT) AS n_lists
      FROM u GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY score_micro DESC, neighbor_id) AS rank
      FROM f
    )
    SELECT query_id, neighbor_id, score_micro, n_lists,
           CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 10
    """,
)
def hybrid_rrf_embeddings(spark, sf_dir) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (similarity.rrf_fuse):
    for 5 query vectors, fuse (a) the exact cosine top-20
    (similarity.brute_force_topk — the semantic arm) with (b) a
    metadata-affinity top-20 (|label distance|, the filtered/keyword arm)
    into one top-10 per query.  Fusion uses only the RANKS — the classic
    1/(k0+r), k0=60, quantized to integer nano-units so the fused score is
    a sum of longs (exact, order-free, engine-identical); items retrieved
    by both arms carry n_lists=2 and dominate (both arms fire by
    construction).  The oracle replays both rankings and the quantized
    fusion — all 50 fused rows value-checked."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    sem = similarity.brute_force_topk(emb, queries_df, k=20)
    q = F.broadcast(
        queries_df.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
        )
    )
    pairs = q.crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_el"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.abs(F.col("_el") - F.col("_ql")).asc(), F.col("neighbor_id").asc()
    )
    met = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "neighbor_id", "rank")
    )
    return similarity.rrf_fuse([sem, met], k=10, k0=60)


@query(
    "joinability_kmv_tpch",
    oracle="""
    WITH vals AS (
      SELECT DISTINCT 'customer.c_custkey' AS col,
             md5(CAST(c_custkey AS VARCHAR)) AS h
      FROM customer WHERE c_custkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'customer.c_nationkey', md5(CAST(c_nationkey AS VARCHAR))
      FROM customer WHERE c_nationkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'orders.o_custkey', md5(CAST(o_custkey AS VARCHAR))
      FROM orders WHERE o_custkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'orders.o_orderkey', md5(CAST(o_orderkey AS VARCHAR))
      FROM orders WHERE o_orderkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'lineitem.l_orderkey', md5(CAST(l_orderkey AS VARCHAR))
      FROM lineitem WHERE l_orderkey IS NOT NULL
      UNION ALL
      SELECT DISTINCT 'nation.n_nationkey', md5(CAST(n_nationkey AS VARCHAR))
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    sk AS (SELECT col, h FROM (
             SELECT col, h,
                    row_number() OVER (PARTITION BY col ORDER BY h) AS r
             FROM vals) WHERE r <= 128),
    mx AS (SELECT col, max(h) AS mh FROM sk GROUP BY 1),
    pairs AS (SELECT a.col AS col_a, b.col AS col_b,
                     least(a.mh, b.mh) AS tau
              FROM mx a JOIN mx b ON a.col < b.col),
    sa AS (SELECT p.col_a, p.col_b, count(*) AS la FROM pairs p
           JOIN sk s ON s.col = p.col_a AND s.h <= p.tau GROUP BY 1, 2),
    sb AS (SELECT p.col_a, p.col_b, count(*) AS lb FROM pairs p
           JOIN sk s ON s.col = p.col_b AND s.h <= p.tau GROUP BY 1, 2),
    it AS (SELECT p.col_a, p.col_b, count(*) AS ni FROM pairs p
           JOIN sk x ON x.col = p.col_a AND x.h <= p.tau
           JOIN sk y ON y.col = p.col_b AND y.h = x.h GROUP BY 1, 2)
    SELECT p.col_a, p.col_b,
           CAST(coalesce(ni, 0) AS BIGINT) AS n_common,
           CASE WHEN coalesce(la, 0) + coalesce(lb, 0) - coalesce(ni, 0) = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(coalesce(la, 0)
                     + coalesce(lb, 0) - coalesce(ni, 0) AS DOUBLE), 6)
           END AS est_jaccard,
           CASE WHEN coalesce(la, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(la AS DOUBLE), 6)
           END AS est_contain_a_in_b,
           CASE WHEN coalesce(lb, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(coalesce(ni, 0) / CAST(lb AS DOUBLE), 6)
           END AS est_contain_b_in_a
    FROM pairs p
    LEFT JOIN sa USING (col_a, col_b)
    LEFT JOIN sb USING (col_a, col_b)
    LEFT JOIN it USING (col_a, col_b)
    """,
)
def joinability_kmv_tpch(spark, sf_dir) -> DataFrame:
    """Joinability DISCOVERY at sketch scale (stats.kmv_column_sketches +
    joinability_report): six key columns across four TPC-H tables reduce
    to 128-hash bottom-k (KMV) sketches — one scan per table, two-phase
    salted bottom-k so no column serializes its distinct set — then
    all 15 pairs get Jaccard/containment estimates from sketch-sized
    arithmetic (Cohen-Kaplan bottom-k estimators).  md5 makes the sketch
    bit-deterministic, so the oracle replays it EXACTLY — no error band
    needed, unlike HLL.  True foreign keys (o_custkey⊆c_custkey,
    l_orderkey≈o_orderkey, c_nationkey vs n_nationkey) surface with high
    containment; unrelated key pairs sit near zero — both arms
    value-checked across all 15 rows."""
    sk = None
    for tbl, cols in (
        ("customer", ["c_custkey", "c_nationkey"]),
        ("orders", ["o_custkey", "o_orderkey"]),
        ("lineitem", ["l_orderkey"]),
        ("nation", ["n_nationkey"]),
    ):
        part = stats.kmv_column_sketches(
            load_table(spark, sf_dir, tbl), cols, k=128, table=tbl
        )
        sk = part if sk is None else sk.unionAll(part)
    return stats.joinability_report(sk, k=128)


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


@query(
    "incremental_cc_orders",
    oracle="""
    WITH RECURSIVE pr AS (
      SELECT o_custkey AS id_a,
             100000 + o_orderkey % 997 AS id_b
      FROM orders WHERE o_orderkey % 11 <= 1
    ),
    e(src, dst) AS (
      SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id
    )
    SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
    """,
)
def incremental_cc_orders(spark, sf_dir) -> DataFrame:
    """Incremental connected components (graph.incremental_components):
    a base bipartite custkey↔bucket graph (even slice, o_orderkey % 11 = 0)
    is labelled by the full large-star/small-star CC, then the odd slice
    (% 11 = 1) arrives as a BATCH folded in WITHOUT re-running CC over the
    corpus — endpoints map to current labels, the label-contracted reduced
    graph (touched components only) re-clusters, and one remap join moves
    affected nodes.  Min-label contraction preserves component minima
    exactly, so the incremental answer must equal the from-scratch batch
    answer — and the oracle IS that from-scratch answer (recursive-CTE
    min-label closure over BOTH slices): every node's final cluster
    value-checked, merges across the two batches guaranteed by the shared
    bucket space."""
    from .operators.graph import incremental_components

    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edge = lambda parity: ords.filter(  # noqa: E731
        F.col("o_orderkey") % 11 == parity
    ).select(
        F.col("o_custkey").alias("id_a"),
        (F.lit(100000) + F.col("o_orderkey") % 997).alias("id_b"),
    )
    labels = dedup.duplicate_clusters(edge(0))
    return incremental_components(labels, edge(1))


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


def _ab_oracle_block(metric_sql: str, label: str) -> str:
    """One comparison of the ab_test oracle: integer-quantized moment sums
    (HUGEINT — exact, matching Spark's decimal(38,0)) then the Welch
    arithmetic in EXACTLY the operator's expression order."""
    vm = f"CAST(round(({metric_sql}) * 1e6) AS BIGINT)"
    keep_c = f"event_id % 2 = 0 AND ({metric_sql}) IS NOT NULL"
    keep_t = f"event_id % 2 = 1 AND ({metric_sql}) IS NOT NULL"
    return f"""
    SELECT '{label}' AS comparison, n_control, n_treatment,
           round(mc, 6) AS mean_control, round(mt, 6) AS mean_treatment,
           round(mt - mc, 6) AS abs_lift,
           CASE WHEN mc = 0e0 THEN NULL
                ELSE round((mt - mc) / mc, 6) END AS rel_lift,
           round((mt - mc) / sqrt(sec + sett), 6) AS t_stat,
           round((sec + sett) * (sec + sett)
                 / (sec * sec / (nc - 1e0) + sett * sett / (nt - 1e0)),
                 6) AS dof,
           abs((mt - mc) / sqrt(sec + sett)) > CAST(1.959964 AS DOUBLE)
             AS significant
    FROM (
      SELECT n_control, n_treatment, nc, nt, mc, mt, vc / nc AS sec,
             vt / nt AS sett
      FROM (
        SELECT n_control, n_treatment,
               CAST(n_control AS DOUBLE) AS nc, CAST(n_treatment AS DOUBLE) AS nt,
               CAST(s1c AS DOUBLE) / CAST(n_control AS DOUBLE) / 1e6 AS mc,
               CAST(s1t AS DOUBLE) / CAST(n_treatment AS DOUBLE) / 1e6 AS mt,
               (CAST(s2c AS DOUBLE) / 1e12
                - (CAST(s1c AS DOUBLE) / 1e6) * (CAST(s1c AS DOUBLE) / 1e6)
                  / CAST(n_control AS DOUBLE))
               / (CAST(n_control AS DOUBLE) - 1e0) AS vc,
               (CAST(s2t AS DOUBLE) / 1e12
                - (CAST(s1t AS DOUBLE) / 1e6) * (CAST(s1t AS DOUBLE) / 1e6)
                  / CAST(n_treatment AS DOUBLE))
               / (CAST(n_treatment AS DOUBLE) - 1e0) AS vt
        FROM (
          SELECT CAST(sum(CASE WHEN {keep_c} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_control,
                 CAST(sum(CASE WHEN {keep_t} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treatment,
                 coalesce(sum(CASE WHEN {keep_c}
                   THEN CAST({vm} AS HUGEINT) END), 0) AS s1c,
                 coalesce(sum(CASE WHEN {keep_t}
                   THEN CAST({vm} AS HUGEINT) END), 0) AS s1t,
                 coalesce(sum(CASE WHEN {keep_c}
                   THEN CAST({vm} AS HUGEINT) * {vm} END), 0) AS s2c,
                 coalesce(sum(CASE WHEN {keep_t}
                   THEN CAST({vm} AS HUGEINT) * {vm} END), 0) AS s2t
          FROM events
        )
      )
    )
    """


@query(
    "ab_test_events",
    oracle=(
        _ab_oracle_block("value + CASE WHEN event_id % 2 = 1 THEN 5e-1 ELSE 0e0 END",
                         "planted_lift")
        + " UNION ALL "
        + _ab_oracle_block("value", "no_effect")
    ),
)
def ab_test_events(spark, sf_dir) -> DataFrame:
    """A/B experiment readout (stats.ab_test_report, Welch two-sample):
    arms = event_id parity over events.value, run twice — once with a
    planted +0.5 treatment lift (t ≈ 2.2 → significant) and once on the
    raw metric (the natural parity diff lands at t ≈ 1.7 → NOT
    significant at the 1.959964 two-sided gate) — both verdict arms fire
    and every statistic is value-checked.  Determinism: the metric is
    quantized to integer micro-units at the scan, so both moment sums are
    EXACT decimal aggregates (no partition-order noise) and the Welch
    t / Welch–Satterthwaite dof derive from identical doubles in both
    engines (the oracle replays the operator's expression order, HUGEINT
    for Spark's decimal(38,0)).  One conditional-aggregate corpus scan
    per comparison."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    arm = F.when(F.col("event_id") % 2 == 0, F.lit("control")).otherwise(
        F.lit("treatment")
    )
    planted = ev.select(
        arm.alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 1, F.lit(0.5)).otherwise(F.lit(0.0))
        ).alias("m"),
    )
    plain = ev.select(arm.alias("arm"), F.col("value").alias("m"))
    r1 = stats.ab_test_report(planted, "arm", "m", "control", "treatment")
    r2 = stats.ab_test_report(plain, "arm", "m", "control", "treatment")
    return r1.select(F.lit("planted_lift").alias("comparison"), "*").unionByName(
        r2.select(F.lit("no_effect").alias("comparison"), "*")
    )


@query(
    "transition_profile_events",
    oracle="""
    WITH st AS (SELECT user_id, event_id,
           CASE WHEN event_id % 1009 = 0 THEN 'rare_state'
                ELSE event_type END AS s
         FROM events),
    pr AS (SELECT s AS to_state,
             lag(s) OVER (PARTITION BY user_id ORDER BY event_id, s)
               AS from_state
           FROM st)
    SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER (PARTITION BY from_state)
                        AS DOUBLE), 6) AS p
    FROM pr WHERE from_state IS NOT NULL GROUP BY 1, 2
    """,
)
def transition_profile_events(spark, sf_dir) -> DataFrame:
    """First-order Markov transition matrix (temporal.transition_profile)
    over per-user event sequences ordered by event_id, with a planted
    'rare_state' on every 1009th event so the matrix carries both common
    (~0.2) and rare (~0.001) conditional probabilities.  One window
    shuffle on user_id → a states²-sized aggregate; (order, state)
    tie-break makes equal-order rows deterministic.  The oracle replays
    lag + conditional normalization — every cell's count AND probability
    value-checked."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 1009 == 0, F.lit("rare_state"))
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    return temporal.transition_profile(st, "user_id", "event_id", "s")


@query(
    "anomalous_transitions_events",
    oracle="""
    WITH st AS (SELECT user_id, event_id,
           CASE WHEN event_id % 1009 = 0 THEN 'rare_state'
                ELSE event_type END AS s
         FROM events),
    pr AS (SELECT user_id AS key, event_id AS order_at, s AS to_state,
             lag(s) OVER (PARTITION BY user_id ORDER BY event_id, s)
               AS from_state
           FROM st),
    cnt AS (SELECT from_state, to_state, count(*) AS n FROM pr
            WHERE from_state IS NOT NULL GROUP BY 1, 2),
    prof AS (SELECT from_state, to_state,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE),
                     6) AS p,
               sum(n) OVER (PARTITION BY from_state) AS ft
             FROM cnt),
    rare AS (SELECT from_state, to_state, p FROM prof
             WHERE p <= CAST(0.01 AS DOUBLE) AND ft >= 50)
    SELECT pr.key, pr.order_at, pr.from_state, pr.to_state, rare.p
    FROM pr JOIN rare ON pr.from_state = rare.from_state
                     AND pr.to_state = rare.to_state
    """,
)
def anomalous_transitions_events(spark, sf_dir) -> DataFrame:
    """Row-level rare-transition audit (temporal.anomalous_transitions,
    max_p=0.01, min_from_total=50): the planted 'rare_state' rows surface
    as transitions INTO rare_state (p ≈ 0.001 under well-measured
    from-states), while transitions OUT of rare_state are correctly
    SUPPRESSED by the min_from_total floor (its total ≈ 10 observations —
    a p=0.3 'rarity' from 10 samples is noise, and that arm is exactly
    what the floor exists for).  Returns the offending rows, not the
    matrix; oracle replays profile + floor + row join."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 1009 == 0, F.lit("rare_state"))
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    return temporal.anomalous_transitions(
        st, "user_id", "event_id", "s", max_p=0.01, min_from_total=50
    )


@query(
    "embedding_drift_snapshots",
    oracle="""
    WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
               WHERE vec_id % 2 = 0 AND embedding IS NOT NULL),
    c AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x * CAST(1.1 AS DOUBLE) + CAST(0.05 AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id % 2 = 1 AND embedding IS NOT NULL),
    sb AS (SELECT i, sum(CAST(CAST(round(e[i] * 1e6) AS BIGINT) AS HUGEINT))
                    AS sb
           FROM b, unnest(range(1, len(e) + 1)) AS r(i) GROUP BY 1),
    sc AS (SELECT i, sum(CAST(CAST(round(e[i] * 1e6) AS BIGINT) AS HUGEINT))
                    AS sc
           FROM c, unnest(range(1, len(e) + 1)) AS r(i) GROUP BY 1),
    nn AS (SELECT (SELECT count(*) FROM b) AS nb,
                  (SELECT count(*) FROM c) AS nc,
                  (SELECT len(any_value(e)) FROM b) AS dim),
    j AS (SELECT sb.sb, sc.sc,
                 CAST(sb.sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1e6 AS cb,
                 CAST(sc.sc AS DOUBLE) / CAST(nc AS DOUBLE) / 1e6 AS cc
          FROM sb JOIN sc USING (i), nn),
    agg AS (SELECT sum(sb * sc) AS dot, sum(sb * sb) AS nb2,
                   sum(sc * sc) AS nc2,
                   sum(CAST(round(1e12 * ((cb - cc) * (cb - cc)))
                       AS BIGINT)) AS sh2
            FROM j)
    SELECT CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_current,
           CAST(dim AS INT) AS dim,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(nb2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))),
                 6) AS centroid_cosine,
           round(sqrt(sh2 / 1e12), 6) AS centroid_shift_l2
    FROM agg, nn
    """,
)
def embedding_drift_snapshots(spark, sf_dir) -> DataFrame:
    """Embedding drift (drift.embedding_drift): even vec_ids are the base
    snapshot; odd vec_ids get a planted affine drift (x·1.1 + 0.05 — a
    re-scaled encoder plus a bias shift) as the current snapshot.  Every
    component quantizes to 1e-6 at the scan; per-dim sums are exact
    decimal aggregates; centroid cosine comes from the integer sum
    vectors directly (scales cancel) and the L2 shift from per-dim
    pico-quantized squared diffs — zero floating-point accumulation, so
    both engines produce the identical report.  The oracle replays
    quantization, HUGEINT sums, and the final arithmetic — cosine < 1 and
    shift > 0 by construction, both value-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0).select("embedding")
    cur = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * F.lit(1.1) + F.lit(0.05),
        ).alias("embedding")
    )
    return drift.embedding_drift(base, cur)


@query(
    "frequency_encoding_events",
    oracle="""
    SELECT event_type AS value, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST((SELECT count(*) FROM events) AS DOUBLE), 6)
             AS freq
    FROM events GROUP BY 1
    """,
)
def frequency_encoding_events(spark, sf_dir) -> DataFrame:
    """Frequency encoding fit table (stats.fit_frequency_encoding): one
    grouped scan over event_type; NULL would be a real category.  All
    category rows value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return stats.fit_frequency_encoding(ev, "event_type")


@query(
    "target_encoding_events",
    oracle="""
    WITH train AS (SELECT event_type, value FROM events
                   WHERE event_id % 2 = 0 AND value IS NOT NULL),
    per AS (SELECT event_type AS v,
                   sum(CAST(CAST(round(value * 1e6) AS BIGINT) AS HUGEINT))
                     AS s1,
                   count(*) AS n
            FROM train GROUP BY 1),
    pri AS (SELECT CAST(sum(s1) AS DOUBLE) / CAST(sum(n) AS DOUBLE) / 1e6
                     AS prior
            FROM per),
    fit AS (SELECT v, round((CAST(s1 AS DOUBLE) / 1e6 + 1e1 * prior)
                            / (CAST(n AS DOUBLE) + 1e1), 6) AS enc
            FROM per, pri),
    serve AS (SELECT event_id,
                     CASE WHEN event_id % 997 = 1 THEN 'unseen_cat'
                          ELSE event_type END AS cat
              FROM events WHERE event_id % 2 = 1)
    SELECT s.event_id, s.cat,
           coalesce(fit.enc, round(pri.prior, 6)) AS value_encoded
    FROM serve s LEFT JOIN fit ON s.cat IS NOT DISTINCT FROM fit.v, pri
    """,
)
def target_encoding_events(spark, sf_dir) -> DataFrame:
    """Smoothed target encoding, fit/transform split (stats.
    fit_target_encoding m=10 + apply_encoding + target_prior): fit on the
    even event_id half (category=event_type, target=value), apply to the
    odd half where every 997th id carries a planted 'unseen_cat' — the
    unseen arm falls back to the fitted prior (loudly passed as default,
    never silent zero).  Exact decimal moment sums make prior and every
    encoding bit-identical across engines; the fit table broadcasts,
    applied null-safe.  All 5,000 serve rows value-checked, both arms
    populated."""
    ev = load_table(spark, sf_dir, "events")
    train = ev.filter(F.col("event_id") % 2 == 0)
    fit = stats.fit_target_encoding(train, "event_type", "value", smoothing=10.0)
    prior = stats.target_prior(train, "value")
    serve = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.when(F.col("event_id") % 997 == 1, F.lit("unseen_cat"))
        .otherwise(F.col("event_type"))
        .alias("cat"),
    )
    return stats.apply_encoding(
        serve, "cat", fit, "value_encoded", default=prior
    )


@query(
    "winsorize_events",
    oracle="""
    WITH ed AS (SELECT round(quantile_cont(CAST(value AS DOUBLE),
                              CAST(0.05 AS DOUBLE)), 6) AS lo,
                       round(quantile_cont(CAST(value AS DOUBLE),
                              CAST(0.95 AS DOUBLE)), 6) AS hi
                FROM events)
    SELECT event_id, value,
           CASE WHEN value IS NULL THEN NULL
                ELSE least(greatest(CAST(value AS DOUBLE), lo), hi)
           END AS value_winsorized,
           CASE WHEN value IS NULL THEN NULL
                ELSE CAST(value AS DOUBLE) < lo OR CAST(value AS DOUBLE) > hi
           END AS clipped
    FROM events, ed
    """,
)
def winsorize_events(spark, sf_dir) -> DataFrame:
    """Percentile clipping (stats.winsorize at [p05, p95]): round-6
    persistable edges fitted in one percentile aggregate (the
    fit_quantile_bins contract), then a pure least/greatest projection —
    ~10% of rows clip by construction, so both ``clipped`` arms fire.
    The oracle fits quantile_cont (the percentile-equivalent
    interpolation) and replays the clip — all 10,000 rows value-checked."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return stats.winsorize(ev, "value", lower_q=0.05, upper_q=0.95)


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
    from .sources.csvx import read_csv_inferred

    path = _csv_events_path()
    df = read_csv_inferred(spark, path)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * F.lit(1000000.0)).cast("long")).alias(
            "value_sum_micro"
        ),
    )


@query(
    "survival_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t0,
             max(CASE WHEN rn = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs
      FROM ranked GROUP BY user_id),
    cells AS (SELECT t0 AS t,
                     CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_event,
                     CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_censored
              FROM per GROUP BY 1),
    tot AS (SELECT sum(n_event + n_censored) AS n FROM cells),
    risk AS (SELECT t, n_event, n_censored,
                    CAST(n - coalesce(sum(n_event + n_censored) OVER
                      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             FROM cells, tot),
    lg AS (SELECT t, n_event, n_censored, n_risk,
            CASE WHEN n_event < n_risk
                 THEN round(ln(CAST(n_risk - n_event AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)), 6) END AS lt,
            CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END AS z,
            CASE WHEN n_event < n_risk
                 THEN round(CAST(n_event AS DOUBLE)
                            / (CAST(n_risk AS DOUBLE)
                               * CAST(n_risk - n_event AS DOUBLE)), 12)
            END AS g
           FROM risk),
    cum AS (SELECT t, n_risk, n_event, n_censored,
                   sum(z) OVER w AS zc, sum(lt) OVER w AS sl,
                   sum(g) OVER w AS sg
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
    SELECT t, n_risk, n_event, n_censored,
           CASE WHEN zc > 0 THEN 0.0 ELSE round(exp(sl), 6) END AS survival,
           CASE WHEN zc > 0 THEN NULL
                WHEN round(exp(sl), 6) > 0
                THEN round(round(exp(sl), 6) * sqrt(sg), 6) END AS std_err
    FROM cum
    """,
)
def survival_users_events(spark, sf_dir) -> DataFrame:
    """Kaplan-Meier survival curve (temporal.survival_curve) over per-user
    lifetimes derived from events: duration = exact integer HOUR floor
    between a user's first and last event (hours, not days — the sf
    generator packs lifetimes into ~1 month, day floors would collapse the
    curve to four times), observed = the user's FINAL event is an 'error'
    (churned-with-error; the deterministic tie-break is the unique
    event_id riding inside a struct max, row_number DESC in the oracle).
    "Every user ever errors" made the naive proxy degenerate — final-event
    gives ~20% observed, so BOTH arms are populated at sf0.01: users whose
    last sighting is benign are CENSORED there and stay in the risk set,
    the correction naive retention queries miss.  Log-space product with
    per-term round6 + ordered cumulative windows keeps every survival
    value bit-identical across engines; Greenwood terms round at 12
    (1e-6-scale magnitudes).  Every curve row — risk set, events,
    censorings, survival, std_err — value-checked against the full
    relational replay."""
    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("duration_hours"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("observed"),
        )
    )
    return temporal.survival_curve(per, "duration_hours", "observed")


@query(
    "rfm_orders",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS key,
             max(epoch_us(o_orderdate)) AS last_us,
             CAST(count(*) AS BIGINT) AS frequency,
             sum(CAST(CAST(round(o_totalprice * 1e6) AS BIGINT) AS HUGEINT))
               AS m_micro
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      GROUP BY 1),
    a AS (SELECT max(last_us) AS asof_us FROM per),
    en AS (SELECT key,
                  CAST(floor((asof_us - last_us) / 86400000000.0) AS BIGINT)
                    AS recency_days,
                  frequency,
                  round(CAST(m_micro AS DOUBLE) / 1e6, 6) AS monetary
           FROM per, a),
    ed AS (SELECT
      list_sort(list_distinct(list_transform(
        quantile_cont(CAST(recency_days AS DOUBLE),
                      [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)))) AS er,
      list_sort(list_distinct(list_transform(
        quantile_cont(CAST(frequency AS DOUBLE),
                      [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)))) AS ef,
      list_sort(list_distinct(list_transform(
        quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
        e -> round(e, 6)))) AS em
      FROM en),
    sc AS (SELECT key, recency_days, frequency, monetary,
             5 - len(list_filter(er, e -> e < CAST(recency_days AS DOUBLE)))
               AS r_score,
             len(list_filter(ef, e -> e < CAST(frequency AS DOUBLE))) + 1
               AS f_score,
             len(list_filter(em, e -> e < monetary)) + 1 AS m_score
           FROM en, ed)
    SELECT key, recency_days, frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           concat(r_score, '-', f_score, '-', m_score) AS segment
    FROM sc
    """,
)
def rfm_orders(spark, sf_dir) -> DataFrame:
    """RFM segmentation (temporal.rfm_report, k=5) over orders per
    customer: exact integer-day recency against the table's own last
    order (self-as-of), order counts, micro-unit-exact monetary totals;
    quantile edges fitted once (round-6, DEDUPED — frequency quantiles
    tie at small integer counts and a duplicated edge would double-count
    in the strictly-below assignment), scores 1..5 with recency reversed
    so higher is better, fused ','-free segment label.  All ~1,000
    customer rows value-checked against the quantile_cont + list_filter
    replay."""
    orders = load_table(spark, sf_dir, "orders")
    return temporal.rfm_report(
        orders, "o_custkey", "o_orderdate", "o_totalprice", k=5
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
    "interval_join_events",
    oracle="""
    WITH inc AS (SELECT user_id, event_id AS incident_id,
                        epoch_us(ts) AS ls,
                        epoch_us(ts) + 21600000000 AS le
                 FROM events WHERE event_type = 'error'),
    act AS (SELECT user_id, event_id AS activity_id,
                   epoch_us(ts) AS rs,
                   epoch_us(ts) + 7200000000 AS re
            FROM events WHERE event_type = 'purchase')
    SELECT i.user_id, incident_id, activity_id,
           least(le, re) - greatest(ls, rs) AS overlap_us
    FROM inc i JOIN act a
      ON i.user_id = a.user_id AND ls < re AND rs < le
    """,
)
def interval_join_events(spark, sf_dir) -> DataFrame:
    """Bucketed interval-overlap join (joins.interval_join): per-user
    error-incident windows [ts, ts+6h) overlap-joined with purchase
    activity windows [ts, ts+2h).  The oracle is the naive BETWEEN-style
    theta join DuckDB can afford at sf0.01; the Spark side is the plan
    that survives 100 TB — intervals explode to the 1-hour buckets they
    touch, the join is an ordinary equi-join on (user_id, bucket), and
    each overlapping pair is kept exactly once (only in the bucket
    holding greatest(start_l, start_r)) with no distinct.  Exact integer
    overlap_us value-checked on all 278 matched pairs."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("inc_start"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("inc_end"),
    )
    act = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("activity_id"),
        F.col("ts").alias("act_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("act_end"),
    )
    out = joins.interval_join(
        inc,
        act,
        ("inc_start", "inc_end"),
        ("act_start", "act_end"),
        on=["user_id"],
        bucket_us=3_600_000_000,
    )
    return out.select("user_id", "incident_id", "activity_id", "overlap_us")


@query(
    "roc_auc_events",
    oracle="""
    WITH base AS (SELECT value AS s, (event_type = 'purchase') AS y
                  FROM events
                  WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT s,
                   count(*) FILTER (WHERE y) AS np,
                   count(*) FILTER (WHERE NOT y) AS nn
            FROM base GROUP BY s),
    r AS (SELECT np, nn,
                 coalesce(sum(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nb
          FROM per)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST((SELECT count(*) FROM events
                 WHERE value IS NULL OR event_type IS NULL) AS BIGINT)
             AS n_null,
           round(sum(np * (2 * nb + nn))
                 / (2.0 * sum(np) * sum(nn)), 6) AS auc,
           round(2.0 * round(sum(np * (2 * nb + nn))
                 / (2.0 * sum(np) * sum(nn)), 6) - 1.0, 6) AS gini
    FROM r
    """,
)
def roc_auc_events(spark, sf_dir) -> DataFrame:
    """Exact tie-aware ROC AUC of `value` as a purchase-propensity score
    (modeleval.roc_auc).  The oracle is the textbook ranked replay over
    DISTINCT scores in DuckDB; the Spark side computes the identical
    integer rank statistic with NO corpus-wide global sort — the
    two-level bin/score prefix decomposition keeps the only ordered
    single-partition window on a bounded 1024-row bin table."""
    from .operators.modeleval import roc_auc

    ev = load_table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").alias("y")
    )
    return roc_auc(ev, "value", "y", lo=0.0, hi=500.0, bins=1 << 10)


@query(
    "calibration_events",
    oracle="""
    WITH base AS (
      SELECT least(greatest(CAST(floor((value / 500.0) / 0.1) AS BIGINT),
                            0), 9) AS bin,
             CAST(round(value / 500.0 * 1000000) AS BIGINT) AS sq,
             (event_type = 'purchase') AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT bin, count(*) AS n,
                   CAST(sum(sq) AS BIGINT) AS ssum,
                   count(*) FILTER (WHERE y) AS n_pos
            FROM base GROUP BY bin),
    tot AS (SELECT sum(n) AS t FROM per)
    SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           round(ssum / 1000000.0 / n, 6) AS mean_pred,
           round(n_pos / CAST(n AS DOUBLE), 6) AS frac_pos,
           round(abs(round(ssum / 1000000.0 / n, 6)
                     - round(n_pos / CAST(n AS DOUBLE), 6)), 6) AS abs_gap,
           round((n / CAST(t AS DOUBLE))
                 * round(abs(round(ssum / 1000000.0 / n, 6)
                         - round(n_pos / CAST(n AS DOUBLE), 6)), 6), 6)
             AS ece_contrib
    FROM per, tot
    """,
)
def calibration_events(spark, sf_dir) -> DataFrame:
    """Reliability table of the normalized `value` score against the
    purchase label (modeleval.calibration_table): per-decile n, mean
    predicted score (micro-unit integer quantized so the mean is
    bit-identical across engines and partitionings), observed positive
    rate, |gap|, and ECE contribution.  One grouped aggregate; the
    grand total rides a broadcast single-row join."""
    from .operators.modeleval import calibration_table

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("value") / F.lit(500.0)).alias("score"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return calibration_table(ev, "score", "y", lo=0.0, hi=1.0, bins=10)


@query(
    "gains_lift_events",
    oracle="""
    WITH base AS (
      SELECT least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9)
               AS band,
             (event_type = 'purchase') AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per AS (SELECT band, count(*) AS n,
                   count(*) FILTER (WHERE y) AS n_pos
            FROM base GROUP BY band),
    tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM per),
    cum AS (SELECT band, n, n_pos,
                   sum(n) OVER (ORDER BY band DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_n,
                   sum(n_pos) OVER (ORDER BY band DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_pos
            FROM per)
    SELECT band, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CASE WHEN tp > 0
                THEN round(cum_pos / CAST(tp AS DOUBLE), 6) END
             AS capture_rate,
           CASE WHEN tp > 0 AND cum_n > 0
                THEN round((cum_pos / CAST(cum_n AS DOUBLE))
                           / (tp / CAST(tn AS DOUBLE)), 6) END
             AS cum_lift
    FROM cum, tot
    """,
)
def gains_lift_events(spark, sf_dir) -> DataFrame:
    """Gains/lift by descending score band (modeleval.gains_table):
    cumulative rows and positives from the top band down, positive
    capture rate, and cumulative lift vs the base rate.  The ordered
    cumulative runs over the bounded 10-row band aggregate — never the
    corpus — and every ratio divides exact integers."""
    from .operators.modeleval import gains_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return gains_table(ev, "score", "y", lo=0.0, hi=500.0, bands=10)


@query(
    "ks_drift_events_value",
    oracle="""
    WITH a AS (SELECT value AS v FROM events
               WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT value AS v FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT v, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT v, 0, 1 FROM b),
    per AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY v),
    c AS (SELECT v,
                 sum(na) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_a,
                 sum(nb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_b
          FROM per),
    t AS (SELECT (SELECT count(*) FROM a) AS ta,
                 (SELECT count(*) FROM b) AS tb),
    d AS (SELECT v, abs(cum_a * tb - cum_b * ta) AS diff FROM c, t),
    m AS (SELECT max(diff) AS md FROM d)
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           round(CAST(md AS DOUBLE) / CAST(ta * tb AS DOUBLE), 6) AS ks_d,
           (SELECT min(v) FROM d WHERE diff = md) AS ks_at
    FROM t, m
    """,
)
def ks_drift_events_value(spark, sf_dir) -> DataFrame:
    """Exact two-sample KS statistic between the click and purchase value
    distributions (drift.ks_drift): sup|F_a - F_b| maximized as the exact
    integer |cum_a*n_b - cum_b*n_a| and divided once — bit-identical to
    the DuckDB ordered replay, with NO corpus-wide sort on the Spark side
    (the roc_auc two-level bin/value prefix decomposition; the only
    single-partition exchange is the <=1024-row bin table)."""
    from .operators.drift import ks_drift

    ev = load_table(spark, sf_dir, "events")
    return ks_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        lo=0.0,
        hi=500.0,
        bins=1 << 10,
    )


@query(
    "triangles_spans_media",
    oracle="""
    WITH x AS (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS (SELECT DISTINCT l.m AS a, r.m AS b
          FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m < r.m),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    nodes AS (SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM nodes GROUP BY node
    """,
)
def triangles_spans_media(spark, sf_dir) -> DataFrame:
    """Per-media triangle counts over the media co-occurrence graph (two
    media are adjacent iff some document references both) —
    graph.triangle_counts, the degree-ordered-orientation algorithm whose
    wedge work is O(sqrt(m)) per vertex even under hub skew.  The oracle
    is the naive three-way self-join on canonical (a < b) edges DuckDB
    can afford at sf-test scale; Spark emits each triangle exactly once
    from its orientation-minimal corner, then explodes the three corners.
    Co-occurrence edges are bounded per document (spans per doc is
    schema-bounded), so the edge build is a keyed self-join on doc_id —
    never all-pairs across the corpus."""
    from .operators.graph import triangle_counts

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left = x.alias("l")
    right = x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


@query(
    "embedding_covariance_profile",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64),
    idx AS (SELECT a.range AS i, b.range AS j
            FROM range(64) a, range(64) b WHERE a.range <= b.range),
    s AS (SELECT idx.i, idx.j,
                 sum(e[idx.i + 1] * e[idx.j + 1]) AS g,
                 sum(e[idx.i + 1]) AS si,
                 sum(e[idx.j + 1]) AS sj,
                 count(*) AS n
          FROM q, idx GROUP BY idx.i, idx.j)
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(n AS BIGINT) AS n,
           round((CAST(g AS DOUBLE) / n
                  - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n))
                 / 1000000000000.0, 6) AS cov
    FROM s
    """,
)
def embedding_covariance_profile(spark, sf_dir) -> DataFrame:
    """Exact population covariance of the 64-dim embedding column, one row
    per upper-triangle entry (linalg.embedding_covariance) — the PCA /
    whitening front-end.  The corpus pass is a single mapInArrow fold
    producing ONE (n, sums, Gram) partial per Arrow batch in exact int64
    micro-units (no d^2 row explode, no corpus shuffle); partials combine
    by decimal(38,0) sums.  The oracle replays the identical quantization
    and division order in DuckDB, so all 2,080 covariance entries
    value-match bit-for-bit."""
    from .operators.linalg import embedding_covariance

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding", dim=64)


@query(
    "similarity_join_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.tk, b.tk)) AS i,
                 len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
          FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, round(i * 1.0 / u, 6) AS jaccard
    FROM p WHERE u > 0 AND i * 1.0 / u >= 0.95
    """,
)
def similarity_join_documents(spark, sf_dir) -> DataFrame:
    """EXACT all-pairs Jaccard join at t=0.95 (dedup.jaccard_prefix_join)
    — prefix filtering over ascending-document-frequency token order, the
    lossless AllPairs/PPJoin counterpart of the MinHash pipeline.  The
    oracle is the naive quadratic join DuckDB can afford at sf-test; the
    Spark side generates candidates ONLY from rarest-first prefix tokens
    (plus the t-length filter) and must return the identical 1,887 pairs
    — a missed pair is a prefix-filter correctness bug, not noise."""
    from .operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95)


@query(
    "split_assign_documents",
    oracle="""
    SELECT doc_id,
           CASE WHEN substring(md5(concat_ws(chr(31), '42', fp)), 1, 8)
                     < 'cccccccd' THEN 'train'
                WHEN substring(md5(concat_ws(chr(31), '42', fp)), 1, 8)
                     < 'e6666666' THEN 'val'
                ELSE 'test' END AS split,
           fp AS group_key
    FROM (SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
          FROM documents)
    """,
)
def split_assign_documents(spark, sf_dir) -> DataFrame:
    """Leakage-safe train/val/test split (sample.assign_splits keyed on a
    GROUP column, 80/10/10): the split decision hashes the
    exact-duplicate fingerprint (text.fp_exact_key), NOT the row id —
    identical documents land in the same split BY CONSTRUCTION, so the
    train/test contamination row-hash splitting commits whenever
    duplicates straddle the boundary cannot happen.  (The pair-list /
    connected-components variant is leakage_safe_split_documents.)
    Deterministic under any partitioning/engine (md5-prefix convention),
    growth-stable (frozen eval sets survive corpus refreshes), zero
    shuffles — the group key rides each row."""
    from .operators.sample import assign_splits
    from .operators.text import fp_exact_key

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "group_key", fp_exact_key("text")
    )
    out = assign_splits(
        docs, "group_key", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "split", "group_key")


@query(
    "containment_join_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    a AS (SELECT * FROM s WHERE doc_id % 5 = 0 AND len(tk) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.tk, b.tk)) * 1.0 / len(a.tk), 6)
             AS containment
    FROM a JOIN s b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.tk, b.tk)) * 1.0 / len(a.tk) >= 0.98
    """,
)
def containment_join_documents(spark, sf_dir) -> DataFrame:
    """Directional containment join at t=0.98 (dedup.containment_join):
    probe docs (doc_id % 5 = 0) whose word set is >= 98% inside another
    document's — the quote/boilerplate/subset detector Jaccard misses.
    Asymmetric prefix filtering: only the probe side prefixes (rarest-df
    tokens), joined against the full corpus token index; B is pruned by
    |B| >= ceil(t|A|) alone.  The oracle is the naive directed quadratic
    join — losslessness means identical pairs."""
    from .operators.dedup import containment_join

    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 5 == 0)
    return containment_join(probe, docs, "text", "doc_id", min_containment=0.98)


@query(
    "contrastive_pairs_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings
               WHERE vec_id < 8 AND label IS NOT NULL
                 AND embedding IS NOT NULL),
    scored AS (
      SELECT q.query_id,
             CASE WHEN e.label = q.ql THEN 'positive'
                  ELSE 'hard_negative' END AS role,
             e.vec_id AS neighbor_id, e.label AS neighbor_label,
             round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                   CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM q, embeddings e
      WHERE e.vec_id <> q.query_id AND e.label IS NOT NULL
        AND e.embedding IS NOT NULL),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id, role
                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, role, neighbor_id, neighbor_label, cos_sim,
           CAST(rank AS INT) AS rank
    FROM ranked
    WHERE (role = 'positive' AND rank <= 2)
       OR (role = 'hard_negative' AND rank <= 2)
    """,
)
def contrastive_pairs_embeddings(spark, sf_dir) -> DataFrame:
    """Contrastive pair mining (similarity.contrastive_pairs): for each of
    8 query vectors, the 2 most-similar same-label neighbors (positives)
    and the 2 most-similar different-label neighbors (hard negatives) —
    the mining step of metric learning, where near-miss negatives carry
    the gradient.  Exact cosine, broadcast query side, one corpus scan,
    per-(query, role) keyed window — value-checked row-for-row against
    DuckDB's list_cosine_similarity replay."""
    from .operators.similarity import contrastive_pairs

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return contrastive_pairs(
        emb, emb.filter(F.col("vec_id") < 8), k_pos=2, k_neg=2
    )


@query(
    "exact_quantiles_events_value",
    oracle="""
    WITH per AS (SELECT value AS v, count(*) AS cnt FROM events
                 WHERE value IS NOT NULL GROUP BY v),
    c AS (SELECT v, cnt,
                 sum(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT sum(cnt) AS n FROM per),
    p AS (SELECT CAST(unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
                      AS DOUBLE) AS prob),
    r AS (SELECT p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r.prob, CAST(r.n AS BIGINT) AS n, r.rank, c.v AS value
    FROM r JOIN c ON r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def exact_quantiles_events_value(spark, sf_dir) -> DataFrame:
    """EXACT quantiles of events.value at 7 probs (stats.exact_quantiles)
    — the exact counterpart of the t-digest estimates and the
    range-partitioner boundary planner, computed with NO global sort:
    distinct-value fold, bounded bin-prefix (the only single-partition
    exchange, <=1024 rows), keyed within-bin cumulative; each distinct
    value owns its exact rank interval and the broadcast probs frame
    probes those intervals.  Value-checked against DuckDB's ordered
    replay at every prob."""
    from .operators.stats import exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(
        ev, "value", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
        lo=0.0, hi=500.0, bins=1 << 10,
    )


def _mixture_weights_ppm() -> dict:
    """src0/src1 get 30% each (forcing saturation at the query's budget);
    the remaining 18 sources share 40% with the ppm remainder spread over
    the alphabetically-first four — integers summing exactly to 1e6."""
    rest = [f"src{i}" for i in range(2, 20)]
    w = {"src0": 300_000, "src1": 300_000}
    base, rem = divmod(400_000, len(rest))
    for i, s in enumerate(sorted(rest)):
        w[s] = base + (1 if i < rem else 0)
    assert sum(w.values()) == 1_000_000
    return w


def _mixture_oracle() -> str:
    vals = ", ".join(
        f"('{s}', {w})" for s, w in sorted(_mixture_weights_ppm().items())
    )
    return f"""
    WITH tok AS (SELECT source,
                        CAST(sum(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS BIGINT) AS t
                 FROM documents GROUP BY source),
    w(source, w) AS (VALUES {vals}),
    tot AS (SELECT tok.source, tok.t, coalesce(w.w, 0) AS w
            FROM tok LEFT JOIN w USING (source)),
    f AS (SELECT *, t * 1000000.0 / w AS kappa
          FROM tot WHERE w > 0 AND t > 0),
    seg AS (SELECT *,
                   coalesce(sum(t) OVER (ORDER BY kappa, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumt_prev,
                   sum(w) OVER (ORDER BY kappa, source
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS wsuf,
                   coalesce(lag(kappa) OVER (ORDER BY kappa, source), 0.0)
                     AS kprev
            FROM f),
    lamr AS (SELECT min((12000.0 - cumt_prev) * 1000000.0 / wsuf) AS lam
             FROM seg
             WHERE (12000.0 - cumt_prev) * 1000000.0 / wsuf < kappa
               AND (12000.0 - cumt_prev) * 1000000.0 / wsuf >= kprev),
    rated AS (SELECT tot.source, tot.t, tot.w,
                     CASE WHEN tot.w > 0 AND tot.t > 0 THEN
                       CASE WHEN lamr.lam IS NULL THEN 1.0
                            ELSE least(1.0, round(lamr.lam * tot.w
                                       / 1000000.0 / tot.t, 6)) END
                     ELSE 0.0 END AS rate
              FROM tot, lamr)
    SELECT source, t AS tokens_total,
           round(w / 1000000.0, 6) AS weight, rate,
           CAST(round(rate * t) AS BIGINT) AS planned_tokens,
           rate = 1.0 AS saturated
    FROM rated
    """


@query("mixture_plan_documents", oracle=_mixture_oracle())
def mixture_plan_documents(spark, sf_dir) -> DataFrame:
    """Water-filling token-budget mixture plan over the 20 document
    sources (sample.mixture_waterfill_plan): src0/src1 are weighted 30%
    each but can only supply ~1.4k tokens, so at the 12k-token budget
    they SATURATE at rate 1 and their unmet share spills into the 18
    remaining sources — the correction naive proportional allocation
    misses (it would silently under-deliver the budget).  Integer ppm
    weights + exact long token totals make the segment search (bounded
    per-source frame) integer arithmetic; the oracle replays the
    identical windows and every per-source rate/planned-token row
    value-matches."""
    from .operators.sample import mixture_waterfill_plan

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")),
    )
    return mixture_waterfill_plan(
        docs, "source", "toks", _mixture_weights_ppm(), budget_tokens=12_000
    )


@query(
    "grouped_quantiles_events_value",
    oracle="""
    WITH per AS (SELECT event_type AS "group", value AS v, count(*) AS cnt
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    c AS (SELECT "group", v, cnt,
                 sum(cnt) OVER (PARTITION BY "group" ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT "group", sum(cnt) AS n FROM per GROUP BY 1),
    p AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS prob),
    r AS (SELECT t."group", p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r."group", r.prob, CAST(r.n AS BIGINT) AS n, r.rank,
           c.v AS value
    FROM r JOIN c ON r."group" = c."group"
                 AND r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def grouped_quantiles_events_value(spark, sf_dir) -> DataFrame:
    """Per-event-type EXACT p50/p95/p99 of value
    (stats.grouped_exact_quantiles) — the per-key latency-percentile
    shape, with NO single-partition exchange AT ALL: every stage of the
    bounded-prefix decomposition (distinct fold, bin prefix, within-bin
    cumulative, rank-interval probe) is keyed by the group, so the plan
    scales to any number of groups.  All 15 (group, prob) rows
    value-checked against DuckDB's per-group ordered replay."""
    from .operators.stats import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    return grouped_exact_quantiles(
        ev, "value", "event_type", [0.5, 0.95, 0.99],
        lo=0.0, hi=500.0, bins=1 << 10,
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
    from .sources.layout import compaction_plan

    return compaction_plan(spark, _footer_audit_dir(), 262144)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Generated, unrolled peeling replay (the pagerank-oracle pattern):
    round i keeps vertices with degree >= k over round i-1's surviving
    symmetric edge set.  ``rounds`` must be >= the Spark side's actual
    convergence depth — parity fails loudly if not, never silently."""
    # AS MATERIALIZED is load-bearing: round i references round i-1 three
    # times (the edge set and both endpoint filters), so default CTE
    # inlining expands 3^rounds copies of the corpus scan and DuckDB
    # falls over around 15 rounds; materialization keeps it linear
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e0 AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    a{i} AS MATERIALIZED (SELECT u FROM e{i-1} GROUP BY u
             HAVING count(*) >= {k}),
    e{i} AS MATERIALIZED (SELECT e.u, e.v FROM e{i-1} e
             JOIN a{i} p ON e.u = p.u JOIN a{i} q ON e.v = q.u)"""
        )
    parts.append(
        f"""
    SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY u HAVING count(*) >= {k}"""
    )
    return "".join(parts)


@query("kcore_spans_media", oracle=_kcore_oracle(3, 15))
def kcore_spans_media(spark, sf_dir) -> DataFrame:
    """3-core of the media co-occurrence graph (graph.kcore_members):
    iterative peeling to the greatest fixpoint — each round one keyed
    degree aggregate + semi-join filter over the shrinking edge list,
    localCheckpointed so the plan stays constant-size (the CC
    discipline); raises rather than returning a non-fixpoint.  The
    oracle is the peeling recurrence unrolled 15 rounds (generated, the
    pagerank-oracle pattern) — if Spark needed more rounds than the
    oracle replays, parity fails loudly.  Per-member in-core degrees
    value-checked."""
    from .operators.graph import kcore_members

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return kcore_members(edges, k=3)


@query(
    "weighted_quantiles_documents",
    oracle="""
    WITH base AS (
      SELECT CAST(n_chars AS DOUBLE) AS v,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS w
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL),
    per AS (SELECT v, sum(w) AS cnt FROM base WHERE w > 0 GROUP BY v),
    c AS (SELECT v, cnt,
                 sum(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    t AS (SELECT sum(cnt) AS n FROM per),
    p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS prob),
    r AS (SELECT p.prob, t.n,
                 CAST(greatest(ceil(p.prob * t.n - 1e-9), 1) AS BIGINT)
                   AS rank
          FROM p, t)
    SELECT r.prob, CAST(r.n AS BIGINT) AS n, r.rank, c.v AS value
    FROM r JOIN c ON r.rank <= c.cum AND r.rank > c.cum - c.cnt
    """,
)
def weighted_quantiles_documents(spark, sf_dir) -> DataFrame:
    """Token-mass-weighted length percentiles (stats.exact_quantiles with
    weight_col): "below what character length does a quarter / half /
    three-quarters / 90% of the corpus's TOKEN MASS sit" — the packing /
    truncation planning question row-count percentiles answer wrongly
    (long docs dominate mass).  n is the total integer token weight;
    identical bounded-prefix plan, only the summed quantity changes.
    All 4 rows value-checked vs the weighted ordered replay."""
    from .operators.stats import exact_quantiles

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")),
    )
    return exact_quantiles(
        docs, "n_chars", [0.25, 0.5, 0.75, 0.9],
        lo=0.0, hi=10000.0, bins=1 << 10, weight_col="toks",
    )


def _lpa_oracle(iterations: int) -> str:
    """Unrolled synchronous-LPA replay (MATERIALIZED — each round
    references the previous twice; the k-core lesson)."""
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    c{i} AS MATERIALIZED (SELECT e.v AS node, l.lbl, count(*) AS c
             FROM e JOIN l{i-1} l ON e.u = l.node GROUP BY 1, 2),
    l{i} AS MATERIALIZED (SELECT node, lbl FROM
             (SELECT node, lbl, row_number() OVER (PARTITION BY node
                     ORDER BY c DESC, lbl ASC) AS rn FROM c{i})
             WHERE rn = 1)"""
        )
    parts.append(f"""
    SELECT node, lbl AS label FROM l{iterations}""")
    return "".join(parts)


@query("communities_spans_media", oracle=_lpa_oracle(4))
def communities_spans_media(spark, sf_dir) -> DataFrame:
    """Fixed-iteration synchronous label propagation over the media
    co-occurrence graph (graph.label_propagation, 4 iterations):
    community labels for curation triage — which media cluster into one
    asset neighborhood.  Deterministic by construction (most-frequent
    neighbor label, ties to the SMALLEST — random-tie-break LPA is
    neither exact nor replayable) with fixed iterations as the contract
    (sync LPA can oscillate; a convergence loop would be wrong by
    design).  Per iteration one keyed join + count + per-node window
    argmax, labels localCheckpointed (the CC/k-core discipline); the
    oracle replays the recurrence unrolled with MATERIALIZED CTEs.
    Every node's label value-checked."""
    from .operators.graph import label_propagation

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return label_propagation(edges, iterations=4)


def _cdc_blocks() -> list:
    """32 deterministic 256-byte blocks (sha256 chain) — the synthetic
    'shared segments' dictionary for the CDC dedup query."""
    import hashlib

    blocks = []
    for j in range(32):
        out = b""
        seed = f"cdc-block-{j}".encode()
        while len(out) < 256:
            seed = hashlib.sha256(seed).digest()
            out += seed
        blocks.append(out[:256])
    return blocks


@query("media_chunk_dedup")  # pinned-snapshot oracle (oracle_constants.json)
def media_chunk_dedup(spark, sf_dir) -> DataFrame:
    """Content-defined chunking dedup over synthetic media payloads
    (operators/binchunk): each media asset's payload is 8 blocks drawn
    deterministically (md5 of (ref, position)) from a 32-block
    dictionary — the same segments recur across assets at DIFFERENT byte
    offsets, exactly the sharing whole-payload hashing misses and CDC's
    shift-invariant boundaries recover.  Payload synthesis is pure
    Catalyst (binary literals + md5 index — no Python); chunking is one
    mapInArrow pass; the report is a chunk-hash groupBy.  Deterministic
    end-to-end → pinned determinism-guarded oracle; shift-invariance and
    planted-duplicate semantics are pytest-pinned (test_round4o_ops)."""
    from .operators.binchunk import chunk_dedup_report, content_defined_chunks
    from .sources.tables import load_media_catalog

    blocks = _cdc_blocks()
    cat = load_media_catalog(spark, _spans_corpus(spark)).select("media_ref")
    arr = F.array(*[F.lit(b) for b in blocks])
    parts = [
        F.element_at(
            arr,
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("-", F.col("media_ref"), F.lit(str(i)))),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 32
                + 1
            ).cast("int"),
        )
        for i in range(8)
    ]
    payloads = cat.select(
        "media_ref", F.concat(*parts).alias("payload")
    )
    chunks = content_defined_chunks(
        payloads, "payload", "media_ref", avg_bits=7, min_len=48, max_len=512
    )
    return chunk_dedup_report(chunks)


@query(
    "path_profile_spans",
    oracle="""
    WITH t AS (SELECT doc_id, spans FROM read_parquet('__SPANS_GLOB__')),
    u AS (SELECT unnest(spans) AS s FROM t),
    base AS (
      SELECT 'doc_id' AS path, CAST(doc_id AS VARCHAR) AS value FROM t
      UNION ALL SELECT 'spans[].kind', s.kind FROM u
      UNION ALL SELECT 'spans[].text', s.text FROM u
      UNION ALL SELECT 'spans[].media_ref', s.media_ref FROM u
      UNION ALL SELECT 'spans[].offset', CAST(s.offset AS VARCHAR) FROM u
    ),
    agg AS (SELECT path, count(*) AS n,
                   count(*) - count(value) AS n_null,
                   count(DISTINCT value) AS n_distinct
            FROM base GROUP BY path),
    tk AS (SELECT path, value, c,
                  row_number() OVER (PARTITION BY path
                      ORDER BY c DESC, value ASC) AS rank
           FROM (SELECT path, value, count(*) AS c FROM base
                 WHERE value IS NOT NULL GROUP BY 1, 2))
    SELECT a.path, CAST(a.n AS BIGINT) AS n,
           CAST(a.n_null AS BIGINT) AS n_null,
           CAST(a.n_distinct AS BIGINT) AS n_distinct,
           CAST(tk.rank AS INT) AS rank, tk.value,
           CAST(tk.c AS BIGINT) AS value_count
    FROM agg a LEFT JOIN tk ON a.path = tk.path AND tk.rank <= 3
    """,
)
def path_profile_spans(spark, sf_dir) -> DataFrame:
    """Nested path profile of the spans corpus
    (stats.nested_path_profile): per leaf path — doc_id at row grain,
    kind/text/media_ref/offset at span-element grain — row count, NULL
    count, distinct count, and the top-3 values with counts (ties by
    value, exact).  The exploration surface that pairs with schema
    inference; leaves sharing a grain stack through ONE projection
    (F.stack), the element grain adds one explode, top-k is the keyed
    two-stage window.  All rows value-checked vs the DuckDB unnest
    replay."""
    from .operators.stats import nested_path_profile

    df = load_spans(spark, _spans_corpus(spark))
    return nested_path_profile(df, top_k=3)


@query("similarity_recall_report")  # pinned-snapshot oracle (deterministic)
def similarity_recall_report(spark, sf_dir) -> DataFrame:
    """Recall-vs-probes curve for the persisted IVF index
    (similarity.ivf_recall_report): mean and WORST-query recall@10 vs
    exact brute force at n_probe ∈ {1, 2, 4, 8, 16} — the tuning curve
    an ANN deployment actually reads, produced by the engine about its
    own index.  n_probe = 16 probes every cell, so its recall row must
    be exactly 1.0 (the self-check); deterministic end-to-end given the
    pinned index → pinned determinism-guarded oracle; the monotone-
    recall floor is pytest-asserted."""
    from pathlib import Path

    from .operators.similarity import build_ivf_index, ivf_recall_report

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 16)
    idx = (
        Path(__file__).resolve().parents[1]
        / ".cache"
        / f"ivf_{Path(sf_dir).name}_{_source_fingerprint(sf_dir, 'embeddings')}_c16_i2_s42"
    )
    if not (idx / "centroids.json").exists():
        build_ivf_index(emb, idx, n_cells=16, iters=2, seed=42)
    return ivf_recall_report(
        spark, idx, emb, queries_df, k=10, n_probes=(1, 2, 4, 8, 16)
    )


def _bfs_oracle(rounds: int) -> str:
    """Unrolled multi-source BFS level-set replay (MATERIALIZED — each
    level references the full visited set; the k-core lesson).  ``rounds``
    must be >= the true eccentricity from the seed set: a too-small unroll
    is missing the far rows and parity fails loudly on row count.  Extra
    rounds are harmless (empty levels)."""
    parts = [
        """
    WITH x AS MATERIALIZED (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS MATERIALIZED (SELECT DISTINCT l.m AS u, r.m AS v
           FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m <> r.m),
    l0 AS MATERIALIZED (SELECT DISTINCT m AS node FROM x ORDER BY m LIMIT 3),
    v0 AS MATERIALIZED (SELECT node, 0 AS dist FROM l0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    l{i} AS MATERIALIZED (SELECT DISTINCT e.v AS node
             FROM e JOIN l{i-1} p ON e.u = p.node
             WHERE e.v NOT IN (SELECT node FROM v{i-1})),
    v{i} AS MATERIALIZED (SELECT node, dist FROM v{i-1}
             UNION ALL SELECT node, {i} AS dist FROM l{i})"""
        )
    parts.append(
        f"""
    SELECT node, CAST(dist AS BIGINT) AS dist FROM v{rounds}"""
    )
    return "".join(parts)


@query("bfs_distances_spans_media", oracle=_bfs_oracle(16))
def bfs_distances_spans_media(spark, sf_dir) -> DataFrame:
    """Exact hop distances over the media co-occurrence graph from the
    three lexicographically-smallest media refs (graph.bfs_distances) —
    the blast-radius / provenance-proximity probe: how many co-occurrence
    hops every reference sits from a trusted seed set, in ONE multi-source
    traversal.  Frontier expansion is a keyed join + anti-join per round
    over localCheckpointed frontiers (the CC discipline), terminating on
    an empty frontier — bounded by eccentricity, not vertex count;
    unreachable media are absent by design.  The oracle replays the
    level-set recurrence unrolled 16 rounds with MATERIALIZED CTEs; a
    deeper-than-unrolled graph fails parity loudly on row count.  Every
    (node, dist) row value-checked."""
    from .operators.graph import bfs_distances

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    seeds = x.select(F.col("m").alias("node")).distinct().orderBy("node").limit(3)
    return bfs_distances(edges, seeds)


@query("msf_spans_media")  # pinned-snapshot oracle (oracle_constants.json)
def msf_spans_media(spark, sf_dir) -> DataFrame:
    """Maximum-similarity spanning forest of the media co-occurrence
    graph (graph.boruvka_msf with weight = −shared_doc_count): the
    minimal edge set keeping every media cluster connected through its
    STRONGEST co-occurrence links — the single-linkage dendrogram edges;
    thresholding it is single-linkage clustering without re-running the
    graph.  Distributed Borůvka: per round one per-component window min
    picks each component's best outgoing edge under the strict total
    order (weight, src, dst) — which makes the forest UNIQUE, Kruskal-
    parity-tested — then 2-cycle-broken pointer jumping contracts the
    merge trees; component count at least halves per round, so rounds ≤
    log2(V).  Deterministic output (partition-invariance pytest), hence
    the pinned snapshot; semantic correctness lives in the Kruskal
    parity tests (tests/test_round4r_ops.py)."""
    from .operators.graph import boruvka_msf

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .groupBy(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .agg((-F.count(F.lit(1))).cast("double").alias("weight"))
    )
    msf = boruvka_msf(edges)
    return msf.select(
        "src", "dst", (-F.col("weight")).cast("long").alias("shared_docs")
    )


@query(
    "acf_events_value",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest([1, 2, 3, 7]) AS lag),
    p AS (
      SELECT x.event_type, l.lag, x.vm AS xv, y.vm AS yv
      FROM cells x CROSS JOIN l
      JOIN cells y ON y.event_type IS NOT DISTINCT FROM x.event_type
                  AND y.b = x.b + l.lag * 86400000000
    ),
    m AS (
      SELECT event_type, lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(xv AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(yv AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(xv AS HUGEINT) * xv) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yv AS HUGEINT) * yv) AS DOUBLE) AS syy,
             CAST(sum(CAST(xv AS HUGEINT) * yv) AS DOUBLE) AS sxy
      FROM p GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                     / (sqrt(n_pairs * sxx - sx * sx)
                        * sqrt(n_pairs * syy - sy * sy)), 6)
           END AS acf
    FROM m
    """,
)
def acf_events_value(spark, sf_dir) -> DataFrame:
    """Per-event-type autocorrelation of the daily mean value at lags
    1/2/3/7 (temporal.autocorrelation) — the seasonality detector that
    FINDS the period the seasonal anomaly monitor assumes.  Cell values
    quantize to integer micro-units so all five moment sums are exact
    decimal aggregates (the ab_test_report determinism contract); the
    correlation derives from identical operands in identical expression
    order and is round-6 value-checked across engines.  One grid-sized
    lag self-join keyed by (type, lag); the corpus collapses to cells in
    a single map-side-partial pass."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.autocorrelation(
        ev, ["event_type"], "ts", "value", 86400, [1, 2, 3, 7]
    )


@query(
    "mahalanobis_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             l_quantity, l_extendedprice, l_discount,
             CAST(round(l_quantity * 1000000.0) AS BIGINT) AS q0,
             CAST(round(l_extendedprice * 1000000.0) AS BIGINT) AS q1,
             CAST(round(l_discount * 1000000.0) AS BIGINT) AS q2
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(q0 AS HUGEINT)) AS DOUBLE) AS s0,
             CAST(sum(CAST(q1 AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(q2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(sum(CAST(q0 AS HUGEINT) * q0) AS DOUBLE) AS s00,
             CAST(sum(CAST(q0 AS HUGEINT) * q1) AS DOUBLE) AS s01,
             CAST(sum(CAST(q0 AS HUGEINT) * q2) AS DOUBLE) AS s02,
             CAST(sum(CAST(q1 AS HUGEINT) * q1) AS DOUBLE) AS s11,
             CAST(sum(CAST(q1 AS HUGEINT) * q2) AS DOUBLE) AS s12,
             CAST(sum(CAST(q2 AS HUGEINT) * q2) AS DOUBLE) AS s22
      FROM src
    ),
    c AS (
      SELECT n, s0, s1, s2,
             (n * s00 - s0 * s0) / (n * (n - 1.0)) / 1e12 AS c11,
             (n * s01 - s0 * s1) / (n * (n - 1.0)) / 1e12 AS c12,
             (n * s02 - s0 * s2) / (n * (n - 1.0)) / 1e12 AS c13,
             (n * s11 - s1 * s1) / (n * (n - 1.0)) / 1e12 AS c22,
             (n * s12 - s1 * s2) / (n * (n - 1.0)) / 1e12 AS c23,
             (n * s22 - s2 * s2) / (n * (n - 1.0)) / 1e12 AS c33
      FROM m
    ),
    a AS (
      SELECT *,
             c11 * (c22 * c33 - c23 * c23)
               - c12 * (c12 * c33 - c13 * c23)
               + c13 * (c12 * c23 - c13 * c22) AS det,
             c22 * c33 - c23 * c23 AS a11,
             c11 * c33 - c13 * c13 AS a22,
             c11 * c22 - c12 * c12 AS a33,
             -(c12 * c33 - c13 * c23) AS a12,
             c12 * c23 - c13 * c22 AS a13,
             -(c11 * c23 - c12 * c13) AS a23
      FROM c
    ),
    scored AS (
      SELECT s.l_orderkey, s.l_linenumber,
             s.l_quantity, s.l_extendedprice, s.l_discount,
             round((a.a11 * z0 * z0 + a.a22 * z1 * z1 + a.a33 * z2 * z2
                    + 2.0 * (a.a12 * z0 * z1 + a.a13 * z0 * z2
                             + a.a23 * z1 * z2)) / a.det, 6) AS dist2
      FROM (
        SELECT src.*,
               src.q0 / 1000000.0 - a.s0 / a.n / 1000000.0 AS z0,
               src.q1 / 1000000.0 - a.s1 / a.n / 1000000.0 AS z1,
               src.q2 / 1000000.0 - a.s2 / a.n / 1000000.0 AS z2
        FROM src CROSS JOIN a
      ) s CROSS JOIN a
    )
    SELECT * FROM scored WHERE dist2 > 8.0
    """,
)
def mahalanobis_lineitem(spark, sf_dir) -> DataFrame:
    """Joint-distribution outliers over (l_quantity, l_extendedprice,
    l_discount) above dist² 8.0 — the empirical
    99.9th percentile on this data; uniform TPC-H marginals have bounded
    support, so the chi² tail never fires (stats.mahalanobis_outliers) — rows whose COMBINATION is
    off-manifold even when every per-column z-band passes (the case
    outlier_report structurally misses).  Closed-form adjugate inverse
    keeps the whole statistic one declarative expression; micro-unit
    quantization makes the moment sums exact decimals, so the round-6
    distance and the flagged row SET are bit-reproducible across engines
    (one moment scan + one scoring projection, no corpus shuffle).
    Every flagged row's distance value-checked."""
    from .operators.stats import mahalanobis_outliers

    li = load_table(spark, sf_dir, "lineitem")
    return mahalanobis_outliers(
        li,
        ["l_quantity", "l_extendedprice", "l_discount"],
        8.0,
        ["l_orderkey", "l_linenumber"],
    )


@query(
    "woe_iv_events",
    oracle="""
    WITH base AS (
      SELECT least(CAST(floor((value - 0.0) / 50.0) AS BIGINT), 9) AS bucket,
             (event_type = 'error') AS bad
      FROM events
      WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
        AND event_type IS NOT NULL
    ),
    counts AS (
      SELECT bucket,
             CAST(sum(CASE WHEN NOT bad THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      FROM base GROUP BY 1
    ),
    spine AS (SELECT unnest(range(10)) AS bucket),
    binned AS (
      SELECT s.bucket,
             coalesce(c.n_good, 0) AS n_good,
             coalesce(c.n_bad, 0) AS n_bad
      FROM spine s LEFT JOIN counts c USING (bucket)
    ),
    t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
                 CAST(sum(n_bad) AS BIGINT) AS tb
          FROM binned)
    SELECT b.bucket,
           0.0 + b.bucket * 50.0 AS bucket_lo,
           0.0 + (b.bucket + 1) * 50.0 AS bucket_hi,
           b.n_good, b.n_bad,
           CASE WHEN b.n_good > 0 AND b.n_bad > 0 AND t.tg > 0 AND t.tb > 0
                THEN round(ln((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE))
                             / (CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))), 6)
           END AS woe,
           CASE WHEN b.n_good > 0 AND b.n_bad > 0 AND t.tg > 0 AND t.tb > 0
                THEN round((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE)
                            - CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))
                           * ln((CAST(b.n_good AS DOUBLE) / CAST(t.tg AS DOUBLE))
                               / (CAST(b.n_bad AS DOUBLE) / CAST(t.tb AS DOUBLE))), 6)
           END AS iv_term
    FROM binned b CROSS JOIN t
    """,
)
def woe_iv_events(spark, sf_dir) -> DataFrame:
    """Weight-of-evidence / information-value profile of events.value
    against the error label (stats.woe_iv_profile, 10 equi-width bins
    over [0, 500]) — the pre-model predictive-power screen: per-bin WoE
    says which way a value band separates error from non-error traffic,
    the IV terms sum to the feature's ranking score.  Identical
    floor-binning to column_histogram, exact long counts, WoE/IV derived
    in identical expression order (NULL for one-sided bins — no invented
    smoothing observations); every bucket row value-checked including
    the empty-bucket spine rows."""
    from .operators.stats import woe_iv_profile

    ev = load_table(spark, sf_dir, "events")
    return woe_iv_profile(
        ev, "value", F.col("event_type") == "error", 0.0, 500.0, 10
    )


@query(
    "dim_truncation_embeddings",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 16),
    d AS (SELECT unnest([8, 16, 32, 64]) AS dim),
    scored AS (
      SELECT q.query_id, d.dim, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(
                   CAST(q.qv[1:d.dim] AS DOUBLE[]),
                   CAST(e.embedding[1:d.dim] AS DOUBLE[])), 6) AS cos_sim
      FROM q CROSS JOIN d JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id, dim
                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ),
    top AS (SELECT query_id, dim, neighbor_id FROM ranked WHERE rank <= 10),
    truth AS (SELECT query_id, neighbor_id FROM top WHERE dim = 64),
    hits AS (
      SELECT t.query_id, t.dim,
             sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS m
      FROM top t LEFT JOIN truth tr
        ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
      GROUP BY 1, 2
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           round(CAST(sum(m) AS DOUBLE) / 160.0, 6) AS mean_recall,
           round(CAST(min(m) AS DOUBLE) / 10.0, 6) AS worst_recall
    FROM hits GROUP BY 1
    """,
)
def dim_truncation_embeddings(spark, sf_dir) -> DataFrame:
    """Matryoshka dimensionality-ablation curve
    (similarity.dim_truncation_report): recall@10 of exact cosine top-k
    on the first 8/16/32 dims vs the 64-dim truth over 16 query vectors
    — what shrinking the index to half/quarter/eighth FLOPs and bytes
    costs in recall, measured by the engine itself.  One shared
    crossJoin scan for all cuts (query side exploded to slices and
    broadcast), (query, dim)-keyed ranking with the deterministic
    tie-break, zero-overlap cuts counted explicitly; the 64-dim row must
    come out exactly 1.0 (self-check).  All rows value-checked vs the
    DuckDB sliced list_cosine_similarity replay."""
    from .operators.similarity import dim_truncation_report

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries_df = emb.filter(F.col("vec_id") < 16)
    return dim_truncation_report(
        emb, queries_df, k=10, dims=[8, 16, 32], full_dim=64
    )


def _hits_edges_sql() -> str:
    return (
        "SELECT doc_id AS src, s.media_ref AS dst "
        "FROM (SELECT doc_id, unnest(spans) AS s "
        "FROM read_parquet('__SPANS_GLOB__')) WHERE s.media_ref IS NOT NULL"
    )


def _hits_oracle() -> str:
    from .operators.graph import hits_oracle_sql

    return hits_oracle_sql(_hits_edges_sql(), iterations=4)


@query("hits_spans_media", oracle=_hits_oracle())
def hits_spans_media(spark, sf_dir) -> DataFrame:
    """HITS hubs & authorities over the BIPARTITE doc → media graph
    (graph.hits, 4 fixed iterations) — the two curation orderings
    pagerank's co-occurrence projection collapses into one: hub score
    ranks documents aggregating many authoritative assets, authority
    score ranks media anchored by many strong hub documents.
    Exact-integer recurrence (decimal product · integer-division L1
    rescale replaces float normalization), so the oracle replays it
    verbatim — unrolled MATERIALIZED CTE chain generated from the SAME
    definition (graph.hits_oracle_sql).  Every (node, side) score
    value-checked; python-replay parity + partition invariance in
    tests/test_round4u_ops.py."""
    from .operators.graph import hits

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    edges = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select(
            F.col("doc_id").alias("src"), F.col("sp.media_ref").alias("dst")
        )
    )
    return hits(edges, iterations=4)


@query(
    "xcorr_events_value_volume",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS xm,
             CAST(count(value) * 1000000 AS BIGINT) AS ym
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest([-3, -1, 0, 1, 3]) AS lag),
    p AS (
      SELECT x.event_type, l.lag, x.xm AS xv, y.ym AS yv
      FROM cells x CROSS JOIN l
      JOIN cells y ON y.event_type = x.event_type
                  AND y.b = x.b + l.lag * 86400000000
      WHERE x.xm IS NOT NULL AND y.ym IS NOT NULL
    ),
    m AS (
      SELECT event_type, lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(xv AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(yv AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(xv AS HUGEINT) * xv) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yv AS HUGEINT) * yv) AS DOUBLE) AS syy,
             CAST(sum(CAST(xv AS HUGEINT) * yv) AS DOUBLE) AS sxy
      FROM p GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                     / (sqrt(n_pairs * sxx - sx * sx)
                        * sqrt(n_pairs * syy - sy * sy)), 6)
           END AS xcorr
    FROM m
    """,
)
def xcorr_events_value_volume(spark, sf_dir) -> DataFrame:
    """Per-event-type lead–lag cross-correlation between the daily mean
    value and the daily event VOLUME at lags −3/−1/0/+1/+3
    (temporal.cross_correlation, y_agg='count') — the causal-direction
    probe ACF can't answer: does the metric move before volume does, or
    after?  Same exact-decimal-moment determinism contract as
    acf_events_value, with the count side exact by construction; every
    (type, lag) row value-checked."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.cross_correlation(
        ev,
        ["event_type"],
        "ts",
        "value",
        "value",
        86400,
        [-3, -1, 0, 1, 3],
        x_agg="avg",
        y_agg="count",
    )


@query(
    "seasonal_decompose_events",
    oracle="""
    WITH src AS (
      SELECT event_type, epoch_us(ts) AS us, value FROM events
      WHERE ts IS NOT NULL
    ),
    cells AS (
      SELECT event_type, us - us % 86400000000 AS b,
             round(avg(value), 6) AS val
      FROM src GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(b) AS mn, max(b) AS mx FROM cells GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(mn, mx, 86400000000)) AS b
      FROM spans
    ),
    grid AS (
      SELECT s.event_type, s.b,
             last_value(c.val IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
      FROM spine s LEFT JOIN cells c
        ON c.event_type = s.event_type AND c.b = s.b
    ),
    q AS (
      SELECT event_type, b,
             CAST(round(val * 1000000) AS BIGINT) AS vm
      FROM grid
    ),
    w AS (
      SELECT event_type, b, vm,
             sum(vm) OVER win AS wsum,
             count(vm) OVER win AS wcnt,
             min(b) OVER (PARTITION BY event_type) AS mnb
      FROM q
      WINDOW win AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    t AS (
      SELECT event_type, b, vm,
             ((b - mnb) // 86400000000) % 7 AS pos,
             CASE WHEN wcnt = 7 AND vm IS NOT NULL
                  THEN CAST(round(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT)
             END AS tm
      FROM w
    ),
    d AS (SELECT *, vm - tm AS dm FROM t),
    pt AS (
      SELECT event_type, pos, sum(dm) AS s, count(*) AS c
      FROM d WHERE dm IS NOT NULL GROUP BY 1, 2
    ),
    tt AS (
      SELECT event_type, sum(s) AS st, sum(c) AS ct FROM pt GROUP BY 1
    ),
    sa AS (
      SELECT pt.event_type, pt.pos,
             CAST(round(CAST(pt.s AS DOUBLE) / CAST(pt.c AS DOUBLE)
                        - CAST(tt.st AS DOUBLE) / CAST(tt.ct AS DOUBLE))
                  AS BIGINT) AS sm
      FROM pt JOIN tt ON pt.event_type = tt.event_type
    )
    SELECT d.event_type, d.b AS bucket_us,
           round(d.vm / 1000000.0, 6) AS value,
           round(d.tm / 1000000.0, 6) AS trend,
           CASE WHEN d.tm IS NOT NULL
                THEN round(sa.sm / 1000000.0, 6) END AS seasonal,
           CASE WHEN d.tm IS NOT NULL
                THEN round((d.vm - d.tm - sa.sm) / 1000000.0, 6)
           END AS residual
    FROM d LEFT JOIN sa
      ON sa.event_type = d.event_type AND sa.pos = d.pos
    """,
)
def seasonal_decompose_events(spark, sf_dir) -> DataFrame:
    """Classical additive decomposition of the per-type daily mean value
    at period 7 (temporal.seasonal_decompose) — the fit stage between
    "ACF found weekly seasonality" and "alert on the residual": value =
    centered-MA trend + weighted-centered weekly seasonal + residual,
    every step exact-integer until the final round-6 division, trend
    NULL where the 7-bucket window is incomplete (never a partial
    average).  Every grid row's four components value-checked against
    the windowed-SQL replay."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.seasonal_decompose(
        ev, ["event_type"], "ts", "value", 86400, 7
    )


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
    from .operators.text import ngram_overlap_metrics

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
    from .operators.text import readability_features

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
    from .operators.text import script_profile

    docs = load_table(spark, sf_dir, "documents")
    return script_profile(docs, "text", "doc_id")


@query(
    "dp_release_events",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    u AS (
      SELECT event_type, n,
             (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'dp-42',
                    event_type)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
               / 4294967296.0 AS uu
      FROM c
    )
    SELECT event_type,
           n + CAST(round(CASE WHEN uu < 0.5
                               THEN 2.0 * ln(2.0 * uu)
                               ELSE -(2.0) * ln(2.0 * (1.0 - uu))
                          END) AS BIGINT) AS n_released,
           CAST(0.5 AS DOUBLE) AS epsilon
    FROM u
    """,
)
def dp_release_events(spark, sf_dir) -> DataFrame:
    """ε-DP release of the per-type event histogram at ε = 0.5
    (stats.dp_noisy_counts, seed 42) — the governance endpoint that
    completes the k-anon/l-div/t-closeness toolkit: disjoint categories
    give the count vector L1 sensitivity 1, so per-cell Laplace(1/ε)
    noise yields ε-DP for the whole histogram.  The noise is SEEDED
    (md5-prefix uniform through the exact Laplace inverse CDF), which
    makes the release deterministic and engine-replayable — treat the
    seed like a key; with it public this is reproducibility, not
    privacy (documented trade).  All 5 released rows value-checked
    against the bit-identical DuckDB replay."""
    from .operators.stats import dp_noisy_counts

    ev = load_table(spark, sf_dir, "events")
    return dp_noisy_counts(ev, "event_type", epsilon=0.5, seed=42)


@query(
    "theil_sen_events",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(value), 6) * 1000000) AS BIGINT) AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type,
             CAST((b - min(b) OVER (PARTITION BY event_type))
                  // 86400000000 AS BIGINT) AS x,
             y
      FROM cells
    ),
    p AS (
      SELECT a.event_type, a.x AS x1, bb.x AS x2,
             round((bb.y - a.y) / 1000000.0 / (bb.x - a.x), 6) AS s
      FROM x a JOIN x bb
        ON bb.event_type = a.event_type AND a.x < bb.x
    ),
    np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
           FROM p GROUP BY 1),
    rs AS (SELECT p.*, row_number() OVER (PARTITION BY p.event_type
                     ORDER BY s, x1, x2) AS rn FROM p),
    ms AS (
      SELECT rs.event_type, np.n_pairs, rs.s AS slope
      FROM rs JOIN np ON np.event_type = rs.event_type
      WHERE rs.rn = CAST(ceil(CAST(np.n_pairs AS DOUBLE) / 2.0 - 1e-9)
                         AS BIGINT)
    ),
    nc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
           FROM x GROUP BY 1),
    r AS (
      SELECT x.event_type, ms.n_pairs, ms.slope,
             round(x.y / 1000000.0 - ms.slope * x.x, 6) AS res,
             row_number() OVER (PARTITION BY x.event_type
               ORDER BY round(x.y / 1000000.0 - ms.slope * x.x, 6), x.x)
               AS rn
      FROM x JOIN ms ON ms.event_type = x.event_type
    )
    SELECT r.event_type, nc.n_points, r.n_pairs, r.slope,
           r.res AS intercept
    FROM r JOIN nc ON nc.event_type = r.event_type
    WHERE r.rn = CAST(ceil(CAST(nc.n_points AS DOUBLE) / 2.0 - 1e-9)
                      AS BIGINT)
    """,
)
def theil_sen_events(spark, sf_dir) -> DataFrame:
    """Theil–Sen robust trend of the per-type daily mean value
    (temporal.theil_sen): slope = median pairwise slope, intercept =
    median residual — the drift estimate a level shift or outlier burst
    cannot drag (~29% contamination tolerance; the robust companion to
    the seasonal-decompose MA trend).  Round-6 slopes from exact
    integer differences, medians as the engine's type-1 rank statistic
    under a pinned total order; pairwise work is quadratic in the GRID,
    never the corpus.  All 5 per-type rows value-checked vs the
    ordered-rank DuckDB replay."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.theil_sen(ev, ["event_type"], "ts", "value", 86400)


@query(
    "scale_mismatch_events",
    oracle="""
    WITH src AS (
      SELECT event_type AS grp,
             CASE WHEN event_type = 'error' THEN value * 1000.0
                  ELSE value END AS v
      FROM events
    ),
    mags AS (
      SELECT grp, round(log10(abs(v)), 6) AS m
      FROM src WHERE grp IS NOT NULL AND v IS NOT NULL AND v <> 0
    ),
    cnt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM mags GROUP BY 1),
    rk AS (SELECT mags.*, row_number() OVER (PARTITION BY grp ORDER BY m)
                  AS rn FROM mags),
    med AS (
      SELECT rk.grp, rk.m AS median_mag
      FROM rk JOIN cnt ON cnt.grp = rk.grp
      WHERE rk.rn = CAST(ceil(CAST(cnt.n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    p AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             a.median_mag AS median_mag_a, b.median_mag AS median_mag_b,
             CAST(round(b.median_mag - a.median_mag) AS BIGINT)
               AS decade_offset
      FROM med a JOIN med b ON a.grp < b.grp
    )
    SELECT group_a, group_b, median_mag_a, median_mag_b, decade_offset,
           (abs(decade_offset) >= 1
            AND abs((median_mag_b - median_mag_a)
                    - CAST(decade_offset AS DOUBLE)) <= 0.2) AS flagged
    FROM p
    """,
)
def scale_mismatch_events(spark, sf_dir) -> DataFrame:
    """Unit-scale mismatch detection across event types
    (stats.scale_mismatch_report) with a PLANTED cents-vs-dollars-style
    bug: the query scales 'error' values ×1000 before profiling, and the
    operator must flag exactly the error-vs-peer pairs as clean 3-decade
    shifts while the organic pairs stay offset 0 — the bug every schema
    and range check passes, betrayed only by the per-source median order
    of magnitude.  Type-1 rank medians of round-6 log10 magnitudes
    (exactly replayable), pairs over the bounded group table.  All 10
    pair rows value-checked."""
    from .operators.stats import scale_mismatch_report

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.col("value") * 1000.0).otherwise(
            F.col("value")
        ),
    )
    return scale_mismatch_report(ev, "event_type", "v")


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
    from .operators.stats import relationship_profile

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
    from .operators.stats import apply_imputer, fit_imputer

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
    "robust_z_events",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 997 = 0 THEN value * 50.0
                  ELSE value END AS v
      FROM events
    ),
    base AS (
      SELECT event_id, event_type, v, round(v, 6) AS rv FROM src
      WHERE v IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS (
      SELECT event_type, rv AS m FROM (
        SELECT event_type, rv,
               row_number() OVER (PARTITION BY event_type ORDER BY rv) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    dev AS (
      SELECT b.event_id, b.event_type, b.v, b.rv, med.m,
             round(abs(b.rv - med.m), 6) AS d
      FROM base b JOIN med ON med.event_type = b.event_type
    ),
    mad AS (
      SELECT event_type, d AS mad FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    scored AS (
      SELECT dev.event_id, dev.event_type, dev.v,
             CASE WHEN mad.mad > 0
                  THEN round(0.6745 * (dev.rv - dev.m) / mad.mad, 6)
             END AS robust_z
      FROM dev JOIN mad ON mad.event_type = dev.event_type
    )
    SELECT * FROM scored WHERE abs(robust_z) > 3.5
    """,
)
def robust_z_events(spark, sf_dir) -> DataFrame:
    """MAD robust z-score outliers per event type at the canonical
    Iglewicz–Hoaglin 3.5 cut (stats.robust_z_outliers) over a PLANTED
    contamination (every 997th event's value ×50, identical in both
    engines) — the detector that defeats MASKING: the classical
    mean/std score lets wild values inflate the std enough to hide
    themselves (pytest-demonstrated); median and MAD barely move.
    Both statistics are exact type-1 rank picks on round-6 values;
    every flagged row's score value-checked."""
    from .operators.stats import robust_z_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 997 == 0, F.col("value") * 50.0)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return robust_z_outliers(ev, "v", "event_type", ["event_id"], 3.5)


@query(
    "dedup_pair_overlap_documents",
    oracle="""
    WITH s AS (SELECT doc_id,
                      list_distinct(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS tk
               FROM documents WHERE text IS NOT NULL),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.tk, b.tk)) AS i,
                  len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
           FROM s a JOIN s b ON a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b FROM pr
              WHERE u > 0 AND i * 1.0 / u >= 0.95),
    pt AS (SELECT p.id_a, p.id_b, da.text AS cand, db.text AS ref
           FROM pairs p
           JOIN documents da ON da.doc_id = p.id_a
           JOIN documents db ON db.doc_id = p.id_b),
    nn AS (SELECT unnest([1, 2]) AS n),
    ct AS (SELECT id_a, id_b, nn.n AS n,
                  list_filter(string_split(cand, ' '), x -> x <> '') AS toks
           FROM pt CROSS JOIN nn),
    rt AS (SELECT id_a, id_b, nn.n AS n,
                  list_filter(string_split(ref, ' '), x -> x <> '') AS toks
           FROM pt CROSS JOIN nn),
    cg AS (SELECT id_a, id_b, n,
                  unnest(list_transform(generate_series(1, len(toks) - n + 1),
                         i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
           FROM ct WHERE len(toks) >= n),
    rg AS (SELECT id_a, id_b, n,
                  unnest(list_transform(generate_series(1, len(toks) - n + 1),
                         i -> array_to_string(toks[i:i+n-1], ' '))) AS gram
           FROM rt WHERE len(toks) >= n),
    cc AS (SELECT id_a, id_b, n, gram, count(*) AS c FROM cg GROUP BY 1,2,3,4),
    rc AS (SELECT id_a, id_b, n, gram, count(*) AS c FROM rg GROUP BY 1,2,3,4),
    j AS (SELECT coalesce(cc.id_a, rc.id_a) AS id_a,
                 coalesce(cc.id_b, rc.id_b) AS id_b,
                 coalesce(cc.n, rc.n) AS n,
                 coalesce(cc.c, 0) AS ccnt, coalesce(rc.c, 0) AS rcnt
          FROM cc FULL OUTER JOIN rc
            ON cc.id_a = rc.id_a AND cc.id_b = rc.id_b
           AND cc.n = rc.n AND cc.gram = rc.gram),
    per AS (SELECT id_a, id_b, n,
                   CAST(sum(ccnt) AS BIGINT) AS cand_ngrams,
                   CAST(sum(rcnt) AS BIGINT) AS ref_ngrams,
                   CAST(sum(least(ccnt, rcnt)) AS BIGINT) AS overlap
            FROM j GROUP BY 1, 2, 3),
    spine AS (SELECT p.id_a, p.id_b, nn.n FROM pairs p CROSS JOIN nn),
    f AS (SELECT s.id_a, s.id_b, CAST(s.n AS BIGINT) AS n,
                 coalesce(per.cand_ngrams, 0) AS cand_ngrams,
                 coalesce(per.ref_ngrams, 0) AS ref_ngrams,
                 coalesce(per.overlap, 0) AS overlap
          FROM spine s LEFT JOIN per
            ON per.id_a = s.id_a AND per.id_b = s.id_b AND per.n = s.n)
    SELECT id_a, id_b, n, cand_ngrams, ref_ngrams, overlap,
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
def dedup_pair_overlap_documents(spark, sf_dir) -> DataFrame:
    """Near-duplicate pair EXPLANATIONS — two engine operators composed
    end-to-end: the exact prefix-filtered Jaccard join finds the t=0.95
    pairs (dedup.jaccard_prefix_join — the lossless candidate set), then
    text.ngram_overlap_metrics reports per-pair clipped unigram/bigram
    precision/recall/F1 — WHAT the flagged pairs actually share, the
    review surface a dedup decision audit needs (a pair at Jaccard 0.95
    with bigram F1 0.3 is shuffled boilerplate, not a true near-copy).
    The oracle replays both stages (quadratic join + list-slicing
    overlap); every one of the ~3.8k rows value-checked."""
    from .operators.dedup import jaccard_prefix_join
    from .operators.text import ngram_overlap_metrics

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95).select(
        "id_a", "id_b"
    )
    texts = docs.select("doc_id", "text")
    pt = (
        pairs.join(texts.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("text", "cand")
        .join(
            texts.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "text", "ref"
            ),
            "id_b",
        )
    )
    return ngram_overlap_metrics(pt, ["id_a", "id_b"], "cand", "ref", n_max=2)


@query(
    "gini_documents_tokens",
    oracle="""
    WITH s AS (
      SELECT CAST(round(CAST(len(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM documents WHERE text IS NOT NULL
    ),
    o AS (SELECT vm, row_number() OVER (ORDER BY vm) AS i FROM s),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(sum(2 * CAST(i AS HUGEINT) * vm) AS DOUBLE) AS t2
      FROM o
    )
    SELECT n, round(sv / 1000000.0, 6) AS sum_value,
           CASE WHEN sv > 0
                THEN round((t2 - (CAST(n AS DOUBLE) + 1.0) * sv)
                           / (CAST(n AS DOUBLE) * sv), 6)
           END AS gini
    FROM agg
    """,
)
def gini_documents_tokens(spark, sf_dir) -> DataFrame:
    """Exact Gini concentration of the corpus's TOKEN MASS across
    documents (stats.gini_coefficient) — "is the corpus a handful of
    giant documents or an even spread", the diagnostic the mixture
    planner and dedup budget read.  NO global sort anywhere: each
    distinct token count's exact global rank interval comes from the
    bounded-prefix decomposition, and Σ rank·value folds through the
    closed form (b(b+1) − a(a+1))/2 per tie-run — tie order provably
    irrelevant, everything decimal-exact until one round-6 division.
    The oracle is the ordered replay; (n, mass, gini) value-checked."""
    from .operators.stats import gini_coefficient
    from .operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        token_count("text").cast("double").alias("v")
    )
    return gini_coefficient(docs, "v", 0.0, 4096.0, bins=1 << 10)


@query(
    "spearman_lineitem",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS a, l_extendedprice AS b, l_discount AS c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    r AS (
      SELECT
        2 * (rank() OVER (ORDER BY a)) + (count(*) OVER (PARTITION BY a)) - 1 AS ra,
        2 * (rank() OVER (ORDER BY b)) + (count(*) OVER (PARTITION BY b)) - 1 AS rb,
        2 * (rank() OVER (ORDER BY c)) + (count(*) OVER (PARTITION BY c)) - 1 AS rc
      FROM base
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(ra AS HUGEINT)) AS DOUBLE) AS sa,
             CAST(sum(CAST(rb AS HUGEINT)) AS DOUBLE) AS sb,
             CAST(sum(CAST(rc AS HUGEINT)) AS DOUBLE) AS sc,
             CAST(sum(CAST(ra AS HUGEINT) * ra) AS DOUBLE) AS qa,
             CAST(sum(CAST(rb AS HUGEINT) * rb) AS DOUBLE) AS qb,
             CAST(sum(CAST(rc AS HUGEINT) * rc) AS DOUBLE) AS qc,
             CAST(sum(CAST(ra AS HUGEINT) * rb) AS DOUBLE) AS pab,
             CAST(sum(CAST(ra AS HUGEINT) * rc) AS DOUBLE) AS pac,
             CAST(sum(CAST(rb AS HUGEINT) * rc) AS DOUBLE) AS pbc
      FROM r
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
           CASE WHEN n >= 2 AND n * qa - sa * sa > 0 AND n * qb - sb * sb > 0
                THEN round((n * pab - sa * sb)
                     / (sqrt(n * qa - sa * sa) * sqrt(n * qb - sb * sb)), 6)
           END AS spearman
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount', n,
           CASE WHEN n >= 2 AND n * qa - sa * sa > 0 AND n * qc - sc * sc > 0
                THEN round((n * pac - sa * sc)
                     / (sqrt(n * qa - sa * sa) * sqrt(n * qc - sc * sc)), 6)
           END
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', n,
           CASE WHEN n >= 2 AND n * qb - sb * sb > 0 AND n * qc - sc * sc > 0
                THEN round((n * pbc - sb * sc)
                     / (sqrt(n * qb - sb * sb) * sqrt(n * qc - sc * sc)), 6)
           END
    FROM m
    """,
)
def spearman_lineitem(spark, sf_dir) -> DataFrame:
    """All-pairs Spearman rank correlation over (l_quantity,
    l_extendedprice, l_discount) (stats.spearman_pairs) — the monotone
    association the Pearson panel misses under heavy tails (one wild row
    drags Pearson, moves a rank by one; pytest-demonstrated).  Listwise
    sample, exact integer doubled-tie-ranks from the same bounded-prefix
    machinery as exact_quantiles (no corpus sort, no distinct-value
    single-partition window), decimal moments, ONE final aggregate for
    all three pairs.  Value-checked against DuckDB's rank-window
    replay."""
    from .operators.stats import spearman_pairs

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("l_quantity"),
        F.col("l_extendedprice").alias("l_extendedprice"),
        F.col("l_discount").alias("l_discount"),
    )
    return spearman_pairs(
        li,
        ["l_quantity", "l_extendedprice", "l_discount"],
        0.0,
        120000.0,
        bins=1 << 10,
    )


@query(
    "gini_by_source_documents",
    oracle="""
    WITH s AS (
      SELECT source AS g,
             CAST(round(CAST(len(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS DOUBLE) * 1000000) AS BIGINT) AS vm
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    o AS (SELECT g, vm,
                 row_number() OVER (PARTITION BY g ORDER BY vm) AS i
          FROM s),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS sv,
             CAST(sum(2 * CAST(i AS HUGEINT) * vm) AS DOUBLE) AS t2
      FROM o GROUP BY 1
    )
    SELECT g AS source, n, round(sv / 1000000.0, 6) AS sum_value,
           CASE WHEN sv > 0
                THEN round((t2 - (CAST(n AS DOUBLE) + 1.0) * sv)
                           / (CAST(n AS DOUBLE) * sv), 6)
           END AS gini
    FROM agg
    """,
)
def gini_by_source_documents(spark, sf_dir) -> DataFrame:
    """Per-source token-mass concentration (stats.grouped_gini) — "which
    SOURCE is a monoculture": the corpus-mixture diagnostic keyed by
    source, with the grouped_quantiles discipline applied to the Gini
    rank decomposition — every stage keys by the group, so the plan has
    ZERO single-partition exchanges (pytest-pinned) and scales to any
    source count.  All per-source rows value-checked vs the per-group
    ordered replay."""
    from .operators.stats import grouped_gini
    from .operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").cast("double").alias("v")
    )
    return grouped_gini(docs, "v", "source", 0.0, 4096.0, bins=1 << 10)


@query(
    "skyline_lineitem",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DOUBLE) AS x,
             CAST(l_quantity AS DOUBLE) AS y
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    mx AS (SELECT x, max(y) AS my FROM t GROUP BY x),
    s AS (SELECT x, my,
                 max(my) OVER (ORDER BY x DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
          FROM mx),
    front AS (SELECT x, my FROM s WHERE m IS NULL OR my > m)
    SELECT t.l_orderkey, t.l_linenumber,
           t.x AS l_extendedprice, t.y AS l_quantity
    FROM t JOIN front f ON t.x = f.x AND t.y = f.my
    """,
)
def skyline_lineitem(spark, sf_dir) -> DataFrame:
    """2-D Pareto front of (l_extendedprice, l_quantity), both maximized
    (stats.skyline2d) — the rows no other line item beats in both price
    and quantity: the multi-objective selection a single-score top-k
    structurally misses.  No global sort: the exclusive cross-x suffix
    max runs the bounded-prefix decomposition in REVERSE (per-bin maxima
    suffix-folded over the ≤ bins-row bin table, keyed within-bin
    windows); only comparisons touch values, so parity is exact with no
    quantization.  Every front row value-checked vs the windowed
    staircase replay."""
    from .operators.stats import skyline2d

    li = load_table(spark, sf_dir, "lineitem")
    return skyline2d(
        li,
        "l_extendedprice",
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
        0.0,
        120000.0,
        bins=1 << 10,
    )


@query(
    "wasserstein_events_value",
    oracle="""
    WITH a AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
               FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT vm, 0, 1 FROM b),
    per AS (SELECT vm, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY vm),
    c AS (SELECT vm,
                 sum(na) OVER w AS cum_a,
                 sum(nb) OVER w AS cum_b,
                 lead(vm) OVER (ORDER BY vm) AS nxt
          FROM per
          WINDOW w AS (ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT (SELECT count(*) FROM a) AS ta,
                 (SELECT count(*) FROM b) AS tb),
    d AS (SELECT abs(CAST(cum_a AS HUGEINT) * tb
                     - CAST(cum_b AS HUGEINT) * ta) * (nxt - vm) AS term
          FROM c, t WHERE nxt IS NOT NULL)
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           round(CAST((SELECT sum(term) FROM d) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))
                 / 1000000.0, 6) AS w1
    FROM t
    """,
)
def wasserstein_events_value(spark, sf_dir) -> DataFrame:
    """Exact 1-Wasserstein distance between the click and purchase value
    distributions (drift.wasserstein_drift) — the drift number in the
    METRIC'S OWN UNITS ("the distribution moved N value-units"), where
    KS answers in probability mass and PSI in bits; a pure shift of δ
    reads exactly δ (pytest-pinned).  The area between the CDF
    staircases folds as exact integer Σ |cum_a·n_b − cum_b·n_a|·gap in
    decimal, divided once — bit-identical to the ordered replay, with
    the ks_drift bin/value prefix decomposition plus a bounded bin-table
    lead for the successor gap (no corpus sort).  Value-checked."""
    from .operators.drift import wasserstein_drift

    ev = load_table(spark, sf_dir, "events")
    return wasserstein_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        lo=0.0,
        hi=500.0,
        bins=1 << 10,
    )


@query(
    "logrank_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn_last,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) ASC, event_id ASC)
               AS rn_first
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t,
             max(CASE WHEN rn_last = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs,
             CASE WHEN max(CASE WHEN rn_first = 1 AND event_type = 'error'
                                THEN 1 ELSE 0 END) = 1
                  THEN 'error_start' ELSE 'clean_start' END AS g
      FROM ranked GROUP BY user_id),
    cells AS (
      SELECT t,
             CAST(sum(CASE WHEN g = 'clean_start' AND obs THEN 1 ELSE 0 END) AS BIGINT) AS da,
             CAST(sum(CASE WHEN g = 'error_start' AND obs THEN 1 ELSE 0 END) AS BIGINT) AS db,
             CAST(sum(CASE WHEN g = 'clean_start' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g = 'error_start' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM per GROUP BY 1),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM cells),
    risk AS (
      SELECT c.*, tot.na, tot.nb,
             tot.na - coalesce(sum(ca) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ra,
             tot.nb - coalesce(sum(cb) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb
      FROM cells c, tot),
    ev AS (SELECT * FROM risk WHERE da + db > 0),
    terms AS (
      SELECT t, na, nb, da, db,
             CAST(ra AS DOUBLE) * CAST(da + db AS DOUBLE)
               / CAST(ra + rb AS DOUBLE) AS et,
             CASE WHEN ra + rb > 1 THEN
               CAST(da + db AS DOUBLE)
               * (CAST(ra AS DOUBLE) / CAST(ra + rb AS DOUBLE))
               * (1.0 - CAST(ra AS DOUBLE) / CAST(ra + rb AS DOUBLE))
               * ((CAST(ra + rb AS DOUBLE) - CAST(da + db AS DOUBLE))
                  / (CAST(ra + rb AS DOUBLE) - 1.0))
             ELSE 0.0 END AS vt
      FROM ev),
    cum AS (
      SELECT t, na, nb,
             sum(da) OVER w AS oa, sum(db) OVER w AS ob,
             sum(et) OVER w AS ea, sum(vt) OVER w AS v,
             row_number() OVER (ORDER BY t DESC) AS rn
      FROM terms
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT 'clean_start' AS group_a, 'error_start' AS group_b,
           na AS n_a, nb AS n_b,
           CAST(oa AS BIGINT) AS o_a, round(ea, 6) AS e_a,
           CAST(ob AS BIGINT) AS o_b,
           round(CAST(oa AS DOUBLE) + CAST(ob AS DOUBLE) - ea, 6) AS e_b,
           CASE WHEN v > 0 THEN
             round((CAST(oa AS DOUBLE) - ea) * (CAST(oa AS DOUBLE) - ea) / v, 6)
           END AS chi2,
           coalesce(CASE WHEN v > 0 THEN
             (CAST(oa AS DOUBLE) - ea) * (CAST(oa AS DOUBLE) - ea) / v
               > 3.841459 END, false) AS significant
    FROM cum WHERE rn = 1
    """,
)
def logrank_users_events(spark, sf_dir) -> DataFrame:
    """Two-group log-rank test (temporal.survival_logrank) between users
    whose FIRST event is an error ('error_start') and the rest
    ('clean_start'), on the same per-user lifetimes as the Kaplan–Meier
    query (hour-floor durations, final-event-error observed flag) — the
    hypothesis test that says whether the two churn curves actually
    differ.  Exact integer risk sets from prefix windows over the
    bounded duration table; E/V accumulate through ORDERED cumulative
    windows so the double fold is bit-identical across engines (the
    survival_curve discipline).  The single output row value-checked
    field by field."""
    from .operators.temporal import survival_logrank

    ev = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("t"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("obs"),
            F.min(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("_first_err"),
        )
        .select(
            "t",
            "obs",
            F.when(F.col("_first_err"), F.lit("error_start"))
            .otherwise(F.lit("clean_start"))
            .alias("grp"),
        )
    )
    return survival_logrank(per, "t", "obs", "grp")


@query("isotonic_calibration_events")  # pinned-snapshot oracle
def isotonic_calibration_events(spark, sf_dir) -> DataFrame:
    """Isotonic calibration of P(error | value) by pool-adjacent-
    violators (modeleval.fit_isotonic): the best monotone map from the
    value score to the error probability — no bin grid to choose, the
    standard post-hoc calibrator where calibration_table only
    diagnoses.  One corpus pass folds exact (n, Σlabel) per round-6
    distinct score; PAV runs driver-side on the bounded distinct-score
    table with CROSS-MULTIPLIED integer mean comparisons, so the block
    table is exact and deterministic (double-run-guarded pin); block
    monotonicity and brute-PAV parity live in
    tests/test_round4ae_ops.py."""
    from .operators.modeleval import fit_isotonic

    ev = load_table(spark, sf_dir, "events")
    return fit_isotonic(
        ev.select(
            F.col("value").alias("score"),
            (F.col("event_type") == "error").alias("label"),
        ),
        "score",
        "label",
    )


@query(
    "bootstrap_mean_events",
    oracle="""
    WITH base AS (
      SELECT event_id AS id,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    reps AS (SELECT unnest(range(16)) AS r),
    drawn AS (
      SELECT r,
             (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'boot-42',
                    CAST(r AS VARCHAR), CAST(id AS VARCHAR))), 1, 8)
                   AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u,
             vm
      FROM base CROSS JOIN reps
    ),
    weighted AS (
      SELECT r,
             CASE WHEN u < 0.367879441 THEN 0
                  WHEN u < 0.735758882 THEN 1
                  WHEN u < 0.919698603 THEN 2
                  WHEN u < 0.980988305 THEN 3
                  WHEN u < 0.996323929 THEN 4
                  WHEN u < 0.999405870 THEN 5
                  WHEN u < 0.999917320 THEN 6
                  WHEN u < 0.999990409 THEN 7
                  ELSE 8 END AS w,
             vm
      FROM drawn
    ),
    rm AS (
      SELECT r,
             round(CAST(sum(CAST(w AS HUGEINT) * vm) AS DOUBLE)
                   / CAST(sum(w) AS DOUBLE) / 1000000.0, 6) AS m
      FROM weighted GROUP BY r HAVING sum(w) > 0
    ),
    nr AS (SELECT CAST(count(*) AS BIGINT) AS c FROM rm),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM rm),
    o AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mean
      FROM base
    )
    SELECT o.n, o.mean,
           (SELECT m FROM ranked, nr
            WHERE rn = greatest(CAST(ceil(0.025 * CAST(nr.c AS DOUBLE)
                                          - 1e-9) AS BIGINT), 1)) AS ci_lo,
           (SELECT m FROM ranked, nr
            WHERE rn = greatest(CAST(ceil(0.975 * CAST(nr.c AS DOUBLE)
                                          - 1e-9) AS BIGINT), 1)) AS ci_hi,
           CAST(16 AS BIGINT) AS replicates,
           CAST(0.05 AS DOUBLE) AS alpha
    FROM o
    """,
)
def bootstrap_mean_events(spark, sf_dir) -> DataFrame:
    """Percentile-bootstrap CI for the mean event value via the seeded
    Poisson bootstrap (stats.bootstrap_mean_ci, 16 replicates) — the
    error bar every profiling number lacks, computed in ONE pass: each
    replicate reweights rows by a Poisson(1) draw derived from the
    md5-prefix uniform through a fixed 9-decimal inverse-CDF table, so
    every replicate is exact, partition-order-free, and bit-replayable.
    CI bounds are type-1 rank picks over the replicate means.  The
    single output row value-checked field by field."""
    from .operators.stats import bootstrap_mean_ci

    ev = load_table(spark, sf_dir, "events")
    return bootstrap_mean_ci(ev, "value", "event_id", replicates=16, seed=42)


@query(
    "cuped_events",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
             value + CASE WHEN event_id % 2 = 0 THEN 0.0 ELSE 0.5 END AS y,
             value * 0.8 + (event_id % 100) * 0.1 AS x
      FROM events
    ),
    q AS (
      SELECT arm,
             CAST(round(y * 1000000.0) AS BIGINT) AS ym,
             CAST(round(x * 1000000.0) AS BIGINT) AS xm
      FROM src WHERE y IS NOT NULL AND x IS NOT NULL
    ),
    m AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) END), 0) AS DOUBLE) AS sxc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) END), 0) AS DOUBLE) AS sxt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(ym AS HUGEINT) END), 0) AS DOUBLE) AS syc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(ym AS HUGEINT) END), 0) AS DOUBLE) AS syt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) * xm END), 0) AS DOUBLE) AS sxxc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) * xm END), 0) AS DOUBLE) AS sxxt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(ym AS HUGEINT) * ym END), 0) AS DOUBLE) AS syyc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(ym AS HUGEINT) * ym END), 0) AS DOUBLE) AS syyt,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN CAST(xm AS HUGEINT) * ym END), 0) AS DOUBLE) AS sxyc,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN CAST(xm AS HUGEINT) * ym END), 0) AS DOUBLE) AS sxyt
      FROM q
    ),
    c AS (
      SELECT m.*,
             CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE) AS n,
             sxc + sxt AS sx, syc + syt AS sy,
             sxxc + sxxt AS sxx, sxyc + sxyt AS sxy
      FROM m
    ),
    th AS (
      SELECT c.*,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
      FROM c
    ),
    arms AS (
      SELECT th.*,
             syc / CAST(nc AS DOUBLE) / 1000000.0
               - theta * (sxc / CAST(nc AS DOUBLE) / 1000000.0
                          - sx / n / 1000000.0) AS mac,
             syt / CAST(nt AS DOUBLE) / 1000000.0
               - theta * (sxt / CAST(nt AS DOUBLE) / 1000000.0
                          - sx / n / 1000000.0) AS mat,
             (syyc / 1e12 - (syc / 1000000.0) * (syc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS vyc,
             (syyt / 1e12 - (syt / 1000000.0) * (syt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS vyt,
             (sxxc / 1e12 - (sxc / 1000000.0) * (sxc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS vxc,
             (sxxt / 1e12 - (sxt / 1000000.0) * (sxt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS vxt,
             (sxyc / 1e12 - (sxc / 1000000.0) * (syc / 1000000.0)
                / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS cvc,
             (sxyt / 1e12 - (sxt / 1000000.0) * (syt / 1000000.0)
                / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS cvt
      FROM th
    ),
    fin AS (
      SELECT arms.*,
             vyc - 2.0 * theta * cvc + theta * theta * vxc AS vac,
             vyt - 2.0 * theta * cvt + theta * theta * vxt AS vat
      FROM arms
    )
    SELECT nc AS n_control, nt AS n_treatment,
           round(theta, 6) AS theta,
           round(mac, 6) AS mean_control_adj,
           round(mat, 6) AS mean_treatment_adj,
           round(mat - mac, 6) AS abs_lift_adj,
           round((mat - mac) / sqrt(vac / CAST(nc AS DOUBLE)
                                    + vat / CAST(nt AS DOUBLE)), 6)
             AS t_stat_adj,
           round((1.0 - (vac + vat) / (vyc + vyt)) * 100.0, 6)
             AS var_reduction_pct,
           abs((mat - mac) / sqrt(vac / CAST(nc AS DOUBLE)
                                  + vat / CAST(nt AS DOUBLE))) > 1.959964
             AS significant
    FROM fin
    """,
)
def cuped_events(spark, sf_dir) -> DataFrame:
    """CUPED-adjusted experiment readout (stats.cuped_ab_report) on the
    ab_test_events setup — parity arms with a PLANTED +0.5 treatment
    lift — plus a deterministic value-correlated covariate (0.8·value +
    id%100·0.1).  The plain Welch test barely resolves the lift; CUPED
    removes the variance the covariate explains (var_reduction ≥ ~60%
    here) and the SAME lift turns decisively significant — the
    sensitivity boost in one conditional-aggregate pass (the adjusted
    moments are algebraic in the joint moments, no second scan).  All
    nine fields value-checked against the mirrored closed form."""
    from .operators.stats import cuped_ab_report

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(0.5))
        ).alias("y"),
        (F.col("value") * 0.8 + (F.col("event_id") % 100) * 0.1).alias("x"),
    )
    return cuped_ab_report(ev, "arm", "y", "x", "control", "treatment")


@query(
    "trimmed_mean_events",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    r AS (SELECT g, vm,
                 row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM s),
    k AS (SELECT *, CAST(floor(0.1 * n + 1e-9) AS BIGINT) AS k FROM r)
    SELECT g AS event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
           round(CAST(sum(CASE WHEN rn > k AND rn <= n - k
                               THEN CAST(vm AS HUGEINT) END) AS DOUBLE)
                 / sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END)
                 / 1000000.0, 6) AS trimmed_mean
    FROM k GROUP BY g
    """,
)
def trimmed_mean_events(spark, sf_dir) -> DataFrame:
    """Per-type 10% trimmed mean of value (stats.trimmed_mean) — the
    robust center that keeps the metric's units where robust_z only
    scores: mean value without the tail spikes.  Kept mass per distinct
    value is the pure-integer overlap of its exact rank interval with
    [k+1, n−k] (the grouped bounded-prefix machinery — ZERO single-
    partition exchanges, tie order provably irrelevant); the floor
    guard +1e-9 pins k against float wobble (0.3·10 → 3, pytest).
    All 5 rows value-checked vs the per-group rank replay."""
    from .operators.stats import trimmed_mean

    ev = load_table(spark, sf_dir, "events")
    return trimmed_mean(
        ev, "value", "event_type", 0.0, 500.0, trim=0.1, bins=1 << 10
    )


@query(
    "neyman_allocation_events",
    oracle="""
    WITH q AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS s1,
                 CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) AS s2
          FROM q GROUP BY 1),
    sd AS (SELECT g, n,
                  CASE WHEN n >= 2 THEN
                    sqrt(greatest((s2 / 1e12
                          - (s1 / 1000000.0) * (s1 / 1000000.0)
                            / CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1.0), 0.0))
                  ELSE 0.0 END AS std
           FROM m),
    w AS (SELECT g, n, std, CAST(n AS DOUBLE) * std AS wgt FROM sd),
    t AS (SELECT sum(wgt) AS tw FROM w),
    sh AS (SELECT g, n, std,
                  CASE WHEN tw > 0 THEN wgt / tw ELSE 0.0 END AS share
           FROM w, t),
    fl AS (SELECT *,
                  CAST(floor(share * 1000.0 + 1e-9) AS BIGINT) AS base,
                  share * 1000.0 - CAST(CAST(floor(share * 1000.0 + 1e-9)
                        AS BIGINT) AS DOUBLE) AS frac
           FROM sh),
    sp AS (SELECT sum(base) AS spent FROM fl),
    rk AS (SELECT fl.*, row_number() OVER (ORDER BY frac DESC, g ASC) AS rk
           FROM fl)
    SELECT g AS event_type, n, round(std, 6) AS std,
           round(share, 6) AS weight,
           CAST(base + CASE WHEN rk <= 1000 - spent THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rk, sp
    """,
)
def neyman_allocation_events(spark, sf_dir) -> DataFrame:
    """Variance-optimal Neyman allocation of a 1,000-row sampling budget
    across event types (stats.neyman_allocation) — sample ∝ N_h·s_h,
    the allocation that minimizes the stratified-mean variance where
    quota_sample's proportional split is only optimal for equal-variance
    strata.  Exact quantized moments; integer allocations by the
    LARGEST-REMAINDER method with the stratum name as deterministic
    tie-break, summing EXACTLY to the budget (pytest-pinned across
    budgets 10/97/1234).  All 5 rows value-checked."""
    from .operators.stats import neyman_allocation

    ev = load_table(spark, sf_dir, "events")
    return neyman_allocation(ev, "event_type", "value", 1000)


@query(
    "rare_combinations_lineitem",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 20011 = 7 THEN 'Q'
                  ELSE l_returnflag END AS returnflag,
             l_linestatus
      FROM lineitem
    ),
    c AS (SELECT returnflag, l_linestatus,
                 CAST(count(*) AS BIGINT) AS combo_count
          FROM src GROUP BY 1, 2
          HAVING count(*) <= 5)
    SELECT s.l_orderkey, s.l_linenumber, s.returnflag, s.l_linestatus,
           c.combo_count
    FROM src s JOIN c ON s.returnflag IS NOT DISTINCT FROM c.returnflag
                     AND s.l_linestatus IS NOT DISTINCT FROM c.l_linestatus
    """,
)
def rare_combinations_lineitem(spark, sf_dir) -> DataFrame:
    """Composite-rarity audit (stats.rare_combinations) with a PLANTED
    typo source: l_shipmode is corrupted to 'AIRR' for l_orderkey %
    20011 == 7 identically in both engines, producing category tuples
    that are individually plausible but nearly unique — the composite-
    typo class single-column enum checks pass by construction.  Every
    flagged row + its combo count value-checked."""
    from .operators.stats import rare_combinations

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 20011 == 7, F.lit("Q"))
        .otherwise(F.col("l_returnflag"))
        .alias("returnflag"),
        "l_linestatus",
    )
    return rare_combinations(
        li, ["returnflag", "l_linestatus"], 5, ["l_orderkey", "l_linenumber"]
    )


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
    from .operators.stats import mirror_columns_report

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        "l_returnflag",
        F.col("l_returnflag").alias("flag_copy"),
        "l_linestatus",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
    )
    return mirror_columns_report(li, "k")


@query(
    "anova_events_value",
    oracle="""
    WITH q AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) AS s2,
             CAST(sum(CAST(vm AS HUGEINT)) AS HUGEINT) AS s1i
      FROM q GROUP BY 1
    ),
    acc AS (
      SELECT g,
             sum(s2 - s1 * s1 / CAST(n AS DOUBLE)) OVER w AS cw,
             sum(s1 * s1 / CAST(n AS DOUBLE)) OVER w AS cb,
             sum(n) OVER w AS cn,
             CAST(sum(s1i) OVER w AS DOUBLE) AS cs,
             sum(1) OVER w AS ck,
             row_number() OVER (ORDER BY g DESC) AS rn
      FROM per
      WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT CAST(ck AS BIGINT) AS k, CAST(cn AS BIGINT) AS n,
           CAST(CAST(ck AS DOUBLE) - 1.0 AS BIGINT) AS df_between,
           CAST(CAST(cn AS DOUBLE) - CAST(ck AS DOUBLE) AS BIGINT)
             AS df_within,
           round(((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12
                  / (CAST(ck AS DOUBLE) - 1.0))
                 / ((cw / 1e12)
                    / (CAST(cn AS DOUBLE) - CAST(ck AS DOUBLE))), 6)
             AS f_stat,
           round(((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12)
                 / (((cb - cs * cs / CAST(cn AS DOUBLE)) / 1e12)
                    + (cw / 1e12)), 6) AS eta_sq
    FROM acc WHERE rn = 1
    """,
)
def anova_events_value(spark, sf_dir) -> DataFrame:
    """One-way ANOVA of value across all five event types
    (stats.anova_report) — the k-arm gate BEFORE pairwise Welch tests
    (C(k,2) uncorrected pair tests are the multiple-testing trap).
    Per-group exact quantized moments in one pass; SSB/SSW algebraic in
    them, accumulated through an ORDERED fold over the bounded group
    table so the doubles land identically in both engines; emits F and
    η² (an F critical value is k-dependent — gating is the caller's
    job, documented rather than faked).  The single row value-checked."""
    from .operators.stats import anova_report

    ev = load_table(spark, sf_dir, "events")
    return anova_report(ev, "event_type", "value")


@query(
    "proportions_events",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'control'
                  ELSE 'treatment' END AS arm,
             (event_type = 'error')
               OR (event_id % 2 = 1 AND event_id % 25 = 1) AS conv
      FROM events
    ),
    m AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'control' AND conv IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        CAST(sum(CASE WHEN arm = 'treatment' AND conv IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(sum(CASE WHEN arm = 'control' AND conv THEN 1 ELSE 0 END)
             AS BIGINT) AS xc,
        CAST(sum(CASE WHEN arm = 'treatment' AND conv THEN 1 ELSE 0 END)
             AS BIGINT) AS xt
      FROM src
    )
    SELECT nc AS n_control, nt AS n_treatment,
           round(CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS rate_control,
           round(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS rate_treatment,
           round(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                 - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS abs_diff,
           round((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                 / sqrt(((CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                         / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 - (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                           / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 / CAST(nc AS DOUBLE)
                           + 1.0 / CAST(nt AS DOUBLE))), 6) AS z_stat,
           coalesce(abs((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                 / sqrt(((CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                         / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 - (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                           / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)))
                        * (1.0 / CAST(nc AS DOUBLE)
                           + 1.0 / CAST(nt AS DOUBLE)))) > 1.959964,
                 false) AS significant
    FROM m
    """,
)
def proportions_events(spark, sf_dir) -> DataFrame:
    """Two-proportion z-test (stats.proportions_ab_report) on parity
    arms with a PLANTED conversion lift: treatment converts on error
    OR every 25th odd event id, so the rate moves ~2pp and the pooled
    z fires — the conversion-rate counterpart of the continuous Welch
    readout, exact by nature (counts need no quantization).  All seven
    fields value-checked against the mirrored closed form."""
    from .operators.stats import proportions_ab_report

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        (
            (F.col("event_type") == "error")
            | ((F.col("event_id") % 2 == 1) & (F.col("event_id") % 25 == 1))
        ).alias("conv"),
    )
    return proportions_ab_report(ev, "arm", "conv", "control", "treatment")


@query(
    "kappa_events_raters",
    oracle="""
    WITH r AS (
      SELECT event_type AS a,
             CASE WHEN event_id % 7 = 0 THEN 'click'
                  ELSE event_type END AS b
      FROM events WHERE event_type IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
      FROM r
    ),
    marg AS (
      SELECT l AS lbl, sum(ca) AS na, sum(cb) AS nb FROM (
        SELECT a AS l, 1 AS ca, 0 AS cb FROM r
        UNION ALL SELECT b, 0, 1 FROM r)
      GROUP BY 1
    ),
    pe AS (
      SELECT lbl,
             sum((CAST(na AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * (CAST(nb AS DOUBLE) / CAST(tot.n AS DOUBLE)))
               OVER (ORDER BY lbl ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cpe,
             row_number() OVER (ORDER BY lbl DESC) AS rn
      FROM marg, tot
    )
    SELECT tot.n,
           round(CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
             AS p_observed,
           round(pe.cpe, 6) AS p_expected,
           CASE WHEN pe.cpe < 1.0 THEN
             round((CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE)
                    - pe.cpe) / (1.0 - pe.cpe), 6) END AS kappa
    FROM tot, pe WHERE pe.rn = 1
    """,
)
def kappa_events_raters(spark, sf_dir) -> DataFrame:
    """Cohen's kappa (stats.cohens_kappa) between two synthetic raters —
    rater B relabels every 7th event 'click', identically in both
    engines — the labeling-QA number raw agreement fakes (independent
    raters over a skewed label set still agree ~40% by luck;
    pytest-demonstrated).  Exact diagonal/marginal counts, chance
    agreement folded in LABEL ORDER over the bounded label table (the
    anova ordered-fold discipline).  The single row value-checked."""
    from .operators.stats import cohens_kappa

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.when(F.col("event_id") % 7 == 0, F.lit("click"))
        .otherwise(F.col("event_type"))
        .alias("b"),
    )
    return cohens_kappa(ev, "a", "b")


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
    from .operators.stats import capture_recapture

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 7 < 3)
    b = docs.filter(F.col("doc_id") % 5 < 2)
    return capture_recapture(a, b, "doc_id")


@query(
    "mwu_events_value",
    oracle="""
    WITH a AS (SELECT value AS v FROM events
               WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT value AS v FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
    u AS (SELECT v, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT v, 0, 1 FROM b),
    per AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM u GROUP BY v),
    c AS (SELECT v, na, nb, na + nb AS t,
                 sum(na + nb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    agg AS (
      SELECT CAST(sum(na) AS BIGINT) AS ta,
             CAST(sum(nb) AS BIGINT) AS tb,
             CAST(sum(CAST(na AS HUGEINT)
                      * (2 * (cum - t) + t + 1)) AS DOUBLE) AS ra2,
             CAST(sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT))
                  AS DOUBLE) AS ties
      FROM c
    )
    SELECT ta AS n_a, tb AS n_b,
           round(ra2 / 2.0 - CAST(ta AS DOUBLE)
                 * (CAST(ta AS DOUBLE) + 1.0) / 2.0, 6) AS u_a,
           round((ra2 / 2.0 - CAST(ta AS DOUBLE)
                  * (CAST(ta AS DOUBLE) + 1.0) / 2.0
                  - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 2.0)
                 / sqrt(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12.0
                        * ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) + 1.0)
                           - ties / ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                              * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) - 1.0)))),
                 6) AS z_stat,
           coalesce(abs((ra2 / 2.0 - CAST(ta AS DOUBLE)
                  * (CAST(ta AS DOUBLE) + 1.0) / 2.0
                  - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 2.0)
                 / sqrt(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12.0
                        * ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) + 1.0)
                           - ties / ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                              * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) - 1.0)))))
                 > 1.959964, false) AS significant
    FROM agg
    """,
)
def mwu_events_value(spark, sf_dir) -> DataFrame:
    """Exact Mann–Whitney U between the click and purchase value
    distributions (stats.mann_whitney_u) — the distribution-free "does
    one stochastically dominate" companion to the KS and Wasserstein
    rows over the same pair: rank sums from the pooled doubled
    tie-ranks (the spearman bounded-prefix machinery, no corpus sort),
    tie-corrected normal variance from the exact Σ(t³−t), one round-6
    division.  The single row value-checked."""
    from .operators.stats import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_u(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        0.0,
        500.0,
        bins=1 << 10,
    )


@query(
    "kruskal_events_value",
    oracle="""
    WITH src AS (SELECT event_type AS g, value AS v FROM events
                 WHERE event_type IS NOT NULL AND value IS NOT NULL),
    pooled AS (SELECT v, count(*) AS t FROM src GROUP BY v),
    rk AS (SELECT v, t,
                  2 * (sum(t) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - t) + t + 1 AS r2
           FROM pooled),
    per AS (SELECT g, v, count(*) AS c FROM src GROUP BY 1, 2),
    per_g AS (
      SELECT per.g, CAST(sum(per.c) AS BIGINT) AS ng,
             CAST(sum(CAST(per.c AS HUGEINT) * rk.r2) AS DOUBLE) AS rg2
      FROM per JOIN rk ON rk.v = per.v GROUP BY 1
    ),
    acc AS (
      SELECT g,
             sum((rg2 / 2.0) * (rg2 / 2.0) / CAST(ng AS DOUBLE)) OVER w
               AS hsum,
             sum(ng) OVER w AS cn,
             sum(1) OVER w AS ck,
             row_number() OVER (ORDER BY g DESC) AS rn
      FROM per_g
      WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tie AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t
                            - CAST(t AS HUGEINT)) AS DOUBLE) AS ties
            FROM pooled)
    SELECT CAST(ck AS BIGINT) AS k, CAST(cn AS BIGINT) AS n,
           round((12.0 / (CAST(cn AS DOUBLE) * (CAST(cn AS DOUBLE) + 1.0))
                  * hsum - 3.0 * (CAST(cn AS DOUBLE) + 1.0))
                 / (1.0 - ties / (CAST(cn AS DOUBLE) * CAST(cn AS DOUBLE)
                                  * CAST(cn AS DOUBLE) - CAST(cn AS DOUBLE))),
                 6) AS h_stat,
           CAST(ck - 1 AS BIGINT) AS df
    FROM acc, tie WHERE rn = 1
    """,
)
def kruskal_events_value(spark, sf_dir) -> DataFrame:
    """Exact Kruskal–Wallis H across all five event types
    (stats.kruskal_wallis) — the distribution-free k-group gate beside
    anova_events_value's mean-based F: same pooled-rank machinery as
    the U test, standard tie correction from the exact Σ(t³−t), H +
    df emitted with χ²(k−1) gating documented as the caller's job (the
    anova convention).  The single row value-checked."""
    from .operators.stats import kruskal_wallis

    ev = load_table(spark, sf_dir, "events")
    return kruskal_wallis(ev, "event_type", "value", 0.0, 500.0, bins=1 << 10)


@query(
    "randomization_events",
    oracle="""
    WITH src AS (
      SELECT event_id AS id,
             CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 't' END AS arm,
             CAST(round((value + CASE WHEN event_id % 2 = 0 THEN 0.0
                                      ELSE 0.5 END) * 1000000.0) AS BIGINT)
               AS ym
      FROM events WHERE value IS NOT NULL
    ),
    o AS (
      SELECT CAST(sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN arm = 'c' THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS sc,
             CAST(sum(CASE WHEN arm = 't' THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS st
      FROM src
    ),
    dob AS (SELECT nc, nt,
                   round(abs(st / CAST(nt AS DOUBLE) / 1000000.0
                             - sc / CAST(nc AS DOUBLE) / 1000000.0), 6)
                     AS d_obs,
                   CAST(nt AS DOUBLE) / (CAST(nc AS DOUBLE)
                                         + CAST(nt AS DOUBLE)) AS p_hat
            FROM o),
    reps AS (SELECT unnest(range(40)) AS r),
    drawn AS (
      SELECT r,
             ((CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'perm-42',
                    CAST(r AS VARCHAR), CAST(id AS VARCHAR))), 1, 8)
                   AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0
              < (SELECT p_hat FROM dob)) AS pt,
             ym
      FROM src CROSS JOIN reps
    ),
    per AS (
      SELECT r,
             CAST(sum(CASE WHEN pt THEN 1 ELSE 0 END) AS BIGINT) AS dnt,
             CAST(sum(CASE WHEN NOT pt THEN 1 ELSE 0 END) AS BIGINT) AS dnc,
             CAST(sum(CASE WHEN pt THEN CAST(ym AS HUGEINT) END) AS DOUBLE)
               AS dst,
             CAST(sum(CASE WHEN NOT pt THEN CAST(ym AS HUGEINT) END)
                  AS DOUBLE) AS dsc
      FROM drawn GROUP BY r
    ),
    ds AS (
      SELECT round(abs(dst / CAST(dnt AS DOUBLE)
                       - dsc / CAST(dnc AS DOUBLE)) / 1000000.0, 6) AS d
      FROM per WHERE dnt > 0 AND dnc > 0
    ),
    hits AS (
      SELECT CAST(count(*) AS BIGINT) AS used,
             CAST(sum(CASE WHEN d >= (SELECT d_obs FROM dob)
                           THEN 1 ELSE 0 END) AS BIGINT) AS ge
      FROM ds
    )
    SELECT dob.nc AS n_control, dob.nt AS n_treatment,
           dob.d_obs AS abs_diff_observed,
           round((1.0 + CAST(hits.ge AS DOUBLE))
                 / (CAST(hits.used AS DOUBLE) + 1.0), 6) AS p_value,
           hits.used AS permutations
    FROM dob, hits
    """,
)
def randomization_events(spark, sf_dir) -> DataFrame:
    """Randomization-inference p-value (stats.randomization_test, 40
    seeded re-draws) for the ab_test setup's planted +0.5 lift — the
    assumption-free test that re-runs the experiment under the design's
    Bernoulli coin instead of trusting a variance formula; the lift
    survives (p = 1/41, no chance draw matches it).  Draws derive from
    the md5-prefix uniform (the bootstrap convention), per-draw means
    are exact integer ratios, and the whole null distribution replays
    bit-for-bit.  The single row value-checked."""
    from .operators.stats import randomization_test

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit("c"))
        .otherwise(F.lit("t"))
        .alias("arm"),
        (
            F.col("value")
            + F.when(F.col("event_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(0.5))
        ).alias("y"),
    )
    return randomization_test(
        ev, "arm", "y", "c", "t", "event_id", permutations=40, seed=42
    )


@query(
    "rmst_users_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, epoch_us(ts) AS us, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    per AS (
      SELECT CAST(floor((max(us) - min(us)) / 3600000000.0) AS BIGINT) AS t0,
             max(CASE WHEN rn = 1 AND event_type = 'error'
                      THEN 1 ELSE 0 END) = 1 AS obs
      FROM ranked GROUP BY user_id),
    cells AS (SELECT t0 AS t,
                     CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_event,
                     CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_censored
              FROM per GROUP BY 1),
    tot AS (SELECT sum(n_event + n_censored) AS n FROM cells),
    risk AS (SELECT t, n_event, n_censored,
                    CAST(n - coalesce(sum(n_event + n_censored) OVER
                      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             FROM cells, tot),
    lg AS (SELECT t, n_risk,
            CASE WHEN n_event < n_risk
                 THEN round(ln(CAST(n_risk - n_event AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)), 6) END AS lt,
            CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END AS z
           FROM risk),
    cum AS (SELECT t, n_risk,
                   sum(z) OVER w AS zc, sum(lt) OVER w AS sl
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
    curve AS (SELECT t, n_risk,
                     CASE WHEN zc > 0 THEN 0.0
                          ELSE round(exp(sl), 6) END AS survival
              FROM cum),
    seg AS (
      SELECT CAST(t AS DOUBLE) AS t, n_risk, survival,
             coalesce(lead(CAST(t AS DOUBLE)) OVER (ORDER BY t), 700.0)
               AS nxt,
             first_value(CAST(t AS DOUBLE)) OVER (ORDER BY t) AS t0,
             first_value(n_risk) OVER (ORDER BY t) AS n0
      FROM curve
    )
    SELECT CAST(700.0 AS DOUBLE) AS tau,
           CAST(max(n0) AS BIGINT) AS n,
           round(max(least(t0, 700.0))
                 + sum(survival * greatest(least(nxt, 700.0)
                                           - least(t, 700.0), 0.0)), 6)
             AS rmst
    FROM seg
    """,
)
def rmst_users_events(spark, sf_dir) -> DataFrame:
    """Restricted mean survival time at τ = 700 hours
    (temporal.survival_rmst) over the same per-user lifetimes as the
    Kaplan–Meier query — 'expected active hours within the first 700',
    the scalar that stays meaningful when hazards cross and median
    survival is undefined.  Area under the engine's own round-6 KM
    steps, folded in duration order (the survival_curve discipline),
    τ-clamped segments, flat extension past the last duration.  The
    single row value-checked against the windowed replay."""
    from .operators.temporal import survival_rmst
    from .operators import stats as _stats

    ev = load_table(spark, sf_dir, "events")
    us = _stats._epoch_us_col(ev, "ts")
    per = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.floor((F.max(us) - F.min(us)) / F.lit(3600000000.0))
            .cast("long")
            .alias("t"),
            F.max(
                F.struct(
                    us.alias("us"),
                    F.col("event_id").alias("eid"),
                    (F.col("event_type") == "error").alias("err"),
                )
            )["err"].alias("obs"),
        )
    )
    return survival_rmst(per, "t", "obs", 700.0)


@query(
    "fdr_metric_battery",
    oracle="""
    WITH t AS (SELECT unnest(range(20)) AS i),
    ps AS (
      SELECT 'metric_' || CAST(i AS VARCHAR) AS test,
             CASE WHEN i % 7 = 3 THEN
               ((CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'fdr-42',
                      CAST(i AS VARCHAR))), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                / 4294967296.0) / 1000.0
             ELSE
               (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'fdr-42',
                      CAST(i AS VARCHAR))), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                / 4294967296.0
             END AS p
      FROM t
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM ps),
    rk AS (SELECT ps.*, row_number() OVER (ORDER BY p, test) AS r FROM ps),
    q AS (
      SELECT rk.*, m.mm,
             least(min(p * CAST(m.mm AS DOUBLE) / CAST(r AS DOUBLE))
                   OVER (ORDER BY r DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   1.0) AS qv,
             max(CASE WHEN p * CAST(m.mm AS DOUBLE)
                           <= CAST(r AS DOUBLE) * 0.05 THEN r END)
               OVER () AS kstar
      FROM rk, m
    )
    SELECT test, p AS p_value, CAST(r AS BIGINT) AS rank,
           round(qv, 6) AS q_value,
           coalesce(r <= kstar, false) AS rejected
    FROM q
    """,
)
def fdr_metric_battery(spark, sf_dir) -> DataFrame:
    """Benjamini–Hochberg FDR correction (stats.fdr_correct) over a
    20-test battery of seeded p-values with three PLANTED discoveries
    (tests i%7==3 get their uniform p divided by 1000, identically in
    both engines) — the meta-test the engine's own growing test
    battery needs: naive per-test 5% admits ~1 false discovery per 20
    metrics; BH rejects exactly the planted trio.  Ranks, monotone
    q-values, and the k* cutoff all fold over the bounded p-table;
    every row value-checked."""
    from .operators.stats import fdr_correct

    spine = spark.range(20).select(
        F.concat(F.lit("metric_"), F.col("id").cast("string")).alias("test"),
        F.col("id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit("fdr-42"), F.col("id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    ps = spine.select(
        "test",
        F.when(F.col("id") % 7 == 3, u / F.lit(1000.0)).otherwise(u).alias("p"),
    )
    return fdr_correct(ps, ["test"], "p", alpha=0.05)


@query(
    "wilcoxon_events_paired",
    oracle="""
    WITH src AS (
      SELECT value AS b,
             value + 0.25
               + (((CAST(CAST('0x' || substring(md5(concat_ws(chr(31),
                      'pair-42', CAST(event_id AS VARCHAR))), 1, 8)
                     AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0) - 0.5)
               AS a
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT CAST(round(a * 1000000.0) AS BIGINT)
             - CAST(round(b * 1000000.0) AS BIGINT) AS dm
      FROM src
    ),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM d),
    nz AS (SELECT abs(dm) AS ad, dm > 0 AS pos FROM d WHERE dm <> 0),
    per AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p
            FROM nz GROUP BY 1),
    c AS (SELECT ad, t, p,
                 sum(t) OVER (ORDER BY ad
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    agg AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(CAST(p AS HUGEINT)
                      * (2 * (cum - t) + t + 1)) AS DOUBLE) AS wp2,
             CAST(sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT))
                  AS DOUBLE) AS ties
      FROM c
    )
    SELECT np.n_pairs, agg.n AS n_nonzero,
           round(wp2 / 2.0, 6) AS w_plus,
           round((wp2 / 2.0 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                  / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                        - ties / 48.0), 6) AS z_stat,
           coalesce(abs((wp2 / 2.0 - CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) + 1.0) / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                        - ties / 48.0)) > 1.959964, false) AS significant
    FROM np, agg
    """,
)
def wilcoxon_events_paired(spark, sf_dir) -> DataFrame:
    """Exact Wilcoxon signed-rank (stats.wilcoxon_signed_rank) on PAIRED
    before/after scores: after = value + 0.25 + seeded-uniform noise in
    [−0.5, 0.5) — the same-row re-scoring scenario where the pairing
    carries the power an unpaired test throws away; the +0.25 median
    shift fires decisively.  Round-6 micro diffs, zero-diff drop,
    doubled tie-ranks from the bounded-prefix machinery, exact tie
    correction.  The single row value-checked."""
    from .operators.stats import wilcoxon_signed_rank

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit("pair-42"), F.col("event_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        F.col("value").alias("b"),
        (F.col("value") + F.lit(0.25) + (u - F.lit(0.5))).alias("a"),
    )
    return wilcoxon_signed_rank(ev, "b", "a", 0.0, 2.0, bins=1 << 10)


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
    from .operators.text import novelty_scores

    docs = load_table(spark, sf_dir, "documents")
    return novelty_scores(docs, "text", "doc_id", k=3)


@query(
    "tokenizer_fertility_documents",
    oracle=None,  # resolved below — needs the pinned vocab inlined
)
def tokenizer_fertility_documents(spark, sf_dir) -> DataFrame:
    """Tokenizer FERTILITY by language (chars per subword token) — the
    multilingual tokenizer-quality metric: a vocab trained on English
    spends ~3-5 chars/token there but shatters CJK into near-char
    pieces; per-language fertility is how a pipeline SEES that before
    training pays for it.  Composition of two oracled components: the
    pinned-vocab subword counts (exact recursive-CTE-replayable kernel)
    rolled up with exact char sums per documents.lang; fertility =
    Σchars/Σtokens as one round-6 division of exact longs.  All
    per-lang rows value-checked."""
    from .operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    per = docs.select(
        "lang",
        F.length("text").cast("long").alias("_chars"),
        subword_count(F.col("text")).cast("long").alias("_toks"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_toks").cast("long").alias("n_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_chars",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("fertility"),
    )


ORACLES["tokenizer_fertility_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
           CAST(sum(coalesce(dc.ns, 0)) AS BIGINT) AS n_tokens,
           CASE WHEN sum(coalesce(dc.ns, 0)) > 0
                THEN round(CAST(sum(length(d.text)) AS DOUBLE)
                           / CAST(sum(coalesce(dc.ns, 0)) AS DOUBLE), 6)
           END AS fertility
    FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
    WHERE d.lang IS NOT NULL AND d.text IS NOT NULL
    GROUP BY d.lang
    """
    ).split()
)


@query(
    "dedup_method_agreement_documents",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents WHERE text IS NOT NULL
    ),
    exact_flag AS (
      SELECT doc_id FROM fp
      WHERE f IN (SELECT f FROM fp GROUP BY f HAVING count(*) > 1)
    ),
    s AS (SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '),
                               x -> x <> '')) AS tk
          FROM documents WHERE text IS NOT NULL),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.tk, b.tk)) AS i,
                  len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS u
           FROM s a JOIN s b ON a.doc_id < b.doc_id),
    jac_flag AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM pr WHERE u > 0 AND i * 1.0 / u >= 0.95
        UNION ALL
        SELECT id_b FROM pr WHERE u > 0 AND i * 1.0 / u >= 0.95)
    ),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact_flag) AS ne,
             (SELECT CAST(count(*) AS BIGINT) FROM jac_flag) AS nj,
             (SELECT CAST(count(*) AS BIGINT)
              FROM exact_flag JOIN jac_flag USING (doc_id)) AS nb
    )
    SELECT ne AS n_exact, nj AS n_jaccard, nb AS n_both,
           CASE WHEN ne + nj - nb > 0
                THEN round(CAST(nb AS DOUBLE)
                           / CAST(ne + nj - nb AS DOUBLE), 6)
           END AS set_jaccard,
           CASE WHEN ne > 0
                THEN round(CAST(nb AS DOUBLE) / CAST(ne AS DOUBLE), 6)
           END AS exact_covered_by_jaccard
    FROM m
    """,
)
def dedup_method_agreement_documents(spark, sf_dir) -> DataFrame:
    """Agreement matrix between two dedup modalities — which documents
    the EXACT fingerprint flags vs the lossless Jaccard-0.95 join
    (text.fp_exact_key ∘ dedup.jaccard_prefix_join, both oracled
    operators composed): exact dups MUST be a subset of Jaccard dups
    (identical text ⟹ J = 1 — the containment ratio reads 1.0 as a
    built-in sanity check), and the set-Jaccard between the flag sets
    says how much extra near-dup mass the fuzzy stage adds.  The
    dedup-campaign audit: 'what does each stage buy'.  One row
    value-checked against the dual replay."""
    from .operators.dedup import jaccard_prefix_join
    from .operators.text import fp_exact_key

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    fp = docs.select("doc_id", fp_exact_key("text").alias("f"))
    dup_keys = fp.groupBy("f").count().filter(F.col("count") > 1).select("f")
    exact_flag = fp.join(dup_keys, "f").select("doc_id")
    pairs = jaccard_prefix_join(docs, "text", "doc_id", min_jaccard=0.95)
    jac_flag = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    ne = exact_flag.count()
    nj = jac_flag.count()
    nb = exact_flag.join(jac_flag, "doc_id").count()
    spark_ = docs.sparkSession
    union = ne + nj - nb
    return spark_.createDataFrame(
        [
            (
                ne,
                nj,
                nb,
                round(nb / union, 6) if union > 0 else None,
                round(nb / ne, 6) if ne > 0 else None,
            )
        ],
        "n_exact long, n_jaccard long, n_both long, set_jaccard double, "
        "exact_covered_by_jaccard double",
    )


@query(
    "context_fit_documents",
    oracle=None,  # resolved below — needs the pinned vocab inlined
)
def context_fit_documents(spark, sf_dir) -> DataFrame:
    """Context-window fit report — per candidate window {64, 128, 256}
    subword tokens: the share of DOCUMENTS that fit whole and the share
    of TOKEN MASS that survives truncation (min(tokens, T) summed) —
    the two numbers a context-length decision actually weighs (docs-fit
    flatters small windows; mass-survives is what training sees).
    Composition of the pinned-vocab subword counts with exact long
    arithmetic; every row value-checked via the shared recursive-CTE
    oracle prelude."""
    from .operators.subword import subword_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    per = docs.select(subword_count(F.col("text")).cast("long").alias("_t"))
    per = per.localCheckpoint(eager=False)  # feeds all three window rows
    spine = docs.sparkSession.createDataFrame(
        [(64,), (128,), (256,)], "window long"
    )
    joined = spine.crossJoin(per)
    return (
        joined.groupBy("window")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("_t") <= F.col("window"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_fit"),
            F.sum("_t").cast("long").alias("n_tokens"),
            F.sum(F.least(F.col("_t"), F.col("window")))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .select(
            "window",
            "n_docs",
            "n_docs_fit",
            F.round(
                F.col("n_docs_fit").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("docs_fit_share"),
            "n_tokens",
            "n_tokens_kept",
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("tokens_kept_share"),
        )
    )


ORACLES["context_fit_documents"] = " ".join(
    (
        _subword_wcounts_prefix()
        + """
    , dc AS (
      SELECT wlist.doc_id, sum(c.n) AS ns
      FROM wlist JOIN wcounts c ON wlist.w = c.w GROUP BY wlist.doc_id
    ),
    per AS (
      SELECT d.doc_id, CAST(coalesce(dc.ns, 0) AS BIGINT) AS t
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
      WHERE d.text IS NOT NULL
    ),
    w AS (SELECT unnest([64, 128, 256]) AS win)
    SELECT CAST(win AS BIGINT) AS "window",
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN t <= win THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_fit,
           round(CAST(sum(CASE WHEN t <= win THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS docs_fit_share,
           CAST(sum(t) AS BIGINT) AS n_tokens,
           CAST(sum(least(t, win)) AS BIGINT) AS n_tokens_kept,
           round(CAST(sum(least(t, win)) AS DOUBLE)
                 / CAST(sum(t) AS DOUBLE), 6) AS tokens_kept_share
    FROM per CROSS JOIN w
    GROUP BY win
    """
    ).split()
)


@query(
    "effect_sizes_events",
    oracle="""
    WITH a AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
               FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    b AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS vm
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
             (SELECT CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) FROM a) AS s1a,
             (SELECT CAST(sum(CAST(vm AS HUGEINT)) AS DOUBLE) FROM b) AS s1b,
             (SELECT CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) FROM a) AS s2a,
             (SELECT CAST(sum(CAST(vm AS HUGEINT) * vm) AS DOUBLE) FROM b) AS s2b
    ),
    u AS (SELECT vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT vm, 0, 1 FROM b),
    per AS (SELECT vm, sum(ca) AS pa, sum(cb) AS pb FROM u GROUP BY vm),
    c AS (SELECT vm, pa, pb, pa + pb AS t,
                 sum(pa + pb) OVER (ORDER BY vm
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM per),
    rb AS (SELECT CAST(sum(CAST(pb AS HUGEINT)
                  * (2 * (cum - t) + t + 1)) AS DOUBLE) AS rb2 FROM c),
    f AS (
      SELECT m.*, rb.rb2,
             s1a / CAST(na AS DOUBLE) / 1000000.0 AS ma,
             s1b / CAST(nb AS DOUBLE) / 1000000.0 AS mb,
             (s2a / 1e12 - (s1a / 1000000.0) * (s1a / 1000000.0)
                / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
             (s2b / 1e12 - (s1b / 1000000.0) * (s1b / 1000000.0)
                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb
      FROM m, rb
    ),
    g AS (
      SELECT f.*,
             sqrt(((CAST(na AS DOUBLE) - 1.0) * va
                   + (CAST(nb AS DOUBLE) - 1.0) * vb)
                  / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)) AS pooled,
             (rb2 / 2.0 - CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) + 1.0)
              / 2.0) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cles
      FROM f
    )
    SELECT na AS n_a, nb AS n_b,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           CASE WHEN pooled > 0 THEN round((mb - ma) / pooled, 6) END
             AS cohens_d,
           round(2.0 * cles - 1.0, 6) AS cliffs_delta,
           round(cles, 6) AS cles
    FROM g
    """,
)
def effect_sizes_events(spark, sf_dir) -> DataFrame:
    """Effect sizes for click vs purchase values
    (stats.effect_size_report) — the panel's capstone beside the KS /
    Wasserstein / U-test rows over the same pair: at this engine's
    target scale every test reports p ≈ 0 for ANY nonzero gap, so
    Cohen's d, Cliff's δ (monotone-invariant, pytest-shown), and the
    common-language P(B > A) are the numbers a decision actually
    reads.  Exact moments + the U-test rank machinery; one row
    value-checked field by field."""
    from .operators.stats import effect_size_report

    ev = load_table(spark, sf_dir, "events")
    return effect_size_report(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        0.0,
        500.0,
        bins=1 << 10,
    )


@query(
    "ordinal_lineitem_quantity_price",
    oracle="""
    WITH src AS (
      SELECT CAST(l_quantity AS BIGINT) AS a,
             CAST(floor(l_extendedprice / 20000.0) AS BIGINT) AS b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1, 2),
    c AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
          FROM cells x JOIN cells y ON y.a > x.a AND y.b > x.b),
    d AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
          FROM cells x JOIN cells y ON y.a > x.a AND y.b < x.b),
    ta AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
           FROM cells x JOIN cells y ON y.a = x.a AND y.b > x.b),
    tb AS (SELECT coalesce(sum(CAST(x.n AS HUGEINT) * y.n), 0) AS v
           FROM cells x JOIN cells y ON y.b = x.b AND y.a > x.a),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS v FROM cells)
    SELECT nn.v AS n,
           CAST(c.v AS BIGINT) AS concordant,
           CAST(d.v AS BIGINT) AS discordant,
           CAST(ta.v AS BIGINT) AS ties_a,
           CAST(tb.v AS BIGINT) AS ties_b,
           CASE WHEN CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE) > 0
                THEN round((CAST(c.v AS DOUBLE) - CAST(d.v AS DOUBLE))
                           / (CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)), 6)
           END AS gamma,
           CASE WHEN CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)
                     + CAST(tb.v AS DOUBLE) > 0
                THEN round((CAST(c.v AS DOUBLE) - CAST(d.v AS DOUBLE))
                           / (CAST(c.v AS DOUBLE) + CAST(d.v AS DOUBLE)
                              + CAST(tb.v AS DOUBLE)), 6)
           END AS somers_d_ba
    FROM nn, c, d, ta, tb
    """,
)
def ordinal_lineitem_quantity_price(spark, sf_dir) -> DataFrame:
    """Goodman–Kruskal γ + Somers' D between quantity and the price
    band (stats.ordinal_association) — the MONOTONE-with-direction
    answer Cramér's V can't give (V sees unordered labels).  On this
    synthetic lineitem the generator draws the two INDEPENDENTLY, and
    γ = 0.0019 over 1.44 billion pairs is exactly the right readout —
    the negative control that shows the statistic doesn't invent
    monotonicity (the positive direction is pytest-pinned on
    constructed monotone data).  All
    pair counting runs over the bounded joint cell table (never rows),
    pair counts as exact decimals (they are O(n²) in magnitude — int64
    dies at corpus scale, documented).  One row value-checked."""
    from .operators.stats import ordinal_association

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("a"),
        F.floor(F.col("l_extendedprice") / 20000.0).cast("long").alias("b"),
    )
    return ordinal_association(li, "a", "b")


@query(
    "seasonal_residual_anomalies_events",
    oracle="""
    WITH src AS (
      SELECT event_type, epoch_us(ts) AS us, value FROM events
      WHERE ts IS NOT NULL
    ),
    cells AS (
      SELECT event_type, us - us % 86400000000 AS b,
             round(avg(value), 6) AS val
      FROM src GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(b) AS mn, max(b) AS mx FROM cells GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(mn, mx, 86400000000)) AS b
      FROM spans
    ),
    grid AS (
      SELECT s.event_type, s.b,
             last_value(c.val IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
      FROM spine s LEFT JOIN cells c
        ON c.event_type = s.event_type AND c.b = s.b
    ),
    q AS (SELECT event_type, b,
                 CAST(round(val * 1000000) AS BIGINT) AS vm FROM grid),
    w AS (
      SELECT event_type, b, vm,
             sum(vm) OVER win AS wsum, count(vm) OVER win AS wcnt,
             min(b) OVER (PARTITION BY event_type) AS mnb
      FROM q
      WINDOW win AS (PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    t AS (
      SELECT event_type, b, vm,
             ((b - mnb) // 86400000000) % 7 AS pos,
             CASE WHEN wcnt = 7 AND vm IS NOT NULL
                  THEN CAST(round(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT)
             END AS tm
      FROM w
    ),
    d AS (SELECT *, vm - tm AS dm FROM t),
    pt AS (SELECT event_type, pos, sum(dm) AS s, count(*) AS c
           FROM d WHERE dm IS NOT NULL GROUP BY 1, 2),
    tt AS (SELECT event_type, sum(s) AS st, sum(c) AS ct FROM pt GROUP BY 1),
    sa AS (SELECT pt.event_type, pt.pos,
                  CAST(round(CAST(pt.s AS DOUBLE) / CAST(pt.c AS DOUBLE)
                             - CAST(tt.st AS DOUBLE) / CAST(tt.ct AS DOUBLE))
                       AS BIGINT) AS sm
           FROM pt JOIN tt ON pt.event_type = tt.event_type),
    resid AS (
      SELECT d.event_type, d.b AS bucket_us,
             round((d.vm - d.tm - sa.sm) / 1000000.0, 6) AS r
      FROM d JOIN sa ON sa.event_type = d.event_type AND sa.pos = d.pos
      WHERE d.tm IS NOT NULL
    ),
    rv AS (SELECT event_type, bucket_us, r, round(r, 6) AS rr FROM resid),
    med AS (
      SELECT event_type, rr AS m FROM (
        SELECT event_type, rr,
               row_number() OVER (PARTITION BY event_type ORDER BY rr) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM rv) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    dev AS (
      SELECT rv.event_type, rv.bucket_us, rv.r, rv.rr, med.m,
             round(abs(rv.rr - med.m), 6) AS dd
      FROM rv JOIN med ON med.event_type = rv.event_type
    ),
    mad AS (
      SELECT event_type, dd AS mad FROM (
        SELECT event_type, dd,
               row_number() OVER (PARTITION BY event_type ORDER BY dd) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) x
      WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0 - 1e-9) AS BIGINT)
    ),
    scored AS (
      SELECT dev.event_type, dev.bucket_us, dev.r AS residual,
             CASE WHEN mad.mad > 0
                  THEN round(0.6745 * (dev.rr - dev.m) / mad.mad, 6)
             END AS robust_z
      FROM dev JOIN mad ON mad.event_type = dev.event_type
    )
    SELECT * FROM scored WHERE abs(robust_z) > 2.5
    """,
)
def seasonal_residual_anomalies_events(spark, sf_dir) -> DataFrame:
    """The composition the seasonal machinery was built FOR: decompose
    the per-type daily series (temporal.seasonal_decompose, period 7),
    then robust-z the RESIDUALS (stats.robust_z_outliers at a 2.5 cut)
    — alerts that fire on genuinely anomalous days instead of
    re-discovering 'Mondays are low' every week, with the MAD scoring
    immune to the very anomalies it hunts.  Two oracled operators
    composed end-to-end; every flagged (type, day) with its residual
    and score value-checked against the stitched replay."""
    from .operators.stats import robust_z_outliers
    from .operators.temporal import seasonal_decompose

    ev = load_table(spark, sf_dir, "events")
    dec = seasonal_decompose(ev, ["event_type"], "ts", "value", 86400, 7)
    resid = dec.filter(F.col("residual").isNotNull()).select(
        "event_type", "bucket_us", F.col("residual").alias("r")
    )
    return robust_z_outliers(
        resid, "r", "event_type", ["bucket_us"], 2.5
    ).select(
        "event_type",
        "bucket_us",
        F.col("r").alias("residual"),
        "robust_z",
    )


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
    from .operators.text import collocation_report

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
    from .operators.text import term_dispersion_report

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
    from .operators.text import vocab_growth_report

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
    from .operators.text import zipf_report

    docs = load_table(spark, sf_dir, "documents")
    return zipf_report(docs, "text", k=100)


@query(
    "cluster_quality_embeddings",
    oracle="""
    WITH src AS (
      SELECT CAST(vec_id % 4 AS VARCHAR) AS g, embedding AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    idx AS (SELECT unnest(range(64)) AS d),
    cells AS (
      SELECT g, d, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS HUGEINT)) AS s1,
             sum(CAST(CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS HUGEINT)
                 * CAST(round(CAST(e[d + 1] AS DOUBLE) * 1000000.0)
                   AS BIGINT)) AS s2
      FROM src, idx GROUP BY 1, 2
    ),
    per_g AS (
      SELECT g, max(n) AS ng,
             sum(CAST(s2 AS DOUBLE) / 1e12
                 - (CAST(s1 AS DOUBLE) / 1000000.0)
                   * (CAST(s1 AS DOUBLE) / 1000000.0)
                   / CAST(n AS DOUBLE)) AS ssw_g
      FROM cells GROUP BY 1
    ),
    gtot AS (SELECT d, sum(s1) AS S1, CAST(sum(n) AS BIGINT) AS N
             FROM cells GROUP BY 1),
    ssb_d AS (
      SELECT c.d,
             sum((CAST(c.s1 AS DOUBLE) / 1000000.0)
                 * (CAST(c.s1 AS DOUBLE) / 1000000.0)
                 / CAST(c.n AS DOUBLE))
             - (CAST(any_value(gtot.S1) AS DOUBLE) / 1000000.0)
               * (CAST(any_value(gtot.S1) AS DOUBLE) / 1000000.0)
               / CAST(any_value(gtot.N) AS DOUBLE) AS b
      FROM cells c JOIN gtot ON gtot.d = c.d GROUP BY c.d
    ),
    tot_g AS (
      SELECT ssw, ntot, k FROM (
        SELECT sum(ssw_g) OVER w AS ssw,
               CAST(sum(ng) OVER w AS BIGINT) AS ntot,
               CAST(sum(1) OVER w AS BIGINT) AS k,
               row_number() OVER (ORDER BY g DESC) AS rn
        FROM per_g
        WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)) x
      WHERE rn = 1
    ),
    tot_b AS (
      SELECT ssb FROM (
        SELECT sum(b) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ssb,
               row_number() OVER (ORDER BY d DESC) AS rn
        FROM ssb_d) x
      WHERE rn = 1
    ),
    cent AS (SELECT g, d, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                          / 1000000.0 AS mu FROM cells),
    scat AS (SELECT g, sqrt(greatest(ssw_g / CAST(ng AS DOUBLE), 0.0))
                    AS sc FROM per_g),
    pd AS (
      SELECT a.g AS ga, b.g AS gb,
             sqrt(sum((a.mu - b.mu) * (a.mu - b.mu))) AS m
      FROM cent a JOIN cent b ON a.g < b.g AND a.d = b.d
      GROUP BY 1, 2
    ),
    sym AS (SELECT ga, gb, m FROM pd
            UNION ALL SELECT gb, ga, m FROM pd),
    ratio AS (
      SELECT sym.ga, max((sa.sc + sb.sc) / sym.m) AS worst
      FROM sym JOIN scat sa ON sa.g = sym.ga
               JOIN scat sb ON sb.g = sym.gb
      GROUP BY 1
    ),
    db AS (
      SELECT cdb / CAST(ck AS DOUBLE) AS v FROM (
        SELECT sum(worst) OVER w AS cdb, sum(1) OVER w AS ck,
               row_number() OVER (ORDER BY ga DESC) AS rn
        FROM ratio
        WINDOW w AS (ORDER BY ga ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)) x
      WHERE rn = 1
    )
    SELECT tot_g.k, tot_g.ntot AS n,
           CASE WHEN tot_g.k >= 2 AND tot_g.ssw > 0
                     AND CAST(tot_g.ntot AS DOUBLE) > CAST(tot_g.k AS DOUBLE)
                THEN round((tot_b.ssb / (CAST(tot_g.k AS DOUBLE) - 1.0))
                           / (tot_g.ssw / (CAST(tot_g.ntot AS DOUBLE)
                                           - CAST(tot_g.k AS DOUBLE))), 6)
           END AS calinski_harabasz,
           round(db.v, 6) AS davies_bouldin
    FROM tot_g, tot_b, db
    """,
)
def cluster_quality_embeddings(spark, sf_dir) -> DataFrame:
    """Calinski–Harabasz + Davies–Bouldin over the embeddings table with
    labels = vec_id % 4 (similarity.cluster_quality_report) — the
    NEGATIVE control on purpose: a random partition of a random vector
    cloud must score CH ≈ 1 and DB high, and this query pins that both
    engines compute exactly that (the positive direction — separated
    clusters → CH in the thousands, DB ≈ 0 — is pytest-pinned).  One
    map-side-partially-aggregated posexplode to per-(label, dim) exact
    sums (k·d shuffle rows, never corpus·d), bounded k² centroid pairs,
    ordered folds; the single row value-checked."""
    from .operators.similarity import cluster_quality_report

    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 4).cast("string").alias("g"),
        F.col("embedding").alias("e"),
    )
    return cluster_quality_report(emb, "e", "g", dim=64)


@query(
    "graph_summary_spans_media",
    oracle="""
    WITH x AS (SELECT DISTINCT doc_id, s.media_ref AS m
               FROM (SELECT doc_id, unnest(spans) AS s
                     FROM read_parquet('__SPANS_GLOB__'))
               WHERE s.media_ref IS NOT NULL),
    e AS (SELECT DISTINCT l.m AS a, r.m AS b
          FROM x l JOIN x r ON l.doc_id = r.doc_id AND l.m < r.m),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    ds AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                  CAST(sum(d) AS BIGINT) AS sd,
                  CAST(max(d) AS BIGINT) AS mx
           FROM deg),
    pr AS (SELECT du.d AS x, dv.d AS y
           FROM sym JOIN deg du ON du.u = sym.u
                    JOIN deg dv ON dv.u = sym.v),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n2,
                 CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
          FROM pr)
    SELECT ds.nn AS n_nodes,
           CAST(m.n2 / 2 AS BIGINT) AS n_edges,
           CASE WHEN ds.nn >= 2 THEN
             round(2.0 * (CAST(m.n2 AS DOUBLE) / 2.0)
                   / (CAST(ds.nn AS DOUBLE)
                      * (CAST(ds.nn AS DOUBLE) - 1.0)), 6)
           END AS density,
           round(CAST(ds.sd AS DOUBLE) / CAST(ds.nn AS DOUBLE), 6)
             AS avg_degree,
           ds.mx AS max_degree,
           CASE WHEN CAST(m.n2 AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(m.n2 AS DOUBLE) * syy - sy * sy > 0
                THEN round((CAST(m.n2 AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(m.n2 AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(m.n2 AS DOUBLE) * syy - sy * sy)), 6)
           END AS assortativity
    FROM ds, m
    """,
)
def graph_summary_spans_media(spark, sf_dir) -> DataFrame:
    """Structural summary of the media co-occurrence graph
    (graph.graph_summary): node/edge counts, density, degree moments,
    and the degree ASSORTATIVITY — the first thing to check before
    trusting the pagerank/HITS/community readouts over the same graph
    (hub-and-spoke r < 0 vs peer-clustered r > 0; star = −1 and
    regular-graph NULL contracts pytest-pinned).  Exact degrees,
    decimal moments over the symmetrized edge pairs, one round-6
    division.  The single row value-checked."""
    from .operators.graph import graph_summary

    corpus = _spans_corpus(spark)
    spans = load_spans(spark, corpus)
    x = (
        spans.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.media_ref").isNotNull())
        .select("doc_id", F.col("sp.media_ref").alias("m"))
        .distinct()
    )
    left, right = x.alias("l"), x.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.m") < F.col("r.m")),
        )
        .select(F.col("l.m").alias("src"), F.col("r.m").alias("dst"))
        .distinct()
    )
    return graph_summary(edges)


@query(
    "wasserstein_grouped_events",
    oracle="""
    WITH a AS (
      SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_id % 2 = 0 AND event_type IS NOT NULL
        AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type AS g,
             CAST(round((value + CASE WHEN event_type = 'error'
                                      THEN 5.0 ELSE 0.0 END)
                        * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_id % 2 = 1 AND event_type IS NOT NULL
        AND value IS NOT NULL
    ),
    u AS (SELECT g, vm, 1 AS ca, 0 AS cb FROM a
          UNION ALL SELECT g, vm, 0, 1 FROM b),
    per AS (SELECT g, vm, sum(ca) AS na, sum(cb) AS nb
            FROM u GROUP BY g, vm),
    c AS (SELECT g, vm,
                 sum(na) OVER w AS cum_a, sum(nb) OVER w AS cum_b,
                 lead(vm) OVER (PARTITION BY g ORDER BY vm) AS nxt
          FROM per
          WINDOW w AS (PARTITION BY g ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT g,
                 CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb
          FROM per GROUP BY g),
    d AS (SELECT c.g,
                 abs(CAST(c.cum_a AS HUGEINT) * t.tb
                     - CAST(c.cum_b AS HUGEINT) * t.ta)
                 * (c.nxt - c.vm) AS term
          FROM c JOIN t ON t.g = c.g WHERE c.nxt IS NOT NULL),
    area AS (SELECT g, sum(term) AS ar FROM d GROUP BY g)
    SELECT t.g AS event_type, t.ta AS n_a, t.tb AS n_b,
           CASE WHEN t.ta > 0 AND t.tb > 0 THEN
             round(CAST(coalesce(area.ar, 0) AS DOUBLE)
                   / (CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE))
                   / 1000000.0, 6)
           END AS w1
    FROM t LEFT JOIN area ON area.g = t.g
    """,
)
def wasserstein_grouped_events(spark, sf_dir) -> DataFrame:
    """Per-type exact 1-Wasserstein drift between two event snapshots
    (drift.wasserstein_drift_grouped): even-id vs odd-id values with a
    PLANTED +5.0 shift on 'error' only — the per-key drift panel in the
    metric's own units: peers read 1.5–4 units (the even/odd sampling
    noise floor at n≈1000 per side) and error reads 8.6 — the noise
    floor PLUS the planted 5, exactly the separation a drift triage
    needs,
    with every stage keyed by the group (ZERO single-partition
    exchanges — pytest-pinned; single-support groups report explicit
    rows, found by test).  All 5 rows value-checked against the
    per-group ordered replay."""
    from .operators.drift import wasserstein_drift_grouped

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("event_type", "value")
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_type",
        (
            F.col("value")
            + F.when(F.col("event_type") == "error", F.lit(5.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("value"),
    )
    return wasserstein_drift_grouped(
        a, b, "value", "event_type", 0.0, 510.0, bins=1 << 10
    )


@query(
    "interarrival_users_events",
    oracle="""
    WITH base AS (
      SELECT user_id AS k, epoch_us(ts) AS us, event_id AS tb
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    g AS (
      SELECT k, us - lag(us) OVER (PARTITION BY k ORDER BY us, tb) AS gap
      FROM base
    ),
    agg AS (
      SELECT k,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS s2,
             CAST(max(gap) AS BIGINT) AS mx
      FROM g GROUP BY k
    )
    SELECT k AS user_id, n_events, n_gaps,
           CASE WHEN n_gaps >= 1
                THEN round(s1 / CAST(n_gaps AS DOUBLE) / 1e6, 6)
           END AS mean_gap_s,
           CASE WHEN n_gaps >= 2 AND s1 / CAST(n_gaps AS DOUBLE) > 0
                THEN round(sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)), 6)
           END AS cv_gap,
           CASE WHEN n_gaps >= 2 AND s1 / CAST(n_gaps AS DOUBLE) > 0
                THEN round((sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)) - 1.0)
                    / (sqrt(greatest((s2 - s1 * s1
                       / CAST(n_gaps AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))
                     / (s1 / CAST(n_gaps AS DOUBLE)) + 1.0), 6)
           END AS burstiness,
           CASE WHEN n_gaps >= 1
                THEN round(CAST(mx AS DOUBLE) / 1e6, 6)
           END AS max_gap_s
    FROM agg
    """,
)
def interarrival_users_events(spark, sf_dir) -> DataFrame:
    """Per-user inter-arrival burstiness (temporal.interarrival_profile)
    — the temporal-behavior axis lateness (disorder_profile) and
    staleness (freshness) don't measure: Goh–Barabási burstiness near
    −1 betrays scripted metronome traffic, near +1 session-bursty
    humans (both directions are anomaly signals).  Exact integer
    microsecond gaps from a keyed (ts, event_id)-ordered lag, decimal
    moments, round-6 CV/B; degenerate-key NULL contracts pinned.  All
    150 user rows value-checked."""
    from .operators.temporal import interarrival_profile

    ev = load_table(spark, sf_dir, "events")
    return interarrival_profile(ev, "user_id", "ts", "event_id")


@query(
    "mix_conformance_events",
    oracle="""
    WITH counts AS (
      SELECT CAST(event_type AS VARCHAR) AS category,
             CAST(count(*) AS BIGINT) AS observed
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    decl AS (
      SELECT category, CAST(expected_share AS DOUBLE) AS expected_share
      FROM (VALUES
        ('click', 0.25), ('error', 0.1), ('purchase', 0.2),
        ('signup', 0.2), ('view', 0.2), ('refund', 0.05))
        AS t(category, expected_share)
    ),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM counts),
    j AS (
      SELECT coalesce(d.category, c.category) AS category,
             coalesce(c.observed, 0) AS observed,
             d.expected_share
      FROM decl d FULL OUTER JOIN counts c ON c.category = d.category
    )
    SELECT j.category, j.observed, j.expected_share,
           CASE WHEN j.expected_share IS NOT NULL
                THEN round(j.expected_share * CAST(tot.n AS DOUBLE), 6)
           END AS expected_n,
           CASE WHEN j.expected_share IS NOT NULL THEN
             round((CAST(j.observed AS DOUBLE)
                    - j.expected_share * CAST(tot.n AS DOUBLE))
                   * (CAST(j.observed AS DOUBLE)
                      - j.expected_share * CAST(tot.n AS DOUBLE))
                   / (j.expected_share * CAST(tot.n AS DOUBLE)), 6)
           END AS chi2_term,
           j.expected_share IS NULL AS undeclared
    FROM j, tot
    """,
)
def mix_conformance_events(spark, sf_dir) -> DataFrame:
    """Declared-mix conformance (stats.mix_conformance): the event
    stream checked against a CONTRACT mix that deliberately disagrees
    with reality — it declares error at 10% (actual ~20%) and a
    'refund' type that doesn't exist — so the report must show error's
    chi² term dominating AND the declared-but-absent refund carrying
    its full expected mass (declared-but-absent and observed-but-
    undeclared are the two loudest contract violations, never silently
    pooled).  All 6 rows value-checked."""
    from .operators.stats import mix_conformance

    ev = load_table(spark, sf_dir, "events")
    return mix_conformance(
        ev,
        "event_type",
        {
            "click": 0.25,
            "error": 0.10,
            "purchase": 0.20,
            "signup": 0.20,
            "view": 0.20,
            "refund": 0.05,
        },
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
    from .operators.text import blocklist_scan

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_scan(
        docs, "text", "doc_id", ["ghostword", "join", "merge"]
    )


@query(
    "detected_period_events",
    oracle="""
    WITH src AS (
      SELECT event_type, ts,
             value + CASE WHEN event_type = 'click'
                          AND (epoch_us(ts) // 86400000000) % 7 = 2
                          THEN 20.0
                     ELSE 0.0 END AS v
      FROM events
    ),
    cells AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS b,
             CAST(round(round(avg(v), 6) * 1000000) AS BIGINT) AS vm
      FROM src
      WHERE ts IS NOT NULL AND v IS NOT NULL
      GROUP BY 1, 2
    ),
    l AS (SELECT unnest(range(2, 11)) AS lag),
    p AS (
      SELECT x.event_type, l.lag, x.vm AS xv, y.vm AS yv
      FROM cells x CROSS JOIN l
      JOIN cells y ON y.event_type IS NOT DISTINCT FROM x.event_type
                  AND y.b = x.b + l.lag * 86400000000
    ),
    m AS (
      SELECT event_type, lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(xv AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(yv AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(xv AS HUGEINT) * xv) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yv AS HUGEINT) * yv) AS DOUBLE) AS syy,
             CAST(sum(CAST(xv AS HUGEINT) * yv) AS DOUBLE) AS sxy
      FROM p GROUP BY 1, 2
    ),
    acf AS (
      SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
             CASE WHEN n_pairs >= 2 AND n_pairs * sxx - sx * sx > 0
                       AND n_pairs * syy - sy * sy > 0
                  THEN round((n_pairs * sxy - sx * sy)
                       / (sqrt(n_pairs * sxx - sx * sx)
                          * sqrt(n_pairs * syy - sy * sy)), 6)
             END AS acf
      FROM m
    ),
    best AS (
      SELECT * FROM acf
      QUALIFY row_number() OVER (PARTITION BY event_type
        ORDER BY acf DESC NULLS LAST, lag ASC) = 1
    )
    SELECT event_type,
           CASE WHEN acf IS NOT NULL AND acf > 0 THEN lag END AS period,
           CASE WHEN acf IS NOT NULL AND acf > 0 THEN acf END
             AS period_acf,
           n_pairs
    FROM best
    """,
)
def detected_period_events(spark, sf_dir) -> DataFrame:
    """Detected period per event type (temporal.detected_period_report,
    lags 2–10) with a PLANTED weekly cycle on 'click' (+20 on every
    epoch-day ≡ 2 mod 7 — pure integer arithmetic, because Spark and
    DuckDB NUMBER dayofweek differently (1–7 Sunday-first vs 0–6) and
    a calendar plant would diverge, found by parity) — 'ACF finds the
    period' made literal: click reports period 7 at ACF 0.71 while
    peers report only noise lags.  max_lag capped below the first
    harmonic: on a 30-day window the lag-14 harmonic has HIGHER noisy
    ACF than the fundamental (17 vs 23 pairs — found by running it),
    the known ACF-period caveat, documented rather than hidden.  All 5
    rows value-checked."""
    from .operators.temporal import detected_period_report

    raw = load_table(spark, sf_dir, "events")
    us = stats._epoch_us_col(raw, "ts")
    epoch_day = F.floor(us / F.lit(86400000000.0)).cast("long")
    ev = raw.select(
        "event_type",
        "ts",
        (
            F.col("value")
            + F.when(
                (F.col("event_type") == "click")
                & (F.pmod(epoch_day, F.lit(7)) == 2),
                F.lit(20.0),
            ).otherwise(F.lit(0.0))
        ).alias("v"),
    )
    return detected_period_report(
        ev, ["event_type"], "ts", "v", 86400, max_lag=10
    )


@query(
    "quantile_ci_events_value",
    oracle="""
    WITH s AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
    o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    r AS (
      SELECT n,
             greatest(CAST(ceil(0.5 * CAST(n AS DOUBLE) - 1e-9) AS BIGINT),
                      1) AS rpt,
             greatest(CAST(floor(0.5 * CAST(n AS DOUBLE)
                     - 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.5 * 0.5))
                     AS BIGINT), 1) AS rlo,
             least(CAST(ceil(0.5 * CAST(n AS DOUBLE)
                   + 1.959964 * sqrt(CAST(n AS DOUBLE) * 0.5 * 0.5))
                   AS BIGINT), n) AS rhi
      FROM t
    )
    SELECT CAST(0.5 AS DOUBLE) AS prob, r.n, r.rpt AS rank,
           (SELECT v FROM o WHERE rn = r.rpt) AS value,
           r.rlo AS rank_lo,
           (SELECT v FROM o WHERE rn = r.rlo) AS ci_lo,
           r.rhi AS rank_hi,
           (SELECT v FROM o WHERE rn = r.rhi) AS ci_hi
    FROM r
    """,
)
def quantile_ci_events_value(spark, sf_dir) -> DataFrame:
    """Distribution-free 95% CI for the median event value
    (stats.quantile_ci) — the error bar for every median this engine
    reports, from the classic order-statistic construction (the
    binomial count below the true quantile is what's normal, never the
    data): three exact rank probes of the same bounded-prefix rank
    intervals, no bootstrap replication.  The single row — point
    estimate, both CI ranks and values — value-checked against the
    ordered replay."""
    from .operators.stats import quantile_ci

    ev = load_table(spark, sf_dir, "events")
    return quantile_ci(ev, "value", 0.5, 0.0, 500.0, bins=1 << 10)


@query(
    "error_rate_ci_events",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    )
    SELECT g AS event_type, n, x,
           round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           round(greatest(
             (CAST(x AS DOUBLE) + 1.959964 * 1.959964 / 2.0)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964)
             - 1.959964
               * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)
                      + 1.959964 * 1.959964
                        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               * CAST(n AS DOUBLE)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964), 0.0), 6)
             AS ci_lo,
           round(least(
             (CAST(x AS DOUBLE) + 1.959964 * 1.959964 / 2.0)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964)
             + 1.959964
               * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE)
                      + 1.959964 * 1.959964
                        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               * CAST(n AS DOUBLE)
               / (CAST(n AS DOUBLE) + 1.959964 * 1.959964), 1.0), 6)
             AS ci_hi
    FROM c
    """,
)
def error_rate_ci_events(spark, sf_dir) -> DataFrame:
    """Wilson 95% interval per event type for the is-this-an-error rate
    (stats.proportion_ci) — the deliberately degenerate-by-construction
    fixture: each type's rate is exactly 0 or exactly 1, where the
    naive Wald interval collapses to zero width and Wilson keeps honest
    nonzero uncertainty (the '0 errors in 50 rows ≠ certainty' case,
    pytest-pinned at [0, 7.1%]).  Exact counts, closed form in
    identical operand order; all 5 rows value-checked."""
    from .operators.stats import proportion_ci

    ev = load_table(spark, sf_dir, "events")
    return proportion_ci(
        ev, F.col("event_type") == "error", "event_type"
    )


@query(
    "correlation_ci_lineitem",
    oracle="""
    WITH q AS (
      SELECT CAST(round(l_quantity * 1000000.0) AS BIGINT) AS am,
             CAST(round(l_extendedprice * 1000000.0) AS BIGINT) AS bm
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(am AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(bm AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(am AS HUGEINT) * am) AS DOUBLE) AS sxx,
             CAST(sum(CAST(bm AS HUGEINT) * bm) AS DOUBLE) AS syy,
             CAST(sum(CAST(am AS HUGEINT) * bm) AS DOUBLE) AS sxy
      FROM q
    ),
    c AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS r,
             1.959964 / sqrt(CAST(n AS DOUBLE) - 3.0) AS se
      FROM m
    ),
    f AS (
      SELECT n, r, se,
             0.5 * ln((1.0 + r) / (1.0 - r)) AS zf,
             (n >= 4 AND abs(round(r, 6)) < 1.0) AS ok
      FROM c
    )
    SELECT n, round(r, 6) AS r,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf - se)) - 1.0)
                   / (exp(2.0 * (zf - se)) + 1.0), 6) END AS ci_lo,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf + se)) - 1.0)
                   / (exp(2.0 * (zf + se)) + 1.0), 6) END AS ci_hi
    FROM f
    """,
)
def correlation_ci_lineitem(spark, sf_dir) -> DataFrame:
    """Fisher-z 95% interval for corr(l_quantity, l_extendedprice)
    (stats.correlation_ci) — completing the engine's error-bar trio
    (quantile_ci: location, proportion_ci: rates, this: association):
    the generator draws the two independently, so the interval must
    STRADDLE ZERO — the 'is 0.01 real?' reading this CI exists to give.
    Exact decimal moments; atanh/tanh written explicitly as ln/exp
    compositions evaluated in identical order; the degeneracy gate
    compares the ROUND-6 r (a perfect line's double r slips past
    |r| < 1 — caught by test).  The single row value-checked."""
    from .operators.stats import correlation_ci

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_ci(li, "l_quantity", "l_extendedprice")


@query(
    "correlation_ci_by_flag_lineitem",
    oracle="""
    WITH q AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity * 1000000.0) AS BIGINT) AS am,
             CAST(round(l_discount * 1000000.0) AS BIGINT) AS bm
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(am AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(bm AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(am AS HUGEINT) * am) AS DOUBLE) AS sxx,
             CAST(sum(CAST(bm AS HUGEINT) * bm) AS DOUBLE) AS syy,
             CAST(sum(CAST(am AS HUGEINT) * bm) AS DOUBLE) AS sxy
      FROM q GROUP BY 1
    ),
    c AS (
      SELECT g, n,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS r,
             1.959964 / sqrt(CAST(n AS DOUBLE) - 3.0) AS se
      FROM m
    ),
    f AS (
      SELECT g, n, r, se,
             0.5 * ln((1.0 + r) / (1.0 - r)) AS zf,
             (n >= 4 AND abs(round(r, 6)) < 1.0) AS ok
      FROM c
    )
    SELECT g AS l_returnflag, n, round(r, 6) AS r,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf - se)) - 1.0)
                   / (exp(2.0 * (zf - se)) + 1.0), 6) END AS ci_lo,
           CASE WHEN ok THEN
             round((exp(2.0 * (zf + se)) - 1.0)
                   / (exp(2.0 * (zf + se)) + 1.0), 6) END AS ci_hi
    FROM f
    """,
)
def correlation_ci_by_flag_lineitem(spark, sf_dir) -> DataFrame:
    """Per-returnflag Fisher-z CI for corr(l_quantity, l_discount)
    (stats.grouped_correlation_ci) — the association error-bar PANEL.
    A/N straddle zero; R's interval EXCLUDES it at r = −0.021
    ([−0.035, −0.007]) — at n = 20k even a trivial association is
    statistically distinguishable from zero, which is precisely the
    large-n phenomenon the effect-size wave documents: the CI says
    'real', Cliff's-δ-sized reasoning says 'negligible', and a reader
    needs both.  Grouped ≡ ungrouped-per-slice pytest-pinned, along
    with the small-n-mirage demonstration.  All 3 rows
    value-checked."""
    from .operators.stats import grouped_correlation_ci

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_correlation_ci(
        li, "l_quantity", "l_discount", "l_returnflag"
    )


def _load_constant_oracles() -> None:
    import json
    from pathlib import Path

    path = Path(__file__).with_name("oracle_constants.json")
    if not path.exists():
        return
    for name, spec in json.loads(path.read_text()).items():
        if name in QUERIES and name not in ORACLES:
            ORACLES[name] = _constant_oracle_sql(spec)


_load_constant_oracles()


# ---------------------------------------------------------------------------
# Driver correctness window ordering.
#
# The round driver oracles only the FIRST 50 entries of ``queries()`` (dict
# insertion order).  Registration order above is historical/topical, which
# left 36 of 86 queries outside the window in CORRECTNESS_r03 (VERDICT r3,
# "Next round" item 1).  Re-emit the registry with an explicit window:
# every query family that lacked an r3 driver row is promoted into the
# first 50, padded with one representative per already-green core family
# so each component keeps fresh driver evidence.  The demoted queries are
# same-family variants whose siblings stay in the window; all 86 remain
# registered, pytest-oracled (tests/test_oracles.py), and runnable.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: tuple[str, ...] = (
    # -- representatives of r3-green core families (11) --
    # (schema_infer_events_props demoted for the r4 eighth wave: green r3
    # driver row ×7 variants, operator unchanged since; inference keeps
    # stream_incremental_schema + schema_merge_checkpoint_snapshots +
    # schema_apply_events_props in-window, the driver's entry() smoke runs
    # the flagship every round, and all seven infer variants stay golden +
    # hypothesis + oracle-pytest-checked at the same sf0.01 every CI run)
    # (schema_infer_grouped_event_type demoted: green r3 driver row; the
    # U8 fold keeps schema_merge_checkpoint_snapshots in-window and the
    # grouped fold is partition-invariance property-tested every CI run)
    # (stats_lineitem demoted for the r4 fifth wave: green r3 driver row;
    # the single-pass multi-aggregate shape keeps spans_single_pass_audit
    # in-window and histogram/candidate-keys/datatype-profile carry the
    # stats family)
    # (uniqueness_documents_doc_id demoted for the r4 seventh wave: green
    # r3 driver row, operator unchanged since; exact-distinct uniqueness
    # evidence stays in-window via candidate_keys_orders and the salted
    # path is pytest-oracled at the same sf0.01 every CI run)
    # (referential_lineitem_dangling_orders demoted: green r3 driver row;
    # the anti-join referential shape keeps containment + spans audit
    # evidence and is pytest-oracled every CI run)
    # (drift_events_value_tdigest demoted for the r4 fifth wave: green r3
    # driver row; drift keeps PSI and the new divergence panel in-window,
    # and the t-digest path is pinned-oracle pytest-checked every CI run)
    # (dedup_minhash_documents demoted for the r4 sixteenth rotation:
    # green r3 driver row, and the dedup family banks six r3-green rows
    # (simhash/ngram/semantic/incremental/clusters), all pinned-oracle
    # pytest-checked at the same sf0.01 every CI run)
    # (dedup_clusters_ngram_documents demoted for the r4 sixth wave: green
    # r3 driver row; the CC fixpoint stays guarded by the recursive-CTE
    # oracle in pytest at the same sf0.01 every CI run)
    # (similarity_ivf_q8_topk_embeddings demoted for the r4 sixth wave:
    # green r3 driver row; the similarity family carries four green-r3
    # rows and all five variants stay pytest-oracled every CI run)
    # (curation_full_documents demoted for the r4 sixteenth rotation:
    # green r3 driver row x2 with curation_documents; the funnel runs
    # end-to-end in scripts/run_curation.py and pytest every CI run)
    # -- new in r4 (never driver-checked): subword tokenization --
    "subword_token_count_documents",
    # (pack_sequences_subword_documents and chunk_subword_documents demoted
    # for the r4-continuation families: subword keeps token_count in-window
    # and word-mode packing + chunking stay in-window)
    # -- the 36 queries with no (or stale-r2) driver row (VERDICT r3) --
    # (spans_violation_rows demoted for the r4 seventh wave: green r2
    # driver row, operator unchanged since; the violation-rows shape keeps
    # the fused spans_single_pass_audit and rule_verdicts_events in-window
    # and stays pytest-oracled at the same sf0.01 every CI run)
    "histogram_events_value",  # r4: distribution-profile family
    # (spans_duplicate_doc_ids demoted past the window: salted uniqueness
    # keeps two in-window reps — uniqueness_documents_doc_id and
    # stream_duplicate_doc_ids — while the profile family had none)
    # (spans_dangling_media_refs demoted: the anti-join referential shape
    # keeps referential_lineitem_dangling_orders in-window and the spans
    # audit covers dangling refs)
    # (spans_single_pass_audit demoted for the r4 sixteenth rotation:
    # green r2 driver row; the fused audit IS the flagship the driver's
    # entry() smoke and bench.py execute every round)
    # (spans_schema_validation_verdicts demoted for the r4-continuation
    # families: V1 validation keeps schema_validation_documents_struct and
    # the fused spans_single_pass_audit in-window)
    # (schema_validation_documents_struct demoted for the r4 sixteenth
    # rotation: green r2 driver row; V1 validation keeps
    # draft4_keywords_events - the full-vocabulary superset - in-window)
    # (multimodal_media_features demoted: the stub-era features query is
    # superseded by the four real-codec multimodal reps below)
    # (multimodal_resize_real_images demoted for the r4 fifth wave: the
    # real-codec family keeps TWO in-window reps — mjpeg_frame_features
    # and real_codec_features (280 payloads across six formats) — and the
    # resample kernel stays oracle-pytest-checked at the same sf0.01)
    # (multimodal_mp4_frame_plan demoted for the r4-continuation families:
    # mjpeg_frame_features exercises the same ISO BMFF demux end-to-end)
    "multimodal_mjpeg_frame_features",  # r4: fully real demux→range-read→
    # JPEG-decode (replaces the sha256-stub frame features in the window)
    # (multimodal_real_codec_features demoted for the r4 eighth-continuation
    # wave: mjpeg_frame_features keeps the real-codec family in-window with
    # the strictly-harder demux→range-read→decode path, and the 280-payload
    # six-format codec battery stays pinned-oracle pytest-checked every CI
    # run)
    "constraint_suggestions_events",  # r4: deequ-style suggestion loop
    # (multimodal_frame_plan_from_durations demoted past the window: its
    # synthetic-horizon planner is superseded by multimodal_mp4_frame_plan's
    # real ISO BMFF demux, and multimodal keeps 5 in-window representatives)
    "stream_incremental_schema",
    # (stream_violation_window_counts demoted: streaming keeps 4 reps and
    # windowed rule counts cover the same watermarked-window shape)
    # (stream_duplicate_doc_ids demoted for the r4 fifth wave: streaming
    # keeps incremental-schema and rule-window reps in-window, batch
    # uniqueness keeps uniqueness_documents_doc_id, and the stateful
    # stream stays oracle-pytest-checked at the same sf0.01)
    # (stream_schema_drift_alerts demoted for the r4-continuation families:
    # streaming keeps in-window reps across incremental/rule shapes)
    "stream_rule_window_counts",
    "checkpoint_resume_state",
    "schema_merge_checkpoint_snapshots",
    "decontam_documents",
    "pack_sequences_documents",
    # (packing_stats_documents demoted for the r4-continuation families:
    # packing keeps pack_sequences + chunk_documents in-window)
    # (chunk_documents demoted for the r4 sixteenth rotation: the pack
    # family keeps pack_sequences_documents in-window and chunking stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    # (repeated_spans_documents demoted for the r4 tenth wave: its
    # sliding-window distinct-doc-frequency shape is evidenced in-window
    # by heavy_hitters_events_user and the r3-green corpus line-dedup;
    # stays oracle-pytest-checked at the same sf0.01 every CI run)
    # (schema_history_transitions demoted for the r4 eleventh wave: the
    # schema-lifecycle family keeps merge-snapshots, evolution-DDL, and
    # checkpoint_resume_state in-window; transitions stay oracle-pytest-
    # checked at the same sf0.01 every CI run)
    # (normalize_text_unicode demoted for the r4 tenth wave: text keeps
    # lm_perplexity_documents in-window and quality/pii/repetition carry
    # r3-green rows; the JVM-side normalization path stays oracle-pytest-
    # checked at the same sf0.01 every CI run)
    "rule_verdicts_events",
    # (rule_violation_rows_events demoted: rule DSL keeps rule_verdicts +
    # stream_rule_window_counts in-window)
    "quota_sample_documents",
    "schema_apply_events_props",
    # (dead_columns_documents demoted for the r4 twelfth wave: the
    # profile family keeps datatype_profile_events +
    # null_cooccurrence_events + histogram_events_value in-window;
    # stays oracle-pytest-checked at the same sf0.01 every CI run)
    "skew_report_media_refs",
    "schema_evolution_ddl",
    # (dedup_incremental_minhash demoted for the r4 fifth wave: green r3
    # driver row (pinned); dedup keeps minhash-campaign + CC clusters
    # in-window and the incremental probe is pytest-oracled every CI run)
    # (split_anomaly_verdicts demoted for the r4 eleventh wave: the
    # anomaly-verdict family keeps metric_anomalies_events in-window and
    # the spans-audit shape keeps spans_single_pass_audit; stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    # (schema_compat_splits demotion rationale at the tail of this tuple)
    # -- r4 continuation (new families, never driver-checked) --
    "metric_anomalies_events",      # metrics repo + history anomalies
    "candidate_keys_orders",        # key discovery
    # (fd_orders_nation demoted for the r4 ninth wave: the dependency-
    # discovery family keeps candidate_keys_orders + the IND sweep
    # inclusion_profile_orders_customer in-window; FD confidence stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    # (datatype_profile_events demoted in the twenty-first rotation:
    # the profiling family keeps candidate_keys + format_inference +
    # constraint_suggestions + histogram in-window; the slot funds the
    # session's statistical-inference family, which had NO window rep)
    # (decontam_bloom_documents demoted for the r4 seventh wave: its
    # results are exact-anti-join-equivalent BY CONSTRUCTION (bitmap
    # prefilter + exact verification), decontam keeps exact + semantic
    # reps in-window, and the Bloom path is plan-asserted + pytest-oracled
    # at the same sf0.01 every CI run)
    # -- r4 second continuation (new families) --
    # (drift_psi_events_value demoted for the r4 eighth wave: the
    # divergence panel below computes the identical psi_term binning as
    # one of its five statistics, so in-window PSI evidence is retained
    # by drift_divergence_events_value; the scalar PSI fold stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    "freshness_events",             # recency analyzer
    "table_diff_orders",            # snapshot reconciliation
    # (mixture_sample_documents demoted for the r4 ninth wave: sampling
    # keeps quota_sample_documents in-window and det/stratified carry
    # green r3 rows; the temperature-mixing path stays oracle-pytest-
    # checked at the same sf0.01 every CI run)
    "lm_perplexity_documents",      # bigram-LM quality scoring
    # (decontam_semantic_embeddings demoted for the r4 eighth-continuation
    # wave: decontam keeps the n-gram rep decontam_documents in-window, the
    # embedding-cell machinery is driver-evidenced via the r3-green
    # dedup_semantic_embeddings, and the semantic variant stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    # -- r4 eighth-continuation wave (new families, never driver-checked) --
    # (disorder_profile_orders demoted in the twentieth rotation: the
    # temporal family keeps asof + cdc + resample + level_shift
    # in-window; the watermark advisor stays oracle-pytest-checked —
    # the slot funds the repair/imputation family)
    # (salted_join_orders_customer demoted in the nineteenth rotation:
    # the skew family keeps skew_report_media_refs in-window, the salted
    # == plain equality stays oracle-pytest-checked at sf0.01, and the
    # slot funds a never-checked graph-traversal modality)
    # (bpe_vocab_documents demoted in the twentieth rotation: the
    # tokenizer family keeps subword_token_count_documents in-window and
    # BPE learning stays pinned-oracle pytest-checked — the slot funds
    # the seasonal fit stage)
    # (coverage_gaps_events demoted for the r4 ninth wave: the calendar-
    # spine gap shape is evidenced in-window by resample_events_daily,
    # whose filled=true rows ARE the coverage gaps on the same per-key
    # sequence()+explode spine; stays oracle-pytest-checked at sf0.01)
    # (fd_confidence_events stays outside the window: the FD family keeps
    # fd_orders_nation in-window; confidence is pytest-oracled)
    # -- r4 fifth wave (new families, never driver-checked) --
    "asof_events_snapshots",         # as-of join vs DuckDB's native ASOF
    # (session_overlap_events demoted for the r4 fifteenth wave: the
    # temporal-join family keeps asof_events_snapshots in-window; the
    # bucketed overlap join stays oracle-pytest-checked at sf0.01)
    "cdc_compact_events",            # changelog compaction (CDC)
    # (drift_divergence_events_value demoted for the r4 eighth-continuation
    # wave: the drift family banked three green r3 driver rows
    # (exact/PSI/t-digest) and the divergence panel rides the same
    # histogram machinery, pytest-oracled at the same sf0.01 every CI run)
    # (interval_join_events demoted for the seventeenth rotation: the
    # temporal-join family keeps asof_events_snapshots + cdc_compact in
    # the window; the bucketed range join is value-checked against the
    # native theta-join oracle at the same sf0.01 every CI run)
    # (outliers_events_value demoted for the seventeenth rotation: the
    # anomaly family keeps metric_anomalies_events + level_shift_events
    # in-window; the MAD path stays oracle-pytest-checked at sf0.01)
    # -- r4 sixth wave (new families, never driver-checked) --
    "null_cooccurrence_events",      # missingness structure (planted)
    "sequence_integrity_lineitem",   # per-key sequence audit
    # (equidepth_histogram_events_value stays outside the window: the
    # distribution-profile family keeps histogram_events_value in-window;
    # equi-depth is pytest-oracled at the same sf0.01 every CI run)
    # -- r4 seventh wave (new families, never driver-checked) --
    # (heavy_hitters_events_user demoted for the r4 thirteenth wave: the
    # hot-key family keeps skew_report_media_refs in-window — the north
    # star's named skew check — and the MG-sketch path stays oracle-
    # pytest-checked at the same sf0.01 every CI run)
    "inclusion_profile_orders_customer",  # IND / FK discovery sweep
    # (monotonicity_events_value demoted for the r4 eighth wave: the
    # per-key order-audit family keeps sequence_integrity_lineitem
    # in-window — same groupBy-key single-pass shape, strictly wider
    # checks (gaps + dups + order); monotonicity stays oracle-pytest-
    # checked at the same sf0.01 every CI run)
    # (schema_compat_splits demoted for the r4 eighth wave: compat is a
    # thin report over the same merge lattice evidenced in-window by
    # schema_merge_checkpoint_snapshots + schema_evolution_ddl; stays
    # oracle-pytest-checked at the same sf0.01 every CI run)
    # -- r4 eighth wave (new families, never driver-checked) --
    # (frequent_pairs_events + cohort_retention_events demoted for the
    # eighteenth rotation: the behavioral family keeps
    # resample_events_daily in-window and both stay oracle-pytest-checked
    # at the same sf0.01 every CI run; the slots go to two genuinely new
    # modalities below — exact order statistics and storage-grade CDC)
    "resample_events_daily",         # fixed-grid resample + ffill
    # (survivorship_orders demoted for the r4 fourteenth wave: the
    # end-to-end resolve_entities_customer below runs survivorship as
    # its final stage with all three rule kinds — a strict superset;
    # the standalone query stays oracle-pytest-checked at sf0.01)
    # -- r4 ninth wave (new families, never driver-checked) --
    # (funnel_events + benford_events demoted for the seventeenth
    # rotation: the behavioral family keeps cohort_retention_events +
    # resample_events_daily in-window and the conformance/anomaly family
    # keeps metric_anomalies + level_shift; both stay oracle-pytest-
    # checked at the same sf0.01 every CI run)
    "level_shift_events",            # changepoint boundary scan
    # -- r4 tenth wave (format keyword extension, never driver-checked) --
    "format_inference_customer",       # Draft-4 format discovery profile
    # (format_violations_customer demoted for the r4 sixteenth rotation:
    # the format family keeps format_inference_customer in-window)
    # -- r4 eleventh wave (new families, never driver-checked) --
    # (fingerprint_clusters_customer demoted for the seventeenth
    # rotation: the ER family keeps resolve_entities_customer — the
    # end-to-end funnel that runs clustering as a stage — in-window)
    "arithmetic_consistency_lineitem", # cross-field invariants
    # -- r4 twelfth wave (full Draft-4 keyword vocabulary) --
    "draft4_keywords_events",          # pattern/anyOf/oneOf/dependencies
    # (join_explosion_orders_customer demoted for the seventeenth
    # rotation: the join family keeps salted_join_orders_customer +
    # asof + cdc in-window; the blast-radius profile stays oracle-
    # pytest-checked at the same sf0.01 every CI run)
    # -- r4 fourteenth wave (end-to-end entity resolution) --
    "resolve_entities_customer",       # SNM -> lev -> CC -> survivorship
    # -- r4 fifteenth wave (privacy enforcement — first in-window privacy rep) --
    "generalization_search_events",    # k-anon ladder search, chosen combo
    # -- r4 sixteenth rotation (seventh continuation session): six NEW
    # never-driver-checked families promoted --
    # (tfidf_top_terms_documents demoted in the twenty-first rotation:
    # text analytics keeps lm_perplexity + subword_token_count in-window
    # and gains the novelty signal below; TF-IDF stays pytest-oracled)
    "dsir_importance_documents",       # DSIR importance resampling
    # (pseudonymize_customer_orders demoted in the twentieth rotation:
    # privacy keeps generalization_search in-window plus the NEW
    # dp_release mechanism promoted below; pseudonymization stays
    # oracle-pytest-checked)
    "zorder_bucket_report_events",     # Z-order Morton layout evidence
    "pagerank_spans_media",            # graph centrality (exact-int PageRank)
    # (hybrid_rrf_embeddings demoted in the nineteenth rotation: the
    # similarity family keeps similarity_join_documents + the covariance
    # profile in-window; RRF fusion rides the pinned top-k machinery and
    # stays pytest-checked — the slot funds multivariate outliers)
    # -- seventeenth rotation (ninth continuation session): six NEW
    # never-driver-checked component families promoted --
    "roc_auc_events",                  # offline model eval (no-sort AUC)
    "embedding_covariance_profile",    # exact-int Gram/covariance (PCA)
    "similarity_join_documents",       # lossless prefix-filter Jaccard join
    "split_assign_documents",          # leakage-safe train/val/test splits
    "csv_ingest_events",               # CSV source + dialect sniffing
    "survival_users_events",           # Kaplan-Meier survival curves
    # -- eighteenth rotation: two new modalities --
    "exact_quantiles_events_value",    # exact no-sort order statistics
    "media_chunk_dedup",               # storage-grade CDC dedup (pinned)
    # -- nineteenth rotation: two new wave-48/49 modalities, both with
    # real mirrored-SQL oracles --
    "bfs_distances_spans_media",       # multi-source BFS hop distances
    "mahalanobis_lineitem",            # joint-distribution outliers
    # -- twentieth rotation: three new wave-52/54/57 modalities --
    "seasonal_decompose_events",       # seasonal fit (trend+seasonal+residual)
    "dp_release_events",               # seeded epsilon-DP count release
    "impute_events_value",             # median imputation with provenance
    # -- twenty-first rotation: the inference + cross-corpus-signal
    # families from waves 59-71, previously unrepresented --
    "cuped_events",                    # CUPED-adjusted experiment readout
    "novelty_documents",               # cross-corpus n-gram novelty
)


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # fail loudly at import: a typo here would silently demote
        raise RuntimeError(f"_DRIVER_WINDOW names not registered: {missing}")
    if len(set(_DRIVER_WINDOW)) != len(_DRIVER_WINDOW):
        raise RuntimeError("_DRIVER_WINDOW contains duplicates")
    ordered = list(_DRIVER_WINDOW) + [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    for registry in (QUERIES, ORACLES):
        snapshot = dict(registry)
        registry.clear()
        registry.update((n, snapshot[n]) for n in ordered if n in snapshot)


_apply_driver_window()
