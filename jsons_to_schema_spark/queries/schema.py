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
    _JSONL_DOCS_TOKEN,
    _SPANS_STRUCT_SCHEMA,
    _spans_corpus,
    _stream_tmp,
)


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

    from ..streaming.incremental import schema_drift_alert_stream

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
    from ..checkpoint import TableStateStore, checkpointed_validate
    from ..schema_algebra import canonical_json, parse_schema, schemas_to_schema

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
    from ..schema_algebra import jsons_to_schema, unify_opt
    from ..sources.sinks import SchemaHistory

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
    from ..operators.infer import apply_schema

    events = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    schema, _ = infer_from_json_column(events, "props")
    typed = apply_schema(events, "props", schema)
    return typed.select("event_id", F.col("parsed.k").alias("k"))


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
    from .. import ddl as ddl_mod
    from ..schema_algebra import json_to_schema, unify

    events = load_table(spark, sf_dir, "events")
    old, _ = infer_from_json_column(events, "props")
    new = unify(old, json_to_schema({"k": 2.5, "src": "web"}))
    stmts = ddl_mod.evolution_ddl(old, new, "local.db.events_props")
    return spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stmts)], "stmt_no long, stmt string"
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

    from ..checkpoint import TableStateStore, checkpointed_validate
    from ..schema_algebra import (
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
