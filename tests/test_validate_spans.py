"""Constraint validation over the canonical spans table — exact counts vs the
generator's expected_violations.json, span-sequence round-trip invariant, and
per-partition verdict semantics."""

import json

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import validate
from jsons_to_schema_spark.sources.spans import ensure_corpus
from jsons_to_schema_spark.sources.tables import load_media_catalog, load_spans

N_DOCS = 5000


@pytest.fixture(scope="module")
def corpus():
    return ensure_corpus(N_DOCS)


@pytest.fixture(scope="module")
def expected(corpus):
    return json.loads((corpus / "expected_violations.json").read_text())


@pytest.fixture(scope="module")
def spans_df(spark, corpus):
    return load_spans(spark, corpus)


def test_duplicate_doc_ids_exact(spark, spans_df, expected):
    dups = validate.duplicate_doc_ids(spans_df).collect()
    assert len(dups) == expected["duplicate_doc_ids"]
    assert all(r.cnt == 2 for r in dups)


def test_dangling_media_refs_exact(spark, spans_df, corpus, expected):
    cat = load_media_catalog(spark, corpus)
    dang = validate.dangling_media_refs(spans_df, cat)
    assert dang.count() == expected["dangling_media_ref_spans"]
    # every reported ref is the injected "m-99" family
    assert all(
        r.media_ref.startswith("m-99") for r in dang.select("media_ref").collect()
    )


def test_row_checks_exact(spark, spans_df, expected):
    flagged = validate.with_check_flags(spans_df)
    fails = flagged.agg(
        F.sum((~F.col("ok_monotonic_offsets")).cast("long")).alias("nonmono"),
        F.sum((~F.col("ok_text_present")).cast("long")).alias("nulltext"),
    ).first()
    assert fails.nonmono == expected["non_monotonic_rows"]
    # null_text_spans counts spans; ok_text_present flags ROWS — a row fails
    # if it contains >=1 null-text span, so row-fails <= span count
    assert 1 <= fails.nulltext <= expected["null_text_spans"]
    # exact span-level count via explode
    span_nulls = (
        spans_df.select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "text") & F.col("s.text").isNull())
        .count()
    )
    assert span_nulls == expected["null_text_spans"]


def test_partition_verdicts_cover_all_rows(spark, spans_df, expected):
    flagged = validate.with_check_flags(spans_df)
    verdicts = validate.partition_verdicts(flagged).collect()
    assert sum(r.n_rows for r in verdicts) == expected["n_rows"]
    assert any(not r.passed for r in verdicts)  # injected violations exist
    total_failed = sum(r.n_failed for r in verdicts)
    assert total_failed >= expected["non_monotonic_rows"]


def test_violation_rows_capped_and_labeled(spark, spans_df):
    flagged = validate.with_check_flags(spans_df)
    v = validate.row_violations(flagged, cap_per_check=2).collect()
    by_check = {}
    for r in v:
        by_check.setdefault(r.check, []).append(r.doc_id)
    for check, ids in by_check.items():
        assert len(ids) <= 2, check


def test_verdict_report_matches_separate_passes(spark, spans_df, expected):
    """The fused single-scan verdict_report must reproduce exactly what the
    separate partition_verdicts + row_violations passes compute."""
    rep = validate.verdict_report(spans_df, cap_per_check=50).cache()
    try:
        v_fused = {
            (r.partition_id, r.n_rows, r.n_failed, r.passed)
            for r in validate.verdicts_from_report(rep).collect()
        }
        flagged = validate.with_check_flags(spans_df)
        v_sep = {
            (r.partition_id, r.n_rows, r.n_failed, r.passed)
            for r in validate.partition_verdicts(flagged).collect()
        }
        assert v_fused == v_sep
        viol_fused = {
            (r.doc_id, r.check)
            for r in validate.violations_from_report(rep, 50).collect()
        }
        viol_sep = {
            (r.doc_id, r.check)
            for r in validate.row_violations(flagged, 50).collect()
        }
        assert viol_fused == viol_sep
        assert viol_fused  # corpus plants violations
    finally:
        rep.unpersist()


def test_single_pass_audit_matches_separate_passes(spark, spans_df):
    """The fused ONE-scan audit (inference + verdicts + violation samples in
    one groupBy(partition) job, merged driver-side) must reproduce the
    separate passes bit-for-bit: same canonical schema, same verdicts, same
    capped violations."""
    from jsons_to_schema_spark.operators.audit_pass import single_pass_audit
    from jsons_to_schema_spark.operators.infer_native import NativeInferencePlan
    from jsons_to_schema_spark.schema_algebra import canonical_json

    res = single_pass_audit(spans_df, cap_per_check=50)
    schema_sep, n_sep = NativeInferencePlan(spans_df).run()
    assert canonical_json(res.schema) == canonical_json(schema_sep)
    assert res.n_docs == n_sep

    flagged = validate.with_check_flags(spans_df)
    v_sep = {
        (r.partition_id, r.n_rows, r.n_failed, r.passed)
        for r in validate.partition_verdicts(flagged).collect()
    }
    v_fused = {
        (r.partition_id, r.n_rows, r.n_failed, r.passed)
        for r in res.verdicts.collect()
    }
    assert v_fused == v_sep

    viol_sep = {
        (r.doc_id, r.check) for r in validate.row_violations(flagged, 50).collect()
    }
    viol_fused = {(r.doc_id, r.check) for r in res.violations.collect()}
    assert viol_fused == viol_sep and viol_fused


def test_single_pass_audit_partition_invariant(spark, spans_df):
    """Repartitioning must not change the audit's schema, violation set, or
    verdict totals (partition ids/groupings change; the merged results are
    the associative fold and must not)."""
    from jsons_to_schema_spark.operators.audit_pass import single_pass_audit
    from jsons_to_schema_spark.schema_algebra import canonical_json

    results = []
    for k in (1, 3, 16):
        res = single_pass_audit(spans_df.repartition(k), cap_per_check=1000)
        results.append(
            (
                canonical_json(res.schema),
                res.n_docs,
                frozenset((r.doc_id, r.check) for r in res.violations.collect()),
                sum(r.n_failed for r in res.verdicts.collect()),
                sum(r.n_rows for r in res.verdicts.collect()),
            )
        )
    assert results[0] == results[1] == results[2]


def test_span_sequence_roundtrip_invariant(spark, spans_df):
    """BASELINE.json per-row invariant: (kind, text, media_ref, order) of
    every span survives the validation pipeline byte-for-byte."""
    flagged = validate.with_check_flags(spans_df)
    sample_in = (
        spans_df.orderBy("doc_id").limit(100).select("doc_id", "spans").collect()
    )
    sample_out = (
        flagged.orderBy("doc_id").limit(100).select("doc_id", "spans").collect()
    )
    for a, b in zip(sample_in, sample_out):
        assert a.doc_id == b.doc_id
        ta = [(s.kind, s.text, s.media_ref, s.offset) for s in a.spans]
        tb = [(s.kind, s.text, s.media_ref, s.offset) for s in b.spans]
        assert ta == tb


def test_validate_spans_bundle(spark, spans_df, corpus):
    cat = load_media_catalog(spark, corpus)
    bundle = validate.validate_spans(spans_df, cat)
    assert set(bundle) == {
        "violations",
        "partition_verdicts",
        "duplicate_doc_ids",
        "dangling_media_refs",
    }
    for name, df in bundle.items():
        assert df.count() >= 0, name


def test_write_audit_outputs_roundtrip(spark, spans_df, tmp_path):
    """Audit results materialize as tables: verdicts + violations (partitioned
    by check) + canonical schema snapshot, all readable back unchanged."""
    from jsons_to_schema_spark.operators.audit_pass import single_pass_audit
    from jsons_to_schema_spark.schema_algebra import canonical_json
    from jsons_to_schema_spark.sources.sinks import write_audit_outputs

    res = single_pass_audit(spans_df, cap_per_check=50, by="split")
    paths = write_audit_outputs(res, tmp_path / "audit_out")

    verd = spark.read.parquet(paths["verdicts"])
    assert verd.count() == res.verdicts.count()
    viol = spark.read.parquet(paths["violations"])
    got = {(r.doc_id, r.check) for r in viol.collect()}
    want = {(r.doc_id, r.check) for r in res.violations.collect()}
    assert got == want and got
    # check-partitioned layout on disk
    assert any(p.name.startswith("check=") for p in (tmp_path / "audit_out" / "violations").iterdir())
    snap = (tmp_path / "audit_out" / "unified_schema.json").read_text()
    assert snap == canonical_json(res.schema)
    res.unpersist()


def test_struct_conformance_soundness(spark, spans_df):
    """Reference V1 soundness, struct edition: the schema INFERRED from a
    table must validate every row of that table — for the spans corpus and
    every driver table the native builder covers."""
    from jsons_to_schema_spark.operators.infer import infer_from_struct
    from jsons_to_schema_spark.sources.tables import load_table

    from .conftest import SF_ORACLE  # noqa: F401  (module-relative import ok)

    for df in (
        spans_df,
        load_table(spark, "/root/testdata/sf0.01", "documents"),
        load_table(spark, "/root/testdata/sf0.01", "embeddings"),
    ):
        schema, n = infer_from_struct(df)
        rep = {
            r.valid: r.n_docs
            for r in validate.struct_conformance_report(df, schema).collect()
        }
        assert rep == {True: n}, rep


def test_struct_conformance_matches_pure_validator(spark):
    """The compiled Catalyst checks must agree with the pure-Python Draft-4
    validator row by row on a grid of tricky schema/value combinations
    (nulls=absent, integral floats, enum, bounds incl. exclusive, nested
    struct + required, array items, sealed objects)."""
    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    rows = [
        (1, 10, 2.0, "en", {"x": 1}, [1, 2]),
        (2, -5, 2.5, "zh", {"x": None}, []),
        (3, None, None, None, None, None),
        (4, 400, 7.0, "de", {"x": 9}, [5]),
        (5, 401, 0.5, "fr", {"x": 2}, [None]),
        (6, 10, 3.0, "e", {"x": 1}, [1, 1, 2]),       # lang too short, dup items
        (7, 10, 3.0, "enenen", {"x": 1}, [1, 2, 3, 4, 5]),  # too long both ways
    ]
    df = spark.createDataFrame(
        rows,
        "id long, a long, b double, lang string, o struct<x: long>, xs array<long>",
    )
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "a": {"type": "integer", "minimum": 0, "maximum": 400},
            "b": {"type": "integer"},  # integral doubles pass, 2.5 fails
            "lang": {"type": "string", "enum": ["de", "en", "fr"],
                     "minLength": 2, "maxLength": 2},
            "o": {
                "type": "object",
                "properties": {"x": {"type": "integer", "minimum": 0}},
                "required": ["x"],
            },
            "xs": {"type": "array", "items": {"type": "integer"},
                   "maxItems": 4, "uniqueItems": True},
        },
        "required": ["id", "a"],
    }
    got = {
        r.id: r.ok_schema
        for r in validate.struct_conformance_flags(df, schema).collect()
    }
    # ground truth via the pure validator on the dict form (null = absent)
    def to_doc(row):
        d = {}
        for k, v in row.asDict().items():
            if v is None:
                continue
            if hasattr(v, "asDict"):
                d[k] = {kk: vv for kk, vv in v.asDict().items() if vv is not None}
            else:
                d[k] = v
        return d

    for r in df.collect():
        expected = not validate_value(to_doc(r), schema)
        assert got[r.id] == expected, (r.id, to_doc(r), got[r.id], expected)


def test_struct_conformance_is_codegen(spark, spans_df):
    from jsons_to_schema_spark.operators.infer import infer_from_struct
    from jsons_to_schema_spark.plans import audit

    schema, _ = infer_from_struct(spans_df)
    rep = validate.struct_conformance_report(spans_df, schema)
    plan = audit.executed_plan(rep)
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_struct_conformance_randomized_battery(spark):
    """Randomized schemas × randomized rows: the compiled Catalyst checks
    must agree with the pure Draft-4 validator on every row (25 rounds,
    covering type sets, bounds, enum, required, lengths, item counts,
    uniqueItems, nested struct)."""
    import random

    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    rng = random.Random(99)
    ddl = "id long, a long, b double, s string, xs array<long>, o struct<x: long, y: string>"

    def rand_schema():
        props = {"id": {"type": "integer"}}
        a = {"type": rng.choice(["integer", "number"])}
        if rng.random() < 0.6:
            a["minimum"] = rng.randint(-5, 5)
            if rng.random() < 0.4:
                a["exclusiveMinimum"] = True
        if rng.random() < 0.6:
            a["maximum"] = rng.randint(5, 15)
        if rng.random() < 0.4:
            a["multipleOf"] = rng.choice([2, 3])
        # Draft-4 combinators over the numeric column
        if rng.random() < 0.25:
            a["anyOf"] = [
                {"maximum": rng.randint(-2, 5)},
                {"minimum": rng.randint(6, 12)},
            ]
        if rng.random() < 0.2:
            a["oneOf"] = [{"minimum": 0}, {"maximum": rng.randint(0, 10)}]
        if rng.random() < 0.2:
            a["allOf"] = [{"minimum": -3}, {"maximum": rng.randint(0, 12)}]
        if rng.random() < 0.2:
            a["not"] = {"minimum": rng.randint(0, 10)}
        props["a"] = a
        b = {"type": rng.choice(["integer", "number"])}
        if rng.random() < 0.4:
            b["multipleOf"] = rng.choice([0.5, 2])
        props["b"] = b
        s = {"type": "string"}
        if rng.random() < 0.5:
            s["minLength"] = rng.randint(0, 3)
        if rng.random() < 0.5:
            s["maxLength"] = rng.randint(3, 6)
        if rng.random() < 0.3:
            s["enum"] = rng.sample(["ab", "abc", "abcd", "x", "yz"], 3)
        if rng.random() < 0.4:
            s["format"] = rng.choice(["date", "email", "uuid"])
        if rng.random() < 0.3:
            # unanchored-search semantics: re.search ≡ rlike
            s["pattern"] = rng.choice(["^ab", "c$", "[0-9]", "a.c"])
        props["s"] = s
        xs = {"type": "array", "items": {"type": "integer"}}
        if rng.random() < 0.5:
            xs["maxItems"] = rng.randint(1, 3)
        if rng.random() < 0.5:
            xs["uniqueItems"] = True
        props["xs"] = xs
        o = {"type": "object", "properties": {"x": {"type": "integer"}}}
        if rng.random() < 0.5:
            o["required"] = ["x"]
        if rng.random() < 0.3:
            o["minProperties"] = rng.randint(0, 2)
        if rng.random() < 0.3:
            o["maxProperties"] = rng.randint(0, 2)
        props["o"] = o
        out = {"type": "object", "properties": props}
        req = [k for k in props if rng.random() < 0.4]
        if req:
            out["required"] = sorted(req)
        return out

    def rand_row(i):
        def maybe(v):
            return None if rng.random() < 0.25 else v
        return (
            i,
            maybe(rng.randint(-10, 20)),
            maybe(rng.choice([2.0, 2.5, -1.0, 7.25])),
            maybe(rng.choice([
                "ab", "abc", "abcdefg", "", "yz",
                "2024-01-02", "2024-13-40", "a@b.io",
            ])),
            maybe([rng.randint(0, 3) for _ in range(rng.randint(0, 4))]),
            maybe({"x": maybe(rng.randint(0, 5)), "y": maybe("s")}),
        )

    def to_doc(row):
        d = {}
        for k, v in row.asDict().items():
            if v is None:
                continue
            if hasattr(v, "asDict"):
                d[k] = {kk: vv for kk, vv in v.asDict().items() if vv is not None}
            else:
                d[k] = v
        return d

    for _ in range(25):
        schema = rand_schema()
        rows = [rand_row(i) for i in range(20)]
        df = spark.createDataFrame(rows, ddl)
        got = {
            r.id: r.ok_schema
            for r in validate.struct_conformance_flags(df, schema).collect()
        }
        for r in df.collect():
            expected = not validate_value(to_doc(r), schema)
            assert got[r.id] == expected, (schema, to_doc(r), got[r.id], expected)


def test_struct_conformance_typeless_and_sealed_and_enum(spark):
    """ADVICE r2 (medium): the compiled checks must match the pure validator
    on (a) type-LESS subschemas that still carry properties/required/items,
    (b) nested additionalProperties:false, (c) enum over complex types,
    (d) tuple-typed items + additionalItems, (e) null array elements under a
    type-less item schema."""
    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    ddl = ("id long, o struct<x: long, extra: string>, xs array<long>, "
           "pair array<long>, tag struct<k: string>")
    rows = [
        (1, {"x": 1, "extra": None}, [1, 2], [1, 2], {"k": "a"}),
        (2, {"x": None, "extra": "boom"}, [None], [1, 2, 9], {"k": "b"}),
        (3, {"x": 5, "extra": None}, [3], [2, 1], {"k": None}),
        (4, None, None, None, None),
        (5, {"x": 2, "extra": "y"}, [1, 1], [1], {"k": "a"}),
    ]
    df = spark.createDataFrame(rows, ddl)
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            # (a) type-less: properties/required still enforced on dict values
            # (b) sealed: 'extra' present => fail
            "o": {"properties": {"x": {"minimum": 0}}, "required": ["x"],
                  "additionalProperties": False},
            # (e) type-less items: null elements pass, bounds enforced
            "xs": {"items": {"maximum": 2}},
            # (d) tuple items + additionalItems
            "pair": {"type": "array",
                     "items": [{"type": "integer", "maximum": 1},
                               {"type": "integer"}],
                     "additionalItems": False},
            # (c) enum over a complex (struct) type
            "tag": {"enum": [{"k": "a"}, {"k": "b"}]},
        },
        "required": ["id"],
    }
    got = {r.id: r.ok_schema
           for r in validate.struct_conformance_flags(df, schema).collect()}

    def to_doc(row):
        d = {}
        for k, v in row.asDict().items():
            if v is None:
                continue
            if hasattr(v, "asDict"):
                d[k] = {kk: vv for kk, vv in v.asDict().items() if vv is not None}
            else:
                d[k] = v
        return d

    for r in df.collect():
        expected = not validate_value(to_doc(r), schema)
        assert got[r.id] == expected, (r.id, to_doc(r), got[r.id], expected)
    # sanity: the fixture exercises both verdicts
    assert True in got.values() and False in got.values()


def test_struct_conformance_enum_complex_arrays(spark):
    """enum over array columns: typed structural equality (size + per-position),
    including a null element literal and an unrepresentable enum value."""
    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, None]), (3, [1]), (4, [2, 1]), (5, None)],
        "id long, xs array<long>",
    )
    schema = {
        "type": "object",
        "properties": {
            "xs": {"enum": [[1, 2], [1, None], "scalar-never-matches"]},
        },
    }
    got = {r.id: r.ok_schema
           for r in validate.struct_conformance_flags(df, schema).collect()}
    for r in df.collect():
        doc = {"id": r.id} if r.xs is None else {"id": r.id, "xs": list(r.xs)}
        expected = not validate_value(doc, schema)
        assert got[r.id] == expected, (r.id, doc, got[r.id], expected)
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}


def test_write_table_observed_metrics_match_recount(spark, tmp_path):
    """write_table_observed: the observed aggregates equal a full recount of
    what landed on disk — one pass, no second scan."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.sources.sinks import write_table_observed

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7 == 0).cast("long").alias("viol"),
    )
    got = write_table_observed(
        df,
        tmp_path / "verdicts",
        {
            "n_rows": F.count(F.lit(1)),
            "n_violations": F.sum("viol"),
        },
    )
    back = spark.read.parquet(str(tmp_path / "verdicts"))
    assert got["n_rows"] == 1000 == back.count()
    assert got["n_violations"] == back.agg(F.sum("viol")).first()[0] == 143


def test_repair_spans_drops_sorts_and_is_stable(spark):
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators.validate import repair_spans

    rows = [
        # out-of-order offsets + one null-text text span (dropped) + one
        # null-media_ref image span (dropped); equal offsets keep input
        # order (b1 before b2); NULL offset sorts first
        (
            "d1",
            [
                ("text", "b1", None, 5),
                ("text", None, None, 2),        # dropped: null text
                ("image", None, None, 1),       # dropped: null media_ref
                ("text", "b2", None, 5),
                ("image", None, "m1", 3),
                ("text", "n0", None, None),     # NULL offset -> first
            ],
        ),
        ("d2", [("text", None, None, 1)]),      # every span dropped
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = repair_spans(df).collect()
    d1 = sorted((r for r in out if r.id == "d1"), key=lambda r: r.span_idx)
    assert [(r.text or r.media_ref, r.offset) for r in d1] == [
        ("n0", None),   # null offset first
        ("m1", 3),
        ("b1", 5),      # stable: b1 kept before b2 at equal offset
        ("b2", 5),
    ]
    assert all(r.n_dropped == 2 for r in d1)
    assert [r.span_idx for r in d1] == [0, 1, 2, 3]
    assert not [r for r in out if r.id == "d2"]  # fully-dropped doc: no rows
    # partition invariance
    out2 = repair_spans(df.repartition(5)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_render_documents_order_placeholders_nulls(spark):
    from jsons_to_schema_spark.operators.validate import render_documents

    rows = [
        (
            "d1",
            [
                ("text", "world", None, 7),
                ("image", None, "img9", 3),
                ("text", "hello ", None, 0),
                ("text", None, None, 5),     # NULL text renders ''
            ],
        ),
        ("d2", []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {r.id: r for r in render_documents(df).collect()}
    assert out["d1"].text == "hello <media:img9>world"
    assert out["d1"].n_spans == 4 and out["d1"].n_media == 1
    assert out["d2"].text == "" and out["d2"].n_spans == 0
    custom = {
        r.id: r
        for r in render_documents(df, media_fmt="[[{ref}]]").collect()
    }
    assert custom["d1"].text == "hello [[img9]]world"


def test_kind_mismatch_refs_planted(spark):
    from jsons_to_schema_spark.operators.validate import kind_mismatch_refs

    spans = spark.createDataFrame(
        [
            ("d1", [("image", None, "m1", 0), ("text", "x", None, 1)]),
            ("d2", [("audio", None, "m2", 0), ("image", None, "mX", 1)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cat = spark.createDataFrame(
        [("m1", "audio"), ("m2", "audio")], "media_ref string, media_kind string"
    )
    rows = sorted(map(tuple, kind_mismatch_refs(spans, cat).collect()))
    # m1: image span -> audio asset (mismatch); m2 matches; mX dangling
    # (not this check's job); text spans never join (NULL ref filtered)
    assert rows == [("d1", "m1", "image", "audio")]


def test_render_documents_rejects_bad_media_fmt(spark):
    import pytest as _p

    from jsons_to_schema_spark.operators.validate import render_documents

    df = spark.createDataFrame(
        [("d", [])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    with _p.raises(ValueError):
        render_documents(df, media_fmt="<media>")
    with _p.raises(ValueError):
        render_documents(df, media_fmt="{ref}{ref}")


def test_aggregate_reconciliation_arms(spark):
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators.validate import aggregate_reconciliation

    parent = spark.createDataFrame(
        [(1, 30.0), (2, 99.0), (3, 7.0), (4, 0.0)],
        "k long, total double",
    )
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 50.0), (3, None)],
        "k long, amt double",
    )
    rows = {
        r.k: r
        for r in aggregate_reconciliation(
            parent, child, ["k"], "total", "amt", tolerance=0.5
        ).collect()
    }
    assert 1 not in rows                      # reconciles exactly
    assert rows[2].abs_diff == 49.0           # corrupted total
    assert rows[3].actual == 0.0              # all-NULL children sum -> 0
    assert rows[3].n_children == 1
    assert 4 not in rows                      # no children, total 0 -> ok
    import pytest as _p

    with _p.raises(ValueError):
        aggregate_reconciliation(parent, child, [], "total", "amt")


def test_write_table_observed_rejects_empty_metrics(spark, tmp_path):
    import pytest as _p

    from jsons_to_schema_spark.sources.sinks import write_table_observed

    with _p.raises(ValueError):
        write_table_observed(spark.range(3), tmp_path / "x", {})


def test_combinators_pure_and_compiled_parity(spark):
    """Draft-4 §5.5 allOf/anyOf/oneOf/not: hand-built cases covering every
    arm (0/1/2 oneOf matches, empty anyOf unsatisfiable, empty allOf
    vacuous, not inversion), pure vs compiled."""
    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    ddl = "id long, a long"
    rows = [(i, v) for i, v in enumerate([-5, 0, 3, 7, 15])]
    df = spark.createDataFrame(rows, ddl)
    cases = [
        {"anyOf": [{"maximum": -1}, {"minimum": 10}]},     # -5, 15 pass
        {"oneOf": [{"minimum": 0}, {"maximum": 5}]},       # exactly-one zone
        {"allOf": [{"minimum": -1}, {"maximum": 8}]},      # band
        {"not": {"minimum": 1}},                           # v < 1 passes
        {"allOf": []},                                     # vacuous truth
        {"anyOf": []},                                     # unsatisfiable
        {"oneOf": [{"minimum": -100}, {"maximum": 100}]},  # always 2 -> invalid
        {"not": {"enum": [3, 7]}},
    ]
    for sub in cases:
        schema = {"type": "object",
                  "properties": {"a": dict({"type": "integer"}, **sub)}}
        got = {
            r.id: r.ok_schema
            for r in validate.struct_conformance_flags(df, schema).collect()
        }
        for r in df.collect():
            expected = not validate_value({"id": r.id, "a": r.a}, schema)
            assert got[r.id] == expected, (sub, r.a, got[r.id], expected)


def test_pattern_properties_and_dependencies_parity(spark):
    """Draft-4 §5.4.4/§5.4.5: patternProperties (incl. interplay with a
    sealed object) and both dependency forms, pure vs compiled."""
    from jsons_to_schema_spark.schema_algebra import validate as validate_value

    ddl = "id long, x_a long, x_b long, other string, card string, cvv string"
    rows = [
        (1, 5, 7, "ok", None, None),
        (2, -5, 7, "ok", None, None),       # x_a breaks the ^x_ bound
        (3, None, None, "ok", None, None),
        (4, 5, 7, None, "4111", "123"),     # card present with cvv: ok
        (5, 5, 7, None, "4111", None),      # card without cvv: dependency fails
    ]
    df = spark.createDataFrame(rows, ddl)
    schema = {
        "type": "object",
        "properties": {"id": {"type": "integer"}},
        "patternProperties": {"^x_": {"type": "integer", "minimum": 0}},
        "dependencies": {"card": ["cvv"]},
    }
    got = {r.id: r.ok_schema
           for r in validate.struct_conformance_flags(df, schema).collect()}

    def to_doc(row):
        return {k: v for k, v in row.asDict().items() if v is not None}

    for r in df.collect():
        expected = not validate_value(to_doc(r), schema)
        assert got[r.id] == expected, (r.id, to_doc(r), got[r.id], expected)
    assert got == {1: True, 2: False, 3: True, 4: True, 5: False}

    # sealed + patternProperties: x_* fields are NOT "additional"
    sealed = {
        "type": "object",
        "properties": {"id": {"type": "integer"}, "other": {"type": "string"},
                       "card": {}, "cvv": {}},
        "patternProperties": {"^x_": {}},
        "additionalProperties": False,
    }
    got2 = {r.id: r.ok_schema
            for r in validate.struct_conformance_flags(df, sealed).collect()}
    for r in df.collect():
        expected = not validate_value(to_doc(r), sealed)
        assert got2[r.id] == expected, (r.id, to_doc(r))
    assert all(got2.values())  # every field is matched by one of the three

    # schema-form dependency: card present => other must be present
    dep_schema = {
        "type": "object",
        "dependencies": {"card": {"required": ["other"]}},
    }
    got3 = {r.id: r.ok_schema
            for r in validate.struct_conformance_flags(df, dep_schema).collect()}
    for r in df.collect():
        expected = not validate_value(to_doc(r), dep_schema)
        assert got3[r.id] == expected, (r.id, to_doc(r))
    assert got3[4] is False and got3[5] is False and got3[1] is True
