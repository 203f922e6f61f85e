"""Unit tests for the Draft-4 ``format`` extension: discovery profile,
violations, schema annotation, the unification rule, and pure-validator
parity (operators/formats.py, schema_algebra._unify_format)."""

import re

import pytest

from jsons_to_schema_spark.operators import formats
from jsons_to_schema_spark.operators.formats import (
    FORMAT_PATTERNS,
    annotate_formats,
    infer_formats,
    format_violations,
)
from jsons_to_schema_spark.schema_algebra import unify, validate


# -------------------------------------------------------------- patterns ----


def test_patterns_have_no_whitespace_and_are_anchored():
    for fmt, pat in FORMAT_PATTERNS.items():
        assert " " not in pat and "\n" not in pat, fmt
        assert pat.startswith("^") and pat.endswith("$"), fmt
        re.compile(pat)  # valid in Python re (the pure-validator engine)


@pytest.mark.parametrize(
    "fmt,good,bad",
    [
        ("uuid", "000005dc-05dc-05dc-05dc-0000000005dc", "0005dc-x"),
        ("ipv4", "10.0.255.1", "256.1.1.1"),
        ("date-time", "2024-01-02T03:04:05Z", "2024-01-02 03:04:05"),
        ("date", "2024-12-31", "2024-13-01"),
        ("email", "a.b+c@ex-ample.co", "not an email"),
        ("uri", "https://x.y/z?q=1", "x.y/z"),
        ("hostname", "a-1.example.com", "-bad.example"),
    ],
)
def test_pattern_semantics(fmt, good, bad):
    pat = FORMAT_PATTERNS[fmt]
    assert re.match(pat, good), (fmt, good)
    assert not re.match(pat, bad), (fmt, bad)


# --------------------------------------------------------------- profile ----


def _profile_df(spark):
    rows = []
    for k in range(40):
        rows.append(
            (
                f"user{k}@example.com" if k % 10 else "nope",   # 90% email
                f"10.0.{k % 256}.{(k * 7) % 256}",              # ipv4 (and hostname)
                f"2024-{(k % 12) + 1:02d}-{(k % 28) + 1:02d}",  # date
                None,                                           # all-NULL col
            )
        )
    return spark.createDataFrame(rows, "e string, ip string, d string, z string")


def test_infer_formats_inference_and_priority(spark):
    df = _profile_df(spark)
    out = infer_formats(df, ["e", "ip", "d", "z"])
    assert out.count() == 4 * len(FORMAT_PATTERNS)
    by = {(r["column"], r["format"]): r for r in out.collect()}
    # ipv4 wins priority over hostname although both fully match
    assert by[("ip", "ipv4")].inferred and by[("ip", "ipv4")].qualifies
    assert by[("ip", "hostname")].qualifies and not by[("ip", "hostname")].inferred
    # date infers; date-time does not match
    assert by[("d", "date")].inferred
    assert by[("d", "date-time")].n_match == 0
    # 90% emails: not inferred at threshold 1.0
    assert by[("e", "email")].n_match == 36 and not by[("e", "email")].qualifies
    assert by[("e", "email")].match_rate == 0.9
    # all-NULL column qualifies for nothing, rate NULL
    assert not any(by[("z", f)].qualifies for f in FORMAT_PATTERNS)
    assert by[("z", "email")].match_rate is None


def test_infer_formats_threshold_and_min_n(spark):
    df = _profile_df(spark)
    out = {
        (r["column"], r["format"]): r
        for r in infer_formats(df, ["e"], threshold=0.8).collect()
    }
    assert out[("e", "email")].qualifies and out[("e", "email")].inferred
    # min_n above the row count: nothing qualifies
    out2 = infer_formats(df, ["e"], min_n=1000).collect()
    assert not any(r.qualifies for r in out2)


def test_infer_formats_validates(spark):
    df = _profile_df(spark)
    with pytest.raises(ValueError, match="cols"):
        infer_formats(df, [])
    with pytest.raises(ValueError, match="threshold"):
        infer_formats(df, ["e"], threshold=0.0)
    with pytest.raises(ValueError, match="min_n"):
        infer_formats(df, ["e"], min_n=0)


# ------------------------------------------------------------ violations ----


def test_format_violations_rows(spark):
    df = _profile_df(spark).selectExpr("e", "monotonically_increasing_id() AS rid")
    out = format_violations(df, "e", "email", keep=["rid"]).collect()
    assert len(out) == 4  # k % 10 == 0 rows
    assert all(r.value == "nope" and r.format == "email" for r in out)
    assert format_violations(df, "e", "email").columns == [
        "column", "format", "value",
    ]
    with pytest.raises(ValueError, match="unknown format"):
        format_violations(df, "e", "zipcode")


# -------------------------------------------------- annotate + unify + V1 ----


def _schema():
    return {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"email": {"type": "string"}},
            },
            "day": {"type": "string"},
        },
    }


def test_annotate_formats_paths_and_errors():
    s = annotate_formats(_schema(), {"user.email": "email", "day": "date"})
    assert s["properties"]["user"]["properties"]["email"]["format"] == "email"
    assert s["properties"]["day"]["format"] == "date"
    assert "format" not in _schema()["properties"]["day"]  # input not mutated
    with pytest.raises(ValueError, match="unknown format"):
        annotate_formats(_schema(), {"day": "zipcode"})
    with pytest.raises(ValueError, match="no property"):
        annotate_formats(_schema(), {"ghost.path": "email"})


def test_unify_format_semilattice():
    e = {"type": "string", "format": "email"}
    d = {"type": "string", "format": "date"}
    bare = {"type": "string"}
    assert unify(e, e).get("format") == "email"          # idempotent
    assert "format" not in unify(e, d)                   # unequal drops
    assert "format" not in unify(e, bare)                # absent absorbs
    assert unify(e, d) == unify(d, e)                    # commutative
    # associative over a mixed triple
    assert unify(unify(e, e), d) == unify(e, unify(e, d))


def test_pure_validator_checks_format():
    s = annotate_formats(_schema(), {"user.email": "email", "day": "date"})
    ok = {"user": {"email": "a@b.io"}, "day": "2024-01-02"}
    assert validate(ok, s) == []
    bad = {"user": {"email": "nope"}, "day": "2024-13-01"}
    errs = validate(bad, s)
    assert len(errs) == 2 and all("format" in e for e in errs)
    # unknown format names are ignored per Draft-4 (open vocabulary)
    s2 = _schema()
    s2["properties"]["day"]["format"] = "zipcode"
    assert validate({"day": "anything"}, s2) == []


def test_compiled_validator_format_parity(spark):
    from jsons_to_schema_spark.operators import validate as vmod

    ddl = "id long, email string, day string"
    rows = [
        (1, "a@b.io", "2024-01-02"),
        (2, "nope", "2024-01-02"),
        (3, "a@b.io", "2024-13-01"),
        (4, None, None),  # absent: format does not apply
    ]
    df = spark.createDataFrame(rows, ddl)
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "email": {"type": "string", "format": "email"},
            "day": {"type": "string", "format": "date"},
        },
    }
    got = {
        r.id: r.ok_schema
        for r in vmod.struct_conformance_flags(df, schema).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: True}


# ------------------------------------------------------- hypothesis laws ----

from hypothesis import given, settings
from hypothesis import strategies as st

from jsons_to_schema_spark.schema_algebra import canonical_json

_fmt_or_none = st.sampled_from([None, "email", "date", "uuid", "ipv4"])


def _str_schema(fmt):
    s = {"type": "string"}
    if fmt:
        s["format"] = fmt
    return s


@settings(max_examples=200, deadline=None)
@given(_fmt_or_none, _fmt_or_none, _fmt_or_none)
def test_format_unify_semilattice_laws(fa, fb, fc):
    a, b, d = _str_schema(fa), _str_schema(fb), _str_schema(fc)
    cj = canonical_json
    assert cj(unify(a, a)) == cj(a)                                # idempotent
    assert cj(unify(a, b)) == cj(unify(b, a))                      # commutative
    assert cj(unify(unify(a, b), d)) == cj(unify(a, unify(b, d)))  # associative


@settings(max_examples=150, deadline=None)
@given(_fmt_or_none, _fmt_or_none)
def test_format_unify_nested_properties(fa, fb):
    a = {"type": "object", "properties": {"x": _str_schema(fa)}, "required": ["x"]}
    b = {"type": "object", "properties": {"x": _str_schema(fb)}, "required": ["x"]}
    got = unify(a, b)["properties"]["x"].get("format")
    assert got == (fa if fa == fb else None)


# ---------------------------------------------------------------- pattern ----


def test_pattern_keyword_pure_and_unify():
    s = {"type": "string", "pattern": "^ab"}
    assert validate("abc", s) == []
    assert validate("zab", s) != []          # anchored prefix fails
    assert validate("xabcx", {"type": "string", "pattern": "ab"}) == []  # search
    t = {"type": "string", "pattern": "c$"}
    assert unify(s, s).get("pattern") == "^ab"
    assert "pattern" not in unify(s, t)
    assert "pattern" not in unify(s, {"type": "string"})


def test_pattern_keyword_compiled_parity(spark):
    from jsons_to_schema_spark.operators import validate as vmod

    df = spark.createDataFrame(
        [(1, "abc"), (2, "zab"), (3, "xxabyy"), (4, None)],
        "id long, s string",
    )
    schema = {
        "type": "object",
        "properties": {"s": {"type": "string", "pattern": "^ab"}},
    }
    got = {r.id: r.ok_schema
           for r in vmod.struct_conformance_flags(df, schema).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True}


# ------------------------------------------------------------------- $ref ----

from jsons_to_schema_spark.schema_algebra import resolve_refs


def _ref_schema():
    return {
        "type": "object",
        "definitions": {
            "addr": {
                "type": "object",
                "properties": {"zip": {"$ref": "#/definitions/zipcode"}},
                "required": ["zip"],
            },
            "zipcode": {"type": "string", "pattern": "^[0-9]{5}$"},
        },
        "properties": {
            "home": {"$ref": "#/definitions/addr"},
            "work": {"$ref": "#/definitions/addr"},
            "definitions": {"type": "integer"},  # property NAMED definitions
        },
    }


def test_resolve_refs_inlines_shared_and_chained():
    out = resolve_refs(_ref_schema())
    assert "definitions" not in out  # root container dropped
    for k in ("home", "work"):
        sub = out["properties"][k]
        assert sub["required"] == ["zip"]
        assert sub["properties"]["zip"]["pattern"] == "^[0-9]{5}$"
    # the property literally named definitions survives untouched
    assert out["properties"]["definitions"] == {"type": "integer"}


def test_resolve_refs_errors():
    with pytest.raises(ValueError, match="cycle"):
        resolve_refs({"definitions": {"a": {"$ref": "#/definitions/a"}},
                      "$ref": "#/definitions/a"})
    with pytest.raises(ValueError, match="non-local"):
        resolve_refs({"$ref": "http://example.com/s.json"})
    with pytest.raises(ValueError, match="unresolvable"):
        resolve_refs({"$ref": "#/definitions/ghost"})
    # RFC 6901 escaping: ~1 -> '/', ~0 -> '~'
    s = {"definitions": {"a/b": {"type": "integer"}},
         "$ref": "#/definitions/a~1b"}
    assert resolve_refs(s) == {"type": "integer"}


def test_ref_schema_pure_and_compiled_parity(spark):
    from jsons_to_schema_spark.operators import validate as vmod

    schema = _ref_schema()
    ok_doc = {"home": {"zip": "12345"}, "work": {"zip": "99999"}}
    bad_doc = {"home": {"zip": "1234"}, "work": {"zip": "99999"}}
    assert validate(ok_doc, schema) == []        # auto-resolves
    assert validate(bad_doc, schema) != []

    df = spark.createDataFrame(
        [(1, ("12345",), ("99999",)), (2, ("1234",), ("99999",)), (3, None, None)],
        "id long, home struct<zip: string>, work struct<zip: string>",
    )
    got = {r.id: r.ok_schema
           for r in vmod.struct_conformance_flags(df, schema).collect()}
    assert got == {1: True, 2: False, 3: True}
