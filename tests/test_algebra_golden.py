"""Golden fixtures A1-A14 (FIXTURES.md §F2) — bit-for-bit canonical JSON.

Mirrors the reference's HSpec golden specs (upstream
test/JSONSchema/Draft4/SchemaConverterSpec.hs and SchemaUnificationSpec.hs;
see SURVEY.md §5.1).  Every (LC) pinned decision has a fixture here so a
future session can flip it in one place.
"""

import json
from pathlib import Path

import pytest

from jsons_to_schema_spark.schema_algebra import (
    SchemaGenerationConfig,
    canonical_json,
    json_to_schema,
    jsons_to_schema,
    schemas_to_schema,
    unify,
    validate,
)

FIXTURE_DIR = Path(__file__).parent / "fixtures"

TUPLES = SchemaGenerationConfig(type_arrays_as_tuples=True)
SEALED = SchemaGenerationConfig(seal_object_properties=True)

# (id, docs, config, expected schema)
CASES = [
    # A1 — scalar typing, integer vs number (G1/G2)
    ("A1_null", [None], None, {"type": "null"}),
    ("A1_bool", [True], None, {"type": "boolean"}),
    ("A1_string", ["s"], None, {"type": "string"}),
    ("A1_int", [7], None, {"type": "integer"}),
    ("A1_float", [7.5], None, {"type": "number"}),
    ("A1_integral_float", [7.0], None, {"type": "integer"}),
    # A2 — object: properties + required = all keys (G3)
    (
        "A2_object",
        [{"a": 1, "b": "x"}],
        None,
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
            "required": ["a", "b"],
        },
    ),
    ("A2_empty_object", [{}], None, {"type": "object"}),
    # A3 — sealObjectProperties (G3)
    (
        "A3_sealed",
        [{"a": 1}],
        SEALED,
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}},
            "required": ["a"],
            "additionalProperties": False,
        },
    ),
    # A4 — arrays: absent / unified / type-array items (G4)
    ("A4_empty_array", [[]], None, {"type": "array"}),
    ("A4_homogeneous", [[1, 2, 3]], None, {"type": "array", "items": {"type": "integer"}}),
    (
        "A4_mixed",
        [[1, "x"]],
        None,
        {"type": "array", "items": {"type": ["integer", "string"]}},
    ),
    # A4b — PINNED (LC): absent items (empty array) + present items → keep items
    (
        "A4b_empty_plus_nonempty",
        [[], [1]],
        None,
        {"type": "array", "items": {"type": "integer"}},
    ),
    # A5 — tuple typing (G5)
    (
        "A5_tuple",
        [[1, "x"]],
        TUPLES,
        {"type": "array", "items": [{"type": "integer"}, {"type": "string"}]},
    ),
    # A6 — 3-level nesting with arrays of objects (G3+G4 recursion)
    (
        "A6_nested",
        [{"a": {"b": [{"c": 1}, {"c": 2.5, "d": True}]}}],
        None,
        {
            "type": "object",
            "properties": {
                "a": {
                    "type": "object",
                    "properties": {
                        "b": {
                            "type": "array",
                            "items": {
                                "type": "object",
                                "properties": {
                                    "c": {"type": ["integer", "number"]},
                                    "d": {"type": "boolean"},
                                },
                                "required": ["c"],
                            },
                        }
                    },
                    "required": ["b"],
                }
            },
            "required": ["a"],
        },
    ),
    # A7 — PINNED (LC): integer ∪ number keeps BOTH in the type set
    (
        "A7_int_number",
        [{"n": 1}, {"n": 2.5}],
        None,
        {
            "type": "object",
            "properties": {"n": {"type": ["integer", "number"]}},
            "required": ["n"],
        },
    ),
    # A8 — property union; required intersection → omitted
    (
        "A8_disjoint_props",
        [{"a": 1}, {"b": "x"}],
        None,
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        },
    ),
    # A9 — type array on shared key; shared keys stay required
    (
        "A9_shared_conflict",
        [{"a": 1, "c": True}, {"a": "x", "c": False}],
        None,
        {
            "type": "object",
            "properties": {
                "a": {"type": ["integer", "string"]},
                "c": {"type": "boolean"},
            },
            "required": ["a", "c"],
        },
    ),
    # A10 — items merge across documents (U4)
    (
        "A10_items_merge",
        [{"arr": [1]}, {"arr": ["x"]}],
        None,
        {
            "type": "object",
            "properties": {
                "arr": {"type": "array", "items": {"type": ["integer", "string"]}}
            },
            "required": ["arr"],
        },
    ),
    # A11 — tuple-mode positional zip + longer tail kept (U4, PINNED)
    (
        "A11_tuple_zip",
        [[1, "x"], [2.5, "y", True]],
        TUPLES,
        {
            "type": "array",
            "items": [
                {"type": ["integer", "number"]},
                {"type": "string"},
                {"type": "boolean"},
            ],
        },
    ),
    # A12 — PINNED (LC): sealed ∪ unsealed → additionalProperties omitted
    (
        "A12_seal_mix",
        None,  # built from schemas below
        None,
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}},
            "required": ["a"],
        },
    ),
    # A13 — range union via schemasToSchema (U6)
    ("A13_range", None, None, {"type": "integer", "minimum": 1, "maximum": 9}),
    # A14 — enum union + dedupe, canonical order (U7, PINNED)
    ("A14_enum", None, None, {"type": "string", "enum": ["a", "b", "c"]}),
]


@pytest.mark.parametrize("case_id,docs,config,expected", CASES, ids=[c[0] for c in CASES])
def test_golden(case_id, docs, config, expected):
    if case_id == "A12_seal_mix":
        got = unify(
            json_to_schema({"a": 1}, SEALED),
            json_to_schema({"a": 2}),
        )
    elif case_id == "A13_range":
        got = schemas_to_schema(
            [
                {"type": "integer", "minimum": 3, "maximum": 9},
                {"type": "integer", "minimum": 1, "maximum": 4},
            ]
        )
    elif case_id == "A14_enum":
        got = schemas_to_schema(
            [
                {"type": "string", "enum": ["b", "a"]},
                {"type": "string", "enum": ["c", "a"]},
            ]
        )
    else:
        cfg = config or SchemaGenerationConfig()
        got = jsons_to_schema(docs, cfg)
    assert canonical_json(got) == canonical_json(expected), case_id


def test_fixture_files_written_and_match():
    """Materialize the fixture corpus to tests/fixtures/ (bit-for-bit)."""
    for case_id, docs, config, expected in CASES:
        if docs is None:
            continue
        cfg = config or SchemaGenerationConfig()
        payload = {
            "docs": docs,
            "config": {
                "typeArraysAsTuples": cfg.type_arrays_as_tuples,
                "sealObjectProperties": cfg.seal_object_properties,
            },
            "expected": expected,
        }
        path = FIXTURE_DIR / f"{case_id}.json"
        path.write_text(json.dumps(payload, indent=1, sort_keys=True))
        loaded = json.loads(path.read_text())
        got = jsons_to_schema(loaded["docs"], cfg)
        assert canonical_json(got) == canonical_json(loaded["expected"])


def test_range_exclusive_flags():
    # strict winner carries its flag
    got = unify(
        {"type": "integer", "minimum": 1, "exclusiveMinimum": True},
        {"type": "integer", "minimum": 3},
    )
    assert got["minimum"] == 1 and got.get("exclusiveMinimum") is True
    # tie: both must be exclusive
    got = unify(
        {"type": "integer", "minimum": 2, "exclusiveMinimum": True},
        {"type": "integer", "minimum": 2},
    )
    assert got["minimum"] == 2 and "exclusiveMinimum" not in got
    # bound absent on one side widens away
    got = unify({"type": "integer", "minimum": 1}, {"type": "integer"})
    assert "minimum" not in got


def test_soundness_a16():
    """A16 — the unified schema validates every input doc (reference V1 law)."""
    all_docs = [
        d
        for _, docs, config, _ in CASES
        if docs is not None and config is None
        for d in docs
    ]
    schema = jsons_to_schema(all_docs)
    for d in all_docs:
        assert validate(d, schema) == [], (d, schema)


def test_independent_jsonschema_oracle():
    """Cross-check our emitted schemas with the independent jsonschema pkg."""
    jsonschema = pytest.importorskip("jsonschema")
    docs = [{"a": 1, "b": [1, 2.5, "x"]}, {"a": "y", "c": {"d": None}}]
    schema = jsons_to_schema(docs)
    validator = jsonschema.Draft4Validator(schema)
    for d in docs:
        assert list(validator.iter_errors(d)) == []
