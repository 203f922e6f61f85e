"""The columnar JSON fast path must be indistinguishable from the per-doc
Python fold: for ANY batch, _batch_to_draft_json (fast or bail) equals the
pure-algebra fold of json_to_schema.  No Spark needed — this exercises the
batch kernel directly, including every documented bail condition."""

import json
import random

import pyarrow as pa
import pytest

from jsons_to_schema_spark.operators.infer import (
    _batch_to_draft_json,
    _fast_json_batch_draft,
)
from jsons_to_schema_spark.schema_algebra import (
    SchemaGenerationConfig,
    canonical_json,
    json_to_schema,
    unify_opt,
)


def _expected(docs, config=SchemaGenerationConfig()):
    acc = None
    for d in docs:
        acc = unify_opt(acc, json_to_schema(d, config))
    return acc


def _got(docs, config=SchemaGenerationConfig()):
    texts = [json.dumps(d) for d in docs]
    batch = pa.RecordBatch.from_pydict({"j": pa.array(texts, pa.string())})
    return _batch_to_draft_json(batch, "j", config, "fail")


def _assert_equal(docs, config=SchemaGenerationConfig()):
    schema, n = _got(docs, config)
    exp = _expected(docs, config)
    assert n == len(docs)
    assert canonical_json(schema) == canonical_json(exp), docs


CASES = [
    # pure fast-path shapes
    [{"k": 1}, {"k": 2}],
    [{"k": 1.5}, {"k": 2.5}],                      # all non-integral floats
    [{"k": 1.0}, {"k": 2.0}],                      # integral floats → integer (G2)
    [{"k": 1.5}, {"k": 2}],                        # mixed → ["integer","number"]
    [{"k": 1.0}, {"k": 2.5}],                      # integral float + real float
    [{"a": "x", "b": True}, {"a": "y", "b": False}],
    [{"t": "2024-01-01T00:00:00Z"}, {"t": "2025-02-02T10:00:00Z"}],  # arrow→timestamp
    [{"t": "2024-01-01"}, {"t": "not a date"}],
    [{"xs": [1, 2, 3]}, {"xs": [4]}],
    [{"xs": []}, {"xs": [1]}],                     # empty + non-empty (U4 keeps items)
    [{"xs": []}, {"xs": []}],                      # all-empty → items absent
    [{"o": {"x": 1, "y": "s"}}, {"o": {"x": 2, "y": "t"}}],
    [{"o": {"x": [1.5]}}, {"o": {"x": [2]}}],
    [{"s": "line\nbreak"}, {"s": "tab\there"}],    # escaped control chars
    [{"u": "ünïcodé ✓"}, {"u": "plain"}],
    # bail shapes (fallback must produce identical results)
    [{"k": 1}, {}],                                # missing key → nulls → bail
    [{"k": None}, {"k": 1}],                       # literal null vs value → bail
    [{"k": None}, {"k": None}],
    [{"k": 1}, {"k": "s"}],                        # mixed types → arrow error → bail
    [{"k": True}, {"k": 1}],
    [{"k": {"a": 1}}, {"k": {"b": 2}}],            # nested missing keys → bail
    [{"k": [1, "s"]}, {"k": [2]}],                 # mixed list elements → bail
    [{"k": [None, 1]}, {"k": [2]}],                # null list element → bail
    [5, {"k": 1}],                                  # non-record doc → bail
    [[1, 2], [3]],                                  # top-level arrays → bail
    ["just a string"],
    [{"big": 2**70}, {"big": 1}],                   # int64 overflow → bail
]


@pytest.mark.parametrize("docs", CASES, ids=range(len(CASES)))
def test_fastpath_matches_fold(docs):
    _assert_equal(docs)


def test_fastpath_bails_on_tuple_config_and_seal_matches():
    docs = [{"xs": [1, "s"]}, {"xs": [2, "t"]}]
    tuple_cfg = SchemaGenerationConfig(type_arrays_as_tuples=True)
    texts = pa.array([json.dumps(d) for d in docs], pa.string())
    assert _fast_json_batch_draft(texts, tuple_cfg) is None  # no columnar analog
    _assert_equal(docs, tuple_cfg)
    seal_cfg = SchemaGenerationConfig(seal_object_properties=True)
    _assert_equal([{"o": {"x": 1}}, {"o": {"x": 2}}], seal_cfg)
    _assert_equal([{"k": 1}, {}], seal_cfg)  # bail path honors seal too


def test_fastpath_randomized_battery():
    """500 random batches over a value generator that spans both fast and
    bail shapes; every batch must match the pure fold bit-for-bit."""
    rng = random.Random(42)

    def value(depth=0):
        kinds = ["int", "float", "intfloat", "str", "ts", "bool"]
        if depth < 2:
            kinds += ["obj", "list", "null", "big"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-1000, 1000)
        if k == "float":
            return rng.uniform(-10, 10)
        if k == "intfloat":
            return float(rng.randint(-5, 5))
        if k == "str":
            return rng.choice(["abc", "x\ny", "ünï ✓", "", "123", "true"])
        if k == "ts":
            return "2024-01-0%dT0%d:00:00Z" % (rng.randint(1, 9), rng.randint(0, 9))
        if k == "bool":
            return rng.random() < 0.5
        if k == "null":
            return None
        if k == "big":
            return rng.choice([2**66, -(2**70), 2**31])
        if k == "list":
            return [value(depth + 1) for _ in range(rng.randint(0, 3))]
        return {  # obj
            f"k{i}": value(depth + 1) for i in range(rng.randint(0, 3))
        }

    for _ in range(500):
        n_keys = rng.randint(1, 4)
        keys = [f"f{i}" for i in range(n_keys)]
        docs = []
        for _ in range(rng.randint(1, 8)):
            doc = {
                k: value() for k in keys if rng.random() < 0.9  # sometimes absent
            }
            docs.append(doc)
        _assert_equal(docs)
