"""Wave-45 operator tests: synchronous label propagation and
content-defined chunking dedup."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.binchunk import (
    _chunk_payload,
    chunk_dedup_report,
    content_defined_chunks,
)
from jsons_to_schema_spark.operators.graph import label_propagation


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).repartition(parts)


def _lpa(spark, pairs, iterations=4, **kw):
    return {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, pairs, **kw), iterations).collect()
    }


def test_lpa_two_cliques_with_bridge(spark):
    """Two K4s joined by one bridge edge: each clique converges to its
    smallest member's label; the bridge does not merge them."""
    c1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    c2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    got = _lpa(spark, c1 + c2 + [("a0", "b0")], iterations=6)
    assert {got[f"a{i}"] for i in range(4)} == {"a0"}
    assert {got[f"b{i}"] for i in range(4)} == {"b0"}


def test_lpa_deterministic_and_partition_invariant(spark):
    rng = random.Random(87)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    runs = [_lpa(spark, pairs, iterations=3, parts=p) for p in (1, 4, 9)]
    assert runs[0] == runs[1] == runs[2]


def test_lpa_brute_force_replay(spark):
    """Exact replay of the synchronous recurrence in Python."""
    rng = random.Random(5)
    pairs = [(rng.randrange(10), rng.randrange(10)) for _ in range(25)]
    es = {tuple(sorted((str(a), str(b)))) for a, b in pairs if str(a) != str(b)}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = nxt
    assert _lpa(spark, pairs, iterations=3) == labels


def test_lpa_validation(spark):
    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [("a", "b")]), 0)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _rand_bytes(n, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def test_chunks_reconstruct_and_respect_bounds():
    data = _rand_bytes(5000, 1)
    chunks = _chunk_payload(data, avg_bits=6, min_len=32, max_len=256)
    assert b"".join(data[o : o + l] for o, l, _ in chunks) == data
    offs = [o for o, _, _ in chunks]
    assert offs == sorted(offs) and offs[0] == 0
    for i, (o, l, sha) in enumerate(chunks):
        assert sha == hashlib.sha256(data[o : o + l]).hexdigest()
        if i < len(chunks) - 1:
            assert 32 <= l <= 256, (i, l)
    assert chunks[-1][1] <= 256


def test_chunks_shift_invariance():
    """THE CDC property: prepending a prefix leaves the interior chunk
    hashes intact (fixed-size blocking would shift every block)."""
    core = _rand_bytes(4000, 2)
    prefix = _rand_bytes(333, 3)
    a = {sha for _, _, sha in _chunk_payload(core, 6, 32, 256)}
    b = {sha for _, _, sha in _chunk_payload(prefix + core, 6, 32, 256)}
    # all but the first few chunks of `core` re-emerge identically
    assert len(a & b) >= len(a) - 3


def test_chunks_tiny_and_empty():
    assert _chunk_payload(b"", 6, 32, 256) == []
    small = b"abc"
    [(o, l, sha)] = _chunk_payload(small, 6, 32, 256)
    assert (o, l) == (0, 3) and sha == hashlib.sha256(small).hexdigest()


def test_chunk_frame_and_report(spark):
    shared = _rand_bytes(2000, 7)
    rows = [
        ("p1", shared + _rand_bytes(500, 8)),
        ("p2", _rand_bytes(400, 9) + shared),  # same bytes, shifted
        ("p3", None),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary").repartition(3)
    chunks = content_defined_chunks(df, "payload", "id", avg_bits=6, min_len=32, max_len=256)
    rep = chunk_dedup_report(chunks).collect()[0]
    assert rep["n_payloads"] == 2  # NULL payload excluded
    assert rep["total_bytes"] == 2500 + 2400
    # the shared 2000 bytes dedup across the shifted copies
    assert rep["dedup_ratio"] > 0.25
    assert rep["unique_bytes"] < rep["total_bytes"]


def test_chunk_validation(spark):
    df = spark.createDataFrame([("a", b"x")], "id string, payload binary")
    with pytest.raises(ValueError):
        content_defined_chunks(df, "payload", "id", avg_bits=0)
    with pytest.raises(ValueError):
        content_defined_chunks(df, "payload", "id", min_len=100, max_len=100)
