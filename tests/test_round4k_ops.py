"""Wave-41 operator tests: asymmetric containment join and contrastive
pair mining."""

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.dedup import containment_join
from jsons_to_schema_spark.operators.similarity import contrastive_pairs
from jsons_to_schema_spark.plans import audit


# ---------------------------------------------------------------------------
# containment_join
# ---------------------------------------------------------------------------

def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def _brute_containment(texts, t, probe_ids=None):
    sets = {i: set(w for w in txt.split(" ") if w) for i, txt in enumerate(texts)}
    out = set()
    for a, sa in sets.items():
        if probe_ids is not None and a not in probe_ids:
            continue
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                out.add((a, b, round(c, 6)))
    return out


def _spark_containment(spark, texts, t, probe_ids=None, parts=4):
    df = _docs(spark, texts, parts)
    probe = df if probe_ids is None else df.filter(F.col("doc_id").isin(list(probe_ids)))
    return {
        (r["id_a"], r["id_b"], r["containment"])
        for r in containment_join(probe, df, "text", "doc_id", t).collect()
    }


def test_containment_quote_inside_page(spark):
    """The case Jaccard misses: tiny doc fully inside a huge one."""
    page = " ".join(f"w{i}" for i in range(200)) + " legal notice text"
    quote = "legal notice text"
    got = _spark_containment(spark, [quote, page], 0.99)
    assert (0, 1, 1.0) in got
    assert (1, 0, 1.0) not in got  # directional: page not inside quote


def test_containment_matches_brute_force_random(spark):
    rng = random.Random(31)
    vocab = [f"v{i}" for i in range(25)]
    texts = [" ".join(rng.sample(vocab, rng.randrange(2, 10))) for _ in range(35)]
    for t in (0.5, 0.8, 1.0):
        assert _spark_containment(spark, texts, t) == _brute_containment(texts, t), t


def test_containment_probe_side_restriction(spark):
    rng = random.Random(7)
    vocab = [f"u{i}" for i in range(12)]
    texts = [" ".join(rng.sample(vocab, rng.randrange(2, 7))) for _ in range(20)]
    probe = {0, 5, 10, 15}
    got = _spark_containment(spark, texts, 0.6, probe_ids=probe)
    assert got == _brute_containment(texts, 0.6, probe_ids=probe)
    assert all(a in probe for a, _, _ in got)


def test_containment_boundary_exact(spark):
    # |A| = 5, inter = 4 -> containment exactly 0.8 at t = 0.8
    texts = ["a b c d e", "a b c d x y z"]
    assert (0, 1, 0.8) in _spark_containment(spark, texts, 0.8)


def test_containment_partition_invariance(spark):
    rng = random.Random(3)
    vocab = [f"p{i}" for i in range(10)]
    texts = [" ".join(rng.sample(vocab, rng.randrange(2, 6))) for _ in range(18)]
    want = _brute_containment(texts, 0.7)
    for p in (1, 3, 8):
        assert _spark_containment(spark, texts, 0.7, parts=p) == want


def test_containment_rejects_bad_threshold(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        containment_join(df, df, "text", "doc_id", 0.0)


def test_containment_plan_no_cartesian(spark):
    df = _docs(spark, ["a b", "a b c"])
    plan = audit.formatted_plan(containment_join(df, df, "text", "doc_id", 0.9))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# contrastive_pairs
# ---------------------------------------------------------------------------

def _emb(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(parts)


def test_contrastive_roles_and_ranks(spark):
    # query 0 (label 1) at origin-ish; neighbors engineered by cosine
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),   # same label, closest pos
        (2, [0.5, 0.5], 1),   # same label, further
        (3, [0.95, 0.05], 2),  # diff label, closest neg (the hard one)
        (4, [0.0, 1.0], 2),   # diff label, orthogonal-ish
    ]
    out = contrastive_pairs(
        _emb(spark, rows), _emb(spark, [rows[0]]), k_pos=1, k_neg=1
    ).collect()
    by_role = {r["role"]: r for r in out}
    assert set(by_role) == {"positive", "hard_negative"}
    assert by_role["positive"]["neighbor_id"] == 1
    assert by_role["hard_negative"]["neighbor_id"] == 3
    assert by_role["positive"]["rank"] == 1


def test_contrastive_matches_brute_force(spark):
    rng = random.Random(19)
    rows = [
        (
            i,
            [rng.gauss(0, 1) for _ in range(6)],
            rng.randrange(3),
        )
        for i in range(60)
    ]
    queries = rows[:5]
    out = contrastive_pairs(
        _emb(spark, rows), _emb(spark, queries), k_pos=2, k_neg=2
    ).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)

    for qid, qv, ql in queries:
        scored = [
            (("positive" if l == ql else "hard_negative"), nid, cos(qv, v))
            for nid, v, l in rows
            if nid != qid
        ]
        for role in ("positive", "hard_negative"):
            want = sorted(
                [(c, n) for r, n, c in scored if r == role],
                key=lambda t: (-t[0], t[1]),
            )[:2]
            got = sorted(
                (r["cos_sim"], r["neighbor_id"])
                for r in out
                if r["query_id"] == qid and r["role"] == role
            )
            assert got == sorted(want), (qid, role)


def test_contrastive_null_labels_excluded(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.01], None),  # unlabeled: excluded from both roles
        (2, [0.9, 0.1], 1),
        (3, [0.8, 0.2], 2),
    ]
    out = contrastive_pairs(
        _emb(spark, rows), _emb(spark, [rows[0]]), k_pos=3, k_neg=3
    ).collect()
    assert all(r["neighbor_id"] != 1 for r in out)


def test_contrastive_validation(spark):
    df = _emb(spark, [(0, [1.0], 1)])
    with pytest.raises(ValueError):
        contrastive_pairs(df, df, k_pos=0)
