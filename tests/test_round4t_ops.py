"""Wave-50 operator tests: WoE/IV profile and dim-truncation recall."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.similarity import dim_truncation_report
from jsons_to_schema_spark.operators.stats import woe_iv_profile
from pyspark.sql import functions as F


def _wdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(None if v is None else float(v), b) for v, b in rows],
        "v double, bad boolean",
    ).repartition(parts)


def _woe(spark, rows, lo, hi, nb):
    out = woe_iv_profile(_wdf(spark, rows), "v", "bad", lo, hi, nb).collect()
    return {r["bucket"]: (r["n_good"], r["n_bad"], r["woe"], r["iv_term"]) for r in out}


def test_woe_hand_example(spark):
    # bucket 0: 3 good 1 bad; bucket 1: 1 good 3 bad; totals G=4 B=4
    rows = [(0.1, False), (0.2, False), (0.3, False), (0.4, True),
            (1.1, True), (1.2, True), (1.3, True), (1.4, False)]
    got = _woe(spark, rows, 0.0, 2.0, 2)
    g, b, woe, iv = got[0]
    assert (g, b) == (3, 1)
    assert woe == round(math.log((3 / 4) / (1 / 4)), 6)
    assert iv == round((3 / 4 - 1 / 4) * math.log((3 / 4) / (1 / 4)), 6)
    g1, b1, woe1, _ = got[1]
    assert (g1, b1) == (1, 3) and woe1 == round(math.log((1 / 4) / (3 / 4)), 6)


def test_woe_empty_side_null_and_empty_bucket_present(spark):
    rows = [(0.5, False), (0.6, False),      # bucket 0: all good
            (2.5, True), (2.6, False)]       # bucket 2: mixed
    got = _woe(spark, rows, 0.0, 3.0, 3)
    assert set(got) == {0, 1, 2}            # empty bucket 1 still present
    assert got[0][2] is None and got[0][3] is None  # zero bad → NULL WoE
    assert got[1] == (0, 0, None, None)
    assert got[2][2] is not None


def test_woe_boundary_and_exclusions(spark):
    rows = [(3.0, False), (3.0, True),       # v == hi → last bucket
            (-0.1, True), (3.1, True),       # outside → excluded
            (None, True), (1.0, None)]       # NULL feature / target excluded
    got = _woe(spark, rows, 0.0, 3.0, 3)
    assert got[2][0] == 1 and got[2][1] == 1
    assert sum(g + b for g, b, *_ in got.values()) == 2


def test_woe_brute_parity_random(spark):
    rng = random.Random(5001)
    rows = [(rng.uniform(-1, 11), rng.random() < 0.3) for _ in range(500)]
    lo, hi, nb = 0.0, 10.0, 7
    keep = [(v, b) for v, b in rows if lo <= v <= hi]
    cnt = {i: [0, 0] for i in range(nb)}
    w = (hi - lo) / nb
    for v, b in keep:
        i = min(int(math.floor((v - lo) / w)), nb - 1)
        cnt[i][1 if b else 0] += 1
    G = sum(c[0] for c in cnt.values())
    B = sum(c[1] for c in cnt.values())
    got = _woe(spark, rows, lo, hi, nb)
    for i, (g, b) in cnt.items():
        eg, eb, ew, ei = got[i]
        assert (eg, eb) == (g, b)
        if g > 0 and b > 0:
            woe = math.log((g / G) / (b / B))
            assert ew == round(woe, 6)
            assert ei == round((g / G - b / B) * woe, 6)
        else:
            assert ew is None and ei is None


def test_woe_validation(spark):
    df = _wdf(spark, [(1.0, True)])
    with pytest.raises(ValueError):
        woe_iv_profile(df, "v", "bad", 0.0, 1.0, 0)
    with pytest.raises(ValueError):
        woe_iv_profile(df, "v", "bad", 2.0, 1.0, 4)


# ---------------------------------------------------------------------------
# Dim-truncation recall
# ---------------------------------------------------------------------------


def _r6(x):
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _brute_report(vecs, qids, k, cuts):
    full = len(vecs[0][1])

    def topk(qid, d):
        qv = dict(vecs)[qid][:d]
        scored = []
        for nid, v in vecs:
            if nid == qid:
                continue
            vv = v[:d]
            dot = sum(a * b for a, b in zip(qv, vv))
            na = math.sqrt(sum(a * a for a in qv))
            nb = math.sqrt(sum(b * b for b in vv))
            scored.append((_r6(dot / (na * nb)), nid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return [nid for _, nid in scored[:k]]

    out = {}
    for d in cuts:
        ms = []
        for qid in qids:
            truth = set(topk(qid, full))
            ms.append(len(set(topk(qid, d)) & truth))
        out[d] = (
            round(sum(ms) / (k * len(qids)), 6),
            round(min(ms) / k, 6),
        )
    return out


def _emb_df(spark, vecs, parts=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id bigint, embedding array<double>",
    ).repartition(parts)


def test_dimcut_full_dim_row_is_one(spark):
    rng = random.Random(5002)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(30)]
    df = _emb_df(spark, vecs)
    rep = dim_truncation_report(
        df, df.filter(F.col("vec_id") < 4), k=3, dims=[2, 4], full_dim=8
    ).collect()
    byd = {r["dim"]: (r["mean_recall"], r["worst_recall"]) for r in rep}
    assert set(byd) == {2, 4, 8}
    assert byd[8] == (1.0, 1.0)


def test_dimcut_brute_parity_random(spark):
    rng = random.Random(5003)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(12)]) for i in range(40)]
    qids = [0, 1, 2, 3, 4]
    df = _emb_df(spark, vecs)
    rep = dim_truncation_report(
        df, df.filter(F.col("vec_id") < 5), k=3, dims=[2, 4, 8], full_dim=12
    ).collect()
    got = {r["dim"]: (r["mean_recall"], r["worst_recall"]) for r in rep}
    assert got == _brute_report(vecs, qids, 3, [2, 4, 8, 12])


def test_dimcut_zero_overlap_counts_as_zero(spark):
    # first dim is pure noise ANTI-correlated with the signal dims: the
    # d=1 cut ranks by noise only, so some query's truth overlap is 0 and
    # worst_recall must report it (a dropped group would hide the zero)
    rng = random.Random(5004)
    vecs = []
    for i in range(20):
        sig = [rng.gauss(0, 1) for _ in range(4)]
        vecs.append((i, [rng.gauss(0, 1)] + sig))
    qids = [0, 1, 2]
    df = _emb_df(spark, vecs)
    rep = dim_truncation_report(
        df, df.filter(F.col("vec_id") < 3), k=2, dims=[1], full_dim=5
    ).collect()
    got = {r["dim"]: (r["mean_recall"], r["worst_recall"]) for r in rep}
    assert got == _brute_report(vecs, qids, 2, [1, 5])


def test_dimcut_validation(spark):
    df = _emb_df(spark, [(0, [1.0, 2.0])])
    with pytest.raises(ValueError):
        dim_truncation_report(df, df, k=0, dims=[1], full_dim=2)
    with pytest.raises(ValueError):
        dim_truncation_report(df, df, k=1, dims=[3], full_dim=2)
