"""Wave-52 operator tests: seasonal decomposition and n-gram overlap."""

import datetime as dt
import math
import random
from collections import Counter

import pytest

from jsons_to_schema_spark.operators.temporal import seasonal_decompose
from jsons_to_schema_spark.operators.text import ngram_overlap_metrics

EPOCH = dt.datetime(2024, 1, 1)
DAY_US = 86_400_000_000


def _sdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(days=d), float(v)) for k, d, v in rows],
        "k string, ts timestamp, v double",
    ).repartition(parts)


def _decomp(spark, rows, period):
    out = seasonal_decompose(
        _sdf(spark, rows), ["k"], "ts", "v", 86400, period
    ).collect()
    return {
        (r["k"], r["bucket_us"]): (r["value"], r["trend"], r["seasonal"], r["residual"])
        for r in out
    }


def _brute_decomp(rows, period):
    """Pure-python replay of the exact contract: round-6 avg cells on a
    ffilled complete grid, micro-unit quantization, complete-window
    centered MA, weighted-centered per-position seasonal."""
    half = period // 2
    cells = {}
    for k, d, v in rows:
        cells.setdefault(k, {}).setdefault(d, []).append(float(v))
    out = {}
    for k, by_day in cells.items():
        days = sorted(by_day)
        lo_d, hi_d = days[0], days[-1]
        vm = {}
        last = None
        for d in range(lo_d, hi_d + 1):
            if d in by_day:
                last = round(round(sum(by_day[d]) / len(by_day[d]), 6) * 1e6)
            vm[d] = last  # ffill; leading gap impossible (starts at a cell)
        # trend
        tm = {}
        for d in range(lo_d, hi_d + 1):
            win = [vm[x] for x in range(d - half, d + half + 1) if lo_d <= x <= hi_d]
            win = [x for x in win if x is not None]
            tm[d] = (
                round(sum(win) / period) if len(win) == period and vm[d] is not None else None
            )
        dm = {d: vm[d] - tm[d] for d in tm if tm[d] is not None}
        s_pos, c_pos = {}, {}
        for d, x in dm.items():
            p = (d - lo_d) % period
            s_pos[p] = s_pos.get(p, 0) + x
            c_pos[p] = c_pos.get(p, 0) + 1
        st, ct = sum(s_pos.values()), sum(c_pos.values())
        seas = {p: round(s_pos[p] / c_pos[p] - st / ct) for p in s_pos}
        for d in range(lo_d, hi_d + 1):
            b = int((EPOCH + dt.timedelta(days=d)).timestamp()) * 1_000_000
            p = (d - lo_d) % period
            val = None if vm[d] is None else round(vm[d] / 1e6, 6)
            if tm[d] is None:
                out[(k, b)] = (val, None, None, None)
            else:
                sm = seas[p]
                out[(k, b)] = (
                    val,
                    round(tm[d] / 1e6, 6),
                    round(sm / 1e6, 6),
                    round((vm[d] - tm[d] - sm) / 1e6, 6),
                )
    return out


def test_decompose_recovers_weekly_pattern_shape(spark):
    pattern = [5.0, -3.0, 0.0, 2.0, -1.0, 4.0, -7.0]
    rows = [("a", d, 100.0 + 0.5 * d + pattern[d % 7]) for d in range(35)]
    got = _decomp(spark, rows, 7)
    assert got == _brute_decomp(rows, 7)
    # edges: first and last 3 days have no complete window
    for d in (0, 1, 2, 32, 33, 34):
        b = int((EPOCH + dt.timedelta(days=d)).timestamp()) * 1_000_000
        assert got[("a", b)][1] is None
    # seasonal differences recover pattern differences exactly
    def seas(d):
        b = int((EPOCH + dt.timedelta(days=d)).timestamp()) * 1_000_000
        return got[("a", b)][2]
    for d in range(7, 14):
        delta = seas(d) - seas(7)
        want = pattern[d % 7] - pattern[0]
        assert abs(delta - want) < 1e-5
    # residuals are constant (the weighted-centering offset), near zero
    res = [v[3] for v in got.values() if v[3] is not None]
    assert max(res) - min(res) < 1e-5


def test_decompose_brute_parity_random_gaps_multikey(spark):
    rng = random.Random(5201)
    rows = []
    for k in ("a", "b"):
        for d in range(40):
            if rng.random() < 0.85:
                for _ in range(rng.randint(1, 2)):
                    rows.append((k, d, round(rng.uniform(0, 100), 3)))
    got = _decomp(spark, rows, 7)
    assert got == _brute_decomp(rows, 7)


def test_decompose_validation(spark):
    df = _sdf(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        seasonal_decompose(df, ["k"], "ts", "v", 86400, 6)  # even
    with pytest.raises(ValueError):
        seasonal_decompose(df, ["k"], "ts", "v", 86400, 1)


# ---------------------------------------------------------------------------
# N-gram overlap metrics
# ---------------------------------------------------------------------------


def _pairs_df(spark, rows, parts=2):
    return spark.createDataFrame(
        [(i, c, r) for i, (c, r) in enumerate(rows)],
        "pid bigint, cand string, ref string",
    ).repartition(parts)


def _overlap(spark, rows, n_max=2):
    out = ngram_overlap_metrics(
        _pairs_df(spark, rows), ["pid"], "cand", "ref", n_max
    ).collect()
    return {
        (r["pid"], r["n"]): (
            r["cand_ngrams"], r["ref_ngrams"], r["overlap"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in out
    }


def _brute_overlap(rows, n_max=2):
    out = {}
    for pid, (cand, ref) in enumerate(rows):
        ct = [t for t in (cand or "").split(" ") if t]
        rt = [t for t in (ref or "").split(" ") if t]
        for n in range(1, n_max + 1):
            cg = Counter(" ".join(ct[i:i + n]) for i in range(len(ct) - n + 1))
            rg = Counter(" ".join(rt[i:i + n]) for i in range(len(rt) - n + 1))
            tc, tr = sum(cg.values()), sum(rg.values())
            ov = sum(min(c, rg[g]) for g, c in cg.items())
            p = round(ov / tc, 6) if tc else None
            r = round(ov / tr, 6) if tr else None
            if tc and tr:
                f1 = round(2 * (ov / tc) * (ov / tr) / ((ov / tc) + (ov / tr)), 6) if ov else 0.0
            else:
                f1 = None
            out[(pid, n)] = (tc, tr, ov, p, r, f1)
    return out


def test_overlap_identical_texts(spark):
    rows = [("the quick brown fox", "the quick brown fox")]
    got = _overlap(spark, rows)
    assert got[(0, 1)] == (4, 4, 4, 1.0, 1.0, 1.0)
    assert got[(0, 2)] == (3, 3, 3, 1.0, 1.0, 1.0)


def test_overlap_clipping(spark):
    # BLEU's classic degenerate candidate: repetition must not farm matches
    rows = [("the the the", "the cat")]
    got = _overlap(spark, rows, n_max=1)
    tc, tr, ov, p, r, f1 = got[(0, 1)]
    assert (tc, tr, ov) == (3, 2, 1)
    assert p == round(1 / 3, 6) and r == 0.5
    assert f1 == round(2 * (1 / 3) * 0.5 / ((1 / 3) + 0.5), 6)


def test_overlap_disjoint_and_empty(spark):
    rows = [("a b c", "x y z"), ("", "a b"), ("a", "a b c")]
    got = _overlap(spark, rows, n_max=2)
    assert got == _brute_overlap(rows, n_max=2)
    assert got[(0, 1)][5] == 0.0          # disjoint → f1 0, not NULL
    assert got[(1, 1)][3] is None         # empty candidate → precision NULL
    assert got[(1, 1)][4] == 0.0
    assert got[(2, 2)] == (0, 2, 0, None, 0.0, None)  # cand too short for bigrams


def test_overlap_null_text(spark):
    rows = [(None, "a b"), ("a b", None)]
    got = _overlap(spark, rows, n_max=1)
    assert got == _brute_overlap(rows, n_max=1)


def test_overlap_brute_parity_random(spark):
    rng = random.Random(5202)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(30)
    ]
    assert _overlap(spark, rows, n_max=3) == _brute_overlap(rows, n_max=3)


def test_overlap_validation(spark):
    with pytest.raises(ValueError):
        ngram_overlap_metrics(_pairs_df(spark, [("a", "b")]), ["pid"], "cand", "ref", 0)
