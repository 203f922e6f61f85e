"""Wave-70 operator tests: BH-FDR correction and Wilcoxon signed-rank."""

import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import fdr_correct, wilcoxon_signed_rank


def _pdf(spark, ps, parts=2):
    return spark.createDataFrame(
        [(f"t{i}", None if p is None else float(p)) for i, p in enumerate(ps)],
        "test string, p double",
    ).repartition(parts)


def _fdr(spark, ps, alpha=0.05):
    out = fdr_correct(_pdf(spark, ps), ["test"], "p", alpha).collect()
    return {r["test"]: (r["rank"], r["q_value"], r["rejected"]) for r in out}


def _brute_bh(ps, alpha=0.05):
    items = sorted(
        [(p, f"t{i}") for i, p in enumerate(ps) if p is not None]
    )
    m = len(items)
    ks = [k + 1 for k, (p, _) in enumerate(items) if p * m <= (k + 1) * alpha]
    kstar = max(ks) if ks else 0
    out = {}
    qs = [0.0] * m
    run = 1.0
    for i in range(m - 1, -1, -1):
        run = min(run, items[i][0] * m / (i + 1))
        qs[i] = min(run, 1.0)
    for i, (p, t) in enumerate(items):
        out[t] = (i + 1, round(qs[i], 6), i + 1 <= kstar)
    return out


def test_fdr_textbook_example(spark):
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    got = _fdr(spark, ps, alpha=0.05)
    assert got == _brute_bh(ps, 0.05)
    rejected = {t for t, (_, _, r) in got.items() if r}
    # k* = 2 here: p(2)=0.008 <= 2*0.05/10 while p(3)=0.039 > 0.015
    assert rejected == {"t0", "t1"}
    # naive per-test 5% would have accepted five false discoveries
    assert sum(1 for p in ps if p <= 0.05) == 5


def test_fdr_nulls_and_monotone_q(spark):
    rng = random.Random(7001)
    ps = [rng.random() for _ in range(50)] + [None, 0.0001]
    got = _fdr(spark, ps)
    assert got == _brute_bh(ps)
    qs = [q for _, q, _ in sorted(got.values())]
    assert qs == sorted(qs)  # q monotone in rank


def test_fdr_validation(spark):
    with pytest.raises(ValueError):
        _fdr(spark, [0.5], alpha=1.5)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def _wdf(spark, rows, parts=4):
    return spark.createDataFrame(
        [(float(b), float(a)) for b, a in rows], "b double, a double"
    ).repartition(parts)


def _wsr(spark, rows, bins=64, lo=0.0, hi=1000.0):
    return wilcoxon_signed_rank(
        _wdf(spark, rows), "b", "a", lo, hi, bins
    ).collect()[0].asDict()


def _brute_wsr(rows):
    from collections import Counter

    ds = [round(round(a, 6) * 1e6) - round(round(b, 6) * 1e6) for b, a in rows]
    nz = [d for d in ds if d != 0]
    n = len(nz)
    ads = sorted(abs(d) for d in nz)
    cnt = Counter(ads)
    r = {}
    start = 1
    for v in sorted(cnt):
        t = cnt[v]
        r[v] = start + (t - 1) / 2
        start += t
    wp = sum(r[abs(d)] for d in nz if d > 0)
    tie = sum(t ** 3 - t for t in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - tie / 48
    z = (wp - n * (n + 1) / 4) / math.sqrt(var) if var > 0 else None
    return len(ds), n, round(wp, 6), None if z is None else round(z, 6)


def test_wilcoxon_paired_shift_detected(spark):
    rng = random.Random(7002)
    rows = []
    for _ in range(100):
        base = rng.uniform(10, 500)
        rows.append((base, base + rng.gauss(2.0, 1.0)))  # consistent +2 shift
    got = _wsr(spark, rows)
    assert got["significant"] is True and got["z_stat"] > 5


def test_wilcoxon_unpaired_test_would_miss_it(spark):
    # huge between-doc variance, tiny consistent within-doc improvement:
    # the PAIRING carries all the power
    rng = random.Random(7003)
    rows = [(b, b + 0.5) for b in (rng.uniform(0, 900) for _ in range(80))]
    got = _wsr(spark, rows)
    assert got["z_stat"] > 7  # every diff positive → near-max W+
    assert got["w_plus"] == 80 * 81 / 2


def test_wilcoxon_brute_parity_ties_zeros(spark):
    rng = random.Random(7004)
    rows = [
        (float(rng.randint(0, 20)), float(rng.randint(0, 20)))
        for _ in range(150)
    ]
    got = _wsr(spark, rows, bins=5)
    n_pairs, n, wp, z = _brute_wsr(rows)
    assert (got["n_pairs"], got["n_nonzero"], got["w_plus"], got["z_stat"]) == (
        n_pairs, n, wp, z,
    )


def test_wilcoxon_symmetric_null(spark):
    rng = random.Random(7005)
    rows = [(b, b + rng.gauss(0, 3)) for b in (rng.uniform(0, 100) for _ in range(200))]
    got = _wsr(spark, rows)
    assert got["significant"] is False
