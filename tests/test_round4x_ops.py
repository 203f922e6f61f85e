"""Wave-54 operator tests: seeded DP count release."""

import hashlib
import math
import random

import pytest

from jsons_to_schema_spark.operators.stats import dp_noisy_counts


def _df(spark, cats, parts=4):
    return spark.createDataFrame([(c,) for c in cats], "cat string").repartition(parts)


def _release(spark, cats, epsilon, seed=42, parts=4):
    out = dp_noisy_counts(_df(spark, cats, parts=parts), "cat", epsilon, seed).collect()
    return {r["cat"]: (r["n_released"], r["epsilon"]) for r in out}


def _round_half_away(x):
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _brute_release(cats, epsilon, seed=42):
    from collections import Counter

    counts = Counter(c for c in cats if c is not None)
    out = {}
    b = 1.0 / epsilon
    for cat, n in counts.items():
        h = hashlib.md5(f"dp-{seed}\x1f{cat}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 16**8
        noise = b * math.log(2.0 * u) if u < 0.5 else -b * math.log(2.0 * (1.0 - u))
        out[cat] = (n + _round_half_away(noise), epsilon)
    return out


def test_dp_release_replay_parity(spark):
    rng = random.Random(5401)
    cats = [f"c{rng.randrange(12)}" for _ in range(600)] + [None] * 5
    got = _release(spark, cats, 0.5)
    assert got == _brute_release(cats, 0.5)
    assert None not in got


def test_dp_release_deterministic_and_partition_invariant(spark):
    cats = [f"k{i % 7}" for i in range(200)]
    runs = [_release(spark, cats, 1.0, parts=p) for p in (1, 4, 8)]
    assert runs[0] == runs[1] == runs[2]


def test_dp_noise_scales_with_epsilon(spark):
    cats = [f"c{i % 40}" for i in range(4000)]
    true = {f"c{i}": 100 for i in range(40)}
    tight = _release(spark, cats, 10.0)  # b = 0.1: tiny noise
    loose = _release(spark, cats, 0.1)   # b = 10: loud noise
    err_tight = sum(abs(v[0] - true[c]) for c, v in tight.items())
    err_loose = sum(abs(v[0] - true[c]) for c, v in loose.items())
    assert err_tight < err_loose
    assert err_tight <= 40  # b=0.1 → |noise| rarely rounds past 1
    assert err_loose > 40   # b=10 → mean |noise| = 10 per cell


def test_dp_seed_changes_noise(spark):
    cats = [f"c{i % 10}" for i in range(500)]
    a = _release(spark, cats, 0.5, seed=1)
    c = _release(spark, cats, 0.5, seed=2)
    assert a != c  # different key, different release
    assert a == _brute_release(cats, 0.5, seed=1)
    assert c == _brute_release(cats, 0.5, seed=2)


def test_dp_validation(spark):
    with pytest.raises(ValueError):
        dp_noisy_counts(_df(spark, ["a"]), "cat", 0.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(_df(spark, ["a"]), "cat", -1.0)
