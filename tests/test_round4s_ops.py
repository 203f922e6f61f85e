"""Wave-49 operator tests: exact ACF profile and Mahalanobis outliers."""

import datetime as dt
import math
import random

import numpy as np
import pytest

from jsons_to_schema_spark.operators.stats import mahalanobis_outliers
from jsons_to_schema_spark.operators.temporal import autocorrelation

DAY = 86_400_000_000
EPOCH = dt.datetime(2024, 1, 1)


def _series_df(spark, rows, parts=4):
    # rows: (key, day_index, value)
    return spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(days=d), float(v)) for k, d, v in rows],
        "k string, ts timestamp, v double",
    ).repartition(parts)


def _acf(spark, rows, lags, **kw):
    out = autocorrelation(
        _series_df(spark, rows), ["k"], "ts", "v", 86400, lags, **kw
    ).collect()
    return {(r["k"], r["lag"]): (r["n_pairs"], r["acf"]) for r in out}


def _brute_acf(rows, lags):
    """Pure-python replay: daily avg cells quantized to micro-units, then
    Pearson over (x_t, x_{t+lag}) pairs."""
    cells = {}
    for k, d, v in rows:
        cells.setdefault((k, d), []).append(float(v))
    vm = {
        (k, d): round(round(sum(vs) / len(vs), 6) * 1e6)
        for (k, d), vs in cells.items()
    }
    out = {}
    for k in {k for k, _ in vm}:
        for lag in lags:
            pairs = [
                (vm[(k, d)], vm[(k, d + lag)])
                for (kk, d) in vm
                if kk == k and (k, d + lag) in vm
            ]
            n = len(pairs)
            if n < 2:
                out[(k, lag)] = (n, None)
                continue
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                out[(k, lag)] = (n, None)
            else:
                out[(k, lag)] = (
                    n,
                    round((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)), 6),
                )
    return out


def test_acf_periodic_series(spark):
    rows = [("a", d, [1.0, 5.0, 9.0][d % 3]) for d in range(30)]
    got = _acf(spark, rows, [1, 3])
    n3, acf3 = got[("a", 3)]
    assert n3 == 27 and acf3 == 1.0  # perfect period-3 cycle
    n1, acf1 = got[("a", 1)]
    assert n1 == 29 and acf1 < 0  # adjacent days anti-correlated


def test_acf_constant_series_null(spark):
    rows = [("a", d, 7.0) for d in range(10)]
    got = _acf(spark, rows, [1])
    assert got[("a", 1)] == (9, None)


def test_acf_gaps_reduce_pairs(spark):
    rows = [("a", d, float(d % 5)) for d in range(20) if d % 4 != 2]
    got = _acf(spark, rows, [1, 2])
    assert got == _brute_acf(rows, [1, 2])


def test_acf_brute_parity_random_multikey(spark):
    rng = random.Random(4901)
    rows = []
    for k in ("a", "b", "c"):
        for d in range(40):
            if rng.random() < 0.8:
                # several events per day exercise the avg cell
                for _ in range(rng.randint(1, 3)):
                    rows.append((k, d, round(rng.uniform(0, 100), 3)))
    got = _acf(spark, rows, [1, 2, 7])
    assert got == _brute_acf(rows, [1, 2, 7])


def test_acf_validation(spark):
    df = _series_df(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        autocorrelation(df, [], "ts", "v", 86400, [1])
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "ts", "v", 86400, [])
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "ts", "v", 86400, [0])
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "ts", "v", 0, [1])


# ---------------------------------------------------------------------------
# Mahalanobis outliers
# ---------------------------------------------------------------------------


def _mdf(spark, rows, cols=("x", "y", "z"), parts=4):
    schema = "id bigint, " + ", ".join(f"{c} double" for c in cols)
    return spark.createDataFrame(
        [(i, *map(lambda t: None if t is None else float(t), r)) for i, r in enumerate(rows)],
        schema,
    ).repartition(parts)


def _brute_d2(rows):
    """numpy replay on the quantized values (sample covariance)."""
    q = np.round(np.asarray(rows, dtype=float) * 1e6) / 1e6
    mu = q.mean(axis=0)
    cov = np.cov(q, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    zz = q - mu
    return np.einsum("ij,jk,ik->i", zz, inv, zz)


def test_mahalanobis_planted_joint_outlier(spark):
    rng = random.Random(4902)
    # correlated cloud: y ~ 2x, z ~ -x
    rows = []
    for _ in range(400):
        x = rng.gauss(10, 1)
        rows.append((x, 2 * x + rng.gauss(0, 0.1), -x + rng.gauss(0, 0.1)))
    # the plant sits INSIDE every marginal but breaks the correlation
    plant = (12.0, 24.0, -8.0)  # ~2sigma marginally, z+x = 4 ≈ 40 residual sigma
    rows.append(plant)
    df = _mdf(spark, rows)
    got = mahalanobis_outliers(df, ["x", "y", "z"], 16.27, ["id"]).collect()
    ids = {r["id"] for r in got}
    assert len(rows) - 1 in ids  # the plant is flagged
    # and it is inside 3 sigma on every marginal (a z-score check misses it)
    arr = np.asarray(rows)
    for j, v in enumerate(plant):
        assert abs(v - arr[:, j].mean()) < 3 * arr[:, j].std(ddof=1)


@pytest.mark.parametrize("seed,n,thr", [(4903, 300, 7.81), (4904, 500, 11.34)])
def test_mahalanobis_numpy_parity(spark, seed, n, thr):
    rng = random.Random(seed)
    rows = [
        (rng.gauss(0, 2), rng.gauss(5, 3), rng.gauss(-1, 0.5))
        for _ in range(n)
    ]
    df = _mdf(spark, rows)
    got = {r["id"]: r["dist2"] for r in
           mahalanobis_outliers(df, ["x", "y", "z"], thr, ["id"]).collect()}
    d2 = _brute_d2(rows)
    expected = {i for i, v in enumerate(d2) if round(v, 6) > thr}
    assert set(got) == expected
    for i, v in got.items():
        assert abs(v - d2[i]) < 1e-4


def test_mahalanobis_2d_closed_form(spark):
    rng = random.Random(4905)
    rows = [(rng.gauss(0, 1), rng.gauss(0, 1), 0.0) for _ in range(200)]
    rows2 = [(x, y) for x, y, _ in rows]
    df = _mdf(spark, rows2, cols=("x", "y"))
    got = {r["id"]: r["dist2"] for r in
           mahalanobis_outliers(df, ["x", "y"], 5.99, ["id"]).collect()}
    q = np.round(np.asarray(rows2) * 1e6) / 1e6
    mu, cov = q.mean(axis=0), np.cov(q, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    zz = q - mu
    d2 = np.einsum("ij,jk,ik->i", zz, inv, zz)
    assert set(got) == {i for i, v in enumerate(d2) if round(v, 6) > 5.99}


def test_mahalanobis_null_rows_excluded(spark):
    rows = [(float(i % 7), float((3 * i) % 5), float(i % 3)) for i in range(50)]
    base = mahalanobis_outliers(
        _mdf(spark, rows), ["x", "y", "z"], 0.0, ["id"]
    ).count()
    rows_n = rows + [(None, 1.0, 1.0), (1.0, None, 1.0)]
    with_null = mahalanobis_outliers(
        _mdf(spark, rows_n), ["x", "y", "z"], 0.0, ["id"]
    ).collect()
    assert len(with_null) == base  # NULL-feature rows scored nowhere
    assert all(r["id"] < 50 for r in with_null)


def test_mahalanobis_singular_raises(spark):
    rows = [(float(i), 2.0 * i, float(i % 3)) for i in range(30)]  # y ≡ 2x
    df = _mdf(spark, rows)
    with pytest.raises(Exception, match="singular"):
        mahalanobis_outliers(df, ["x", "y", "z"], 1.0, ["id"]).collect()
    with pytest.raises(ValueError, match="2 or 3"):
        mahalanobis_outliers(df, ["x"], 1.0, ["id"])
