"""Unit tests for operators/modeleval.py: exact ROC AUC (pair-counting
brute force + bin-count invariance), calibration table, gains/lift."""

import math
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.modeleval import (
    calibration_table,
    gains_table,
    roc_auc,
)
from jsons_to_schema_spark.plans import audit


def _brute_auc(pairs):
    """AUC by O(P*N) pair counting: P(score_pos > score_neg) + 0.5 ties."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return round(num / (len(pos) * len(neg)), 6)


def _df(spark, rows, parts=5):
    return spark.createDataFrame(
        rows, "score double, y boolean"
    ).repartition(parts)


def _auc_row(spark, rows, bins=16, lo=0.0, hi=1.0):
    return (
        roc_auc(_df(spark, rows), "score", "y", lo, hi, bins=bins)
        .collect()[0]
        .asDict()
    )


def test_auc_matches_pair_counting_with_ties(spark):
    rng = random.Random(7)
    # coarse grid -> plenty of ties, including cross-class ties
    rows = [
        (rng.randrange(0, 20) / 20.0, rng.random() < 0.4) for _ in range(300)
    ]
    got = _auc_row(spark, rows)
    assert got["auc"] == _brute_auc(rows)
    assert got["n_pos"] == sum(1 for _, y in rows if y)
    assert got["n_neg"] == sum(1 for _, y in rows if not y)
    assert got["n_null"] == 0
    assert got["gini"] == round(2 * got["auc"] - 1, 6)


@pytest.mark.parametrize("bins", [1, 3, 64, 4096])
def test_auc_invariant_to_bin_count(spark, bins):
    """Binning is a parallelization detail: ANY bin count gives the same
    exact value (clamping included — scores outside [lo, hi) too)."""
    rng = random.Random(11)
    rows = [(rng.gauss(0.5, 0.6), rng.random() < 0.5) for _ in range(200)]
    got = _auc_row(spark, rows, bins=bins)  # many scores fall outside [0,1)
    assert got["auc"] == _brute_auc(rows)


def test_auc_nulls_counted_and_excluded(spark):
    rows = [(0.9, True), (0.1, False), (None, True), (0.5, None), (0.7, True)]
    got = _auc_row(spark, rows)
    assert got["n_null"] == 2
    assert got["auc"] == _brute_auc([(0.9, True), (0.1, False), (0.7, True)])


def test_auc_degenerate_single_class_is_null(spark):
    got = _auc_row(spark, [(0.3, True), (0.8, True)])
    assert got["auc"] is None and got["gini"] is None
    assert got["n_pos"] == 2 and got["n_neg"] == 0


def test_auc_perfect_and_inverted(spark):
    perfect = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    assert _auc_row(spark, perfect)["auc"] == 1.0
    inverted = [(s, not y) for s, y in perfect]
    assert _auc_row(spark, inverted)["auc"] == 0.0


def test_auc_partition_invariance(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(0, 9) / 8.0, rng.random() < 0.3) for _ in range(150)]
    vals = {
        roc_auc(_df(spark, rows, parts=p), "score", "y", 0.0, 1.0, bins=8)
        .collect()[0]["auc"]
        for p in (1, 2, 13)
    }
    assert len(vals) == 1


def test_calibration_table_exact(spark):
    rows = [
        (0.05, False), (0.08, True),            # bin 0
        (0.55, True), (0.52, False), (0.58, True),  # bin 5
        (0.95, True), (0.99, True),             # bin 9
        (1.50, True),                           # clamps into bin 9
    ]
    got = {
        r["bin"]: r.asDict()
        for r in calibration_table(
            _df(spark, rows), "score", "y", 0.0, 1.0, bins=10
        ).collect()
    }
    assert set(got) == {0, 5, 9}
    b5 = got[5]
    assert b5["n"] == 3 and b5["n_pos"] == 2
    assert b5["mean_pred"] == round((0.55 + 0.52 + 0.58) / 3, 6)
    assert b5["frac_pos"] == round(2 / 3, 6)
    assert b5["abs_gap"] == round(abs(b5["mean_pred"] - b5["frac_pos"]), 6)
    assert b5["ece_contrib"] == round(3 / 8 * b5["abs_gap"], 6)
    assert got[9]["n"] == 3  # the clamped 1.50 row landed here


def test_gains_table_exact(spark):
    # 2 bands of interest: top band captures 2/3 positives from 2/6 rows
    rows = [
        (0.95, True), (0.9, True),
        (0.45, True), (0.4, False), (0.42, False),
        (0.05, False),
    ]
    got = {
        r["band"]: r.asDict()
        for r in gains_table(
            _df(spark, rows), "score", "y", 0.0, 1.0, bands=10
        ).collect()
    }
    top = got[9]
    assert top["cum_n"] == 2 and top["cum_pos"] == 2
    assert top["capture_rate"] == round(2 / 3, 6)
    assert top["cum_lift"] == round((2 / 2) / (3 / 6), 6)
    mid = got[4]
    assert mid["cum_n"] == 5 and mid["cum_pos"] == 3
    assert mid["capture_rate"] == 1.0
    bot = got[0]
    assert bot["cum_n"] == 6 and bot["cum_lift"] == 1.0


def test_auc_plan_no_corpus_global_sort(spark):
    """The only single-partition exchange feeds the bounded bin table;
    the per-score fold is a keyed hash aggregate, and nothing Python."""
    rng = random.Random(5)
    rows = [(rng.random(), rng.random() < 0.5) for _ in range(64)]
    plan = audit.formatted_plan(
        roc_auc(_df(spark, rows, parts=8), "score", "y", 0.0, 1.0, bins=8)
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(_bin" in plan
