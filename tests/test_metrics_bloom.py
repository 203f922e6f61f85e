"""Round-4 continuation operators: metrics repository + history anomalies,
Bloom-filter membership, key/FD discovery, datatype consistency.

The driver-facing behaviour of each is oracled in test_oracles.py (queries
metric_anomalies_events, candidate_keys_orders, fd_orders_nation,
datatype_profile_events, decontam_bloom_documents); these tests cover the
contracts the oracle queries don't reach: repository idempotence, the
absolute/relative anomaly strategies, Bloom no-false-negatives /
null handling / determinism, and the analyzer edge cases (all-null column,
NULL-bearing FD groups).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import bloom, decontam, metrics_repo, stats

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# metrics repository
# ---------------------------------------------------------------------------

def _metric_rows(df):
    return {
        (r["run_id"], r["instance"], r["metric"]): r["value"]
        for r in df.collect()
    }


def test_compute_metrics_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 20.0)], "id long, v double"
    )
    m = _metric_rows(
        metrics_repo.compute_metrics(df, ["v"], dataset="d", run_id=7)
    )
    assert m[(7, "*", "size")] == 4.0
    assert m[(7, "v", "completeness")] == 0.75
    assert m[(7, "v", "mean")] == 20.0
    assert m[(7, "v", "minimum")] == 10.0
    assert m[(7, "v", "maximum")] == 30.0


def test_compute_metrics_distinctness_and_grouped(spark):
    df = spark.createDataFrame(
        [(0, "a"), (0, "a"), (0, "b"), (1, "c")], "run long, s string"
    )
    m = _metric_rows(
        metrics_repo.compute_metrics(
            df, ["s"], dataset="d", run_col="run", distinct="exact"
        )
    )
    assert m[(0, "*", "size")] == 3.0
    assert m[(0, "s", "distinctness")] == pytest.approx(2 / 3)
    assert m[(1, "s", "distinctness")] == 1.0


def test_repository_save_is_idempotent_per_run(spark, tmp_path):
    repo = metrics_repo.MetricsRepository(spark, tmp_path / "repo")
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    repo.save(metrics_repo.compute_metrics(df, ["v"], run_id=0))
    repo.save(metrics_repo.compute_metrics(df, ["v"], run_id=1))
    # retried pipeline re-stamps run 1 — history must not duplicate
    repo.save(metrics_repo.compute_metrics(df.limit(1), ["v"], run_id=1))
    hist = repo.load()
    assert repo.latest_run() == 1
    per_run = {
        r["run_id"]: r["cnt"]
        for r in hist.groupBy("run_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_run[0] == per_run[1]  # same metric-row count, no duplication
    size1 = hist.filter(
        (F.col("run_id") == 1) & (F.col("metric") == "size")
    ).collect()[0]["value"]
    assert size1 == 1.0  # the retry's numbers, not the first attempt's


def _anomaly_frame(spark, values, current=3):
    rows = [(i, "d", "v", "mean", float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "run_id long, dataset string, instance string, metric string, value double"
    )


def test_absolute_change_strategy(spark):
    m = _anomaly_frame(spark, [10.0, 10.5, 11.0, 25.0])
    out = metrics_repo.detect_metric_anomalies(
        m, current_run=3, strategy="absolute_change", max_delta=5.0
    ).collect()[0]
    assert out["hist_last"] == 11.0 and out["is_anomaly"] is True
    ok = metrics_repo.detect_metric_anomalies(
        m, current_run=3, strategy="absolute_change", max_delta=20.0
    ).collect()[0]
    assert ok["is_anomaly"] is False


def test_relative_change_strategy_and_zero_last(spark):
    m = _anomaly_frame(spark, [10.0, 10.0, 10.0, 25.0])
    out = metrics_repo.detect_metric_anomalies(
        m, current_run=3, strategy="relative_change", rate_lo=0.5, rate_hi=2.0
    ).collect()[0]
    assert out["is_anomaly"] is True  # 2.5x > 2.0
    z = _anomaly_frame(spark, [0.0, 0.0, 0.0, 1.0])
    out = metrics_repo.detect_metric_anomalies(
        z, current_run=3, strategy="relative_change", rate_lo=0.5, rate_hi=2.0
    ).collect()[0]
    assert out["is_anomaly"] is True  # last == 0, value != 0 flags
    z0 = _anomaly_frame(spark, [0.0, 0.0, 0.0, 0.0])
    out = metrics_repo.detect_metric_anomalies(
        z0, current_run=3, strategy="relative_change", rate_lo=0.5, rate_hi=2.0
    ).collect()[0]
    assert out["is_anomaly"] is False


def test_min_history_yields_null_verdict(spark):
    m = _anomaly_frame(spark, [10.0, 20.0])  # one history point for run 1
    out = metrics_repo.detect_metric_anomalies(
        m, current_run=1, strategy="online_normal", min_history=2
    ).collect()[0]
    assert out["is_anomaly"] is None and out["n_history"] == 1


def test_unknown_strategy_raises(spark):
    m = _anomaly_frame(spark, [1.0])
    with pytest.raises(ValueError):
        metrics_repo.detect_metric_anomalies(m, 0, strategy="nope")
    with pytest.raises(ValueError):
        metrics_repo.detect_metric_anomalies(m, 0, strategy="absolute_change")


# ---------------------------------------------------------------------------
# bloom filter
# ---------------------------------------------------------------------------

def test_bloom_sizing():
    m = bloom.bloom_num_bits(1000, 0.01)
    assert m % 8 == 0 and 9000 < m < 10100  # ~9.59 bits/key at 1%
    assert bloom.bloom_num_hashes(m, 1000) == 7
    with pytest.raises(ValueError):
        bloom.bloom_num_bits(0, 0.01)
    with pytest.raises(ValueError):
        bloom.bloom_num_bits(10, 1.5)


def test_bloom_no_false_negatives_and_fpp(spark):
    members = [f"key-{i}" for i in range(500)]
    df = spark.createDataFrame([(m,) for m in members], "v string")
    bits = bloom.bloom_num_bits(len(members), 0.01)
    k = bloom.bloom_num_hashes(bits, len(members))
    bm = bloom.build_bloom(df, "v", bits, k)

    probe_rows = [(m, True) for m in members] + [
        (f"other-{i}", False) for i in range(2000)
    ]
    probed = (
        spark.createDataFrame(probe_rows, "v string, member boolean")
        .withColumn("hit", bloom.bloom_contains("v", bm, bits, k))
        .collect()
    )
    false_neg = [r for r in probed if r["member"] and not r["hit"]]
    assert not false_neg  # the structural guarantee
    fp = sum(1 for r in probed if not r["member"] and r["hit"])
    assert fp / 2000 < 0.05  # target 1%, generous margin


def test_bloom_null_values_never_members(spark):
    df = spark.createDataFrame([("a",), (None,)], "v string")
    bits, k = 1024, 3
    bm = bloom.build_bloom(df, "v", bits, k)
    out = {
        r["v"]: r["hit"]
        for r in spark.createDataFrame([("a",), (None,), ("b",)], "v string")
        .withColumn("hit", bloom.bloom_contains("v", bm, bits, k))
        .collect()
    }
    assert out["a"] is True and out[None] is False


def test_bloom_build_deterministic_across_partitioning(spark):
    rows = [(f"k{i}",) for i in range(300)]
    a = bloom.build_bloom(
        spark.createDataFrame(rows, "v string").repartition(2), "v", 4096, 5
    )
    b = bloom.build_bloom(
        spark.createDataFrame(rows, "v string").repartition(11), "v", 4096, 5
    )
    assert a == b


def test_bloom_bad_args(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        bloom.build_bloom(df, "v", 1001, 3)  # not a multiple of 8
    with pytest.raises(ValueError):
        bloom.bloom_contains("v", b"\x00" * 10, 1024, 3)  # size mismatch


def test_decontaminate_bloom_equals_exact(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 17 == 0), "text", n=5
    )
    exact = decontam.decontaminate(docs, ev, "text", "doc_id", n=5)
    via_bloom = decontam.decontaminate_bloom(
        docs, ev, "text", "doc_id", n=5, fpp=0.05
    )
    assert sorted(r["doc_id"] for r in exact.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in via_bloom.select("doc_id").collect()
    )


def test_decontaminate_bloom_empty_eval_passthrough(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.lit(False)), "text", n=5
    )
    out = decontam.decontaminate_bloom(docs, ev, "text", "doc_id", n=5)
    assert out.count() == docs.count()


# ---------------------------------------------------------------------------
# key / FD / datatype analyzers
# ---------------------------------------------------------------------------

def test_candidate_keys_null_disqualifies(spark):
    # distinct == rows but one NULL: not a key
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    row = stats.candidate_keys(df, ["v"]).collect()[0]
    assert row["n_distinct"] == 2 and row["n_nulls"] == 1
    assert row["is_key"] is False


def test_functional_dependency_null_counts_as_value(spark):
    # (a, NULL) and (a, x) disagree — FD must be violated
    df = spark.createDataFrame(
        [("a", None), ("a", "x"), ("b", "y")], "k string, v string"
    )
    row = stats.functional_dependency(df, ["k"], "v").collect()[0]
    assert row["violating_groups"] == 1 and row["holds"] is False


def test_functional_dependency_composite_determinant(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 1, "x")],
        "k string, i int, v string",
    )
    row = stats.functional_dependency(df, ["k", "i"], "v").collect()[0]
    assert row["determinant"] == "k,i" and row["holds"] is True
    assert row["n_groups"] == 2


def test_datatype_profile_all_null_is_unknown(spark):
    df = spark.createDataFrame([(None,), (None,)], "s string")
    row = stats.datatype_profile(df, ["s"]).collect()[0]
    assert row["inferred_type"] == "Unknown" and row["n_null"] == 2


def test_datatype_profile_boolean_and_other(spark):
    df = spark.createDataFrame(
        [("true",), ("FALSE",), ("True",)], "s string"
    )
    assert (
        stats.datatype_profile(df, ["s"]).collect()[0]["inferred_type"]
        == "Boolean"
    )
    mixed = spark.createDataFrame([("1",), ("x y",)], "s string")
    row = stats.datatype_profile(mixed, ["s"]).collect()[0]
    assert row["inferred_type"] == "String" and row["n_other"] == 1


def test_stamp_run_lifecycle(spark, tmp_path):
    """First stamp → no history; second → verdicts exist but are NULL
    below min_history; third → real verdicts, and a planted regression
    flags."""
    repo = tmp_path / "mrepo"
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("v")
    )
    run0, an0 = metrics_repo.stamp_run(spark, base, repo, dataset="t")
    assert run0 == 0 and an0 is None
    run1, an1 = metrics_repo.stamp_run(spark, base, repo, dataset="t")
    assert run1 == 1
    assert all(r["is_anomaly"] is None for r in an1.collect())  # 1 < min_history
    bad = base.withColumn(
        "v", F.when(F.col("id") % 2 == 0, F.col("v"))  # half the values nulled
    )
    run2, an2 = metrics_repo.stamp_run(spark, bad, repo, dataset="t")
    assert run2 == 2
    verdicts = {
        (r["instance"], r["metric"]): r["is_anomaly"] for r in an2.collect()
    }
    assert verdicts[("v", "completeness")] is True  # the planted regression
    assert verdicts[("*", "size")] is False


def test_uniqueness_profile_null_is_a_value(spark):
    """A half-NULL column is not unique: NULL groups like any value."""
    df = spark.createDataFrame(
        [("a",), (None,), (None,), ("b",)], "s string"
    )
    row = stats.uniqueness_profile(df, ["s"]).collect()[0]
    assert row["n_rows"] == 4 and row["n_distinct"] == 3
    assert row["n_unique"] == 2  # 'a' and 'b'; NULL occurs twice
    assert row["uniqueness"] == 0.5


def test_compute_metrics_string_lengths(spark):
    df = spark.createDataFrame(
        [("ab",), ("abcd",), (None,)], "s string"
    )
    m = _metric_rows(metrics_repo.compute_metrics(df, ["s"], run_id=0))
    assert m[(0, "s", "min_length")] == 2.0
    assert m[(0, "s", "max_length")] == 4.0
    assert (0, "s", "mean") not in m  # strings get lengths, not means


def test_history_window_bounds_the_judged_runs(spark):
    # runs 0..4 with an early outlier at run 0: the full history flags
    # nothing (huge stddev), the trailing-3 window flags the jump at run 4
    m = _anomaly_frame(spark, [1000.0, 10.0, 10.0, 10.0, 25.0])
    full = metrics_repo.detect_metric_anomalies(
        m, current_run=4, strategy="online_normal", k=3.0
    ).collect()[0]
    assert full["n_history"] == 4 and full["is_anomaly"] is False
    windowed = metrics_repo.detect_metric_anomalies(
        m, current_run=4, strategy="online_normal", k=3.0, history_window=3
    ).collect()[0]
    assert windowed["n_history"] == 3
    assert windowed["hist_mean"] == 10.0 and windowed["is_anomaly"] is True
    with pytest.raises(ValueError):
        metrics_repo.detect_metric_anomalies(m, 4, history_window=0)


def test_repository_windowed_read_prunes_partitions(spark, tmp_path):
    from jsons_to_schema_spark.plans import audit

    repo = metrics_repo.MetricsRepository(spark, tmp_path / "prepo")
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    for r in range(6):
        repo.save(metrics_repo.compute_metrics(df, ["v"], run_id=r))
    q = repo.load().filter(F.col("run_id") >= 4)
    plan = audit.formatted_plan(q)
    # the run-id bound must reach the scan as a PARTITION filter: a
    # windowed history read touches N run directories, not all of them
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "run_id" in frag, frag


def test_candidate_keys_empty_table_certifies_nothing(spark):
    df = spark.createDataFrame([], "v int")
    row = stats.candidate_keys(df, ["v"]).collect()[0]
    assert row["n_rows"] == 0 and row["is_key"] is False


def test_functional_dependencies_multi_matches_single(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "x"), ("b", 3, None), ("b", 3, "y")],
        "k string, i int, v string",
    )
    multi = {
        r["dependent"]: (r["violating_groups"], r["holds"])
        for r in stats.functional_dependencies(df, ["k"], ["i", "v"]).collect()
    }
    for dep in ("i", "v"):
        single = stats.functional_dependency(df, ["k"], dep).collect()[0]
        assert multi[dep] == (single["violating_groups"], single["holds"])
    assert multi["i"] == (1, False)  # k='a' maps to 1 and 2
    assert multi["v"] == (1, False)  # k='b' maps to NULL and 'y'
    with pytest.raises(ValueError):
        stats.functional_dependencies(df, ["k"], [])


def test_functional_dependencies_single_scan(spark):
    from jsons_to_schema_spark.plans import audit
    from jsons_to_schema_spark.sources.tables import load_table

    from .conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders")
    q = stats.functional_dependencies(
        orders, ["o_custkey"], ["o_orderstatus", "o_orderpriority"]
    )
    assert audit.scan_count(q) == 1


def test_containment_grades_and_edges(spark):
    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "x int"
    )
    b = spark.createDataFrame([(1,), (3,), (9,)], "y int")
    row = stats.containment(a, "x", b, "y").collect()[0]
    assert row["rows_total"] == 4  # NULL excluded
    assert row["rows_matched"] == 3  # 1,1,3
    assert row["row_containment"] == 0.75
    assert row["distinct_total"] == 3 and row["distinct_matched"] == 2
    assert row["distinct_containment"] == round(2 / 3, 6)
    # empty reference: nothing resolves
    empty = spark.createDataFrame([], "y int")
    row = stats.containment(a, "x", empty, "y").collect()[0]
    assert row["rows_matched"] == 0 and row["row_containment"] == 0.0


def _ewma_ref(values, alpha):
    # textbook Roberts chart: the recursion initializes at the in-control
    # mean, so the variance-inflation factor in the limit is exact
    m = sum(values) / len(values)
    for x in values:
        m = alpha * x + (1 - alpha) * m
    return m


def test_ewma_strategy_matches_recurrence(spark):
    import math

    hist = [10.0, 12.0, 11.0, 14.0, 13.0, 15.0]
    m = _anomaly_frame(spark, hist + [16.0])
    out = metrics_repo.detect_metric_anomalies(
        m, current_run=6, strategy="ewma", k=3.0, alpha=0.3
    ).collect()[0]
    ref = _ewma_ref(hist, 0.3)
    assert out["hist_ewma"] == round(ref, 6)
    z = round(0.3 * 16.0 + 0.7 * round(ref, 6), 6)
    assert out["ewma_z"] == z
    sd = round(float(np.std(hist, ddof=1)), 6)
    t = len(hist)
    limit = round(
        3.0 * sd * math.sqrt(0.3 / 1.7 * (1 - 0.7 ** (2 * (t + 1)))), 6
    )
    assert out["ewma_limit"] == limit
    assert out["is_anomaly"] == (
        abs(z - round(float(np.mean(hist)), 6)) > limit
    )
    with pytest.raises(ValueError, match="alpha"):
        metrics_repo.detect_metric_anomalies(m, 6, strategy="ewma", alpha=1.0)


def test_ewma_catches_slow_drift_online_normal_misses(spark):
    # a stable metric that starts creeping: no single point breaks 3 sigma
    # of the all-time history, but the EWMA statistic accumulates the
    # drift and escapes its (tighter) control limit
    hist = [100.3, 99.6, 100.1, 99.8, 100.4, 99.7, 100.2, 99.9,
            101.5, 103.0, 104.5, 106.0]
    m = _anomaly_frame(spark, hist + [107.5])
    on = metrics_repo.detect_metric_anomalies(
        m, current_run=12, strategy="online_normal", k=3.0
    ).collect()[0]
    ew = metrics_repo.detect_metric_anomalies(
        m, current_run=12, strategy="ewma", k=3.0, alpha=0.3
    ).collect()[0]
    assert on["is_anomaly"] is False
    assert ew["is_anomaly"] is True


def test_ewma_min_history_null(spark):
    m = _anomaly_frame(spark, [10.0, 12.0])
    out = metrics_repo.detect_metric_anomalies(
        m, current_run=1, strategy="ewma", min_history=2
    ).collect()[0]
    assert out["is_anomaly"] is None and out["n_history"] == 1



def test_seasonal_normal_flags_what_global_hides(spark):
    """A weekday value arriving on a Sunday slot: global online_normal
    passes (the mixed history has huge stddev), seasonal_normal flags it
    against the same-phase history; a phase-conforming value passes."""
    from jsons_to_schema_spark.operators import metrics_repo as mr

    rows = [
        (r, "d", "m", "mean", 100.0 if r % 7 == 0 else 200.0)
        for r in range(14)
    ] + [(14, "d", "m", "mean", 200.0)]
    m = spark.createDataFrame(
        rows, "run_id long, dataset string, instance string, metric string, value double"
    )
    glob = mr.detect_metric_anomalies(m, 14, strategy="online_normal").collect()[0]
    seas = mr.detect_metric_anomalies(
        m, 14, strategy="seasonal_normal", season=7
    ).collect()[0]
    assert glob.is_anomaly is False
    assert seas.is_anomaly is True
    assert seas.hist_mean == 100.0 and seas.n_history == 2
    # conforming Sunday value passes the seasonal check
    ok = spark.createDataFrame(
        rows[:-1] + [(14, "d", "m", "mean", 100.0)],
        "run_id long, dataset string, instance string, metric string, value double",
    )
    assert (
        mr.detect_metric_anomalies(ok, 14, strategy="seasonal_normal", season=7)
        .collect()[0]
        .is_anomaly
        is False
    )
    import pytest as _p

    with _p.raises(ValueError):
        mr.detect_metric_anomalies(m, 14, strategy="seasonal_normal")
    with _p.raises(ValueError):
        mr.detect_metric_anomalies(m, 14, strategy="seasonal_normal", season=1)


def test_stamp_run_extra_metrics_same_partition(spark, tmp_path):
    """extra_metrics rows land in the SAME run partition as the computed
    metrics (one dynamic overwrite), and are judged with the history like
    any other metric."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators.metrics_repo import (
        MetricsRepository,
        stamp_run,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    extra = spark.createDataFrame(
        [("violations", "text_present", "count", 3.0)],
        "dataset string, instance string, metric string, value double",
    )
    stamp_run(spark, df, tmp_path / "repo", "d", run_id=0, extra_metrics=extra)
    stamp_run(spark, df, tmp_path / "repo", "d", run_id=1, extra_metrics=extra)
    big = spark.createDataFrame(
        [("violations", "text_present", "count", 500.0)],
        "dataset string, instance string, metric string, value double",
    )
    run_id, anomalies = stamp_run(
        spark, df, tmp_path / "repo", "d", run_id=2, extra_metrics=big
    )
    repo = MetricsRepository(spark, tmp_path / "repo")
    stored = repo.load().filter("dataset = 'violations' AND run_id = 2").collect()
    assert [(r.instance, r.value) for r in stored] == [("text_present", 500.0)]
    flagged = {
        (r.dataset, r.instance): r.is_anomaly for r in anomalies.collect()
    }
    assert flagged[("violations", "text_present")] is True  # 3,3 -> 500 spikes
    assert flagged[("d", "v")] is False
