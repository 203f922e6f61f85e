"""Physical-plan assertions — the 100-TB properties, checked as code:
pushdown, pruning, broadcast join choice, partial aggregation, codegen."""

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import text, validate
from jsons_to_schema_spark.operators.stats import column_stats
from jsons_to_schema_spark.plans import audit
from jsons_to_schema_spark.sources.spans import ensure_corpus
from jsons_to_schema_spark.sources.tables import (
    load_media_catalog,
    load_spans,
    load_table,
)

from .conftest import SF_ORACLE


def test_column_pruning_reaches_scan(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    q = docs.select("doc_id", text.token_count("text").alias("n_tokens"))
    cols = audit.read_schema_columns(q)
    assert set(cols) == {"doc_id", "text"}, cols


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = audit.formatted_plan(q)
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters", 1)[1]


def test_referential_check_broadcasts_small_dim(spark):
    corpus = ensure_corpus(5000)
    df = load_spans(spark, corpus)
    cat = load_media_catalog(spark, corpus)
    q = validate.dangling_media_refs(df, cat)
    # anti-join against the 10k-row catalog must be a broadcast join, not SMJ
    plan = audit.executed_plan(q)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_stats_pass_is_single_scan_partial_agg(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    q = column_stats(li, ["l_quantity", "l_discount"], distinct="approx")
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_quality_features_stays_in_codegen(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    q = text.quality_features(docs, "text", "doc_id")
    assert audit.codegen_stage_count(q) >= 1
    # and no Python eval nodes anywhere in the hot path
    plan = audit.executed_plan(q)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_violations_prune_unused_check_columns(spark):
    """Violation scan only needs doc_id + spans — flags are computed, so the
    scan must not read anything else (there is nothing else in this table,
    but assert the plan shape anyway: exactly one scan per check branch)."""
    corpus = ensure_corpus(5000)
    df = load_spans(spark, corpus)
    flagged = validate.with_check_flags(df)
    v = validate.row_violations(flagged, cap_per_check=10)
    assert audit.scan_count(v) >= 1


def test_uniqueness_two_stage_agg(spark):
    corpus = ensure_corpus(5000)
    df = load_spans(spark, corpus)
    q = validate.duplicate_doc_ids(df)
    plan = audit.executed_plan(q)
    # partial+final HashAggregate IS the two-stage salted count (map-side
    # pre-aggregation per scan partition before the shuffle); the scan must
    # be pruned to doc_id only — the hand-rolled spark_partition_id salt that
    # used to force a full nested read is banned
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    assert "partial_count" in plan
    assert audit.read_schema_columns(q) == ["doc_id"]
    assert "SPARK_PARTITION_ID" not in plan


def test_split_verdicts_stay_codegen(spark):
    """Split-keyed verdicts must stay a partial+final codegen HashAggregate —
    no ObjectHashAggregate (no imperative aggs), no Python, one scan, and the
    deterministic _metadata split column must not block anything."""
    corpus = ensure_corpus(5000)
    df = load_spans(spark, corpus)
    q = validate.split_verdicts(df)
    plan = audit.executed_plan(q)
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    assert "ObjectHashAggregate" not in plan
    assert "EvalPython" not in plan
    assert audit.scan_count(q) == 1


def test_ngram_candidates_join_on_hashed_shingles(spark):
    from jsons_to_schema_spark.operators import dedup

    docs = load_table(spark, SF_ORACLE, "documents")
    q = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", min_jaccard=0.2)
    plan = audit.executed_plan(q)
    # stop-shingle cap = a semi join against the surviving-shingle set
    assert "LeftSemi" in plan, plan[:1500]
    # candidate/df joins key on xxhash64-hashed shingles, not raw strings
    assert "xxhash64" in plan
    assert "EvalPython" not in plan


def test_ivf_indexed_probe_broadcasts_queries(spark, tmp_path):
    """The persisted-index probe joins the (tiny) exploded query×probe-cell
    set against the cell-partitioned index — query side must broadcast so
    the index scan never shuffles."""
    from jsons_to_schema_spark.operators import similarity

    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    idx = tmp_path / "ivf"
    similarity.build_ivf_index(emb, idx, n_cells=8, iters=1, seed=42)
    q = similarity.ivf_topk_indexed(
        spark, idx, emb.filter(F.col("vec_id") < 3), k=5, n_probe=2
    )
    plan = audit.executed_plan(q)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_near_dup_kernel_is_single_arrow_stage(spark):
    """The banded near-dup signature must be ONE ArrowEvalPython node per
    join branch (vectorized batch kernel), never row-at-a-time
    BatchEvalPython."""
    import numpy as np

    from jsons_to_schema_spark.operators import similarity

    rows = [(i, [float(x) for x in np.random.default_rng(i).standard_normal(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = similarity.embedding_near_dup_pairs(df, min_cosine=0.9, bits=16, bands=4, dim=8)
    plan = audit.executed_plan(q)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_decontam_probe_broadcasts_eval(spark):
    """Contamination probe: the eval n-gram set broadcasts; the corpus-side
    explode feeds a map-side BroadcastHashJoin (no corpus shuffle before the
    join) and everything stays JVM-side."""
    from jsons_to_schema_spark.operators import decontam

    docs = load_table(spark, SF_ORACLE, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    q = decontam.contamination_hits(docs, ev, "text", "doc_id", n=5)
    plan = audit.executed_plan(q)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "EvalPython" not in plan
    anti = decontam.decontaminate(docs, ev, "text", "doc_id", n=5)
    aplan = audit.executed_plan(anti)
    assert "LeftAnti" in aplan, aplan[:2000]


def test_contamination_spans_broadcast_probe_one_exchange(spark):
    """Span-level contamination: the positional probe still broadcasts the
    eval set (corpus never shuffles pre-join), everything stays JVM-side,
    and only ONE hash Exchange (the hits-only islands windows + the island
    groupBy reusing its partitioning) appears downstream."""
    from jsons_to_schema_spark.operators import decontam

    docs = load_table(spark, SF_ORACLE, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    q = decontam.contamination_spans(docs, ev, "text", "doc_id", n=5)
    plan = audit.executed_plan(q)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "EvalPython" not in plan
    # exactly two hash Exchanges: the eval-side distinct (bounded by the
    # eval set) and the single hits-only doc-id Exchange that BOTH island
    # windows and the island groupBy reuse
    exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(exchanges) == 2, plan[:3000]
    assert sum("id#" in e for e in exchanges) == 1, exchanges


def test_pack_window_is_per_shard_never_global(spark):
    """Sequence packing must hash-partition by shard for its window — a
    global orderBy window (Exchange SinglePartition) is the 100-TB
    bottleneck the operator exists to avoid."""
    from jsons_to_schema_spark.operators import pack

    docs = load_table(spark, SF_ORACLE, "documents")
    q = pack.pack_sequences(docs, "doc_id", "source", budget=256)
    plan = audit.executed_plan(q)
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(shard" in plan, plan[:2000]


def test_minhash_probe_broadcasts_new_batch_and_prunes(spark, tmp_path):
    """Index probe: the new batch broadcasts into the bucket join, and the
    probe's distinct key-bucket set reaches the index scan as a PARTITION
    filter (explicit static pruning — see minhash_probe_index docstring for
    why DPP is not relied on) — probed buckets only, never the whole
    index."""
    import re

    from jsons_to_schema_spark.operators import dedup

    docs = load_table(spark, SF_ORACLE, "documents")
    idx = tmp_path / "mh"
    dedup.build_minhash_index(
        docs.filter(F.col("doc_id") % 5 != 0), idx, num_hashes=32, bands=8
    )
    q = dedup.minhash_probe_index(
        spark, idx, docs.filter(F.col("doc_id") % 5 == 0), min_jaccard=0.7
    )
    plan = audit.executed_plan(q)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert re.search(r"PartitionFilters: \[[^\]]*kb", plan), plan[:2000]


def test_split_anomalies_is_two_aggregates_and_broadcast(spark):
    """Anomaly scoring: one partial+final aggregate for the global sums,
    broadcast back over the metric table — nothing data-scale."""
    from jsons_to_schema_spark.operators import stats as stats_ops
    from jsons_to_schema_spark.operators import validate as validate_ops

    df = load_spans(spark, ensure_corpus(5000))
    pv = validate_ops.split_verdicts(df).select("split", "n_rows", "n_failed")
    q = stats_ops.split_anomalies(pv, "split", ["n_rows", "n_failed"])
    plan = audit.executed_plan(q)
    assert "HashAggregate" in plan
    assert "Broadcast" in plan, plan[:2000]


def test_chunking_has_no_shuffle(spark):
    """Chunking is a row-local fan-out: tokenize → explode → slice, all in
    one stage — any Exchange in this plan is a bug."""
    from jsons_to_schema_spark.operators import pack

    docs = load_table(spark, SF_ORACLE, "documents")
    q = pack.chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=4)
    plan = audit.executed_plan(q)
    assert "Exchange" not in plan, plan[:2000]
    assert "EvalPython" not in plan


def test_quota_sample_windows_per_stratum(spark):
    """The quota cap's window is hash-partitioned by stratum — never a
    global single-partition sort."""
    from jsons_to_schema_spark.operators.sample import quota_sample

    docs = load_table(spark, SF_ORACLE, "documents")
    q = quota_sample(docs, "doc_id", "source", quota=10)
    plan = audit.executed_plan(q)
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(source" in plan, plan[:2000]


def test_aqe_skew_join_fires_on_zipf_key(spark):
    """North-rule 'skew handled explicitly', demonstrated on the executed
    plan: joining the corpus's Zipf(1.2)-skewed media refs against the
    catalog with broadcast disabled and production-shaped skew thresholds
    scaled to local data volumes, AQE's OptimizeSkewedJoin must split the
    hot partition — SortMergeJoin(skew=true) + AQEShuffleRead skewed.
    (The session enables skewJoin by default; this test only scales the
    byte thresholds down to the test corpus size.)"""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        corpus = ensure_corpus(5000)
        spans = load_spans(spark, corpus)
        cat = load_media_catalog(spark, corpus)
        refs = spans.select(
            F.explode("spans.media_ref").alias("media_ref")
        ).filter(F.col("media_ref").isNotNull())
        j = refs.join(cat, "media_ref")
        j.collect()  # AQE finalizes only the executed plan object
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_histogram_broadcasts_spine_and_partial_aggs(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    ev = load_table(spark, SF_ORACLE, "events")
    q = _stats.column_histogram(ev, "value", 0.0, 500.0, 20)
    plan = audit.executed_plan(q)
    # bucket counts aggregate with map-side partials (bounded by bucket
    # count), and the 20-row spine joins via broadcast, never a shuffle
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert audit.has_partial_aggregate(q)
    assert audit.scan_count(q) == 1


def test_top_values_two_stage_window(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    docs = load_table(spark, SF_ORACLE, "documents")
    q = _stats.top_values(docs, "lang", 3)
    plan = audit.executed_plan(q)
    # the per-partition prefilter must appear as a partial window before
    # the global one: two Window/WindowGroupLimit stages, and the global
    # sort input is capped at k x partitions, not the distinct set
    assert plan.count("Window") >= 2, plan[:3000]


def test_entropy_melt_is_single_scan(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    ev = load_table(spark, SF_ORACLE, "events")
    q = _stats.column_entropy(ev, ["event_type", "user_id", "value"])
    # the melt reads the data once for ALL columns (r4 review: the first
    # version unioned one scan branch per column)
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_correlation_pairs_single_scan(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    li = load_table(spark, SF_ORACLE, "lineitem")
    q = _stats.correlation_pairs(li, ["l_quantity", "l_discount", "l_tax"])
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_candidate_keys_single_scan(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    orders = load_table(spark, SF_ORACLE, "orders")
    q = _stats.candidate_keys(orders, ["o_orderkey", "o_custkey", "o_orderstatus"])
    # three key candidates profiled from ONE scan (exact distincts expand
    # the aggregate, not the number of reads)
    assert audit.scan_count(q) == 1


def test_datatype_profile_single_scan_partial_agg(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    docs = load_table(spark, SF_ORACLE, "documents")
    q = _stats.datatype_profile(docs, ["lang", "source"])
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)
    # the regex classification is JVM-side: no Python eval node in the plan
    assert "EvalPython" not in audit.executed_plan(q)


def test_metric_computation_single_grouped_scan(spark):
    from jsons_to_schema_spark.operators import metrics_repo

    ev = load_table(spark, SF_ORACLE, "events")
    runs = ev.select((F.col("event_id") % 5).alias("run"), "value")
    q = metrics_repo.compute_metrics(runs, ["value"], run_col="run")
    # all runs' metrics from ONE grouped scan with map-side partials;
    # the melt is a projection over the bounded aggregate output
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_metric_anomaly_join_broadcasts_history(spark):
    from jsons_to_schema_spark.operators import metrics_repo

    ev = load_table(spark, SF_ORACLE, "events")
    runs = ev.select((F.col("event_id") % 5).alias("run"), "value")
    m = metrics_repo.compute_metrics(runs, ["value"], run_col="run")
    q = metrics_repo.detect_metric_anomalies(m, current_run=4)
    # history aggregates are KB-scale — the current-vs-history join must
    # broadcast, never shuffle the metric rows
    assert audit.uses_broadcast_join(q)


def test_bloom_probe_positions_are_jvm_side(spark):
    from jsons_to_schema_spark.operators import bloom

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    bm = bloom.build_bloom(docs.limit(50), "lang", 1024, 3)
    q = docs.withColumn("hit", bloom.bloom_contains("lang", bm, 1024, 3))
    plan = audit.executed_plan(q)
    # exactly ONE Arrow-batched stage (the bit test); the k hash positions
    # are computed by JVM xxhash64 inside the projection feeding it
    assert plan.count("ArrowEvalPython") == 1, plan[:3000]
    assert "xxhash64" in plan.lower()


def test_uniqueness_profile_single_scan_partial_agg(spark):
    from jsons_to_schema_spark.operators import stats as _stats

    docs = load_table(spark, SF_ORACLE, "documents")
    q = _stats.uniqueness_profile(docs, ["lang", "source", "doc_id"])
    # one melt scan for all columns; the pair groupBy pre-aggregates
    # map-side so the shuffle carries column cardinalities, not rows
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_psi_report_is_bounded_aggregates(spark):
    """PSI drift: each side is one map-side-partial groupBy bounded by the
    bucket count; no Python anywhere in the plan."""
    from jsons_to_schema_spark.operators import drift

    events = load_table(spark, SF_ORACLE, "events")
    q = drift.psi_report(
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
        "value",
        0.0,
        500.0,
        20,
    )
    plan = audit.executed_plan(q)
    assert "EvalPython" not in plan
    assert audit.has_partial_aggregate(q)
    assert audit.scan_count(q) == 2  # one scan per slice, spine is range()


def test_fd_confidence_partial_agg_no_python(spark):
    from jsons_to_schema_spark.operators import stats

    events = load_table(spark, SF_ORACLE, "events")
    q = stats.fd_confidence(events, ["user_id"], "event_type")
    plan = audit.executed_plan(q)
    assert "EvalPython" not in plan
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_table_diff_is_one_join_no_python(spark):
    """Reconciliation must be exactly ONE full-outer join keyed on the key —
    the same shuffle a downstream merge pays — and no Python."""
    from jsons_to_schema_spark.operators import validate as v

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    q = v.table_diff(orders, snap, ["o_orderkey"])
    plan = audit.executed_plan(q)
    assert "EvalPython" not in plan
    assert plan.count("Join") >= 1 and "FullOuter" in plan
    assert plan.count("FullOuter") == 1


def test_mixture_sample_corpus_side_is_pure_filter(spark):
    """After the bounded per-source count collect, the corpus-side plan is
    ONE narrow filter — no Exchange, no Python, no join of the data."""
    from jsons_to_schema_spark.operators import sample

    docs = load_table(spark, SF_ORACLE, "documents")
    q = sample.mixture_sample(docs, "doc_id", "source", 0.5, 150).select(
        "doc_id", "source"
    )
    plan = audit.executed_plan(q)
    assert "EvalPython" not in plan
    assert "Exchange" not in plan, plan[:2000]
    assert audit.scan_count(q) == 1


def test_lm_scores_stay_jvm_side(spark):
    """The bigram-LM pipeline (tokenize, pair, model folds, joins, per-doc
    aggregate) must stay entirely inside codegen/JVM — zero Python stages."""
    docs = load_table(spark, SF_ORACLE, "documents")
    q = text.lm_bigram_scores(docs, "text", "doc_id")
    plan = audit.executed_plan(q)
    assert "EvalPython" not in plan
    assert audit.has_partial_aggregate(q)


def test_psi_grouped_scans_each_side_once(spark):
    """Grouped PSI pins the merged bounded count table before its double
    use (group spine + join): after materialization the executed plan
    reads the checkpointed table — each corpus side was scanned exactly
    once, never re-executed for group discovery."""
    from jsons_to_schema_spark.operators import drift

    events = load_table(spark, SF_ORACLE, "events")
    q = drift.psi_report_grouped(
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        0.0,
        500.0,
        10,
    )
    q.collect()  # materialize the lazy checkpoint
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 0, plan[:1500]
    assert "EvalPython" not in plan


def test_psi_multi_two_scans_total(spark):
    """Multi-column PSI melts N columns into one aggregate per side: two
    scans total regardless of column count (the spine is literal rows,
    so no lineage reuse and no checkpoint needed)."""
    from jsons_to_schema_spark.operators import drift

    li = load_table(spark, SF_ORACLE, "lineitem")
    q = drift.psi_report_multi(
        li.filter(F.col("l_orderkey") % 2 == 0),
        li.filter(F.col("l_orderkey") % 2 == 1),
        {"l_quantity": (0.0, 50.0), "l_discount": (0.0, 0.1)},
        10,
    )
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 2, plan[:1500]
    assert "EvalPython" not in plan
    assert audit.has_partial_aggregate(q)


def test_single_scan_regressions_r4_sweep(spark):
    """The r4 double-scan sweep's fixes, pinned: exact dedup, skew report,
    top-k values, and mutual information each scan their input once (the
    pinned bounded tables read back as checkpoints after materialization)."""
    from jsons_to_schema_spark.operators import dedup, stats

    docs = load_table(spark, SF_ORACLE, "documents")
    events = load_table(spark, SF_ORACLE, "events")
    q = dedup.dedup_exact(docs, "text", "doc_id")
    assert audit.scan_count(q) == 1 and audit.has_partial_aggregate(q)
    for q in (
        stats.key_skew_report(docs, "source"),
        stats.top_values(docs, "lang", 3),
        stats.mutual_information(events, "event_type", "user_id"),
    ):
        q.collect()  # materialize the lazy checkpoint
        assert audit.scan_count(q) <= 1


def test_asof_join_is_one_shuffle_one_window(spark):
    """The as-of join's scale contract: union both sides, ONE Exchange on
    the join key, one keyed window — never an inequality join (no
    BroadcastNestedLoop/Cartesian), never a sort-merge range join."""
    from jsons_to_schema_spark import queries as Q

    q = Q.QUERIES["asof_events_snapshots"](spark, SF_ORACLE)
    plan = audit.executed_plan(q)
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan
    assert "EvalPython" not in plan


def test_interval_overlap_is_bucketed_equi_join(spark):
    """The interval-overlap join must plan as a bucketed EQUI-join (hash
    or broadcast), never the quadratic BroadcastNestedLoop a raw range
    predicate would pick; the self-joined session frame is pinned so the
    corpus-sized sessionize lineage runs once (double-scan sweep rule)."""
    from jsons_to_schema_spark import queries as Q

    q = Q.QUERIES["session_overlap_events"](spark, SF_ORACLE)
    q.collect()  # materialize the lazy checkpoint
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) <= 1, plan[:2000]
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "SortMergeJoin" in plan
    )


def test_cdc_compact_is_partial_aggregate_no_window(spark):
    """Changelog compaction's scale contract: a single partial+final
    aggregate (map-side combine collapses hot keys before the shuffle) —
    NOT the row_number window that ships every log row to one reducer per
    key.  The struct buffer plans as SortAggregate; the partial phase
    before the single Exchange is what matters."""
    from jsons_to_schema_spark import queries as Q

    q = Q.QUERIES["cdc_compact_events"](spark, SF_ORACLE)
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 1
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]
    assert plan.count("SortAggregate") == 2 or plan.count("HashAggregate") >= 2


def test_divergence_panel_two_scans(spark):
    """The four-metric divergence panel pays exactly the two histogram
    scans PSI alone costs — the KS/JS/chi2 additions are windows over the
    bounded bucket table, never extra corpus passes."""
    from jsons_to_schema_spark.operators import drift

    events = load_table(spark, SF_ORACLE, "events")
    rep = drift.divergence_report(
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
        "value",
        0.0,
        500.0,
        10,
    )
    q = drift.divergence_score(rep)
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 2, plan[:1500]
    assert "EvalPython" not in plan
    assert audit.has_partial_aggregate(q)


def test_outlier_report_scan_budget(spark):
    """Exact-MAD outliers are irreducibly 3 scans (median -> MAD ->
    filter: the sequential dependency is mathematical); zscore is 2.  The
    1-row stats frames cross in as broadcast nested loops over ONE row —
    nothing collects to the driver."""
    events = load_table(spark, SF_ORACLE, "events")
    from jsons_to_schema_spark.operators import stats as S

    mad = S.outlier_report(events, "value", ["event_id"], method="mad")
    assert audit.scan_count(mad) == 3
    z = S.outlier_report(events, "value", ["event_id"], method="zscore")
    assert audit.scan_count(z) == 2
    assert "EvalPython" not in audit.executed_plan(mad)


def test_equidepth_two_scans_after_pin(spark):
    """Equi-depth histogram: boundaries scan + counts scan — the pinned
    1-row bounds frame (double-scan sweep rule) must not re-execute its
    corpus aggregate for the edge report."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.equidepth_histogram(events, "value", 4)
    q.collect()  # materialize the lazy checkpoint
    assert audit.scan_count(q) <= 2
    assert "EvalPython" not in audit.executed_plan(q)


def test_null_cooccurrence_single_scan(spark):
    """All pairwise both-null counts + per-column totals fold in ONE
    multi-aggregate scan regardless of pair count."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.null_cooccurrence(events, ["props", "user_id", "value"])
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_sequence_integrity_single_scan(spark):
    """Per-key sequence audit: one grouped scan (exact countDistinct's
    two-phase agg still reads the data once), verdicts are arithmetic."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    q = validate.sequence_integrity(li, ["l_orderkey"], "l_linenumber")
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in audit.executed_plan(q)


def test_monotonicity_audit_one_scan_one_exchange(spark):
    """The order audit is ONE scan and ONE shuffle: the window hash-
    partitions by key, and the per-key break aggregate reuses that
    partitioning — no second Exchange (the scale property: the check
    costs exactly one sort of the corpus, nothing more)."""
    events = load_table(spark, SF_ORACLE, "events")
    q = validate.monotonicity_audit(events, ["user_id"], "event_id", "value")
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in plan


def test_heavy_hitters_two_scans_bounded_state(spark):
    """MG candidate pass + exact verify = two corpus scans; the pinned
    sketch output must not re-execute, the candidate set must BROADCAST
    into the verify join (never shuffle the corpus on value), and the
    verify aggregate must be map-side partial."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.heavy_hitters(events, "user_id", 0.007)
    q.collect()  # materialize the lazy checkpoint
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) <= 2
    assert "BroadcastHashJoin" in plan
    assert audit.has_partial_aggregate(q)
    assert "BatchEvalPython" not in plan  # no per-row Python anywhere


def test_inclusion_profile_two_scans(spark):
    """IND discovery melts each table ONCE (the pinned A melt feeds both
    the totals and the value join) — two scans total for the whole
    cols_a × cols_b sweep, not 2·|pairs|."""
    from jsons_to_schema_spark.operators import stats as S

    od = load_table(spark, SF_ORACLE, "orders")
    cu = load_table(spark, SF_ORACLE, "customer")
    q = S.inclusion_profile(
        od, ["o_custkey", "o_orderstatus"], cu, ["c_custkey", "c_nationkey"]
    )
    q.collect()
    assert audit.scan_count(q) <= 2
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in audit.executed_plan(q)


def test_category_shift_one_scan_per_side(spark):
    """Categorical domain shift: one grouped count per side, the bounded
    category table pinned so the totals fold never rescans a corpus."""
    from jsons_to_schema_spark.operators import drift as D

    docs = load_table(spark, SF_ORACLE, "documents")
    q = D.category_shift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "source",
    )
    q.collect()  # materialize the lazy checkpoint
    assert audit.scan_count(q) <= 2
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in audit.executed_plan(q)


def test_mask_profile_one_scan_two_stage_topk(spark):
    """Mask profile: the corpus scans once (pinned mask-count table feeds
    both the rank and the total), the top-k goes through the per-partition
    WindowGroupLimit prefilter, and the masking regexes stay JVM-side."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.mask_profile(events, "props", 5)
    q.collect()
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) <= 1
    assert "WindowGroupLimit" in plan
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in plan


def test_k_anonymity_single_scan(spark):
    """k-anonymity: one grouped scan + one bounded fold, exact counts."""
    from jsons_to_schema_spark.operators import stats as S

    cu = load_table(spark, SF_ORACLE, "customer")
    q = S.k_anonymity(cu, ["c_nationkey", "c_mktsegment"], 5)
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in audit.executed_plan(q)


def test_fuzzy_pairs_no_cartesian(spark):
    """The record-linkage join goes through the deletion-variant buckets —
    NEVER a CartesianProduct / BroadcastNestedLoopJoin (the all-pairs plan
    the blocking exists to avoid); variant generation is JVM higher-order
    functions, no Python."""
    from jsons_to_schema_spark.operators import dedup as D

    cu = load_table(spark, SF_ORACLE, "customer")
    q = D.fuzzy_self_pairs(cu, "c_custkey", "c_name", 1)
    q.collect()  # materialize the pinned variant explode
    plan = audit.executed_plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert audit.scan_count(q) <= 1  # one corpus scan feeds the pin


def test_categorical_association_one_scan(spark):
    """The pair sweep melts in ONE corpus scan; margins are windows over
    the bounded cell table chained linearly (no self-join, no rescan)."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.categorical_association(
        events, [("event_type", "props"), ("event_type", "user_id")]
    )
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in plan


def test_l_diversity_single_scan(spark):
    """Group + bounded fold: one corpus scan, map-side partials."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.l_diversity(events, ["event_type"], "user_id", 2)
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)


def test_t_closeness_single_scan(spark):
    """The joint (quasi, sensitive) grouped count is the ONLY data-sized
    shuffle; group totals / value shares / the tv fold are windows and
    aggregates over that bounded cell table — never a second corpus scan,
    never Python."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.t_closeness(events, ["event_type"], "user_id", 0.5)
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 1
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in plan


def test_c4_clean_no_shuffle_no_python(spark):
    """The C4 rules are a pure narrow projection: zero Exchange, zero
    Python eval, whole-stage codegen."""
    docs = load_table(spark, SF_ORACLE, "documents")
    q = text.c4_clean(docs, "doc_id", "text")
    plan = audit.executed_plan(q)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert audit.scan_count(q) == 1
    assert audit.codegen_stage_count(q) >= 1


def test_contamination_share_broadcast_probe_one_scan(spark):
    """Graded contamination scans the corpus ONCE: the eval set broadcasts
    into the probe (the corpus never shuffles on ngram) and the per-doc
    fold is map-side combined."""
    from jsons_to_schema_spark.operators import decontam

    docs = load_table(spark, SF_ORACLE, "documents")
    ev = decontam.eval_ngrams_from_docs(
        docs.filter(F.col("doc_id") % 83 == 0), "text", n=5
    )
    q = decontam.contamination_share(docs, ev, "text", "doc_id", n=5)
    plan = audit.executed_plan(q)
    # two scans total: one for the eval set, one for the corpus probe
    assert audit.scan_count(q) <= 2
    assert "BroadcastHashJoin" in plan
    assert audit.has_partial_aggregate(q)
    assert "BatchEvalPython" not in plan


def test_rolling_stats_one_scan_one_exchange(spark):
    """The trailing-window profile costs exactly one shuffle (hash by
    key) + one sort — all six outputs share the single range-frame
    window."""
    from jsons_to_schema_spark.operators import temporal

    events = load_table(spark, SF_ORACLE, "events")
    q = temporal.rolling_stats(events, ["user_id"], "ts", "value", 3600)
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "EvalPython" not in plan


def test_mutual_information_pairs_one_scan(spark):
    """The MI sweep scans the corpus ONCE: the pinned joint cell table
    feeds H(a,b) and both marginal re-aggregations."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.mutual_information_pairs(
        events, [("event_type", "props"), ("event_type", "user_id")]
    )
    q.collect()  # materialize the lazy checkpoint
    assert audit.scan_count(q) <= 1
    assert audit.has_partial_aggregate(q)
    assert "EvalPython" not in audit.executed_plan(q)


def test_image_near_dup_banded_join_decode_once(spark):
    """Image dedup: the mapInPandas decode is PINNED before the self-join
    (one decode pass, not two), candidates come from the band bucket
    equi-join (no CartesianProduct)."""
    import numpy as np

    from jsons_to_schema_spark.operators import multimodal
    from jsons_to_schema_spark.operators.codecs import encode_png

    rows = []
    for i in range(6):
        base = (np.add.outer(np.arange(16) * (i + 3), np.arange(18) * 5)
                % 180 + 30).astype(np.uint8)
        rows.append(
            (f"m-{i}", bytearray(encode_png(18, 16, pixels=np.stack([base] * 3, -1))))
        )
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    q = multimodal.image_near_dup_pairs(df, "media_ref", "payload", 3)
    q.collect()  # materialize the lazy checkpoint
    plan = audit.executed_plan(q)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the decode stage must not appear twice: the pinned signature table
    # feeds both sides of the band join
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") <= 1


def test_gopher_filter_no_shuffle_no_python(spark):
    """The Gopher rules are a pure narrow projection (the c4_clean
    shape): zero Exchange, zero Python, one scan."""
    docs = load_table(spark, SF_ORACLE, "documents")
    q = text.gopher_quality_filter(docs, "doc_id", "text")
    plan = audit.executed_plan(q)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert audit.scan_count(q) == 1


def test_outlier_report_grouped_scan_budget(spark):
    """Grouped MAD fences: median scan -> MAD scan -> filter scan (the
    irreducible 3, same as the global report), group fences broadcast
    back — no corpus reshuffle, no cartesian product."""
    from jsons_to_schema_spark.operators import stats as S

    events = load_table(spark, SF_ORACLE, "events")
    q = S.outlier_report_grouped(events, "value", ["event_id"], ["event_type"])
    plan = audit.executed_plan(q)
    assert audit.scan_count(q) <= 3
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    z = S.outlier_report_grouped(
        events, "value", ["event_id"], ["event_type"], method="zscore"
    )
    assert audit.scan_count(z) <= 2


def test_wave16_profiles_single_scan_no_python(spark):
    """format_profile / quantile_profile / corpus_composition: one corpus
    scan each, zero Python stages — profile analyzers must stay codegen."""
    from jsons_to_schema_spark.operators import stats

    df = spark.range(200).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.io")).alias("s"),
    )
    for q in (
        stats.format_profile(df, ["s"], formats=["email", "uuid"]),
        stats.quantile_profile(df, "v", (0.5, 0.9), "g"),
        stats.corpus_composition(df, "g", "v"),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range") == 1, plan[:1500]
        assert "EvalPython" not in plan


def test_write_sorted_produces_disjoint_file_ranges(spark, tmp_path):
    """The sorted layout's footer stats must be pairwise disjoint on the
    sort column (the data-skipping evidence); a hash-shuffled write of the
    same data must NOT be — proving the improvement is the layout, not the
    data."""
    from jsons_to_schema_spark.sources.layout import file_stat_ranges, write_sorted

    df = load_table(spark, SF_ORACLE, "events").select("event_id", "value")
    write_sorted(df, tmp_path / "sorted", ["value"], n_files=8)
    ranges = file_stat_ranges(tmp_path / "sorted", "value")
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # contiguous, non-overlapping
    df.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "hashed"))
    hashed = file_stat_ranges(tmp_path / "hashed", "value")
    overlaps = sum(
        1 for (l1, h1), (l2, h2) in zip(hashed, hashed[1:]) if h1 > l2
    )
    assert overlaps > 0  # hash layout: every file spans ~the full range
    with pytest.raises(ValueError):
        write_sorted(df, tmp_path / "bad", [])


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key into the same bucket count must
    sort-merge join with ZERO Exchange — the write amortizes the shuffle
    once for every future join (the co-located-join layout)."""
    from jsons_to_schema_spark.sources.layout import write_bucketed

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bkt_orders")
        b = spark.table("bkt_lineitem")
        q = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderkey").count()
        plan = audit.executed_plan(q)
        assert "SortMergeJoin" in plan, plan[:2000]
        join_part = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in join_part, plan[:3000]
        # the whole plan: the only permissible Exchange would be for the
        # groupBy — but it groups on the bucket key, so none at all
        assert "Exchange" not in plan, plan[:3000]
        assert q.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_round4_continuation_ops_scan_budget_no_python(spark):
    """Waves 19-23: the single-scan analyzers stay single-scan and fully
    JVM-side; the checkpointed ones (benford/resample/funnel stages) cut
    lineage, so the budget there is 'no Python' plus the measured-once
    guarantee documented in the operators."""
    from datetime import datetime

    from jsons_to_schema_spark.operators import drift, resolve, stats, temporal
    from jsons_to_schema_spark.operators.formats import infer_formats

    ev = load_table(spark, SF_ORACLE, "events")
    single_scan = [
        drift.level_shift(ev, "ts", "value", 86400),
        temporal.cohort_retention(ev, "user_id", "ts"),
        stats.arithmetic_consistency(
            ev.selectExpr("value AS a", "value AS b", "value+value AS t"),
            [("t", "a", "add", "b")],
        ),
        resolve.fingerprint_clusters(
            ev.selectExpr("event_type AS v"), "v", min_values=1
        ),
        infer_formats(ev.selectExpr("event_type AS s"), ["s"]),
    ]
    for q in single_scan:
        assert audit.scan_count(q) == 1, audit.executed_plan(q)[:1200]
    lineage_cut = [
        stats.benford_conformance(ev.selectExpr("value AS v"), "v"),
        temporal.resample(ev, ["user_id"], "ts", "value", 86400),
        temporal.funnel(ev, "user_id", "ts", "event_type", ["view", "click"]),
        stats.frequent_pairs(ev, "user_id", "event_type"),
        resolve.survivorship(
            ev.selectExpr("user_id AS c", "event_id AS seq", "event_type AS nm"),
            "c",
            {"nm": "latest"},
            seq_col="seq",
        ),
    ]
    for q in single_scan + lineage_cut:
        plan = audit.executed_plan(q)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave32_41_ops_scan_budget_no_python(spark):
    """Seventh-continuation waves: TF-IDF / DSIR / BM25 fold df() and doc
    lengths from ONE exploded aggregate (one corpus scan each — the
    lazy-checkpoint pin guarantees re-use); pseudonymize / strip_markup /
    zorder keys / transitions are pure JVM projections or single-window
    passes; the model/sketch joins broadcast.  None of it evaluates
    Python."""
    from jsons_to_schema_spark.operators import stats as st
    from jsons_to_schema_spark.operators import temporal as tp
    from jsons_to_schema_spark.operators import text as tx
    from jsons_to_schema_spark.sources.layout import zorder_bucket_report

    docs = load_table(spark, SF_ORACLE, "documents")
    ev = load_table(spark, SF_ORACLE, "events")
    cust = load_table(spark, SF_ORACLE, "customer")

    queries = [
        tx.tfidf_top_terms(docs, "text", "doc_id", k=3, min_df=2),
        tx.dsir_select(docs, docs.filter("lang = 'en'"), "text", "doc_id"),
        tx.bm25_topk(
            docs,
            spark.createDataFrame([(0, "table scan")], "query_id long, qtext string"),
            "text",
            "doc_id",
        ),
        tx.strip_markup(docs.selectExpr("doc_id", "text AS raw"), "raw", "doc_id"),
        st.pseudonymize(cust.select("c_custkey"), {"c_custkey": "k"}, secret="s"),
        st.ab_test_report(
            ev.selectExpr(
                "CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 't' END AS arm",
                "value AS m",
            ),
            "arm", "m", "c", "t",
        ),
        zorder_bucket_report(ev, ["user_id", "event_id"], bucket_bits=4),
        tp.transition_profile(ev, "user_id", "event_id", "event_type"),
    ]
    for q in queries:
        plan = audit.executed_plan(q)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # purely row-local ops must not shuffle at all
    for q in (
        st.pseudonymize(cust.select("c_custkey"), {"c_custkey": "k"}, secret="s"),
        tx.strip_markup(docs.selectExpr("doc_id", "text AS raw"), "raw", "doc_id"),
    ):
        assert "Exchange" not in audit.executed_plan(q)
    # single-scan budget where the operator contract says one corpus scan
    for q in (
        st.ab_test_report(
            ev.selectExpr(
                "CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 't' END AS arm",
                "value AS m",
            ),
            "arm", "m", "c", "t",
        ),
        zorder_bucket_report(ev, ["user_id", "event_id"], bucket_bits=4),
        tp.transition_profile(ev, "user_id", "event_id", "event_type"),
    ):
        assert audit.scan_count(q) == 1, audit.executed_plan(q)[:1200]


def test_wave39_42_ops_scan_budget_no_python(spark):
    """Waves 39-42: the bounded-prefix family (AUC, KS, exact quantiles)
    keeps its single-partition exchange on the <=bins-row bin table only;
    the similarity/containment joins scan the corpus a bounded number of
    times with no Cartesian product; splits and the mixture planner are a
    projection and a per-source aggregate.  Only the covariance fold may
    evaluate Python — and only as one Arrow-batched MapInArrow, never
    row-at-a-time."""
    from jsons_to_schema_spark.operators.dedup import (
        containment_join,
        jaccard_prefix_join,
    )
    from jsons_to_schema_spark.operators.drift import ks_drift
    from jsons_to_schema_spark.operators.linalg import embedding_covariance
    from jsons_to_schema_spark.operators.modeleval import roc_auc
    from jsons_to_schema_spark.operators.sample import (
        assign_splits,
        mixture_waterfill_plan,
    )
    from jsons_to_schema_spark.operators.stats import exact_quantiles

    ev = load_table(spark, SF_ORACLE, "events")
    docs = load_table(spark, SF_ORACLE, "documents")
    scored = ev.select("value", (F.col("event_type") == "purchase").alias("y"))
    toks = docs.withColumn(
        "toks", F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    )

    no_python = [
        roc_auc(scored, "value", "y", 0.0, 500.0, bins=64),
        ks_drift(
            ev.filter("event_type = 'click'"),
            ev.filter("event_type = 'purchase'"),
            "value", 0.0, 500.0, bins=64,
        ),
        exact_quantiles(ev, "value", [0.5, 0.9], 0.0, 500.0, bins=64),
        jaccard_prefix_join(docs, "text", "doc_id", 0.95),
        containment_join(docs.filter("doc_id % 50 = 0"), docs, "text", "doc_id", 0.98),
        assign_splits(docs, "doc_id", {"train": 0.9, "test": 0.1}),
        mixture_waterfill_plan(
            toks, "source", "toks",
            {"src0": 500_000, "src1": 500_000}, 1_000,
        ),
    ]
    for q in no_python:
        plan = audit.executed_plan(q)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
    # the bounded-prefix family: every SinglePartition exchange feeds the
    # bin/probs/bounded frame, never a corpus-keyed hashpartitioning
    for q in (
        roc_auc(scored, "value", "y", 0.0, 500.0, bins=64),
        exact_quantiles(ev, "value", [0.5], 0.0, 500.0, bins=64),
    ):
        plan = audit.formatted_plan(q)
        assert "hashpartitioning(_bin" in plan
    # splits are a pure projection: zero exchanges
    assert "Exchange" not in audit.executed_plan(
        assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.5})
    )
    # covariance: Arrow-batched fold, not row Python; the corpus pass
    # (audited unpinned — embedding_covariance pins it so its three
    # consumers do NOT re-run the scan, measured 4 scans before) is one
    # parquet scan feeding one MapInArrow
    from jsons_to_schema_spark.operators.linalg import _gram_partials

    emb = load_table(spark, SF_ORACLE, "embeddings")
    part = _gram_partials(emb, "embedding", 64)
    pplan = audit.executed_plan(part)
    assert "BatchEvalPython" not in pplan
    assert audit.scan_count(part) == 1, pplan[:1200]
    cov = embedding_covariance(emb, "embedding", dim=64)
    assert "BatchEvalPython" not in audit.executed_plan(cov)


def test_wave44_47_ops_no_python_no_cartesian(spark):
    """k-core peeling, label propagation, the compaction planner, and the
    IVF recall report: keyed joins/aggregates throughout — no Cartesian
    product, no row-at-a-time Python (binchunk's mapInArrow is the one
    sanctioned Arrow kernel and is asserted separately in its own tests)."""
    from jsons_to_schema_spark.operators.graph import (
        kcore_members,
        label_propagation,
    )
    from jsons_to_schema_spark.operators.stats import (
        grouped_exact_quantiles,
        nested_path_profile,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    ev = load_table(spark, SF_ORACLE, "events")
    frames = [
        kcore_members(edges, 2),
        label_propagation(edges, iterations=2),
        grouped_exact_quantiles(ev, "value", "event_type", [0.5], 0.0, 500.0, bins=32),
        nested_path_profile(ev.select("event_type", "value")),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # grouped quantiles: the fully keyed variant never single-partitions
    assert "SinglePartition" not in audit.formatted_plan(
        grouped_exact_quantiles(ev, "value", "event_type", [0.5], 0.0, 500.0, bins=32)
    )


def test_wave48_49_ops_no_python_no_cartesian(spark):
    """BFS distances, Borůvka MSF, the ACF profile, and Mahalanobis
    outliers: keyed joins/aggregates and declarative closed-form math
    throughout — no row-at-a-time Python anywhere, and the only
    nested-loop join in any plan is Mahalanobis broadcasting its ONE-ROW
    moments frame (a Cartesian with a 1-row side is a projection, not a
    blow-up; asserted as BroadcastNestedLoopJoin, never
    CartesianProduct)."""
    import datetime as dt

    from jsons_to_schema_spark.operators.graph import bfs_distances, boruvka_msf
    from jsons_to_schema_spark.operators.stats import mahalanobis_outliers
    from jsons_to_schema_spark.operators.temporal import autocorrelation

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 3.0), ("c", "d", 1.5)],
        "src string, dst string, weight double",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ev = load_table(spark, SF_ORACLE, "events")
    li = load_table(spark, SF_ORACLE, "lineitem")
    frames = [
        bfs_distances(edges, seeds),
        boruvka_msf(edges),
        autocorrelation(ev, ["event_type"], "ts", "value", 86400, [1, 2]),
        mahalanobis_outliers(
            li, ["l_quantity", "l_extendedprice", "l_discount"], 8.0,
            ["l_orderkey", "l_linenumber"],
        ),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # ACF keeps the corpus fold single-scan: cells are localCheckpointed and
    # feed both sides of the lag self-join
    acf = autocorrelation(ev, ["event_type"], "ts", "value", 86400, [1, 2])
    acf.collect()
    assert audit.scan_count(acf) <= 1


def test_wave50_52_ops_no_python_no_cartesian(spark):
    """WoE/IV, dim-truncation recall, HITS, cross-correlation, seasonal
    decomposition, n-gram overlap: keyed aggregates/joins and broadcast
    spines throughout — no row-at-a-time Python, no CartesianProduct
    (the similarity crossJoins broadcast their small query/moment side:
    BroadcastNestedLoopJoin with a bounded side is a projection)."""
    from jsons_to_schema_spark.operators.graph import hits
    from jsons_to_schema_spark.operators.similarity import dim_truncation_report
    from jsons_to_schema_spark.operators.stats import woe_iv_profile
    from jsons_to_schema_spark.operators.temporal import (
        cross_correlation,
        seasonal_decompose,
    )
    from jsons_to_schema_spark.operators.text import ngram_overlap_metrics

    ev = load_table(spark, SF_ORACLE, "events")
    docs = load_table(spark, SF_ORACLE, "documents")
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "src string, dst string"
    )
    pairs = docs.select(
        F.col("doc_id").alias("pid"),
        F.col("text").alias("cand"),
        F.col("text").alias("ref"),
    ).limit(50)
    frames = [
        woe_iv_profile(ev, "value", F.col("event_type") == "error", 0.0, 500.0, 5),
        dim_truncation_report(
            emb, emb.filter(F.col("vec_id") < 4), k=5, dims=[8], full_dim=64
        ),
        hits(edges, iterations=2),
        cross_correlation(
            ev, ["event_type"], "ts", "value", "value", 86400, [1], y_agg="count"
        ),
        seasonal_decompose(ev, ["event_type"], "ts", "value", 86400, 7),
        ngram_overlap_metrics(pairs, ["pid"], "cand", "ref", 2),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the WoE moment pass reads the corpus once for counts; spine and
    # totals are bounded broadcast sides
    woe = woe_iv_profile(ev, "value", F.col("event_type") == "error", 0.0, 500.0, 5)
    assert audit.scan_count(woe) <= 1


def test_wave53_57_ops_no_python_scan_shapes(spark):
    """Readability/script profiles (pure projections), DP release, Theil–
    Sen, scale-mismatch, relationship profile, imputer, robust z: no
    row-at-a-time Python anywhere; the profile projections read the
    corpus once with no Exchange; the pair joins that look quadratic
    (Theil–Sen slopes, scale-mismatch decades) run over keyed grids /
    bounded group tables, never a corpus CartesianProduct."""
    from jsons_to_schema_spark.operators.stats import (
        apply_imputer,
        dp_noisy_counts,
        fit_imputer,
        relationship_profile,
        robust_z_outliers,
        scale_mismatch_report,
    )
    from jsons_to_schema_spark.operators.temporal import theil_sen
    from jsons_to_schema_spark.operators.text import (
        readability_features,
        script_profile,
    )

    ev = load_table(spark, SF_ORACLE, "events")
    docs = load_table(spark, SF_ORACLE, "documents")
    orders = load_table(spark, SF_ORACLE, "orders")
    customer = load_table(spark, SF_ORACLE, "customer")
    model = fit_imputer(ev, "value", "event_type")
    frames = [
        readability_features(docs, "text", "doc_id"),
        script_profile(docs, "text", "doc_id"),
        dp_noisy_counts(ev, "event_type", 0.5),
        theil_sen(ev, ["event_type"], "ts", "value", 86400),
        relationship_profile(orders, "o_custkey", customer, "c_custkey"),
        apply_imputer(ev, "value", model, "event_type"),
        robust_z_outliers(ev, "value", "event_type", ["event_id"], 3.5),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # scale-mismatch's (group_a < group_b) pair join runs over the BOUNDED
    # median table: nested-loop there is a projection, not a blow-up — but
    # Python must still be absent
    sm = scale_mismatch_report(ev, "event_type", "value")
    plan = audit.executed_plan(sm)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the two text profiles are single-scan, shuffle-free projections
    for q in (
        readability_features(docs, "text", "doc_id"),
        script_profile(docs, "text", "doc_id"),
    ):
        q.collect()
        assert audit.scan_count(q) <= 1
        assert "Exchange" not in audit.executed_plan(q)


def test_wave58_59_ops_rank_machinery_shapes(spark):
    """Gini and Spearman ride the exact_quantiles bounded-prefix rank
    machinery: the ONLY single-partition exchange in either plan is the
    ≤ bins-row bin-prefix table — the corpus itself is never globally
    sorted or single-partitioned; no Python, no Cartesian."""
    from jsons_to_schema_spark.operators.stats import (
        gini_coefficient,
        spearman_pairs,
    )

    li = load_table(spark, SF_ORACLE, "lineitem")
    g = gini_coefficient(
        li.select(F.col("l_extendedprice").alias("v")), "v", 0.0, 120000.0, 256
    )
    s = spearman_pairs(
        li, ["l_quantity", "l_extendedprice"], 0.0, 120000.0, 256
    )
    # permitted single-partition exchanges are all BOUNDED-row frames:
    # one ≤ bins-row bin-prefix table per ranked column, plus the final
    # one-row aggregate — never the corpus
    for q, allowed in ((g, 2), (s, 3)):
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert plan.count("Exchange SinglePartition") <= allowed, plan


def test_wave61_64_ops_no_python_bounded_exchanges(spark):
    """Wasserstein, log-rank, isotonic apply, bootstrap, CUPED, trimmed
    mean, Neyman: no row-at-a-time Python anywhere, no CartesianProduct
    (the bounded 1-row/R-row/strata-row frames broadcast); the grouped
    trimmed mean inherits grouped_gini's ZERO-single-partition discipline."""
    from jsons_to_schema_spark.operators.drift import wasserstein_drift
    from jsons_to_schema_spark.operators.modeleval import (
        apply_isotonic,
        fit_isotonic,
    )
    from jsons_to_schema_spark.operators.stats import (
        bootstrap_mean_ci,
        cuped_ab_report,
        neyman_allocation,
        trimmed_mean,
    )
    from jsons_to_schema_spark.operators.temporal import survival_logrank

    ev = load_table(spark, SF_ORACLE, "events")
    arm = F.when(F.col("event_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
    iso_model = fit_isotonic(
        ev.select(F.col("value").alias("s"), (F.col("event_type") == "error").alias("y")),
        "s",
        "y",
    )
    surv = ev.select(
        (F.col("event_id") % 50).cast("double").alias("t"),
        (F.col("event_id") % 3 == 0).alias("obs"),
        arm.alias("g"),
    )
    frames = [
        wasserstein_drift(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "view"),
            "value", 0.0, 500.0, 64,
        ),
        survival_logrank(surv, "t", "obs", "g"),
        apply_isotonic(ev, "value", iso_model),
        bootstrap_mean_ci(ev, "value", "event_id", replicates=8),
        cuped_ab_report(
            ev.select(arm.alias("arm"), F.col("value").alias("y"),
                      (F.col("value") * 0.5).alias("x")),
            "arm", "y", "x", "a", "b",
        ),
        trimmed_mean(ev, "value", "event_type", 0.0, 500.0, 0.1, 64),
        neyman_allocation(ev, "event_type", "value", 100),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    tm = trimmed_mean(ev, "value", "event_type", 0.0, 500.0, 0.1, 64)
    assert "SinglePartition" not in audit.formatted_plan(tm)


def test_wave66_68_ops_no_python_ordered_folds(spark):
    """ANOVA, proportions z, kappa, capture-recapture, Mann-Whitney U,
    Kruskal-Wallis: exact-moment / exact-rank shapes — no Python, no
    Cartesian; the rank tests inherit the bounded-prefix discipline
    (single-partition exchanges only for the ≤ bins-row bin tables and
    bounded group/label folds)."""
    from jsons_to_schema_spark.operators.stats import (
        anova_report,
        capture_recapture,
        cohens_kappa,
        kruskal_wallis,
        mann_whitney_u,
        proportions_ab_report,
    )

    ev = load_table(spark, SF_ORACLE, "events")
    arm = F.when(F.col("event_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
    frames = [
        anova_report(ev, "event_type", "value"),
        proportions_ab_report(
            ev.select(arm.alias("arm"), (F.col("event_type") == "error").alias("c")),
            "arm", "c", "a", "b",
        ),
        cohens_kappa(
            ev.select(F.col("event_type").alias("a"), F.col("event_type").alias("b")),
            "a", "b",
        ),
        capture_recapture(
            ev.filter(F.col("event_id") % 3 == 0),
            ev.filter(F.col("event_id") % 2 == 0),
            "event_id",
        ),
        mann_whitney_u(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "view"),
            "value", 0.0, 500.0, 64,
        ),
        kruskal_wallis(ev, "event_type", "value", 0.0, 500.0, 64),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave69_70_ops_no_python(spark):
    """Randomization test, RMST, FDR, signed-rank: seeded-hash draws,
    ordered folds, and bounded-table windows — no Python, no Cartesian
    beyond the 1-row broadcast frames."""
    from jsons_to_schema_spark.operators.stats import (
        fdr_correct,
        randomization_test,
        wilcoxon_signed_rank,
    )
    from jsons_to_schema_spark.operators.temporal import survival_rmst

    ev = load_table(spark, SF_ORACLE, "events")
    arm = F.when(F.col("event_id") % 2 == 0, F.lit("c")).otherwise(F.lit("t"))
    ps = spark.range(12).select(
        F.col("id").cast("string").alias("t"),
        (F.col("id").cast("double") / 20.0 + 0.001).alias("p"),
    )
    surv = ev.select(
        (F.col("event_id") % 30).cast("double").alias("t"),
        (F.col("event_id") % 4 == 0).alias("obs"),
    )
    frames = [
        randomization_test(
            ev.select("event_id", arm.alias("arm"), F.col("value").alias("y")),
            "arm", "y", "c", "t", "event_id", permutations=12,
        ),
        survival_rmst(surv, "t", "obs", 20.0),
        fdr_correct(ps, ["t"], "p"),
        wilcoxon_signed_rank(
            ev.select(F.col("value").alias("b"), (F.col("value") * 1.01).alias("a")),
            "b", "a", 0.0, 10.0, 64,
        ),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave75_78_ops_no_python(spark):
    """Seasonal-residual composition, collocations, dispersion, vocab
    growth, Zipf, cluster quality: melt/shingle passes + bounded-table
    folds — no Python, no Cartesian (bounded spines broadcast)."""
    from jsons_to_schema_spark.operators.similarity import cluster_quality_report
    from jsons_to_schema_spark.operators.text import (
        collocation_report,
        term_dispersion_report,
        vocab_growth_report,
        zipf_report,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        (F.col("vec_id") % 3).cast("string").alias("g"),
        F.col("embedding").alias("e"),
    )
    frames = [
        collocation_report(docs, "text", 5, 10),
        term_dispersion_report(docs, "text", "doc_id", 10, 10),
        vocab_growth_report(docs, "text", "doc_id", 5),
        zipf_report(docs, "text", 20),
        cluster_quality_report(emb, "e", "g", 64),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave80_82_ops_no_python(spark):
    """Grouped W1 (zero single-partition pinned in its own test),
    inter-arrival profile, mix conformance: keyed windows/aggregates,
    bounded spines — no Python, no Cartesian."""
    from jsons_to_schema_spark.operators.drift import wasserstein_drift_grouped
    from jsons_to_schema_spark.operators.stats import mix_conformance
    from jsons_to_schema_spark.operators.temporal import interarrival_profile

    ev = load_table(spark, SF_ORACLE, "events")
    frames = [
        wasserstein_drift_grouped(
            ev.filter(F.col("event_id") % 2 == 0),
            ev.filter(F.col("event_id") % 2 == 1),
            "value", "event_type", 0.0, 500.0, 64,
        ),
        interarrival_profile(ev, "user_id", "ts", "event_id"),
        mix_conformance(
            ev, "event_type",
            {"click": 0.2, "error": 0.2, "purchase": 0.2, "signup": 0.2, "view": 0.2},
        ),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave83_85_ops_no_python(spark):
    """Blocklist scan, detected period, quantile CI, proportion CI:
    projections, rank probes, and bounded folds — no Python, no
    Cartesian beyond broadcast 1-row/rank frames."""
    from jsons_to_schema_spark.operators.stats import proportion_ci, quantile_ci
    from jsons_to_schema_spark.operators.temporal import detected_period_report
    from jsons_to_schema_spark.operators.text import blocklist_scan

    ev = load_table(spark, SF_ORACLE, "events")
    docs = load_table(spark, SF_ORACLE, "documents")
    frames = [
        blocklist_scan(docs, "text", "doc_id", ["join", "merge"]),
        detected_period_report(ev, ["event_type"], "ts", "value", 86400, 6),
        quantile_ci(ev, "value", 0.5, 0.0, 500.0, 64),
        proportion_ci(ev, F.col("event_type") == "error", "event_type"),
    ]
    for q in frames:
        plan = audit.executed_plan(q)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
