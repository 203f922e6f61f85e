"""Structured-Streaming incremental schema merge: drain a directory source,
assert the snapshot equals the batch answer; then append new files and assert
incremental widening without refolding old data."""

import json

import pytest

from jsons_to_schema_spark.schema_algebra import canonical_json, jsons_to_schema
from jsons_to_schema_spark.streaming.incremental import (
    SchemaSnapshot,
    incremental_schema_stream,
)

DOCS_A = [{"a": 1}, {"a": 2, "b": "x"}] * 50
DOCS_B = [{"a": 2.5, "c": True}] * 30


def _write_json_parquet(spark, docs, path):
    spark.createDataFrame([(json.dumps(d),) for d in docs], "doc string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_incremental_stream_merges(spark, tmp_path):
    src = str(tmp_path / "src")
    snap_path = tmp_path / "snapshot.json"
    ckpt = str(tmp_path / "ckpt")

    _write_json_parquet(spark, DOCS_A, src)
    q = incremental_schema_stream(
        spark, src, snap_path, ckpt, source_schema="doc string", json_column="doc"
    )
    q.awaitTermination(120)
    snap = SchemaSnapshot(snap_path)
    schema, n, b, _last = snap.read()
    assert n == len(DOCS_A)
    assert canonical_json(schema) == canonical_json(jsons_to_schema(DOCS_A))

    # append more files; resume stream from checkpoint — only new files fold
    _write_json_parquet(spark, DOCS_B, src)
    q2 = incremental_schema_stream(
        spark, src, snap_path, ckpt, source_schema="doc string", json_column="doc"
    )
    q2.awaitTermination(120)
    schema2, n2, b2, _last2 = snap.read()
    assert n2 == len(DOCS_A) + len(DOCS_B)
    assert b2 == b + 1
    assert canonical_json(schema2) == canonical_json(
        jsons_to_schema(DOCS_A + DOCS_B)
    )


def test_stateful_duplicate_doc_ids_across_batches(spark, tmp_path):
    """Cross-micro-batch uniqueness: a duplicate arriving in a LATER batch
    (maxFilesPerTrigger=1 forces one batch per file) must still be flagged —
    the per-key state store carries counts across batches."""
    from jsons_to_schema_spark.streaming.stateful import duplicate_doc_ids_stream

    src = str(tmp_path / "dup_src")
    ckpt = str(tmp_path / "dup_ckpt")
    # batch 1: d1 d2 d3 (d3 twice in-batch); batch 2: d1 again (cross-batch dup)
    spark.createDataFrame(
        [("d1",), ("d2",), ("d3",), ("d3",)], "doc_id string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([("d1",), ("d4",)], "doc_id string").coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = duplicate_doc_ids_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dup_docs")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dup_docs").collect()
    got = {(r.doc_id, r.cnt) for r in rows}
    # d3: in-batch dup (cnt 2); d1: cross-batch dup (cnt 2, emitted on batch 2)
    assert ("d3", 2) in got
    assert ("d1", 2) in got
    assert not any(d in {"d2", "d4"} for d, _ in got)


def test_violation_monitor_windowed_counts(spark, tmp_path):
    """Watermarked windowed violation counts over a file-source spans stream."""
    import datetime

    from pyspark.sql import functions as F

    from jsons_to_schema_spark.sources.spans import ensure_corpus
    from jsons_to_schema_spark.sources.tables import load_spans
    from jsons_to_schema_spark.streaming.monitor import violation_counts_stream

    corpus = ensure_corpus(2000)
    src = str(tmp_path / "stream_src")
    base = datetime.datetime(2026, 1, 1)
    batch = (
        load_spans(spark, corpus)
        .limit(500)
        .withColumn(
            "event_time",
            F.to_timestamp(F.lit(base.isoformat()))
            + (F.xxhash64("doc_id") % 180).cast("int").cast("interval second"),
        )
    )
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = violation_counts_stream(stream, "event_time", "1 minute", "2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("viol_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from viol_counts").collect()
    assert rows, "no windows emitted"
    checks = {r.check for r in rows}
    assert checks == {"monotonic_offsets", "text_present", "media_ref_present"}
    assert sum(r.n_rows for r in rows) == 500 * 3  # every row scored per check
    assert all(r.n_failed >= 0 for r in rows)


def test_schema_drift_alert_stream(spark, tmp_path):
    """Batch 1 (new schema) alerts; batch 2 with the SAME shape is silent;
    batch 3 that widens (float + new key) alerts with the exact paths."""
    from jsons_to_schema_spark.streaming.incremental import (
        schema_drift_alert_stream,
    )

    src = str(tmp_path / "src")
    snap = tmp_path / "snap.json"
    alerts = tmp_path / "alerts.jsonl"
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = schema_drift_alert_stream(
            spark, src, snap, alerts, ckpt,
            source_schema="doc string", json_column="doc",
        )
        q.awaitTermination(120)

    _write_json_parquet(spark, [{"a": 1}] * 20, src)
    run()
    lines = [json.loads(l) for l in alerts.read_text().splitlines()]
    assert len(lines) == 1 and lines[0]["changes"][0]["change"] == "new_schema"

    _write_json_parquet(spark, [{"a": 7}] * 10, src)  # same shape → silent
    run()
    assert len(alerts.read_text().splitlines()) == 1

    _write_json_parquet(spark, [{"a": 2.5, "z": "s"}] * 5, src)  # widens
    run()
    lines = [json.loads(l) for l in alerts.read_text().splitlines()]
    assert len(lines) == 2
    changes = {(c["path"], c["change"]) for c in lines[1]["changes"]}
    assert ("$.a", "type_widened") in changes
    assert ("$.z", "new_property") in changes


def test_dedup_ingest_stream_end_to_end(spark, tmp_path):
    """Ingest loop: batch 1 seeds the corpus; batch 2 (arriving later, own
    availableNow drain) contains a near-dup of a batch-1 doc, an exact
    within-batch duplicate pair, and a novel doc — only the novel doc and
    one within-batch representative are accepted, and the index grows so a
    third drain catches duplicates of batch-2 accepts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsons_to_schema_spark.operators import dedup
    from jsons_to_schema_spark.streaming.incremental import dedup_ingest_stream

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the old town square tonight under bright stars"
    )
    novel = "entirely new content about arrow buffers and shuffle spill thresholds"
    src = tmp_path / "src"
    src.mkdir()
    accepted = tmp_path / "accepted"
    idx = tmp_path / "idx"
    ckpt = str(tmp_path / "ckpt")

    # seed corpus index with batch 0 (built like any corpus snapshot)
    seed = spark.createDataFrame([(1, base)], "doc_id long, text string")
    dedup.build_minhash_index(seed, idx, num_hashes=32, bands=16, k=3)
    # seed as its own batch partition — the loop writes batch_id=<n> dirs
    seed.write.mode("overwrite").parquet(str(accepted / "batch_id=-1"))

    kwargs = dict(
        index_dir=str(idx),
        accepted_dir=str(accepted),
        checkpoint_dir=ckpt,
        min_jaccard=0.5,
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": [101, 102, 103, 104],
                "text": [
                    base.replace("tonight", "at dusk"),  # near-dup of seed 1
                    novel,                                # accept
                    novel + " exactly",                   # within-batch near-dup of 102
                    novel + " exactly",                   # and its exact twin
                ],
            }
        ),
        src / "b1.parquet",
    )
    dedup_ingest_stream(spark, str(src), **kwargs).awaitTermination()
    got1 = {r.doc_id for r in spark.read.parquet(str(accepted)).collect()}
    assert 1 in got1 and 102 in got1
    assert 101 not in got1          # cross-batch near-dup dropped
    assert len(got1 & {103, 104}) <= 1  # within-batch cluster kept at most one rep

    # a later drain duplicating an accepted batch-1 doc must be dropped
    pq.write_table(
        pa.table({"doc_id": [201, 202], "text": [novel, "one odd straggler row"]}),
        src / "b2.parquet",
    )
    dedup_ingest_stream(spark, str(src), **kwargs).awaitTermination()
    got2 = {r.doc_id for r in spark.read.parquet(str(accepted)).collect()}
    assert 201 not in got2  # near-dups the batch-1 accept via the APPENDED index
    assert 202 in got2


def test_rule_counts_stream_user_rules(spark, tmp_path):
    """Streaming twin of the batch rule DSL: user-defined rules scored per
    window; totals agree with a batch evaluation of the same rules."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators.validate import rule_verdicts
    from jsons_to_schema_spark.streaming.monitor import rule_counts_stream

    src = tmp_path / "rules_src"
    n = 300
    rows = [
        (i % 150, float(i - 10), "purchase" if i % 3 == 0 else "view")
        for i in range(n)
    ]
    spark.createDataFrame(rows, "sec long, value double, kind string").select(
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.col("sec").cast("int").cast("interval second")
        ).alias("event_time"),
        "value",
        "kind",
    ).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))
    rules = {
        "value_nonneg": F.col("value") >= 0,
        "purchase_positive": (F.col("kind") != "purchase") | (F.col("value") > 0),
    }
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    out = rule_counts_stream(stream, rules, "event_time", "1 minute", "2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("rule_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rule_counts").collect()
    assert {r.rule for r in rows} == set(rules)
    stream_totals = {}
    for r in rows:
        stream_totals[r.rule] = stream_totals.get(r.rule, 0) + r.n_violations
    batch_totals = {
        r.rule: r.n_violations for r in rule_verdicts(batch, rules).collect()
    }
    assert stream_totals == batch_totals
    assert sum(r.n_rows for r in rows) == n * 2


def test_metrics_stream_stamps_and_judges_batches(spark, tmp_path):
    """Three availableNow drains = three batches: batch 0 stamps with no
    verdict-worthy history, batch 1 gets NULL verdicts (below min_history),
    batch 2's planted null-rate regression flags."""
    from jsons_to_schema_spark.operators.metrics_repo import MetricsRepository
    from jsons_to_schema_spark.streaming.monitor import metrics_stream

    src = str(tmp_path / "src")
    repo_path = str(tmp_path / "mrepo")
    ckpt = str(tmp_path / "ckpt")
    an_path = str(tmp_path / "anoms")

    def _drain():
        q = metrics_stream(
            spark,
            src,
            repo_path,
            ckpt,
            dataset="s",
            columns=["v"],
            anomalies_path=an_path,
            source_schema="id long, v double",
        )
        q.awaitTermination(120)

    clean = [(i, float(i % 7)) for i in range(200)]
    spark.createDataFrame(clean, "id long, v double").write.mode(
        "append"
    ).parquet(src)
    _drain()
    spark.createDataFrame(clean, "id long, v double").write.mode(
        "append"
    ).parquet(src)
    _drain()
    dirty = [(i, None if i % 2 else float(i % 7)) for i in range(200)]
    spark.createDataFrame(dirty, "id long, v double").write.mode(
        "append"
    ).parquet(src)
    _drain()

    repo = MetricsRepository(spark, repo_path)
    assert repo.latest_run() == 2
    an = spark.read.parquet(an_path)
    v1 = {
        (r["instance"], r["metric"]): r["is_anomaly"]
        for r in an.filter("run_id = 1").collect()
    }
    assert v1[("v", "completeness")] is None  # 1 history point < min 2
    v2 = {
        (r["instance"], r["metric"]): r["is_anomaly"]
        for r in an.filter("run_id = 2").collect()
    }
    assert v2[("v", "completeness")] is True  # the planted regression
    assert v2[("*", "size")] is False


def test_new_category_alerts_across_batches(spark, tmp_path):
    """Streaming domain monitor: baseline members never alert; a novel
    category trickling across TWO micro-batches (maxFilesPerTrigger=1)
    re-emits with its growing LIFETIME count — the state store carries the
    first batch's count into the second."""
    from jsons_to_schema_spark.streaming.stateful import (
        new_category_alerts_stream,
    )

    src = str(tmp_path / "cat_src")
    ckpt = str(tmp_path / "cat_ckpt")
    spark.createDataFrame(
        [("ok",), ("ok",), ("weird",), (None,)], "c string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("weird",), ("weird",), ("odd",), ("ok",)], "c string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("c string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = new_category_alerts_stream(stream, "c", {"ok"})
    q = (
        out.writeStream.format("memory")
        .queryName("new_cats")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from new_cats").collect()
    got = sorted((r.category, r.n_rows) for r in rows)
    # 'weird' emits at lifetime 1 (batch 1) then 3 (batch 2); 'odd' once at 1;
    # 'ok' (baseline) and NULL never reach the state store
    assert got == [("odd", 1), ("weird", 1), ("weird", 3)]


def test_attribution_join_cross_batch_state(spark, tmp_path):
    """Stream-stream interval join: a conversion arriving in a LATER
    micro-batch must still pair with an impression held in batch-1 join
    state; pairs outside max_delay never emit; inner semantics drop
    unmatched rows."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.streaming.joins import attribution_join_stream

    imp_src = str(tmp_path / "imp")
    conv_src = str(tmp_path / "conv")
    ckpt = str(tmp_path / "attr_ckpt")

    def _write(path, rows, schema):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(path)

    imp_schema = "imp_id string, user string, ts string"
    conv_schema = "conv_id string, user string, ts string"
    # impressions batch 1: i1 (u1), i2 (u2); batch 2: i3 (u1)
    _write(imp_src, [("i1", "u1", "2024-01-01 10:00:00"),
                     ("i2", "u2", "2024-01-01 10:05:00")], imp_schema)
    _write(imp_src, [("i3", "u1", "2024-01-01 11:00:00")], imp_schema)
    # conversions batch 1: c1 (u1 @10:10 -> i1); batch 2: c2 (u1 @11:20 ->
    # i3 only, i1 is 80 min stale), c3 (u2 @10:20 -> i2 ACROSS batches),
    # c4 (u3, no impression at all)
    _write(conv_src, [("c1", "u1", "2024-01-01 10:10:00")], conv_schema)
    _write(conv_src, [("c2", "u1", "2024-01-01 11:20:00"),
                      ("c3", "u2", "2024-01-01 10:20:00"),
                      ("c4", "u3", "2024-01-01 10:00:00")], conv_schema)

    def _stream(src, ddl):
        return (
            spark.readStream.schema(
                ddl.replace("ts string", "ts timestamp")
            ).option("maxFilesPerTrigger", 1).parquet(src)
        )

    imp = _stream(imp_src, imp_schema).withColumnRenamed("ts", "imp_ts")
    conv = _stream(conv_src, conv_schema).withColumnRenamed("ts", "conv_ts")
    out = attribution_join_stream(
        imp, conv, "user", "imp_ts", "conv_ts", max_delay="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from attr_pairs").collect()
    got = {(r.imp_id, r.conv_id, r.delay_us) for r in rows}
    assert got == {
        ("i1", "c1", 600_000_000),
        ("i3", "c2", 1_200_000_000),
        ("i2", "c3", 900_000_000),
    }

    # guards: batch inputs and ambiguous columns are refused
    b = spark.createDataFrame([("i", "u", None)], imp_schema)
    with pytest.raises(ValueError, match="must be streaming"):
        attribution_join_stream(b, conv, "user", "imp_ts", "conv_ts")
    clash = _stream(imp_src, imp_schema)  # shares 'ts' with conversions
    with pytest.raises(ValueError, match="ambiguous"):
        attribution_join_stream(
            clash, _stream(conv_src, conv_schema), "user", "ts", "ts"
        )


def test_session_stream_merges_across_batches(spark, tmp_path):
    """Native session_window streaming: a batch-2 event that bridges two
    batch-1 sessions must MERGE them in the session state store; the
    sentinel flush row closes everything so append mode emits the final
    sessions."""
    import datetime as dt

    from pyspark.sql import functions as F

    from jsons_to_schema_spark.streaming.monitor import session_stream

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def _write(rows):
        spark.createDataFrame(rows, "user string, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(src)

    m = dt.timedelta(minutes=1)
    # batch 1: u1 has two sessions 40 min apart (gap 30m); u2 one session
    _write([("u1", base), ("u1", base + 5 * m), ("u1", base + 45 * m),
            ("u2", base + 10 * m)])
    # batch 2: u1 bridging event at +25m MERGES the two u1 sessions;
    # sentinel row closes all sessions
    _write([("u1", base + 25 * m), ("zz", base + dt.timedelta(days=30))])

    stream = (
        spark.readStream.schema("user string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = session_stream(stream, "user", "ts", gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sess_out where user <> 'zz'").collect()
    got = {(r.user, r.session_start_us, r.session_end_us, r.n_events) for r in rows}
    us = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    gap_us = 30 * 60 * 1_000_000
    assert got == {
        ("u1", us(base), us(base + 45 * m) + gap_us, 4),  # merged session
        ("u2", us(base + 10 * m), us(base + 10 * m) + gap_us, 1),
    }
