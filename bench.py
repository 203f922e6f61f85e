#!/usr/bin/env python
"""Benchmark harness (driver contract: ONE JSON line on stdout).

Headline metric: docs/sec through the flagship pipeline — unified-schema
inference + full constraint validation over the canonical interleaved-docs
spans table (BASELINE.json metric), plus per-query wall times for the other
operator families at $SPARK_GRAFT_SF_DIR scale.

Env:
  SPARK_GRAFT_SF_DIR   driver tables dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores      (default 32)
  SPARK_GRAFT_BENCH_DOCS  spans corpus size (default 500_000; cached)

Modes:
  python bench.py               # standard bench → one JSON line
  python bench.py --scaling     # same pipeline at local[8] vs local[32],
                                # prints scaling JSON (evidence for the
                                # N→4N ≥0.8 efficiency gate, BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "500000"))
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "8000000"))
TIMED_RUNS = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "3"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sf_from_dir(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


class FlagshipPipeline:
    """Unified schema + full constraint validation, built ONCE and executed
    per run — query analysis and whole-stage-codegen compilation are a fixed
    driver-side cost paid at build time (exactly like a recurring production
    validation job), so timed runs measure data throughput."""

    def __init__(self, spark, corpus):
        from jsons_to_schema_spark.operators.infer_native import NativeInferencePlan
        from jsons_to_schema_spark.operators.validate import (
            all_violations,
            partition_verdicts,
            with_check_flags,
        )
        from jsons_to_schema_spark.sources.tables import load_media_catalog, load_spans

        df = load_spans(spark, corpus)
        cat = load_media_catalog(spark, corpus)
        self.infer_plan = NativeInferencePlan(df)
        self.verdicts = partition_verdicts(with_check_flags(df))
        self.violations = all_violations(df, cat, cap_per_check=100)

    def run(self) -> int:
        schema, n = self.infer_plan.run()
        self.verdicts.count()
        self.violations.count()
        return n


def run_queries(spark, corpus) -> dict[str, float]:
    """Per-family timed queries at SF_DIR scale."""
    from pyspark.sql import functions as F

    from jsons_to_schema_spark.operators import dedup, drift, similarity, text
    from jsons_to_schema_spark.operators.infer import infer_from_json_column
    from jsons_to_schema_spark.operators.stats import column_stats
    from jsons_to_schema_spark.sources.tables import load_table

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        log(f"  {name}: {timings[name]}s")

    events = load_table(spark, SF_DIR, "events")
    # documents at local SF is ONE small parquet file → one input split → the
    # CPU-heavy per-row dedup/text kernels would run on a single core, which
    # measures nothing real: at target scale the corpus arrives in thousands
    # of splits.  One explicit repartition models that (excluded cost is the
    # ~100ms shuffle of 5k rows, noise at this size).
    docs = load_table(spark, SF_DIR, "documents").repartition(CPUS)
    li = load_table(spark, SF_DIR, "lineitem")
    emb = load_table(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )

    timed("infer_json_events", lambda: infer_from_json_column(events, "props"))
    timed(
        "stats_lineitem",
        lambda: column_stats(
            li,
            ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey"],
            distinct="approx",
        ).collect(),
    )
    timed(
        "drift_events_value",
        lambda: drift.quantile_drift(
            events.filter(F.col("user_id") % 2 == 0),
            events.filter(F.col("user_id") % 2 == 1),
            "value",
        ).collect(),
    )
    timed(
        "dedup_minhash_documents",
        lambda: dedup.minhash_lsh_pairs(docs, "text", "doc_id", min_jaccard=0.5).count(),
    )
    timed(
        "dedup_simhash_documents",
        lambda: dedup.simhash_near_dup_pairs(docs, "text", "doc_id").count(),
    )
    timed(
        "text_quality_documents",
        lambda: text.quality_features(docs, "text", "doc_id").count(),
    )
    timed(
        "similarity_topk_embeddings",
        lambda: similarity.brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10
        ).count(),
    )
    return timings


def build_session(cpus: int):
    from jsons_to_schema_spark.session import get_spark

    return get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name=f"bench-{cpus}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # Local corpora are a few hundred MB-GB in 32 files; the 128 MB
            # default split size would hand local[32] only ~4 input splits and
            # the scaling experiment would measure the scheduler, not the
            # engine.  4 MB splits ≈ 100-400 tasks per scan — the same
            # tasks-per-core ratio a production scan of a 100 TB Iceberg table
            # gets with default splits.  Same value at BOTH parallelism levels
            # (identical physical work, only cores vary).
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )


def bench_once(cpus: int, corpus, skip_queries: bool = False) -> dict:
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    log(f"[bench] session local[{cpus}]")
    pipeline = FlagshipPipeline(spark, corpus)
    # warm-up (discarded): JVM/codegen compile/Arrow worker spin-up
    pipeline.run()
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.time()
        n = pipeline.run()
        times.append(time.time() - t0)
    flagship_s = sorted(times)[len(times) // 2]  # median of >=3 timed runs
    log(
        f"[bench] flagship: {n} docs median {flagship_s:.2f}s "
        f"(runs: {[round(t, 2) for t in times]}) = {n/flagship_s:.0f} docs/s"
    )
    timings = {} if skip_queries else run_queries(spark, corpus)
    timings["flagship_unify_validate"] = round(flagship_s, 3)
    spark.stop()
    return {"n_docs": n, "flagship_s": flagship_s, "queries": timings}


def main() -> None:
    from jsons_to_schema_spark.sources.spans import ensure_corpus

    if "--scaling-worker" in sys.argv:
        # one measurement in a fresh JVM (fair strong-scaling comparison:
        # no heap/JIT state shared between the local[8] and local[32] runs)
        cpus = int(sys.argv[sys.argv.index("--scaling-worker") + 1])
        corpus = ensure_corpus(SCALING_DOCS)
        r = bench_once(cpus, corpus, skip_queries=True)
        print(json.dumps({"cpus": cpus, "docs_per_sec": r["n_docs"] / r["flagship_s"]}))
        return

    scaling = "--scaling" in sys.argv

    if scaling:
        # strong-scaling evidence needs compute-dominated work: at small
        # corpus sizes fixed per-job overhead (~seconds) hides the cores.
        import subprocess

        log(f"[bench] scaling corpus n={SCALING_DOCS}")
        ensure_corpus(SCALING_DOCS)
        res = {}
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, __file__, "--scaling-worker", str(cpus)],
                capture_output=True,
                text=True,
                env=os.environ,
            )
            if proc.returncode != 0:
                log(proc.stderr[-2000:])
                raise RuntimeError(f"scaling worker local[{cpus}] failed")
            res[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])["docs_per_sec"]
            log(f"[bench] local[{cpus}]: {res[cpus]:.0f} docs/s")
        eff = (res[32] / res[8]) / 4.0
        out = {
            "metric": "scaling_efficiency_local8_to_local32",
            "value": round(eff, 3),
            "unit": "ratio",
            "docs_per_sec": {str(k): round(v, 1) for k, v in res.items()},
            "n_docs": SCALING_DOCS,
            "sf": _sf_from_dir(SF_DIR),
        }
        print(json.dumps(out))
        return

    log(f"[bench] spans corpus n={BENCH_DOCS}")
    corpus = ensure_corpus(BENCH_DOCS)

    r = bench_once(CPUS, corpus)
    out = {
        "metric": "docs_per_sec_unified_validated",
        "value": round(r["n_docs"] / r["flagship_s"], 1),
        "unit": "sec",
        "queries": r["queries"],
        "sf": _sf_from_dir(SF_DIR),
        "n_docs": r["n_docs"],
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
