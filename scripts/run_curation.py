#!/usr/bin/env python
"""spark-submit entry point: the training-data curation pipeline over a
documents table — quality/repetition gates, language filter, bigram-LM
perplexity gate, exact + near-dup keep-one, PII redaction, eval-set
decontamination, per-source quota / temperature mixture rebalancing,
deterministic sampling, and sequence packing — one declarative run
writing the curated corpus + a stage-by-stage funnel report.

Cluster:
    spark-submit --py-files dist/jsons_to_schema_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        scripts/run_curation.py \\
        --docs <documents-table> --output /shared/curated \\
        [--eval-docs <benchmark-docs-table>] [--source-quota N] \\
        [--sample-fraction F] [--pack-budget 4096]

Local smoke:
    spark-submit --master local[8] --py-files dist/jsons_to_schema_spark.zip \\
        scripts/run_curation.py --docs /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/curated --source-quota 20 --pack-budget 256

Stage order is the cheap-first rule every 100 TB funnel follows: row-local
projections (quality, repetition, lang) cut the corpus before anything
that shuffles (dedup), and the broadcast-probe decontamination runs on the
already-reduced survivor set.  Every stage is the oracled operator the
driver checks at sf0.01 — this script only composes them.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# --py-files puts the package on the path on a cluster; this fallback makes
# the local smoke invocation work from a bare checkout too.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-docs", default=None,
                    help="benchmark documents table for decontamination")
    ap.add_argument("--langs", default="en", help="comma-separated keep set")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 page rules (lorem-ipsum / brace / "
                         "too-few-surviving-lines) as a filter gate")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher document-quality rules as a "
                         "filter gate")
    ap.add_argument("--max-dup-line-frac", type=float, default=0.3)
    ap.add_argument("--near-dup-jaccard", type=float, default=0.7)
    ap.add_argument("--max-perplexity", type=float, default=0.0,
                    help="drop docs whose corpus-trained bigram-LM perplexity "
                    "exceeds this (CCNet-style statistical gate; 0 disables)")
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument("--decontam-bloom", action="store_true",
                    help="probe a Bloom bitmap of the eval n-grams instead "
                    "of broadcasting them as rows — the registry-scale path "
                    "(results identical: candidates are exactly verified)")
    ap.add_argument("--source-quota", type=int, default=0,
                    help="0 disables the per-source cap")
    ap.add_argument("--mixture-target", type=int, default=0,
                    help="temperature-rebalance sources toward ~N total docs "
                    "(keep rate per source ∝ n^alpha / n; 0 disables)")
    ap.add_argument("--mixture-alpha", type=float, default=0.5,
                    help="mixture temperature (1 = natural proportions, "
                    "<1 flattens the source head)")
    ap.add_argument("--sample-fraction", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=0,
                    help="0 disables sequence packing output")
    ap.add_argument("--splits", default=None,
                    help="name=frac,... (fractions summing to 1): assign a "
                    "leakage-safe train/val/test 'split' column -- the "
                    "decision hashes the near-dup CLUSTER representative "
                    "from the dedup stage's own pair list, so a surviving "
                    "rep lands where its (dropped) near-copies would have")
    args = ap.parse_args()

    from jsons_to_schema_spark.operators import decontam, dedup, pack, text
    from jsons_to_schema_spark.operators.sample import (
        deterministic_sample,
        leakage_safe_split,
        mixture_sample,
        quota_sample,
    )

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.docs)
    funnel: list[tuple[str, int]] = [("input", docs.count())]

    def stage(name: str, df):
        # pin each stage's rows before counting: without this, every later
        # stage's count (and the final write) re-executes the WHOLE upstream
        # funnel — tokenization, LSH, joins — once per stage (O(stages^2)
        # passes over the corpus).  localCheckpoint = executor-local
        # materialization; on a cluster, a persisted intermediate table.
        df = df.localCheckpoint(eager=True)
        funnel.append((name, df.count()))
        return df

    # 1. row-local gates first (no shuffle): quality, repetition, language.
    # --min-tokens is the ONLY length floor applied (the report's length_ok
    # flag hardcodes >= 5 and would silently override a lower CLI value).
    q = text.quality_features(docs, "text", "doc_id").filter(
        F.col("n_tokens") >= args.min_tokens
    )
    docs1 = stage("quality", docs.join(q.select("doc_id"), "doc_id", "left_semi"))

    # 1a. published-rule gates (still row-local narrow projections):
    # C4 page rules and/or Gopher quality rules, filter-only — the text
    # is NOT rewritten, so dedup fingerprints downstream see original
    # bytes (the transforms-after-gates rule above).
    if args.c4:
        c4 = text.c4_clean(docs1, "doc_id", "text").filter(F.col("doc_kept"))
        docs1 = stage("c4", docs1.join(c4.select("doc_id"), "doc_id", "left_semi"))
    if args.gopher:
        gq = text.gopher_quality_filter(docs1, "doc_id", "text").filter(
            F.col("keep")
        )
        docs1 = stage(
            "gopher", docs1.join(gq.select("doc_id"), "doc_id", "left_semi")
        )

    rep = text.repetition_features(docs1, "text", "doc_id").filter(
        F.col("dup_line_char_frac") <= args.max_dup_line_frac
    )
    docs2 = stage("repetition", docs1.join(rep.select("doc_id"), "doc_id", "left_semi"))
    keep_langs = [s.strip() for s in args.langs.split(",") if s.strip()]
    lang = text.lang_id(docs2, "text", "doc_id").filter(
        F.col("lang_pred").isin(keep_langs)
    )
    docs3 = stage("language", docs2.join(lang.select("doc_id"), "doc_id", "left_semi"))

    # 1b. statistical quality gate: bigram-LM perplexity trained on the
    # post-language survivors (per-keep-set model — training after the
    # language gate keeps the model from averaging across languages).
    # More expensive than the row-local gates (model folds + two bounded
    # joins) but far cheaper than LSH, so it runs before dedup.  NULL
    # perplexity (sub-bigram docs) passes — unknown is not evidence.
    if args.max_perplexity > 0:
        lm = text.lm_bigram_scores(docs3, "text", "doc_id").filter(
            F.coalesce(F.col("perplexity") <= args.max_perplexity, F.lit(True))
        )
        docs3 = stage(
            "perplexity", docs3.join(lm.select("doc_id"), "doc_id", "left_semi")
        )

    # 2. dedup: exact keep-one, then near-dup cluster keep-one
    docs4 = stage("exact_dedup", dedup.dedup_exact(docs3, "text", "doc_id"))
    pairs = dedup.minhash_lsh_pairs(
        docs4, "text", "doc_id", min_jaccard=args.near_dup_jaccard
    )
    clustered = dedup.assign_duplicate_clusters(docs4, pairs, "doc_id")
    docs5 = stage(
        "near_dedup", clustered.filter(F.col("keep")).select(*docs4.columns)
    )

    # 3. decontamination (broadcast probe over the reduced survivor set)
    if args.eval_docs:
        ev = decontam.eval_ngrams_from_docs(
            spark.read.parquet(args.eval_docs), "text", n=args.decontam_ngram
        )
        _decon = (
            decontam.decontaminate_bloom
            if args.decontam_bloom
            else decontam.decontaminate
        )
        docs6 = stage(
            "decontam",
            _decon(docs5, ev, "text", "doc_id", n=args.decontam_ngram),
        )
    else:
        docs6 = docs5

    # 4. mixture shaping: temperature rebalance and/or per-source quota,
    # then deterministic rate
    if args.mixture_target > 0:
        docs6 = stage(
            "mixture",
            mixture_sample(
                docs6, "doc_id", "source", args.mixture_alpha, args.mixture_target
            ),
        )
    if args.source_quota > 0:
        docs6 = stage(
            "source_quota",
            quota_sample(docs6, "doc_id", "source", args.source_quota),
        )
    if args.sample_fraction < 1.0:
        # DISTINCT seed from the mixture stage: both operators decide
        # membership from md5(seed, doc_id), so with a shared seed the
        # mixture survivors are exactly the low-hash rows and a later
        # same-seed rate filter with fraction >= the mixture rate is a
        # silent NO-OP (fully nested, not independent).  Different seeds
        # give independent draws.
        docs6 = stage(
            "sample",
            deterministic_sample(docs6, "doc_id", args.sample_fraction, seed=43),
        )

    # 5. PII redaction on the final survivor set (projection, no shuffle)
    curated = docs6.withColumn("text", text.redact_pii(F.col("text")))

    # 6. leakage-safe split assignment (optional): hash the dedup stage's
    # cluster representative, not the doc id, so near-copies of a training
    # page can never have landed in eval (seed 47: distinct from every
    # rate/mixture stage -- the nested-draw composition rule above)
    if args.splits:
        fracs = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.splits.split(","))
        }
        curated = leakage_safe_split(curated, "doc_id", fracs, pairs, seed=47)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    curated.write.mode("overwrite").parquet(str(out / "documents"))
    funnel.append(("curated", spark.read.parquet(str(out / "documents")).count()))

    if args.pack_budget > 0:
        packed = pack.pack_sequences(
            spark.read.parquet(str(out / "documents")),
            "doc_id", "source", budget=args.pack_budget,
        )
        packed.write.mode("overwrite").parquet(str(out / "sequences"))

    (out / "funnel.json").write_text(
        json.dumps({name: n for name, n in funnel}, indent=1) + "\n"
    )
    for name, n in funnel:
        print(f"{name:>14}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
