"""One-shot refactoring tool: split the queries.py monolith (r4 verdict
item 3) into a ``jsons_to_schema_spark/queries/`` package of per-domain
modules, each registering into the shared QUERIES/ORACLES registry via the
same ``@query`` decorator.

Mechanics: parse top-level segments (def / assign, with leading comments),
classify each @query-decorated function into a domain by name, place
helpers/constants with their (transitive) consumers — shared across domains
means ``_shared.py`` — and emit files with explicit imports.  Run with
``--dry`` to print the proposed layout without writing."""

from __future__ import annotations

import ast
import sys
from collections import defaultdict
from pathlib import Path

SRC = Path("/root/repo/jsons_to_schema_spark/queries.py")
OUT = Path("/root/repo/jsons_to_schema_spark/queries")

# Ordered (first match wins) substring rules: query name -> domain module.
RULES = [
    # schema inference / unification / validation / evolution
    (("schema_", "draft4", "rule_verdicts", "rule_violation",
      "constraint_suggestions", "spans_schema"), "schema"),
    (("stream_",), "streamq"),
    (("checkpoint", "cdc_", "asof", "interval_join", "session_overlap",
      "stats_merge_incremental", "incremental_cc"), "incremental"),
    (("multimodal_", "media_chunk",), "multimodalq"),
    (("dedup_", "fuzzy_", "entity_", "resolve_entities", "fingerprint_clusters",
      "sorted_neighborhood", "similarity_join", "containment_join",
      "jaccard",), "dedupq"),
    (("similarity_", "embedding_", "hybrid_rrf", "contrastive_pairs",
      "dim_truncation", "cluster_quality", "semantic",), "similarityq"),
    (("decontam", "contamination", "blocklist", "leakage",), "decontamq"),
    (("drift_", "ks_drift", "psi", "category_shift", "wasserstein",
      "benford", "embedding_drift", "metric_anomalies", "seasonal_residual",
      "level_shift", "detected_period", "mix_conformance",), "driftq"),
    (("pack_", "chunk_", "subword", "tokenizer_", "bpe_", "token_",
      "packing_stats", "context_fit",), "tokenq"),
    (("sample_", "_sample", "split_assign", "split_anomaly", "schema_compat",
      "mixture_", "neyman",), "sampleq"),
    (("quality", "c4_", "gopher", "repeated_spans", "excise_", "normalize_text",
      "strip_markup", "readability", "script_profile", "compression_ratio",
      "zipf", "vocab_growth", "collocations", "bursty", "tfidf", "bm25",
      "ngram_overlap", "novelty", "lm_perplexity", "dsir", "corpus_composition",
      "capture_recapture", "lang_id", "fingerprint_documents", "repetition",
      "bigram", "pii_", "curation",), "textq"),
    (("pagerank", "bfs_", "triangles", "kcore", "communities", "msf_",
      "hits_", "graph_", "path_profile",), "graphq"),
    (("k_anonymity", "l_diversity", "t_closeness", "dp_release", "mask_profile",
      "pseudonymize", "pattern_profile", "format_violations", "format_profile",
      "format_inference",), "privacyq"),
    (("survival", "logrank", "rmst", "cohort", "funnel", "attribution",
      "retention", "interarrival", "survivorship", "transition",
      "rolling_stats", "resample_", "acf_", "xcorr", "theil_sen",
      "sessionize",), "temporalq"),
    (("ab_test", "cuped", "roc_auc", "calibration", "gains_lift", "anova",
      "mwu_", "kruskal", "wilcoxon", "randomization", "proportions", "kappa",
      "effect_sizes", "bootstrap", "trimmed_mean", "fdr_", "error_rate_ci",
      "correlation_ci", "quantile_ci", "isotonic", "woe_iv", "target_encoding",
      "frequency_encoding", "winsorize", "robust_z", "mahalanobis",
      "outliers", "modeleval",), "statsinfq"),
    (("jsonl", "csv_ingest", "parquet_footer", "small_files", "zorder",
      "compaction", "skew_report", "salted_join", "join_explosion",
      "spans_repair", "spans_render", "spans_kind", "spans_partition",
      "spans_", "impute_", "table_diff", "dead_columns", "freshness",
      "relationship", "mirror_columns", "aggregate_reconciliation",
      "disorder_profile",), "tableops"),
    # integrity / dependency / relationship profiling
    (("uniqueness", "referential", "candidate_keys", "fd_", "datatype_profile",
      "containment", "coverage_gaps", "null_cooccurrence", "null_rate",
      "completeness", "sequence_integrity", "inclusion_profile", "monotonicity",
      "distinct_overlap", "arithmetic_consistency", "generalization_search",
      "joinability", "frequent_pairs", "categorical_association",
      "mutual_information", "entropy", "heavy_hitters", "join_suppliers"),
     "profileq"),
    # everything distribution/stats-profile-ish lands in distq
    ((), "distq"),
]

FORCED_SHARED = {
    "_source_fingerprint", "_spans_corpus", "_csv_events_path",
    "_footer_audit_dir", "_constant_oracle_sql", "_SPANS_GLOB_TOKEN",
    "_CATALOG_PQ_TOKEN", "_JSONL_DOCS_TOKEN", "_FOOTER_DIR_TOKEN",
    "_CSV_EVENTS_TOKEN",
}
# Handled by hand-written _registry.py / __init__.py — never auto-emitted.
HAND = {"QUERIES", "ORACLES", "query", "resolve_oracles",
        "_load_constant_oracles", "_apply_driver_window", "_DRIVER_WINDOW"}

REPO_ROOT_EXPR = "Path(__file__).resolve().parents[1]"


def classify(qname: str) -> str:
    for keys, dom in RULES:
        if any(k in qname for k in keys):
            return dom
    return "distq"


def main(dry: bool) -> None:
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    segs = []  # dicts: start, end (1-based incl), node, defines, qname
    prev_end = 0
    for node in tree.body:
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(d.lineno for d in node.decorator_list)
        # attach contiguous leading comment/blank lines (trim leading blanks)
        lead = start
        k = start - 1
        while k > prev_end:
            t = lines[k - 1].strip()
            if t.startswith("#"):
                lead = k
                k -= 1
            elif t == "":
                k -= 1
            else:
                break
        segs.append({"node": node, "start": lead, "end": node.end_lineno})
        prev_end = node.end_lineno

    toplevel = {}
    for s in segs:
        n = s["node"]
        defines, qname = set(), None
        if isinstance(n, ast.FunctionDef):
            defines.add(n.name)
            for d in n.decorator_list:
                if (isinstance(d, ast.Call) and isinstance(d.func, ast.Name)
                        and d.func.id == "query" and d.args
                        and isinstance(d.args[0], ast.Constant)):
                    qname = d.args[0].value
        elif isinstance(n, (ast.Assign, ast.AnnAssign)):
            tgts = n.targets if isinstance(n, ast.Assign) else [n.target]
            for t in tgts:
                if isinstance(t, ast.Name):
                    defines.add(t.id)
                elif (isinstance(t, ast.Subscript)
                      and isinstance(t.value, ast.Name)
                      and t.value.id == "ORACLES"
                      and isinstance(t.slice, ast.Constant)):
                    qname = t.slice.value  # ORACLES['x'] = ... rides with x
        s["defines"], s["qname"] = defines, qname
        for d in defines:
            toplevel[d] = s

    # references: names used in a segment that some segment defines
    for s in segs:
        refs = set()
        for nd in ast.walk(s["node"]):
            if isinstance(nd, ast.Name):
                refs.add(nd.id)
        s["refs"] = refs

    header_end = 0  # last import line
    for n in tree.body:
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            header_end = max(header_end, n.end_lineno)

    # drop prologue (docstring+imports) and hand-written segments
    auto = []
    for s in segs:
        n = s["node"]
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(n, ast.Expr) and s["end"] <= header_end:
            continue
        if isinstance(n, ast.Expr) and isinstance(n.value, ast.Constant):
            continue  # module docstring
        if s["defines"] & HAND:
            continue
        if (isinstance(n, ast.Expr) and isinstance(n.value, ast.Call)
                and isinstance(n.value.func, ast.Name)
                and n.value.func.id in HAND):
            continue  # _load_constant_oracles() / _apply_driver_window() calls
        auto.append(s)

    # ---- placement ----
    for s in auto:
        if s["qname"]:
            # driver queries + their ORACLES[...] assigns: domain by name
            s["file"] = classify(s["qname"])
        elif s["defines"] & FORCED_SHARED:
            s["file"] = "_shared"
        else:
            s["file"] = None

    def consumers(s):
        out = set()
        for o in auto:
            if o is s:
                continue
            if o["refs"] & s["defines"]:
                out.add(o["file"])
        # referenced by hand-written __init__ helpers? only FORCED_SHARED are.
        return out

    changed = True
    while changed:
        changed = False
        for s in auto:
            if s["file"]:
                continue
            cons = consumers(s)
            if None in cons:
                continue  # wait for consumers to settle
            if not cons:
                continue  # defer; unreferenced handled below
            s["file"] = cons.pop() if len(cons) == 1 else "_shared"
            changed = True
    for s in auto:
        if s["file"] is None:
            s["file"] = "_shared"

    # shared-integrity fixpoint: anything a _shared segment references must
    # itself be _shared (or registry/header)
    changed = True
    while changed:
        changed = False
        for s in auto:
            if s["file"] != "_shared":
                continue
            for r in s["refs"]:
                t = toplevel.get(r)
                if t and t in auto and t["file"] not in (None, "_shared"):
                    t["file"] = "_shared"
                    changed = True

    # cross-domain query->query refs: co-locate callee into _shared
    problems = []
    changed = True
    while changed:
        changed = False
        for s in auto:
            for r in s["refs"]:
                t = toplevel.get(r)
                if (t and t in auto and t["file"] != s["file"]
                        and t["file"] != "_shared"):
                    problems.append((s["file"], r, t["file"]))
                    t["file"] = "_shared"
                    changed = True

    files = defaultdict(list)
    for s in auto:
        files[s["file"]].append(s)
    for f in files:
        files[f].sort(key=lambda s: s["start"])

    def seg_text(s):
        import re

        txt = "".join(lines[s["start"] - 1:s["end"]])
        if REPO_ROOT_EXPR in txt:
            txt = txt.replace(REPO_ROOT_EXPR, "_REPO_ROOT")
            s["refs"].add("_REPO_ROOT")
        # function-local relative imports gain one level inside the package
        txt = re.sub(r"(?m)^(\s+)from \.(?=[A-Za-z])", r"\1from ..", txt)
        txt = re.sub(r"(?m)^(\s+)from \. import", r"\1from .. import", txt)
        return txt

    # materialize texts first (mutates refs for _REPO_ROOT)
    texts = {f: [seg_text(s) for s in ss] for f, ss in files.items()}

    shared_names = set().union(*(s["defines"] for s in files["_shared"])) | {"_REPO_ROOT"}

    counts = {}
    for f, ss in sorted(files.items()):
        nq = sum(1 for s in ss if s["qname"] and isinstance(s["node"], ast.FunctionDef))
        nl = sum(len(t.splitlines()) for t in texts[f])
        counts[f] = (nq, nl)
    if dry:
        print(f"{'module':<14} {'queries':>7} {'lines':>7}")
        for f, (nq, nl) in sorted(counts.items()):
            print(f"{f:<14} {nq:>7} {nl:>7}")
        print("total queries:", sum(nq for nq, _ in counts.values()))
        for p in problems:
            print("CO-LOCATED to _shared:", p)
        return

    OUT.mkdir(exist_ok=True)
    header = (
        '"""Auto-split from the former queries.py monolith '
        "(scripts/split_queries.py, r5); see queries/__init__.py for the "
        'registry contract."""\n\n'
        "from __future__ import annotations\n\n"
        "from pathlib import Path\n"
        "from pyspark.sql import DataFrame, SparkSession\n"
        "from pyspark.sql import functions as F\n\n"
        "from ..operators import cdc, dedup, drift, joins, multimodal, "
        "resolve, sample, similarity, stats, temporal, text, validate\n"
        "from ..operators.infer import (\n"
        "    infer_as_dataframe,\n"
        "    infer_from_json_column,\n"
        "    infer_from_struct,\n"
        "    infer_grouped,\n"
        ")\n"
        "from ..sources.jsonl import export_table_jsonl, infer_jsonl, "
        "read_jsonl, with_json_validity\n"
        "from ..sources.spans import ensure_corpus\n"
        "from ..sources.tables import load_media_catalog, load_spans, "
        "load_table\n"
    )

    for f, ss in sorted(files.items()):
        used = set().union(*(s["refs"] for s in ss))
        own = set().union(*(s["defines"] for s in ss))
        body = "\n\n".join(texts[f]).rstrip() + "\n"
        imp = []
        reg = sorted(n for n in ("query", "QUERIES", "ORACLES") if n in used)
        if f == "_shared":
            if reg:
                imp.append(f"from ._registry import {', '.join(reg)}")
            imp.append(
                "\n# repo root (…/repo): cache dirs for persisted indexes live here\n"
                "_REPO_ROOT = Path(__file__).resolve().parents[2]"
            )
        else:
            if reg:
                imp.append(f"from ._registry import {', '.join(reg)}")
            need = sorted((used & shared_names) - own)
            if need:
                imp.append("from ._shared import (\n    "
                           + ",\n    ".join(need) + ",\n)")
        (OUT / f"{f}.py").write_text(header + "\n".join(imp) + "\n\n\n" + body)
        print("wrote", f, counts[f])


if __name__ == "__main__":
    main("--dry" in sys.argv)
