"""Driver-contract query registry.

Each entry: name → callable(spark, sf_dir) → DataFrame with a matching
DuckDB oracle in ORACLES using IDENTICAL output column names.  Every query
is oracled, three ways:

* real SQL where the semantics are SQL-expressible (stats, joins, windows,
  text, split verdicts via read_parquet(filename=true), clustering via a
  recursive-CTE closure, multimodal via sha256 hex-byte math);
* deterministic-output operators whose COMPUTATION is not SQL (schema
  folds, seeded-hash LSH pipelines, pinned-partition t-digest) carry a
  constant-select / snapshot oracle — regenerate with
  scripts/gen_constant_oracles.py (double-run determinism guard); their
  semantic correctness lives in tests/ (golden, hypothesis, planted,
  recall);
* approximations whose raw values are legitimately run-varying (HLL union)
  expose their error CONTRACT as the oracled output.

Cross-engine value-hash hygiene (learned the hard way, keep it):
* never compare raw double AGGREGATION results (sum order differs) — use
  counts, min/max (no arithmetic), or round(x, 6);
* a round-6 double can still be IEEE -0.0 in exactly one engine (Spark's
  F.round is BigDecimal, signless; DuckDB keeps the sign) — append
  ``+ 0.0`` on BOTH sides wherever a rounded result can be a negative
  value that rounds to zero (r4 driver failure, embedding_covariance);
* Spark ``size``/``count`` int widths are cast to long to match DuckDB BIGINT;
* DuckDB ``sum`` returns HUGEINT — use ``count(*) - count(col)`` for null
  counts instead;
* timestamps are excluded from oracled min/max (formatting ambiguity).

This package was a single 15.6-kline ``queries.py`` through round 4; the
r4 verdict (item 3) asked for per-domain modules with a shared decorator.
Domain modules below register into ``_registry.QUERIES/ORACLES`` on import;
the import order here is fixed and alphabetical so registry order — and
therefore the driver's first-50 correctness window after
``_apply_driver_window()`` — is deterministic."""

from __future__ import annotations

from pathlib import Path

from ._registry import ORACLES, QUERIES, query  # noqa: F401 (re-export)
from ._shared import (
    _CATALOG_PQ_TOKEN,
    _CSV_EVENTS_TOKEN,
    _FOOTER_DIR_TOKEN,
    _JSONL_DOCS_TOKEN,
    _SPANS_GLOB_TOKEN,
    _constant_oracle_sql,
    _csv_events_path,
    _footer_audit_dir,
    _spans_corpus,
)

# Domain modules — importing each one registers its queries.  Alphabetical,
# explicit (no pkgutil magic), so insertion order is reproducible.
from . import (  # noqa: E402, F401
    decontamq,
    dedupq,
    distq,
    driftq,
    graphq,
    incremental,
    multimodalq,
    privacyq,
    profileq,
    sampleq,
    schema,
    similarityq,
    statsinfq,
    streamq,
    tableops,
    temporalq,
    textq,
    tokenq,
)


def resolve_oracles() -> dict:
    """ORACLES with corpus-path tokens substituted (lazy corpus creation)."""
    from ..sources.jsonl import export_table_jsonl

    out = dict(ORACLES)
    if any(_FOOTER_DIR_TOKEN in sql for sql in out.values()):
        d = _footer_audit_dir()
        out = {
            name: sql.replace(_FOOTER_DIR_TOKEN, d) for name, sql in out.items()
        }
    if any(
        _SPANS_GLOB_TOKEN in sql or _CATALOG_PQ_TOKEN in sql for sql in out.values()
    ):
        corpus = _spans_corpus()
        glob = f"{corpus}/documents_spans/*.parquet"
        cat = f"{corpus}/media_catalog.parquet"
        out = {
            name: sql.replace(_SPANS_GLOB_TOKEN, glob).replace(_CATALOG_PQ_TOKEN, cat)
            for name, sql in out.items()
        }
    if any(_CSV_EVENTS_TOKEN in sql for sql in out.values()):
        p = _csv_events_path()
        out = {
            name: sql.replace(_CSV_EVENTS_TOKEN, p) for name, sql in out.items()
        }
    if any(_JSONL_DOCS_TOKEN in sql for sql in out.values()):
        p = export_table_jsonl("/root/testdata/sf0.01", "documents", "doc_id")
        out = {
            name: sql.replace(_JSONL_DOCS_TOKEN, str(p)) for name, sql in out.items()
        }
    return out


def _load_constant_oracles() -> None:
    import json

    # oracle_constants.json stays at the package root (one level up) so the
    # queries.py -> queries/ split does not move a generated artifact.
    path = Path(__file__).resolve().parents[1] / "oracle_constants.json"
    if not path.exists():
        return
    for name, spec in json.loads(path.read_text()).items():
        if name in QUERIES and name not in ORACLES:
            ORACLES[name] = _constant_oracle_sql(spec)


_load_constant_oracles()


# ---------------------------------------------------------------------------
# Driver correctness window ordering.
#
# The round driver oracles only the FIRST 50 entries of ``queries()`` (dict
# insertion order).  Round-5 policy (r4 verdict item 2): the registry is
# FROZEN at the r4 surface (no new families), and the window rotates onto
# the 194 queries that have never had a driver-oracle row — 45 first-time
# entries (component-prioritized: datatype profile and Bloom decontam are
# the only §2 components with zero driver evidence, then BPE / mixture /
# IVF-PQ / PSI-divergence drift / streaming / subword packing) plus 5
# canaries from previously-green core families, including the one r4
# failure (embedding_covariance_profile, signed-zero, fixed in
# operators/linalg.py) so the fix is banked under the driver's own hash.
# Every demoted query stays registered and pytest-oracled
# (tests/test_oracles.py) at the driver's own sf0.01 every CI run.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: tuple[str, ...] = (
    # -- canaries: previously-green core families (5) --
    "embedding_covariance_profile",   # r4 FAIL -> signed-zero fix banked here
    "schema_merge_checkpoint_snapshots",  # U0/U8 n-ary fold
    "rule_verdicts_events",               # V1 validation verdicts
    "checkpoint_resume_state",            # resumable state store
    "stream_incremental_schema",          # streaming schema fold
    # -- components with ZERO driver evidence (r4 verdict item 2) --
    "datatype_profile_events",
    "decontam_bloom_documents",
    # -- never-checked family representatives (43) --
    "bpe_vocab_documents",
    "mixture_sample_documents",
    "similarity_ivf_pq_topk_embeddings",
    "dedup_incremental_minhash",
    "decontam_semantic_embeddings",
    "drift_psi_events_value",
    "drift_divergence_events_value",
    "ks_drift_events_value",
    "stream_psi_drift_events",
    "stream_duplicate_doc_ids",
    "stream_schema_drift_alerts",
    "stream_metric_anomalies",
    "stream_session_windows_events",
    "stream_new_category_alerts",
    "pack_sequences_subword_documents",
    "pack_sequences_bpe_documents",  # r5 NEW: learned-BPE budget (item 6)
    "uniqueness_profile_documents",
    "jsonl_quarantine_documents",
    "spans_repair",
    "parquet_footer_audit_spans",
    "spans_kind_mismatch_refs",
    "multimodal_audio_spectral",
    "multimodal_validate_payloads",
    "multimodal_mp4_frame_plan",
    "multimodal_image_near_dup",
    "contamination_spans_documents",
    "repeated_spans_documents",
    "schema_history_transitions",
    "normalize_text_unicode",
    "rule_violation_rows_events",
    "correlations_lineitem",
    "mutual_information_events",
    "entropy_events",
    "fd_orders_nation",
    "fuzzy_join_incoming_customers",
    "entity_clusters_customer_names",
    "k_anonymity_customer",
    "c4_clean_documents",
    "gopher_quality_documents",
    "leakage_safe_split_documents",
    "salted_join_orders_customer",
    "interval_join_events",
    "cdc_scd2_events",
)


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # fail loudly at import: a typo here would silently demote
        raise RuntimeError(f"_DRIVER_WINDOW names not registered: {missing}")
    if len(set(_DRIVER_WINDOW)) != len(_DRIVER_WINDOW):
        raise RuntimeError("_DRIVER_WINDOW contains duplicates")
    ordered = list(_DRIVER_WINDOW) + [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    for registry in (QUERIES, ORACLES):
        snapshot = dict(registry)
        registry.clear()
        registry.update((n, snapshot[n]) for n in ordered if n in snapshot)


_apply_driver_window()
