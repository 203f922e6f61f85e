"""Auto-split from the former queries.py monolith (scripts/split_queries.py, r5); see queries/__init__.py for the registry contract."""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, dedup, drift, joins, multimodal, resolve, sample, similarity, stats, temporal, text, validate
from ..operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
    infer_from_struct,
    infer_grouped,
)
from ..sources.jsonl import export_table_jsonl, infer_jsonl, read_jsonl, with_json_validity
from ..sources.spans import ensure_corpus
from ..sources.tables import load_media_catalog, load_spans, load_table

# repo root (…/repo): cache dirs for persisted indexes live here
_REPO_ROOT = Path(__file__).resolve().parents[2]


def _source_fingerprint(sf_dir, table: str) -> str:
    """Short content fingerprint (path+size+mtime) of a driver parquet
    table — the cache key component that makes persisted-index caches
    (IVF/q8/MinHash) track their SOURCE data: a regenerated testdata dir
    or a same-basename foreign corpus gets a fresh index instead of stale
    probes (r3 review; same scheme as sources/jsonl.py)."""
    import hashlib
    from pathlib import Path as _P

    src = _P(sf_dir) / f"{table}.parquet"
    st = src.stat()
    return hashlib.sha256(
        f"{src.resolve()}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]


def _spans_corpus(spark: SparkSession = None):
    """Deterministic synthetic canonical table for spans-based operators.
    Generation is idempotent and cached on disk; first caller pays it."""
    return ensure_corpus(5000)


# Oracle SQL references the corpus parquet through placeholder tokens so that
# importing this registry never touches disk; resolve_oracles() substitutes
# the real paths (generating the corpus if needed) only when the oracles are
# actually consumed.  Plain str.replace — the SQL contains literal braces.
_SPANS_GLOB_TOKEN = "__SPANS_GLOB__"


_CATALOG_PQ_TOKEN = "__CATALOG_PQ__"


# JSONL export of the sf0.01 documents table (the driver's correctness SF,
# same pinning convention as the schema constants below); substituted lazily
# so importing the registry never touches disk.
_JSONL_DOCS_TOKEN = "__JSONL_DOCS__"


_FOOTER_DIR_TOKEN = "__FOOTER_AUDIT_DIR__"


# ';'-delimited CSV export of three events columns (the CSV-ingest fixture;
# lazily exported, source-fingerprinted — the JSONL convention)
_CSV_EVENTS_TOKEN = "__CSV_EVENTS__"


def _csv_events_path() -> str:
    from ..sources.csvx import export_table_csv

    return str(
        export_table_csv(
            "/root/testdata/sf0.01",
            "events",
            "event_id",
            ["event_id", "event_type", "value"],
            delimiter=";",
        )
    )


def _footer_audit_dir() -> str:
    """Deterministic mixed-writer audit directory: the 32 spans corpus
    files plus ONE divergent file carrying an extra column — built once,
    cache-keyed to the corpus, so the footer-audit query and its oracle
    read the same bytes."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = _spans_corpus()
    src = Path(corpus) / "documents_spans"
    out = Path(corpus) / "footer_audit"
    marker = out / "_COMPLETE"
    if marker.exists():
        return str(out)
    tmp = Path(corpus) / "footer_audit.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for f in sorted(src.glob("*.parquet")):
        shutil.copy(f, tmp / f.name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["zz-1"], pa.string()),
                "extra": pa.array([1.5], pa.float64()),
            }
        ),
        tmp / "part-divergent.parquet",
    )
    shutil.rmtree(out, ignore_errors=True)
    try:
        tmp.rename(out)
    except OSError:
        pass  # concurrent builder won the rename — same bytes
    (out / "_COMPLETE").touch()
    return str(out)


_SPANS_STRUCT_SCHEMA = (
    '{"properties":{"doc_id":{"type":"string"},"spans":{"items":{"properties":'
    '{"kind":{"type":"string"},"media_ref":{"type":"string"},"offset":'
    '{"type":"integer"},"text":{"type":"string"}},"required":["kind","offset"],'
    '"type":"object"},"type":"array"}},"required":["doc_id","spans"],'
    '"type":"object"}'
)


def _stream_tmp(prefix: str):
    import tempfile
    from pathlib import Path

    return Path(tempfile.mkdtemp(prefix=prefix))


# ===========================================================================
# Pinned constant oracles — deterministic, non-SQL-expressible operators
# (seeded-hash LSH dedup/ANN).  scripts/gen_constant_oracles.py regenerates
# oracle_constants.json from a double-run determinism-guarded snapshot at
# sf0.01; semantic correctness of the pinned values is established by the
# planted/recall tests in tests/test_operators.py.  Loading is pure JSON —
# no Spark at import time.
# ===========================================================================

def _constant_oracle_sql(spec: dict) -> str:
    cols = spec["columns"]
    names = ", ".join(f"c{i}" for i in range(len(cols)))

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float):
            # Quote, don't inline: DuckDB unifies a multi-row VALUES column
            # of bare numeric literals to one DECIMAL type, and the later
            # DECIMAL->DOUBLE conversion divides an int128 mantissa by a
            # power of ten in floating point — 1-ulp off for some pins
            # (found by scripts/exact_sweep.py: drift_events_value_tdigest
            # base_q read back 35.568561285259726 for a 35.56856128525973
            # pin).  CAST('<repr>' AS DOUBLE) is a correctly-rounded
            # string->double parse, so the pin round-trips bit-exactly.
            return "'" + repr(v) + "'"
        return repr(v)

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in spec["rows"]
    )
    select = ", ".join(
        f"CAST(c{i} AS {dtype}) AS {name}" for i, (name, dtype) in enumerate(cols)
    )
    return f"SELECT {select} FROM (VALUES {values}) AS t({names})"
