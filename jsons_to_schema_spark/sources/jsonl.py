"""JSONL (newline-delimited JSON) file source.

Upstream EP1 (``jsonsToSchema`` — unify a schema over JSON documents read
from files; SURVEY.md §1/§2 G1-G5) reads its documents from disk.  This is
the distributed analog: a JSONL dataset ingested as a SPLITTABLE text scan —
every executor reads its own byte range, lines land as a string column, and
the same Arrow-batched inference kernel that serves any JSON column
(operators/infer.py:infer_from_json_column) folds them into one draft
schema.  No driver-side file reading, no per-row Python JSON parse in the
plan: the pyarrow columnar parser inside mapInArrow handles each batch.

At 100 TB the same call reads a glob of thousands of .jsonl/.jsonl.gz parts;
uncompressed parts split by range, gzip parts parallelize per file — both
arrive as ordinary scan partitions feeding the treeAggregate merge.

``export_table_jsonl`` exists for tests/oracles: a deterministic, cached,
idempotent JSONL export of a driver table so the Spark scan and the DuckDB
``read_json`` oracle read the SAME bytes.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.infer import infer_from_json_column
from ..schema_algebra import Schema, SchemaGenerationConfig

_CACHE_BASE = Path(__file__).resolve().parents[2] / ".cache" / "jsonl"


def read_jsonl(spark: SparkSession, path: str | Path, json_col: str = "json") -> DataFrame:
    """One string column per line.  spark.read.text keeps the scan splittable
    (unlike spark.read.json(schema-less) it never runs an extra inference
    pass over the data — THIS engine is the inference pass)."""
    return spark.read.text(str(path)).withColumnRenamed("value", json_col)


def infer_jsonl(
    spark: SparkSession,
    path: str | Path,
    config: SchemaGenerationConfig | None = None,
) -> tuple[Schema | None, int]:
    """EP1 end-to-end: JSONL files → unified draft schema + document count."""
    kw = {"config": config} if config is not None else {}
    return infer_from_json_column(read_jsonl(spark, path), "json", **kw)


def export_table_jsonl(sf_dir: str | Path, table: str, order_by: str) -> Path:
    """Deterministic cached JSONL export of one driver parquet table.

    DuckDB COPY (FORMAT JSON) writes one object per line with the table's
    column order — byte-stable for a fixed input, so the export can be pinned
    by oracles.  Idempotent via write-to-tmp + atomic rename; concurrent
    exporters race benignly (same bytes).  The cache key fingerprints the
    SOURCE parquet (full path + size + mtime — review r3: a basename-only
    tag served stale bytes for a different corpus with the same leaf dir
    name, and regenerated testdata was never picked up)."""
    import hashlib

    src_path = Path(sf_dir) / f"{table}.parquet"
    st = src_path.stat()
    fp = hashlib.sha256(
        f"{src_path.resolve()}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    tag = Path(sf_dir).name or "root"
    out = _CACHE_BASE / f"{table}_{tag}_{fp}.jsonl"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    import duckdb

    src = src_path  # same file the fingerprint pinned
    tmp = out.with_suffix(f".tmp{os.getpid()}")
    con = duckdb.connect()
    try:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') ORDER BY {order_by}) "
            f"TO '{tmp}' (FORMAT JSON)"
        )
    finally:
        con.close()
    os.replace(tmp, out)
    return out


def with_json_validity(df: DataFrame, json_col: str = "json") -> DataFrame:
    """Ingest hygiene for JSONL: append ``is_valid`` = does the line parse
    as JSON at all (Spark 4's variant ``try_parse_json`` — JVM-side, no
    Python), so malformed lines can be QUARANTINED instead of silently
    poisoning inference (the schema kernel would otherwise see them as
    absent documents).  NULL / whitespace-only lines are invalid.

    Split valid/quarantine with two filters off this one projection —
    Catalyst shares the scan.  Engine caveat: exotic edge cases (huge
    numbers, duplicate keys) may grade differently across JSON parsers;
    the quarantine contract is for structurally broken lines, which every
    parser rejects alike."""
    return df.withColumn(
        "is_valid", F.try_parse_json(F.col(json_col)).isNotNull()
    )
