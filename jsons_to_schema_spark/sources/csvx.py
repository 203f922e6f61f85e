"""CSV ingest with dialect sniffing (round-4 wave 47).

Real pipeline inboxes are full of delimiter-ambiguous CSV/TSV drops with no
sidecar schema.  ``sniff_csv_dialect`` reads a BOUNDED prefix of one file on
the driver (never a Spark job — dialect is a per-file constant), picks the
delimiter whose field count is maximal-and-consistent across sample lines,
and detects a header row; ``read_csv_inferred`` then hands the sniffed
dialect to Spark's splittable CSV scan with schema inference.  The sniffer
is deliberately csv.Sniffer-shaped but deterministic (fixed candidate set,
explicit tie-breaks) so the same file always yields the same dialect.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

CANDIDATE_DELIMITERS = (",", ";", "\t", "|")
_SAMPLE_BYTES = 64 * 1024
_MIN_LINES = 2


def _split_sample(path: str | Path) -> "list[str]":
    with open(path, "rb") as f:
        raw = f.read(_SAMPLE_BYTES)
    text = raw.decode("utf-8", errors="replace")
    lines = [ln for ln in text.splitlines() if ln]
    # the final line may be truncated mid-record by the byte cap: drop it
    # unless it is the only evidence
    if len(lines) > _MIN_LINES and not text.endswith(("\n", "\r")):
        lines = lines[:-1]
    return lines


def _count_fields(line: str, delim: str, quote: str = '"') -> int:
    """Fields in one line under quote-aware splitting (a delimiter inside
    quotes is payload, not structure)."""
    n, in_q = 1, False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == quote:
            if in_q and i + 1 < len(line) and line[i + 1] == quote:
                i += 1  # escaped quote
            else:
                in_q = not in_q
        elif ch == delim and not in_q:
            n += 1
        i += 1
    return n


def sniff_csv_dialect(path: str | Path, sample_lines: int = 100) -> dict:
    """Deterministic dialect detection from a bounded file prefix:

    - delimiter: the candidate (',', ';', tab, '|') whose quote-aware field
      count is (a) > 1, (b) IDENTICAL across the sampled lines, and (c)
      maximal; ties break by candidate order.  No candidate qualifying on
      (a)+(b) → the single-column dialect (delimiter ',', 1 field).
    - header: the first line has a header iff none of its fields parses as
      a number while at least one field of the second line does — the
      classic type-disagreement test, deterministic and cheap.
    - quotechar is fixed '"' (the only quote Spark's CSV scan and DuckDB
      agree on by default; exotic quotes belong to explicit options).

    Returns {"delimiter", "header", "n_fields", "quote"}.
    """
    lines = _split_sample(path)[: max(sample_lines, _MIN_LINES)]
    if not lines:
        raise ValueError(f"sniff_csv_dialect: {path} is empty")
    best: "tuple[int, str] | None" = None
    for d in CANDIDATE_DELIMITERS:
        counts = {_count_fields(ln, d) for ln in lines}
        if len(counts) == 1:
            (n,) = counts
            if n > 1 and (best is None or n > best[0]):
                best = (n, d)
    n_fields, delim = best if best else (1, ",")

    def _numeric(tok: str) -> bool:
        t = tok.strip().strip('"')
        if not t:
            return False
        try:
            float(t)
            return True
        except ValueError:
            return False

    header = False
    if len(lines) >= 2:
        first = lines[0].split(delim) if delim != "," or n_fields > 1 else [lines[0]]
        second = lines[1].split(delim)
        header = (not any(_numeric(t) for t in first)) and any(
            _numeric(t) for t in second
        )
    return {"delimiter": delim, "header": header, "n_fields": n_fields, "quote": '"'}


def read_csv_inferred(
    spark: SparkSession, path: str | Path, dialect: dict | None = None
) -> DataFrame:
    """Spark CSV scan under the sniffed dialect with schema inference.
    The sniff reads one bounded prefix driver-side; the scan itself is the
    normal splittable distributed reader (schema inference costs Spark one
    extra pass — persist the inferred schema for repeated campaign reads,
    the fit_quantile_bins convention)."""
    p = Path(path)
    if dialect is None:
        sample = p
        if p.is_dir():
            files = sorted(p.glob("*.csv")) or sorted(p.glob("*"))
            if not files:
                raise ValueError(f"read_csv_inferred: no files under {p}")
            sample = files[0]
        dialect = sniff_csv_dialect(sample)
    return (
        spark.read.option("sep", dialect["delimiter"])
        .option("header", str(dialect["header"]).lower())
        .option("quote", dialect["quote"])
        .option("inferSchema", "true")
        .csv(str(p))
    )


def export_table_csv(
    sf_dir: str | Path,
    table: str,
    order_by: str,
    columns: "list[str]",
    delimiter: str = ";",
) -> Path:
    """Deterministic cached CSV export of driver parquet columns (the
    export_table_jsonl convention: source-fingerprinted cache key,
    write-to-tmp + atomic rename, byte-stable for a fixed input) — the
    fixture both engines read in the CSV-ingest oracle."""
    import hashlib
    import os

    src_path = Path(sf_dir) / f"{table}.parquet"
    st = src_path.stat()
    fp = hashlib.sha256(
        f"{src_path.resolve()}|{st.st_size}|{st.st_mtime_ns}|{delimiter}|"
        f"{','.join(columns)}".encode()
    ).hexdigest()[:12]
    tag = Path(sf_dir).name or "root"
    base = Path(__file__).resolve().parents[2] / ".cache"
    out = base / f"{table}_{tag}_{fp}.csv"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    import duckdb

    tmp = out.with_suffix(f".tmp{os.getpid()}")
    con = duckdb.connect()
    try:
        cols = ", ".join(columns)
        con.execute(
            f"COPY (SELECT {cols} FROM read_parquet('{src_path}') "
            f"ORDER BY {order_by}) TO '{tmp}' "
            f"(FORMAT CSV, HEADER, DELIMITER '{delimiter}')"
        )
    finally:
        con.close()
    os.replace(tmp, out)
    return out
