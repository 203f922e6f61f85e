"""Data-layout optimization for scan-time skipping.

Predicate pushdown only pays when the file/row-group FOOTER STATS can
prove a predicate false — and footer stats only discriminate when the
data is laid out so each file owns a narrow value range.  ``write_sorted``
is the 1-D special case of Z-ordering: range-repartition on the hot
filter columns + sort within partitions, so every output file's
(min, max) for those columns is (near-)disjoint and a selective filter
scans a handful of files instead of all of them.  At 100 TB this is the
difference between a point-lookup query reading ~one row group and
reading the table.

``file_stat_ranges`` reads the written footers back (pyarrow, no Spark
job) — the direct evidence the layout worked, used by the tests and
worth running after any compaction job.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str | Path,
    sort_cols: "list[str]",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-repartition on ``sort_cols`` (+ sort within partitions) and
    write — each output file owns a contiguous value range, so footer
    min/max stats prune files/row-groups under selective filters.

    ``n_files`` sizes the output (defaults to the session's shuffle
    parallelism).  Range partitioning samples the data to pick balanced
    boundaries — skew-safe where hash partitioning on a hot key is not.
    """
    if not sort_cols:
        raise ValueError("write_sorted: sort_cols must be non-empty")
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(str(path))


def file_stat_ranges(path: str | Path, column: str) -> "list[tuple]":
    """(min, max) footer statistics of ``column`` per parquet file under
    ``path`` — read driver-side from the footers only (no data IO, no
    Spark job).  Sorted by min.  The skipping evidence: a sorted layout
    yields pairwise-disjoint ranges; an unsorted one yields ~full-span
    ranges in every file."""
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.read_metadata(f)
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    if s.has_min_max:
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return sorted(ranges)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    n_buckets: int,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key —
    the layout that makes every future equi-join/aggregation on that key
    SHUFFLE-FREE: two tables bucketed into the same bucket count on the
    join key co-locate bucket-for-bucket, so the sort-merge join reads
    both sides with zero Exchange (and zero sort, when sorted).  For a
    fact table joined every run (orders ⋈ lineitem; spans ⋈ media
    catalog), this amortizes the shuffle ONCE into the write.

    Catalog-table based (``saveAsTable``) because bucket metadata lives in
    the table catalog — path-based parquet reads cannot recover it; at
    cluster scale the same call targets the Iceberg/Hive metastore.
    """
    if not bucket_cols:
        raise ValueError("write_bucketed: bucket_cols must be non-empty")
    if n_buckets <= 0:
        raise ValueError(f"write_bucketed: n_buckets must be > 0, got {n_buckets}")
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def parquet_footer_audit(spark, path: str | Path) -> DataFrame:
    """Distributed parquet METADATA audit: every file's footer read on the
    EXECUTORS (pyarrow, metadata-only IO — no data pages move) yielding
    (file, n_rows, n_row_groups, schema_fp), then a bounded fold grades
    each file's schema group share.  The mixed-writer audit for a
    10^6-file corpus: a writer that silently changed schema mid-campaign
    shows up as a minority fingerprint, found for the cost of listing +
    footer reads.

    The path LIST is driver-side (one string per file — bounded); footer
    IO is mapInPandas over a repartitioned path table so a huge corpus
    fans out.  schema_fp hashes the sorted (column-path, physical-type)
    leaf list — layout-level identity (what readers actually bind to),
    not logical-type cosmetics.

    Returns (file, n_rows, n_row_groups, schema_fp, schema_group_share,
    is_majority_schema); share = fraction of files with this exact
    fingerprint, round(6).
    """
    import hashlib
    import os
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    paths = sorted(str(p) for p in Path(path).glob("*.parquet"))
    if not paths:
        raise ValueError(f"parquet_footer_audit: no parquet files under {path}")
    src = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(len(paths), 64)
    )

    def read_footers(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pyarrow.parquet as pq

        for b in batches:
            out = {"file": [], "n_rows": [], "n_row_groups": [], "schema_fp": []}
            for p in b["path"]:
                md = pq.read_metadata(p)
                leaves = sorted(
                    f"{md.schema.column(i).path}:{md.schema.column(i).physical_type}"
                    for i in range(md.num_columns)
                )
                out["file"].append(os.path.basename(p))
                out["n_rows"].append(md.num_rows)
                out["n_row_groups"].append(md.num_row_groups)
                out["schema_fp"].append(
                    hashlib.sha256(";".join(leaves).encode()).hexdigest()[:16]
                )
            yield pd.DataFrame(out)

    footers = src.mapInPandas(
        read_footers,
        "file string, n_rows long, n_row_groups int, schema_fp string",
    )
    w_fp = Window.partitionBy("schema_fp")
    w_all = Window.partitionBy(F.lit(1))
    share = F.round(
        F.count(F.lit(1)).over(w_fp) / F.count(F.lit(1)).over(w_all), 6
    )
    return footers.select(
        "file",
        "n_rows",
        "n_row_groups",
        "schema_fp",
        share.alias("schema_group_share"),
        (share > 0.5).alias("is_majority_schema"),
    )


def small_files_report(spark, path: str | Path, target_bytes: int) -> DataFrame:
    """The small-files audit — the classic large-table killer: a corpus
    written as 10^6 KB-scale files pays per-file open/seek/footer cost on
    every scan and floods the driver's split planning.  Executor-side
    footer reads (the parquet_footer_audit fan-out) sum each file's
    UNCOMPRESSED row-group bytes; the report says how bad it is and what
    to do: ``suggested_files`` = the compaction target count at
    ``target_bytes`` per file (feed it to write_sorted's n_files and the
    compaction preserves the skipping layout).

    Returns one row: (n_files, n_small, total_bytes, avg_file_bytes,
    suggested_files); small = file bytes < target_bytes.
    """
    import math
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    if target_bytes <= 0:
        raise ValueError("small_files_report: target_bytes must be > 0")
    paths = sorted(str(p) for p in Path(path).glob("*.parquet"))
    if not paths:
        raise ValueError(f"small_files_report: no parquet files under {path}")
    src = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(len(paths), 64)
    )

    def read_sizes(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pyarrow.parquet as pq

        for b in batches:
            sizes = []
            for p in b["path"]:
                md = pq.read_metadata(p)
                sizes.append(
                    sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
                )
            yield pd.DataFrame({"bytes": pd.Series(sizes, dtype="int64")})

    sizes = src.mapInPandas(read_sizes, "bytes long")
    return sizes.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum((F.col("bytes") < target_bytes).cast("long")).alias("n_small"),
        F.sum("bytes").alias("total_bytes"),
        F.round(F.avg("bytes"), 6).alias("avg_file_bytes"),
        F.greatest(
            F.lit(1),
            F.ceil(F.sum("bytes") / F.lit(float(target_bytes))),
        ).cast("long").alias("suggested_files"),
    )
