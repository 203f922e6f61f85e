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
