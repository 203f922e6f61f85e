"""Changelog compaction: latest-state reconstruction from a CDC/event log.

A validation engine that audits snapshots (validate.table_diff) needs the
snapshot itself when the input is a change log — the "compact the upsert
stream to current state" operator every CDC pipeline (Debezium→lake,
Iceberg MERGE feeds, mutable-doc re-crawls) runs before any downstream
check.

Shape: ONE skew-safe aggregate — ``max_by(payload_struct, seq_struct)``
groups by the key and keeps the payload of the maximal sequence tuple in
a single partial+final aggregate pass.  The struct-typed buffer is not
hash-aggregatable, so Spark plans partial+final SortAggregate (verified):
each partition sorts by the GROUP KEY only and folds a running maximum —
still map-side combined, still O(1) state per key.  This beats the
textbook ``row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1``
formulation at scale twice over: the window shuffles EVERY log row to
sort each key's full history, while the aggregate pre-collapses
map-side, so a hot key (a doc re-crawled 10^6 times) ships one partial
row per map task instead of 10^6 rows to one reducer.  The row_number
form is kept as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_changelog(
    df: DataFrame,
    key_cols: "list[str]",
    seq_cols: "list[str]",
    payload_cols: "list[str]",
    op_col: "str | None" = None,
    delete_ops: "tuple[str, ...]" = ("delete",),
) -> DataFrame:
    """Latest row per key from a change log, with tombstone handling.

    ``seq_cols`` order the log (e.g. ``[ts, event_id]`` — the tuple must be
    unique per key or the winner among ties is unspecified); ``payload_cols``
    are the state columns to carry.  When ``op_col`` is given, keys whose
    LATEST entry has an op in ``delete_ops`` are dropped entirely (CDC
    tombstone semantics — earlier upserts must not resurrect the row).

    Output: key cols + payload cols of each key's latest surviving entry.
    NULL sequence components order first (Spark struct comparison), so a
    NULL-ts row never beats a real timestamp.
    """
    if not key_cols or not seq_cols or not payload_cols:
        raise ValueError("compact_changelog: key/seq/payload cols must be non-empty")
    carried = list(payload_cols) + ([op_col] if op_col and op_col not in payload_cols else [])
    seq = F.struct(*[F.col(c) for c in seq_cols])
    payload = F.struct(*[F.col(c) for c in carried])
    latest = df.groupBy(*key_cols).agg(F.max_by(payload, seq).alias("_latest"))
    out = latest.select(
        *key_cols, *[F.col(f"_latest.{c}").alias(c) for c in carried]
    )
    if op_col:
        # a NULL op is NOT a tombstone: ~isin evaluates to NULL for NULL
        # ops and the filter would silently drop the key (snapshot/backfill
        # rows commonly carry op=NULL) — keep unless op is a known delete
        # (review finding)
        out = out.filter(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*delete_ops)
        ).drop(*([op_col] if op_col not in payload_cols else []))
    return out


def scd2_from_changelog(
    df: DataFrame,
    key_cols: "list[str]",
    seq_col: str,
    payload_cols: "list[str]",
    op_col: "str | None" = None,
    delete_ops: "tuple[str, ...]" = ("delete",),
) -> DataFrame:
    """SCD Type-2 dimension build from a change log: one versioned row per
    DISTINCT consecutive state of each key, with validity interval and
    current-flag — the other half of the CDC story (compact_changelog
    keeps only the final state; downstream as-of joins and drift-vs-then
    audits need the full history table).

    Semantics per key, ordered by ``seq_col`` (contract: unique per key —
    ties would make the winner unspecified):

    * consecutive rows with an IDENTICAL payload collapse into one version
      (a re-crawl that found nothing new must not open a version) — field
      comparison is null-safe, so NULL→value and value→NULL transitions DO
      open versions;
    * a delete row (``op_col`` in ``delete_ops``; NULL op is NOT a
      tombstone, the compact_changelog review rule) CLOSES the open
      version at the delete's seq and emits nothing — a later re-insert
      opens a fresh version even if its payload equals the pre-delete
      state;
    * ``valid_from`` = the seq that opened the version, ``valid_to`` = the
      seq of the NEXT state change (NULL = still open), ``version`` =
      1-based rank among the key's surviving versions, ``is_current`` =
      open and not deleted.

    Shape: ONE data-sized shuffle — the hash partition on the key for the
    change-detection window (lag per compared field; Spark fuses them into
    one Window exec).  The boundary filter collapses the log to the
    version table (sized by state CHANGES, not log rows) before the lead /
    row_number windows, which reuse the same key partitioning — no second
    exchange (plan-asserted).  Hot keys (a doc re-crawled 10^6 times) ship
    their history to one reducer: inherent, because the output IS the
    per-key ordered history; the map-side story is the boundary collapse.
    """
    if not key_cols or not payload_cols:
        raise ValueError("scd2_from_changelog: key/payload cols must be non-empty")
    if seq_col in payload_cols or seq_col in key_cols:
        raise ValueError("scd2_from_changelog: seq_col overlaps key/payload")
    if op_col and op_col in payload_cols:
        raise ValueError("scd2_from_changelog: op_col inside payload_cols")
    from pyspark.sql import Window

    is_del = (
        F.coalesce(F.col(op_col).isin(*delete_ops), F.lit(False))
        if op_col
        else F.lit(False)
    )
    base = df.select(
        *key_cols,
        F.col(seq_col).alias("valid_from"),
        is_del.alias("_del"),
        *payload_cols,
    )
    w = Window.partitionBy(*key_cols).orderBy("valid_from")
    change = F.lag("valid_from").over(w).isNull()
    for c in ["_del", *payload_cols]:
        change = change | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    bounds = (
        base.withColumn("_chg", change)
        .filter(F.col("_chg"))
        .withColumn("valid_to", F.lead("valid_from").over(w))
    )
    return (
        bounds.filter(~F.col("_del"))
        .withColumn("version", F.row_number().over(w))
        .select(
            *key_cols,
            *payload_cols,
            "valid_from",
            "valid_to",
            "version",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
