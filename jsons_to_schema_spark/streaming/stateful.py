"""Stateful streaming constraint: cross-batch doc_id uniqueness.

The batch engine checks uniqueness with one groupBy whose partial+final
HashAggregate pre-aggregates map-side (operators/validate.py::
duplicate_doc_ids); on a stream that is impossible with windowed counts — a duplicate may arrive HOURS after the original, in a
different micro-batch, so the check needs durable per-key state.  This is the
one constraint in the suite that genuinely warrants a custom stateful
operator (``applyInPandasWithState``): per-doc_id seen-counts, stored in the
state store, emitting a violation row whenever a key's count first exceeds
one and on every further increase.

Scale properties: state is one long per distinct doc_id, hash-partitioned by
the grouping key across executors (the streaming analog of the batch salted
repartition); the Arrow batch boundary keeps the Python side vectorized.  A
production deployment would add a TTL via ``GroupStateTimeout`` keyed on
event time — kept NoTimeout here because the reference semantics (uniqueness
over the whole table) have no expiry.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, cnt long"
STATE_SCHEMA = "cnt long"


def _update_doc_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else 0
    rows = 0
    for pdf in pdfs:
        rows += len(pdf)
    total = prev + rows
    state.update((total,))
    if total > 1 and rows > 0:
        yield pd.DataFrame({"doc_id": [key[0]], "cnt": [total]})


def duplicate_doc_ids_stream(spans_stream: DataFrame) -> DataFrame:
    """Streaming uniqueness check: emits (doc_id, cnt) in update mode every
    time a doc_id's lifetime count exceeds 1 — including duplicates that
    arrive in later micro-batches than the original."""
    return spans_stream.select("doc_id").groupBy("doc_id").applyInPandasWithState(
        _update_doc_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


NEW_CATEGORY_OUTPUT = "category string, n_rows long"
NEW_CATEGORY_STATE = "cnt long"


def _update_new_categories(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else 0
    rows = 0
    for pdf in pdfs:
        rows += len(pdf)
    total = prev + rows
    state.update((total,))
    if rows > 0:
        yield pd.DataFrame({"category": [key[0]], "n_rows": [total]})


def new_category_alerts_stream(
    stream: DataFrame, column: str, baseline: "set[str]"
) -> DataFrame:
    """Streaming DOMAIN monitor: alert when a category value outside the
    pinned baseline domain appears on the stream — the batch
    drift.category_shift 'new' verdict, continuously.  A schema check
    cannot see it (the column type is unchanged) and a windowed count
    cannot either (the novel member may trickle in one row per hour
    across micro-batches), so the detector needs durable per-category
    state.

    The baseline membership test runs JVM-SIDE (``isin`` over the
    enum-scale baseline — for a large domain swap in the bloom.py
    prefilter), so only NOVEL rows ever reach Python and the state store:
    state is one long per novel category, hash-partitioned by category.
    Each micro-batch that grows a novel category's lifetime count
    re-emits (category, lifetime n_rows); the batching-agnostic reduction
    max(n_rows) per category equals the batch GROUP BY count over the
    novel slice — which is exactly how the oracle checks it."""
    cat = F.col(column).cast("string")
    novel = stream.select(cat.alias("category")).filter(
        F.col("category").isNotNull()
        & ~F.col("category").isin(*sorted(baseline))
    )
    return novel.groupBy("category").applyInPandasWithState(
        _update_new_categories,
        outputStructType=NEW_CATEGORY_OUTPUT,
        stateStructType=NEW_CATEGORY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
