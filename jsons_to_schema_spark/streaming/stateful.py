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
