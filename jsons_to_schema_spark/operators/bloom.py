"""Bloom-filter membership — the scale path for set probes whose reference
set is too large to broadcast as rows.

The existing decontamination probe (decontam.py) broadcasts the eval
n-gram set and map-side-joins the corpus against it — the right plan while
the eval side is MBs.  A combined benchmark suite (or a blocklist, or a
seen-URL registry) can reach 10^9 entries; broadcasting those as a join
hash table costs tens of GB per executor.  A Bloom filter compresses the
same membership test to ~1.2 GB at 10^9 keys / 1% false positives — and
because Bloom false positives can only ADD candidates, an exact
verification join on the (tiny) candidate set restores exact semantics.
The pattern: cheap approximate prefilter where the data is big, exact
check where the data is small.

Engineering shape:

* hash positions are computed JVM-side in BOTH build and probe with the
  identical expression (``pmod(xxhash64(value, i), num_bits)`` for
  i = 0..k−1) — whole-stage codegen, and no risk of the build and probe
  sides disagreeing about the hash;
* the build aggregates positions into per-partition numpy bitmaps inside
  ``mapInArrow`` (one bitmap per partition, vectorized ``bitwise_or``),
  then ORs the bounded set of bitmaps on the driver — the same
  bounded-collect contract as tdigest.py's driver merge: traffic is
  partitions × num_bits/8 bytes, independent of key count;
* the probe tests all k bits per row in one Arrow-batched kernel over the
  JVM-computed position arrays — pure vectorized bit indexing, no Python
  hashing, no per-row work.

Sizing follows the standard formulas: m = −n·ln(p)/ln²2 bits,
k = (m/n)·ln2 hashes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_num_bits(n_items: int, fpp: float = 0.01) -> int:
    """Bits for an n-item filter at the target false-positive rate,
    rounded up to a whole byte."""
    if not (0.0 < fpp < 1.0) or n_items <= 0:
        raise ValueError("need n_items > 0 and 0 < fpp < 1")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    return ((m + 7) // 8) * 8


def bloom_num_hashes(num_bits: int, n_items: int) -> int:
    """Optimal hash count k = (m/n)·ln2, floored at 1."""
    return max(1, round(num_bits / max(1, n_items) * math.log(2)))


def _positions(col: str | Column, num_bits: int, num_hashes: int) -> Column:
    """array<bigint> of the k bit positions for a value — the ONE hashing
    expression shared by build and probe (JVM xxhash64 seeded by the
    probe index; pmod keeps positions non-negative).  NULL values get a
    NULL array (not the hash of the bare seed, which Spark's
    null-skipping xxhash64 would otherwise produce): the build's explode
    drops them and the probe kernel maps them to false, so NULLs are
    never members."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.lit(int(num_hashes) - 1)),
            lambda i: F.pmod(F.xxhash64(c, i), F.lit(int(num_bits))),
        ),
    )


def build_bloom(
    df: DataFrame, col: str, num_bits: int, num_hashes: int
) -> bytes:
    """Build the filter over a column's non-null values; returns the
    num_bits/8-byte bitmap.

    Each partition folds its positions into a local numpy bitmap inside
    ``mapInArrow`` (vectorized ``bitwise_or.at``), yielding exactly one
    binary row per partition; the driver ORs those — bounded at
    partitions × num_bits/8 bytes regardless of how many keys went in."""
    if num_bits % 8 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 8")
    nbytes = num_bits // 8

    pos = df.select(
        F.explode(_positions(col, num_bits, num_hashes)).alias("pos")
    ).where(F.col("pos").isNotNull())

    def _fold(batches):
        import pyarrow as pa

        bitmap = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for batch in batches:
            p = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if p.size:
                seen = True
                np.bitwise_or.at(
                    bitmap, p >> 3, (1 << (p & 7)).astype(np.uint8)
                )
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bitmap.tobytes()], type=pa.binary())], ["bm"]
            )

    parts = pos.mapInArrow(_fold, "bm binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_contains(
    col: str | Column, bloom: bytes, num_bits: int, num_hashes: int
) -> Column:
    """Boolean membership column: true iff all k bits are set.

    The k positions arrive as k SCALAR bigint columns (not one array
    column): the kernel then runs k fully-vectorized gathers per Arrow
    batch over the captured bitmap — zero per-row Python, which matters
    because the probe side is the corpus, not the reference set.  The
    bitmap ships with the task closure (num_bits/8 bytes — the whole
    point of the structure).  NULL input values probe as false."""
    if len(bloom) * 8 != num_bits:
        raise ValueError(
            f"bitmap is {len(bloom) * 8} bits, expected {num_bits}"
        )
    bitmap = np.frombuffer(bloom, dtype=np.uint8)

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("boolean", PandasUDFType.SCALAR_ITER)
    def _probe(it):
        import pandas as pd

        for cols in it:
            if not isinstance(cols, tuple):
                cols = (cols,)
            valid = cols[0].notna().to_numpy()
            acc = valid.copy()
            for s in cols:
                p = s.fillna(0).to_numpy(dtype=np.int64)
                hit = (bitmap[p >> 3] >> (p & 7).astype(np.uint8)) & 1
                acc &= hit.astype(bool)
            yield pd.Series(acc)

    c = F.col(col) if isinstance(col, str) else col
    pos_cols = [
        F.when(
            c.isNotNull(),
            F.pmod(F.xxhash64(c, F.lit(i)), F.lit(int(num_bits))),
        )
        for i in range(int(num_hashes))
    ]
    return _probe(*pos_cols)
