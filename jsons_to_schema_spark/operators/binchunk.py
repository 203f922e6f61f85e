"""Content-defined chunking (CDC) dedup for binary media payloads
(round-4 wave 45).

Interleaved text+media corpora carry the same media bytes re-encoded into
many containers (the same JPEG inside different MP4s, the same audio clip
re-muxed) — whole-payload hashing misses every one of them.  Storage-grade
dedup cuts payloads at CONTENT-DEFINED boundaries (a rolling hash hitting a
mask), so identical byte runs produce identical chunks at ANY byte offset —
the shift-invariance fixed-size blocking lacks, and the reason every dedup
store (rsync, LBFS, restic, ZFS fastdedup) uses CDC.

Determinism contract: the rolling hash is a fixed-window polynomial over a
pinned multiplier in uint64 wraparound arithmetic, boundaries then adjusted
by the standard (min_len, max_len) greedy pass — a pure function of the
bytes, identical on every engine/partitioning, so the driver oracle is a
pinned determinism-guarded snapshot (the LSH/BPE convention) and the
semantic claims (shift invariance, planted-duplicate detection) live in
pytest.

Scale shape: one mapInArrow pass — each Arrow batch yields its payloads'
chunk rows (vectorized numpy rolling hash via a sliding-window dot; the
only per-payload Python is the boundary walk over the few mask hits);
the dedup report is a chunk-hash groupBy — map-side combinable, keyed on
a hash output, no skew."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WINDOW = 16
_MULT = 0x9E3779B97F4A7C15  # pinned odd multiplier (golden-ratio constant)


def _chunk_payload(data: bytes, avg_bits: int, min_len: int, max_len: int):
    """Chunk one payload; returns [(offset, length, sha_hex)].  Pure."""
    import hashlib

    import numpy as np

    n = len(data)
    if n == 0:
        return []
    if n <= min_len:
        return [(0, n, hashlib.sha256(data).hexdigest())]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(_WINDOW, dtype=np.uint64)
        powers[_WINDOW - 1] = 1
        for i in range(_WINDOW - 2, -1, -1):
            powers[i] = powers[i + 1] * np.uint64(_MULT)
        if n >= _WINDOW:
            win = np.lib.stride_tricks.sliding_window_view(arr, _WINDOW)
            hashes = (win * powers).sum(axis=1, dtype=np.uint64)
        else:
            hashes = np.zeros(0, dtype=np.uint64)
    mask = np.uint64((1 << avg_bits) - 1)
    # boundary AFTER byte i+WINDOW-1 when the window hash hits the mask
    hits = (np.nonzero((hashes & mask) == 0)[0] + _WINDOW).tolist()

    out = []
    start = 0
    bi = 0
    while start < n:
        lo, hib = start + min_len, min(start + max_len, n)
        while bi < len(hits) and hits[bi] < lo:
            bi += 1  # boundaries inside the min-length zone are skipped
        if bi < len(hits) and hits[bi] <= hib:
            cut = hits[bi]
            bi += 1
        elif start + max_len < n:
            cut = start + max_len  # forced cut: no boundary before max
        else:
            cut = n  # tail chunk
        out.append(
            (start, cut - start, hashlib.sha256(data[start:cut]).hexdigest())
        )
        start = cut
    return out


def content_defined_chunks(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    avg_bits: int = 8,
    min_len: int = 64,
    max_len: int = 1024,
) -> DataFrame:
    """(id, chunk_idx, offset, length, chunk_sha) per content-defined
    chunk of every non-NULL payload.  avg_bits sets the expected chunk
    size (~2^avg_bits bytes before the min/max clamp)."""
    if not 1 <= avg_bits <= 32:
        raise ValueError(f"content_defined_chunks: avg_bits must be in [1,32], got {avg_bits}")
    if not 0 < min_len < max_len:
        raise ValueError(
            f"content_defined_chunks: need 0 < min_len < max_len, got {min_len}/{max_len}"
        )

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            ids, idxs, offs, lens, shas = [], [], [], [], []
            id_arr = b.column(0)
            pay = b.column(1)
            for r in range(b.num_rows):
                if not pay[r].is_valid:
                    continue
                data = pay[r].as_py()
                for ci, (off, ln, sha) in enumerate(
                    _chunk_payload(data, avg_bits, min_len, max_len)
                ):
                    ids.append(id_arr[r].as_py())
                    idxs.append(ci)
                    offs.append(off)
                    lens.append(ln)
                    shas.append(sha)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(idxs, pa.int32()),
                    pa.array(offs, pa.int64()),
                    pa.array(lens, pa.int64()),
                    pa.array(shas, pa.string()),
                ],
                names=["id", "chunk_idx", "offset", "length", "chunk_sha"],
            )

    base = df.select(
        F.col(id_col).cast("string").alias("_id"), F.col(payload_col).alias("_p")
    )
    return base.mapInArrow(
        gen,
        "id string, chunk_idx int, offset long, length long, chunk_sha string",
    )


def chunk_dedup_report(chunks: DataFrame) -> DataFrame:
    """Corpus-level CDC dedup report from a content_defined_chunks frame:
    (n_payloads, n_chunks, n_distinct_chunks, total_bytes, unique_bytes,
    dedup_ratio) — unique_bytes counts one representative per distinct
    chunk hash, dedup_ratio = 1 − unique/total.  One groupBy on the
    chunk hash (map-side combinable, hash-keyed — no skew) + one bounded
    aggregate."""
    per = chunks.groupBy("chunk_sha").agg(
        F.count(F.lit(1)).alias("_c"),
        F.first("length").alias("_len"),  # same sha => same bytes => same len
    )
    tot = chunks.agg(
        F.countDistinct("id").alias("n_payloads"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("length").alias("total_bytes"),
    )
    uniq = per.agg(
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum("_len").alias("unique_bytes"),
    )
    return (
        tot.crossJoin(F.broadcast(uniq))
        .select(
            F.col("n_payloads").cast("long"),
            F.col("n_chunks").cast("long"),
            F.col("n_distinct_chunks").cast("long"),
            F.col("total_bytes").cast("long"),
            F.col("unique_bytes").cast("long"),
            F.round(
                F.lit(1.0) - F.col("unique_bytes") / F.col("total_bytes"), 6
            ).alias("dedup_ratio"),
        )
    )
