"""Deterministic synthetic interleaved-docs table (FIXTURES.md §F1).

The canonical engine input (binding shape, BASELINE.json input_hint):

    documents_spans(doc_id: string,
                    spans: array<struct<kind:string, text:string,
                                        media_ref:string, offset:int>>)
    media_catalog(media_ref: string, media_kind: string, bytes: bigint)

Everything is a pure function of (seed, row index) so any size is
reproducible; violations are injected at known rates and their exact counts
recorded to expected_violations.json for test assertions.  Generation is
numpy-vectorized and written as parquet via pyarrow (8 files → 8 input splits
locally; an Iceberg table at scale).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CATALOG_SIZE = 10_000
N_FILES = 32  # >= max bench cores so local[32] scaling is not file-bound

VOCAB = np.array(
    [
        "the", "fast", "key", "order", "sort", "table", "scan", "merge",
        "part", "window", "small", "hash", "join", "batch", "stream",
        "spark", "dup", "shuffle", "broadcast", "skew", "salt", "plan",
        "codegen", "arrow", "schema", "unify", "span", "media", "image",
        "audio", "text", "token", "quantile", "sketch", "drift", "check",
        "null", "range", "enum", "type", "fold", "tree", "agg", "lattice",
        "doc", "ref", "offset", "kind", "valid", "verdict", "violation",
        "commit", "resume", "split", "lineage", "metric", "pass", "fail",
        "bound", "union", "intersect", "seal", "tuple", "items",
    ]
)  # 64 words

SPAN_KINDS = np.array(["text", "image", "audio", "table"])
KIND_P = np.array([0.70, 0.20, 0.07, 0.03])

SPANS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field(
            "spans",
            pa.list_(
                pa.struct(
                    [
                        pa.field("kind", pa.string()),
                        pa.field("text", pa.string()),
                        pa.field("media_ref", pa.string()),
                        pa.field("offset", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)


def generate_spans_corpus(n_docs: int, out_dir: str | Path, seed: int = SEED) -> dict:
    """Generate documents_spans + media_catalog + expected_violations.json.

    Idempotent: if out_dir already holds a manifest for (n_docs, seed), it is
    reused.  Returns the expected-violations dict.
    """
    out = Path(out_dir)
    manifest = out / "expected_violations.json"
    if manifest.exists():
        existing = json.loads(manifest.read_text())
        if (
            existing.get("n_docs") == n_docs
            and existing.get("seed") == seed
            and existing.get("n_files") == N_FILES
        ):
            return existing
    out.mkdir(parents=True, exist_ok=True)
    spans_dir = out / "documents_spans"
    if spans_dir.exists():
        for old in spans_dir.glob("part-*.parquet"):
            old.unlink()
    spans_dir.mkdir(exist_ok=True)

    rng = np.random.default_rng(seed)
    idx = np.arange(n_docs)
    hot = (idx % 100) == 0  # skew target: few doc_id prefixes, 4x spans

    n_spans = np.minimum(1 + rng.poisson(4, n_docs), 32)
    n_spans = np.where(hot, n_spans * 4, n_spans).astype(np.int64)
    doc_ids = np.where(
        hot,
        np.char.add("hot-", np.char.zfill(idx.astype(str), 12)),
        np.char.add("doc-", np.char.zfill(idx.astype(str), 12)),
    )

    total = int(n_spans.sum())
    doc_of_span = np.repeat(idx, n_spans)
    kinds = SPAN_KINDS[rng.choice(4, total, p=KIND_P)]

    # offsets: strictly increasing within doc via per-doc cumsum of gaps;
    # drift split — last 10% of docs draw gaps from a shifted distribution.
    drift_docs = doc_of_span >= int(0.9 * n_docs)
    gaps = 1 + np.where(drift_docs, rng.poisson(9, total), rng.poisson(3, total))
    cum = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(n_spans)))[:-1]
    base = np.repeat(cum[starts] - gaps[starts], n_spans)
    offsets = (cum - base).astype(np.int32)

    # text: 3-40 vocab words on text spans
    is_text = kinds == "text"
    n_text = int(is_text.sum())
    word_counts = rng.integers(3, 41, n_text)
    words = VOCAB[rng.integers(0, len(VOCAB), int(word_counts.sum()))]
    texts_flat = np.empty(n_text, dtype=object)
    pos = 0
    for i, wc in enumerate(word_counts):
        texts_flat[i] = " ".join(words[pos : pos + wc])
        pos += wc
    texts = np.full(total, None, dtype=object)
    texts[is_text] = texts_flat

    # media_ref: Zipf(1.2)-skewed over the catalog on non-text spans
    is_media = ~is_text
    n_media = int(is_media.sum())
    zipf_ids = (rng.zipf(1.2, n_media) - 1) % CATALOG_SIZE
    media = np.full(total, None, dtype=object)
    media[is_media] = np.char.add("m-", np.char.zfill(zipf_ids.astype(str), 8))

    # --- injected violations (exact counts recorded) -----------------------
    # dangling media_ref on 0.05% of media spans
    media_positions = np.flatnonzero(is_media)
    n_dangling = max(1, int(0.0005 * n_media)) if n_media else 0
    dang_pos = rng.choice(media_positions, n_dangling, replace=False)
    for j, p in enumerate(dang_pos):
        media[p] = f"m-99{j:06d}"

    # null text on 0.02% of text spans
    text_positions = np.flatnonzero(is_text)
    n_null_text = max(1, int(0.0002 * n_text)) if n_text else 0
    null_pos = rng.choice(text_positions, n_null_text, replace=False)
    texts[null_pos] = None

    # non-monotonic offsets in 0.02% of docs (swap first two spans)
    multi = np.flatnonzero(n_spans >= 2)
    n_nonmono = max(1, int(0.0002 * n_docs))
    nonmono_docs = rng.choice(multi, n_nonmono, replace=False)
    for d in nonmono_docs:
        s = starts[d]
        offsets[s], offsets[s + 1] = offsets[s + 1], offsets[s]

    # duplicate doc_ids: 0.1% of docs appended again
    n_dup = max(1, int(0.001 * n_docs))
    dup_docs = np.sort(rng.choice(idx, n_dup, replace=False))

    # --- assemble + write per-file slices -----------------------------------
    # Rows (original docs + duplicated docs) are shuffled at the INDEX level
    # and materialized one output file at a time: memory stays bounded per
    # file and no single Arrow array crosses the 2 GB chunk limit at any
    # corpus size.
    final_docs = np.concatenate([idx, dup_docs])  # row i -> original doc index
    perm = rng.permutation(len(final_docs))
    final_docs = final_docs[perm]
    n_rows_total = len(final_docs)
    chunk = -(-n_rows_total // N_FILES)

    def _gather_spans(doc_indices: np.ndarray) -> np.ndarray:
        counts = n_spans[doc_indices]
        base_pos = np.repeat(starts[doc_indices], counts)
        within = np.arange(int(counts.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)))[:-1], counts
        )
        return base_pos + within

    for f in range(N_FILES):
        rows = final_docs[f * chunk : (f + 1) * chunk]
        if len(rows) == 0:
            continue
        sp = _gather_spans(rows)
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds[sp], pa.string()),
                pa.array(texts[sp], pa.string()),
                pa.array(media[sp], pa.string()),
                pa.array(offsets[sp], pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        list_offsets = pa.array(
            np.concatenate(([0], np.cumsum(n_spans[rows]))), pa.int32()
        )
        spans_col = pa.ListArray.from_arrays(list_offsets, span_struct)
        part = pa.Table.from_arrays(
            [pa.array(doc_ids[rows], pa.string()), spans_col], schema=SPANS_SCHEMA
        )
        pq.write_table(part, out / "documents_spans" / f"part-{f:05d}.parquet")

    # media catalog (small dim — broadcastable)
    cat_ids = np.char.add("m-", np.char.zfill(np.arange(CATALOG_SIZE).astype(str), 8))
    cat_kind = SPAN_KINDS[1:][np.arange(CATALOG_SIZE) % 3]
    cat_bytes = (np.arange(CATALOG_SIZE, dtype=np.int64) * 977 + 1024) % 10_000_000
    pq.write_table(
        pa.table(
            {
                "media_ref": pa.array(cat_ids, pa.string()),
                "media_kind": pa.array(cat_kind, pa.string()),
                "bytes": pa.array(cat_bytes, pa.int64()),
            }
        ),
        out / "media_catalog.parquet",
    )

    # Expected counts computed over the FINAL row multiset (duplicated rows
    # copy their injected span-level violations, so pre-injection counters
    # would undercount): per-original-doc violation counts, summed over the
    # final doc-index multiset.
    ends = starts + n_spans
    is_dangling_span = np.zeros(total, dtype=bool)
    is_dangling_span[dang_pos] = True
    null_text_span = np.zeros(total, dtype=bool)
    null_text_span[null_pos] = True
    per_doc_dangling = np.add.reduceat(is_dangling_span.astype(np.int64), starts)
    per_doc_nulltext = np.add.reduceat(null_text_span.astype(np.int64), starts)
    nonmono_doc = np.zeros(n_docs, dtype=bool)
    nonmono_doc[nonmono_docs] = True
    expected = {
        "n_docs": n_docs,
        "seed": seed,
        "n_files": N_FILES,
        "n_rows": int(n_rows_total),
        "n_spans": int(n_spans[final_docs].sum()),
        "duplicate_doc_ids": int(n_dup),
        "dangling_media_ref_spans": int(per_doc_dangling[final_docs].sum()),
        "null_text_spans": int(per_doc_nulltext[final_docs].sum()),
        "non_monotonic_rows": int(nonmono_doc[final_docs].sum()),
        "drift_doc_threshold": int(0.9 * n_docs),
    }
    manifest.write_text(json.dumps(expected, indent=1, sort_keys=True))
    return expected


def corpus_dir(n_docs: int, base: str | Path = None) -> Path:
    base = Path(base) if base else Path(__file__).resolve().parents[2] / ".cache"
    return base / f"spans_n{n_docs}_seed{SEED}"


def ensure_corpus(n_docs: int, base: str | Path = None) -> Path:
    d = corpus_dir(n_docs, base)
    generate_spans_corpus(n_docs, d)
    return d
