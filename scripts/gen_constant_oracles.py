"""Regenerate jsons_to_schema_spark/oracle_constants.json — pinned oracle
rows for queries whose OUTPUT is deterministic at the driver's correctness
scale (sf0.01) but whose computation is not SQL-expressible (seeded-hash LSH
pipelines, persisted-index ANN).

These operators are pure functions of the input data: per-row xxhash64 /
seeded-hyperplane signatures plus exact verification — no partition-order or
sketch-merge dependence (unlike HLL, which is why HLL gets a bounded-error
oracle instead).  Each query is executed TWICE with freshly built plans and
must agree exactly, or generation aborts — the determinism guard.

The semantic correctness of the pinned values is NOT established here; it is
established by the planted-duplicate / recall / ground-truth tests in
tests/test_operators.py.  The pinned oracle turns that verified-deterministic
output into a driver-visible value check.

Usage:  python scripts/gen_constant_oracles.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import types as T  # noqa: E402

from jsons_to_schema_spark.queries import QUERIES  # noqa: E402
from jsons_to_schema_spark.session import get_spark  # noqa: E402

NAMES = [
    "bpe_vocab_documents",
    "compression_ratio_documents",
    "dedup_incremental_minhash",
    "dedup_minhash_documents",
    "dedup_semantic_embeddings",
    "dedup_simhash_documents",
    "similarity_lsh_topk_embeddings",
    "similarity_ivf_topk_embeddings",
    "similarity_ivf_q8_topk_embeddings",
    "similarity_ivf_pq_topk_embeddings",
    "drift_events_value_tdigest",
    "schema_infer_spans_tuple_mode",
    "media_chunk_dedup",
    "similarity_recall_report",
    "msf_spans_media",
    "isotonic_calibration_events",
]

_DUCK_TYPE = {
    T.LongType: "BIGINT",
    T.IntegerType: "INT",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "DOUBLE",
    T.StringType: "VARCHAR",
    T.BooleanType: "BOOLEAN",
}


def snapshot(spark, name: str, sf_dir: str) -> dict:
    fn = QUERIES[name]
    rows1 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    df2 = fn(spark, sf_dir)  # fresh plan — no reused shuffle stages
    rows2 = sorted(tuple(r) for r in df2.collect())
    if rows1 != rows2:
        raise SystemExit(
            f"{name}: output is NOT deterministic across runs — refusing to pin"
        )
    if not rows1:
        raise SystemExit(f"{name}: empty output — refusing to pin")
    cols = [
        (f.name, _DUCK_TYPE[type(f.dataType)]) for f in df2.schema.fields
    ]
    return {"columns": cols, "rows": [list(r) for r in rows1]}


def main() -> None:
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = positional[0] if positional else "/root/testdata/sf0.01"
    spark = get_spark()
    path = (
        Path(__file__).resolve().parents[1]
        / "jsons_to_schema_spark"
        / "oracle_constants.json"
    )
    only = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            only = arg[len("--only="):].split(",")
    if only:
        # merge mode: re-pin just the named queries (each still runs the
        # double-run determinism guard), leave every other pin untouched
        unknown = sorted(set(only) - set(NAMES))
        if unknown:
            raise SystemExit(f"--only names not in NAMES: {unknown}")
        out = json.loads(path.read_text()) if path.exists() else {}
        out.update({name: snapshot(spark, name, sf_dir) for name in only})
    else:
        out = {name: snapshot(spark, name, sf_dir) for name in NAMES}
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {path} ({sum(len(v['rows']) for v in out.values())} rows)")


if __name__ == "__main__":
    main()
