"""Wave-43 operator tests: grouped exact quantiles (fully keyed) and the
next-fit-decreasing compaction planner."""

import math
import random

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.stats import grouped_exact_quantiles
from jsons_to_schema_spark.plans import audit
from jsons_to_schema_spark.sources.layout import compaction_plan


# ---------------------------------------------------------------------------
# grouped_exact_quantiles
# ---------------------------------------------------------------------------

def _gdf(spark, rows, parts=5):
    return spark.createDataFrame(rows, "g string, value double").repartition(parts)


def _brute(vals, p):
    s = sorted(vals)
    rank = max(math.ceil(p * len(s) - 1e-9), 1)
    return rank, s[rank - 1]


def test_grouped_quantiles_match_brute_force(spark):
    rng = random.Random(51)
    rows = [
        (f"g{i % 4}", rng.randrange(0, 20) / 20.0)
        for i in range(300)
    ]
    probs = [0.1, 0.5, 0.9]
    got = {
        (r["group"], r["prob"]): (r["n"], r["rank"], r["value"])
        for r in grouped_exact_quantiles(
            _gdf(spark, rows), "value", "g", probs, 0.0, 1.0, bins=32
        ).collect()
    }
    for g in (f"g{i}" for i in range(4)):
        vals = [v for gg, v in rows if gg == g]
        for p in probs:
            rank, v = _brute(vals, p)
            assert got[(g, p)] == (len(vals), rank, v), (g, p)


def test_grouped_quantiles_nulls_excluded_per_group(spark):
    rows = [("a", 0.1), ("a", None), ("a", 0.3), ("b", 0.5)]
    got = {
        (r["group"], r["prob"]): (r["n"], r["value"])
        for r in grouped_exact_quantiles(
            _gdf(spark, rows), "value", "g", [1.0], 0.0, 1.0, bins=4
        ).collect()
    }
    assert got[("a", 1.0)] == (2, 0.3)
    assert got[("b", 1.0)] == (1, 0.5)


def test_grouped_quantiles_no_single_partition_exchange(spark):
    """The grouped variant must be FULLY keyed: zero SinglePartition
    exchanges anywhere in the plan."""
    rows = [("a", 0.1), ("b", 0.9)]
    plan = audit.formatted_plan(
        grouped_exact_quantiles(_gdf(spark, rows), "value", "g", [0.5], 0.0, 1.0, bins=8)
    )
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_grouped_quantiles_partition_invariance(spark):
    rng = random.Random(9)
    rows = [(f"g{i % 3}", rng.random()) for i in range(120)]
    runs = []
    for parts in (1, 4, 9):
        runs.append(sorted(
            tuple(r)
            for r in grouped_exact_quantiles(
                _gdf(spark, rows, parts), "value", "g", [0.5, 0.95], 0.0, 1.0
            ).collect()
        ))
    assert runs[0] == runs[1] == runs[2]


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------

def _write_files(spark, tmp_path, sizes):
    """One parquet file per requested approximate payload row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "files"
    d.mkdir()
    for i, n in enumerate(sizes):
        t = pa.table({"x": list(range(n)), "s": ["pad" * 20] * n})
        pq.write_table(t, d / f"part-{i:03d}.parquet")
    return d


def test_compaction_plan_matches_manual_nfd(spark, tmp_path):
    import pyarrow.parquet as pq

    d = _write_files(spark, tmp_path, [10, 2000, 500, 50, 1200, 5])
    got = {
        r["file_name"]: (r["bytes"], r["bucket"])
        for r in compaction_plan(spark, d, target_bytes=40_000).collect()
    }
    # manual replay from the same footers
    files = []
    for p in sorted(d.glob("*.parquet")):
        md = pq.read_metadata(p)
        b = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        files.append((p.name, b))
    files.sort(key=lambda t: (-t[1], t[0]))
    cum = 0
    for name, b in files:
        assert got[name] == (b, cum // 40_000), name
        cum += b
    assert len(got) == 6


def test_compaction_plan_bucket_overshoot_bounded(spark, tmp_path):
    d = _write_files(spark, tmp_path, [800, 700, 600, 500, 400, 300, 200, 100])
    target = 30_000
    rows = compaction_plan(spark, d, target).collect()
    by_bucket = {}
    maxf = 0
    for r in rows:
        by_bucket.setdefault(r["bucket"], 0)
        by_bucket[r["bucket"]] += r["bytes"]
        maxf = max(maxf, r["bytes"])
    for b, tot in by_bucket.items():
        assert tot <= target + maxf, (b, tot)
    # buckets are contiguous 0..k
    assert sorted(by_bucket) == list(range(len(by_bucket)))


def test_compaction_plan_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        compaction_plan(spark, tmp_path, 0)
    with pytest.raises(ValueError):
        compaction_plan(spark, tmp_path / "nope", 1000)
