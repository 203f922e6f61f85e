#!/usr/bin/env python
"""Iceberg integration exercise (run under its own JVM because jars must be
set before SparkSession start):

    python scripts/iceberg_integration.py <iceberg_jar> <warehouse_dir>

1. checkpointed_validate over the spans corpus with IcebergStateStore
   (MERGE INTO commits), killed after 3 splits then resumed — must compute
   exactly the missing splits and match the parquet-store run bit-for-bit;
2. violations written as a check-partitioned Iceberg table and read back.

Exit 0 = every assertion held.  tests/test_iceberg.py invokes this in a
subprocess when find_iceberg_jar() locates a runtime jar, and skips
otherwise (offline container).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jsons_to_schema_spark.checkpoint import checkpointed_validate  # noqa: E402
from jsons_to_schema_spark.operators import validate  # noqa: E402
from jsons_to_schema_spark.schema_algebra import canonical_json  # noqa: E402
from jsons_to_schema_spark.sources.iceberg import (  # noqa: E402
    IcebergStateStore,
    iceberg_session_builder,
    write_partitioned_violations,
)
from jsons_to_schema_spark.sources.spans import ensure_corpus  # noqa: E402
from jsons_to_schema_spark.sources.tables import load_spans  # noqa: E402


def main(jar: str, warehouse: str) -> None:
    spark = (
        iceberg_session_builder(warehouse, jar)
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    corpus = ensure_corpus(5000)
    data = str(corpus / "documents_spans")

    # --- resumable validation through the Iceberg MERGE store --------------
    store = IcebergStateStore(spark)
    r1 = checkpointed_validate(spark, data, warehouse, max_splits=3, store=store)
    assert r1["splits_computed_this_run"] == 3, r1
    r2 = checkpointed_validate(spark, data, warehouse, store=store)
    assert r2["splits_computed_this_run"] == r1["splits_total"] - 3, r2
    r3 = checkpointed_validate(spark, data, warehouse, store=store)
    assert r3["splits_computed_this_run"] == 0, r3

    # bit-for-bit equal to the parquet-store engine run
    ref = checkpointed_validate(spark, data, Path(warehouse) / "_pq_state")
    assert canonical_json(r3["schema"]) == canonical_json(ref["schema"])
    assert r3["n_rows"] == ref["n_rows"] and r3["fails"] == ref["fails"]

    # state table is queryable SQL like any lineage table
    n_state = spark.sql("SELECT count(*) c FROM local.db.split_state").first()["c"]
    assert n_state == r1["splits_total"], n_state

    # --- shared store contract (r4, VERDICT item 7): the SAME assertions
    # tests/test_checkpoint.py::test_state_store_df_contract makes of the
    # parquet store, against the Iceberg MERGE INTO implementation --------
    contract = IcebergStateStore(spark, table="local.db.contract_state")
    df1 = spark.createDataFrame(
        [("a", "{}", 1)], "split string, draft string, n_rows long"
    )
    contract.merge_df(df1)
    assert [r["split"] for r in contract.committed_df().collect()] == ["a"]
    contract.merge(
        [{"split": "a", "draft": "{}", "n_rows": 2},
         {"split": "b", "draft": "{}", "n_rows": 3}]
    )
    got = contract.committed()
    assert got["a"]["n_rows"] == 2 and got["b"]["n_rows"] == 3
    contract.merge_df(
        spark.createDataFrame([("c", "{}", 4)], "split string, draft string, n_rows long")
    )
    assert set(contract.committed()) == {"a", "b", "c"}
    # retention: three merges above = three snapshots; expire to the last 2
    # and the table must still read identically (r4 expire_snapshots seam)
    contract.expire_snapshots(keep_last=2)
    assert set(contract.committed()) == {"a", "b", "c"}
    snaps = spark.sql(
        "SELECT count(*) AS n FROM local.db.contract_state.snapshots"
    ).first()["n"]
    assert snaps <= 2, snaps

    # --- check-partitioned violations sink ---------------------------------
    df = load_spans(spark, corpus)
    v = validate.row_violations(validate.with_check_flags(df), cap_per_check=100)
    write_partitioned_violations(v)
    back = spark.table("local.db.violations")
    assert back.count() == v.count()
    parts = {r["check"] for r in back.select("check").distinct().collect()}
    assert parts and parts <= set(validate.ROW_CHECKS) | {"duplicate_doc_id"}
    print("ICEBERG_INTEGRATION_OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
