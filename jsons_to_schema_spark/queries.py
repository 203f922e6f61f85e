"""Driver-contract query registry.

Each entry: name → callable(spark, sf_dir) → DataFrame, with (where the
semantics are SQL-expressible) a matching DuckDB oracle in ORACLES using
identical output column names/aliases.  Non-SQL-expressible operators
(schema unification, sketches, LSH) have no oracle → driver records a
rows-only check; their correctness lives in tests/ instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.infer import infer_as_dataframe, infer_from_json_column
from .sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Schema inference (flagship — not SQL-expressible, rows-only driver check;
# golden/property correctness in tests/test_infer_spark.py)
# ---------------------------------------------------------------------------

@query("schema_infer_events_props")
def schema_infer_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    schema, n = infer_from_json_column(events, "props")
    return infer_as_dataframe(spark, schema, n)
