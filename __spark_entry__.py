"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run: unified-schema inference over the sf0.001
``events.props`` JSON column (the reference's ``jsonsToSchema`` re-expressed
as mapInArrow + treeAggregate).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, DuckDB-oracled at sf0.01 where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jsons_to_schema_spark.operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
)
from jsons_to_schema_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    schema, n = infer_from_json_column(events, "props")
    return infer_as_dataframe(spark, schema, n)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jsons_to_schema_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from jsons_to_schema_spark.queries import resolve_oracles

    return resolve_oracles()
