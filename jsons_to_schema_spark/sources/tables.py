"""Table loading — Parquet locally, Iceberg-ready at scale.

Single seam between the engine and storage.  Locally the driver testdata is
plain parquet; on a cluster the same call sites read Iceberg
(``spark.read.format("iceberg").load(...)``) — the engine never hard-codes a
format at operator level, so partition pruning / snapshot reads come along
for free when the Iceberg runtime jar is on the classpath.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table.  format auto-detected: a path ending .parquet
    (or a directory of parquet files) reads parquet; an identifier containing
    a catalog dot reads a (Iceberg) catalog table."""
    # catalog route ONLY for identifier-shaped strings (no path separator):
    # a missing local path like /root/testdata/sf0.1 contains a dot and used
    # to be rerouted into a bogus catalog lookup, burying the real
    # path-not-found error under a confusing TABLE_OR_VIEW_NOT_FOUND (r3)
    if (
        "://" not in sf_dir
        and os.sep not in sf_dir
        and "." in sf_dir
        and not Path(sf_dir).exists()
    ):
        return spark.read.table(f"{sf_dir}.{name}")
    p = Path(sf_dir) / f"{name}.parquet"
    if not p.exists():
        p = Path(sf_dir) / name  # directory-style dataset
    return spark.read.parquet(str(p))


def load_spans(spark: SparkSession, corpus: str | Path) -> DataFrame:
    return spark.read.parquet(str(Path(corpus) / "documents_spans"))


def load_media_catalog(spark: SparkSession, corpus: str | Path) -> DataFrame:
    return spark.read.parquet(str(Path(corpus) / "media_catalog.parquet"))
