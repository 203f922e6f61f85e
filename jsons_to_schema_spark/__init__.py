"""jsons_to_schema_spark — a PySpark-native schema-unification and
constraint-validation engine.

Public API mirrors the reference library (garetht/jsons-to-schema, upstream
``SchemaConverter.hs`` exports) 1:1 at the Python level, plus DataFrame-level
entry points for distributed execution:

Pure (no Spark; usable on the driver or in any Python process):
    json_to_schema, jsons_to_schema, schemas_to_schema, unify,
    SchemaGenerationConfig, canonical_json, validate

Distributed (DataFrame in, schema/verdicts out):
    infer_from_json_column, infer_from_struct, infer_grouped,
    validate_spans, validate_json_against_schema, column_stats,
    quantile_drift, checkpointed_validate
"""

from .schema_algebra import (  # noqa: F401
    DEFAULT_CONFIG,
    SchemaGenerationConfig,
    canonical_json,
    json_to_schema,
    jsons_to_schema,
    parse_schema,
    schema_diff,
    schemas_to_schema,
    unify,
    validate,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Spark-dependent entry points are lazy so the pure algebra stays
    # importable without a JVM.
    if name in (
        "infer_from_json_column",
        "infer_from_struct",
        "infer_grouped",
        "infer_as_dataframe",
    ):
        from .operators import infer

        return getattr(infer, name)
    if name in (
        "validate_spans",
        "validate_json_against_schema",
        "struct_conformance_flags",
        "struct_conformance_report",
    ):
        from .operators import validate as v

        return getattr(v, name)
    if name == "column_stats":
        from .operators.stats import column_stats

        return column_stats
    if name == "quantile_drift":
        from .operators.drift import quantile_drift

        return quantile_drift
    if name == "checkpointed_validate":
        from .checkpoint import checkpointed_validate

        return checkpointed_validate
    if name in ("duplicate_clusters", "assign_duplicate_clusters"):
        from .operators import dedup

        return getattr(dedup, name)
    if name in ("build_ivf_index", "ivf_topk_indexed"):
        from .operators import similarity

        return getattr(similarity, name)
    if name in ("curate_documents", "curation_report"):
        from .operators import curate

        return getattr(curate, name)
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
