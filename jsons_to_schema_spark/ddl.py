"""Draft schema → Spark/Iceberg DDL — the enforcement bridge.

The engine INFERS a unified Draft-4 schema from documents (EP1/EP2) and
VALIDATES documents against it; this module closes the loop by emitting the
DDL that makes the lakehouse enforce the same contract on write:

* :func:`draft_to_spark_type` / :func:`draft_to_columns` — the Spark SQL
  type each draft subschema maps to (the inverse of the Spark-type →
  draft mapping in operators/infer.py);
* :func:`create_table_ddl` — CREATE TABLE with NOT NULL on required
  top-level columns (nested NOT NULL is not expressible in Spark column
  DDL — nested requiredness stays a validation-time check);
* :func:`evolution_ddl` — schema_diff(old, new) rendered as the Iceberg
  ALTER TABLE statements that evolve a table from the old snapshot's
  contract to the new one: ADD COLUMN for new properties (nested paths
  included — Iceberg supports ``ADD COLUMN parent.child``), ALTER COLUMN
  TYPE for legal widenings (int → bigint/double is the only draft-level
  widening that maps onto Iceberg's promotion rules), DROP NOT NULL for
  dropped requireds.  Changes with no DDL analog (enum growth, bounds,
  unsealing) come back as ``-- no DDL:`` comment lines so a review queue
  sees every change, expressible or not.

Everything here is pure (no Spark session) — DDL strings are data.
"""

from __future__ import annotations

from typing import Optional

from .schema_algebra import Schema, _type_set, schema_diff

_SCALAR = {
    "integer": "BIGINT",
    "number": "DOUBLE",
    "string": "STRING",
    "boolean": "BOOLEAN",
    "null": "STRING",  # a column that was always null: no evidence, widest
}


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def draft_to_spark_type(schema: Schema) -> str:
    """Spark SQL type string for a draft subschema.

    Type-set resolution: a single scalar maps directly; {integer, number}
    is DOUBLE (the engine's validator already treats integral doubles as
    integers, so nothing is lost); any type set containing "null" drops the
    null (nullability is column-level in Spark, not type-level); any OTHER
    mixed set degrades to STRING — the column stores canonical JSON text
    and the draft schema remains the contract (same convention the JSONL
    front-end uses for heterogeneous values)."""
    ts = set(_type_set(schema)) - {"null"}
    if not ts:
        return "STRING"
    if ts == {"object"}:
        props = schema.get("properties") or {}
        if not props:
            return "MAP<STRING,STRING>"
        fields = ", ".join(
            f"{_quote(k)}: {draft_to_spark_type(v)}" for k, v in sorted(props.items())
        )
        return f"STRUCT<{fields}>"
    if ts == {"array"}:
        items = schema.get("items")
        if isinstance(items, dict):
            return f"ARRAY<{draft_to_spark_type(items)}>"
        if isinstance(items, list):
            # tuple mode: one array type wide enough for every position
            from .schema_algebra import schemas_to_schema

            return f"ARRAY<{draft_to_spark_type(schemas_to_schema(items))}>"
        return "ARRAY<STRING>"
    if ts <= {"integer", "number"}:
        return "DOUBLE" if "number" in ts else "BIGINT"
    if len(ts) == 1:
        return _SCALAR[next(iter(ts))]
    return "STRING"


def draft_to_columns(schema: Schema) -> list[tuple[str, str, bool]]:
    """(name, spark_type, required) per top-level property of an object
    draft — the column list a CREATE TABLE needs."""
    if "object" not in _type_set(schema):
        raise ValueError("top-level draft must be an object schema")
    req = set(schema.get("required") or ())
    return [
        (k, draft_to_spark_type(v), k in req)
        for k, v in sorted((schema.get("properties") or {}).items())
    ]


def create_table_ddl(
    schema: Schema,
    table: str,
    using: str = "iceberg",
    partition_by: Optional[list[str]] = None,
) -> str:
    """CREATE TABLE enforcing the unified schema: inferred types + NOT NULL
    on required top-level columns."""
    cols = ",\n  ".join(
        f"{_quote(n)} {t}" + (" NOT NULL" if r else "")
        for n, t, r in draft_to_columns(schema)
    )
    ddl = f"CREATE TABLE {table} (\n  {cols}\n) USING {using}"
    if partition_by:
        ddl += " PARTITIONED BY (" + ", ".join(_quote(c) for c in partition_by) + ")"
    return ddl


def _col_path(diff_path: str) -> str:
    """schema_diff path ($.a.b / $.a[]) → Iceberg column path (a.b /
    a.element)."""
    p = diff_path.lstrip("$").lstrip(".")
    return p.replace("[]", ".element")


def evolution_ddl(old: Schema, new: Schema, table: str) -> list[str]:
    """ALTER TABLE statements evolving ``table`` from the old snapshot's
    contract to the new one (plus ``-- no DDL:`` review lines for changes
    DDL cannot express).  Statement order follows schema_diff's
    deterministic walk, so the output is stable and driver-oracle-able."""
    out: list[str] = []
    for ch in schema_diff(old, new):
        path = _col_path(ch["path"])
        kind = ch["change"]
        if kind == "new_property":
            from .schema_algebra import parse_schema

            sub = parse_schema(ch["to"])
            out.append(
                f"ALTER TABLE {table} ADD COLUMN {path} {draft_to_spark_type(sub)}"
            )
        elif kind == "type_widened":
            frm, to = set(ch["from"]), set(ch["to"])
            old_t = draft_to_spark_type({"type": sorted(frm)})
            new_t = draft_to_spark_type({"type": sorted(to)})
            if old_t == new_t:
                continue  # e.g. gained "null": nullability, not a type change
            if old_t == "BIGINT" and new_t == "DOUBLE":
                out.append(
                    f"ALTER TABLE {table} ALTER COLUMN {path} TYPE DOUBLE"
                )
            else:
                out.append(
                    f"-- no DDL: {path} type {sorted(frm)} -> {sorted(to)} "
                    f"({old_t} -> {new_t} is not an Iceberg promotion; "
                    f"backfill + new column required)"
                )
        elif kind == "required_dropped":
            for col in sorted(set(ch["from"]) - set(ch["to"])):
                prefix = f"{path}.{col}" if path else col
                out.append(
                    f"ALTER TABLE {table} ALTER COLUMN {prefix} DROP NOT NULL"
                )
        elif kind == "new_schema":
            out.append(f"-- no DDL: no previous snapshot for {table}; run "
                       f"create_table_ddl instead")
        else:  # bounds_widened / enum_grown / unsealed / items_widened
            out.append(
                f"-- no DDL: {path or '$'} {kind} "
                f"{ch.get('from')!r} -> {ch.get('to')!r} "
                f"(validation-time constraint only)"
            )
    return out
