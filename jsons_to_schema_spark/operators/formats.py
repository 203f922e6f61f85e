"""JSON-Schema Draft-4 ``format`` — inference, annotation, and validation.

ENGINE EXTENSION beyond the reference surface: the upstream unifier
(garetht/jsons-to-schema, SURVEY §2.1) never GENERATES the ``format``
keyword, so nothing here can disturb the bit-for-bit fixture parity of the
G/U layers — generation stays format-free, and the unification rule added
to the algebra (equal formats survive, unequal drop, absent absorbs) makes
``format`` invisible unless a user annotates it in.  Draft-4 §7 defines
format as an OPTIONAL assertion; this module implements the six interop
formats plus uuid as a discovery profile + opt-in validator.
(Sibling: ``stats.format_profile`` is the open-vocabulary deequ-style
match-count GRID with its own pattern list; this module is the Draft-4
KEYWORD — priority inference, schema annotation, unification rule, and
validator integration.)

Dialect contract (the PII-scrubber rule): every pattern is written in the
Java-regex ∩ RE2 ∩ Python-re common dialect — no lookaround, no
backreferences, explicit character classes, ``^…$`` anchored — so Spark
``rlike``, DuckDB ``regexp_matches``, and the pure-Python validator agree
byte-for-byte.  Patterns contain NO whitespace (oracle SQL is
whitespace-collapsed at registration).

Priority: when one value family satisfies several formats (every ipv4 is
also a syntactically valid hostname), the PROFILE reports every qualifying
format but marks only the highest-priority one inferred — specific beats
general, listed order below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: most specific first; iteration order IS the priority order
FORMAT_PATTERNS: "dict[str, str]" = {
    "uuid": (
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    ),
    "ipv4": (
        "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}"
        "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
    ),
    "date-time": (
        "^[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
        "[Tt]([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]([.][0-9]+)?"
        "([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])?$"
    ),
    "date": "^[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])$",
    "email": "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}$",
    "uri": "^[A-Za-z][A-Za-z0-9+.-]*://[^\\s]+$",
    "hostname": (
        "^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
        "([.][A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
    ),
}


def infer_formats(
    df: DataFrame,
    cols: "list[str]",
    threshold: float = 1.0,
    min_n: int = 1,
) -> DataFrame:
    """Format discovery over string columns — ONE corpus scan.

    All |cols| × |formats| match counts plus the per-column non-null
    counts are computed in a single multi-aggregate (JVM ``rlike``,
    whole-stage codegen, map-side partial — the stats-family shape), then
    the one-row result unpivots via ``stack`` into the report.  Nothing
    after the aggregate is data-sized.

    ``qualifies`` = n_nonnull ≥ min_n AND match_rate ≥ threshold (rate is
    round6 so the comparison is engine-stable); ``inferred`` marks the
    highest-priority qualifying format per column.  A column with zero
    non-null values qualifies for nothing (match_rate NULL).

    Output: (column, format, priority, n_nonnull, n_match, match_rate
    round6, qualifies, inferred) — |cols| × |formats| rows."""
    if not cols:
        raise ValueError("infer_formats: cols must be non-empty")
    if not 0.0 < threshold <= 1.0:
        raise ValueError("infer_formats: threshold must be in (0, 1]")
    if min_n < 1:
        raise ValueError("infer_formats: min_n must be >= 1")
    from pyspark.sql import Window

    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"_n_{i}"))
        for j, pat in enumerate(FORMAT_PATTERNS.values()):
            aggs.append(
                F.count(F.when(F.col(c).rlike(pat), 1)).alias(f"_m_{i}_{j}")
            )
    row = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        for j, fmt in enumerate(FORMAT_PATTERNS):
            stack_args += [f"'{c}'", f"'{fmt}'", str(j), f"_n_{i}", f"_m_{i}_{j}"]
    k = len(cols) * len(FORMAT_PATTERNS)
    long = row.select(
        F.expr(
            f"stack({k}, {', '.join(stack_args)}) AS "
            "(column, format, priority, n_nonnull, n_match)"
        )
    )
    rate = F.round(F.try_divide(F.col("n_match"), F.col("n_nonnull")), 6)
    qualifies = F.coalesce(
        (F.col("n_nonnull") >= F.lit(int(min_n)))
        & (rate >= F.lit(float(threshold))),
        F.lit(False),
    )
    w = Window.partitionBy("column")
    best = F.min(F.when(qualifies, F.col("priority"))).over(w)
    return long.select(
        "column",
        "format",
        "priority",
        "n_nonnull",
        "n_match",
        rate.alias("match_rate"),
        qualifies.alias("qualifies"),
        (qualifies & (F.col("priority") == best)).alias("inferred"),
    )


def format_violations(
    df: DataFrame, col: str, fmt: str, keep: "list[str] | None" = None
) -> DataFrame:
    """Violation rows for an annotated format: non-NULL values of ``col``
    that fail ``fmt``'s pattern (NULLs are absent, not invalid — Draft-4
    format applies to present string instances only).  One scan, filter
    pushed to it; output is violations-sized.

    Output: (*keep, column, format, value)."""
    if fmt not in FORMAT_PATTERNS:
        raise ValueError(
            f"format_violations: unknown format {fmt!r} "
            f"(known: {list(FORMAT_PATTERNS)})"
        )
    pat = FORMAT_PATTERNS[fmt]
    return df.filter(
        F.col(col).isNotNull() & ~F.col(col).rlike(pat)
    ).select(
        *(keep or []),
        F.lit(col).alias("column"),
        F.lit(fmt).alias("format"),
        F.col(col).alias("value"),
    )


def annotate_formats(schema: dict, assignments: "dict[str, str]") -> dict:
    """Insert ``format`` keywords into a generated schema at dotted
    property paths (e.g. ``{"user.email": "email"}``) — the bridge from a
    ``format_profile`` run to a validating schema.  Raises on unknown
    formats and on paths that don't resolve to an existing property
    subschema (annotating a phantom path would silently validate
    nothing).  Returns a new schema; the input is not mutated."""
    import copy

    out = copy.deepcopy(schema)
    for path, fmt in assignments.items():
        if fmt not in FORMAT_PATTERNS:
            raise ValueError(f"annotate_formats: unknown format {fmt!r}")
        node = out
        for part in path.split("."):
            props = node.get("properties")
            if not isinstance(props, dict) or part not in props:
                raise ValueError(
                    f"annotate_formats: path {path!r} has no property "
                    f"{part!r} in the schema"
                )
            node = props[part]
        node["format"] = fmt
    return out
