"""Per-column statistics — ONE multi-aggregate pass (north_star requirement).

min / max / null-count / row-count / distinct (exact or HyperLogLog sketch)
for any set of columns are computed in a single ``agg`` over a single scan:
Catalyst plans partial (map-side) + final aggregation, so the shuffle carries
one partial row per partition regardless of table size, and whole-stage
codegen keeps the hot loop JVM-side.  This is the engine-side generalization
of the reference's U6 range union / U3 required tracking (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    distinct: str | None = None,  # None | "exact" | "approx" | "hll"
) -> DataFrame:
    """One-row wide stats frame: n_rows + per-column min_/max_/nulls_
    (+ distinct_).  ``approx`` uses HLL++ (mergeable, constant memory);
    ``hll`` uses sketch-agg producing a reusable binary sketch column;
    ``exact`` is oracle-friendly but shuffles per-column hash sets.
    """
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"nulls_{c}"))
        if distinct == "exact":
            aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(c).alias(f"distinct_{c}"))
        elif distinct == "hll":
            aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.agg(*aggs)


def group_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped min/max/count/nulls — same single-pass shape, keyed."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.sum(F.isnull(value_col).cast("long")).alias(f"nulls_{value_col}"),
    )


def merge_column_stats(
    parts: DataFrame, columns: "list[str]", distinct: "str | None" = None
) -> DataFrame:
    """Fold a frame of ``column_stats`` rows (one per batch / split /
    snapshot) into the stats of their union WITHOUT rescanning any data —
    the mergeable-accumulator law that makes profiling incremental at
    10^12 docs: stats(A ∪ B) = merge(stats(A), stats(B)).  Exact for
    n_rows (sum), min/max (min-of-mins / max-of-maxes; an all-NULL batch
    contributes nothing, matching the global semantics), and null counts
    (sum).  ``distinct='hll'`` folds sketch columns via hll_union_agg
    (estimates merge; exact distinct counts are NOT mergeable without the
    sketch).  The fold input is batches-sized — never data-sized."""
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(F.min(f"min_{c}").alias(f"min_{c}"))
        aggs.append(F.max(f"max_{c}").alias(f"max_{c}"))
        aggs.append(F.sum(f"nulls_{c}").cast("long").alias(f"nulls_{c}"))
        if distinct == "hll":
            aggs.append(
                F.hll_sketch_estimate(F.hll_union_agg(f"hll_{c}")).alias(
                    f"distinct_{c}"
                )
            )
    return parts.agg(*aggs)


def hll_merge(sketch_df: DataFrame, cols: list[str]) -> DataFrame:
    """Merge HLL sketch columns from independent stats passes (e.g. one per
    Iceberg snapshot) — the mergeability that makes distinct counts
    incremental at 10^12 docs."""
    return sketch_df.agg(
        *[
            F.hll_sketch_estimate(F.hll_union_agg(c)).alias(f"distinct_{c}")
            for c in cols
        ]
    )


def split_anomalies(
    metrics: DataFrame,
    key_col: str,
    metric_cols: list[str],
    z_threshold: float = 3.0,
) -> DataFrame:
    """Outlier DATA FILES: z-score each split's metrics against the corpus
    of splits — "which of my million input files look broken" (short rows →
    truncated write, fail-rate spike → upstream bug, span-count collapse →
    extractor regression).

    Input is any per-split metric table with INTEGER metric columns
    (split_verdicts, the checkpoint lineage table, a stats groupBy);
    metric_cols must be integral because the z arithmetic is built from
    EXACT integer sums — sum(x) and sum(x*x) are exact longs regardless of
    aggregation order, then ONE fixed double expression (mean = s/n, var =
    (s2 - s·s/n)/(n-1), z = (x-mean)/sqrt(var), round 6) evaluates
    bit-identically on any engine/partitioning — which is what makes an
    anomaly verdict over 10^6 files SQL-oracle-able and run-stable.  (A
    naive stddev_samp-based z is NOT: Spark's Welford-style accumulator and
    DuckDB's differ in low bits and both vary with partition order.)

    Plan shape: one partial+final aggregate over the (already tiny) metric
    table → a single global-stats row → broadcast-joined back (1-row cross
    join, same pattern as drift.py); flags in one projection.  Nothing here
    scales with DATA size, only with split count.
    """
    if not metric_cols:
        raise ValueError("metric_cols must be non-empty")
    # the metric table is reused (global fold + broadcast-back join); its
    # LINEAGE may be a corpus-sized aggregation (split_verdicts), which
    # would run twice without the pin (r4 double-scan sweep) — the pinned
    # table itself is split-count-sized by this operator's contract
    metrics = metrics.localCheckpoint(eager=False)
    g_aggs = [F.count(F.lit(1)).alias("_n")]
    for c in metric_cols:
        g_aggs.append(F.sum(F.col(c).cast("long")).alias(f"_s_{c}"))
        g_aggs.append(
            F.sum((F.col(c).cast("long") * F.col(c).cast("long"))).alias(f"_s2_{c}")
        )
    glob = metrics.agg(*g_aggs)
    joined = metrics.crossJoin(F.broadcast(glob))
    out_cols = [F.col(key_col)] + [F.col(c) for c in metric_cols]
    flag = F.lit(False)
    for c in metric_cols:
        n = F.col("_n").cast("double")
        s = F.col(f"_s_{c}").cast("double")
        s2 = F.col(f"_s2_{c}").cast("double")
        mean = s / n
        var = (s2 - s * s / n) / (n - F.lit(1.0))
        z = F.when(
            (F.col("_n") > 1) & (var > 0),
            F.round((F.col(c).cast("double") - mean) / F.sqrt(var), 6),
        ).otherwise(F.lit(0.0))
        out_cols.append(z.alias(f"z_{c}"))
        flag = flag | (F.abs(z) > F.lit(z_threshold))
    out_cols.append(flag.alias("anomalous"))
    return joined.select(*out_cols)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/grouping-key skew diagnostics: the top-k hottest keys with their
    row share, plus the corpus-level context (total rows, distinct keys,
    max share) on every row — the report a planner reads before choosing
    salting / AQE skew-join thresholds for a key at 10^12-row scale.

    Two aggregates, both map-side-partial: groupBy(key).count() (the same
    shuffle a real join on this key would pay — the report costs what one
    pre-pass of the join costs), then a 1-row global over the (distinct
    keys)-sized count table, broadcast back (drift.py pattern).  top-k via
    orderBy(cnt desc, key).limit(k) — TakeOrderedAndProject, i.e. per-task
    partial top-k merged on the driver, NEVER a global row_number window
    (a single-partition sort of the whole count table at high key
    cardinality); the key tie-break makes the report deterministic and
    oracle-able.  Shares are round(x, 6) doubles from exact longs."""
    # counts feeds BOTH the global fold and the top-k with divergent
    # projections — without the pin the corpus-sized groupBy ran twice
    # (measured; r4 double-scan sweep).  Pinned size = distinct keys, the
    # same table this operator exists to shuffle.
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=False)
    glob = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
        F.max("cnt").alias("_max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_k)
    return (
        top.crossJoin(F.broadcast(glob))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.col("_total").alias("total_rows"),
            F.col("_distinct").alias("distinct_keys"),
            F.round(F.col("_max_cnt") / F.col("_total"), 6).alias("max_share"),
            (
                F.col("_max_cnt")
                > F.lit(8.0) * F.col("_total") / F.col("_distinct")
            ).alias("skewed"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
    )


def dead_column_report(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-hygiene verdicts: per column, is it DEAD (all null) or
    CONSTANT (one non-null value, no nulls — a column that stores nothing)?
    At 100 TB a dead column still costs scan metadata, schema surface, and
    writer CPU on every job; this report is how a table owner finds them.

    ONE multi-aggregate scan (count + per-column null count / min / max —
    the column_stats shape), then the wide row pivots to per-column verdict
    rows via an array-of-structs inline — no second scan, no shuffle beyond
    the aggregate's single row.  min/max comparison is on CASTed strings so
    one report covers heterogeneous column types (the verdict only needs
    equality, not order)."""
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_nulls_{c}"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    def _bq(n: str) -> "F.Column":  # column names may contain dots
        return F.col("`" + n.replace("`", "``") + "`")

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                _bq(f"_nulls_{c}").alias("n_nulls"),
                (_bq(f"_nulls_{c}") == F.col("_n")).alias("dead"),
                (
                    (_bq(f"_nulls_{c}") == 0)
                    & (_bq(f"_min_{c}") == _bq(f"_max_{c}"))
                ).alias("constant"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


def column_histogram(
    df: DataFrame, column: str, lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """Equi-width histogram over [lo, hi] — the deequ-style distribution
    profile: one map-side-partial groupBy on the computed bucket id
    (≤ n_buckets groups, so the shuffle is bounded by the bucket count,
    never the data), then a broadcast join against a tiny bucket spine so
    EMPTY buckets still appear.  Values outside [lo, hi] and NULLs are
    excluded; col == hi lands in the last bucket (width_bucket
    convention).  Both engines evaluate the identical double expression
    floor((x - lo) / w), so the oracle comparison is exact."""
    if n_buckets <= 0 or not hi > lo:
        raise ValueError("column_histogram: need n_buckets > 0 and hi > lo")
    w = (hi - lo) / n_buckets
    c = F.col(column)
    bucket = F.least(
        F.floor((c - F.lit(float(lo))) / F.lit(w)).cast("long"),
        F.lit(n_buckets - 1),
    )
    counts = (
        df.filter(c.isNotNull() & (c >= float(lo)) & (c <= float(hi)))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = df.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        spine.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(w)).alias("bucket_lo"),
            (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w)).alias("bucket_hi"),
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        )
    )


def top_values(df: DataFrame, column: str, k: int) -> DataFrame:
    """Top-k most frequent values (cast to string) plus an OTHER rollup —
    the categorical companion profile.  Two-stage top-k: a per-partition
    row_number prefilter caps the global ordering's input at k × partitions
    (the same WindowGroupLimit shape as rule_violation_rows), so a
    high-cardinality column never funnels its full distinct set through
    one reducer.  Ties break on value ascending for determinism; NULLs
    are excluded (profile them with null-rate stats)."""
    from pyspark.sql import Window

    # counts feeds the two-stage rank AND the two total folds — pin it so
    # the corpus aggregates once (measured 3 scans without; r4 sweep).
    counts = (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    staged = counts.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy("_pid").orderBy(F.desc("n_rows"), F.asc("value"))
    w2 = Window.orderBy(F.desc("n_rows"), F.asc("value"))
    ranked = (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
    top = ranked.select("value", "n_rows", F.lit(False).alias("is_other"))
    totals = counts.agg(F.sum("n_rows").alias("_total")).crossJoin(
        ranked.agg(F.sum("n_rows").alias("_topsum"))
    )
    other = (
        totals.select(
            F.lit("OTHER").alias("value"),
            (F.col("_total") - F.coalesce(F.col("_topsum"), F.lit(0))).alias(
                "n_rows"
            ),
            F.lit(True).alias("is_other"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return top.unionByName(other)


def correlation_pairs(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols`` in ONE
    multi-aggregate pass (map-side co-moment partials — n·(n−1)/2
    aggregate expressions, never n² scans).  Values rounded to 6 decimals
    so the cross-engine comparison is summation-order-independent; NULLs
    are pairwise-excluded by corr's definition in both engines."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if not pairs:
        raise ValueError("correlation_pairs: need at least two columns")

    def _bq(n: str) -> "F.Column":
        return F.col("`" + n.replace("`", "``") + "`")

    # backtick-quote the corr INPUTS too (a literal dot in a column name
    # must not resolve as a nested-field path) and alias positionally so
    # no name-mangling scheme can collide (r4 review)
    wide = df.agg(
        *[F.corr(_bq(a), _bq(b)).alias(f"_corr_{i}") for i, (a, b) in enumerate(pairs)]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(F.col(f"_corr_{i}"), 6).alias("corr"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


def column_entropy(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Shannon entropy (base 2 — the DuckDB/deequ convention) of each
    column's non-null value distribution: one (column, entropy) row per
    input column, and ONE scan of the data for all columns (r4 review:
    the first version unioned one scan branch per column): the columns
    melt via explode(array(struct(name, value-as-string))) into a single
    (column, value) count — map-side partials, shuffle sized by the
    summed cardinalities, not rows — then fold per column via
    H = log2(n) − (Σ c·log2 c)/n, algebraically −Σ p·log2 p without
    joining the total back.  Casting to string before counting is
    entropy-preserving (distinct in ↔ distinct out).  A broadcast column
    spine keeps all-null columns in the output at entropy 0.  round(6)
    keeps the cross-engine comparison summation-order-independent."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.*")
    folded = (
        melted.filter(F.col("_v").isNotNull())
        .groupBy("column", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("column")
        .agg(
            F.round(
                F.log2(F.sum("_c"))
                - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c"),
                6,
            ).alias("entropy")
        )
    )
    spine = df.sparkSession.createDataFrame([(c,) for c in cols], "column string")
    return spine.join(F.broadcast(folded), "column", "left").select(
        "column", F.coalesce("entropy", F.lit(0.0)).alias("entropy")
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (base 2) between two bounded-cardinality columns
    via MI = H(a) + H(b) − H(a,b): ONE groupBy over the pair produces the
    joint count table (shuffle sized by the joint cardinality), both
    marginals re-aggregate that bounded table — the raw data is scanned
    once.  Rows where either side is NULL are excluded from all three
    terms so the marginals stay consistent with the joint.  Only sensible
    for columns whose cardinality product is bounded (categories, ids
    with known domains) — the joint table is the scale knob."""
    # the joint table is reused three times (H(a,b) + both marginals) with
    # DIVERGENT projections, so exchange reuse never fires and the raw data
    # scanned three times (measured; r4 double-scan sweep) — pin the bounded
    # joint so "the raw data is scanned once" is true by construction
    joint = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )

    def _h(counts: DataFrame) -> DataFrame:
        return counts.agg(
            (
                F.log2(F.sum("_c"))
                - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
            ).alias("_h")
        )

    hab = _h(joint).withColumnRenamed("_h", "_hab")
    ha = _h(joint.groupBy("_a").agg(F.sum("_c").alias("_c"))).withColumnRenamed(
        "_h", "_ha"
    )
    hb = _h(joint.groupBy("_b").agg(F.sum("_c").alias("_c"))).withColumnRenamed(
        "_h", "_hb"
    )
    return (
        ha.crossJoin(hb)
        .crossJoin(hab)
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            F.round(F.col("_ha") + F.col("_hb") - F.col("_hab"), 6).alias("mi"),
        )
    )


def candidate_keys(df: DataFrame, columns: "list[str] | None" = None) -> DataFrame:
    """Single-column key discovery in ONE multi-aggregate scan: a column is
    a candidate key when it is fully populated and its exact distinct count
    equals the row count.  Output one row per column —
    (column, n_rows, n_distinct, n_nulls, is_key) — melted from the single
    wide aggregate row with a ``stack`` projection, so the table is scanned
    once no matter how many candidates are profiled.

    Exact countDistinct (not HLL) on purpose: key discovery is a
    yes/no structural fact, and a sketch's ±2% error would both miss real
    keys and certify false ones.  Each exact distinct is a partial
    hash-dedup per partition before the shuffle, so the shuffled data is
    the distinct values, not the rows."""
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_nulls_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', _dist_{c}, _nulls_{c}" for c in columns)
    return wide.select(
        "_n",
        F.expr(f"stack({len(columns)}, {stack}) AS (column, n_distinct, n_nulls)"),
    ).select(
        "column",
        F.col("_n").alias("n_rows"),
        "n_distinct",
        "n_nulls",
        # n > 0: an empty table certifies nothing — without the guard every
        # column of a zero-row scan would come back vacuously "key"
        (
            (F.col("_n") > 0)
            & (F.col("n_distinct") == F.col("_n"))
            & (F.col("n_nulls") == 0)
        ).alias("is_key"),
    )


def functional_dependency(
    df: DataFrame, determinant: "list[str]", dependent: str
) -> DataFrame:
    """Does ``determinant -> dependent`` hold?  One grouped scan: group on
    the determinant, count distinct dependent values per group, then fold
    the bounded group table into a single verdict row —
    (determinant, dependent, n_groups, violating_groups, holds).

    A group violates the FD when it contains >1 distinct dependent value
    (NULLs count as a value: two rows (a, NULL) and (a, x) disagree about
    what ``a`` determines, which is exactly the data bug FD checks exist
    to catch).  NULL participation is counted as countDistinct (non-null)
    plus a has-null flag — no string sentinel, so no value can collide
    with the NULL marker.  The shuffle is keyed on the determinant — the
    same key a downstream dedup or join would use, so skew handling (AQE)
    transfers."""
    per_group = df.groupBy(*[F.col(c) for c in determinant]).agg(
        (
            F.countDistinct(dependent)
            + F.max(F.isnull(dependent).cast("long"))
        ).alias("_ndep")
    )
    return per_group.agg(
        F.lit(",".join(determinant)).alias("determinant"),
        F.lit(dependent).alias("dependent"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("_ndep") > 1).cast("long")).alias("violating_groups"),
        (F.sum((F.col("_ndep") > 1).cast("long")) == 0).alias("holds"),
    )


# Datatype-consistency patterns: the Java-and-RE2 dialect intersection (same
# convention as text.py's PII patterns) so Spark rlike and the DuckDB
# oracle's regexp_matches agree byte-for-byte.  Anchored full-match on
# both sides.
_DT_BOOL = "^(true|false|TRUE|FALSE|True|False)$"
_DT_INT = "^[+-]?[0-9]+$"
_DT_FRAC = "^[+-]?([0-9]+[.][0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?$"


def datatype_profile(df: DataFrame, columns: "list[str]") -> DataFrame:
    """String-column datatype consistency (deequ's dataType analyzer): how
    many values parse as boolean / integral / fractional / other, and the
    most specific type that covers every non-null value — Boolean and
    Integral-within-Fractional specialize String.

    One multi-aggregate scan classifies all columns at once (each value
    matches three anchored regexes JVM-side inside whole-stage codegen);
    the verdict fold runs on the one-row aggregate output.  The analyzer
    is how a pipeline notices that an upstream export started writing
    "1,234.5" into a column that used to be clean integers."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        s = F.col(c)
        aggs.append(F.sum(F.isnull(s).cast("long")).alias(f"_null_{c}"))
        aggs.append(F.sum(s.rlike(_DT_BOOL).cast("long")).alias(f"_bool_{c}"))
        aggs.append(F.sum(s.rlike(_DT_INT).cast("long")).alias(f"_int_{c}"))
        aggs.append(F.sum(s.rlike(_DT_FRAC).cast("long")).alias(f"_frac_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _null_{c}, _bool_{c}, _int_{c}, _frac_{c}" for c in columns
    )
    melted = wide.select(
        "_n",
        F.expr(
            f"stack({len(columns)}, {stack})"
            " AS (column, n_null, n_boolean, n_integral, n_fractional)"
        ),
    )
    non_null = F.col("_n") - F.col("n_null")
    inferred = (
        F.when(non_null == 0, F.lit("Unknown"))
        .when(F.col("n_boolean") == non_null, F.lit("Boolean"))
        .when(F.col("n_integral") == non_null, F.lit("Integral"))
        .when(
            F.col("n_integral") + F.col("n_fractional") == non_null,
            F.lit("Fractional"),
        )
        .otherwise(F.lit("String"))
    )
    return melted.select(
        "column",
        F.col("_n").alias("n_rows"),
        "n_null",
        "n_boolean",
        "n_integral",
        "n_fractional",
        (
            non_null
            - F.col("n_boolean")
            - F.col("n_integral")
            - F.col("n_fractional")
        ).alias("n_other"),
        inferred.alias("inferred_type"),
    )


# Shape-mask character classes — ASCII-only on purpose: Java regex (Spark
# rlike/regexp_replace) and RE2 (the DuckDB oracle) agree byte-for-byte on
# ASCII ranges; non-ASCII characters pass through verbatim on both engines.
_MASK_CLASSES = (("[A-Z]", "A"), ("[a-z]", "a"), ("[0-9]", "9"))


def pattern_profile(
    df: DataFrame, columns: "list[str]", top_k: int = 5
) -> DataFrame:
    """Shape-mask pattern profile of string columns — the format-discovery
    analyzer (deequ/profilers' "patterns" output) that datatype_profile's
    type classifier cannot see: '12-345 Ab' → '99-999 Aa' (uppercase→A,
    lowercase→a, digit→9, everything else verbatim), then the top_k masks
    per column with their coverage.  This is how a pipeline notices an
    upstream export switching phone formats or padding keys.

    ONE scan and ONE data-sized shuffle: the columns melt via a ``stack``
    projection, the mask is a JVM regexp_replace chain inside whole-stage
    codegen, and the (column, mask) grouped count is map-side partial — the
    shuffle is bounded by the summed DISTINCT-MASK cardinalities (masks
    collapse values: every 'Customer#000000042' is one mask), not by rows.
    Rank and coverage are windows over that bounded mask table.  Ties
    break deterministically by (n desc, mask asc).

    NULLs are excluded from masks (share = n / column non-null count,
    round(6)); an all-NULL column still reports one row (rank/mask/share
    NULL, n 0) via a broadcast column spine — the inclusion_profile rule:
    a profiler that silently drops the degenerate column hides exactly
    the anomaly it exists to catch.

    Output: (column, rank, mask, n, share)."""
    if not columns:
        raise ValueError("pattern_profile: columns must be non-empty")
    if top_k < 1:
        raise ValueError("pattern_profile: top_k must be >= 1")
    from pyspark.sql import Window
    from pyspark.sql.types import StringType

    for c in columns:
        if not isinstance(df.schema[c].dataType, StringType):
            raise ValueError(
                f"pattern_profile: column {c!r} is not a string column "
                "(cast explicitly — engine-specific number formatting "
                "would make masks oracle-unstable)"
            )
    stack = ", ".join(f"'{c}', {c}" for c in columns)
    pairs = df.select(
        F.expr(f"stack({len(columns)}, {stack}) AS (column, _v)")
    )
    mask = F.col("_v")
    for pat, rep in _MASK_CLASSES:
        mask = F.regexp_replace(mask, pat, rep)
    cells = (
        pairs.filter(F.col("_v").isNotNull())
        .select("column", mask.alias("mask"))
        .groupBy("column", "mask")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rank = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("mask").asc()
    )
    w_col = Window.partitionBy("column")
    ranked = (
        cells.withColumn(
            "share", F.round(F.col("n") / F.sum("n").over(w_col), 6)
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_k)
    )
    spine = df.sparkSession.createDataFrame(
        [(c,) for c in columns], "column string"
    )
    return spine.join(F.broadcast(ranked), "column", "left").select(
        "column",
        "rank",
        "mask",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        "share",
    )


def uniqueness_profile(df: DataFrame, columns: "list[str]") -> DataFrame:
    """deequ's Uniqueness + UniqueValueRatio for N columns with ONE scan
    and ONE shuffle: rows melt to (column, value) pairs via a ``stack``
    projection, the pair groupBy counts occurrences (map-side partials
    bound the shuffle by the SUM OF COLUMN CARDINALITIES, not row count),
    and a bounded per-column fold produces —

    * ``uniqueness``         = (#values occurring exactly once) / n_rows
    * ``unique_value_ratio`` = (#values occurring exactly once) / #distinct

    Values are compared AS STRINGS (the melt must give every column one
    type); NULL is a countable value (a column that is half NULL is very
    much not unique).  Ratios round(6) for cross-engine bit-stability."""
    stack = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in columns)
    pairs = df.select(
        F.expr(f"stack({len(columns)}, {stack}) AS (column, value)")
    )
    counts = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return (
        counts.groupBy("column")
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum((F.col("_cnt") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            "column",
            "n_rows",
            "n_distinct",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_rows"), 6).alias("uniqueness"),
            F.round(F.col("n_unique") / F.col("n_distinct"), 6).alias(
                "unique_value_ratio"
            ),
        )
    )


def completeness_profile(
    df: DataFrame, columns: "list[str]", group_col: str | None = None
) -> DataFrame:
    """Per-segment × per-column completeness matrix — deequ's Completeness
    analyzer sliced by a segment column: "which FEED broke" where the
    global null rate only says "something broke" (a feed that nulls one
    column entirely can hide inside a healthy global average when the
    segment is small).

    Shape: ONE multi-aggregate grouped scan — count(*) plus one
    sum(isnull) per column as COLUMNS of the per-group aggregate
    (map-side partial, shuffle bounded by the number of segments), then
    the BOUNDED group table melts via ``stack`` into (group, column,
    n_rows, n_null) rows.  Aggregating before melting keeps the shuffle
    at groups-many wide rows instead of groups × columns × partials;
    the melt itself touches only the bounded aggregate.

    group_col=None profiles the whole frame as one segment labeled
    '_all'.  NULL group values are a real segment (labeled as the cast
    string or kept NULL) — a feed that forgot its segment tag is exactly
    the feed to inspect.  completeness = (n_rows − n_null)/n_rows,
    round(6) for cross-engine bit-stability.
    """
    if not columns:
        raise ValueError("completeness_profile: columns must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.isnull(c).cast("long")).alias(f"_null_{i}")
        for i, c in enumerate(columns)
    ]
    if group_col is None:
        per_group = df.agg(*aggs).select(F.lit("_all").alias("_grp"), "*")
    else:
        per_group = df.groupBy(
            F.col(group_col).cast("string").alias("_grp")
        ).agg(*aggs)
    stack = ", ".join(f"'{c}', _null_{i}" for i, c in enumerate(columns))
    return per_group.select(
        "_grp",
        "_n",
        F.expr(f"stack({len(columns)}, {stack}) AS (column, n_null)"),
    ).select(
        F.col("_grp").alias("group_value"),
        "column",
        F.col("_n").alias("n_rows"),
        "n_null",
        F.round((F.col("_n") - F.col("n_null")) / F.col("_n"), 6).alias(
            "completeness"
        ),
    )


def functional_dependencies(
    df: DataFrame, determinant: "list[str]", dependents: "list[str]"
) -> DataFrame:
    """N functional dependencies with a SHARED determinant from ONE grouped
    scan: the per-group aggregate carries one distinct-count (plus has-null
    flag) per dependent, and the bounded group table folds into one verdict
    row per dependent — same semantics as ``functional_dependency``, 1/N of
    the scans when profiling what a key column determines."""
    if not dependents:
        raise ValueError("dependents must be non-empty")
    g_aggs = []
    for d in dependents:
        g_aggs.append(
            (F.countDistinct(d) + F.max(F.isnull(d).cast("long"))).alias(
                f"_ndep_{d}"
            )
        )
    per_group = df.groupBy(*[F.col(c) for c in determinant]).agg(*g_aggs)
    f_aggs = [F.count(F.lit(1)).alias("_groups")]
    for d in dependents:
        f_aggs.append(
            F.sum((F.col(f"_ndep_{d}") > 1).cast("long")).alias(f"_viol_{d}")
        )
    wide = per_group.agg(*f_aggs)
    stack = ", ".join(f"'{d}', _viol_{d}" for d in dependents)
    return wide.select(
        "_groups",
        F.expr(
            f"stack({len(dependents)}, {stack}) AS (dependent, violating_groups)"
        ),
    ).select(
        F.lit(",".join(determinant)).alias("determinant"),
        "dependent",
        F.col("_groups").alias("n_groups"),
        "violating_groups",
        (F.col("violating_groups") == 0).alias("holds"),
    )


def containment(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str
) -> DataFrame:
    """Graded referential integrity: what FRACTION of A's values exist in
    B — the analyzer for keys that are supposed to resolve but can't be
    hard-failed row by row (deequ's referential-integrity fraction; the
    anti-join operators in validate.py give the row-level evidence, this
    gives the one-row health number).

    Shape: A collapses to per-value counts first (map-side partial, the
    shuffle carries A's distinct values, not its rows), B to a distinct
    value set; one join keyed on the value grades every A value at once.
    Output: (from_col, to_col, rows_total, rows_matched, row_containment,
    distinct_total, distinct_matched, distinct_containment) — row_* grades
    by row mass, distinct_* by value set; both round(6) from exact longs.
    NULLs in A are excluded (they reference nothing, and NULL ∈ B is not
    a resolution)."""
    a = (
        df_a.select(F.col(col_a).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    b = (
        df_b.select(F.col(col_b).alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    graded = a.join(b, "_v", "left")
    return graded.agg(
        F.lit(col_a).alias("from_col"),
        F.lit(col_b).alias("to_col"),
        F.sum("_cnt").alias("rows_total"),
        F.coalesce(
            F.sum(F.when(F.col("_hit") == 1, F.col("_cnt"))), F.lit(0)
        ).alias("rows_matched"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("_hit") == 1, F.col("_cnt"))), F.lit(0))
            / F.sum("_cnt"),
            6,
        ).alias("row_containment"),
        F.count(F.lit(1)).alias("distinct_total"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("distinct_matched"),
        F.round(
            F.coalesce(F.sum("_hit"), F.lit(0)) / F.count(F.lit(1)), 6
        ).alias("distinct_containment"),
    )


def fd_confidence(
    df: DataFrame, determinant: "list[str]", dependent: str
) -> DataFrame:
    """APPROXIMATE functional dependency: how close does
    ``determinant -> dependent`` come to holding?  ``functional_dependency``
    above gives the boolean; real corpora need the graded number (deequ /
    TANE-style g3 measure): confidence = (rows kept under the best
    per-group repair) / (all rows) — i.e. for each determinant group keep
    the plurality dependent value, count survivors.

    Shape: ONE grouped count on (determinant, dependent) — map-side
    partial, shuffle bounded by the joint cardinality — then a per-group
    max over that bounded table and a single fold.  NULL dependents form
    their own group (two rows (a, NULL) and (a, x) disagree — same NULL
    stance as functional_dependency, and GROUP BY treats NULL as a value
    in both engines).

    Output one row: (determinant, dependent, n_rows, kept_rows,
    confidence, holds) — confidence is round(6) from exact longs, holds
    means confidence == 1.0 exactly."""
    joint = df.groupBy(
        *[F.col(c) for c in determinant], F.col(dependent).alias("_dep")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_det = joint.groupBy(*[F.col(c) for c in determinant]).agg(
        F.sum("_n").alias("_rows"), F.max("_n").alias("_kept")
    )
    return per_det.agg(
        F.lit(",".join(determinant)).alias("determinant"),
        F.lit(dependent).alias("dependent"),
        F.sum("_rows").alias("n_rows"),
        F.sum("_kept").alias("kept_rows"),
        F.round(F.sum("_kept") / F.sum("_rows"), 6).alias("confidence"),
        (F.sum("_kept") == F.sum("_rows")).alias("holds"),
    )


def freshness(
    df: DataFrame,
    ts_col: str,
    max_lag_seconds: int,
    as_of_epoch_us: "int | None" = None,
    group_col: "str | None" = None,
) -> DataFrame:
    """Recency analyzer (deequ has no equivalent; every production table
    needs one): is the newest row within ``max_lag_seconds`` of the as-of
    instant?  All arithmetic is INTEGER microseconds-since-epoch
    (``unix_micros`` here, ``epoch_us`` in the DuckDB oracle) — absolute
    instants, no session-timezone or formatting ambiguity, exact
    cross-engine comparison.

    ``as_of_epoch_us=None`` uses the table's own global max timestamp —
    useful for judging per-group lag behind the feed's head rather than
    wall-clock (wall-clock "now" would be untestable and unoracle-able;
    pass an explicit epoch for that).  One aggregate pass per side; the
    1-row global max broadcasts back.

    Output per group (or one row): (group?, max_ts_epoch_us,
    lag_seconds, fresh) — lag floor-divided to whole seconds, fresh =
    lag_seconds <= max_lag_seconds; an empty/all-null group yields NULL
    max and NULL lag with fresh NULL (unknown, never a silent pass).

    TIMESTAMP_NTZ columns (what parquet naive timestamps load as) are
    measured by WALL-CLOCK microseconds since the naive epoch via
    timestampdiff — never a cast through TIMESTAMP, whose epoch would
    shift with the session timezone (the driver's session need not run
    UTC); that wall-clock reading is exactly DuckDB's epoch_us on its
    own naive timestamps."""
    ts_us = _epoch_us_col(df, ts_col)
    if group_col is None:
        agg = df.agg(F.max(ts_us).alias("max_ts_epoch_us"))
    else:
        agg = df.groupBy(group_col).agg(F.max(ts_us).alias("max_ts_epoch_us"))
    if as_of_epoch_us is None:
        ref = df.agg(F.max(ts_us).alias("_as_of"))
        agg = agg.crossJoin(F.broadcast(ref))
    else:
        agg = agg.withColumn("_as_of", F.lit(int(as_of_epoch_us)))
    lag_s = F.floor((F.col("_as_of") - F.col("max_ts_epoch_us")) / F.lit(1_000_000))
    return agg.select(
        *([group_col] if group_col else []),
        "max_ts_epoch_us",
        lag_s.alias("lag_seconds"),
        (lag_s <= F.lit(int(max_lag_seconds))).alias("fresh"),
    )


def _epoch_us_col(df: DataFrame, ts_col: str):
    """Integer epoch-microseconds for TIMESTAMP or TIMESTAMP_NTZ columns —
    shared by freshness and coverage_gaps (same timezone-proof reading:
    NTZ measures wall-clock micros via timestampdiff, TZ uses
    unix_micros; both equal DuckDB's epoch_us)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def coverage_gaps(
    df: DataFrame, ts_col: str, granularity_seconds: int
) -> DataFrame:
    """Calendar-completeness analyzer: which time buckets between the
    table's first and last row have ZERO rows — the "a day of data is
    missing" check that row counts and null rates cannot see (a feed that
    silently dropped Tuesday still has a healthy total).

    Shape: one map-side-partial groupBy on the computed bucket id
    (shuffle bounded by the covered bucket count); the BOUNDED count
    table is pinned (lazy localCheckpoint, dedup._materialize_once
    precedent) before its double use — spine generation from its own
    min/max AND the anti-join — because the two uses carry different
    projections, so ReusedExchange does not fire and the corpus would
    scan twice (measured).  Bucket ids use the identical double
    expression floor(epoch_us / (granularity·10^6)) in both engines.

    The caller sizes granularity against the table's span (a year at
    1-second granularity is a 3·10^7-row spine — fine; a millennium is
    not).  Output: one row per MISSING bucket, (bucket,
    bucket_start_epoch_s), ordered by bucket; 0 rows = full coverage."""
    if granularity_seconds <= 0:
        raise ValueError("coverage_gaps: granularity_seconds must be > 0")
    from pyspark.sql import Window

    g_us = float(granularity_seconds) * 1_000_000.0
    bucket = F.floor(_epoch_us_col(df, ts_col) / F.lit(g_us)).cast("long")
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy(F.lit(1))
    spine = (
        counts.withColumn("_lo", F.min("bucket").over(w))
        .withColumn("_hi", F.max("bucket").over(w))
        .select("_lo", "_hi")
        .limit(1)
        .select(F.explode(F.sequence("_lo", "_hi")).alias("bucket"))
    )
    return (
        spine.join(counts, "bucket", "left_anti")
        .select(
            "bucket",
            (F.col("bucket") * F.lit(int(granularity_seconds))).alias(
                "bucket_start_epoch_s"
            ),
        )
        .orderBy("bucket")
    )


def benford_profile(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/corrupted-numbers screen (synthetic or truncated
    feeds flatten the digit curve; unit mix-ups shift it).

    The value is floored to an integer BEFORE digit extraction and the
    digit is read from the integer's decimal string — integer→string is
    byte-identical across engines, where a double's first digit via
    log10 arithmetic is boundary-hazardous at powers of ten (and double
    rendering differs by engine).

    Domain: 1 <= |x| < 10^18.  Values at or beyond ~2^63 would SATURATE
    the long cast and silently misreport digit 9 (the same 2^63 hazard the
    integrality classifier fixed in r3), so they are excluded by an
    explicit double-side bound — scale scientific-magnitude columns before
    profiling.  NULLs and |x| < 1 are likewise excluded (no leading
    significant digit).

    One map-side-partial groupBy bounded by 9 digit groups + a broadcast
    spine so absent digits appear with n_rows 0.  Output per digit 1-9:
    (digit, n_rows, share, benford_p, delta) — share/delta round(6) from
    exact longs, benford_p = round(log10(1 + 1/d), 6).  Sibling:
    ``benford_conformance`` adds per-group chi-square + a critical-value
    verdict on top of the same exact digit extraction."""
    from pyspark.sql import Window

    v = F.floor(F.abs(F.col(column))).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("long")
    counts = (
        df.filter(
            F.col(column).isNotNull()
            & (F.abs(F.col(column)) < F.lit(1e18))
            & (v >= 1)
        )
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = df.sparkSession.range(1, 10).select(F.col("id").alias("digit"))
    w = Window.partitionBy(F.lit(1))
    joined = (
        spine.join(F.broadcast(counts), "digit", "left")
        .select("digit", F.coalesce("n_rows", F.lit(0)).alias("n_rows"))
        .withColumn("_total", F.sum("n_rows").over(w))
    )
    share = F.round(F.col("n_rows") / F.col("_total"), 6)
    bp = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    return joined.select(
        "digit",
        "n_rows",
        share.alias("share"),
        bp.alias("benford_p"),
        F.round(
            F.col("n_rows") / F.col("_total")
            - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")),
            6,
        ).alias("delta"),
    ).orderBy("digit")


def outlier_report(
    df: DataFrame,
    column: str,
    id_cols: "list[str]",
    method: str = "mad",
    cutoff: float = 3.5,
) -> DataFrame:
    """Univariate outlier rows for a numeric column — the row-level
    companion to split_anomalies (which judges whole splits): which
    individual records carry implausible values.

    * ``mad`` (default) — robust z-score 0.6745·(x − median)/MAD
      (Iglewicz-Hoberg modified z; cutoff 3.5 is their recommendation).
      Median and MAD are breakdown-0.5 estimators, so the outliers being
      hunted cannot drag the fence the way mean/stddev let them.
    * ``zscore`` — classic (x − mean)/stddev_pop for normal-ish columns.

    Scale/scan accounting (exact estimators by design — the DuckDB oracle
    needs bit-equal fences): ``zscore`` is 2 corpus scans (one
    multi-aggregate stats pass + the filter pass).  ``mad`` is 3 — the MAD
    needs the median as an input, so exact computation is irreducibly
    sequential (median scan → MAD scan → filter scan); the 1-row stats
    frames stay DataFrames cross-joined into the filter (broadcast nested
    loop over ONE row), nothing collects to the driver.  At campaign scale
    swap ``percentile`` for ``percentile_approx`` inside ``_median`` — same
    plan shape, rank-error quantiles, and the scan count is unchanged (the
    sequential dependency is mathematical, not an implementation artifact).

    Emits one row per outlier: id_cols, the value, and ``score`` round(6)
    — row-scale output like validate.row_violations, bounded by how dirty
    the data is.  The cutoff compares UNROUNDED scores (both engines
    evaluate the identical double expression, so the boundary row set is
    deterministic).  A zero MAD / zero stddev (constant column) yields no
    outlier rows — a constant column has no interior distribution to
    deviate from; profile it with column_stats instead."""
    if method not in ("mad", "zscore"):
        raise ValueError("outlier_report: method must be 'mad' or 'zscore'")
    c = F.col(column)
    base = df.filter(c.isNotNull())
    if method == "zscore":
        stats_row = base.agg(
            F.avg(c).alias("_center"),
            F.stddev_pop(c).alias("_spread"),
        )
        scale = F.lit(1.0)
    else:
        med = base.agg(F.percentile(c, F.lit(0.5)).alias("_center"))
        stats_row = base.crossJoin(med).agg(
            F.first("_center").alias("_center"),
            F.percentile(F.abs(c - F.col("_center")), F.lit(0.5)).alias("_spread"),
        )
        scale = F.lit(0.6745)
    score = scale * (c - F.col("_center")) / F.col("_spread")
    return (
        base.crossJoin(F.broadcast(stats_row))
        .filter((F.col("_spread") > 0) & (F.abs(score) > F.lit(float(cutoff))))
        .select(*id_cols, c.alias("value"), F.round(score, 6).alias("score"))
    )


def equidepth_histogram(df: DataFrame, column: str, k: int) -> DataFrame:
    """Equi-depth (quantile-binned) histogram: k buckets holding ~equal row
    counts — the profile that stays informative on skewed columns where
    the equi-width column_histogram piles everything into one bar.

    Two scans by construction (boundaries, then counts — the assignment
    needs the boundaries as inputs, the same mathematical sequencing as
    outlier_report's MAD): one exact ``percentile`` pass for the k−1
    interior boundaries (swap in percentile_approx at campaign scale —
    same shape, rank-error bounds), then one map-side-partial groupBy on
    the computed bucket id, bounded by k.  The 1-row boundary frame
    cross-joins in (broadcast over ONE row); assignment is "count of
    interior boundaries strictly below x", so a value EQUAL to a boundary
    falls in the lower bucket in both engines.  Boundary-ulp honesty: the
    two engines interpolate quantiles with identical semantics, and a
    count can only flip if a data value lies strictly between their
    last-ulp boundary doubles — impossible when the data grid is coarser
    than 1 ulp of the boundary (the oracle's contract here).

    Output per bucket 0..k−1: (bucket, lo, hi, n_rows) — lo/hi are the
    round(6) boundary values (min/max of the column for the outer edges),
    n_rows exact."""
    if k <= 1:
        raise ValueError("equidepth_histogram: need k >= 2 buckets")
    c = F.col(column)
    probs = [i / k for i in range(1, k)]
    base = df.filter(c.isNotNull())
    # the 1-row bounds frame feeds BOTH the count assignment and the edge
    # report — pin it (lazy localCheckpoint, double-scan sweep rule) or its
    # corpus-sized aggregate lineage executes twice (measured 3 scans).
    bounds = base.agg(
        F.percentile(c, F.array(*[F.lit(p) for p in probs])).alias("_bounds"),
        F.min(c).alias("_lo"),
        F.max(c).alias("_hi"),
    ).localCheckpoint(eager=False)
    bucket = F.aggregate(
        "_bounds",
        F.lit(0),
        lambda acc, b: acc + F.when(b < c, 1).otherwise(0),
    ).cast("long")
    counts = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = df.sparkSession.range(k).select(F.col("id").alias("bucket"))
    edges = spine.crossJoin(F.broadcast(bounds)).select(
        "bucket",
        F.round(
            F.when(F.col("bucket") == 0, F.col("_lo")).otherwise(
                F.element_at("_bounds", F.col("bucket").cast("int"))
            ),
            6,
        ).alias("lo"),
        F.round(
            F.when(F.col("bucket") == k - 1, F.col("_hi")).otherwise(
                F.element_at("_bounds", (F.col("bucket") + 1).cast("int"))
            ),
            6,
        ).alias("hi"),
    )
    return edges.join(F.broadcast(counts), "bucket", "left").select(
        "bucket", "lo", "hi", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )


def null_cooccurrence(df: DataFrame, columns: "list[str]") -> DataFrame:
    """Missingness STRUCTURE: which columns go null together — per-column
    null counts say how much is missing, this says whether the misses are
    the same rows (one broken upstream join) or independent (N unrelated
    feeds).  One multi-aggregate scan computes every pairwise
    both-null count plus the per-column totals; output is one row per
    unordered column pair (col_a < col_b lexicographically):
    (col_a, col_b, n_a_null, n_b_null, n_both_null, jaccard) where
    jaccard = both / (a + b − both), round(6), NULL when neither column
    has any nulls (no missingness to correlate — distinct from 0.0,
    which means disjoint misses)."""
    if len(columns) < 2:
        raise ValueError("null_cooccurrence: need at least 2 columns")
    cols = sorted(columns)
    # internal aliases are INDEX-based: name-joined aliases ('_b_{a}_{b}')
    # collide for distinct pairs when column names contain underscores
    # (['a','b_c'] vs ['a_b','c']) and the melt then dies with an
    # ambiguous-reference AnalysisException (review finding)
    aggs = []
    for i, a in enumerate(cols):
        aggs.append(
            F.sum(F.col(a).isNull().cast("long")).alias(f"_n_{i}")
        )
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i + 1:], start=i + 1):
            aggs.append(
                F.sum((F.col(a).isNull() & F.col(b).isNull()).cast("long")).alias(
                    f"_b_{i}_{j}"
                )
            )
    wide = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i + 1:], start=i + 1):
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"_n_{i}").alias("n_a_null"),
                    F.col(f"_n_{j}").alias("n_b_null"),
                    F.col(f"_b_{i}_{j}").alias("n_both_null"),
                )
            )
    melted = wide.select(F.explode(F.array(*pairs)).alias("_p")).select("_p.*")
    union = F.col("n_a_null") + F.col("n_b_null") - F.col("n_both_null")
    return melted.withColumn(
        "jaccard",
        F.when(union > 0, F.round(F.col("n_both_null") / union, 6)),
    )


def heavy_hitters(
    df: DataFrame, column: str, threshold: float, state_size: int | None = None
) -> DataFrame:
    """EXACT θ-frequent values without shuffling the full distinct set —
    the scale path where ``top_values`` is the small-cardinality profile.
    ``top_values``'s groupBy shuffles one row per DISTINCT value; on a
    near-unique 10^12-row column that is a corpus-sized shuffle to answer
    "which values exceed 0.1%?".  This operator bounds the state instead:

    1. a per-partition Misra-Gries summary (mergeable-summaries reduce:
       merge batch counts, subtract the (k+1)-th largest, keep positive)
       inside ONE ``mapInArrow`` pass — state ≤ k values per partition,
       NO shuffle; with k = ⌈1/θ⌉ the undercount is < θ·n_p, and any
       globally θ-frequent value is ≥ θ-frequent in at least one
       partition (pigeonhole), so the union of partition candidates is a
       SUPERSET of every true heavy hitter;
    2. one exact verification scan: broadcast-semi-join the corpus to the
       (≤ k × partitions)-sized candidate set, groupBy only those rows —
       map-side partial, shuffle bounded by candidates × partitions.

    The sketch only generates CANDIDATES; the verify pass restores exact
    counts, so output is exact and SQL-oracle-able.  The θ comparison is
    done in EXACT long arithmetic (n_rows·den ≥ num·N via
    ``Fraction(str(threshold))``) — a double product like 0.007·N is
    engine-dependent in the last ulp and DuckDB parses 0.007 as DECIMAL,
    so a float compare would flip boundary values between engines.

    Output: (value:string, n_rows, frac) for every value with
    n_rows ≥ θ·N_nonnull; NULLs excluded."""
    import math
    from fractions import Fraction

    if not (0.0 < threshold < 1.0):
        raise ValueError("heavy_hitters: threshold must be in (0, 1)")
    fr = Fraction(str(threshold))
    k = int(state_size or math.ceil(1.0 / threshold))
    if k < math.ceil(1.0 / threshold):
        raise ValueError(
            "heavy_hitters: state_size must be >= ceil(1/threshold) "
            "or the candidate set loses the superset guarantee"
        )
    if k > 1_000_000:
        raise ValueError(
            "heavy_hitters: threshold too small — per-partition state "
            f"k={k} exceeds 1e6; use top_values or raise the threshold"
        )
    vals = df.select(F.col(column).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )

    def _mg(batches):
        import pandas as pd  # noqa: F401 (value_counts path)
        import pyarrow as pa

        state = None
        n = 0
        for batch in batches:
            s = batch.column(0).to_pandas()
            n += len(s)
            bc = s.value_counts()
            state = bc if state is None else state.add(bc, fill_value=0)
            if len(state) > k:
                cut = state.nlargest(k + 1).iloc[-1]
                state = state - cut
                state = state[state > 0]
        cand = [] if state is None else [str(v) for v in state.index]
        yield pa.record_batch(
            [
                pa.array(cand + [None], type=pa.string()),
                pa.array([0] * len(cand) + [n], type=pa.int64()),
            ],
            names=["value", "part_rows"],
        )

    # the MG pass feeds BOTH the candidate set and the nonnull total —
    # pin it or the corpus sketch executes twice (double-scan sweep rule)
    mg = vals.mapInArrow(_mg, "value string, part_rows long").localCheckpoint(
        eager=False
    )
    total = mg.agg(F.sum("part_rows").alias("_n"))
    cands = mg.filter(F.col("value").isNotNull()).select("value").distinct()
    counts = (
        vals.join(F.broadcast(cands), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_rows") * F.lit(fr.denominator)
            >= F.lit(fr.numerator) * F.col("_n")
        )
        .select(
            "value",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_n"), 6).alias("frac"),
        )
    )


def inclusion_profile(
    df_a: DataFrame,
    cols_a: "list[str]",
    df_b: DataFrame,
    cols_b: "list[str]",
) -> DataFrame:
    """Inclusion-dependency DISCOVERY (SPIDER-style): for EVERY pair
    (a ∈ cols_a, b ∈ cols_b), what fraction of a's distinct values exist
    among b's — the profile that finds joinable/foreign-key columns
    before anyone declares them.  ``containment`` grades ONE declared
    pair (by row mass and value set); this sweeps the cross product and
    reports value-set containment for all of them in two scans total,
    not 2·|pairs|.

    Shape: each table melts ONCE to a distinct (col, value-as-string)
    set — explode of a struct array, so one scan covers all columns; the
    two melted sets join on value (shuffle bounded by cols × distinct
    values, never rows — and each (col,value) is distinct per side, so a
    hot value contributes at most |cols_a|·|cols_b| joined rows, not a
    quadratic blow-up); one bounded groupBy counts hits per pair.  The
    (col_a × col_b) spine left-joins the hits so empty intersections
    report 0.0 instead of vanishing.  Values compare in their CAST-string
    canonical form (cross-type discovery needs a shared domain; the
    docstring contract is that '1' == '1' whether it came from INT or
    VARCHAR).

    Output per pair: (col_a, col_b, n_distinct_a, n_contained,
    containment round6, full_inclusion)."""
    if not cols_a or not cols_b:
        raise ValueError("inclusion_profile: column lists must be non-empty")

    def _melt(df: DataFrame, cols: "list[str]", name: str) -> DataFrame:
        entries = F.array(
            *[
                F.struct(
                    F.lit(c).alias(name),
                    F.col(c).cast("string").alias("value"),
                )
                for c in cols
            ]
        )
        return (
            df.select(F.explode(entries).alias("_e"))
            .select("_e.*")
            .filter(F.col("value").isNotNull())
            .distinct()
        )

    # the melted A set feeds the per-column totals AND the value join —
    # pin it (double-scan sweep rule) so A melts once
    a = _melt(df_a, cols_a, "col_a").localCheckpoint(eager=False)
    b = _melt(df_b, cols_b, "col_b")
    totals = a.groupBy("col_a").agg(F.count(F.lit(1)).alias("n_distinct_a"))
    hits = (
        a.join(b, "value")
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).alias("n_contained"))
    )
    # the spine is the LITERAL cols_a × cols_b cross — built from totals it
    # would silently drop an all-NULL (or empty) A column instead of
    # reporting it with n_distinct_a = 0 (review finding)
    spark = df_a.sparkSession
    spine = (
        spark.createDataFrame([(c,) for c in cols_a], "col_a string")
        .crossJoin(
            F.broadcast(
                spark.createDataFrame([(c,) for c in cols_b], "col_b string")
            )
        )
        .join(F.broadcast(totals), "col_a", "left")
        .withColumn("n_distinct_a", F.coalesce("n_distinct_a", F.lit(0)))
    )
    graded = F.col("n_distinct_a") > 0
    return spine.join(F.broadcast(hits), ["col_a", "col_b"], "left").select(
        "col_a",
        "col_b",
        "n_distinct_a",
        F.coalesce("n_contained", F.lit(0)).alias("n_contained"),
        # a column with no values grades NULL, not 0.0 (nothing to contain
        # is different from containing nothing) — same stance as
        # null_cooccurrence's jaccard
        F.when(
            graded,
            F.round(
                F.coalesce("n_contained", F.lit(0)) / F.col("n_distinct_a"), 6
            ),
        ).alias("containment"),
        F.when(
            graded,
            F.coalesce("n_contained", F.lit(0)) == F.col("n_distinct_a"),
        ).alias("full_inclusion"),
    )


def mask_profile(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Pattern-mask profile: collapse every string to its character-class
    MASK (ASCII letters → 'A', digits → '9', everything else kept
    verbatim) and report the top-k masks with counts and corpus share —
    how a profiler shows "this column is 'AAA-9999' 98% of the time, and
    here are the stragglers".  datatype_profile classifies into a fixed
    type lattice; this discovers the column's own formats.

    The mask is two chained ``regexp_replace`` calls — whole-stage
    codegen, no Python.  Classes are EXPLICITLY ASCII ([A-Za-z], [0-9]):
    Unicode letter classes differ between regex engines, and a profile
    that two engines disagree on is not oracle-able.  Masking collapses
    cardinality by design (every phone number is one mask), so the mask
    count table is small; the top-k still goes through the two-stage
    per-partition row_number prefilter (top_values' WindowGroupLimit
    shape) so a pathological high-variety column cannot funnel its full
    mask set through one reducer.  Ties break on mask ascending.

    Output: (mask, n_rows, share round6, rk) for the top k masks;
    NULLs excluded."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("mask_profile: k must be >= 1")
    masked = df.select(
        F.regexp_replace(
            F.regexp_replace(F.col(column).cast("string"), "[A-Za-z]", "A"),
            "[0-9]",
            "9",
        ).alias("mask")
    ).filter(F.col("mask").isNotNull())
    # the mask count table feeds the two-stage rank AND the total fold —
    # pin it so the corpus aggregates once (double-scan sweep rule)
    counts = (
        masked.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    staged = counts.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy("_pid").orderBy(F.desc("n_rows"), F.asc("mask"))
    w2 = Window.orderBy(F.desc("n_rows"), F.asc("mask"))
    ranked = (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "mask",
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        "rk",
    )


def k_anonymity(df: DataFrame, quasi_cols: "list[str]", k: int) -> DataFrame:
    """Re-identification risk profile: treating ``quasi_cols`` as a
    quasi-identifier, how many rows sit in equivalence groups smaller
    than k — the k-anonymity criterion a release gate checks before a
    dataset with demographic-ish columns ships.  The PII scrubbers
    (text.py) handle direct identifiers; this measures the LINKAGE risk
    that survives them.

    ONE grouped count on the quasi-identifier (map-side partial — the
    same shuffle any join on these columns would pay), then a single
    bounded fold over the group-size table.  Exact by design: a sketch
    that under-counts a group mis-certifies anonymity (the
    candidate_keys rule).  Output one row: (k, n_rows, n_groups,
    groups_below_k, rows_below_k, risk_fraction round6,
    min_group_size, k_anonymous)."""
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k_anonymity: k must be >= 2")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    below = F.col("_n") < k
    return groups.agg(
        F.lit(int(k)).alias("k"),
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(below.cast("long")).alias("groups_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0)).alias(
            "rows_below_k"
        ),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0))
            / F.sum("_n"),
            6,
        ).alias("risk_fraction"),
        F.min("_n").alias("min_group_size"),
        (F.min("_n") >= k).alias("k_anonymous"),
    )


def _melt_pairs(
    df: DataFrame, pairs: "list[tuple[str, str]]", a_alias: str, b_alias: str
) -> DataFrame:
    """Shared pair melt for the association sweeps (categorical_association
    and mutual_information_pairs advertise matching semantics, so they must
    share ONE melt — review finding): every pair's two values, cast to
    string, under (col_a, col_b) labels, exploded from a single scan."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(a).cast("string").alias(a_alias),
                        F.col(b).cast("string").alias(b_alias),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("e")
    ).select("e.*")


def categorical_association(
    df: DataFrame, pairs: "list[tuple[str, str]]"
) -> DataFrame:
    """Chi-squared association + Cramér's V for N categorical column
    pairs — the dependency number mutual_information gives for ONE pair,
    normalized to [0,1] and swept across a pair list in ONE scan of the
    data: every pair's (value_a, value_b) cell melts via
    explode(array(struct...)) into a single grouped count (the
    column_entropy shape), so the shuffle is sized by the summed joint
    cardinalities, never rows × pairs reshuffles.

    Margins and totals come from WINDOWS over the bounded cell table
    (partition keys handle NULL categories as ordinary groups — an
    equi-join would silently drop NULL-valued cells), chained linearly so
    the corpus still scans once.  Zero-observed cells never materialize:
    Σ_all exp = n algebraically, so χ² = Σ_present((o−e)²/e − e) + n —
    no r×c spine is ever built.  NULL category values are real levels on
    both engines (GROUP BY keeps the NULL group); each χ² term rounds to
    6 decimals before the sum and the sum rounds again, so the
    cross-engine hash is summation-order-independent (the
    divergence_report convention).

    Output per pair: (col_a, col_b, n_rows, r_levels, c_levels, dof,
    chi2, cramers_v) — cramers_v = sqrt(χ²/(n·min(r−1,c−1))), NULL when
    either side is constant (dof 0: association is undefined, not 0).
    Only sensible for bounded-cardinality columns (the
    mutual_information scale rule): the joint cell table is the scale
    knob."""
    from pyspark.sql import Window

    if not pairs:
        raise ValueError("categorical_association: need at least one pair")
    for a, b in pairs:
        if a == b:
            raise ValueError(f"categorical_association: self-pair {a!r}")
    melted = _melt_pairs(df, pairs, "_va", "_vb")
    cells = melted.groupBy("col_a", "col_b", "_va", "_vb").agg(
        F.count(F.lit(1)).alias("_o")
    )
    wp = Window.partitionBy("col_a", "col_b")
    wa = Window.partitionBy("col_a", "col_b", "_va")
    wb = Window.partitionBy("col_a", "col_b", "_vb")
    exp = (F.sum("_o").over(wa) * F.sum("_o").over(wb)) / F.sum("_o").over(wp)
    graded = cells.withColumn(
        "_term",
        F.round((F.col("_o") - exp) * (F.col("_o") - exp) / exp - exp, 6),
    ).withColumn("_tot", F.sum("_o").over(wp))
    out = graded.groupBy("col_a", "col_b").agg(
        F.first("_tot").alias("n_rows"),
        (
            F.countDistinct("_va") + F.max(F.col("_va").isNull().cast("long"))
        ).alias("r_levels"),
        (
            F.countDistinct("_vb") + F.max(F.col("_vb").isNull().cast("long"))
        ).alias("c_levels"),
        F.round(F.sum("_term") + F.first("_tot"), 6).alias("_chi2"),
    )
    dof = (F.col("r_levels") - 1) * (F.col("c_levels") - 1)
    return out.select(
        "col_a",
        "col_b",
        "n_rows",
        "r_levels",
        "c_levels",
        dof.alias("dof"),
        # χ² is mathematically ≥ 0; per-term rounding can dip the sum a
        # hair below — clamp so the report never shows -0.000001
        F.greatest(F.col("_chi2"), F.lit(0.0)).alias("chi2"),
        F.when(
            dof > 0,
            F.round(
                F.sqrt(
                    F.greatest(F.col("_chi2"), F.lit(0.0))
                    / (
                        F.col("n_rows")
                        * F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
                    )
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


def l_diversity(
    df: DataFrame, quasi_cols: "list[str]", sensitive_col: str, l: int
) -> DataFrame:
    """l-diversity risk profile — k_anonymity's companion: a group can be
    large (k-anonymous) yet expose its members anyway when every row in
    it shares ONE sensitive value (the homogeneity attack).  This counts
    rows in quasi-identifier equivalence groups whose sensitive column
    carries fewer than l DISTINCT non-null values.

    ONE grouped aggregate on the quasi-identifier (count + exact
    countDistinct — a sketch that over-counts diversity mis-certifies a
    release, the candidate_keys rule), then a single bounded fold.  NULL
    sensitive values contribute nothing to diversity (an all-NULL group
    has diversity 0 and always flags).  Output mirrors k_anonymity:
    (l, n_rows, n_groups, groups_below_l, rows_below_l, risk_fraction
    round6, min_diversity, l_diverse)."""
    if not quasi_cols:
        raise ValueError("l_diversity: quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError("l_diversity: sensitive_col inside quasi_cols")
    if l < 2:
        raise ValueError("l_diversity: l must be >= 2")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_d"),
    )
    below = F.col("_d") < l
    return groups.agg(
        F.lit(int(l)).alias("l"),
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(below.cast("long")).alias("groups_below_l"),
        F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0)).alias(
            "rows_below_l"
        ),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0))
            / F.sum("_n"),
            6,
        ).alias("risk_fraction"),
        F.min("_d").alias("min_diversity"),
        (F.min("_d") >= l).alias("l_diverse"),
    )


def t_closeness(
    df: DataFrame, quasi_cols: "list[str]", sensitive_col: str, t: float
) -> DataFrame:
    """t-closeness risk profile — the third member of the privacy triple
    (k_anonymity: groups too small; l_diversity: groups too uniform;
    t_closeness: groups whose sensitive DISTRIBUTION sits too far from
    the table's).  A group can be large AND carry l distinct values yet
    still leak — e.g. 99% one diagnosis where the corpus is uniform —
    the skewness attack l-diversity cannot see.

    Distance is total variation (= Earth Mover's Distance under the
    equal-ground-distance metric the original paper uses for categorical
    attributes): tv(g) = ½ Σ_v |P(v|g) − P(v)|.  Values absent from a
    group contribute P(v) each, so instead of materializing the missing
    (group × value) combinations we fold only observed cells with the
    identity  tv(g) = ½·(1 + Σ_{v∈g} (|p_gv − q_v| − q_v)).

    Plan shape: ONE data-sized shuffle — the joint (quasi, sensitive)
    grouped count.  Group totals, global value shares, and the per-group
    fold are windows/aggregates over that BOUNDED cell table (≤ groups ×
    values rows), never a second corpus scan.  NULL sensitive values are
    a value level on both sides of the comparison (consistent with how
    GROUP BY treats them in Spark and DuckDB alike).  Per-cell terms are
    rounded to 6 decimals before the group fold and the fold result is
    rounded again, so the cross-engine comparison is summation-order-
    proof (repo oracle hygiene, the psi_report rule).

    Output mirrors k_anonymity / l_diversity: one row — (t, n_rows,
    n_groups, groups_above_t, rows_above_t, risk_fraction round6,
    max_tv, t_close)."""
    if not quasi_cols:
        raise ValueError("t_closeness: quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError("t_closeness: sensitive_col inside quasi_cols")
    if not (0.0 < t < 1.0):
        raise ValueError("t_closeness: t must be in (0, 1)")
    from pyspark.sql import Window

    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w_group = Window.partitionBy(*quasi_cols)
    w_value = Window.partitionBy(sensitive_col)
    w_all = Window.partitionBy(F.lit(1))
    p = F.col("_n") / F.sum("_n").over(w_group)
    q = F.sum("_n").over(w_value) / F.sum("_n").over(w_all)
    terms = cells.select(
        *quasi_cols,
        F.col("_n").alias("_cell_n"),
        F.round(F.abs(p - q) - q, 6).alias("_term"),
    )
    groups = terms.groupBy(*quasi_cols).agg(
        F.sum("_cell_n").alias("_gn"),
        F.round((F.lit(1.0) + F.sum("_term")) / 2.0, 6).alias("_tv"),
    )
    above = F.col("_tv") > t
    return groups.agg(
        F.round(F.lit(float(t)), 6).alias("t"),
        F.sum("_gn").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(above.cast("long")).alias("groups_above_t"),
        F.coalesce(F.sum(F.when(above, F.col("_gn"))), F.lit(0)).alias(
            "rows_above_t"
        ),
        F.round(
            F.coalesce(F.sum(F.when(above, F.col("_gn"))), F.lit(0))
            / F.sum("_gn"),
            6,
        ).alias("risk_fraction"),
        F.max("_tv").alias("max_tv"),
        (F.max("_tv") <= t).alias("t_close"),
    )


def mutual_information_pairs(
    df: DataFrame, pairs: "list[tuple[str, str]]"
) -> DataFrame:
    """Mutual information for N column pairs in ONE scan of the data —
    the sweep face of mutual_information, sharing categorical_
    association's melt: every pair's joint cells land in a single
    grouped count (shuffle sized by summed joint cardinalities), and all
    three entropy terms per pair fold from that bounded table.

    Rows where EITHER side is NULL are excluded from that pair's terms
    (the mutual_information convention — marginals must stay consistent
    with the joint), independently per pair.  The joint table is PINNED
    (lazy localCheckpoint): H(a,b) and both marginal re-aggregations use
    divergent projections, so without the pin the corpus would scan
    three times (the double-scan sweep rule; measured on
    mutual_information in r4).  A broadcast pair spine keeps pairs with
    zero non-null rows in the output with NULL mi.

    Output per pair: (col_a, col_b, mi round6) — bit-compatible with
    mutual_information for a single pair."""
    if not pairs:
        raise ValueError("mutual_information_pairs: need at least one pair")
    for a, b in pairs:
        if a == b:
            raise ValueError(f"mutual_information_pairs: self-pair {a!r}")
    melted = _melt_pairs(df, pairs, "_a", "_b")
    joint = (
        melted.filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("col_a", "col_b", "_a", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )

    def _h(counts: DataFrame, name: str) -> DataFrame:
        return counts.groupBy("col_a", "col_b").agg(
            (
                F.log2(F.sum("_c"))
                - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
            ).alias(name)
        )

    hab = _h(joint, "_hab")
    ha = _h(
        joint.groupBy("col_a", "col_b", "_a").agg(F.sum("_c").alias("_c")),
        "_ha",
    )
    hb = _h(
        joint.groupBy("col_a", "col_b", "_b").agg(F.sum("_c").alias("_c")),
        "_hb",
    )
    spine = df.sparkSession.createDataFrame(
        [(a, b) for a, b in pairs], "col_a string, col_b string"
    )
    folded = ha.join(hb, ["col_a", "col_b"]).join(hab, ["col_a", "col_b"])
    return spine.join(F.broadcast(folded), ["col_a", "col_b"], "left").select(
        "col_a",
        "col_b",
        F.round(F.col("_ha") + F.col("_hb") - F.col("_hab"), 6).alias("mi"),
    )


def outlier_report_grouped(
    df: DataFrame,
    column: str,
    id_cols: "list[str]",
    group_cols: "list[str]",
    method: str = "mad",
    cutoff: float = 3.5,
) -> DataFrame:
    """Per-GROUP outlier rows — outlier_report with the fences computed
    inside each group, for populations whose segments live on different
    scales (a $5 'error' event is normal, a $5 'purchase' is not): a
    global fence either floods the small-scale group with false alarms
    or goes blind in it.

    Same estimators and scan accounting as outlier_report (mad: median →
    MAD → filter, irreducibly 3 scans; zscore: 2), except the 1-row
    stats frame becomes a GROUP-KEYED bounded table broadcast-joined
    back on the group columns (cardinality-bounded by contract — the
    mutual_information scale rule).  NULL group keys form their own
    group (groupBy semantics, both engines).  Constant groups (zero
    spread) emit no rows.  Output: group_cols + id_cols + value +
    score round(6); cutoff compares unrounded scores."""
    if method not in ("mad", "zscore"):
        raise ValueError("outlier_report_grouped: method must be 'mad' or 'zscore'")
    if not group_cols:
        raise ValueError("outlier_report_grouped: group_cols must be non-empty")
    import functools

    c = F.col(column)
    base = df.filter(c.isNotNull())

    def _nullsafe_join(left: DataFrame, keyed: DataFrame) -> DataFrame:
        # an equi-join on the group columns would silently drop NULL
        # group keys (the inclusion_profile review finding) — join
        # null-safely on renamed fence keys.  The fence frame derives
        # FROM `left`, so unqualified refs would self-join-misbind;
        # alias both sides and qualify every key reference.
        renamed = keyed.select(
            *[F.col(g).alias(f"_gk_{i}") for i, g in enumerate(group_cols)],
            *[col for col in keyed.columns if col not in group_cols],
        )
        lhs, rhs = left.alias("_lhs"), renamed.alias("_rhs")
        quoted = [g.replace("`", "``") for g in group_cols]
        cond = functools.reduce(
            lambda a, b: a & b,
            [
                F.col(f"_lhs.`{q}`").eqNullSafe(F.col(f"_rhs._gk_{i}"))
                for i, q in enumerate(quoted)
            ],
        )
        return lhs.join(F.broadcast(rhs), cond).drop(
            *[f"_gk_{i}" for i in range(len(group_cols))]
        )

    if method == "zscore":
        fences = base.groupBy(*group_cols).agg(
            F.avg(c).alias("_center"),
            F.stddev_pop(c).alias("_spread"),
        )
        scale = F.lit(1.0)
    else:
        med = base.groupBy(*group_cols).agg(
            F.percentile(c, F.lit(0.5)).alias("_center")
        )
        fences = (
            _nullsafe_join(base, med)
            .groupBy(*group_cols)
            .agg(
                F.first("_center").alias("_center"),
                F.percentile(F.abs(c - F.col("_center")), F.lit(0.5)).alias(
                    "_spread"
                ),
            )
        )
        scale = F.lit(0.6745)
    score = scale * (c - F.col("_center")) / F.col("_spread")
    return (
        _nullsafe_join(base, fences)
        .filter((F.col("_spread") > 0) & (F.abs(score) > F.lit(float(cutoff))))
        .select(*group_cols, *id_cols, c.alias("value"), F.round(score, 6).alias("score"))
    )


def distinct_overlap(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Snapshot set comparison at SKETCH cost: distinct counts of A, B and
    A ∪ B from three HyperLogLog sketches — "how many NEW keys did this
    batch add" / "how much does it overlap the baseline" without the
    exact-distinct shuffle (new ≈ union − B, common ≈ A + B − union by
    inclusion-exclusion).  Each side is ONE map-side-mergeable sketch
    aggregate; the union merges two 1-row frames, so comparing 10^12-key
    snapshots costs two scans and KBs of sketch state.

    Returns one row: (n_a_est, n_b_est, n_union_est, n_new_in_a_est,
    n_common_est) as longs.  NULL keys are NOT counted (HLL aggregates
    skip them) — note that ``distinct().count()`` on the same column
    counts a NULL row, so an exact-count comparison must filter NULLs to
    share semantics.  Estimates carry HLL's ~1–2% relative error
    (the driver query checks the ≤5% contract against exact counts — the
    stats_distinct_hll pattern); the derived differences compound both
    errors, so tiny true differences can read as 0 (floored) — a NEW-key
    ALARM should trigger on thresholds far above the error floor.
    """
    sa = df_a.agg(F.hll_sketch_agg(col).alias("_sa"))
    sb = df_b.agg(F.hll_sketch_agg(col).alias("_sb"))
    both = sa.crossJoin(sb).select(
        F.hll_sketch_estimate("_sa").alias("n_a_est"),
        F.hll_sketch_estimate("_sb").alias("n_b_est"),
        F.hll_sketch_estimate(F.hll_union("_sa", "_sb")).alias("n_union_est"),
    )
    return both.select(
        "n_a_est",
        "n_b_est",
        "n_union_est",
        F.greatest(
            F.col("n_union_est") - F.col("n_b_est"), F.lit(0)
        ).alias("n_new_in_a_est"),
        F.greatest(
            F.col("n_a_est") + F.col("n_b_est") - F.col("n_union_est"),
            F.lit(0),
        ).alias("n_common_est"),
    )


def quantile_profile(
    df: DataFrame,
    col: str,
    probs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
    group_col: "str | None" = None,
) -> DataFrame:
    """Exact grouped quantiles — deequ's ApproxQuantiles as a PROFILE
    analyzer, exact because a certification threshold sitting on an
    approximate quantile flips with the sketch seed: ONE grouped
    ``percentile`` aggregate computes every requested quantile per
    segment (linear-interpolation definition, ≡ SQL quantile_cont, the
    engine-parity rule from outlier_report), melted to one
    (group, p, q) row per quantile over the bounded group table.

    Exact percentile holds each group's column values for the sort —
    the group-sized memory bound; for heavy-tailed segments at extreme
    scale swap in t-digest (operators/tdigest.py) and accept the
    approximation contract.  q is round(6); NULL values are excluded by
    the aggregate, an all-NULL group keeps its row with NULL q.
    """
    if not probs:
        raise ValueError("quantile_profile: probs must be non-empty")
    pr = [float(p) for p in probs]
    if any(not 0.0 <= p <= 1.0 for p in pr):
        raise ValueError(f"quantile_profile: probs must be in [0,1]: {pr}")
    agg = [
        F.round(F.percentile(F.col(col), F.lit(p)), 6).alias(f"_q{i}")
        for i, p in enumerate(pr)
    ]
    if group_col is None:
        wide = df.agg(*agg).select(F.lit("_all").alias("_grp"), "*")
    else:
        wide = df.groupBy(
            F.col(group_col).cast("string").alias("_grp")
        ).agg(*agg)
    entries = F.array(
        *[
            F.struct(F.lit(p).alias("p"), F.col(f"_q{i}").alias("q"))
            for i, p in enumerate(pr)
        ]
    )
    return wide.select(
        F.col("_grp").alias("group_value"), F.explode(entries).alias("e")
    ).select("group_value", "e.p", "e.q")


# Anchored, engine-portable format patterns: the Java ∩ RE2 ∩ DuckDB
# dialect (explicit ASCII classes, no backreferences, no lookaround —
# the PII-scrub parity rule), so Spark rlike and DuckDB regexp_matches
# grade every value identically.
FORMAT_PATTERNS: "dict[str, str]" = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "uuid": (
        r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
        r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    ),
    "ipv4": (
        r"^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$"
    ),
    "iso_date": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "url": r"^https?://[A-Za-z0-9._~:/?#@!$&'()*+,;=%-]+$",
}


def format_profile(
    df: DataFrame,
    columns: "list[str]",
    formats: "list[str] | None" = None,
) -> DataFrame:
    """String-format discovery — deequ's pattern analyzers (containsEmail,
    containsURL, …) as a grid: for every (column, format) pair, how many
    non-null values match the anchored pattern.  A column that is 99.8%
    UUID is a key wearing a string type; a 40%-email column is two feeds
    mixed together.

    ONE multi-aggregate scan (count + per-column non-null count + one
    rlike sum per cell — all codegen, no Python), melted over the bounded
    wide row.  match_rate = n_match / n_nonnull, round(6), NULL when the
    column is all-NULL.  Patterns come from FORMAT_PATTERNS (the
    Java ∩ RE2 ∩ DuckDB dialect) so two engines grade identically —
    extend that dict, not the regex dialect.
    """
    if not columns:
        raise ValueError("format_profile: columns must be non-empty")
    fmts = list(formats) if formats is not None else list(FORMAT_PATTERNS)
    unknown = [f for f in fmts if f not in FORMAT_PATTERNS]
    if unknown:
        raise ValueError(f"format_profile: unknown formats {unknown}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs.append(F.count(F.col(c)).alias(f"_nn_{i}"))
        for j, fmt in enumerate(fmts):
            aggs.append(
                F.sum(
                    F.col(c).rlike(FORMAT_PATTERNS[fmt]).cast("long")
                ).alias(f"_m_{i}_{j}")
            )
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(fmt).alias("format"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{i}").alias("n_nonnull"),
                F.coalesce(F.col(f"_m_{i}_{j}"), F.lit(0)).alias("n_match"),
            )
            for i, c in enumerate(columns)
            for j, fmt in enumerate(fmts)
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select(
        "e.column",
        "e.format",
        "e.n_rows",
        "e.n_nonnull",
        "e.n_match",
        F.when(
            F.col("e.n_nonnull") > 0,
            F.round(F.col("e.n_match") / F.col("e.n_nonnull"), 6),
        ).alias("match_rate"),
    )


def corpus_composition(
    df: DataFrame,
    group_col: str,
    weight_col: "str | None" = None,
) -> DataFrame:
    """Corpus composition report — "what share of my training mix is each
    source/language": per-group document count and weight mass (tokens,
    chars — any additive weight) with round-6 shares, the one-scan
    readout every mixture decision (mixture_rates, quota_sample,
    weighted draws) starts from.

    ONE grouped aggregate + share fold via a window over the BOUNDED
    group table.  NULL group values are a real segment; NULL weights
    count 0 toward mass but the doc still counts.
    """
    from pyspark.sql import Window

    w = F.coalesce(F.col(weight_col), F.lit(0)).cast("double") if weight_col else F.lit(1.0)
    per = df.groupBy(F.col(group_col).cast("string").alias("group_value")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("_mass"),
    )
    tot = Window.partitionBy(F.lit(1))
    return per.select(
        "group_value",
        "n_docs",
        F.col("_mass").cast("double").alias("mass"),
        F.round(F.col("n_docs") / F.sum("n_docs").over(tot), 6).alias(
            "doc_share"
        ),
        F.when(
            F.sum("_mass").over(tot) > 0,
            F.round(F.col("_mass") / F.sum("_mass").over(tot), 6),
        ).alias("mass_share"),
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_basket: "int | None" = None,
) -> DataFrame:
    """Frequent item PAIRS with support / confidence / lift — the
    market-basket association analyzer (the 2-itemset core of Apriori,
    which is where real pipelines stop: higher orders explode and lift on
    pairs already surfaces the co-occurrence structure).  Over an events
    log this answers "which event types co-occur in the same user's
    history far above chance" — input-mix structure no per-column
    profile sees.

    Shape: baskets collapse to DISTINCT (basket, item) memberships first
    (map-side partial), so a user firing the same event 10^6 times costs
    one membership.  Pair candidates come from a self-join keyed on the
    basket id with ``item_a < item_b`` — per-basket work is quadratic in
    the basket's DISTINCT-item count, which for typed event logs is the
    (tiny) item domain; for unbounded domains ``max_items_per_basket``
    drops wider baskets (count measured on distinct items) and the drop
    count should be reported by the caller — a silent cap would bias
    support invisibly, so the cap is opt-in and default-off.  Item and
    pair counts are basket counts (support counting), n_baskets joins in
    as a broadcast scalar.

    Metrics (all round6, computed from raw counts — never from rounded
    intermediates): support = n_ab / n_baskets; conf_a_b = n_ab / n_a;
    conf_b_a = n_ab / n_b; lift = n_ab * n_baskets / (n_a * n_b).  NULL
    baskets and NULL items carry no membership evidence and are excluded.

    Output: (item_a, item_b, n_ab, n_a, n_b, support, conf_a_b, conf_b_a,
    lift), item_a < item_b, filtered to n_ab >= min_count."""
    if min_count < 1:
        raise ValueError("frequent_pairs: min_count must be >= 1")
    memb = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    if max_items_per_basket is not None:
        wide = (
            memb.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_w"))
            .filter(F.col("_w") > max_items_per_basket)
            .select("_b")
        )
        memb = memb.join(wide, "_b", "left_anti")
    memb = memb.localCheckpoint(eager=False)  # feeds 4 branches; one compute
    n_baskets = memb.groupBy().agg(
        F.countDistinct("_b").alias("_nb")
    )
    item_counts = memb.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    left = memb.select(F.col("_b"), F.col("_i").alias("item_a"))
    right = memb.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    out = (
        pairs.join(
            item_counts.select(
                F.col("_i").alias("item_a"), F.col("_ni").alias("n_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("_i").alias("item_b"), F.col("_ni").alias("n_b")
            ),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab") / F.col("_nb"), 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_b"),
        F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_a"),
        F.round(
            F.col("n_ab") * F.col("_nb") / (F.col("n_a") * F.col("n_b")), 6
        ).alias("lift"),
    )


_BENFORD_CRITICAL_P05_DF8 = 15.507  # chi-square upper 5% point, 8 df


def benford_conformance(
    df: DataFrame,
    value_col: str,
    group_col: "str | None" = None,
    critical: float = _BENFORD_CRITICAL_P05_DF8,
) -> DataFrame:
    """Benford first-digit conformance — the fabricated-amounts /
    unit-mix-change detector used on financial and measurement columns:
    the distribution of leading significant digits of |value| vs
    Benford's law p(d) = log10(1 + 1/d), with a chi-square statistic per
    group and a verdict against the 5% critical value (df = 8).

    Exactness contract: digits come from the INTEGER part — rows with
    |value| < 1 (no integer digit) or ≥ 9e18 (BIGINT overflow) are
    excluded, and the digit is the first character of the BIGINT's
    decimal rendering.  Integer rendering is exact and identical in every
    engine, unlike log10-of-double digit extraction, whose floor can flip
    on 1-ulp differences (the cross-engine value-hash rule).

    Shape: ONE data-sized shuffle (grouped digit counts, map-side
    partial); the 9-digit spine per group and the chi-square fold are
    windows over the bounded (groups × 9) cell table.  Zero-observed
    digits still contribute their expected mass to chi2 — dropping them
    would understate the statistic exactly when the data is least
    Benford.

    Output: (group?, digit 1-9, n, observed_p round6, expected_p round6,
    chi2 round6, benford_violate), 9 rows per group."""
    from pyspark.sql import Window

    v = F.col(value_col)
    src = df.filter(
        v.isNotNull() & (F.abs(v) >= 1) & (F.abs(v) < 9.0e18)
    )
    gcols = [group_col] if group_col else []
    if group_col:
        src = src.filter(F.col(group_col).isNotNull())
    digit = F.substring(
        F.floor(F.abs(v)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = src.select(*gcols, digit.alias("digit")).groupBy(
        *gcols, "digit"
    ).agg(F.count(F.lit(1)).alias("n"))
    # counts feeds both the group spine and the cell join; without this the
    # corpus is scanned twice (measured) — the frame is ≤ groups × 9 rows
    counts = counts.localCheckpoint(eager=False)
    # spine = the observed groups (or one all-rows group); an empty source
    # yields an empty spine and therefore an empty report, never fake rows
    spine = (
        counts.select(*gcols).distinct()
        if group_col
        else counts.select(F.lit(1).alias("_g")).distinct().drop("_g")
    )
    digits = spine.select(
        *gcols, F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    )
    cells = digits.join(counts, [*gcols, "digit"], "left").select(
        *gcols, "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    total = F.sum("n").over(w)
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    term = (F.col("n") - total * exp_p) ** 2 / (total * exp_p)
    chi2 = F.round(F.sum(term).over(w), 6)
    return cells.select(
        *gcols,
        "digit",
        "n",
        F.round(F.col("n") / total, 6).alias("observed_p"),
        F.round(exp_p, 6).alias("expected_p"),
        chi2.alias("chi2"),
        (chi2 > F.lit(float(critical))).alias("benford_violate"),
    )


_ARITH_OPS = ("add", "sub", "mul", "div")


def _arith_expected(left: str, op: str, right: str):
    lc, rc = F.col(left), F.col(right)
    if op == "add":
        return lc + rc
    if op == "sub":
        return lc - rc
    if op == "mul":
        return lc * rc
    return F.try_divide(lc, rc)  # div: right = 0 → NULL → row not checked


def arithmetic_consistency(
    df: DataFrame,
    rules: "list[tuple[str, str, str, str]]",
    tolerance: float = 1e-6,
) -> DataFrame:
    """Cross-field arithmetic invariants — the warehouse checks
    ``aggregate_reconciliation`` runs ACROSS tables, applied WITHIN a row:
    does ``target ≈ left op right`` hold (gross = net × tax factor,
    total = price + freight)?  Each rule is (target, left, op, right)
    with op ∈ add/sub/mul/div.

    A row is CHECKED when target, left, right are all non-NULL and the
    expected value is defined (div by zero → undefined → not checked,
    not violated).  A checked row VIOLATES when |target − expected| >
    tolerance · max(1, |expected|) — relative above 1, absolute below,
    so the test neither drowns near zero nor pinches at magnitude.

    Shape: ONE corpus scan — all per-rule checked/violation counts are a
    single multi-aggregate (map-side partial); the report unpivots the
    one-row result.  Output: (rule, n_checked, n_violations,
    violation_rate round6, holds), one row per rule."""
    if not rules:
        raise ValueError("arithmetic_consistency: rules must be non-empty")
    for r in rules:
        if len(r) != 4 or r[2] not in _ARITH_OPS:
            raise ValueError(
                f"arithmetic_consistency: bad rule {r!r} (op in {_ARITH_OPS})"
            )
    if tolerance <= 0:
        raise ValueError("arithmetic_consistency: tolerance must be positive")
    aggs = []
    labels = []
    for i, (tgt, left, op, right) in enumerate(rules):
        exp = _arith_expected(left, op, right)
        checked = (
            F.col(tgt).isNotNull()
            & F.col(left).isNotNull()
            & F.col(right).isNotNull()
            & exp.isNotNull()
        )
        bad = checked & (
            F.abs(F.col(tgt) - exp)
            > F.lit(float(tolerance)) * F.greatest(F.lit(1.0), F.abs(exp))
        )
        aggs.append(F.count(F.when(checked, 1)).alias(f"_c_{i}"))
        aggs.append(F.count(F.when(bad, 1)).alias(f"_b_{i}"))
        sym = {"add": "+", "sub": "-", "mul": "*", "div": "/"}[op]
        labels.append(f"{tgt}={left}{sym}{right}")
    row = df.agg(*aggs)
    stack_args = []
    for i, lab in enumerate(labels):
        stack_args += [f"'{lab}'", f"_c_{i}", f"_b_{i}"]
    long = row.select(
        F.expr(
            f"stack({len(rules)}, {', '.join(stack_args)}) AS "
            "(rule, n_checked, n_violations)"
        )
    )
    rate = F.round(F.try_divide(F.col("n_violations"), F.col("n_checked")), 6)
    return long.select(
        "rule",
        "n_checked",
        "n_violations",
        rate.alias("violation_rate"),
        (F.col("n_violations") == 0).alias("holds"),
    )


def arithmetic_violations(
    df: DataFrame,
    rule: "tuple[str, str, str, str]",
    tolerance: float = 1e-6,
    keep: "list[str] | None" = None,
) -> DataFrame:
    """Row-level complement of one ``arithmetic_consistency`` rule: the
    checked-and-violating rows with observed vs expected and the round6
    delta.  Filter pushed to the scan; output is violations-sized.

    Output: (*keep, rule, observed, expected, delta round6)."""
    if len(rule) != 4 or rule[2] not in _ARITH_OPS:
        raise ValueError(f"arithmetic_violations: bad rule {rule!r}")
    tgt, left, op, right = rule
    exp = _arith_expected(left, op, right)
    checked = (
        F.col(tgt).isNotNull()
        & F.col(left).isNotNull()
        & F.col(right).isNotNull()
        & exp.isNotNull()
    )
    bad = checked & (
        F.abs(F.col(tgt) - exp)
        > F.lit(float(tolerance)) * F.greatest(F.lit(1.0), F.abs(exp))
    )
    sym = {"add": "+", "sub": "-", "mul": "*", "div": "/"}[op]
    return df.filter(bad).select(
        *(keep or []),
        F.lit(f"{tgt}={left}{sym}{right}").alias("rule"),
        F.col(tgt).alias("observed"),
        exp.alias("expected"),
        F.round(F.col(tgt) - exp, 6).alias("delta"),
    )


def join_explosion_report(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Pre-join blast-radius profiler — answers "what happens if I join
    these on this key" WITHOUT materializing the join: exact inner-join
    output size Σ_k n_left(k)·n_right(k), per-side key cardinalities and
    multiplicities, match/only-key splits, and the explosion factor
    (join rows per max input row).  At 100 TB an unprofiled many-to-many
    join is the classic cluster-killer; this report costs two key-bounded
    groupBys plus one join of the COUNT frames (key-cardinality-sized,
    never row-sized).

    NULL keys never match in SQL joins — they are counted per side and
    excluded from all match arithmetic.  max_pair_product is the hottest
    single key's output contribution (the skew headline: one key
    producing 10^10 rows is invisible in the total until it kills a
    task).

    Output: ONE row (n_left, n_right, left_null_keys, right_null_keys,
    left_keys, right_keys, matched_keys, left_only_keys, right_only_keys,
    join_rows, max_left_mult, max_right_mult, max_pair_product,
    explosion_factor round6)."""
    # each count frame feeds the match join AND its null-key aggregate;
    # the lazy checkpoint keeps the corpus at one scan per side
    lk = (
        left.select(F.col(left_key).alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_nl"))
        .localCheckpoint(eager=False)
    )
    rk = (
        right.select(F.col(right_key).alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_nr"))
        .localCheckpoint(eager=False)
    )
    j = lk.filter(F.col("_k").isNotNull()).join(
        rk.filter(F.col("_k").isNotNull()), "_k", "full"
    )
    agg = j.agg(
        F.sum(F.when(F.col("_nl").isNotNull(), F.col("_nl")).otherwise(0)).alias("_n_left_nn"),
        F.sum(F.when(F.col("_nr").isNotNull(), F.col("_nr")).otherwise(0)).alias("_n_right_nn"),
        F.count(F.when(F.col("_nl").isNotNull(), 1)).alias("left_keys"),
        F.count(F.when(F.col("_nr").isNotNull(), 1)).alias("right_keys"),
        F.count(
            F.when(F.col("_nl").isNotNull() & F.col("_nr").isNotNull(), 1)
        ).alias("matched_keys"),
        F.count(F.when(F.col("_nr").isNull(), 1)).alias("left_only_keys"),
        F.count(F.when(F.col("_nl").isNull(), 1)).alias("right_only_keys"),
        F.sum(
            F.when(
                F.col("_nl").isNotNull() & F.col("_nr").isNotNull(),
                F.col("_nl") * F.col("_nr"),
            ).otherwise(0)
        ).alias("join_rows"),
        F.max(F.col("_nl")).alias("max_left_mult"),
        F.max(F.col("_nr")).alias("max_right_mult"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("_nl").isNotNull() & F.col("_nr").isNotNull(),
                    F.col("_nl") * F.col("_nr"),
                )
            ),
            F.lit(0),
        ).alias("max_pair_product"),
    )
    null_l = lk.filter(F.col("_k").isNull()).agg(
        F.coalesce(F.sum("_nl"), F.lit(0)).alias("left_null_keys")
    )
    null_r = rk.filter(F.col("_k").isNull()).agg(
        F.coalesce(F.sum("_nr"), F.lit(0)).alias("right_null_keys")
    )
    out = agg.crossJoin(F.broadcast(null_l)).crossJoin(F.broadcast(null_r))
    n_left = (F.col("_n_left_nn") + F.col("left_null_keys")).alias("n_left")
    n_right = (F.col("_n_right_nn") + F.col("right_null_keys")).alias("n_right")
    return out.select(
        n_left,
        n_right,
        "left_null_keys",
        "right_null_keys",
        "left_keys",
        "right_keys",
        "matched_keys",
        "left_only_keys",
        "right_only_keys",
        "join_rows",
        "max_left_mult",
        "max_right_mult",
        "max_pair_product",
        F.round(
            F.try_divide(
                F.col("join_rows"),
                F.greatest(
                    F.col("_n_left_nn") + F.col("left_null_keys"),
                    F.col("_n_right_nn") + F.col("right_null_keys"),
                ),
            ),
            6,
        ).alias("explosion_factor"),
    )


def generalization_search(
    df: DataFrame,
    ladders: "dict[str, list[tuple[str, object]]]",
    k: int,
    max_combos: int = 64,
) -> DataFrame:
    """k-anonymity ENFORCEMENT search — the transform decision the
    ``k_anonymity`` report cannot make: given a generalization ladder per
    quasi-identifier (exact → coarser → suppressed, each level a name +
    Column expression), evaluate EVERY ladder combination's minimum group
    size and mark the combo to publish: the k-satisfying one with the
    least total generalization (sum of level indices; ties break to the
    lexicographically smallest combo string — deterministic).

    Shape: one corpus-sized grouped count per combination — the combo
    count is bounded by the ladder product (guarded at ``max_combos``),
    each pass map-side partial, and the report itself is combos-sized.
    No combo satisfying k leaves ``chosen`` false everywhere (the caller
    must add a ladder level or suppress — silently publishing the least-
    bad combo would leak).

    Output: one row per combo — (combo 'col=level|col2=level', cost,
    n_groups, min_group_size, satisfies_k, chosen)."""
    import itertools

    if k < 1:
        raise ValueError("generalization_search: k must be >= 1")
    if not ladders or any(not lv for lv in ladders.values()):
        raise ValueError("generalization_search: every ladder needs >= 1 level")
    cols = sorted(ladders)
    combos = list(itertools.product(*[range(len(ladders[c])) for c in cols]))
    if len(combos) > max_combos:
        raise ValueError(
            f"generalization_search: {len(combos)} combos exceeds "
            f"max_combos={max_combos}"
        )
    from pyspark.sql import Window

    reports = []
    for combo in combos:
        label = "|".join(
            f"{c}={ladders[c][i][0]}" for c, i in zip(cols, combo)
        )
        cost = int(sum(combo))
        exprs = [
            ladders[c][i][1].alias(f"_g{j}")
            for j, (c, i) in enumerate(zip(cols, combo))
        ]
        counts = df.select(*exprs).groupBy(
            *[f"_g{j}" for j in range(len(cols))]
        ).agg(F.count(F.lit(1)).alias("_n"))
        reports.append(
            counts.agg(
                F.lit(label).alias("combo"),
                F.lit(cost).alias("cost"),
                F.count(F.lit(1)).alias("n_groups"),
                F.min("_n").alias("min_group_size"),
            )
        )
    rep = reports[0]
    for r in reports[1:]:
        rep = rep.unionByName(r)
    satisfies = F.coalesce(
        F.col("min_group_size") >= F.lit(int(k)), F.lit(False)
    )
    w = Window.orderBy(
        satisfies.cast("int").desc(), F.col("cost").asc(), F.col("combo").asc()
    )
    rn = F.row_number().over(w)
    return rep.select(
        "combo",
        "cost",
        "n_groups",
        "min_group_size",
        satisfies.alias("satisfies_k"),
        ((rn == 1) & satisfies).alias("chosen"),
    )


def fit_quantile_bins(df: DataFrame, column: str, k: int) -> DataFrame:
    """FIT half of the quantile-bucketizer pair: the k−1 interior
    boundaries of ``column`` as a persistable (idx, boundary) frame — the
    'model' a training snapshot exports so serving/eval datasets bucket
    on the SAME grid (``equidepth_histogram`` fits and assigns on one
    frame; real pipelines fit once and apply everywhere — the IVF-index
    pattern applied to binning).  Boundaries are round(6): the persisted
    artifact must re-load bit-identically through any writer/reader pair,
    and fit + apply use the same rounded values so the rounding never
    splits a dataset against itself."""
    if k <= 1:
        raise ValueError("fit_quantile_bins: need k >= 2 buckets")
    c = F.col(column)
    probs = [i / k for i in range(1, k)]
    bounds = df.filter(c.isNotNull()).agg(
        F.percentile(c, F.array(*[F.lit(p) for p in probs])).alias("_b")
    )
    return bounds.select(
        F.posexplode("_b").alias("idx", "_raw")
    ).select("idx", F.round("_raw", 6).alias("boundary"))


def apply_bins(
    df: DataFrame, column: str, edges, out_col: str = "bucket"
) -> DataFrame:
    """APPLY half: bucket ``column`` against fitted edges (a
    ``fit_quantile_bins`` frame or a plain float list).  Assignment is
    "count of boundaries strictly below x" — a value EQUAL to a boundary
    falls in the lower bucket, the ``equidepth_histogram`` convention.
    NULL values get a NULL bucket (absent, not bucket 0).

    The edges collect to the driver (k-bounded — the persisted-model
    read, same shape as the IVF index load) and ride into the plan as an
    array literal, so assignment is pure codegen — no join, no Python."""
    if isinstance(edges, DataFrame):
        boundaries = [r.boundary for r in edges.orderBy("idx").collect()]
    else:
        boundaries = [float(b) for b in edges]
    if not boundaries or sorted(boundaries) != list(boundaries):
        raise ValueError(
            "apply_bins: edges must be a non-empty ascending boundary list"
        )
    c = F.col(column)
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    bucket = F.aggregate(
        arr, F.lit(0), lambda acc, b: acc + F.when(b < c, 1).otherwise(0)
    ).cast("long")
    return df.withColumn(out_col, F.when(c.isNotNull(), bucket))


# ---------------------------------------------------------------------------
# Keyed pseudonymization (round-4 wave 34)
# ---------------------------------------------------------------------------


def pseudonym_key(
    col: Column, domain: str, secret: str, length: int = 32
) -> Column:
    """Deterministic keyed surrogate for one value: the first ``length`` hex
    chars of sha256(secret \\x1f domain \\x1f value-as-string).  Same
    (secret, domain, value) → same surrogate in every table, every run,
    every engine — which is exactly what keeps foreign keys joinable after
    scrubbing.  NULL stays NULL (no evidence → no surrogate).  The default
    128-bit surrogate keeps the birthday collision probability ≈ 1.5e-15
    even at 10^12 distinct keys; per-column ``domain`` labels separate
    namespaces so unrelated columns sharing raw values cannot be linked
    through their surrogates."""
    if not secret:
        raise ValueError("pseudonym_key: secret must be non-empty")
    if not 8 <= length <= 64:
        raise ValueError(f"pseudonym_key: length must be in [8, 64], got {length}")
    h = F.sha2(
        F.concat_ws("\x1f", F.lit(secret), F.lit(domain), col.cast("string")), 256
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.substring(h, 1, length)
    )


def pseudonymize(
    df: DataFrame,
    cols: "dict[str, str] | list[str]",
    secret: str,
    length: int = 32,
) -> DataFrame:
    """Replace identifier columns with keyed surrogates, preserving
    referential integrity ACROSS tables: pass the same ``domain`` label for
    the two sides of a foreign key (e.g. ``{"c_custkey": "custkey"}`` on
    customer and ``{"o_custkey": "custkey"}`` on orders) and every join
    still lines up on the surrogates.  ``cols`` as a list uses each column
    name as its own domain.  Purely row-local (one projection, no shuffle,
    whole-stage codegen) — the GDPR-pipeline primitive that the k-anonymity
    / l-diversity / t-closeness REPORTS assume has already run on direct
    identifiers."""
    mapping = {c: c for c in cols} if not isinstance(cols, dict) else dict(cols)
    missing = [c for c in mapping if c not in df.columns]
    if missing:
        raise ValueError(f"pseudonymize: columns not in frame: {missing}")
    out = df
    for c, dom in mapping.items():
        out = out.withColumn(c, pseudonym_key(F.col(c), dom, secret, length))
    return out


# ---------------------------------------------------------------------------
# KMV (bottom-k) joinability discovery (round-4 wave 38)
# ---------------------------------------------------------------------------
#
# ``inclusion_profile`` answers "is A ⊆ B" EXACTLY with one distinct-union
# pass per column pair — right at report scale, corpus-sized at discovery
# scale (all pairs over wide schemas, 10^12 rows).  The sketch path bounds
# every column to k hashes: the k MINIMUM md5 values of the column's
# distinct set (bottom-k / KMV).  Within the shared threshold
# τ = min(max(S_A), max(S_B)) the two sketches are uniform samples of the
# SAME hash range, so |L_A ∩ L_B| / |L_A ∪ L_B| estimates Jaccard and
# |L_A ∩ L_B| / |L_A| estimates containment(A ⊆ B) — standard bottom-k
# estimators (Cohen & Kaplan), here with md5 so the DuckDB oracle replays
# the sketch BIT-FOR-BIT (deterministic, no seeds, no error band needed).


def kmv_column_sketches(
    df: DataFrame, columns: "list[str]", k: int = 128, table: str = ""
) -> DataFrame:
    """Bottom-k sketch of every listed column in ONE corpus scan:
    stack → distinct (col, md5) pairs → per-column bottom-k selected in
    TWO phases — a salted window (16-way parallel bottom-k per column)
    then a k·16-row final window — so no column ever serializes its full
    distinct set through one task.  Returns (col, h) with ≤ k rows per
    column; NULLs carry no hash evidence and are excluded."""
    if not columns:
        raise ValueError("kmv_column_sketches: columns must be non-empty")
    if k < 8:
        raise ValueError(f"kmv_column_sketches: k must be >= 8, got {k}")
    from pyspark.sql import Window

    prefix = f"{table}." if table else ""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{prefix}{c}").alias("col"),
                        F.md5(F.col(c).cast("string")).alias("h"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.col", "s.h").filter(F.col("h").isNotNull()).distinct()
    salted = Window.partitionBy(
        "col", F.crc32(F.col("h")) % 16
    ).orderBy("h")
    final = Window.partitionBy("col").orderBy("h")
    return (
        stacked.withColumn("_r", F.row_number().over(salted))
        .filter(F.col("_r") <= k)
        .withColumn("_r", F.row_number().over(final))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def joinability_report(sketches: DataFrame, k: int = 128) -> DataFrame:
    """All-pairs joinability estimates from stacked bottom-k sketches
    (the output of one or more :func:`kmv_column_sketches`, unioned):
    for every column pair (col_a < col_b), truncate both sketches at the
    shared threshold τ = min(max(S_a), max(S_b)) and report

    - ``n_common``      = |L_a ∩ L_b|  (exact over the sketch),
    - ``est_jaccard``   = n_common / |L_a ∪ L_b|,
    - ``est_contain_a_in_b`` = n_common / |L_a|  (and symmetrically b in a),

    each round(6) of an exact small-integer ratio — engine-identical.
    Work is sketch-sized: (n_cols · k) rows joined on hash, never data.
    Pairs with zero overlap ARE reported (est 0.0) — absence of
    joinability is the discovery result too."""
    sk = sketches.localCheckpoint(eager=False)
    mx = sk.groupBy("col").agg(F.max("h").alias("_mh"))
    pairs = (
        mx.alias("a")
        .join(mx.alias("b"), F.col("a.col") < F.col("b.col"))
        .select(
            F.col("a.col").alias("col_a"),
            F.col("b.col").alias("col_b"),
            F.least(F.col("a._mh"), F.col("b._mh")).alias("_tau"),
        )
    )
    la = sk.select(F.col("col").alias("col_a"), F.col("h").alias("_ha"))
    lb = sk.select(F.col("col").alias("col_b"), F.col("h").alias("_hb"))
    sa = (
        pairs.join(la, "col_a")
        .filter(F.col("_ha") <= F.col("_tau"))
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).alias("_la"))
    )
    sb = (
        pairs.join(lb, "col_b")
        .filter(F.col("_hb") <= F.col("_tau"))
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).alias("_lb"))
    )
    inter = (
        pairs.join(la, "col_a")
        .filter(F.col("_ha") <= F.col("_tau"))
        .join(lb.withColumnRenamed("_hb", "_ha"), ["col_b", "_ha"])
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    ni = F.coalesce(F.col("_ni"), F.lit(0))
    nla = F.coalesce(F.col("_la"), F.lit(0))
    nlb = F.coalesce(F.col("_lb"), F.lit(0))

    def _ratio(num, den):
        # an empty truncated sketch means zero observed overlap, never NULL
        return F.when(den == 0, F.lit(0.0)).otherwise(F.round(num / den, 6))

    return (
        pairs.select("col_a", "col_b")
        .join(sa, ["col_a", "col_b"], "left")
        .join(sb, ["col_a", "col_b"], "left")
        .join(inter, ["col_a", "col_b"], "left")
        .select(
            "col_a",
            "col_b",
            ni.cast("long").alias("n_common"),
            _ratio(ni, nla + nlb - ni).alias("est_jaccard"),
            _ratio(ni, nla).alias("est_contain_a_in_b"),
            _ratio(ni, nlb).alias("est_contain_b_in_a"),
        )
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis (round-4 wave 42)
# ---------------------------------------------------------------------------


def ab_test_report(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Welch two-sample comparison of ``metric_col`` between two arms — the
    experiment-readout primitive (and the gate form of the drift checks:
    "did the new pipeline version move the metric?").

    Determinism contract: the metric is quantized to 1e-6 (integer
    micro-units) at the scan, so BOTH moment sums are EXACT integer
    aggregates (sum as decimal(38,0) — no floating-point accumulation, no
    partition-order noise); every downstream double then derives from
    identical operands in an identical expression order, making the full
    report bit-reproducible across engines.  One conditional-aggregate
    corpus scan (map-side partial); NULL metrics carry no evidence.

    Returns one row: (n_control, n_treatment, mean_control,
    mean_treatment, abs_lift, rel_lift, t_stat, dof, significant) with
    Welch's t, Welch–Satterthwaite dof, and a fixed two-sided 5% gate
    (|t| > 1.959964 — the normal critical value; at experiment n the t
    correction is < 1e-3).  rel_lift is NULL when mean_control is 0.
    """
    from pyspark.sql import Column as _Col

    v = F.col(metric_col)
    vm = F.round(v * F.lit(1000000.0)).cast("long")
    arm = F.col(group_col)

    def _moments(label: str, tag: str) -> "list[_Col]":
        keep = (arm == F.lit(label)) & v.isNotNull()
        return [
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias(f"_n{tag}"),
            F.coalesce(
                F.sum(F.when(keep, vm).otherwise(None).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias(f"_s1{tag}"),
            F.coalesce(
                F.sum(
                    F.when(keep, vm.cast("decimal(38,0)") * vm).otherwise(None)
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias(f"_s2{tag}"),
        ]

    agg = df.agg(*_moments(control, "c"), *_moments(treatment, "t"))

    def _stats(tag: str):
        n = F.col(f"_n{tag}").cast("double")
        s1 = F.col(f"_s1{tag}").cast("double")
        s2 = F.col(f"_s2{tag}").cast("double")
        mean = s1 / n / F.lit(1000000.0)
        var = (
            s2 / F.lit(1e12)
            - (s1 / F.lit(1000000.0)) * (s1 / F.lit(1000000.0)) / n
        ) / (n - F.lit(1.0))
        return n, mean, var

    nc, mc, vc = _stats("c")
    nt, mt, vt = _stats("t")
    sec = vc / nc
    set_ = vt / nt
    se = F.sqrt(sec + set_)
    t = (mt - mc) / se
    dof = (sec + set_) * (sec + set_) / (
        sec * sec / (nc - F.lit(1.0)) + set_ * set_ / (nt - F.lit(1.0))
    )
    return agg.select(
        F.col("_nc").alias("n_control"),
        F.col("_nt").alias("n_treatment"),
        F.round(mc, 6).alias("mean_control"),
        F.round(mt, 6).alias("mean_treatment"),
        F.round(mt - mc, 6).alias("abs_lift"),
        F.when(mc == 0.0, F.lit(None).cast("double"))
        .otherwise(F.round((mt - mc) / mc, 6))
        .alias("rel_lift"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
        (F.abs(t) > F.lit(1.959964)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Feature encoders + winsorization (round-4 wave 45)
# ---------------------------------------------------------------------------
#
# The fit/transform split of fit_quantile_bins, extended to the other three
# feature-prep staples a training pipeline runs over tabular columns:
# frequency encoding, smoothed target encoding, and percentile clipping.
# Fit artifacts are small persistable tables (category-sized / two edges),
# transforms are broadcast joins or pure projections — nothing corpus-sized
# ever sits on the driver.  NULL is a REAL category throughout (null-safe
# grouping and null-safe application — the approx_fd convention).


def fit_frequency_encoding(df: DataFrame, col: str) -> DataFrame:
    """(value, n, freq) per category — freq = round(n / N, 6), N = all
    rows.  One grouped scan; NULL is a category."""
    n_total = df.count()
    if n_total == 0:
        raise ValueError("fit_frequency_encoding: empty frame")
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "value",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.lit(float(n_total)), 6).alias("freq"),
        )
    )


def fit_target_encoding(
    df: DataFrame,
    col: str,
    target_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """Smoothed mean-target encoding (the Micci-Barreca estimator):

        enc(c) = (sum_c + m · prior) / (n_c + m)

    with prior = the global target mean and m = ``smoothing`` pseudo-
    observations pulling rare categories toward it.  Determinism: the
    target quantizes to integer micro-units, per-category sums are exact
    decimal aggregates, prior and enc then derive from identical doubles
    (round 6 on output).  Rows with NULL target carry no evidence; NULL
    category is a real category.  Returns (value, n, enc) — the
    persistable fit table ``apply_encoding`` consumes; encode the SERVE
    set with a fit table built on the TRAIN split only, or the encoding
    leaks the label."""
    if smoothing < 0:
        raise ValueError(f"fit_target_encoding: smoothing must be >= 0, got {smoothing}")
    t = F.col(target_col)
    vm = F.round(t * F.lit(1000000.0)).cast("long").cast("decimal(38,0)")
    per = (
        df.filter(t.isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.sum(vm).alias("_s1"), F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = per.agg(
        F.sum("_s1").alias("_s"), F.sum("n").alias("_n")
    ).collect()[0]
    if not tot["_n"]:
        raise ValueError("fit_target_encoding: no non-NULL targets")
    prior = float(tot["_s"]) / float(tot["_n"]) / 1e6
    enc = (
        F.col("_s1").cast("double") / F.lit(1000000.0)
        + F.lit(float(smoothing)) * F.lit(prior)
    ) / (F.col("n").cast("double") + F.lit(float(smoothing)))
    return per.select(
        "value",
        F.col("n").cast("long").alias("n"),
        F.round(enc, 6).alias("enc"),
    )


def apply_encoding(
    df: DataFrame,
    col: str,
    fit: DataFrame,
    out_col: str,
    enc_col: str = "enc",
    default: float | None = None,
) -> DataFrame:
    """Broadcast the fit table onto the serve frame (null-safe on the
    category, so NULL categories hit their fitted row).  Categories the
    fit never saw get ``default`` (pass the fitted prior; None leaves
    NULL — loud, never silently zero)."""
    m = F.broadcast(
        fit.select(F.col("value").alias("_v"), F.col(enc_col).alias("_e"))
    )
    joined = df.join(m, F.col(col).eqNullSafe(F.col("_v")), "left")
    fallback = F.lit(default).cast("double") if default is not None else F.lit(
        None
    ).cast("double")
    return joined.select(
        *[F.col(c) for c in df.columns],
        F.coalesce(F.col("_e"), fallback).alias(out_col),
    )


def winsorize(
    df: DataFrame,
    col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Percentile clipping: fit round-6 [lower_q, upper_q] edges on the
    column (one percentile aggregate — the fit_quantile_bins contract:
    persistable, bit-stable through any writer) and clip with
    least/greatest (pure projection).  Appends ``{col}_winsorized`` and
    ``clipped``; NULL passes through unclipped (no evidence)."""
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError(
            f"winsorize: need 0 <= lower_q < upper_q <= 1, got "
            f"({lower_q}, {upper_q})"
        )
    row = df.agg(
        F.round(
            F.expr(f"percentile(cast({col} as double), {lower_q!r})"), 6
        ).alias("_lo"),
        F.round(
            F.expr(f"percentile(cast({col} as double), {upper_q!r})"), 6
        ).alias("_hi"),
    ).collect()[0]
    lo, hi = row["_lo"], row["_hi"]
    if lo is None:
        raise ValueError(f"winsorize: column {col} is all NULL")
    v = F.col(col).cast("double")
    clipped = F.least(F.greatest(v, F.lit(lo)), F.lit(hi))
    return df.select(
        *[F.col(c) for c in df.columns],
        F.when(v.isNull(), F.lit(None).cast("double"))
        .otherwise(clipped)
        .alias(f"{col}_winsorized"),
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .otherwise((v < F.lit(lo)) | (v > F.lit(hi)))
        .alias("clipped"),
    )


def target_prior(df: DataFrame, target_col: str) -> float:
    """The global mean of a target column under the encoder's exact-sum
    contract (micro-quantized decimal sums → one double division),
    round 6 — the ``default`` to hand apply_encoding for unseen
    categories."""
    t = F.col(target_col)
    vm = F.round(t * F.lit(1000000.0)).cast("long").cast("decimal(38,0)")
    row = df.filter(t.isNotNull()).agg(
        F.sum(vm).alias("_s"), F.count(F.lit(1)).alias("_n")
    ).collect()[0]
    if not row["_n"]:
        raise ValueError("target_prior: no non-NULL targets")
    return round(float(row["_s"]) / float(row["_n"]) / 1e6, 6)


# ---------------------------------------------------------------------------
# Exact quantiles without a global sort (wave 42)
# ---------------------------------------------------------------------------

def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: "list[float]",
    lo: float,
    hi: float,
    bins: int = 1 << 10,
    weight_col: "str | None" = None,
) -> DataFrame:
    """EXACT type-1 quantiles (value at rank ceil(p·n)) of ``col`` for each
    p in ``probs`` — one row per prob: (prob, n, rank, value).  The exact
    counterpart of the t-digest estimates, and the range-partitioner
    planner: probs = k/N for k in 1..N−1 gives the boundary keys that
    split the column into N equal-count ranges.

    No corpus-wide sort (the roc_auc/ks_drift decomposition): distinct
    values fold under one hash shuffle keyed (bin, v); bins are an
    order-preserving fixed-width coarsening of [lo, hi) (out-of-range
    clamps to edge bins — safe, any order-preserving coarsening works);
    the exclusive bin-prefix runs over the BOUNDED bin table (the only
    single-partition exchange, <= ``bins`` rows) and broadcasts back; the
    within-bin inclusive cumulative is a keyed window.  Each distinct
    value then owns the exact GLOBAL rank interval (cum−cnt, cum]; the
    tiny probs frame broadcasts and each value row tests |probs|
    intervals — linear in distinct values, never quadratic, never sorted.

    Rank arithmetic guards the float boundary: ceil(p·n − 1e-9), so
    p = 0.5 over n = 1000 cannot wobble to rank 501.  NULLs are excluded
    from n (a NULL has no rank).

    ``weight_col`` switches to WEIGHTED quantiles: n becomes the total
    integer weight W (positive longs by contract; NULL / non-positive
    weights excluded with their rows) and the rank-ceil(p·W) value
    answers mass-weighted questions — "below what length does half the
    corpus's token mass sit".  Identical plan shape; only the summed
    quantity changes."""
    if not probs:
        raise ValueError("exact_quantiles: probs must be non-empty")
    if any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"exact_quantiles: probs must be in (0, 1], got {probs}")
    if hi <= lo:
        raise ValueError(f"exact_quantiles: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    v = F.col(col).cast("double")
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))

    if weight_col is None:
        base = df.filter(v.isNotNull()).select(
            v.alias("_v"), F.lit(1).cast("long").alias("_w")
        )
    else:
        w = F.col(weight_col).cast("long")
        base = df.filter(v.isNotNull() & w.isNotNull() & (w > 0)).select(
            v.alias("_v"), w.alias("_w")
        )
    per = (
        base
        .withColumn("_bin", binc)
        .groupBy("_bin", "_v")
        .agg(F.sum("_w").alias("_cnt"))
    )
    bin_tot = per.groupBy("_bin").agg(F.sum("_cnt").alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(F.sum("_cnt").alias("_n"))
    spark = df.sparkSession
    pf = spark.createDataFrame([(float(p),) for p in sorted(probs)], "prob double")

    ranked = (
        per.withColumn("_cumin", F.sum("_cnt").over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .withColumn("_cum", F.col("_cumin") + F.col("_pref"))
        .crossJoin(F.broadcast(tot))
    )
    rank = F.greatest(
        F.ceil(F.col("prob") * F.col("_n") - F.lit(1e-9)), F.lit(1)
    )
    return (
        ranked.join(
            F.broadcast(pf),
            (rank <= F.col("_cum")) & (rank > F.col("_cum") - F.col("_cnt")),
        )
        .select(
            "prob",
            F.col("_n").cast("long").alias("n"),
            rank.cast("long").alias("rank"),
            F.col("_v").alias("value"),
        )
    )


def grouped_exact_quantiles(
    df: DataFrame,
    col: str,
    group_col: str,
    probs: "list[float]",
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Per-group EXACT type-1 quantiles — p50/p95/p99 latency per endpoint,
    length percentiles per source — with NO sort and NO single-partition
    exchange AT ALL: the grouped variant of exact_quantiles keys every
    stage by the group, so even the bin-prefix window runs
    partitionBy(group) (over <= bins rows per group), the shape that
    scales to any group count.  Returns one row per (group, prob):
    (group, prob, n, rank, value); groups are whatever distinct values
    ``group_col`` holds (NULL group is a group like any other); NULL
    values are excluded from every group's n."""
    if not probs:
        raise ValueError("grouped_exact_quantiles: probs must be non-empty")
    if any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(
            f"grouped_exact_quantiles: probs must be in (0, 1], got {probs}"
        )
    if hi <= lo:
        raise ValueError(f"grouped_exact_quantiles: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    v = F.col(col).cast("double")
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))

    per = (
        df.filter(v.isNotNull())
        .select(F.col(group_col).alias("group"), v.alias("_v"))
        .withColumn("_bin", binc)
        .groupBy("group", "_bin", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_bins = (
        Window.partitionBy("group")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_prefix = (
        per.groupBy("group", "_bin")
        .agg(F.sum("_cnt").alias("_bc"))
        .select(
            "group",
            "_bin",
            F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref"),
        )
    )
    w_in = (
        Window.partitionBy("group", "_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.groupBy("group").agg(F.sum("_cnt").alias("_n"))
    spark = df.sparkSession
    pf = spark.createDataFrame([(float(p),) for p in sorted(probs)], "prob double")

    ranked = (
        per.withColumn("_cumin", F.sum("_cnt").over(w_in))
        .join(bin_prefix, ["group", "_bin"])
        .withColumn("_cum", F.col("_cumin") + F.col("_pref"))
        .join(tot, "group")
    )
    rank = F.greatest(
        F.ceil(F.col("prob") * F.col("_n") - F.lit(1e-9)), F.lit(1)
    )
    return (
        ranked.join(
            F.broadcast(pf),
            (rank <= F.col("_cum")) & (rank > F.col("_cum") - F.col("_cnt")),
        )
        .select(
            "group",
            "prob",
            F.col("_n").cast("long").alias("n"),
            rank.cast("long").alias("rank"),
            F.col("_v").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Nested path profile — per-leaf metrics with examples (wave 46)
# ---------------------------------------------------------------------------

def nested_path_profile(df: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-leaf-path profile of an arbitrarily nested frame: for every
    scalar leaf (recursing through structs; arrays switch to per-ELEMENT
    grain via explode) the row count at that grain, NULL count, distinct
    non-null count, and the ``top_k`` most frequent values with counts —
    the "what's actually in this column" exploration surface that pairs
    with schema inference (the schema says string; the profile says 92%
    'text', 8% 'image', 0.1% NULL).

    Paths: ``a.b`` for struct descent, ``a[].b`` past an array (empty /
    NULL arrays contribute no element rows — the unnest grain).  Values
    compare as canonical strings (cast string — engine-identical for the
    supported leaf types).  Top-k ties break by value ascending, so the
    output is exact and replayable.

    Scale shape: leaves sharing a grain stack through ONE projection
    (F.stack — no per-leaf scan); each array level adds one explode
    projection; metrics are keyed groupBys and the top-k is the
    two-stage per-path window (WindowGroupLimit).  Returns
    (path, n, n_null, n_distinct, rank, value, value_count); paths whose
    values are all NULL keep their aggregate row with NULL rank/value."""
    from pyspark.sql import Window, types as T

    if top_k < 1:
        raise ValueError(f"nested_path_profile: top_k must be >= 1, got {top_k}")
    stacked: list = []

    def stack(frame: DataFrame, pairs: list) -> None:
        if not pairs:
            return
        flat: list = []
        for p, c in pairs:
            flat += [F.lit(p), c]
        stacked.append(
            frame.select(
                F.stack(F.lit(len(pairs)), *flat).alias("path", "value")
            )
        )

    def process(frame: DataFrame, fields, prefix: str, acc) -> list:
        pairs = []
        for f in fields:
            col = F.col(f.name) if acc is None else acc.getField(f.name)
            path = f"{prefix}{f.name}"
            dt = f.dataType
            if isinstance(dt, T.StructType):
                pairs += process(frame, dt.fields, f"{path}.", col)
            elif isinstance(dt, T.ArrayType):
                ex = frame.select(F.explode(col).alias("_e"))
                if isinstance(dt.elementType, T.StructType):
                    sub = process(
                        ex, dt.elementType.fields, f"{path}[].", F.col("_e")
                    )
                    stack(ex, sub)
                else:
                    stack(
                        ex,
                        [(f"{path}[]", F.col("_e").cast("string"))],
                    )
            else:
                pairs.append((path, col.cast("string")))
        return pairs

    stack(df, process(df, df.schema.fields, "", None))
    if not stacked:
        raise ValueError("nested_path_profile: frame has no scalar leaves")
    base = stacked[0]
    for s in stacked[1:]:
        base = base.unionByName(s)

    agg = base.groupBy("path").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
    )
    w = Window.partitionBy("path").orderBy(
        F.desc("value_count"), F.asc("value")
    )
    tk = (
        base.filter(F.col("value").isNotNull())
        .groupBy("path", "value")
        .agg(F.count(F.lit(1)).alias("value_count"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
    return agg.join(tk, "path", "left").select(
        "path",
        F.col("n").cast("long"),
        F.col("n_null").cast("long"),
        F.col("n_distinct").cast("long"),
        F.col("rank").cast("int"),
        "value",
        F.col("value_count").cast("long"),
    )


# ---------------------------------------------------------------------------
# Multivariate (Mahalanobis) outliers — wave 49
# ---------------------------------------------------------------------------

def mahalanobis_outliers(
    df: DataFrame,
    cols: "list[str]",
    threshold: float,
    id_cols: "list[str]",
) -> DataFrame:
    """Rows whose squared Mahalanobis distance from the column-mean under
    the sample covariance exceeds ``threshold`` — the MULTIVARIATE outlier
    detector: a row can sit inside every per-column z-band (outlier_report
    passes it) while its COMBINATION is wildly off-manifold (high price at
    tiny quantity); Mahalanobis whitens the correlation away and measures
    that jointly.  Under multivariate normality d² is chi²(d), so
    thresholds come from chi² quantiles (d=3: 11.34 = 99%, 16.27 = 99.9%).

    d ∈ {2, 3} with the inverse in CLOSED FORM (adjugate / determinant) —
    the point: the whole statistic stays one declarative expression both
    engines evaluate identically, no matrix library anywhere.  Higher-d
    belongs to the linalg/PCA path (embedding_covariance), which holds
    the d×d object on the driver.

    Determinism contract (the ab_test_report convention): values quantize
    to integer micro-units at the scan, the d(d+3)/2 moment sums are
    EXACT decimal(38,0) aggregates, and every downstream double —
    covariance entries, adjugate, determinant, the quadratic form —
    derives from identical operands in an identical expression order, so
    the round-6 distance and the > threshold row SET are bit-reproducible
    across engines (the oracle replays the same closed form).

    Scale shape: one map-side-partial moment scan (bounded 1-row result,
    broadcast back by crossJoin), one projection pass scoring every row —
    no shuffle of corpus-sized data at all.  Rows with any NULL feature
    carry no evidence and are excluded from both the moments and the
    scoring.  Raises if the covariance is singular (det ≤ 0): a
    degenerate feature set needs dropping a column, not a NaN column.

    Output: (*id_cols, *cols, dist2) for rows with round-6 dist2 >
    threshold."""
    d = len(cols)
    if d not in (2, 3):
        raise ValueError(
            f"mahalanobis_outliers: closed-form path supports 2 or 3 cols, got {d}"
        )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    keep = df
    for c in cols:
        keep = keep.filter(F.col(c).isNotNull())
    qs = [
        F.round(F.col(c) * F.lit(1000000.0)).cast("long").alias(f"_q{i}")
        for i, c in enumerate(cols)
    ]
    base = keep.select(*id_cols, *[F.col(c) for c in cols], *qs)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i in range(d):
        aggs.append(F.sum(dec(F.col(f"_q{i}"))).alias(f"_s{i}"))
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(dec(F.col(f"_q{i}")) * F.col(f"_q{j}")).alias(f"_s{i}{j}")
            )
    mom = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(mom))
    n = F.col("_n").cast("double")
    s = [F.col(f"_s{i}").cast("double") for i in range(d)]

    def cov(i: int, j: int):
        i, j = min(i, j), max(i, j)
        sij = F.col(f"_s{i}{j}").cast("double")
        # sample covariance in squared UNITS: micro² / 1e12
        return (n * sij - s[i] * s[j]) / (n * (n - F.lit(1.0))) / F.lit(1e12)

    z = [
        F.col(f"_q{i}") / F.lit(1000000.0) - s[i] / n / F.lit(1000000.0)
        for i in range(d)
    ]
    if d == 2:
        c11, c12, c22 = cov(0, 0), cov(0, 1), cov(1, 1)
        det = c11 * c22 - c12 * c12
        quad = (
            c22 * z[0] * z[0]
            - F.lit(2.0) * c12 * z[0] * z[1]
            + c11 * z[1] * z[1]
        )
    else:
        c11, c12, c13 = cov(0, 0), cov(0, 1), cov(0, 2)
        c22, c23, c33 = cov(1, 1), cov(1, 2), cov(2, 2)
        det = (
            c11 * (c22 * c33 - c23 * c23)
            - c12 * (c12 * c33 - c13 * c23)
            + c13 * (c12 * c23 - c13 * c22)
        )
        a11 = c22 * c33 - c23 * c23
        a22 = c11 * c33 - c13 * c13
        a33 = c11 * c22 - c12 * c12
        a12 = -(c12 * c33 - c13 * c23)
        a13 = c12 * c23 - c13 * c22
        a23 = -(c11 * c23 - c12 * c13)
        quad = (
            a11 * z[0] * z[0]
            + a22 * z[1] * z[1]
            + a33 * z[2] * z[2]
            + F.lit(2.0)
            * (a12 * z[0] * z[1] + a13 * z[0] * z[2] + a23 * z[1] * z[2])
        )
    guard = F.when(
        det <= F.lit(0.0),
        F.raise_error(
            F.lit("mahalanobis_outliers: singular covariance (det <= 0)")
        ),
    ).otherwise(det)
    dist2 = F.round(quad / guard, 6)
    return (
        scored.withColumn("dist2", dist2)
        .filter(F.col("dist2") > F.lit(float(threshold)))
        .select(*id_cols, *cols, "dist2")
    )


# ---------------------------------------------------------------------------
# Weight of evidence / information value — wave 50
# ---------------------------------------------------------------------------

def woe_iv_profile(
    df: DataFrame,
    feature_col: str,
    target_col,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Weight-of-evidence / information-value profile of a binned numeric
    feature against a binary target — the credit-scoring-style predictive-
    power screen: WoE(bin) = ln(good-share / bad-share) says which way and
    how strongly a bin separates the classes, and the IV sum ranks
    features BEFORE any model exists (rule of thumb: IV < 0.02 useless,
    > 0.3 strong).  For a curation pipeline this is "does doc length /
    perplexity / quality score actually predict the reject label".

    Binning is column_histogram's exact contract (identical
    floor((x−lo)/w) double expression, hi lands in the last bucket,
    outside/NULL excluded) so the two profiles line up bucket-for-bucket;
    rows with a NULL target carry no label evidence and are excluded.
    ``target_col`` may be a column name or a boolean Column expression
    (true = bad/event class).

    Exactness: bin counts are exact longs, shares are single divisions of
    exact longs, WoE = ln of their ratio, IV term = (share_good −
    share_bad)·WoE — identical operands, identical expression order,
    round-6 reproducible (the ab_test convention).  WoE/IV are NULL for
    bins empty on either side (no smoothing — a synthetic 0.5 would be an
    invented observation; callers wanting smoothing can widen bins).

    One conditional-aggregate pass bounded by the bucket count, broadcast
    spine for empty bins, totals carried on the 1-row moments frame —
    nothing corpus-sized shuffles.

    Output: (bucket, bucket_lo, bucket_hi, n_good, n_bad, woe, iv_term),
    one row per bucket."""
    if n_buckets <= 0 or not hi > lo:
        raise ValueError("woe_iv_profile: need n_buckets > 0 and hi > lo")
    w = (hi - lo) / n_buckets
    c = F.col(feature_col)
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    bucket = F.least(
        F.floor((c - F.lit(float(lo))) / F.lit(w)).cast("long"),
        F.lit(n_buckets - 1),
    )
    base = df.filter(
        c.isNotNull() & (c >= float(lo)) & (c <= float(hi)) & tgt.isNotNull()
    ).select(bucket.alias("bucket"), tgt.cast("boolean").alias("_bad"))
    counts = base.groupBy("bucket").agg(
        F.sum(F.when(~F.col("_bad"), 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(F.col("_bad"), 1).otherwise(0)).cast("long").alias("n_bad"),
    )
    spine = df.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    binned = (
        spine.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_good", F.lit(0)).cast("long").alias("n_good"),
            F.coalesce("n_bad", F.lit(0)).cast("long").alias("n_bad"),
        )
        # feeds BOTH the totals aggregate and the output join — without
        # this pin the corpus count pass runs twice (plan-audit finding,
        # the covariance-triple-scan lesson); the frame is bucket-sized
        .localCheckpoint(eager=False)
    )
    totals = binned.agg(
        F.sum("n_good").cast("long").alias("_tg"),
        F.sum("n_bad").cast("long").alias("_tb"),
    )
    j = binned.crossJoin(F.broadcast(totals))
    sg = F.col("n_good").cast("double") / F.col("_tg").cast("double")
    sb = F.col("n_bad").cast("double") / F.col("_tb").cast("double")
    ok = (
        (F.col("n_good") > 0)
        & (F.col("n_bad") > 0)
        & (F.col("_tg") > 0)
        & (F.col("_tb") > 0)
    )
    woe = F.when(ok, F.log(sg / sb))
    return j.select(
        "bucket",
        (F.lit(float(lo)) + F.col("bucket") * F.lit(w)).alias("bucket_lo"),
        (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w)).alias("bucket_hi"),
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round(F.when(ok, (sg - sb) * woe), 6).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# Seeded differentially-private count release — wave 54
# ---------------------------------------------------------------------------

def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float,
    seed: int = 42,
) -> DataFrame:
    """ε-DP histogram release: per-category counts plus Laplace(1/ε)
    noise — the governance endpoint that completes the privacy toolkit
    (k-anonymity / l-diversity / t-closeness PROFILE risk; this is the
    mechanism that lets aggregate counts LEAVE the boundary).  Disjoint
    categories give the count vector L1 sensitivity 1, so per-cell
    Laplace(1/ε) yields ε-DP for the whole histogram.

    The noise is SEEDED (md5-prefix uniform — the engine's sampling
    convention — through the exact Laplace inverse CDF), which is what
    makes the release deterministic, partition-order-free, and
    engine-replayable (the oracle recomputes it bit-for-bit).  Treat the
    seed like a key: with the seed public the mechanism is a
    reproducibility device, not privacy — the standard trade of every
    seeded-DP deployment, documented rather than hidden.

    u = (uint32(md5("dp-<seed>" ⊕ category)[:8]) + 0.5) / 16^8 ∈ (0, 1);
    noise = (1/ε)·ln(2u) for u < 0.5 else −(1/ε)·ln(2(1−u));
    released = count + round(noise) — integer release, NOT clamped at
    zero (clamping skews the unbiasedness this mechanism promises;
    negative small-count releases are the textbook behavior).

    One map-side-partial count pass + a category-sized projection; NULL
    categories carry no release.  Output: (group value under its own
    name, n_released, epsilon)."""
    if not epsilon > 0:
        raise ValueError(f"dp_noisy_counts: epsilon must be positive, got {epsilon}")
    g = F.col(group_col)
    counts = (
        df.filter(g.isNotNull())
        .groupBy(g)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    v = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("\x1f", F.lit(f"dp-{seed}"), g.cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(16**8))
    b = F.lit(1.0 / float(epsilon))
    noise = F.when(u < 0.5, b * F.log(F.lit(2.0) * u)).otherwise(
        -b * F.log(F.lit(2.0) * (F.lit(1.0) - u))
    )
    return counts.select(
        F.col(group_col),
        (F.col("_n") + F.round(noise).cast("long")).alias("n_released"),
        F.lit(float(epsilon)).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Unit-scale mismatch + relationship profile — wave 56
# ---------------------------------------------------------------------------

def scale_mismatch_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Pairwise decade-offset detector across sources for one metric —
    the cents-vs-dollars / ms-vs-s bug finder: a source whose values
    arrive in different UNITS passes every schema check and every range
    check scaled accordingly; what betrays it is the per-source median
    ORDER OF MAGNITUDE sitting ~k decades away from its peers.

    Per group: median of round-6 log10|value| over nonzero non-NULL
    values (the type-1 rank median under (mag, value) total order — the
    exact_quantiles convention, so the statistic replays exactly).
    Pairs (a < b by group name): decade_offset = round(median_b −
    median_a) and flagged = |offset| ≥ 1 AND the residual |Δ − offset|
    ≤ 0.2 — a CLEAN decade shift, not merely a wide distribution (two
    sources can differ by 1.3 orders for organic reasons; 1.0 ± 0.2 is
    the unit-bug signature).

    One corpus scan to per-group magnitude cells, keyed rank windows,
    then a groups² pair join over the BOUNDED group table.  Output:
    (group_a, group_b, median_mag_a, median_mag_b, decade_offset,
    flagged)."""
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(value_col)
    mags = (
        df.filter(g.isNotNull() & v.isNotNull() & (v != 0))
        .select(
            g.alias("grp"),
            F.round(F.log10(F.abs(v)), 6).alias("_m"),
        )
    )
    wrank = Window.partitionBy("grp").orderBy("_m")
    cnt = mags.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    med = (
        mags.withColumn("_rn", F.row_number().over(wrank))
        .join(cnt, "grp")
        .filter(
            F.col("_rn")
            == F.ceil(F.col("_n").cast("double") / 2.0 - 1e-9).cast("long")
        )
        .select("grp", F.col("_m").alias("median_mag"))
        # bounded group table feeds both sides of the pair join
        .localCheckpoint(eager=False)
    )
    a = med.select(F.col("grp").alias("group_a"), F.col("median_mag").alias("median_mag_a"))
    b = med.select(F.col("grp").alias("group_b"), F.col("median_mag").alias("median_mag_b"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    delta = F.col("median_mag_b") - F.col("median_mag_a")
    off = F.round(delta).cast("long")
    return pairs.select(
        "group_a",
        "group_b",
        "median_mag_a",
        "median_mag_b",
        off.alias("decade_offset"),
        (
            (F.abs(off) >= 1)
            & (F.abs(delta - off.cast("double")) <= F.lit(0.2))
        ).alias("flagged"),
    )


def relationship_profile(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
) -> DataFrame:
    """Join-relationship classification between two key columns — the
    data-contract primitive behind "orders.customer is N:1 to
    customer.custkey": counts both tables' key statistics, the exact
    max fan-out in each direction over the MATCHED keys, and the
    resulting class (one_to_one / one_to_many / many_to_one /
    many_to_many), plus unmatched-key counts each side (the referential
    residue).  A relationship that silently degrades from N:1 to N:M is
    how join explosions enter a pipeline; this is the check that pins
    it.

    Shape: two per-key count aggregates, a full-outer join ON THE
    BOUNDED KEY TABLES, one roll-up row.  NULL keys carry no
    relationship evidence and are counted separately.

    Output: (n_a, n_b, n_keys_a, n_keys_b, n_matched_keys,
    max_per_key_a, max_per_key_b, a_unmatched, b_unmatched, null_a,
    null_b, relationship)."""
    ka, kb = F.col(key_a), F.col(key_b)
    ca = (
        df_a.filter(ka.isNotNull())
        .groupBy(ka.alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("_na"))
    )
    cb = (
        df_b.filter(kb.isNotNull())
        .groupBy(kb.alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("_nb"))
    )
    nulls_a = df_a.filter(ka.isNull()).count()
    nulls_b = df_b.filter(kb.isNull()).count()
    j = ca.join(cb, "k", "full_outer").select(
        F.col("_na"), F.col("_nb"),
        (F.col("_na").isNotNull() & F.col("_nb").isNotNull()).alias("_both"),
    )
    agg = j.agg(
        F.coalesce(F.sum("_na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("_nb"), F.lit(0)).cast("long").alias("n_b"),
        F.count(F.col("_na")).cast("long").alias("n_keys_a"),
        F.count(F.col("_nb")).cast("long").alias("n_keys_b"),
        F.sum(F.when(F.col("_both"), 1).otherwise(0)).cast("long").alias("n_matched_keys"),
        F.coalesce(
            F.max(F.when(F.col("_both"), F.col("_na"))), F.lit(0)
        ).cast("long").alias("max_per_key_a"),
        F.coalesce(
            F.max(F.when(F.col("_both"), F.col("_nb"))), F.lit(0)
        ).cast("long").alias("max_per_key_b"),
        F.sum(F.when(F.col("_nb").isNull(), F.col("_na")).otherwise(0))
        .cast("long").alias("a_unmatched"),
        F.sum(F.when(F.col("_na").isNull(), F.col("_nb")).otherwise(0))
        .cast("long").alias("b_unmatched"),
    )
    rel = (
        F.when(
            (F.col("max_per_key_a") <= 1) & (F.col("max_per_key_b") <= 1),
            F.lit("one_to_one"),
        )
        .when(
            (F.col("max_per_key_a") <= 1) & (F.col("max_per_key_b") > 1),
            F.lit("one_to_many"),
        )
        .when(
            (F.col("max_per_key_a") > 1) & (F.col("max_per_key_b") <= 1),
            F.lit("many_to_one"),
        )
        .otherwise(F.lit("many_to_many"))
    )
    return agg.select(
        "*",
        F.lit(int(nulls_a)).cast("long").alias("null_a"),
        F.lit(int(nulls_b)).cast("long").alias("null_b"),
        rel.alias("relationship"),
    )


# ---------------------------------------------------------------------------
# Median imputer (fit/apply) + MAD robust z-scores — wave 57
# ---------------------------------------------------------------------------

def fit_imputer(
    df: DataFrame, value_col: str, group_col: "str | None" = None
) -> DataFrame:
    """FIT half of the median-imputer pair: per-group type-1 medians of
    round-6 values plus ONE global-fallback row (group = NULL) — the
    persistable 'model' the fit/apply split exports (the
    fit_quantile_bins pattern), so serving and eval impute with the SAME
    statistics a training snapshot fit.  The median (not the mean) is
    the imputation a skewed or outlier-ridden column tolerates.

    Medians are the engine's exact type-1 rank statistic under a
    (value) total order on round-6 values — replayable, no
    interpolation ambiguity across engines.  With ``group_col=None``
    the model is just the global row.

    Output: (group: string nullable, median: double)."""
    from pyspark.sql import Window

    v = F.round(F.col(value_col), 6)
    base = df.filter(F.col(value_col).isNotNull())

    def _median(frame, keyed: bool):
        if keyed:
            w = Window.partitionBy("_g").orderBy("_v")
            grp = ["_g"]
        else:
            w = Window.partitionBy(F.lit(1)).orderBy("_v")
            grp = []
        cnt = frame.groupBy(*grp).agg(F.count(F.lit(1)).cast("long").alias("_n"))
        ranked = frame.withColumn("_rn", F.row_number().over(w))
        joined = ranked.join(cnt, grp) if grp else ranked.crossJoin(F.broadcast(cnt))
        return joined.filter(
            F.col("_rn")
            == F.ceil(F.col("_n").cast("double") / 2.0 - 1e-9).cast("long")
        )

    glob = (
        _median(base.select(v.alias("_v")), keyed=False)
        .select(
            F.lit(None).cast("string").alias("group"),
            F.col("_v").alias("median"),
        )
    )
    if group_col is None:
        return glob
    per = (
        _median(
            base.filter(F.col(group_col).isNotNull()).select(
                F.col(group_col).cast("string").alias("_g"), v.alias("_v")
            ),
            keyed=True,
        )
        .select(F.col("_g").alias("group"), F.col("_v").alias("median"))
    )
    return per.unionByName(glob)


def apply_imputer(
    df: DataFrame,
    value_col: str,
    model: DataFrame,
    group_col: "str | None" = None,
    out_col: "str | None" = None,
    flag_col: str = "imputed",
) -> DataFrame:
    """APPLY half: fill NULL ``value_col`` with the fitted group median,
    falling back to the model's global row for unseen or NULL groups;
    ``flag_col`` marks the rows that were filled (imputation without
    provenance poisons downstream drift checks — the flag IS the
    provenance).  The model is bounded (groups + 1 rows): it broadcasts
    into one join + one projection, no corpus shuffle.  Rows that stay
    NULL (no group median AND no global row) keep NULL + flag false."""
    out_col = out_col or value_col
    gm = model.filter(F.col("group").isNotNull()).select(
        F.col("group").alias("_mg"), F.col("median").alias("_gmed")
    )
    glob_rows = model.filter(F.col("group").isNull()).select(
        F.lit(1).alias("_one"), F.col("median").alias("_glob")
    )
    v = F.col(value_col)
    step = df.withColumn("_one", F.lit(1)).join(
        F.broadcast(glob_rows), "_one", "left"
    )
    if group_col is not None:
        step = step.join(
            F.broadcast(gm),
            F.col(group_col).cast("string") == F.col("_mg"),
            "left",
        )
        fill = F.coalesce(F.col("_gmed"), F.col("_glob"))
    else:
        fill = F.col("_glob")
    filled = F.when(v.isNotNull(), v).otherwise(fill)
    flag = v.isNull() & fill.isNotNull()
    passthrough = [c for c in df.columns if c != out_col]
    return step.select(
        *[F.col(c) for c in passthrough],
        filled.alias(out_col),
        flag.alias(flag_col),
    )


def robust_z_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_cols: "list[str]",
    threshold: float = 3.5,
) -> DataFrame:
    """Rows whose MODIFIED z-score |0.6745·(x − median)/MAD| exceeds
    ``threshold`` per group (Iglewicz–Hoaglin; 3.5 is their canonical
    cut) — the robust counterpart of the mean/std outlier_report: one
    wild value inflates the std enough to hide ITSELF (masking), while
    the median and MAD barely move, so robust z catches what classical z
    provably misses at small n (tested).

    Exactness: both the median and the MAD (median absolute deviation)
    are type-1 rank statistics on round-6 values under pinned total
    orders; the score is a round-6 division of those exact operands.
    Groups with MAD = 0 (over half the values identical) score NULL and
    are never flagged — a zero denominator is a degenerate group, not an
    infinite outlier (documented contract).

    Shape: two keyed rank picks + two bounded joins back + one scoring
    projection; the per-group tables are group-sized throughout.
    Output: (*id_cols, group_col, value_col, robust_z)."""
    from pyspark.sql import Window

    v = F.round(F.col(value_col), 6)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(*id_cols, F.col(group_col), F.col(value_col), v.alias("_v"))

    def _rank_median(frame, val: str, out: str):
        w = Window.partitionBy(group_col).orderBy(val)
        cnt = frame.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        )
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .join(cnt, group_col)
            .filter(
                F.col("_rn")
                == F.ceil(F.col("_n").cast("double") / 2.0 - 1e-9).cast("long")
            )
            .select(group_col, F.col(val).alias(out))
        )

    med = _rank_median(base.select(group_col, "_v"), "_v", "_med")
    with_med = base.join(F.broadcast(med), group_col)
    dev = with_med.withColumn("_d", F.round(F.abs(F.col("_v") - F.col("_med")), 6))
    mad = _rank_median(dev.select(group_col, "_d"), "_d", "_mad")
    scored = dev.join(F.broadcast(mad), group_col).withColumn(
        "robust_z",
        F.when(
            F.col("_mad") > 0,
            F.round(
                F.lit(0.6745) * (F.col("_v") - F.col("_med")) / F.col("_mad"), 6
            ),
        ),
    )
    return scored.filter(
        F.abs(F.col("robust_z")) > F.lit(float(threshold))
    ).select(*id_cols, group_col, value_col, "robust_z")


# ---------------------------------------------------------------------------
# Exact concentration + rank correlation — wave 59
# ---------------------------------------------------------------------------

def _rank_intervals(df: DataFrame, col: str, lo: float, hi: float, bins: int):
    """Per distinct value of ``col``: (_v, _cnt, _cum) where _cum is the
    INCLUSIVE global rank end and (_cum − _cnt, _cum] the exact rank
    interval — the exact_quantiles bounded-prefix decomposition factored
    for reuse (no corpus-wide sort; the only single-partition exchange is
    the ≤ bins-row bin table)."""
    from pyspark.sql import Window

    v = F.col(col).cast("double")
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        df.filter(v.isNotNull())
        .select(v.alias("_v"))
        .withColumn("_bin", binc)
        .groupBy("_bin", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    bin_tot = per.groupBy("_bin").agg(F.sum("_cnt").alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.withColumn("_cumin", F.sum("_cnt").over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .select("_v", "_cnt", (F.col("_cumin") + F.col("_pref")).alias("_cum"))
    )


def gini_coefficient(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 1 << 10
) -> DataFrame:
    """Exact Gini concentration of a non-negative column WITHOUT a global
    sort — "what share of the corpus's token/byte/spend mass sits in the
    top slice": 0 = perfectly even, →1 = one row holds everything.  The
    mixture planner's diagnostic sibling: a corpus whose token mass is
    Gini-0.8-concentrated in one source is one bad dedup away from
    collapse.

    Exactness + shape: the rank-weighted sum Σ i·x_(i) needs each value's
    global rank — which the exact_quantiles bounded-prefix decomposition
    already yields per DISTINCT value as an interval (a, b]; a tie-run of
    value v occupies ranks a+1..b, and Σ i over it is (b(b+1) − a(a+1))/2
    — a closed form, so the whole statistic folds from the distinct-value
    frame with NO ordering of the corpus anywhere (tie order is provably
    irrelevant).  Values quantize to micro-units; every sum is
    decimal(38,0); Gini = (T2 − (n+1)·S)/(n·S) with T2 = 2·Σ i·x, derived
    in identical expression order, round-6.  Negative values raise (Gini
    is undefined); an all-zero column yields NULL.

    Output: one row (n, sum_value, gini)."""
    if hi <= lo:
        raise ValueError(f"gini_coefficient: need lo < hi, got [{lo}, {hi})")
    guarded = df.select(
        F.when(
            F.col(col) < 0,
            F.raise_error(F.lit("gini_coefficient: negative values (undefined)")),
        )
        .otherwise(F.col(col))
        .alias(col)
    )
    iv = _rank_intervals(guarded, col, lo, hi, bins)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vm = F.round(F.col("_v") * F.lit(1000000.0)).cast("long")
    b = F.col("_cum")
    a = F.col("_cum") - F.col("_cnt")
    # Σ 2i over (a, b] = b(b+1) − a(a+1): always an exact integer product
    tie_rank2 = dec(b) * (b + F.lit(1)) - dec(a) * (a + F.lit(1))
    agg = iv.agg(
        F.sum(dec(F.col("_cnt"))).alias("_nd"),
        F.sum(dec(vm) * F.col("_cnt")).alias("_s"),
        F.sum(dec(vm) * tie_rank2).alias("_t2"),
    )
    n = F.col("_nd").cast("double")
    s = F.col("_s").cast("double")
    t2 = F.col("_t2").cast("double")
    return agg.select(
        F.col("_nd").cast("long").alias("n"),
        F.round(s / F.lit(1000000.0), 6).alias("sum_value"),
        F.when(
            s > 0.0,
            F.round((t2 - (n + F.lit(1.0)) * s) / (n * s), 6),
        ).alias("gini"),
    )


def spearman_pairs(
    df: DataFrame,
    cols: "list[str]",
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """All-pairs Spearman rank correlation — the monotone-association
    counterpart of correlation_pairs' Pearson: immune to monotone
    transforms and heavy tails (a single wild row drags Pearson, moves a
    rank by one).  Listwise contract: rows with a NULL in ANY profiled
    column are excluded first, so every pair is ranked over the SAME
    sample (documented; pairwise deletion would rank each pair on a
    different population).

    Exactness + shape: per column, each distinct value's average tie
    rank in HALF-UNITS is the exact integer R2 = 2·(rank_start) + cnt −
    1 = 2·(cum − cnt) + cnt + 1, obtained from the same bounded-prefix
    rank intervals as exact_quantiles/gini (no corpus sort, no
    single-partition window over distinct values); the doubled ranks
    cancel in the correlation, so Spearman = Pearson over exact integer
    R2 with decimal(38,0) moments in ONE final aggregate for all pairs,
    round-6 in identical expression order.

    Output: (col_a, col_b, n, spearman) — one row per unordered pair."""
    if len(cols) < 2:
        raise ValueError("spearman_pairs: need at least 2 columns")
    if hi <= lo:
        raise ValueError(f"spearman_pairs: need lo < hi, got [{lo}, {hi})")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    base = base.select(*[F.col(c).cast("double").alias(c) for c in cols])
    base = base.localCheckpoint(eager=False)  # feeds one rank join per column
    joined = base
    for c in cols:
        rt = _rank_intervals(base, c, lo, hi, bins).select(
            F.col("_v").alias(c),
            (
                F.lit(2) * (F.col("_cum") - F.col("_cnt"))
                + F.col("_cnt")
                + F.lit(1)
            ).alias(f"_r_{c}"),
        )
        joined = joined.join(rt, c)
    dec = lambda x: x.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        r = F.col(f"_r_{c}")
        aggs.append(F.sum(dec(r)).alias(f"_s_{c}"))
        aggs.append(F.sum(dec(r) * r).alias(f"_q_{c}"))
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            aggs.append(
                F.sum(dec(F.col(f"_r_{ca}")) * F.col(f"_r_{cb}")).alias(
                    f"_p_{ca}_{cb}"
                )
            )
    m = joined.agg(*aggs)
    rows = []
    n = F.col("_n").cast("double")
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            sa, sb = F.col(f"_s_{ca}").cast("double"), F.col(f"_s_{cb}").cast("double")
            qa, qb = F.col(f"_q_{ca}").cast("double"), F.col(f"_q_{cb}").cast("double")
            p = F.col(f"_p_{ca}_{cb}").cast("double")
            va, vb = n * qa - sa * sa, n * qb - sb * sb
            rho = F.when(
                (F.col("_n") >= 2) & (va > 0.0) & (vb > 0.0),
                F.round((n * p - sa * sb) / (F.sqrt(va) * F.sqrt(vb)), 6),
            )
            rows.append(
                F.struct(
                    F.lit(ca).alias("col_a"),
                    F.lit(cb).alias("col_b"),
                    F.col("_n").alias("n"),
                    rho.alias("spearman"),
                )
            )
    return (
        m.select(F.explode(F.array(*rows)).alias("_x"))
        .select("_x.col_a", "_x.col_b", "_x.n", "_x.spearman")
    )


def grouped_gini(
    df: DataFrame,
    col: str,
    group_col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Per-group exact Gini — "which SOURCE is a monoculture": the
    concentration diagnostic keyed by source/shard/language, with the
    grouped_quantiles discipline applied to gini_coefficient's rank
    decomposition: every stage keys by the group — the bin-prefix window
    runs partitionBy(group) over ≤ bins rows per group, the within-bin
    cumulative keys (group, bin) — so the plan has ZERO single-partition
    exchanges and scales to any group count (plan-pinned).  Same exact
    arithmetic and NULL/negative contracts as the global operator.

    Output: (group, n, sum_value, gini) — one row per group."""
    from pyspark.sql import Window

    if hi <= lo:
        raise ValueError(f"grouped_gini: need lo < hi, got [{lo}, {hi})")
    g = F.col(group_col)
    v = F.col(col).cast("double")
    guarded = F.when(
        v < 0,
        F.raise_error(F.lit("grouped_gini: negative values (undefined)")),
    ).otherwise(v)
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        df.filter(g.isNotNull() & v.isNotNull())
        .select(g.alias("_g"), guarded.alias("_v"))
        .withColumn("_bin", binc)
        .groupBy("_g", "_bin", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    bin_tot = per.groupBy("_g", "_bin").agg(F.sum("_cnt").alias("_bc"))
    w_bins = (
        Window.partitionBy("_g")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_prefix = bin_tot.select(
        "_g", "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_g", "_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = (
        per.withColumn("_cumin", F.sum("_cnt").over(w_in))
        .join(bin_prefix, ["_g", "_bin"])
        .select("_g", "_v", "_cnt", (F.col("_cumin") + F.col("_pref")).alias("_cum"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vm = F.round(F.col("_v") * F.lit(1000000.0)).cast("long")
    b = F.col("_cum")
    a = F.col("_cum") - F.col("_cnt")
    tie_rank2 = dec(b) * (b + F.lit(1)) - dec(a) * (a + F.lit(1))
    agg = iv.groupBy("_g").agg(
        F.sum(dec(F.col("_cnt"))).alias("_nd"),
        F.sum(dec(vm) * F.col("_cnt")).alias("_s"),
        F.sum(dec(vm) * tie_rank2).alias("_t2"),
    )
    n = F.col("_nd").cast("double")
    s = F.col("_s").cast("double")
    t2 = F.col("_t2").cast("double")
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_nd").cast("long").alias("n"),
        F.round(s / F.lit(1000000.0), 6).alias("sum_value"),
        F.when(
            s > 0.0, F.round((t2 - (n + F.lit(1.0)) * s) / (n * s), 6)
        ).alias("gini"),
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_cols: "list[str]",
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """2-D Pareto front (skyline), both objectives MAXIMIZED: the rows no
    other row beats in both dimensions with at least one strict — the
    multi-objective selection operator Spark lacks (quality vs length,
    value vs recency): a top-k on any single score discards exactly the
    trade-off candidates the skyline keeps.  Minimize a dimension by
    negating it at the call site.

    A row survives iff its y equals the max y AT its x (same-x strict-y
    dominance) AND strictly exceeds the max y over all STRICTLY GREATER
    x (cross-x dominance: x' > x, y' ≥ y).  Duplicate (x, y) points
    don't dominate each other (no strict coordinate) and all survive —
    the standard skyline-with-duplicates contract.

    No global sort: the exclusive cross-x suffix maximum is the
    bounded-prefix decomposition run in REVERSE — per-bin maxima suffix-
    folded over the ≤ bins-row bin table, within-bin exclusive suffix
    max as a keyed window — the exact_quantiles machinery with (sum,
    asc) swapped for (max, desc).  Only comparisons touch the values
    (no arithmetic), so parity is exact with no quantization.  NULL in
    either dimension carries no dominance evidence and is excluded.

    Output: (*id_cols, x_col, y_col) — the surviving rows."""
    from pyspark.sql import Window

    if hi <= lo:
        raise ValueError(f"skyline2d: need lo < hi, got [{lo}, {hi})")
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        *id_cols, x.alias("_x"), y.alias("_y")
    )
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_x") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        base.withColumn("_bin", binc)
        .groupBy("_bin", "_x")
        .agg(F.max("_y").alias("_my"))
    )
    bin_max = per.groupBy("_bin").agg(F.max("_my").alias("_bm"))
    w_suf = Window.orderBy(F.desc("_bin")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bin_suffix = bin_max.select(
        "_bin", F.max("_bm").over(w_suf).alias("_sufbin")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy(F.desc("_x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fronts = (
        per.withColumn("_sufin", F.max("_my").over(w_in))
        .join(F.broadcast(bin_suffix), "_bin")
        .select(
            "_x",
            "_my",
            F.greatest(
                F.coalesce("_sufin", F.lit(float("-inf"))),
                F.coalesce("_sufbin", F.lit(float("-inf"))),
            ).alias("_m"),
        )
        .filter(F.col("_my") > F.col("_m"))
    )
    return (
        base.join(
            fronts,
            (base["_x"] == fronts["_x"]) & (base["_y"] == fronts["_my"]),
            "left_semi",
        )
        .select(*id_cols, F.col("_x").alias(x_col), F.col("_y").alias(y_col))
    )


# ---------------------------------------------------------------------------
# Seeded Poisson bootstrap + CUPED adjustment — wave 63
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds (cumulative e^-1 Σ 1/k!), fixed
# 9-decimal literals so both engines compare the SAME constants; mass
# beyond k=8 (~9e-6) collapses into 8 — documented truncation.
_POIS1_CUM = (
    0.367879441, 0.735758882, 0.919698603, 0.980988305,
    0.996323929, 0.999405870, 0.999917320, 0.999990409,
)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    replicates: int = 32,
    seed: int = 42,
    alpha: float = 0.05,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for a column mean via the
    SEEDED Poisson bootstrap — the error bar every profiling number in
    this engine lacks: "the mean value is 249.9 ± what?".  Poisson
    resampling is THE distributed bootstrap (Chamandy et al.): replicate
    r reweights each row by an independent Poisson(1) draw, so no
    replicate ever materializes and one pass computes them all.

    Determinism: the draw for (row, replicate) derives from the
    md5-prefix uniform of (seed, r, row id) through a fixed 9-decimal
    Poisson(1) inverse-CDF table (mass beyond k=8, ~9e-6, truncates to 8
    — documented), so every replicate is exact, partition-order-free,
    and engine-replayable.  Replicate means are exact integer ratios
    (micro-unit values × integer weights); the CI bounds are type-1 rank
    picks over the R replicate means (the exact_quantiles convention).

    Scale shape: the corpus explodes ×R (R bounded, default 32 — the
    honest cost), folds map-side to R (Σw, Σwv) partials, and everything
    after is R-row arithmetic.  NULL values excluded with their rows.

    Output: one row (n, mean, ci_lo, ci_hi, replicates, alpha)."""
    if replicates < 4:
        raise ValueError("bootstrap_mean_ci: need >= 4 replicates")
    if not 0.0 < alpha < 1.0:
        raise ValueError("bootstrap_mean_ci: alpha must be in (0, 1)")
    from pyspark.sql import Window

    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(
        F.round(v * F.lit(1000000.0)).cast("long").alias("_vm"),
        F.col(id_col).cast("string").alias("_id"),
    )
    r = F.explode(F.array(*[F.lit(i) for i in range(replicates)])).alias("_r")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit(f"boot-{seed}"), F.col("_r").cast("string"), F.col("_id")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    w = F.lit(len(_POIS1_CUM))
    for k in range(len(_POIS1_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CUM[k]), F.lit(k)).otherwise(w)
    reps = (
        base.select("_vm", "_id", r)
        .withColumn("_w", w.cast("long"))
        .groupBy("_r")
        .agg(
            F.sum("_w").cast("decimal(38,0)").alias("_sw"),
            F.sum(F.col("_w").cast("decimal(38,0)") * F.col("_vm")).alias("_swv"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            "_r",
            F.round(
                F.col("_swv").cast("double")
                / F.col("_sw").cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("_m"),
        )
    )
    wrank = Window.orderBy("_m", "_r")
    nrep = reps.agg(F.count(F.lit(1)).cast("long").alias("_nr"))
    lo_rank = F.greatest(
        F.ceil(F.lit(alpha / 2.0) * F.col("_nr").cast("double") - F.lit(1e-9)),
        F.lit(1),
    ).cast("long")
    hi_rank = F.greatest(
        F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("_nr").cast("double") - F.lit(1e-9)),
        F.lit(1),
    ).cast("long")
    ranked = reps.withColumn("_rn", F.row_number().over(wrank)).crossJoin(
        F.broadcast(nrep)
    )
    lo = ranked.filter(F.col("_rn") == lo_rank).select(
        F.col("_m").alias("ci_lo")
    )
    hi = ranked.filter(F.col("_rn") == hi_rank).select(
        F.col("_m").alias("ci_hi")
    )
    overall = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("_vm").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean"),
    )
    return (
        overall.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n",
            "mean",
            "ci_lo",
            "ci_hi",
            F.lit(int(replicates)).cast("long").alias("replicates"),
            F.lit(float(alpha)).alias("alpha"),
        )
    )


def cuped_ab_report(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    covariate_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """CUPED-adjusted Welch comparison — ab_test_report with the variance
    a PRE-PERIOD covariate explains removed: y′ = y − θ(x − x̄), θ =
    cov(x, y)/var(x) pooled over both arms, the industry-standard
    sensitivity boost (same lift, tighter error bars, detectable at a
    fraction of the sample).

    Everything derives from ONE conditional-aggregate scan of exact
    quantized moments (n, Σx, Σy, Σxx, Σyy, Σxy per arm as
    decimal(38,0)) — the adjusted means and variances are algebraic in
    the joint moments (var(y−θx) = var_y − 2θcov + θ²var_x), so CUPED
    costs no second pass.  Rows with a NULL metric OR covariate carry no
    evidence.  All doubles derive from identical operands in identical
    expression order (the ab_test_report contract), round-6.

    Output: one row (n_control, n_treatment, theta, mean_control_adj,
    mean_treatment_adj, abs_lift_adj, t_stat_adj, var_reduction_pct,
    significant)."""
    y = F.col(metric_col)
    x = F.col(covariate_col)
    ym = F.round(y * F.lit(1000000.0)).cast("long")
    xm = F.round(x * F.lit(1000000.0)).cast("long")
    arm = F.col(group_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def _moms(label: str, tag: str):
        keep = (arm == F.lit(label)) & y.isNotNull() & x.isNotNull()
        z = F.lit(0).cast("decimal(38,0)")
        return [
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias(f"_n{tag}"),
            F.coalesce(F.sum(F.when(keep, dec(xm))), z).alias(f"_sx{tag}"),
            F.coalesce(F.sum(F.when(keep, dec(ym))), z).alias(f"_sy{tag}"),
            F.coalesce(F.sum(F.when(keep, dec(xm) * xm)), z).alias(f"_sxx{tag}"),
            F.coalesce(F.sum(F.when(keep, dec(ym) * ym)), z).alias(f"_syy{tag}"),
            F.coalesce(F.sum(F.when(keep, dec(xm) * ym)), z).alias(f"_sxy{tag}"),
        ]

    agg = df.agg(*_moms(control, "c"), *_moms(treatment, "t"))

    def d(name):
        return F.col(name).cast("double")

    nc, nt = d("_nc"), d("_nt")
    n = nc + nt
    sx = d("_sxc") + d("_sxt")
    sy = d("_syc") + d("_syt")
    sxx = d("_sxxc") + d("_sxxt")
    sxy = d("_sxyc") + d("_sxyt")
    # pooled theta = cov(x, y) / var(x) (units cancel; micro scale cancels)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    def _adj(tag: str):
        nn = d(f"_n{tag}")
        mx = d(f"_sx{tag}") / nn / F.lit(1e6)
        my = d(f"_sy{tag}") / nn / F.lit(1e6)
        # explicit products, never POWER: pow() can route through
        # exp/log and lose the cross-engine bit-identity the contract needs
        var_y = (d(f"_syy{tag}") / F.lit(1e12) - (d(f"_sy{tag}") / F.lit(1e6)) * (d(f"_sy{tag}") / F.lit(1e6)) / nn) / (nn - F.lit(1.0))
        var_x = (d(f"_sxx{tag}") / F.lit(1e12) - (d(f"_sx{tag}") / F.lit(1e6)) * (d(f"_sx{tag}") / F.lit(1e6)) / nn) / (nn - F.lit(1.0))
        cov = (d(f"_sxy{tag}") / F.lit(1e12) - (d(f"_sx{tag}") / F.lit(1e6)) * (d(f"_sy{tag}") / F.lit(1e6)) / nn) / (nn - F.lit(1.0))
        mean_adj = my - theta * (mx - sx / n / F.lit(1e6))
        var_adj = var_y - F.lit(2.0) * theta * cov + theta * theta * var_x
        return nn, my, var_y, mean_adj, var_adj

    nc_, myc, vyc, mac, vac = _adj("c")
    nt_, myt, vyt, mat, vat = _adj("t")
    se = F.sqrt(vac / nc_ + vat / nt_)
    t_adj = (mat - mac) / se
    var_red = (
        F.lit(1.0) - (vac + vat) / (vyc + vyt)
    ) * F.lit(100.0)
    return agg.select(
        F.col("_nc").alias("n_control"),
        F.col("_nt").alias("n_treatment"),
        F.round(theta, 6).alias("theta"),
        F.round(mac, 6).alias("mean_control_adj"),
        F.round(mat, 6).alias("mean_treatment_adj"),
        F.round(mat - mac, 6).alias("abs_lift_adj"),
        F.round(t_adj, 6).alias("t_stat_adj"),
        F.round(var_red, 6).alias("var_reduction_pct"),
        (F.abs(t_adj) > F.lit(1.959964)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Trimmed mean + Neyman allocation — wave 64
# ---------------------------------------------------------------------------

def trimmed_mean(
    df: DataFrame,
    col: str,
    group_col: str,
    lo: float,
    hi: float,
    trim: float = 0.1,
    bins: int = 1 << 10,
) -> DataFrame:
    """Per-group exact trimmed mean: drop the lowest and highest
    floor(trim·n) values, average the rest — the robust center that
    keeps the metric's units (robust_z SCORES outliers; this SUMMARIZES
    despite them: mean latency without the timeout spikes, mean doc
    length without the megadocs).

    Exactness + shape: each distinct value's global rank interval (a, b]
    comes from the grouped bounded-prefix decomposition (the
    grouped_gini plan — every stage keyed by group, ZERO single-
    partition exchanges); the kept mass per value is the interval
    overlap max(0, min(b, n−k) − max(a, k)) — pure integer arithmetic,
    tie order provably irrelevant — folded as exact decimal sums with
    ONE round-6 division.  k = floor(trim·n + 1e-9) (the +1e-9 keeps
    0.3·10 from flooring to 2).  Groups where trimming empties the
    sample (n ≤ 2k) report NULL.

    Output: (group, n, n_trimmed_each_side, trimmed_mean)."""
    from pyspark.sql import Window

    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trimmed_mean: trim must be in [0, 0.5), got {trim}")
    if hi <= lo:
        raise ValueError(f"trimmed_mean: need lo < hi, got [{lo}, {hi})")
    g = F.col(group_col)
    v = F.col(col).cast("double")
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        df.filter(g.isNotNull() & v.isNotNull())
        .select(g.alias("_g"), v.alias("_v"))
        .withColumn("_bin", binc)
        .groupBy("_g", "_bin", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    bin_tot = per.groupBy("_g", "_bin").agg(F.sum("_cnt").alias("_bc"))
    w_bins = (
        Window.partitionBy("_g")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_prefix = bin_tot.select(
        "_g", "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_g", "_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.groupBy("_g").agg(F.sum("_cnt").cast("long").alias("_n"))
    iv = (
        per.withColumn("_cumin", F.sum("_cnt").over(w_in))
        .join(bin_prefix, ["_g", "_bin"])
        .join(tot, "_g")
        .select(
            "_g", "_v", "_cnt", "_n",
            (F.col("_cumin") + F.col("_pref")).alias("_cum"),
        )
    )
    k = F.floor(F.lit(float(trim)) * F.col("_n").cast("double") + F.lit(1e-9)).cast(
        "long"
    )
    a = F.col("_cum") - F.col("_cnt")
    b = F.col("_cum")
    kept = F.greatest(
        F.least(b, F.col("_n") - k) - F.greatest(a, k), F.lit(0)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vm = F.round(F.col("_v") * F.lit(1000000.0)).cast("long")
    agg = iv.groupBy("_g").agg(
        F.first("_n").alias("_nn"),
        F.first(k).alias("_k"),
        F.sum(dec(kept)).alias("_kc"),
        F.sum(dec(vm) * kept).alias("_ks"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_nn").alias("n"),
        F.col("_k").alias("n_trimmed_each_side"),
        F.when(
            F.col("_kc") > 0,
            F.round(
                F.col("_ks").cast("double")
                / F.col("_kc").cast("double")
                / F.lit(1000000.0),
                6,
            ),
        ).alias("trimmed_mean"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
) -> DataFrame:
    """Variance-optimal (Neyman) allocation of a sampling budget across
    strata: sample stratum h in proportion to N_h·s_h — the allocation
    that minimizes the variance of the stratified mean estimate, vs the
    proportional allocation quota_sample uses (equal-variance strata are
    the only case where the two agree).  The planning step BEFORE
    stratified_sample: "given 10k label budget, how many docs per
    source".

    Exact arithmetic: per-stratum moments are exact quantized decimals;
    s_h = sample std from them; integer allocations use the LARGEST-
    REMAINDER method (floor every share, then hand the leftover units
    out by descending fractional remainder with the stratum name as the
    deterministic tie-break) so allocations are integers that sum
    EXACTLY to the budget (pytest-pinned) and replay in SQL.
    Single-row strata carry no variance evidence (std undefined) and
    allocate 0 — documented; a stratum with zero variance likewise
    needs no sample for its mean.

    One moment scan + strata-table arithmetic.  Output: (stratum, n,
    std, weight, alloc)."""
    if budget <= 0:
        raise ValueError(f"neyman_allocation: budget must be positive, got {budget}")
    from pyspark.sql import Window

    g = F.col(stratum_col)
    v = F.col(value_col)
    vm = F.round(v * F.lit(1000000.0)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = (
        df.filter(g.isNotNull() & v.isNotNull())
        .groupBy(g.alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(dec(vm)).alias("_s1"),
            F.sum(dec(vm) * vm).alias("_s2"),
        )
    )
    n = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    var = (
        s2 / F.lit(1e12) - (s1 / F.lit(1e6)) * (s1 / F.lit(1e6)) / n
    ) / (n - F.lit(1.0))
    std = F.when(F.col("_n") >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    scored = mom.select(
        "_g", "_n", F.coalesce(std, F.lit(0.0)).alias("_std")
    ).withColumn("_w", n * F.col("_std"))
    wsum = scored.agg(F.sum("_w").alias("_tw"))
    shared = scored.crossJoin(F.broadcast(wsum)).withColumn(
        "_share",
        F.when(F.col("_tw") > 0, F.col("_w") / F.col("_tw")).otherwise(F.lit(0.0)),
    )
    exact = F.col("_share") * F.lit(float(budget))
    base = F.floor(exact + F.lit(1e-9)).cast("long")
    fl = shared.withColumn("_base", base).withColumn(
        "_frac", exact - F.col("_base").cast("double")
    )
    spent = fl.agg(F.sum("_base").alias("_spent"))
    w_rem = Window.orderBy(F.desc("_frac"), F.asc("_g"))
    out = (
        fl.crossJoin(F.broadcast(spent))
        .withColumn("_rk", F.row_number().over(w_rem))
        .withColumn(
            "alloc",
            F.col("_base")
            + F.when(
                F.col("_rk") <= (F.lit(int(budget)) - F.col("_spent")), 1
            ).otherwise(0),
        )
    )
    return out.select(
        F.col("_g").alias(stratum_col),
        F.col("_n").alias("n"),
        F.round(F.col("_std"), 6).alias("std"),
        F.round(F.col("_share"), 6).alias("weight"),
        F.col("alloc").cast("long").alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Rare combinations + mirror columns — wave 65
# ---------------------------------------------------------------------------

def rare_combinations(
    df: DataFrame,
    cols: "list[str]",
    max_count: int,
    id_cols: "list[str]",
) -> DataFrame:
    """Rows whose CATEGORY COMBINATION occurs at most ``max_count`` times
    — the composite-typo detector: every individual value is a valid
    category (enum checks pass) but the tuple is nearly unique
    ('returnflag=R, linestatus=O' style contradictions, mis-joined
    dimension rows, fat-fingered pairs).  The single-column rarity check
    misses these by construction.

    NULL is a REAL category (null-safe grouping via the composite struct
    — the approx_fd convention): an unusual NULL PATTERN is exactly the
    kind of rarity this audit exists to surface.  One map-side-partial
    count on the (bounded-cardinality) combination space + a broadcast-
    able join back; exact long counts.

    Output: (*id_cols, *cols, combo_count), rarest first is the caller's
    ORDER BY."""
    if not cols:
        raise ValueError("rare_combinations: cols must be non-empty")
    if max_count < 1:
        raise ValueError("rare_combinations: max_count must be >= 1")
    combo = [F.col(c) for c in cols]
    counts = (
        df.groupBy(*combo)
        .agg(F.count(F.lit(1)).cast("long").alias("combo_count"))
        .filter(F.col("combo_count") <= max_count)
    )
    # null-safe equi-join on every combo column (NULL matches NULL); the
    # counts side is renamed first — it derives from df, and same-lineage
    # column references are ambiguous in a self-join
    renamed = counts.select(
        *[F.col(c).alias(f"_cc_{c}") for c in cols], "combo_count"
    )
    cond = None
    for c in cols:
        piece = F.col(c).eqNullSafe(F.col(f"_cc_{c}"))
        cond = piece if cond is None else cond & piece
    # no forced broadcast: the rare-combo table is usually tiny, but on
    # high-cardinality column sets MOST combos are rare and the frame is
    # corpus-shaped — let AQE pick the join strategy (review finding)
    return df.join(renamed, cond).select(
        *[F.col(c) for c in id_cols],
        *[F.col(c) for c in cols],
        F.col("combo_count"),
    )


def mirror_columns_report(
    df: DataFrame, key_col: str, columns: "list[str] | None" = None
) -> DataFrame:
    """Pairs of columns with IDENTICAL content row-for-row — the
    redundant-column detector (copy-paste ETL, a join that duplicated a
    field under two names, a 'new' column nobody migrated): profiling
    treats them as independent signals, models double-weight them, and
    nobody notices without exactly this check.

    Row alignment rides ``key_col``: each column folds to ONE exact
    fingerprint Σ uint32(md5(key ⊕ value)[:8]) plus null/total counts —
    order-free integer sums, so two columns match iff their (sum, n,
    n_null) triples match (md5 collisions at 2⁻³² per pair of differing
    rows; the triple check makes a false positive need a SUM collision
    too — documented, and candidates can be re-verified exactly with
    one equality join).  NULLs hash as a reserved token so (NULL vs
    'null'-string) columns don't alias.

    ONE melt scan over (key, column, value-as-string) — adding a column
    costs no extra pass; the pair comparison runs on the #columns-row
    fingerprint table.  Values compare as CANONICAL STRINGS (cast) —
    '1' (int) and '1.0' (double) differ; same-type mirrors are the
    target.  Output: (col_a, col_b, n, n_null, fingerprint) for each
    matching pair."""
    cols = columns or [c for c in df.columns if c != key_col]
    if len(cols) < 2:
        raise ValueError("mirror_columns_report: need >= 2 columns")
    melted = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("_x"),
    ).select("_k", F.col("_x.col").alias("_c"), F.col("_x.val").alias("_v"))
    token = F.coalesce(F.col("_v"), F.lit("\x00<NULL>\x00"))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", F.col("_k"), token)), 1, 8), 16, 10
    ).cast("long")
    fp = melted.groupBy("_c").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("_nn"),
        F.sum(h.cast("decimal(38,0)")).alias("_fp"),
    )
    a = fp.select(
        F.col("_c").alias("col_a"), F.col("_n").alias("_na"),
        F.col("_nn").alias("_nna"), F.col("_fp").alias("_fpa"),
    )
    b = fp.select(
        F.col("_c").alias("col_b"), F.col("_n").alias("_nb"),
        F.col("_nn").alias("_nnb"), F.col("_fp").alias("_fpb"),
    )
    return (
        a.join(
            b,
            (F.col("col_a") < F.col("col_b"))
            & (F.col("_fpa") == F.col("_fpb"))
            & (F.col("_na") == F.col("_nb"))
            & (F.col("_nna") == F.col("_nnb")),
        )
        .select(
            "col_a",
            "col_b",
            F.col("_na").alias("n"),
            F.col("_nna").alias("n_null"),
            F.col("_fpa").cast("string").alias("fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# One-way ANOVA + two-proportion z-test — wave 66
# ---------------------------------------------------------------------------

def anova_report(df: DataFrame, group_col: str, metric_col: str) -> DataFrame:
    """One-way ANOVA across ALL groups — the k-arm generalization of the
    Welch pair test: "does the metric differ across sources/arms AT ALL"
    before pairwise comparisons (running C(k,2) Welch tests uncorrected
    is the multiple-testing trap this gate exists to prevent).

    Exactness (the ab_test contract): per-group exact quantized moments
    (n, Σy, Σy²) in ONE conditional-aggregate pass; SSB/SSW derive
    algebraically from them (SSW = Σ_g (Σy²_g − (Σy_g)²/n_g), SSB =
    Σ_g (Σy_g)²/n_g − (Σy)²/n — identical operands, identical order,
    round-6).  Emits the F statistic and effect size η² = SSB/SST;
    significance gating is the CALLER'S job against F(k−1, n−k) for
    their k (an F critical value is not a constant, unlike the z/χ²
    gates elsewhere — documented rather than faked).

    Output: one row (k, n, df_between, df_within, f_stat, eta_sq)."""
    g = F.col(group_col)
    y = F.col(metric_col)
    ym = F.round(y * F.lit(1000000.0)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = (
        df.filter(g.isNotNull() & y.isNotNull())
        .groupBy(g.alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(dec(ym)).alias("_s1"),
            F.sum(dec(ym) * ym).alias("_s2"),
        )
    )
    n_g = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    # per-group pieces in micro^2; ordered fold over the bounded group
    # table (orderBy group) keeps the double sums engine-identical
    from pyspark.sql import Window

    w = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
    acc = (
        per.withColumn("_cw", F.sum(s2 - s1 * s1 / n_g).over(w))
        .withColumn("_cb", F.sum(s1 * s1 / n_g).over(w))
        .withColumn("_cn", F.sum("_n").over(w))
        .withColumn("_cs", F.sum("_s1").over(w))
        .withColumn("_ck", F.sum(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.desc("_g"))))
        .filter(F.col("_rn") == 1)
    )
    n = F.col("_cn").cast("double")
    k = F.col("_ck").cast("double")
    ssw = F.col("_cw") / F.lit(1e12)
    ssb = (F.col("_cb") - F.col("_cs").cast("double") * F.col("_cs").cast("double") / n) / F.lit(1e12)
    df1 = k - F.lit(1.0)
    df2 = n - k
    f_stat = F.when(
        (df1 > 0) & (df2 > 0) & (ssw > 0), (ssb / df1) / (ssw / df2)
    )
    eta = F.when(ssb + ssw > 0, F.round(ssb / (ssb + ssw), 6))
    return acc.select(
        F.col("_ck").cast("long").alias("k"),
        F.col("_cn").cast("long").alias("n"),
        df1.cast("long").alias("df_between"),
        df2.cast("long").alias("df_within"),
        F.round(f_stat, 6).alias("f_stat"),
        eta.alias("eta_sq"),
    )


def proportions_ab_report(
    df: DataFrame,
    group_col: str,
    flag_col,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion z-test — the conversion-rate counterpart of
    ab_test_report's continuous Welch test: "did the error/convert/click
    RATE move", tested with the pooled-proportion z under H₀ p₁ = p₂.
    Counts are exact longs (nothing to quantize — the one experiment
    statistic that is exact by nature); every double derives from them
    in identical expression order, round-6; two-sided 5% gate at
    1.959964 (the ab_test constant).  ``flag_col`` may be a column name
    or boolean Column; NULL flags carry no evidence.

    Output: one row (n_control, n_treatment, rate_control,
    rate_treatment, abs_diff, z_stat, significant)."""
    arm = F.col(group_col)
    flag = (F.col(flag_col) if isinstance(flag_col, str) else flag_col).cast(
        "boolean"
    )

    def _cnt(label: str, tag: str):
        keep = (arm == F.lit(label)) & flag.isNotNull()
        return [
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias(f"_n{tag}"),
            F.sum(F.when(keep & flag, 1).otherwise(0)).cast("long").alias(f"_x{tag}"),
        ]

    agg = df.agg(*_cnt(control, "c"), *_cnt(treatment, "t"))
    nc, nt = F.col("_nc").cast("double"), F.col("_nt").cast("double")
    xc, xt = F.col("_xc").cast("double"), F.col("_xt").cast("double")
    pc, pt = xc / nc, xt / nt
    pool = (xc + xt) / (nc + nt)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / nc + F.lit(1.0) / nt))
    z = F.when(se > 0.0, (pt - pc) / se)
    return agg.select(
        F.col("_nc").alias("n_control"),
        F.col("_nt").alias("n_treatment"),
        F.round(pc, 6).alias("rate_control"),
        F.round(pt, 6).alias("rate_treatment"),
        F.round(pt - pc, 6).alias("abs_diff"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(1.959964), F.lit(False)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa + capture-recapture — wave 67
# ---------------------------------------------------------------------------

def cohens_kappa(df: DataFrame, label_a_col: str, label_b_col: str) -> DataFrame:
    """Inter-annotator agreement corrected for chance — the labeling-
    pipeline QA number raw percent-agreement fakes: two raters who both
    answer 'ok' 95% of the time agree 90.5% by luck alone; κ = (p_o −
    p_e)/(1 − p_e) subtracts exactly that (Landis–Koch: <0.2 slight,
    >0.8 almost perfect).  Items where EITHER label is NULL (unrated)
    carry no agreement evidence.

    Exactness: p_o from the exact diagonal count; p_e = Σ_c (n_a(c)/n)·
    (n_b(c)/n) folded over the bounded label table in LABEL ORDER (the
    anova ordered-fold discipline) so the double sum is engine-
    identical; round-6.  Two bounded aggregates + one scalar row; κ
    NULL when p_e = 1 (both raters constant — agreement is undefined,
    not perfect).

    Output: one row (n, p_observed, p_expected, kappa)."""
    a, b = F.col(label_a_col), F.col(label_b_col)
    base = df.filter(a.isNotNull() & b.isNotNull()).select(
        a.cast("string").alias("_a"), b.cast("string").alias("_b")
    )
    marg = (
        base.select(F.col("_a").alias("_l"), F.lit(1).alias("_ca"), F.lit(0).alias("_cb"))
        .unionAll(
            base.select(F.col("_b").alias("_l"), F.lit(0).alias("_ca"), F.lit(1).alias("_cb"))
        )
        .groupBy("_l")
        .agg(
            F.sum("_ca").cast("long").alias("_na"),
            F.sum("_cb").cast("long").alias("_nb"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("_l").rowsBetween(Window.unboundedPreceding, 0)
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), 1).otherwise(0))
        .cast("long")
        .alias("_agree"),
    )
    pe_tab = (
        marg.crossJoin(F.broadcast(tot))
        .withColumn(
            "_pe",
            F.sum(
                (F.col("_na").cast("double") / F.col("_n").cast("double"))
                * (F.col("_nb").cast("double") / F.col("_n").cast("double"))
            ).over(w),
        )
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.desc("_l"))))
        .filter(F.col("_rn") == 1)
    )
    po = F.col("_agree").cast("double") / F.col("_n").cast("double")
    pe = F.col("_pe")
    kappa = F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
    return pe_tab.select(
        F.col("_n").alias("n"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        kappa.alias("kappa"),
    )


def capture_recapture(
    df_a: DataFrame, df_b: DataFrame, key_col: str
) -> DataFrame:
    """Chapman capture–recapture estimate of the TRUE distinct population
    from two overlapping samples — "how many unique documents does the
    whole web source actually have", estimated from two independent
    crawls the way ecologists count fish: N̂ = (n_a+1)(n_b+1)/(m+1) − 1
    with m = |A ∩ B| (Chapman's +1s debias the classic Lincoln–Petersen
    at small overlap).  The estimator the dedup-budget planner wants
    BEFORE committing to crawl the long tail.

    Exact distinct/overlap counts via one aggregate over the key union
    (NULL keys carry no identity); the estimate and its standard error
    √((n_a+1)(n_b+1)(n_a−m)(n_b−m)/((m+1)²(m+2))) derive from exact
    longs in identical order, round-6; zero overlap yields the estimate
    with its (huge) SE rather than a fake certainty.

    Output: one row (n_a, n_b, n_overlap, n_est, std_err)."""
    ka = (
        df_a.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .select("_k", F.lit(1).alias("_ia"), F.lit(0).alias("_ib"))
    )
    kb = (
        df_b.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .select("_k", F.lit(0).alias("_ia"), F.lit(1).alias("_ib"))
    )
    agg = (
        ka.unionAll(kb)
        .groupBy("_k")
        .agg(F.max("_ia").alias("_a"), F.max("_ib").alias("_b"))
        .agg(
            F.sum("_a").cast("long").alias("_na"),
            F.sum("_b").cast("long").alias("_nb"),
            F.sum(F.col("_a") * F.col("_b")).cast("long").alias("_m"),
        )
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    m = F.col("_m").cast("double")
    est = (na + F.lit(1.0)) * (nb + F.lit(1.0)) / (m + F.lit(1.0)) - F.lit(1.0)
    se = F.sqrt(
        (na + F.lit(1.0)) * (nb + F.lit(1.0)) * (na - m) * (nb - m)
        / ((m + F.lit(1.0)) * (m + F.lit(1.0)) * (m + F.lit(2.0)))
    )
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.col("_m").alias("n_overlap"),
        F.round(est, 6).alias("n_est"),
        F.round(se, 6).alias("std_err"),
    )


# ---------------------------------------------------------------------------
# Rank-based hypothesis tests — wave 68
# ---------------------------------------------------------------------------

def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) between two samples — the
    distribution-free two-sample test: where Welch asks "did the MEAN
    move" and KS "did the DISTRIBUTION move anywhere", U asks "do draws
    from B stochastically dominate draws from A" — the right question
    for skewed metrics whose means are hostage to the tail.

    Exactness: pooled doubled tie-ranks R2 = 2·(cum − cnt) + cnt + 1 per
    distinct value from the bounded-prefix decomposition (the spearman
    machinery — no corpus sort); rank sums, U, and the tie-corrected
    normal variance all fold from exact integers (Σ(t³−t) per tie run is
    exact decimal); the z statistic divides once, round-6, gated
    two-sided 5% at 1.959964.  NULLs excluded per side.

    Output: one row (n_a, n_b, u_a, z_stat, significant) — u_a counts
    (a-wins + ½ties) over all cross pairs; u_b = n_a·n_b − u_a."""
    if hi <= lo:
        raise ValueError(f"mann_whitney_u: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(col).cast("double")
        return df.filter(v.isNotNull()).select(
            v.alias("_v"), F.lit(ca).alias("_ca"), F.lit(cb).alias("_cb")
        )

    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        side(df_a, 1, 0)
        .unionByName(side(df_b, 0, 1))
        .withColumn("_bin", binc)
        .groupBy("_bin", "_v")
        .agg(F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb"))
    )
    bin_tot = per.groupBy("_bin").agg(F.sum(F.col("_na") + F.col("_nb")).alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    t = F.col("_na") + F.col("_nb")
    iv = (
        per.withColumn("_cumin", F.sum(t).over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .withColumn("_cum", F.col("_cumin") + F.col("_pref"))
    )
    r2 = F.lit(2) * (F.col("_cum") - t) + t + F.lit(1)  # doubled avg rank
    agg = iv.agg(
        F.sum("_na").cast("long").alias("_ta"),
        F.sum("_nb").cast("long").alias("_tb"),
        F.sum(dec(F.col("_na")) * r2).alias("_ra2"),  # 2 × rank sum of A
        F.sum(dec(t) * t * t - dec(t)).alias("_ties"),  # Σ(t³ − t)
    )
    na, nb = F.col("_ta").cast("double"), F.col("_tb").cast("double")
    n = na + nb
    ra = F.col("_ra2").cast("double") / F.lit(2.0)
    u_a = ra - na * (na + F.lit(1.0)) / F.lit(2.0)
    ties = F.col("_ties").cast("double")
    var = (
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - ties / (n * (n - F.lit(1.0))))
    )
    z = F.when(var > 0.0, (u_a - na * nb / F.lit(2.0)) / F.sqrt(var))
    return agg.select(
        F.col("_ta").alias("n_a"),
        F.col("_tb").alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(1.959964), F.lit(False)).alias("significant"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact Kruskal–Wallis H — the k-group rank ANOVA: the gate
    anova_report provides for means, asked distribution-free ("do ANY
    of these sources draw from a shifted distribution"), immune to the
    heavy tails that inflate SSW.  Same pooled-rank machinery as
    mann_whitney_u; H carries the standard tie correction 1 −
    Σ(t³−t)/(n³−n); emits H and df = k−1 with gating documented as the
    caller's job against χ²(k−1) (the anova convention — k-dependent
    critical values are not faked as constants).

    Output: one row (k, n, h_stat, df)."""
    if hi <= lo:
        raise ValueError(f"kruskal_wallis: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(col).cast("double")
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        df.filter(g.isNotNull() & v.isNotNull())
        .select(g.cast("string").alias("_g"), v.alias("_v"))
        .withColumn("_bin", binc)
        .groupBy("_bin", "_v", "_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    pooled = per.groupBy("_bin", "_v").agg(F.sum("_c").alias("_t"))
    bin_tot = pooled.groupBy("_bin").agg(F.sum("_t").alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ranks = (
        pooled.withColumn("_cumin", F.sum("_t").over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .select(
            "_bin",
            "_v",
            "_t",
            (
                F.lit(2) * (F.col("_cumin") + F.col("_pref") - F.col("_t"))
                + F.col("_t")
                + F.lit(1)
            ).alias("_r2"),
        )
    )
    joined = per.join(ranks.select("_bin", "_v", "_r2", "_t"), ["_bin", "_v"])
    per_g = joined.groupBy("_g").agg(
        F.sum("_c").cast("long").alias("_ng"),
        F.sum(dec(F.col("_c")) * F.col("_r2")).alias("_rg2"),  # 2 × rank sum
    )
    # ordered fold over the bounded group table (the anova discipline)
    w_acc = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
    rg = F.col("_rg2").cast("double") / F.lit(2.0)
    acc = (
        per_g.withColumn(
            "_hsum", F.sum(rg * rg / F.col("_ng").cast("double")).over(w_acc)
        )
        .withColumn("_cn", F.sum("_ng").over(w_acc))
        .withColumn("_ck", F.sum(F.lit(1)).over(w_acc))
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.desc("_g"))))
        .filter(F.col("_rn") == 1)
    )
    tie_tab = ranks.agg(F.sum(dec(F.col("_t")) * F.col("_t") * F.col("_t") - dec(F.col("_t"))).alias("_ties"))
    out = acc.crossJoin(F.broadcast(tie_tab))
    n = F.col("_cn").cast("double")
    h_raw = F.lit(12.0) / (n * (n + F.lit(1.0))) * F.col("_hsum") - F.lit(3.0) * (
        n + F.lit(1.0)
    )
    corr = F.lit(1.0) - F.col("_ties").cast("double") / (n * n * n - n)
    h = F.when(corr > 0.0, h_raw / corr)
    return out.select(
        F.col("_ck").cast("long").alias("k"),
        F.col("_cn").cast("long").alias("n"),
        F.round(h, 6).alias("h_stat"),
        (F.col("_ck") - 1).cast("long").alias("df"),
    )


# ---------------------------------------------------------------------------
# Seeded re-randomization test — wave 69
# ---------------------------------------------------------------------------

def randomization_test(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
    id_col: str,
    permutations: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Randomization-inference p-value for the mean difference — the
    assumption-free alternative to Welch's t: re-draw the treatment
    assignment R times under the design's Bernoulli(p̂) coin and ask how
    often chance alone produces a |mean diff| at least as large as the
    observed one.  No normality, no variance formula, no asymptotics —
    the test IS the experiment re-run.

    Design note: the re-draws are Bernoulli with p̂ = n_t/(n_a+n_t)
    (re-randomization inference, matching a Bernoulli-assigned
    experiment) rather than fixed-margin permutations — the honest
    match for hash-assigned arms, documented; fixed-margin permutation
    needs a distributed sort per draw this test deliberately avoids.

    Determinism: draw (row, r) comes from the md5-prefix uniform of
    (seed, r, id) — the bootstrap convention — so every permutation is
    exact and engine-replayable; per-draw arm means are exact integer
    ratios on round-6 diffs; p = (1 + #{|diff_r| ≥ |diff_obs|})/(R+1)
    (the add-one keeps p valid).  One corpus × R pass folding map-side
    to 2R partials.

    Output: one row (n_control, n_treatment, abs_diff_observed,
    p_value, permutations)."""
    if permutations < 10:
        raise ValueError("randomization_test: need >= 10 permutations")
    y = F.col(metric_col)
    arm = F.col(group_col)
    base = df.filter(
        y.isNotNull() & arm.isin([control, treatment])
    ).select(
        F.round(y * F.lit(1000000.0)).cast("long").alias("_ym"),
        (arm == F.lit(treatment)).alias("_t"),
        F.col(id_col).cast("string").alias("_id"),
    ).localCheckpoint(eager=False)  # feeds the observed AND every draw
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    obs = base.agg(
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).cast("long").alias("_nc"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias("_nt"),
        F.sum(F.when(~F.col("_t"), dec(F.col("_ym")))).alias("_sc"),
        F.sum(F.when(F.col("_t"), dec(F.col("_ym")))).alias("_st"),
    )
    o = obs.collect()[0]
    nc, nt = int(o["_nc"]), int(o["_nt"])
    if nc == 0 or nt == 0:
        raise ValueError("randomization_test: both arms must be non-empty")
    p_hat = nt / (nc + nt)
    import math as _math

    # half-away rounding (not python's banker's) — matches F.round/SQL round
    _d_raw = abs(int(o["_st"]) / nt / 1e6 - int(o["_sc"]) / nc / 1e6)
    d_obs = _math.floor(_d_raw * 1e6 + 0.5) / 1e6
    r = F.explode(F.array(*[F.lit(i) for i in range(permutations)])).alias("_r")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit(f"perm-{seed}"),
                        F.col("_r").cast("string"),
                        F.col("_id"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**8))
    draws = (
        base.select("_ym", "_id", r)
        .withColumn("_pt", u < F.lit(p_hat))
        .groupBy("_r")
        .agg(
            F.sum(F.when(F.col("_pt"), 1).otherwise(0)).cast("long").alias("_dnt"),
            F.sum(F.when(~F.col("_pt"), 1).otherwise(0)).cast("long").alias("_dnc"),
            F.sum(F.when(F.col("_pt"), dec(F.col("_ym")))).alias("_dst"),
            F.sum(F.when(~F.col("_pt"), dec(F.col("_ym")))).alias("_dsc"),
        )
        .filter((F.col("_dnt") > 0) & (F.col("_dnc") > 0))
        .select(
            F.round(
                F.abs(
                    F.col("_dst").cast("double") / F.col("_dnt").cast("double")
                    - F.col("_dsc").cast("double") / F.col("_dnc").cast("double")
                )
                / F.lit(1000000.0),
                6,
            ).alias("_d")
        )
    )
    hits = draws.agg(
        F.count(F.lit(1)).cast("long").alias("_r_used"),
        F.sum(F.when(F.col("_d") >= F.lit(d_obs), 1).otherwise(0))
        .cast("long")
        .alias("_ge"),
    )
    return hits.select(
        F.lit(nc).cast("long").alias("n_control"),
        F.lit(nt).cast("long").alias("n_treatment"),
        F.lit(d_obs).alias("abs_diff_observed"),
        F.round(
            (F.lit(1.0) + F.col("_ge").cast("double"))
            / (F.col("_r_used").cast("double") + F.lit(1.0)),
            6,
        ).alias("p_value"),
        F.col("_r_used").alias("permutations"),
    )


# ---------------------------------------------------------------------------
# BH-FDR correction + Wilcoxon signed-rank — wave 70
# ---------------------------------------------------------------------------

def fdr_correct(
    df: DataFrame,
    id_cols: "list[str]",
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR correction over a table of p-values — the
    meta-test this engine now needs on its own output: run the drift /
    rank / proportion tests across 500 metrics and ~25 will clear 5% by
    chance; BH controls the EXPECTED FALSE DISCOVERY RATE instead
    (reject ranks 1..k* where k* is the largest k with p₍ₖ₎ ≤ k·α/m).
    Also emits monotone q-values (q₍ᵢ₎ = min_{j≥i} m·p₍ⱼ₎/j — the
    smallest α at which test i would be rejected).

    Shape: the p-value table is BOUNDED (#tests rows — the
    level_shift bounded-frame convention), so the rank, the suffix-min
    q fold, and the k* threshold are ordered windows over it; ties
    break by id for a deterministic rank.  NULL p-values are excluded
    (an unrun test is not evidence).  Exact comparisons: p ≤ k·α/m is
    evaluated as p·m ≤ k·α in doubles from identical operands.

    Output: (*id_cols, p_value, rank, q_value, rejected)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"fdr_correct: alpha must be in (0, 1), got {alpha}")
    from pyspark.sql import Window

    p = F.col(p_col).cast("double")
    base = df.filter(p.isNotNull()).select(*id_cols, p.alias("_p"))
    w_rank = Window.orderBy("_p", *id_cols)
    m_tab = base.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    ranked = base.withColumn("_rk", F.row_number().over(w_rank)).crossJoin(
        F.broadcast(m_tab)
    )
    raw_q = (
        F.col("_p")
        * F.col("_m").cast("double")
        / F.col("_rk").cast("double")
    )
    w_suffix = Window.orderBy(F.desc("_rk")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("_rk").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    passes = F.when(
        F.col("_p") * F.col("_m").cast("double")
        <= F.col("_rk").cast("double") * F.lit(float(alpha)),
        F.col("_rk"),
    )
    out = (
        ranked.withColumn("_q", F.least(F.min(raw_q).over(w_suffix), F.lit(1.0)))
        .withColumn("_kstar", F.max(passes).over(w_all))
    )
    return out.select(
        *id_cols,
        F.col("_p").alias("p_value"),
        F.col("_rk").cast("long").alias("rank"),
        F.round(F.col("_q"), 6).alias("q_value"),
        F.coalesce(
            F.col("_rk") <= F.col("_kstar"), F.lit(False)
        ).alias("rejected"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    before_col: str,
    after_col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact Wilcoxon signed-rank test for PAIRED measurements — the
    before/after question on the SAME rows (same documents re-scored
    after a pipeline change), where an unpaired test throws away the
    pairing and most of the power.  Distribution-free: ranks of |diff|,
    W⁺ = rank sum of the positive diffs, normal approximation with the
    standard tie correction.

    Exactness: diffs quantize to round-6 micro-units; zero diffs DROP
    (the standard convention — a tie carries no direction evidence);
    |d| ranks are doubled tie-ranks from the bounded-prefix machinery
    (the spearman/U-test discipline — no corpus sort); W⁺, the null
    mean n(n+1)/4, and var = n(n+1)(2n+1)/24 − Σ(t³−t)/48 all fold
    from exact integers; one round-6 division, 5% gate at 1.959964.
    ``lo``/``hi`` bound |diff| for the binning (order-preserving
    clamp, any coarsening is correct).

    Output: one row (n_pairs, n_nonzero, w_plus, z_stat,
    significant)."""
    if hi <= lo:
        raise ValueError(f"wilcoxon_signed_rank: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    b, a = F.col(before_col), F.col(after_col)
    dm = (
        F.round(a * F.lit(1000000.0)).cast("long")
        - F.round(b * F.lit(1000000.0)).cast("long")
    )
    base = df.filter(a.isNotNull() & b.isNotNull()).select(dm.alias("_d"))
    n_pairs = base.count()
    nz = base.filter(F.col("_d") != 0).select(
        F.abs(F.col("_d")).alias("_ad"), (F.col("_d") > 0).alias("_pos")
    )
    width = (float(hi) - float(lo)) * 1e6 / int(bins)
    raw = F.floor((F.col("_ad").cast("double") - F.lit(float(lo) * 1e6)) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        nz.withColumn("_bin", binc)
        .groupBy("_bin", "_ad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_t"),
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("long").alias("_np"),
        )
    )
    bin_tot = per.groupBy("_bin").agg(F.sum("_t").alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_ad")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    iv = (
        per.withColumn("_cumin", F.sum("_t").over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .withColumn("_cum", F.col("_cumin") + F.col("_pref"))
    )
    r2 = F.lit(2) * (F.col("_cum") - F.col("_t")) + F.col("_t") + F.lit(1)
    agg = iv.agg(
        F.sum("_t").cast("long").alias("_n"),
        F.sum(dec(F.col("_np")) * r2).alias("_wp2"),  # 2 × W+
        F.sum(dec(F.col("_t")) * F.col("_t") * F.col("_t") - dec(F.col("_t"))).alias("_ties"),
    )
    n = F.col("_n").cast("double")
    wp = F.col("_wp2").cast("double") / F.lit(2.0)
    mean0 = n * (n + F.lit(1.0)) / F.lit(4.0)
    var = n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0)) / F.lit(24.0) - F.col(
        "_ties"
    ).cast("double") / F.lit(48.0)
    z = F.when(var > 0.0, (wp - mean0) / F.sqrt(var))
    return agg.select(
        F.lit(int(n_pairs)).cast("long").alias("n_pairs"),
        F.col("_n").alias("n_nonzero"),
        F.round(wp, 6).alias("w_plus"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(1.959964), F.lit(False)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Effect sizes — wave 73
# ---------------------------------------------------------------------------

def effect_size_report(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Effect sizes for a two-sample comparison — the numbers that
    MATTER at this engine's scale: at 10¹² rows every test in this
    module reports p ≈ 0 for any nonzero difference; whether the
    difference is WORTH ACTING ON is what Cohen's d (standardized mean
    shift), Cliff's δ (rank dominance, distribution-free), and the
    common-language effect size (P(B > A) + ½P(tie)) answer.

    Exactness: d from exact quantized moments (pooled SD, the
    ab_test contract); δ and CLES from the SAME doubled tie-rank
    machinery as mann_whitney_u — U_b = R_b − n_b(n_b+1)/2 exactly,
    CLES = U_b/(n_a·n_b), δ = 2·CLES − 1 — identical operands in
    identical order, round-6.  One pooled scan for ranks + one
    conditional scan for moments.  NULLs excluded per side.

    Conventions: positive d and δ mean B sits ABOVE A.  |d|: 0.2
    small / 0.5 medium / 0.8 large; |δ|: 0.147 / 0.33 / 0.474 (Romano)
    — thresholds quoted in the output-free docstring, not baked into
    the frame (effect interpretation is the caller's domain).

    Output: one row (n_a, n_b, mean_a, mean_b, cohens_d, cliffs_delta,
    cles)."""
    if hi <= lo:
        raise ValueError(f"effect_size_report: need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(col).cast("double")
        return df.filter(v.isNotNull()).select(
            v.alias("_v"), F.lit(ca).alias("_ca"), F.lit(cb).alias("_cb")
        )

    u = side(df_a, 1, 0).unionByName(side(df_b, 0, 1))
    vm = F.round(F.col("_v") * F.lit(1000000.0)).cast("long")
    mom = u.agg(
        F.sum("_ca").cast("long").alias("_na"),
        F.sum("_cb").cast("long").alias("_nb"),
        F.sum(F.when(F.col("_ca") == 1, dec(vm))).alias("_s1a"),
        F.sum(F.when(F.col("_cb") == 1, dec(vm))).alias("_s1b"),
        F.sum(F.when(F.col("_ca") == 1, dec(vm) * vm)).alias("_s2a"),
        F.sum(F.when(F.col("_cb") == 1, dec(vm) * vm)).alias("_s2b"),
    )
    width = (float(hi) - float(lo)) / int(bins)
    raw = F.floor((F.col("_v") - F.lit(float(lo))) / F.lit(width)).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        u.withColumn("_bin", binc)
        .groupBy("_bin", "_v")
        .agg(F.sum("_ca").alias("_pa"), F.sum("_cb").alias("_pb"))
    )
    bin_tot = per.groupBy("_bin").agg(F.sum(F.col("_pa") + F.col("_pb")).alias("_bc"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bc").over(w_bins), F.lit(0)).alias("_pref")
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col("_pa") + F.col("_pb")
    iv = (
        per.withColumn("_cumin", F.sum(t).over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .withColumn("_cum", F.col("_cumin") + F.col("_pref"))
    )
    r2 = F.lit(2) * (F.col("_cum") - t) + t + F.lit(1)
    rb = iv.agg(F.sum(dec(F.col("_pb")) * r2).alias("_rb2"))
    j = mom.crossJoin(F.broadcast(rb))
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    s1a, s1b = F.col("_s1a").cast("double"), F.col("_s1b").cast("double")
    s2a, s2b = F.col("_s2a").cast("double"), F.col("_s2b").cast("double")
    ma = s1a / na / F.lit(1e6)
    mb = s1b / nb / F.lit(1e6)
    var_a = (s2a / F.lit(1e12) - (s1a / F.lit(1e6)) * (s1a / F.lit(1e6)) / na) / (na - F.lit(1.0))
    var_b = (s2b / F.lit(1e12) - (s1b / F.lit(1e6)) * (s1b / F.lit(1e6)) / nb) / (nb - F.lit(1.0))
    pooled = F.sqrt(
        ((na - F.lit(1.0)) * var_a + (nb - F.lit(1.0)) * var_b)
        / (na + nb - F.lit(2.0))
    )
    d = F.when(pooled > 0.0, (mb - ma) / pooled)
    u_b = F.col("_rb2").cast("double") / F.lit(2.0) - nb * (nb + F.lit(1.0)) / F.lit(2.0)
    cles = u_b / (na * nb)
    return j.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(F.lit(2.0) * cles - F.lit(1.0), 6).alias("cliffs_delta"),
        F.round(cles, 6).alias("cles"),
    )


# ---------------------------------------------------------------------------
# Ordinal association — wave 74
# ---------------------------------------------------------------------------

def ordinal_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Goodman–Kruskal γ and Somers' D for two ORDINAL columns — the
    association statistic the χ²/Cramér's V sweep cannot give: V sees
    'priority' and 'severity' as unordered labels and reports only that
    they are related; γ says the relationship is MONOTONE and in which
    direction ('higher priority ⇒ higher severity'), from concordant vs
    discordant pair counts.  Somers' D (B|A) additionally penalizes ties
    on the dependent side — the asymmetric variant for 'does A predict
    B'.

    Bounded-cardinality contract (the ordinal use case: ratings,
    priorities, graded severities): the joint distribution collapses to
    one (a, b, n) cell table, and ALL pair counting runs as a self-join
    over that BOUNDED table — C = Σ n_ij·n_i'j' over (i'>i, j'>j),
    D = over (i'>i, j'<j), ties from the marginals — never over rows.
    Exact decimal pair counts (they are O(n²) in magnitude — int64
    overflows at ~10⁹·10⁹); γ = (C−D)/(C+D), D_(b|a) = (C−D)/(C+D+T_b)
    as round-6 divisions of exact operands.  Ordering is the column's
    natural SQL order; NULLs on either side carry no pair evidence.

    Output: one row (n, concordant, discordant, ties_a, ties_b, gamma,
    somers_d_ba)."""
    a, b = F.col(col_a), F.col(col_b)
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .localCheckpoint(eager=False)  # bounded; feeds three joins
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = cells.alias("x")
    y = cells.alias("y")
    conc = (
        x.join(
            y,
            (F.col("y._a") > F.col("x._a")) & (F.col("y._b") > F.col("x._b")),
        )
        .agg(F.coalesce(F.sum(dec(F.col("x._n")) * F.col("y._n")), F.lit(0).cast("decimal(38,0)")).alias("_c"))
    )
    disc = (
        x.join(
            y,
            (F.col("y._a") > F.col("x._a")) & (F.col("y._b") < F.col("x._b")),
        )
        .agg(F.coalesce(F.sum(dec(F.col("x._n")) * F.col("y._n")), F.lit(0).cast("decimal(38,0)")).alias("_d"))
    )
    # ties on a (same a, different b) and ties on b (same b, different a),
    # counted once per unordered pair from the bounded cell table
    ta = (
        x.join(
            y,
            (F.col("y._a") == F.col("x._a"))
            & (F.col("y._b") > F.col("x._b")),
        )
        .agg(F.coalesce(F.sum(dec(F.col("x._n")) * F.col("y._n")), F.lit(0).cast("decimal(38,0)")).alias("_ta"))
    )
    tb = (
        x.join(
            y,
            (F.col("y._b") == F.col("x._b"))
            & (F.col("y._a") > F.col("x._a")),
        )
        .agg(F.coalesce(F.sum(dec(F.col("x._n")) * F.col("y._n")), F.lit(0).cast("decimal(38,0)")).alias("_tb"))
    )
    n_tab = cells.agg(F.sum("_n").cast("long").alias("_nn"))
    j = (
        n_tab.crossJoin(F.broadcast(conc))
        .crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    c = F.col("_c").cast("double")
    d = F.col("_d").cast("double")
    tbd = F.col("_tb").cast("double")
    gamma = F.when(c + d > 0.0, F.round((c - d) / (c + d), 6))
    somers = F.when(c + d + tbd > 0.0, F.round((c - d) / (c + d + tbd), 6))
    return j.select(
        F.col("_nn").alias("n"),
        F.col("_c").cast("long").alias("concordant"),
        F.col("_d").cast("long").alias("discordant"),
        F.col("_ta").cast("long").alias("ties_a"),
        F.col("_tb").cast("long").alias("ties_b"),
        gamma.alias("gamma"),
        somers.alias("somers_d_ba"),
    )


# ---------------------------------------------------------------------------
# Declared-mix conformance — wave 82
# ---------------------------------------------------------------------------

def mix_conformance(
    df: DataFrame, col: str, expected: "dict[str, float]"
) -> DataFrame:
    """Chi-squared goodness-of-fit of a categorical column against a
    DECLARED mix — the data-contract check category_shift (snapshot vs
    snapshot) can't express: "traffic SHOULD be 20/20/20/20/20", "the
    corpus SHOULD be 60% en / 30% zh / 10% other" — the contract is the
    baseline, not another sample.  Categories observed but NOT declared
    are the loudest violation and get their own rows (expected share 0,
    chi² undefined — flagged, never silently pooled).

    Exact long counts; expected counts = share·n as doubles from exact
    operands; per-category χ² terms (o−e)²/e round-6, the total folded
    in CATEGORY ORDER (the anova discipline) with df = k_declared − 1
    emitted alongside (k-dependent gating is the caller's job — the
    anova convention).  Declared-but-absent categories appear with
    observed 0 (their full expected mass is the deviation).

    Output: (category, observed, expected_share, expected_n, chi2_term,
    undeclared) — one row per declared ∪ observed category, plus the
    caller folds chi2_term for the scalar."""
    if not expected:
        raise ValueError("mix_conformance: expected mix must be non-empty")
    total_share = sum(expected.values())
    if abs(total_share - 1.0) > 1e-9:
        raise ValueError(
            f"mix_conformance: expected shares must sum to 1, got {total_share}"
        )
    if any(s <= 0 for s in expected.values()):
        raise ValueError("mix_conformance: declared shares must be positive")
    g = F.col(col)
    counts = (
        df.filter(g.isNotNull())
        .groupBy(g.cast("string").alias("category"))
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    spark = df.sparkSession
    decl = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(expected.items())],
        "category string, expected_share double",
    )
    joined = decl.join(counts, "category", "full_outer")
    tot = counts.agg(F.sum("observed").cast("long").alias("_n"))
    out = joined.crossJoin(F.broadcast(tot))
    obs = F.coalesce(F.col("observed"), F.lit(0)).cast("long")
    n = F.col("_n").cast("double")
    exp_n = F.col("expected_share") * n
    chi2 = F.when(
        F.col("expected_share").isNotNull(),
        F.round(
            (obs.cast("double") - exp_n) * (obs.cast("double") - exp_n) / exp_n,
            6,
        ),
    )
    return out.select(
        "category",
        obs.alias("observed"),
        F.col("expected_share"),
        F.when(F.col("expected_share").isNotNull(), F.round(exp_n, 6)).alias(
            "expected_n"
        ),
        chi2.alias("chi2_term"),
        F.col("expected_share").isNull().alias("undeclared"),
    )


# ---------------------------------------------------------------------------
# Order-statistic quantile confidence interval — wave 84
# ---------------------------------------------------------------------------

def quantile_ci(
    df: DataFrame,
    col: str,
    prob: float,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
    z: float = 1.959964,
) -> DataFrame:
    """Distribution-free confidence interval for a quantile — the error
    bar for every median/p95 this engine reports, with NO normality
    assumption: the classic order-statistic CI takes the values at ranks
    np ± z·√(np(1−p)) (the binomial count of observations below the true
    quantile is what's normal, not the data), so the interval is exact
    rank arithmetic + two extra probes of the SAME bounded-prefix rank
    intervals the point estimate already uses — three rank lookups, one
    corpus fold, no bootstrap replication.

    Exactness: point rank = ceil(p·n − 1e-9) (the exact_quantiles
    guard); CI ranks floor/ceil the normal bounds from identical double
    operands, clamped to [1, n]; all three values are exact
    type-1 order statistics.  The z default is the two-sided 5%
    constant used engine-wide.

    Output: one row (prob, n, rank, value, rank_lo, ci_lo, rank_hi,
    ci_hi)."""
    if not 0.0 < prob < 1.0:
        raise ValueError(f"quantile_ci: prob must be in (0, 1), got {prob}")
    if hi <= lo:
        raise ValueError(f"quantile_ci: need lo < hi, got [{lo}, {hi})")
    iv = _rank_intervals(df.select(F.col(col)), col, lo, hi, bins)
    tot = iv.agg(F.sum("_cnt").cast("long").alias("_n"))
    n = F.col("_n").cast("double")
    p = F.lit(float(prob))
    zz = F.lit(float(z))
    se = F.sqrt(n * p * (F.lit(1.0) - p))
    r_pt = F.greatest(F.ceil(p * n - F.lit(1e-9)), F.lit(1)).cast("long")
    r_lo = F.greatest(F.floor(p * n - zz * se), F.lit(1)).cast("long")
    r_hi = F.least(
        F.ceil(p * n + zz * se), F.col("_n")
    ).cast("long")
    ranks = tot.select(
        "_n",
        r_pt.alias("_rpt"),
        r_lo.alias("_rlo"),
        r_hi.alias("_rhi"),
    )
    probed = iv.crossJoin(F.broadcast(ranks))

    def _pick(rank_col: str, out: str):
        return (
            probed.filter(
                (F.col(rank_col) <= F.col("_cum"))
                & (F.col(rank_col) > F.col("_cum") - F.col("_cnt"))
            )
            .select(F.col("_v").alias(out))
        )

    pt = _pick("_rpt", "value")
    lo_v = _pick("_rlo", "ci_lo")
    hi_v = _pick("_rhi", "ci_hi")
    return (
        ranks.crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(lo_v))
        .crossJoin(F.broadcast(hi_v))
        .select(
            F.lit(float(prob)).alias("prob"),
            F.col("_n").alias("n"),
            F.col("_rpt").alias("rank"),
            "value",
            F.col("_rlo").alias("rank_lo"),
            "ci_lo",
            F.col("_rhi").alias("rank_hi"),
            "ci_hi",
        )
    )


def proportion_ci(
    df: DataFrame,
    flag_col,
    group_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Per-group Wilson score interval for a rate — the error bar for
    every error-rate / conversion / null-rate this engine reports, and
    specifically NOT the naive Wald interval (p ± z√(p(1−p)/n)), which
    collapses to zero width at p = 0 or 1 — exactly where rate
    monitoring matters most ("0 errors in 50 rows" is NOT a 0%-wide
    certainty; Wilson gives [0, 7.1%]).

    center = (x + z²/2)/(n + z²), half = z·√(p(1−p)/n + z²/4n²)·n/(n+z²)
    — the standard closed form, computed from exact long counts in
    identical expression order, round-6.  NULL flags carry no evidence;
    groups keep a row even at x = 0 or x = n (the whole point).

    Output: (group, n, x, rate, ci_lo, ci_hi)."""
    g = F.col(group_col)
    flag = (F.col(flag_col) if isinstance(flag_col, str) else flag_col).cast(
        "boolean"
    )
    counts = (
        df.filter(g.isNotNull() & flag.isNotNull())
        .groupBy(g.alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("x"),
        )
    )
    zz = F.lit(float(z))
    n = F.col("n").cast("double")
    x = F.col("x").cast("double")
    p = x / n
    z2 = zz * zz
    center = (x + z2 / F.lit(2.0)) / (n + z2)
    half = (
        zz
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
        * n
        / (n + z2)
    )
    return counts.select(
        group_col,
        "n",
        "x",
        F.round(p, 6).alias("rate"),
        F.round(F.greatest(center - half, F.lit(0.0)), 6).alias("ci_lo"),
        F.round(F.least(center + half, F.lit(1.0)), 6).alias("ci_hi"),
    )


def correlation_ci(
    df: DataFrame, col_a: str, col_b: str, z: float = 1.959964
) -> DataFrame:
    """Fisher-z confidence interval for a Pearson correlation — the
    third member of the engine's error-bar trio (quantile_ci for
    location, proportion_ci for rates, this for association): r alone
    says nothing about whether 0.3 is real or noise; the Fisher
    transform z' = atanh(r) is approximately normal with SE 1/√(n−3),
    and the interval back-transforms through tanh.

    Exactness: r derives from exact quantized decimal moments (the
    correlation_pairs contract); atanh/tanh are written EXPLICITLY as
    0.5·ln((1+r)/(1−r)) and (e²ᶻ−1)/(e²ᶻ+1) so both engines evaluate
    the same ln/exp compositions in the same order (the engine's
    round-6 guard absorbs last-ulp libm variation, as everywhere ln is
    already oracled).  Degenerate cases by contract: n < 4 or |r| = 1
    (atanh diverges) report NULL bounds.

    Output: one row (n, r, ci_lo, ci_hi)."""
    a = F.col(col_a)
    b = F.col(col_b)
    am = F.round(a * F.lit(1000000.0)).cast("long")
    bm = F.round(b * F.lit(1000000.0)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = df.filter(a.isNotNull() & b.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec(am)).alias("_sx"),
        F.sum(dec(bm)).alias("_sy"),
        F.sum(dec(am) * am).alias("_sxx"),
        F.sum(dec(bm) * bm).alias("_syy"),
        F.sum(dec(am) * bm).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    # the degeneracy gate compares the ROUND-6 r: a perfect line computes
    # r = 0.999999999999…8 in doubles, slips past |r| < 1, and the
    # back-transform returns a fake ~1.0-wide bound (found by test)
    ok = (
        (F.col("_n") >= 4)
        & (vx > 0.0)
        & (vy > 0.0)
        & (F.abs(F.round(r, 6)) < 1.0)
    )
    zf = F.lit(0.5) * F.log((F.lit(1.0) + r) / (F.lit(1.0) - r))
    se = F.lit(float(z)) / F.sqrt(n - F.lit(3.0))

    def back(zv):
        e2 = F.exp(F.lit(2.0) * zv)
        return (e2 - F.lit(1.0)) / (e2 + F.lit(1.0))

    return m.select(
        F.col("_n").alias("n"),
        F.when((vx > 0.0) & (vy > 0.0), F.round(r, 6)).alias("r"),
        F.when(ok, F.round(back(zf - se), 6)).alias("ci_lo"),
        F.when(ok, F.round(back(zf + se), 6)).alias("ci_hi"),
    )


def grouped_correlation_ci(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Per-group Fisher-z correlation CI — the association error-bar
    PANEL: which segment's correlation is real and which is a small-n
    mirage (a segment of 40 rows at r = 0.3 and one of 40,000 at
    r = 0.03 can be equally (in)significant — the intervals say so,
    the point estimates lie).  Identical contracts to correlation_ci
    (exact decimal moments, explicit ln/exp, ROUND-6 degeneracy gate),
    grouped: one keyed aggregate, group-sized output, nothing global.

    Output: (group, n, r, ci_lo, ci_hi) — one row per group."""
    g = F.col(group_col)
    a, b = F.col(col_a), F.col(col_b)
    am = F.round(a * F.lit(1000000.0)).cast("long")
    bm = F.round(b * F.lit(1000000.0)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        df.filter(g.isNotNull() & a.isNotNull() & b.isNotNull())
        .groupBy(g.alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(dec(am)).alias("_sx"),
            F.sum(dec(bm)).alias("_sy"),
            F.sum(dec(am) * am).alias("_sxx"),
            F.sum(dec(bm) * bm).alias("_syy"),
            F.sum(dec(am) * bm).alias("_sxy"),
        )
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    ok = (
        (F.col("_n") >= 4)
        & (vx > 0.0)
        & (vy > 0.0)
        & (F.abs(F.round(r, 6)) < 1.0)
    )
    zf = F.lit(0.5) * F.log((F.lit(1.0) + r) / (F.lit(1.0) - r))
    se = F.lit(float(z)) / F.sqrt(n - F.lit(3.0))

    def back(zv):
        e2 = F.exp(F.lit(2.0) * zv)
        return (e2 - F.lit(1.0)) / (e2 + F.lit(1.0))

    return m.select(
        group_col,
        F.col("_n").alias("n"),
        F.when((vx > 0.0) & (vy > 0.0), F.round(r, 6)).alias("r"),
        F.when(ok, F.round(back(zf - se), 6)).alias("ci_lo"),
        F.when(ok, F.round(back(zf + se), 6)).alias("ci_hi"),
    )
