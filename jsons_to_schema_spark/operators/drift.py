"""Distribution-drift detection vs a baseline snapshot (north_rule check #4).

Quantile-vector comparison: take Q quantiles of a numeric column on the
baseline slice and the current slice, report per-quantile deltas and a
max-abs-delta drift score.

Two quantile engines:

* ``approx`` — ``percentile_approx`` (Greenwald-Khanna in Spark): mergeable,
  single-pass, constant memory — the 100 TB path.  Accuracy set by
  ``accuracy`` (default 10_000 ≈ 0.01% rank error).
* ``exact``  — ``percentile``: exact interpolated quantiles, used for the
  DuckDB oracle comparison at test scale.

A t-digest sketch (cf. PAPERS.md quantile-sketch refs) would add mergeable
*relative*-error quantiles; GK via percentile_approx already satisfies the
single-multi-aggregate-pass requirement, so t-digest is kept as a pandas-UDAF
extension point, not the default path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PROBS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _quantiles(col: str, probs: list[float], engine: str, accuracy: int) -> Column:
    if engine == "exact":
        return F.percentile(col, F.array(*[F.lit(p) for p in probs]))
    return F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy))


def quantile_drift(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    probs: list[float] | None = None,
    engine: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-quantile drift between two slices of the same column.

    Returns (p, base_q, cur_q, delta) — one row per requested quantile.
    Each side is one aggregate pass (partial+final); the two tiny result rows
    are cross-joined, never the data.
    """
    probs = probs or DEFAULT_PROBS
    b = baseline.agg(_quantiles(column, probs, engine, accuracy).alias("bq"))
    c = current.agg(_quantiles(column, probs, engine, accuracy).alias("cq"))
    joined = b.crossJoin(c)
    # an EMPTY/all-null slice aggregates to a NULL quantile array, and
    # posexplode(NULL zip) would emit ZERO rows — the highest-drift event
    # possible (the data vanished) read as "no drift" (r3 review).  A null
    # array of the right length keeps one row per quantile with NULL
    # base_q/cur_q/delta, which a monitor can distinguish from delta=0.
    null_arr = F.array(*[F.lit(None).cast("double") for _ in probs])
    joined = joined.select(
        F.coalesce(F.col("bq"), null_arr).alias("bq"),
        F.coalesce(F.col("cq"), null_arr).alias("cq"),
    )
    exploded = joined.select(
        F.posexplode(F.arrays_zip("bq", "cq")).alias("i", "q")
    ).select(
        F.element_at(F.array(*[F.lit(p) for p in probs]), F.col("i") + 1).alias("p"),
        F.col("q.bq").alias("base_q"),
        F.col("q.cq").alias("cur_q"),
        (F.col("q.cq") - F.col("q.bq")).alias("delta"),
    )
    return exploded


def drift_score(drift_df: DataFrame) -> DataFrame:
    """Collapse a quantile-drift frame to one row: max |delta| and L1.
    NULL outputs mean a slice was EMPTY (see quantile_drift) — treat as an
    alert, never as zero drift."""
    return drift_df.agg(
        F.max(F.abs("delta")).alias("max_abs_delta"),
        F.sum(F.abs("delta")).alias("l1_delta"),
    )


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index report between two slices of a numeric
    column — the industry-standard binned drift metric that complements
    the quantile-vector comparison above (quantiles localize WHERE the
    distribution moved; PSI gives the single monitorable number with the
    conventional 0.1 / 0.25 alert thresholds).

    Both sides are bucketed with the SAME equi-width expression as
    ``stats.column_histogram`` (floor((x - lo)/w), col == hi clamped into
    the last bucket, NULL/out-of-range excluded), so each side is one
    map-side-partial groupBy bounded by the bucket count — never a
    data-sized shuffle.  Proportions are additively smoothed,
    p = (n + s) / (N + s·B), so an empty bucket (or an entirely empty
    side) contributes a finite, well-defined term instead of ±inf; the
    per-bucket term (p_cur − p_base)·ln(p_cur/p_base) is rounded to 6
    decimals so the cross-engine comparison is summation-order-proof
    (repo oracle hygiene).

    Returns one row per bucket: (bucket, bucket_lo, bucket_hi, base_n,
    cur_n, psi_term).  Fold with ``psi_score`` for the scalar.
    """
    from .stats import column_histogram

    if smoothing <= 0:
        raise ValueError("psi_report: smoothing must be > 0 (guards ln(0))")
    b = column_histogram(baseline, column, lo, hi, n_buckets).select(
        "bucket", "bucket_lo", "bucket_hi", F.col("n_rows").alias("base_n")
    )
    c = column_histogram(current, column, lo, hi, n_buckets).select(
        "bucket", F.col("n_rows").alias("cur_n")
    )
    joined = b.join(F.broadcast(c), "bucket")
    # Side totals come from a single-partition window over the BOUNDED
    # histogram (≤ n_buckets rows) — a second .agg() over `joined` would
    # re-execute the lineage and pay two more full corpus scans.
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    s = float(smoothing)
    denom_pad = F.lit(s * n_buckets)
    with_t = joined.withColumn("_bt", F.sum("base_n").over(w)).withColumn(
        "_ct", F.sum("cur_n").over(w)
    )
    pb = (F.col("base_n") + F.lit(s)) / (F.col("_bt") + denom_pad)
    pc = (F.col("cur_n") + F.lit(s)) / (F.col("_ct") + denom_pad)
    return with_t.select(
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "base_n",
        "cur_n",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
    )


def psi_score(report: DataFrame) -> DataFrame:
    """Collapse a psi_report to one row: psi = Σ psi_term (already
    round-6 per term; re-rounded so the sum is grid-exact), plus the
    conventional verdict bands."""
    return report.agg(
        F.round(F.sum("psi_term"), 6).alias("psi"),
        (F.round(F.sum("psi_term"), 6) >= 0.25).alias("major_shift"),
        (F.round(F.sum("psi_term"), 6) >= 0.10).alias("moderate_shift"),
    )


def divergence_report(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """The full binned-divergence panel between two slices of a numeric
    column: per-bucket terms for PSI, Jensen-Shannon divergence,
    chi-squared, the Kolmogorov-Smirnov statistic, and the Wasserstein-1
    (earth mover) distance — five drift metrics with different failure
    sensitivities (PSI/JS weight proportional shifts, chi-squared
    amplifies shifts in thin buckets, KS catches a cumulative location
    shift the bucket-local metrics smear out, Wasserstein alone is
    MAGNITUDE-aware: a one-bucket nudge and a nine-bucket jump give the
    same KS but very different transport cost), all from the SAME two
    bounded histogram passes PSI alone already pays.

    Bucketing is column_histogram's equi-width expression; each side is
    one map-side-partial groupBy bounded by the bucket count.  PSI/JS/chi2
    use additively smoothed proportions p = (n + s)/(N + s·B) so empty
    buckets stay finite; JS is in nats with m = (p_base + p_cur)/2;
    chi-squared is Σ (o_cur − E)²/E with E = p_base·(N_cur + s·B) (expected
    current count under the base distribution, on the smoothed grid).  KS
    and Wasserstein use RAW cumulative shares (both are CDF properties;
    smoothing would bias them) — an empty side yields NULL ks_term /
    emd_term rows, which a monitor must read as an alert, never as zero
    drift.  emd_term = |CDF_base − CDF_cur| × bucket_width, so Σ emd_term
    is the exact W₁ distance between the two BINNED distributions (each
    bucket's mass at its grid point; the overflow bucket counts one
    width — the binned estimator's documented truncation).  Every term is
    round(6) so the cross-engine comparison is summation-order-proof.

    Returns one row per bucket: (bucket, bucket_lo, bucket_hi, base_n,
    cur_n, psi_term, js_term, chi2_term, ks_term, emd_term).  Fold with
    ``divergence_score`` for the five scalars.

    Scale: identical to psi_report — two corpus scans (one per side), all
    downstream arithmetic on the ≤ n_buckets-row table via
    single-partition windows (bounded by construction).
    """
    from pyspark.sql import Window

    from .stats import column_histogram

    if smoothing <= 0:
        raise ValueError("divergence_report: smoothing must be > 0")
    b = column_histogram(baseline, column, lo, hi, n_buckets).select(
        "bucket", "bucket_lo", "bucket_hi", F.col("n_rows").alias("base_n")
    )
    c = column_histogram(current, column, lo, hi, n_buckets).select(
        "bucket", F.col("n_rows").alias("cur_n")
    )
    joined = b.join(F.broadcast(c), "bucket")
    w = Window.partitionBy(F.lit(1))
    w_cum = (
        Window.partitionBy(F.lit(1))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = float(smoothing)
    denom_pad = F.lit(s * n_buckets)
    with_t = (
        joined.withColumn("_bt", F.sum("base_n").over(w))
        .withColumn("_ct", F.sum("cur_n").over(w))
        .withColumn("_cb", F.sum("base_n").over(w_cum))
        .withColumn("_cc", F.sum("cur_n").over(w_cum))
    )
    pb = (F.col("base_n") + F.lit(s)) / (F.col("_bt") + denom_pad)
    pc = (F.col("cur_n") + F.lit(s)) / (F.col("_ct") + denom_pad)
    m = (pb + pc) / 2
    expected = pb * (F.col("_ct") + denom_pad)
    observed = F.col("cur_n") + F.lit(s)
    # raw CDF shares: NULL when a side is empty (0/0), by design
    cdf_b = F.when(F.col("_bt") > 0, F.col("_cb") / F.col("_bt"))
    cdf_c = F.when(F.col("_ct") > 0, F.col("_cc") / F.col("_ct"))
    return with_t.select(
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "base_n",
        "cur_n",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
        F.round(0.5 * pb * F.log(pb / m) + 0.5 * pc * F.log(pc / m), 6).alias(
            "js_term"
        ),
        F.round(F.pow(observed - expected, 2) / expected, 6).alias("chi2_term"),
        F.round(F.abs(cdf_b - cdf_c), 6).alias("ks_term"),
        F.round(
            F.abs(cdf_b - cdf_c) * F.lit((hi - lo) / n_buckets), 6
        ).alias("emd_term"),
    )


def divergence_score(report: DataFrame) -> DataFrame:
    """Collapse a divergence_report to one row of the five scalars:
    psi = Σ psi_term, js_divergence = Σ js_term (nats), chi2 = Σ chi2_term,
    ks_stat = max ks_term, wasserstein = Σ emd_term (column units — the
    mean transport distance between the binned distributions).  Terms are
    already round(6); sums re-round so the result is grid-exact.  A NULL
    ks_stat / wasserstein means a slice was EMPTY — alert, never zero."""
    return report.agg(
        F.round(F.sum("psi_term"), 6).alias("psi"),
        F.round(F.sum("js_term"), 6).alias("js_divergence"),
        F.round(F.sum("chi2_term"), 6).alias("chi2"),
        F.max("ks_term").alias("ks_stat"),
        F.round(F.sum("emd_term"), 6).alias("wasserstein"),
    )


def psi_report_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """Sliced PSI: one drift report PER GROUP (per language, per source,
    per event type) — global PSI answers "did the table drift", this
    answers "which segment drifted", and a segment collapse can hide
    entirely inside a stable global distribution.

    Same arithmetic as psi_report, one level deeper: each side is ONE
    map-side-partial groupBy on (group, bucket) — shuffle bounded by
    groups × buckets, never the data; the spine is (groups present on
    either side) × (all buckets) so empty buckets and one-sided groups
    keep finite smoothed terms; per-group totals fold via a window
    partitioned by group over the bounded count table (no re-scan).

    Output: (group, bucket, bucket_lo, bucket_hi, base_n, cur_n,
    psi_term) — group is the group value cast to string (NULL groups are
    excluded: slice them explicitly if NULL is a segment of interest)."""
    if smoothing <= 0:
        raise ValueError("psi_report_grouped: smoothing must be > 0")
    if n_buckets <= 0 or not hi > lo:
        raise ValueError("psi_report_grouped: need n_buckets > 0 and hi > lo")
    from pyspark.sql import Window

    w_bucket = (hi - lo) / n_buckets
    s = float(smoothing)

    def _counts(df: DataFrame, alias: str) -> DataFrame:
        c = F.col(column)
        bucket = F.least(
            F.floor((c - F.lit(float(lo))) / F.lit(w_bucket)).cast("long"),
            F.lit(n_buckets - 1),
        )
        return (
            df.filter(
                F.col(group_col).isNotNull()
                & c.isNotNull()
                & (c >= float(lo))
                & (c <= float(hi))
            )
            .groupBy(
                F.col(group_col).cast("string").alias("group"),
                bucket.alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias(alias))
        )

    b = _counts(baseline, "base_n")
    c = _counts(current, "cur_n")
    # Merge the two bounded count tables ONCE (each corpus side is scanned
    # exactly once), then pin the merged table before it is used twice
    # (group discovery + the spine join).  Deriving groups straight from
    # b/c re-executes their lineage — the column-pruned group projection
    # makes the subtree non-identical, so ReusedExchange never fires and
    # each corpus side would scan TWICE (measured).  The lazy
    # localCheckpoint (dedup._materialize_once precedent) is groups ×
    # present-buckets sized — KBs, never data-scale.
    m = (
        b.join(c, ["group", "bucket"], "full_outer")
        .select(
            "group",
            "bucket",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
        .localCheckpoint(eager=False)
    )
    spark = baseline.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    spine = m.select("group").distinct().crossJoin(F.broadcast(buckets))
    joined = spine.join(m, ["group", "bucket"], "left").select(
        "group",
        "bucket",
        F.coalesce("base_n", F.lit(0)).alias("base_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    w = Window.partitionBy("group")
    denom_pad = F.lit(s * n_buckets)
    with_t = joined.withColumn("_bt", F.sum("base_n").over(w)).withColumn(
        "_ct", F.sum("cur_n").over(w)
    )
    pb = (F.col("base_n") + F.lit(s)) / (F.col("_bt") + denom_pad)
    pc = (F.col("cur_n") + F.lit(s)) / (F.col("_ct") + denom_pad)
    return with_t.select(
        "group",
        "bucket",
        (F.lit(float(lo)) + F.col("bucket") * F.lit(w_bucket)).alias("bucket_lo"),
        (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w_bucket)).alias(
            "bucket_hi"
        ),
        "base_n",
        "cur_n",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
    )


def psi_score_grouped(report: DataFrame) -> DataFrame:
    """Per-group PSI verdicts from a grouped report: (group, psi,
    moderate_shift, major_shift) — the monitor row per segment."""
    agg = report.groupBy("group").agg(F.round(F.sum("psi_term"), 6).alias("psi"))
    return agg.select(
        "group",
        "psi",
        (F.col("psi") >= 0.10).alias("moderate_shift"),
        (F.col("psi") >= 0.25).alias("major_shift"),
    )


def psi_from_baseline_counts(
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int,
    baseline_counts: "dict[int, int]",
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI report of a slice against a PINNED baseline histogram (bucket →
    count) — the monitoring form: the baseline is profiled once (e.g. from
    the accepted corpus snapshot, via stats.column_histogram) and stored;
    every later slice/micro-batch compares against those stored counts
    without ever re-scanning the baseline data.  Same bucket expression
    and smoothed-term arithmetic as psi_report."""
    if smoothing <= 0:
        raise ValueError("psi_from_baseline_counts: smoothing must be > 0")
    from .stats import column_histogram

    spark = current.sparkSession
    base_rows = [
        (int(b), int(baseline_counts.get(b, 0))) for b in range(n_buckets)
    ]
    b = spark.createDataFrame(base_rows, "bucket long, base_n long")
    c = column_histogram(current, column, lo, hi, n_buckets).select(
        "bucket", "bucket_lo", "bucket_hi", F.col("n_rows").alias("cur_n")
    )
    joined = c.join(F.broadcast(b), "bucket")
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    s = float(smoothing)
    denom_pad = F.lit(s * n_buckets)
    with_t = joined.withColumn("_bt", F.sum("base_n").over(w)).withColumn(
        "_ct", F.sum("cur_n").over(w)
    )
    pb = (F.col("base_n") + F.lit(s)) / (F.col("_bt") + denom_pad)
    pc = (F.col("cur_n") + F.lit(s)) / (F.col("_ct") + denom_pad)
    return with_t.select(
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "base_n",
        "cur_n",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
    )


def psi_report_multi(
    baseline: DataFrame,
    current: DataFrame,
    specs: "dict[str, tuple[float, float]]",
    n_buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI for N columns in TWO scans total (one per side), not 2N — the
    single-multi-aggregate-pass ethos applied to drift: each side melts
    every monitored column into (column, bucket) rows inside the scan
    projection (an array-of-structs inline, the column_entropy melt
    shape), then ONE map-side-partial groupBy bounded by N × buckets.

    ``specs`` maps column name → (lo, hi); each column buckets with its
    own equi-width expression (identical to column_histogram's).  The
    spine is built from the spec LITERALS — no lineage reuse, so no
    checkpoint is needed and each corpus side is scanned exactly once by
    construction.  Per-column totals fold via a window partitioned by
    column over the bounded table.

    Output: (column, bucket, bucket_lo, bucket_hi, base_n, cur_n,
    psi_term) — one row per column × bucket, psi_term round(6).  Fold
    per column with psi_score_grouped(report.withColumnRenamed("column",
    "group")) or a groupBy("column").sum("psi_term")."""
    if smoothing <= 0:
        raise ValueError("psi_report_multi: smoothing must be > 0")
    if not specs:
        raise ValueError("psi_report_multi: specs must be non-empty")
    for col, (lo, hi) in specs.items():
        if not hi > lo:
            raise ValueError(f"psi_report_multi: need hi > lo for {col!r}")
    from pyspark.sql import Window

    def _counts(df: DataFrame, alias: str) -> DataFrame:
        entries = []
        for col, (lo, hi) in sorted(specs.items()):
            w_b = (hi - lo) / n_buckets
            c = F.col(col)
            bucket = F.when(
                c.isNotNull() & (c >= float(lo)) & (c <= float(hi)),
                F.least(
                    F.floor((c - F.lit(float(lo))) / F.lit(w_b)).cast("long"),
                    F.lit(n_buckets - 1),
                ),
            )
            entries.append(
                F.struct(F.lit(col).alias("column"), bucket.alias("bucket"))
            )
        melted = df.select(F.explode(F.array(*entries)).alias("_e")).select(
            F.col("_e.column").alias("column"), F.col("_e.bucket").alias("bucket")
        )
        return (
            melted.filter(F.col("bucket").isNotNull())
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    spark = baseline.sparkSession
    spine_rows = []
    for col, (lo, hi) in sorted(specs.items()):
        w_b = (hi - lo) / n_buckets
        for b in range(n_buckets):
            spine_rows.append((col, b, lo + b * w_b, lo + (b + 1) * w_b))
    spine = spark.createDataFrame(
        spine_rows, "column string, bucket long, bucket_lo double, bucket_hi double"
    )
    joined = (
        spine.join(_counts(baseline, "base_n"), ["column", "bucket"], "left")
        .join(_counts(current, "cur_n"), ["column", "bucket"], "left")
        .select(
            "column",
            "bucket",
            "bucket_lo",
            "bucket_hi",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    w = Window.partitionBy("column")
    s = float(smoothing)
    denom_pad = F.lit(s * n_buckets)
    with_t = joined.withColumn("_bt", F.sum("base_n").over(w)).withColumn(
        "_ct", F.sum("cur_n").over(w)
    )
    pb = (F.col("base_n") + F.lit(s)) / (F.col("_bt") + denom_pad)
    pc = (F.col("cur_n") + F.lit(s)) / (F.col("_ct") + denom_pad)
    return with_t.select(
        "column",
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "base_n",
        "cur_n",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
    )


def category_shift(
    baseline: DataFrame, current: DataFrame, column: str
) -> DataFrame:
    """CATEGORICAL domain drift: which category values appeared, vanished,
    or moved mass between a baseline snapshot and the current slice.  The
    numeric drift family (PSI / divergence / quantiles) bins values and
    cannot say "a brand-new enum member showed up" — the single most
    common schema-adjacent regression in categorical feeds — or "a member
    silently disappeared"; this names them.

    One grouped count per side (map-side partial, shuffle bounded by the
    category cardinality — this operator is FOR categorical columns; a
    near-unique column belongs to heavy_hitters/top_values), full-outer
    join on the category, then pure arithmetic: per-category baseline and
    current shares (round(6) from exact longs), share delta, and a status
    verdict — 'new' (no baseline mass), 'vanished' (no current mass),
    'stable' otherwise.  NULL categories are excluded (null-rate is
    missingness's number, not a domain member); values compare in their
    cast-string form so the report is type-stable across snapshots whose
    physical type widened."""

    def _counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.col(column).cast("string").alias("category"))
            .filter(F.col("category").isNotNull())
            .groupBy("category")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    joined = _counts(baseline, "base_n").join(
        _counts(current, "cur_n"), "category", "full_outer"
    )
    # totals fold over the bounded category table, broadcast back — the
    # corpus never rescans (drift.py psi pattern)
    joined = joined.select(
        "category",
        F.coalesce("base_n", F.lit(0)).alias("base_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    ).localCheckpoint(eager=False)
    totals = joined.agg(
        F.sum("base_n").alias("_bt"), F.sum("cur_n").alias("_ct")
    )
    base_share = F.when(
        F.col("_bt") > 0, F.round(F.col("base_n") / F.col("_bt"), 6)
    ).otherwise(F.lit(0.0))
    cur_share = F.when(
        F.col("_ct") > 0, F.round(F.col("cur_n") / F.col("_ct"), 6)
    ).otherwise(F.lit(0.0))
    return joined.crossJoin(F.broadcast(totals)).select(
        "category",
        "base_n",
        "cur_n",
        base_share.alias("base_share"),
        cur_share.alias("cur_share"),
        F.round(cur_share - base_share, 6).alias("share_delta"),
        F.when(F.col("base_n") == 0, F.lit("new"))
        .when(F.col("cur_n") == 0, F.lit("vanished"))
        .otherwise(F.lit("stable"))
        .alias("status"),
    )


def level_shift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    every_seconds: int,
    min_side: int = 2,
    threshold: float = 4.0,
) -> DataFrame:
    """Single most-likely level-shift changepoint in a time series — the
    binary-segmentation first step: bucket the column to a fixed grid,
    then scan every boundary for the largest standardized mean difference
    between the left and right segments.  Catches WHEN a distribution
    moved, which the PSI/divergence panels (two fixed slices) cannot
    locate.

    Shape: the corpus collapses to (bucket, round6 mean) cells in ONE
    map-side-partial groupBy; the boundary scan is prefix sums + windows
    over the calendar-bounded cell table (a year of hourly buckets is
    8,760 rows), never a second corpus pass.  Buckets weigh equally in
    the scan (the series view), documented contract.

    Statistic at split i of n buckets: |mean_L − mean_R| / (s·√(1/i +
    1/(n−i))) with s the bucket-level sample stddev — Welford-stable in
    both engines, and the statistic is round(6)-ed BEFORE the argmax
    ranking so low-bit engine differences cannot flip the winner (ties
    break to the earliest boundary).  Splits leaving fewer than
    ``min_side`` buckets on either side are not scanned.

    Output: ONE row (boundary_bucket_us = first bucket of the right
    segment, n_buckets, mean_before, mean_after, shift, stat — all
    round6, shifted = stat > threshold); zero rows when fewer than
    2·min_side buckets exist (nothing scannable, never a fake verdict)."""
    if every_seconds <= 0:
        raise ValueError("level_shift: every_seconds must be positive")
    if min_side < 1:
        raise ValueError("level_shift: min_side must be >= 1")
    from pyspark.sql import Window
    from .stats import _epoch_us_col

    every_us = every_seconds * 1_000_000
    us = _epoch_us_col(df, ts_col)
    cells = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select((us - F.pmod(us, F.lit(every_us))).alias("bucket_us"),
                F.col(value_col).alias("_v"))
        .groupBy("bucket_us")
        .agg(F.round(F.avg("_v"), 6).alias("_m"))
    )
    w_ord = Window.orderBy("bucket_us")
    w_all = Window.partitionBy()
    scan = cells.select(
        "bucket_us",
        F.row_number().over(w_ord).alias("_i"),
        F.sum("_m").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_cum"),
        F.sum("_m").over(w_all).alias("_tot"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
        F.stddev_samp("_m").over(w_all).alias("_s"),
        F.lead("bucket_us").over(w_ord).alias("_next_bucket"),
    ).filter(
        (F.col("_i") >= F.lit(min_side))
        & (F.col("_i") <= F.col("_n") - F.lit(min_side))
    )
    mean_l = F.col("_cum") / F.col("_i")
    mean_r = (F.col("_tot") - F.col("_cum")) / (F.col("_n") - F.col("_i"))
    # try_divide: a constant series (s = 0) yields stat NULL, not an ANSI
    # divide-by-zero failure
    stat = F.round(
        F.try_divide(
            F.abs(mean_l - mean_r),
            F.col("_s")
            * F.sqrt(1.0 / F.col("_i") + 1.0 / (F.col("_n") - F.col("_i"))),
        ),
        6,
    )
    ranked = scan.select(
        F.col("_next_bucket").alias("boundary_bucket_us"),
        F.col("_n").cast("long").alias("n_buckets"),
        F.round(mean_l, 6).alias("mean_before"),
        F.round(mean_r, 6).alias("mean_after"),
        F.round(mean_r - mean_l, 6).alias("shift"),
        stat.alias("stat"),
        F.row_number().over(
            Window.orderBy(stat.desc(), F.col("bucket_us").asc())
        ).alias("_rn"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "boundary_bucket_us",
        "n_buckets",
        "mean_before",
        "mean_after",
        "shift",
        "stat",
        # a constant series has s = 0 → stat NULL → verdict false, not NULL
        F.coalesce(
            F.col("stat") > F.lit(float(threshold)), F.lit(False)
        ).alias("shifted"),
    )


# ---------------------------------------------------------------------------
# Embedding drift (round-4 wave 44)
# ---------------------------------------------------------------------------


def embedding_drift(
    base: DataFrame,
    current: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distribution drift for an embedding column between two snapshots —
    the vector-space counterpart of the numeric/categorical drift panel
    (did the encoder, the corpus mix, or an upstream normalization step
    move the representation?).

    Determinism contract (the session-wide integer discipline): each
    component quantizes to 1e-6 at the scan, per-dimension sums are EXACT
    decimal(38,0) aggregates, and

    - ``centroid_cosine``   = cos(centroid_b, centroid_c) computed from
      the integer sum vectors directly (the n·1e6 scales cancel):
      dot and norms are exact decimal sums over dimensions, divided once
      in double — zero FP accumulation anywhere;
    - ``centroid_shift_l2`` = sqrt(Σ_d q((cb_d − cc_d)²)) with the per-dim
      squared diff quantized to 1e-12 before the (long) sum.

    One explode → per-dim aggregate per snapshot (dim-sized shuffle, never
    corpus-sized).  NULL vectors carry no evidence; both snapshots must be
    dimension-uniform and equal-dimension (raises otherwise — use
    validate_embeddings for the audit).  Returns one row: (n_base,
    n_current, dim, centroid_cosine, centroid_shift_l2).
    """

    def _sums(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(vec_col)
        dims = df.filter(v.isNotNull()).select(
            F.size(v).alias("_d")
        ).distinct().collect()
        if len(dims) != 1:
            raise ValueError(
                f"embedding_drift: {tag} snapshot is not dimension-uniform: "
                f"{sorted(r['_d'] for r in dims)}"
            )
        exploded = df.filter(v.isNotNull()).select(
            F.posexplode(v).alias("_i", "_x")
        )
        return exploded.groupBy("_i").agg(
            F.sum(
                F.round(F.col("_x").cast("double") * F.lit(1000000.0))
                .cast("long")
                .cast("decimal(38,0)")
            ).alias(f"_s_{tag}")
        ), int(dims[0]["_d"])

    sb, dim_b = _sums(base, "b")
    sc, dim_c = _sums(current, "c")
    if dim_b != dim_c:
        raise ValueError(
            f"embedding_drift: dimension mismatch base={dim_b} current={dim_c}"
        )
    n_b = base.filter(F.col(vec_col).isNotNull()).count()
    n_c = current.filter(F.col(vec_col).isNotNull()).count()
    if n_b == 0 or n_c == 0:
        raise ValueError("embedding_drift: empty snapshot")
    j = sb.join(sc, "_i")
    cb = F.col("_s_b").cast("double") / F.lit(float(n_b)) / F.lit(1000000.0)
    cc = F.col("_s_c").cast("double") / F.lit(float(n_c)) / F.lit(1000000.0)
    agg = j.agg(
        F.sum(F.col("_s_b") * F.col("_s_c")).alias("_dot"),
        F.sum(F.col("_s_b") * F.col("_s_b")).alias("_nb2"),
        F.sum(F.col("_s_c") * F.col("_s_c")).alias("_nc2"),
        F.sum(
            F.round(F.lit(1e12) * ((cb - cc) * (cb - cc))).cast("long")
        ).alias("_sh2"),
    )
    return agg.select(
        F.lit(n_b).cast("long").alias("n_base"),
        F.lit(n_c).cast("long").alias("n_current"),
        F.lit(dim_b).cast("int").alias("dim"),
        F.round(
            F.col("_dot").cast("double")
            / (
                F.sqrt(F.col("_nb2").cast("double"))
                * F.sqrt(F.col("_nc2").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(F.sqrt(F.col("_sh2") / F.lit(1e12)), 6).alias("centroid_shift_l2"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov — exact, no global sort (wave 39)
# ---------------------------------------------------------------------------

def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact two-sample KS statistic between ``col`` in two frames; one
    output row (n_a, n_b, ks_d round-6, ks_at = the smallest value
    attaining the supremum).  NULLs are excluded per side.

    Both empirical CDFs are right-continuous step functions jumping only
    at pooled sample points, so sup|F_a - F_b| is attained at one of the
    distinct pooled values, evaluated with INCLUSIVE cumulative counts.
    The supremum search is exact integer arithmetic: maximize
    |cum_a * n_b - cum_b * n_a| (decimal(38,0) — two 10^12-scale counts
    multiply past int64) and divide ONCE at the end, so the statistic is
    bit-identical to an ordered oracle replay under any partitioning.

    No corpus-wide sort: the cumulative decomposes exactly like
    modeleval.roc_auc — distinct-value fold (one hash shuffle), an
    order-preserving fixed-width bin coarsening, an exclusive bin-prefix
    over the BOUNDED bin table (the only single-partition exchange,
    <= ``bins`` rows), and a keyed within-bin running sum."""
    if hi <= lo:
        raise ValueError(f"ks_drift: need lo < hi, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"ks_drift: bins must be >= 1, got {bins}")

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
    bin_tot = per.groupBy("_bin").agg(
        F.sum("_na").alias("_ba"), F.sum("_nb").alias("_bb")
    )
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = bin_tot.select(
        "_bin",
        F.coalesce(F.sum("_ba").over(w_bins), F.lit(0)).alias("_pa"),
        F.coalesce(F.sum("_bb").over(w_bins), F.lit(0)).alias("_pb"),
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)  # INCLUSIVE cumulative
    )
    tot = per.agg(
        F.sum("_na").cast("decimal(38,0)").alias("_ta"),
        F.sum("_nb").cast("decimal(38,0)").alias("_tb"),
    )
    cum = (
        per.withColumn("_cuma", F.sum("_na").over(w_in))
        .withColumn("_cumb", F.sum("_nb").over(w_in))
        .join(F.broadcast(bin_prefix), "_bin")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_diff",
            F.abs(
                (F.col("_cuma") + F.col("_pa")).cast("decimal(38,0)") * F.col("_tb")
                - (F.col("_cumb") + F.col("_pb")).cast("decimal(38,0)") * F.col("_ta")
            ),
        )
    )
    peak = cum.agg(F.max("_diff").alias("_m"))
    return (
        cum.join(F.broadcast(peak), F.col("_diff") == F.col("_m"))
        .agg(
            F.first("_ta").cast("long").alias("n_a"),
            F.first("_tb").cast("long").alias("n_b"),
            F.when(  # one-sided / empty inputs: KS undefined, not 0
                (F.first("_ta") > 0) & (F.first("_tb") > 0),
                F.round(
                    F.max("_m").cast("double")
                    / (F.first("_ta") * F.first("_tb")).cast("double"),
                    6,
                ),
            ).alias("ks_d"),
            F.min("_v").alias("ks_at"),
        )
    )


def wasserstein_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the empirical
    distributions of ``col`` in two frames — the drift number that speaks
    the metric's own units: "the value distribution moved 12 ms", where
    KS answers in probability mass and PSI in bits.  W1 = ∫|F_a − F_b|dx
    integrates the CDF gap, so it is the area between the two staircases:
    Σ over consecutive pooled distinct values of |F_a − F_b| · gap.

    Exactness: with values quantized to micro-units the statistic is the
    exact integer Σ |cum_a·n_b − cum_b·n_a| · gap_micro folded in
    decimal(38,0), divided ONCE by n_a·n_b·10^6 — bit-identical to an
    ordered replay under any partitioning (the ks_drift discipline,
    integrated instead of maximized).

    No corpus-wide sort: cumulative counts come from the same bin/value
    prefix decomposition as ks_drift; the successor gap needs each
    distinct value's NEXT pooled value — within-bin a keyed lead, across
    bins a lead over the BOUNDED non-empty-bin table joined back (the
    global last value has no successor and contributes nothing: both
    CDFs are 1 beyond it).  NULLs excluded per side.

    Output: one row (n_a, n_b, w1 round-6)."""
    if hi <= lo:
        raise ValueError(f"wasserstein_drift: need lo < hi, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"wasserstein_drift: bins must be >= 1, got {bins}")

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(col).cast("double")
        return df.filter(v.isNotNull()).select(
            F.round(v * F.lit(1000000.0)).cast("long").alias("_vm"),
            F.lit(ca).alias("_ca"),
            F.lit(cb).alias("_cb"),
        )

    width = (float(hi) - float(lo)) * 1e6 / int(bins)
    raw = F.floor((F.col("_vm") - F.lit(float(lo) * 1e6)) / F.lit(width)).cast(
        "long"
    )
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        side(df_a, 1, 0)
        .unionByName(side(df_b, 0, 1))
        .withColumn("_bin", binc)
        .groupBy("_bin", "_vm")
        .agg(F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb"))
    )
    bin_tot = per.groupBy("_bin").agg(
        F.sum("_na").alias("_ba"),
        F.sum("_nb").alias("_bb"),
        F.min("_vm").alias("_first"),
    )
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    w_lead = Window.orderBy("_bin")
    bin_meta = bin_tot.select(
        "_bin",
        F.coalesce(F.sum("_ba").over(w_bins), F.lit(0)).alias("_pa"),
        F.coalesce(F.sum("_bb").over(w_bins), F.lit(0)).alias("_pb"),
        F.lead("_first").over(w_lead).alias("_nextbin_v"),
    )
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_vm")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead_in = Window.partitionBy("_bin").orderBy("_vm")
    tot = per.agg(
        F.sum("_na").cast("decimal(38,0)").alias("_ta"),
        F.sum("_nb").cast("decimal(38,0)").alias("_tb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = (
        per.withColumn("_cuma", F.sum("_na").over(w_in))
        .withColumn("_cumb", F.sum("_nb").over(w_in))
        .withColumn("_lead", F.lead("_vm").over(w_lead_in))
        .join(F.broadcast(bin_meta), "_bin")
        .withColumn("_next", F.coalesce(F.col("_lead"), F.col("_nextbin_v")))
        .filter(F.col("_next").isNotNull())
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(
        dec(F.col("_cuma") + F.col("_pa")) * F.col("_tb")
        - dec(F.col("_cumb") + F.col("_pb")) * F.col("_ta")
    ) * dec(F.col("_next") - F.col("_vm"))
    agg = cum.agg(
        F.first("_ta").alias("_ta"),
        F.first("_tb").alias("_tb"),
        F.sum(term).alias("_area"),
    )
    return agg.select(
        F.col("_ta").cast("long").alias("n_a"),
        F.col("_tb").cast("long").alias("n_b"),
        F.round(
            F.col("_area").cast("double")
            / (F.col("_ta").cast("double") * F.col("_tb").cast("double"))
            / F.lit(1000000.0),
            6,
        ).alias("w1"),
    )


def wasserstein_drift_grouped(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    group_col: str,
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Per-group exact 1-Wasserstein drift — the per-key version of
    wasserstein_drift with the grouped_quantiles discipline: every stage
    (bin/value fold, bin prefix, within-bin cumulative, successor-gap
    leads) keys by the group, so the plan has ZERO single-partition
    exchanges and scales to any number of groups — the "which metric
    moved, and by how many of its own units" drift panel.

    Same exact arithmetic as the global operator (micro-unit integers,
    decimal area fold, one division); groups present on only one side
    report NULL w1 with their counts (no distance without both
    distributions).  Output: (group, n_a, n_b, w1)."""
    if hi <= lo:
        raise ValueError(
            f"wasserstein_drift_grouped: need lo < hi, got [{lo}, {hi})"
        )
    from pyspark.sql import Window

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        g = F.col(group_col)
        v = F.col(col).cast("double")
        return df.filter(g.isNotNull() & v.isNotNull()).select(
            g.cast("string").alias("_g"),
            F.round(v * F.lit(1000000.0)).cast("long").alias("_vm"),
            F.lit(ca).alias("_ca"),
            F.lit(cb).alias("_cb"),
        )

    width = (float(hi) - float(lo)) * 1e6 / int(bins)
    raw = F.floor(
        (F.col("_vm") - F.lit(float(lo) * 1e6)) / F.lit(width)
    ).cast("long")
    binc = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))
    per = (
        side(df_a, 1, 0)
        .unionByName(side(df_b, 0, 1))
        .withColumn("_bin", binc)
        .groupBy("_g", "_bin", "_vm")
        .agg(F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb"))
    )
    bin_tot = per.groupBy("_g", "_bin").agg(F.min("_vm").alias("_first"))
    w_bins = (
        Window.partitionBy("_g")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lead_bin = Window.partitionBy("_g").orderBy("_bin")
    bin_meta = bin_tot.select(
        "_g",
        "_bin",
        F.lead("_first").over(w_lead_bin).alias("_nextbin_v"),
    )
    w_in = (
        Window.partitionBy("_g", "_bin")
        .orderBy("_vm")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead_in = Window.partitionBy("_g", "_bin").orderBy("_vm")
    tot = per.groupBy("_g").agg(
        F.sum("_na").cast("decimal(38,0)").alias("_ta"),
        F.sum("_nb").cast("decimal(38,0)").alias("_tb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    t = F.col("_na") + F.col("_nb")
    cum = (
        per.withColumn("_cuma", F.sum("_na").over(w_in))
        .withColumn("_cumb", F.sum("_nb").over(w_in))
        .withColumn("_lead", F.lead("_vm").over(w_lead_in))
        .join(bin_meta, ["_g", "_bin"])
        .withColumn("_next", F.coalesce(F.col("_lead"), F.col("_nextbin_v")))
        .filter(F.col("_next").isNotNull())
        .join(tot, "_g")
    )
    # the joint bin prefix (_pref) carries BOTH sides; the CDF gap needs
    # PER-SIDE prefixes — fold them from per-side bin totals
    per_side_bins = per.groupBy("_g", "_bin").agg(
        F.sum("_na").alias("_ba"), F.sum("_nb").alias("_bb")
    )
    side_prefix = per_side_bins.select(
        "_g",
        "_bin",
        F.coalesce(F.sum("_ba").over(w_bins), F.lit(0)).alias("_pa"),
        F.coalesce(F.sum("_bb").over(w_bins), F.lit(0)).alias("_pb"),
    )
    cum2 = cum.join(side_prefix, ["_g", "_bin"])
    term = F.abs(
        dec(F.col("_cuma") + F.col("_pa")) * F.col("_tb")
        - dec(F.col("_cumb") + F.col("_pb")) * F.col("_ta")
    ) * dec(F.col("_next") - F.col("_vm"))
    area = cum2.groupBy("_g").agg(F.sum(term).alias("_area"))
    # derive the output from tot (which has EVERY group): a group whose
    # pooled support is a single distinct value has no successor rows at
    # all and would otherwise vanish (found by test); its area is 0
    out = tot.join(area, "_g", "left")
    both = (F.col("_ta") > 0) & (F.col("_tb") > 0)
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_ta").cast("long").alias("n_a"),
        F.col("_tb").cast("long").alias("n_b"),
        F.when(
            both,
            F.round(
                F.coalesce(F.col("_area"), F.lit(0).cast("decimal(38,0)"))
                .cast("double")
                / (F.col("_ta").cast("double") * F.col("_tb").cast("double"))
                / F.lit(1000000.0),
                6,
            ),
        ).alias("w1"),
    )
