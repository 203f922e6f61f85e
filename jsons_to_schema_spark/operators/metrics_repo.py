"""Metrics repository + metric-history anomaly detection (deequ-style).

Data-quality checks that compare a run against FIXED thresholds
(validate.rule_verdicts) miss the failures that matter most in a long-lived
ingestion pipeline: the table that silently shrinks 40%, the column whose
null rate creeps from 0.1% to 8%, the mean that jumps an order of magnitude
after an upstream schema change.  Catching those requires remembering what
the metrics looked like on PREVIOUS runs and flagging the current run when
it falls outside the historical distribution — deequ's
``MetricsRepository`` + ``AnomalyDetection`` pattern, re-expressed
Spark-first.

Three pieces:

* ``compute_metrics`` — ONE multi-aggregate scan per run (or ONE grouped
  scan for many runs at once) producing a LONG metric frame
  ``(run_id, dataset, instance, metric, value)``.  The melt from the wide
  aggregate row to long rows is a single ``stack`` projection over the
  bounded aggregate output — the 100 TB input is touched exactly once.
* ``MetricsRepository`` — an append-only parquet store of those rows,
  partitioned by run_id so history loads prune to the runs they need.
* ``detect_metric_anomalies`` — joins the current run's metrics against
  per-metric history aggregates (mean / stddev / last value; history is
  O(runs × columns × metrics) rows — KBs, broadcast side) and applies a
  deequ-style strategy:

  - ``online_normal``: |value − mean(history)| > k·stddev(history)
  - ``absolute_change``: |value − last(history)| > max_delta
  - ``relative_change``: value / last(history) outside [rate_lo, rate_hi]

  All comparisons are made on round(6) values so the verdict booleans are
  bit-stable across engines (the same convention as stats.correlation_pairs
  / column_entropy).

Scale shape: metric computation is the same partial+final HashAggregate
single scan as stats.column_stats; everything downstream of the aggregate
operates on metric rows, whose count is independent of table size.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}


def _is_numeric(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes)[col]
    return t.split("(")[0] in _NUMERIC


def compute_metrics(
    df: DataFrame,
    columns: list[str] | None = None,
    dataset: str = "df",
    run_id: int | None = 0,
    run_col: str | None = None,
    distinct: str | None = None,  # None | "exact" | "approx"
) -> DataFrame:
    """Long metric frame from ONE aggregate scan.

    Emitted metrics: ``size`` (instance ``*``), per-column
    ``completeness`` (non-null fraction), ``mean`` / ``min`` / ``max``
    (numeric columns), ``min_length`` / ``max_length`` (string columns —
    deequ's MinLength/MaxLength; a length collapse is how truncating
    upstream exports get caught) and optionally ``distinctness``
    (distinct/size; ``approx`` = HLL++, mergeable constant memory —
    the 10^12-row choice; ``exact`` is the oracle-friendly variant).

    ``run_col`` computes metrics for MANY runs in one grouped scan
    (run_id is taken from that column); otherwise the literal ``run_id``
    stamps every row.  Output: (run_id bigint, dataset, instance, metric,
    value double) — value is NULL only for the mean of an all-null slice.
    """
    # default to every column except the run column itself — a metric ON
    # the run id is noise (its completeness/mean track the id scheme, not
    # the data) and would pollute every history comparison
    columns = columns or [c for c in df.columns if c != run_col]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_nulls_{c}"))
        if _is_numeric(df, c):
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"_mean_{c}"))
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
        elif dict(df.dtypes)[c] == "string":
            aggs.append(
                F.min(F.length(c)).cast("double").alias(f"_minlen_{c}")
            )
            aggs.append(
                F.max(F.length(c)).cast("double").alias(f"_maxlen_{c}")
            )
        if distinct == "exact":
            aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(c).alias(f"_dist_{c}"))

    if run_col is not None:
        wide = df.groupBy(F.col(run_col).cast("bigint").alias("run_id")).agg(*aggs)
    else:
        wide = df.agg(*aggs).withColumn("run_id", F.lit(int(run_id)).cast("bigint"))

    # Melt: stack(n, metric, instance, value, ...) — one projection over the
    # bounded aggregate rows; quotes are safe because metric/instance names
    # are code-controlled identifiers.
    pairs: list[tuple[str, str, str]] = [("size", "*", "CAST(_n AS DOUBLE)")]
    for c in columns:
        pairs.append(
            ("completeness", c, f"1.0 - CAST(_nulls_{c} AS DOUBLE) / CAST(_n AS DOUBLE)")
        )
        if _is_numeric(df, c):
            pairs.append(("mean", c, f"_mean_{c}"))
            pairs.append(("minimum", c, f"_min_{c}"))
            pairs.append(("maximum", c, f"_max_{c}"))
        elif dict(df.dtypes)[c] == "string":
            pairs.append(("min_length", c, f"_minlen_{c}"))
            pairs.append(("max_length", c, f"_maxlen_{c}"))
        if distinct is not None:
            pairs.append(
                ("distinctness", c, f"CAST(_dist_{c} AS DOUBLE) / CAST(_n AS DOUBLE)")
            )
    stack = ", ".join(f"'{m}', '{i}', {v}" for m, i, v in pairs)
    return wide.select(
        "run_id",
        F.lit(dataset).alias("dataset"),
        F.expr(f"stack({len(pairs)}, {stack}) AS (metric, instance, value)"),
    ).select("run_id", "dataset", "instance", "metric", "value")


class MetricsRepository:
    """Append-only parquet store of metric rows, partitioned by run_id.

    ``save`` appends one run's rows (idempotent per run: an existing run_id
    partition is replaced, so a retried pipeline stamps clean numbers
    instead of duplicating history); ``load`` returns the full history
    frame; partition pruning keeps "last N runs" reads from touching old
    run files.
    """

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = str(path)

    def save(self, metrics: DataFrame) -> None:
        (
            metrics.repartition(1, "run_id")
            .write.mode("overwrite")
            .partitionBy("run_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path)
        )

    def load(self) -> DataFrame:
        return self.spark.read.parquet(self.path).select(
            "run_id", "dataset", "instance", "metric", "value"
        )

    def latest_run(self) -> int | None:
        row = self.load().agg(F.max("run_id").alias("m")).collect()[0]
        return None if row["m"] is None else int(row["m"])


def detect_metric_anomalies(
    metrics: DataFrame,
    current_run: int,
    strategy: str = "online_normal",
    k: float = 3.0,
    min_history: int = 2,
    max_delta: float | None = None,
    rate_lo: float | None = None,
    rate_hi: float | None = None,
    history_window: int | None = None,
    alpha: float = 0.3,
    season: "int | None" = None,
) -> DataFrame:
    """Anomaly verdicts for ``current_run`` against earlier runs —
    all of them, or only the trailing ``history_window`` runs.

    ``history_window`` matters twice at scale: a long-lived pipeline's
    early runs stop being representative (data genuinely grows), and the
    run-id lower bound is a PARTITION filter on the repository's
    run_id-partitioned store, so a windowed read prunes to N run
    directories instead of scanning years of history.

    History aggregates (mean, sample stddev, last value, run count) are
    computed per (dataset, instance, metric) over runs < current_run and
    joined to the current run's rows — both sides are metric rows, so this
    whole stage is KB-scale regardless of the underlying table size.

    Verdict rules (all on round-6 values, so both engines of the
    correctness harness compute the boolean from identical inputs):

    * ``online_normal``   — |value − mean| > k·stddev; a zero-stddev
      history flags ANY deviation (the deequ behaviour: constant history
      means the metric should stay constant).
    * ``absolute_change`` — |value − last| > max_delta.
    * ``relative_change`` — value/last < rate_lo or > rate_hi (NULL-safe:
      last == 0 flags unless value is also 0).
    * ``seasonal_normal`` — online_normal against SAME-PHASE history only
      (runs with run_id ≡ current mod ``season``): the weekly/daily
      pattern detector — a Sunday volume that is normal for Sundays but
      half the weekday mean must not flag, and a weekday value landing on
      a Sunday baseline must.  Composes with ``history_window``.
    * ``ewma`` — the Roberts control chart online_normal cannot replace:
      the test statistic z = α·value + (1−α)·EWMA(history) ACCUMULATES a
      slow drift run over run, so a creep whose every single point stays
      inside k·σ of the all-time mean still pushes z out of
      |z − hist_mean| > k·σ·sqrt(α/(2−α)·(1−(1−α)^{2(T+1)})) — the
      standard variance inflation at step T+1, EXACT because the
      recursion initializes at z₀ = hist_mean (the textbook chart).  The
      history EWMA folds as an explicit weight-per-run sum over the
      KB-scale history rows (closed form of the recurrence — order-
      independent and SQL-oracle-able); this strategy adds ``hist_ewma``,
      ``ewma_z`` and ``ewma_limit`` columns, and its history stats are
      over NON-NULL values by construction.

    Metrics with fewer than ``min_history`` history points get
    ``is_anomaly = NULL`` (not enough evidence), never a silent pass/fail.
    """
    if strategy not in (
        "online_normal",
        "absolute_change",
        "relative_change",
        "ewma",
        "seasonal_normal",
    ):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "seasonal_normal" and (season is None or season < 2):
        raise ValueError("seasonal_normal requires season >= 2")
    if strategy == "ewma" and not 0.0 < alpha < 1.0:
        raise ValueError("ewma requires 0 < alpha < 1")
    if strategy == "absolute_change" and max_delta is None:
        raise ValueError("absolute_change requires max_delta")
    if strategy == "relative_change" and (rate_lo is None or rate_hi is None):
        raise ValueError("relative_change requires rate_lo and rate_hi")

    # the metric frame is read twice (history aggregates + the current
    # run's rows); it is metric-row-sized by contract, but when a caller
    # composes it straight off compute_metrics the lineage is a
    # corpus-grouped scan that would run twice (r4 double-scan sweep) —
    # pin it.  Repository reads (the production path) were already cheap.
    metrics = metrics.localCheckpoint(eager=False)

    hist_pred = F.col("run_id") < F.lit(int(current_run))
    if strategy == "seasonal_normal":
        # same-PHASE history only: a Sunday run is judged against Sundays.
        # The phase filter composes with history_window; everything after
        # it is the online_normal math, so a zero-stddev phase history
        # (the common planted-seasonality case) flags ANY deviation.
        hist_pred = hist_pred & (
            F.col("run_id") % F.lit(int(season))
            == F.lit(int(current_run) % int(season))
        )
    if history_window is not None:
        if history_window < 1:
            raise ValueError("history_window must be >= 1")
        hist_pred = hist_pred & (
            F.col("run_id") >= F.lit(int(current_run) - int(history_window))
        )
    key = ["dataset", "instance", "metric"]
    if strategy == "ewma":
        # closed form of the TEXTBOOK Roberts chart recursion
        # z_t = α·x_t + (1−α)·z_{t−1} initialized at z_0 = hist_mean (the
        # in-control center): history value x_t carries weight
        # α(1−α)^(T−t) and the center carries (1−α)^T — with this
        # initialization the variance-inflation factor below is EXACT
        # (review finding: starting at x_1 gave x_1 the full (1−α)^(T−1)
        # weight, understating Var(z) and over-flagging short histories).
        # One agg over the NULL-filtered ranked history (so n_history and
        # the EWMA weights agree; the base-strategy agg is not built at
        # all on this branch — review finding: the dead copy diverged on
        # hist_last for NULL-valued latest runs, a difference now explicit:
        # ewma's history stats are over non-null values by construction).
        from pyspark.sql import Window

        a = float(alpha)
        hw = Window.partitionBy(*key).orderBy("run_id")
        hall = Window.partitionBy(*key)
        ranked = (
            metrics.filter(hist_pred & F.col("value").isNotNull())
            .select(*key, "run_id", "value")
            .withColumn("_rn", F.row_number().over(hw))
            .withColumn("_t", F.count(F.lit(1)).over(hall))
        )
        w = F.lit(a) * F.pow(F.lit(1.0 - a), F.col("_t") - F.col("_rn"))
        hist = ranked.groupBy(*key).agg(
            F.round(F.avg("value"), 6).alias("hist_mean"),
            F.round(F.coalesce(F.stddev_samp("value"), F.lit(0.0)), 6).alias(
                "hist_stddev"
            ),
            F.round(F.max_by("value", "run_id"), 6).alias("hist_last"),
            F.count("value").alias("n_history"),
            F.round(
                F.sum(w * F.col("value"))
                + F.pow(F.lit(1.0 - a), F.count("value")) * F.avg("value"),
                6,
            ).alias("hist_ewma"),
            F.round(
                F.lit(float(k))
                * F.round(
                    F.coalesce(F.stddev_samp("value"), F.lit(0.0)), 6
                )
                * F.sqrt(
                    F.lit(a / (2.0 - a))
                    * (
                        F.lit(1.0)
                        - F.pow(F.lit(1.0 - a), 2 * (F.count("value") + 1))
                    )
                ),
                6,
            ).alias("ewma_limit"),
        )
    else:
        hist = (
            metrics.filter(hist_pred)
            .groupBy(*key)
            .agg(
                F.round(F.avg("value"), 6).alias("hist_mean"),
                F.round(F.coalesce(F.stddev_samp("value"), F.lit(0.0)), 6).alias(
                    "hist_stddev"
                ),
                F.round(
                    F.max_by("value", "run_id"), 6
                ).alias("hist_last"),
                F.count("value").alias("n_history"),
            )
        )

    cur = metrics.filter(F.col("run_id") == F.lit(int(current_run))).select(
        *key, F.round("value", 6).alias("value")
    )
    j = cur.join(F.broadcast(hist), key, "left")

    if strategy == "ewma":
        z = F.round(
            F.lit(float(alpha)) * F.col("value")
            + F.lit(1.0 - float(alpha)) * F.col("hist_ewma"),
            6,
        )
        flag = F.abs(z - F.col("hist_mean")) > F.col("ewma_limit")
        return j.select(
            *key,
            "value",
            "hist_mean",
            "hist_stddev",
            "hist_last",
            "hist_ewma",
            z.alias("ewma_z"),
            "ewma_limit",
            F.coalesce("n_history", F.lit(0)).alias("n_history"),
            F.when(
                F.coalesce("n_history", F.lit(0)) >= F.lit(int(min_history)),
                flag,
            ).alias("is_anomaly"),
        )

    if strategy in ("online_normal", "seasonal_normal"):
        flag = F.abs(F.col("value") - F.col("hist_mean")) > F.lit(float(k)) * F.col(
            "hist_stddev"
        )
    elif strategy == "absolute_change":
        flag = F.abs(F.col("value") - F.col("hist_last")) > F.lit(float(max_delta))
    else:  # relative_change
        flag = F.when(
            F.col("hist_last") == 0.0, F.col("value") != 0.0
        ).otherwise(
            (F.col("value") / F.col("hist_last") < F.lit(float(rate_lo)))
            | (F.col("value") / F.col("hist_last") > F.lit(float(rate_hi)))
        )

    return j.select(
        *key,
        "value",
        "hist_mean",
        "hist_stddev",
        "hist_last",
        F.coalesce("n_history", F.lit(0)).alias("n_history"),
        F.when(
            F.coalesce("n_history", F.lit(0)) >= F.lit(int(min_history)), flag
        ).alias("is_anomaly"),
    )


def stamp_run(
    spark: SparkSession,
    df: DataFrame,
    repo_path: str | Path,
    dataset: str,
    columns: list[str] | None = None,
    run_id: int | None = None,
    strategy: str = "online_normal",
    k: float = 3.0,
    min_history: int = 2,
    extra_metrics: "DataFrame | None" = None,
) -> tuple[int, "DataFrame | None"]:
    """The pipeline-facing composition: compute this run's metrics, append
    them to the repository, and judge them against the stored history.

    ``extra_metrics`` lets a pipeline stamp DERIVED numbers it already
    holds (per-check violation counts, observed-write totals) into the
    SAME run partition — rows of (dataset, instance, metric, value); the
    run_id column is stamped here so callers cannot mis-file them.  They
    must be unioned before the save: the repository's per-run dynamic
    overwrite is idempotent per run_id, so a second save for the same run
    would REPLACE the first instead of adding to it.

    ``run_id`` defaults to latest_run() + 1 (0 for an empty repository).
    Returns (run_id, anomalies) — anomalies is None when the repository
    holds no earlier runs to judge against (first stamp), otherwise the
    detect_metric_anomalies frame (whose ``is_anomaly`` is NULL per-metric
    until ``min_history`` points exist).  The metric computation is the
    only stage that touches ``df``; everything else operates on metric
    rows."""
    from pyspark.errors import AnalysisException

    repo = MetricsRepository(spark, repo_path)
    try:
        latest = repo.latest_run()
    except AnalysisException:  # first stamp: store directory does not exist
        latest = None
    if run_id is None:
        run_id = 0 if latest is None else latest + 1
    metrics = compute_metrics(df, columns, dataset=dataset, run_id=run_id)
    if extra_metrics is not None:
        extra = extra_metrics.select(
            F.lit(int(run_id)).cast("bigint").alias("run_id"),
            F.col("dataset").cast("string"),
            F.col("instance").cast("string"),
            F.col("metric").cast("string"),
            F.col("value").cast("double"),
        )
        metrics = metrics.unionByName(extra)
    repo.save(metrics)
    if latest is None:
        return int(run_id), None
    anomalies = detect_metric_anomalies(
        repo.load(),
        current_run=int(run_id),
        strategy=strategy,
        k=k,
        min_history=min_history,
    )
    return int(run_id), anomalies
