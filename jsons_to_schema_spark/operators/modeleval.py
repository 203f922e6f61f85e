"""Model-evaluation metrics over scored rows: exact ROC AUC, calibration
table, and gains/lift — the offline-eval queries every training-data
pipeline runs after a filter model (quality classifier, dedup scorer,
LM-perplexity gate) produces a score column.

The hard one at scale is AUC.  The textbook computation ranks every row
by score — a global sort, ``Exchange SinglePartition`` over the corpus,
the exact shape this engine plan-asserts against.  The re-expression
here makes the rank statistic exact WITHOUT a global sort, by the same
two-level bounded-prefix decomposition as ``temporal.disorder_profile``:

* rows collapse to their DISTINCT score first (one hash shuffle keyed by
  (bin, score), map-side partial counts of positives/negatives — ties
  are handled exactly by construction, not by midrank fudging later);
* distinct scores bucket into ``bins`` ORDER-PRESERVING fixed-width
  bins over the caller's [lo, hi) score range (out-of-range scores
  clamp to the edge bins — clamping is safe because ANY order-preserving
  coarsening works: the exact within-bin order is restored by the keyed
  window);
* the bin totals are a BOUNDED table (``bins`` rows); the exclusive
  prefix sum of negatives over it is the only ordered single-partition
  window, and it broadcasts back;
* within each bin, the exclusive running sum of negatives is a keyed
  window over DISTINCT scores (parallel across bins); global
  negatives-below = bin prefix + within-bin prefix.

With ``nb(s)`` = negatives strictly below score ``s`` and per-score
counts ``np, nn``, the tie-aware rank formulation is

    2 * AUC * NPos * NNeg  =  sum_s  np(s) * (2 * nb(s) + nn(s))

— all integer arithmetic until ONE final division, so the value is
bit-identical to the naive ranked oracle (DuckDB window replay) and
independent of partitioning.  NULL scores/labels are excluded and
counted (``n_null``), never silently dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _score_bin(score: Column, lo: float, hi: float, bins: int) -> Column:
    """Order-preserving fixed-width bin id in [0, bins); out-of-range
    scores clamp to the edge bins (see module docstring: safe)."""
    raw = F.floor(
        (score - F.lit(float(lo)))
        / F.lit((float(hi) - float(lo)) / int(bins))
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1))


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: "str | Column",
    lo: float,
    hi: float,
    bins: int = 1 << 10,
) -> DataFrame:
    """Exact tie-aware ROC AUC (+ Gini) of ``score_col`` against the
    boolean ``label_col``; one output row: n_pos, n_neg, n_null, auc,
    gini.  AUC is NULL when either class is empty (undefined, not 0.5 —
    a degenerate eval set should look degenerate).  See module
    docstring for the no-global-sort decomposition."""
    score = F.col(score_col).cast("double")
    label = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")

    valid = score.isNotNull() & label.isNotNull()
    base = df.select(
        F.when(valid, score).alias("_s"),
        F.when(valid, label).alias("_y"),
    )

    # invalid rows ride the SAME aggregate under sentinel bin -1 (one
    # corpus pass — a separate null count() would scan twice)
    per_score = base.withColumn(
        "_bin",
        F.when(
            F.col("_s").isNotNull(), _score_bin(F.col("_s"), lo, hi, bins)
        ).otherwise(F.lit(-1)),
    ).groupBy("_bin", "_s").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.count(F.when(F.col("_y"), 1)).alias("_np"),
        F.count(F.when(~F.col("_y"), 1)).alias("_nn"),
    )

    # bounded bin totals -> exclusive prefix of negatives across bins
    bin_tot = per_score.filter(F.col("_bin") >= 0).groupBy("_bin").agg(
        F.sum("_nn").alias("_bn")
    )
    w_bins = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, -1
    )  # over <= `bins` rows, never the corpus
    bin_prefix = bin_tot.select(
        "_bin", F.coalesce(F.sum("_bn").over(w_bins), F.lit(0)).alias("_pref")
    )

    # within-bin exclusive running negatives over DISTINCT scores
    w_in = (
        Window.partitionBy("_bin")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        per_score.withColumn(
            "_nb_in", F.coalesce(F.sum("_nn").over(w_in), F.lit(0))
        )
        .join(F.broadcast(bin_prefix), on="_bin", how="left")
        .withColumn("_nb", F.col("_nb_in") + F.col("_pref"))
    )

    live = F.col("_bin") >= 0
    agg = ranked.agg(
        F.sum(F.when(live, F.col("_np"))).alias("n_pos"),
        F.sum(F.when(live, F.col("_nn"))).alias("n_neg"),
        F.coalesce(
            F.sum(F.when(~live, F.col("_cnt"))), F.lit(0)
        ).alias("n_null"),
        F.sum(
            F.when(
                live,
                F.col("_np") * (F.lit(2) * F.col("_nb") + F.col("_nn")),
            )
        ).alias("_num"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("_num")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    return agg.select(
        F.coalesce("n_pos", F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce("n_neg", F.lit(0)).cast("long").alias("n_neg"),
        F.col("n_null").cast("long").alias("n_null"),
        auc.alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


def calibration_table(
    df: DataFrame,
    score_col: str,
    label_col: "str | Column",
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram as data: per score-bin row count, mean
    predicted score, observed positive rate, |gap|, and the bin's ECE
    contribution (n/N * |gap|).  Mean scores go through micro-unit
    integer quantization (round(score*1e6) summed as BIGINT) so the
    per-bin means are bit-identical across engines and partitionings —
    raw double sums are order-dependent.  One grouped aggregate; the
    grand total joins back as a broadcast literal row (bins are
    bounded)."""
    score = F.col(score_col).cast("double")
    label = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    valid = score.isNotNull() & label.isNotNull()

    per_bin = (
        df.filter(valid)
        .select(
            _score_bin(score, lo, hi, bins).alias("bin"),
            F.round(score * F.lit(1_000_000)).cast("long").alias("_sq"),
            label.alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_sq").alias("_ssum"),
            F.count(F.when(F.col("_y"), 1)).alias("n_pos"),
        )
    )
    tot = per_bin.agg(F.sum("n").alias("_tot"))
    mean_pred = F.round(F.col("_ssum") / F.lit(1_000_000.0) / F.col("n"), 6)
    frac_pos = F.round(F.col("n_pos") / F.col("n").cast("double"), 6)
    gap = F.round(F.abs(mean_pred - frac_pos), 6)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            mean_pred.alias("mean_pred"),
            frac_pos.alias("frac_pos"),
            gap.alias("abs_gap"),
            F.round(
                (F.col("n") / F.col("_tot").cast("double")) * gap, 6
            ).alias("ece_contrib"),
        )
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: "str | Column",
    lo: float,
    hi: float,
    bands: int = 10,
) -> DataFrame:
    """Gains/lift by descending fixed-width score band: per band n,
    n_pos, cumulative counts from the TOP band down, capture rate
    (share of all positives reached) and cumulative lift vs the base
    rate.  The ordered cumulative runs over the bounded band aggregate
    (``bands`` rows), never the corpus; every ratio divides exact
    integers, round-6."""
    score = F.col(score_col).cast("double")
    label = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    valid = score.isNotNull() & label.isNotNull()

    per_band = (
        df.filter(valid)
        .select(
            _score_bin(score, lo, hi, bands).alias("band"),
            label.alias("_y"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("_y"), 1)).alias("n_pos"),
        )
    )
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # bounded: <= `bands` rows
    tot = per_band.agg(
        F.sum("n").alias("_tn"), F.sum("n_pos").alias("_tp")
    )
    cum = (
        per_band.withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_pos", F.sum("n_pos").over(w))
        .crossJoin(F.broadcast(tot))
    )
    capture = F.when(
        F.col("_tp") > 0, F.round(F.col("cum_pos") / F.col("_tp").cast("double"), 6)
    )
    lift = F.when(
        (F.col("_tp") > 0) & (F.col("cum_n") > 0),
        F.round(
            (F.col("cum_pos") / F.col("cum_n").cast("double"))
            / (F.col("_tp") / F.col("_tn").cast("double")),
            6,
        ),
    )
    return cum.select(
        "band",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        capture.alias("capture_rate"),
        lift.alias("cum_lift"),
    )


def fit_isotonic(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Isotonic calibration fit by pool-adjacent-violators — the
    calibrator `calibration_table` only DIAGNOSES: the best monotone map
    from score to P(label), no bin grid to choose, the standard
    post-hoc calibration for ranking models whose scores are ordered
    but not probabilities.

    Distributed/exact split: ONE corpus pass folds (n, Σlabel) per
    round-6 DISTINCT score (labels binary by contract — cast long, so
    the pooled means are exact integer fractions); PAV then runs
    driver-side on the BOUNDED distinct-score table (the
    apply_bins/IVF persisted-model read pattern — document the score
    quantization if your score space is genuinely continuous at corpus
    scale), comparing pooled means as CROSS-MULTIPLIED integers, so the
    fit is exact and engine-free until the final round-6 per-block
    mean.  Output blocks are provably monotone (pytest-pinned).

    Output: (block, score_lo, score_hi, n, n_pos, fitted) — one row per
    PAV block, ascending."""
    s = F.round(F.col(score_col).cast("double"), 6)
    y = F.col(label_col).cast("boolean").cast("int")
    cells = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(y).cast("long").alias("_y"),
        )
        .orderBy("_s")
        .collect()
    )
    # PAV: merge adjacent blocks while the mean would decrease; means
    # compared as cross-multiplied exact integers
    blocks: "list[list]" = []  # [s_lo, s_hi, n, y]
    for r in cells:
        blocks.append([r["_s"], r["_s"], r["_n"], r["_y"]])
        while len(blocks) >= 2:
            lo2, hi2, n2, y2 = blocks[-1]
            lo1, hi1, n1, y1 = blocks[-2]
            if y1 * n2 >= y2 * n1:  # prev mean >= cur mean → violation
                blocks[-2] = [lo1, hi2, n1 + n2, y1 + y2]
                blocks.pop()
            else:
                break
    spark = df.sparkSession
    rows = [
        (i, b[0], b[1], int(b[2]), int(b[3]), round(b[3] / b[2], 6))
        for i, b in enumerate(blocks)
    ]
    return spark.createDataFrame(
        rows,
        "block int, score_lo double, score_hi double, n long, n_pos long, fitted double",
    )


def apply_isotonic(
    df: DataFrame, score_col: str, model: DataFrame, out_col: str = "calibrated"
) -> DataFrame:
    """APPLY half: map each score to its PAV block's fitted probability —
    step semantics (the block whose [score_lo, score_hi] contains the
    round-6 score; scores beyond the trained range clamp to the first /
    last block, the standard isotonic extension).  The model is
    block-count-bounded: it collects once and rides the plan as a
    broadcast range join — no corpus shuffle."""
    edges = model.orderBy("block").collect()
    if not edges:
        raise ValueError("apply_isotonic: empty model")
    s = F.round(F.col(score_col).cast("double"), 6)
    # count of blocks whose score_lo <= s → block index (clamped)
    los = F.array(*[F.lit(float(r["score_lo"])) for r in edges])
    fitted = F.array(*[F.lit(float(r["fitted"])) for r in edges])
    idx = F.greatest(
        F.aggregate(
            los, F.lit(0), lambda acc, b: acc + F.when(b <= s, 1).otherwise(0)
        )
        - 1,
        F.lit(0),
    )
    return df.withColumn(
        out_col, F.when(s.isNotNull(), F.element_at(fitted, idx + 1))
    )
