"""Deterministic, engine-portable sampling for training-data mixtures.

``df.sample()`` draws from a per-partition RNG — resampling under AQE,
task retry, or a different partitioning silently changes the sample, which
is unacceptable for reproducible corpus construction (and impossible to
oracle).  These operators instead decide membership from a PURE FUNCTION of
the row key: the md5 hex prefix of (seed, key) compared against a hex
threshold string.  Properties:

- deterministic under any partitioning / retry / engine (md5 is the same
  everywhere — the DuckDB oracles run the identical expression);
- uniform: md5's first 8 hex chars are uniform on [0, 16^8);
- stable under corpus growth: a row's membership never changes when other
  rows are added (vital for incremental pipelines — re-sampling a grown
  corpus keeps the old sample as a subset for equal rates);
- stratified variant: per-stratum rates, one narrow projection, no shuffle,
  no per-stratum scans.

The fraction granularity is 1/16^8 (~6e-10) — ample for any real rate.

COMPOSITION RULE: every operator here decides membership from
md5(seed, key), so two stages sharing a seed are fully NESTED, never
independent — sampling 0.9 after a 0.4-rate mixture stage with the same
seed keeps everything (the survivors are exactly the low-hash rows).
Nesting is a feature WITHIN one operator (growth-stable re-sampling,
equal-rate strata admitting the same keys); ACROSS pipeline stages pass
distinct seeds to get independent draws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8
_SPACE = 16**_HEX_DIGITS


def _hex_threshold(fraction: float) -> str:
    """8-hex-digit string h such that P(prefix < h) == round(fraction *
    16^8) / 16^8 — string comparison against this equals the numeric
    comparison (both sides fixed-width lowercase hex).  fraction == 1.0
    must admit EVERY prefix: "100000000" is 9 chars and lexicographically
    *smaller* than "2..."-prefixes, so the keep-all threshold is the
    sentinel "g" (sorts above every hex digit)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * _SPACE)
    if v >= _SPACE:
        return "g"
    return format(v, "08x")


def sample_key(key: Column, seed: int = 42) -> Column:
    """The 8-hex-char decision prefix for a row key (lowercase, fixed
    width — lexicographic order == numeric order)."""
    return F.substring(F.md5(F.concat_ws("\x1f", F.lit(str(seed)), key)), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, decided per-row by hash of key_col.  Same
    input + seed → same sample, on any engine, any partitioning."""
    return df.filter(
        sample_key(F.col(key_col).cast("string"), seed) < F.lit(_hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture primitive
    (e.g. keep 100% of books, 10% of web, 1% of logs).  One narrow
    filter; strata NOT in ``fractions`` fall back to default_fraction.

    The decision hash includes the key only — NOT the stratum — so a row
    whose stratum label is later corrected keeps its draw, and equal
    fractions across strata admit exactly the same key set."""
    thr = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(_hex_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_key(F.col(key_col).cast("string"), seed) < thr)


def quota_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    quota: int,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum COUNT cap (domain balancing): keep at most ``quota`` rows
    per stratum — the "no domain may contribute more than N documents"
    mixture rule, where a RATE (stratified_sample) is the wrong tool
    because stratum sizes vary by orders of magnitude.

    Which rows survive is decided by hash order (sample_key of the row key),
    so the selection is deterministic, engine-portable, and — because each
    row's rank only ever grows as a stratum grows — a quota re-applied to a
    LARGER corpus keeps a subset of the previous selection plus nothing the
    hash ranked below it (stable review diffs).  Ties on the 8-hex prefix
    break by key string.

    Plan: one window row_number per stratum (hash-partitioned by stratum —
    at 10^12 rows a mega-stratum serializes ONE task per stratum, so for
    heavy-tailed strata apply the cheap rate-based pre-filter first:
    stratified_sample at ~2x the expected quota rate, then this exact cap
    over the survivors — both stages deterministic, composition documented
    here because the pre-filter is subset-stable under growth too)."""
    from pyspark.sql import Window

    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    k = sample_key(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(stratum_col).orderBy(
        k.asc(), F.col(key_col).cast("string").asc()
    )
    return (
        df.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )


_MIX_GRID = 2**20  # dyadic rate grid: floor(rate·2^20)/2^20 is EXACT in a double


def mixture_rates(
    counts: "dict[str, int]", alpha: float, target_total: int
) -> "dict[str, int]":
    """Per-source acceptance thresholds for temperature-weighted mixture
    sampling (the multilingual-T5 / data-mixing rule: sample source s with
    probability ∝ n_s^alpha, alpha<1 flattens the head, alpha=1 keeps
    natural proportions).  Materializing a static corpus of ~target_total
    rows with those proportions means keeping rate_s = target_total ·
    share_s / n_s of each source, clamped at 1 (an exhausted source keeps
    everything — single-pass clamp, mass is NOT re-waterfilled onto the
    others; deterministic, engine-portable, documented).

    Returns INTEGER thresholds on the dyadic 2^-20 grid: thr_s =
    floor(rate_s · 2^20).  The quantization makes the membership decision
    exactly reproducible in SQL (the oracle recomputes floor(rate·2^20)
    from the same integer counts — every arithmetic op is IEEE-identical;
    alpha=0.5 is computed via sqrt, which is correctly rounded where pow
    need not be).  A row is kept iff uint32(md5 prefix) < thr · 2^12."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    import math

    def _w(n: int) -> float:
        if alpha == 0.5:
            return math.sqrt(n)
        return float(n) ** alpha

    denom = 0.0
    for s in sorted(counts):  # pinned fold order (see oracle note)
        denom += _w(counts[s])
    thr: dict[str, int] = {}
    for s, n in counts.items():
        if n <= 0 or denom == 0.0:
            thr[s] = 0
            continue
        rate = min(1.0, (target_total * _w(n)) / denom / n)
        thr[s] = int(math.floor(rate * _MIX_GRID))
    return thr


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float,
    target_total: int,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted source rebalancing: one bounded groupBy for
    per-source counts (collected — bounded by the number of SOURCES, not
    rows; same driver contract as quota_sample's strata), thresholds from
    ``mixture_rates``, then ONE narrow hash-threshold filter over the
    corpus — no shuffle of the data itself, deterministic under any
    partitioning/retry/engine, growth-stable per source (a source whose
    count is unchanged keeps the identical row set).

    The membership test compares the md5 prefix NUMERICALLY (conv base
    16→10) against thr·2^12 so the SQL oracle can reproduce it exactly;
    string-threshold comparison (deterministic_sample) and this are the
    same decision when the threshold sits on the 2^-20 grid."""
    counts = {
        r["_src"]: r["_n"]
        for r in df.groupBy(F.col(source_col).alias("_src"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
        if r["_src"] is not None
    }
    thr = mixture_rates(counts, alpha, target_total)
    if not thr:
        return df.filter(F.lit(False))
    thr_col = F.lit(None).cast("long")
    for value, t in sorted(thr.items()):
        thr_col = F.when(F.col(source_col) == F.lit(value), F.lit(t * 4096)).otherwise(
            thr_col
        )
    prefix_num = F.conv(
        sample_key(F.col(key_col).cast("string"), seed), 16, 10
    ).cast("long")
    return df.filter(prefix_num < thr_col)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
    keep the k rows with the largest ``u^(1/w)`` where u is a uniform
    draw — the curation move "sample 100k documents ∝ quality score"
    that plain rate sampling cannot express.

    Deterministic and engine-portable like every sampler here: u derives
    from the md5 decision prefix ((v + 0.5) / 16^8 — exactly
    representable, never 0), and the selection key is
    ``round(ln(u)/w, 6)`` — maximizing it is equivalent to maximizing
    u^(1/w), the log form avoids pow's precision spread, and the
    round(6) makes cross-engine ordering exact with ties broken by the
    row key.  Same-seed stages NEST (module composition rule): pass
    distinct seeds for independent draws.

    Scale shape: ONE narrow projection + a global top-k
    (TakeOrderedAndProject — per-partition heaps, never a single-
    partition window).  Rows with NULL or non-positive weight are
    excluded (a zero-weight row has selection probability 0; NULL weight
    is not evidence of weight).  Output: input columns + ``es_key``."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    w = F.col(weight_col)
    v = F.conv(sample_key(F.col(key_col).cast("string"), seed), 16, 10).cast(
        "long"
    )
    u = (v + F.lit(0.5)) / F.lit(float(_SPACE))
    es_key = F.round(F.log(u) / w, 6)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select("*", es_key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col(key_col).asc())
        .limit(int(k))
    )


def weighted_quota_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    quota: int,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum WEIGHTED draw: at most ``quota`` rows per stratum,
    selected without replacement ∝ ``weight_col`` (the Efraimidis-
    Spirakis key of weighted_sample, ranked inside each stratum) —
    "top-N per domain, quality-weighted", the composition of the quota
    rule with the weighted draw.

    Same determinism contract as the rest of the module: the key is
    round6(ln(u)/w) with u from the md5 decision prefix, ties break by
    row key, NULL / non-positive weights are excluded.  Plan: one window
    row_number per stratum (the quota_sample shape and its mega-stratum
    caveat — pre-filter with stratified_sample on heavy tails).
    Output: input columns + ``es_key``."""
    from pyspark.sql import Window

    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    w = F.col(weight_col)
    v = F.conv(sample_key(F.col(key_col).cast("string"), seed), 16, 10).cast(
        "long"
    )
    es_key = F.round(F.log((v + F.lit(0.5)) / F.lit(float(_SPACE))) / w, 6)
    win = Window.partitionBy(stratum_col).orderBy(
        F.col("es_key").desc(), F.col(key_col).cast("string").asc()
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("es_key", es_key)
        .withColumn("_qrank", F.row_number().over(win))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )


def leakage_safe_split(
    df: DataFrame,
    key_col: str,
    splits: "dict[str, float]",
    pairs: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 42,
) -> DataFrame:
    """Named train/val/test assignment that CANNOT leak near-duplicates
    across the split boundary: the decision hash is taken over the row's
    duplicate-CLUSTER representative, not the row itself, so every member
    of a connected dup component lands in the same split.  Hashing raw
    row ids — the common mistake — puts a near-copy of a training page in
    the eval split, and the eval score silently measures memorization.

    ``pairs`` is any near-dup pair list (MinHash/SimHash/embedding/dHash —
    whatever the dedup family produced); rows in no pair are their own
    singleton cluster.  ``splits`` maps name → fraction in CALLER order;
    fractions must sum to 1 (±1e-9).  Assignment carves [0, 16^8) into
    cumulative hex intervals of the module's md5 decision prefix — the
    LAST split takes everything above the penultimate threshold, so
    rounding on the 1/16^8 grid can never orphan a row.  Deterministic
    under any partitioning, and growth-stable per cluster: new members
    join their cluster's existing split (unless new edges MERGE two
    clusters — then the merged component re-decides together, which is
    exactly the leakage-safe behavior).

    Plan: the connected-components rounds of ``duplicate_clusters`` (pair
    table-sized, O(log² n) bounded rounds) + ONE join of the corpus
    against the bounded cluster table + a narrow split projection — the
    corpus itself is scanned once and never reshuffled.

    Returns df + (cluster_id, split).
    """
    from .dedup import assign_duplicate_clusters

    if not splits:
        raise ValueError("leakage_safe_split: splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"leakage_safe_split: fractions must sum to 1, got {total}"
        )
    if any(f < 0 for f in splits.values()):
        raise ValueError("leakage_safe_split: fractions must be >= 0")
    if pairs is not None:
        labeled = assign_duplicate_clusters(df, pairs, key_col, id_a, id_b).drop(
            "keep"
        )
    else:
        labeled = df.withColumn("cluster_id", F.col(key_col))
    k = sample_key(F.col("cluster_id").cast("string"), seed)
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    thresholds = []
    for name in names[:-1]:
        cum += splits[name]
        thresholds.append((name, _hex_threshold(cum)))
    for name, thr in reversed(thresholds):
        expr = F.when(k < F.lit(thr), F.lit(name)).otherwise(expr)
    return labeled.withColumn("split", expr)


# ---------------------------------------------------------------------------
# Train/val/test splits — deterministic, leakage-safe (wave 40)
# ---------------------------------------------------------------------------

def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: "dict[str, float]",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Partition rows into named splits by the md5 decision prefix of
    ``key_col`` — the sampling convention above, so the assignment is
    deterministic under any partitioning/retry/engine and STABLE under
    corpus growth (a row's split never changes when rows are added; vital
    when the eval set must stay frozen across corpus refreshes).

    ``splits`` maps name -> fraction, summing to 1 (±1e-9); INSERTION
    ORDER is part of the contract — each split owns the hash range
    [cum_before, cum_before + fraction) at 1/16^8 granularity, and the
    LAST split absorbs the rounding sliver at the top of the range."""
    fracs = list(splits.items())
    if len(fracs) < 2:
        raise ValueError("assign_splits: need >= 2 splits")
    total = sum(f for _, f in fracs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"assign_splits: fractions must sum to 1, got {total}")
    if any(f < 0 for _, f in fracs):
        raise ValueError("assign_splits: negative fraction")

    k = sample_key(F.col(key_col).cast("string"), seed)
    expr = None
    cum = 0.0
    for name, frac in fracs[:-1]:
        cum += frac
        cond = k < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(fracs[-1][0]))
    return df.withColumn(out_col, expr)


# NOTE: keying assign_splits on a GROUP column (exact-dup fingerprint,
# cluster id, source domain) makes it leakage-safe by construction — every
# member of the group shares the hash and therefore the split.  For the
# variant that derives the group from a near-dup PAIR list via connected
# components, see leakage_safe_split above (wave 30); this module keeps ONE
# definition of each.


def mixture_waterfill_plan(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    weights_ppm: "dict[str, int]",
    budget_tokens: int,
) -> DataFrame:
    """Token-budget allocation across sources — the mixture PLANNER that
    turns "train on 30% web, 30% books, 40% rest" into per-source
    sampling rates when some sources cannot supply their share.

    Exact water-filling: rates r_s = min(1, λ·w_s/T_s) with λ chosen so
    Σ r_s·T_s = budget.  g(λ) = Σ min(T_s, λ·w_s) is piecewise linear and
    increasing with breakpoints κ_s = T_s/w_s; sorting sources by κ, the
    unique λ falls in one segment: λ = (B − Σ_sat T_s) / Σ_unsat w_s.
    Undersized sources SATURATE at rate 1 and their unmet share spills
    into the others — the standard fix for naive proportional allocation
    silently under-delivering the budget.

    Determinism across engines: weights are INTEGER parts-per-million
    (must sum to 1e6) and token totals are exact longs, so every prefix/
    suffix sum in the segment search is integer arithmetic; λ and κ are
    doubles derived from exact ints in a pinned expression order, and the
    DuckDB oracle replays the identical windows.  All the windowed work
    runs on the BOUNDED per-source frame (one row per source); the only
    corpus-sized step is the per-source token groupBy.  Sources absent
    from ``weights_ppm`` get rate 0 (explicitly excluded, still
    reported).  Returns (source, tokens_total, weight, rate,
    planned_tokens, saturated)."""
    if budget_tokens <= 0:
        raise ValueError(f"mixture_waterfill_plan: budget must be > 0, got {budget_tokens}")
    if any(w < 0 for w in weights_ppm.values()):
        raise ValueError("mixture_waterfill_plan: negative weight")
    total_w = sum(weights_ppm.values())
    if total_w != 1_000_000:
        raise ValueError(
            f"mixture_waterfill_plan: weights_ppm must sum to 1000000, got {total_w}"
        )
    from pyspark.sql import Window

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights_ppm.items())],
        "source string, _w long",
    )
    tot = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("_t"))
        .join(F.broadcast(wdf), "source", "left")
        .withColumn("_w", F.coalesce("_w", F.lit(0)))
    )
    filled = tot.filter((F.col("_w") > 0) & (F.col("_t") > 0))
    kappa = (F.col("_t") * F.lit(1_000_000.0)) / F.col("_w")
    w_ord = Window.orderBy(kappa.asc(), F.col("source"))  # bounded: one row/source
    seg = (
        filled.withColumn("_kappa", kappa)
        .withColumn(
            "_cumt_prev",
            F.coalesce(
                F.sum("_t").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "_wsuf",
            F.sum("_w").over(w_ord.rowsBetween(0, Window.unboundedFollowing)),
        )
        .withColumn("_kprev", F.coalesce(F.lag("_kappa").over(w_ord), F.lit(0.0)))
        .withColumn(
            "_lam",
            (F.lit(float(budget_tokens)) - F.col("_cumt_prev"))
            * F.lit(1_000_000.0)
            / F.col("_wsuf"),
        )
    )
    lam_row = seg.filter(
        (F.col("_lam") < F.col("_kappa")) & (F.col("_lam") >= F.col("_kprev"))
    ).agg(F.min("_lam").alias("_lambda"))  # empty when B >= sum(T): all saturate

    rate_expr = F.when(
        (F.col("_w") > 0) & (F.col("_t") > 0),
        F.when(F.col("_lambda").isNull(), F.lit(1.0)).otherwise(
            F.least(
                F.lit(1.0),
                F.round(
                    F.col("_lambda") * F.col("_w") / F.lit(1_000_000.0) / F.col("_t"),
                    6,
                ),
            )
        ),
    ).otherwise(F.lit(0.0))
    return (
        tot.crossJoin(F.broadcast(lam_row))
        .withColumn("rate", rate_expr)
        .select(
            "source",
            F.col("_t").cast("long").alias("tokens_total"),
            F.round(F.col("_w") / F.lit(1_000_000.0), 6).alias("weight"),
            "rate",
            F.round(F.col("rate") * F.col("_t")).cast("long").alias("planned_tokens"),
            (F.col("rate") == 1.0).alias("saturated"),
        )
    )
