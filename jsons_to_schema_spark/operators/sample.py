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
