"""Exact-integer linear algebra over embedding columns (round-4 wave 39).

The PCA front-end every embedding-curation stage wants (whitening before
SemDeDup / IVF training, variance diagnostics, drift in principal angles)
reduces to ONE distributed quantity: the d x d second-moment (Gram) matrix
plus the component sums.  Everything downstream — covariance, eigenbasis,
whitening — is driver-side arithmetic on a BOUNDED d x d object.

Scale shape (the whole point):

* the corpus pass is ``mapInArrow``: each Arrow batch folds to a single
  partial row carrying (n, sum-vector, upper-triangular Gram) as exact
  int64 in micro-units — d=64 means 64 + 2080 longs per BATCH, not per
  row.  No explode, no d^2 row blow-up, no shuffle of corpus-sized data;
  the only aggregation is over #batches rows.
* partials combine by element-wise DECIMAL(38,0) sums (int64 would
  overflow around 10^9 unit-norm rows; decimal carries to 10^12+).
* quantization is half-away-from-zero at 1e6 (micro-units), matching both
  Spark's ``F.round`` and DuckDB's ``round`` — so the DuckDB oracle can
  replay the integer sums EXACTLY and the covariance is bit-identical
  across engines (the modeleval/calibration discipline).

``pca_basis`` then eigendecomposes the bounded matrix on the driver
(collecting d(d+1)/2 rows is O(d^2), never O(corpus)), with a
deterministic sign convention; ``pca_project`` applies the basis back out
distributed, again one Arrow matmul per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000
# guard: per-batch int64 Gram partial must not overflow.  |q| <= qmax and
# rows-per-batch <= n ensures |sum q_i q_j| <= n * qmax^2 < 2^62.
_INT64_BUDGET = 1 << 62


def _gram_kernel(dim: int):
    import pyarrow as pa

    out_schema = pa.schema(
        [
            pa.field("n", pa.int64()),
            pa.field("s", pa.list_(pa.int64())),
            pa.field("g", pa.list_(pa.int64())),
        ]
    )
    iu = None  # upper-triangle index cache, built lazily per worker

    def fold(batches):
        nonlocal iu
        import numpy as np

        for b in batches:
            lists = b.column(0)
            # flatten() honors the batch's offsets (sliced arrays safe)
            flat = np.asarray(lists.flatten(), dtype=np.float64)
            if flat.size == 0:
                continue
            x = flat.reshape(-1, dim)
            # half-away-from-zero micro-unit quantization — matches
            # F.round/DuckDB round, NOT numpy's banker's rounding
            q = np.where(
                x >= 0,
                np.floor(x * _QUANT + 0.5),
                np.ceil(x * _QUANT - 0.5),
            ).astype(np.int64)
            qmax = int(np.abs(q).max())
            if qmax and x.shape[0] * qmax * qmax >= _INT64_BUDGET:
                raise OverflowError(
                    "embedding_covariance: per-batch int64 Gram would "
                    f"overflow (rows={x.shape[0]}, max|q|={qmax}); lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            g = q.T @ q  # exact int64 matmul under the budget above
            if iu is None:
                iu = np.triu_indices(dim)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([x.shape[0]], pa.int64()),
                    pa.array([q.sum(axis=0, dtype=np.int64).tolist()]),
                    pa.array([g[iu].tolist()]),
                ],
                schema=out_schema,
            )

    return fold, "n long, s array<long>, g array<long>"


def _gram_partials(df: DataFrame, col: str, dim: int) -> DataFrame:
    """The corpus pass alone, unpinned: one (n, s, g) int64 partial row
    per Arrow batch.  Split out so plan audits can assert the fold shape
    (MapInArrow, one scan) — embedding_covariance pins this frame before
    fanning out its three consumers."""
    base = df.select(F.col(col).alias("_e")).filter(
        F.col("_e").isNotNull() & (F.size("_e") == dim)
    )
    fold, schema = _gram_kernel(dim)
    return base.mapInArrow(fold, schema)


def embedding_covariance(
    df: DataFrame, col: str, dim: int
) -> DataFrame:
    """Population covariance of a ``dim``-wide embedding column as one row
    per upper-triangle entry: (i, j, n, cov) with i <= j, i/j 0-based,
    ``cov`` round-6 in original (de-quantized) units.

    Rows with NULL or wrong-length embeddings are excluded up front (a
    partial vector has no place in a moment matrix).  The covariance is
    computed from EXACT integer sums — n, S_i, G_ij — in micro-units, so
    any engine replaying the same quantization gets the same bits; the
    division order (G/n - (S_i/n)(S_j/n)) / 1e12 is part of the contract.
    """
    if dim < 1:
        raise ValueError(f"embedding_covariance: dim must be >= 1, got {dim}")
    # the partial frame is consumed three times (Gram sums, vector sums,
    # n); without a pin each branch re-runs the corpus scan + Arrow fold
    # (measured: 4 parquet scans).  localCheckpoint is safe AND cheap
    # here: one row per Arrow batch — batch-count-sized, never
    # corpus-sized.  Plan-audit the UNPINNED _gram_partials (the pin
    # truncates explain output).
    partials = _gram_partials(df, col, dim).localCheckpoint(eager=False)

    # partial rows are batch-count-sized; explode to (pos, value) and sum
    # as decimal(38,0) — the overflow-proof combine
    tri = dim * (dim + 1) // 2
    sums = (
        partials.select(F.posexplode("g").alias("_p", "_gv"))
        .groupBy("_p")
        .agg(F.sum(F.col("_gv").cast("decimal(38,0)")).alias("_g"))
    )
    svec = (
        partials.select(F.posexplode("s").alias("_i", "_sv"))
        .groupBy("_i")
        .agg(F.sum(F.col("_sv").cast("decimal(38,0)")).alias("_s"))
    )
    ntot = partials.agg(F.sum("n").alias("_n"))

    # upper-triangle position -> (i, j) decode: a bounded O(d^2) literal
    # frame (np.triu_indices row-major order, matching the kernel)
    spark = df.sparkSession
    pairs = [
        (p, i, j)
        for p, (i, j) in enumerate(
            (i, j) for i in range(dim) for j in range(i, dim)
        )
    ]
    assert len(pairs) == tri  # row-major enum must match np.triu_indices
    idx = spark.createDataFrame(pairs, "_p int, i int, j int")

    out = (
        sums.join(F.broadcast(idx), "_p")
        .join(
            F.broadcast(svec.withColumnRenamed("_i", "i").withColumnRenamed("_s", "_si")),
            "i",
        )
        .join(
            F.broadcast(
                svec.withColumnRenamed("_i", "j").withColumnRenamed("_s", "_sj")
            ),
            "j",
        )
        .crossJoin(F.broadcast(ntot))
    )
    n = F.col("_n").cast("double")
    cov = (
        F.col("_g").cast("double") / n
        - (F.col("_si").cast("double") / n) * (F.col("_sj").cast("double") / n)
    ) / F.lit(float(_QUANT) * float(_QUANT))
    return out.select(
        "i",
        "j",
        F.col("_n").cast("long").alias("n"),
        # + 0.0 collapses IEEE -0.0 to +0.0: Spark's F.round goes through
        # BigDecimal (no signed zero) while DuckDB's round keeps the sign,
        # so a single -0.0 entry hash-mismatches the driver (r4 verdict).
        (F.round(cov, 6) + F.lit(0.0)).alias("cov"),
    )


def covariance_matrix(cov_df: DataFrame, dim: int):
    """Materialize the bounded (i, j, cov) frame into a dense symmetric
    numpy d x d — collects d(d+1)/2 rows, O(d^2) driver memory by
    construction, never corpus-sized."""
    import numpy as np

    m = np.zeros((dim, dim), dtype=np.float64)
    for r in cov_df.select("i", "j", "cov").collect():
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    return m


def pca_basis(cov_df: DataFrame, dim: int, k: int | None = None):
    """Eigendecompose the exact covariance (driver-side, d x d bounded).
    Returns (eigvals desc as list, components as k x d list-of-lists) with
    a deterministic sign convention: each eigenvector's largest-|.|
    component (lowest index on ties) is made positive."""
    import numpy as np

    k = dim if k is None else k
    if not 1 <= k <= dim:
        raise ValueError(f"pca_basis: k must be in [1, {dim}], got {k}")
    m = covariance_matrix(cov_df, dim)
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for c in order:
        v = vecs[:, c].copy()
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
    return [float(vals[c]) for c in order], comps


def pca_project(
    df: DataFrame,
    col: str,
    dim: int,
    components,
    id_col: str,
    out_col: str = "pc",
) -> DataFrame:
    """Distributed projection onto a fixed basis: one Arrow matmul per
    batch, basis shipped by closure (k x d doubles — broadcast-sized).
    Rows filtered to well-formed embeddings, same contract as the
    covariance pass."""
    basis = [list(map(float, c)) for c in components]

    def proj(batches):
        import numpy as np
        import pyarrow as pa

        w = np.asarray(basis, dtype=np.float64)  # k x d
        for b in batches:
            flat = np.asarray(b.column(1).flatten(), dtype=np.float64)
            if flat.size == 0:
                continue
            y = flat.reshape(-1, dim) @ w.T  # n x k
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array([row.tolist() for row in y])],
                names=[id_col, out_col],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    base = df.select(id_col, F.col(col).alias("_e")).filter(
        F.col("_e").isNotNull() & (F.size("_e") == dim)
    )
    return base.mapInArrow(
        proj, f"{id_col} {id_type}, {out_col} array<double>"
    )
