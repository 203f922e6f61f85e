"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set against
the corpus scan; the dot product is a built-in ``F.zip_with`` +
``F.aggregate`` (JVM-side, no Python).  Scale path: random-hyperplane LSH —
sign-bit signatures bucket the corpus so each query only scans its bucket
(candidate set shrinks ~2^bits), then exact cosine re-ranks.

Embedding-cosine near-duplicate detection reuses the same kernels.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (it is small by contract); the corpus is scanned
    once; per-query top-k via window row_number.  Self-matches excluded.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i).  Packed into a
    long — computed with built-in array ops against literal plane arrays."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signature,
    join on the bucket, exact cosine re-rank inside the bucket.

    At 10^12 rows the bucket join replaces the full cross product with a
    1/2^bits-selective equi-join; multi-probe (flipping one bit) can be added
    for recall — kept single-probe here, measured in tests.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    csig = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col), planes).alias("_sig"),
    )
    qsig = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            lsh_signature(F.col(vec_col), planes).alias("_sig"),
        )
    )
    scored = (
        qsig.join(csig, "_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _argmax_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-dot-product centroid, computed as ONE codegen
    expression against centroid literals — no row amplification, no join.
    Struct ordering compares fields left-to-right, so array_max over
    (score, -cell) picks the best cell with deterministic ties."""
    scored = F.array(
        *[
            F.struct(
                dot(vec_col, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                F.lit(-i).alias("nc"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return -F.array_max(scored)["nc"]


def _topcells(vec_col: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Array of the n_probe nearest cell ids (by dot product, descending)."""
    scored = F.array(
        *[
            F.struct(
                (-dot(vec_col, F.array(*[F.lit(float(x)) for x in c]))).alias("ns"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.array_sort(scored), 1, n_probe)["c"]


def _l2_normalize(vec_col: Column) -> Column:
    n = norm(vec_col)
    return F.transform(vec_col, lambda x: x.cast("double") / n)


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
    sample_limit: int = 100_000,
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for an IVF index.

    Driver-coordinated Lloyd iterations (the MLlib k-means shape): each
    round is one distributed pass — assign every vector to its best cell
    with the codegen argmax above, then ``posexplode → groupBy(cell, pos)
    → avg`` to recompute means.  Only the n_cells×dim centroid matrix ever
    reaches the driver.  Deterministic end-to-end: the bounded sample is the
    sample_limit hash-SMALLEST vectors (TakeOrderedAndProject — a top-k
    selection, not a full sort), cached before iterating; an unordered
    ``limit()`` would be re-evaluated with Spark-unspecified scan order on
    every Lloyd pass."""
    v = corpus.select(_l2_normalize(F.col(vec_col)).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    sample = (
        v.select(
            "_v", F.xxhash64(F.col("_v").cast("string"), F.lit(seed)).alias("_h")
        )
        .orderBy("_h")
        .limit(sample_limit)
        .cache()
    )
    init = sample.orderBy("_h").limit(n_cells).collect()
    centroids = [list(r._v) for r in init]
    if len(centroids) < n_cells:
        sample.unpersist()
        return centroids
    for _ in range(iters):
        assigned = sample.select(
            _argmax_cell(F.col("_v"), centroids).alias("_cell"), "_v"
        )
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r._cell, {})[r._pos] = r._m
        new = []
        for i, old in enumerate(centroids):
            if i in by_cell:
                m = [by_cell[i][p] for p in sorted(by_cell[i])]
                s = float(np.linalg.norm(m)) or 1.0
                new.append([x / s for x in m])
            else:  # empty cell keeps its previous centroid
                new.append(old)
        centroids = new
    sample.unpersist()
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: k-means cells
    partition the corpus; each query exact-scans only its n_probe nearest
    cells.  Candidate set shrinks ~n_probe/n_cells vs brute force.

    At 10^12 rows the assignment pass is one codegen scan (write the cell id
    as a partition column of the index table); the probe is a shuffle-free
    equi-join on the cell id with exact cosine re-rank inside.  Recall is
    tunable via n_probe (tests measure it vs brute force)."""
    from pyspark.sql import Window

    centroids = ivf_train_centroids(
        corpus, vec_col, n_cells=n_cells, iters=iters, seed=seed
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _argmax_cell(_l2_normalize(F.col(vec_col)), centroids).alias("_cell"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(
                _topcells(_l2_normalize(F.col(vec_col)), centroids, n_probe)
            ).alias("_cell"),
        )
    )
    scored = (
        q.join(c, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold)
    via LSH self-join: pairs land in the same hyperplane bucket, then exact
    cosine verifies.  Probabilistic recall at scale; exact for near-identical
    vectors (cos→1 pairs agree on every hyperplane sign w.h.p.)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col), planes).alias("_sig"),
    )
    return (
        sig.alias("l")
        .join(
            sig.alias("r"),
            (F.col("l._sig") == F.col("r._sig")) & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.round(cosine(F.col("l._v"), F.col("r._v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )
