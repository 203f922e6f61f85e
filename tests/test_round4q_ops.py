"""Wave-47 operator tests: IVF recall-vs-probes self-evaluation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators.similarity import (
    build_ivf_index,
    ivf_recall_report,
)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """4 well-separated gaussian clusters of 40 vectors (dim 8) + an
    index with 4 cells — the geometry where probing more cells must
    monotonically recover recall."""
    rng = np.random.default_rng(33)
    centers = np.eye(4).repeat(2, axis=1) * 10  # 4 orthogonal-ish centers
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(40):
            v = centers[c] + rng.normal(0, 0.5, size=8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = tmp_path_factory.mktemp("ivf_recall") / "idx"
    build_ivf_index(df, idx, n_cells=4, iters=2, seed=1)
    return df, idx


def test_recall_monotone_and_exact_at_full_probe(spark, clustered):
    df, idx = clustered
    queries = df.filter(F.col("vec_id") % 20 == 0)
    rep = {
        r["n_probe"]: r.asDict()
        for r in ivf_recall_report(
            spark, idx, df, queries, k=5, n_probes=(1, 2, 4)
        ).collect()
    }
    assert rep[4]["mean_recall"] == 1.0 and rep[4]["min_recall"] == 1.0
    assert rep[1]["mean_recall"] <= rep[2]["mean_recall"] <= 1.0
    # clustered geometry: probing the home cell already finds most of top-5
    assert rep[1]["mean_recall"] > 0.5
    assert all(r["n_queries"] == 8 for r in rep.values())


def test_recall_report_validation(spark, clustered):
    df, idx = clustered
    with pytest.raises(ValueError):
        ivf_recall_report(spark, idx, df, df, k=0)
    with pytest.raises(ValueError):
        ivf_recall_report(spark, idx, df, df, n_probes=())
