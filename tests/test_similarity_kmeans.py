"""Distributed spherical k-means: deterministic, cosine-inertia
monotone-improving vs the untrained seed, IVF-compatible output."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gbdc_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _mean_cell_cosine(df, cents):
    out = sim.ivf_assign(df, cents)
    return out.agg(F.avg("cell_cosine")).first()[0]


def test_kmeans_improves_over_seed_and_is_deterministic(spark, emb):
    seed = sim.centroids_from_rows(emb, list(range(8)))
    trained = sim.kmeans_fit(emb, k=8, iters=4)
    base = _mean_cell_cosine(emb, seed)
    better = _mean_cell_cosine(emb, trained)
    assert better > base  # Lloyd's improves the assignment objective

    again = sim.kmeans_fit(emb, k=8, iters=4)
    a = {r["cell"]: list(r["centroid"]) for r in trained.collect()}
    b = {r["cell"]: list(r["centroid"]) for r in again.collect()}
    assert set(a) == set(b)
    for c in a:
        np.testing.assert_allclose(a[c], b[c], rtol=1e-12)


def test_kmeans_centroids_unit_norm_and_ivf_compatible(spark, emb):
    cents = sim.kmeans_fit(emb, k=4, iters=2)
    rows = cents.collect()
    assert len(rows) <= 4
    for r in rows:
        assert np.linalg.norm(r["centroid"]) == pytest.approx(1.0, rel=1e-9)
    # plugs straight into the existing ANN path
    q = [float(x) for x in emb.first()["embedding"]]
    top = sim.ivf_topk(emb, cents, q, k=3, n_probe=2).collect()
    assert len(top) == 3
