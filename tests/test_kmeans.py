"""Distributed Lloyd k-means (operators/kmeans.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.kmeans import kmeans_assign, kmeans_fit


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated 6-dim blobs, 60 vectors each."""
    rng = np.random.default_rng(3)
    centers = np.array([
        [10, 0, 0, 0, 0, 0],
        [0, 10, 0, 0, 0, 0],
        [0, 0, 10, 0, 0, 0],
    ], dtype=np.float64)
    rows = []
    for ci, c in enumerate(centers):
        for j in range(60):
            v = c + rng.normal(scale=0.5, size=6)
            rows.append((ci * 1000 + j, v.tolist()))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_kmeans_recovers_planted_blobs(spark, blobs):
    model = kmeans_fit(blobs, k=3, iters=3)
    # inertia non-increasing across full-corpus rounds
    assert all(b <= a + 1e-9 for a, b in zip(model.inertia, model.inertia[1:]))
    assert sum(model.cell_sizes) == 180
    # each blob lands wholly in one cell, all three cells distinct
    out = kmeans_assign(blobs, model.centroids)
    cells = {r.vec_id // 1000: set() for r in out.collect()}
    for r in out.collect():
        cells[r.vec_id // 1000].add(r.cell)
    assert all(len(s) == 1 for s in cells.values())
    assert len({next(iter(s)) for s in cells.values()}) == 3
    # centroids sit near the planted centers
    got = np.sort(model.centroids.max(axis=1))
    assert np.allclose(got, [10, 10, 10], atol=0.5)


def test_kmeans_deterministic_and_validates(spark, blobs):
    m1 = kmeans_fit(blobs, k=3, iters=2)
    m2 = kmeans_fit(blobs, k=3, iters=2)
    assert np.array_equal(m1.centroids, m2.centroids)
    assert m1.inertia == m2.inertia
    with pytest.raises(ValueError):
        kmeans_fit(blobs, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(blobs, k=3, iters=0)


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """k larger than the distinct points: surplus cells keep their init
    centroid instead of producing NaNs."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    model = kmeans_fit(df, k=4, iters=2)
    assert not np.isnan(model.centroids).any()
    assert sum(model.cell_sizes) == 20
