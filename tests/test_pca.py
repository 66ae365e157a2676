"""Distributed PCA (operators/pca.py) vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.pca import pca_fit, pca_transform


@pytest.fixture(scope="module")
def aniso(spark):
    """Anisotropic 6-dim cloud with two dominant directions."""
    rng = np.random.default_rng(11)
    B = rng.normal(size=(6, 6))
    scales = np.array([5.0, 3.0, 0.5, 0.3, 0.2, 0.1])
    X = rng.normal(size=(400, 6)) * scales @ B
    rows = [(i, x.tolist()) for i, x in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return df.repartition(8), X


def test_pca_matches_numpy(spark, aniso):
    df, X = aniso
    model = pca_fit(df, n_components=3)
    assert model.n_rows == 400

    cov = np.cov(X.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model.explained_variance, evals[:3], rtol=1e-8)
    assert np.isclose(model.total_variance, evals.sum(), rtol=1e-8)
    ratios = model.explained_variance_ratio
    assert (np.diff(ratios) <= 1e-12).all() and 0 < ratios.sum() <= 1 + 1e-12
    # components orthonormal
    assert np.allclose(model.components @ model.components.T, np.eye(3), atol=1e-9)


def test_pca_transform_projection_and_whitening(spark, aniso):
    df, X = aniso
    model = pca_fit(df, n_components=2)
    out = pca_transform(df, model).orderBy("vec_id").collect()
    P = np.array([r.pca for r in out])
    expect = (X - X.mean(0)) @ model.components.T
    assert np.allclose(P, expect, atol=1e-8)
    # projected coords are uncorrelated with variances = eigenvalues
    assert np.allclose(np.cov(P.T, bias=True),
                       np.diag(model.explained_variance), atol=1e-6)
    white = pca_transform(df, model, whiten=True).orderBy("vec_id").collect()
    Wp = np.array([r.pca for r in white])
    assert np.allclose(Wp.var(axis=0), 1.0, atol=1e-4)


def test_pca_deterministic_across_partitionings(spark, aniso):
    df, _ = aniso
    m1 = pca_fit(df, n_components=2)
    m2 = pca_fit(df.repartition(17), n_components=2)
    assert np.allclose(m1.components, m2.components, atol=1e-9)
    with pytest.raises(ValueError):
        pca_fit(df, n_components=0)
    with pytest.raises(ValueError, match="no non-null"):
        pca_fit(df.filter("vec_id < 0"))
