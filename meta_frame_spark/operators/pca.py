"""Distributed PCA over an embedding column.

Not in the reference (no vector surface); the dimensionality-reduction
step of an embedding pipeline — whiten/reduce before ANN indexing
(`similarity`, `pq`), compress stored vectors, decorrelate features
for the k-means quantizers.

Scale shape (the classic one-pass closed form, same as MLlib's
RowMatrix PCA): PCA of d-dim vectors needs only the d×d second-moment
(Gram) matrix and the d-dim mean — both are sums, so ONE Arrow-batched
`mapInPandas` pass emits per-partition partials ((d²+d+1) doubles per
partition, one row each) and the driver combines + eigendecomposes a
d×d matrix (d ≤ a few thousand: microseconds of LAPACK). No iteration,
no shuffle of vectors — corpus bytes cross the wire exactly never.

`pca_transform` is a map-only Arrow projection onto the top
``n_components`` eigenvectors (optionally whitened). Components have a
deterministic sign convention (largest-|coordinate| entry positive) so
results are reproducible across partitionings and BLAS builds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel:
    """Fitted PCA: mean, orthonormal components (rows), per-component
    explained variance, total variance, and the fitted row count."""

    def __init__(
        self,
        mean: "np.ndarray",
        components: "np.ndarray",        # (n_components, d), rows orthonormal
        explained_variance: "np.ndarray",  # (n_components,)
        total_variance: float,
        n_rows: int,
    ) -> None:
        self.mean = mean
        self.components = components
        self.explained_variance = explained_variance
        self.total_variance = total_variance
        self.n_rows = n_rows

    @property
    def explained_variance_ratio(self) -> "np.ndarray":
        if self.total_variance <= 0:
            return np.zeros_like(self.explained_variance)
        return self.explained_variance / self.total_variance


def pca_fit(
    df: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
) -> PCAModel:
    """Exact PCA via one distributed Gram-matrix pass + driver eigh."""
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")

    src = df.filter(F.col(vec_col).isNotNull()).select(F.col(vec_col).alias("v"))

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        gram = None
        s = None
        n = 0
        dim = None
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = [v for v in pdf["v"] if v is not None]
            if dim is None and vecs:
                dim = len(vecs[0])
            vecs = [v for v in vecs if len(v) == dim]  # drop ragged rows
            if not vecs:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            if gram is None:
                gram = np.zeros((X.shape[1], X.shape[1]))
                s = np.zeros(X.shape[1])
            gram += X.T @ X
            s += X.sum(0)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s], "gram": [gram.ravel()]}
            )

    parts = src.mapInPandas(
        partials, schema="n long, s array<double>, gram array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_fit: corpus has no non-null vectors")
    # a partition whose first valid vector was ragged reports a
    # different width: keep the dominant width (by row mass) so one
    # malformed shard cannot crash or skew the fit
    by_dim: dict[int, int] = {}
    for p in parts:
        by_dim[len(p["s"])] = by_dim.get(len(p["s"]), 0) + p["n"]
    dom = max(by_dim, key=lambda d_: by_dim[d_])
    parts = [p for p in parts if len(p["s"]) == dom]
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    gram = np.sum([np.asarray(p["gram"]) for p in parts], axis=0)
    d = len(s)
    gram = gram.reshape(d, d)
    mean = s / n
    # covariance from the Gram matrix (population normalization)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][: min(n_components, d)]
    comps = evecs[:, order].T
    # deterministic sign: largest-|coordinate| entry positive
    for row in comps:
        j = int(np.abs(row).argmax())
        if row[j] < 0:
            row *= -1.0
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
        total_variance=float(np.maximum(evals, 0.0).sum()),
        n_rows=int(n),
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components (map-only Arrow
    pass); ``whiten=True`` scales each coordinate to unit variance."""
    mean = model.mean
    W = model.components.T  # (d, k)
    if whiten:
        W = W / np.sqrt(model.explained_variance + eps)
    d = len(mean)

    @F.pandas_udf("array<double>")
    def _project(vs: pd.Series) -> pd.Series:
        out = [None] * len(vs)
        valid = [i for i, v in enumerate(vs) if v is not None and len(v) == d]
        if valid:
            X = np.stack([np.asarray(vs.iloc[i], dtype=np.float64) for i in valid])
            P = (X - mean) @ W
            for row, i in enumerate(valid):
                out[i] = P[row]
        return pd.Series(out)

    return df.withColumn(out_col, _project(F.col(vec_col)))
