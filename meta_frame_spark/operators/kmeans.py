"""Distributed Lloyd k-means over an embedding column.

Not in the reference (SURVEY.md §2 — no vector surface); this is the
corpus-clustering primitive behind curriculum bucketing, domain
discovery, and SemDeDup-style cell construction when the coarse
driver-side quantizer (`similarity._fit_quantizer`, bounded-sample
FAISS recipe) is not enough and the centroids must be refined on the
FULL corpus.

Scale design (10⁹+ vectors, the classic Spark k-means shape — MLlib
does the same):

* **init** comes from the bounded-sample driver fit (deterministic
  id-hash-ordered sample), so the distributed rounds start near a
  solution and ``iters`` stays small;
* **E-step** is one Arrow-batched map over the corpus — each batch is
  a (batch × k) matmul emitting (cell, squared distance), no shuffle;
* **M-step** is posexplode + avg per (cell, pos): the shuffle moves
  rows × dim scalar values with map-side partial aggregation (the
  `group_centroids` shape), and the driver collects only k × dim
  means + k counts + 1 inertia scalar per round — never vectors;
* per-round state on the cluster is just the persisted assignment
  frame of the CURRENT round (unpersisted before the next), so
  memory is one (id, vec, cell, dist2) projection regardless of
  ``iters``.

Empty cells keep their previous centroid (the standard Lloyd
convention; no resampling so runs stay deterministic). Inertia is
non-increasing by construction — each E-step minimizes distance given
centroids, each M-step minimizes it given assignments — which the
driver query (`q_kmeans`) turns into an engine-checkable invariant.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.similarity import _fit_quantizer


@dataclass
class KMeansModel:
    centroids: "np.ndarray"          # (k, dim) final means
    inertia: list[float] = field(default_factory=list)  # per completed round
    cell_sizes: list[int] = field(default_factory=list)  # final round


def _assign_with_dist(centroids: "np.ndarray"):
    """Arrow UDF: vector -> (cell, dist2) against the closure centroids."""

    @F.pandas_udf("cell int, dist2 double")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "dist2": pd.Series([], dtype="float64")})
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        d = (M * M).sum(1)[:, None] - 2 * (M @ centroids.T) + (
            centroids * centroids
        ).sum(1)
        a = d.argmin(1)
        return pd.DataFrame({
            "cell": a.astype(np.int32),
            # clamp the FP cancellation tail: true dist2 is >= 0
            "dist2": np.maximum(d[np.arange(len(a)), a], 0.0),
        })

    return _assign


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> KMeansModel:
    """Refine ``k`` centroids with ``iters`` full-corpus Lloyd rounds
    (bounded-sample init). Driver-side data is O(k·dim) per round."""
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    corpus_vec = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("v")
    )
    centroids = _fit_quantizer(corpus_vec, k, seed, fit_fraction)
    model = KMeansModel(centroids=centroids)
    for _ in range(iters):
        assigned = corpus_vec.select(
            "v", _assign_with_dist(centroids)(F.col("v")).alias("a")
        ).select("v", "a.cell", "a.dist2").persist()
        stats = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist2").alias("ssd")
        ).collect()
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        assigned.unpersist()
        model.inertia.append(float(sum(r["ssd"] for r in stats)))
        new_c = centroids.copy()  # empty cells keep their previous mean
        for r in means:
            new_c[r["cell"], r["pos"]] = r["m"]
        centroids = new_c
        sizes = {r["cell"]: r["n"] for r in stats}
        model.cell_sizes = [int(sizes.get(c, 0)) for c in range(len(centroids))]
    model.centroids = centroids
    return model


def kmeans_assign(
    df: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map every vector to its nearest centroid: (id_col, cell, dist2).
    One Arrow-batched map, no shuffle."""
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _assign_with_dist(np.asarray(centroids, dtype=np.float64))(
            F.col(vec_col)
        ).alias("a"),
    ).select(id_col, "a.cell", "a.dist2")
