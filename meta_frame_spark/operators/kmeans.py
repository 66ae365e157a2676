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
* each round is ONE corpus pass: an Arrow-batched E-step map (each
  batch a (batch × k) matmul) reduces INSIDE the batch to per-cell
  partials — (cell, count, summed squared distance, summed vector) —
  so at most k rows leave the Python worker per Arrow batch; the
  partial vectors posexplode (k × batches × dim rows, data-size
  independent) into a per-(cell, pos) aggregate whose pos-0 slice
  doubles as the per-cell count/inertia accumulator, and the driver
  collects only k × dim rows per round, never vectors. (The earlier
  shape exploded EVERY corpus vector into dim rows before the
  aggregate — rows × dim through a corpus-grain hash aggregate per
  round, all of it computing sums numpy had already touched);
* no persisted per-round state on the cluster at all — the round's
  plan is scan → assign → explode → aggregate, then the next round
  rebinds new centroids into a fresh plan.

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
    """Fitted k-means: final centroids, per-round inertia history, and
    the final round's per-cell sizes."""

    centroids: "np.ndarray"          # (k, dim) final means
    inertia: list[float] = field(default_factory=list)  # per completed round
    cell_sizes: list[int] = field(default_factory=list)  # final round


def _assign_with_dist(centroids: "np.ndarray"):
    """Arrow UDF: vector -> (cell, dist2) against the closure
    centroids; null/ragged vectors null-propagate instead of crashing
    the batch stack (same guard as every sibling vector UDF)."""
    dim = centroids.shape[1]

    @F.pandas_udf("cell int, dist2 double")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        cells = pd.Series([None] * len(vs), dtype="Int32")
        dist2 = pd.Series([None] * len(vs), dtype="Float64")
        valid = [i for i, v in enumerate(vs) if v is not None and len(v) == dim]
        if valid:
            M = np.stack([np.asarray(vs.iloc[i], dtype=np.float64) for i in valid])
            d = (M * M).sum(1)[:, None] - 2 * (M @ centroids.T) + (
                centroids * centroids
            ).sum(1)
            a = d.argmin(1)
            # clamp the FP cancellation tail: true dist2 is >= 0
            dd = np.maximum(d[np.arange(len(a)), a], 0.0)
            for j, i in enumerate(valid):
                cells.iloc[i] = int(a[j])
                dist2.iloc[i] = float(dd[j])
        return pd.DataFrame({"cell": cells, "dist2": dist2})

    return _assign


def _estep_partials(centroids: "np.ndarray"):
    """Arrow map for one Lloyd round: each batch reduces to at most k
    rows of (cell, n, ssd, summed vector) — the sufficient statistics
    of the M-step — so corpus size never reaches the shuffle.
    Null/ragged vectors are skipped (the `_assign_with_dist` guard)."""
    dim = centroids.shape[1]

    def _partials(batches):
        for pdf in batches:
            vs = pdf["v"]
            valid = [
                i for i, v in enumerate(vs) if v is not None and len(v) == dim
            ]
            if not valid:
                continue
            M = np.stack(
                [np.asarray(vs.iloc[i], dtype=np.float64) for i in valid]
            )
            d = (M * M).sum(1)[:, None] - 2 * (M @ centroids.T) + (
                centroids * centroids
            ).sum(1)
            a = d.argmin(1)
            # clamp the FP cancellation tail: true dist2 is >= 0
            dd = np.maximum(d[np.arange(len(a)), a], 0.0)
            cells = np.unique(a)
            yield pd.DataFrame({
                "cell": cells.astype("int32"),
                "n": [int((a == c).sum()) for c in cells],
                "ssd": [float(dd[a == c].sum()) for c in cells],
                "s": [M[a == c].sum(0) for c in cells],
            })

    return _partials


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
        # ONE corpus pass per round: the Arrow map reduces each batch
        # to <= k sufficient-statistic rows; their vectors posexplode
        # (k x batches x dim rows — corpus-size independent) into the
        # per-(cell, pos) aggregate whose pos-0 slice carries count
        # and summed squared distance — no persist, no second scan,
        # one (tiny) shuffle, k x dim rows collected.
        rows = (
            corpus_vec.select("v").mapInPandas(
                _estep_partials(centroids),
                "cell int, n long, ssd double, s array<double>",
            )
            .select("cell", "n", "ssd", F.posexplode("s").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum("x").alias("sx"),
                F.sum("n").alias("n"),
                F.sum("ssd").alias("ssd"),
            )
            .collect()
        )
        model.inertia.append(float(sum(r["ssd"] for r in rows if r["pos"] == 0)))
        new_c = centroids.copy()  # empty cells keep their previous mean
        sizes: dict[int, int] = {}
        for r in rows:
            new_c[r["cell"], r["pos"]] = r["sx"] / r["n"]
            if r["pos"] == 0:
                sizes[r["cell"]] = r["n"]
        centroids = new_c
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
    ).select(id_col, "a.cell", "a.dist2").filter(F.col("cell").isNotNull())
