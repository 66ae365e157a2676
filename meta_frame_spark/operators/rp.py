"""Johnson-Lindenstrauss random projection: cheap dimensionality
reduction for embedding columns.

Not in the reference (no vector surface at all — SURVEY.md §2); this
is the standard first move on a 100 TB embedding store before ANN /
clustering / dedup: project ``dim -> out_dim`` (e.g. 64 -> 32) with a
dense Gaussian matrix scaled ``1/sqrt(out_dim)``. The JL lemma
(public result, Johnson & Lindenstrauss 1984) bounds pairwise-distance
distortion independently of the corpus size, so downstream cosine
comparisons stay meaningful while compute and storage drop by
``out_dim/dim``.

Scale design:

* The projection is **map-only** — one numpy matmul per Arrow batch
  inside a vectorized pandas UDF (the measured-fast shape for dense
  linear algebra, same as the SRP stage in operators/similarity.py).
  No shuffle, no state, trivially linear in corpus size.
* The matrix is deterministic from ``seed`` and built lazily per
  (worker, input-dim) — a few KB; identical on every executor, so the
  operator is reproducible and restart-safe with no broadcast step.
* Composes with the ANN tiers: ``rp_topk`` is exact brute-force cosine
  in the REDUCED space (same plan shape as brute_force_topk: corpus
  map-scan x broadcast queries), trading recall in the original space
  for a ``dim/out_dim`` FLOP cut; at 100 TB you'd chain
  rp_project -> ivf_topk/srp_lsh_topk for sub-linear candidates on
  half-width vectors.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rp_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 32,
    seed: int = 42,
    out_col: str | None = None,
) -> DataFrame:
    """Replace (or add, with ``out_col``) the vector column with its
    ``out_dim``-dimensional Gaussian random projection."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    target = out_col or vec_col

    # built lazily per (worker task, input-dim): the dict lives in the
    # UDF closure, so every Arrow batch of a task reuses the matrix
    # instead of regenerating it per batch
    mats: dict[int, np.ndarray] = {}

    @F.pandas_udf("array<float>")
    def _proj(vs: pd.Series) -> pd.Series:
        X = np.vstack(vs.to_numpy()).astype(np.float32)
        d = X.shape[1]
        if d not in mats:
            rng = np.random.RandomState(seed)
            mats[d] = (
                rng.standard_normal((d, out_dim)) / np.sqrt(out_dim)
            ).astype(np.float32)
        Y = X @ mats[d]
        return pd.Series(list(Y), index=vs.index)

    return df.withColumn(target, _proj(F.col(vec_col)))


def rp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    out_dim: int = 32,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: exact brute force in the projected
    space. Returns (query_id, neighbor_id, rank) like the other ANN
    tiers; recall against full-dimension exact search degrades
    gracefully with ``out_dim`` (JL distortion ~ 1/sqrt(out_dim))."""
    from meta_frame_spark.operators.similarity import brute_force_topk

    c = rp_project(corpus, vec_col, out_dim=out_dim, seed=seed)
    q = rp_project(queries, vec_col, out_dim=out_dim, seed=seed)
    return brute_force_topk(
        c, q, k=k, id_col=id_col, vec_col=vec_col, exclude_self=exclude_self
    )


def rp_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    out_dim: int = 32,
    shortlist_frac: float = 0.1,
    min_shortlist: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """The production RP pattern: shortlist in the reduced space, then
    exact full-dimension rescore over candidates only.

    Stage 1 scores the PROJECTED corpus (``out_dim/dim`` of the FLOPs)
    and keeps the top ``m = max(min_shortlist, ceil(shortlist_frac*N))``
    per query; stage 2 joins only those m candidates back to their
    full vectors and re-ranks exactly — so the final top-k ordering is
    the true cosine order restricted to the shortlist, and recall@k
    equals shortlist coverage. One bounded scalar ``count()`` sizes the
    shortlist; the rescore join touches m rows per query, never the
    corpus. (At 100 TB, chain rp_project with the IVF/LSH tiers instead
    of a linear shortlist scan — this operator is the exact-oracle
    midpoint between brute force and those.)
    """
    from meta_frame_spark.functions.vectors import cosine_similarity

    n = corpus.count()  # bounded scalar: sizes the per-query shortlist
    m = max(min_shortlist, int(math.ceil(n * shortlist_frac)))
    cand = rp_topk(
        corpus, queries, k=m, out_dim=out_dim, seed=seed,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = (
        cand.select("query_id", "neighbor_id")
        .join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("score", cosine_similarity("_qvec", "_nvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
