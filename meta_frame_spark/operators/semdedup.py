"""Semantic deduplication over an embedding column (SemDeDup-style).

Not in the reference (SURVEY.md §2 — no vector surface at all); this
is the embedding-space counterpart of MinHash near-dup (Abbas et al.,
"SemDeDup", arXiv:2303.09540): cluster the corpus with a coarse
k-means quantizer, then *within each cluster* drop every vector whose
cosine similarity to an already-kept lower-id vector exceeds the
threshold. Cross-cluster duplicates are missed by construction — the
recall/cost knob is ``n_clusters`` (more clusters = cheaper + lower
recall), exactly the paper's trade.

Scale design (10⁹+ vectors):

* quantizer fit is driver-side on a BOUNDED id-hash-ordered sample
  (``similarity._fit_quantizer`` — the FAISS training recipe);
* cell assignment is one Arrow-batched map, no shuffle;
* the only shuffle is the groupBy(cell) feeding ``applyInPandas``;
  within a cluster the work is one normalize + one n×n matmul. Cluster
  sizes are corpus/n_clusters on average — size ``n_clusters`` so
  clusters stay ≤ ~10k vectors (paper uses corpus/n ≈ 1-10k); a
  pathological mega-cluster is capped by raising ``n_clusters``, not
  by salting (splitting a cluster must change which pairs are
  compared, never silently skip pairs).

Determinism: seeded quantizer + hash-ordered training sample + greedy
scan in ascending id order — identical output on any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meta_frame_spark.operators.similarity import _cell_assigner, _fit_quantizer

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("is_kept", T.BooleanType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> DataFrame:
    """Flag semantic duplicates: one output row per input vector with
    ``is_kept``, and for dropped vectors the kept ``dup_of`` id and the
    ``cosine`` that condemned them.

    Keep rule (deterministic greedy): scan each cluster in ascending
    id; a vector is kept iff its cosine to every *already-kept* vector
    of the cluster is below ``threshold``. Join survivors back with
    ``df.join(out.filter("is_kept"), id_col, "left_semi")``.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    corpus_vec = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("v")
    )
    centroids = _fit_quantizer(corpus_vec, n_clusters, seed, fit_fraction)
    assigned = corpus_vec.select(
        "_id", "v", _cell_assigner(centroids)(F.col("v")).alias("cell")
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["_id"].to_numpy()
        cell = int(pdf["cell"].iloc[0])
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            M = np.where(norms > 0, M / norms, 0.0)
        # preallocated kept-matrix: the scan is inherently sequential
        # (keep decisions depend on earlier keeps) but each step is one
        # (kept × d) matvec against a stable buffer — no per-step copy
        K = np.empty_like(M)
        kept_ids = np.empty(n, dtype=np.int64)
        kk = 0
        dup_of = np.full(n, np.nan)
        cosine = np.full(n, np.nan)
        for i in range(n):
            if kk:
                sims = K[:kk] @ M[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    dup_of[i] = kept_ids[j]
                    cosine[i] = sims[j]
                    continue
            K[kk] = M[i]
            kept_ids[kk] = ids[i]
            kk += 1
        is_kept = np.isnan(dup_of)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": cell,
                "is_kept": is_kept,
                "dup_of": pd.array(
                    [None if k else int(d) for k, d in zip(is_kept, dup_of)],
                    dtype="Int64",
                ),
                "cosine": [None if k else c for k, c in zip(is_kept, cosine)],
            }
        )

    return assigned.groupBy("cell").applyInPandas(prune, _OUT_SCHEMA)
