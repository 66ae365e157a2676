"""Diversity-aware selection over embedding columns: MMR re-ranking
and greedy k-center coresets.

Not in the reference (no vector surface). Two public techniques a
training-data pipeline uses to fight redundancy *after* similarity
search has done its job:

* **MMR** (Maximal Marginal Relevance, Carbonell & Goldstein 1998):
  re-rank a candidate list so each pick maximizes
  ``lam * sim(query, d) - (1 - lam) * max_{s in selected} sim(d, s)``
  — relevant but not redundant. The standard pick for retrieval-
  augmented training mixes and dedup-aware negative mining.
* **Greedy k-center** (Gonzalez 1985): farthest-point traversal gives
  a 2-approximation to the k-center cover — the classic coreset for
  "summarize this embedding space with k exemplars".

Scale design:

* MMR stage 1 delegates candidate generation to the existing ANN
  tiers (any (query_id, neighbor_id) frame works — brute force here
  by default, LSH/IVF at corpus scale). Stage 2 is per-query greedy
  over a BOUNDED candidate set (``n_candidates``) inside
  ``applyInPandas`` — O(m²) per group on m ≤ ~100 rows, embarrassingly
  parallel across queries, never corpus-quadratic.
* k-center fits on a bounded deterministic sample (id-hash order, same
  recipe as similarity._fit_quantizer); the coverage radius is then a
  distributed map-only pass (broadcast centers, ``least`` over
  per-center distances) + one max aggregate — exact over the FULL
  corpus, linear, no shuffle beyond the final scalar.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_select(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """``(query_id, neighbor_id, rank)`` — the MMR-diversified top-k
    per query. Deterministic: ties break on neighbor_id asc; the first
    pick is always the plain cosine argmax. Pass ``candidates``
    ((query_id, neighbor_id) from an ANN tier) to skip the brute-force
    candidate stage at corpus scale."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1 or n_candidates < k:
        raise ValueError(
            f"need n_candidates >= k >= 1, got k={k}, n_candidates={n_candidates}"
        )
    from meta_frame_spark.operators.similarity import brute_force_topk

    if candidates is None:
        candidates = brute_force_topk(
            corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col
        )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    pairs = (
        candidates.select("query_id", "neighbor_id")
        .join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        take = min(k, n)
        if take == 0:
            # preserve the incoming id dtypes (string/int/...) — Arrow
            # casts the empty slices to the declared output schema
            return pd.DataFrame({
                "query_id": pdf["query_id"].iloc[:0],
                "neighbor_id": pdf["neighbor_id"].iloc[:0],
                "rank": pd.Series([], dtype="int32"),
            })
        # deterministic candidate order regardless of partitioning
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        # np.array (copy): Arrow hands over read-only float64 buffers,
        # and both M and q are normalized in place below
        M = np.stack([np.array(v, dtype=np.float64) for v in pdf["_nvec"]])
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        q = np.array(pdf["_qvec"].iloc[0], dtype=np.float64)
        q /= max(float(np.linalg.norm(q)), 1e-12)
        rel = M @ q                    # relevance to the query
        red = np.full(n, -np.inf)      # max sim to the selected set
        chosen: list[int] = []
        free = np.ones(n, dtype=bool)
        for _ in range(take):
            # first pick scores by rel alone (not lam * rel): at
            # lam = 0.0 every lam-scaled score is 0 and argmax would
            # fall back to the lowest id, breaking the documented
            # "first pick is always the plain cosine argmax" contract;
            # for lam > 0 the argmax is identical either way
            score = np.where(
                np.isneginf(red), rel, lam * rel - (1 - lam) * red
            )
            score = np.where(free, score, -np.inf)
            # argmax with neighbor_id-asc tiebreak: candidates are id
            # sorted, and np.argmax returns the first maximum
            best = int(np.argmax(np.round(score, 12)))
            chosen.append(best)
            free[best] = False
            red = np.maximum(red, M @ M[best])
        ids = pdf["neighbor_id"].to_numpy()
        return pd.DataFrame({
            "query_id": np.repeat(pdf["query_id"].iloc[0], take),
            "neighbor_id": ids[chosen],
            "rank": np.arange(1, take + 1, dtype=np.int32),
        })

    # output id types follow the input ids (string doc ids work too) —
    # a hardcoded bigint schema would reject non-integral id columns
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType([
        StructField("query_id", pairs.schema["query_id"].dataType),
        StructField("neighbor_id", pairs.schema["neighbor_id"].dataType),
        StructField("rank", IntegerType()),
    ])
    return pairs.groupBy("query_id").applyInPandas(_greedy, schema=out_schema)


def kcenter_coverage(
    df: DataFrame,
    ks: tuple[int, ...] = (2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_sample: int = 4_096,
) -> DataFrame:
    """Greedy k-center exemplars + exact coverage radii: one row per
    requested ``k`` — ``(k, coverage_radius)``, where the radius is
    the max over the FULL corpus of the distance to the nearest of the
    first k greedy centers. Radii are non-increasing in k by
    construction (prefix property of farthest-point traversal)."""
    ks = tuple(sorted(set(int(x) for x in ks)))
    if not ks or ks[0] < 1:
        raise ValueError(f"ks must be positive ints, got {ks}")
    kmax = ks[-1]
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(max_sample)
        .collect()
    )
    if not rows:
        raise ValueError("kcenter_coverage: corpus has no non-null vectors")
    X = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
    # Gonzalez farthest-point traversal on the bounded sample: start
    # from the sample's hash-order first row (deterministic), then
    # repeatedly take the point farthest from the chosen set.
    centers = [0]
    d = np.linalg.norm(X - X[0], axis=1)
    while len(centers) < min(kmax, len(X)):
        nxt = int(np.argmax(d))
        centers.append(nxt)
        d = np.minimum(d, np.linalg.norm(X - X[nxt], axis=1))
    C = X[centers]

    from meta_frame_spark.functions.vectors import l2_distance

    base = df.filter(F.col(vec_col).isNotNull()).select(F.col(vec_col).alias("v"))
    dist_cols = [
        l2_distance(
            F.col("v"), F.array(*[F.lit(float(x)) for x in C[j]])
        ).alias(f"_d{j}")
        for j in range(len(C))
    ]
    with_d = base.select(*dist_cols)
    aggs = [
        F.max(F.least(*[F.col(f"_d{j}") for j in range(min(k, len(C)))])).alias(
            f"_r{k}"
        )
        for k in ks
    ]
    radii = with_d.agg(*aggs).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(k), float(radii[f"_r{k}"])) for k in ks],
        "k int, coverage_radius double",
    )
