"""Similarity search over embedding columns (SURVEY.md §7.1 step 6c;
no equivalent in the reference).

Two tiers, as a production ANN pipeline would have:

* ``brute_force_topk`` — exact cosine top-k. The correctness baseline,
  and the right choice whenever the *query* set is small: the query
  side is broadcast, the corpus is scanned once (embarrassingly
  parallel map), and only (n_queries × k) rows survive the final
  per-query top-k shuffle.
* ``srp_lsh_topk`` — signed-random-projection LSH: hash vectors into
  sign-pattern buckets per band, join queries to corpus on matching
  buckets only, exact-rescore candidates. Sub-linear candidate count;
  at 100 TB the bucket join replaces the full scan per query batch.

Everything is built-in expressions (zip_with/aggregate/window); no UDF.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meta_frame_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank) ordered deterministically:
    score desc, neighbor_id asc tiebreak. The queries side is hinted
    broadcast — the corpus never shuffles for the scoring stage; the
    only shuffle is the per-query top-k window over surviving rows.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("score", cosine_similarity("q_vec", "c_vec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _srp_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _srp_bits(vec_col, planes: list[list[float]]):
    """array<int> of hyperplane sign bits — ONE transform over a single
    literal plane matrix, so the projection-dot work is a single
    expression per row (not one literal array per plane)."""
    planes_lit = F.array(*[F.array(*[F.lit(float(v)) for v in p]) for p in planes])
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        planes_lit,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(v, p, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
            >= 0,
            1,
        ).otherwise(0),
    )


def _bucketize(df: DataFrame, ident: str, vec: str,
               planes: list[list[float]], planes_per_band: int, num_bands: int) -> DataFrame:
    """(_id, v, band, bucket) — one row per (vector, band).

    Two-step projection on purpose: ``bits`` is aliased in its own
    Project and referenced by all ``num_bands`` bucket expressions;
    Catalyst's CollapseProject keeps multi-referenced non-cheap aliases
    un-inlined, so the sign bits are computed once per row, not per band.
    """
    with_bits = df.select(
        F.col(ident).alias("_id"), F.col(vec).alias("v"),
        _srp_bits(vec, planes).alias("bits"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.aggregate(
                    F.slice("bits", b * planes_per_band + 1, planes_per_band),
                    F.lit(0),
                    lambda acc, bit: acc * 2 + bit,
                ).alias("bucket"),
            )
            for b in range(num_bands)
        ]
    )
    return (
        with_bits.select("_id", "v", F.explode(bands).alias("bb"))
        .select("_id", "v", "bb.band", "bb.bucket")
    )


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes_per_band: int = 4,
    num_bands: int = 16,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: SRP-LSH candidate generation + exact
    rescoring. A query's candidates are corpus vectors sharing its
    sign-bucket in >=1 band.

    Scale: corpus side computes ``num_bands`` bucket ids per vector
    (map-only), explodes to (band, bucket) keys, and the candidate join
    is an equi-join on those keys — never a cross join. Recall tunes
    with bands (more bands = more recall, more candidates).
    """
    all_planes = _srp_planes(dim, planes_per_band * num_bands, seed)
    cb = _bucketize(corpus, id_col, vec_col, all_planes, planes_per_band, num_bands)
    qb = _bucketize(queries, id_col, vec_col, all_planes, planes_per_band, num_bands)

    cands = (
        cb.alias("c")
        .join(
            F.broadcast(qb.alias("q")),
            on=[
                F.col("c.band") == F.col("q.band"),
                F.col("c.bucket") == F.col("q.bucket"),
            ],
        )
        .select(
            F.col("q._id").alias("query_id"),
            F.col("c._id").alias("neighbor_id"),
            F.col("q.v").alias("q_vec"),
            F.col("c.v").alias("c_vec"),
        )
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
    cands = cands.dropDuplicates(["query_id", "neighbor_id"])

    scored = cands.withColumn("score", cosine_similarity("q_vec", "c_vec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes_per_band: int = 4,
    num_bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) via the same SRP-LSH bucketing — candidates only, then
    exact cosine verify."""
    all_planes = _srp_planes(dim, planes_per_band * num_bands, seed)
    eb = _bucketize(df, id_col, vec_col, all_planes, planes_per_band, num_bands)
    pairs = (
        eb.alias("a")
        .join(
            eb.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.v").alias("v_a"),
            F.col("b.v").alias("v_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", cosine_similarity("v_a", "v_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )
    return pairs
