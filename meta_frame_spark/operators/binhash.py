"""Binary (sign-bit) embedding codes + multi-index Hamming search.

Not in the reference (no vector surface — SURVEY.md §2); this is the
memory-lean end of the ANN ladder, below int8 (operators/quantize.py):
one BIT per dimension — ``bit_i = 1 iff x_i > 0`` — shrinks a float32
store 32×, and Hamming distance between sign codes approximates
angular distance (Charikar 2002's hyperplane LSH with the identity
rotation; 1 - hamming/dim tracks cos). The candidate structure is
multi-index hashing (Norouzi, Punjani & Fleet, CVPR 2012): split each
code into ``n_chunks`` disjoint substrings and index each chunk
exactly — by pigeonhole, ANY code within Hamming distance
``n_chunks - 1`` of a query shares at least one chunk verbatim, so
near-duplicate codes are found with equality joins only.

Scale design:

* Sign-packing is JVM-side ``aggregate`` higher-order functions over
  16-bit-or-narrower chunks — whole-stage codegen, zero Python,
  map-only, no shuffle, and no 64-bit sign-overflow edge (chunks stay
  comfortably inside an int).
* Candidate generation is a ``posexplode`` of the chunk array on both
  sides and an equi-join on ``(chunk_idx, chunk_value)`` — never an
  all-pairs product. The query side is broadcast (query sets are
  bounded); the corpus side shuffles at most ``n_chunks`` skinny rows
  per vector.
* The Hamming rerank is ``bit_count(a XOR b)`` summed over the chunk
  pairs — codegen bit ops on ints — and the final top-k is a
  ``row_number`` window per query (WindowGroupLimit pushdown).
* Fully deterministic (no seeds, no fit): ties break by neighbor id,
  so the result replays exactly on any engine — the driver query
  carries a FULL DuckDB oracle, unlike the seeded LSH/IVF entries.

The returned neighbors are the top-k OF THE CANDIDATE SET: recall of
the exact Hamming top-k is 1.0 inside distance ``n_chunks - 1``
(pigeonhole) and probabilistic beyond — the near-dup regime is the
guaranteed one, which is what binary codes are for. Use more/narrower
chunks to push the guarantee radius out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _chunk_expr(vec: Column, chunk: int, chunk_bits: int) -> Column:
    """Integer value of sign bits [chunk*chunk_bits, (chunk+1)*chunk_bits):
    bit i set iff vec[base+i] > 0. Folded high-bit-first as
    ``acc*2 + bit`` (shiftleft takes only literal shift amounts)."""
    base = chunk * chunk_bits
    return F.aggregate(
        F.sequence(F.lit(chunk_bits - 1), F.lit(0), F.lit(-1)),
        F.lit(0),
        lambda acc, i: acc * 2
        + F.when(
            F.element_at(vec, (F.lit(base + 1) + i).cast("int")) > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def sign_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    chunk_bits: int = 8,
    out_col: str = "sign_chunks",
) -> DataFrame:
    """Add ``out_col``: array<int> of ``dim / chunk_bits`` sign-bit
    chunks (bit ``i`` of chunk ``j`` set iff ``vec[j*chunk_bits+i] >
    0``). ``dim`` must be a multiple of ``chunk_bits`` and
    ``chunk_bits`` at most 16 (chunks stay small positive ints on
    every engine)."""
    if dim % chunk_bits != 0:
        raise ValueError(
            f"dim must be a multiple of chunk_bits, got {dim}/{chunk_bits}"
        )
    if not 1 <= chunk_bits <= 16:
        raise ValueError(f"chunk_bits must be in [1, 16], got {chunk_bits}")
    v = F.col(vec_col)
    chunks = F.array(*[
        _chunk_expr(v, j, chunk_bits) for j in range(dim // chunk_bits)
    ])
    return df.withColumn(out_col, chunks)


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    chunk_bits: int = 8,
) -> DataFrame:
    """Top-``k`` corpus neighbors per query by sign-code Hamming
    distance over multi-index candidates:
    ``(query_id, neighbor_id, hamming, rank)``, rank 1 = closest,
    ties by neighbor id; self-matches (same id) are excluded.

    Candidates are corpus vectors sharing at least one exact
    ``chunk_bits``-bit sign chunk with the query (guaranteed complete
    within Hamming radius ``dim/chunk_bits - 1``); queries with no
    candidate return no rows — visible, not padded.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_chunks = dim // chunk_bits

    def chunked(df: DataFrame, name: str) -> DataFrame:
        return sign_quantize(
            df.select(F.col(id_col).alias(name), F.col(vec_col)),
            vec_col, dim, chunk_bits, out_col="_chunks",
        ).select(name, "_chunks")

    c = chunked(corpus, "neighbor_id")
    q = chunked(queries, "query_id")
    c_idx = c.select(
        "neighbor_id",
        F.posexplode("_chunks").alias("_ci", "_cv"),
    )
    q_idx = q.select(
        "query_id", F.posexplode("_chunks").alias("_ci", "_cv")
    )
    pairs = (
        c_idx.join(F.broadcast(q_idx), ["_ci", "_cv"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    ham = sum(
        F.bit_count(
            F.element_at("_qc", j + 1).bitwiseXOR(F.element_at("_cc", j + 1))
        )
        for j in range(n_chunks)
    )
    scored = (
        pairs.join(F.broadcast(q.select("query_id", F.col("_chunks").alias("_qc"))),
                   "query_id")
        .join(c.select("neighbor_id", F.col("_chunks").alias("_cc")),
              "neighbor_id")
        .select("query_id", "neighbor_id", ham.cast("int").alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hamming_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    chunk_bits: int = 8,
) -> DataFrame:
    """The production binary-ANN pattern (the rp_rescore_topk midpoint
    applied to sign codes): shortlist ``shortlist`` candidates per
    query by multi-index Hamming distance — equality joins on 1-byte
    chunks over a 32x-compressed store — then join ONLY those rows
    back to their full vectors and re-rank by exact cosine:
    ``(query_id, neighbor_id, score, rank)``, rank 1 = best, score
    rounded to 6dp, ties by neighbor id.

    Unlike the RP/LSH/IVF tiers this is END-TO-END deterministic (no
    seed, no fit): the shortlist is a pure function of the sign bits,
    so the whole query — shortlist included — replays exactly on any
    engine. Recall@k equals shortlist coverage, guaranteed 1.0 within
    Hamming radius ``dim/chunk_bits - 1`` of the query's code. The
    rescore join touches ``shortlist`` rows per query, never the
    corpus."""
    if shortlist < k:
        raise ValueError(
            f"shortlist must be >= k, got {shortlist} < {k}"
        )
    from meta_frame_spark.functions.vectors import cosine_similarity

    cand = hamming_topk(
        corpus, queries, k=shortlist, vec_col=vec_col, id_col=id_col,
        dim=dim, chunk_bits=chunk_bits,
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
        .withColumn(
            "score",
            F.round(cosine_similarity("_qvec", "_nvec"), 6) + F.lit(0.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
