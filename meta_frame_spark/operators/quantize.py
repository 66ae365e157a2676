"""Scalar (int8) quantization for embedding columns.

Not in the reference (no vector surface — SURVEY.md §2); this is the
simplest storage-side compression on the ANN ladder, below PQ
(operators/pq.py): per-vector symmetric int8 — ``scale = max|x|/127``,
``code = round(x/scale)`` — shrinks a float32 store 4× with a hard
per-element reconstruction bound of ``scale/2``. The standard first
step before shipping a 100 TB embedding store to disk (FAISS
``SQ8`` / most vector DBs' default codec, public technique).

Scale design:

* Everything is JVM-side ``transform``/``aggregate`` higher-order
  functions — whole-stage codegen, zero Python, map-only, no shuffle.
* The scale is **per vector** (one double next to each code array), so
  quantization needs no global pass, no fit, and no broadcast state —
  rows quantize independently wherever they already live.
* ``int8_topk`` scores dequantized vectors with the same plan shape as
  ``similarity.brute_force_topk``: recall loss is bounded by the
  ``scale/2`` element error, and the 4× byte cut is what lets a
  cluster keep the whole store in page cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _abs_max(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Add ``code_col`` (array<tinyint>) and ``scale_col`` (double):
    per-vector symmetric int8 quantization. An all-zero (or null-free
    degenerate) vector gets scale 1.0 so codes are well-defined."""
    absmax = _abs_max(F.col(vec_col))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    out = df.withColumn(scale_col, scale)
    return out.withColumn(
        code_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col(scale_col), 0).cast(
                "tinyint"
            ),
        ),
    )


def int8_dequantize(
    df: DataFrame,
    code_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "dqvec",
) -> DataFrame:
    """Reconstruct ``out_col`` (array<double>) = code * scale."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(code_col), lambda c: c.cast("double") * F.col(scale_col)
        ),
    )


def int8_reconstruction_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector quantization audit: ``(id_col, qscale, code_sum,
    max_err, bound_ok)``. ``max_err`` is the max element-wise
    |x - code*scale|; ``bound_ok`` asserts the HARD symmetric-quant
    guarantee ``max_err <= scale/2`` (with a 1e-9 relative float
    cushion). ``code_sum`` is an exact-integer content check that a
    different engine can recompute bit-for-bit."""
    q = int8_quantize(df, vec_col)
    err = F.zip_with(
        F.col(vec_col),
        F.col("qvec"),
        lambda x, c: F.abs(x.cast("double") - c.cast("double") * F.col("qscale")),
    )
    return q.select(
        F.col(id_col),
        F.col("qscale"),
        F.aggregate(
            F.col("qvec"), F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        ).alias("code_sum"),
        F.aggregate(err, F.lit(0.0), lambda a, x: F.greatest(a, x)).alias("max_err"),
    ).select(
        id_col,
        "qscale",
        "code_sum",
        "max_err",
        (
            F.col("max_err")
            <= F.col("qscale") * F.lit(0.5) + F.col("qscale") * F.lit(1e-9)
        ).alias("bound_ok"),
    )


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k over the int8-DEQUANTIZED corpus
    (queries stay full precision — the asymmetric-scoring convention,
    same as PQ's ADC). Same plan shape and output contract as
    ``similarity.brute_force_topk``: (query_id, neighbor_id, rank)."""
    from meta_frame_spark.operators.similarity import brute_force_topk

    dq = int8_dequantize(int8_quantize(corpus, vec_col)).select(
        F.col(id_col), F.col("dqvec").alias(vec_col)
    )
    return brute_force_topk(
        dq, queries, k=k, id_col=id_col, vec_col=vec_col,
        exclude_self=exclude_self,
    )
