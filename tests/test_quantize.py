"""Int8 scalar quantization (operators/quantize.py)."""

import numpy as np
from pyspark.sql import functions as F

from meta_frame_spark.operators.quantize import (
    int8_dequantize,
    int8_quantize,
    int8_reconstruction_stats,
    int8_topk,
)
from meta_frame_spark.operators.similarity import brute_force_topk


def test_roundtrip_error_bounded(spark, embeddings):
    """The symmetric-quant hard bound: every element reconstructs to
    within scale/2, and codes stay inside int8 range."""
    stats = int8_reconstruction_stats(embeddings)
    assert stats.filter(~F.col("bound_ok")).count() == 0
    q = int8_quantize(embeddings)
    rng = q.select(
        F.min(F.array_min("qvec")).alias("lo"),
        F.max(F.array_max("qvec")).alias("hi"),
    ).collect()[0]
    assert -127 <= rng.lo and rng.hi <= 127


def test_exact_values_small(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    rows = {r.vec_id: r for r in int8_quantize(df).collect()}
    # scale = 2/127; codes = round(x * 127 / 2)
    assert rows[1].qvec == [64, -127, 32]
    assert abs(rows[1].qscale - 2.0 / 127.0) < 1e-12
    # degenerate all-zero vector: scale 1.0, codes all 0
    assert rows[2].qvec == [0, 0, 0] and rows[2].qscale == 1.0
    dq = {r.vec_id: r.dqvec for r in int8_dequantize(int8_quantize(df)).collect()}
    assert np.allclose(dq[1], [64 * 2 / 127, -2.0, 32 * 2 / 127])


def test_topk_recall_vs_exact(spark, embeddings):
    """Asymmetric int8 scoring loses almost nothing at 64-dim cosine:
    recall@5 vs full precision stays high and per-query output is a
    proper top-k."""
    q = embeddings.filter(F.col("vec_id") < 10)
    approx = int8_topk(embeddings, q, k=5).collect()
    exact = brute_force_topk(embeddings, q, k=5).collect()
    es = {(r.query_id, r.neighbor_id) for r in exact}
    aps = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(es & aps) / len(es) >= 0.9
    from collections import Counter

    per = Counter(r.query_id for r in approx)
    assert set(per) == set(range(10)) and set(per.values()) == {5}
