"""Product quantization (operators/pq.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.pq import pq_encode, pq_fit, pq_topk
from meta_frame_spark.operators.similarity import brute_force_topk


def test_pq_recall_and_code_shape(spark, embeddings):
    books = pq_fit(embeddings, m=16, bits=6)
    assert books.shape == (16, 64, 4)
    codes = pq_encode(embeddings, books)
    row = codes.first()
    assert len(row.codes) == 16
    assert codes.count() == embeddings.count()

    q = embeddings.filter(F.col("vec_id") < 10)
    approx = pq_topk(codes, q, books, k=5).collect()
    exact = brute_force_topk(embeddings, q, k=5).collect()
    es = {(r.query_id, r.neighbor_id) for r in exact}
    aps = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(es & aps) / len(es) >= 0.5
    from collections import Counter
    per = Counter(r.query_id for r in approx)
    assert set(per) == set(range(10)) and set(per.values()) == {5}


def test_pq_deterministic(spark, embeddings):
    b1 = pq_fit(embeddings, m=8, bits=5)
    b2 = pq_fit(embeddings, m=8, bits=5)
    assert np.array_equal(b1, b2)
    c1 = sorted((r.vec_id, tuple(r.codes)) for r in pq_encode(embeddings, b1).collect())
    c2 = sorted((r.vec_id, tuple(r.codes)) for r in pq_encode(embeddings, b2).collect())
    assert c1 == c2


def test_pq_validation(spark, embeddings):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(embeddings, m=7)
    with pytest.raises(ValueError, match="bits"):
        pq_fit(embeddings, m=8, bits=0)
    with pytest.raises(ValueError, match="training vectors"):
        pq_fit(embeddings.limit(10), m=8, bits=8)  # 500-cap corpus < 256? no: limit(10) < 256
    books = pq_fit(embeddings, m=8, bits=4)
    with pytest.raises(ValueError, match="empty query batch"):
        pq_topk(pq_encode(embeddings, books), embeddings.filter("vec_id < 0"), books)


def test_ivfpq_recall_and_determinism(spark, embeddings):
    from meta_frame_spark.operators.pq import ivfpq_topk

    q = embeddings.filter(F.col("vec_id") < 10)
    approx = ivfpq_topk(embeddings, q, k=5, n_probe=8).collect()
    exact = brute_force_topk(embeddings, q, k=5).collect()
    es = {(r.query_id, r.neighbor_id) for r in exact}
    aps = {(r.query_id, r.neighbor_id) for r in approx}
    # recall multiplies cell recall x code fidelity; near-uniform
    # synthetic vectors bound cell recall (~as ivf_topk's 0.5)
    assert len(es & aps) / len(es) >= 0.4
    again = {(r.query_id, r.neighbor_id) for r in
             ivfpq_topk(embeddings, q, k=5, n_probe=8).collect()}
    assert aps == again
    from collections import Counter
    per = Counter(r.query_id for r in approx)
    assert set(per) == set(range(10)) and max(per.values()) <= 5


def test_fit_cache_keyed_by_vec_col(spark, embeddings):
    """ADVICE r5 (pq.py:114): the same cache_key with a DIFFERENT
    vector column must MISS the fit memo — a hit would silently return
    codebooks fit on the wrong column."""
    from meta_frame_spark.operators.pq import _FIT_CACHE, clear_fit_cache

    clear_fit_cache()
    other = embeddings.withColumn(
        "embedding2", F.transform("embedding", lambda x: x * 2.0 + 1.0)
    )
    b1 = pq_fit(embeddings, m=8, bits=4, cache_key="t")
    n_after_first = len(_FIT_CACHE)
    b2 = pq_fit(other, m=8, bits=4, vec_col="embedding2", cache_key="t")
    assert len(_FIT_CACHE) == n_after_first + 1  # second fit was a miss
    assert not np.array_equal(b1, b2)
    # identical signature IS a hit (object identity proves no refit)
    b3 = pq_fit(embeddings, m=8, bits=4, cache_key="t")
    assert b3 is b1
    clear_fit_cache()
