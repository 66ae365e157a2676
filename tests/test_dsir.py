"""DSIR hashed-n-gram importance weights (operators/dsir.py)."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.dsir import dsir_log_weights


def _py_dsir(raw, target, n=2, hex_chars=3, s=1.0):
    """Reference implementation: dict counts over md5-bucketed word
    n-grams, exact same shingle semantics as dedup._shingles (docs
    shorter than n tokens contribute one partial gram)."""
    import hashlib

    def grams(text):
        toks = text.lower().split()
        if len(toks) <= n:
            return [" ".join(toks)]
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:hex_chars]

    v = 16 ** hex_chars
    ct: dict = {}
    for _, text in target:
        for g in grams(text):
            b = bucket(g)
            ct[b] = ct.get(b, 0) + 1
    cr: dict = {}
    for _, text in raw:
        for g in grams(text):
            b = bucket(g)
            cr[b] = cr.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, text in raw:
        w = 0.0
        gs = grams(text)
        for g in gs:
            b = bucket(g)
            w += math.log((ct.get(b, 0) + s) / (tt + s * v))
            w -= math.log((cr.get(b, 0) + s) / (tr + s * v))
        out[doc_id] = (len(gs), w)
    return out


RAW = [
    (1, "spark shuffle join agg"),
    (2, "poem about rivers and rain"),
    (3, "spark join plan"),
    (4, "x"),  # single token -> one partial gram
]
TARGET = [(100, "spark join spark shuffle"), (101, "spark plan")]


def test_matches_reference_implementation(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_log_weights(raw, target).collect()
    }
    want = _py_dsir(RAW, TARGET)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9), d


def test_target_like_docs_weight_higher(spark):
    """Docs sharing the target's grams out-weight off-distribution
    docs — the whole point of importance resampling."""
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = {r.doc_id: r.log_weight for r in dsir_log_weights(raw, target).collect()}
    # per-gram average, so length doesn't dominate the comparison
    n = {r.doc_id: r.n_grams for r in dsir_log_weights(raw, target).collect()}
    assert w[3] / n[3] > w[2] / n[2]  # "spark join plan" >> the poem


def test_every_raw_doc_scored_once(spark, documents):
    target = documents.filter(F.col("lang") == "en")
    out = dsir_log_weights(documents, target)
    n_docs = documents.filter(F.col("text").isNotNull()).count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_deterministic_under_repartition(spark, documents):
    target = documents.filter(F.col("lang") == "en")
    a = {
        r.doc_id: round(r.log_weight, 6)
        for r in dsir_log_weights(documents, target).collect()
    }
    b = {
        r.doc_id: round(r.log_weight, 6)
        for r in dsir_log_weights(
            documents.repartition(7, "doc_id"),
            target.repartition(3, "doc_id"),
        ).collect()
    }
    assert a == b


def test_hex_chars_8_no_overflow(spark):
    """hex_chars=8 buckets reach 16^8-1 > 2^31-1; a string->int cast
    NULLs the top half of the bucket space and silently assigns those
    grams the unseen-bucket default (ADVICE r10). LONG buckets must
    replay the pure-Python reference exactly."""
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_log_weights(raw, target, hex_chars=8).collect()
    }
    want = _py_dsir(RAW, TARGET, hex_chars=8)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9), d


def test_validation(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, n=0)
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, hex_chars=0)
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, smoothing=0.0)
