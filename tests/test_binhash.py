"""Binary sign codes + multi-index Hamming search (operators/binhash.py)."""

import pytest
from pyspark.sql import functions as F


def test_sign_quantize_hand_computed(spark):
    from meta_frame_spark.operators.binhash import sign_quantize

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5, 0.0, -2.0, 3.0, 0.1, -0.1])],
        "id long, embedding array<double>",
    )
    out = sign_quantize(df, dim=8, chunk_bits=4).collect()[0]
    # bits chunk0: [1,0,1,0] -> 0b0101 = 5; chunk1: [0,1,1,0] -> 6
    assert out.sign_chunks == [5, 6]
    # zero/negative dims contribute 0 bits; strictly positive -> 1
    allpos = spark.createDataFrame(
        [(1, [1.0] * 8)], "id long, embedding array<double>"
    )
    assert sign_quantize(allpos, dim=8, chunk_bits=8).collect()[0][
        "sign_chunks"
    ] == [255]

    with pytest.raises(ValueError, match="multiple of chunk_bits"):
        sign_quantize(df, dim=10, chunk_bits=4)
    with pytest.raises(ValueError, match="chunk_bits"):
        sign_quantize(df, dim=64, chunk_bits=32)


def test_hamming_topk_pigeonhole_guarantee(spark):
    """Any corpus code within Hamming distance n_chunks-1 of a query
    shares at least one chunk verbatim (Norouzi et al. 2012), so a
    planted near-duplicate MUST come back as the rank-1 neighbor —
    deterministic, no seed, no fit."""
    import random

    from meta_frame_spark.operators.binhash import hamming_topk

    rng = random.Random(7)
    base = [rng.choice([-1.0, 1.0]) for _ in range(64)]
    near = list(base)
    for i in (3, 17, 42):  # hamming 3 < n_chunks = 8
        near[i] = -near[i]
    rows = [(0, base), (1, near)]
    rows += [
        (i, [rng.choice([-1.0, 1.0]) for _ in range(64)])
        for i in range(2, 102)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hamming_topk(
        corpus, corpus.filter(F.col("vec_id") == 0), k=3,
        dim=64, chunk_bits=8,
    ).collect()
    top = min(out, key=lambda r: r.rank)
    assert (top.neighbor_id, top.hamming) == (1, 3)
    # self-match excluded everywhere
    assert all(r.neighbor_id != r.query_id for r in out)
    with pytest.raises(ValueError, match="k must be"):
        hamming_topk(corpus, corpus, k=0)


def test_hamming_topk_matches_exact_on_candidates_and_is_stable(spark, sf_dir):
    """On the real embeddings: per-query rows are <= k, distances are
    sorted with id tiebreaks, results are partition-invariant, and
    every returned distance equals a recomputed exact Hamming of the
    sign codes."""
    from meta_frame_spark.operators.binhash import hamming_topk, sign_quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = hamming_topk(emb, q, k=5, dim=64, chunk_bits=8).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) and all(len(v) <= 5 for v in per_q.values())
    for v in per_q.values():
        seq = sorted(v, key=lambda r: r.rank)
        assert [r.rank for r in seq] == list(range(1, len(seq) + 1))
        assert all(
            (a.hamming, a.neighbor_id) < (b.hamming, b.neighbor_id)
            for a, b in zip(seq, seq[1:])
        )
    out2 = hamming_topk(
        emb.repartition(13), q.repartition(3), k=5, dim=64, chunk_bits=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    # recompute each returned pair's exact Hamming from the codes
    codes = {
        r.vec_id: r.c
        for r in sign_quantize(emb, dim=64, chunk_bits=8)
        .select("vec_id", F.col("sign_chunks").alias("c"))
        .collect()
    }
    for r in out:
        d = sum(
            bin(a ^ b).count("1")
            for a, b in zip(codes[r.query_id], codes[r.neighbor_id])
        )
        assert d == r.hamming


def test_hamming_topk_plan_has_no_cartesian(spark, sf_dir):
    from meta_frame_spark.operators.binhash import hamming_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    plan = (
        hamming_topk(emb, q, k=5)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # query side broadcast


def test_hamming_rescore_finds_planted_cosine_dup_and_orders_exactly(spark):
    """A planted near-identical vector (3 sign flips, cosine ~0.9)
    is guaranteed into the shortlist (pigeonhole) and the exact
    rescore puts it at rank 1 by true cosine; the rescore order is
    the brute-force cosine order restricted to the shortlist."""
    import random

    from meta_frame_spark.operators.binhash import hamming_rescore_topk
    from meta_frame_spark.operators.similarity import brute_force_topk

    rng = random.Random(11)
    base = [rng.choice([-1.0, 1.0]) for _ in range(64)]
    near = list(base)
    for i in (5, 23, 61):
        near[i] = -near[i]
    rows = [(0, base), (1, near)] + [
        (i, [rng.choice([-1.0, 1.0]) for _ in range(64)])
        for i in range(2, 102)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter("vec_id = 0")
    out = sorted(
        hamming_rescore_topk(corpus, q, k=3, shortlist=30).collect(),
        key=lambda r: r.rank,
    )
    assert out[0].neighbor_id == 1 and out[0].score > 0.85
    # monotone scores with id tiebreaks
    assert all(
        (a.score, -a.neighbor_id) >= (b.score, -b.neighbor_id)
        for a, b in zip(out, out[1:])
    )
    # the rescore scores ARE the true cosines (python recomputation)
    # and the global brute-force top-1 (the planted dup, which the
    # pigeonhole guarantees into the candidate set) is recovered
    import math

    vecs = dict(rows)

    def cos(a, b):
        num = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        den = math.sqrt(sum(x * x for x in vecs[a])) * math.sqrt(
            sum(x * x for x in vecs[b])
        )
        return round(num / den, 6)

    for r in out:
        assert r.score == cos(0, r.neighbor_id)
    exact_top = brute_force_topk(corpus, q, k=1).collect()[0]
    assert exact_top.neighbor_id == out[0].neighbor_id == 1

    import pytest

    with pytest.raises(ValueError, match="shortlist"):
        hamming_rescore_topk(corpus, q, k=5, shortlist=3)
