"""MMR re-ranking and greedy k-center coresets (operators/diversify.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.diversify import kcenter_coverage, mmr_select
from meta_frame_spark.operators.similarity import brute_force_topk


def _py_mmr(q, cands, k, lam):
    """Reference greedy MMR over (id, vec) candidates, id-asc ties."""
    ids = sorted(cands)
    M = {i: np.asarray(cands[i], float) for i in ids}
    for i in ids:
        M[i] = M[i] / max(np.linalg.norm(M[i]), 1e-12)
    qv = np.asarray(q, float)
    qv /= max(np.linalg.norm(qv), 1e-12)
    chosen = []
    while len(chosen) < min(k, len(ids)):
        best, best_s = None, -np.inf
        for i in ids:
            if i in chosen:
                continue
            rel = float(M[i] @ qv)
            if chosen:
                red = max(float(M[i] @ M[j]) for j in chosen)
                s = lam * rel - (1 - lam) * red
            else:
                s = lam * rel
            s = round(s, 12)
            if s > best_s:  # strict: first (lowest id) max wins
                best, best_s = i, s
        chosen.append(best)
    return chosen


def test_mmr_matches_reference_greedy(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < 3)
    out = mmr_select(embeddings, q, k=5, lam=0.7, n_candidates=20)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, {})[r.rank] = r.neighbor_id
    cand = brute_force_topk(embeddings, q, k=20)
    cvecs = {r.vec_id: list(r.embedding) for r in embeddings.collect()}
    for qr in q.collect():
        cids = [r.neighbor_id for r in cand.filter(
            F.col("query_id") == qr.vec_id).collect()]
        want = _py_mmr(
            list(qr.embedding), {i: cvecs[i] for i in cids}, 5, 0.7
        )
        ranked = [got[qr.vec_id][i] for i in sorted(got[qr.vec_id])]
        assert ranked == want, (qr.vec_id, ranked, want)


def test_mmr_first_pick_is_relevance_argmax(spark, embeddings):
    """rank 1 must equal the plain cosine argmax regardless of lam."""
    q = embeddings.filter(F.col("vec_id") < 5)
    out = mmr_select(embeddings, q, k=3, lam=0.3, n_candidates=15)
    first = {r.query_id: r.neighbor_id for r in out.filter("rank = 1").collect()}
    top1 = {
        r.query_id: r.neighbor_id
        for r in brute_force_topk(embeddings, q, k=1).collect()
    }
    assert first == top1


def test_mmr_string_ids(spark):
    """ADVICE r5 (diversify.py:115): non-integer ids must work — the
    output schema follows the input id type."""
    rows = [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = mmr_select(df, df.filter("vec_id = 'a'"), k=2, n_candidates=3)
    got = sorted((r.rank, r.neighbor_id) for r in out.collect())
    # self is excluded by brute_force_topk; diversity puts c before b at lam .7?
    # rank1 = argmax cosine = b; rank2: lam*rel - (1-lam)*red favors c
    assert got == [(1, "b"), (2, "c")]
    assert dict(out.dtypes)["neighbor_id"] == "string"


def test_mmr_validation(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < 1)
    with pytest.raises(ValueError):
        mmr_select(embeddings, q, k=0)
    with pytest.raises(ValueError):
        mmr_select(embeddings, q, k=10, n_candidates=5)
    with pytest.raises(ValueError):
        mmr_select(embeddings, q, lam=1.5)


def test_kcenter_radii_monotone_and_cover(spark, embeddings):
    out = {r.k: r.coverage_radius for r in
           kcenter_coverage(embeddings, ks=(2, 4, 8)).collect()}
    assert sorted(out) == [2, 4, 8]
    assert out[2] >= out[4] >= out[8] >= 0.0
    # radius with more centers strictly helps on non-degenerate data
    assert out[8] < out[2]
    with pytest.raises(ValueError):
        kcenter_coverage(embeddings, ks=())
