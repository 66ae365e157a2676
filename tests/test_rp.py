"""Random-projection (JL) dimensionality reduction."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.rp import rp_project, rp_topk
from meta_frame_spark.operators.similarity import brute_force_topk


def test_shape_and_determinism(spark, embeddings):
    out = rp_project(embeddings.limit(20), out_dim=16)
    rows = {r.vec_id: r.embedding for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    again = {r.vec_id: r.embedding for r in rp_project(embeddings.limit(20), out_dim=16).collect()}
    assert rows == again  # same seed -> bit-identical


def test_out_col_keeps_original(spark, embeddings):
    out = rp_project(embeddings.limit(5), out_dim=8, out_col="reduced")
    r = out.first()
    assert len(r.reduced) == 8 and len(r.embedding) > 8


def test_distance_preservation(spark, embeddings):
    """JL contract: pairwise L2 distances in the projected space stay
    within a modest distortion band (deterministic under the fixed
    seed; 0.5..1.6 is far looser than the expected ~1±0.25 at
    out_dim=32 so a data regen cannot flip it)."""
    sample = embeddings.filter(F.col("vec_id") < 30)
    orig = {r.vec_id: r.embedding for r in sample.collect()}
    proj = {r.vec_id: r.embedding for r in rp_project(sample, out_dim=32).collect()}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(orig)
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = dist(orig[a], orig[b])
        if d0 > 1e-6:
            ratios.append(dist(proj[a], proj[b]) / d0)
    assert ratios and all(0.5 <= r <= 1.6 for r in ratios), ratios


def test_rp_rescore_recall(spark, embeddings):
    """Shortlist-then-exact-rescore: recall@5 vs full-dim exact stays
    above a conservative floor (observed 0.68-0.85 across shipped SFs
    at out_dim=32, frac=0.1 — the near-uniform synthetic vectors are
    the hostile case), and every query returns exactly k rows."""
    from meta_frame_spark.operators.rp import rp_rescore_topk

    q = embeddings.filter(F.col("vec_id") < 8)
    approx = rp_rescore_topk(embeddings, q, k=5, out_dim=32, shortlist_frac=0.1)
    exact = brute_force_topk(embeddings, q, k=5)
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    assert total > 0 and hits / total >= 0.5, (hits, total)
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_rp_direct_topk_is_weaker_but_shaped(spark, embeddings):
    """Direct reduced-space top-k (no rescore) keeps the (query_id,
    neighbor_id, rank) contract; its recall is strictly a shortlist
    property so only the shape is asserted here."""
    q = embeddings.filter(F.col("vec_id") < 3)
    out = rp_topk(embeddings, q, k=4, out_dim=32)
    per_q = {r.query_id: r["count"] for r in out.groupBy("query_id").count().collect()}
    assert set(per_q.values()) == {4}


def test_bad_out_dim(spark, embeddings):
    with pytest.raises(ValueError):
        rp_project(embeddings, out_dim=0)
