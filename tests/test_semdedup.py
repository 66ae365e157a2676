"""Semantic (embedding-space) dedup — unit semantics on planted
vectors; the sf0.01 run is covered rows-only by the driver (kmeans is
not SQL-expressible)."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.semdedup import semantic_dedup


def _vec(*xs):
    return [float(x) for x in xs]


@pytest.fixture(scope="module")
def planted(spark):
    # two tight groups far apart + one orthogonal singleton
    rows = [
        (1, _vec(1.0, 0.0, 0.0, 0.0)),
        (2, _vec(0.999, 0.01, 0.0, 0.0)),   # ~dup of 1
        (3, _vec(0.998, -0.02, 0.0, 0.0)),  # ~dup of 1
        (10, _vec(0.0, 0.0, 1.0, 0.0)),
        (11, _vec(0.0, 0.0, 0.999, 0.01)),  # ~dup of 10
        (20, _vec(0.0, 1.0, 0.0, 0.0)),     # unique
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemanticDedup:
    def test_planted_dups_collapse_to_min_id(self, planted):
        out = semantic_dedup(planted, threshold=0.95, n_clusters=3).collect()
        by_id = {r.vec_id: r for r in out}
        assert len(out) == planted.count()  # one verdict per vector
        kept = {i for i, r in by_id.items() if r.is_kept}
        # min id of each dup set survives; the unique vector survives
        assert {1, 10, 20} <= kept
        assert not by_id[2].is_kept and by_id[2].dup_of == 1
        assert not by_id[3].is_kept and by_id[3].dup_of == 1
        assert not by_id[11].is_kept and by_id[11].dup_of == 10
        assert by_id[2].cosine > 0.95

    def test_threshold_one_keeps_all_distinct(self, planted):
        out = semantic_dedup(planted, threshold=1.0, n_clusters=2)
        # nothing is exactly identical, so everything survives
        assert out.filter("NOT is_kept").count() == 0

    def test_deterministic_across_partitionings(self, planted):
        a = semantic_dedup(planted, threshold=0.95, n_clusters=3).collect()
        b = semantic_dedup(
            planted.repartition(7), threshold=0.95, n_clusters=3
        ).collect()
        key = lambda r: r.vec_id
        assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
            map(tuple, b), key=lambda t: t[0]
        )

    def test_survivor_semi_join(self, planted):
        out = semantic_dedup(planted, threshold=0.95, n_clusters=3)
        survivors = planted.join(
            out.filter("is_kept"), "vec_id", "left_semi"
        )
        assert survivors.count() == out.filter("is_kept").count()

    def test_bad_threshold_raises(self, planted):
        with pytest.raises(ValueError):
            semantic_dedup(planted, threshold=0.0)

    def test_real_table_verdict_partition(self, embeddings):
        out = semantic_dedup(embeddings, threshold=0.9, n_clusters=8)
        rows = out.collect()
        assert len(rows) == embeddings.filter(F.col("embedding").isNotNull()).count()
        for r in rows:
            if r.is_kept:
                assert r.dup_of is None and r.cosine is None
            else:
                assert r.dup_of is not None and r.cosine >= 0.9 - 1e-9


def test_semantic_dedup_max_cell_size_bounds_groups(spark):
    """A corpus forced into one cell (n_clusters=1) re-splits under the
    cap: no prune group exceeds max_cell_size, every row still gets
    exactly one output row, and survivors of the uncapped run remain a
    superset (sub-splitting only removes comparisons, never adds)."""
    import numpy as np
    from meta_frame_spark.operators.semdedup import semantic_dedup

    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        v = rng.normal(size=8)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plant exact dups so some pruning happens
    rows += [(1000 + i, rows[i][1]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    capped = semantic_dedup(df, threshold=0.99, n_clusters=1, max_cell_size=40)
    out = capped.collect()
    assert len(out) == len(rows)                      # one row per vector
    assert sum(not r.is_kept for r in out) > 0        # pruning still happens

    uncapped_kept = {
        r.vec_id
        for r in semantic_dedup(df, threshold=0.99, n_clusters=1).collect()
        if r.is_kept
    }
    capped_kept = {r.vec_id for r in out if r.is_kept}
    assert uncapped_kept <= capped_kept

    # determinism under the cap
    again = {r.vec_id for r in
             semantic_dedup(df, threshold=0.99, n_clusters=1, max_cell_size=40).collect()
             if r.is_kept}
    assert again == capped_kept
